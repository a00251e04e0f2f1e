#!/usr/bin/env python3
"""Generate the R-serialization wire-format fixtures in
src/test/resources/rdf/.

Each .bin is a complete `serialize(..., xdr=FALSE, version=2)` byte
stream following GNU R's public serialization layout (R Internals
manual / serialize.c; mirrored by the reference engine's
src/DFInterface.cpp:168-275). The fixture family deliberately spans
the envelope REAL R interpreters produce but our own writer does not:

  - header writer-version ints of R 4.4.1 and R 3.4.1 (our writer and
    the reference's R_HEADER both pin R 3.2.0) — readers must ignore
    the writer version, keying only on "B\\n" + format version 2;
  - CHARSXP level bits: ASCII-cached (0x00040009, what modern R emits
    for pure-ASCII strings), UTF-8 (0x00080009, non-ASCII text), and
    bare 0x00000009 — readers must mask flags & 0xff.

tools/capture_rdf_fixture.R re-captures/validates these against a real
R interpreter when one is available; RdfProtocolSpec replays them
unconditionally.
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "rdf")

VECSXP, INTSXP, REALSXP, STRSXP, CHARSXP = 0x13, 0x0D, 0x0E, 0x10, 0x09
LISTSXP, SYMSXP, NILVALUE = 0x02, 0x01, 0xFE
HAS_ATTR, HAS_TAG = 0x200, 0x400
ASCII_LEV, UTF8_LEV = 0x40 << 12, 0x08 << 12
NA_INT = -0x80000000
NA_REAL_BITS = 0x7FF00000000007A2


def i32(v):
    return struct.pack("<i", v)


def rver(major, minor, patch):
    return i32(major * 65536 + minor * 256 + patch)


def header(writer):
    return b"B\n" + i32(2) + writer + rver(2, 3, 0)


def charsxp(s, levels=ASCII_LEV):
    b = s.encode("utf-8")
    return i32(CHARSXP | levels) + i32(len(b)) + b


def na_string(levels=ASCII_LEV):
    return i32(CHARSXP | levels) + i32(-1)


def int_col(vals):
    out = i32(INTSXP) + i32(len(vals))
    for v in vals:
        out += i32(NA_INT if v is None else v)
    return out


def real_col(vals):
    out = i32(REALSXP) + i32(len(vals))
    for v in vals:
        out += (struct.pack("<Q", NA_REAL_BITS) if v is None
                else struct.pack("<d", v))
    return out


def str_col(cells):
    # cells: list of (text-or-None, levels)
    out = i32(STRSXP) + i32(len(cells))
    for text, lev in cells:
        out += na_string(lev) if text is None else charsxp(text, lev)
    return out


def names_attr(names):
    out = i32(LISTSXP | HAS_TAG) + i32(SYMSXP) + charsxp("names")
    out += i32(STRSXP) + i32(len(names))
    for n in names:
        out += charsxp(n)
    return out + i32(NILVALUE)


def named_list(writer, cols):
    # cols: list of (name, encoded-column-bytes)
    out = header(writer) + i32(VECSXP | HAS_ATTR) + i32(len(cols))
    for _, body in cols:
        out += body
    return out + names_attr([n for n, _ in cols])


def eof(writer):
    return header(writer) + i32(VECSXP) + i32(0)


def main():
    os.makedirs(OUT, exist_ok=True)
    r441, r341 = rver(4, 4, 1), rver(3, 4, 1)

    # what serialize(list(x=c(1L,NA), y=c(2.5,NA), s=c("ab",NA)),
    # NULL, xdr=FALSE, version=2) streams under a modern (4.x) R
    typed = named_list(r441, [
        ("x", int_col([1, None])),
        ("y", real_col([2.5, None])),
        ("s", str_col([("ab", ASCII_LEV), (None, ASCII_LEV)]))])

    # older-R / non-ASCII envelope: 3.4.1 writer version, a UTF-8
    # CHARSXP with the UTF-8 level bit, a bare-levels CHARSXP, and a
    # bare-levels NA
    variants = named_list(r341, [
        ("x", int_col([7, None, 9])),
        ("s", str_col([("héllo", UTF8_LEV), ("ok", 0), (None, 0)]))])

    fixtures = {
        "r441_typed_response.bin": typed,
        "r341_envelope_variants.bin": variants,
        "r441_eof.bin": eof(r441),
        # one full child→parent session transcript: the response to a
        # single data chunk, then the final-answer empty list — what a
        # one-chunk reference R `map` session writes to stdout
        "r441_transcript.bin": typed + eof(r441),
    }
    for name, data in fixtures.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()
