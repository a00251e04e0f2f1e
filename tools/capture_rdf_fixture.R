# Validate / re-capture the src/test/resources/rdf fixtures against a
# REAL R interpreter (the environment-gated twin of RdfProtocolSpec's
# unconditional byte replay). Run from the repo root:
#
#   Rscript tools/capture_rdf_fixture.R
#
# 1. unserialize() each checked-in fixture — a real R must accept the
#    bytes and see exactly the expected values (NA sentinels included);
# 2. re-serialize the same lists with THIS interpreter
#    (xdr=FALSE, version=2) and write the capture next to the fixture
#    as *.captured.bin for byte comparison. Header writer-version ints
#    and CHARSXP level bits may legitimately differ by interpreter
#    version; everything else must match.

fixture_dir <- file.path("src", "test", "resources", "rdf")
stopifnot(dir.exists(fixture_dir))

read_bin <- function(name) {
  p <- file.path(fixture_dir, name)
  readBin(p, "raw", n = file.info(p)$size)
}

# --- 1. a real R accepts the typed-response fixture ---
typed <- unserialize(read_bin("r441_typed_response.bin"))
stopifnot(identical(names(typed), c("x", "y", "s")))
stopifnot(identical(typed$x, c(1L, NA_integer_)))
stopifnot(identical(typed$y, c(2.5, NA_real_)))
stopifnot(identical(typed$s, c("ab", NA_character_)))

variants <- unserialize(read_bin("r341_envelope_variants.bin"))
stopifnot(identical(names(variants), c("x", "s")))
stopifnot(identical(variants$x, c(7L, NA_integer_, 9L)))
stopifnot(identical(variants$s, c("héllo", "ok", NA_character_)))

stopifnot(identical(unserialize(read_bin("r441_eof.bin")), list()))

# the transcript = response + eof back to back on one connection
con <- rawConnection(read_bin("r441_transcript.bin"), "rb")
stopifnot(identical(unserialize(con), typed))
stopifnot(identical(unserialize(con), list()))
close(con)

# --- 2. capture this interpreter's own bytes for diffing ---
capture <- function(name, value) {
  writeBin(serialize(value, NULL, xdr = FALSE, version = 2),
           file.path(fixture_dir, paste0(name, ".captured.bin")))
}
capture("r441_typed_response.bin", typed)
capture("r341_envelope_variants.bin", variants)
capture("r441_eof.bin", list())

cat("rdf fixtures validated against", R.version.string, "\n")
