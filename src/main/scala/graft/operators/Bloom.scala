package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Portable Bloom-filter prefilter — the runtime-filter pattern for
  * membership tests against a large key set.
  *
  * At corpus scale the shape that matters is "drop the 99% of a huge
  * fact table that cannot match a blocklist/allowlist BEFORE the exact
  * join": a hash-relation broadcast of an n-key set costs tens of bytes
  * per key, while a Bloom filter costs ~1.2 bytes per key at 1% FP
  * (k=3) — a 100M-key blocklist becomes a ~120 MB bit array that
  * every executor tests with three cheap probes per row, no shuffle of
  * the big side, no hash relation. False positives are then removed by
  * the exact (now tiny) residual join; false negatives never happen.
  *
  * Spark ships `DataFrameStatFunctions.bloomFilter` and an internal
  * runtime-filter rule, but both hash with Murmur3 — fine in-engine,
  * invisible to an external oracle. This implementation derives its k
  * probe positions from md5 hex slices (the same engine-portable hash
  * family as `Sampling.u01Spark`), so a DuckDB oracle reproduces the
  * exact bit array — set bits, false positives and all — and the
  * approximate structure itself sits under the value gate (q95), the
  * same trick that gates the LSH plans (q56) and KMV (q71).
  *
  * The build is a true partial+final Catalyst aggregation: each
  * partition ORs key bits into a local m-bit array, merge is word-wise
  * OR, and only m/8 bytes per partition cross the wire — mergeable,
  * bounded, one job. The membership test is pure built-in expressions
  * (element_at / shiftright / bitwiseAND on a literal array), so it
  * stays inside whole-stage codegen.
  *
  * Reference anchor: the host-DB `filter()` operator family
  * (reference `src/PhysicalOperators.cpp` apply/filter) — this is the
  * scale-path complement for filters whose predicate is membership in
  * another table.
  */
object Bloom {

  /** Max probes derivable from one md5 (32 hex chars / 8 per probe). */
  val MaxK = 4

  /** Engine-portable hash column: lowercase md5 hex of the key's
    * string form — identical in Spark (`md5(cast(cast(k as string) as
    * binary))`) and DuckDB (`md5(CAST(k AS VARCHAR))`).
    */
  def md5Hex(key: Column): Column = md5(key.cast("string").cast("binary"))

  /** The k probe positions in [0, m) as an array<bigint>: position i
    * is hex slice [1+8i, 8] of the md5, an independent uniform 32-bit
    * draw, reduced mod m. `m` must be a power of two ≤ 2^31 and k ≤ 4.
    */
  def positions(hexCol: Column, k: Int, m: Int): Column = {
    require(k >= 1 && k <= MaxK, s"bloom k must be in [1, $MaxK], got $k")
    require(m >= 64 && (m & (m - 1)) == 0, s"bloom m must be a power of two >= 64, got $m")
    array((0 until k).map { i =>
      conv(substring(hexCol, 1 + 8 * i, 8), 16, 10).cast("long") % m
    }: _*)
  }

  /** DuckDB spelling of probe position i over hex column `h` — kept
    * next to `positions` so operator and oracle can never drift.
    */
  def positionDuck(h: String, i: Int, m: Int): String =
    s"(CAST(('0x' || substr($h, ${1 + 8 * i}, 8)) AS BIGINT) % $m)"

  /** m-bit array as 64-bit words; reduce sets bits, merge ORs words. */
  final case class BloomState(words: Array[Long]) {
    def set(positions: Seq[Long]): BloomState = {
      positions.foreach { p =>
        words((p >>> 6).toInt) |= 1L << (p & 63L)
      }
      this
    }
    def or(other: BloomState): BloomState = {
      var i = 0
      while (i < words.length) { words(i) |= other.words(i); i += 1 }
      this
    }
  }

  /** Aggregator over the `positions` array column: m/64 longs per
    * partition over the wire regardless of key count.
    */
  final class BloomBuild(m: Int) extends Aggregator[Seq[Long], BloomState, Array[Long]] {
    def zero: BloomState = BloomState(new Array[Long](m >>> 6))
    def reduce(b: BloomState, a: Seq[Long]): BloomState = if (a == null) b else b.set(a)
    def merge(b1: BloomState, b2: BloomState): BloomState = b1.or(b2)
    def finish(r: BloomState): Array[Long] = r.words
    def bufferEncoder: Encoder[BloomState] = Encoders.product[BloomState]
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
  }

  /** Distributed build: one aggregation job, returns the m/64 words.
    * The result is sketch-sized (m bits), like IVF's centroid pull —
    * never row data.
    */
  def build(keys: DataFrame, key: Column, m: Int, k: Int): Array[Long] =
    keys.select(positions(md5Hex(key), k, m).as("p"))
      .agg(udaf(new BloomBuild(m)).apply(col("p")).as("w"))
      .head().getSeq[Long](0).toArray

  /** True iff all k probe bits for `key` are set in `words` — possibly
    * a false positive, never a false negative. Pure built-ins over a
    * single literal array reference: codegen-friendly, no shuffle, no
    * join.
    */
  def mightContain(key: Column, words: Array[Long], m: Int, k: Int): Column = {
    val w = typedLit(words)
    val pos = positions(md5Hex(key), k, m)
    (0 until k).map { i =>
      val p = element_at(pos, i + 1)
      val word = element_at(w, shiftright(p, 6).cast("int") + 1)
      call_function("shiftright", word, (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** The composed prefilter: build from `small`, test on `big` — the
    * rows that survive are a superset of the exact semi-join, smaller
    * by the bloom's rejection rate.
    */
  def prefilter(big: DataFrame, bigKey: Column,
                small: DataFrame, smallKey: Column,
                m: Int = 1 << 20, k: Int = 3): DataFrame =
    big.where(mightContain(bigKey, build(small, smallKey, m, k), m, k))
}

/** Encoders.product can't name Array[Long] directly as an output. */
private object ExpressionEncoderHelp {
  val arrayLong: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
