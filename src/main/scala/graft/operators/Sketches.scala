package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, element_at, least, typedLit, udaf}

/** Mergeable sketches for corpus-scale statistics.
  *
  * KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * distinct hash-uniform values seen; estimate |distinct| as
  * (k-1) / kth_smallest once k values are held, or exactly the number
  * held when fewer than k distinct values exist. The state is a bounded
  * sorted array, so the aggregate is a true partial+final Catalyst
  * aggregation — map-side combine on every partition, k doubles per
  * group over the wire, O(1) memory per group regardless of corpus
  * size. That mergeability is the whole point at 100 TB: exact
  * count-distinct shuffles every distinct key; the sketch shuffles k
  * numbers.
  *
  * Unlike the usual HLL route (whose register layout differs per
  * engine), KMV on an md5-derived uniform is *deterministic and
  * engine-portable*: the DuckDB oracle reproduces the estimate
  * bit-for-bit from the same hash prefix (see `Sampling.u01Duck`), so
  * the sketch sits under the same hash-compare gate as exact operators.
  */
object Sketches {

  /** Bounded sorted set of the k smallest distinct doubles.
    * `values` is ascending and duplicate-free; `insert` is O(k) —
    * fine for sketch-sized k (tens to hundreds).
    */
  final case class KmvState(k: Int, values: Array[Double]) {
    def insert(u: Double): KmvState = {
      val idx = java.util.Arrays.binarySearch(values, u)
      if (idx >= 0) this // duplicate hash ⇒ same underlying value in KMV semantics
      else {
        val ins = -idx - 1
        if (ins >= k) this // larger than the current k-th min: no-op
        else {
          val n = math.min(values.length + 1, k)
          val out = new Array[Double](n)
          System.arraycopy(values, 0, out, 0, ins)
          out(ins) = u
          System.arraycopy(values, ins, out, ins + 1, n - ins - 1)
          KmvState(k, out)
        }
      }
    }

    def merge(other: KmvState): KmvState =
      other.values.foldLeft(this)(_ insert _)

    /** (k-1)/kth-min once saturated; exact below saturation. */
    def estimate: Double =
      if (values.length < k) values.length.toDouble
      else (k - 1) / values(k - 1)
  }

  /** Aggregator over a hash-uniform `u` column in [0,1) (see
    * `Sampling.u01Spark` for the portable way to derive one). Null
    * inputs are skipped, mirroring SQL count(DISTINCT) semantics.
    */
  final class KmvDistinct(k: Int) extends Aggregator[java.lang.Double, KmvState, Double] {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    def zero: KmvState = KmvState(k, Array.emptyDoubleArray)
    def reduce(b: KmvState, a: java.lang.Double): KmvState =
      if (a == null) b else b.insert(a.doubleValue())
    def merge(b1: KmvState, b2: KmvState): KmvState = b1.merge(b2)
    def finish(r: KmvState): Double = r.estimate
    def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-level entry point: `df.groupBy(...).agg(kmvDistinct(col("u"), 64))`. */
  def kmvDistinct(u: Column, k: Int): Column =
    udaf(new KmvDistinct(k)).apply(u)

  /** Like [[KmvDistinct]] but finishing with the bottom-k values
    * themselves (ascending) instead of the point estimate — the
    * mergeable state a set-operation combine needs.
    */
  final class KmvValuesAgg(k: Int) extends Aggregator[java.lang.Double, KmvState, Seq[Double]] {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    def zero: KmvState = KmvState(k, Array.emptyDoubleArray)
    def reduce(b: KmvState, a: java.lang.Double): KmvState =
      if (a == null) b else b.insert(a.doubleValue())
    def merge(b1: KmvState, b2: KmvState): KmvState = b1.merge(b2)
    def finish(r: KmvState): Seq[Double] = r.values.toSeq
    def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `df.groupBy(...).agg(kmvValues(col("u"), 64))` → ascending
    * array<double> of the k smallest distinct hash-uniforms.
    */
  def kmvValues(u: Column, k: Int): Column =
    udaf(new KmvValuesAgg(k)).apply(u)

  /** Cross-source set-operation cardinalities from per-source KMV
    * sketches (Beyer et al., SIGMOD 2007): for every source pair
    * (src_a < src_b), the merged bottom-k `uv` =
    * bottom-k(va ∪ vb) estimates |A ∪ B| exactly like a single KMV
    * sketch would, and the fraction of `uv` present in BOTH source
    * sketches estimates the Jaccard similarity; their product
    * estimates |A ∩ B|. The answer every multi-source corpus audit
    * needs — "how much does source X overlap source Y" — from k
    * doubles per source instead of a distinct-key shuffle join: at
    * 100 TB each source's sketch is one mergeable partial aggregate
    * (map-side combined, k numbers over the wire) and the pair
    * combine is driver-trivial array arithmetic over S² tiny rows.
    *
    * Determinism: `u` must be a hash-uniform of the set key (see
    * [[Sampling.u01Spark]]), so sketches, merges and every estimate
    * replay bit-for-bit on any engine and any partitioning — the
    * q126 oracle re-derives all of it from md5 hex in SQL.
    *
    * Output per pair: `k_used` (= min(k, |uv|)), `union_est`,
    * `overlap` (members of `uv` in both sketches), `jaccard_est`,
    * `inter_est`.
    */
  def kmvSetOps(df: DataFrame, groupCol: String, u: Column, k: Int): DataFrame =
    kmvCombinePairs(
      df.groupBy(col(groupCol)).agg(kmvValues(u, k).as("vals")), groupCol, k)

  /** The pair-combine stage of [[kmvSetOps]] over an already-sketched
    * `(groupCol, vals: array<double>)` frame — separated so incremental
    * callers (the streaming flavor) can merge states across batches and
    * re-run only this tiny S²-row combine.
    */
  def kmvCombinePairs(sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.functions.{array_intersect, array_sort,
      array_union, least, lit, size, slice, when}
    val a = sk.select(col(groupCol).as("src_a"), col("vals").as("va"))
    val b = sk.select(col(groupCol).as("src_b"), col("vals").as("vb"))
    a.crossJoin(b).filter(col("src_a") < col("src_b"))
      .withColumn("uv", slice(array_sort(array_union(col("va"), col("vb"))), 1, k))
      .withColumn("k_used", least(lit(k), size(col("uv"))).cast("long"))
      .withColumn("union_est",
        when(size(col("uv")) < k, size(col("uv")).cast("double"))
          .otherwise(lit((k - 1).toDouble) / element_at(col("uv"), k)))
      .withColumn("overlap",
        size(array_intersect(array_intersect(col("uv"), col("va")), col("vb")))
          .cast("long"))
      .withColumn("jaccard_est", col("overlap") / col("k_used").cast("double"))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
      .select(col("src_a"), col("src_b"), col("k_used"), col("union_est"),
        col("overlap"), col("jaccard_est"), col("inter_est"))
  }

  /** Misra–Gries heavy-hitters state: at most `capacity` (term, count)
    * entries. Counts are LOWER bounds once decrements have happened;
    * while the number of distinct terms seen stays ≤ capacity no
    * decrement ever fires and every count is exact — the regime the
    * oracle gate runs in (like KMV below saturation). The classic
    * guarantee either way: any term with true frequency > N/(capacity+1)
    * is retained, and true_count − count ≤ N/(capacity+1).
    */
  final case class MgState(capacity: Int, terms: Array[String],
                           counts: Array[Long]) {
    private def indexOf(t: String): Int = {
      var i = 0
      while (i < terms.length) { if (terms(i) == t) return i; i += 1 }
      -1
    }

    def insert(t: String, w: Long): MgState = {
      val i = indexOf(t)
      if (i >= 0) { counts(i) += w; this }
      else if (terms.length < capacity)
        MgState(capacity, terms :+ t, counts :+ w)
      else decrementMerge(Array(t), Array(w))
    }

    def merge(other: MgState): MgState = {
      // combine exact-per-state counts first; decrement only if the
      // union overflows (the standard mergeable-summaries MG merge)
      var acc = this
      var overflow: List[(String, Long)] = Nil
      var i = 0
      while (i < other.terms.length) {
        val j = acc.indexOf(other.terms(i))
        if (j >= 0) acc.counts(j) += other.counts(i)
        else if (acc.terms.length < capacity)
          acc = MgState(capacity, acc.terms :+ other.terms(i),
            acc.counts :+ other.counts(i))
        else overflow = (other.terms(i), other.counts(i)) :: overflow
        i += 1
      }
      if (overflow.isEmpty) acc
      else acc.decrementMerge(overflow.map(_._1).toArray, overflow.map(_._2).toArray)
    }

    /** Union with extra entries, then subtract the (capacity+1)-th
      * largest combined count from everything and keep the positive
      * remainder — the decrement step that bounds the state size.
      */
    private def decrementMerge(xs: Array[String], ws: Array[Long]): MgState = {
      val allT = terms ++ xs
      val allC = counts ++ ws
      val sortedC = allC.sorted(Ordering[Long].reverse)
      val dec = if (sortedC.length > capacity) sortedC(capacity) else 0L
      val kept = allT.indices.filter(i => allC(i) - dec > 0L)
      MgState(capacity, kept.map(allT).toArray, kept.map(i => allC(i) - dec).toArray)
    }
  }

  /** Bounded-memory frequent-terms aggregator: map-side partial MG
    * summaries, k entries per group over the wire, O(capacity) memory
    * per group regardless of stream length — the 100 TB answer to
    * "top words" where an exact groupBy(term) shuffles every distinct
    * term. Null terms are skipped like count(col) semantics. The
    * finish sorts by (count desc, term asc) for deterministic output.
    */
  final class HeavyHitters(capacity: Int)
    extends Aggregator[String, MgState, Seq[(String, Long)]] {
    require(capacity >= 1, s"heavy hitters need capacity >= 1, got $capacity")
    def zero: MgState = MgState(capacity, Array.empty, Array.empty)
    def reduce(b: MgState, t: String): MgState =
      if (t == null) b else b.insert(t, 1L)
    def merge(b1: MgState, b2: MgState): MgState = b1.merge(b2)
    def finish(r: MgState): Seq[(String, Long)] =
      r.terms.zip(r.counts).sortBy { case (t, c) => (-c, t) }.toSeq
    def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** `df.agg(heavyHitters(col("term"), 4096))` → array<struct<_1,_2>>
    * of (term, count) sorted by count desc, term asc.
    */
  def heavyHitters(term: Column, capacity: Int): Column =
    udaf(new HeavyHitters(capacity)).apply(term)

  /** Bottom-k-by-hash quantile sample: the k rows with the
    * lexicographically smallest (u, value) keys, kept as parallel
    * ascending arrays (duplicates kept — a uniform sample is a
    * multiset, unlike KMV's distinct-hash set). Because bottom-k of a
    * multiset is partitioning-invariant and `u` is a pure hash of each
    * row's key, the sample — and therefore every quantile pick — is
    * deterministic, so the sketch sits under the oracle hash gate like
    * KMV.
    */
  final case class QsState(k: Int, var n: Int, us: Array[Double], vs: Array[Double]) {
    // us/vs are fixed k-capacity arrays with the first n entries valid,
    // mutated IN PLACE (the CmsState pattern): a displacing insert is
    // one backward arraycopy shift, never a pair of fresh allocations —
    // the buffer lives across millions of reduce() calls inside
    // ObjectHashAggregate, so per-insert allocation was the hot cost.
    def insert(u: Double, v: Double): QsState = {
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (us(mid) < u || (us(mid) == u && vs(mid) < v)) lo = mid + 1 else hi = mid
      }
      if (lo >= k) this
      else {
        val newN = math.min(n + 1, k)
        val shift = newN - 1 - lo // elements moved right; the k-th falls off
        if (shift > 0) {
          System.arraycopy(us, lo, us, lo + 1, shift)
          System.arraycopy(vs, lo, vs, lo + 1, shift)
        }
        us(lo) = u
        vs(lo) = v
        n = newN
        this
      }
    }

    def merge(other: QsState): QsState = {
      var acc = this
      var i = 0
      while (i < other.n) { acc = acc.insert(other.us(i), other.vs(i)); i += 1 }
      acc
    }

    /** percentile_disc(p) over the sample: the smallest sampled value
      * with cume_dist ≥ p. `ceil(p·m)` alone overshoots by one when
      * the double product rounds up past an integer (0.95·100 =
      * 95.000…01 → 96, but 95/100 ≥ 0.95 already holds) — the same
      * guarded step-down as [[Percentiles.discRank]], replayed
      * identically by the q89 oracle.
      */
    def quantiles(ps: Seq[Double]): Seq[Double] = {
      val sorted = vs.take(n).sorted
      val m = sorted.length
      ps.map { p =>
        val k0 = math.min(math.max(math.ceil(p * m).toInt, 1), m)
        val rank = if (k0 > 1 && (k0 - 1).toDouble / m >= p) k0 - 1 else k0
        sorted(rank - 1)
      }
    }
  }

  /** One-pass mergeable approximate quantiles — the bounded-memory
    * scale path next to the exact two-pass percentile plan: map-side
    * partial bottom-k samples, k (u, value) pairs per group over the
    * wire, O(k) memory per group regardless of group size, no
    * per-group sort shuffle. Rows with a null value or hash are
    * skipped like percentile semantics. Output: one pick per
    * requested p, in order.
    */
  final class QuantileSketch(k: Int, ps: Seq[Double])
    extends Aggregator[(Option[Double], Option[Double]), QsState, Seq[Double]] {
    require(k >= 1, s"quantile sketch needs k >= 1, got $k")
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      s"quantile probabilities must be in (0, 1], got $ps")
    def zero: QsState = QsState(k, 0, new Array[Double](k), new Array[Double](k))
    def reduce(b: QsState, a: (Option[Double], Option[Double])): QsState = a match {
      case (Some(u), Some(v)) => b.insert(u, v)
      case _ => b
    }
    def merge(b1: QsState, b2: QsState): QsState = b1.merge(b2)
    def finish(r: QsState): Seq[Double] = r.quantiles(ps)
    def bufferEncoder: Encoder[QsState] = Encoders.product[QsState]
    def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** `df.groupBy(...).agg(quantileSketch(col("u"), col("v"), 100,
    * Seq(0.5, 0.95)))` → array of one discrete-percentile pick per p
    * over the deterministic bottom-k-by-hash sample.
    */
  def quantileSketch(u: Column, value: Column, k: Int, ps: Seq[Double]): Column =
    udaf(new QuantileSketch(k, ps)).apply(u, value)

  /** Count-min sketch: d hash rows × w counters. Each occurrence adds
    * its weight to one counter per row; the frequency estimate for a
    * term is the MIN of its d counters — an overestimate by exactly the
    * colliding mass, never an underestimate. d·w longs of state per
    * group regardless of distinct-term count: frequency queries over a
    * 100 TB corpus without the distinct-term shuffle an exact
    * groupBy(term) pays (the same wire-size argument as KMV/MG above).
    *
    * Probe positions come from the same md5-slice family as `Bloom`
    * (row i = hex slice i mod w), so the DuckDB oracle rebuilds the
    * identical counter matrix from per-term exact counts — the q96
    * gate checks the collision arithmetic itself, not just the happy
    * path.
    */
  final case class CmsState(width: Int, counts: Array[Long]) {
    def add(positions: Seq[Long], weight: Long): CmsState = {
      var i = 0
      while (i < positions.length) {
        counts(i * width + positions(i).toInt) += weight
        i += 1
      }
      this
    }
    def merge(other: CmsState): CmsState = {
      var i = 0
      while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
      this
    }
  }

  /** Aggregator over a `Bloom.positions(h, d, w)` array column: one
    * occurrence per input row (weight 1).
    */
  final class CmsBuild(d: Int, w: Int) extends Aggregator[Seq[Long], CmsState, Array[Long]] {
    require(d >= 1 && d <= Bloom.MaxK, s"count-min depth must be in [1, ${Bloom.MaxK}], got $d")
    def zero: CmsState = CmsState(w, new Array[Long](d * w))
    def reduce(b: CmsState, a: Seq[Long]): CmsState = if (a == null) b else b.add(a, 1L)
    def merge(b1: CmsState, b2: CmsState): CmsState = b1.merge(b2)
    def finish(r: CmsState): Array[Long] = r.counts
    def bufferEncoder: Encoder[CmsState] = Encoders.product[CmsState]
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
  }

  /** Distributed one-job build over a term column; the d·w counter
    * matrix comes back row-major (sketch-sized, never row data).
    */
  def cmsBuild(terms: DataFrame, term: Column, d: Int, w: Int): Array[Long] =
    terms.select(Bloom.positions(Bloom.md5Hex(term), d, w).as("p"))
      .agg(udaf(new CmsBuild(d, w)).apply(col("p")).as("c"))
      .head().getSeq[Long](0).toArray

  /** Point estimate for a term column against a built counter matrix:
    * min over the d counters, as pure built-in expressions over one
    * literal array reference (codegen-friendly, no join).
    */
  def cmsEstimate(term: Column, counts: Array[Long], d: Int, w: Int): Column = {
    val c = typedLit(counts)
    val pos = Bloom.positions(Bloom.md5Hex(term), d, w)
    val reads = (0 until d).map { i =>
      element_at(c, (element_at(pos, i + 1) + i.toLong * w).cast("int") + 1)
    }
    if (d == 1) reads.head else least(reads: _*)
  }

  /** HyperLogLog registers per group — 64 buckets, every bit derived
    * from md5 so it is *engine-portable*, unlike engine-native HLLs
    * (the reason KMV was this library's first distinct sketch; this is
    * the register-pipeline counterpart, under the same gate idea). For
    * key hash hex `h`: bucket = first byte mod 64; rho = 1 + leading
    * zero bits of the next 52 bits (53 when all zero). Register j =
    * max rho over its keys — idempotent and order-free, so duplicates
    * need no pre-distinct and merge is elementwise max: 64 ints per
    * group over the wire, the same mergeable-partials wire-size
    * argument as KMV/MG/CMS.
    *
    * The estimate stays INTEGER-EXACT end to end (no libm, the q97
    * rule): Z's harmonic sum is the exact integer
    * Zint = Σ_j 2^(53 − M[j])  (≤ 64·2^53 < 2^63),
    * and the raw HLL estimate α·m²/Z becomes
    * est = floor(709·4096·2^53 / (1000·Zint)) computed in BigInt —
    * the DuckDB oracle replays it with HUGEINT division. Output:
    * (registers, zint, est). The raw estimator is gated as-is; the
    * small-range linear-counting correction is deliberately omitted
    * (it needs log; KMV/q71 already covers the exact-below-saturation
    * regime).
    */
  final case class HllState(regs: Array[Int]) {
    def insert(hex: String): HllState = {
      val bucket = Integer.parseInt(hex.substring(0, 2), 16) % 64
      var i = 0
      while (i < 13 && hex.charAt(2 + i) == '0') i += 1
      val rho =
        if (i == 13) 53
        else {
          val d = Character.digit(hex.charAt(2 + i), 16)
          val nib = if (d >= 8) 0 else if (d >= 4) 1 else if (d >= 2) 2 else 3
          i * 4 + nib + 1
        }
      if (rho > regs(bucket)) regs(bucket) = rho
      this
    }

    def merge(other: HllState): HllState = {
      var j = 0
      while (j < 64) {
        if (other.regs(j) > regs(j)) regs(j) = other.regs(j)
        j += 1
      }
      this
    }
  }

  final case class HllResult(registers: Seq[Int], zint: Long, est: Long)

  /** `est` numerator: 709 · 4096 · 2^53 (α₆₄ = 0.709 as 709/1000). */
  val HllEstNumerator: BigInt = BigInt(709L * 4096L) << 53

  final class HllSketch extends Aggregator[String, HllState, HllResult] {
    def zero: HllState = HllState(new Array[Int](64))
    def reduce(b: HllState, a: String): HllState =
      if (a == null) b else b.insert(a)
    def merge(b1: HllState, b2: HllState): HllState = b1.merge(b2)
    def finish(r: HllState): HllResult = {
      var zint = 0L
      var j = 0
      while (j < 64) { zint += 1L << (53 - r.regs(j)); j += 1 }
      val est = (HllEstNumerator / (BigInt(1000) * zint)).toLong
      HllResult(r.regs.toSeq, zint, est)
    }
    def bufferEncoder: Encoder[HllState] = Encoders.product[HllState]
    def outputEncoder: Encoder[HllResult] = Encoders.product[HllResult]
  }

  /** `df.groupBy(...).agg(hllSketch(md5hex_col))` — pass the 32-char
    * md5 hex of the key (see [[Bloom.md5Hex]]).
    */
  def hllSketch(hashHex: Column): Column =
    udaf(new HllSketch).apply(hashHex)
}
