package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

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
}
