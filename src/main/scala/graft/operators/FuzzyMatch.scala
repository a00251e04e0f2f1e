package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching (record linkage) at corpus scale.
  *
  * The naive formulation — `levenshtein(a.s, b.s) <= 1` as a join
  * condition — is an all-pairs nested loop: O(n²) distance
  * computations, dead at 100 TB. This operator uses
  * deletion-neighborhood blocking (the FastSS scheme, also the core of
  * SymSpell): every string generates its single-character deletion
  * variants plus itself; two strings within edit distance 1 MUST share
  * at least one variant (equal → share the original; insertion → the
  * longer string's deletion at the inserted position equals the shorter
  * original; substitution → both deletions at the differing position
  * coincide). Candidate generation is therefore an equi-join on the
  * variant key with recall 1, output ∝ true collisions, and the exact
  * `levenshtein` verify runs only on candidates — the same
  * generate-bucket-verify shape as the MinHash/SimHash miners in
  * [[graft.operators.TextDedup]].
  *
  * 100 TB design: the variant table is ≤ (len+1) rows per input row
  * (narrow projection, codegen'd `transform` over `sequence` — no UDF),
  * the self-join is hash-partitioned on the variant string, and
  * `maxVariantFreq` caps hot variants (e.g. a deletion shared by a
  * whole ID-numbering scheme) exactly like `maxShingleFreq` caps hot
  * shingles in the dedup miners — dropped variants only ever remove
  * candidates, and the verify keeps the survivors exact.
  */
object FuzzyMatch {

  /** `s` plus every single-character-deletion variant of `s`, as an
    * array column. Pure built-in functions (sequence + transform +
    * substr) so the whole neighborhood stays inside WholeStageCodegen.
    * `sequence(1, 0)` would count DOWN in Spark, so the empty string is
    * special-cased to its bare self.
    */
  def deletionNeighborhood(s: Column): Column = {
    val n = length(s)
    val deletions = transform(sequence(lit(1), n), i =>
      concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), n)))
    when(n === 0, array(s)).otherwise(concat(array(s), deletions))
  }

  /** All pairs of rows whose `strCol` values are within edit distance 1
    * (including exact duplicates at distance 0), with the exact
    * distance attached. Output: (id_a, id_b, dist), id_a < id_b.
    *
    * Recall is 1 by the deletion-neighborhood property unless
    * `maxVariantFreq` is set, in which case variants appearing in more
    * than that many rows are dropped from blocking (skew guard; a pair
    * is lost only if EVERY witness variant is hot). Precision is always
    * 1: sharing a variant does not imply distance ≤ 1 (e.g. "ab"/"ba"
    * share both "a" and "b" at distance 2), so every candidate is
    * verified with Spark's threshold-bounded `levenshtein(_, _, 1)` —
    * the O(k·n) banded form, not the full O(n²) matrix.
    */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String,
                         maxVariantFreq: Option[Int] = None): DataFrame = {
    // the id is compared with < and carried through equi-joins, so it
    // is widened to long — which silently casts a non-numeric id
    // (string UUIDs, ...) to null, and null ids are DROPPED by the
    // join conditions: the operator would return a partial result with
    // no error. Fail fast instead.
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"editDistance1Pairs needs an integral id column; '$idCol' is " +
        s"${idType.sql}. Map non-numeric ids to a surrogate long " +
        "(e.g. monotonically_increasing_id or a hash) first.")
    val docs = df.select(col(idCol).cast("long").as("_fm_id"),
                         col(strCol).as("_fm_s"))
    val variants = docs
      .select(col("_fm_id"),
              explode(array_distinct(deletionNeighborhood(col("_fm_s"))))
                .as("_fm_v"))
    val blocked = maxVariantFreq match {
      case None => variants
      case Some(cap) =>
        // anti join against the hot-variant list (the q86/q87 cap
        // pattern) — never a per-row array scan
        val hot = variants.groupBy("_fm_v").count()
          .filter(col("count") > cap).select("_fm_v")
        variants.join(hot, Seq("_fm_v"), "left_anti")
    }
    val cand = blocked.as("a")
      .join(blocked.as("b"),
            col("a._fm_v") === col("b._fm_v") &&
              col("a._fm_id") < col("b._fm_id"))
      .select(col("a._fm_id").as("id_a"), col("b._fm_id").as("id_b"))
      .distinct()
    cand
      .join(docs.select(col("_fm_id").as("id_a"), col("_fm_s").as("_fm_sa")),
            Seq("id_a"))
      .join(docs.select(col("_fm_id").as("id_b"), col("_fm_s").as("_fm_sb")),
            Seq("id_b"))
      .withColumn("dist", levenshtein(col("_fm_sa"), col("_fm_sb"), 1))
      .filter(col("dist") >= 0) // threshold form yields -1 when > 1
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }
}
