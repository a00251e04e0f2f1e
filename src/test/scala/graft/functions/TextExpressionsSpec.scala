package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The codegen'd shingle kernel must be indistinguishable from the
  * declarative formulation it replaced:
  * `array_distinct(transform(sequence(1, size(w)-k+1), i ->
  * array_join(slice(w, i, k), ' ')))` over `w = split(text, ' ')`,
  * with null for fewer than k words (the old pre-filter's drop set).
  */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def oldForm(k: Int) = expr(
    s"CASE WHEN size(split(text, ' ')) >= $k THEN " +
      s"array_distinct(transform(sequence(1, size(split(text, ' ')) - ${k - 1}), " +
      s"i -> array_join(slice(split(text, ' '), i, $k), ' '))) END")

  test("matches the declarative formulation on varied texts, k=2 and k=3") {
    TextExpressions.register(spark)
    val texts = Seq(
      "a b c d e", "a a a a", "one two", "single", "",
      "a  b   c", " leading", "trailing ", "a b a b a b",
      "x y z x y z x y", "a"
    ).toDF("text")
    for (k <- Seq(2, 3)) {
      val diff = texts
        .select($"text",
          call_function("graft_shingles", $"text", lit(k)).as("fast"),
          oldForm(k).as("slow"))
        .filter(!($"fast" <=> $"slow"))
        .collect()
      assert(diff.isEmpty, s"k=$k mismatches: ${diff.mkString(", ")}")
    }
  }

  test("null text yields null; order is first occurrence; result is distinct") {
    TextExpressions.register(spark)
    val got = Seq(("b a b a c a")).toDF("text")
      .select(call_function("graft_shingles", $"text", lit(2)).as("s"))
      .as[Seq[String]].head()
    assert(got == Seq("b a", "a b", "a c", "c a"))
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(call_function("graft_shingles", $"text", lit(3)).as("s"))
      .collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("works in SQL through the extensions registry") {
    graft.sql.GraftExtensions.register(spark)
    val n = spark.sql(
      "SELECT graft_shingles('w1 w2 w3 w4', 3) AS s").as[Seq[String]].head()
    assert(n == Seq("w1 w2 w3", "w2 w3 w4"))
  }
}
