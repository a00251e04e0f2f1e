package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.operators.Similarity

/** Null/mismatch semantics of the native `graft_dot` expression: must be
  * indistinguishable from the `zip_with`+`aggregate` higher-order
  * fallback (`Similarity.dotHof`) — including NULL on length mismatch
  * and NULL on a null element (zip_with pads/propagates null, and
  * `acc + null` is null).
  */
class VectorExpressionsSpec extends SparkSpec {

  private def df = {
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("a", ArrayType(DoubleType)),
      StructField("b", ArrayType(DoubleType))))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("ok", Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
        Row("mismatch", Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
        Row("null_elem", Seq(1.0, null, 3.0), Seq(1.0, 2.0, 3.0)),
        Row("null_arr", null, Seq(1.0))),
      schema)
  }

  test("graft_dot matches the zip_with fallback on mismatched and null inputs") {
    VectorExpressions.register(spark)
    val out = df.select(col("name"),
        Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotHof(col("a"), col("b")).as("hof"))
      .collect().map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out("ok") == (Some(32.0), Some(32.0)))
    assert(out("mismatch") == (None, None))
    assert(out("null_elem") == (None, None))
    assert(out("null_arr") == (None, None))
  }

  test("interpreted eval path agrees with codegen on mismatch/null") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Seq[Any]) = Literal.create(xs, ArrayType(DoubleType))
    def ev(a: Seq[Any], b: Seq[Any]): Any = {
      val e = DotProduct(arr(a), arr(b))
      e.nullSafeEval(
        ArrayData.toArrayData(a.toArray),
        ArrayData.toArrayData(b.toArray))
    }
    assert(ev(Seq(1.0, 2.0), Seq(3.0, 4.0)) == 11.0)
    assert(ev(Seq(1.0, 2.0), Seq(3.0)) == null)
    assert(ev(Seq(1.0, null), Seq(3.0, 4.0)) == null)
  }
}
