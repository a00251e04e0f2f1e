package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word k-gram shingling — the hot
  * primitive of every text-dedup / contamination / boilerplate
  * operator.
  *
  * The declarative formulation
  * `array_distinct(transform(sequence(1, size(w)-k+1), i ->
  * array_join(slice(w, i, k), ' ')))` evaluates an interpreted lambda
  * per gram (plus a `slice` array copy per gram) and blocks whole-stage
  * codegen for the enclosing Project — measured ~2 s per corpus scan at
  * sf0.1, multiplied across every operator that shingles. This
  * expression builds the distinct gram set in one tight JVM loop and
  * stays inside WholeStageCodegen via a static call.
  *
  * Semantics are IDENTICAL to the formulation it replaces:
  * words = `split(text, " ")` (Java regex split, limit −1, trailing
  * empties kept — the same call Spark's `split` makes); grams are the
  * `n-k+1` consecutive k-word joins; the result keeps FIRST-occurrence
  * order (like `array_distinct`); fewer than k words — the rows the
  * old `size(w) >= k` pre-filter dropped — yields NULL so callers
  * filter `isNotNull` instead.
  */
case class WordShingles(text: Expression, k: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = k
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (text.dataType != StringType || k.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles expects (string, int), got " +
          s"(${text.dataType.simpleString}, ${k.dataType.simpleString})")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(t: Any, kk: Any): Any =
    TextShingling.shingles(t.asInstanceOf[UTF8String], kk.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, kk) => {
      s"""
         |${ev.value} = graft.functions.TextShingling.shingles($t, $kk);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(text = newLeft, k = newRight)
}

/** Static shingling kernel, shared by interpreted eval and codegen. */
object TextShingling {
  /** Distinct word k-grams of `text` in first-occurrence order, or null
    * when the text has fewer than k words (the caller's drop condition).
    */
  def shingles(text: UTF8String, k: Int): GenericArrayData = {
    // the exact split Spark's split(text, " ") performs
    val words = text.toString.split(" ", -1)
    if (words.length < k) return null
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }
}

object TextExpressions {
  /** Register `graft_shingles` in the session's function registry
    * (idempotent), for the DataFrame API and SQL alike.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => WordShingles(exprs(0), exprs(1)), "built-in")
}
