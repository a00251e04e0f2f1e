package graft.functions

import java.nio.charset.StandardCharsets

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

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Per-document SimHash over `split(text, " ")` words (empty words
    * included, like the explode it replaces). `bits` is 16 or 64; see
    * [[WordSimHash]] for the exact bit derivations.
    */
  def simhash(text: UTF8String, bits: Int): Long = {
    require(bits == 16 || bits == 64, s"graft_simhash supports 16 or 64 bits, got $bits")
    val words = text.toString.split(" ", -1)
    val votes = new Array[Int](bits)
    val md = md5.get()
    var i = 0
    while (i < words.length) {
      md.reset()
      val h = md.digest(words(i).getBytes(StandardCharsets.UTF_8))
      if (bits == 64) {
        var wh = 0L
        var b = 0
        while (b < 8) { wh = (wh << 8) | (h(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          if (((wh >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      } else {
        var j = 0
        while (j < 16) {
          val d = j / 4 // hex digit index; even = high nibble of byte d/2
          val byteV = h(d / 2) & 0xff
          val nib = if (d % 2 == 0) byteV >>> 4 else byteV & 0xf
          if (((nib >> (j % 4)) & 1) == 1) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

/** Native per-document SimHash — one narrow pass over the text instead
  * of the explode + 16/64-bit-sum groupBy the declarative form needs.
  * At corpus scale the difference is structural: the old shape
  * shuffles every WORD of the corpus into a per-doc aggregation; this
  * computes the signature next to the scan and shuffles nothing.
  *
  * Bit-exact with the aggregation it replaces (and with the DuckDB
  * oracles, which recompute from md5 hex):
  *  - 64-bit: word hash = first 16 md5 hex chars as a signed int64
  *    (`conv(substr(md5(w), 1, 16), 16, -10)`) = the first 8 digest
  *    bytes big-endian; signature bit j set iff Σ_words ±1 on
  *    (hash >>> j) & 1 is positive.
  *  - 16-bit: signature bit j set from the same signed vote on bit
  *    (j%4) of md5 hex DIGIT j/4 (digit 2i = high nibble of byte i).
  */
case class WordSimHash(text: Expression, bits: Expression)
  extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = bits
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (text.dataType != StringType || bits.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects (string, int), got " +
          s"(${text.dataType.simpleString}, ${bits.dataType.simpleString})")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(t: Any, b: Any): Any =
    TextShingling.simhash(t.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b) =>
      s"${ev.value} = graft.functions.TextShingling.simhash($t, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(text = newLeft, bits = newRight)
}

object TextExpressions {
  /** Register the text kernels in the session's function registry
    * (idempotent), for the DataFrame API and SQL alike.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", exprs => WordShingles(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => WordSimHash(exprs(0), exprs(1)), "built-in")
  }
}
