package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** r18 optimization round: the text kernels were rewritten onto
  * zero-copy byte ranges (one word-offset pass per document, grams as
  * contiguous byte slices, md5 into reusable buffers) and two fused
  * kernels were added (graft_char_windows, graft_gram_hashes). Every
  * rewrite must be INDISTINGUISHABLE from the formulation it replaced
  * — including on multi-byte UTF-8, which the gated corpora (ASCII)
  * never exercise. References here are either the old declarative SQL
  * shape or a direct String/MessageDigest reimplementation of the old
  * kernel code.
  */
class KernelEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  // spaces runs, leading/trailing, empty, 2-byte (é/ö), 3-byte (CJK),
  // 4-byte (emoji), and mixtures — the byte-splitting edge cases
  private val texts = Seq(
    "a b c d e f g h", "single", "", " ", "a  b   c", " lead", "trail ",
    "héllo wörld déjà vu über straße", "你好 世界 你好 世界 再见",
    "mix 你好 with ascii und öäü", "🌍 emoji 🚀 test 🌍 emoji",
    "a🌍b c你d e", "é é é é é", ("word " * 40).trim, ("ab cd " * 30).trim
  )

  private def df = texts.toDF("text")

  test("graft_char_windows == explode(sequence) + substring, unicode included") {
    TextExpressions.register(spark)
    for (w <- Seq(3, 7)) {
      val slow = expr(
        s"CASE WHEN length(text) >= $w THEN transform(" +
          s"sequence(1, length(text) - ${w - 1}), p -> substring(text, p, $w)) END")
      val diff = df.select($"text",
          call_function("graft_char_windows", $"text", lit(w)).as("fast"),
          slow.as("slow"))
        .filter(!($"fast" <=> $"slow")).collect()
      assert(diff.isEmpty, s"w=$w mismatches: ${diff.mkString("; ")}")
    }
  }

  test("graft_gram_hashes == conv(substring(md5(gram), 1, N), 16, 10) per gram") {
    TextExpressions.register(spark)
    for ((k, n) <- Seq((2, 8), (3, 12))) {
      val slow = expr(
        s"transform(graft_grams(text, $k), g -> " +
          s"CAST(conv(substring(md5(CAST(g AS BINARY)), 1, $n), 16, 10) AS BIGINT))")
      val diff = df.select($"text",
          call_function("graft_gram_hashes", $"text", lit(k), lit(n)).as("fast"),
          slow.as("slow"))
        .filter(!($"fast" <=> $"slow")).collect()
      assert(diff.isEmpty, s"k=$k,n=$n mismatches: ${diff.mkString("; ")}")
    }
  }

  test("graft_grams and graft_spans == split + slice + array_join, unicode included") {
    TextExpressions.register(spark)
    val gramsSlow = expr(
      "CASE WHEN size(split(text, ' ')) >= 3 THEN transform(" +
        "sequence(1, size(split(text, ' ')) - 2), " +
        "i -> array_join(slice(split(text, ' '), i, 3), ' ')) END")
    val spansSlow = expr(
      "transform(sequence(0, CAST(ceil(size(split(text, ' ')) / 4.0) AS INT) - 1), " +
        "i -> array_join(slice(split(text, ' '), i * 4 + 1, 4), ' '))")
    val diff = df.select($"text",
        call_function("graft_grams", $"text", lit(3)).as("gf"), gramsSlow.as("gs"),
        call_function("graft_spans", $"text", lit(4)).as("sf"), spansSlow.as("ss"))
      .filter(!($"gf" <=> $"gs") || !($"sf" <=> $"ss")).collect()
    assert(diff.isEmpty, diff.mkString("; "))
  }

  // --- direct reimplementations of the pre-r18 kernel code paths ---

  private def md5Of(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))

  test("graft_simhash(64) matches the String-based reference, unicode included") {
    TextExpressions.register(spark)
    def ref(text: String): Long = {
      val votes = new Array[Int](64)
      for (w <- text.split(" ", -1)) {
        val h = md5Of(w)
        var wh = 0L
        for (b <- 0 until 8) wh = (wh << 8) | (h(b) & 0xffL)
        for (j <- 0 until 64)
          if (((wh >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
      }
      (0 until 64).foldLeft(0L)((s, j) => if (votes(j) > 0) s | (1L << j) else s)
    }
    val got = df.select($"text",
        call_function("graft_simhash", $"text", lit(64)).as("h"))
      .as[(String, Long)].collect()
    for ((t, h) <- got) assert(h == ref(t), s"simhash mismatch on '$t'")
  }

  test("graft_cdc matches the String-based reference, unicode included") {
    TextExpressions.register(spark)
    def ref(text: String, w: Int, d: Long): Seq[Int] = {
      val words = text.split(" ", -1)
      val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (i <- (w - 1) until (words.length - 1)) {
        val gram = words.slice(i - w + 1, i + 1).mkString(" ")
        val dg = md5Of(gram)
        var h = 0L
        for (b <- 0 until 6) h = (h << 8) | (dg(b) & 0xffL)
        if (h % d == 0L) ends += i
      }
      ends += words.length - 1
      ends.toSeq
    }
    val got = df.select($"text",
        call_function("graft_cdc", $"text", lit(3), lit(4)).as("c"))
      .as[(String, Seq[Int])].collect()
    for ((t, c) <- got) assert(c == ref(t, 3, 4L), s"cdc mismatch on '$t'")
  }

  test("graft_fhash matches the String-based reference, unicode included") {
    TextExpressions.register(spark)
    def ref(text: String, dim: Int): Seq[Long] = {
      val acc = new Array[Long](dim)
      for (w <- text.split(" ", -1) if w.nonEmpty) {
        val h = md5Of(w)
        var pre = 0L
        for (b <- 0 until 6) pre = (pre << 8) | (h(b) & 0xffL)
        val hv = (pre << 4) | ((h(6) & 0xf0L) >>> 4)
        val sign = if ((h(6) & 0x01) == 1) 1L else -1L
        acc((hv % dim).toInt) += sign
      }
      acc.toSeq
    }
    val got = df.select($"text",
        call_function("graft_fhash", $"text", lit(64)).as("v"))
      .as[(String, Seq[Long])].collect()
    for ((t, v) <- got) assert(v == ref(t, 64), s"fhash mismatch on '$t'")
  }

  test("graft_winnow matches the String-based reference, unicode included") {
    TextExpressions.register(spark)
    def ref(text: String, k: Int, w: Int): Option[Seq[(Int, String)]] = {
      val words = text.split(" ", -1)
      val n = words.length - k + 1
      if (n < w) return None
      val hs = (0 until n).map { i =>
        md5Of(words.slice(i, i + k).mkString(" ")).take(6)
          .map("%02x".format(_)).mkString
      }
      val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
      var last = -1
      val deque = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (i <- 0 until n) {
        while (deque.nonEmpty && hs(deque.last).compareTo(hs(i)) >= 0)
          deque.remove(deque.size - 1)
        deque += i
        if (i >= w - 1) {
          while (deque.head <= i - w) deque.remove(0)
          if (deque.head != last) { sel += deque.head; last = deque.head }
        }
      }
      Some(sel.toSeq.map(s => (s + 1, hs(s))))
    }
    val got = df.select($"text",
        call_function("graft_winnow", $"text", lit(2), lit(3)).as("f"))
      .as[(String, Option[Seq[(Int, String)]])].collect()
    for ((t, f) <- got) assert(f == ref(t, 2, 3), s"winnow mismatch on '$t'")
  }

  test("graft_pq_assign matches the literal argmin-tree formulation bit-for-bit") {
    VectorExpressions.register(spark)
    val rnd = new scala.util.Random(42)
    val dim = 16; val m = 4; val k = 5
    val sub = dim / m
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(dim)((rnd.nextGaussian() * 3).toFloat).toSeq))
    val gmx = vecs.flatMap(_._2).map(x => math.abs(x.toDouble)).max
    val flat = Array.fill(m * k * sub)(math.floor(rnd.nextGaussian() * 20)).toSeq
    val emb = vecs.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    // the pre-r18 formulation: quantize HOF + per-subspace literal
    // argmin over struct(score, kk), d2 = dot(qs, qs) + score
    val q = expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / " +
      s"(${gmx}D / 127.0D) + 0.5D) AS DOUBLE))")
    val perMs = (0 until m).map { ms =>
      val qs = slice(q, ms * sub + 1, sub)
      val cents = (0 until k).map(kk =>
        flat.slice((ms * k + kk) * sub, (ms * k + kk) * sub + sub))
      val best = array_min(array(cents.zipWithIndex.map { case (c, kk) =>
        struct((lit(c.map(x => x * x).sum) - lit(2.0) *
          call_function("graft_dot", qs, typedLit(c))).as("score"),
          lit(kk).as("kk"))
      }: _*))
      struct(lit(ms).cast("long").as("m_sub"),
        best.getField("kk").cast("long").as("code"),
        (call_function("graft_dot", qs, qs) + best.getField("score"))
          .cast("long").as("d2"))
    }
    val slow = emb.select($"vec_id", explode(array(perMs: _*)).as("e"))
      .select($"vec_id", $"e.m_sub", $"e.code", $"e.d2")
    val fast = emb.select($"vec_id", explode(call_function("graft_pq_assign",
        $"embedding", lit(gmx), typedLit(flat), lit(m), lit(k))).as("e"))
      .select($"vec_id", $"e.m_sub", $"e.code", $"e.d2")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      "pq_assign diverges from the literal-tree formulation")
  }
}
