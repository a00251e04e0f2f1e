package graft.operators

import graft.SparkSpec
import graft.functions.TextShingling
import org.apache.spark.unsafe.types.UTF8String

/** Properties of the winnowing fingerprint kernel and its operator
  * (q114): selection correctness against a brute-force reference, the
  * rightmost-min tie-break, the MOSS shared-run guarantee, and the
  * null contract for short texts.
  */
class WinnowSpec extends SparkSpec {

  /** Brute-force reference: md5-prefix gram hashes, per-window
    * rightmost argmin, distinct positions ascending. */
  private def reference(text: String, k: Int, w: Int): Option[Seq[(Int, String)]] = {
    val words = text.split(" ", -1)
    val n = words.length - k + 1
    if (n < w) return None
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until n).map { i =>
      val d = md.digest(words.slice(i, i + k).mkString(" ")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      d.take(6).map(b => f"${b & 0xff}%02x").mkString
    }
    val sel = scala.collection.mutable.LinkedHashSet[Int]()
    for (i <- 0 to n - w) {
      val win = hs.slice(i, i + w)
      val m = win.min
      val rightmost = i + win.lastIndexOf(m)
      sel += rightmost
    }
    Some(sel.toSeq.sorted.map(p => (p + 1, hs(p))))
  }

  private def kernel(text: String, k: Int, w: Int): Option[Seq[(Int, String)]] = {
    val out = TextShingling.winnow(UTF8String.fromString(text), k, w)
    if (out == null) None
    else Some((0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2)
      (r.getInt(0), r.getUTF8String(1).toString)
    })
  }

  test("kernel equals brute-force reference on random word texts") {
    val rnd = new scala.util.Random(42)
    // tiny vocabulary => frequent hash ties, exercising the tie-break
    val vocab = Array("a", "b", "c")
    for (_ <- 1 to 200) {
      val nWords = 1 + rnd.nextInt(30)
      val text = Seq.fill(nWords)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val k = 1 + rnd.nextInt(3)
      val w = 1 + rnd.nextInt(4)
      assert(kernel(text, k, w) === reference(text, k, w), s"text=$text k=$k w=$w")
    }
  }

  test("rightmost occurrence wins on equal window minima") {
    // k=1, w=3: grams are the words; window [a,b,a] has min 'a' twice,
    // the RIGHTMOST (pos 3) must be selected
    val got = kernel("a b a", 1, 3).get
    assert(got.map(_._1) === Seq(3))
  }

  test("every selected hash is its window minimum and every window is covered") {
    val text = (1 to 40).map(i => s"w${i % 7}").mkString(" ")
    val (k, w) = (4, 5)
    val fps = kernel(text, k, w).get
    val words = text.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until words.length - k + 1).map { i =>
      val d = md.digest(words.slice(i, i + k).mkString(" ")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      d.take(6).map(b => f"${b & 0xff}%02x").mkString
    }
    val selected = fps.map(_._1 - 1).toSet
    for (i <- 0 to hs.length - w) {
      val win = (i until i + w)
      assert(win.exists(p => selected.contains(p) && hs(p) == win.map(hs).min),
        s"window at $i has no selected minimum")
    }
    for ((p, h) <- fps) assert(hs(p - 1) == h)
  }

  test("null for texts with fewer than k+w-1 words") {
    assert(kernel("a b c", 4, 5).isEmpty)
    assert(kernel("a b c d e f g", 4, 5).isEmpty) // 4 grams < w=5
    assert(kernel("a b c d e f g h", 4, 5).isDefined) // 5 grams == w
  }

  test("shared k+w-1-word run guarantees a shared fingerprint") {
    val rnd = new scala.util.Random(7)
    val (k, w) = (4, 5)
    val run = Seq.fill(k + w - 1)("shared" + rnd.nextInt(3)).mkString(" ")
    for (trial <- 1 to 20) {
      val prefixA = Seq.fill(rnd.nextInt(10))("a" + rnd.nextInt(5)).mkString(" ")
      val suffixB = Seq.fill(rnd.nextInt(10))("b" + rnd.nextInt(5)).mkString(" ")
      val docA = (if (prefixA.isEmpty) run else s"$prefixA $run")
      val docB = (if (suffixB.isEmpty) run else s"$run $suffixB")
      val fpA = kernel(docA, k, w).get.map(_._2).toSet
      val fpB = kernel(docB, k, w).get.map(_._2).toSet
      assert(fpA.intersect(fpB).nonEmpty, s"trial $trial: no shared fingerprint")
    }
  }

  test("winnowMatchStats joins share counts onto every fingerprint") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"), // exact dup of 1
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    ).toDF("doc_id", "text")
    val out = TextDedup.winnowMatchStats(docs, k = 4, w = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    // identical docs produce identical sketches, every hash shared by 2
    assert(byDoc(1L).map(t => (t._2, t._3)).toSet ===
      byDoc(2L).map(t => (t._2, t._3)).toSet)
    assert(byDoc(1L).forall(_._4 == 2L))
    assert(byDoc(3L).forall(_._4 == 1L))
  }
}
