package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick automaton properties (q116): overlapping counts,
  * fail-link traversal, nested patterns, and agreement with a
  * brute-force position-by-position scan on random inputs.
  */
class AhoCorasickSpec extends AnyFunSuite {

  private def brute(text: String, pats: Seq[String]): Seq[Long] =
    pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  private def ac(text: String, pats: Seq[String]): Seq[Long] =
    AhoCorasick.automaton(pats.mkString(AhoCorasick.Delimiter.toString))
      .count(text).toSeq

  test("overlapping occurrences are all counted") {
    assert(ac("aaaa", Seq("aa")) === Seq(3L))
    assert(ac("a a a", Seq("a a")) === Seq(2L))
  }

  test("nested and suffix patterns fire through output links") {
    // "table" ends inside every "value table" match; "an" inside "scan"
    assert(ac("value table scan", Seq("value table", "table", "an")) ===
      Seq(1L, 1L, 1L))
    assert(ac("banana", Seq("ana", "na", "banana")) === Seq(2L, 2L, 1L))
  }

  test("fail links cross pattern boundaries") {
    // after matching "ab" of "abc", input "abd" must fall back and
    // still find "bd"
    assert(ac("abd", Seq("abc", "bd")) === Seq(0L, 1L))
    assert(ac("ababc", Seq("abab", "babc")) === Seq(1L, 1L))
  }

  test("agrees with brute force on random texts") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc "
    val pats = Seq("a", "ab", "ba c", "cc", "b b", "abc", "ca")
    for (_ <- 1 to 300) {
      val text = Seq.fill(1 + rnd.nextInt(60))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(ac(text, pats) === brute(text, pats), s"text='$text'")
    }
  }

  test("empty text matches nothing; missing patterns count zero") {
    assert(ac("", Seq("a", "b")) === Seq(0L, 0L))
    assert(ac("xyz", Seq("a", "q")) === Seq(0L, 0L))
  }

  test("malformed pattern string with empty segment fails fast, never misaligns") {
    val d = AhoCorasick.Delimiter
    intercept[IllegalArgumentException] {
      AhoCorasick.automaton(s"a${d}${d}b") // doubled delimiter
    }
    intercept[IllegalArgumentException] {
      AhoCorasick.automaton(s"a${d}b${d}") // trailing delimiter
    }
  }
}
