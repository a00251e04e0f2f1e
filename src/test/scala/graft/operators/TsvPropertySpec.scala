package graft.operators

import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the TSV cell encoding — the null/escape
  * fidelity the reference's golden tests pin down (`tests/test.sh:67-79`),
  * generalized over arbitrary strings (raw ScalaCheck generators).
  */
class TsvPropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 500): Seq[A] =
    Iterator.continually(gen.sample).flatten.take(n).toSeq

  private val strings: Seq[String] =
    samples(Arbitrary.arbitrary[String]) ++
      Seq("", "\n", "\t\t", "\\", "\\N", "a\tb\nc\rd\\e", "\\n literal")

  test("escaped text never contains raw control bytes") {
    strings.foreach { s =>
      val e = TsvProtocol.escape(s)
      assert(!e.contains('\n') && !e.contains('\t') && !e.contains('\r'), s"for ${s.toList}")
    }
  }

  test("escape/unescape round-trips every string") {
    strings.foreach { s =>
      assert(TsvProtocol.unescape(TsvProtocol.escape(s)) == s, s"for ${s.toList}")
    }
  }

  test("formatValue distinguishes null vs empty vs value") {
    assert(TsvProtocol.formatValue(null) == "\\N")
    assert(TsvProtocol.formatValue("") == "")
    assert(TsvProtocol.formatValue("\\N") == "\\\\N")
    assert(TsvProtocol.formatValue(Double.NaN) == "nan")
    assert(TsvProtocol.formatValue(java.lang.Boolean.TRUE) == "true")
  }

  test("row formatting joins with single tabs regardless of content") {
    samples(Gen.zip(Arbitrary.arbitrary[String], Arbitrary.arbitrary[String]), 300)
      .foreach { case (a, b) =>
        val cells = TsvProtocol.formatRow(org.apache.spark.sql.Row(a, b)).split("\t", -1)
        assert(cells.length == 2)
        assert(TsvProtocol.unescape(cells(0)) == a && TsvProtocol.unescape(cells(1)) == b)
      }
  }
}
