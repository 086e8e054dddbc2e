package graft.plans

import java.util.regex.Pattern

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** r19 optimization: the byte-level word splitter under the native text
  * kernels must reproduce `Pattern.compile("\\s+").split(trim, -1)` over
  * the decoded string exactly — including leading/trailing empty tokens,
  * the single empty token for empty input, and multi-byte UTF-8 payloads
  * (whose bytes are all ≥ 0x80 and can never collide with the ASCII
  * whitespace class).
  */
class WordBytesSpec extends AnyFunSuite {

  private val Ws = Pattern.compile("\\s+")

  private def reference(s: String): Seq[String] =
    Ws.split(UTF8String.fromString(s).trim.toString, -1).toSeq

  private def byteSplit(s: String): Seq[String] = {
    val w = WordBytes.split(UTF8String.fromString(s))
    (0 until w.count).map(i => w.word(i).toString)
  }

  test("byte split == regex split on adversarial inputs") {
    val cases = Seq(
      "", " ", "  ", "\t", "\t\t", "a", "a b", "a  b", " a b ",
      "a\tb\nc\rde\ff", "\ta", "a\t", "\ta\t", "   \t   ",
      "word", "multi  space   runs", "tab\tand space mix \t ",
      "日本語 テキスト です", "mixed 日本語 and ascii",
      "😀 emoji 😁\ttab", "ünïcödé wörds", "a\n\n\nb",
      "x" * 500 + " " + "y" * 500)
    cases.foreach { c =>
      assert(byteSplit(c) == reference(c), s"input=${c.take(40).replace("\n", "\\n")}")
    }
  }

  test("joined reproduces single-space word joins") {
    val w = WordBytes.split(UTF8String.fromString(" alpha  beta\tgamma "))
    assert(w.joined(0, 3).toString == "alpha beta gamma")
    assert(w.joined(1, 2).toString == "beta gamma")
    assert(w.joined(2, 1).toString == "gamma")
  }
}
