package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** L22 PII scrubbing: exact redaction behavior on hostile fixtures —
  * multi-match lines, both phone separator styles, boundary IPs,
  * lookalikes that must NOT be redacted, and idempotence (a second scrub
  * is a no-op because the replacement tokens can't match any pattern).
  * q87 gates the cross-engine dialect parity; this spec pins the
  * single-engine semantics the patterns promise.
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.redactPii(col("t"))).head.getString(0)

  test("email: mid-sentence, plus-tag and subdomain forms") {
    assert(scrub("mail jane.doe+work@sub.example.co.nz today") ===
      "mail <EMAIL> today")
    assert(scrub("a@b.io,c_d%e@f-g.com") === "<EMAIL>,<EMAIL>")
  }

  test("phone: space and dash separators, not bare digit runs") {
    assert(scrub("call +64 21 5550199 now") === "call <PHONE> now")
    assert(scrub("or +1-800-5550123") === "or <PHONE>")
    // no leading +cc → not a phone (too many false positives otherwise)
    assert(scrub("order 123 456 7890123") === "order 123 456 7890123")
  }

  test("ipv4: whole-word quads only; short quads survive") {
    assert(scrub("host 10.0.0.1.") === "host <IP>.")
    assert(scrub("v 1.2.3 stays") === "v 1.2.3 stays")
  }

  test("lookalikes survive: no TLD, bare plus, word-adjacent digits") {
    assert(scrub("a@b and + and x1.2.3y") === "a@b and + and x1.2.3y")
  }

  test("mixed line redacts every category") {
    val in = "u@ex.com +64 21 5550199 10.0.0.1"
    assert(scrub(in) === "<EMAIL> <PHONE> <IP>")
  }

  test("idempotent: scrubbing redacted text changes nothing") {
    val once = scrub("u@ex.com +64 21 5550199 10.0.0.1 and u2@ex.org")
    assert(scrub(once) === once)
  }

  test("Column form and pure-JVM form agree (the PropertySpec bridge)") {
    val fixtures = Seq(
      "mail jane.doe+work@sub.example.co.nz today",
      "a@b.io,c_d%e@f-g.com", "call +64 21 5550199 now",
      "or +1-800-5550123", "host 10.0.0.1.", "v 1.2.3 stays",
      "a@b and + and x1.2.3y", "u@ex.com +64 21 5550199 10.0.0.1")
    fixtures.foreach { s =>
      assert(scrub(s) === TextFunctions.redactPiiString(s),
        s"Spark regexp_replace and String.replaceAll must agree on: $s")
    }
  }
}
