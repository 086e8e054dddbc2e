package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The native L25 encoding-cleanup expression: canonicalizes decomposed
  * diacritics per UAX#15, is idempotent, handles nulls, resolves in raw
  * SQL, and stays inside whole-stage codegen. Fixtures use explicit
  * unicode escapes -- decomposed (base + combining mark) inputs vs their
  * precomposed NFC forms -- so the file's own encoding can't blur what
  * is being tested.
  */
class NfcNormalizeExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val Decomposed = "cafe\u0301" // e + combining acute
  private val Composed = "caf\u00e9"

  test("decomposed forms collapse to precomposed; NFC text passes through") {
    GraftExtensions.register(spark)
    val rows = Seq(
      Decomposed -> Composed,
      Composed -> Composed, // already NFC
      "zuo\u0308rich" -> "zu\u00f6rich", // mid-word o + combining diaeresis
      "A\u030angstro\u0308m" -> "\u00c5ngstr\u00f6m",
      "plain ascii" -> "plain ascii",
      "" -> "")
    rows.foreach { case (in, want) =>
      assert(NfcNormalizeExpression.nfc(in) === want, s"pure form on '$in'")
      assert(NfcNormalizeExpression.nfc(want) === want, "idempotent")
    }
    val got = rows.map(_._1).toDF("t")
      .select(NfcNormalizeExpression.nfcNormalize(col("t"))).as[String].collect()
    assert(got.toSeq === rows.map(_._2))
  }

  test("null-safe, resolves in raw SQL, and stays inside WholeStageCodegen") {
    GraftExtensions.register(spark)
    val df = Seq(Some(Decomposed), None).toDF("t")
      .select(NfcNormalizeExpression.nfcNormalize(col("t")).as("n"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ===
      Seq(Some(Composed), None))
    Seq(Decomposed).toDF("t").createOrReplaceTempView("nfc_v")
    assert(spark.sql("SELECT graft_nfc(t) FROM nfc_v").as[String].head() === Composed)
    val live = spark.range(3)
      .select(NfcNormalizeExpression.nfcNormalize(
        concat(lit(Decomposed), col("id"))).as("n"))
    assert(live.collect().map(_.getString(0)).toSeq ===
      (0 until 3).map(i => s"$Composed$i"))
    val plan = live.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_nfc"),
      s"expected the expression inside a codegen stage: $plan")
  }

  test("non-string input implicitly casts instead of crashing at runtime") {
    GraftExtensions.register(spark)
    // ImplicitCastInputTypes: a bigint argument gets a standard cast to
    // string under the hood -- never a runtime ClassCastException
    val got = spark.range(1, 2)
      .select(NfcNormalizeExpression.nfcNormalize(col("id"))).as[String].head()
    assert(got === "1")
  }
}
