package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{Sketches, TextFunctions}

/** The native shingle expression must agree bit-for-bit with the original
  * lambda formulation (kept here as the reference), including the edges:
  * fewer words than n, exactly n, duplicates (first-seen order), runs of
  * whitespace, empty and null text. And it must stay inside whole-stage
  * codegen — the whole point of going native.
  */
class WordShinglesExpressionSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-8 Column formulation, verbatim — the semantic oracle. */
  private def lambdaForm(text: org.apache.spark.sql.Column, n: Int) = {
    val words = split(trim(text), "\\s+")
    val count = size(words)
    val idx = sequence(lit(0), greatest(count - n, lit(0)))
    array_distinct(
      when(count >= n,
        transform(idx, i => array_join(slice(words, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  private val fixtures = Seq(
    Some("a b c d e"),
    Some("a b"), // fewer than n=3 words → empty
    Some("a b c"), // exactly n
    Some("x y x y x y x y"), // duplicate shingles → distinct, first-seen
    Some("  spaced   out\ttabs  "), // whitespace runs + trim
    // tab/newline EDGES: Spark's trim strips spaces only, so the split
    // keeps empty edge words — Java String.trim would eat them (the
    // round-8 ADVICE divergence; the kernel must use UTF8String.trim)
    Some("\tfoo bar\n"),
    Some("\n\t a b c \t\n"),
    Some("solo"),
    Some(""),
    None)

  test("native ≡ lambda formulation on hostile fixtures, n = 2, 3, 8") {
    GraftExtensions.register(spark)
    val df = fixtures.toDF("t")
    Seq(2, 3, 8).foreach { n =>
      val rows = df.select(
        Sketches.shingles(col("t"), n).as("native"),
        lambdaForm(col("t"), n).as("lambda")).collect()
      rows.zip(fixtures).foreach { case (r, in) =>
        assert(r.getSeq[String](0) === r.getSeq[String](1),
          s"native vs lambda diverge for n=$n on $in")
      }
    }
  }

  test("stays inside WholeStageCodegen on a live source") {
    GraftExtensions.register(spark)
    val live = spark.range(4)
      .select(TextFunctions.wordShingles(
        concat(lit("a b c d "), col("id")), 3).as("sh"))
    assert(live.collect().length === 4)
    val plan = live.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"expected the shingle projection inside a codegen stage: $plan")
  }
}
