package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

/** The native C10 expression: agrees with the UDF form, stays inside
  * whole-stage codegen, resolves in SQL, and handles nulls.
  */
class NormalizeKeyExpressionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val words = Seq("Āwhitu", "Ōtaki", "Taupō", "Whangārei",
    "PĀPĀMOA", "  Te Kūiti  ", "plain", "ü-umlaut").toDF("w")

  test("expression ≡ UDF ≡ pure Scala on diacritic forms") {
    GraftExtensions.register(spark)
    val rows = words
      .select(col("w"),
        NormalizeKeyExpression.normalizeKey(col("w")).as("native"),
        TextFunctions.normalizeKeyUdf(col("w")).as("viaUdf"))
      .collect()
    rows.foreach { r =>
      val want = TextFunctions.normalizeKey(r.getString(0))
      assert(r.getString(1) === want, s"native for '${r.getString(0)}'")
      assert(r.getString(2) === want)
    }
  }

  test("resolves in raw SQL via the extension registration") {
    GraftExtensions.register(spark)
    words.createOrReplaceTempView("words_v")
    val got = spark.sql("SELECT graft_normalize_key(w) FROM words_v WHERE w = 'Taupō'")
      .as[String].head()
    assert(got === "taupo")
  }

  test("null-safe and stays inside WholeStageCodegen") {
    GraftExtensions.register(spark)
    val df = Seq(Some("Ōtaki"), None).toDF("w")
      .select(NormalizeKeyExpression.normalizeKey(col("w")).as("n"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq === Seq(Some("otaki"), None))
    // a non-foldable source, or the whole projection constant-folds away
    val live = spark.range(4)
      .select(NormalizeKeyExpression.normalizeKey(
        concat(lit("Taupō"), col("id"))).as("n"))
    assert(live.collect().map(_.getString(0)).toSeq ===
      (0 until 4).map(i => s"taupo$i"))
    // `*(n)` prefixes mark WholeStageCodegen stages in the plan string;
    // the projection containing the expression must carry one
    val plan = live.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_normalize_key"),
      s"expected the expression inside a codegen stage:\n$plan")
  }

  test("extensions class installs the function on a fresh session") {
    val fresh = spark.newSession()
    new GraftExtensions().apply _ // class instantiable (config-path shape)
    GraftExtensions.register(fresh)
    assert(fresh.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_normalize_key")))
  }
}
