package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The codegen-resident optimizer fence ([[BarrierExpression]]) and the
  * native any-contains predicate ([[AnyContainsExpression]]) that replaced
  * the row-encoder fence / HOF lambda on the hot paths (VERDICT r10 #4:
  * close the interpreted islands).
  */
class BarrierExpressionSpec extends SparkSpec {

  import spark.implicits._

  test("barrier is the identity on values, including nulls") {
    val df = Seq(("a", 1), (null, 2), ("c", 3)).toDF("s", "i")
      .select(
        call_function("graft_barrier", col("s")).as("bs"),
        call_function("graft_barrier", col("i") * 2).as("bi"))
    assert(df.collect().map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("a", 2), (null, 4), ("c", 6)))
  }

  test("barrier pins an expensive expression to ONE evaluation site") {
    // file-backed source: literal frames constant-fold away and would
    // bypass CollapseProject entirely (SparkSpec gotcha)
    val dir = java.nio.file.Files.createTempDirectory("barrier").toString
    spark.range(100)
      .select(col("id"), concat(lit("{\"k\":\""), col("id"), lit("\"}")).as("js"))
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val mt = org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType)
    // the filter-DSL shape (q31): predicates AND projections reference the
    // parsed column — predicate pushdown + CollapseProject clone the parse
    // into every reference site
    def shape(parsed: org.apache.spark.sql.Column) =
      src.select(col("id"), parsed.as("m"))
        .filter(col("m")("k").isNotNull && (col("m")("k") =!= "5"))
        .select(col("m")("k").as("a"), length(col("m")("k")).as("d"))

    // WITHOUT the barrier: the parse is duplicated (3 copies measured —
    // the blowup the fence exists for; round 2 measured 251 on q43)
    val bare = shape(from_json(col("js"), mt))
    val bareParses = "from_json".r
      .findAllIn(bare.queryExecution.optimizedPlan.toString).length
    assert(bareParses > 1, s"expected inlining without barrier, got $bareParses")

    // WITH the barrier: exactly one parse survives optimization
    val fenced = shape(call_function("graft_barrier", from_json(col("js"), mt)))
    val fencedParses = "from_json".r
      .findAllIn(fenced.queryExecution.optimizedPlan.toString).length
    assert(fencedParses === 1,
      s"barrier must pin the parse to one site, got $fencedParses")
    // and the results are identical either way
    assert(fenced.collect().map(_.toSeq).toSeq.sortBy(_.toString) ===
      bare.collect().map(_.toSeq).toSeq.sortBy(_.toString))
  }

  test("barrier over a codegen-able child stays inside whole-stage codegen") {
    // the property the row-encoder fence could not offer: with a
    // codegen-able child the fenced projection sits INSIDE a
    // WholeStageCodegen span (no DeserializeToObject island)
    val dir = java.nio.file.Files.createTempDirectory("barrier-cg").toString
    spark.range(100).select(col("id")).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("id"), call_function("graft_barrier", col("id") * 3).as("k"))
      .select((col("k") + 1).as("a"), (col("k") + 2).as("b"))
    val nodes = flattenExecuted(df.queryExecution.executedPlan)
    val (inside, eligible, islands) =
      graft.tools.PlanAudit.codegenCoverage(df.queryExecution.executedPlan)
    assert(eligible > 0 && inside === eligible,
      s"barrier projection fell out of codegen: islands=$islands nodes=${nodes.map(_.nodeName)}")
  }

  test("barrier blocks filter pushdown below the producing projection") {
    // fence semantics: a predicate on the fenced column must not push
    // below the projection that produces it (it would re-run the parse
    // in the pushed-down position, e.g. inside a sort's sampling pass)
    val dir = java.nio.file.Files.createTempDirectory("barrier-push").toString
    spark.range(100).select(col("id")).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("id"), call_function("graft_barrier", col("id") % 7).as("k"))
      .filter(col("k") === 0)
    val optimized = df.queryExecution.optimizedPlan
    // the Filter must sit ABOVE the Project producing k
    val top = optimized.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(top.nonEmpty, "filter disappeared")
    assert(top.get.child.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Project],
      s"filter pushed below the barrier projection:\n$optimized")
  }

  test("graft_any_contains matches the exists-lambda semantics") {
    val df = Seq(
      (1L, Seq("Wairoa District", "Napier")),
      (2L, Seq("npc", null)),
      (3L, Seq[String](null)),
      (4L, Seq.empty[String]),
      (5L, Seq("VICTORIA")) // case-insensitive: contains "ic"
    ).toDF("id", "areas")
    val native = df.filter(call_function("graft_any_contains", col("areas"), lit("ic")))
      .select("id").as[Long].collect().sorted
    val lambda = df.filter(exists(col("areas"), a => lower(a).contains("ic")))
      .select("id").as[Long].collect().sorted
    assert(native.toSeq === Seq(1L, 5L))
    assert(native.toSeq === lambda.toSeq)
  }

  test("graft_any_contains filter is codegen-resident where the lambda is not") {
    val dir = java.nio.file.Files.createTempDirectory("anyc").toString
    spark.range(100)
      .select(col("id"), array(concat(lit("area"), col("id")), lit("x")).as("areas"))
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val native = src.filter(call_function("graft_any_contains", col("areas"), lit("7")))
    val (inN, elN, islN) =
      graft.tools.PlanAudit.codegenCoverage(native.queryExecution.executedPlan)
    assert(elN > 0 && inN === elN, s"native filter left codegen: $islN")
    val lambda = src.filter(exists(col("areas"), a => lower(a).contains("7")))
    val (inL, elL, _) =
      graft.tools.PlanAudit.codegenCoverage(lambda.queryExecution.executedPlan)
    assert(inL < elL, "expected the HOF-lambda filter to be interpreted " +
      "(if Spark learned to codegen it, retire the native expression)")
    // same rows either way
    assert(native.select("id").as[Long].collect().sorted.toSeq ===
      lambda.select("id").as[Long].collect().sorted.toSeq)
  }
}
