package graft.plans

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.ApproxDistinct.hllDistinct

/** HyperLogLog sketch aggregate: accuracy against exact distinct counts on
  * the fixtures, exact determinism across partitionings (register-max merge
  * is order- and shape-independent), SQL resolution through the registry,
  * and the map-side partial-merge plan shape that makes it the at-scale
  * replacement for countDistinct.
  */
class HllAggSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def lineitem = graft.core.Tables.lineitem(spark, sf)

  test("global and grouped estimates land inside 3-sigma of exact") {
    val tol = 3 * 1.04 / math.sqrt(1 << 11) // ~7%
    val exact = lineitem.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val est = lineitem.select(hllDistinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= tol,
      s"global: est $est vs exact $exact")

    val exactByFlag = lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    lineitem.groupBy(col("l_returnflag"))
      .agg(hllDistinct(col("l_partkey")).as("d"))
      .collect().foreach { r =>
        val (flag, e) = (r.getString(0), r.getLong(1))
        val ex = exactByFlag(flag)
        assert(math.abs(e - ex).toDouble / ex <= tol, s"group $flag: $e vs $ex")
      }
  }

  test("string input: small cardinality falls in the linear-counting regime") {
    val docs = graft.core.Tables.documents(spark, sf)
    val exact = docs.select(countDistinct(col("text"))).head().getLong(0)
    val est = docs.select(hllDistinct(col("text"))).head().getLong(0)
    // 500 distinct vs 2048 registers: linear counting, ~1% error
    assert(math.abs(est - exact).toDouble / exact <= 0.02, s"$est vs $exact")
  }

  test("estimate is exactly partitioning-independent") {
    val one = lineitem.repartition(1)
      .select(hllDistinct(col("l_partkey"))).head().getLong(0)
    val eight = lineitem.repartition(8)
      .select(hllDistinct(col("l_partkey"))).head().getLong(0)
    assert(one === eight, "register-max merge must be shape-independent")
  }

  test("resolves in raw SQL and aggregates with map-side partial merge") {
    graft.core.Tables.lineitem(spark, sf).createOrReplaceTempView("li_hll")
    val df = spark.sql(
      "SELECT l_returnflag, graft_hll(l_partkey, 11) AS d FROM li_hll GROUP BY 1")
    assert(df.collect().length >= 1)
    val objAggs = flattenExecuted(df.queryExecution.executedPlan).collect {
      case a: ObjectHashAggregateExec => a
    }
    assert(objAggs.size >= 2,
      "graft_hll must plan as partial + final ObjectHashAggregate (map-side combine)")
  }
}
