package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** A7's 100 TB path (SURVEY §2.5): `approx_count_distinct` (HyperLogLog++)
  * as the sketch twin of q65's exact `count(DISTINCT)`. Exact distinct pays
  * an Expand + full shuffle of every (group, value) pair; the sketch is a
  * fixed-size mergeable register set, so the map side combines and the
  * shuffle carries one sketch per group per partition regardless of
  * cardinality. The spec bounds relative error against the exact counts and
  * pins the partial-aggregate plan shape that makes it scale.
  */
class ApproxDistinctSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("per-group estimates stay within the configured rsd of exact") {
    val rsd = 0.05
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
    val approx = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("est"))
    val joined = exact.join(approx, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("exact").toDouble
      val a = r.getAs[Long]("est").toDouble
      val relErr = math.abs(a - e) / e
      // rsd is the sketch's standard error; 4 sigma is a comfortably
      // deterministic bound for a fixed dataset + fixed hash
      assert(relErr <= 4 * rsd,
        s"${r.getAs[String]("event_type")}: est $a vs exact $e (relErr $relErr)")
    }
  }

  test("global estimate within rsd of exact; sketch merges across unioned halves") {
    val rsd = 0.02
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0).toDouble
    val whole = ev.select(approx_count_distinct(col("user_id"), rsd)).head().getLong(0)
    // the same rows arriving as two unioned streams must merge to the same
    // registers — the property that lets 1000 executors combine map-side
    val halves = ev.filter(col("event_id") % 2 === 0)
      .unionAll(ev.filter(col("event_id") % 2 =!= 0))
      .select(approx_count_distinct(col("user_id"), rsd)).head().getLong(0)
    assert(whole === halves, "HLL merge must be order/partition insensitive")
    assert(math.abs(whole - exact) / exact <= 4 * rsd)
  }

  test("plan uses partial aggregation (map-side combine), not Expand") {
    val plan = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("est"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("partial_approx_count_distinct"),
      s"expected a partial HLL aggregate before the shuffle, got:\n$plan")
    assert(!plan.contains("Expand"),
      "sketch path must not pay exact-distinct's Expand")
  }
}
