package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Sort, Window}
import graft.SparkSpec

/** Plan-shape assertions for the latest/first-per-key family (VERDICT r5
  * #2 and its siblings): argmax/argmin/latest-non-null per key must execute
  * as ONE hash aggregate — no window pass, no per-key sort. The windowed
  * formulation cost two sorted passes per row and carried the full event
  * stream through the shuffle; the max_by/min_by aggregate shape shuffles
  * one combined row per (partition, key). These specs keep a refactor from
  * silently reintroducing a Window.
  */
class TemporalPlanSpec extends SparkSpec {

  private def assertSinglePass(name: String): Unit =
    graft.core.CacheScope.scoped {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case w: Window => w }.isEmpty,
        s"$name must not use a window pass")
      assert(plan.collect { case a: Aggregate => a }.size === 1,
        s"$name must be a single groupBy aggregate")
      // the only sort is the final presentation orderBy
      assert(plan.collect { case s: Sort => s }.size <= 1,
        s"$name: no sort besides the trailing presentation orderBy")
    }

  test("q42 multi-field merge executes as one aggregate: no Window, no per-key Sort") {
    assertSinglePass("q42_multifield_merge")
  }
  test("q09 latest-state argmax executes as one aggregate") {
    assertSinglePass("q09_latest_state_per_key")
  }
  test("q10 first-seen dedup argmin executes as one aggregate") {
    assertSinglePass("q10_dedup_business_key")
  }
  test("q16 fill-if-missing executes as one aggregate") {
    assertSinglePass("q16_fill_if_missing_merge")
  }
}
