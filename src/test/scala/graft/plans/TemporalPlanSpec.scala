package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Sort, Window}
import graft.SparkSpec

/** Plan-shape assertion for the q42 single-pass rewrite (VERDICT r5 #2):
  * "latest non-null per field" must execute as ONE hash aggregate — no
  * window pass, no per-key sort. The windowed formulation cost two sorted
  * passes per row and carried the full event stream through the shuffle;
  * the max_by aggregate shape shuffles one combined row per (partition,
  * user). This spec keeps a refactor from silently reintroducing a Window.
  */
class TemporalPlanSpec extends SparkSpec {

  test("q42 executes as one aggregate: no Window, no per-key Sort") {
    graft.core.CacheScope.scoped {
      val df = graft.SparkEntry.queries("q42_multifield_merge")(
        spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case w: Window => w }.isEmpty,
        "q42 must not use a window pass")
      assert(plan.collect { case a: Aggregate => a }.size === 1,
        "q42 must be a single groupBy aggregate")
      // the only sort is the final presentation orderBy on user_id
      assert(plan.collect { case s: Sort => s }.size <= 1,
        "no sort besides the trailing presentation orderBy")
    }
  }
}
