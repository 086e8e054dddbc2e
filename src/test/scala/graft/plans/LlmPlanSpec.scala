package graft.plans

import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.Join
import graft.SparkSpec

/** Plan-shape assertions for the LSH candidate-generation path (VERDICT r4
  * #2): the hot-bucket guard (`Skew.dropHotBuckets`, a count aggregate +
  * broadcast LEFT ANTI join) must be part of the EXECUTED plan of the
  * bucketed near-dup/ANN queries — the at-scale plan is the oracle-verified
  * plan, not advice in a comment. The cap (LlmPipeline.HotBucketCap) is far
  * above any fixture bucket, so CORRECTNESS hashes prove it non-binding.
  */
class LlmPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // scoped: the builders persist shared projections via CacheScope.tracked;
  // without a scope those frames stay registered in the shared session's
  // CacheManager and leak InMemoryRelations into later suites' plans
  private def leftAntiCount(name: String): Int =
    graft.core.CacheScope.scoped {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftAnti => j
      }.size
    }

  test("q36 banded-LSH pair generation carries the hot-bucket anti-join") {
    assert(leftAntiCount("q36_lsh_neardup_pairs") >= 1,
      "q36's optimized plan must contain the dropHotBuckets LEFT ANTI join")
  }

  test("q67 banded16 ANN candidate generation carries the hot-bucket anti-join") {
    assert(leftAntiCount("q67_ann_lsh_banded16") >= 1,
      "q67's optimized plan must contain the dropHotBuckets LEFT ANTI join")
  }
}
