package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
import graft.SparkSpec

/** IVF coarse-quantization ANN (q70): plan-shape + recall assertions.
  *
  * Shape: the corpus-side cell assignment must be the max_by aggregate, not
  * a windowed argmax — at 100 TB the corpus fan-out (n·K scored rows) must
  * collapse map-side, so the ONLY Window passes allowed in q70's plan are
  * the two query-side ones (probe ranking and final top-K), both bounded by
  * the query workload, not the corpus.
  *
  * Recall: IVF is lossy by construction (a true neighbor in an unprobed
  * cell is missed). On the fixed sf0.001 fixture the top-1 agreement with
  * the brute-force baseline (q38) is deterministic; the floor asserts the
  * probe path actually finds real neighbors rather than silently returning
  * arbitrary in-cell rows.
  */
class IvfPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q70 cell assignment is aggregate-side: no Window partitions on the corpus key") {
    graft.core.CacheScope.scoped {
      val df = graft.SparkEntry.queries("q70_ann_ivf_coarse")(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan
      // the direct invariant (not a node count, which pins Catalyst
      // internals): every Window must partition on the query key q_id —
      // bounded by the query workload — never on the corpus-side vec_id,
      // which is what a windowed cell assignment would do
      val windows = plan.collect { case w: Window => w }
      windows.foreach { w =>
        val partCols = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).distinct
        assert(partCols.nonEmpty && partCols.forall(_ == "q_id"),
          s"q70 Window partitions on ${partCols.mkString(",")} — corpus-side " +
            "argmax must stay a max_by aggregate, not a Window")
      }
      // ...and the cell assignment itself is present as a max_by aggregate
      val hasMaxBy = plan.collect { case a: Aggregate => a }.exists(
        _.aggregateExpressions.exists(_.exists(_.isInstanceOf[MaxBy])))
      assert(hasMaxBy,
        "q70 must carry the corpus cell assignment as a max_by hash aggregate")
    }
  }

  test("q70 output is well-formed and its top-1 agrees with brute force on most queries") {
    graft.core.CacheScope.scoped {
      val ivf = graft.SparkEntry.queries("q70_ann_ivf_coarse")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val brute = graft.SparkEntry.queries("q38_ann_brute_topk")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // ranks are contiguous from 1 within each query
      ivf.groupBy(_._1).foreach { case (q, rows) =>
        assert(rows.map(_._2).sorted.sameElements(1 to rows.size),
          s"q70: ranks for query $q must be contiguous from 1")
      }
      val bruteTop1 = brute.collect { case (q, 1, v) => q -> v }.toMap
      val ivfTop1 = ivf.collect { case (q, 1, v) => q -> v }.toMap
      assert(ivfTop1.keySet === bruteTop1.keySet,
        "q70 must return at least one neighbor for every brute-force query")
      val hits = bruteTop1.count { case (q, v) => ivfTop1.get(q).contains(v) }
      // deterministic on the fixture; the floor catches a broken probe path
      assert(hits * 2 >= bruteTop1.size,
        s"q70 top-1 recall collapsed: $hits/${bruteTop1.size} vs brute force")
    }
  }
}
