package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

/** Plan-shape assertions for the training-data pipeline verbs added in
  * round 7 (q73-q76). Each pins the invariant that makes the operator
  * survive a 100 TB corpus, in the IvfPlanSpec style (direct invariants,
  * not node counts):
  *
  *  - q73/q74/q75: no global Window — every Window partitions on the
  *    declared bounded key (the aggregated stratum frame, the shard, the
  *    document), so no single task ever sorts the corpus.
  *  - q73: the per-stratum fraction Window runs over an ALREADY-AGGREGATED
  *    frame (an Aggregate below every Window), never over raw documents.
  *  - q76: the eval-side n-gram fingerprints join by broadcast — the
  *    corpus is filtered map-side and never shuffles on the gram key.
  */
class TrainingPipelinePlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def windowPartitionKeys(name: String): Seq[Seq[String]] =
    graft.core.CacheScope.scoped {
      val plan = graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan
      plan.collect { case w: Window => w }.map(
        _.partitionSpec.flatMap(_.references.toSeq.map(_.name)).distinct)
    }

  test("q73 windows partition only on the stratum key, above an aggregate") {
    graft.core.CacheScope.scoped {
      val plan = graft.SparkEntry.queries("q73_stratified_split")(spark, sfDir)
        .queryExecution.optimizedPlan
      val windows = plan.collect { case w: Window => w }
      assert(windows.nonEmpty, "q73 must compute the stratum fraction as a window")
      windows.foreach { w =>
        val keys = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).distinct
        assert(keys.nonEmpty && keys.forall(_ == "lang"),
          s"q73 Window partitions on ${keys.mkString(",")} — must be the stratum key")
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          "q73's fraction Window must run over the aggregated |strata|x3 frame, " +
            "not raw documents")
      }
    }
  }

  test("q74 packing windows partition only on the shard key (no global window)") {
    val keyLists = windowPartitionKeys("q74_token_packing")
    assert(keyLists.nonEmpty, "q74 must compute the prefix sum as a window")
    keyLists.foreach { keys =>
      assert(keys.nonEmpty && keys.forall(_ == "shard"),
        s"q74 Window partitions on ${keys.mkString(",")} — the per-shard sort " +
          "bound is the operator's scale contract")
    }
  }

  test("q75 repetition stats are map-side: no windows, no aggregates") {
    // r19 optimization strengthened the invariant: the L16 stats ride the
    // native qualityStats projection (graft_top_word_count +
    // graft_shingles), so the plan has NO window at all — a global-window
    // hazard is impossible by construction — and no aggregate either
    // (per-doc values are pure functions of the text).
    graft.core.CacheScope.scoped {
      val plan = graft.SparkEntry.queries("q75_repetition_filter")(spark, sfDir)
        .queryExecution.optimizedPlan
      assert(plan.collect { case w: Window => w }.isEmpty,
        "q75 must not window — its stats are one codegen'd map pass")
      assert(plan.collect { case a: Aggregate => a }.isEmpty,
        "q75 must not aggregate — per-doc stats are per-row expressions")
    }
  }

  test("q77 mixing never shuffles the corpus: broadcast thresholds, no sort-merge") {
    graft.core.CacheScope.scoped {
      val df = graft.SparkEntry.queries("q77_mixture_resample")(spark, sfDir)
      df.collect()
      val nodes = flattenExecuted(df.queryExecution.executedPlan)
      val smj = nodes.collect { case j: SortMergeJoinExec => j }
      val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
      assert(smj.isEmpty,
        "q77's corpus joins must all be broadcast (thresholds are |langs| rows)")
      assert(bhj.nonEmpty, "q77 must join the broadcast threshold table")
    }
  }

  test("q79 chunking is a single map-side pass: no joins, no aggregates") {
    graft.core.CacheScope.scoped {
      val plan = graft.SparkEntry.queries("q79_window_chunking")(spark, sfDir)
        .queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg, Join => LJoin}
      assert(plan.collect { case j: LJoin => j }.isEmpty,
        "q79 must not join — the 1->N expansion is per-document arithmetic")
      assert(plan.collect { case a: LAgg => a }.isEmpty,
        "q79 must not aggregate — chunk counts are computed per row")
    }
  }

  test("q87 scrubbing is map-side: no joins, no windows, one aggregate") {
    graft.core.CacheScope.scoped {
      val plan = graft.SparkEntry.queries("q87_pii_scrub")(spark, sfDir)
        .queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg, Join => LJoin}
      assert(plan.collect { case j: LJoin => j }.isEmpty,
        "q87 must not join — plant, scrub and count are per-row projections")
      assert(plan.collect { case w: Window => w }.isEmpty,
        "q87 must not window")
      assert(plan.collect { case a: LAgg => a }.size <= 2,
        "q87 rolls up with a single (partial+final) hash aggregate")
    }
  }

  test("q88 trains top-K as a limit (no rank window) and ships it broadcast") {
    graft.core.CacheScope.scoped {
      val df = graft.SparkEntry.queries("q88_lm_familiarity")(spark, sfDir)
      val optimized = df.queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit => LLimit}
      assert(optimized.collect { case w: Window => w }.isEmpty,
        "q88's top-K vocabulary must be a Limit (TakeOrdered), never a rank " +
          "window — a window would sort the whole vocab in one task")
      assert(optimized.collect { case l: LLimit => l }.nonEmpty,
        "q88 must bound the vocabulary with a Limit")
      df.collect()
      val nodes = flattenExecuted(df.queryExecution.executedPlan)
      val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
      // the doc-keyed familiarity re-join may legitimately shuffle at
      // scale; the invariant is that the bounded MODEL ships broadcast
      assert(bhj.nonEmpty,
        "q88's vocabulary model join must be a BroadcastHashJoin")
    }
  }

  test("q76 joins the corpus to the eval set by broadcast, never sort-merge") {
    graft.core.CacheScope.scoped {
      val df = graft.SparkEntry.queries("q76_decontaminate")(spark, sfDir)
      // materialize so AQE finalizes the physical plan it actually ran
      df.collect()
      val nodes = flattenExecuted(df.queryExecution.executedPlan)
      val bhj = nodes.collect { case j: BroadcastHashJoinExec => j }
      val smj = nodes.collect { case j: SortMergeJoinExec => j }
      assert(bhj.nonEmpty,
        "q76's eval-set fingerprint join must be a BroadcastHashJoin")
      assert(smj.isEmpty,
        "q76 must never shuffle the corpus on the gram key (found SortMergeJoin)")
    }
  }
}
