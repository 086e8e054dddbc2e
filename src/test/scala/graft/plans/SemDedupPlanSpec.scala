package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.SparkSpec

/** Plan-shape pins for the round-10 corpus-analytics operators
  * (q92 SemDeDup, q93 tf-idf, q94 source overlap): the scale invariants
  * each one's Scaladoc claims must hold in the EXECUTED plan, so a later
  * edit can't silently regress them.
  */
class SemDedupPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q92 cell assignment is a max_by aggregate; no Window anywhere") {
    graft.core.CacheScope.scoped {
      val plan = graft.SparkEntry.queries("q92_semdedup_cells")(spark, sfDir)
        .queryExecution.optimizedPlan
      // SemDeDup has no ranking step at all — any Window would mean the
      // corpus-side argmax regressed to a windowed form
      assert(plan.collect { case w: Window => w }.isEmpty,
        "q92 must not contain a Window — the cell argmax is an aggregate")
      val hasMaxBy = plan.collect { case a: Aggregate => a }.exists(
        _.aggregateExpressions.exists(_.exists(_.isInstanceOf[MaxBy])))
      assert(hasMaxBy,
        "q92 must carry the cell assignment as a max_by hash aggregate")
    }
  }

  test("q92 agrees with itself across candidate modalities on confident pairs") {
    graft.core.CacheScope.scoped {
      // every dup_of assignment must be a genuine near-dup: re-verify the
      // (vec_id, dup_of) pairs q92 emits against exact cosine — the verify
      // threshold is part of the operator contract, not fixture luck
      import org.apache.spark.sql.functions._
      import graft.functions.Sketches
      val out = graft.SparkEntry.queries("q92_semdedup_cells")(spark, sfDir)
        .filter(col("dup_of").isNotNull)
        .select(col("vec_id"), col("dup_of"))
      val e = graft.core.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"),
          Sketches.norm(col("embedding"), 64).as("nrm"))
      val bad = out
        .join(e.select(col("vec_id"), col("embedding").as("ae"), col("nrm").as("an")),
          Seq("vec_id"))
        .join(e.select(col("vec_id").as("dup_of"), col("embedding").as("be"),
          col("nrm").as("bn")), Seq("dup_of"))
        .withColumn("cos", Sketches.cosineFromParts(
          Sketches.dot(col("ae"), col("be"), 64), col("an"), col("bn")))
        .filter(col("cos") < 0.3)
      assert(bad.count() === 0,
        "q92 assigned a dup_of below the cosine threshold")
      // dup_of must point at a smaller id (the min-id survivor rule)
      assert(out.filter(col("dup_of") >= col("vec_id")).count() === 0,
        "q92 dup_of must be a smaller vec_id")
    }
  }

  test("q93 window runs over the aggregated frame, scalar count attaches broadcast") {
    graft.core.CacheScope.scoped {
      val qe = graft.SparkEntry.queries("q93_tfidf_terms")(spark, sfDir)
        .queryExecution
      // the top-k Window must partition on source (the |sources|·|vocab|
      // aggregated frame), never run partitionless over the corpus
      val windows = qe.optimizedPlan.collect { case w: Window => w }
      assert(windows.nonEmpty, "q93 must rank with a Window")
      windows.foreach { w =>
        val partCols = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).distinct
        assert(partCols == Seq("source"),
          s"q93 Window partitions on ${partCols.mkString(",")}, expected source")
      }
      // the one-row doc count joins broadcast (never shuffles the tf frame)
      val exec = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val joins = exec.collect { case j: BroadcastHashJoinExec => j }
      // tf⋈df rides AQE (either side may end up broadcast at this size);
      // the invariant worth pinning is that NO nested-loop join except the
      // deliberate one-row scalar attach exists
      import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
      val nlj = exec.collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(nlj.size <= 1, s"q93 has ${nlj.size} nested-loop joins — only " +
        "the one-row n_docs attach is allowed")
      assert(joins.nonEmpty || nlj.nonEmpty, "q93 lost its broadcast joins")
    }
  }

  test("q94 overlap matrix is bounded: distinct-first, |sources|^2 output") {
    graft.core.CacheScope.scoped {
      import org.apache.spark.sql.functions._
      val out = graft.SparkEntry.queries("q94_source_overlap")(spark, sfDir)
      val rows = out.collect()
      val nSrc = graft.core.Tables.documents(spark, sfDir)
        .select(col("source")).distinct().count()
      assert(rows.length <= nSrc * (nSrc - 1) / 2,
        "q94 emitted more than |sources| choose 2 rows")
      // jaccard is exact integer ppm and consistent with its parts
      rows.foreach { r =>
        val (shared, na, nb, ppm) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(ppm === shared * 1000000L / (na + nb - shared),
          s"q94 jaccard_ppm inconsistent for ${r.getString(0)}/${r.getString(1)}")
        assert(shared <= math.min(na, nb), "q94 shared exceeds a side's total")
      }
    }
  }
}
