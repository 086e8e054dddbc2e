package graft.queries

import graft.SparkSpec
import graft.functions.Sketches

/** L147–L149 semantics beyond the oracles: the compaction planner's
  * arithmetic replayed from raw event days, the containment
  * estimator's law and its relation to the exact statistic, and the
  * nDCG ladder replayed against the registered brute/IVF rankings.
  */
class CompactionEvalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  private def ilog2(x: Long): Long =
    if (x <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)

  test("q215: the planner replays from raw event days; tradeoff laws hold") {
    import spark.implicits._
    val days = graft.core.CacheScope.scoped {
      graft.core.Tables.events(spark, dir)
        .selectExpr("ts div 86400000000000 as day")
        .as[Long].collect().toSeq
    }
    val total = days.size.toLong
    val nDays = days.distinct.size.toLong
    val batch = math.max(total / nDays, 1L)
    val nBatches = math.max(total / batch, 1L)
    val out = run("q215_compaction_planner").map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10))).toMap
    assert(out.keySet === Set(2L, 4L, 8L))
    Seq(2L, 4L, 8L).foreach { f =>
      val levels = ilog2(nBatches) / ilog2(f) + 1
      assert(out(f) === ((total, nDays, batch, nBatches, levels,
        levels, levels * (f + 1), levels * f, levels,
        total * levels)), s"fanout $f")
    }
    // the LSM tradeoff: larger fan-out can only shrink tiered WA
    // (fewer levels) and grow leveled WA per level
    assert(out(8L)._5 <= out(2L)._5, "levels shrink with fan-out")
  }

  test("q216: the containment estimator law and truth-tracking hold") {
    val rows = run("q216_containment_calibration").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, n, estMean, exactMean, estMax) =>
      assert(bucket >= 0L && bucket <= 9L)
      assert(n > 0L)
      assert(estMean >= 0L && estMean <= 1000000L, "estimate clamped")
      assert(estMax <= 1000000L, "max estimate clamped")
      assert(exactMean >= bucket * 100000L &&
        (exactMean <= (bucket + 1) * 100000L || bucket == 9L),
        "bucket mean sits in its decile")
    }
    // containment dominates resemblance: the top exact-containment
    // bucket's estimate must exceed the bottom bucket's (the
    // estimator tracks the truth directionally across the corpus)
    if (rows.size >= 2) {
      val byBucket = rows.sortBy(_._1)
      assert(byBucket.last._3 >= byBucket.head._3,
        "estimate rises with exact containment")
    }
  }

  test("q217: the nDCG ladder replays against the registered rankings") {
    val brute = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q38_ann_brute_topk")(spark, dir).collect()
    }
    // grades from the registered exact top-3 per query
    val grades = brute.map(r => (r.getLong(0), r.getLong(2)) ->
      math.max(0L, 4L - r.getLong(1))).filter(_._2 > 0L).toMap
    val ivf = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q70_ann_ivf_coarse")(spark, dir).collect()
    }
    val expected = ivf.groupBy(_.getLong(0)).map { case (q, rows) =>
      val dcg = rows.map { r =>
        val g = grades.getOrElse((q, r.getLong(2)), 0L)
        g * 1048576L / Sketches.log2q10Scala(r.getLong(1) + 1L)
      }.sum
      val hits = rows.count(r =>
        grades.contains((q, r.getLong(2)))).toLong
      q -> (dcg, hits, dcg * 1000000L / 4949L)
    }
    val out = run("q217_ndcg_retrieval_audit").map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet === expected.keySet)
    expected.foreach { case (q, (dcg, hits, ndcg)) =>
      val (d, h, nd, nq, _) = out(q)
      assert((d, h, nd) === ((dcg, hits, ndcg)), s"query $q")
      assert(nq === expected.size.toLong)
      assert(nd <= 1000000L, s"query $q nDCG bounded by ideal")
    }
    // the ideal constant is what the grading scheme says it is
    assert(3L * 1048576L / Sketches.log2q10Scala(2L) +
      2L * 1048576L / Sketches.log2q10Scala(3L) +
      1048576L / Sketches.log2q10Scala(4L) === 4949L)
  }
}
