package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** L89–L90 semantics beyond the oracles: the water-filler's exact
  * Scala replay (conservation, feasibility, saturation bookkeeping) and
  * the rank-agreement audit recomputed from the registered q38/q70
  * outputs themselves.
  */
class MixtureAuditSpec extends SparkSpec {

  import spark.implicits._

  test("q157: plain-Scala water-filling replay; conservation and feasibility") {
    // skewed availability: src0..src9, avail grows with the index while
    // the weight w = idx % 7 + 1 cycles — saturation must hit the
    // high-w/low-avail combinations first
    val rows = (1L to 500L).flatMap { i =>
      val src = s"src${i % 10}"
      Seq((i, s"t$i", "en", src, 20L + (i % 10) * 40L))
    }
    val d = Files.createTempDirectory("ma-corpus").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")

    // replay
    val avail = rows.groupBy(_._4).map { case (s2, rs) =>
      s2 -> rs.map(_._5).sum }
    val w = avail.keys.map(s2 => s2 -> (s2.drop(3).toLong % 7 + 1)).toMap
    val budget = avail.values.sum * MixtureAuditOps.WfBudgetPct / 100
    var alloc = avail.map { case (k, _) => k -> 0L }
    var satIter = avail.map { case (k, _) => k -> 0L }
    for (k <- 1 to MixtureAuditOps.WfIters) {
      val active = avail.keys.filter(s2 => alloc(s2) < avail(s2)).toSet
      val sw = active.toSeq.map(w).sum
      val rem = budget - alloc.values.sum
      if (sw > 0) {
        val take = active.map(s2 =>
          s2 -> math.min(avail(s2) - alloc(s2), rem * w(s2) / sw)).toMap
        alloc = alloc.map { case (s2, a) =>
          s2 -> (a + take.getOrElse(s2, 0L)) }
        satIter = satIter.map { case (s2, si) =>
          s2 -> (if (si == 0 && alloc(s2) == avail(s2)) k.toLong else si) }
      }
    }
    val out = graft.SparkEntry.queries("q157_budget_waterfill")(spark, d)
      .select("source", "w", "avail", "alloc", "sat_iter", "budget",
        "leftover")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length === 10)
    out.foreach { case (src, ww, av, al, si, b, left) =>
      assert(b === budget)
      assert((ww, av, al, si) === (w(src), avail(src), alloc(src),
        satIter(src)), s"source $src")
      assert(al <= av, "feasibility")
      assert(left === budget - out.map(_._4).sum, "conservation")
    }
    assert(out.exists(_._5 > 0L), "some source must saturate")
    assert(out.exists(_._5 === 0L), "some source must stay unsaturated")
  }

  test("q162: cross-attention bounds, deep-packing floor, single-doc zero") {
    val rnd = new scala.util.Random(20260815L)
    val rows = (1L to 400L).map { i =>
      val words = 3 + rnd.nextInt(40)
      (i, Seq.fill(words)("tok").mkString(" "), "en", "s",
        (words * 4).toLong)
    }
    val dir = corpusDir2(rows)
    val out = graft.SparkEntry.queries("q162_packing_cross_audit")(spark, dir)
      .select("budget", "shard", "n_bins", "avg_cross_ppm", "max_cross_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    val budgets = out.map(_._1).distinct.sorted
    assert(budgets.length === 2)
    out.foreach { case (_, _, nb, avg, mx) =>
      assert(nb > 0 && avg >= 0 && avg <= 1000000L && mx <= 1000000L)
      assert(avg <= mx) }
    // short docs pack ~12-25 per 512-token window: the cross fraction
    // must reflect deep packing (1 - 1/n shape), not collapse
    assert(out.filter(_._1 == budgets(0)).map(_._4).max > 700000L,
      "deep packing must show high cross-attention mass")

    // boundary: when every doc exceeds the budget, each bin holds ONE
    // doc and the cross fraction is exactly zero everywhere
    // docs must out-size BOTH budgets (512 and 1024 tokens) so no two
    // doc starts land in one bin
    val big = (1L to 120L).map(i =>
      (i, Seq.fill(1500)("tok").mkString(" "), "en", "s", 6000L))
    val out2 = graft.SparkEntry.queries("q162_packing_cross_audit")(
        spark, corpusDir2(big))
      .select("avg_cross_ppm", "max_cross_ppm")
      .as[(Long, Long)].collect()
    assert(out2.forall(r => r._1 === 0L && r._2 === 0L),
      "single-doc bins must carry zero cross-doc attention")
  }

  private def corpusDir2(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    val d = Files.createTempDirectory("ma2-corpus").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q158: agreement recomputed from the registered q38/q70 outputs") {
    val sf = "/root/testdata/sf0.001"
    val exact = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q38_ann_brute_topk")(spark, sf)
        .select("q_id", "vec_id", "rank")
        .as[(Long, Long, Long)].collect().toSeq
    }
    val ivf = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q70_ann_ivf_coarse")(spark, sf)
        .select("q_id", "vec_id", "rank")
        .as[(Long, Long, Long)].collect().toSeq
    }
    val nq = exact.map(_._1).distinct.size.toLong
    val expected = MixtureAuditOps.AgreeDepths.map { dep =>
      val e = exact.filter(_._3 <= dep).map(r => (r._1, r._2)).toSet
      val i = ivf.filter(_._3 <= dep).map(r => (r._1, r._2)).toSet
      val inter = e.intersect(i)
      val perQ = inter.groupBy(_._1).map(_._2.size.toLong)
      (dep, nq, inter.size.toLong,
        inter.size.toLong * 1000000L / (nq * dep),
        perQ.count(_ == dep).toLong)
    }
    val out = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q158_ann_rank_agreement")(spark, sf)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
    }
    assert(out === expected,
      "audit must equal the set arithmetic over the registered outputs")
    assert(out.forall(_._4 <= 1000000L))
  }
}
