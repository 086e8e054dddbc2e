package graft.queries

import graft.SparkSpec
import graft.functions.Sketches

/** L132–L135 semantics beyond the oracles: the Gini/Lorenz shares, the
  * burstiness ladder, the Kish ESS and the hash-collision audit each
  * replayed end-to-end in plain Scala from the raw fixture rows, plus
  * the structural invariants the statistics promise (bounds, width
  * monotonicity, the all-unique ESS fixed point).
  */
class ConcentrationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  private def docs(): Seq[(Long, String, String, Long)] =
    graft.core.CacheScope.scoped {
      import spark.implicits._
      graft.core.Tables.documents(spark, dir)
        .select("doc_id", "source", "text", "n_chars")
        .as[(Long, String, String, Long)].collect().toSeq
    }

  private def words(t: String): Seq[String] = t.trim.split("\\s+").toSeq

  test("q200: Gini and quantile shares replay; bounds hold") {
    val bySrc = docs().groupBy(_._2)
    val out = run("q200_mass_concentration").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out.keySet === bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val ranked = rows.sortBy(r => (r._4, r._1)) // (n_chars, doc_id)
      val n = ranked.length.toLong
      val total = ranked.map(_._4).sum
      val srx = ranked.zipWithIndex
        .map { case (r, i) => (i + 1).toLong * r._4 }.sum
      val gini = ((2 * srx - (n + 1) * total) * 1000000L) /
        math.max(n * total, 1L)
      val bh = ranked.take((n / 2).toInt).map(_._4).sum * 1000000L /
        math.max(total, 1L)
      val td = ranked.drop((n - n / 10).toInt).map(_._4).sum * 1000000L /
        math.max(total, 1L)
      val (nd, tc, g, b, t) = out(src)
      assert(nd === n, s"$src n_docs")
      assert(tc === total, s"$src total_chars")
      assert(g === gini, s"$src gini")
      assert(b === bh, s"$src bottom_half")
      assert(t === td, s"$src top_decile")
      assert(g >= 0L && g < 1000000L, s"$src gini bounds")
      assert(b + t <= 1000000L + 1L, s"$src shares partition the mass")
    }
  }

  test("q201: the VMR ladder replays; ordering and clip are honored") {
    val all = docs()
    val nDocs = all.length.toLong
    val perDoc = all.flatMap { case (id, _, t, _) =>
      words(t).groupBy(identity).map { case (w, os) =>
        (w, math.min(os.length.toLong, 1024L))
      }
    }
    val expected = perDoc.groupBy(_._1).map { case (w, cs) =>
      val df = cs.length.toLong
      val tot = cs.map(_._2).sum
      val ssq = cs.map(c => c._2 * c._2).sum
      val t1 = if (tot < 8796093022208L) ssq * 1024L / tot
        else ssq / math.max(tot / 1024L, 1L)
      (w, df, tot, ssq, t1 - tot * 1024L / nDocs)
    }.filter(_._2 >= 4L).toSeq
      .sortBy { case (w, _, tot, _, vmr) => (-vmr, -tot, w) }
      .take(16)
    val got = run("q201_term_burstiness").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    // dispersion floor: VMR of a df-spread term can go slightly below
    // Q10-one from truncation but never negative past the mean term
    got.foreach { case (w, _, _, _, vmr) =>
      assert(vmr >= -1024L, s"$w vmr below the ladder floor") }
  }

  test("q202: Kish ESS replays; all-unique sources sit at the fixed point") {
    val cs = docs().map { case (id, src, t, nc) =>
      (id, src, Sketches.h64Scala(
        words(t).distinct.sorted.mkString(" ")))
    }
    val sizes = cs.groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
    val out = run("q202_ess_soft_dedup").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    cs.groupBy(_._2).foreach { case (src, rows) =>
      val n = rows.length.toLong
      val ws = rows.map(r => 1048576L / sizes(r._3))
      val sw = ws.sum
      val sw2 = ws.map(w => w * w / 1048576L).sum
      val mw = sw / n
      val mw2 = sw2 / n
      val ratio = (mw * mw / 1048576L) * 1000000L / math.max(mw2, 1L)
      val (nd, nu, swq, rp, ed) = out(src)
      assert(nd === n, s"$src n_docs")
      assert(nu === rows.count(r => sizes(r._3) == 1L).toLong,
        s"$src n_unique")
      assert(swq === sw, s"$src sum_w")
      assert(rp === ratio, s"$src ess_ratio")
      assert(ed === n * ratio / 1000000L, s"$src ess_docs")
      assert(rp <= 1000000L, s"$src ESS cannot exceed n")
      if (nu == nd) assert(rp === 1000000L,
        s"$src all-unique source must sit at the ESS fixed point")
    }
  }

  test("q203: collision audit replays; coarser widths only collide more") {
    val vocab = docs().flatMap { case (_, _, t, _) => words(t) }
      .groupBy(identity).map { case (w, os) =>
        (Sketches.h64Scala("feat:" + w), os.length.toLong)
      }.toSeq
    val expected = Seq(8, 12, 16).map { b =>
      val buckets = vocab.groupBy(v => v._1 % (1L << b))
      val collided = buckets.values.filter(_.size >= 2)
      val totalMass = vocab.map(_._2).sum
      (b.toLong, vocab.length.toLong, buckets.size.toLong,
        collided.map(_.size.toLong).sum,
        collided.flatMap(_.map(_._2)).sum * 1000000L /
          math.max(totalMass, 1L),
        buckets.values.map(_.size.toLong).max)
    }
    val got = run("q203_hash_collision_audit").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got === expected)
    // nesting: a bucket collision at width 2^16 is also one at 2^8
    val byWidth = got.map(r => r._1 -> r).toMap
    assert(byWidth(8L)._4 >= byWidth(12L)._4 &&
      byWidth(12L)._4 >= byWidth(16L)._4,
      "collided types must be monotone in width")
    assert(byWidth(8L)._5 >= byWidth(12L)._5 &&
      byWidth(12L)._5 >= byWidth(16L)._5,
      "collided mass must be monotone in width")
  }
}
