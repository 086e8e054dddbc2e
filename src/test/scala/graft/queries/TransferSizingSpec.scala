package graft.queries

import graft.SparkSpec

/** L153–L154 semantics beyond the oracles: the transfer matrix's
  * diagonal must reproduce the registered conformal coverage
  * (cross-query consistency — both consume the same τ protocol), and
  * the capacity planner's sizing laws must hold row by row.
  */
class TransferSizingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  test("q221: the diagonal reproduces q195's own coverage; matrix is total") {
    val conf = run("q195_conformal_threshold").map { r =>
      r.getString(0) -> (r.getLong(2), // has_tau
        r.getLong(8))                  // neg_flag_ppm
    }.toMap
    val mx = run("q221_threshold_transfer_matrix").map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(mx.nonEmpty)
    val tauSources = mx.keys.map(_._1).toSet
    val applySources = mx.keys.map(_._2).toSet
    // every τ-holding source rows the FULL apply set (cross join)
    tauSources.foreach { ts =>
      assert(applySources.forall(as => mx.contains((ts, as))),
        s"$ts must price every apply source")
    }
    // sources without a τ contribute no row as tau_source
    conf.foreach { case (src, (hasTau, negFlag)) =>
      assert(tauSources.contains(src) === (hasTau == 1L),
        s"$src τ presence")
      if (hasTau == 1L)
        assert(mx((src, src))._3 === negFlag,
          s"$src diagonal must equal q195's neg_flag_ppm")
    }
  }

  test("q222: sizing laws hold row by row against the replayed formulas") {
    val rows = run("q222_sketch_capacity_planner").map(r =>
      (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(rows.size === 7)
    val n = rows.values.head._1
    assert(rows.values.forall(_._1 == n), "one key universe")
    // Bloom: m = n·b/ln2 (Q10 floor), k = b, bytes = ceil(m/8)
    Seq(10L, 16L, 20L).foreach { b =>
      val (_, m, k, bytes) = rows(("bloom", b))
      assert(m === n * b * 1477L / 1024L, s"bloom m at $b")
      assert(k === b, s"bloom k at $b")
      assert(bytes === (m + 7L) / 8L, s"bloom bytes at $b")
    }
    // bloom bytes grow with the guarantee
    assert(rows(("bloom", 20L))._4 > rows(("bloom", 10L))._4)
    // CMS: width = ceil(e/eps) on the Q10 ladder, depth 7
    Seq(10L, 14L).foreach { e =>
      val (_, w, dpt, bytes) = rows(("cms", e))
      assert(w === (2783L * (1L << e) + 1023L) / 1024L, s"cms w at $e")
      assert(w >= (1L << e) * 2L, "width covers e/eps > 2/eps")
      assert(dpt === 7L)
      assert(bytes === w * 7L * 8L)
    }
    // HLL: registers = next pow2 of (1.04/sigma)^2
    Seq(10L, 20L).foreach { pm =>
      val (_, m, lg, bytes) = rows(("hll", pm))
      val req = (1040L / pm) * (1040L / pm)
      assert(m === bytes && (m & (m - 1)) === 0L, s"hll pow2 at $pm")
      assert(m >= req && m < req * 2L, s"hll tight pow2 at $pm")
      assert(lg === java.lang.Long.numberOfTrailingZeros(m).toLong)
    }
  }
}
