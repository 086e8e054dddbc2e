package graft.queries

import graft.SparkSpec
import graft.functions.Sketches

/** L136–L139 semantics beyond the oracles: the log2q10 ladder's
  * contract (exact on powers of two, monotone, bounded error), the
  * Chinchilla planner and Spearman agreement replayed end-to-end in
  * plain Scala, the b-bit estimator law and its candidate-set
  * consistency with the registered full-width calibration, and the
  * cartography quadrants replayed from raw fixture rows.
  */
class PlannerCalibrationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  private def docs(): Seq[(Long, String, String)] =
    graft.core.CacheScope.scoped {
      import spark.implicits._
      graft.core.Tables.documents(spark, dir)
        .select("doc_id", "source", "text")
        .as[(Long, String, String)].collect().toSeq
    }

  private def words(t: String): Seq[String] = t.trim.split("\\s+").toSeq

  private def ilog2(x: Long): Long =
    if (x <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)

  test("log2q10: exact on powers of two, monotone, error-bounded") {
    (0 to 62).foreach { e =>
      assert(Sketches.log2q10Scala(1L << e) === e * 1024L, s"2^$e")
    }
    (1L to 4096L).sliding(2).foreach { case Seq(a, b) =>
      assert(Sketches.log2q10Scala(a) <= Sketches.log2q10Scala(b),
        s"monotone at $a")
    }
    (Seq(3L, 7L, 1000L, 999999L, 123456789L, Long.MaxValue / 3) ++
      (1L to 200L)).foreach { x =>
      val err = math.abs(Sketches.log2q10Scala(x) / 1024.0 -
        math.log(x.toDouble) / math.log(2.0))
      assert(err <= 0.0871, s"mantissa-linear error at $x: $err")
    }
    // the Column form agrees with the JVM twin
    import spark.implicits._
    val probe = Seq(1L, 2L, 3L, 1023L, 1024L, 1025L, 999999L,
      (1L << 53) + 12345L, Long.MaxValue / 2)
    val got = probe.toDF("x")
      .select(Sketches.log2q10(org.apache.spark.sql.functions.col("x")))
      .as[Long].collect().toSeq
    assert(got === probe.map(Sketches.log2q10Scala))
  }

  test("q204: the planner ladder replays; the constrained branch is two-sided") {
    val supply = docs().groupBy(_._2)
      .map { case (src, rows) => src -> rows.map(r => words(r._3).size.toLong).sum }
    val out = run("q204_compute_optimal_plan").map(r =>
      (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(out.size === supply.size * 4)
    supply.foreach { case (src, tok) =>
      val sl = Sketches.log2q10Scala(tok)
      Seq(20L, 40L, 60L, 80L).foreach { c =>
        val dOpt = (c * 1024L + 1778L) / 2L
        val (st, sq, d, n, ep, flag) = out((src, c))
        assert(st === tok, s"$src/$c supply")
        assert(sq === sl, s"$src/$c supply log")
        assert(d === dOpt, s"$src/$c d_opt")
        assert(n === dOpt - 4425L, s"$src/$c n_opt")
        assert(ep === dOpt - sl, s"$src/$c epochs")
        assert(flag === (if (ep > 2048L) 1L else 0L), s"$src/$c flag")
      }
      // monotone in budget; the fixture sits unconstrained at the toy
      // budget and constrained at the frontier — the branch is real
      assert(out((src, 20L))._6 === 0L, s"$src toy budget unconstrained")
      assert(out((src, 80L))._6 === 1L, s"$src frontier constrained")
    }
  }

  test("q205: the 1-bit estimator law holds; candidates match the full-width calibration") {
    val bbit = run("q205_bbit_minhash_calibration").map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(bbit.nonEmpty)
    bbit.foreach { case (k, est1, _, meanFull) =>
      assert(k >= 0L && k <= 16L, s"bucket $k out of range")
      assert(est1 === math.max(2L * (k * 1000000L / 16L) - 1000000L, 0L),
        s"estimator law at $k")
      assert(meanFull >= 0L && meanFull <= 1000000L,
        s"full estimate bounds at $k")
    }
    // same candidate set as the registered L38 calibration: pair
    // totals must agree exactly (both run banding + the same guard)
    val full = run("q103_minhash_calibration")
    assert(bbit.map(_._3).sum === full.map(_.getLong(2)).sum,
      "q205 and q103 must see the same candidate pairs")
    // identical signatures agree on every low bit: the 16-match bucket
    // of q103 can lose no pair moving to 1-bit agreement
    val exact16 = full.filter(_.getLong(0) == 16L).map(_.getLong(2)).sum
    val bit16 = bbit.filter(_._1 == 16L).map(_._3).sum
    assert(bit16 >= exact16,
      "full-signature-identical pairs must land in the 1-bit-16 bucket")
  }

  test("q206: Spearman replays end-to-end from the raw fixture") {
    val all = docs()
    val stride = 41L
    val block = "ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha"
    val labeled = all.map { case (id, src, t) =>
      (id, src, if (id % stride == 0) block else t, id % stride == 0)
    }
    // NB ladder (the q154 replay)
    val ws = labeled.flatMap { case (id, src, t, pos) =>
      words(t).map(w => (id, src, pos, w)) }
    val model = ws.groupBy(_._4).map { case (w, rs) =>
      w -> (rs.count(_._3).toLong, rs.count(!_._3).toLong) }
    val np = model.values.map(_._1).sum
    val nn = model.values.map(_._2).sum
    val v = model.size.toLong
    def llr(w: String): Long = {
      val (cp, cn) = model(w)
      ilog2(((cp + 1) * 1048576L) / (np + v)) -
        ilog2(((cn + 1) * 1048576L) / (nn + v))
    }
    val score = ws.groupBy(r => (r._1, r._2))
      .map { case ((id, src), rs) => (id, src, rs.map(r => llr(r._4)).sum) }
    // entropy ladder (the q142 replay)
    val hp = labeled.map { case (id, _, t, _) =>
      val nn2 = math.min(t.length, 512)
      val probe = t.substring(0, nn2)
      val h = probe.groupBy(identity).values
        .map(g => g.length.toLong * ilog2(nn2.toLong / g.length)).sum
      id -> h * 1000000L / nn2
    }.toMap
    val expected = score.groupBy(_._2).map { case (src, rows) =>
      val ra = rows.toSeq.sortBy(r => (-r._3, r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i + 1).toLong }.toMap
      val rb = rows.toSeq.sortBy(r => (hp(r._1), r._1)).zipWithIndex
        .map { case (r, i) => r._1 -> (i + 1).toLong }.toMap
      val n = rows.size.toLong
      val sd2 = rows.toSeq.map { r =>
        val d = ra(r._1) - rb(r._1); d * d }.sum
      val den = n * (n * n - 1)
      val t = if (den < 2199023255552L) 6L * sd2 * 1048576L / math.max(den, 1L)
        else 6L * sd2 / math.max(den / 1048576L, 1L)
      src -> (n, sd2, 1000000L - t * 1000000L / 1048576L)
    }
    val out = run("q206_signal_rank_agreement").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === expected)
    out.values.foreach { case (_, _, rho) =>
      assert(rho <= 1000000L && rho >= -1100000L, "rho bounds") }
  }

  test("q207: cartography quadrants replay; plants are accounted per region") {
    val all = docs()
    val stride = 41L
    val block = "ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha"
    val labeled = all.map { case (id, src, t) =>
      (id, src, if (id % stride == 0) block else t, id % stride == 0)
    }
    val wts = labeled.map { case (id, _, _, _) =>
      id -> (0 until 4).map { r =>
        Sketches.h64Scala(s"boot:$r:$id") % 4L match {
          case 0L => 0L; case 3L => 2L; case _ => 1L
        }
      }
    }.toMap
    val ws = labeled.flatMap { case (id, src, t, pos) =>
      words(t).map(w => (id, src, pos, w)) }
    val model = ws.groupBy(_._4).map { case (w, rows) =>
      w -> (0 until 4).map { r =>
        (rows.filter(_._3).map(x => wts(x._1)(r)).sum,
          rows.filterNot(_._3).map(x => wts(x._1)(r)).sum)
      }
    }
    val v = model.size.toLong
    val tot = (0 until 4).map { r =>
      (model.values.map(_(r)._1).sum, model.values.map(_(r)._2).sum) }
    def llr(w: String, r: Int): Long = {
      val (cp, cn) = model(w)(r)
      val (np, nn) = tot(r)
      ilog2(((cp + 1) * 1048576L) / (np + v)) -
        ilog2(((cn + 1) * 1048576L) / (nn + v))
    }
    val perDoc = ws.groupBy(x => (x._1, x._2, x._3)).map {
      case ((id, src, pos), rows) =>
        val sc = (0 until 4).map(r => rows.map(x => llr(x._4, r)).sum)
        val mean = sc.sum / 4L
        val spread = sc.max - sc.min
        (id, src, pos, mean, spread)
    }.toSeq
    val expected = perDoc.groupBy(_._2).flatMap { case (src, rows) =>
      val n = rows.size.toLong
      val medMean = rows.sortBy(r => (r._4, r._1))
        .apply(((n + 1) / 2 - 1).toInt)._4
      val medSpread = rows.sortBy(r => (r._5, r._1))
        .apply(((n + 1) / 2 - 1).toInt)._5
      rows.groupBy { r =>
        if (r._5 > medSpread) "ambiguous"
        else if (r._4 > medMean) "easy" else "hard"
      }.map { case (region, rs2) =>
        (src, region) -> (rs2.size.toLong,
          rs2.count(_._3).toLong,
          rs2.map(_._4).sum / rs2.size.toLong,
          rs2.map(_._5).sum / rs2.size.toLong)
      }
    }
    val out = run("q207_cartography_quadrants").map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out === expected)
    // accounting: regions partition each source's docs and plants
    val bySrc = out.groupBy(_._1._1)
    perDoc.groupBy(_._2).foreach { case (src, rows) =>
      assert(bySrc(src).values.map(_._1).sum === rows.size.toLong)
      assert(bySrc(src).values.map(_._2).sum === rows.count(_._3).toLong)
    }
    assert(out.keys.map(_._2).toSet.size >= 2,
      "the fixture must exercise more than one region")
  }
}
