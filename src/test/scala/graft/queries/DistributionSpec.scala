package graft.queries

import graft.SparkSpec
import graft.functions.Sketches

/** L140–L143 semantics beyond the oracles: the isqrt primitive's
  * exactness contract, and the provenance matrix, conditional-entropy
  * ladder, ¾-power table and temperature curve each replayed
  * end-to-end in plain Scala from the raw fixture rows, plus the
  * structural laws each statistic promises (conservation, head
  * flattening, dial monotonicity).
  */
class DistributionSpec extends SparkSpec {

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

  test("isqrt: exact on every probe, including squares and off-by-ones") {
    val probes = Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, 1023L, 1024L,
      (1L << 40) - 1L, 1L << 40, (1L << 60) + 12345L, (1L << 62) - 1L) ++
      (0L to 300L) ++ Seq(999999999999L)
    probes.foreach { x =>
      val s = Sketches.isqrtScala(x)
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"isqrt($x) = $s")
    }
    // Column form agrees with the JVM twin
    import spark.implicits._
    val got = probes.toDF("x")
      .select(Sketches.isqrt(org.apache.spark.sql.functions.col("x")))
      .as[Long].collect().toSeq
    assert(got === probes.map(Sketches.isqrtScala))
  }

  test("q208: provenance replays; duplicate mass is conserved") {
    val all = docs()
    val byCk = all.groupBy { case (_, _, t, _) =>
      Sketches.h64Scala(words(t).distinct.sorted.mkString(" ")) }
    val expected = byCk.values.filter(_.size >= 2).toSeq.flatMap { rows =>
      val origin = rows.minBy(_._1)
      rows.filter(_._1 != origin._1)
        .map(r => (origin._2, r._2, r._4))
    }.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> (rs.size.toLong, rs.map(_._3).sum) }
    val out = run("q208_dup_provenance").map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === expected)
    // conservation: every non-origin member of every multi-cluster is
    // attributed exactly once
    val dupDocs = byCk.values.filter(_.size >= 2)
      .map(_.size.toLong - 1L).sum
    assert(out.values.map(_._1).sum === dupDocs)
  }

  test("q209: the conditional-entropy ladder replays; predictability bounded") {
    val all = docs()
    val bg = all.flatMap { case (_, src, t, _) =>
      val ws = words(t)
      if (ws.size < 2) Seq.empty
      else ws.sliding(2).map(p => (src, p.mkString(" "))).toSeq
    }.groupBy(identity).map { case ((src, g), rs) =>
      (src, g, rs.size.toLong) }.toSeq
    val expected = bg.groupBy(_._1).map { case (src, rows) =>
      val cx = rows.groupBy(r => r._2.split(" ")(0))
        .map { case (f, rs) => f -> rs.map(_._3).sum }
      val nb = rows.map(_._3).sum
      val sc = rows.map { case (_, g, cxy) =>
        cxy * (Sketches.log2q10Scala(cx(g.split(" ")(0))) -
          Sketches.log2q10Scala(cxy)) }.sum
      val su = cx.values.map(c =>
        c * (Sketches.log2q10Scala(nb) - Sketches.log2q10Scala(c))).sum
      val hu = su / nb
      val hc = sc / nb
      src -> (nb, cx.size.toLong, hu, hc,
        math.max(1000000L - hc * 1000000L / math.max(hu, 1L), 0L))
    }
    val out = run("q209_conditional_entropy").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out === expected)
    out.values.foreach { case (_, _, hu, hc, p) =>
      assert(hc >= 0L && hc <= hu,
        "conditioning can only reduce the ladder entropy here")
      // a LAW since the r17 floor: predictability clamps at 0 (the raw
      // 1 − H(Y|X)/H(X) ratio is not structurally bounded below)
      assert(p >= 0L && p <= 1000000L, "predictability is a fraction")
    }
  }

  test("q210: the ¾-power table replays; the head flattens") {
    val vocab = docs().flatMap { case (_, _, t, _) => words(t) }
      .groupBy(identity).map { case (w, os) => (w, os.length.toLong) }
    val nTok = vocab.values.sum
    val w34 = vocab.map { case (w, c) =>
      val cl = math.min(c, 1048576L)
      (w, c, Sketches.isqrtScala(Sketches.isqrtScala(cl * cl * cl)))
    }
    val sumW = w34.map(_._3).sum
    val expected = w34.toSeq.sortBy { case (w, c, _) => (-c, w) }
      .take(16).map { case (w, c, v) =>
        (w, c, v, c * 1000000L / math.max(nTok, 1L),
          v * 1000000L / math.max(sumW, 1L)) }
    val got = run("q210_negative_sampling_table").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got.sortBy(r => (-r._2, r._1)) === expected)
    // flattening law: the most frequent word loses share moving from
    // the raw to the ¾-power table
    val head = got.maxBy(_._2)
    assert(head._5 <= head._4,
      "the head word's negative-table share must not exceed its raw share")
    // exactness probe: floor(c^(3/4)) on perfect fourth powers
    Seq(1L, 16L, 81L, 256L, 65536L).foreach { c =>
      val v = Sketches.isqrtScala(Sketches.isqrtScala(c * c * c))
      assert(v === math.round(math.pow(c.toDouble, 0.75)),
        s"c=$c exact 3/4 power")
    }
  }

  test("q211: the temperature curve replays; flattening is monotone") {
    val sup = docs().groupBy(_._2)
      .map { case (src, rows) =>
        src -> rows.map(r => words(r._3).size.toLong).sum }
    val expected = Seq(1L, 2L, 4L).flatMap { tau =>
      val w = sup.map { case (src, n) =>
        val w2 = if (n < (1L << 42)) Sketches.isqrtScala(n * 1048576L)
          else Sketches.isqrtScala(n) * 1024L
        src -> (tau match {
          case 1L => n
          case 2L => w2
          case _ => Sketches.isqrtScala(w2 * 1024L)
        })
      }
      val tot = w.values.sum
      val shares = w.map { case (src, v) =>
        src -> (v * 1000000L / math.max(tot, 1L)) }
      val ssq = shares.values.map(s => s * s).sum
      val eff = 1024000000000000L / math.max(ssq, 1L)
      shares.map { case (src, sh) =>
        (tau, src) -> (sup(src), w(src), sh, eff) }
    }.toMap
    val out = run("q211_temperature_dial_curve").map(r =>
      (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out === expected)
    // dial law on the fixture: hotter temperatures may only flatten —
    // max share non-increasing, effective sources non-decreasing
    def maxShare(tau: Long) =
      out.collect { case ((t, _), v) if t == tau => v._3 }.max
    def eff(tau: Long) =
      out.collect { case ((t, _), v) if t == tau => v._4 }.head
    assert(maxShare(2L) <= maxShare(1L) && maxShare(4L) <= maxShare(2L),
      "temperature must flatten the head share")
    assert(eff(2L) >= eff(1L) && eff(4L) >= eff(2L),
      "temperature must buy effective sources")
  }
}
