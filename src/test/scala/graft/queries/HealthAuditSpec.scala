package graft.queries

import graft.SparkSpec
import graft.functions.Sketches

/** L150–L152 semantics beyond the oracles: the dedup-bias classes and
  * NB means replayed from raw rows, the norm profile replayed through
  * the left-associated double kernel, and the transitivity audit's
  * wedge/closure accounting replayed from the verified-pair graph.
  */
class HealthAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  private def words(t: String): Seq[String] = t.trim.split("\\s+").toSeq

  private def ilog2(x: Long): Long =
    if (x <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)

  private def docs(): Seq[(Long, String, String, Long)] =
    graft.core.CacheScope.scoped {
      import spark.implicits._
      graft.core.Tables.documents(spark, dir)
        .select("doc_id", "source", "text", "n_chars")
        .as[(Long, String, String, Long)].collect().toSeq
    }

  test("q218: dedup-bias classes and NB means replay; classes partition") {
    val all = docs()
    val sizes = all.groupBy { case (_, _, t, _) =>
      Sketches.h64Scala(words(t).distinct.sorted.mkString(" ")) }
      .values.flatMap(rs => rs.map(r => r._1 -> rs.size.toLong)).toMap
    // NB replay (q154 ladder)
    val stride = 41L
    val block = "ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha"
    val labeled = all.map { case (id, src, t, nc) =>
      (id, src, if (id % stride == 0) block else t, id % stride == 0, nc)
    }
    val ws = labeled.flatMap { case (id, src, t, pos, _) =>
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
    val score = ws.groupBy(r => (r._1, r._2, r._3))
      .map { case ((id, src, pos), rs) =>
        id -> (src, pos, rs.map(r => llr(r._4)).sum) }.toMap
    val expected = labeled.groupBy { case (id, _, _, _, _) =>
      val c = sizes(id)
      if (c == 1L) "unique" else if (c <= 3L) "small" else "large"
    }.map { case (cls, rows) =>
      cls -> (rows.size.toLong,
        rows.map(r => score(r._1)._1).distinct.size.toLong,
        rows.count(r => score(r._1)._2).toLong,
        rows.map(r => score(r._1)._3).sum / rows.size.toLong,
        rows.map(_._5).sum / rows.size.toLong)
    }
    val out = run("q218_dedup_bias_audit").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out === expected)
    assert(out.values.map(_._1).sum === all.size.toLong,
      "classes partition the corpus")
  }

  test("q219: norm profile replays through the left-associated kernel") {
    import spark.implicits._
    val vecs = graft.core.CacheScope.scoped {
      graft.core.Tables.embeddings(spark, dir)
        .selectExpr("CAST(label AS BIGINT)", "vec_id", "embedding")
        .as[(Long, Long, Array[Float])].collect().toSeq
    }
    val nu = vecs.map { case (lbl, id, a) =>
      var acc = a(0).toDouble * a(0).toDouble
      var i = 1
      while (i < 64) { acc += a(i).toDouble * a(i).toDouble; i += 1 }
      (lbl, id, math.floor(math.sqrt(acc) * 1e6).toLong)
    }
    val expected = nu.groupBy(_._1).map { case (lbl, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val n = rows.size.toLong
      val med = sorted(((n + 1) / 2 - 1).toInt)._3
      lbl -> (n, rows.map(_._3).sum / n, med,
        rows.map(_._3).min, rows.map(_._3).max,
        rows.count(r => r._3 > med * 2L || r._3 * 2L < med).toLong)
    }
    val out = run("q219_embedding_norm_health").map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out === expected)
    out.values.foreach { case (_, mean, med, mn, mx, _) =>
      assert(mn <= med && med <= mx && mn <= mean && mean <= mx,
        "profile ordering sanity")
    }
  }

  test("q223: the split-balance audit replays hash-for-hash") {
    val all = docs().filter(_._1 % 97L != 0L)
    // md5Fingerprint and h64 share one construction; h64Scala is the twin
    val split = all.map { case (id, src, _, _) =>
      val h = Sketches.h64Scala(s"split:$id") % 100L
      (src, if (h < 80L) "train" else if (h < 90L) "val" else "test")
    }
    val bySrc = split.groupBy(_._1)
    val expected = bySrc.flatMap { case (src, rows) =>
      val n = rows.size.toLong
      rows.groupBy(_._2).map { case (sp, rs) =>
        val share = rs.size.toLong * 1000000L / n
        val target = sp match {
          case "train" => 800000L; case "val" => 100000L
          case _ => 100000L
        }
        (src, sp) -> (rs.size.toLong, n, share, target, share - target)
      }
    }
    val out = run("q223_split_balance_audit").map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out === expected)
    // per-source shares sum to ~1 (ppm floor slack < 3)
    out.groupBy(_._1._1).foreach { case (src, rows) =>
      val tot = rows.values.map(_._3).sum
      assert(tot >= 999997L && tot <= 1000000L, s"$src shares sum")
    }
  }

  test("q220: wedge and closure accounting replays from the verified graph") {
    // the registered verified-pair graph, read back from the engine
    val edges = graft.core.CacheScope.scoped {
      import spark.implicits._
      graft.queries.LlmPipeline.textNearDupPairs(spark, dir, 4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    }
    val sym = edges ++ edges.map(e => (e._2, e._1))
    // the r17 degree cap: each node keeps its 64 smallest neighbors by
    // id before wedge enumeration; cappedNodes is the coverage dial
    val byNode = sym.groupBy(_._1)
    val cappedNodes = byNode.values.count(_.size > 64).toLong
    val wedges = byNode.values.flatMap { rs =>
      val es = rs.map(_._2).toSeq.sorted.take(64)
      for (a <- es; b <- es; if a < b) yield (a, b)
    }.toSeq
    val induced = wedges.distinct
    // exact shingle jaccard replay for induced pairs
    val sh = docs().map { case (id, _, t, _) =>
      val w = words(t)
      id -> (if (w.size < 3) Set.empty[String]
        else w.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    val closed = induced.count { case (a, b) =>
      val (sa, sb) = (sh(a), sh(b))
      val inter = (sa intersect sb).size
      inter.toDouble / (sa.size + sb.size - inter) >= 0.8
    }.toLong
    val Seq(row) = run("q220_transitivity_audit").toSeq
    assert(row.getLong(0) === edges.size.toLong, "edges")
    assert(row.getLong(1) === wedges.size.toLong, "wedges")
    assert(row.getLong(2) === induced.size.toLong, "induced")
    assert(row.getLong(3) === closed, "closed")
    assert(row.getLong(4) ===
      closed * 1000000L / math.max(induced.size.toLong, 1L))
    assert(row.getLong(5) === cappedNodes, "capped_nodes")
  }
}
