package graft.queries

import graft.SparkSpec
import graft.functions.Sketches

/** L144–L146 semantics beyond the oracles: the three routing schemes'
  * owners replayed hash-for-hash, the lexical matrix replayed from
  * raw counts, and the length-quality profile replayed through the NB
  * ladder — plus the conservation laws each table promises.
  */
class ComparativeSpec extends SparkSpec {

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

  private def ilog2(x: Long): Long =
    if (x <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)

  test("q212: all three schemes' owners replay; every scheme conserves") {
    val ids = docs().map(_._1)
    val owners = ids.flatMap { id =>
      val pd = Sketches.h64Scala(s"pos:$id")
      val mod = pd % 8L
      val hrw = (0L until 8L).map { s =>
        (Sketches.h64Scala(s"hrw:$s:$id") / 8L) * 8L + s }.max % 8L
      val vns = for (sh <- 0L until 8L; v <- 0L until 16L)
        yield (Sketches.h64Scala(s"ring:$sh:$v") / 8L) * 8L + sh
      val p = (pd / 8L) * 8L
      val cw = vns.filter(_ >= p)
      val ring = (if (cw.nonEmpty) cw.min else vns.min) % 8L
      Seq(("mod", mod), ("hrw", hrw), ("ring", ring))
    }
    val expected = owners.groupBy(identity).map { case ((sch, sh), rs) =>
      (sch, sh) -> rs.size.toLong }
    val out = run("q212_routing_bakeoff").map(r =>
      (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.map { case (k, v) => k -> v._1 } === expected)
    val n = ids.size.toLong
    Seq("mod", "hrw", "ring").foreach { sch =>
      val rows = out.filter(_._1._1 == sch)
      assert(rows.values.map(_._1).sum === n, s"$sch conserves docs")
      val peak = rows.values.map(_._1).max
      val ptm = peak * 8L * 1000000L / n
      rows.values.foreach { case (load, share, p) =>
        assert(share === load * 1000000L / n, s"$sch share")
        assert(p === ptm, s"$sch peak-to-mean")
      }
      assert(ptm >= 1000000L, s"$sch peak is at least the mean")
    }
  }

  test("q213: the lexical matrix replays from raw counts") {
    val top = docs().flatMap { case (_, src, t, _) =>
      words(t).map(w => (src, w)) }
      .groupBy(identity).map { case ((src, w), rs) =>
        (src, w, rs.size.toLong) }
      .groupBy(_._1).map { case (src, rows) =>
        src -> rows.toSeq.sortBy(r => (-r._3, r._2)).take(64)
          .map(_._2).toSet
      }
    val expected = top.keys.toSeq.sorted.combinations(2).flatMap {
      case Seq(a, b) =>
        val inter = (top(a) intersect top(b)).size.toLong
        if (inter == 0) None
        else {
          val na = top(a).size.toLong
          val nb = top(b).size.toLong
          Some((a, b) -> (na, nb, inter,
            inter * 1000000L / math.max(na + nb - inter, 1L)))
        }
    }.toMap
    val out = run("q213_lexical_overlap_matrix").map(r =>
      (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out === expected)
    out.foreach { case ((a, b), (_, _, _, j)) =>
      assert(a < b, "pairs are canonically ordered")
      assert(j >= 0L && j <= 1000000L, "jaccard is a fraction")
    }
  }

  test("q214: the length-quality profile replays through the NB ladder") {
    val all = docs()
    val stride = 41L
    val block = "ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha"
    val labeled = all.map { case (id, src, t, nc) =>
      (id, src, if (id % stride == 0) block else t,
        id % stride == 0, nc)
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
        (id, src, pos, rs.map(r => llr(r._4)).sum) }.toSeq
    val ncById = all.map(r => r._1 -> r._4).toMap
    val expected = score.groupBy(r => (r._2, ilog2(ncById(r._1))))
      .map { case ((src, oct), rows) =>
        (src, oct) -> (rows.size.toLong,
          rows.count(_._3).toLong,
          rows.map(_._4).sum / rows.size.toLong,
          rows.count(_._4 > 0).toLong * 1000000L / rows.size.toLong)
      }
    val out = run("q214_length_quality_audit").map(r =>
      (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out === expected)
    // conservation per source
    val bySrc = out.groupBy(_._1._1)
    all.groupBy(_._2).foreach { case (src, rows) =>
      assert(bySrc(src).values.map(_._1).sum === rows.size.toLong,
        s"$src octaves partition the docs")
    }
  }
}
