package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.Sketches

/** L91–L92 semantics beyond the oracles: the URL canonicalizer's exact
  * collapse structure on a two-base corpus, and the soft-dedup weights
  * replayed in plain Scala.
  */
class WebCorpusSpec extends SparkSpec {

  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    val d = Files.createTempDirectory("wc-corpus").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q159: four spellings collapse into exactly two canonicals per base") {
    // doc_ids 0..7 = two bases x four spellings; one source so the
    // whole collapse structure lands in one output row
    val rows = (0L to 7L).map(i => (i, s"t$i", "en", "s", 5L))
    val out = graft.SparkEntry.queries("q159_url_canonical_dedup")(
        spark, corpusDir(rows))
      .select("source", "n_urls", "n_canonical", "n_kept", "n_url_dups")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.length === 1)
    val (_, nUrls, nCanon, nKept, nDups) = out.head
    assert(nUrls === 8L)
    // per base: {v0 plain, v1 http+WWW+case+frag} -> canonical without
    // params; {v2 trailing-slash+b=2&a=1, v3 a=1&b=2} -> canonical WITH
    // sorted params => 2 canonicals per base, 4 total
    assert(nCanon === 4L, "case/scheme/www/fragment/slash/param-order " +
      "must normalize away; params must stay part of identity")
    assert(nKept === 4L && nDups === 4L)
  }

  test("q160: weights replay exactly (1e6 div cluster size)") {
    val dup = "alpha beta gamma delta"
    val rows = (1L to 60L).map { i =>
      val t = if (i % 10 == 0) dup else s"unique text ${i * 13} here"
      (i, t, "en", s"s${i % 2}", t.length.toLong)
    }
    val dir = corpusDir(rows)
    val ckOf = rows.map { case (id, t, _, _, _) =>
      id -> Sketches.h64Scala(
        t.trim.split("\\s+").distinct.sorted.mkString(" "))
    }.toMap
    val csz = rows.groupBy(r => ckOf(r._1)).map { case (k, rs) =>
      k -> rs.size.toLong }
    val expected = rows.groupBy(_._4).map { case (src, rs) =>
      val ws = rs.map(r => 1000000L / csz(ckOf(r._1)))
      src -> (rs.size.toLong,
        rs.count(r => csz(ckOf(r._1)) >= 2).toLong,
        ws.sum,
        rs.map(_._5).sum,
        rs.zip(ws).map { case (r, w) => r._5 * w }.sum / 1000000L)
    }
    val out = graft.SparkEntry.queries("q160_soft_dedup_weights")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    out.foreach { case (src, nd, nm, sw, rc, ec) =>
      assert((nd, nm, sw, rc, ec) === expected(src), s"source $src") }
    assert(out.map(_._4).sum > 0L)
    // the six dup docs (ids 10..60 step 10) share one cluster: weight
    // 1e6/6 each, and they straddle both sources
    assert(out.map(_._3).sum === 6L)
  }
}
