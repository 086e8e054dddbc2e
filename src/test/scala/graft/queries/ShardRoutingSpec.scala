package graft.queries

import graft.SparkSpec
import graft.functions.Sketches

/** L111/L112 semantics beyond the oracles: the HRW argmax replayed in
  * plain Scala with the minimal-movement property asserted doc-by-doc,
  * and the Simpson shard-diversity report replayed from the Feistel
  * permutation's Scala twin.
  */
class ShardRoutingSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  private def hrwScala(docId: Long, width: Int): Long =
    // mirror the query's tie-break exactly: h DESC, then s ASC
    (0 until width).minBy(s =>
      (-Sketches.h64Scala(s"hrw:$s:$docId"), s)).toLong

  test("q179: HRW assignment replays in Scala; movement is minimal") {
    val docs = graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, dir)
        .select("doc_id").as[Long].collect()
    }
    val a16 = docs.map(d => d -> hrwScala(d, 16)).toMap
    val a17 = docs.map(d => d -> hrwScala(d, 17)).toMap
    // the HRW property, doc by doc: a doc either keeps its shard or
    // moves TO the new shard (16) — argmax over a superset can only
    // change the winner to the added candidate
    docs.foreach { d =>
      assert(a17(d) == a16(d) || a17(d) == 16L,
        s"doc $d moved old->old: ${a16(d)} -> ${a17(d)}")
    }
    val moved = docs.filter(d => a17(d) != a16(d))
    assert(moved.nonEmpty, "resharding 16->17 must move some docs")
    // full report replay
    val out = run("q179_rendezvous_routing").map(r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    (0 until 16).foreach { sh =>
      val expect = docs.count(a16(_) == sh.toLong).toLong
      if (expect > 0) {
        val (nd, arr, ck) = out((16L, sh.toLong))
        assert(nd === expect && arr === 0L && ck === 0L)
      }
    }
    (0 until 17).foreach { sh =>
      val mine = docs.filter(a17(_) == sh.toLong)
      if (mine.nonEmpty) {
        val (nd, arr, ck) = out((17L, sh.toLong))
        assert(nd === mine.length.toLong)
        val arrived = mine.filter(d => a16(d) != sh.toLong)
        assert(arr === arrived.length.toLong)
        assert(ck === arrived.map(d =>
          Sketches.h64Scala(s"mv:$d") % 1000003L).sum)
        if (sh != 16) assert(arr === 0L,
          s"shard $sh (old) must not receive arrivals")
      }
    }
  }

  test("q180: Simpson diversity replays from the Feistel Scala twin") {
    def feistelScala(epoch: Int, docId: Long): Long = {
      var l = docId / 1024; var r = docId % 1024
      for (round <- 1 to 3) {
        val f = Sketches.h64Scala(s"fe:$epoch:$round:$r") & 1023L
        val t = r; r = l ^ f; l = t
      }
      l * 1024 + r
    }
    val docs = graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, dir)
        .select("doc_id", "source").as[(Long, String)].collect()
    }
    val out = run("q180_shard_diversity").map(r =>
      (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for (e <- 0 to 1) {
      val byShard = docs.groupBy { case (d, _) => feistelScala(e, d) & 15L }
      byShard.foreach { case (shard, members) =>
        val (t, nsrc, sq, eff) = out((e.toLong, shard))
        val counts = members.groupBy(_._2).map(_._2.length.toLong)
        assert(t === members.length.toLong)
        assert(nsrc === counts.size.toLong)
        assert(sq === counts.map(c => c * c).sum)
        assert(eff === t * t * 1000000L / sq)
        // the permutation must actually mix: no source-pure shards on
        // a 20-source fixture
        assert(nsrc >= 2L, s"epoch $e shard $shard collapsed to $nsrc")
      }
    }
  }
}
