package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** L71 BPE merge-step semantics the oracle can't isolate: the selection
  * statistic counts OVERLAPPING adjacencies (classic BPE — a run 'aaa'
  * contributes (a,a) twice) while the realized saving counts greedy
  * left-to-right NON-overlapping merges ('aaa' merges once), and the two
  * must diverge exactly on runs.
  */
class BpeMergeSpec extends SparkSpec {

  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("bpe-corpus").toString
    // 'aaa' x3: pair (a,a) counted 2 per word (overlapping) but merges
    // once per word (greedy); 'ab ab' gives (a,b) clean pairs
    Seq(
      (1L, "aaa ab", "en", "s", 0L),
      (2L, "aaa ab", "en", "s", 0L),
      (3L, "aaa xy", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("pair counts overlap, savings merge greedily, rank ties break by pair") {
    val rows = graft.SparkEntry.queries("q139_bpe_merge_step")(spark, dir)
      .select("rank", "pair", "pair_count", "n_words", "merge_savings")
      .as[(Long, String, Long, Long, Long)].collect().toList
    val byPair = rows.map(r => r._2 -> r).toMap
    // 'aaa' freq 3: (a,a) adjacency count = 2 x 3 = 6, greedy saving = 1 x 3
    assert(byPair("aa")._3 === 6L, "overlapping adjacency count")
    assert(byPair("aa")._5 === 3L, "greedy non-overlapping saving")
    assert(byPair("aa")._4 === 1L, "one distinct word contains aa")
    // 'ab' freq 2: count 2, saving 2 — count == saving off runs
    assert(byPair("ab")._3 === 2L)
    assert(byPair("ab")._5 === 2L)
    // rank 1 is the max-count pair — the merge a BPE trainer picks
    assert(rows.find(_._1 == 1L).get._2 === "aa")
    // deterministic tie-break: equal-count pairs order lexicographically
    val tied = rows.filter(_._3 == 1L).map(_._2)
    assert(tied === tied.sorted, s"tie order not lexicographic: $tied")
  }
}
