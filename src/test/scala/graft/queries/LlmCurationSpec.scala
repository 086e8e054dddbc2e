package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Semantic invariants of the curation operators (L33–L38, q98–q103) on
  * planted corpora — the branch-level proofs the SQL-oracle hash can't
  * isolate (the oracle gates whole-result parity; these pin WHICH rows
  * carry which verdicts on fixtures built to exercise every branch).
  */
class LlmCurationSpec extends SparkSpec {

  import spark.implicits._

  private def queryByName(name: String) =
    graft.SparkEntry.queries(name)

  /** Write a documents.parquet corpus into a temp dir and return the dir. */
  private def corpus(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("curation-corpus").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("q98: a replica document's chunks are all dups; the original keeps them") {
    // 60 words → 2 chunks each (48-word window, 32 stride); ids avoid the
    // query's own %97==1 replay slice so the planted pair is the only dup
    val sixty = (0 until 60).map(i => s"w$i").mkString(" ")
    val unique = (0 until 60).map(i => s"u$i").mkString(" ")
    val dir = corpus(Seq(
      (2L, sixty, "en", "s"), (3L, sixty, "en", "s"), (4L, unique, "en", "s")))
    val out = queryByName("q98_chunk_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // original: both chunks shared, none counted as dup (it is the keeper)
    assert(out(2L) === ((2L, 2L, 0L, 0L)))
    // replica: every chunk is a dup of doc 2's — dup_ppm saturates
    assert(out(3L) === ((2L, 2L, 2L, 1000000L)))
    // unique doc: untouched
    assert(out(4L) === ((2L, 0L, 0L, 0L)))
  }

  test("q99: contamination attributes corpus hits to the right benchmark") {
    // eval doc (id 97, benchmark "bench1") shares its only 3-gram with
    // corpus doc 2 but not doc 3; eval doc 194 ("bench2") hits nothing
    val dir = corpus(Seq(
      (97L, "alpha beta gamma", "en", "bench1"),
      (194L, "delta epsilon zeta", "en", "bench2"),
      (2L, "alpha beta gamma extra words here", "en", "web"),
      (3L, "totally different content words here", "en", "web")))
    val out = queryByName("q99_benchmark_contamination")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // bench1: 1 eval doc, 1 distinct 3-gram, 1 of 2 corpus docs dirty
    assert(out("bench1") === ((1L, 1L, 1L, 500000L)))
    // bench2: present with zero hits (the LEFT-join keeps clean benchmarks)
    assert(out("bench2") === ((1L, 1L, 0L, 0L)))
  }

  test("q100: the P25 threshold keeps three of four docs per language") {
    // four docs with strictly increasing quality (longer text → higher
    // length-saturation term): P25 interpolates between the 1st and 2nd
    // scores, so exactly 3 of 4 clear it
    val texts = Seq(20, 60, 120, 240).map(n =>
      (0 until n).map(i => s"the w$i of").mkString(" "))
    val dir = corpus(texts.zipWithIndex.map { case (t, i) =>
      ((i + 2).toLong, t, "en", "s")
    })
    val row = queryByName("q100_adaptive_quality")(spark, dir).collect()
    assert(row.length === 1)
    val r = row.head
    assert(r.getLong(1) === 4L)     // n_docs
    assert(r.getLong(3) === 3L)     // n_keep
    assert(r.getLong(4) === 750000L) // keep_ppm
  }

  test("q101: canonical-form dups (re-ordered words) are counted and token-weighted") {
    // docs 2 and 3 share a bag-of-words (different order) → one cluster,
    // doc 3 is the dup; doc 4 is its own cluster
    val dir = corpus(Seq(
      (2L, "aa bb cc dd ee", "en", "s1"),
      (3L, "ee dd cc bb aa", "en", "s1"),
      (4L, "ff gg hh", "en", "s1")))
    val r = queryByName("q101_dedup_impact")(spark, dir).collect().head
    assert(r.getString(0) === "s1")
    assert(r.getLong(1) === 3L)      // n_docs
    assert(r.getLong(2) === 2L)      // n_clusters
    assert(r.getLong(3) === 1L)      // n_dup_docs (doc 3)
    assert(r.getLong(4) === 13L)     // total_tokens 5+5+3
    assert(r.getLong(5) === 5L)      // dup_tokens (doc 3's)
    assert(r.getLong(6) === 333333L) // dup_ppm = 1e6 div 3
  }

  test("q102: duplicated text scores zero novelty, unique text scores full") {
    val shared = "one two three four five six"
    val dir = corpus(Seq(
      (2L, shared, "en", "s"), (3L, shared, "en", "s"),
      (4L, "seven eight nine ten eleven", "en", "s")))
    val out = queryByName("q102_novelty_score")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(2L) === ((4L, 0L, 0L)))       // every shingle df=2
    assert(out(3L) === ((4L, 0L, 0L)))
    assert(out(4L) === ((3L, 3L, 1000000L))) // every shingle unique
  }

  test("q103: an identical pair lands in the n_match=16 bucket at exact Jaccard 1.0") {
    val same = (0 until 30).map(i => s"x$i").mkString(" ")
    val dir = corpus(
      Seq((2L, same, "en", "s"), (3L, same, "en", "s")) ++
        (10L to 29L).map(i =>
          (i, (0 until 12).map(w => s"d${i}w$w").mkString(" "), "en", "s")))
    val rows = queryByName("q103_minhash_calibration")(spark, dir).collect()
    val full = rows.find(_.getLong(0) == 16L)
    assert(full.isDefined, "identical pair must agree on all 16 positions")
    assert(full.get.getLong(1) === 1000000L) // est_ppm
    assert(full.get.getDouble(4) === 1.0)    // min_exact: identical shingle sets
    // est_ppm is monotone in n_match, and the bucket stats are ordered
    val byMatch = rows.sortBy(_.getLong(0))
    assert(byMatch.map(_.getLong(1)).sliding(2).forall(p => p.head <= p.last))
    rows.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-6 &&
        r.getDouble(3) <= r.getDouble(5) + 1e-6,
        s"min <= mean <= max violated in bucket ${r.getLong(0)}")
    }
  }

  test("q104: the small topic cluster keeps everything, the big one thins to match") {
    // two orthogonal topic directions; ids 0..79 so the codebook seeds are
    // ids 0 (cluster A) and 63 (cluster B): A = 60 vectors, B = 20
    def vec(axis: Int): Array[Float] = {
      val a = Array.fill(64)(0f); a(axis) = 1f; a
    }
    val dir = Files.createTempDirectory("cbal-corpus").toString
    (0L to 79L).map { id =>
      (id, vec(if (id < 60L) 0 else 1), 0)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = queryByName("q104_cluster_balance")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.length === 2, s"expected two cells, got $out")
    val Seq((nBig, tBig, sBig), (nSmall, tSmall, sSmall)) =
      out.sortBy(-_._1).toSeq
    assert(nBig === 60L && nSmall === 20L)
    // the binding (smallest) cell keeps every member at threshold 1e6
    assert(tSmall === 1000000L && sSmall === 20L)
    // the big cell thins toward the small cell's size: 20e6 div 60
    assert(tBig === 333333L)
    assert(sBig < nBig && sBig > 0L,
      s"big cell must genuinely downsample, kept $sBig of $nBig")
  }

  test("q105: refined centroids are the exact per-cell component means") {
    // cluster A (ids 0-59): axis-0 unit vectors; cluster B (ids 60-79):
    // axis-1 units, HALF of them with an extra 0.5 on axis 2 — the
    // refined cell-B centroid must land on the exact mean (0, 1, 0.25, …)
    val dir = Files.createTempDirectory("lloyd-corpus").toString
    (0L to 79L).map { id =>
      val a = Array.fill(64)(0f)
      if (id < 60L) a(0) = 1f
      else { a(1) = 1f; if (id < 70L) a(2) = 0.5f }
      (id, a, 0)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = queryByName("q105_quantizer_refine")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.size === 2 * 64, "two cells x 64 dims")
    val cells = out.keys.map(_._1).toSet
    assert(cells === Set(0L, 63L), s"codebook seeds are ids 0 and 63: $cells")
    // cell 0: 60 identical axis-0 units -> centroid exactly (1, 0, 0, ...)
    assert(out((0L, 1L)) === ((60L, 1.0)))
    assert(out((0L, 2L)) === ((60L, 0.0)))
    // cell 63: mean of 20 members, 10 carrying 0.5 on axis 2 -> exactly 0.25
    assert(out((63L, 2L)) === ((20L, 1.0)))
    assert(out((63L, 3L)) === ((20L, 0.25)))
    assert(out((63L, 4L)) === ((20L, 0.0)))
  }

  test("q106: hashed scoring is linear in token count and labels by sign") {
    // same word repeated n times must score exactly n x the single-word
    // score (one bucket, one weight), case-folded by the lowercase pass
    val dir = corpus(Seq(
      (2L, "Alpha alpha ALPHA", "en", "s"),
      (3L, "alpha", "en", "s"),
      (4L, "alpha beta", "en", "s")))
    val out = queryByName("q106_hash_classifier")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val (n2, s2, l2) = out(2L)
    val (n3, s3, l3) = out(3L)
    val (n4, s4, _) = out(4L)
    assert(n2 === 3L && n3 === 1L && n4 === 2L)
    assert(s2 === 3 * s3, "case-folded repeats hit one bucket: score = n x w")
    // score is additive over tokens: beta's weight = doc4 - doc3
    val betaW = s4 - s3
    assert(betaW >= -500L && betaW <= 500L, s"weights live in [-500,500]: $betaW")
    assert(l2 === (if (s2 >= 0) "keep" else "drop"))
    assert(l3 === (if (s3 >= 0) "keep" else "drop"))
  }

  test("q107: temperature sharing upsamples the small source, epochs = ceil") {
    // source a: 60 BPE-ish tokens (30 words, each a letter-run + digit-run),
    // source b: 960 — raw share 1:16, sqrt share 1:4, so a's allocation
    // must EXCEED its raw share (the point of temperature resampling)
    val words = (n: Int, p: String) => (0 until n).map(i => s"$p$i").mkString(" ")
    val dir = corpus(Seq(
      (2L, words(30, "a"), "en", "small"),
      (3L, words(240, "b"), "en", "big"),
      (4L, words(240, "c"), "en", "big")))
    val out = queryByName("q107_temperature_mixture")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val (nA, shareA, targetA, rateA, epochsA) = out("small")
    val (nB, shareB, targetB, rateB, epochsB) = out("big")
    assert(nA === 60L && nB === 960L)
    // integer-exact mirror of the operator's formula
    def sq(n: Long) = math.floor(math.sqrt(n.toDouble) * 1e6).toLong
    val total = sq(nA) + sq(nB)
    assert(shareA === sq(nA) * 1000000L / total)
    assert(targetA === 1000000L * sq(nA) / total)
    assert(rateA === math.min(1000000L, targetA * 1000000L / nA))
    assert(epochsA === (targetA + nA - 1) / nA)
    assert(epochsB === (targetB + nB - 1) / nB)
    // temperature property: small source's share beats its raw token share
    assert(shareA * (nA + nB) > 1000000L * nA,
      s"sqrt-temperature must upsample the small source: $shareA")
    assert(shareA + shareB <= 1000000L && shareA + shareB >= 999998L,
      "shares are a partition of the budget up to integer-div truncation")
    // the 1e6-token budget dwarfs this 1020-token fixture, so BOTH sources
    // repeat (rate caps at 1e6) — the temperature signal is the small
    // source repeating disproportionately more than its raw share implies
    assert(epochsA > 1L && rateA === 1000000L && rateB === 1000000L)
    // epochs ratio ~= raw-ratio / sqrt-ratio = 16/4 = 4 (minus int truncation)
    assert(epochsA > 3L * epochsB && epochsA < 5L * epochsB,
      s"sqrt-temperature repeats the small source ~4x the big one's rate " +
        s"(raw 1:16, sqrt 1:4): $epochsA vs $epochsB")
  }

  test("q108: per-source sample is capped, rank-ordered, and reproducible") {
    // "big": 500 docs (>> K*C=40, the prefilter binds); "tiny": 3 docs
    // (< K=5, threshold opens to 1e6 and the whole stratum ranks)
    val rows = (0 until 500).map(i => (i.toLong, s"doc $i", "en", "big")) ++
      Seq(900L, 901L, 902L).map(id => (id, s"tiny $id", "en", "tiny"))
    val dir = corpus(rows)
    val run1 = queryByName("q108_stratified_sample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val run2 = queryByName("q108_stratified_sample")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(run1.toSeq === run2.toSeq, "sample is a pure function of the data")

    val bySource = run1.groupBy(_._1)
    // big stratum: exactly K rows, ranks 1..5, h ascending
    val big = bySource("big").sortBy(_._2)
    assert(big.map(_._2).toSeq === (1L to 5L))
    assert(big.map(_._4).toSeq === big.map(_._4).sorted.toSeq, "h ascends")
    // every sampled big-doc cleared the prefilter threshold (40e6/500 ppm)
    assert(big.forall(_._4 < 80000L), s"threshold binds: ${big.map(_._4).toSeq}")
    // tiny stratum: all 3 docs present, ranked completely
    val tiny = bySource("tiny").sortBy(_._2)
    assert(tiny.map(_._2).toSeq === (1L to 3L))
    assert(tiny.map(_._3).toSet === Set(900L, 901L, 902L))
  }
}
