package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Branch-level semantics of the L44–L49 operators (q109–q114) on planted
  * fixtures — the proofs the whole-result oracle hash can't isolate: which
  * code/flag/count lands on which row, tie-break directions, and the
  * replication arithmetic.
  */
class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  private def queryByName(name: String) = graft.SparkEntry.queries(name)

  private def docCorpus(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("corpusops-docs").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def embCorpus(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = Files.createTempDirectory("corpusops-emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def axisVec(axis: Int, v: Float = 1f): Array[Float] = {
    val a = Array.fill(64)(0f); a(axis) = v; a
  }

  test("q109: PQ codes pick the per-subspace nearest codeword; ties go low") {
    // codebook seeds are ids 0 and 63 (stride 63, capped): c0 = all 1.0,
    // c63 = all 2.0. Vector 5 matches c63 exactly on subspaces 0-1 and c0
    // on subspaces 2-3 (distortion 0); vector 7 = all 1.5 is equidistant
    // everywhere, so every code tie-breaks to the LOWER id with exact
    // per-subspace distance 16 * 0.25 = 4.0
    val dir = embCorpus(Seq(
      (0L, Array.fill(64)(1f), 0),
      (63L, Array.fill(64)(2f), 0),
      (5L, Array.fill(32)(2f) ++ Array.fill(32)(1f), 0),
      (7L, Array.fill(64)(1.5f), 0)))
    val out = queryByName("q109_pq_encode")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
          r.getDouble(5))).toMap
    assert(out(5L)._1 === ((63L, 63L, 0L, 0L)))
    assert(out(5L)._2 === 0.0)
    assert(out(7L)._1 === ((0L, 0L, 0L, 0L)), "equidistant must tie low")
    assert(out(7L)._2 === 16.0)
    // the codewords themselves encode to themselves with zero distortion
    assert(out(0L)._1 === ((0L, 0L, 0L, 0L)) && out(0L)._2 === 0.0)
    assert(out(63L)._1 === ((63L, 63L, 63L, 63L)) && out(63L)._2 === 0.0)
  }

  test("q110: a corpus vector aligned with an eval vector is contaminated") {
    // eval = id 97 (axis 0); id 1 is the same direction scaled (cos = 1,
    // contaminated), id 2 is orthogonal (clean); both carry label 0
    val dir = embCorpus(Seq(
      (97L, axisVec(0), 9),
      (1L, axisVec(0, 2f), 0),
      (2L, axisVec(1), 0)))
    val out = queryByName("q110_semantic_decontamination")(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // label 0: two corpus vectors, one contaminated by one hit
    assert(out(0) === ((2L, 1L, 1L, 500000L)))
    // the eval vector itself is NOT part of the corpus report
    assert(!out.contains(9))
  }

  test("q111: prototypes sit on their centroid, orthogonal vectors are outliers") {
    // centroids (stride 63): id 0 = axis0, id 63 = axis1. id 5 duplicates
    // centroid 0 (best_cos 1 → prototype); id 9 is orthogonal to BOTH
    // (best_cos 0 → outlier, assigned to cell 0 by the tie-low rule)
    val dir = embCorpus(Seq(
      (0L, axisVec(0), 0),
      (63L, axisVec(1), 0),
      (5L, axisVec(0, 3f), 0),
      (9L, axisVec(2), 0)))
    val out = queryByName("q111_prototypicality")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // cell 0: centroid + its duplicate (qcos 2e6) + the orthogonal
    // tie-assigned outlier (qcos 1e6) → mean (2e6+2e6+1e6) div 3
    assert(out(0L) === ((3L, 1666666L, 2L, 1L)))
    // cell 63: just the centroid, itself a prototype
    assert(out(63L) === ((1L, 2000000L, 1L, 0L)))
  }

  test("q112: buckets, padding and the global-batch comparison are exact") {
    // token counts (alpha words → one BPE-ish token each): 10, 20, 100
    val dir = docCorpus(Seq(
      (1L, (0 until 10).map(i => "aa").mkString(" "), "en", "s"),
      (2L, (0 until 20).map(i => "bb").mkString(" "), "en", "s"),
      (3L, (0 until 100).map(i => "cc").mkString(" "), "en", "s")))
    val out = queryByName("q112_length_buckets")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // global: gmax=100, gn=3, gsum=130 → waste (300-130)/300
    val gw = 170L * 1000000L / 300L
    assert(out(16L) === ((1L, 10L, 6L, 375000L, gw)))
    assert(out(32L) === ((1L, 20L, 12L, 375000L, gw)))
    assert(out(128L) === ((1L, 100L, 28L, 218750L, gw)))
    // bucketing strictly beats the single global batch here
    assert(out.values.forall { case (_, _, _, wastePpm, g) => wastePpm < g })
  }

  test("q113: repeated-context docs stay familiar, a giant unique doc does not") {
    // docs 1/2 share the same two-word text → their bigram has df 2 and
    // tops the model; doc 3 carries 1199 distinct df=1 bigrams, of which
    // the 256-entry model can hold at most 255 → familiarity under 30%
    val big = (0 until 1200).map(i => s"u$i").mkString(" ")
    val dir = docCorpus(Seq(
      (1L, "alpha beta", "en", "s"),
      (2L, "alpha beta", "en", "s"),
      (3L, big, "en", "s")))
    val out = queryByName("q113_bigram_familiarity")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) === ((1L, 1L, 1000000L, true)))
    assert(out(2L) === ((1L, 1L, 1000000L, true)))
    val (n3, known3, fam3, keep3) = out(3L)
    assert(n3 === 1199L)
    assert(known3 <= 255L)
    assert(fam3 < CorpusOps.BigramKeepPpm && !keep3,
      s"1199 df=1 bigrams against a 256-entry model must fall under the " +
        s"threshold, got fam=$fam3")
  }

  test("q123: a replayed vector is a semantic dup of its original; novel content is new") {
    // corpus = ids 2/5/63 on distinct axes (codebook seed: id 63, the only
    // corpus multiple of 63). Batch = id 0 (%89==0, a novel axis) plus the
    // engine's own planted replay of id 2 (%83==2 → arrives as 1000002).
    val dir = embCorpus(Seq(
      (2L, axisVec(0), 0),
      (5L, axisVec(2), 0),
      (63L, axisVec(1), 0),
      (0L, axisVec(3), 0)))
    val out = queryByName("q123_incremental_semantic_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getString(3))).toMap
    assert(out.keySet === Set(0L, 1000002L), "exactly the arriving batch")
    // the replay verifies against its original (cos = 1) and nothing else
    assert(out(1000002L) === ((63L, Some(2L), "semantic_dup")))
    // novel content: candidates exist (single cell) but no cosine clears τ
    assert(out(0L) === ((63L, None, "new")))
  }

  test("q125: the agreement matrix separates both/text-only/semantic-only dups") {
    // ids chosen so each planted replay class fires exactly once:
    // %83==2 (id 2) → both-modal dup; %83==5 (id 5) → text-only (its
    // replica's embedding is reversed); %83==7 (id 7) → semantic-only
    // (its replica's text is reworded). Base vectors pairwise orthogonal
    // so no natural semantic matches muddy the count.
    val texts = Map(0L -> "zero base words", 2L -> "two base words",
      5L -> "five base words", 7L -> "seven base words",
      63L -> "sixtythree base words")
    val axes = Map(0L -> 0, 2L -> 4, 5L -> 2, 7L -> 3, 63L -> 1)
    val dDir = Files.createTempDirectory("xmodal").toString
    texts.toSeq.map { case (id, t) => (id, t, "en", "s", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dDir/documents.parquet")
    axes.toSeq.map { case (id, ax) => (id, axisVec(ax), 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dDir/embeddings.parquet")
    val r = queryByName("q125_crossmodal_agreement")(spark, dDir)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((8L, 2L, 2L, 1L, 3L, 333333L)))
  }

  test("q114: replication emits whole epochs plus a hash-selected remainder") {
    // two sources: "small" is upsampled hard (temperature flattening),
    // "big" keeps roughly its share. Every copy index from 1..floor must
    // contain ALL of the source's docs; the remainder epoch only some.
    val word = "tok"
    def doc(n: Int): String = Seq.fill(n)(word).mkString(" ")
    val dir = docCorpus(
      (1L to 4L).map(id => (id, doc(100), "en", "small")) ++
        (11L to 20L).map(id => (id, doc(4000), "en", "big")))
    val out = queryByName("q114_mixture_materialization")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val small = out.collect { case ((s, c), n) if s == "small" => c -> n }
    val big = out.collect { case ((s, c), n) if s == "big" => c -> n }
    // small: n_tok=400, big: n_tok=40000 → sq 20e6 / 200e6, shares 1/11
    // and 10/11 of the 1e6 budget → small target 90909 tokens over 400 →
    // rate 227.2725 epochs; big target 909090 over 40000 → rate 22.727...
    val smallFloor = 227L
    val bigFloor = 22L
    (1L to smallFloor).foreach(c => assert(small(c) === 4L,
      s"whole epoch $c must hold every small doc"))
    (1L to bigFloor).foreach(c => assert(big(c) === 10L))
    assert(!small.keySet.exists(_ > smallFloor + 1))
    assert(!big.keySet.exists(_ > bigFloor + 1))
    // the remainder epoch holds exactly the docs whose "mix:" hash clears
    // the fractional rate — recomputed here independently of the engine
    def h(id: Long): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"mix:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16) % 1000000L
    assert(small.getOrElse(smallFloor + 1, 0L) ===
      (1L to 4L).count(h(_) < 272500L).toLong)
    assert(big.getOrElse(bigFloor + 1, 0L) ===
      (11L to 20L).count(h(_) < 727250L).toLong)
  }

  test("q114: the epoch ceiling binds on a degenerate near-empty source") {
    // "tiny" holds ONE token against a large partner: the uncapped
    // temperature rate would be ~4975 epochs; the MaxEpochs cap (1000)
    // must bound the fan-out exactly — capped rate 1000.000000 → every
    // doc gets precisely 1000 copies, no fractional remainder epoch
    val dir = docCorpus(Seq(
      (1L, "tok", "en", "tiny"),
      (2L, Seq.fill(40000)("tok").mkString(" "), "en", "huge")))
    val out = queryByName("q114_mixture_materialization")(spark, dir)
      .collect().collect { case r if r.getString(0) == "tiny" =>
        r.getLong(1) -> r.getLong(2) }.toMap
    assert(out.keySet.max === CorpusOps.MaxEpochs.toLong)
    assert(out.values.forall(_ === 1L))
    assert(out.size === CorpusOps.MaxEpochs)
  }
}
