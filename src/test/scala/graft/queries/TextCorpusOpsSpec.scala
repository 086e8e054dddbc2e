package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Branch-level semantics of the L50–L55 operators (q115–q120) on planted
  * fixtures, including an independent JVM-side reimplementation of the
  * CDC chunking arithmetic (the insertion-robustness headline) and the
  * PQ-ADC ranking on a hand-computable corpus.
  */
class TextCorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  private def queryByName(name: String) = graft.SparkEntry.queries(name)

  private def docCorpus(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("textops-docs").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def embCorpus(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = Files.createTempDirectory("textops-emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** The engine's portable 60-bit hash, reimplemented independently. */
  private def h64(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("q115: chars, whitespace tokens and BPE-ish tokens per source are exact") {
    val dir = docCorpus(Seq(
      (1L, "ab cd", "en", "s1"),      // 5 chars, 2 ws, 2 bpe
      (2L, "a1! b", "en", "s1"),      // 5 chars, 2 ws, 4 bpe (a|1|!|b)
      (3L, "hello world", "en", "s2") // 11 chars, 2 ws, 2 bpe
    ))
    val out = queryByName("q115_tokenizer_fertility")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out("s1") === ((2L, 10L, 4L, 6L,
      10L * 1000000L / 6L, 6L * 1000000L / 4L)))
    assert(out("s2") === ((1L, 11L, 2L, 2L,
      5500000L, 1000000L)))
  }

  test("q116: identical sources diverge zero-ish, a disjoint source diverges hard") {
    // A and B share the exact distribution; C is disjoint vocabulary
    val dir = docCorpus(Seq(
      (1L, "x y x y", "en", "A"),
      (2L, "x y x y", "en", "B"),
      (3L, "z w z w", "en", "C")))
    val out = queryByName("q116_term_divergence")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // N=12: p_c(x)=p_c(y)=333333 ppm, p_c(z)=p_c(w)=166666 ppm
    // A: p(x)=p(y)=500000, p(z)=p(w)=0 → TV=(166667*2+166666*2)/2
    assert(out("A") === ((4L, 333333L)))
    assert(out("B") === ((4L, 333333L)))
    // C: |500000-166666|*2 + 333333*2 over 2
    assert(out("C") === ((4L, 666667L)))
  }

  test("q117: window and selection counts follow the winnowing contract") {
    // 6 words → 4 shingles → exactly 1 full window of 4 → 1 fingerprint;
    // 5 words → 3 shingles → no full window → density 0
    val dir = docCorpus(Seq(
      (1L, "a b c d e f", "en", "s"),
      (2L, "a b c d e", "en", "s"),
      (3L, (0 until 100).map(i => s"t$i").mkString(" "), "en", "s")))
    val out = queryByName("q117_winnowing")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((4L, 1L, 1L, 250000L)))
    assert(out(2L) === ((3L, 0L, 0L, 0L)))
    // 100 words → 98 shingles, 95 windows; winnowing selects at expected
    // density 2/(W+1) = 0.4 — allow a generous band, and never more
    // selections than windows
    val (n3, w3, sel3, dens3) = out(3L)
    assert(n3 === 98L && w3 === 95L)
    assert(sel3 <= w3 && dens3 > 200000L && dens3 < 600000L,
      s"density $dens3 far from the 2/(W+1) expectation")
  }

  test("q118: CDC chunks re-align after a prepended word; exact vs JVM mirror") {
    // independent reimplementation of the operator's arithmetic
    def chunkFps(words: Seq[String]): Seq[Long] = {
      val n = words.length
      val isBound = (0 until n).map(p =>
        p + 2 < n && h64(words.slice(p, p + 3).mkString(" ")) % 16L == 0L)
      val cid = (0 until n).scanLeft(0)((acc, p) =>
        acc + (if (isBound(p)) 1 else 0)).dropRight(1)
      // chunk_id(p) counts boundaries strictly BEFORE p
      val cidBefore = (0 until n).map(p =>
        (0 until p).count(isBound))
      assert(cid === cidBefore) // two formulations agree
      words.indices.groupBy(cidBefore).toSeq.sortBy(_._1).map {
        case (_, ps) =>
          val mp = ps.min
          ps.map(p => (h64(words(p)) % 4294967296L) * (p - mp + 1)).sum
      }
    }
    // doc 98 is in the query's own %97==1 replay slice → the engine
    // plants doc 2000098 = "ins " + text; doc 99 is control
    val words98 = (0 until 200).map(i => s"w${i % 37}q${i % 11}")
    val words99 = (0 until 150).map(i => s"u$i")
    val dir = docCorpus(Seq(
      (98L, words98.mkString(" "), "en", "s"),
      (99L, words99.mkString(" "), "en", "s")))
    val out = queryByName("q118_cdc_chunk_dedup")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val fp98 = chunkFps(words98)
    val fpIns = chunkFps("ins" +: words98)
    val fp99 = chunkFps(words99)
    val all = fp98 ++ fpIns ++ fp99
    def stats(own: Seq[Long], isReplica: Boolean): (Long, Long, Long, Long) = {
      val shared = own.count(fp => all.count(_ == fp) > 1).toLong
      // originals (doc 98) hold every keeper: its packed (doc, chunk) keys
      // are always below the replica's
      val dups = if (isReplica) shared else 0L
      (own.length.toLong, shared, dups,
        dups * 1000000L / own.length)
    }
    assert(out(98L) === stats(fp98, isReplica = false))
    assert(out(99L) === stats(fp99, isReplica = false))
    assert(out(2000098L) === stats(fpIns, isReplica = true))
    // the headline: the replica re-aligns on most chunks despite the
    // insertion (fixed windows would share zero)
    val sharedReplica = out(2000098L)._2
    assert(sharedReplica >= out(2000098L)._1 - 2 && sharedReplica > 0,
      s"CDC must re-align after the first boundary, shared=$sharedReplica" +
        s" of ${out(2000098L)._1}")
  }

  test("q119: ADC ranks an exact-codeword match first, ties break by id") {
    // codebook = ids 0 (all 1.0) and 63 (all 2.0); query id 0 (all 1.0);
    // vec 5 encodes to c0 → adc 0; vecs 7/63 encode to c63 → adc 64 each
    val dir = embCorpus(Seq(
      (0L, Array.fill(64)(1f), 0),
      (63L, Array.fill(64)(2f), 0),
      (5L, Array.fill(64)(1f), 0),
      (7L, Array.fill(64)(2f), 0)))
    val out = queryByName("q119_pq_adc_topk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3)))
    val q0 = out.collect { case ((0L, rank), v) => rank -> v }.toMap
    assert(q0(1L) === ((5L, 0.0)))
    assert(q0(2L) === ((7L, 64.0)))
    assert(q0(3L) === ((63L, 64.0)))
  }

  test("q121: the pairwise kill matrix equals an independent JVM mirror") {
    // docs chosen to light different kill combinations: a short clean
    // doc, a repetitive one, a top-heavy one, and a long diverse one
    val docs = Seq(
      1L -> "alpha beta gamma",                                   // short
      2L -> Seq.fill(12)("rep").mkString(" "),                    // rep+top
      3L -> ((1 to 20).map(i => s"v$i") :+ "v1").mkString(" "),   // clean-ish
      4L -> (1 to 40).map(i => s"u${i % 35}").mkString(" "))      // long
    val dir = docCorpus(docs.map { case (id, t) => (id, t, "en", "s") })

    // independent mirror of the four registered filter formulas
    def flagsOf(text: String): (Boolean, Boolean, Boolean, Boolean) = {
      val ws = text.trim.split("\\s+").toSeq
      val n = ws.length
      val dist2 = ws.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq.distinct.size
      val kLen = n < 10
      val kRep = (if (n >= 2) 1.0 - dist2.toDouble / (n - 1) else 0.0) > 0.3
      val maxc = ws.groupBy(identity).values.map(_.size).max
      val kTop = maxc.toDouble / n > 0.2
      val score = ws.map(_.toLowerCase).filter(_.nonEmpty)
        .map(w => (h64(w) % 1024L) * 2654435761L % 1001L - 500L).sum
      (kLen, kRep, kTop, score < 0L)
    }
    val f = docs.map { case (_, t) => flagsOf(t) }
    def killsOf(name: String): Seq[Boolean] = name match {
      case "len" => f.map(_._1); case "rep" => f.map(_._2)
      case "top" => f.map(_._3); case "cls" => f.map(_._4)
    }
    val names = Seq("cls", "len", "rep", "top")
    val expect = (for { a <- names; b <- names if a < b } yield {
      val (ka, kb) = (killsOf(a), killsOf(b))
      val both = ka.zip(kb).count { case (x, y) => x && y }.toLong
      val union = ka.zip(kb).count { case (x, y) => x || y }.toLong
      (a, b) -> (docs.size.toLong, ka.count(identity).toLong,
        kb.count(identity).toLong, both, union,
        if (union == 0) 0L else both * 1000000L / union)
    }).toMap
    val out = queryByName("q121_filter_overlap")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(out === expect)
    // sanity on the fixture: at least one filter actually kills something
    assert(expect.values.exists(_._5 > 0), "fixture lights no kill at all")
  }

  test("q122: cluster sizes land in their power-of-two buckets") {
    // ids avoid the %97==1 replay slice so the planted clusters are the
    // only ones: a 3-cluster, a 2-cluster, one singleton
    val dir = docCorpus(Seq(
      (2L, "same words here", "en", "s"), (3L, "same words here", "en", "s"),
      (4L, "same words here", "en", "s"),
      (5L, "other text body", "en", "s"), (6L, "other text body", "en", "s"),
      (7L, "unique solitary doc", "en", "s")))
    val out = queryByName("q122_cluster_histogram")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      1L -> ((1L, 1L, 0L)),
      2L -> ((1L, 2L, 1L)),
      4L -> ((1L, 3L, 2L))))
  }

  test("q126: a one-keystroke replica is found by bands and verified at distance 1") {
    // doc 98 rides the query's own %97==1 replay → replica 4000098 with
    // its first character substituted: MinHash bands still collide (only
    // shingles touching word 1 change) and levenshtein verifies exactly 1
    val words = (0 until 40).map(i => s"m${i % 17}n${i % 7}")
    val dir = docCorpus(Seq(
      (98L, words.mkString(" "), "en", "s"),
      (99L, (0 until 40).map(i => s"q$i").mkString(" "), "en", "s")))
    val out = queryByName("q126_editdist_neardup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val text = words.mkString(" ")
    assert(out((98L, 4000098L)) ===
      ((1L, text.length.toLong, 1000000L / text.length)))
    // the unrelated doc pairs with nobody
    assert(!out.keySet.exists { case (a, b) => a == 99L || b == 99L })
  }

  test("q127: zero-widths and homoglyphs are counted and the scrub is idempotent") {
    // doc 98 rides the %97==1 replay → replica 5000098 carries the
    // adversarial prefix: 2 zero-width chars (ZWSP, BOM) and 3 foldable
    // Cyrillic homoglyphs (а е о); all base docs are clean ASCII
    val dir = docCorpus(Seq(
      (98L, "plain ascii text here", "en", "s"),
      (99L, "more plain ascii words", "en", "s")))
    val out = queryByName("q127_unicode_hygiene")(spark, dir).collect()
    assert(out.length === 1)
    val r = out(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) === ((3L, 1L, 1L, 2L, 3L, 0L)))
  }

  test("q128: surprise is zero on top-rank text and saturates on word salad") {
    // doc 1 repeats the corpus's rank-1 word (surprise 0, keep); doc 2
    // holds 300 distinct singletons: 255 fill vocab ranks 2..256, 45 are
    // out-of-vocab at penalty 9 — the total is rank-layout independent:
    // sum over r=2..256 of floor(log2(r)) + 45*9 = 1546 + 405 = 1951
    val salad = (1 to 300).map(i => f"u$i%03d").mkString(" ")
    val dir = docCorpus(Seq(
      (1L, "the the the the", "en", "s"),
      (2L, salad, "en", "s")))
    val out = queryByName("q128_surprise_score")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) === ((4L, 0L, 0L, true)))
    val expectSum = (2 to 256).map(r =>
      (math.log(r) / math.log(2)).toInt.toLong).sum + 45L * 9L
    assert(out(2L) === ((300L, expectSum,
      expectSum * 1000000L / 300L, false)))
  }

  test("q120: an appended-tail replica contains its original completely") {
    // doc 98 (80 words → chunks at 0 and 32, both full 48-word windows)
    // is in the %97==1 replay slice → the engine plants 3000098 with a
    // 20-word tail: the original is a perfect substring of the replica
    val words = (0 until 80).map(i => s"c${i % 13}x${i % 7}")
    val dir = docCorpus(Seq(
      (98L, words.mkString(" "), "en", "s"),
      (99L, (0 until 80).map(i => s"k$i").mkString(" "), "en", "s")))
    val out = queryByName("q120_chunk_containment")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // original → replica: both of its 2 chunks present → 1e6 ppm
    assert(out((98L, 3000098L)) === ((2L, 2L, 1000000L)))
    // replica → original: 2 of its 3 chunks → 666666 ppm (≥ the floor)
    assert(out((3000098L, 98L)) === ((3L, 2L, 666666L)))
    // the control doc pairs with nobody
    assert(!out.keySet.exists { case (a, b) => a == 99L || b == 99L })
  }
}
