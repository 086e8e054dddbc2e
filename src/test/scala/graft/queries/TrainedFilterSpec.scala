package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.Sketches

/** L86–L88 semantics beyond the fixture oracles: the NB classifier's
  * exact integer scoring replayed in plain Scala, the rejection
  * sampler's per-doc accept decisions replayed hash-for-hash, and the
  * split repair's conservation/zero-leakage invariants on a corpus with
  * planted cross-split duplicates.
  */
class TrainedFilterSpec extends SparkSpec {

  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    val d = Files.createTempDirectory("tf-corpus").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def ilog2(x: Long): Long =
    if (x <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)

  test("q154: plain-Scala NB replay matches the engine exactly") {
    val organic = Seq("the quick brown fox", "lazy dogs sleep all day",
      "rivers run to the sea", "quick rivers sleep", "fox and dogs run")
    val rows = (1L to 200L).map(i =>
      (i, organic((i % organic.size).toInt), "en", s"s${i % 4}",
        organic((i % organic.size).toInt).length.toLong))
    val dir = corpusDir(rows)
    // replay: plant, train, integer-ladder score, per-source confusion
    val stride = SampleGraphOps.EntropyPlantStride
    val labeled = rows.map { case (id, t, _, src, _) =>
      val pos = id % stride == 0
      (id, src, if (pos) SampleGraphOps.LowEntropyBlock else t, pos)
    }
    val words = labeled.flatMap { case (id, src, t, pos) =>
      t.trim.split("\\s+").map(w => (id, src, pos, w)) }
    val model = words.groupBy(_._4).map { case (w, ws) =>
      w -> (ws.count(_._3).toLong, ws.count(!_._3).toLong) }
    val np = model.values.map(_._1).sum
    val nn = model.values.map(_._2).sum
    val v = model.size.toLong
    val sh = TrainedFilterOps.NbShift
    def llr(w: String): Long = {
      val (cp, cn) = model(w)
      ilog2(((cp + 1) * sh) / (np + v)) - ilog2(((cn + 1) * sh) / (nn + v))
    }
    val perDoc = words.groupBy(r => (r._1, r._2, r._3))
      .map { case ((id, src, pos), ws) => (id, src, pos, ws.map(r => llr(r._4)).sum) }
    val expected = perDoc.groupBy(_._2).map { case (src, ds) =>
      src -> (ds.size.toLong, ds.count(_._3).toLong,
        ds.count(_._4 > 0).toLong,
        ds.count(d => d._3 && d._4 > 0).toLong,
        ds.count(d => !d._3 && d._4 > 0).toLong,
        ds.map(_._4).sum)
    }
    val out = graft.SparkEntry.queries("q154_nb_quality_classifier")(
        spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, nd, nPos, nPred, tp, fp, ss) =>
      assert((nd, nPos, nPred, tp, fp, ss) === expected(src), s"source $src")
    }
    assert(out.map(_._5).sum === out.map(_._3).sum,
      "the planted class must be fully recovered (tp = n_pos)")
  }

  test("q155: per-doc accept decisions replay hash-for-hash") {
    val rows = (1L to 300L).map(i =>
      (i, s"text $i", "en", "s", (i * 7) % 512))
    val dir = corpusDir(rows)
    val bw = TrainedFilterOps.RejBucketChars
    val q = TrainedFilterOps.RejQ
    val byB = rows.groupBy(r => math.min(r._5 / bw, 7L))
    val target = byB.values.map(_.size).min.toLong
    val expected = byB.map { case (b, ds) =>
      val acc = (target * q) / ds.size
      val after = ds.count(r =>
        Sketches.h64Scala(s"rej:${r._1}") % q < acc).toLong
      b -> (ds.size.toLong, acc, after)
    }
    val out = graft.SparkEntry.queries("q155_rejection_resample")(spark, dir)
      .select("bkt", "n_before", "acc_q20", "n_after", "target")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === byB.size)
    out.foreach { case (b, nb, acc, na, t) =>
      assert(t === target)
      assert((nb, acc, na) === expected(b), s"bucket $b")
    }
  }

  test("q161: sampling follows the score; plants never kept; shift organic") {
    val organic = Seq("the quick brown fox", "lazy dogs sleep all day",
      "rivers run to the sea", "quick rivers sleep", "fox and dogs run")
    val rows = (1L to 300L).map(i =>
      (i, organic((i % organic.size).toInt), "en", s"s${i % 3}",
        organic((i % organic.size).toInt).length.toLong))
    val dir = corpusDir(rows)
    val out = graft.SparkEntry.queries("q161_classifier_guided_sampling")(
        spark, dir)
      .select("source", "n_docs", "n_kept", "n_plant", "n_plant_kept",
        "sum_score", "sum_score_kept")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._4).sum > 0L, "fixture must contain plant docs")
    assert(out.map(_._5).sum === 0L,
      "plant docs sit at smax -> acceptance ~0, never kept")
    val (nAll, nKept) = (out.map(_._2).sum, out.map(_._3).sum)
    assert(nKept > 0L && nKept < nAll)
    // kept mass must skew organic: mean kept score more negative than
    // the overall mean (organic docs score negative under the plant LLR)
    val meanAll = out.map(_._6).sum.toDouble / nAll
    val meanKept = out.map(_._7).sum.toDouble / nKept
    assert(meanKept < meanAll,
      s"kept mean $meanKept must be more organic than overall $meanAll")
  }

  test("q156: conservation and zero leakage on planted cross-split dups") {
    // 400 docs; ids 10,110,210,310 share one text (a 4-doc bow cluster
    // that straddles hash splits with high probability), ids 20/120
    // share another
    val dup1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val dup2 = "one two three four five six seven eight nine ten eleven twelve"
    val rows = (1L to 400L).map { i =>
      val t = if (i % 100 == 10) dup1 else if (i % 100 == 20 && i <= 200) dup2
        else s"unique words for document $i repeated never elsewhere at all plus ${i * 31} and ${i * 17}"
      (i, t, "en", "s", t.length.toLong)
    }
    val dir = corpusDir(rows)
    val out = graft.SparkEntry.queries("q156_split_leakage_repair")(spark, dir)
      .select("split", "n_before", "n_after", "n_moved_in", "leaking_after")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum === out.map(_._3).sum,
      "repair must conserve the doc count")
    assert(out.forall(_._5 === 0L), "no cluster may straddle splits after")
    // the funnel excludes doc_id % 97 == 0 eval docs: 400 - |{97,194,291,388}|
    assert(out.map(_._2).sum === 396L)
  }
}
