package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Measured recall of the approximate ANN paths against the exact
  * brute-force baseline (VERDICT r7 #5: the recall dials — band-OR
  * multi-probe, NProbe — shipped without a measured recall number).
  *
  * Protocol: the driver fixtures' embeddings are isotropic-random (the
  * measured exact top-1 cosine is ≤ 0.45 at every SF — NO vector has a
  * genuine near neighbor), so pipeline recall@1 there is structurally ~0
  * for ANY sublinear method and asserts nothing. Recall is therefore
  * measured the way ANN recall is defined: over a corpus WITH planted
  * near-neighbor structure. The spec writes a 500-vector fixture
  * (embeddings.parquet schema: vec_id, embedding, label) where every
  * query id (vec_id % 50 == 0, q38's own query protocol) has a planted
  * twin at cosine ~0.995 plus random fillers, then runs the REAL
  * registered q38/q67/q70 pipelines over that directory:
  *
  *  - q67 (16-bit hyperplane LSH, 2x8-bit band-OR) → recall@1: its
  *    nearest neighbor IS the exact nearest neighbor (the twin);
  *  - q70 (IVF coarse quantization, NProbe cells) → recall@K vs the
  *    exact top-K.
  *
  * Expected values from the dials: band-OR collision for cos 0.995 is
  * 1-(1-p^8)^2 ≈ 0.95 with p = 1-θ/π ≈ 0.97. The asserted floors sit
  * below the expected values — the spec catches a DIAL regression (a
  * band accidentally narrowed, NProbe dropped), not fixture luck.
  * Measured values are printed and recorded in ROUND_NOTES.
  */
class AnnRecallSpec extends SparkSpec {

  /** Planted-twin corpus written as a real embeddings.parquet. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("ann-recall").toString
    val rnd = new scala.util.Random(20260813L)
    val dims = 64
    def gauss(): Array[Float] = Array.fill(dims)(rnd.nextGaussian().toFloat)
    val rows = Seq.newBuilder[Row]
    val queryIds = (0 until 500 by 50).map(_.toLong)
    val twinOf = queryIds.map(q => q -> (q + 3)).toMap
    val taken = (queryIds ++ twinOf.values).toSet
    queryIds.foreach { q =>
      val v = gauss()
      rows += Row(q, v, 0)
      // twin: small perturbation → cos ≈ 0.995
      rows += Row(twinOf(q), v.map(x => x + rnd.nextGaussian().toFloat * 0.07f), 1)
    }
    (0L until 500L).filterNot(taken).foreach(id => rows += Row(id, gauss(), 2))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
          rows.result()).asJava), schema)
      .repartition(2)
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def rows(q: String): Array[Row] =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  test("q67 banded-LSH recall@1 and q70 IVF recall@K vs exact top-k on planted twins") {
    val exact = rows("q38_ann_brute_topk") // (q_id, rank, vec_id, cos)
    val queries = exact.map(_.getLong(0)).distinct
    assert(queries.length === 10, "fixture must yield q38's 10-query protocol")
    val exactTop1 = exact.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exactTopK = exact.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    // sanity: the planted twin IS the exact nearest neighbor
    assert(queries.forall(q => exactTop1(q) == q + 3),
      "every query's exact top-1 must be its planted twin")

    // q67: (vec_id, sig, nn_id, nn_cos) over ALL vectors; restrict to the
    // query set and score its nn against the exact top-1
    val lsh = rows("q67_ann_lsh_banded16")
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    val lshHits = queries.count(q => lsh.get(q).flatten.contains(exactTop1(q)))
    val lshRecall1 = lshHits.toDouble / queries.length

    // q70: (q_id, rank, vec_id, cell, cos) — top-K per query by design
    val ivfTopK = rows("q70_ann_ivf_coarse").groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val k = exactTopK.head._2.size
    val ivfRecallK = queries.map { q =>
      ivfTopK.getOrElse(q, Set.empty).intersect(exactTopK(q)).size.toDouble / k
    }.sum / queries.length
    val ivfRecall1 = queries.count(q =>
      ivfTopK.getOrElse(q, Set.empty).contains(exactTop1(q))).toDouble / queries.length

    info(f"q67 banded-LSH recall@1 = $lshRecall1%.2f over ${queries.length} planted queries")
    info(f"q70 IVF recall@1 = $ivfRecall1%.2f, recall@$k%d = $ivfRecallK%.2f")
    println(f"[ann-recall] q67_recall@1=$lshRecall1%.2f q70_recall@1=$ivfRecall1%.2f " +
      f"q70_recall@$k%d=$ivfRecallK%.2f n=${queries.length}%d")

    assert(lshRecall1 >= 0.7,
      f"banded-LSH recall@1 regressed: $lshRecall1%.2f (dials: 2x8-bit band-OR)")
    assert(ivfRecall1 >= 0.7,
      f"IVF recall@1 regressed: $ivfRecall1%.2f (dial: NProbe)")
  }

  test("q119 PQ-ADC recall vs exact top-k on planted twins") {
    // the compressed-domain search (L54) measured against the exact
    // baseline: the corpus is reduced to 4 code ids per vector (8
    // codewords per subspace at this fixture size), so recall quantifies
    // what the ~64x memory compression costs — the measure-don't-guess
    // rule applied to the PQ dials (M, K) before anyone ships them
    val exact = rows("q38_ann_brute_topk")
    val queries = exact.map(_.getLong(0)).distinct
    val exactTop1 = exact.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exactTopK = exact.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val k = exactTopK.head._2.size
    val adcTopK = rows("q119_pq_adc_topk").groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recall1 = queries.count(q =>
      adcTopK.getOrElse(q, Set.empty).contains(exactTop1(q))).toDouble /
      queries.length
    val recallK = queries.map { q =>
      adcTopK.getOrElse(q, Set.empty).intersect(exactTopK(q)).size.toDouble / k
    }.sum / queries.length
    info(f"q119 PQ-ADC recall@1 = $recall1%.2f, recall@$k%d = $recallK%.2f")
    println(f"[ann-recall] q119_recall@1=$recall1%.2f " +
      f"q119_recall@$k%d=$recallK%.2f n=${queries.length}%d")
    // measured on this corpus: recall@1 = 0.90, recall@5 = 0.22 — the
    // planted twin (a near-exact copy) quantizes to its query's codes and
    // surfaces at rank 1, while deeper ranks wash out in quantization
    // ties (8 codewords/subspace cannot order moderate-cosine neighbors).
    // Floors sit WELL OFF the measurements (the r10 #2 margin rule): @1
    // catches an encode/tie-break regression, @5 only an outright break.
    assert(recall1 >= 0.7 && recallK >= 0.1,
      f"PQ-ADC recall floor: @1=$recall1%.2f @$k%d=$recallK%.2f")
  }

  test("q119 recall-vs-codebook-stride curve (the PQ memory/recall dial)") {
    // the measure-the-dial rule applied to PQ's K: a denser codebook
    // (smaller stride) quantizes finer, so deep-rank recall must not
    // degrade as K grows. Sweep the stride over the planted-twin corpus
    // with the REAL registered pipeline.
    val exact = rows("q38_ann_brute_topk")
    val queries = exact.map(_.getLong(0)).distinct
    val exactTopK = exact.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val k = exactTopK.head._2.size
    val curve = Seq(63, 21).map { step =>
      val adc = graft.core.CacheScope.scoped {
        graft.queries.CorpusOps.pqAdcTopK(spark, dir, step).collect()
      }.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val rK = queries.map { q =>
        adc.getOrElse(q, Set.empty).intersect(exactTopK(q)).size.toDouble / k
      }.sum / queries.length
      step -> rK
    }
    curve.foreach { case (step, rK) =>
      info(f"q119 stride=$step%d recall@$k%d = $rK%.2f")
    }
    println("[ann-recall] q119_stride_curve=" + curve.map { case (s, r) =>
      f"$s%d:$r%.2f" }.mkString(","))
    val byStep = curve.toMap
    assert(byStep(21) >= byStep(63) - 0.05,
      f"denser PQ codebook must not lose deep recall: " +
        f"K@21=${byStep(21)}%.2f vs K@63=${byStep(63)}%.2f")
  }

  test("q119 recall-vs-M curve (the PQ compression/recall dial)") {
    // the other half of the PQ dial pair (VERDICT r11 #5): M subquantizers
    // store M code ids per vector (M·log2(K) bits packed — 8·6 = 48 bits
    // at M=8/K=64 vs 2048 bits of raw float32: ~43×; M=2 is ~171×), and
    // finer subspaces rank neighbors better. Sweep M over the planted-twin
    // corpus with the SAME parameterized kernel q119 registers; the
    // measured (compression, recall) pairs are the table the default M=4
    // is chosen from (recorded in ROUND_NOTES).
    val exact = rows("q38_ann_brute_topk")
    val queries = exact.map(_.getLong(0)).distinct
    val exactTop1 = exact.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exactTopK = exact.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val k = exactTopK.head._2.size
    val curve = Seq(2, 4, 8).map { m =>
      val adc = graft.core.CacheScope.scoped {
        graft.queries.CorpusOps.pqAdcTopK(spark, dir, nSub = m).collect()
      }.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val r1 = queries.count(q =>
        adc.getOrElse(q, Set.empty).contains(exactTop1(q))).toDouble /
        queries.length
      val rK = queries.map { q =>
        adc.getOrElse(q, Set.empty).intersect(exactTopK(q)).size.toDouble / k
      }.sum / queries.length
      (m, r1, rK)
    }
    curve.foreach { case (m, r1, rK) =>
      info(f"M=$m%d  recall@1=$r1%.2f  recall@$k%d=$rK%.2f")
    }
    println("[ann-recall] q119_m_curve=" + curve.map { case (m, r1, rK) =>
      f"$m%d:$r1%.2f/$rK%.2f" }.mkString(","))
    val byM = curve.map { case (m, r1, rK) => m -> (r1, rK) }.toMap
    // measured: M=2 0.30/0.16, M=4 0.90/0.22, M=8 1.00/0.34 — recall
    // must be non-decreasing in M (finer subspaces can only rank
    // better; a violation localizes an encode/tie-break bug to one
    // subspace width), and the low M=2 end is the POINT: two 32-dim
    // subquantizers at K=64 cannot separate a 64-dim twin from fillers,
    // which is why the default is M=4, not the 171×-compression corner
    curve.sliding(2).foreach { case Seq((mLo, r1Lo, rKLo), (mHi, r1Hi, rKHi)) =>
      assert(r1Hi >= r1Lo - 0.05 && rKHi >= rKLo - 0.05,
        f"recall fell as M grew: M=$mLo%d ($r1Lo%.2f/$rKLo%.2f) → " +
          f"M=$mHi%d ($r1Hi%.2f/$rKHi%.2f)")
    }
    // floors with margin off the measurements (the r10 #2 rule): the
    // default M=4 @1 (0.90 measured) and the fine end M=8 (1.00/0.34)
    assert(byM(4)._1 >= 0.7, f"default-M recall@1 ${byM(4)._1}%.2f < 0.7")
    assert(byM(8)._1 >= 0.85 && byM(8)._2 >= 0.2,
      f"M=8 recall ${byM(8)._1}%.2f/${byM(8)._2}%.2f below 0.85/0.2 floors")
  }

  test("q92 SemDeDup pair recall on planted twins (cell-based candidates)") {
    // the dedup analog of ANN recall: a planted twin at cos ~0.995 is a
    // CONFIDENT near-dup (τ = 0.3), so each twin (q+3) must be assigned a
    // dup_of — missed only when the pair straddles a cell boundary, which
    // is exactly the recall the cell-candidate method trades for its
    // bounded pair count. Measured and floored so a codebook or assignment
    // regression (wrong argmax tie-break, probe removal) is caught.
    val out = rows("q92_semdedup_cells") // (vec_id, cell, dup_of)
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    val twins = (0L until 500L by 50L).map(q => q -> (q + 3))
    val found = twins.count { case (_, b) => out(b).isDefined }
    val exactOf = twins.count { case (a, b) => out(b).contains(a) }
    val recall = found.toDouble / twins.size
    info(f"q92 SemDeDup twin recall = $recall%.2f " +
      f"($exactOf/${twins.size} assigned the twin itself)")
    println(f"[ann-recall] q92_twin_recall=$recall%.2f n=${twins.size}%d")
    assert(recall >= 0.7,
      f"SemDeDup twin recall regressed: $recall%.2f — cell assignment or " +
        "verify threshold changed")
  }

  test("q70 IVF recall-vs-NProbe curve: defaults backed by the curve, floors with margin") {
    // VERDICT r10 #3: the NProbe=4 default previously met its 0.70
    // recall@5 floor with ZERO margin and no curve to justify the dial.
    // Measure recall@{1,5} at NProbe ∈ {1,2,3,4} over the planted-twin
    // corpus using the SAME parameterized builder q70 registers.
    val exact = rows("q38_ann_brute_topk")
    val queries = exact.map(_.getLong(0)).distinct
    val exactTop1 = exact.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exactTopK = exact.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val k = exactTopK.head._2.size
    val curve = (1 to 4).map { np =>
      val topK = graft.core.CacheScope.scoped {
        LlmPipeline.ivfTopK(spark, dir, nprobe = np).collect()
      }.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val r1 = queries.count(q =>
        topK.getOrElse(q, Set.empty).contains(exactTop1(q))).toDouble / queries.length
      val rk = queries.map { q =>
        topK.getOrElse(q, Set.empty).intersect(exactTopK(q)).size.toDouble / k
      }.sum / queries.length
      (np, r1, rk)
    }
    curve.foreach { case (np, r1, rk) =>
      info(f"NProbe=$np%d  recall@1=$r1%.2f  recall@$k%d=$rk%.2f")
      println(f"[ann-recall-curve] q70 nprobe=$np%d recall@1=$r1%.2f recall@$k%d=$rk%.2f")
    }
    val byNp = curve.map { case (np, r1, rk) => np -> (r1, rk) }.toMap
    // recall@K must not DECREASE as more cells are probed (probing is
    // strictly additive candidate generation)
    curve.sliding(2).foreach { case Seq((_, _, rkLo), (_, _, rkHi)) =>
      assert(rkHi >= rkLo - 1e-9, "recall@K decreased as NProbe grew")
    }
    // the default dial (NProbe=4) with floors that now carry margin:
    // measured 1.00/0.70 on this corpus — floors at 0.85/0.55 catch a
    // dial regression without riding the measurement exactly
    assert(byNp(4)._1 >= 0.85,
      f"default-NProbe recall@1 ${byNp(4)._1}%.2f below 0.85 floor")
    assert(byNp(4)._2 >= 0.55,
      f"default-NProbe recall@$k%d ${byNp(4)._2}%.2f below 0.55 floor")
  }

  test("q92 SemDeDup recall/pair-count vs codebook-stride curve") {
    // the quantizer-balance trade the dial controls: larger cells
    // (bigger centroidStep → smaller K) raise twin recall but grow the
    // within-cell candidate-pair count — measure both ends so the
    // default (63) is a chosen point on a curve, not a blind dial
    val twins = (0L until 500L by 50L).map(q => q -> (q + 3))
    val curve = Seq(31, 63, 125).map { step =>
      val out = graft.core.CacheScope.scoped {
        LlmPipeline.semDedupCells(spark, dir, centroidStep = step).collect()
      }
      val dupOf = out.map(r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      val recall = twins.count { case (_, b) => dupOf(b).isDefined }.toDouble / twins.size
      // pair count proxy: sum over cells of |cell|·(|cell|−1)/2 from the
      // output's own cell assignment — the quantity the stride bounds
      val cellSizes = out.groupBy(_.getLong(1)).map(_._2.length.toLong)
      val pairs = cellSizes.map(n => n * (n - 1) / 2).sum
      val kCells = cellSizes.size
      (step, kCells, recall, pairs)
    }
    curve.foreach { case (step, kc, recall, pairs) =>
      info(f"centroidStep=$step%d (K=$kc%d cells)  twin-recall=$recall%.2f  cand-pairs=$pairs%d")
      println(f"[ann-recall-curve] q92 step=$step%d cells=$kc%d recall=$recall%.2f pairs=$pairs%d")
    }
    val byStep = curve.map { case (s0, _, r, p) => s0 -> (r, p) }.toMap
    // default 63 must hold a margin-bearing floor (measured 0.90 here)
    assert(byStep(63)._1 >= 0.75,
      f"default-stride twin recall ${byStep(63)._1}%.2f below 0.75 floor")
    // the trade must be real in the measured direction: the coarser
    // codebook (fewer, larger cells) cannot yield FEWER candidate pairs
    assert(byStep(125)._2 >= byStep(31)._2,
      "coarser codebook produced fewer candidate pairs than the finer one")
  }
}
