package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming form of the drift triple — L101 KS (q169), L118 W1
  * (q186) off one held n_chars histogram, and L102 PSI (q170) off a
  * second held token-count histogram at the q170 bin geometry — with
  * every readout available after any micro-batch.
  *
  * State is the binned histogram itself — `(source, half, bin) → count`,
  * at most |sources|·2·32 entries, fixed by geometry not stream length.
  * Per micro-batch the batch's histogram is built RELATIONALLY (the same
  * map-side-combined group-by the batch operator uses; only the tiny
  * count map crosses to the driver) and added into held state. Count
  * addition is associative and commutative, so the accumulated histogram
  * is EQUAL to a one-shot build over the union of all arrivals under any
  * chunking or arrival order, and the [[ksReport]] readout over it
  * reproduces the oracle-gated q169 rows exactly
  * (`StreamingDriftSpec` asserts both). Like the CMS form, counting
  * state is NOT idempotent under replay — exactly-once sinks own replay
  * protection.
  */
object StreamingDrift {

  import graft.queries.DriftOps.{KsBins, KsBinChars, PsiBins, PsiBinToks}

  case class Arrival(doc_id: Long, source: String, n_chars: Long)

  /** PSI arrival — the L102 feature (BPE-ish token count) instead of
    * n_chars; its own held histogram at the q170 geometry (16 bins of
    * 16 tokens): one fixed-size state per monitored FEATURE, ≤
    * |sources|·2·16 entries regardless of stream length.
    */
  case class PsiArrival(doc_id: Long, source: String, toks: Long)

  /** (source, half, bin) → count. */
  type Hist = Map[(String, Long, Long), Long]

  val empty: Hist = Map.empty

  /** Fold one micro-batch into `h` (unmodified; a new map returns). */
  def observeBatch(mb: Dataset[Arrival], h: Hist): Hist = {
    val sp = mb.sparkSession
    import sp.implicits._
    val batch = mb.toDF()
      .groupBy(col("source"), (col("doc_id") % 2).as("half"),
        least(expr(s"n_chars div $KsBinChars"), lit(KsBins - 1L)).as("bin"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long, Long)].collect()
    batch.foldLeft(h) { case (acc, (s, half, bin, c)) =>
      val k = (s, half, bin)
      acc + (k -> (acc.getOrElse(k, 0L) + c))
    }
  }

  /** Fold one PSI micro-batch into `h` — same relational build as
    * [[observeBatch]], at the q170 bin geometry.
    */
  def observePsiBatch(mb: Dataset[PsiArrival], h: Hist): Hist = {
    val sp = mb.sparkSession
    import sp.implicits._
    val batch = mb.toDF()
      .groupBy(col("source"), (col("doc_id") % 2).as("half"),
        least(expr(s"toks div $PsiBinToks"), lit(PsiBins - 1L)).as("bin"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long, Long)].collect()
    batch.foldLeft(h) { case (acc, (s, half, bin, c)) =>
      val k = (s, half, bin)
      acc + (k -> (acc.getOrElse(k, 0L) + c))
    }
  }

  /** PSI readout — the q170 arithmetic replayed over the held PSI
    * histogram: per source, DENSIFY to all 16 bins (with Laplace
    * smoothing an absent bin's term is not zero when n_ref ≠ n_cur),
    * p_ppm = (c_ref+1)·10^6 div (n_ref+16) vs q_ppm likewise, term =
    * (p−q)·(ilog2 p − ilog2 q), psi_sum = Σ terms, n_bins_hit =
    * observed bins. Returns (source, n_ref, n_cur, psi_sum,
    * n_bins_hit) sorted by source — the oracle-gated q170 rows
    * exactly (`StreamingDriftSpec` asserts it), completing the drift
    * triple (KS/W1/PSI) in streaming form from held per-feature
    * histograms.
    */
  def psiReport(h: Hist): Seq[(String, Long, Long, Long, Long)] = {
    // the shared JVM ladder twin — NOT a local re-derivation, so the
    // streaming readout cannot drift from the Column/SQL forms
    import graft.functions.Sketches.{ilog2Scala => ilog2}
    h.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (src, entries) =>
      val byBin = entries.groupBy(_._1._3).map { case (bin, es) =>
        bin -> (es.collect { case ((_, 0L, _), c) => c }.sum,
          es.collect { case ((_, 1L, _), c) => c }.sum)
      }
      val nRef = byBin.values.map(_._1).sum
      val nCur = byBin.values.map(_._2).sum
      var psi = 0L
      var hit = 0L
      (0L until PsiBins.toLong).foreach { bin =>
        val (cr, cc) = byBin.getOrElse(bin, (0L, 0L))
        if (cr + cc > 0L) hit += 1L
        val p = (cr + 1L) * 1000000L / (nRef + PsiBins)
        val q = (cc + 1L) * 1000000L / (nCur + PsiBins)
        psi += (p - q) * (ilog2(p) - ilog2(q))
      }
      (src, nRef, nCur, psi, hit)
    }
  }

  /** KS readout — the q169 arithmetic replayed over the held histogram:
    * per source, cumulative counts over OBSERVED bins in bin order,
    * gap = |cum_ref·10^6 div max(n_ref,1) − cum_cur·10^6 div
    * max(n_cur,1)|, ks = max gap, ks_bin = first bin attaining it.
    * Returns (source, n_ref, n_cur, ks_ppm, ks_bin) sorted by source.
    */
  def ksReport(h: Hist): Seq[(String, Long, Long, Long, Long)] = {
    h.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (src, entries) =>
      val byBin = entries.groupBy(_._1._3).map { case (bin, es) =>
        bin -> (es.collect { case ((_, 0L, _), c) => c }.sum,
          es.collect { case ((_, 1L, _), c) => c }.sum)
      }.toSeq.sortBy(_._1)
      val nRef = byBin.map(_._2._1).sum
      val nCur = byBin.map(_._2._2).sum
      var (cumR, cumC) = (0L, 0L)
      val gaps = byBin.map { case (bin, (cr, cc)) =>
        cumR += cr; cumC += cc
        bin -> math.abs(cumR * 1000000L / math.max(nRef, 1L) -
          cumC * 1000000L / math.max(nCur, 1L))
      }
      val ks = gaps.map(_._2).max
      val ksBin = gaps.filter(_._2 == ks).map(_._1).min
      (src, nRef, nCur, ks, ksBin)
    }
  }

  /** W1 readout — the q186 arithmetic over the SAME held histogram
    * (the whole point of monitoring on a shared sketch: one state,
    * every drift read). Each observed bin's gap is weighted by its
    * run length to the next observed bin (absent bins carry the
    * gap), the last run closing at KsBins. Returns
    * (source, n_ref, n_cur, emd_ppm_bins, w1_ppm) sorted by source.
    */
  def emdReport(h: Hist): Seq[(String, Long, Long, Long, Long)] = {
    h.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (src, entries) =>
      val byBin = entries.groupBy(_._1._3).map { case (bin, es) =>
        bin -> (es.collect { case ((_, 0L, _), c) => c }.sum,
          es.collect { case ((_, 1L, _), c) => c }.sum)
      }.toSeq.sortBy(_._1)
      val nRef = byBin.map(_._2._1).sum
      val nCur = byBin.map(_._2._2).sum
      var (cumR, cumC) = (0L, 0L)
      val gaps = byBin.map { case (bin, (cr, cc)) =>
        cumR += cr; cumC += cc
        bin -> math.abs(cumR * 1000000L / math.max(nRef, 1L) -
          cumC * 1000000L / math.max(nCur, 1L))
      }
      val runs = byBin.map(_._1) match {
        case bins => bins.zip(bins.drop(1) :+ KsBins.toLong)
          .map { case (b, nb) => nb - b }
      }
      val emd = gaps.map(_._2).zip(runs).map { case (g, r) => g * r }.sum
      (src, nRef, nCur, emd, emd / KsBins)
    }
  }
}
