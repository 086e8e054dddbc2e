package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming form of L133's term-burstiness statistics (q201): the
  * per-term dispersion accounting an ingest monitor keeps as documents
  * arrive, with the VMR readout available after every micro-batch.
  *
  * State is `term → (df, Σc, Σc²)` plus the corpus doc count —
  * |vocab|-bounded, not corpus-bounded (the L95/StreamingPostings
  * stance). Documents are atomic rows, so each contributes its whole
  * clipped count vector in exactly one micro-batch; per batch the
  * deltas are computed RELATIONALLY by the same clip + two-level
  * aggregate the batch operator runs (map-side combined; only the
  * vocab-sized delta crosses to the driver) and added into held state.
  * Triple addition is associative and commutative, so accumulated
  * state equals a one-shot build under any chunking or arrival order,
  * and [[vmr]] reproduces the q201 ladder exactly
  * (`StreamingBurstinessSpec` asserts stream == batch). Counting state
  * is not idempotent under replay — exactly-once sinks own replay
  * protection.
  */
object StreamingBurstiness {

  case class Arrival(doc_id: Long, text: String)

  /** Per-term (df, Σ clipped c, Σ clipped c²) and the doc count. */
  case class Stats(terms: Map[String, (Long, Long, Long)], nDocs: Long)

  val empty: Stats = Stats(Map.empty, 0L)

  private val Clip = graft.queries.ConcentrationOps.BurstClip

  /** Fold one micro-batch into `st` (unmodified; a new Stats returns). */
  def observeBatch(mb: Dataset[Arrival], st: Stats): Stats = {
    val sp = mb.sparkSession
    import sp.implicits._
    val n = mb.count()
    val delta = mb.toDF()
      .select(col("doc_id"),
        explode(graft.functions.Sketches.words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(least(count(lit(1)), lit(Clip)).as("c"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("tot"),
        sum(col("c") * col("c")).as("ssq"))
      .as[(String, Long, Long, Long)].collect()
    Stats(
      delta.foldLeft(st.terms) { case (acc, (w, df, tot, ssq)) =>
        val (d0, t0, s0) = acc.getOrElse(w, (0L, 0L, 0L))
        acc + (w -> (d0 + df, t0 + tot, s0 + ssq))
      },
      st.nDocs + n)
  }

  /** The q201 VMR ladder over the held statistics — Q10 dispersion for
    * any term (absent terms read None; df below the batch operator's
    * floor is the CALLER's report policy, the readout is exact for
    * every held term).
    */
  def vmr(st: Stats, term: String): Option[Long] =
    st.terms.get(term).map { case (_, tot, ssq) =>
      val t1 =
        if (tot < graft.queries.ConcentrationOps.BurstExactMax)
          ssq * 1024L / tot
        else ssq / math.max(tot / 1024L, 1L)
      t1 - tot * 1024L / st.nDocs
    }
}
