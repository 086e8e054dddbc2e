package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.queries.SpectralOps

/** Streaming form of L131's effective-rank monitor (q199): the
  * per-label integer Gram matrix accumulated over a stream of
  * embedding arrivals, with the participation-ratio readout available
  * after every micro-batch — the shape an embedding-space canary runs
  * in production (did tonight's ingest collapse a class onto a line?).
  *
  * State is the Gram itself — `label → (n, Dims² cell vector)` — 32 KB
  * per label regardless of stream length (the same codebook-sized-
  * state argument as the batch op's driver math). Per micro-batch the
  * batch's Gram is built RELATIONALLY with the same `graft_gram`
  * TypedImperativeAggregate the batch operator uses (map-side
  * combined; only the 4096-long buffers cross to the driver) and
  * added cell-wise into held state. Matrix addition is associative
  * and commutative, so the accumulated Gram equals a one-shot build
  * over the union of all arrivals under any chunking or arrival
  * order, and [[effectiveRankReport]] over it reproduces the
  * oracle-gated q199 rows exactly (`StreamingGramSpec` asserts both).
  * Counting state is NOT idempotent under replay — exactly-once sinks
  * own replay protection (the StreamingAuc stance).
  */
object StreamingGram {

  case class Emb(vec_id: Long, embedding: Array[Float], label: Long)

  /** label → (n_vectors, Dims² Gram cells). Vector, not Array, so
    * state equality is structural (spec-comparable).
    */
  type GramState = Map[Long, (Long, Vector[Long])]

  val empty: GramState = Map.empty

  private val Cells = SpectralOps.Dims * SpectralOps.Dims

  /** Fold one micro-batch into `st` (unmodified; a new map returns). */
  def observeBatch(mb: Dataset[Emb], st: GramState): GramState = {
    val rows = mb.toDF()
      .groupBy(col("label"))
      .agg(expr(s"graft_gram(embedding, ${SpectralOps.Dims}, " +
        s"${SpectralOps.CompQ})").as("g"),
        count(lit(1)).as("n"))
      .collect()
    rows.foldLeft(st) { (acc, r) =>
      val label = r.getLong(0)
      val g = r.getSeq[Long](1)
      val n = r.getLong(2)
      val (n0, g0) = acc.getOrElse(label, (0L, Vector.fill(Cells)(0L)))
      acc + (label -> (n0 + n, Vector.tabulate(Cells)(i => g0(i) + g(i))))
    }
  }

  /** The q199 rows — (label, n_vectors, trace_m, frob_m, pr_q10,
    * eff_rank_ppm), label-ordered — from held state. Scala Long `/`
    * truncates toward zero exactly like Spark `div` and DuckDB `//`
    * (the SpectralOps convention), so the readout is engine-exact.
    */
  def effectiveRankReport(st: GramState)
      : Seq[(Long, Long, Long, Long, Long, Long)] =
    st.toSeq.sortBy(_._1).map { case (label, (n, raw)) =>
      val dims = SpectralOps.Dims
      val m = raw.map(x => (x / (n * SpectralOps.GramDamp)) /
        SpectralOps.PrReQ)
      val trace = (0 until dims).map(i => m(i * dims + i)).sum
      val frob = m.map(x => x * x).sum
      val pr = trace * trace * SpectralOps.PrReQ / math.max(frob, 1L)
      (label, n, trace, frob, pr,
        pr * 1000000L / (dims * SpectralOps.PrReQ))
    }
}
