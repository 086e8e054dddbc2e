package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming form of L95's BM25 index statistics (q163): the df /
  * doc-length / corpus-size maintenance an incremental lexical index
  * runs as documents arrive, with the idf table readable after every
  * micro-batch.
  *
  * State is the index statistics themselves — `gram → df` plus the
  * (n_docs, total gram length) pair: |vocab|-bounded, not corpus-
  * bounded (the per-doc postings live in the index shards; the SCORER
  * only needs these statistics). Per micro-batch the batch's df deltas
  * are computed RELATIONALLY by the same native graft_grams node the
  * batch operator uses (map-side-combined distinct-gram-per-doc
  * aggregate; only the vocab-sized delta map crosses to the driver)
  * and added into held state. Count addition is associative and
  * commutative, so accumulated statistics equal a one-shot build under
  * any chunking/order, and the [[idf]] readout reproduces the q163
  * scoring ladder's idf for every gram (`StreamingPostingsSpec`
  * asserts both). Counting state is not idempotent under replay —
  * exactly-once sinks own replay protection.
  */
object StreamingPostings {

  case class Arrival(doc_id: Long, text: String)

  /** (df by gram, n_docs, total dl). */
  case class Stats(df: Map[String, Long], n: Long, sdl: Long)

  val empty: Stats = Stats(Map.empty, 0L, 0L)

  /** Fold one micro-batch into `st` (unmodified; a new Stats returns). */
  def observeBatch(mb: Dataset[Arrival], st: Stats): Stats = {
    val sp = mb.sparkSession
    import sp.implicits._
    graft.plans.GraftExtensions.register(sp)
    val g = mb.toDF().select(col("doc_id"),
      call_function("graft_grams", col("text"), lit(2)).as("g"))
    val dl = g.agg(count(lit(1)), coalesce(sum(size(col("g"))), lit(0)))
      .as[(Long, Long)].head()
    val dfDelta = g.select(col("doc_id"), explode(col("g")).as("gram"))
      .groupBy(col("gram")).agg(count_distinct(col("doc_id")).as("c"))
      .as[(String, Long)].collect()
    Stats(
      dfDelta.foldLeft(st.df) { case (acc, (gram, c)) =>
        acc + (gram -> (acc.getOrElse(gram, 0L) + c)) },
      st.n + dl._1, st.sdl + dl._2)
  }

  /** The q163 idf ladder over the held statistics:
    * ilog2(((N − df + 1) · 2^20) div (df + 1)) — for any gram (absent
    * grams score with df = 0, the unseen-term ceiling).
    */
  def idf(st: Stats, gram: String): Long = {
    val df = st.df.getOrElse(gram, 0L)
    val x = ((st.n - df + 1L) * 1048576L) / (df + 1L)
    graft.functions.Sketches.ilog2Scala(x)
  }

  /** avgdl of the held statistics (the tf-normalization input). */
  def avgdl(st: Stats): Long = if (st.n == 0) 0L else st.sdl / st.n
}
