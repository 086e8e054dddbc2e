package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming bottom-k quantiles (L59 streaming form): the accumulated
  * per-source sample must equal a one-shot build under any chunking or
  * arrival order (bottom-k-by-hash merge is associative, commutative,
  * and for the sample half replay-idempotent), and the readout must
  * reproduce the oracle-gated q124 rows exactly.
  */
class StreamingQuantilesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def arrivals(): Array[StreamingQuantiles.Arrival] =
    graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, sf)
        .select(col("doc_id"), col("source"),
          graft.functions.TextFunctions.tokenCountBpeIsh(col("text"))
            .cast("long").as("tok"))
        .as[StreamingQuantiles.Arrival].collect()
    }

  test("chunking invariance + stream == batch q124 readout") {
    implicit val sqlCtx = spark.sqlContext
    val rows = arrivals()
    assert(rows.length === 500)

    val oneShot = StreamingQuantiles.observeBatch(
      spark.createDataset(rows.toSeq), StreamingQuantiles.empty)

    // micro-batched, newest-first uneven chunks
    val chunks = {
      val (a, rest) = rows.reverse.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 4)
      Seq(a.toSeq, b.toSeq, c.toSeq)
    }
    var st = StreamingQuantiles.empty
    val stream = MemoryStream[StreamingQuantiles.Arrival]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingQuantiles.Arrival],
            _: Long) =>
          st = StreamingQuantiles.observeBatch(mb, st)
          ()
      }
      .start()
    chunks.foreach { ch => stream.addData(ch); q.processAllAvailable() }
    q.stop()

    assert(st === oneShot, "accumulated sample must equal one-shot build")

    // replay NON-idempotence is pinned, not assumed: the sample is a
    // multiset of row draws, so re-observing the corpus doubles the
    // copies of duplicated values — an under-full group's sample
    // visibly grows (this fixture's sources hold 25 rows < k = 64).
    // Exactly-once sinks own replay protection.
    val replayed = StreamingQuantiles.observeBatch(
      spark.createDataset(rows.toSeq), st)
    assert(replayed.view.mapValues(_._1).toMap ===
      st.view.mapValues(_._1 * 2).toMap, "counts double on replay")
    assert(replayed.view.mapValues(_._2.length).toMap ===
      st.view.mapValues(v =>
        math.min(v._2.length * 2, StreamingQuantiles.K)).toMap,
      "every copy of every draw re-enters the buffer")

    // the readout reproduces the oracle-gated batch operator
    val batchRows = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q124_sketched_quantiles")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    }
    assert(StreamingQuantiles.report(st) === batchRows)
  }

  test("stream and batch share one persisted state format (ledger interop)") {
    val rows = arrivals()
    val (head, tail) = rows.splitAt(rows.length / 2)

    // stream the first half, persist the state as the LEDGER artifact
    val st1 = StreamingQuantiles.observeBatch(
      spark.createDataset(head.toSeq), StreamingQuantiles.empty)
    val out = java.nio.file.Files
      .createTempDirectory("sq_ledger").toString
    graft.sinks.SketchLedger.write(
      StreamingQuantiles.toLedger(spark, st1), out)

    // continuation A: RESTART THE STREAM from the stored artifact
    val restored = StreamingQuantiles.fromLedger(
      graft.sinks.SketchLedger.read(spark, out))
    assert(restored === st1, "state round-trips through the artifact")
    val streamed = StreamingQuantiles.observeBatch(
      spark.createDataset(tail.toSeq), restored)

    // continuation B: a BATCH roll-forward against the same stored file
    val batchRolled = StreamingQuantiles.fromLedger(
      graft.sinks.SketchLedger.rollForward(spark, out,
        spark.createDataset(tail.toSeq).toDF()
          .select(col("source"), col("tok").as("key")),
        "source", "key", StreamingQuantiles.K, StreamingQuantiles.Salt))

    // both continuations equal the one-shot build over everything —
    // one persisted format, two execution modes, one merge law
    val oneShot = StreamingQuantiles.observeBatch(
      spark.createDataset(rows.toSeq), StreamingQuantiles.empty)
    assert(streamed === oneShot, "stream continuation == one-shot")
    assert(batchRolled === oneShot, "batch continuation == one-shot")
    assert(StreamingQuantiles.report(batchRolled) ===
      StreamingQuantiles.report(oneShot))
  }

  test("streaming stage cuts equal the batch q224 cuts under any chunking") {
    implicit val sqlCtx = spark.sqlContext
    // the REGISTERED staging frame (quality + token ladders), collected
    // once for both the stream and the plain-Scala batch replay
    val base = graft.core.CacheScope.scoped {
      graft.queries.CurriculumOps.stageBase(spark, sf)
        .select(col("doc_id"), col("q_u"))
        .as[StreamingQuantiles.StageArrival].collect()
    }
    assert(base.length === 500)

    val chunks = {
      val (a, rest) = base.reverse.splitAt(base.length / 4)
      val (b, c) = rest.splitAt(rest.length / 3)
      Seq(a.toSeq, b.toSeq, c.toSeq)
    }
    var st = StreamingQuantiles.emptyStage
    val stream = MemoryStream[StreamingQuantiles.StageArrival]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingQuantiles.StageArrival],
            _: Long) =>
          st = StreamingQuantiles.observeStageBatch(mb, st)
          ()
      }
      .start()
    chunks.foreach { ch => stream.addData(ch); q.processAllAvailable() }
    q.stop()

    // plain-Scala replay of the batch q224 cut arithmetic
    val keys = base.map(a =>
      a.q_u * graft.queries.SketchSwapOps.IdDomain + a.doc_id)
    val n = keys.length.toLong
    val sample = keys
      .sortBy(v => (graft.plans.BottomKSketchAgg.hash("q224", v), v))
      .take(StreamingQuantiles.StageK).sorted
    val sn = sample.length.toLong
    val expectCuts = (1L until 4L).map { t =>
      val cum = t * (n / 4) + math.min(t, n % 4)
      sample(math.max(1L, cum * sn / n).toInt - 1)
    }
    assert(st._1 === n, "all rows observed")
    val cuts = StreamingQuantiles.stageCuts(st)
    assert(cuts === expectCuts, "accumulated cuts == batch q224 cuts")

    // the live dial assigns the SAME stage populations the registered
    // q224 table gates: stage = 1 + #{t : key > cut_t}
    val liveStages = keys.groupBy(k => 1L + cuts.count(k > _))
      .view.mapValues(_.length.toLong).toMap
    val gated = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q224_curriculum_stages_sketched")(spark, sf)
        .select(col("stage"), col("n_docs"))
        .as[(Long, Long)].collect().toMap
    }
    assert(liveStages === gated, "live dial reproduces the gated stage table")
  }
}
