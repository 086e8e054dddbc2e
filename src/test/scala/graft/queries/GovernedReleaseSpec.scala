package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Sketches

/** End-to-end contracts of the governed-release composition on the real
  * sf0.001 fixture: the released corpus must carry ZERO split leakage,
  * ZERO over-cap domains, a flattened length profile, and be
  * deterministic — each property checked against the release's own
  * inputs, not against constants.
  */
class GovernedReleaseSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private lazy val released =
    GovernedRelease.releaseTrainCorpus(spark, sf)
      .select("doc_id", "source", "lang", "n_chars", "dom", "bkt")
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq

  test("release is non-trivial and deterministic") {
    assert(released.nonEmpty)
    val again = GovernedRelease.releaseTrainCorpus(spark, sf)
      .select("doc_id", "source", "lang", "n_chars", "dom", "bkt")
      .as[(Long, String, String, Long, Long, Long)].collect().toSeq
    assert(released.sortBy(_._1) === again.sortBy(_._1))
    // every released doc really is a funnel survivor in the train split
    // of the REPAIRED assignment
    assert(released.map(_._1).distinct.size === released.size)
  }

  test("zero split leakage: no released doc's bow cluster has a member outside train") {
    // recompute cluster keys over the funnel survivors and assert every
    // cluster containing a released doc lies ENTIRELY in the repaired
    // train split (the repair moved clusters whole)
    val flags = LlmPipeline.funnelFlags(spark, sf)
      .filter(col("canon") && col("keep") && !col("dirty"))
      .select(col("doc_id"), col("split"),
        Sketches.h64(array_join(sort_array(array_distinct(
          Sketches.words(col("text")))), " ")).as("ck"))
    val repaired = TrainedFilterOps.repairSplits(flags)
      .select("doc_id", "ck", "new_split")
      .as[(Long, Long, String)].collect().toSeq
    val relIds = released.map(_._1).toSet
    val clustersOfReleased = repaired.filter(r => relIds(r._1)).map(_._2).toSet
    val offenders = repaired.filter(r =>
      clustersOfReleased(r._2) && r._3 != "train")
    assert(offenders.isEmpty,
      s"released clusters must lie entirely in train: $offenders")
  }

  test("no domain exceeds the cap; the megasite demanded more than it") {
    val byDom = released.groupBy(_._5).view.mapValues(_.size)
    byDom.foreach { case (dom, n) =>
      assert(n <= CorpusShapingOps.DomCap, s"domain $dom over cap: $n") }
    // the cap stage must have actually FIRED: recompute the repaired
    // train split's megasite population (pre-cap) and check it exceeds
    // the quota (the release's megasite rows are a strict subset)
    val flags = LlmPipeline.funnelFlags(spark, sf)
      .filter(col("canon") && col("keep") && !col("dirty"))
      .select(col("doc_id"), col("split"),
        Sketches.h64(array_join(sort_array(array_distinct(
          Sketches.words(col("text")))), " ")).as("ck"))
    val trainIds = TrainedFilterOps.repairSplits(flags)
      .filter(col("new_split") === "train")
      .select("doc_id").as[Long].collect()
    val megasite = trainIds.count(id =>
      Sketches.h64Scala(s"dom:$id") % 4 == 0)
    assert(megasite > CorpusShapingOps.DomCap,
      s"fixture must overfill the megasite (got $megasite)")
    assert(byDom.getOrElse(0L, 0) <= CorpusShapingOps.DomCap)
  }

  test("length profile flattened to the train split's own bucket minimum") {
    val byBkt = released.groupBy(_._6).view.mapValues(_.size).toMap
    // flattening can't be exact (binomial draws), but no bucket may
    // exceed ~2x the smallest populated bucket on this fixture
    val mn = byBkt.values.min
    assert(byBkt.values.max <= mn * 2 + 8,
      s"profile not flattened: $byBkt")
  }
}
