package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contracts of the bottom-k hash-sample aggregate: merge-tree
  * determinism (the property GK/KLL-style sketches lack), exact
  * agreement with a brute-force JVM mirror of the (hash, value) order,
  * duplicate handling, and quantile accuracy on a known distribution.
  */
class BottomKSketchSpec extends SparkSpec {

  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int,
      salt: String): Seq[Long] =
    df.agg(call_function("graft_bottomk", col("v"), lit(k), lit(salt)))
      .collect()(0).getSeq[Long](0)

  test("partitioning and row order never change the sample") {
    val vals = (0L until 5000L).map(i => (i * 2654435761L) % 100000L)
    val one = sketch(vals.toDF("v").repartition(1), 64, "det")
    val eight = sketch(vals.toDF("v").repartition(8), 64, "det")
    val shuffled = sketch(
      scala.util.Random.shuffle(vals).toDF("v").repartition(8), 64, "det")
    assert(one === eight)
    assert(one === shuffled)
  }

  test("the sample is exactly the k smallest (hash, value) pairs, sorted by value") {
    val vals = (0L until 2000L).toSeq
    val got = sketch(vals.toDF("v").repartition(4), 32, "mirror")
    val expect = vals.map(v => (BottomKSketchAgg.hash("mirror", v), v))
      .sorted.take(32).map(_._2).sorted
    assert(got === expect)
  }

  test("exported buffer geometry matches the serializer's real layout") {
    // BytesPerPair/TransientPairsFactor are consumed by the q233
    // error-budget planner — they must describe the ACTUAL serialized
    // form, or the planner prices a fictional geometry (VERDICT r17 #6)
    val agg = BottomKSketchAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.LongType, nullable = false), 8, "geom")
    val buf = agg.createAggregationBuffer()
    (1L to 5L).foreach(v => buf += ((BottomKSketchAgg.hash("geom", v), v)))
    val bytes = agg.serialize(buf)
    assert(bytes.length === 5 * BottomKSketchAgg.BytesPerPair)
    val back = agg.deserialize(bytes)
    assert(back.toSeq.sorted === buf.toSeq.sorted)
    // the transient bound: k=8 compacts at TransientPairsFactor*k pairs,
    // so a buffer fed n >> k rows through update() never exceeds it
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    val big = agg.createAggregationBuffer()
    (1L to 100L).foreach { v =>
      row.update(0, v)
      agg.update(big, row)
      assert(big.length < BottomKSketchAgg.TransientPairsFactor * 8,
        "post-update buffer stays under the transient bound")
    }
  }

  test("duplicate values keep their multiplicity in the sample") {
    // 100 copies of value 7 and nothing else: a k=8 sample is 8 sevens
    val got = sketch(Seq.fill(100)(7L).toDF("v").repartition(3), 8, "dup")
    assert(got === Seq.fill(8)(7L))
    // fewer rows than k: the sample is the whole (sorted) input
    val small = sketch(Seq(5L, 3L, 9L).toDF("v"), 8, "dup")
    assert(small === Seq(3L, 5L, 9L))
  }

  test("nearest-rank quantiles off a k=256 sample land near truth on uniform data") {
    val got = sketch((0L until 10000L).toDF("v").repartition(8), 256, "q")
    val n = got.length
    assert(n === 256)
    val p50 = got((n + 1) / 2 - 1)
    val p25 = got((n + 3) / 4 - 1)
    // rank-space standard error ~ sqrt(p(1-p)/k) ≈ 3% of the range at k=256
    assert(math.abs(p50 - 5000L) < 1000, s"p50=$p50")
    assert(math.abs(p25 - 2500L) < 1000, s"p25=$p25")
  }

  test("the aggregate runs with map-side partial merge, not a full-row shuffle") {
    val df = spark.range(0, 10000).select(col("id").as("v"),
      (col("id") % 7).as("g"))
    val plan = df.groupBy(col("g"))
      .agg(call_function("graft_bottomk", col("v"), lit(16), lit("p")))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice (partial + final) around one exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2,
      s"expected partial+final ObjectHashAggregate, plan:\n$plan")
  }
}
