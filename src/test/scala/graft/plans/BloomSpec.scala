package graft.plans

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bloom membership sketch (L64): bitmap semantics equal the distinct-
  * position-set model the DuckDB oracle computes, builds are merge-tree
  * independent, the no-false-negative contract holds unconditionally, the
  * width dial trades FPR monotonically, and the aggregate runs as a
  * map-side-combined ObjectHashAggregate (the broadcastable-build shape).
  */
class BloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** JVM-side twin of `TextFunctions.md5Fingerprint` (60-bit md5 prefix). */
  private def fpOf(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString
      .take(15), 16)
  }

  private def fps(n: Int): Seq[Long] = (0 until n).map(i => fpOf(s"doc-$i"))

  test("bitmap probe verdicts equal the distinct-position-set model") {
    val corpus = fps(200)
    val probes = fps(500) // first 200 are members
    val bitsLog2 = 10
    val k = 2
    val m = 1 << bitsLog2
    val buf = new Array[Byte](m / 8)
    corpus.foreach(BloomFilterAgg.add(buf, _, k))
    val positions = corpus.flatMap(h =>
      (0 until k).map(BloomFilterAgg.position(_, h, m))).toSet
    probes.foreach { h =>
      val want = (0 until k).forall(i =>
        positions.contains(BloomFilterAgg.position(i, h, m)))
      assert(BloomFilterAgg.probe(buf, h, k) === want,
        s"bitmap/position-set divergence for $h")
    }
  }

  test("no false negatives at any width") {
    for (bitsLog2 <- Seq(6, 10, 14); k <- Seq(1, 2, 4)) {
      val buf = new Array[Byte]((1 << bitsLog2) / 8)
      val corpus = fps(300)
      corpus.foreach(BloomFilterAgg.add(buf, _, k))
      corpus.foreach(h => assert(BloomFilterAgg.probe(buf, h, k),
        s"false negative at bits=$bitsLog2 k=$k"))
    }
  }

  test("width dial: FPR falls monotonically, tight widths do collide") {
    val corpus = fps(300)
    val nonMembers = fps(2300).drop(300)
    val rates = Seq(8, 10, 12, 14).map { bitsLog2 =>
      val buf = new Array[Byte]((1 << bitsLog2) / 8)
      corpus.foreach(BloomFilterAgg.add(buf, _, 2))
      bitsLog2 -> nonMembers.count(BloomFilterAgg.probe(buf, _, 2))
    }
    // the saturated 256-bit filter must fire the false-positive branch;
    // widening can only shed collisions
    assert(rates.head._2 > 0, s"no false positives at 8 bits: $rates")
    rates.sliding(2).foreach { case Seq((_, hi), (_, lo)) =>
      assert(lo <= hi, s"FPR not monotone in width: $rates")
    }
  }

  test("aggregate build is merge-tree independent (1 vs 8 partitions)") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(graft.functions.TextFunctions.md5Fingerprint(col("text"))
        .as("fp"))
    def build(parts: Int): Array[Byte] = docs.repartition(parts)
      .agg(call_function("graft_bloom", col("fp"), lit(10), lit(2)))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(1), build(8)),
      "bitmap bytes differ across partitionings")
  }

  test("resolves in SQL and plans as ObjectHashAggregate") {
    graft.core.Tables.documents(spark, sf).createOrReplaceTempView("bs_docs")
    val df = spark.sql(
      """SELECT source, graft_bloom(
           CAST(CONV(SUBSTRING(MD5(text), 1, 15), 16, 10) AS BIGINT), 10, 2)
         FROM bs_docs GROUP BY source""")
    assert(df.collect().length > 1)
    val aggs = flattenExecuted(df.queryExecution.executedPlan).collect {
      case o: ObjectHashAggregateExec => o
    }
    assert(aggs.size >= 2,
      "graft_bloom must plan as partial + final ObjectHashAggregate")
  }

  test("probe expression stays codegen'd over a broadcast bitmap") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.md5Fingerprint(col("text")).as("fp"))
    val bloom = docs.filter(col("doc_id") % 2 === 0)
      .agg(call_function("graft_bloom", col("fp"), lit(12), lit(2)).as("bm"))
    val probed = docs.crossJoin(broadcast(bloom))
      .select(call_function("graft_bloom_probe", col("bm"), col("fp"),
        lit(2)).as("hit"))
    // every even doc is a member: no false negatives end-to-end
    val evenMisses = docs.filter(col("doc_id") % 2 === 0)
      .crossJoin(broadcast(bloom))
      .filter(!call_function("graft_bloom_probe", col("bm"), col("fp"), lit(2)))
      .count()
    assert(evenMisses === 0L)
    probed.collect()
    val inCodegen = flattenExecuted(probed.queryExecution.executedPlan)
      .exists {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
          w.toString.contains("graft_bloom_probe")
        case _ => false
      }
    assert(inCodegen, "probe fell out of codegen:\n" +
      probed.queryExecution.executedPlan)
  }

  test("negative fingerprints floor-mod safely (no negative bit index)") {
    // registered queries only feed non-negative md5 fingerprints, but a
    // user pushing e.g. FNV output through the sketch must not crash an
    // executor on a negative array index — and the one-sided contract
    // must survive the fold
    val buf = new Array[Byte](128)
    val hs = Seq(Long.MinValue, -1L, -987654321L, 0L, Long.MaxValue)
    hs.foreach(BloomFilterAgg.add(buf, _, 4))
    hs.foreach(h => assert(BloomFilterAgg.probe(buf, h, 4),
      s"false negative for fingerprint $h"))
  }

  test("bloomBitsFor: floor, minimality, cap") {
    import graft.queries.CorpusOps.bloomBitsFor
    assert(bloomBitsFor(0) === 14)
    assert(bloomBitsFor(4096) === 14) // 4 bits/key inside the floor
    assert(bloomBitsFor(5000) === 15) // first width past the floor
    assert(bloomBitsFor(1L << 40) === 31) // capped at the mod-P31 address ceiling
    assert(bloomBitsFor(1L << 29) === 31) // 2^29 keys x 4 b/k = exactly 2^31
    // minimality: m/2 < BitsPerKey·n ≤ m above the floor
    for (n <- Seq(5000L, 100000L, 12345678L)) {
      val bits = bloomBitsFor(n)
      assert((1L << bits) >= 4 * n && (1L << (bits - 1)) < 4 * n,
        s"width not minimal for n=$n: $bits")
    }
  }
}
