package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Scale techniques: salted aggregation/join correctness and spread, and
  * bucketed co-located joins eliminating the shuffle.
  */
class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one key — the classic hot-key shape
  private lazy val skewed = spark.range(10000)
    .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("key"),
      col("id").as("payload"))

  test("salted two-phase aggregation equals the direct groupBy") {
    val direct = skewed.groupBy(col("key")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedCounts(skewed, col("key"), col("payload"), 16)
      .as[(Long, Long)].collect().toMap
    assert(salted === direct)
    // the hot key really spreads: its partial aggregation uses >1 salt
    val spread = skewed.filter(col("key") === 7)
      .select(pmod(hash(col("payload")), lit(16)).as("s"))
      .distinct().count()
    assert(spread > 8, s"hot key only spread over $spread salts")
  }

  test("dropHotBuckets bounds the LSH pair join: mega-cluster gone, real pair kept") {
    // 60 boilerplate docs share one band hash (the mega-cluster), two
    // genuine near-dups share another — the shape that turns an LSH pair
    // join quadratic at corpus scale
    val bands = spark.range(60)
      .select(col("id").as("doc_id"), lit(0).as("band"), lit(111L).as("bh"))
      .union(Seq((1000L, 0, 222L), (1001L, 0, 222L)).toDF("doc_id", "band", "bh"))
    def pairs(b: org.apache.spark.sql.DataFrame) = b.as("x")
      .join(b.as("y"), col("x.band") === col("y.band") &&
        col("x.bh") === col("y.bh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    assert(pairs(bands).count() === 60L * 59 / 2 + 1, "uncapped join is quadratic")
    val capped = Skew.dropHotBuckets(bands, Seq("band", "bh"), cap = 10)
    val got = pairs(capped).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1000L, 1001L)),
      "cap must drop only the mega-cluster's pairs, never a normal bucket's")
    // the degenerate NULL-key cluster (empty docs hashing to nothing) must
    // also be droppable — requires null-safe key equality in the anti-join
    val withNullKey = bands.union(
      spark.range(40).select(col("id") + 2000, lit(0), lit(null).cast("long"))
        .toDF("doc_id", "band", "bh"))
    val cappedNull = Skew.dropHotBuckets(withNullKey, Seq("band", "bh"), cap = 10)
    assert(cappedNull.filter(col("bh").isNull).count() === 0L,
      "the NULL-key mega-cluster must be dropped, not skipped by null equality")
    assert(pairs(cappedNull).as[(Long, Long)].collect().toSeq === Seq((1000L, 1001L)))
    // the guard itself broadcasts the (tiny) hot-key list — no shuffle of
    // the big side beyond the count's own exchange
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"hot-key anti-join should broadcast:\n$plan")
  }

  test("dropHotBuckets == the direct keep-filter on random skewed data") {
    // deterministic skewed keys incl. a NULL group
    val df = spark.range(2000)
      .select(when(pmod(hash(col("id")), lit(20)) === 0, lit(null).cast("int"))
          .otherwise(pmod(hash(col("id")), lit(20)).cast("int")).as("key"),
        col("id").as("payload"))
    val cap = 90L
    val got = Skew.dropHotBuckets(df, Seq("key"), cap)
    val keep = df.groupBy(col("key")).agg(count(lit(1)).as("n"))
      .filter(col("n") <= cap).select(col("key").as("kk"))
    val want = df.join(keep, col("key") <=> col("kk"), "left_semi")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "guard must equal the direct per-key size filter, null keys included")
  }

  test("salted join equals the direct join") {
    val dim = Seq((7L, "hot"), (0L, "zero"), (20L, "cold")).toDF("k", "label")
    val direct = skewed.join(dim, skewed("key") === dim("k"))
      .select(col("payload"), col("label")).as[(Long, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(skewed, dim, "key", "k", col("payload"), 8)
      .select(col("payload"), col("label")).as[(Long, String)].collect().sorted.toSeq
    assert(salted === direct)
    assert(direct.size === 9000 + 100 + 100 /* hot key 7, keys 0 and 20 */)
  }

  test("approx_count_distinct lands within its rsd of the exact count (the 100 TB cardinality tool)") {
    val e = graft.core.Tables.events(spark, "/root/testdata/sf0.01")
    val row = e.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.05).as("approx")).head()
    val exact = row.getLong(0)
    val approx = row.getLong(1)
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rmrf)
      p.delete()
    }
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    // a killed previous run can leave the managed location behind
    Seq("graft_bucket_a", "graft_bucket_b").foreach { t =>
      rmrf(new java.io.File(s"spark-warehouse/$t"))
    }
    spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("va"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_a")
    spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("vb"))
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_b")
    // small test tables would auto-broadcast, which sidesteps bucketing;
    // disable it so the plan shows the bucketed co-located join itself
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
        .filter(col("va") < 100)
      // both sides bucketed on the join key with equal bucket counts →
      // SortMergeJoin with NO Exchange (the co-located join the reference's
      // scale story needs)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(joined.count() === 50)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("bandBitsFor holds near-dup band occupancy constant as n grows") {
    import graft.queries.LlmPipeline.{bandBitsFor, BandOccupancyTarget}
    // gated SFs stay at the historical 8 bits (oracle 16-bit signatures
    // unchanged); the 10x rehearsal corpus gets 11; growth is log2(n)
    assert(bandBitsFor(500L) === 8)
    assert(bandBitsFor(2000L) === 8)
    assert(bandBitsFor(20000L) === 11)
    assert(bandBitsFor(1L) === 8)
    // occupancy bound holds at every size above the floor's reach, and
    // bits-1 would violate it (narrowest sufficient width)
    Seq(10000L, 100000L, 1000000L, 1000000000L).foreach { n =>
      val b = bandBitsFor(n)
      assert(n.toDouble / (1L << b) <= BandOccupancyTarget,
        s"occupancy target broken at n=$n bits=$b")
      assert(n.toDouble / (1L << (b - 1)) > BandOccupancyTarget,
        s"bits not minimal at n=$n bits=$b")
    }
    // cap: signatures must fit the LONG sig column (2 bands x 31 bits)
    assert(bandBitsFor(Long.MaxValue) === 31)
  }
}
