package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted sketch ledger (VERDICT r17 #4): stored-ledger
  * roll-forward must equal a full-corpus rebuild byte for byte (the
  * bottom-k merge law over a REAL parquet artifact, not an in-query
  * union), the roll must be idempotent (a pure function of stored
  * state + batch), and counts must carry.
  */
class SketchLedgerSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val K = 16
  private val Salt = "ledger-spec"

  import org.apache.spark.sql.DataFrame

  private def keys(day: Option[Int]): DataFrame = {
    val base = graft.core.Tables.documents(spark, dir)
      .select(col("source"),
        (col("doc_id") % 2).as("day"),
        (col("n_chars") * lit(graft.queries.SketchSwapOps.IdDomain) +
          col("doc_id")).as("key"))
    day.fold(base)(d => base.filter(col("day") === d))
      .select(col("source"), col("key"))
  }

  private def collectLedger(df: DataFrame): Map[String, (Long, Seq[Long])] =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getSeq[Long](2).toList: Seq[Long])).toMap

  test("stored roll-forward == full rebuild, byte-equal samples, counts carry") {
    graft.core.CacheScope.scoped {
      val out = java.nio.file.Files
        .createTempDirectory("sketch_ledger").toString
      val day0 = SketchLedger.build(keys(Some(0)), "source", "key", K, Salt)
      SketchLedger.write(day0, out)
      // the artifact is ONE parquet file of kilobyte rows
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, "ledger is a single file")
      val rolled = collectLedger(SketchLedger.rollForward(
        spark, out, keys(Some(1)), "source", "key", K, Salt))
      val full = collectLedger(SketchLedger.build(
        keys(None), "source", "key", K, Salt))
      assert(rolled === full, "merge law over the stored artifact")
      // not vacuous: every source truncates at k = 16
      assert(full.values.forall(_._1 > K), "fixture exceeds k everywhere")
      assert(full.values.forall(_._2.size === K))
      // idempotent: re-running the same roll reproduces the same ledger
      val again = collectLedger(SketchLedger.rollForward(
        spark, out, keys(Some(1)), "source", "key", K, Salt))
      assert(again === rolled, "re-run is idempotent")
    }
  }

  test("a multi-night chain of stored rolls equals the one-shot full build") {
    // the production shape is not one roll but a CHAIN: every night
    // reads yesterday's artifact, rolls the day in, and WRITES a new
    // artifact the next night reads. Associativity of the bottom-k
    // merge makes the chain equal the one-shot build — prove it over
    // three real store/read cycles, not in-memory unions.
    graft.core.CacheScope.scoped {
      import org.apache.spark.sql.functions._
      val base = graft.core.Tables.documents(spark, dir)
        .select(col("source"),
          (col("doc_id") % 3).as("day"),
          (col("n_chars") * lit(graft.queries.SketchSwapOps.IdDomain) +
            col("doc_id")).as("key"))
      def day(i: Int) = base.filter(col("day") === i)
        .select(col("source"), col("key"))
      val dirs = (0 to 2).map(i => java.nio.file.Files
        .createTempDirectory(s"ledger_night$i").toString)
      SketchLedger.write(
        SketchLedger.build(day(0), "source", "key", K, Salt), dirs(0))
      SketchLedger.write(SketchLedger.rollForward(
        spark, dirs(0), day(1), "source", "key", K, Salt), dirs(1))
      SketchLedger.write(SketchLedger.rollForward(
        spark, dirs(1), day(2), "source", "key", K, Salt), dirs(2))
      val chained = collectLedger(SketchLedger.read(spark, dirs(2)))
      val full = collectLedger(SketchLedger.build(
        base.select(col("source"), col("key")), "source", "key", K, Salt))
      assert(chained === full,
        "three stored nights == one-shot full build, byte for byte")
    }
  }

  test("a group whose keys are all null keeps its running count across rolls") {
    // code-review r18: build() counts every row but graft_bottomk skips
    // null keys, so an all-null group persists as (grp, n>0, sample=[])
    // — its exploded sample is zero rows, and an inner join on the
    // merged side would silently drop the count carry forever
    graft.core.CacheScope.scoped {
      import spark.implicits._
      val out = java.nio.file.Files
        .createTempDirectory("sketch_ledger_null").toString
      val day0 = Seq(("a", Some(1L)), ("nul", None), ("nul", None))
        .toDF("source", "key")
      SketchLedger.write(
        SketchLedger.build(day0, "source", "key", K, Salt), out)
      val stored = collectLedger(SketchLedger.read(spark, out))
      assert(stored("nul") === ((2L, Seq.empty[Long])),
        "all-null group persists with its count and an empty sample")
      // roll a batch that is silent for "nul": the count must survive
      val day1 = Seq(("a", Some(2L))).toDF("source", "key")
      val rolled = collectLedger(SketchLedger.rollForward(
        spark, out, day1, "source", "key", K, Salt))
      assert(rolled("nul") === ((2L, Seq.empty[Long])),
        "silent all-null group survives the roll with its count")
      assert(rolled("a") === ((2L, Seq(1L, 2L))))
      // ...and a later non-null arrival for it starts sampling normally
      val day2 = Seq(("nul", Some(7L))).toDF("source", "key")
      val out2 = java.nio.file.Files
        .createTempDirectory("sketch_ledger_null2").toString
      SketchLedger.write(SketchLedger.rollForward(
        spark, out, day1, "source", "key", K, Salt), out2)
      val rolled2 = collectLedger(SketchLedger.rollForward(
        spark, out2, day2, "source", "key", K, Salt))
      assert(rolled2("nul") === ((3L, Seq(7L))))
    }
  }

  test("groups new in the batch and groups silent today both survive the roll") {
    graft.core.CacheScope.scoped {
      import spark.implicits._
      val out = java.nio.file.Files
        .createTempDirectory("sketch_ledger2").toString
      val day0 = Seq(("a", 1L), ("a", 2L), ("b", 10L))
        .toDF("source", "key")
      SketchLedger.write(
        SketchLedger.build(day0, "source", "key", K, Salt), out)
      // batch: "a" silent, "b" grows, "c" brand new
      val day1 = Seq(("b", 11L), ("c", 100L)).toDF("source", "key")
      val rolled = collectLedger(SketchLedger.rollForward(
        spark, out, day1, "source", "key", K, Salt))
      assert(rolled.keySet === Set("a", "b", "c"))
      assert(rolled("a") === ((2L, Seq(1L, 2L))))
      assert(rolled("b") === ((2L, Seq(10L, 11L))))
      assert(rolled("c") === ((1L, Seq(100L))))
    }
  }
}
