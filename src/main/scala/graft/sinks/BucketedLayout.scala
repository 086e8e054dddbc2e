package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed corpus layout: persist a table hash-bucketed (and
  * bucket-sorted) by its join key so that every LATER join or aggregation
  * on that key runs without shuffling the stored side at all.
  *
  * This is the complement of the two join strategies the engine already
  * leans on, and it is the one that matters most at 100 TB:
  *
  *  - `broadcast()` — right when one side is small (dimension tables, a
  *    nightly batch probing a corpus store: q96 broadcasts the BATCH).
  *  - AQE skew handling / salting — right when a shuffle is unavoidable
  *    but the keys are skewed.
  *  - **bucketing (this)** — right when BOTH sides are large and the same
  *    key is joined repeatedly across runs: pay the partitioning exchange
  *    ONCE at write time, then every nightly probe, cluster re-join, or
  *    fingerprint lookup reads the store already distributed (and sorted)
  *    on the key. A 100 TB fingerprint store joined every night must not
  *    be re-shuffled every night.
  *
  * Spark-first mechanics (no custom anything): `DataFrameWriter.bucketBy +
  * sortBy + saveAsTable` writes Murmur3-hash buckets; `FileSourceScanExec`
  * exposes `HashPartitioning(key, n)` as the scan's outputPartitioning, so
  * `EnsureRequirements` inserts NO Exchange for joins/aggregations keyed on
  * the bucket key when bucket counts line up. The writer repartitions by
  * the same hash first so each bucket is exactly ONE file — that is the
  * precondition for the scan to also expose `outputOrdering` on the key
  * (behind `spark.sql.legacy.bucketedTableScan.outputOrdering` — off by
  * default upstream because proving the one-file precondition costs a
  * planning-time listing), which lets a sort-merge join skip its SortExec
  * on the bucketed side(s).
  *
  * BucketedLayoutSpec proves the contract on the executed plans: the
  * bucketed-bucketed join and the groupBy carry ZERO shuffle exchanges
  * under default config (plus zero sorts with the sorted-scan dial on),
  * the identical unbucketed plans pay the exchange, and results are
  * row-identical to the unbucketed join.
  *
  * Reference tie-in: the reference's stores re-read their persisted state
  * on every run (e.g. the MBTiles resume set, `create_nationalmap_mbtiles
  * .py:96-106`); at corpus scale the analogous persisted stores (exact/
  * canonical fingerprints L1/L2, chunk fingerprints L33, shard key
  * inventory K7) are the natural bucketed tables.
  */
object BucketedLayout {

  /** Persist `df` as parquet table `name` at `path`, hash-bucketed and
    * sorted by `key` into `nBuckets` buckets, one file per bucket.
    *
    * The pre-write `repartition(nBuckets, key)` uses the same Murmur3 hash
    * family as the bucket-id assignment, so every task holds exactly the
    * rows of its own bucket → one file per bucket, which is what lets the
    * later scan advertise per-bucket sortedness (files-per-bucket must be
    * 1 for `outputOrdering` to be safe to expose).
    */
  def write(df: DataFrame, name: String, key: String, nBuckets: Int,
      path: String): Unit =
    df.repartition(nBuckets, col(key))
      .write.format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)

  /** Read a bucketed table back WITH its layout metadata (a plain
    * `spark.read.parquet(path)` would discard the bucket spec — bucketing
    * lives in the catalog, not the files).
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
