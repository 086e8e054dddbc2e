package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (builder brief: "salting for skew, AQE for runtime
  * re-plan"): deterministic salting utilities for hot keys.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting is
  * the plan-level tool for skewed AGGREGATIONS and for broadcast-averse
  * joins. The salt here derives from a hash of a high-cardinality column
  * (never `rand()` — retries and speculative tasks must agree on the
  * salt).
  */
object Skew {

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt) —
    * spreading a hot key over `salts` reducers — then final aggregate on
    * the key. Exact same result as a direct groupBy-count/sum.
    */
  def saltedCounts(df: DataFrame, key: Column, saltSource: Column,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_n")).as("n"))

  /** Salted equi-join: the (possibly skewed) LEFT side gets a derived
    * salt; the small RIGHT side is replicated once per salt value, so the
    * hot key's rows spread over `salts` tasks. Exact same rows as the
    * direct join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltSource: Column, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated,
        saltedBig(bigKey) === replicated(smallKey) &&
          saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Hot-bucket guard for LSH candidate generation (the one quadratic
    * term in the dedup/ANN path): a bucket with n members yields n²/2
    * candidate pairs, so one boilerplate mega-cluster (a shared header,
    * an empty-document band hash) can dominate the whole pair join at
    * corpus scale. Production MinHash pipelines drop buckets past a cap —
    * members of a mega-cluster are near-identical to each other anyway,
    * and exact/canonical dedup (L1/L2) catches them far cheaper upstream.
    *
    * Scale shape: one map-side-combined count per key, the (tiny) list of
    * oversized keys broadcast into a LEFT ANTI join — the big frame never
    * reshuffles on anything except the aggregate's own exchange, and the
    * pair join that follows is bounded by cap·n instead of n².
    *
    * `observeAs` attaches a `CollectMetrics` observation (`observe`) to
    * the hot-key frame: each action reports `dropped_buckets` /
    * `dropped_rows` through `queryExecution.observedMetrics` — which
    * MUST be read at execution-completion time (a
    * `QueryExecutionListener.onSuccess`, as Verify does, or an
    * `Observation`): Spark resets the CollectMetrics accumulators after
    * the completion event, so a post-hoc read returns zeros
    * (ScaleStormSpec pins the listener-time protocol on a
    * cap-crossing storm). The guarded
    * queries gate against UNCAPPED oracles (the cap is proven
    * non-binding at fixture SFs by the hashes) — if a gated SF ever
    * crosses the cap, this metric is the signal that points at the
    * guard instead of a bare hash mismatch. Verify prints every
    * observed metric per query for exactly that diagnosis. Metric names
    * must be unique per query plan; identical guarded subtrees (the
    * pair join's self-join reuses one frame) are fine — Spark admits
    * same-name observations over equal sub-plans and exchange reuse
    * executes the hot side once. When the cap does NOT bind, the hot
    * side is an empty relation and AQE's empty-relation propagation may
    * eliminate the guard join (and its CollectMetrics child) wholesale:
    * an ABSENT metric reads as zero drops.
    */
  def dropHotBuckets(df: DataFrame, keyCols: Seq[String], cap: Long,
      observeAs: Option[String] = None): DataFrame = {
    // null-SAFE key equality: the degenerate mega-cluster is often exactly
    // the NULL key (empty/unparseable documents hashing to nothing), and a
    // plain equi-anti-join would count it hot yet never drop it
    val hotAgg = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > cap)
    val hotObserved = observeAs.fold(hotAgg)(name => hotAgg.observe(name,
      count(lit(1)).as("dropped_buckets"),
      coalesce(sum(col("__bucket_n")), lit(0L)).as("dropped_rows")))
    val hot = hotObserved.select(keyCols.map(k => col(k).as(s"__hot_$k")): _*)
    df.join(broadcast(hot),
        keyCols.map(k => col(k) <=> col(s"__hot_$k")).reduce(_ && _),
        "left_anti")
  }
}
