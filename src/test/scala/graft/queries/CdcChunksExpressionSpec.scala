package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Sketches

/** r19 optimization: the native `graft_cdc_chunks` loop replaces the
  * posexplode + three-window + aggregate CDC chunk construction in
  * q118/q133. Chunk ids, fingerprints, word counts AND the rebuild
  * string must match the legacy relational form exactly.
  */
class CdcChunksExpressionSpec extends SparkSpec {

  private val Mod = 16L

  /** The pre-r19 construction, verbatim (q118/q133's shared shape),
    * extended with the per-chunk word-join so the chunk_text contract
    * is pinned too.
    */
  private def legacyChunks(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val base = docs
      .select(col("doc_id"),
        posexplode(Sketches.words(col("text"))).as(Seq("pos", "w0")))
      .withColumn("w1", lead(col("w0"), 1).over(w))
      .withColumn("w2", lead(col("w0"), 2).over(w))
      .withColumn("boundary",
        col("w2").isNotNull &&
          Sketches.h64(concat_ws(" ", col("w0"), col("w1"), col("w2")))
            % Mod === 0)
      .withColumn("chunk_id", coalesce(
        sum(when(col("boundary"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("start", coalesce(
        max(when(col("boundary"), col("pos")))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)) + 1L,
        lit(0L)))
    base
      .withColumn("term",
        (Sketches.h64(col("w0")) % lit(4294967296L)) *
          (col("pos") - col("start") + 1L))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(sum(col("term")).as("cfp"), count(lit(1)).as("n_w"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("w0")))),
          x => x.getField("w0")), " ").as("chunk_text"))
  }

  private def assertAgree(docs: DataFrame): Unit = {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getString(4))
    val legacy = legacyChunks(docs)
      .select(col("doc_id"), col("chunk_id"), col("cfp"), col("n_w"),
        col("chunk_text"))
      .collect().map(key).toMap
    val native = TextCorpusOps.cdcChunkRows(docs)
      .collect().map(key).toMap
    assert(native == legacy)
  }

  test("native cdc chunks == legacy windowed construction (synthetic)") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 200).map(i => s"w${i % 37}").mkString(" ")),
      (2L, "short doc"),
      (3L, ""),
      (4L, "one"),
      (5L, (1 to 64).map(i => s"t$i").mkString(" ")),
      (6L, "rep rep rep rep rep rep rep rep rep rep rep rep"))
      .toDF("doc_id", "text")
    assertAgree(docs)
  }

  test("native cdc chunks == legacy on the fixture corpus (with replays)") {
    val docs = LlmCuration.withReplays(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("doc_id"), col("text")))
    assertAgree(docs)
  }

  test("chunk frame plans with zero exchanges/windows") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val phys = TextCorpusOps.cdcChunkRows(docs)
      .queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), phys)
    assert(!phys.contains("Window"), phys)
  }
}
