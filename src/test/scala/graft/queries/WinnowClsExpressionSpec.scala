package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Sketches, TextFunctions}

/** r19 optimization: the native `graft_winnow_stats` (q117) and
  * `graft_cls_score` (q121) loops must reproduce the legacy relational
  * constructions exactly — winnowing's sliding-min census including the
  * no-full-window and no-trigram documents, and the classifier score's
  * lowercase/md5-weight sum including its drop-empty-docs semantics.
  */
class WinnowClsExpressionSpec extends SparkSpec {

  private val W = 4

  private def legacyWinnow(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sh = docs
      .select(col("doc_id"),
        posexplode(Sketches.words(col("text"))).as(Seq("pos", "w0")))
      .withColumn("w1", lead(col("w0"), 1).over(w))
      .withColumn("w2", lead(col("w0"), 2).over(w))
      .filter(col("w2").isNotNull)
      .withColumn("pack",
        (Sketches.h64(concat_ws(" ", col("w0"), col("w1"), col("w2")))
          % lit(1099511627776L)) * lit(1048576L) + col("pos"))
    val stats = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val wins = sh
      .withColumn("winmin", min(col("pack")).over(w.rowsBetween(0, W - 1)))
      .withColumn("full", lead(col("pack"), W - 1).over(w).isNotNull)
      .filter(col("full"))
    val sel = wins.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        countDistinct(col("winmin")).as("n_selected"))
    stats.join(sel, Seq("doc_id"), "left")
      .withColumn("n_windows", coalesce(col("n_windows"), lit(0L)))
      .withColumn("n_selected", coalesce(col("n_selected"), lit(0L)))
  }

  private def nativeWinnow(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      call_function("graft_winnow_stats", col("text"), lit(3), lit(W))
        .as("st"))
    .filter(col("st").isNotNull)
    .select(col("doc_id"), col("st.n_shingles").as("n_shingles"),
      col("st.n_windows").as("n_windows"),
      col("st.n_selected").as("n_selected"))

  private def legacyCls(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      explode(Sketches.words(lower(col("text")))).as("w"))
    .filter(length(col("w")) > 0)
    .withColumn("weight",
      (TextFunctions.md5Fingerprint(col("w")) % lit(1024L))
        * lit(2654435761L) % lit(1001L) - lit(500L))
    .groupBy(col("doc_id")).agg(sum(col("weight")).as("score"))

  private def nativeCls(docs: DataFrame): DataFrame = docs
    .filter(col("text").isNotNull)
    .select(col("doc_id"),
      call_function("graft_cls_score", col("text")).as("score"))
    .filter(col("score").isNotNull)

  private def toMap(df: DataFrame) = df.collect()
    .map(r => r.getLong(0) -> r.toSeq.tail).toMap

  private def fixture: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, (1 to 60).map(i => s"w${i % 13}").mkString(" ")),
      (2L, "only two"),                       // no trigram → absent
      (3L, "exactly three words"),            // 1 trigram, no full window
      (4L, "four words right here"),          // 2 trigrams, no full window
      (5L, "a b c d e f"),                    // exactly one full window
      (6L, ""),                               // empty → absent from both
      (7L, null.asInstanceOf[String]),        // null → absent
      (8L, "MIXED Case WORDS lower UPPER MIXED Case WORDS x y z"),
      (9L, "rep rep rep rep rep rep rep rep"))
      .toDF("doc_id", "text")
  }

  test("native winnow stats == legacy windowed construction") {
    assert(toMap(nativeWinnow(fixture)) == toMap(legacyWinnow(fixture)))
  }

  test("native winnow stats == legacy on the fixture corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    assert(toMap(nativeWinnow(docs)) == toMap(legacyWinnow(docs)))
  }

  test("native cls score == legacy explode + md5-weight aggregate") {
    assert(toMap(nativeCls(fixture)) == toMap(legacyCls(fixture)))
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    assert(toMap(nativeCls(docs)) == toMap(legacyCls(docs)))
  }

  test("q117/q121 plan with zero exchanges before their aggregates") {
    val q117 = graft.SparkEntry.queries("q117_winnowing")(
      spark, "/root/testdata/sf0.001")
    val phys = q117.queryExecution.executedPlan.toString
    assert(!phys.contains("Window"), phys)
  }
}
