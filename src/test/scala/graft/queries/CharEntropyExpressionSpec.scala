package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r19 optimization: the native `graft_char_entropy` loop replaces the
  * exploded substring + two-aggregate entropy ladder in
  * [[SampleGraphOps.entropyPerDoc]] (q142/q146/q206). The value must be
  * bit-identical to the relational form — including the truncating
  * double divide and the code-point character unit — over adversarial
  * texts and the real fixture corpus.
  */
class CharEntropyExpressionSpec extends SparkSpec {

  private val Cap = 512

  /** The pre-r19 relational ladder, verbatim (minus the repartition,
    * which never changed values).
    */
  private def legacyEntropy(src: DataFrame): DataFrame =
    src
      .filter(length(col("text")) >= 1)
      .withColumn("nn", least(length(col("text")), lit(Cap)))
      .select(col("doc_id"), col("nn"),
        explode(expr("sequence(1, nn)")).as("i"), col("text"))
      .select(col("doc_id"), col("nn"),
        expr("substring(text, i, 1)").as("c"))
      .groupBy(col("doc_id"), col("nn"), col("c"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg((sum(col("n") *
        (length(bin(expr("nn div n"))) - 1)) * 1000000L / max(col("nn")))
        .cast("long").as("hp"))

  private def nativeEntropy(src: DataFrame): DataFrame =
    src
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        call_function("graft_char_entropy", col("text"), lit(Cap)).as("hp"))

  private def assertAgree(src: DataFrame): Unit = {
    val legacy = legacyEntropy(src).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = nativeEntropy(src).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == legacy)
  }

  test("native char entropy == relational ladder on adversarial texts") {
    import spark.implicits._
    val texts = Seq(
      (1L, "ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha"),
      (2L, "a"),                                  // single char
      (3L, "ab"),
      (4L, "The quick brown fox jumps over the lazy dog."),
      (5L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (6L, "x".*(600) + "y".*(600)),              // beyond the 512 cap
      (7L, "日本語のテキストです 混ざった ascii も"),   // multi-byte chars
      (8L, "😀😀 emoji 😁"), // astral plane
      (9L, (0 until 200).map(i => ('a' + i % 26).toChar).mkString),
      (10L, ""))                                   // filtered out by both
      .toDF("doc_id", "text")
    assertAgree(texts)
  }

  test("native char entropy == relational ladder on the fixture corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    assertAgree(docs)
  }

  test("entropyPerDoc plans map-side: no exchange before the projection") {
    val df = SampleGraphOps.entropyPerDoc(spark, "/root/testdata/sf0.001")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), phys)
  }
}
