package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** L95–L97 + L104 semantics beyond the oracles: BM25's tf-saturation /
  * length normalization replayed in plain Scala on a planted corpus,
  * maxsim's doc-token permutation invariance, the matryoshka audit on a
  * corpus whose signal lives entirely in the first 8 dims, and the RRF
  * arithmetic replayed against the registered BM25 list on the real
  * fixture.
  */
class RetrievalSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    import spark.implicits._
    val d = Files.createTempDirectory("retr-docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def embDir(rows: Seq[(Long, Array[Float])]): String = {
    val d = Files.createTempDirectory("retr-emb").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](
          rows.map(r => Row(r._1, r._2, 0)).asJava), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(q: String, dir: String): Array[Row] =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  test("q163: tf-saturation and length normalization replay exactly") {
    // qid 0 searches "spark join" (+ "window merge", absent here).
    // A: tf=3 in a short doc; B: tf=1 short; C: tf=1 but long (length
    // normalization must push C below B); D/E: no query gram (absent).
    val pad = Seq.fill(40)("row").mkString(" ")
    val docs = Seq(
      (1L, "spark join spark join spark join", "en", "s", 10L),
      (2L, "spark join key value sort", "en", "s", 10L),
      (3L, s"spark join $pad", "en", "s", 10L),
      (4L, "key value sort merge part", "en", "s", 10L),
      (5L, s"$pad key value", "en", "s", 10L))
    val out = run("q163_bm25_topk", docsDir(docs))
      .filter(_.getLong(0) == 0L)
      .map(r => (r.getLong(2), r.getLong(3))) // (doc_id, score)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L),
      "expected tf-desc then length-normalized order, non-matching docs absent")
    // replay the integer BM25 ladder in plain Scala
    def grams(t: String): Seq[String] = {
      val w = t.trim.split("\\s+").toSeq
      if (w.size < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val allGrams = docs.map(dd => dd._1 -> grams(dd._2)).toMap
    val n = docs.size.toLong
    val sdl = allGrams.values.map(_.size.toLong).sum
    val avgdl = sdl / n
    val df = allGrams.values.count(_.contains("spark join")).toLong
    def ilog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val idf = ilog2(((n - df + 1) * 1048576L) / (df + 1))
    def score(id: Long): Long = {
      val g = allGrams(id)
      val tf = g.count(_ == "spark join").toLong
      val dl = g.size.toLong
      val tfn = (tf * 2252L * 1024L * 1024L) /
        (tf * 1024L * 1024L + 1228L * ((1024L - 768L) + (768L * dl) / avgdl))
      idf * tfn
    }
    out.foreach { case (id, sc) => assert(sc === score(id), s"doc $id") }
  }

  test("graft_grams matches the lambda reference form (order, dups, edges)") {
    import org.apache.spark.sql.functions._
    val texts = Seq("spark join spark join", "one", "", "  padded  text  ",
      "a b", "x\ty\nz", " lead", "trail ")
    val df = spark.createDataset(texts)(org.apache.spark.sql.Encoders.STRING)
      .toDF("text")
    graft.plans.GraftExtensions.register(spark)
    val w = col("w")
    val reference = when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(col("text"),
        call_function("graft_grams", col("text"), lit(2)).as("native"))
      .withColumn("w", split(trim(col("text")), "\\s+"))
      .withColumn("ref", reference)
      .select("text", "native", "ref")
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"text '${r.getString(0)}'")
    }
  }

  test("q164: maxsim is invariant to doc-token permutation, sensitive to token loss") {
    val rnd = new scala.util.Random(15L)
    def tok(): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
    val qtoks = Array.fill(8)(tok())
    val qvec = qtoks.flatten
    // did 7: identical tokens; did 8: tokens in reversed block order
    // (maxsim must score it EQUAL to 7); did 9: one token zeroed
    // (strictly lower); 10..14: random fillers
    val perm = qtoks.reverse.flatten
    val lossy = (qtoks.take(7) :+ Array.fill(8)(0f)).flatten
    val rows = Seq(0L -> qvec, 7L -> qvec.clone, 8L -> perm, 9L -> lossy) ++
      (10L to 14L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val out = run("q164_maxsim_rerank", embDir(rows))
      .map(r => (r.getLong(2), r.getLong(3))).toMap // did -> score_u
    assert(out(7L) === out(8L),
      "block permutation must not change the maxsim score")
    assert(out.getOrElse(9L, Long.MinValue) < out(7L),
      "zeroing a token must strictly lower the score")
  }

  test("q165: prefix-resident signal gives perfect truncated recall") {
    val rnd = new scala.util.Random(97L)
    // 40 vectors whose dims 8..63 are all zero: every prefix ranking
    // equals the full ranking, so recall is exactly 10/10 at p=8,16,32
    val rows = (0L until 40L).map { i =>
      i -> (Array.fill(8)(rnd.nextGaussian().toFloat) ++ Array.fill(56)(0f))
    }
    val out = run("q165_matryoshka_agreement", embDir(rows))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(out.map(_._1).toSeq === Seq(8L, 16L, 32L))
    out.foreach { case (dims, nq, sumOv, ppm) =>
      assert(nq === 1L, s"dims $dims: one query (vec_id 0)")
      assert(sumOv === 10L, s"dims $dims: full overlap")
      assert(ppm === 1000000L, s"dims $dims")
    }
  }

  test("q172: fused order replays from the provenance ranks on the real fixture") {
    val dir = "/root/testdata/sf0.001"
    val fused = run("q172_rrf_hybrid_fusion", dir)
    assert(fused.length === 40)
    fused.foreach { r =>
      val (rrf, rs, rd) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val expect = (if (rs > 0) 1000000L / (60 + rs) else 0L) +
        (if (rd > 0) 1000000L / (60 + rd) else 0L)
      assert(rrf === expect, s"rrf_u must replay from provenance ranks: $r")
      assert(rs != -1L || rd != -1L, "a fused doc must come from some list")
    }
    // within each qid the list is ordered by (rrf desc, doc_id)
    fused.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
        .map(r => (-r.getLong(3), r.getLong(2))).toSeq
      assert(ordered === ordered.sorted, s"qid $qid fused order")
    }
    // the BM25 provenance ranks must be the registered q163 ranks
    val bm = run("q163_bm25_topk", dir)
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    fused.filter(r => r.getLong(4) >= 1 && r.getLong(4) <= 10).foreach { r =>
      assert(bm((r.getLong(0), r.getLong(2))) === r.getLong(4),
        s"sparse provenance of $r")
    }
  }
}
