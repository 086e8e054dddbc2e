package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** L105–L106 semantics beyond the oracles: the label filter actually
  * excludes same-label near-duplicates from the negative list, and the
  * centroid audit flags exactly a planted mislabeled vector.
  */
class ContrastiveSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val d = Files.createTempDirectory("contr-emb").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        new java.util.ArrayList[Row](
          rows.map(r => Row(r._1, r._2, r._3)).asJava), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(q: String, dir: String): Array[Row] =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  private def unit(axis: Int, sign: Float = 1f): Array[Float] = {
    val v = Array.fill(64)(0.01f * sign); v(axis) = 1f * sign; v
  }

  test("q173: same-label twins are excluded; the nearest other-label vector ranks first") {
    val rnd = new scala.util.Random(7L)
    def noise(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat * 0.01f)
    def plus(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x + y }
    val anchor = unit(0)
    val rows = Seq(
      (0L, anchor, 0),                     // the only anchor (vec_id % 50)
      (1L, plus(anchor, noise()), 0),      // same-label twin: cos ~1, excluded
      (2L, plus(anchor.map(_ * 0.9f), noise()), 1), // hard negative: rank 1
      (3L, unit(1), 1),                    // orthogonal-ish other-label
      (4L, unit(2), 2), (5L, unit(3), 2),
      (6L, unit(4), 1), (7L, unit(5), 2))
    val out = run("q173_hard_negative_mining", embDir(rows))
    val forAnchor = out.filter(_.getLong(0) == 0L)
    assert(forAnchor.length === 5)
    assert(!forAnchor.map(_.getLong(2)).contains(1L),
      "the same-label twin must never appear as a negative")
    assert(forAnchor.head.getLong(2) === 2L,
      "the planted hard negative must rank first")
    assert(forAnchor.map(_.getLong(1)).toSeq === (1L to 5L),
      "ranks are dense from 1")
    forAnchor.foreach(r => assert(r.getLong(3) != 0L,
      s"negative labels must differ from the anchor's: $r"))
  }

  test("q174: exactly the planted mislabeled vector is flagged") {
    val rnd = new scala.util.Random(21L)
    def around(base: Array[Float]): Array[Float] =
      base.map(x => x + rnd.nextGaussian().toFloat * 0.02f)
    val a = unit(0)
    val b = unit(1, -1f)
    // 10 clean label-0 docs near a, 10 clean label-1 near b, and one
    // vector near b that carries label 0 (the planted annotation error)
    val rows = (0L until 10L).map(i => (i, around(a), 0)) ++
      (10L until 20L).map(i => (i, around(b), 1)) ++
      Seq((20L, around(b), 0))
    val out = run("q174_label_noise_audit", embDir(rows))
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    assert(out(0L)._1 === 11L && out(1L)._1 === 10L)
    assert(out(0L)._2 === 1L,
      "label 0 must flag exactly the planted mislabel")
    assert(out(1L)._2 === 0L, "clean label 1 must flag nothing")
    assert(out(0L)._3 < 0L, "the flagged vector's margin is negative")
  }
}
