package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Sketches

/** Corpus-scaled MinHash rows-per-band dial (VERDICT r12 #4 — the
  * bandBitsFor treatment applied to the text near-dup family).
  *
  *  - the dial FLOORS at the baked 4×4 geometry for every gated SF
  *    (≤ 10k docs), so the oracle-checked q36/q103/q126 stay
  *    hash-identical;
  *  - it grows ~one row per decade of corpus, monotonically;
  *  - at the floor, the dial kernel IS q36: same pairs, same jaccard;
  *  - identical-text twins are geometry-proof: identical shingle sets
  *    give identical family minima, so EVERY band agrees at ANY r —
  *    sharpening the dial can never lose an exact duplicate, the
  *    dominant near-dup class of a crawl corpus;
  *  - a sharper r can only SHRINK the candidate set (each band demands
  *    more agreeing positions) — the quadratic-term bound the dial buys.
  */
class MinhashDialSpec extends SparkSpec {

  import spark.implicits._

  test("rowsPerBandFor floors at 4 through the gated SFs and scales by decade") {
    Seq(1L, 500L, 5000L, 10000L).foreach(n =>
      assert(Sketches.rowsPerBandFor(n) === 4, s"floor broken at n=$n"))
    assert(Sketches.rowsPerBandFor(50000L) === 5)
    assert(Sketches.rowsPerBandFor(1000000L) === 6)
    assert(Sketches.rowsPerBandFor(100000000L) === 8)
    // monotone: more corpus never means a laxer band
    val pts = Seq(1L, 10000L, 50000L, 1000000L, 100000000L, 10000000000L)
    pts.zip(pts.tail).foreach { case (a, b) =>
      assert(Sketches.rowsPerBandFor(a) <= Sketches.rowsPerBandFor(b))
    }
  }

  private lazy val corpusDir: String = {
    val dir = Files.createTempDirectory("minhash-dial").toString
    val twin = (0 until 40).map(i => s"t$i").mkString(" ")
    val near = (0 until 40).map(i => if (i == 39) "x39" else s"t$i")
      .mkString(" ") // 1 of 40 words differs: j ≈ 0.86 over 3-gram shingles
    val docs =
      Seq((1L, twin, "en", "a", 0L), (2L, twin, "en", "b", 0L),
        (3L, near, "en", "c", 0L)) ++
        (10L to 59L).map(i =>
          (i, (0 until 25).map(w => s"w${i}u$w").mkString(" "), "en", "d", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("at the floor the dial kernel is exactly q36") {
    val q36 = graft.SparkEntry.queries("q36_lsh_neardup_pairs")(
      spark, corpusDir).collect().map(_.toSeq).toSet
    val dial = LlmPipeline.textNearDupPairs(spark, corpusDir, 4)
      .collect().map(_.toSeq).toSet
    assert(dial === q36)
  }

  test("identical twins survive every rows-per-band setting; candidates shrink") {
    val counts = Seq(4, 5, 8).map { r =>
      val pairs = LlmPipeline.textNearDupPairs(spark, corpusDir, r)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)),
        s"identical twin pair lost at rowsPerBand=$r")
      val cand = LlmPipeline.textCandidatePairs(spark, corpusDir, r).count()
      (r, cand)
    }
    counts.zip(counts.tail).foreach { case ((ra, a), (rb, b)) =>
      assert(b <= a, s"candidates grew with a sharper band: r=$ra:$a -> r=$rb:$b")
    }
  }

  test("the adaptive default resolves from the corpus size with the floor") {
    // 53 docs -> well under the 10k knee -> the baked 4x4 geometry
    val pairs = LlmPipeline.textNearDupPairs(spark, corpusDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }
}
