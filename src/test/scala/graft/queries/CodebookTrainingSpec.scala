package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Lloyd/k-means codebook training ([[LlmPipeline.refineCodebook]]) on a
  * planted two-cluster corpus whose STRIDE seeds are deliberately
  * off-center: the loop must pull each centroid onto the true cluster
  * mean, shrink inertia monotonically, and keep every member assigned to
  * its own cluster's cell. (q105 oracle-gates one step of this loop; this
  * spec proves the iterated job converges.)
  */
class CodebookTrainingSpec extends SparkSpec {

  import spark.implicits._

  test("Lloyd iterations land centroids on cluster means and shrink inertia") {
    // cluster A (ids 0-59): axis-0 units + symmetric jitter on axis 3;
    // cluster B (ids 60-79): axis-1 units + the same jitter shape.
    // Jitter is ((id % 5) - 2) * 0.1 — mean EXACTLY zero over each
    // cluster (ids cover residues uniformly), so the true means are the
    // pure axis vectors while both stride seeds (ids 0 and 63) carry
    // nonzero jitter, i.e. start off-center.
    val dir = Files.createTempDirectory("lloyd-train").toString
    (0L to 79L).map { id =>
      val a = Array.fill(64)(0f)
      a(if (id < 60L) 0 else 1) = 1f
      a(3) = ((id % 5L) - 2L).toFloat * 0.1f
      (id, a, 0)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val (code, inertias) = LlmPipeline.refineCodebook(spark, dir, iterations = 3)

    assert(inertias.length === 3)
    // seeds are off-center, so the first recentering must strictly help;
    // afterwards the loop sits at the fixed point (means don't move)
    assert(inertias(1) < inertias(0),
      s"recentering must reduce inertia: $inertias")
    assert(inertias(2) <= inertias(1) + 1e-9, s"non-increasing: $inertias")

    assert(code.map(_._1).sorted === Seq(0L, 63L), "both cells survive")
    val byCell = code.toMap
    // refined centroids = exact cluster means: pure axis vectors
    // (quantized through floor(v*1e6), exact for these dyadic values)
    for ((cell, axis) <- Seq((0L, 0), (63L, 1))) {
      val v = byCell(cell)
      assert(math.abs(v(axis) - 1f) < 1e-6, s"cell $cell axis $axis: ${v(axis)}")
      assert(math.abs(v(3)) < 1e-6, s"jitter must average out: ${v(3)}")
      assert(v.zipWithIndex.filter { case (_, i) => i != axis && i != 3 }
        .forall(_._1 == 0f), s"all other components zero for cell $cell")
    }
  }
}
