package graft.queries

import graft.SparkSpec

/** L108 semantics beyond the oracle: the integer power iteration
  * replayed bit-for-bit in plain Scala (Gram damping, truncating
  * renormalization, Rayleigh quotient), and a convergence check — the
  * integer iterate must align with the float dominant eigenvector of
  * the same quantized Gram matrix.
  */
class SpectralSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q199: PR reads exactly 1 dim on a collapsed class, all 64 on a one-hot basis") {
    // label 0: 64 copies of e_1 — one direction owns the variance,
    // pr_q10 must be exactly 1024 (1.0 dims).
    // label 1: one vector per axis — an isotropic diagonal Gram,
    // pr_q10 must be exactly 64*1024 (every dim participating).
    def oneHot(axis: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    val collapsed = (0L until 64L).map(i => (i, oneHot(0), 0L))
    val basis = (100L until 164L).map(i => (i, oneHot((i % 64L).toInt), 1L))
    val d = java.nio.file.Files.createTempDirectory("spectral-emb").toString
    (collapsed ++ basis).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val out = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q199_effective_rank")(spark, d).collect()
    }.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(0L) === ((64L, 1024L, 15625L)), s"collapsed class: $out")
    assert(out(1L) === ((64L, 65536L, 1000000L)), s"one-hot basis: $out")
  }

  test("q176: the iteration replays in Scala and aligns with the eigenvector") {
    val emb = graft.core.CacheScope.scoped {
      graft.core.Tables.embeddings(spark, dir)
        .select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect()
    }
    val n = emb.length.toLong
    val q = emb.map(_._2.map(v => math.floor(v.toDouble * 1e6).toLong))
    // exact integer Gram, damped
    val gn = Array.ofDim[Long](64, 64)
    for (v <- q; i <- 0 until 64; j <- 0 until 64)
      gn(i)(j) += v(i) * v(j)
    for (i <- 0 until 64; j <- 0 until 64)
      gn(i)(j) = gn(i)(j) / (n * 1024L) // truncating, like div and //
    def matvec(v: Array[Long]): Array[Long] =
      Array.tabulate(64)(i => (0 until 64).map(j => gn(i)(j) * v(j)).sum)
    def renorm(w: Array[Long]): Array[Long] = {
      val m = math.max(w.map(math.abs).max, 1L)
      w.map(x => x * 128L / m)
    }
    val v1 = renorm(matvec(Array.fill(64)(128L)))
    val v2 = renorm(matvec(v1))
    val v3 = renorm(matvec(v2))
    val w4 = matvec(v3)
    val num = (0 until 64).map(i => v3(i) * w4(i)).sum
    val den = math.max((0 until 64).map(i => v3(i) * v3(i)).sum, 1L)
    val rq = num / den
    val trace = math.max((0 until 64).map(i => gn(i)(i)).sum, 1L)
    val out = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q176_dominant_component")(spark, dir)
        .collect()
    }
    assert(out.length === 64)
    out.foreach { r =>
      val i = r.getLong(0).toInt - 1
      assert(r.getLong(1) === gn(i)(i), s"g_diag[$i]")
      assert(r.getLong(2) === v1(i), s"v1[$i]")
      assert(r.getLong(3) === v2(i), s"v2[$i]")
      assert(r.getLong(4) === v3(i), s"v3[$i]")
      assert(r.getLong(5) === w4(i), s"w4[$i]")
      assert(r.getLong(6) === rq, "rayleigh")
      assert(r.getLong(8) === rq * 1000000L / trace, "var_ppm")
    }
    // quantization fidelity: the integer iterate must track a FLOAT
    // run of the same three steps from the same start (each renorm
    // quantizes to ±2^7, so per-step error is ≤ 1/128) — this pins the
    // integerization, independent of how flat the fixture's spectrum is
    var f = Array.fill(64)(1.0)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(64)(i =>
        (0 until 64).map(j => gn(i)(j).toDouble * f(j)).sum)
      val m = w.map(math.abs).max
      f = w.map(_ / m)
    }
    val v3n = math.sqrt(v3.map(x => x.toDouble * x).sum)
    val fn = math.sqrt(f.map(x => x * x).sum)
    val cos = math.abs((0 until 64).map(i => v3(i) * f(i)).sum) / (v3n * fn)
    assert(cos > 0.99,
      s"integer iterate must track the float iteration ($cos)")
    // anisotropy: the dominant share must exceed the isotropic 1/64
    val varPpm = out.head.getLong(8)
    assert(varPpm > 1000000L / 64,
      s"dominant component below the isotropic floor ($varPpm)")
  }

  test("q176: converges on a planted anisotropic corpus") {
    // vectors = a (scaled + perturbed) copies of one direction u plus
    // small deterministic noise -> a large eigengap, where three
    // iterations DO converge; the planted direction must dominate
    val d = java.nio.file.Files.createTempDirectory("spec-emb").toString
    val u = Array.tabulate(64)(i => math.sin(i * 0.7) + 1.2)
    val rows = (0L until 200L).map { k =>
      val s = 0.5 + (k % 7) * 0.2
      val v = Array.tabulate(64)(i =>
        (u(i) * s + math.sin(k * 0.31 + i * 1.3) * 0.05).toFloat)
      (k, v, (k % 3).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val out = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q176_dominant_component")(spark, d)
        .collect()
    }
    val v3 = out.map(r => r.getLong(0).toInt - 1 -> r.getLong(4)).toMap
    val v3n = math.sqrt(v3.values.map(x => x.toDouble * x).sum)
    val un = math.sqrt(u.map(x => x * x).sum)
    val cos = math.abs(
      (0 until 64).map(i => v3(i) * u(i)).sum) / (v3n * un)
    assert(cos > 0.99, s"planted direction must dominate ($cos)")
    // and the variance share must reflect the planted anisotropy
    assert(out.head.getLong(8) > 900000L,
      s"planted corpus must be >90% one-directional " +
        s"(${out.head.getLong(8)} ppm)")
  }

  test("graft_gram: merge-tree independent and equal to the column form") {
    // the UDAF's partial buffers must add associatively: any
    // partitioning yields the same matrix, and it must equal the
    // declarative floor(cast*quantum) explode it replaced bit-for-bit
    val base = graft.core.CacheScope.scoped {
      graft.core.Tables.embeddings(spark, dir).select("embedding")
    }
    import org.apache.spark.sql.functions._
    def gram(parts: Int): Seq[Long] = base.repartition(parts)
      .agg(expr("graft_gram(embedding, 64, 1000000)").as("g"))
      .head().getSeq[Long](0)
    val g1 = gram(1)
    assert(g1 === gram(7))
    assert(g1 === gram(32))
    val exploded = base
      .select(posexplode(col("embedding")))
      .select(col("pos").as("i"),
        floor(col("col").cast("double") * 1000000L).as("qi"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val byRow = exploded.grouped(64).toSeq
    val expect = Array.ofDim[Long](64 * 64)
    byRow.foreach { row =>
      val q = row.sortBy(_._1).map(_._2)
      for (i <- 0 until 64; j <- 0 until 64)
        expect(i * 64 + j) += q(i) * q(j)
    }
    assert(g1 === expect.toSeq)
  }
}
