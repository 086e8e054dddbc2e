package graft.queries

import graft.SparkSpec

/** L156–L160: the sketch-swap tier must reproduce its exact-form
  * twins ROW FOR ROW at the gated fixtures (the k ≥ n exactness
  * predicate), and the predicate's preconditions must actually hold
  * there — otherwise the equality tests would be testing luck.
  */
class SketchSwapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[Seq[Any]] =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect().toSeq.map(_.toSeq)
    }

  test("exactness preconditions: group sizes under k, ids under 2^20") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, dir)
    val (nDocs, maxDoc) = docs
      .agg(count(lit(1)), max(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(nDocs <= 8192L, "global sketch (q224) must hold the corpus")
    assert(maxDoc < (1L << 20), "combined-key id domain")
    val emb = graft.core.Tables.embeddings(spark, dir)
    val (maxLabelN, maxVec) = emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), max(col("vec_id")).as("mv"))
      .agg(max(col("n")), max(col("mv")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(maxLabelN <= 8192L && maxVec < (1L << 20))
  }

  test("q224 == q167: sketched stage cuts reproduce the ntile table") {
    assert(rows("q224_curriculum_stages_sketched") ===
      rows("q167_curriculum_stages"))
  }

  test("q225 == q171: sketched median/MAD reproduce the exact fences") {
    assert(rows("q225_mad_outliers_sketched") === rows("q171_mad_outliers"))
  }

  test("q226 == q195: sketched τ reproduces conformal coverage incl. no-τ branch") {
    val exact = rows("q195_conformal_threshold")
    assert(exact.nonEmpty)
    assert(rows("q226_conformal_threshold_sketched") === exact)
    // the fixture exercises the no-τ branch (parity confounds source
    // and split here: test-half sources have no calibration docs), so
    // the equality covers the NULL-τ path, not just the happy path
    assert(exact.exists(_(2) == 0L), "no-τ branch exercised")
  }

  test("q227 == q219: sketched norm medians reproduce the health profile") {
    assert(rows("q227_norm_health_sketched") ===
      rows("q219_embedding_norm_health"))
  }

  test("q228 == q200: sample Gini is exact at k >= n") {
    assert(rows("q228_mass_concentration_sketched") ===
      rows("q200_mass_concentration"))
  }

  test("k < n protocol: deterministic sample, in-bounds nearest-rank index") {
    // plain-Scala replay of the bottom-k protocol at k = 16 over 100
    // distinct keys: the sample is a pure function of the salted md5
    // order, and the downscaled rank index lands inside the sample for
    // every rank — the production (k < n) regime's two load-bearing
    // properties, testable without an engine
    val keys = (0L until 100L).map(v => v * 1048576L + v)
    def sample(k: Int): Seq[Long] = keys
      .sortBy(v => (graft.plans.BottomKSketchAgg.hash("spec", v), v))
      .take(k).sorted
    val s16a = sample(16)
    assert(s16a === sample(16), "sample is deterministic")
    assert(s16a.toSet.subsetOf(keys.toSet) && s16a.size === 16)
    (1L to 100L).foreach { r =>
      val idx = math.max(1L, r * s16a.size / 100L)
      assert(idx >= 1L && idx <= s16a.size, s"rank $r index in bounds")
    }
    // k >= n degenerates to the identity: sample IS the sorted keys
    // and the index formula returns the rank itself
    val sAll = sample(128)
    assert(sAll === keys.sorted)
    (1L to 100L).foreach { r =>
      assert(math.max(1L, r * sAll.size / 100L) === r)
    }
  }
}
