package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.LlmPipeline

/** Property tests for the dedup/ANN sketches, checked against independent
  * brute-force formulations (not the SQL twins — those are covered by the
  * oracle harness).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("minhash signature agreement estimates jaccard") {
    // two texts sharing ~half their shingles
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy cat again and again tomorrow"
    val df = Seq((1, a), (2, b)).toDF("id", "text")
      .select(col("id"), Sketches.shingles(col("text"), 3).as("sh"))
      .withColumn("hs", Sketches.shingleHashes(col("sh")))
    val rows = df.select(col("id") +: col("sh") +:
        (0 until Sketches.NumHashes).map(i => Sketches.minhash(col("hs"), i).as(s"s$i")): _*)
      .collect().sortBy(_.getInt(0))
    val shA = rows(0).getSeq[String](1).toSet
    val shB = rows(1).getSeq[String](1).toSet
    val trueJac = (shA & shB).size.toDouble / (shA | shB).size
    val agree = (0 until Sketches.NumHashes)
      .count(i => rows(0).getLong(2 + i) == rows(1).getLong(2 + i))
    val est = agree.toDouble / Sketches.NumHashes
    // 16 hashes → coarse estimate; just require the right neighborhood
    assert(math.abs(est - trueJac) < 0.35, s"est=$est true=$trueJac")
  }

  test("banded LSH recovers exactly the brute-force near-dup pairs (sf0.001)") {
    val spark2 = spark
    val viaLsh = LlmPipeline.all.find(_.name == "q36_lsh_neardup_pairs").get
      .run(spark2, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // independent brute force: all-pairs exact jaccard over the same shingles
    val sh = graft.core.Tables.documents(spark2, sf)
      .select(col("doc_id"), Sketches.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("jac", Sketches.jaccard(col("x.sh"), col("y.sh")))
      .filter(col("jac") >= 0.8)
      .select(col("x.doc_id"), col("y.doc_id")).as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "test data should contain planted near-dups")
    assert(viaLsh === brute)
  }

  test("simhash: small hamming distance for near-identical, large for unrelated") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val df = Seq(
      (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // 1 word differs
      (3, "one two three four five six seven eight nine ten"))
      .toDF("id", "text")
      .select(col("id"), Sketches.simhash(Sketches.wordHashes(col("text"))).as("sh"))
    val m = df.as[(Int, Long)].collect().toMap
    assert(ham(m(1), m(2)) < ham(m(1), m(3)),
      s"near pair ${ham(m(1), m(2))} should beat unrelated ${ham(m(1), m(3))}")
    assert(ham(m(1), m(1)) === 0)
  }

  test("hyperplane signature: deterministic, and negation flips every decided bit") {
    val v = (1 to 64).map(i => (if (i % 3 == 0) -1.0 else 1.0) * i / 64.0).toArray
    val df = Seq((1, v), (2, v.map(-_))).toDF("id", "embedding")
      .select(col("id"), Sketches.hyperplaneSig(col("embedding"), 64).as("sig"))
    val m = df.as[(Int, Long)].collect().toMap
    assert(m(1) >= 0 && m(1) <= 255)
    // no dot product is exactly 0 for this vector, so -v inverts all 8 bits
    assert((m(1) ^ m(2)) === 255L, s"sig=${m(1)} negSig=${m(2)}")
  }

  test("16-bit band-OR ANN: multi-probe recall beats exact-signature recall on planted near-dups") {
    val rnd = new scala.util.Random(42)
    val dims = 64
    // 80 base vectors, each with a planted near-duplicate (its true top-1)
    val rows: Seq[(Long, Array[Double])] =
      (0 until 80).map(_ => Array.fill(dims)(rnd.nextGaussian())).zipWithIndex.flatMap {
        case (v, i) =>
          val twin = v.map(x => x + rnd.nextGaussian() * 0.05)
          Seq((i.toLong * 2, v), (i.toLong * 2 + 1, twin))
      }
    val sigs = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Sketches.hyperplaneSigN(col("embedding"), dims, 16).as("sig"))
      .as[(Long, Long)].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val top1 = rows.map { case (id, v) =>
      id -> rows.filter(_._1 != id).maxBy(o => cos(v, o._2))._1
    }.toMap
    def band(s: Long, i: Int): Long = (s >> (8 * i)) & 255
    // candidate-generation recall of the true nearest neighbor:
    // exact = full 16-bit signature must collide (the naive wide-bucket ANN);
    // banded = EITHER 8-bit half collides (q67's band-OR multi-probe)
    val exact = rows.count { case (id, _) =>
      sigs(id) == sigs(top1(id)) }.toDouble / rows.size
    val banded = rows.count { case (id, _) =>
      (0 to 1).exists(i => band(sigs(id), i) == band(sigs(top1(id)), i))
    }.toDouble / rows.size
    assert(banded >= exact, s"banded=$banded exact=$exact")
    assert(banded >= 0.9, s"banded recall $banded should recover planted twins")
  }

  test("linear-counting ladder: m·ln(m/V) pinned against float truth, Column == Scala twin") {
    import graft.queries.TextCorpusOps
    // pinned integers — the ladder's DEFINED outputs (the gate value,
    // not a float replay), with the float truth beside each to show the
    // mantissa-linear + rounded-ln2 budget stays ≤ ~2% of m
    val pinned = Seq(
      (64, 1L) -> 266L,   // 64·ln(64)  = 266.2
      (64, 2L) -> 221L,   // 64·ln(32)  = 221.8
      (64, 32L) -> 44L,   // 64·ln(2)   = 44.4
      (64, 37L) -> 37L,   // 64·ln(64/37) = 35.1 (ladder mantissa error)
      (64, 63L) -> 1L,    // 64·ln(64/63) = 1.0
      (256, 1L) -> 1420L, // 256·ln(256) = 1419.6
      (256, 37L) -> 504L, // 256·ln(256/37) = 495.2
      (256, 128L) -> 177L, // 256·ln(2) = 177.4
      (256, 255L) -> 1L)
    pinned.foreach { case ((m, v), expect) =>
      assert(TextCorpusOps.hllLcScala(m, v) === expect, s"lc($m, $v)")
      // ladder budget: 0.0861 bits of mantissa-linear log2 error scales
      // to m·0.0861·ln2 ≈ 6% of m on the correction (the scaladoc bound)
      val truth = m * math.log(m.toDouble / v)
      assert(math.abs(TextCorpusOps.hllLcScala(m, v) - truth) <=
        math.max(2.0, 0.06 * m), s"lc($m, $v) vs float truth $truth")
    }
    // the Column form computes the identical ladder (all V, both m)
    val df = (1L to 256L).toDF("v")
    Seq(64, 256).foreach { m =>
      val got = df.filter(col("v") <= m)
        .select(col("v"), TextCorpusOps.hllLcCol(m, col("v")).as("lc"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got.foreach { case (v, lc) =>
        assert(lc === TextCorpusOps.hllLcScala(m, v), s"Column lc($m, $v)")
      }
    }
  }

  test("integer-ladder domain guards: ilog2/log2q10/isqrt clamp 0/negative identically") {
    // VERDICT r16 #7: the belts live INSIDE the twins (greatest(x,1) /
    // greatest(x,0)), so a future caller passing a signed value cannot
    // diverge the engines silently. The Column forms must equal the
    // plain-Scala twins on the full signed edge set — below the clamp
    // (where Spark's bin() renders 64 two's-complement chars and would
    // otherwise yield 63) and across both log2q10 shift branches.
    val edges = Seq(Long.MinValue + 1, -1048576L, -7L, -1L, 0L, 1L, 2L,
      3L, 1023L, 1024L, 1025L, (1L << 52) - 1L, 1L << 52, (1L << 52) + 1L,
      (1L << 60) + 12345L)
    val df = edges.toDF("x")
    val got = df.select(col("x"),
        Sketches.ilog2(col("x")).as("i"),
        Sketches.log2q10(col("x")).as("l"),
        Sketches.isqrt(col("x")).as("s"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    edges.foreach { v =>
      val (i, l, sq) = got(v)
      assert(i === Sketches.ilog2Scala(v), s"ilog2($v)")
      assert(l === Sketches.log2q10Scala(v), s"log2q10($v)")
      assert(sq === Sketches.isqrtScala(v), s"isqrt($v)")
    }
    // clamp semantics: everything at or below the floor maps to the
    // floor's value — 0/negatives cannot reach the engines' divergent
    // negative-rendering paths
    assert(got(-7L)._1 === 0L && got(0L)._2 === 0L && got(-1L)._3 === 0L)
  }

  test("fixed-order cosine: self-similarity is exactly 1 for unit-consistent input") {
    val v = (1 to 64).map(_.toDouble / 8).toArray
    val df = Seq((1, v)).toDF("id", "e")
      .select(Sketches.cosineFromParts(
        Sketches.dot(col("e"), col("e"), 64),
        Sketches.norm(col("e"), 64), Sketches.norm(col("e"), 64)).as("c"))
    val c = df.as[Double].head()
    assert(math.abs(c - 1.0) < 1e-15)
  }
}
