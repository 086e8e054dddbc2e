package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{CacheScope, Tables}

/** Spectral corpus statistics (SURVEY §2.11a, L108):
  *
  *  - L108 dominant principal component (power iteration) → q176
  *
  * The embedding-space health check a training-data pipeline runs
  * before relying on cosine geometry: anisotropy. Embedding corpora
  * are notoriously anisotropic (a dominant direction eats most of the
  * variance, compressing cosine spread); the governance number is the
  * dominant eigenvalue's share of the total variance, and the fix —
  * removing the top component ("all-but-the-top") — needs the
  * component itself. Both come from one Gram-matrix pass plus a few
  * matrix-vector products on a Dims×Dims frame.
  *
  * Determinism: the whole iteration rides exact integer arithmetic —
  * components quantized on the q105 ladder (floor(v·10^6)), the Gram
  * matrix scaled by floor-division, each iterate renormalized to a
  * ±2^7 amplitude by floor-division against its max — so engine and
  * oracle agree bit-for-bit at every step. Negative operands are
  * everywhere in a spectral iteration, so the division convention is
  * pinned: Spark's `div` and DuckDB's `//` BOTH truncate toward zero
  * (measured − the "floor divide" reading of `//` is wrong), so the
  * plain integral-divide operator is engine-exact as-is; [[fdiv]]
  * merely routes the DataFrame side to the same IntegralDivide node
  * the SQL `div` keyword parses to.
  */
object SpectralOps {

  /** Embedding width (the L6/L27 constant). */
  private[queries] val Dims = 64

  /** Component quantum: floor(v·10^6) (the q105/q174 ladder). */
  private[queries] val CompQ = 1000000L

  /** Gram damping: gn = Σ q_i·q_j div (n·GramDamp). Keeps every
    * downstream product Long-safe: |gn| ≤ CompQ²/GramDamp = 10^9,
    * so a matvec term |gn·v| ≤ 10^9·2^7 and the renormalization
    * product |w·2^7| ≤ Dims·10^9·2^14 ≈ 10^15 ≪ 2^63. At production
    * corpus sizes the raw Gram sum Σ q_i·q_j itself approaches the
    * Long range near n ≈ 9·10^6·(CompQ²/E[q²]); the quantum then
    * scales down with n (the bandBitsFor dial stance) or the pass
    * accumulates DECIMAL — the iteration below is unchanged either
    * way.
    */
  private[queries] val GramDamp = 1024L

  /** Iterate amplitude: each normalized iterate lives in [-2^7, 2^7]. */
  private[queries] val VQ = 128L

  private[queries] val PowerIters = 3

  /** Floor division with a POSITIVE divisor, identical on both
    * engines: Spark's `div` truncates toward zero, so subtract the
    * (always non-negative) `pmod` remainder first — the result is
    * exactly floor(a/b), matching DuckDB's `//`.
    */
  private[queries] def fdiv(a: Column, b: Column): Column =
    call_function("div", a, b)

  def all: Seq[GraftQuery] = {

    /* L108: dominant principal component by power iteration — the
     * anisotropy audit. One corpus pass builds the exact integer Gram
     * matrix (two nested posexplodes over the SAME row's array: the
     * Dims² per-vector products are inherent to any Gram computation
     * and run inside codegen; the aggregate map-side-combines, so the
     * only shuffle is Dims² = 4096 rows regardless of corpus size —
     * no self-join, no all-pairs). Three power-iteration steps then
     * run on the 4096-row frame: w = G·v (a Dims-row broadcast join +
     * Dims-row aggregate), v' = floor(w·2^7 / max|w|) — every iterate
     * an exact integer vector, so a single flipped bit anywhere in
     * the chain diverges the gate. The output reports, per dimension:
     * the damped Gram diagonal, all three iterates, the final matvec,
     * and (broadcast onto every row) the Rayleigh quotient of the
     * last iterate plus its share of the total variance (rq ≤ trace
     * for a PSD Gram; var_ppm is the anisotropy number). At 100 TB:
     * the corpus pass is the whole cost and it is one map-side-
     * combined aggregate; everything after runs on kilobytes. */
    val q176 = GraftQuery(
      "q176_dominant_component", "L108 L76 L46",
      (s, d) => {
        val comp = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
          .select(col("vec_id"), col("embedding"),
            posexplode(col("embedding")))
          .select(col("vec_id"), col("embedding"),
            (col("pos") + 1).cast("long").as("i"),
            floor(col("col").cast("double") * lit(CompQ)).as("qi"))
          .select(col("vec_id"), col("i"), col("qi"),
            posexplode(col("embedding")))
          .select(col("i"), col("qi"),
            (col("pos") + 1).cast("long").as("j"),
            floor(col("col").cast("double") * lit(CompQ)).as("qj"))
        val n = Tables.embeddings(s, d).agg(count(lit(1)).as("n"))
        val gram = CacheScope.tracked(
          comp.groupBy(col("i"), col("j"))
            .agg(sum(col("qi") * col("qj")).as("g"))
            .crossJoin(broadcast(n))
            .select(col("i"), col("j"),
              fdiv(col("g"), col("n") * lit(GramDamp)).as("gn")))
        def matvec(v: DataFrame): DataFrame = gram
          .join(broadcast(v.select(col("i").as("j"), col("v"))), Seq("j"))
          .groupBy(col("i")).agg(sum(col("gn") * col("v")).as("w"))
        def renorm(w: DataFrame): DataFrame = {
          val m = w.agg(greatest(max(abs(col("w"))), lit(1L)).as("m"))
          w.crossJoin(broadcast(m))
            .select(col("i"), fdiv(col("w") * lit(VQ), col("m")).as("v"))
        }
        val v0 = gram.select(col("i")).distinct()
          .select(col("i"), lit(VQ).as("v"))
        val iterates = (1 to PowerIters).scanLeft(v0) { (v, _) =>
          renorm(matvec(v))
        }.tail // v1, v2, v3
        val v3 = iterates.last
        val w4 = matvec(v3)
        val ray = v3.join(w4, Seq("i"))
          .agg(sum(col("v") * col("w")).as("num"),
            sum(col("v") * col("v")).as("den"))
        val trace = gram.filter(col("i") === col("j"))
          .agg(sum(col("gn")).as("trace_q"))
        val diag = gram.filter(col("i") === col("j"))
          .select(col("i").as("pos"), col("gn").as("g_diag"))
        val named = iterates.zipWithIndex.map { case (v, k) =>
          v.select(col("i").as("pos"), col("v").as(s"v${k + 1}"))
        }
        named.foldLeft(diag)((acc, v) => acc.join(v, Seq("pos")))
          .join(w4.select(col("i").as("pos"), col("w").as("w4")), Seq("pos"))
          .crossJoin(broadcast(ray))
          .crossJoin(broadcast(trace))
          .withColumn("rq", fdiv(col("num"), greatest(col("den"), lit(1L))))
          .select(col("pos"), col("g_diag"), col("v1"), col("v2"),
            col("v3"), col("w4"), col("rq"), col("trace_q"),
            fdiv(col("rq") * lit(1000000L),
              greatest(col("trace_q"), lit(1L))).as("var_ppm"))
          .orderBy(col("pos"))
      },
      Some {
        def matvecSql(k: Int): String =
          s"""w$k AS (SELECT g.i, CAST(SUM(g.gn * v${k - 1}.v) AS BIGINT)
              AS w FROM g JOIN v${k - 1} ON v${k - 1}.i = g.j GROUP BY 1),
          v$k AS (SELECT i, (w * $VQ) //
              (SELECT GREATEST(MAX(ABS(w)), 1) FROM w$k) AS v FROM w$k)"""
        s"""WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
              FROM embeddings),
          g AS MATERIALIZED (SELECT a.i, b.j,
              CAST(SUM(CAST(floor(CAST(embedding[a.i] AS DOUBLE) * $CompQ)
                  AS BIGINT)
                * CAST(floor(CAST(embedding[b.j] AS DOUBLE) * $CompQ)
                  AS BIGINT)) AS BIGINT)
              // ((SELECT n FROM nn) * $GramDamp) AS gn
            FROM embeddings, generate_series(1, $Dims) a(i),
              generate_series(1, $Dims) b(j)
            GROUP BY 1, 2),
          v0 AS (SELECT DISTINCT i, CAST($VQ AS BIGINT) AS v FROM g),
          ${(1 to PowerIters).map(matvecSql).mkString(",\n          ")},
          w4 AS (SELECT g.i, CAST(SUM(g.gn * v$PowerIters.v) AS BIGINT)
              AS w FROM g JOIN v$PowerIters ON v$PowerIters.i = g.j
            GROUP BY 1),
          ray AS (SELECT
              CAST(SUM(v$PowerIters.v * w4.w) AS BIGINT) AS num,
              CAST(SUM(v$PowerIters.v * v$PowerIters.v) AS BIGINT) AS den
            FROM v$PowerIters JOIN w4 ON w4.i = v$PowerIters.i),
          tr AS (SELECT CAST(SUM(gn) AS BIGINT) AS trace_q FROM g
            WHERE i = j)
          SELECT g.i AS pos, g.gn AS g_diag, v1.v AS v1, v2.v AS v2,
            v3.v AS v3, w4.w AS w4,
            ray.num // GREATEST(ray.den, 1) AS rq, tr.trace_q,
            (ray.num // GREATEST(ray.den, 1)) * 1000000
              // GREATEST(tr.trace_q, 1) AS var_ppm
          FROM g JOIN v1 ON v1.i = g.i JOIN v2 ON v2.i = g.i
            JOIN v3 ON v3.i = g.i JOIN w4 ON w4.i = g.i
            CROSS JOIN ray CROSS JOIN tr
          WHERE g.i = g.j ORDER BY pos"""
      })

    Seq(q176)
  }
}
