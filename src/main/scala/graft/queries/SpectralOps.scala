package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Spectral corpus statistics (SURVEY §2.11a, L108, L131):
  *
  *  - L108 dominant principal component (power iteration) → q176
  *  - L131 effective rank (participation ratio)           → q199
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
  * plain integral-divide operator is engine-exact as-is — and Scala
  * Long `/` shares the same truncate-toward-zero convention, so the
  * driver-side iteration stays engine-exact too.
  */
object SpectralOps {

  /** Embedding width (the L6/L27 constant). */
  private[graft] val Dims = 64

  /** Component quantum: floor(v·10^6) (the q105/q174 ladder). */
  private[graft] val CompQ = 1000000L

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
  private[graft] val GramDamp = 1024L

  /** Iterate amplitude: each normalized iterate lives in [-2^7, 2^7]. */
  private[queries] val VQ = 128L

  private[queries] val PowerIters = 3

  /** L131 requantization: PR needs trace² and Σm², so the damped Gram
    * (|gn| ≤ 10^9 by the GramDamp bound) is cut by another 2^10 before
    * squaring — trace(m)² ≤ (64·10^6)² ≈ 4·10^15 and Σm² ≤
    * 4096·(10^6)² ≈ 4·10^15, both far inside Long. The statistic is
    * DEFINED on the requantized matrix (both engines compute the same
    * double truncating division).
    */
  private[graft] val PrReQ = 1024L

  def all: Seq[GraftQuery] = {

    /* L108: dominant principal component by power iteration — the
     * anisotropy audit. One corpus pass builds the exact integer Gram
     * matrix with the native `graft_gram` TypedImperativeAggregate
     * (per-vector quantize + outer-product accumulate into a Dims²
     * Long buffer; map-side combined, so the only thing crossing the
     * wire is one 32 KB buffer per partition — no row-multiplicative
     * explode, no self-join, no all-pairs). Three power-iteration
     * steps then run ON THE DRIVER over the collected matrix —
     * 32 KB of codebook-sized state, the refineCodebook stance:
     * w = G·v, v' = floor(w·2^7 / max|w|) — every iterate an exact
     * integer vector (Scala Long division truncates toward zero
     * exactly like Spark `div` / DuckDB `//`), so a single flipped
     * bit anywhere in the chain diverges the gate. The output
     * reports, per dimension:
     * the damped Gram diagonal, all three iterates, the final matvec,
     * and (broadcast onto every row) the Rayleigh quotient of the
     * last iterate plus its share of the total variance (rq ≤ trace
     * for a PSD Gram; var_ppm is the anisotropy number). At 100 TB:
     * the corpus pass is the whole cost and it is one map-side-
     * combined aggregate; everything after runs on kilobytes. */
    val q176 = GraftQuery(
      "q176_dominant_component", "L108 L76 L46",
      (s, d) => {
        // one corpus pass: the native graft_gram aggregate quantizes
        // each component (floor(v·10^6), bit-identical to the cast+
        // floor column form) and accumulates the Dims² outer product
        // into its buffer — nothing row-multiplicative ever
        // materializes (the declarative two-posexplode form pushed
        // |corpus|·Dims² rows into the aggregate; measured 32 s of
        // the q176 wall at sf0.1, ~1 s native)
        val gramRow = Tables.embeddings(s, d)
          .agg(expr(s"graft_gram(embedding, $Dims, $CompQ)").as("g"),
            count(lit(1)).as("n"))
          .select(col("g"), col("n")).head()
        val n = gramRow.getLong(1)
        val raw = gramRow.getSeq[Long](0)
        // everything after the corpus pass runs on the collected
        // 32 KB matrix ON THE DRIVER (the refineCodebook codebook-
        // sized-state stance): Dims-row matvecs as Spark jobs cost
        // ~100 ms of scheduling each and the iterate cross-references
        // grow the logical plan exponentially (measured: 470 KB plan,
        // 104 broadcasts, 2.7 s; driver math ≈ corpus-pass wall).
        // Scala Long `/` truncates toward zero exactly like Spark
        // `div` and DuckDB `//`, so every iterate stays engine-exact.
        val gn = Array.tabulate(Dims * Dims)(k => raw(k) / (n * GramDamp))
        def matvecA(v: Array[Long]): Array[Long] =
          Array.tabulate(Dims) { i =>
            var acc = 0L
            var j = 0
            while (j < Dims) { acc += gn(i * Dims + j) * v(j); j += 1 }
            acc
          }
        def renormA(w: Array[Long]): Array[Long] = {
          val m = math.max(w.map(math.abs).max, 1L)
          w.map(x => x * VQ / m)
        }
        val iterates = (1 to PowerIters)
          .scanLeft(Array.fill(Dims)(VQ)) { (v, _) => renormA(matvecA(v)) }
          .tail // v1, v2, v3
        val v3 = iterates.last
        val w4 = matvecA(v3)
        val num = (0 until Dims).map(i => v3(i) * w4(i)).sum
        val den = (0 until Dims).map(i => v3(i) * v3(i)).sum
        val rq = num / math.max(den, 1L)
        val traceQ = (0 until Dims).map(i => gn(i * Dims + i)).sum
        val varPpm = rq * 1000000L / math.max(traceQ, 1L)
        import s.implicits._
        (0 until Dims).map { i =>
          (i + 1L, gn(i * Dims + i), iterates(0)(i), iterates(1)(i),
            iterates(2)(i), w4(i), rq, traceQ, varPpm)
        }.toDF("pos", "g_diag", "v1", "v2", "v3", "w4", "rq",
          "trace_q", "var_ppm")
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

    /* L131: effective rank by participation ratio — the whole-spectrum
     * companion to q176's dominant-eigenvalue share: PR = trace(G)² /
     * trace(G²) = (Σλ)²/Σλ² counts how many dimensions the embedding
     * corpus ACTUALLY uses (64 for isotropic, →1 as one direction eats
     * the variance) WITHOUT computing any eigenvector — for a
     * symmetric G, trace(G²) is just Σ_ij G_ij², so both numbers fall
     * out of the same Gram cells the q176 pass already produces. Per
     * LABEL, because per-class collapse (one class's vectors bunching
     * onto a line) is invisible in the global number. The ladder:
     * m = (raw div (n·GramDamp)) div 2^10 (the PrReQ bound keeps both
     * squares Long-safe at any corpus size), pr_q10 = trace(m)²·2^10
     * div max(Σm², 1), eff_rank_ppm = pr_q10·10^6 div (Dims·2^10).
     * At 100 TB: one map-side-combined graft_gram pass per label (the
     * 32 KB-buffer shape), then pure column math on 4096·|labels|
     * posexploded cells — no driver collect, no iteration. */
    val q199 = GraftQuery(
      "q199_effective_rank", "L131 L108 L46",
      (s, d) => {
        val g = Tables.embeddings(s, d).groupBy(col("label"))
          .agg(expr(s"graft_gram(embedding, $Dims, $CompQ)").as("g"),
            count(lit(1)).as("n"))
        g.select(col("label"), col("n"),
            posexplode(col("g")).as(Seq("k", "raw")))
          .withColumn("m",
            expr(s"(raw div (n * $GramDamp)) div $PrReQ"))
          .withColumn("isdiag", expr(s"(k div $Dims) = (k % $Dims)"))
          .groupBy(col("label"), col("n"))
          .agg(sum(when(col("isdiag"), col("m")).otherwise(0L))
            .as("trace_m"),
            sum(col("m") * col("m")).as("frob_m"))
          .withColumn("pr_q10",
            expr(s"(trace_m * trace_m * $PrReQ) div greatest(frob_m, 1)"))
          .withColumn("eff_rank_ppm",
            expr(s"(pr_q10 * 1000000) div ${Dims * PrReQ}"))
          .select(col("label"), col("n").as("n_vectors"), col("trace_m"),
            col("frob_m"), col("pr_q10"), col("eff_rank_ppm"))
          .orderBy(col("label"))
      },
      Some {
        val qa = s"CAST(floor(CAST(embedding[a.i] AS DOUBLE) * $CompQ)" +
          " AS BIGINT)"
        val qb = s"CAST(floor(CAST(embedding[b.j] AS DOUBLE) * $CompQ)" +
          " AS BIGINT)"
        s"""WITH nl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n
              FROM embeddings GROUP BY 1),
          g AS MATERIALIZED (SELECT e.label, a.i, b.j,
              (CAST(SUM($qa * $qb) AS BIGINT)
                // (nl.n * $GramDamp)) // $PrReQ AS m
            FROM embeddings e JOIN nl ON nl.label = e.label,
              generate_series(1, $Dims) a(i),
              generate_series(1, $Dims) b(j)
            GROUP BY 1, 2, 3, nl.n),
          ag AS (SELECT label,
              CAST(SUM(CASE WHEN i = j THEN m ELSE 0 END) AS BIGINT)
                AS trace_m,
              CAST(SUM(m * m) AS BIGINT) AS frob_m
            FROM g GROUP BY 1),
          pr AS (SELECT *, (trace_m * trace_m * $PrReQ)
              // GREATEST(frob_m, 1) AS pr_q10
            FROM ag)
          SELECT pr.label, nl.n AS n_vectors, trace_m, frob_m, pr_q10,
            (pr_q10 * 1000000) // ${Dims * PrReQ} AS eff_rank_ppm
          FROM pr JOIN nl ON nl.label = pr.label ORDER BY pr.label"""
      })

    Seq(q176, q199)
  }
}
