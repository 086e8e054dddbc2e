package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{Sketches, TextFunctions}

/** Training-order governance operators (SURVEY §2.11a, L98–L100):
  *
  *  - L98 deterministic epoch shuffle (Feistel permutation) → q166
  *  - L99 curriculum stage assignment                       → q167
  *  - L100 preference-pair mining                           → q168
  *
  * The operators that decide the ORDER training examples are seen in:
  * a seedable, coordination-free permutation for epoch shuffling (no
  * global sort, no shuffle service state — position is a pure function
  * of (doc, epoch)), quality-quantile curriculum staging, and mining
  * (chosen, rejected) pairs for preference tuning.
  */
object CurriculumOps {

  /** L98 Feistel geometry: the permutation domain is 2^20 positions
    * split into two 10-bit halves, 3 rounds. The gated corpora's
    * doc_ids all sit below 2^20; at production the domain is the next
    * even power of two above max(doc index) (the construction is
    * width-generic: only HalfBits changes) — a Feistel network over
    * 2·HalfBits bits is a bijection for ANY round function, so distinct
    * docs can never collide at any width.
    */
  private[queries] val HalfBits = 10
  private[queries] val HalfMask = (1L << HalfBits) - 1 // 1023
  private[queries] val FeistelRounds = 3
  private[queries] val Shards = 16

  /** L111 HRW widths: the gate reshards 16 → 17 and proves minimal
    * movement (every relocated doc lands on the new shard).
    */
  private[queries] val HrwOldShards = 16L
  private[queries] val HrwNewShards = 17L

  /** L99/L100 quality scale (µ-units) and dials. */
  private[graft] val CurriculumStages = 4
  private[queries] val PrefMinGapU = 50000L // 0.05 quality gap
  private[queries] val PrefBucketChars = 128L

  /** L99's per-doc staging frame (doc_id, text, q_u, toks) — factored
    * so the L156 sketched form (q224) consumes the REGISTERED quality
    * and token ladders, not a copy.
    */
  private[graft] def stageBase(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .withColumn("q_u",
        floor(TextFunctions.qualityScoreColumn(col("text")) * lit(1e6)))
      .withColumn("toks",
        TextFunctions.tokenCountBpeIsh(col("text")).cast("long"))

  /** DuckDB twin of [[stageBase]] as a CTE `sq(doc_id, q_u, toks)`. */
  private[queries] def stageBaseCtesSql: String = {
    val quality = TextFunctions.qualityScoreSql("text")
    val toks = TextFunctions.tokenCountBpeIshSql("text")
    s"""sq AS (SELECT doc_id,
          CAST(floor(($quality) * 1000000) AS BIGINT) AS q_u,
          CAST($toks AS BIGINT) AS toks
        FROM documents)"""
  }

  /** Feistel position of `doc_id` for `epoch` — L' = R,
    * R' = L xor (h64("fe:epoch:round:" || R) & HalfMask), 3 rounds;
    * pos = L·2^HalfBits + R. Pure column math, no state, no shuffle.
    */
  private[graft] def feistelPos(epoch: Int): Column = {
    var l: Column = expr(s"doc_id div ${HalfMask + 1}")
    var r: Column = expr(s"doc_id % ${HalfMask + 1}")
    for (round <- 1 to FeistelRounds) {
      val f = Sketches.h64(concat(lit(s"fe:$epoch:$round:"),
        r.cast("string"))).bitwiseAND(lit(HalfMask))
      val t = r; r = l.bitwiseXOR(f); l = t
    }
    l * lit(HalfMask + 1) + r
  }

  /** DuckDB twin of [[feistelPos]] for epochs 0 and 1, as CTEs ending
    * in `pp(doc_id, pos0, pos1)` — factored so every consumer (q166's
    * gate, q180's diversity audit) measures the SAME permutation: f0
    * holds both epochs' (l, r) halves, each round CTE rewrites both
    * epochs' halves once.
    */
  private[queries] def feistelCtesSql: String = {
    val f0 = s"""f0 AS (SELECT doc_id,
        doc_id // ${HalfMask + 1} AS l_a, doc_id % ${HalfMask + 1} AS r_a,
        doc_id // ${HalfMask + 1} AS l_b, doc_id % ${HalfMask + 1} AS r_b
      FROM documents)"""
    val rounds = (1 to FeistelRounds).map { k =>
      val ha = Sketches.h64Sql(s"'fe:0:$k:' || r_a")
      val hb = Sketches.h64Sql(s"'fe:1:$k:' || r_b")
      s"""f$k AS (SELECT doc_id,
          r_a AS l_a, xor(l_a, ($ha & $HalfMask)) AS r_a,
          r_b AS l_b, xor(l_b, ($hb & $HalfMask)) AS r_b
        FROM f${k - 1})"""
    }.mkString(",\n          ")
    s"""$f0,
      $rounds,
      pp AS (SELECT doc_id,
          l_a * ${HalfMask + 1} + r_a AS pos0,
          l_b * ${HalfMask + 1} + r_b AS pos1
        FROM f$FeistelRounds)"""
  }

  def all: Seq[GraftQuery] = {

    /* L98: deterministic epoch shuffle — training-order randomization
     * WITHOUT a global sort: position(doc, epoch) is a 3-round Feistel
     * permutation of the doc index over a 2^20 domain, so any worker
     * can compute any doc's position independently (resume, preemption
     * and multi-epoch scheduling all become pure functions). The gate
     * proves, per (epoch, shard = pos mod 16): the doc count, that
     * positions are DISTINCT (sum over shards = n docs — injectivity,
     * i.e. no two docs ever collide on a position), the position range,
     * a position-assignment checksum (hashing (doc_id, pos) pairs — a
     * single flipped bit in any round function diverges), and how many
     * docs LEFT the shard between epochs (the decorrelation evidence —
     * a broken epoch salt would pin n_moved at 0). At 100 TB: map-side
     * column math + one 32-row aggregate; no shuffle beyond the
     * group-by on (epoch, shard). */
    val q166 = GraftQuery(
      "q166_feistel_epoch_shuffle", "L98 L30",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"))
          .withColumn("pos0", feistelPos(0))
          .withColumn("pos1", feistelPos(1))
        val epochs = base.select(lit(0L).as("epoch"), col("doc_id"),
            col("pos0").as("pos"), col("pos1").as("other"))
          .unionByName(base.select(lit(1L).as("epoch"), col("doc_id"),
            col("pos1").as("pos"), col("pos0").as("other")))
        epochs
          .groupBy(col("epoch"),
            col("pos").bitwiseAND(lit(Shards - 1L)).as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            count_distinct(col("pos")).as("n_pos_distinct"),
            min(col("pos")).as("pos_min"),
            max(col("pos")).as("pos_max"),
            sum(Sketches.h64(concat(col("doc_id"), lit(":"), col("pos")))
              % lit(1000003L)).as("checksum"),
            sum(when(col("pos").bitwiseAND(lit(Shards - 1L)) =!=
              col("other").bitwiseAND(lit(Shards - 1L)), 1L).otherwise(0L))
              .as("n_moved"))
          .orderBy(col("epoch"), col("shard"))
      },
      Some {
        val ck = Sketches.h64Sql("doc_id || ':' || pos")
        s"""WITH $feistelCtesSql,
          ep AS (SELECT CAST(0 AS BIGINT) AS epoch, doc_id,
              pos0 AS pos, pos1 AS other FROM pp
            UNION ALL SELECT CAST(1 AS BIGINT), doc_id, pos1, pos0 FROM pp)
          SELECT epoch, pos & ${Shards - 1} AS shard,
            COUNT(*) AS n_docs,
            CAST(COUNT(DISTINCT pos) AS BIGINT) AS n_pos_distinct,
            CAST(MIN(pos) AS BIGINT) AS pos_min,
            CAST(MAX(pos) AS BIGINT) AS pos_max,
            CAST(SUM($ck % 1000003) AS BIGINT) AS checksum,
            CAST(SUM(CASE WHEN (pos & ${Shards - 1}) <>
              (other & ${Shards - 1}) THEN 1 ELSE 0 END) AS BIGINT)
              AS n_moved
          FROM ep GROUP BY 1, 2 ORDER BY epoch, shard"""
      })

    /* L99: curriculum stage assignment — order the corpus by the L9
     * quality signal and cut it into 4 equal-population stages
     * (easy→hard scheduling); report each stage's population, quality
     * range, token budget (BPE-ish counts — what the stage COSTS to
     * train on) and a membership checksum. Monotone non-overlapping
     * quality ranges are by construction of the ntile — the gate
     * catches a broken cut or tie-handling divergence as a range or
     * checksum mismatch. The global ntile is the oracle-exact form; the
     * 100 TB path is REGISTERED as q224 (L156 — cuts from the L59
     * bottom-k sketch, assignment a map-side comparison against 3
     * broadcast cut points, spec-pinned equal to this query at the
     * gated fixtures) and its degradation at small k is priced by
     * q230. */
    val q167 = GraftQuery(
      "q167_curriculum_stages", "L99 L9 L30",
      (s, d) => {
        val q = stageBase(s, d)
          .withColumn("stage", ntile(CurriculumStages).over(
            Window.orderBy(col("q_u"), col("doc_id"))).cast("long"))
        q.groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("q_u")).as("q_min"),
            max(col("q_u")).as("q_max"),
            sum(col("toks")).as("token_budget"),
            sum(Sketches.h64(concat(col("doc_id"), lit("@"), col("stage")))
              % lit(1000003L)).as("member_checksum"))
          .orderBy(col("stage"))
      },
      Some {
        val ck = Sketches.h64Sql("doc_id || '@' || stage")
        s"""WITH $stageBaseCtesSql,
          st AS (SELECT doc_id, q_u, toks,
              CAST(ntile($CurriculumStages) OVER
                (ORDER BY q_u, doc_id) AS BIGINT) AS stage
            FROM sq)
          SELECT stage, COUNT(*) AS n_docs,
            CAST(MIN(q_u) AS BIGINT) AS q_min,
            CAST(MAX(q_u) AS BIGINT) AS q_max,
            CAST(SUM(toks) AS BIGINT) AS token_budget,
            CAST(SUM($ck % 1000003) AS BIGINT) AS member_checksum
          FROM st GROUP BY 1 ORDER BY stage"""
      })

    /* L100: preference-pair mining — build (chosen, rejected) document
     * pairs for preference tuning from quality extremes WITHIN a
     * matched stratum (same source, same length bucket — so the pair
     * differs in quality, not in topic or length): chosen = the
     * stratum's quality argmax, rejected = its argmin (both
     * deterministically tie-broken by doc_id), emitted only when the
     * stratum has ≥ 2 docs and the quality gap clears 0.05 — a pair
     * whose sides are indistinguishable teaches nothing. At 100 TB:
     * two row_number windows per stratum key (thousands of strata →
     * well-distributed partitions), one count aggregate, a three-way
     * broadcastable join on the stratum key. */
    val q168 = GraftQuery(
      "q168_preference_pairs", "L100 L9 L18",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            least(expr(s"n_chars div $PrefBucketChars"), lit(7L)).as("bkt"),
            floor(TextFunctions.qualityScoreColumn(col("text")) * lit(1e6))
              .as("q_u"))
        val part = Window.partitionBy(col("source"), col("bkt"))
        val w = docs
          .withColumn("rb", row_number().over(
            part.orderBy(col("q_u").desc, col("doc_id"))))
          .withColumn("rw", row_number().over(
            part.orderBy(col("q_u").asc, col("doc_id"))))
        val best = w.filter(col("rb") === 1).select(col("source"), col("bkt"),
          col("doc_id").as("chosen_id"), col("q_u").as("q_chosen"))
        val worst = w.filter(col("rw") === 1).select(col("source"), col("bkt"),
          col("doc_id").as("rejected_id"), col("q_u").as("q_rejected"))
        val cnt = docs.groupBy(col("source"), col("bkt"))
          .agg(count(lit(1)).as("n_cands"))
        best.join(worst, Seq("source", "bkt"))
          .join(cnt, Seq("source", "bkt"))
          .filter(col("n_cands") >= 2 &&
            col("q_chosen") - col("q_rejected") >= PrefMinGapU)
          .select(col("source"), col("bkt"), col("n_cands"),
            col("chosen_id"), col("rejected_id"),
            col("q_chosen"), col("q_rejected"),
            (col("q_chosen") - col("q_rejected")).as("gap_u"))
          .orderBy(col("source"), col("bkt"))
      },
      Some {
        val quality = TextFunctions.qualityScoreSql("text")
        s"""WITH dq AS (SELECT doc_id, source,
              LEAST(n_chars // $PrefBucketChars, 7) AS bkt,
              CAST(floor(($quality) * 1000000) AS BIGINT) AS q_u
            FROM documents),
          w AS (SELECT *,
              row_number() OVER (PARTITION BY source, bkt
                ORDER BY q_u DESC, doc_id) AS rb,
              row_number() OVER (PARTITION BY source, bkt
                ORDER BY q_u ASC, doc_id) AS rw
            FROM dq),
          best AS (SELECT source, bkt, doc_id AS chosen_id,
              q_u AS q_chosen FROM w WHERE rb = 1),
          worst AS (SELECT source, bkt, doc_id AS rejected_id,
              q_u AS q_rejected FROM w WHERE rw = 1),
          cnt AS (SELECT source, bkt, COUNT(*) AS n_cands
            FROM dq GROUP BY 1, 2)
          SELECT best.source, best.bkt, cnt.n_cands, chosen_id, rejected_id,
            q_chosen, q_rejected, q_chosen - q_rejected AS gap_u
          FROM best
            JOIN worst ON worst.source = best.source AND worst.bkt = best.bkt
            JOIN cnt ON cnt.source = best.source AND cnt.bkt = best.bkt
          WHERE cnt.n_cands >= 2 AND q_chosen - q_rejected >= $PrefMinGapU
          ORDER BY best.source, best.bkt"""
      })

    /* L111: rendezvous (highest-random-weight) shard routing — the
     * OTHER deterministic placement primitive next to L98's Feistel:
     * where Feistel permutes a FIXED domain, HRW answers "which shard
     * owns this doc" under a CHANGING shard count with provably minimal
     * movement — shard(doc, W) = argmax over s < W of h64("hrw:"‖s‖":"‖
     * doc), so adding shard W only relocates the docs the NEW shard
     * wins (expected n/(W+1)) and every relocated doc lands ON the new
     * shard (no old→old churn — the property that makes resharding a
     * 100 TB corpus store an append, not a rewrite). The gate computes
     * the assignment at 16 and 17 shards from ONE hash frame, reports
     * per (width, shard): population, how many docs ARRIVED relative to
     * the 16-shard layout, and a moved-doc checksum — minimality is
     * visible in the gated values (n_arrived ≡ 0 everywhere except the
     * new shard) and spec-asserted. The argmax is a row_number window
     * partitioned by doc (W rows each — ties impossible to matter:
     * h DESC then s is a total order). At 100 TB: pure map-side hash
     * math per doc (production evaluates the argmax as a single
     * expression over W candidates; the explode form is the oracle-
     * clear shape) + one 33-row aggregate. */
    val q179 = GraftQuery(
      "q179_rendezvous_routing", "L111 L98 L81",
      (s, d) => {
        val cand = Tables.documents(s, d).select(col("doc_id"))
          .select(col("doc_id"),
            explode(sequence(lit(0L), lit(HrwNewShards - 1L))).as("s"))
          .withColumn("h", Sketches.h64(concat(lit("hrw:"), col("s"),
            lit(":"), col("doc_id"))))
        def assign(w: Long, name: String) = cand.filter(col("s") < w)
          .withColumn("rn", row_number().over(Window
            .partitionBy(col("doc_id"))
            .orderBy(col("h").desc, col("s"))))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("s").as(name))
        val j = assign(HrwOldShards, "shard16")
          .join(assign(HrwNewShards, "shard17"), Seq("doc_id"))
        val mvck = Sketches.h64(concat(lit("mv:"),
          col("doc_id").cast("string"))) % lit(1000003L)
        val w16 = j.groupBy(col("shard16").as("shard"))
          .agg(count(lit(1)).as("n_docs"))
          .select(lit(HrwOldShards).as("width"), col("shard"),
            col("n_docs"), lit(0L).as("n_arrived"),
            lit(0L).as("moved_checksum"))
        val w17 = j.groupBy(col("shard17").as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("shard17") =!= col("shard16"), 1L).otherwise(0L))
              .as("n_arrived"),
            sum(when(col("shard17") =!= col("shard16"), mvck)
              .otherwise(0L)).as("moved_checksum"))
          .select(lit(HrwNewShards).as("width"), col("shard"),
            col("n_docs"), col("n_arrived"), col("moved_checksum"))
        w16.unionByName(w17).orderBy(col("width"), col("shard"))
      },
      Some {
        val h = Sketches.h64Sql("'hrw:' || s || ':' || doc_id")
        val mvck = s"${Sketches.h64Sql("'mv:' || doc_id")} % 1000003"
        def assignSql(w: Long, name: String) =
          s"""$name AS (SELECT doc_id, s FROM (
              SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
                ORDER BY h DESC, s) AS rn
              FROM c WHERE s < $w) WHERE rn = 1)"""
        s"""WITH c AS (SELECT doc_id, s, $h AS h
            FROM documents, generate_series(0, ${HrwNewShards - 1}) t(s)),
          ${assignSql(HrwOldShards, "a16")},
          ${assignSql(HrwNewShards, "a17")},
          j AS (SELECT a16.doc_id, a16.s AS shard16, a17.s AS shard17
            FROM a16 JOIN a17 ON a17.doc_id = a16.doc_id)
          SELECT CAST($HrwOldShards AS BIGINT) AS width,
            shard16 AS shard, COUNT(*) AS n_docs,
            CAST(0 AS BIGINT) AS n_arrived,
            CAST(0 AS BIGINT) AS moved_checksum
          FROM j GROUP BY 2
          UNION ALL
          SELECT CAST($HrwNewShards AS BIGINT), shard17, COUNT(*),
            CAST(SUM(CASE WHEN shard17 <> shard16 THEN 1 ELSE 0 END)
              AS BIGINT),
            CAST(SUM(CASE WHEN shard17 <> shard16 THEN $mvck ELSE 0 END)
              AS BIGINT)
          FROM j GROUP BY 2
          ORDER BY width, shard"""
      })

    /* L112: shard-mix diversity audit (Simpson effective source count)
     * — does the L98 epoch shuffle actually MIX? A shard whose docs all
     * come from one source trains on correlated batches no matter how
     * random the order looks; the governance number is the effective
     * number of sources per shard, eff = T² / Σ_src n_src² (the
     * inverse Simpson index: 1 when source-pure, |sources| under a
     * perfect mix), exact in ppm. Computed per (epoch, shard) over the
     * REGISTERED permutation (the shared feistelPos kernel — one
     * source of truth with q166), so a broken round function shows up
     * here as collapsed diversity. At 100 TB: one (epoch, shard,
     * source) map-side-combined aggregate (|shards|·|sources| rows) and
     * a 32-row reduce; the T²·10^6 product is Long-safe to T ≈ 3·10^6
     * docs/shard — beyond that the ppm rescale moves after a
     * per-source-share division (same stance as q177's AUC unit). */
    val q180 = GraftQuery(
      "q180_shard_diversity", "L112 L98 L30",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"),
            col("source"))
          .withColumn("pos0", feistelPos(0))
          .withColumn("pos1", feistelPos(1))
        val ep = base.select(lit(0L).as("epoch"), col("source"),
            col("pos0").bitwiseAND(lit(Shards - 1L)).as("shard"))
          .unionByName(base.select(lit(1L).as("epoch"), col("source"),
            col("pos1").bitwiseAND(lit(Shards - 1L)).as("shard")))
        ep.groupBy(col("epoch"), col("shard"), col("source"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("epoch"), col("shard"))
          .agg(sum(col("n")).as("t"),
            count(lit(1)).as("n_sources"),
            sum(col("n") * col("n")).as("sq"))
          .withColumn("eff_ppm",
            expr("(t * t * 1000000) div sq"))
          .orderBy(col("epoch"), col("shard"))
      },
      Some {
        s"""WITH $feistelCtesSql,
          ep AS (SELECT CAST(0 AS BIGINT) AS epoch, d.source,
              pp.pos0 & ${Shards - 1} AS shard
            FROM pp JOIN documents d ON d.doc_id = pp.doc_id
            UNION ALL
            SELECT CAST(1 AS BIGINT), d.source, pp.pos1 & ${Shards - 1}
            FROM pp JOIN documents d ON d.doc_id = pp.doc_id),
          g AS (SELECT epoch, shard, source, COUNT(*) AS n
            FROM ep GROUP BY 1, 2, 3)
          SELECT epoch, shard, CAST(SUM(n) AS BIGINT) AS t,
            CAST(COUNT(*) AS BIGINT) AS n_sources,
            CAST(SUM(n * n) AS BIGINT) AS sq,
            (CAST(SUM(n) AS BIGINT) * CAST(SUM(n) AS BIGINT) * 1000000)
              // CAST(SUM(n * n) AS BIGINT) AS eff_ppm
          FROM g GROUP BY 1, 2 ORDER BY epoch, shard"""
      })

    Seq(q166, q167, q168, q179, q180)
  }
}
