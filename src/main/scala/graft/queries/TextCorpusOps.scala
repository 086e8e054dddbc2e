package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Sketches, Skew, TextFunctions}

/** Text-corpus engineering operators (SURVEY §2.11a, L50–L53,
  * L55–L57, L59, L61–L63, L65–L71): tokenizer economics,
  * distributional drift, filter governance, contrastive selection, the
  * fingerprinting family beyond fixed windows, and the sketch tier's
  * frequency/cardinality/sampling legs.
  *
  *  - L50 tokenizer fertility profile                          → q115
  *  - L51 term-distribution divergence (total variation)       → q116
  *  - L52 winnowing fingerprint selection (MOSS)               → q117
  *  - L53 content-defined chunking dedup (CDC)                 → q118
  *  - L55 chunk-containment detection (sub/superstring pairs)  → q120
  *  - L56 filter-ensemble overlap matrix                       → q121
  *  - L57 dedup cluster-size histogram                         → q122
  *  - L59 sketched quantile profile (bottom-k sample UDAF)     → q124
  *  - L61 edit-distance near-dup verify (banded candidates)    → q126
  *  - L62 adversarial-unicode hygiene (zero-width/homoglyph)   → q127
  *  - L63 integer-log perplexity proxy (Zipf surprise)         → q128
  *  - L65 Moore–Lewis cross-entropy-difference selection       → q132
  *  - L66 duplicate-chunk removal + reassembly                 → q133
  *  - L67 count-min frequency sketch (measured overshoot)      → q134
  *  - L68 approximate heavy hitters (rank displacement)        → q135
  *  - L69 HyperLogLog cardinality sketch (measured bias)       → q137
  *  - L70 bottom-k (KMV) sample + distinct estimate            → q138
  *  - L71 BPE merge step (tokenizer-training kernel)          → q139
  *
  * (L54, the PQ asymmetric-distance search, lives with its encode twin
  * in [[CorpusOps]] — q119.)
  */
object TextCorpusOps {

  import LlmPipeline.HotBucketCap

  /** Winnowing window: each run of `WinnowW` consecutive shingle hashes
    * contributes its minimum — guarantees any shared run of
    * WinnowW + ShingleN − 1 words is detected (Schleimer et al.).
    */
  private[queries] val WinnowW = 4

  /** CDC boundary divisor: a word position ends a chunk when the 3-gram
    * hash starting there ≡ 0 (mod this) — expected chunk length 16 words.
    */
  private[queries] val CdcMod = 16L

  /** Containment report floor (ppm of the contained doc's chunks). */
  private[queries] val ContainPpm = 600000L

  /** Shared CDC chunk frame `(doc_id, chunk_id, cfp, n_w, chunk_text)` —
    * one codegen'd `graft_cdc_chunks` map pass per document (r19
    * optimization; CdcChunksExpressionSpec pins it to the old
    * posexplode+window construction bit-for-bit). Used by q118 and q133.
    */
  private[queries] def cdcChunkRows(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"),
        explode(call_function("graft_cdc_chunks", col("text"), lit(CdcMod)))
          .as("c"))
      .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
        col("c.cfp").as("cfp"), col("c.n_w").as("n_w"),
        col("c.chunk_text").as("chunk_text"))

  /** L62's homoglyph fold table (Cyrillic lookalikes → Latin) and the
    * planted adversarial prefix — ONE Scala value interpolated into both
    * the engine Columns and the oracle SQL, so the two sides can never
    * disagree on the byte sequence (U+200B/U+FEFF zero-widths,
    * U+0430/0435/043E Cyrillic а/е/о, plus an unfolded U+043F п that
    * must survive the scrub).
    */
  private[queries] val HomoglyphFold: Seq[(String, String)] =
    Seq("\u0430" -> "a", "\u0435" -> "e", "\u043E" -> "o",
      "\u0440" -> "p")
  private[queries] val AdversarialPrefix: String =
    "z\u200Bw\uFEFF \u043F\u0430ge h\u0435r\u043E "

  /** L65 fixture: the planted off-domain marker block (six marker words
    * \u00D7 8 repeats = 48 tokens), ONE Scala value interpolated into both
    * the engine Column and the oracle SQL so the byte sequences cannot
    * diverge. Six distinct markers can never outrank the fixture's 31
    * base words in the pool model (rank 32..37, ladder bucket 5) and
    * never enter the seed model at all (OOV, surprise 9) \u2014 the +4-bit
    * per-marker contrast that fires the drop branch at every SF.
    */
  private[queries] val OodMarkerBlock: String = {
    val ms = Seq("lemma", "proof", "qed", "axiom", "corollary", "torus")
    Seq.fill(8)(ms).flatten.mkString(" ")
  }

  /** L65 dials: model width (\u2265 37 so markers stay IN the pool model)
    * and the keep ceiling on the +10-shifted mean surprise difference \u2014
    * 10e6 is neutral; original docs stay within ~0.9 bit of neutral
    * (rank-boundary flips between the two models), planted marker docs
    * score \u2265 +4 per marker word (\u2265 11.4e6 even for the longest
    * fixtures), and the ceiling sits in the gap.
    */
  private[queries] val MooreLewisVocab = 64
  private[queries] val MooreLewisKeepQppm = 11100000L

  /** L67 dials: 2 rows × 32 cells for the registered query — the
    * fixture's ~31-word vocabulary deliberately overloads the rows so
    * collision overshoot is measurable at every SF (production sizes
    * width ≈ e/ε for additive error ε·N, the same log2-width scaling
    * stance as [[CorpusOps.bloomBitsFor]]). Absent probes are planted
    * so the pure-collision-mass branch fires deterministically.
    */
  private[graft] val CmsWidthLog2 = 5
  private[graft] val CmsDepth = 2
  private[queries] val CmsAbsentProbes =
    Seq("zzqabsent1", "zzqabsent2", "zzqabsent3", "zzqabsent4")

  /** L68: heavy-hitter report depth (top-K by estimate). */
  private[queries] val HeavyK = 16

  /** HLL geometry (L69): m = 2^6 registers over the 60-bit portable hash
    * — top 6 bits pick the register, the remaining 54 carry the
    * leading-zero rank, capped at 30 so Σ 2^(cap−rho) stays far inside
    * int64 (≤ 64·2^30 = 2^36) and the alpha·m²·2^cap numerator
    * (0.709·4096·2^30, exact below) fits in one BIGINT literal both
    * engines divide identically. m = 64 keeps the fixture shingle loads
    * (thousands of distinct shingles per source — hundreds per register)
    * in the raw estimator's calibrated range; the measured zero-register
    * column is the switch signal a production profile would use for the
    * linear-counting regime.
    */
  private[graft] val HllM = 64
  private[graft] val HllRemBits = 54
  private[graft] val HllRemMask = (1L << HllRemBits) - 1
  private[graft] val HllRhoCap = 30
  private[graft] val HllNumerator: Long = 709L * HllM * HllM * (1L << 30)

  /** Planner-grade HLL geometry (L154, VERDICT r17 #2): p = 8 → m = 256
    * registers over the same 60-bit hash (top 8 bits address, 52 carry
    * the rank). The q222 sizing input at the small fixtures (n = 500)
    * sits squarely in the LINEAR-COUNTING regime at this m (V ≈ 37 zero
    * registers), where the corrected estimator reads m·ln(m/V) ≈ 495 —
    * the raw m = 64 estimator had no zero registers there at all, so no
    * correction could fire and the measured ~146k ppm bias was
    * structural, not fixable by a branch. At sf0.1 (n ≈ 5k) the raw
    * regime resumes with RSE 1.04/√256 ≈ 6.5% (vs 13% at m = 64).
    * alpha(256) = 0.7213/(1 + 1.079/256) → 718 per-mille.
    */
  private[graft] val Hll256M = 256
  private[graft] val Hll256RemBits = 52
  private[graft] val Hll256RemMask = (1L << Hll256RemBits) - 1
  private[graft] val Hll256Numerator: Long =
    718L * Hll256M * Hll256M * (1L << HllRhoCap)

  /** ln 2 in Q10 fixed point (⌈0.693147·1024⌉ = 710): the scale that
    * turns the log2q10 ladder into natural logs for the linear-counting
    * branch — m·ln(m/V) = (m·(log2q10(m) − log2q10(V))·710) >> 20, every
    * intermediate an exact integer both engines compute bit-identically
    * (≤ 256·8192·710 < 2^31). Ladder error budget: ≤ 0.0861 bits from
    * the mantissa-linear log2q10 plus 3.1e-4 relative from the rounded
    * ln 2 — ~6% worst-case on the correction, far under the raw
    * estimator's small-range bias this branch removes.
    */
  private[graft] val HllLn2Q10 = 710L

  /** The register/rank derivation as Columns — ONE expression shared by
    * the batch operator (q137) and the streaming form
    * ([[graft.streaming.StreamingCardinality]]), so stream==batch holds
    * by construction of the per-row math. The precision-parameterized
    * forms serve the m = 256 planner geometry (q222).
    */
  private[graft] def hllRegP(h: org.apache.spark.sql.Column, remBits: Int)
      : org.apache.spark.sql.Column = shiftright(h, remBits)

  private[graft] def hllRhoCP(h: org.apache.spark.sql.Column, remBits: Int)
      : org.apache.spark.sql.Column = {
    val mask = (1L << remBits) - 1
    least(
      when(h.bitwiseAND(lit(mask)) === 0, lit(remBits + 1))
        .otherwise(lit(remBits + 1) -
          length(bin(h.bitwiseAND(lit(mask))))),
      lit(HllRhoCap)).cast("long")
  }

  private[graft] def hllReg(h: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = hllRegP(h, HllRemBits)

  private[graft] def hllRhoC(h: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = hllRhoCP(h, HllRemBits)

  /** Linear-counting estimate m·ln(m/V) on the integer ladder, as a
    * Column over the zero-register count V ∈ [1, m] (m a power of two,
    * so log2q10(m) is the exact p·1024). Callers gate on the switch
    * condition — V > 0 AND 2·raw ≤ 5·m (Flajolet et al.'s small-range
    * threshold) — via [[hllLcUsed]].
    */
  private[graft] def hllLcCol(m: Int, v: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val p = java.lang.Integer.numberOfTrailingZeros(m).toLong
    shiftright(
      lit(m.toLong) * (lit(p * 1024L) - Sketches.log2q10(v)) *
        lit(HllLn2Q10), 20)
  }

  /** DuckDB twin of [[hllLcCol]]. */
  private[graft] def hllLcSql(m: Int, v: String): String = {
    val p = java.lang.Integer.numberOfTrailingZeros(m).toLong
    s"(($m * (${p * 1024L} - ${Sketches.log2q10Sql(v)}) * $HllLn2Q10) >> 20)"
  }

  /** JVM twin of [[hllLcCol]] for spec replays and streaming readouts. */
  private[graft] def hllLcScala(m: Int, v: Long): Long = {
    val p = java.lang.Integer.numberOfTrailingZeros(m).toLong
    m * (p * 1024L - Sketches.log2q10Scala(v)) * HllLn2Q10 / (1L << 20)
  }

  /** The linear-counting switch condition as a Column over (raw, V). */
  private[graft] def hllLcUsed(m: Int, raw: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(v > 0L && raw * 2L <= lit(5L * m), 1L).otherwise(0L)

  /** The integer harmonic-mean estimate off a driver-held register array
    * (0 = never hit) — the same one-division math q137 computes
    * relationally, for the streaming form's running readout.
    */
  private[graft] def hllEstimate(regs: Array[Byte]): Long = {
    require(regs.length == HllM, s"expected $HllM registers")
    var s = 0L
    var i = 0
    while (i < regs.length) {
      s += 1L << (HllRhoCap - math.min(regs(i).toInt, HllRhoCap))
      i += 1
    }
    HllNumerator / (s * 1000L)
  }

  /** [[hllEstimate]] with the linear-counting branch — the corrected
    * readout q137's `est` column computes relationally, for the
    * streaming form's running readout (stream == batch on the corrected
    * estimate, by shared arithmetic). NOTE: unlike the raw estimate,
    * the corrected one is not globally monotone in register state — at
    * the switch boundary (raw crossing 5m/2) the estimate may step
    * down, the textbook behavior of the two-regime estimator.
    */
  private[graft] def hllEstimateCorrected(regs: Array[Byte]): Long = {
    val raw = hllEstimate(regs)
    val v = regs.count(_ == 0).toLong
    if (v > 0L && raw * 2L <= 5L * HllM) hllLcScala(HllM, v) else raw
  }

  /** Bottom-k sample size (L70): 32 keeps the KMV relative error
    * ~1/√(k−2) ≈ 18% — a smoke-level estimate; the operator's dial is k,
    * and the measured abs_err_ppm column is the evidence for raising it.
    */
  private[queries] val BottomK = 32

  /** BPE candidate-table size (L71): the ranked merge surface reported per
    * step — rank 1 is the chosen merge; 16 gives the trainer's lookahead.
    */
  private[queries] val BpeTopK = 16

  val all: Seq[GraftQuery] = {

    /* L50: tokenizer fertility profile — the multilingual tokenizer-
     * budget report (how many chars/words one BPE-ish token spans, per
     * source): fertility decides per-language compute cost and flags
     * sources a tokenizer serves badly (high chars-per-token = byte
     * fallback territory). Pure map-side column math + one
     * |sources|-row aggregate; integer ppm ratios (the L28 rule). */
    val q115 = GraftQuery(
      "q115_tokenizer_fertility", "L50 L9 L30",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"),
            length(col("text")).cast("long").as("nc"),
            TextFunctions.tokenCountWs(col("text")).cast("long").as("nw"),
            TextFunctions.tokenCountBpeIsh(col("text")).cast("long")
              .as("nb"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("n_chars"),
            sum(col("nw")).as("ws_tokens"), sum(col("nb")).as("bpe_tokens"))
          .withColumn("chars_per_tok_ppm", expr(
            "case when bpe_tokens = 0 then 0 " +
              "else n_chars * 1000000 div bpe_tokens end"))
          .withColumn("tok_per_word_ppm", expr(
            "case when ws_tokens = 0 then 0 " +
              "else bpe_tokens * 1000000 div ws_tokens end"))
          .orderBy(col("source"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        s"""WITH t AS (SELECT source,
              CAST(length(text) AS BIGINT) AS nc,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len($ws) END AS BIGINT) AS nw,
              CAST(${TextFunctions.tokenCountBpeIshSql("text")} AS BIGINT)
                AS nb
            FROM documents)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(nc) AS BIGINT) AS n_chars,
            CAST(SUM(nw) AS BIGINT) AS ws_tokens,
            CAST(SUM(nb) AS BIGINT) AS bpe_tokens,
            CASE WHEN CAST(SUM(nb) AS BIGINT) = 0 THEN 0
              ELSE CAST(SUM(nc) AS BIGINT) * 1000000
                // CAST(SUM(nb) AS BIGINT) END AS chars_per_tok_ppm,
            CASE WHEN CAST(SUM(nw) AS BIGINT) = 0 THEN 0
              ELSE CAST(SUM(nb) AS BIGINT) * 1000000
                // CAST(SUM(nw) AS BIGINT) END AS tok_per_word_ppm
          FROM t GROUP BY 1 ORDER BY source"""
      })

    /* L51: term-distribution divergence — per source, the total-
     * variation distance between its unigram distribution and the
     * corpus's, over the corpus top-K vocabulary: the drift report that
     * flags off-distribution sources before mixture design (and after
     * an ingest regression). TV = Σ|p_s − p_corpus| / 2 with both
     * probabilities quantized to integer ppm BEFORE the difference —
     * no float subtraction anywhere (KL/JS need log: engine-divergent,
     * the L23 rule; TV is the portable member of the family). At
     * 100 TB: word counts are map-side-combined aggregates; the top-K
     * model is a tiny sort on the |vocab|-row frame and ships
     * BROADCAST; the (source × K) frame is |sources|·K rows. */
    val q116 = GraftQuery(
      "q116_term_divergence", "L51 L23 L28",
      (s, d) => {
        val k = 64
        val words = Tables.documents(s, d)
          .select(col("source"),
            explode(Sketches.words(col("text"))).as("w"))
        val perSource = words.groupBy(col("source"))
          .agg(count(lit(1)).as("n_tokens"))
        val global = words.groupBy(col("w")).agg(count(lit(1)).as("cw"))
        val top = global.orderBy(col("cw").desc, col("w")).limit(k)
        val total = perSource.agg(sum(col("n_tokens")).as("n_total"))
        val sw = words.join(broadcast(top.select(col("w"))), Seq("w"))
          .groupBy(col("source"), col("w")).agg(count(lit(1)).as("csw"))
        val grid = perSource.crossJoin(broadcast(top))
          .join(sw, Seq("source", "w"), "left")
          .withColumn("csw", coalesce(col("csw"), lit(0L)))
          .crossJoin(broadcast(total))
          .withColumn("ps", expr("csw * 1000000 div n_tokens"))
          .withColumn("pc", expr("cw * 1000000 div n_total"))
        grid.groupBy(col("source"))
          .agg(first(col("n_tokens")).as("n_tokens"),
            sum(abs(col("ps") - col("pc"))).as("sabs"))
          .withColumn("tv_ppm", expr("sabs div 2"))
          .select(col("source"), col("n_tokens"), col("tv_ppm"))
          .orderBy(col("source"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        s"""WITH w AS (SELECT source, unnest($ws) AS w FROM documents),
          ps AS (SELECT source, COUNT(*) AS n_tokens FROM w GROUP BY 1),
          top AS (SELECT w, cw FROM (SELECT w, COUNT(*) AS cw FROM w
              GROUP BY 1) ORDER BY cw DESC, w LIMIT 64),
          tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_total FROM ps),
          sw AS (SELECT source, w, COUNT(*) AS csw FROM w
            WHERE w IN (SELECT w FROM top) GROUP BY 1, 2),
          grid AS (SELECT ps.source, ps.n_tokens,
              COALESCE(sw.csw, 0) * 1000000 // ps.n_tokens AS p_s,
              top.cw * 1000000 // tot.n_total AS p_c
            FROM ps CROSS JOIN top CROSS JOIN tot
            LEFT JOIN sw ON sw.source = ps.source AND sw.w = top.w)
          SELECT source, n_tokens,
            CAST(SUM(abs(p_s - p_c)) // 2 AS BIGINT) AS tv_ppm
          FROM grid GROUP BY 1, 2 ORDER BY source"""
      })

    /* L52: winnowing fingerprint selection — the MOSS algorithm
     * (Schleimer, Wilkerson, Aiken 2003): instead of keeping every
     * shingle hash (L10) or hoping a MinHash band collides (L3/L4),
     * keep the MINIMUM hash of every sliding window of WinnowW
     * consecutive shingle hashes. Guarantee: any shared run of
     * WinnowW + 2 words produces at least one shared fingerprint, at
     * an expected density of 2/(WinnowW+1) — the storage/recall dial
     * the sketch family's other members lack. Ties inside a window
     * break to the LEFTMOST position by packing (hash, pos) into one
     * BIGINT (hash %2^40 · 2^20 + pos) and taking a plain integer MIN
     * — no struct-ordering divergence between engines. Per doc:
     * shingles, full windows, selected fingerprints, density ppm. At
     * 100 TB: everything is per-doc windows over the posexplode+lead
     * frame (no global sort), then one doc-keyed aggregate. */
    val q117 = GraftQuery(
      "q117_winnowing", "L52 L10 L3",
      (s, d) => {
        // r19 optimization (guide §2.4/§4): trigram packs, the sliding
        // window minima and the selected-fingerprint census are pure
        // functions of one document's text — the native
        // graft_winnow_stats loop ([[graft.plans.WinnowStatsExpression]],
        // spec-pinned to the old windowed construction) computes all
        // three in one codegen'd map pass, where the relational form
        // paid an Exchange(doc_id)+sort for three windows plus two
        // doc-keyed aggregates. Null stats = docs without a full
        // trigram, exactly the rows the old inner aggregates dropped.
        Tables.documents(s, d)
          .select(col("doc_id"), call_function("graft_winnow_stats",
            col("text"), lit(3), lit(WinnowW)).as("st"))
          .filter(col("st").isNotNull)
          .select(col("doc_id"), col("st.n_shingles").as("n_shingles"),
            col("st.n_windows").as("n_windows"),
            col("st.n_selected").as("n_selected"))
          .withColumn("density_ppm",
            expr("n_selected * 1000000 div n_shingles"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val h = Sketches.h64Sql("s")
        s"""WITH wp AS (SELECT doc_id,
              unnest(generate_series(1, len($ws))) AS pos1,
              $ws AS warr
            FROM documents),
          tg AS (SELECT doc_id, pos1 - 1 AS pos,
              array_to_string(warr[pos1:pos1+2], ' ') AS s
            FROM wp WHERE pos1 + 2 <= len(warr)),
          pk AS (SELECT doc_id, pos,
              ($h % 1099511627776) * 1048576 + pos AS pack
            FROM tg),
          st AS (SELECT doc_id, COUNT(*) AS n_shingles FROM pk GROUP BY 1),
          wn AS (SELECT doc_id,
              min(pack) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING)
                AS winmin,
              lead(pack, ${WinnowW - 1}) OVER (PARTITION BY doc_id
                ORDER BY pos) IS NOT NULL AS fullw
            FROM pk),
          sel AS (SELECT doc_id, COUNT(*) AS n_windows,
              COUNT(DISTINCT winmin) AS n_selected
            FROM wn WHERE fullw GROUP BY 1)
          SELECT st.doc_id, st.n_shingles,
            COALESCE(sel.n_windows, 0) AS n_windows,
            COALESCE(sel.n_selected, 0) AS n_selected,
            COALESCE(sel.n_selected, 0) * 1000000 // st.n_shingles
              AS density_ppm
          FROM st LEFT JOIN sel ON sel.doc_id = st.doc_id
          ORDER BY st.doc_id"""
      })

    /* L53: content-defined chunking dedup — L33's fixed 48-word windows
     * break on a single inserted word (every downstream window shifts);
     * CDC (the LBFS/borg/restic boundary trick) cuts chunks where the
     * CONTENT says so: a chunk ends at word p when the 3-gram hash
     * starting at p ≡ 0 (mod 16). An insertion only perturbs chunks
     * that overlap it — the rest re-align and still dedup, which the
     * registered query proves by replaying the %97==1 slice with one
     * word PREPENDED (the case that defeats q98 entirely). Chunk
     * fingerprints are position-weighted integer hash sums (h%2^32 ·
     * relpos) — order-sensitive yet commutative to aggregate, exact in
     * int64 through ~32k-word documents (the engine's document bound,
     * 3 orders above the fixtures). Per doc: chunks, chunks seen
     * elsewhere, non-canonical dups, dup ppm (the q98 report over CDC
     * chunks). At 100 TB: per-doc windows + two hash aggregates on
     * 8-byte keys — same bounded shapes as L33. */
    val q118 = GraftQuery(
      "q118_cdc_chunk_dedup", "L53 L33 L20",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val planted = docs.unionByName(
          docs.filter(col("doc_id") % 97 === 1)
            .withColumn("doc_id", col("doc_id") + 2000000L)
            .withColumn("text", concat(lit("ins "), col("text"))))
        // r19 optimization (guide §2.4/§4): the boundary scan, chunk ids,
        // position-weighted fingerprints and chunk word counts are pure
        // functions of one document's text — the native graft_cdc_chunks
        // loop ([[graft.plans.CdcChunksExpression]], spec-pinned to the
        // old windowed construction bit-for-bit) computes them in one
        // codegen'd map pass, where the relational form paid an
        // Exchange(doc_id)+sort for three windows plus a (doc, chunk)
        // aggregate exchange.
        val chunks = cdcChunkRows(planted)
          .select(col("doc_id"), col("chunk_id"), col("cfp"), col("n_w"),
            (col("doc_id") * 1048576L + col("chunk_id")).as("k"))
        val cl = chunks.groupBy(col("cfp"))
          .agg(count(lit(1)).as("n"), min(col("k")).as("keeper"))
        chunks.join(cl, Seq("cfp"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_shared_chunks"),
            sum(when(col("n") > 1 && col("k") =!= col("keeper"), 1L)
              .otherwise(0L)).as("n_dup_chunks"))
          .withColumn("dup_ppm", expr("n_dup_chunks * 1000000 div n_chunks"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val h3 = Sketches.h64Sql("array_to_string(warr[pos1:pos1+2], ' ')")
        val hw = Sketches.h64Sql("warr[pos1]")
        s"""WITH src AS (SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 2000000 AS doc_id,
                'ins ' || text AS text
              FROM documents WHERE doc_id % 97 = 1),
          wp AS (SELECT doc_id,
              unnest(generate_series(1, len($ws))) AS pos1, $ws AS warr
            FROM src),
          bd AS (SELECT doc_id, pos1, warr,
              (pos1 + 2 <= len(warr) AND $h3 % $CdcMod = 0) AS boundary
            FROM wp),
          ck AS (SELECT doc_id, pos1, warr,
              COALESCE(SUM(CASE WHEN boundary THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY pos1
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS chunk_id
            FROM bd),
          tm AS (SELECT doc_id, chunk_id,
              ($hw % 4294967296) *
                (pos1 - MIN(pos1) OVER (PARTITION BY doc_id, chunk_id) + 1)
                AS term
            FROM ck),
          chunks AS (SELECT doc_id, chunk_id,
              CAST(SUM(term) AS BIGINT) AS cfp, COUNT(*) AS n_w,
              MIN(doc_id * 1048576 + chunk_id) AS k
            FROM tm GROUP BY 1, 2),
          cl AS (SELECT cfp, COUNT(*) AS n, MIN(k) AS keeper
            FROM chunks GROUP BY 1)
          SELECT chunks.doc_id, COUNT(*) AS n_chunks,
            CAST(SUM(CASE WHEN cl.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_shared_chunks,
            CAST(SUM(CASE WHEN cl.n > 1 AND chunks.k <> cl.keeper
              THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
            CAST(SUM(CASE WHEN cl.n > 1 AND chunks.k <> cl.keeper
              THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // COUNT(*)
              AS dup_ppm
          FROM chunks JOIN cl ON cl.cfp = chunks.cfp
          GROUP BY 1 ORDER BY doc_id"""
      })

    /* L55: chunk-containment detection — the asymmetric relation the
     * symmetric near-dup family misses: document A is (mostly) a
     * SUBSTRING of document B (quotation, mirror-with-banner,
     * truncated re-crawl). Candidates ride shared L20 chunk
     * fingerprints under the executed hot-bucket guard; containment =
     * shared distinct chunks · 1e6 div |A's chunks|, reported when ≥
     * the floor. The planted replay (%97==1 slice with a 20-word tail
     * APPENDED) makes the original a perfect substring of its replica
     * at every SF: A→B at 1e6 ppm, B→A at its partial ratio. At
     * 100 TB: pair fan-out is bounded by chunk-fp df (guard-capped),
     * the verify needs no re-join — the count IS the evidence. */
    val q120 = GraftQuery(
      "q120_chunk_containment", "L55 L33 L4",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val tail = (1 to 20).map(i => s"zz$i").mkString(" ")
        val planted = docs.unionByName(
          docs.filter(col("doc_id") % 97 === 1)
            .withColumn("doc_id", col("doc_id") + 3000000L)
            .withColumn("text", concat(col("text"), lit(" " + tail))))
        val cf = LlmPipeline.chunkFrame(planted)
          .select(col("doc_id"), col("chunk_fp")).distinct()
        val sizes = cf.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
        // q36-convention guard asymmetry: the oracle below is UNCAPPED, so
        // the oracle run PROVES the cap never binds at the gated SFs (a
        // binding cap would hash-mismatch); `sizes` is computed from the
        // unguarded frame on purpose — n_a is the doc's true chunk count,
        // the denominator of the containment ratio, independent of any
        // candidate-generation cap. If the cap ever binds at a larger SF,
        // the observed containment_hot_chunks metric (stderr in Verify) is
        // the signal that pairs were dropped while denominators were not.
        val guarded = Skew.dropHotBuckets(cf, Seq("chunk_fp"),
          HotBucketCap, observeAs = Some("containment_hot_chunks"))
        val pairs = guarded
          .join(guarded.select(col("doc_id").as("container"),
            col("chunk_fp")), Seq("chunk_fp"))
          .filter(col("doc_id") =!= col("container"))
          .groupBy(col("doc_id"), col("container"))
          .agg(count(lit(1)).as("n_shared"))
        pairs.join(sizes, Seq("doc_id"))
          .withColumn("containment_ppm",
            expr("n_shared * 1000000 div n_a"))
          .filter(col("containment_ppm") >= ContainPpm)
          .select(col("doc_id"), col("container"), col("n_a").as("n_chunks"),
            col("n_shared"), col("containment_ppm"))
          .orderBy(col("doc_id"), col("container"))
      },
      Some {
        val tail = (1 to 20).map(i => s"zz$i").mkString(" ")
        val src = s"""(SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 3000000 AS doc_id,
              text || ' $tail' AS text
            FROM documents WHERE doc_id % 97 = 1)"""
        s"""WITH ${LlmPipeline.chunkCtesSql(src)},
          cf AS (SELECT DISTINCT doc_id, chunk_fp FROM chunks),
          sizes AS (SELECT doc_id, COUNT(*) AS n_a FROM cf GROUP BY 1),
          pairs AS (SELECT a.doc_id, b.doc_id AS container,
              COUNT(*) AS n_shared
            FROM cf a JOIN cf b ON b.chunk_fp = a.chunk_fp
            WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
          SELECT p.doc_id, p.container, s.n_a AS n_chunks, p.n_shared,
            p.n_shared * 1000000 // s.n_a AS containment_ppm
          FROM pairs p JOIN sizes s ON s.doc_id = p.doc_id
          WHERE p.n_shared * 1000000 // s.n_a >= $ContainPpm
          ORDER BY p.doc_id, p.container"""
      })

    /* L56: filter-ensemble overlap matrix — a curation stack runs many
     * keep/drop filters; the decision which to KEEP RUNNING needs the
     * pairwise kill-set overlap: near-total overlap means one filter is
     * redundant (drop the expensive one), near-zero overlap means they
     * catch different garbage (keep both). Four registered filter
     * semantics reused verbatim (the one-source-of-truth rule): L16's
     * min-word-count, duplicate-2-gram ratio and top-word fraction
     * (q75's exact formulas) and L41's hashing classifier sign (q106).
     * Per unordered filter pair: docs, each side's kills, intersection,
     * union, and overlap ppm (Jaccard of the kill sets). At 100 TB: the
     * flags ride the two shared exploded frames (one word window + one
     * token aggregate), the pair table is 6 literal rows CROSS JOINed
     * broadcast, and the aggregate map-side-combines to 6 rows — no
     * self-join, no doc-keyed shuffle beyond the flag builds. */
    val q121 = GraftQuery(
      "q121_filter_overlap", "L56 L16 L41",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        // r19 optimization: the L16 stats ride the shared map-side
        // qualityStats projection (native graft_top_word_count +
        // graft_shingles) and the classifier score rides the native
        // graft_cls_score loop (spec-pinned to the explode + md5-weight
        // aggregate) — the whole flag frame is ONE zero-shuffle map
        // projection; the inner-join-on-cls semantics (docs with no
        // non-empty words drop out) survive as a null filter.
        val flags = docs
          .filter(col("text").isNotNull)
          .select(col("doc_id"),
            size(Sketches.words(col("text"))).cast("long").as("n_words"),
            call_function("graft_top_word_count", col("text")).as("maxc"),
            size(Sketches.shingles(col("text"), 2)).cast("long").as("dist2"),
            call_function("graft_cls_score", col("text")).as("score"))
          .filter(col("score").isNotNull)
          .select(col("doc_id"),
            (col("n_words") < 10).as("k_len"),
            (when(col("n_words") >= 2,
              lit(1.0) - col("dist2").cast("double") /
                (col("n_words") - 1).cast("double"))
              .otherwise(lit(0.0)) > 0.3).as("k_rep"),
            (col("maxc").cast("double") / col("n_words").cast("double")
              > 0.2).as("k_top"),
            (col("score") < 0).as("k_cls"))
        val names = Seq("cls", "len", "rep", "top")
        val pairTable = (for {
          a <- names; b <- names if a < b
        } yield (a, b)).toDF("filter_a", "filter_b")
        def kill(f: Column): Column =
          when(f === "len", col("k_len")).when(f === "rep", col("k_rep"))
            .when(f === "top", col("k_top")).otherwise(col("k_cls"))
        flags.crossJoin(broadcast(pairTable))
          .withColumn("ka", kill(col("filter_a")))
          .withColumn("kb", kill(col("filter_b")))
          .groupBy(col("filter_a"), col("filter_b"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("ka"), 1L).otherwise(0L)).as("kill_a"),
            sum(when(col("kb"), 1L).otherwise(0L)).as("kill_b"),
            sum(when(col("ka") && col("kb"), 1L).otherwise(0L))
              .as("kill_both"),
            sum(when(col("ka") || col("kb"), 1L).otherwise(0L))
              .as("kill_union"))
          .withColumn("overlap_ppm", expr(
            "case when kill_union = 0 then 0 " +
              "else kill_both * 1000000 div kill_union end"))
          .orderBy(col("filter_a"), col("filter_b"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val fp = TextFunctions.md5FingerprintSql("w")
        val pairs = Seq("cls", "len", "rep", "top").combinations(2)
          .map { case Seq(a, b) => s"('$a', '$b')" }.mkString(", ")
        s"""WITH a AS (SELECT doc_id, $ws AS ws FROM documents),
          g AS (SELECT doc_id, len(ws) AS n_words,
              len(list_distinct(list_transform(range(1, len(ws)),
                i -> ws[i] || ' ' || ws[i + 1]))) AS dist2 FROM a),
          wc AS (SELECT doc_id, word, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(ws) AS word FROM a) GROUP BY 1, 2),
          mx AS (SELECT doc_id, MAX(c) AS maxc FROM wc GROUP BY 1),
          toks AS (SELECT doc_id, w FROM (SELECT doc_id,
              unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
            FROM documents) WHERE length(w) > 0),
          cs AS (SELECT doc_id,
              SUM(($fp % 1024) * 2654435761 % 1001 - 500) AS score
            FROM toks GROUP BY 1),
          fl AS (SELECT g.doc_id,
              g.n_words < 10 AS k_len,
              (CASE WHEN g.n_words >= 2 THEN 1.0e0 -
                CAST(g.dist2 AS DOUBLE) / CAST(g.n_words - 1 AS DOUBLE)
                ELSE 0.0e0 END) > 0.3e0 AS k_rep,
              CAST(mx.maxc AS DOUBLE) / CAST(g.n_words AS DOUBLE) > 0.2e0
                AS k_top,
              cs.score < 0 AS k_cls
            FROM g JOIN mx ON mx.doc_id = g.doc_id
            JOIN cs ON cs.doc_id = g.doc_id),
          pr AS (SELECT * FROM (VALUES $pairs) AS t(filter_a, filter_b)),
          x AS (SELECT filter_a, filter_b,
              CASE filter_a WHEN 'len' THEN k_len WHEN 'rep' THEN k_rep
                WHEN 'top' THEN k_top ELSE k_cls END AS ka,
              CASE filter_b WHEN 'len' THEN k_len WHEN 'rep' THEN k_rep
                WHEN 'top' THEN k_top ELSE k_cls END AS kb
            FROM fl CROSS JOIN pr)
          SELECT filter_a, filter_b, COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN ka THEN 1 ELSE 0 END) AS BIGINT) AS kill_a,
            CAST(SUM(CASE WHEN kb THEN 1 ELSE 0 END) AS BIGINT) AS kill_b,
            CAST(SUM(CASE WHEN ka AND kb THEN 1 ELSE 0 END) AS BIGINT)
              AS kill_both,
            CAST(SUM(CASE WHEN ka OR kb THEN 1 ELSE 0 END) AS BIGINT)
              AS kill_union,
            CASE WHEN CAST(SUM(CASE WHEN ka OR kb THEN 1 ELSE 0 END)
                AS BIGINT) = 0 THEN 0
              ELSE CAST(SUM(CASE WHEN ka AND kb THEN 1 ELSE 0 END)
                AS BIGINT) * 1000000
                // CAST(SUM(CASE WHEN ka OR kb THEN 1 ELSE 0 END)
                  AS BIGINT) END AS overlap_ppm
          FROM x GROUP BY 1, 2 ORDER BY filter_a, filter_b"""
      })

    /* L57: dedup cluster-size histogram — duplicate clusters follow a
     * heavy-tailed size law; the histogram (power-of-two buckets over
     * L2 canonical-cluster sizes) is the report that sizes the dedup
     * win, reveals mirror explosions (mass migrating into big buckets)
     * and picks the hot-bucket caps the LSH guards use. Replays planted
     * (the q101 pattern) so multi-doc buckets exist at every SF. At
     * 100 TB: one 8-byte-key hash aggregate to clusters, then a
     * |buckets|-row re-aggregate — nothing wider than L2 itself. */
    val q122 = GraftQuery(
      "q122_cluster_histogram", "L57 L2 L36",
      (s, d) => {
        val docs = LlmCuration.withReplays(Tables.documents(s, d)
          .select(col("doc_id"), col("text")))
        val clusters = docs
          .select(col("doc_id"), Sketches.h64(array_join(sort_array(
            array_distinct(Sketches.words(col("text")))), " ")).as("ck"))
          .groupBy(col("ck")).agg(count(lit(1)).as("sz"))
        val bucketed = clusters.withColumn("bucket",
          when(col("sz") === 1, 1L).when(col("sz") === 2, 2L)
            .when(col("sz") <= 4, 4L).when(col("sz") <= 8, 8L)
            .when(col("sz") <= 16, 16L).otherwise(32L))
        bucketed.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"),
            sum(col("sz") - 1L).as("n_dup_docs"))
          .orderBy(col("bucket"))
      },
      Some {
        val ck = Sketches.h64Sql(
          s"array_to_string(list_sort(list_distinct(${Sketches.wordsSql("text")})), ' ')")
        s"""WITH cl AS (SELECT $ck AS ck, COUNT(*) AS sz
            FROM ${LlmCuration.replaySrcSql("doc_id, text")} GROUP BY 1),
          bk AS (SELECT CAST(CASE WHEN sz = 1 THEN 1 WHEN sz = 2 THEN 2
              WHEN sz <= 4 THEN 4 WHEN sz <= 8 THEN 8
              WHEN sz <= 16 THEN 16 ELSE 32 END AS BIGINT) AS bucket, sz
            FROM cl)
          SELECT bucket, COUNT(*) AS n_clusters,
            CAST(SUM(sz) AS BIGINT) AS n_docs,
            CAST(SUM(sz - 1) AS BIGINT) AS n_dup_docs
          FROM bk GROUP BY 1 ORDER BY bucket"""
      })

    /* L59: sketched quantile profile — the single-pass scale path for
     * quantiles over UNBOUNDED integer domains. L30/L35 aggregate a
     * count-map (exact, but only viable on bounded domains like token
     * counts); for arbitrary measures the production shape is a
     * mergeable sample: `graft_bottomk` (the engine's second
     * TypedImperativeAggregate after graft_hll) keeps the k rows with
     * the smallest salted md5-prefix hash under the (hash, value) total
     * order — a uniform but DETERMINISTIC row sample whose merge
     * (multiset union → k smallest) is associative, commutative and
     * merge-tree independent, unlike GK/KLL compaction. Because the
     * hash is the portable md5 construction, the oracle reproduces the
     * EXACT sample with a row_number window — the sketch is gated
     * bit-for-bit, not within error bounds. Nearest-rank P25/P50/P75
     * off the sorted sample (pure integer indexing — no interpolation,
     * no float boundary). At 100 TB: one hash aggregate with map-side
     * partial merge, ≤2k pairs per group in flight; the oracle's
     * per-group sort never happens in the engine. */
    val q124 = GraftQuery(
      "q124_sketched_quantiles", "L59 L30 A10",
      (s, d) => {
        val t = Tables.documents(s, d)
          .select(col("source"),
            TextFunctions.tokenCountBpeIsh(col("text")).cast("long")
              .as("tok"))
        t.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            call_function("graft_bottomk", col("tok"), lit(64), lit("q124"))
              .as("sample"))
          .withColumn("sample_n", size(col("sample")).cast("long"))
          .withColumn("p25",
            expr("element_at(sample, cast((sample_n + 3) div 4 as int))"))
          .withColumn("p50",
            expr("element_at(sample, cast((sample_n + 1) div 2 as int))"))
          .withColumn("p75",
            expr("element_at(sample, cast((3 * sample_n + 3) div 4 as int))"))
          .select(col("source"), col("n_docs"), col("sample_n"),
            col("p25"), col("p50"), col("p75"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH t AS (SELECT source,
              CAST(${TextFunctions.tokenCountBpeIshSql("text")} AS BIGINT)
                AS tok
            FROM documents),
          h AS (SELECT source, tok,
              CAST(('0x' || substr(md5('bk:q124:' || CAST(tok AS VARCHAR)),
                1, 15)) AS BIGINT) AS h
            FROM t),
          r AS (SELECT source, tok,
              row_number() OVER (PARTITION BY source ORDER BY h, tok) AS rn
            FROM h),
          sm AS (SELECT source, list(tok ORDER BY tok) AS sample
            FROM r WHERE rn <= 64 GROUP BY 1),
          n AS (SELECT source, COUNT(*) AS n_docs FROM t GROUP BY 1)
          SELECT n.source, n.n_docs,
            CAST(len(sm.sample) AS BIGINT) AS sample_n,
            sm.sample[(len(sm.sample) + 3) // 4] AS p25,
            sm.sample[(len(sm.sample) + 1) // 2] AS p50,
            sm.sample[(3 * len(sm.sample) + 3) // 4] AS p75
          FROM n JOIN sm ON sm.source = n.source
          ORDER BY n.source"""
      })

    /* L61: edit-distance near-dup verify — the character-level verify
     * modality the token-level family (Jaccard L4, cosine L13, chunks
     * L33/L53) cannot express: "same text up to a few keystrokes"
     * (typo mirrors, OCR variants, case/punct tweaks that shift token
     * boundaries). Candidates ride the SHARED MinHash band machinery
     * (the one quadratic term, hot-bucket guarded); the verify is
     * built-in `levenshtein` — classic unit-cost DP, bit-identical
     * integers on both engines, no float anywhere. A replica slice
     * with a single-character substitution is planted so the
     * near-miss branch fires at every SF (distance exactly 1). Output:
     * candidate pairs under the 20% normalized-distance floor. At
     * 100 TB: pair count is the banded-LSH bound; the O(len²) DP runs
     * only on candidates, never corpus-wide. */
    val q126 = GraftQuery(
      "q126_editdist_neardup", "L61 L4 L3",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val planted = docs.unionByName(
          docs.filter(col("doc_id") % 97 === 1)
            .withColumn("doc_id", col("doc_id") + 4000000L)
            .withColumn("text",
              concat(lit("Z"), expr("substring(text, 2)"))))
        val sig = LlmPipeline.signaturesOf(
          LlmPipeline.shingleRowsOf(planted))
        val cand = LlmPipeline.lshCandidates(
          LlmPipeline.lshBands(sig, "editdist_hot_buckets"))
        cand
          .join(planted.select(col("doc_id").as("a"), col("text").as("ta")),
            Seq("a"))
          .join(planted.select(col("doc_id").as("b"), col("text").as("tb")),
            Seq("b"))
          .withColumn("lev", levenshtein(col("ta"), col("tb")).cast("long"))
          .withColumn("maxlen",
            greatest(length(col("ta")), length(col("tb"))).cast("long"))
          .withColumn("edit_ppm", expr("lev * 1000000 div maxlen"))
          .filter(col("edit_ppm") <= 200000L)
          .select(col("a"), col("b"), col("lev"), col("maxlen"),
            col("edit_ppm"))
          .orderBy(col("a"), col("b"))
      },
      Some {
        val src = """(SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 4000000 AS doc_id,
              'Z' || substring(text, 2) AS text
            FROM documents WHERE doc_id % 97 = 1)"""
        s"""WITH pd AS $src,
          ${LlmPipeline.sigCtesSqlOver("pd")},
          ${LlmPipeline.bandCandCtesSql}
          SELECT c.a, c.b,
            CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
            CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
              AS maxlen,
            CAST(levenshtein(da.text, db.text) AS BIGINT) * 1000000
              // greatest(length(da.text), length(db.text)) AS edit_ppm
          FROM cand c
          JOIN pd da ON da.doc_id = c.a
          JOIN pd db ON db.doc_id = c.b
          WHERE CAST(levenshtein(da.text, db.text) AS BIGINT) * 1000000
            // greatest(length(da.text), length(db.text)) <= 200000
          ORDER BY c.a, c.b"""
      })

    /* L62: adversarial-unicode hygiene — the evasion class L25's NFC
     * canonicalization deliberately does NOT touch: zero-width
     * characters (ZWSP/ZWNJ/ZWJ/BOM) that split tokens invisibly, and
     * Cyrillic homoglyphs (а е о р с х) that make visually-identical
     * text hash differently — both standard dedup/blocklist evasion.
     * Scrub = strip zero-widths (one regexp_replace, Java ∩ RE2
     * \\x{hex} class) + fold homoglyphs (chained replace — both
     * engines lack a shared translate dialect); idempotent by
     * construction and PROVEN in-query (the q87/q90 pattern): the
     * violations column re-applies the scrub and counts diffs — 0 on
     * both engines or the hash fails. Adversarial text planted on the
     * %97 slice so every branch fires at every SF. Per source: docs,
     * affected docs per class, stripped/folded char counts, violations.
     * At 100 TB: pure codegen'd map-side string ops + one
     * |sources|-row aggregate. */
    val q127 = GraftQuery(
      "q127_unicode_hygiene", "L62 L25 L22",
      (s, d) => {
        val zwPat = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"
        def fold(c: Column): Column =
          HomoglyphFold.foldLeft(c) { case (acc, (from, to)) =>
            regexp_replace(acc, lit(from), lit(to))
          }
        def scrub(c: Column): Column =
          fold(regexp_replace(c, lit(zwPat), lit("")))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val planted = docs.unionByName(
          docs.filter(col("doc_id") % 97 === 1)
            .withColumn("doc_id", col("doc_id") + 5000000L)
            .withColumn("text", concat(lit(AdversarialPrefix), col("text"))))
        val scored = planted
          .withColumn("zw", regexp_count(col("text"), lit(zwPat)))
          .withColumn("hg", regexp_count(col("text"),
            lit("[\\x{0430}\\x{0435}\\x{043E}\\x{0440}]")))
          .withColumn("clean", scrub(col("text")))
          .withColumn("violation",
            when(scrub(col("clean")) =!= col("clean"), 1L).otherwise(0L))
        scored.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("zw") > 0, 1L).otherwise(0L)).as("n_zw_docs"),
            sum(when(col("hg") > 0, 1L).otherwise(0L)).as("n_hg_docs"),
            sum(col("zw")).cast("long").as("zw_chars"),
            sum(col("hg")).cast("long").as("hg_chars"),
            sum(col("violation")).as("idem_violations"))
          .orderBy(col("source"))
      },
      Some {
        val zwPat = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"
        val hgPat = "[\\x{0430}\\x{0435}\\x{043E}\\x{0440}]"
        def scrub(e: String): String =
          HomoglyphFold.foldLeft(
            s"regexp_replace($e, '$zwPat', '', 'g')") {
            case (acc, (from, to)) => s"replace($acc, '$from', '$to')"
          }
        val clean = scrub("text")
        val clean2 = scrub(s"($clean)")
        s"""WITH pd AS (SELECT doc_id, source, text FROM documents
            UNION ALL SELECT doc_id + 5000000 AS doc_id, source,
              '$AdversarialPrefix' || text
            FROM documents WHERE doc_id % 97 = 1),
          sc AS (SELECT source,
              len(regexp_extract_all(text, '$zwPat')) AS zw,
              len(regexp_extract_all(text, '$hgPat')) AS hg,
              CASE WHEN ($clean2) <> ($clean) THEN 1 ELSE 0 END
                AS violation
            FROM pd)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN zw > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_zw_docs,
            CAST(SUM(CASE WHEN hg > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_hg_docs,
            CAST(SUM(zw) AS BIGINT) AS zw_chars,
            CAST(SUM(hg) AS BIGINT) AS hg_chars,
            CAST(SUM(violation) AS BIGINT) AS idem_violations
          FROM sc GROUP BY 1 ORDER BY source"""
      })

    /* L63: integer-log perplexity proxy — the frequency-weighted upgrade
     * of L23's binary in-vocab familiarity: classic LM filtering scores
     * −Σ log p(w), but libm log is the one engine-divergent operation
     * (the L23 lesson). Under a Zipfian vocabulary, −log p(w) ≈
     * log2(rank(w)) + const, and floor(log2(rank)) over a bounded rank
     * domain is a 9-branch integer CASE ladder — exact on any engine.
     * Per word: surprise = floor(log2(vocab rank)), out-of-vocab = 9
     * (one past the deepest rank bucket); per doc: total and mean
     * surprise (ppm-scaled integer div), keep under the threshold —
     * common-word text scores low, word salad of rare/unknown tokens
     * scores high, and unlike L23 the score DISCRIMINATES between
     * frequent and merely-known words. At 100 TB: the ranked vocab is
     * a tiny sort on the |vocab|-row frame shipped BROADCAST, surprise
     * is map-side ladder math, one doc-keyed aggregate. */
    val q128 = GraftQuery(
      "q128_surprise_score", "L63 L23 L48",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("doc_id"), explode(Sketches.words(col("text")))
            .as("w"))
        val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w")).limit(CorpusOps.BigramVocab)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("c").desc, col("w"))))
          .select(col("w"), col("rank"))
        // .otherwise(9L) mirrors the SQL ELSE 9 — unreachable while the
        // vocab tops out under 512 ranks, load-bearing the day it doesn't
        val ladder = (1 to 8).foldLeft(when(col("rank") < 2, 0L)) {
          (acc, b) => acc.when(col("rank") < (1 << (b + 1)), b.toLong)
        }.otherwise(9L)
        words.join(broadcast(vocab), Seq("w"), "left")
          .withColumn("surprise",
            when(col("rank").isNull, 9L).otherwise(ladder))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("surprise")).as("surprise_sum"))
          .withColumn("mean_surprise_ppm",
            expr("surprise_sum * 1000000 div n_words"))
          .withColumn("keep", col("mean_surprise_ppm") <= 6000000L)
          .select(col("doc_id"), col("n_words"), col("surprise_sum"),
            col("mean_surprise_ppm"), col("keep"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val ladder = (1 to 8).map(b =>
          s"WHEN rank < ${1 << (b + 1)} THEN $b").mkString(" ")
        s"""WITH w AS (SELECT doc_id, unnest($ws) AS w FROM documents),
          v AS (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS rank
            FROM (SELECT w, COUNT(*) AS c FROM w GROUP BY 1
              ORDER BY c DESC, w LIMIT ${CorpusOps.BigramVocab})),
          sc AS (SELECT w.doc_id,
              CASE WHEN v.rank IS NULL THEN 9
                WHEN v.rank < 2 THEN 0 $ladder ELSE 9 END AS surprise
            FROM w LEFT JOIN v ON v.w = w.w)
          SELECT doc_id, COUNT(*) AS n_words,
            CAST(SUM(surprise) AS BIGINT) AS surprise_sum,
            CAST(SUM(surprise) AS BIGINT) * 1000000 // COUNT(*)
              AS mean_surprise_ppm,
            CAST(SUM(surprise) AS BIGINT) * 1000000 // COUNT(*)
              <= 6000000 AS keep
          FROM sc GROUP BY 1 ORDER BY doc_id"""
      })

    /* L65: Moore–Lewis cross-entropy-difference selection — the two-model
     * contrastive upgrade the single-model filters (L23 vocabulary, L48
     * bigram familiarity, L63 surprise) cannot express: score each pool
     * document by H_in(doc) − H_general(doc), where H_in comes from a
     * small in-domain SEED model and H_general from the whole (noisy)
     * pool — the classic intelligent-selection recipe (Moore & Lewis
     * 2010) behind CCNet/DSIR-style curation. Surprise per word is the
     * L63 integer rank ladder under each model (OOV = 9), so the
     * difference is exact integer arithmetic on both engines; it is
     * SHIFTED by +10 per word into the non-negative domain before the
     * ppm mean (integer `div` on negatives floors differently across
     * engines — the ProtoHiQ quantization stance), so 10e6 is the
     * neutral score. Fixture: the seed is the %7==0 original slice;
     * planted off-domain docs (%83==3, +1e6 ids) carry a fixed 48-token
     * marker block interpolated from ONE Scala value into engine and
     * oracle (the q127 pattern) — markers are seed-OOV (surprise 9) but
     * rank 32..37 in the pool model at EVERY SF (six markers can never
     * outrank the 31 base words), so planted docs score ≥ +4 per marker
     * word and the drop branch fires deterministically while original
     * docs sit within a fraction of a bit of neutral. At 100 TB: two
     * |vocab|-row models built by map-side-combined counts and shipped
     * BROADCAST, map-side ladder math, one doc-keyed aggregate — the
     * L63 shape with one extra broadcast. */
    val q132 = GraftQuery(
      "q132_moore_lewis", "L65 L63 L23",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val pool = docs.unionByName(docs.filter(col("doc_id") % 83 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit(OodMarkerBlock + " "), col("text")).as("text")))
        val words = pool.select(col("doc_id"),
          explode(Sketches.words(col("text"))).as("w"))
        def model(src: org.apache.spark.sql.DataFrame) = src
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w")).limit(MooreLewisVocab)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("c").desc, col("w"))))
          .select(col("w"), col("rank"))
        val seed = model(words.filter(
          col("doc_id") % 7 === 0 && col("doc_id") < 1000000L))
          .withColumnRenamed("rank", "rank_in")
        val general = model(words).withColumnRenamed("rank", "rank_gen")
        def ladder(rank: Column): Column = {
          // the non-null fold ends in .otherwise(9L), mirroring the SQL
          // twin's ELSE 9: unreachable at MooreLewisVocab = 64 (ranks cap
          // at 64 < 512), but a raised vocab must not diverge the two
          // ladders via a NULL rung (ADVICE r12)
          val known = (1 to 8).foldLeft(when(rank < 2, 0L)) {
            (acc, b) => acc.when(rank < (1 << (b + 1)), b.toLong)
          }.otherwise(9L)
          when(rank.isNull, 9L).otherwise(known)
        }
        words
          .join(broadcast(seed), Seq("w"), "left")
          .join(broadcast(general), Seq("w"), "left")
          .withColumn("shifted",
            ladder(col("rank_in")) - ladder(col("rank_gen")) + 10L)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("shifted")).as("ce_shift_sum"))
          .withColumn("ce_mean_qppm",
            expr("ce_shift_sum * 1000000 div n_words"))
          .withColumn("keep", col("ce_mean_qppm") <= MooreLewisKeepQppm)
          .select(col("doc_id"), col("n_words"), col("ce_shift_sum"),
            col("ce_mean_qppm"), col("keep"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        def ladderSql(rank: String) =
          s"CASE WHEN $rank IS NULL THEN 9 WHEN $rank < 2 THEN 0 " +
            (1 to 8).map(b => s"WHEN $rank < ${1 << (b + 1)} THEN $b")
              .mkString(" ") + " ELSE 9 END"
        s"""WITH pool AS (SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 1000000,
              '$OodMarkerBlock ' || text FROM documents
            WHERE doc_id % 83 = 3),
          w AS (SELECT doc_id, unnest($ws) AS w FROM pool),
          seed AS (SELECT w, row_number() OVER (ORDER BY c DESC, w)
              AS rank_in
            FROM (SELECT w, COUNT(*) AS c FROM w
              WHERE doc_id % 7 = 0 AND doc_id < 1000000 GROUP BY 1
              ORDER BY c DESC, w LIMIT $MooreLewisVocab)),
          gen AS (SELECT w, row_number() OVER (ORDER BY c DESC, w)
              AS rank_gen
            FROM (SELECT w, COUNT(*) AS c FROM w GROUP BY 1
              ORDER BY c DESC, w LIMIT $MooreLewisVocab)),
          sc AS (SELECT w.doc_id,
              ${ladderSql("seed.rank_in")} -
                ${ladderSql("gen.rank_gen")} + 10 AS shifted
            FROM w LEFT JOIN seed ON seed.w = w.w
            LEFT JOIN gen ON gen.w = w.w)
          SELECT doc_id, COUNT(*) AS n_words,
            CAST(SUM(shifted) AS BIGINT) AS ce_shift_sum,
            CAST(SUM(shifted) AS BIGINT) * 1000000 // COUNT(*)
              AS ce_mean_qppm,
            CAST(SUM(shifted) AS BIGINT) * 1000000 // COUNT(*)
              <= $MooreLewisKeepQppm AS keep
          FROM sc GROUP BY 1 ORDER BY doc_id"""
      })

    /* L66: duplicate-chunk removal + document reassembly — the APPLY
     * step the dedup reports (q98/q118) stop short of: Dolma-style
     * paragraph dedup drops every non-canonical occurrence of a
     * cross-document duplicate passage and REBUILDS the surviving
     * document from what remains. Chunks are the L53 content-defined
     * boundaries (insertion-stable), the canonical occurrence is the
     * min-(doc, chunk) key (the L1/L21 survivor rule), and the rebuilt
     * text is the kept words re-joined in original position order, so
     * the output carries a VERIFIABLE artifact: the md5 fingerprint of
     * the cleaned text, hash-gated on both engines (not just counts —
     * a reassembly bug that kept the right number of words in the
     * wrong order fails the gate). Replays planted (the q101/q122
     * pattern) so full-document removal fires at every SF (a replay's
     * every chunk is non-canonical → it rebuilds to the empty string,
     * fingerprinted as md5('')), while fixture chunk collisions among
     * originals exercise partial removal. At 100 TB: the q118 chunk
     * frame (one sort per doc serves every window), an 8-byte-key
     * cluster aggregate, verdicts re-joined on (doc, chunk), and the
     * reassembly is one doc-keyed aggregate whose state is bounded by
     * the document length bound — no global sort, no pairwise join. */
    val q133 = GraftQuery(
      "q133_chunk_dedup_rebuild", "L66 L53 L21",
      (s, d) => {
        val docs = LlmCuration.withReplays(
          Tables.documents(s, d).select(col("doc_id"), col("text")))
        // r19 optimization: the chunk frame rides the native
        // graft_cdc_chunks loop (see q118's note) — one codegen'd map
        // pass instead of posexplode + three windows + two aggregate
        // exchanges; the rebuild joins chunk TEXTS (chunks tile the
        // document contiguously, so kept chunk_texts joined in chunk
        // order with one space reproduce the pos-ordered word join
        // byte-for-byte) instead of re-aggregating every word row.
        val chunks = cdcChunkRows(docs)
          .select(col("doc_id"), col("chunk_id"), col("cfp"),
            (col("doc_id") * 1048576L + col("chunk_id")).as("k"),
            col("n_w"), col("chunk_text"))
        val cl = chunks.groupBy(col("cfp"))
          .agg(count(lit(1)).as("n"), min(col("k")).as("keeper"))
        val verdicts = chunks.join(cl, Seq("cfp"))
          .select(col("doc_id"), col("chunk_id"), col("n_w"),
            col("chunk_text"),
            (col("n") > 1 && col("k") =!= col("keeper")).as("dropped"))
        val stats = verdicts.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped"))
        val rebuilt = verdicts.filter(!col("dropped"))
          .groupBy(col("doc_id"))
          .agg(sum(col("n_w")).as("n_words_kept"),
            array_join(transform(
              sort_array(collect_list(struct(col("chunk_id"),
                col("chunk_text")))),
              x => x.getField("chunk_text")), " ").as("cleaned"))
        stats.join(rebuilt, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_chunks"), col("n_dropped"),
            coalesce(col("n_words_kept"), lit(0L)).as("n_words_kept"),
            TextFunctions.md5Fingerprint(coalesce(col("cleaned"), lit("")))
              .as("cleaned_fp"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val h3 = Sketches.h64Sql("array_to_string(warr[pos1:pos1+2], ' ')")
        val hw = Sketches.h64Sql("warr[pos1]")
        val cleanFp = TextFunctions.md5FingerprintSql("COALESCE(kw.s, '')")
        s"""WITH src AS ${LlmCuration.replaySrcSql("doc_id, text")},
          wp AS (SELECT doc_id,
              unnest(generate_series(1, len($ws))) AS pos1, $ws AS warr
            FROM src),
          bd AS (SELECT doc_id, pos1, warr,
              (pos1 + 2 <= len(warr) AND $h3 % $CdcMod = 0) AS boundary
            FROM wp),
          ck AS (SELECT doc_id, pos1, warr,
              COALESCE(SUM(CASE WHEN boundary THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY pos1
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS chunk_id
            FROM bd),
          tm AS (SELECT doc_id, chunk_id, pos1, warr[pos1] AS w,
              ($hw % 4294967296) *
                (pos1 - MIN(pos1) OVER (PARTITION BY doc_id, chunk_id) + 1)
                AS term
            FROM ck),
          chunks AS (SELECT doc_id, chunk_id,
              CAST(SUM(term) AS BIGINT) AS cfp,
              MIN(doc_id * 1048576 + chunk_id) AS k
            FROM tm GROUP BY 1, 2),
          cl AS (SELECT cfp, COUNT(*) AS n, MIN(k) AS keeper
            FROM chunks GROUP BY 1),
          vd AS (SELECT chunks.doc_id, chunks.chunk_id,
              (cl.n > 1 AND chunks.k <> cl.keeper) AS dropped
            FROM chunks JOIN cl ON cl.cfp = chunks.cfp),
          st AS (SELECT doc_id, COUNT(*) AS n_chunks,
              CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dropped
            FROM vd GROUP BY 1),
          kw AS (SELECT tm.doc_id, COUNT(*) AS n_words_kept,
              string_agg(tm.w, ' ' ORDER BY tm.pos1) AS s
            FROM tm JOIN vd ON vd.doc_id = tm.doc_id
              AND vd.chunk_id = tm.chunk_id
            WHERE NOT vd.dropped GROUP BY 1)
          SELECT st.doc_id, st.n_chunks, st.n_dropped,
            COALESCE(kw.n_words_kept, 0) AS n_words_kept,
            $cleanFp AS cleaned_fp
          FROM st LEFT JOIN kw ON kw.doc_id = st.doc_id
          ORDER BY st.doc_id"""
      })

    /* L67: count-min frequency sketch — the frequency analog of L64's
     * membership filter, one-sided in the other direction: at 100 TB an
     * exact term-frequency table is a full hash aggregate over every
     * occurrence (fine once, expensive to maintain, impossible to
     * broadcast at vocabulary scale); the CMS is a fixed depth×width
     * counter matrix built in ONE map-side-combined aggregate (counter
     * matrices ADD — any merge tree, identical state), shipped
     * BROADCAST, point-queried per term as min over depth rows
     * (`graft_cms_query`, codegen'd). Estimate ≥ truth ALWAYS; the
     * overshoot is the collision mass, and the registered query
     * MEASURES it per probe term against the exact aggregate (the
     * L64/L11/L44 honest-lossy-sketch convention) with an in-query
     * one-sided proof: `undercount` ≡ 0 on both engines or the hash
     * gate fails. Probes: every corpus term plus four planted ABSENT
     * terms whose estimates are pure collision mass — the error branch
     * fires at every SF because the fixture vocabulary (~31 words)
     * deliberately overloads the 32-cell rows. Cells reuse the Bloom
     * position arithmetic (universal family over the md5-prefix hash,
     * intermediates < 2^62), so DuckDB reproduces every estimate —
     * collisions included — from a per-(row, cell) counting join. */
    val q134 = GraftQuery(
      "q134_cms_frequency", "L67 L64 L28",
      (s, d) => {
        import s.implicits._
        val occ = Tables.documents(s, d)
          .select(explode(Sketches.words(col("text"))).as("w"))
          .withColumn("fp", Sketches.h64(col("w")))
        val sketch = occ.agg(call_function("graft_cms",
          col("fp"), lit(CmsWidthLog2), lit(CmsDepth)).as("sk"))
        val exact = occ.groupBy(col("w")).agg(count(lit(1)).as("exact_c"))
        val probes = exact.select(col("w"), col("exact_c"))
          .unionByName(CmsAbsentProbes.toDF("w")
            .withColumn("exact_c", lit(0L)))
        probes.crossJoin(broadcast(sketch))
          .withColumn("est", call_function("graft_cms_query",
            col("sk"), Sketches.h64(col("w")), lit(CmsDepth)))
          .select(col("w"), col("exact_c"), col("est"),
            (col("est") - col("exact_c")).as("over"),
            when(col("est") < col("exact_c"), 1L).otherwise(0L)
              .as("undercount"))
          .orderBy(col("w"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val width = 1 << CmsWidthLog2
        def cell(i: Int, h: String) =
          graft.plans.BloomFilterAgg.positionSql(i, h, width)
        val fpW = Sketches.h64Sql("w")
        val cellsUnion = (0 until CmsDepth).map(i =>
          s"SELECT $i AS i, ${cell(i, "fp")} AS cell, COUNT(*) AS c " +
            "FROM occ GROUP BY 2").mkString(" UNION ALL ")
        val probeCells = (0 until CmsDepth).map(i =>
          s"SELECT w, exact_c, $i AS i, ${cell(i, s"($fpW)")} AS cell " +
            "FROM probes").mkString(" UNION ALL ")
        val absent = CmsAbsentProbes.map(w => s"('$w')").mkString(", ")
        s"""WITH occ AS (SELECT w, ${Sketches.h64Sql("w")} AS fp
            FROM (SELECT unnest($ws) AS w FROM documents)),
          cells AS ($cellsUnion),
          exact AS (SELECT w, COUNT(*) AS exact_c FROM occ GROUP BY 1),
          probes AS (SELECT w, exact_c FROM exact
            UNION ALL SELECT w, 0 FROM (VALUES $absent) AS t(w)),
          pc AS ($probeCells),
          est AS (SELECT pc.w, pc.exact_c,
              MIN(COALESCE(cells.c, 0)) AS est
            FROM pc LEFT JOIN cells ON cells.i = pc.i
              AND cells.cell = pc.cell
            GROUP BY 1, 2)
          SELECT w, exact_c, est, est - exact_c AS over,
            CASE WHEN est < exact_c THEN 1 ELSE 0 END AS undercount
          FROM est ORDER BY w"""
      })

    /* L68: approximate heavy hitters — the SERVING use of the L67
     * sketch: rank terms by their CMS estimate instead of the exact
     * count, the way a production pipeline surfaces "most frequent
     * n-grams / domains / boilerplate lines" without maintaining the
     * full frequency table. The report is the honesty layer: for the
     * top-K terms BY ESTIMATE it emits the estimate next to the exact
     * count and both rank positions, so collision-driven RANK
     * DISPLACEMENT — the way CMS error actually manifests downstream —
     * is measured, not assumed (the fixture's overloaded 32-cell rows
     * make displacement nonzero at every SF). Ranks are computed within
     * the est-ordered top-512 candidate frame, the q128-sanctioned
     * post-limit shape: at 100 TB the |vocab|-row frequency frame is
     * large, so the global sort is bounded to the candidate cut and the
     * sketch itself is the only full-corpus pass. Deterministic
     * tiebreaks ((rank key) DESC, w) on both engines. */
    val q135 = GraftQuery(
      "q135_cms_heavy_hitters", "L68 L67 L28",
      (s, d) => {
        val occ = Tables.documents(s, d)
          .select(explode(Sketches.words(col("text"))).as("w"))
          .withColumn("fp", Sketches.h64(col("w")))
        val sketch = occ.agg(call_function("graft_cms",
          col("fp"), lit(CmsWidthLog2), lit(CmsDepth)).as("sk"))
        val cand = occ.groupBy(col("w")).agg(count(lit(1)).as("exact_c"))
          .crossJoin(broadcast(sketch))
          .withColumn("est", call_function("graft_cms_query",
            col("sk"), Sketches.h64(col("w")), lit(CmsDepth)))
          .orderBy(col("est").desc, col("w")).limit(512)
        cand
          .withColumn("est_rank", row_number().over(
            Window.orderBy(col("est").desc, col("w"))))
          .withColumn("exact_rank", row_number().over(
            Window.orderBy(col("exact_c").desc, col("w"))))
          .filter(col("est_rank") <= HeavyK)
          .select(col("w"), col("est"), col("exact_c"),
            col("est_rank"), col("exact_rank"),
            abs(col("est_rank") - col("exact_rank")).as("displacement"))
          .orderBy(col("est_rank"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val width = 1 << CmsWidthLog2
        def cell(i: Int, h: String) =
          graft.plans.BloomFilterAgg.positionSql(i, h, width)
        val fpW = Sketches.h64Sql("w")
        val cellsUnion = (0 until CmsDepth).map(i =>
          s"SELECT $i AS i, ${cell(i, "fp")} AS cell, COUNT(*) AS c " +
            "FROM occ GROUP BY 2").mkString(" UNION ALL ")
        val probeCells = (0 until CmsDepth).map(i =>
          s"SELECT w, exact_c, $i AS i, ${cell(i, s"($fpW)")} AS cell " +
            "FROM exact").mkString(" UNION ALL ")
        s"""WITH occ AS (SELECT w, ${Sketches.h64Sql("w")} AS fp
            FROM (SELECT unnest($ws) AS w FROM documents)),
          cells AS ($cellsUnion),
          exact AS (SELECT w, COUNT(*) AS exact_c FROM occ GROUP BY 1),
          pc AS ($probeCells),
          est AS (SELECT pc.w, pc.exact_c,
              MIN(COALESCE(cells.c, 0)) AS est
            FROM pc LEFT JOIN cells ON cells.i = pc.i
              AND cells.cell = pc.cell
            GROUP BY 1, 2),
          cand AS (SELECT * FROM est ORDER BY est DESC, w LIMIT 512),
          rk AS (SELECT w, est, exact_c,
              row_number() OVER (ORDER BY est DESC, w) AS est_rank,
              row_number() OVER (ORDER BY exact_c DESC, w) AS exact_rank
            FROM cand)
          SELECT w, est, exact_c, est_rank, exact_rank,
            ABS(est_rank - exact_rank) AS displacement
          FROM rk WHERE est_rank <= $HeavyK ORDER BY est_rank"""
      })

    /* L69: HyperLogLog cardinality sketch — the third leg of the sketch
     * tier (L64 membership, L67 frequency, L69 cardinality): per-source
     * distinct-shingle estimation in 64 single-byte registers instead
     * of an unbroadcastable distinct set. Every step is INTEGER-exact on
     * both engines: register = top-6 hash bits, rho = leading-zero rank
     * of the remaining 54 bits via binary-string length (codegen'd `bin`
     * / DuckDB `format('{:b}')` — no libm), registers merge by MAX (any
     * merge tree, map-side combined), and the harmonic-mean estimate is
     * ONE integer division — Σ 2^-rho is held as the exact integer
     * Σ 2^(30-rho_capped) so alpha·m²·2^30 (a < 2^52 constant) divides
     * by it without ever touching a double. The estimator is
     * TWO-REGIME (VERDICT r17 #2): when zero registers remain and the
     * raw estimate sits under 5m/2, the linear-counting branch
     * m·ln(m/V) fires on the same integer ladder (log2q10 · Ln2Q10 —
     * bit-identical on both engines); the switch condition rides the
     * output as `lc_used`, the uncorrected `est_raw` stays beside the
     * corrected `est`, and abs_err_ppm prices the branch that actually
     * ran against n_exact. At 100 TB: one map-side pass + a
     * 64-row-per-source aggregate; the exact side exists only to
     * measure the error. */
    val q137 = GraftQuery(
      "q137_hll_cardinality", "L69 L8",
      (s, d) => {
        // distinct 3-gram shingles per source — thousands per source at
        // the gated SFs, loading the 64 registers ~hundreds deep (the raw
        // estimator's calibrated range); the ~31-word fixture VOCABULARY
        // would sit in the linear-counting regime the measured
        // zero-register column exists to flag
        val w = Tables.documents(s, d)
          .select(col("source"),
            explode(Sketches.shingles(col("text"), LlmPipeline.ShingleN))
              .as("w"))
          .withColumn("h", Sketches.h64(col("w")))
        val rr = w
          .withColumn("reg", hllReg(col("h")))
          .withColumn("rho_c", hllRhoC(col("h")))
        val regs = rr.groupBy(col("source"), col("reg"))
          .agg(max(col("rho_c")).as("r"))
        val per = regs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_regs_hit"),
            sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoCap - r)"))
              .as("s_hit"))
          .withColumn("s_total", col("s_hit") +
            (lit(HllM.toLong) - col("n_regs_hit")) * lit(1L << HllRhoCap))
          .withColumn("est_raw", expr(s"$HllNumerator div (s_total * 1000)"))
        val exact = w.groupBy(col("source"))
          .agg(countDistinct(col("w")).as("n_exact"))
        per.join(exact, Seq("source"))
          .withColumn("n_zero_regs", lit(HllM.toLong) - col("n_regs_hit"))
          .withColumn("lc_used",
            hllLcUsed(HllM, col("est_raw"), col("n_zero_regs")))
          .withColumn("est", when(col("lc_used") === 1L,
            hllLcCol(HllM, col("n_zero_regs"))).otherwise(col("est_raw")))
          .select(col("source"), col("n_exact"),
            col("n_regs_hit"), col("n_zero_regs"),
            col("est_raw"), col("est"), col("lc_used"),
            expr("abs(est - n_exact) * 1000000 div n_exact")
              .as("abs_err_ppm"))
          .orderBy(col("source"))
      },
      Some {
        val ws = Sketches.shinglesSql("text", LlmPipeline.ShingleN)
        val hw = Sketches.h64Sql("w")
        s"""WITH w AS (SELECT source, unnest($ws) AS w FROM documents),
          hh AS (SELECT source, w, $hw AS h FROM w),
          rr AS (SELECT source, h >> $HllRemBits AS reg,
              LEAST(CASE WHEN (h & $HllRemMask) = 0 THEN ${HllRemBits + 1}
                ELSE ${HllRemBits + 1}
                  - length(format('{:b}', h & $HllRemMask)) END,
                $HllRhoCap) AS rho_c
            FROM hh),
          regs AS (SELECT source, reg, MAX(rho_c) AS r
            FROM rr GROUP BY 1, 2),
          per AS (SELECT source,
              COUNT(*) AS n_regs_hit,
              CAST(SUM(1::BIGINT << ($HllRhoCap - r)) AS BIGINT) AS s_hit
            FROM regs GROUP BY 1),
          pt AS (SELECT source, n_regs_hit,
              $HllM - n_regs_hit AS n_zero_regs,
              $HllNumerator // ((s_hit + ($HllM - n_regs_hit)
                * (1::BIGINT << $HllRhoCap)) * 1000) AS est_raw
            FROM per),
          pc AS (SELECT *, CASE WHEN n_zero_regs > 0
                AND est_raw * 2 <= ${5 * HllM} THEN 1 ELSE 0 END AS lc_used
            FROM pt),
          pe AS (SELECT *, CASE WHEN lc_used = 1
                THEN ${hllLcSql(HllM, "n_zero_regs")} ELSE est_raw END AS est
            FROM pc),
          ex AS (SELECT source, COUNT(DISTINCT w) AS n_exact FROM w
            GROUP BY 1)
          SELECT pe.source, ex.n_exact, pe.n_regs_hit,
            CAST(pe.n_zero_regs AS BIGINT) AS n_zero_regs,
            pe.est_raw, pe.est, CAST(pe.lc_used AS BIGINT) AS lc_used,
            abs(pe.est - ex.n_exact)
              * 1000000 // ex.n_exact AS abs_err_ppm
          FROM pe JOIN ex ON ex.source = pe.source
          ORDER BY pe.source"""
      })

    /* L70: bottom-k (KMV) corpus sample + distinct estimate — the
     * deterministic-uniform-sample primitive a training pipeline runs
     * constantly ("hold out 0.1%", "eyeball 32 random docs") made
     * reproducible: rank documents by the md5-prefix content hash and
     * keep the k smallest — a seed-free uniform sample over DISTINCT
     * contents (duplicates collapse to one witness, min doc_id), stable
     * under repartitioning, appends, and engine choice, computed by
     * TakeOrdered (no global sort materializes). The same k hashes ARE a
     * cardinality sketch: the k-th minimum value estimates distinct
     * count as (k−1)·2^60/h_k — held integer-exact as
     * ((k−1)<<50) / (h_k>>10), one division, no doubles; a corpus
     * smaller than k degrades to the exact count (the sketch holds
     * everything). abs_err_ppm (clamped before the ppm multiply so a
     * degenerate estimate saturates instead of overflowing) measures the
     * estimator against the exact distinct count in-query. */
    val q138 = GraftQuery(
      "q138_bottomk_sample", "L70 L1",
      (s, d) => {
        val dh = Tables.documents(s, d)
          .select(col("doc_id"), Sketches.h64(col("text")).as("h"))
          .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
        val bottom = dh.orderBy(col("h")).limit(BottomK)
        val kth = bottom.agg(max(col("h")).as("hk"),
          count(lit(1)).as("k_actual"))
        val exact = dh.agg(count(lit(1)).as("n_exact"))
        bottom
          .withColumn("rank",
            row_number().over(Window.orderBy(col("h"))).cast("long"))
          .crossJoin(broadcast(kth)).crossJoin(broadcast(exact))
          .withColumn("est_distinct",
            when(col("k_actual") < BottomK, col("n_exact"))
              .otherwise(expr(
                s"shiftleft(CAST(${BottomK - 1} AS BIGINT), 50) div " +
                  "greatest(shiftright(hk, 10), CAST(1 AS BIGINT))")))
          .select(col("rank"), col("h"), col("doc_id"), col("n_exact"),
            col("est_distinct"),
            expr("least(abs(est_distinct - n_exact), CAST(9000000000 AS " +
              "BIGINT)) * 1000000 div n_exact").as("abs_err_ppm"))
          .orderBy(col("rank"))
      },
      Some {
        val ht = Sketches.h64Sql("text")
        s"""WITH dh AS (SELECT $ht AS h, MIN(doc_id) AS doc_id
            FROM documents GROUP BY 1),
          bottom AS (SELECT h, doc_id,
              row_number() OVER (ORDER BY h) AS rank
            FROM dh ORDER BY h LIMIT $BottomK),
          kth AS (SELECT MAX(h) AS hk, COUNT(*) AS k_actual FROM bottom),
          ex AS (SELECT COUNT(*) AS n_exact FROM dh)
          SELECT CAST(rank AS BIGINT) AS rank, h, doc_id, n_exact,
            CASE WHEN k_actual < $BottomK THEN n_exact
              ELSE (${BottomK - 1}::BIGINT << 50)
                // GREATEST(hk >> 10, 1::BIGINT) END AS est_distinct,
            LEAST(abs(CASE WHEN k_actual < $BottomK THEN n_exact
                ELSE (${BottomK - 1}::BIGINT << 50)
                  // GREATEST(hk >> 10, 1::BIGINT) END - n_exact),
              9000000000) * 1000000 // n_exact AS abs_err_ppm
          FROM bottom, kth, ex ORDER BY rank"""
      })

    /* L71: BPE merge step — the tokenizer-TRAINING kernel (the L50
     * fertility profile measures a tokenizer; this builds one): over the
     * word-frequency table, count every adjacent character pair weighted
     * by word frequency (the classic BPE statistic — overlapping, so a
     * run 'aaa' contributes (a,a) twice) and rank the merge candidates;
     * rank 1 is the pair a BPE trainer would merge next. Each candidate
     * also carries its ACTUAL token saving — greedy left-to-right
     * non-overlapping occurrences × frequency, computed exactly on both
     * engines as length(w) − length(replace(w, pair, <1 char>)) — so the
     * ranked table separates the selection statistic from the realized
     * compression (they differ exactly on runs: 'aaa' counts 2, saves 1).
     * The training LOOP is driver orchestration of this kernel (the
     * refineCodebook pattern); one step is the oracle-gated operator. At
     * 100 TB: the corpus collapses to the |vocab|-row frequency table in
     * one map-side-combined aggregate; pair counting explodes |word|-1
     * positions per VOCAB row (not per corpus row); savings re-scan is
     * top-16 candidates broadcast against the vocab frame — no corpus
     * pass after the first. */
    val q139 = GraftQuery(
      "q139_bpe_merge_step", "L71 L50",
      (s, d) => {
        val wf = Tables.documents(s, d)
          .select(explode(Sketches.words(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        val pc = wf.filter(length(col("w")) >= 2)
          .select(col("w"), col("freq"),
            explode(expr("sequence(1, length(w) - 1)")).as("i"))
          .select(col("w"), col("freq"),
            expr("substring(w, i, 2)").as("pair"))
          .groupBy(col("pair"))
          .agg(sum(col("freq")).as("pair_count"),
            countDistinct(col("w")).as("n_words"))
        val top = pc
          .orderBy(col("pair_count").desc, col("pair")).limit(BpeTopK)
          .withColumn("rank", row_number()
            .over(Window.orderBy(col("pair_count").desc, col("pair")))
            .cast("long"))
        val savings = wf
          .crossJoin(broadcast(top.select(col("pair"))))
          .select(col("pair"),
            ((length(col("w")) -
              length(expr("replace(w, pair, char(1))"))) * col("freq"))
              .as("sv"))
          .groupBy(col("pair")).agg(sum(col("sv")).as("merge_savings"))
        top.join(savings, Seq("pair"), "left")
          .select(col("rank"),
            substring(col("pair"), 1, 1).as("sym_a"),
            substring(col("pair"), 2, 1).as("sym_b"),
            col("pair"), col("pair_count"), col("n_words"),
            coalesce(col("merge_savings"), lit(0L)).as("merge_savings"))
          .orderBy(col("rank"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        s"""WITH wf AS (SELECT w, COUNT(*) AS freq
            FROM (SELECT unnest($ws) AS w FROM documents) GROUP BY 1),
          pos AS (SELECT w, freq,
              unnest(generate_series(1, length(w) - 1)) AS i
            FROM wf WHERE length(w) >= 2),
          pc AS (SELECT substring(w, i, 2) AS pair,
              CAST(SUM(freq) AS BIGINT) AS pair_count,
              COUNT(DISTINCT w) AS n_words
            FROM pos GROUP BY 1),
          top AS (SELECT pair, pair_count, n_words,
              row_number() OVER (ORDER BY pair_count DESC, pair) AS rank
            FROM pc ORDER BY pair_count DESC, pair LIMIT $BpeTopK),
          sv AS (SELECT t.pair,
              CAST(SUM((length(w) - length(replace(w, t.pair, chr(1))))
                * freq) AS BIGINT) AS merge_savings
            FROM wf CROSS JOIN top t GROUP BY 1)
          SELECT CAST(top.rank AS BIGINT) AS rank,
            substring(top.pair, 1, 1) AS sym_a,
            substring(top.pair, 2, 1) AS sym_b,
            top.pair, top.pair_count, top.n_words,
            COALESCE(sv.merge_savings, 0) AS merge_savings
          FROM top LEFT JOIN sv ON sv.pair = top.pair
          ORDER BY rank"""
      })

    Seq(q115, q116, q117, q118, q120, q121, q122, q124, q126, q127, q128,
      q132, q133, q134, q135, q137, q138, q139)
  }

}
