package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Sketches

/** Corpus-shaping operators (SURVEY §2.11a, L82–L85) — the tier between
  * tokenizer training (L71/L75) and shard export (K7/K8): the operators
  * that decide WHAT the training corpus looks like once the filters and
  * dedups have run.
  *
  *  - L82 BPE encode/decode round-trip + compression profile → q150
  *  - L83 bitext mining (anchored mutual top-1 across langs)  → q151
  *  - L84 per-domain quota cap (RefinedWeb-style)              → q152
  *  - L85 Poisson-bootstrap CIs on corpus statistics           → q153
  *
  * Conventions as established: md5-prefix portable hashes
  * ([[Sketches.h64]]), integer-only arithmetic (`div` / DuckDB `//`),
  * ppm fixed-point, `CAST(floor(1000000 * cos) AS BIGINT)` cosine
  * quantization, `(statistic DESC, key)` tie-breaks on every argmax,
  * and wide unrolled cosines ONLY inside MATERIALIZED oracle CTEs
  * (never in a window ORDER BY — the r13 mmap lesson).
  */
object CorpusShapingOps {

  /** L82 merge table — the FIXED tokenizer artifact the encoder applies
    * (production: the output of the L75 training job, versioned and
    * shipped to every encode task as a broadcast constant; here: one
    * Scala constant interpolated into both engines). Ordered by merge
    * priority; merge k realizes as placeholder chr(k). Merge 3 contains
    * merge 1's placeholder ( = "th", so "e" = "the") — the
    * nested-merge case a real BPE table always has, which forces decode
    * to expand in strictly descending k order.
    */
  private[queries] val BpeMerges: Seq[String] =
    Seq("th", "he", "\u0001e", "in", "an", "re")

  /** Render a merge pair as a SQL string expression, mapping control
    * chars (earlier placeholders) through the engine's chr function and
    * grouping printable runs into one literal.
    */
  private def pairSql(p: String, chrFn: String): String = {
    val parts = scala.collection.mutable.Buffer.empty[String]
    val run = new StringBuilder
    def flush(): Unit = if (run.nonEmpty) {
      parts += s"'${run.toString}'"; run.clear()
    }
    p.foreach { c =>
      if (c < ' ') { flush(); parts += s"$chrFn(${c.toInt})" }
      else run += c
    }
    flush()
    parts.mkString(" || ")
  }

  /** Chained-replace encode of column expression `src` (merge order). */
  private def encodeSql(src: String, chrFn: String): String =
    BpeMerges.zipWithIndex.foldLeft(src) { case (acc, (p, i)) =>
      s"replace($acc, ${pairSql(p, chrFn)}, $chrFn(${i + 1}))"
    }

  /** Chained-replace decode of `src` — descending k, so a placeholder
    * introduced by expanding merge k (nested merges) is itself expanded
    * by a later (smaller-k) step. Exact inverse of [[encodeSql]] on any
    * input free of the placeholder chars.
    */
  private def decodeSql(src: String, chrFn: String): String =
    BpeMerges.zipWithIndex.reverse.foldLeft(src) { case (acc, (p, i)) =>
      s"replace($acc, $chrFn(${i + 1}), ${pairSql(p, chrFn)})"
    }

  /** True iff `src` already contains any placeholder char (encode would
    * not round-trip; flagged, never silently mis-decoded).
    */
  private def contamSql(src: String, chrFn: String): String =
    BpeMerges.indices.map(i => s"instr($src, $chrFn(${i + 1})) > 0")
      .mkString("(", " OR ", ")")

  /** L83 dials: the two collections (languages) being mined, the anchor
    * stride (the query budget — mining cost is 2 corpus passes × the
    * anchor count, never |A|×|B|), and the shared embedding width.
    */
  private[queries] val BtLangA = "es"
  private[queries] val BtLangB = "fr"
  private[queries] val BtAnchorStride = 4

  /** L84 dials: keep this many docs per registrable domain (quality
    * rank = n_chars DESC, doc_id), over a deterministic skewed domain
    * assignment — 1/4 of docs land on domain 0 (the megasite every web
    * corpus has), the rest spread over [[DomTail]] tail domains, so the
    * cap actually drops rows at every gated SF while tail domains pass
    * untouched.
    */
  private[queries] val DomCap = 16
  private[queries] val DomTail = 89L

  /** L85 dials: replicate count, and the weight construction — replicate
    * b draws doc weight w = bit_count(h64(b||":bs:"||doc_id) & 15) ~
    * Binomial(4, 1/2), mean 2 (the Poisson(1)-bootstrap's integer
    * stand-in: nonnegative, mean-normalizable, engine-portable). Totals
    * therefore estimate 2× the truth; every readout divides by 2·R or 2.
    */
  private[graft] val BootReps = 16

  /** L85's per-(source, replicate) exact partials over ANY
    * (doc_id, source, n_chars) frame — the kernel shared by q153 and the
    * streaming form ([[graft.streaming.StreamingBootstrap]]), so the
    * batch gate and the stream state can never diverge on the draw.
    * Emits (source, b, nd, exact_chars, t2); every column is an
    * associative BIGINT sum/count, which is exactly why the streaming
    * form's add-merge is stream==batch exact.
    */
  private[graft] def bootstrapReplicates(
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), col("source"), col("n_chars"))
      .crossJoin(broadcast(df.sparkSession.range(1, BootReps + 1)
        .select(col("id").as("b"))))
      .withColumn("h", Sketches.h64(concat(col("b").cast("string"),
        lit(":bs:"), col("doc_id").cast("string"))))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("nd"),
        sum(col("n_chars")).as("exact_chars"),
        sum(expr("bit_count(h & 15)").cast("long") * col("n_chars"))
          .as("t2"))

  /** L84's deterministic skewed domain plant over any (doc_id, ...)
    * frame — shared by q152 and the governed-release composition.
    */
  private[graft] def withDomain(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val h = Sketches.h64(concat(lit("dom:"), col("doc_id").cast("string")))
    df.withColumn("dom",
      when(h % 4 === 0, 0L).otherwise(lit(1L) + h % DomTail))
  }

  /** L84's exact salted two-level top-Cap per domain (see q152's
    * scaladoc): emits the kept doc ids as `kept_id`. Input must carry
    * (doc_id, n_chars, dom).
    */
  private[graft] def domainCapKeptIds(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val salted = docs.withColumn("salt",
        Sketches.h64(concat(lit("salt:"), col("doc_id").cast("string")))
          % 16)
      .withColumn("rk1", row_number().over(
        Window.partitionBy(col("dom"), col("salt"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rk1") <= DomCap)
    salted.withColumn("rk", row_number().over(
        Window.partitionBy(col("dom"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rk") <= DomCap)
      .select(col("doc_id").as("kept_id"))
  }

  def all: Seq[GraftQuery] = {

    /* L82: tokenizer APPLICATION — the encode pass a training pipeline
     * runs over every document with the trained merge table (the L75
     * job's artifact), plus the decode-back gate that proves losslessness
     * on the real corpus instead of assuming it: encode is a chained
     * replace in merge-priority order, decode expands placeholders in
     * descending order (nested merges force this), and the oracle hashes
     * BOTH the per-source compression profile and the mismatch counters,
     * so a single mangled byte anywhere in encode∘decode diverges the
     * gate. `n_merges = chars_raw - chars_enc` rides along (each merge
     * application removes exactly one char — the invariant that catches
     * a replace that ate too much). Docs already containing a
     * placeholder char are counted, not silently mis-decoded. At 100 TB:
     * one map-side pass, constant per-row work (|merges| scans of the
     * string), no shuffle beyond the |sources|-row rollup. */
    val q150 = GraftQuery(
      "q150_bpe_encode_roundtrip", "L82 L75 L9",
      (s, d) => {
        val enc = encodeSql("text", "char")
        val dec = decodeSql("enc", "char")
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .withColumn("enc", expr(enc))
          .withColumn("dec", expr(dec))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("chars_raw"),
            sum(length(col("enc"))).as("chars_enc"),
            expr("(sum(length(enc)) * 1000000) div sum(length(text))")
              .as("compression_ppm"),
            sum(when(col("dec") =!= col("text"), 1L).otherwise(0L))
              .as("n_mismatch"),
            sum(when(expr(contamSql("text", "char")), 1L).otherwise(0L))
              .as("n_contam"))
          .orderBy(col("source"))
      },
      Some {
        val enc = encodeSql("text", "chr")
        val dec = decodeSql("enc", "chr")
        s"""WITH e AS (SELECT doc_id, source, text, $enc AS enc
              FROM documents),
            dd AS (SELECT *, $dec AS dec FROM e)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(length(text)) AS BIGINT) AS chars_raw,
            CAST(SUM(length(enc)) AS BIGINT) AS chars_enc,
            CAST(SUM(length(enc)) AS BIGINT) * 1000000
              // CAST(SUM(length(text)) AS BIGINT) AS compression_ppm,
            CAST(SUM(CASE WHEN dec <> text THEN 1 ELSE 0 END) AS BIGINT)
              AS n_mismatch,
            CAST(SUM(CASE WHEN ${contamSql("text", "chr")} THEN 1 ELSE 0
              END) AS BIGINT) AS n_contam
          FROM dd GROUP BY 1 ORDER BY source"""
      })

    /* L83: bitext mining — the translation-pair miner (LASER/CCMatrix
     * shape) under an explicit query budget: anchors are a strided
     * sample of collection A (lang es), each anchor takes its best-
     * cosine match over ALL of collection B (lang fr), and the match is
     * kept as MUTUAL only if the anchor is also that B doc's best match
     * over ALL of A — the margin-free mutual-top-1 criterion. Cost is
     * bounded by construction: forward = one corpus-B pass × |anchors|
     * (broadcast anchors, map-side argmax), backward = one corpus-A pass
     * × |matched Bs| ≤ |anchors| — never |A|×|B|. Ties break to the
     * lowest id via the established max_by(id, struct(cos, -id)); the
     * oracle realizes the same argmax with the staged-max MATERIALIZED
     * pattern (the r12 window lesson: the 64-wide cosine evaluates once
     * into a stored table, argmax over stored doubles), null-safe for
     * the zero-norm guard. Cosines floor-quantize to ppm at the output
     * boundary only — ranking happens on raw doubles. */
    val q151 = GraftQuery(
      "q151_bitext_mining", "L83 L6 L13",
      (s, d) => {
        val dims = LlmPipeline.Dims
        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
          .filter(col("lang").isin(BtLangA, BtLangB))
        val ab = LlmPipeline.embeddingFrame(s, d)
          .join(docs, col("vec_id") === col("doc_id"))
          .select(col("vec_id").as("id"), col("lang"), col("embedding"),
            col("nrm"))
        val anchors = ab.filter(col("lang") === BtLangA &&
            col("id") % BtAnchorStride === 0)
          .select(col("id").as("a_id"), col("embedding").as("ae"),
            col("nrm").as("an"))
        val bSide = ab.filter(col("lang") === BtLangB)
          .select(col("id").as("b_id"), col("embedding").as("be"),
            col("nrm").as("bn"))
        val fwd = bSide.crossJoin(broadcast(anchors))
          .select(col("a_id"), col("b_id"), Sketches.cosineFromParts(
            Sketches.dot(col("be"), col("ae"), dims),
            col("bn"), col("an")).as("cos"))
          .groupBy(col("a_id"))
          .agg(max_by(col("b_id"), struct(col("cos"), -col("b_id")))
            .as("b_id"), max(col("cos")).as("cos"))
        val mb = fwd.select(col("b_id")).distinct()
          .join(bSide, Seq("b_id"))
        val aSide = ab.filter(col("lang") === BtLangA)
          .select(col("id").as("a2_id"), col("embedding").as("a2e"),
            col("nrm").as("a2n"))
        val back = aSide.crossJoin(broadcast(mb))
          .select(col("b_id"), col("a2_id"), Sketches.cosineFromParts(
            Sketches.dot(col("a2e"), col("be"), dims),
            col("a2n"), col("bn")).as("bcos"))
          .groupBy(col("b_id"))
          .agg(max_by(col("a2_id"), struct(col("bcos"), -col("a2_id")))
            .as("back_a"))
        fwd.join(back, Seq("b_id"))
          .select(col("a_id"), col("b_id"),
            floor(lit(1000000d) * col("cos")).cast("long").as("cos_ppm"),
            when(col("back_a") === col("a_id"), 1L).otherwise(0L)
              .as("mutual"))
          .orderBy(col("a_id"))
      },
      Some {
        val dims = LlmPipeline.Dims
        def cos(ea: String, eb: String, na: String, nb: String) =
          Sketches.cosineSql(Sketches.dotSql(ea, eb, dims), na, nb)
        s"""WITH ab AS MATERIALIZED (SELECT d.doc_id AS id, d.lang,
              e.embedding, ${Sketches.normSql("e.embedding", dims)} AS nrm
            FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
            WHERE d.lang IN ('$BtLangA', '$BtLangB')),
          anc AS (SELECT id AS a_id, embedding, nrm FROM ab
            WHERE lang = '$BtLangA' AND id % $BtAnchorStride = 0),
          bs AS (SELECT id AS b_id, embedding, nrm FROM ab
            WHERE lang = '$BtLangB'),
          scf AS MATERIALIZED (SELECT a.a_id, b.b_id,
              ${cos("b.embedding", "a.embedding", "b.nrm", "a.nrm")} AS cos
            FROM bs b CROSS JOIN anc a),
          fmx AS (SELECT a_id, MAX(cos) AS best FROM scf GROUP BY 1),
          fwd AS (SELECT s.a_id, MIN(s.b_id) AS b_id, MAX(s.cos) AS cos
            FROM scf s JOIN fmx m ON m.a_id = s.a_id
              AND s.cos IS NOT DISTINCT FROM m.best
            GROUP BY 1),
          mb AS (SELECT DISTINCT f.b_id, b.embedding, b.nrm
            FROM fwd f JOIN ab b ON b.id = f.b_id),
          as2 AS (SELECT id AS a2, embedding, nrm FROM ab
            WHERE lang = '$BtLangA'),
          scb AS MATERIALIZED (SELECT m.b_id, a.a2,
              ${cos("a.embedding", "m.embedding", "a.nrm", "m.nrm")} AS cos
            FROM as2 a CROSS JOIN mb m),
          bmx AS (SELECT b_id, MAX(cos) AS best FROM scb GROUP BY 1),
          bck AS (SELECT s.b_id, MIN(s.a2) AS back_a
            FROM scb s JOIN bmx m ON m.b_id = s.b_id
              AND s.cos IS NOT DISTINCT FROM m.best
            GROUP BY 1)
          SELECT f.a_id, f.b_id,
            CAST(floor(1000000 * f.cos) AS BIGINT) AS cos_ppm,
            CAST(CASE WHEN k.back_a = f.a_id THEN 1 ELSE 0 END AS BIGINT)
              AS mutual
          FROM fwd f JOIN bck k ON k.b_id = f.b_id
          ORDER BY a_id"""
      })

    /* L84: per-domain quota cap — the RefinedWeb/C4 "no single site
     * dominates the corpus" policy: rank each domain's docs by quality
     * (n_chars DESC, doc_id) and keep the top DomCap. The fixture has no
     * URLs (q89's lesson), so the domain assignment is a deterministic
     * skewed plant shared by both engines: h % 4 = 0 → domain 0 (~25% of
     * the corpus, the megasite), else one of DomTail tail domains — so
     * the cap fires on domain 0 at every gated SF while the tail passes
     * untouched (tail expectation ≤ ~0.85% of corpus per domain). At
     * 100 TB a megasite IS a mega-partition, so the top-Cap selection
     * runs as an exact SALTED two-level TakeOrdered instead of one
     * window over the domain: per (domain, salt in [0,16)) keep the
     * local top-Cap (largest sort partition = 1/16 of the megasite),
     * then the global top-Cap of the <= 16*Cap-row union per domain —
     * exact, because every global top-Cap doc is top-Cap within its own
     * salt — and every doc classifies kept/dropped via one join on
     * doc_id against the tiny kept set. No single-task sort anywhere;
     * the oracle keeps the plain one-window form (same semantics), so
     * the hash gate also proves the salted decomposition equals the
     * naive ranking. */
    val q152 = GraftQuery(
      "q152_domain_quota_cap", "L84 L24 L21",
      (s, d) => {
        val docs = withDomain(Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars")))
        docs.join(domainCapKeptIds(docs),
            col("doc_id") === col("kept_id"), "left")
          .withColumn("is_kept", col("kept_id").isNotNull)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("is_kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(!col("is_kept"), 1L).otherwise(0L)).as("n_dropped"),
            count_distinct(col("dom")).as("n_domains"),
            count_distinct(when(!col("is_kept"), col("dom")))
              .as("n_capped_domains"))
          .orderBy(col("source"))
      },
      Some {
        val h = Sketches.h64Sql("'dom:' || doc_id")
        s"""WITH dd AS (SELECT doc_id, source, n_chars,
              CASE WHEN $h % 4 = 0 THEN 0
                ELSE 1 + $h % $DomTail END AS dom
            FROM documents),
          rk AS (SELECT *, row_number() OVER (PARTITION BY dom
              ORDER BY n_chars DESC, doc_id) AS rk FROM dd)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN rk <= $DomCap THEN 1 ELSE 0 END) AS BIGINT)
              AS n_kept,
            CAST(SUM(CASE WHEN rk > $DomCap THEN 1 ELSE 0 END) AS BIGINT)
              AS n_dropped,
            CAST(COUNT(DISTINCT dom) AS BIGINT) AS n_domains,
            CAST(COUNT(DISTINCT CASE WHEN rk > $DomCap THEN dom END)
              AS BIGINT) AS n_capped_domains
          FROM rk GROUP BY 1 ORDER BY source"""
      })

    /* L85: Poisson-bootstrap confidence intervals on corpus statistics —
     * the error bars a 100 TB corpus report needs on every headline
     * number (one pass CANNOT be re-run B times at scale; the bootstrap
     * rides the same single pass): replicate b reweights each doc by
     * w = bit_count(h64(b||":bs:"||doc_id) & 15) ~ Binomial(4, 1/2)
     * (mean 2 — the integer Poisson(1) stand-in), so per-(source, b)
     * weighted totals are exact BIGINTs, and the per-source spread of
     * the R replicate totals IS the sampling-uncertainty estimate. All
     * integer: boot_mean divides by 2R, min/max by 2, and the sum of
     * squares rides out for variance evidence — no float enters the
     * gate. At 100 TB: the explode is a constant R× map-side multiply
     * collapsed immediately by a map-side-combined (source, b) aggregate
     * — |sources|·R rows cross the only shuffle. */
    val q153 = GraftQuery(
      "q153_bootstrap_ci", "L85 L30",
      (s, d) => {
        bootstrapReplicates(Tables.documents(s, d))
          .groupBy(col("source"))
          .agg(max(col("nd")).as("n_docs"),
            max(col("exact_chars")).as("exact_chars"),
            expr(s"sum(t2) div ${2 * BootReps}").as("boot_mean_chars"),
            expr("min(t2) div 2").as("boot_min_chars"),
            expr("max(t2) div 2").as("boot_max_chars"),
            sum(col("t2") * col("t2")).as("boot_ssq"))
          .orderBy(col("source"))
      },
      Some {
        val h = Sketches.h64Sql("b || ':bs:' || doc_id")
        s"""WITH r AS (SELECT doc_id, source, n_chars, b
            FROM documents CROSS JOIN
              (SELECT unnest(generate_series(1, $BootReps)) AS b) bs),
          wr AS (SELECT source, b,
              CAST(COUNT(*) AS BIGINT) AS nd,
              CAST(SUM(n_chars) AS BIGINT) AS exact_chars,
              CAST(SUM(bit_count($h & 15) * n_chars) AS BIGINT) AS t2
            FROM r GROUP BY 1, 2)
          SELECT source, MAX(nd) AS n_docs,
            MAX(exact_chars) AS exact_chars,
            CAST(SUM(t2) AS BIGINT) // ${2 * BootReps} AS boot_mean_chars,
            MIN(t2) // 2 AS boot_min_chars,
            MAX(t2) // 2 AS boot_max_chars,
            CAST(SUM(t2 * t2) AS BIGINT) AS boot_ssq
          FROM wr GROUP BY 1 ORDER BY source"""
      })

    Seq(q150, q151, q152, q153)
  }
}
