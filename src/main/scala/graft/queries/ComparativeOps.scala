package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Comparative-audit operators (SURVEY §2.11a, L144–L146):
  *
  *  - L144 shard-routing scheme bake-off        → q212
  *  - L145 lexical-overlap source matrix        → q213
  *  - L146 length-conditioned quality audit     → q214
  *
  * Reads that compare ALTERNATIVES the other tiers treat as given:
  * the three shard-routing schemes an infra team actually weighs
  * (hash-mod, rendezvous/HRW, consistent-ring-with-vnodes) measured
  * on the SAME document population for load spread — mod balances
  * best but moves everything on resize, HRW moves 1/n, the ring moves
  * an arc; the bake-off prices what the resize-friendliness costs in
  * balance (L111/L130 study each scheme alone, this lays them side by
  * side); which SOURCES share a register (Jaccard overlap of their
  * top-64 word sets — the lexical cousin of L29's content overlap:
  * two sources can share zero documents yet be the same kind of
  * text); and whether the trained quality score is secretly a length
  * detector (per length-octave score/positive-rate profile — the
  * confounder audit run before anyone gates on the score).
  *
  * Determinism: routing owners ride quantized total orders (the q198
  * 8-step trick — no struct/argmax comparisons an engine could order
  * differently), top-k sets are (count, word) total orders, and the
  * quality profile reuses the registered L86 kernel.
  */
object ComparativeOps {

  /** L144 geometry: 8 shards for every scheme; the ring probes the
    * q198 kernel's 16-vnode dial point (its best-spread setting).
    */
  private[queries] val BakeShards = 8L
  private[queries] val BakeVnodes = 16L

  /** L145 register-profile depth: the top this-many words per source. */
  private[queries] val LexTopK = 64

  def all: Seq[GraftQuery] = {

    /* L144: shard-routing bake-off — hash-mod vs rendezvous (HRW) vs
     * consistent ring with vnodes, all routing the SAME documents to
     * 8 shards: per (scheme, shard) the load and share, plus each
     * scheme's peak-to-mean ratio (the number a capacity planner
     * reads — peak shard sizing is what overload actually costs).
     * Constructions are the registered kernels' own: the mod and ring
     * schemes hash the doc at "pos:"‖id (q198's position), HRW scores
     * shards at "hrw:"‖s‖":"‖id (q179's key), and every owner is a
     * pure function of quantized total orders — HRW's argmax is
     * max((h div 8)·8 + s) % 8, the ring's first-clockwise-vnode is
     * the q198 two-tier conditional min — so no engine can disagree
     * on ties. At 100 TB: two 8- and 128-row broadcast folds per doc
     * and three |shards|-row rollups; production evaluates each fold
     * as one expression (the q198 stance). */
    val q212 = GraftQuery(
      "q212_routing_bakeoff", "L144 L111 L130 L81",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
          .withColumn("pd",
            Sketches.h64(concat(lit("pos:"), col("doc_id"))))
        val modOwn = docs.select(col("doc_id"),
          lit("mod").as("scheme"), (col("pd") % BakeShards).as("shard"))
        val hrw = docs.select(col("doc_id"),
            explode(sequence(lit(0L), lit(BakeShards - 1L))).as("s"))
          .withColumn("h", Sketches.h64(concat(lit("hrw:"), col("s"),
            lit(":"), col("doc_id"))))
          .withColumn("rq", expr("(h div 8) * 8 + s"))
          .groupBy(col("doc_id"))
          .agg(max(col("rq")).as("rmax"))
          .select(col("doc_id"), lit("hrw").as("scheme"),
            (col("rmax") % BakeShards).as("shard"))
        val vn = s.range(BakeShards).select(col("id").as("sh"))
          .crossJoin(s.range(BakeVnodes).select(col("id").as("v")))
          .withColumn("h", Sketches.h64(concat(lit("ring:"), col("sh"),
            lit(":"), col("v"))))
          .select(expr("(h div 8) * 8 + sh").as("r"))
        val ring = docs
          .select(col("doc_id"), expr("(pd div 8) * 8").as("p"))
          .crossJoin(broadcast(vn))
          .groupBy(col("doc_id"), col("p"))
          .agg(coalesce(min(when(col("r") >= col("p"), col("r"))),
            min(col("r"))).as("own"))
          .select(col("doc_id"), lit("ring").as("scheme"),
            (col("own") % BakeShards).as("shard"))
        val loads = modOwn.unionByName(hrw).unionByName(ring)
          .groupBy(col("scheme"), col("shard"))
          .agg(count(lit(1)).as("load"))
        val wsch = Window.partitionBy(col("scheme"))
        loads
          .withColumn("n_docs", sum(col("load")).over(wsch))
          .withColumn("share_ppm",
            expr("(load * 1000000) div greatest(n_docs, 1)"))
          .withColumn("peak_to_mean_ppm", expr(
            s"(max(load) over (partition by scheme) * $BakeShards " +
              "* 1000000) div greatest(n_docs, 1)"))
          .select(col("scheme"), col("shard"), col("load"),
            col("share_ppm"), col("peak_to_mean_ppm"))
          .orderBy(col("scheme"), col("shard"))
      },
      Some {
        val pd = Sketches.h64Sql("'pos:' || doc_id")
        val hh = Sketches.h64Sql("'hrw:' || s || ':' || doc_id")
        val vh = Sketches.h64Sql("'ring:' || sh || ':' || v")
        s"""WITH dp AS (SELECT doc_id, $pd AS pd FROM documents),
          mo AS (SELECT doc_id, 'mod' AS scheme,
              pd % $BakeShards AS shard FROM dp),
          hc AS (SELECT doc_id, s, ($hh // 8) * 8 + s AS rq
            FROM documents, generate_series(0, ${BakeShards - 1}) t(s)),
          ho AS (SELECT doc_id, 'hrw' AS scheme,
              CAST(MAX(rq) AS BIGINT) % $BakeShards AS shard
            FROM hc GROUP BY 1),
          vn AS (SELECT ($vh // 8) * 8 + sh AS r
            FROM generate_series(0, ${BakeShards - 1}) a(sh),
              generate_series(0, ${BakeVnodes - 1}) b(v)),
          ro AS (SELECT doc_id, 'ring' AS scheme,
              COALESCE(MIN(CASE WHEN vn.r >= (dp.pd // 8) * 8
                  THEN vn.r END), MIN(vn.r)) % $BakeShards AS shard
            FROM dp, vn GROUP BY 1),
          lo AS (SELECT scheme, shard, CAST(COUNT(*) AS BIGINT) AS load
            FROM (SELECT * FROM mo UNION ALL SELECT * FROM ho
              UNION ALL SELECT * FROM ro) GROUP BY 1, 2)
          SELECT scheme, shard, load,
            (load * 1000000) // GREATEST(CAST(SUM(load) OVER
              (PARTITION BY scheme) AS BIGINT), 1) AS share_ppm,
            (CAST(MAX(load) OVER (PARTITION BY scheme) AS BIGINT)
              * $BakeShards * 1000000) // GREATEST(CAST(SUM(load) OVER
              (PARTITION BY scheme) AS BIGINT), 1) AS peak_to_mean_ppm
          FROM lo ORDER BY scheme, shard"""
      })

    /* L145: lexical-overlap source matrix — which sources are the
     * same KIND of text: each source's register profile is its top-64
     * words by (count, word) total order, and every source pair gets
     * the Jaccard overlap of the two sets. The lexical cousin of
     * L29's content-overlap matrix (two sources can share zero
     * documents yet the same register — both matter to mixture
     * planning: L29 prices dedup, this prices redundancy of KIND) and
     * the pairwise form of L28's rarity profiling. Zero-overlap pairs
     * carry no row (the observed-pairs convention). At 100 TB: the
     * profiles are |sources|·64 rows — the pair join is a broadcast
     * self-join on word; the per-source rank window partitions by
     * source over the vocab agg. */
    val q213 = GraftQuery(
      "q213_lexical_overlap_matrix", "L145 L29 L28 L51",
      (s, d) => {
        val top = Tables.documents(s, d)
          .select(col("source"),
            explode(Sketches.words(col("text"))).as("w"))
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("c"))
          .withColumn("rk", row_number().over(Window
            .partitionBy(col("source"))
            .orderBy(col("c").desc, col("w"))).cast("long"))
          .filter(col("rk") <= LexTopK)
          .select(col("source"), col("w"))
        val sizes = top.groupBy(col("source"))
          .agg(count(lit(1)).as("nset"))
        val pairs = top.as("a")
          .join(top.as("b"), col("a.w") === col("b.w") &&
            col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"),
            col("b.source").as("src_b"))
          .agg(count(lit(1)).as("n_common"))
        pairs
          .join(broadcast(sizes.select(col("source").as("src_a"),
            col("nset").as("na"))), Seq("src_a"))
          .join(broadcast(sizes.select(col("source").as("src_b"),
            col("nset").as("nb"))), Seq("src_b"))
          .withColumn("jaccard_ppm", expr(
            "(n_common * 1000000) div greatest(na + nb - n_common, 1)"))
          .select(col("src_a"), col("src_b"), col("na"), col("nb"),
            col("n_common"), col("jaccard_ppm"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        s"""WITH sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT source, unnest($ws) AS w FROM documents)
            GROUP BY 1, 2),
          top AS (SELECT source, w FROM (SELECT source, w,
              row_number() OVER (PARTITION BY source
                ORDER BY c DESC, w) AS rk FROM sw)
            WHERE rk <= $LexTopK),
          sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nset
            FROM top GROUP BY 1),
          pr AS (SELECT a.source AS src_a, b.source AS src_b,
              CAST(COUNT(*) AS BIGINT) AS n_common
            FROM top a JOIN top b
              ON b.w = a.w AND a.source < b.source
            GROUP BY 1, 2)
          SELECT pr.src_a, pr.src_b, za.nset AS na, zb.nset AS nb,
            pr.n_common,
            (pr.n_common * 1000000)
              // GREATEST(za.nset + zb.nset - pr.n_common, 1)
              AS jaccard_ppm
          FROM pr JOIN sz za ON za.source = pr.src_a
            JOIN sz zb ON zb.source = pr.src_b
          ORDER BY src_a, src_b"""
      })

    /* L146: length-conditioned quality audit — is the trained quality
     * score secretly a length detector? NB log-odds sum over words,
     * so longer documents mechanically swing further from zero; a
     * threshold chosen on the pooled score silently becomes a length
     * filter. The audit conditions the score on the length octave
     * (ilog2(n_chars) — the L30/L124 bucket convention): per
     * (source, octave), docs, planted positives, mean score and
     * positive-decision rate. A mean score that marches monotonically
     * with octave inside every source is the confounder showing; flat
     * profiles clear the score for threshold use (the calibration
     * companion to q188's confidence-binned read — same kernel,
     * orthogonal conditioning variable). At 100 TB: the L86 passes +
     * one n_chars column join and a ≤12·|sources|-row rollup. */
    val q214 = GraftQuery(
      "q214_length_quality_audit", "L146 L86 L30",
      (s, d) => {
        val nc = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        TrainedFilterOps.nbDocScores(s, d)
          .join(nc, Seq("doc_id"))
          .withColumn("octave", Sketches.ilog2(col("n_chars")))
          .groupBy(col("source"), col("octave"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("pos")).as("n_pos"),
            sum(col("score")).as("ss"),
            sum(when(col("score") > 0, 1L).otherwise(0L))
              .as("n_decide_pos"))
          .withColumn("avg_score", expr("ss div n_docs"))
          .withColumn("decide_pos_ppm",
            expr("(n_decide_pos * 1000000) div n_docs"))
          .select(col("source"), col("octave"), col("n_docs"),
            col("n_pos"), col("avg_score"), col("decide_pos_ppm"))
          .orderBy(col("source"), col("octave"))
      },
      Some {
        val lg = Sketches.ilog2Sql("d.n_chars")
        s"""WITH ${TrainedFilterOps.nbScoreCtesSql},
          jo AS (SELECT sc.source, sc.pos, sc.score, $lg AS octave
            FROM sc JOIN documents d ON d.doc_id = sc.doc_id),
          ag AS (SELECT source, octave,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(pos) AS BIGINT) AS n_pos,
              CAST(SUM(score) AS BIGINT) AS ss,
              CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_decide_pos
            FROM jo GROUP BY 1, 2)
          SELECT source, octave, n_docs, n_pos,
            ss // n_docs AS avg_score,
            (n_decide_pos * 1000000) // n_docs AS decide_pos_ppm
          FROM ag ORDER BY source, octave"""
      })

    Seq(q212, q213, q214)
  }
}
