package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Sketches

/** Web-corpus hygiene operators (SURVEY §2.11a, L91–L92):
  *
  *  - L91 URL canonicalization dedup (FineWeb-style)   → q159
  *  - L92 soft dedup (1/cluster-size weighting)         → q160
  *
  * L91 is the dedup stage web pipelines run BEFORE any content dedup
  * (one fetch of the same page under four spellings is one document);
  * L92 is the alternative to dropping content duplicates — keep them
  * all, downweight each by its cluster size so the training
  * distribution is as if deduplicated while rare phrasing variants
  * survive.
  */
object WebCorpusOps {

  /** L91 planted URL spellings: four raw variants per base page,
    * engineered so canonicalization collapses them into exactly TWO
    * canonical URLs per base (the no-param pair and the
    * param-order pair) — scheme, case, www., fragment, trailing slash
    * and query-param order must all normalize away. One Scala
    * constant family interpolated into both engines (the q87/q89
    * plant convention — the corpus has no organic URLs).
    */
  private[queries] val UrlBaseMod = 97L

  /** L92's cluster kernel factored out of q160 so downstream audits
    * (the q202 effective-sample-size read, the q208 provenance
    * attribution) consume the REGISTERED weighting, not a copy: every
    * doc joined with its exact canonical-bag cluster key (L2/q97's
    * key) and that cluster's size. Frame:
    * (doc_id, source, n_chars, ck, csz). At 100 TB: one hash
    * aggregate on the cluster key + one join back (co-located under a
    * ck-bucketed K8 layout).
    */
  private[graft] def clusterSizes(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"),
        Sketches.h64(array_join(sort_array(array_distinct(
          Sketches.words(col("text")))), " ")).as("ck"))
    val cl = docs.groupBy(col("ck")).agg(count(lit(1)).as("csz"))
    docs.join(cl, Seq("ck"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("ck"),
        col("csz"))
  }

  /** DuckDB twin of [[clusterSizes]] as CTEs ending in
    * `cj(doc_id, source, n_chars, ck, csz)`.
    */
  private[queries] def clusterCtesSql: String = {
    val ck = Sketches.h64Sql(
      s"array_to_string(list_sort(list_distinct(${Sketches.wordsSql("text")})), ' ')")
    s"""docs AS (SELECT doc_id, source, n_chars, $ck AS ck
          FROM documents),
      cl AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS csz
        FROM docs GROUP BY 1),
      cj AS (SELECT d.doc_id, d.source, d.n_chars, d.ck, cl.csz
        FROM docs d JOIN cl ON cl.ck = d.ck)"""
  }

  def all: Seq[GraftQuery] = {

    /* L91: URL canonicalization dedup — the first dedup of a web corpus
     * build: the same page arrives under many spellings (scheme, host
     * case, www., fragments, trailing slashes, query-param order), and
     * URL-level dedup collapses them before any content hashing runs.
     * Canonical = lowercase host without www., path without its
     * trailing slash, query params SORTED — scheme and fragment
     * dropped. The plant gives each base page four spellings across
     * four consecutive doc_ids: v0 plain https, v1 http + WWW. + mixed
     * case + fragment, v2 trailing slash + params (b=2&a=1), v3 the
     * same params pre-sorted — so v0/v1 MUST collapse and v2/v3 MUST
     * collapse, but the two pairs stay distinct (params are part of
     * page identity). The gate hashes the canonical STRINGS (portable
     * checksum), not just counts, so a canonicalization that mangles
     * one byte diverges. Keeper = min doc_id per canonical. At 100 TB:
     * map-side string normalization, one hash aggregate on the
     * canonical key, |sources|-row rollup. */
    val q159 = GraftQuery(
      "q159_url_canonical_dedup", "L91 L1 L24",
      (s, d) => {
        val b = expr(s"(doc_id div 4) % $UrlBaseMod")
        val base = concat(lit("site"), b.cast("string"),
          lit(".example.com/p"), b.cast("string"))
        val baseUp = concat(lit("Site"), b.cast("string"),
          lit(".Example.COM/p"), b.cast("string"))
        val raw = when(col("doc_id") % 4 === 0,
            concat(lit("https://"), base))
          .when(col("doc_id") % 4 === 1,
            concat(lit("http://WWW."), baseUp, lit("#frag")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("https://"), base, lit("/?b=2&a=1")))
          .otherwise(concat(lit("https://"), base, lit("?a=1&b=2")))
        val canon = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), raw.as("url"))
          // drop fragment, then scheme
          .withColumn("rest", regexp_replace(
            regexp_replace(col("url"), "#.*$", ""), "^https?://", ""))
          .withColumn("host", regexp_replace(
            lower(substring_index(col("rest"), "/", 1)), "^www\\.", ""))
          .withColumn("pq", expr("substring(rest, instr(rest, '/'))"))
          .withColumn("p", when(col("pq").contains("?"),
              substring_index(col("pq"), "?", 1)).otherwise(col("pq")))
          .withColumn("p", regexp_replace(col("p"), "/$", ""))
          .withColumn("qs", when(col("pq").contains("?"),
            expr("substring(pq, instr(pq, '?') + 1)")).otherwise(lit("")))
          .withColumn("canon", concat(col("host"), col("p"),
            when(col("qs") =!= "", concat(lit("?"),
              array_join(sort_array(split(col("qs"), "&")), "&")))
              .otherwise(lit(""))))
        val keeper = canon.groupBy(col("canon"))
          .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("csz"))
        canon.join(keeper, Seq("canon"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_urls"),
            count_distinct(col("canon")).as("n_canonical"),
            sum(when(col("doc_id") === col("keeper"), 1L).otherwise(0L))
              .as("n_kept"),
            sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L))
              .as("n_url_dups"),
            sum(Sketches.h64(col("canon")) % lit(1000003L))
              .as("canon_hash_sum"))
          .orderBy(col("source"))
      },
      Some {
        val h = Sketches.h64Sql("cn.canon")
        s"""WITH u AS (SELECT doc_id, source,
              CASE
                WHEN doc_id % 4 = 0 THEN 'https://site' ||
                  ((doc_id // 4) % $UrlBaseMod) || '.example.com/p' ||
                  ((doc_id // 4) % $UrlBaseMod)
                WHEN doc_id % 4 = 1 THEN 'http://WWW.Site' ||
                  ((doc_id // 4) % $UrlBaseMod) || '.Example.COM/p' ||
                  ((doc_id // 4) % $UrlBaseMod) || '#frag'
                WHEN doc_id % 4 = 2 THEN 'https://site' ||
                  ((doc_id // 4) % $UrlBaseMod) || '.example.com/p' ||
                  ((doc_id // 4) % $UrlBaseMod) || '/?b=2&a=1'
                ELSE 'https://site' || ((doc_id // 4) % $UrlBaseMod) ||
                  '.example.com/p' || ((doc_id // 4) % $UrlBaseMod) ||
                  '?a=1&b=2'
              END AS url
            FROM documents),
          r1 AS (SELECT doc_id, source,
              regexp_replace(regexp_replace(url, '#.*$$', ''),
                '^https?://', '') AS rest FROM u),
          r2 AS (SELECT doc_id, source,
              regexp_replace(lower(split_part(rest, '/', 1)),
                '^www\\.', '') AS host,
              substring(rest, instr(rest, '/')) AS pq FROM r1),
          r3 AS (SELECT doc_id, source, host,
              regexp_replace(CASE WHEN contains(pq, '?')
                THEN split_part(pq, '?', 1) ELSE pq END, '/$$', '') AS p,
              CASE WHEN contains(pq, '?')
                THEN substring(pq, instr(pq, '?') + 1) ELSE '' END AS qs
            FROM r2),
          cn AS (SELECT doc_id, source, host || p ||
              CASE WHEN qs <> '' THEN '?' ||
                array_to_string(list_sort(string_split(qs, '&')), '&')
              ELSE '' END AS canon FROM r3),
          kp AS (SELECT canon, MIN(doc_id) AS keeper FROM cn GROUP BY 1)
          SELECT cn.source, COUNT(*) AS n_urls,
            CAST(COUNT(DISTINCT cn.canon) AS BIGINT) AS n_canonical,
            CAST(SUM(CASE WHEN cn.doc_id = kp.keeper THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept,
            CAST(SUM(CASE WHEN cn.doc_id <> kp.keeper THEN 1 ELSE 0 END)
              AS BIGINT) AS n_url_dups,
            CAST(SUM($h % 1000003) AS BIGINT) AS canon_hash_sum
          FROM cn JOIN kp ON kp.canon = cn.canon
          GROUP BY 1 ORDER BY cn.source"""
      })

    /* L92: soft dedup — the alternative to DROPPING content duplicates:
     * keep every doc, weight each by 1/|its duplicate cluster| (ppm
     * fixed point), so the training distribution matches the
     * deduplicated corpus in expectation while rare phrasing variants
     * survive (the technique used when hard dedup measurably hurts).
     * Clusters are the canonical bag-of-words family (L2/q97's exact
     * key). The per-source report: docs in multi-doc clusters, the
     * summed weight (≈ the deduplicated-equivalent doc count, in ppm)
     * and effective chars (Σ n_chars·w div 1e6) against raw chars. At
     * 100 TB: one hash aggregate on the cluster key, one join back
     * (co-located under a ck-bucketed K8 layout), map-side rollup. */
    val q160 = GraftQuery(
      "q160_soft_dedup_weights", "L92 L2 L21",
      (s, d) => {
        clusterSizes(s, d)
          .withColumn("w_ppm", expr("1000000 div csz"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("csz") >= 2, 1L).otherwise(0L))
              .as("n_in_multi_clusters"),
            sum(col("w_ppm")).as("sum_weight_ppm"),
            sum(col("n_chars")).as("raw_chars"),
            expr("sum(n_chars * w_ppm) div 1000000").as("effective_chars"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH $clusterCtesSql,
          j AS (SELECT source, n_chars, csz,
              1000000 // csz AS w_ppm
            FROM cj)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN csz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_in_multi_clusters,
            CAST(SUM(w_ppm) AS BIGINT) AS sum_weight_ppm,
            CAST(SUM(n_chars) AS BIGINT) AS raw_chars,
            CAST(SUM(n_chars * w_ppm) AS BIGINT) // 1000000
              AS effective_chars
          FROM j GROUP BY 1 ORDER BY source"""
      })

    Seq(q159, q160)
  }
}
