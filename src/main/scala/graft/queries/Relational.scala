package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import OracleParity._

/** Relational core: scan → filter → aggregate → join → sort pipelines
  * mirroring the reference's batch analytics (SURVEY §2.3–§2.7).
  *
  * Reference semantics covered (citations into /root/reference/):
  *  - A1 per-region rollup            power-outages/server.js:78-139
  *  - A2 multi-accumulator city agg   power-outages/server.js:161-240
  *  - A3 grand-total summary          power-outages/server.js:246-250
  *  - A8 group counts sorted desc     display-proxy/index.html:441-467
  *  - J4 broadcast lookup join        power-outages/icp-data.js:27-41
  *  - J6 left join + unmatched class  power-outages/server.js:343-372
  *  - J9/U3 dedup by business key     power-outages/scrapers/aurora.js:18-26
  *  - U1 union of normalized sources  power-outages/server.js:144-146
  *  - F5/F6 predicate filters         power-outages/server.js:83-87, 517-536
  *  - O1/O2 sorts                     power-outages/server.js:141, 240
  *
  * Scale notes: every aggregation here is a partial→final hash aggregate
  * (map-side combine); dimension joins (`nation`, `region`) are broadcast so
  * the fact side never shuffles for enrichment. Sorts are only on already-
  * aggregated (small) outputs.
  */
object Relational {

  /** A1/A3-style pricing rollup (TPC-H Q1 shape) over lineitem. */
  val q01 = GraftQuery(
    "q01_pricing_rollup", "A1 A3 F5 O1",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1999-06-01").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // the product sum carries scale 8, whose scaled integer exceeds
          // 2^53 at sf ≥ 0.1 — DuckDB's decimal→double (int/10^scale in
          // float arithmetic) then rounds differently from Spark's exact
          // BigDecimal conversion by 1 ulp. Rounding to scale 4 first
          // keeps the scaled integer < 2^53 — both conversions then round
          // identically — until a group sum passes ~9.0e11 (2^53/10^4,
          // far beyond these fixtures); past that, compare at a coarser
          // scale or as decimal.
          sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
            .cast(DecimalType(38, 4))
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-06-01'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** A2 multi-accumulator aggregation: count/sum/min/max plus an
    * order-canonicalized collect_set joined to a string (the reference's
    * `causes`/`outageTypes` accumulators; set order is made deterministic via
    * sort, a documented divergence from JS insertion order — SURVEY §7.3.4).
    */
  val q02 = GraftQuery(
    "q02_multi_accumulator", "A2 O2",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_total"),
          unix_millis(min(col("o_orderdate")).cast("timestamp")).as("min_date_ms"),
          unix_millis(max(col("o_orderdate")).cast("timestamp")).as("max_date_ms"),
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total,
      epoch_ms(MIN(o_orderdate)) AS min_date_ms,
      epoch_ms(MAX(o_orderdate)) AS max_date_ms,
      string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** A8/O6 group-count ranking (contact group chips). */
  val q03 = GraftQuery(
    "q03_group_count_rank", "A8 A9 A10 A11 O6",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type")),
    Some("""SELECT event_type, COUNT(*) AS n FROM events
      GROUP BY event_type ORDER BY n DESC, event_type"""))

  /** J4/A1: broadcast dimension join chain + rollup (customer→nation→region),
    * the ICP-lookup join pattern. Dimensions are tiny → `broadcast()` hints
    * keep the fact-side scan shuffle-free.
    */
  val q04 = GraftQuery(
    "q04_broadcast_enrich_rollup", "J4 J2 A1",
    (s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** F13-style semi join: keys with at least one match (channel membership). */
  val q05 = GraftQuery(
    "q05_semi_join", "F13",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 50000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000)
      ORDER BY c_custkey"""))

  /** U4/J6 anti join: the `NOT_FEASIBLE_REGIONS` unmatched-side split. */
  val q06 = GraftQuery(
    "q06_anti_join", "U4 J6 K4",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      ORDER BY c_custkey"""))

  /** U1/P3: two differently-shaped "sources" normalized to a common schema
    * then unionByName (the 8-scraper union). One branch renames and reorders
    * columns, the other adds a missing column → allowMissingColumns, exactly
    * the heterogenous-scraper situation.
    */
  val q07 = GraftQuery(
    "q07_union_normalize", "U1 P3",
    (s, d) => {
      val o = Tables.orders(s, d)
      val srcA = o.filter(col("o_orderstatus") === "O")
        .select(
          col("o_orderkey").as("id"),
          col("o_totalprice").as("amount"),
          lit("open-feed").as("src"))
      val srcB = o.filter(col("o_orderstatus") === "F")
        .select(
          lit("closed-feed").as("src"),
          col("o_orderkey").as("id")) // no amount column in this source
      srcA.unionByName(srcB, allowMissingColumns = true)
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n"), dsum(coalesce(col("amount"), lit(0))).as("total"))
        .orderBy(col("src"))
    },
    Some("""WITH u AS (
        SELECT o_orderkey AS id, o_totalprice AS amount, 'open-feed' AS src
          FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_orderkey AS id, NULL AS amount, 'closed-feed' AS src
          FROM orders WHERE o_orderstatus = 'F')
      SELECT src, COUNT(*) AS n,
        CAST(SUM(CAST(COALESCE(amount, 0) AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM u GROUP BY src ORDER BY src"""))

  /** Global summary envelope numbers (A3): one-row grand totals. */
  val q08 = GraftQuery(
    "q08_grand_total", "A3 K1",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.agg(
        count(lit(1)).as("total_rows"),
        dsum(col("l_quantity")).as("total_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    },
    Some("""SELECT COUNT(*) AS total_rows,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
      COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem"""))

  val all: Seq[GraftQuery] = Seq(q01, q02, q03, q04, q05, q06, q07, q08)
}
