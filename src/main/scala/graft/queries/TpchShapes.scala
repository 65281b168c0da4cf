package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.io.CacheScope.Persisted
import graft.io.Tables

/** The remaining TPC-H query shapes (Q2/4/7/8/9/11/12/13/15/16/17/20/21/22),
  * adapted to the harness schema: there is no `partsupp` table, so the
  * distinct (l_partkey, l_suppkey) pairs of `lineitem` stand in as the
  * part-supplier link, and `lineitem` lacks commit/receipt dates, so the
  * late-delivery predicates become `l_returnflag = 'R'`. Every query keeps
  * the *plan shape* that makes the original interesting at scale:
  * correlated scalar subqueries, global-threshold HAVING, double-correlated
  * EXISTS / NOT EXISTS, left-join histograms, group-then-semi-join.
  *
  * Determinism: money sums accumulate in DECIMAL (`dec_cast`) and surface
  * as DOUBLE; products that would FMA-contract in DuckDB (a*b - c*d) are
  * snapped to DECIMAL before the subtraction; every LIMIT carries a total
  * tie-broken ordering.
  */
object TpchShapes {

  private val dec2 = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Size-derived broadcast hint for the O(SF) dimension SLICES
    * (VERDICT r13 #6, the "hint only when the slice's estimated rows
    * clear a budget" option): the hint is forced only while the
    * SOURCE table's cached row count stays under `budgetRows` — the
    * slice is strictly smaller than its table, so a gated hint can
    * never pin a frame that outgrew the budget. Past the budget the
    * join goes UNHINTED and AQE derives the strategy from runtime
    * sizes (the r14 first cut dropped the hints entirely; at sf0.1
    * that costs one extra AQE stage per join — q_tpch_q11 measured
    * +0.44 s — for no scale benefit over the gate). 2M rows ≈ tens of
    * MB for these dims: comfortably broadcastable, far under any
    * 100 TB table. PlanShapeSpec proves the budget-0 branch drops the
    * hint; the bounded-broadcast audit classifies the gated slices by
    * re-deriving the same row-count test. */
  private[graft] final val DimHintBudgetRows = 2_000_000L
  private[graft] def hintIfSmall(
      s: SparkSession, dir: String, table: String, df: DataFrame,
      budgetRows: Long = DimHintBudgetRows): DataFrame =
    if (Tables.rowCount(s, dir, table) <= budgetRows) broadcast(df) else df

  /** DECIMAL-accumulated sum surfaced as DOUBLE (see Relational.dsum). */
  private def dsum(c: Column, dt: DecimalType = dec2): Column =
    sum(call_function("dec_cast", c.cast("double"), lit(dt.precision), lit(dt.scale)))
      .cast(dt).cast("double")

  /** Same accumulation kept as DECIMAL (for exact comparisons/max). */
  private def dsumDec(c: Column, dt: DecimalType = dec4): Column =
    sum(call_function("dec_cast", c.cast("double"), lit(dt.precision), lit(dt.scale)))
      .cast(dt)

  val queries: Seq[Q] = Seq(

    // ---- Q2 shape: min-cost supplier per part in a region ------------------
    // partsupp surrogate: per (part, supplier) minimum unit price observed
    // in lineitem. The load-bearing shape is the correlated min subquery
    // (here: a broadcast min-per-part rejoin) under a region-scoped join
    // chain. cost is a min of per-row IEEE doubles — order-independent,
    // safe to hash.
    Q(
      "q_tpch_q2",
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey
        |), eur AS (
        |  SELECT l_partkey, cost, s_name, s_acctbal, n_name
        |  FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
        |FROM part JOIN eur ON p_partkey = l_partkey
        |WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'LARGE'
        |  AND cost = (SELECT min(cost) FROM eur e2 WHERE e2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 20""") { (s, dir) =>
      val ps = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      val eur = ps
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("l_partkey"), col("cost"), col("s_name"), col("s_acctbal"), col("n_name"))
        .persistScoped() // feeds the min-per-part side and the winner join
      val minc = eur.groupBy(col("l_partkey").as("m_part"))
        .agg(min(col("cost")).as("mincost"))
      t(s, dir, "part").filter(col("p_size").isin(5, 15, 25, 35, 45) && col("p_type") === "LARGE")
        .join(eur, col("p_partkey") === col("l_partkey"))
        // UNHINTED: min-per-part grows with |part x supplier| — a forced
        // broadcast here is the O(data) hint class round 7 removed; AQE
        // still broadcasts it at small scale from observed sizes
        .join(minc,
          col("p_partkey") === col("m_part") && col("cost") === col("mincost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("cost"))
        .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
        .limit(20)
    },

    // ---- Q4 shape: order priority checking (EXISTS -> semi join) -----------
    Q(
      "q_tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""") { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },

    // ---- Q7 shape: volume shipping between two nations ---------------------
    // Two broadcast joins against the same dim under different roles; the
    // symmetric nation-pair OR predicate lands on the joined stream.
    Q(
      "q_tpch_q7",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
        |) GROUP BY supp_nation, cust_nation, l_year""") { (s, dir) =>
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") <= lit("1997-12-31").cast("timestamp_ntz"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), dec4).as("revenue"))
    },

    // ---- Q8 shape: national market share -----------------------------------
    // Ratio of two DECIMAL-accumulated sums over the same joined stream;
    // the division happens once per group on exact doubles, identically
    // in both engines.
    Q(
      "q_tpch_q8",
      """SELECT o_year,
        |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN vol_dec
        |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS DOUBLE)
        |  / CAST(CAST(sum(vol_dec) AS DECIMAL(18,4)) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS vol_dec,
        |    n1.n_name AS supp_nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |    JOIN region ON n2.n_regionkey = r_regionkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |) GROUP BY o_year""") { (s, dir) =>
      val n1 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_regionkey").as("n2_region"))
      val vol = call_function("dec_cast",
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("double"),
        lit(18), lit(4)).cast(dec4)
      t(s, dir, "lineitem")
        // size-derived hint on the O(SF) part slice (see hintIfSmall)
        .join(hintIfSmall(s, dir, "part",
            t(s, dir, "part").filter(col("p_type") === "ECONOMY")),
          col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n2_region") === col("r_regionkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .select(year(col("o_orderdate")).as("o_year"), vol.as("vol_dec"), col("supp_nation"))
        .groupBy(col("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_1", col("vol_dec"))
          .otherwise(lit(BigDecimal(0)).cast(dec4))).cast(dec4).cast("double")
          / sum(col("vol_dec")).cast(dec4).cast("double")).as("mkt_share"))
    },

    // ---- Q9 shape: product-type profit by nation and year ------------------
    // profit surrogate (no ps_supplycost): revenue minus a 10%-of-retail
    // cost estimate. Both products snap to DECIMAL *before* the
    // subtraction — a*b - c*d is exactly the shape DuckDB FMA-contracts.
    Q(
      "q_tpch_q9",
      """SELECT nation, o_year,
        |  CAST(CAST(sum(amount) AS DECIMAL(18,4)) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |    CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |      - CAST(0.1 * p_retailprice * l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS amount
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_type = 'PROMO'
        |) GROUP BY nation, o_year""") { (s, dir) =>
      val revenue = call_function("dec_cast",
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("double"),
        lit(18), lit(4)).cast(dec4)
      val cost = call_function("dec_cast",
        (lit(0.1) * col("p_retailprice") * col("l_quantity")).cast("double"),
        lit(18), lit(4)).cast(dec4)
      t(s, dir, "lineitem")
        .join(hintIfSmall(s, dir, "part", // size-derived hint, O(SF) slice
            t(s, dir, "part").filter(col("p_type") === "PROMO")),
          col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"),
          (revenue - cost).cast(dec4).as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("amount")).cast(dec4).cast("double").as("sum_profit"))
    },

    // ---- Q11 shape: important parts (global-scalar HAVING) -----------------
    // Per-part value vs a fraction of the corpus-wide total: the total is
    // an exact DECIMAL sum over the per-part DECIMALs, broadcast back as
    // one scalar — the group-by stream is never re-scanned.
    Q(
      "q_tpch_q11",
      """WITH val AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS vdec
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_5', 'NATION_6', 'NATION_7', 'NATION_8')
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS ps_partkey, CAST(vdec AS DOUBLE) AS value
        |FROM val
        |WHERE CAST(vdec AS DOUBLE) >
        |  CAST((SELECT CAST(sum(vdec) AS DECIMAL(18,4)) FROM val) AS DOUBLE) * 0.001""") { (s, dir) =>
      val nations = t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_5", "NATION_6", "NATION_7", "NATION_8"))
      val vals = t(s, dir, "lineitem")
        // supplier×nation slice: size-derived hint (supplier is O(SF));
        // the 4-row nation filter stays a forced broadcast
        .join(hintIfSmall(s, dir, "supplier", t(s, dir, "supplier")
            .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(dsumDec(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("vdec"))
        .persistScoped() // feeds the scalar total and the filtered output
      val total = vals.agg(sum(col("vdec")).cast(dec4).as("tdec"))
      vals.crossJoin(broadcast(total))
        .filter(col("vdec").cast("double") > col("tdec").cast("double") * 0.001)
        .select(col("l_partkey").as("ps_partkey"), col("vdec").cast("double").as("value"))
    },

    // ---- Q12 shape: priority classes per line status (CASE-sum pivot) ------
    Q(
      "q_tpch_q12",
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_returnflag = 'N'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_linestatus""") { (s, dir) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "N" &&
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(high, 1).otherwise(0)).cast("bigint").as("high_line_count"),
          sum(when(!high, 1).otherwise(0)).cast("bigint").as("low_line_count"))
    },

    // ---- Q13 shape: customer order-count distribution ----------------------
    // LEFT join with the filter in the join condition (not WHERE — zero-
    // order customers must survive), then a histogram of the counts.
    Q(
      "q_tpch_q13",
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
          "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },

    // ---- Q15 shape: top supplier by quarter revenue ------------------------
    // The revenue "view" materializes once (persist) and feeds both the
    // scalar max and the equality filter — exact DECIMAL comparison, so
    // ties surface every argmax row deterministically.
    Q(
      "q_tpch_q15",
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS rdec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rdec AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE rdec = (SELECT max(rdec) FROM rev)""") { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dsumDec(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rdec"))
        .persistScoped() // feeds the scalar max and the winner filter
      val mx = rev.agg(max(col("rdec")).as("mx"))
      t(s, dir, "supplier")
        .join(rev.crossJoin(broadcast(mx)).filter(col("rdec") === col("mx")),
          col("s_suppkey") === col("supplier_no"))
        .select(col("s_suppkey"), col("s_name"), col("rdec").cast("double").as("total_revenue"))
    },

    // ---- Q16 shape: supplier count by part attributes ----------------------
    // partsupp surrogate = DISTINCT (l_partkey, l_suppkey); the NOT IN
    // becomes an anti join (s_suppkey is never null here).
    Q(
      "q_tpch_q16",
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |  JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""") { (s, dir) =>
      val parts = t(s, dir, "part").filter(
        col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(hintIfSmall(s, dir, "part", parts), // size-derived hint, O(SF) slice
          col("p_partkey") === col("l_partkey"))
        .join(t(s, dir, "supplier").filter(col("s_acctbal") < 0).select(col("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },

    // ---- Q17 shape: small-quantity revenue (correlated avg subquery) -------
    // The correlated per-part average decorrelates into one group-by over
    // lineitem re-joined to the probe side; the threshold compare happens
    // on exact doubles (DECIMAL sum / count) per row.
    Q(
      "q_tpch_q17",
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND l_quantity < 0.5 * (
        |    SELECT CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count(*)
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val avgq = li.groupBy(col("l_partkey").as("a_part"))
        .agg((dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      li.join(hintIfSmall(s, dir, "part", // size-derived hint, O(SF) slice
            t(s, dir, "part").filter(col("p_brand") === "Brand#3")),
          col("p_partkey") === col("l_partkey"))
        .join(avgq, col("l_partkey") === col("a_part"))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // ---- Q20 shape: suppliers with excess shipped volume -------------------
    // Nested group-then-HAVING subquery feeding an IN (semi join): the
    // aggregate runs once over the filtered fact, only qualifying keys
    // reach the supplier probe.
    Q(
      "q_tpch_q20",
      """SELECT s_suppkey, s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 50)""") { (s, dir) =>
      val qualifying = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
        .join(hintIfSmall(s, dir, "part", // size-derived hint, O(SF) slice
            t(s, dir, "part").filter(col("p_name").like("red%"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(call_function("dec_cast", col("l_quantity").cast("double"),
          lit(18), lit(2))).as("sq"))
        .filter(col("sq") > 50)
        .select(col("l_suppkey"))
      t(s, dir, "supplier")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    },

    // ---- Q21 shape: sole-returning supplier in multi-supplier orders -------
    // The double correlation: EXISTS another supplier's line in the order,
    // NOT EXISTS another supplier's *returned* line — a non-equi semi join
    // plus a non-equi anti join on the same key.
    Q(
      "q_tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("l_suppkey"), col("s_name"))
      val l2 = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val l3 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      l1.join(l2, col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
          "left_semi")
        .join(l3, col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
          "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // ---- Q22 shape: dormant high-balance customers -------------------------
    // Global scalar average (broadcast) + anti join against orders;
    // country code surrogate = c_nationkey (schema has no phone column),
    // dormancy surrogate = no URGENT order (every sf0.01 customer has
    // *some* order, so the literal NOT EXISTS would prove nothing).
    Q(
      "q_tpch_q22",
      """WITH pos AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13) AND c_acctbal > 0.0)
        |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS totacctbal
        |FROM pos
        |WHERE c_acctbal > (
        |    SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count(*)
        |    FROM pos)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey""") { (s, dir) =>
      val pos = t(s, dir, "customer")
        .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13) && col("c_acctbal") > 0.0)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .persistScoped() // feeds the scalar average and the probe side
      val avg = pos.agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      pos.crossJoin(broadcast(avg))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
    }
  )
}
