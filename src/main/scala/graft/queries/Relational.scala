package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.io.Tables

/** The relational surface (SURVEY.md §2.2): the reference delegates all of
  * this to Spark-SQL built-ins, so every operator here is a declarative
  * DataFrame plan — Catalyst picks pushdown, join strategy and codegen.
  *
  * Each query reads straight from the harness parquet (predicate/column
  * pushdown visible in `.explain("formatted")`) and is paired with a
  * DuckDB oracle.
  */
object Relational {

  private val dec2 = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Exact cross-engine sum of a double column: accumulate in DECIMAL
    * (order-independent), surface as DOUBLE. The final double cast is
    * deliberate: the driver's value compare normalizes DECIMAL
    * differently per engine when values carry trailing zeros (the r1/r2
    * hash failures were exactly the queries with a trailing-zero
    * decimal in the output), while decimal→double is correctly rounded
    * and bit-identical in both engines. */
  private def dsum(c: Column, dt: DecimalType = dec2): Column =
    sum(call_function("dec_cast", c.cast("double"), lit(dt.precision), lit(dt.scale)))
      .cast(dt).cast("double")

  val queries: Seq[Q] = Seq(

    // ---- aggregation: TPC-H Q1-style pricing summary ----------------------
    Q(
      "q_agg_pricing",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), dec4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },

    // ---- broadcast join: revenue per nation (dim tables broadcast) --------
    Q(
      "q_join_nation_revenue",
      """SELECT n_name,
        |  count(*) AS order_cnt,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("order_cnt"), dsum(col("o_totalprice")).as("revenue"))
    },

    // ---- large join (shuffle): lineitem x orders ---------------------------
    Q(
      "q_join_fact_fact",
      """SELECT o_orderpriority,
        |  count(*) AS line_cnt,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""") { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("line_cnt"), dsum(col("l_quantity")).as("sum_qty"))
    },

    // ---- semi / anti joins -------------------------------------------------
    Q(
      "q_join_semi",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""") {
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders").filter(col("o_totalprice") > 400000),
            col("c_custkey") === col("o_custkey"),
            "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
    },
    Q(
      "q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""") { (s, dir) =>
      t(s, dir, "customer")
        .join(
          t(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // ---- range (non-equi, broadcast) join ----------------------------------
    Q(
      "q_join_range",
      """SELECT b.band, count(*) AS cnt,
        |  CAST(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'), (150.0, 1000000.0, 'high')) b(lo, hi, band)
        |  ON e.value >= b.lo AND e.value < b.hi
        |GROUP BY b.band""") { (s, dir) =>
      import s.implicits._
      val bands = Seq((0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1000000.0, "high"))
        .toDF("lo", "hi", "band")
      t(s, dir, "events")
        .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
    },

    // ---- window functions --------------------------------------------------
    Q(
      "q_window_orders",
      """SELECT o_orderkey, o_custkey,
        |  row_number() OVER w AS rn,
        |  lag(o_orderkey) OVER w AS prev_orderkey,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(28,2)) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_custkey"),
        row_number().over(w).as("rn"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
        sum(call_function("dec_cast", col("o_totalprice"), lit(18), lit(2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DecimalType(28, 2))
          .cast("double")
          .as("running_spend"))
    },

    // ---- top-k with deterministic tie-break --------------------------------
    Q(
      "q_topk_orders",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""") { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // ---- set operations ----------------------------------------------------
    Q(
      "q_setops",
      """SELECT 'intersect' AS op, nk FROM
        |  (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'except' AS op, nk FROM
        |  (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'union' AS op, nk FROM
        |  (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier)""") {
      (s, dir) =>
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
        c.intersect(sup).withColumn("op", lit("intersect"))
          .unionByName(c.except(sup).withColumn("op", lit("except")))
          .unionByName(c.union(sup).distinct().withColumn("op", lit("union")))
          .select(col("op"), col("nk"))
    },

    // ---- scalar string/math functions --------------------------------------
    Q(
      "q_scalar_funcs",
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_u,
        |  substring(p_name, 1, 8) AS name_8,
        |  length(p_name) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  abs(p_retailprice - 1000.0) AS price_dist,
        |  CAST(floor(p_size / 10.0) AS BIGINT) AS size_bucket,
        |  p_size % 7 AS size_mod,
        |  CASE WHEN p_size > 25 THEN 'L' WHEN p_size > 10 THEN 'M' ELSE 'S' END AS size_class
        |FROM part""") { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name_8"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        abs(col("p_retailprice") - 1000.0).as("price_dist"),
        floor(col("p_size") / 10.0).as("size_bucket"),
        (col("p_size") % 7).as("size_mod"),
        when(col("p_size") > 25, "L").when(col("p_size") > 10, "M").otherwise("S").as("size_class"))
    },

    // ---- date/time functions ------------------------------------------------
    Q(
      "q_date_funcs",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  month(o_orderdate) AS m,
        |  day(o_orderdate) AS d,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  isodow(o_orderdate) AS dow_iso,
        |  datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
        |FROM orders""") { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
        (weekday(col("o_orderdate")) + 1).as("dow_iso"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp_ntz")).as("days_since"))
    },

    // ---- rollup / cube / grouping sets --------------------------------------
    Q(
      "q_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""") { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("cnt"))
    },
    Q(
      "q_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""") { (s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
    },

    // ---- distinct / count(distinct) -----------------------------------------
    Q(
      "q_distinct",
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer") { (s, dir) =>
      t(s, dir, "customer").select(col("c_mktsegment"), col("c_nationkey")).distinct()
    },
    Q(
      "q_count_distinct",
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS supp_cnt, count(DISTINCT l_partkey) AS part_cnt
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("supp_cnt"),
          countDistinct(col("l_partkey")).as("part_cnt"))
    },

    // ---- selective filter + projection (pushdown demo) ----------------------
    Q(
      "q_filter_pushdown",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
        |  AND l_quantity > 45""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-02-01").cast("timestamp_ntz") &&
            col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },

    // ---- events: hourly aggregation over the ns-timestamp table -------------
    Q(
      "q_events_hourly",
      """SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
        |  count(*) AS cnt,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy(
          col("event_type"),
          date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
    },

    // ---- JSON extraction ------------------------------------------------------
    Q(
      "q_json_extract",
      """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"))
    },

    // ---- TPC-H-shaped multi-join pipelines ----------------------------------
    // Q3 shape: shipping priority — 3-way join, filter both sides, top-10
    Q(
      "q_tpch_q3",
      """SELECT l_orderkey,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""") { (s, dir) =>
      val cut = lit("1995-03-15").cast("timestamp_ntz")
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders").filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_shipdate") > cut),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), dec4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
    },

    // Q5 shape: local supplier volume — 6-way join through two dims
    Q(
      "q_tpch_q5",
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""") { (s, dir) =>
      // dim-first plan: region->nation->supplier collapse into one small
      // broadcast that prunes lineitem (the big fact) in its scan stage;
      // the only shuffles left are the two fact joins (orderkey, custkey)
      val asiaSupp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      t(s, dir, "lineitem")
        .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), dec4).as("revenue"))
    },

    // Q10 shape: returned-item reporting — join + filter + top-20 customers
    Q(
      "q_tpch_q10",
      """SELECT c_custkey, c_name,
        |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |  n_name
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), dec4).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
    },

    // ---- correlated subquery (decorrelated to a group-stats join) -----------
    // "orders above the customer's average": expressed multiply-through
    // (price * cnt > sum) so both engines compare exact per-row doubles
    // instead of a division-of-aggregates
    Q(
      "q_corr_subquery",
      """SELECT o.o_orderkey, o.o_custkey FROM orders o
        |JOIN (SELECT o_custkey AS ck, count(*) AS cnt,
        |        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
        |      FROM orders GROUP BY 1) g ON o.o_custkey = g.ck
        |WHERE o.o_totalprice * g.cnt > g.total""") { (s, dir) =>
      // single-scan window formulation: the oracle's self-join computes
      // the same group stats, but a whole-partition window avoids the
      // second scan of orders (same one shuffle on o_custkey)
      val w = Window.partitionBy(col("o_custkey"))
      t(s, dir, "orders")
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("total",
          sum(call_function("dec_cast", col("o_totalprice"), lit(18), lit(2)))
            .over(w).cast(dec2).cast("double"))
        .filter(col("o_totalprice") * col("cnt") > col("total"))
        .select(col("o_orderkey"), col("o_custkey"))
    },

    // ---- string function breadth -------------------------------------------
    Q(
      "q_string_funcs",
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  rpad(p_brand, 12, '.') AS brand_rpad,
        |  reverse(p_name) AS name_rev,
        |  replace(p_type, ' ', '_') AS type_us,
        |  translate(p_brand, 'AB', 'ab') AS brand_tr,
        |  strpos(p_name, 'a') AS first_a,
        |  repeat(p_brand, 2) AS cont2,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  left(p_name, 5) AS name_l5,
        |  right(p_name, 5) AS name_r5
        |FROM part""") { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        rpad(col("p_brand"), 12, ".").as("brand_rpad"),
        reverse(col("p_name")).as("name_rev"),
        expr("replace(p_type, ' ', '_')").as("type_us"),
        translate(col("p_brand"), "AB", "ab").as("brand_tr"),
        expr("instr(p_name, 'a')").cast("long").as("first_a"),
        expr("repeat(p_brand, 2)").as("cont2"),
        expr("split_part(p_type, ' ', 1)").as("type_head"),
        expr("left(p_name, 5)").as("name_l5"),
        expr("right(p_name, 5)").as("name_r5"))
    },

    // ---- array aggregation (ordered, deterministic) -------------------------
    // surfaced as a joined string: the driver's pandas-level row sort
    // chokes on array-typed columns (unhashable ndarray), so the set is
    // built as an array and serialized at the boundary
    Q(
      "q_array_agg",
      """SELECT user_id,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types,
        |  count(*) AS n
        |FROM events GROUP BY user_id""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          array_join(sort_array(array_distinct(collect_list(col("event_type")))), ",").as("types"),
          count(lit(1)).as("n"))
    },

    // ---- group filter (HAVING) ----------------------------------------------
    Q(
      "q_having",
      """SELECT o_custkey, count(*) AS cnt FROM orders
        |GROUP BY o_custkey HAVING count(*) >= 15""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 15)
    },

    // ---- sketch aggregation: HLL approximate distinct -----------------------
    // Sketch VALUES are engine-specific (DuckDB cannot reproduce Spark's
    // HLL registers), but the sketch's CONTRACT is cross-engine: the
    // estimate must sit within the configured error bound of the exact
    // count. So the query surfaces the exact counts plus per-sketch
    // within-bound BOOLEANS (rsd = 0.02, asserted at 5σ = 10% — Spark's
    // HLL is deterministic on fixed data, so the booleans are stable),
    // and the oracle states the bound as literal TRUE — the full row
    // hash-gates in DuckDB (round-11; previously a rows-only check).
    // Tighter empirical bounds live in SketchSpec.
    Q(
      "q_approx_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_suppkey) AS exact_supps,
        |  TRUE AS parts_ok, TRUE AS supps_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      {
      // two countDistinct on DIFFERENT keys in one aggregate would plan
      // an Expand (row stream tripled through the distinct paths —
      // measured 4.3s at sf0.1); three independent HashAggregates with
      // map-side partials + two 3-row joins run the same answer in a
      // third of the time, and each is the shape that scales
      val li = t(s, dir, "lineitem")
      def exact(key: String, as: String) =
        li.select(col("l_returnflag"), col(key)).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
      val ap = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          approx_count_distinct(col("l_suppkey"), 0.02).as("asu"))
      exact("l_partkey", "exact_parts")
        .join(exact("l_suppkey", "exact_supps"), "l_returnflag")
        .join(ap, "l_returnflag")
        .select(
          col("l_returnflag"), col("exact_parts"), col("exact_supps"),
          (abs(col("ap") - col("exact_parts"))
            <= col("exact_parts") * 0.10).as("parts_ok"),
          (abs(col("asu") - col("exact_supps"))
            <= col("exact_supps") * 0.10).as("supps_ok"))
      }
    },

    // ---- sketch aggregation: approximate percentiles (KLL-style) ------------
    // Same contract-not-value oracle shape as q_approx_distinct: the
    // approx_percentile(accuracy=1000) result is an actual data value
    // whose RANK must be within 1/accuracy of the target quantile. The
    // query joins the (bounded, one row per group) sketch output back to
    // the stream, counts rows ≤ the approximate percentile, and asserts
    // |rank − q| ≤ 0.02 (20× the sketch's guaranteed 0.001 rank error —
    // plus tie slack; deterministic on fixed data). Exact group sizes
    // hash-gate alongside the booleans.
    Q(
      "q_approx_percentile",
      """SELECT o_orderpriority, count(*) AS n,
        |  TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p95_ok
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val ap = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("approx_percentile(o_totalprice, array(0.25, 0.5, 0.95), 1000)")
            .as("pcts"))
      t(s, dir, "orders")
        .join(broadcast(ap), "o_orderpriority") // one row per group
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("o_totalprice") <= element_at(col("pcts"), 1), 1L)
            .otherwise(0L)).as("le25"),
          sum(when(col("o_totalprice") <= element_at(col("pcts"), 2), 1L)
            .otherwise(0L)).as("le50"),
          sum(when(col("o_totalprice") <= element_at(col("pcts"), 3), 1L)
            .otherwise(0L)).as("le95"))
        .select(
          col("o_orderpriority"), col("n"),
          (abs(col("le25").cast("double") / col("n") - 0.25) <= 0.02).as("p25_ok"),
          (abs(col("le50").cast("double") / col("n") - 0.50) <= 0.02).as("p50_ok"),
          (abs(col("le95").cast("double") / col("n") - 0.95) <= 0.02).as("p95_ok"))
    },

    // ---- SQL-text interface: one dialect-shared string, both engines --------
    Q.sqlShared(
      "q_sql_interface",
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // ---- explicit GROUPING SETS (beyond rollup/cube) ------------------------
    Q.sqlShared(
      "q_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_s,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_p,
        |  count(*) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin),

    // ---- correlated subqueries through the SQL-text path --------------------
    // one dialect-shared statement: Catalyst decorrelates the EXISTS and
    // the scalar subquery into joins (RewriteCorrelatedScalarSubquery /
    // RewritePredicateSubquery) — no manual rewrite in the engine
    Q.sqlShared(
      "q_sql_subqueries",
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin),

    // ---- LATERAL correlated subquery (dialect-shared text) ------------------
    Q.sqlShared(
      "q_lateral_subquery",
      """SELECT c_custkey, t.cnt, t.top_price
        |FROM customer,
        |LATERAL (SELECT count(*) AS cnt,
        |                CAST(max(o_totalprice) AS DOUBLE) AS top_price
        |         FROM orders WHERE o_custkey = c_custkey) t
        |WHERE t.cnt > 0""".stripMargin),

    // ---- modern SQL sugar: GROUP BY ALL + lateral column aliases ------------
    // One dialect-shared text through both parsers: the inner aggregate
    // infers its grouping keys from the projection (GROUP BY ALL,
    // Spark 3.4+/DuckDB), the outer projection chains lateral column
    // aliases (cnt → cnt_x2 → cnt_x2p1) — each alias referenced by the
    // NEXT expression in the same SELECT, the post-2023 convenience
    // surface users coming from DuckDB/BigQuery expect. (Spark does not
    // yet allow lateral aliases inside a GROUP BY ALL query itself —
    // hence the two layers.) avg_price is one double/int division of
    // already-snapped values, deterministic cross-engine.
    Q.sqlShared(
      "q_sql_modern",
      """SELECT o_orderstatus, o_orderpriority, cnt,
        |  cnt * 2 AS cnt_x2,
        |  cnt_x2 + 1 AS cnt_x2p1,
        |  sum_price / cnt AS avg_price
        |FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_price
        |  FROM orders
        |  GROUP BY ALL
        |)""".stripMargin),

    // ---- null-handling functions --------------------------------------------
    Q.sqlShared(
      "q_null_funcs",
      """SELECT o_orderkey,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
        |  CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_nn,
        |  NULLIF(o_orderpriority, o_orderpriority) IS NULL AS always_true
        |FROM orders""".stripMargin),

    // ---- pivot (conditional aggregation) --------------------------------------
    Q(
      "q_pivot_events",
      """SELECT user_id % 10 AS cohort,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY 1""") { (s, dir) =>
      t(s, dir, "events")
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
    },

    // ---- percentiles (exact, discrete) --------------------------------------
    // percentile_disc built from rank arithmetic: value at row
    // ceil(p * n) of the group's sort order. Engine-native quantile
    // functions interpolate with engine-specific float expressions; the
    // rank formulation is pure integer + comparison logic, so it is
    // deterministic cross-engine AND the shape that scales (one window
    // shuffle on the group key, no global sort).
    Q(
      "q_percentiles",
      """WITH r AS (
        |  SELECT o_orderpriority AS prio, o_totalprice AS v,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT prio,
        |  min(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS p25,
        |  min(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN v END) AS p50,
        |  min(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS p75,
        |  max(v) AS p100
        |FROM r GROUP BY prio""") { (s, dir) =>
      val w = Window.partitionBy(col("prio"))
      val r = t(s, dir, "orders")
        .select(col("o_orderpriority").as("prio"), col("o_totalprice").as("v"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w.orderBy(col("v"), col("o_orderkey"))))
        .withColumn("n", count(lit(1)).over(w))
      r.groupBy(col("prio"))
        .agg(
          min(when(col("rn") === ceil(lit(0.25) * col("n")).cast("bigint"), col("v"))).as("p25"),
          min(when(col("rn") === ceil(lit(0.50) * col("n")).cast("bigint"), col("v"))).as("p50"),
          min(when(col("rn") === ceil(lit(0.75) * col("n")).cast("bigint"), col("v"))).as("p75"),
          max(col("v")).as("p100"))
    },

    // ---- window-function breadth (ranks, offsets, frame endpoints) ----------
    // percent_rank/cume_dist are ratios of window integers — per-row
    // IEEE division, bit-identical cross-engine
    Q(
      "q_window_funcs",
      """SELECT o_orderkey,
        |  dense_rank() OVER w AS drank,
        |  ntile(4) OVER w AS quartile,
        |  lead(o_orderkey) OVER w AS next_key,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)""") {
      (s, dir) =>
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders").select(
          col("o_orderkey"),
          dense_rank().over(w).as("drank"),
          ntile(4).over(w).as("quartile"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          first_value(col("o_orderkey")).over(w).as("first_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"))
    },

    // ---- bag-semantics set operations ---------------------------------------
    Q(
      "q_setops_all",
      """SELECT op, nk, count(*) AS cnt FROM (
        |  SELECT 'intersect_all' AS op, nk FROM
        |    (SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'except_all' AS op, nk FROM
        |    (SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
        |) GROUP BY op, nk""") { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.intersectAll(sup).withColumn("op", lit("intersect_all"))
        .unionByName(c.exceptAll(sup).withColumn("op", lit("except_all")))
        .groupBy(col("op"), col("nk"))
        .agg(count(lit(1)).as("cnt"))
    },

    // ---- typed-UDAF top-k per group -----------------------------------------
    // graft.functions.Aggregators.TopK: bounded O(k) heap state with
    // map-side merges, instead of the full per-group sort a
    // row_number window would shuffle. The oracle IS that window
    // formulation — proving the two shapes agree value-for-value.
    Q(
      "q_topk_per_group",
      """SELECT prio, rn, v, id FROM (
        |  SELECT o_orderpriority AS prio, o_totalprice AS v, o_orderkey AS id,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""") { (s, dir) =>
      val topk = udaf(
        new graft.functions.Aggregators.TopK(3),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong))
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("tk"))
        .select(col("prio"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(
          col("prio"),
          (col("pos") + 1).cast("int").as("rn"),
          col("e._1").as("v"),
          col("e._2").as("id"))
    })
}
