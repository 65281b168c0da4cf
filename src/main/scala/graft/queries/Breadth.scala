package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.io.Tables

/** Second breadth wave over the relational surface (SURVEY.md §2.2):
  * outer joins, FILTER-style conditional aggregation, ordered string
  * aggregation, min_by/max_by, exact statistical moments, RANGE window
  * frames, bitwise/interval scalar breadth, lateral explode, and two more
  * TPC-H-shaped pipelines adapted to the harness schema.
  *
  * Cross-engine determinism notes follow the project working notes:
  * decimal accumulators surfaced as DOUBLE, packed-integer tie-breaks for
  * arg extremes, per-row IEEE double arithmetic only.
  */
object Breadth {

  private val dec2 = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private def dsum(c: Column, dt: DecimalType = dec2): Column =
    sum(call_function("dec_cast", c.cast("double"), lit(dt.precision), lit(dt.scale)))
      .cast(dt).cast("double")

  /** Deterministic arg-extreme ordering: exact cents packed with the unique
    * key so ties in the double price can never make the two engines pick
    * different rows. DECIMAL(18,2)*100 is integer-valued, so the BIGINT
    * cast is exact in both engines. */
  private val packedPrice: Column =
    (call_function("dec_cast", col("o_totalprice"), lit(18), lit(2)) * 100)
      .cast("bigint") * lit(10000000L) + col("o_orderkey")

  val queries: Seq[Q] = Seq(

    // ---- full outer join with unmatched rows on both sides ------------------
    Q(
      "q_join_full_outer",
      """SELECT coalesce(c.nk, s.nk) AS nk,
        |  coalesce(c.ccnt, 0) AS customers,
        |  coalesce(s.scnt, 0) AS suppliers
        |FROM (SELECT c_nationkey AS nk, count(*) AS ccnt FROM customer
        |      WHERE c_nationkey < 15 GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk, count(*) AS scnt FROM supplier
        |      WHERE s_nationkey >= 10 GROUP BY 1) s
        |ON c.nk = s.nk""") { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_nationkey") < 15)
        .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("ccnt"))
      val sup = t(s, dir, "supplier").filter(col("s_nationkey") >= 10)
        .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("scnt"))
      c.join(sup, col("cnk") === col("snk"), "full_outer")
        .select(
          coalesce(col("cnk"), col("snk")).as("nk"),
          coalesce(col("ccnt"), lit(0L)).as("customers"),
          coalesce(col("scnt"), lit(0L)).as("suppliers"))
    },

    // ---- explicit cross join (dim x dim, the only safe cardinality) ---------
    Q(
      "q_cross_join",
      """SELECT n_name, r_name, n_nationkey + r_regionkey AS key_sum
        |FROM nation CROSS JOIN region""") { (s, dir) =>
      t(s, dir, "nation")
        .crossJoin(broadcast(t(s, dir, "region")))
        .select(col("n_name"), col("r_name"),
          (col("n_nationkey") + col("r_regionkey")).as("key_sum"))
    },

    // ---- conditional aggregation (FILTER clause semantics) ------------------
    Q(
      "q_conditional_agg",
      """SELECT l_returnflag,
        |  count(*) FILTER (WHERE l_quantity > 25) AS big_qty_cnt,
        |  count(*) FILTER (WHERE l_discount = 0.0) AS no_disc_cnt,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F')
        |    AS DECIMAL(18,2)) AS DOUBLE) AS f_price,
        |  CAST(min(l_extendedprice) FILTER (WHERE l_quantity >= 49) AS DOUBLE) AS min_hi_price
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(col("l_quantity") > 25, 1)).as("big_qty_cnt"),
          count(when(col("l_discount") === 0.0, 1)).as("no_disc_cnt"),
          sum(when(col("l_linestatus") === "F",
            call_function("dec_cast", col("l_extendedprice"), lit(18), lit(2))))
            .cast(dec2).cast("double").as("f_price"),
          min(when(col("l_quantity") >= 49, col("l_extendedprice")))
            .cast("double").as("min_hi_price"))
    },

    // ---- ordered string aggregation (listagg / string_agg) ------------------
    Q(
      "q_string_agg",
      """SELECT c_nationkey,
        |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
        |  count(DISTINCT c_mktsegment) AS n_segments
        |FROM customer GROUP BY c_nationkey""") { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(
          array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
          countDistinct(col("c_mktsegment")).as("n_segments"))
    },

    // ---- min_by / max_by (arg extremes) -------------------------------------
    Q(
      "q_min_max_by",
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)*10000000 + o_orderkey) AS priciest_order,
        |  arg_min(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)*10000000 + o_orderkey) AS cheapest_order,
        |  CAST(max(o_totalprice) AS DOUBLE) AS max_price,
        |  CAST(min(o_totalprice) AS DOUBLE) AS min_price
        |FROM orders GROUP BY o_orderpriority""") { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), packedPrice).as("priciest_order"),
          min_by(col("o_orderkey"), packedPrice).as("cheapest_order"),
          max(col("o_totalprice")).cast("double").as("max_price"),
          min(col("o_totalprice")).cast("double").as("min_price"))
    },

    // ---- exact statistical moments from decimal sums ------------------------
    // var/stddev/corr recomputed from exact DECIMAL power sums with the
    // SAME double-arithmetic closed form on both engines — the builtin
    // streaming (Welford) aggregates are float-order-dependent and would
    // break the hash gate. One map-side-combinable aggregation, no second
    // pass: the shape that survives 100 TB.
    Q(
      "q_stats_moments",
      """SELECT l_returnflag, n,
        |  CAST(CAST((n*sx2 - sx*sx) / (n*(n-1)) AS DECIMAL(18,9)) AS DOUBLE) AS var_qty,
        |  CAST(CAST(sqrt((n*sx2 - sx*sx) / (n*(n-1))) AS DECIMAL(18,9)) AS DOUBLE) AS stddev_qty,
        |  CAST(CAST((n*sxy - sx*sy) / (sqrt(n*sx2 - sx*sx) * sqrt(n*sy2 - sy*sy))
        |    AS DECIMAL(18,12)) AS DOUBLE) AS corr_qty_price
        |FROM (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx2,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sy2,
        |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)""") { (s, dir) =>
      val dec244 = DecimalType(24, 4)
      def psum(c: Column, dt: DecimalType) =
        sum(call_function("dec_cast", c, lit(dt.precision), lit(dt.scale))).cast("double")
      val sums = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          psum(col("l_quantity"), dec2).as("sx"),
          psum(col("l_quantity") * col("l_quantity"), dec4).as("sx2"),
          psum(col("l_extendedprice"), dec2).as("sy"),
          psum(col("l_extendedprice") * col("l_extendedprice"), dec244).as("sy2"),
          psum(col("l_quantity") * col("l_extendedprice"), dec244).as("sxy"))
      val n = col("n"); val sx = col("sx"); val sx2 = col("sx2")
      val sy = col("sy"); val sy2 = col("sy2"); val sxy = col("sxy")
      // surface through a decimal rounding (the proven cross-engine
      // double->decimal path): DuckDB's compiler may contract a*b - c*d
      // into an FMA, so the raw double can differ from the JVM's by one
      // ulp — far below the rounded scale
      def snap(c: Column, scale: Int): Column =
        call_function("dec_cast", c, lit(18), lit(scale)).cast("double")
      sums.select(
        col("l_returnflag"), n,
        snap((n * sx2 - sx * sx) / (n * (n - lit(1))), 9).as("var_qty"),
        snap(sqrt((n * sx2 - sx * sx) / (n * (n - lit(1)))), 9).as("stddev_qty"),
        snap((n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy)), 12)
          .as("corr_qty_price"))
    },

    // ---- higher statistical moments: skewness + excess kurtosis ------------
    // The distribution-shape diagnostics (is this column symmetric? fat-
    // tailed?) that decide whether a mean/stddev summary is even
    // meaningful — from the SAME single-pass exact-power-sum recipe as
    // q_stats_moments, extended to 3rd/4th powers. l_quantity is
    // integral (1..50), so every power sum is an exact BIGINT (max
    // Σq⁴ ≈ 3.8e12 ≪ 2⁵³ — the double image is exact in both engines),
    // the closed forms run the identical double tree (m2^1.5 via
    // m2·sqrt(m2), never libm pow), and outputs snap through
    // dec_cast(18,9) for the FMA-contraction ulp. One map-side-
    // combinable aggregation — no second pass, no Welford ordering
    // dependence.
    Q(
      "q_stats_higher_moments",
      """SELECT l_returnflag, n,
        |  CAST(CAST(
        |    ((sx3 - 3.0*(sx/n)*sx2 + 2.0*n*(sx/n)*(sx/n)*(sx/n)) / n)
        |      / (((sx2 - sx*(sx/n)) / n) * sqrt((sx2 - sx*(sx/n)) / n))
        |    AS DECIMAL(18,9)) AS DOUBLE) AS skewness,
        |  CAST(CAST(
        |    ((sx4 - 4.0*(sx/n)*sx3 + 6.0*(sx/n)*(sx/n)*sx2 - 3.0*n*(sx/n)*(sx/n)*(sx/n)*(sx/n)) / n)
        |      / (((sx2 - sx*(sx/n)) / n) * ((sx2 - sx*(sx/n)) / n)) - 3.0
        |    AS DECIMAL(18,9)) AS DOUBLE) AS kurtosis_excess
        |FROM (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(q*q) AS BIGINT) AS DOUBLE) AS sx2,
        |    CAST(CAST(sum(q*q*q) AS BIGINT) AS DOUBLE) AS sx3,
        |    CAST(CAST(sum(q*q*q*q) AS BIGINT) AS DOUBLE) AS sx4
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
        |  GROUP BY l_returnflag)
        |WHERE CAST(CAST((sx2 - sx*(sx/n)) / n AS DECIMAL(18,9)) AS DOUBLE) > 0""") { (s, dir) =>
      // zero-variance guard on the SNAPPED variance (ADVICE r11, the
      // q_events_anomaly rule): a constant group yields 0/0 = NaN
      // inside the DECIMAL snap — Spark's dec_cast nulls it while
      // DuckDB's CAST(NaN AS DECIMAL) raises, so the oracle would
      // crash rather than mismatch. Safe on real lineitem data, but
      // the kernel must not be fragile when reused on another column.
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity").cast("bigint").as("q"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("q")).cast("double").as("sx"),
          sum(col("q") * col("q")).cast("double").as("sx2"),
          sum(col("q") * col("q") * col("q")).cast("double").as("sx3"),
          sum(col("q") * col("q") * col("q") * col("q")).cast("double").as("sx4"))
        .filter(expr("cast(dec_cast((sx2 - sx*(sx/n)) / n, 18, 9) as double) > 0"))
        .selectExpr(
          "l_returnflag", "n",
          """cast(dec_cast(
            ((sx3 - 3.0*(sx/n)*sx2 + 2.0*n*(sx/n)*(sx/n)*(sx/n)) / n)
              / (((sx2 - sx*(sx/n)) / n) * sqrt((sx2 - sx*(sx/n)) / n)), 18, 9)
            as double) as skewness""",
          """cast(dec_cast(
            ((sx4 - 4.0*(sx/n)*sx3 + 6.0*(sx/n)*(sx/n)*sx2 - 3.0*n*(sx/n)*(sx/n)*(sx/n)*(sx/n)) / n)
              / (((sx2 - sx*(sx/n)) / n) * ((sx2 - sx*(sx/n)) / n)) - 3.0, 18, 9)
            as double) as kurtosis_excess""")
    },

    // ---- RANGE window frame (value-based, not row-based) --------------------
    // 30-day trailing spend per customer: RANGE frames group peers by
    // ordering value, so the result is order-independent — the frame that
    // matters for time-series at scale (one shuffle on the partition key).
    Q(
      "q_window_range_frame",
      """SELECT o_orderkey,
        |  CAST(cnt AS BIGINT) AS orders_30d,
        |  CAST(CAST(spend AS DECIMAL(28,2)) AS DOUBLE) AS spend_30d
        |FROM (
        |  SELECT o_orderkey,
        |    count(*) OVER w AS cnt,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY datediff('day', TIMESTAMP '1990-01-01 00:00:00', o_orderdate)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW))""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(datediff(col("o_orderdate"), lit("1990-01-01").cast("timestamp_ntz")))
        .rangeBetween(-30, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_orderkey"),
        count(lit(1)).over(w).as("orders_30d"),
        sum(call_function("dec_cast", col("o_totalprice"), lit(18), lit(2)))
          .over(w).cast(DecimalType(28, 2)).cast("double").as("spend_30d"))
    },

    // ---- bitwise operators ---------------------------------------------------
    Q(
      "q_bitwise",
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS lo_byte,
        |  o_orderkey | 15 AS or_15,
        |  xor(o_orderkey, o_custkey) AS key_xor,
        |  o_orderkey << 2 AS shl2,
        |  o_orderkey >> 3 AS shr3,
        |  ~o_orderkey AS inv
        |FROM orders""") { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("lo_byte"),
        col("o_orderkey").bitwiseOR(lit(15L)).as("or_15"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("key_xor"),
        expr("shiftleft(o_orderkey, 2)").as("shl2"),
        expr("shiftright(o_orderkey, 3)").as("shr3"),
        bitwise_not(col("o_orderkey")).as("inv"))
    },

    // ---- interval / date arithmetic breadth ---------------------------------
    Q(
      "q_interval_arith",
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 3 MONTH AS plus_3m,
        |  o_orderdate - INTERVAL 45 DAY AS minus_45d,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  make_date(CAST(year(o_orderdate) AS INT), 1, 1) AS year_start
        |FROM orders""") { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL '3' MONTH")).as("plus_3m"),
        (col("o_orderdate") - expr("INTERVAL '45' DAY")).as("minus_45d"),
        last_day(col("o_orderdate")).as("month_end"),
        quarter(col("o_orderdate")).cast("bigint").as("q"),
        make_date(year(col("o_orderdate")), lit(1), lit(1)).as("year_start"))
    },

    // ---- union of differently-ordered schemas by column name ----------------
    Q(
      "q_union_by_name",
      """SELECT src, count(*) AS cnt, count(DISTINCT k) AS dk FROM (
        |  SELECT 'cust' AS src, c_custkey AS k, c_nationkey AS nk FROM customer
        |  UNION ALL BY NAME
        |  SELECT s_nationkey AS nk, s_suppkey AS k, 'supp' AS src FROM supplier
        |) GROUP BY src""") { (s, dir) =>
      val c = t(s, dir, "customer")
        .select(lit("cust").as("src"), col("c_custkey").as("k"), col("c_nationkey").as("nk"))
      val sup = t(s, dir, "supplier")
        .select(col("s_nationkey").as("nk"), col("s_suppkey").as("k"), lit("supp").as("src"))
      c.unionByName(sup)
        .groupBy(col("src"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("k")).as("dk"))
    },

    // ---- lateral explode (correlated table expansion) -----------------------
    Q(
      "q_lateral_explode",
      """SELECT n_nationkey, u.i AS i, n_name
        |FROM nation, UNNEST(range(1, n_nationkey % 3 + 2)) AS u(i)""") { (s, dir) =>
      t(s, dir, "nation")
        .select(
          col("n_nationkey"),
          explode(sequence(lit(1L), (col("n_nationkey") % 3 + 1).cast("long"))).as("i"),
          col("n_name"))
    },

    // ---- column profiling (ANALYZE-style stats in one pass) -----------------
    Q(
      "q_profile",
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT o_orderstatus) AS status_card,
        |  count(DISTINCT o_orderpriority) AS prio_card,
        |  count(o_custkey) AS custkey_nonnull,
        |  CAST(min(o_totalprice) AS DOUBLE) AS price_min,
        |  CAST(max(o_totalprice) AS DOUBLE) AS price_max,
        |  min(o_orderdate) AS date_min,
        |  max(o_orderdate) AS date_max
        |FROM orders""") { (s, dir) =>
      t(s, dir, "orders").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderstatus")).as("status_card"),
        countDistinct(col("o_orderpriority")).as("prio_card"),
        count(col("o_custkey")).as("custkey_nonnull"),
        min(col("o_totalprice")).cast("double").as("price_min"),
        max(col("o_totalprice")).cast("double").as("price_max"),
        min(col("o_orderdate")).as("date_min"),
        max(col("o_orderdate")).as("date_max"))
    },

    // ---- equi-width histogram (profiling companion) -------------------------
    // 10 buckets over the observed [min, max]: bounds come from one exact
    // min/max pass (doubles, order-free) broadcast back over the scan;
    // the bucket index is shared double arithmetic + floor, identical in
    // both engines given identical bounds.
    Q(
      "q_histogram",
      """WITH b AS (
        |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
        |)
        |SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 10.0)), 9) AS BIGINT) AS bucket,
        |  count(*) AS cnt,
        |  CAST(min(o_totalprice) AS DOUBLE) AS bucket_min,
        |  CAST(max(o_totalprice) AS DOUBLE) AS bucket_max
        |FROM orders, b
        |GROUP BY 1""") { (s, dir) =>
      val o = t(s, dir, "orders")
      val b = o.agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      o.crossJoin(broadcast(b))
        .groupBy(least(floor((col("o_totalprice") - col("lo")) / ((col("hi") - col("lo")) / 10.0)),
          lit(9)).cast("bigint").as("bucket"))
        .agg(
          count(lit(1)).as("cnt"),
          min(col("o_totalprice")).cast("double").as("bucket_min"),
          max(col("o_totalprice")).cast("double").as("bucket_max"))
    },

    // ---- z-score outlier filter (statistical anomaly pass) ------------------
    // group stats from exact DECIMAL power sums (the q_stats_moments
    // shape) broadcast back over the scan; the per-row |x - mean| >
    // 1.5*stddev comparison (totalprice is near-uniform, max |z| ~1.78) uses the SAME snapped stats in both engines,
    // so boundary rows can't flip. Two passes over the fact, one tiny
    // broadcast — the scalable anomaly-filter shape.
    Q(
      "q_outliers",
      """WITH stats AS (
        |  SELECT o_orderpriority AS prio,
        |    CAST(CAST(sx / n AS DECIMAL(18,9)) AS DOUBLE) AS mean,
        |    CAST(CAST(sqrt((n*sx2 - sx*sx) / (n*(n-1))) AS DECIMAL(18,9)) AS DOUBLE) AS sd
        |  FROM (
        |    SELECT o_orderpriority, CAST(count(*) AS DOUBLE) AS n,
        |      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |      CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(24,4))) AS DOUBLE) AS sx2
        |    FROM orders GROUP BY 1)
        |)
        |SELECT o_orderkey, o_orderpriority,
        |  CAST(o_totalprice AS DOUBLE) AS price,
        |  CAST((o_totalprice - mean) / sd AS DOUBLE) AS zscore
        |FROM orders JOIN stats ON o_orderpriority = stats.prio
        |WHERE abs(o_totalprice - mean) > 1.5 * sd""") { (s, dir) =>
      val dec244 = DecimalType(24, 4)
      def psum(c: Column, dt: DecimalType) =
        sum(call_function("dec_cast", c, lit(dt.precision), lit(dt.scale))).cast("double")
      def snap(c: Column) =
        call_function("dec_cast", c, lit(18), lit(9)).cast("double")
      val o = t(s, dir, "orders")
      val stats = o.groupBy(col("o_orderpriority").as("prio"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          psum(col("o_totalprice"), dec2).as("sx"),
          psum(col("o_totalprice") * col("o_totalprice"), dec244).as("sx2"))
        .select(col("prio"),
          snap(col("sx") / col("n")).as("mean"),
          snap(sqrt((col("n") * col("sx2") - col("sx") * col("sx")) /
            (col("n") * (col("n") - lit(1))))).as("sd"))
      o.join(broadcast(stats), col("o_orderpriority") === col("prio"))
        .filter(abs(col("o_totalprice") - col("mean")) > lit(1.5) * col("sd"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice").cast("double").as("price"),
          ((col("o_totalprice") - col("mean")) / col("sd")).cast("double").as("zscore"))
    },

    // ---- higher-order functions over arrays ---------------------------------
    // filter/exists/transform+aggregate lambdas (HOFs run interpreted in
    // Spark — fine for breadth; the hot-path dedup pipelines use native
    // expressions instead, see the project perf notes)
    Q(
      "q_hof_funcs",
      raw"""SELECT doc_id,
        |  CAST(len(list_filter(w, t -> length(t) > 6)) AS BIGINT) AS n_long_words,
        |  len(list_filter(w, t -> regexp_matches(t, '[0-9]'))) > 0 AS has_digit_word,
        |  CAST(list_reduce(list_transform(w, t -> length(t)), (a, b) -> a + b) AS BIGINT) AS total_chars,
        |  CAST(list_reduce(list_transform(w, t -> length(t)), (a, b) -> a + b) AS DOUBLE)
        |    / len(w) AS avg_word_len
        |FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)""") {
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), expr(raw"split(trim(text), '\\s+')").as("w"))
          .select(
            col("doc_id"),
            expr("size(filter(w, t -> length(t) > 6))").cast("long").as("n_long_words"),
            expr("exists(w, t -> t rlike '[0-9]')").as("has_digit_word"),
            expr("aggregate(w, 0, (a, t) -> a + length(t))").cast("long").as("total_chars"),
            expr("cast(aggregate(w, 0, (a, t) -> a + length(t)) as double) / size(w)")
              .as("avg_word_len"))
    },

    // ---- map type: construct, extract, introspect ---------------------------
    Q(
      "q_map_funcs",
      """SELECT p_partkey,
        |  m['brand'][1] AS brand_v,
        |  m['type'][1] AS type_v,
        |  CAST(cardinality(m) AS INT) AS n_keys,
        |  array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
        |FROM (SELECT p_partkey, map(['brand','type'], [p_brand, p_type]) AS m FROM part)""") {
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            map(lit("brand"), col("p_brand"), lit("type"), col("p_type")).as("m"))
          .select(
            col("p_partkey"),
            element_at(col("m"), "brand").as("brand_v"),
            element_at(col("m"), "type").as("type_v"),
            size(col("m")).as("n_keys"),
            array_join(sort_array(map_keys(col("m"))), ",").as("keys_sorted"))
    },

    // ---- deterministic mode (most frequent value, min-value tie-break) ------
    // the builtin `mode()` picks an arbitrary value on ties in both
    // engines; the count+rank formulation pins the tie-break and is the
    // scalable shape anyway (two map-side-combinable aggregations, no
    // per-group value buffers)
    Q(
      "q_mode",
      """SELECT l_returnflag, CAST(mode_qty AS DOUBLE) AS mode_qty, mode_cnt FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_cnt,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, l_quantity) AS rn
        |  FROM (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |        FROM lineitem GROUP BY 1, 2)
        |) WHERE rn = 1""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("cnt").desc, col("l_quantity"))))
        .filter(col("rn") === 1)
        .select(
          col("l_returnflag"),
          col("l_quantity").cast("double").as("mode_qty"),
          col("cnt").as("mode_cnt"))
    },

    // ---- TPC-H Q6 shape: forecasting revenue change (pure predicate agg) ----
    Q(
      "q_tpch_q6",
      """SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""") { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
        .agg(
          dsum(col("l_extendedprice") * col("l_discount"), dec4).as("revenue"),
          count(lit(1)).as("n_lines"))
    },

    // ---- TPC-H Q19 shape: disjunctive join predicates -----------------------
    // OR-of-conjunctions across both join sides: the equi-join key is
    // still extracted (hash join on partkey), only the residual
    // disjunction is evaluated post-join — the plan property that keeps
    // this from degenerating into a cartesian filter
    Q(
      "q_tpch_q19",
      """SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 45 AND l_quantity >= 20 AND l_quantity <= 40)""") {
      (s, dir) =>
        val disj =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity") >= 1 && col("l_quantity") <= 21) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 30) &&
            col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 45) &&
            col("l_quantity") >= 20 && col("l_quantity") <= 40)
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")), col("p_partkey") === col("l_partkey"))
          .filter(disj)
          .agg(
            dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), dec4).as("revenue"),
            count(lit(1)).as("n_lines"))
    },

    // ---- TPC-H Q14 shape: promo revenue share (two-sum division) ------------
    Q(
      "q_tpch_q14",
      """SELECT
        |  100.0 * CAST(CAST(sum(CAST(CASE WHEN p_type = 'ECONOMY'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4)) AS DOUBLE)
        |  / CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    AS DECIMAL(18,4)) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""") { (s, dir) =>
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("l_shipdate") < lit("1996-02-01").cast("timestamp_ntz"))
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) *
            dsum(when(col("p_type") === "ECONOMY", rev).otherwise(lit(0.0)), dec4) /
            dsum(rev, dec4)).as("promo_revenue"))
    },

    // ---- date formatting (dialect-mapped patterns, identical strings) -------
    Q(
      "q_date_format",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
        |  strftime(o_orderdate, '%Y-%m') AS year_month,
        |  strftime(o_orderdate, '%d/%m/%Y') AS eu_day,
        |  CAST(strftime(o_orderdate, '%j') AS BIGINT) AS day_of_year
        |FROM orders""") { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"),
        date_format(col("o_orderdate"), "yyyy-MM").as("year_month"),
        date_format(col("o_orderdate"), "dd/MM/yyyy").as("eu_day"),
        dayofyear(col("o_orderdate")).cast("bigint").as("day_of_year"))
    },

    // ---- LIKE-pattern breadth (LIKE / NOT LIKE / ILIKE / escape / IN) -------
    Q(
      "q_like_patterns",
      """SELECT p_partkey,
        |  p_name LIKE '%green%' AS has_green,
        |  p_name NOT LIKE 'a%' AS not_a_start,
        |  p_brand ILIKE 'brand#1_' AS brand_teen,
        |  p_type LIKE '%MED%' AS has_med,
        |  p_brand IN ('Brand#12', 'Brand#23', 'Brand#34') AS in_three
        |FROM part""") { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        col("p_name").like("%green%").as("has_green"),
        (!col("p_name").like("a%")).as("not_a_start"),
        col("p_brand").ilike("brand#1_").as("brand_teen"),
        col("p_type").like("%MED%").as("has_med"),
        col("p_brand").isin("Brand#12", "Brand#23", "Brand#34").as("in_three"))
    },

    // ---- unpivot (wide -> long) ---------------------------------------------
    // stack() in Spark; the oracle states the same reshape as the
    // engine-neutral UNION ALL (what UNPIVOT desugars to)
    Q(
      "q_unpivot",
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'price' AS metric, p_retailprice AS value FROM part""") { (s, dir) =>
      t(s, dir, "part").selectExpr(
        "p_partkey",
        "stack(2, 'size', cast(p_size as double), 'price', p_retailprice) as (metric, value)")
    },

    // ---- try_cast (error-tolerant parsing) ----------------------------------
    // numeric-token extraction from free text: failures become NULL, not
    // task aborts — the semantics a dirty-corpus parse needs. The oracle
    // regex-gates its TRY_CAST because DuckDB's accepts more shapes than
    // Spark's ANSI one ('12.5'→13, '1e3'→1000 vs NULL); the gate equals
    // Spark's exact accept set (optional sign + digits, overflow→NULL).
    Q(
      "q_try_cast",
      raw"""SELECT doc_id,
        |  count(CASE WHEN regexp_matches(t, '^[+-]?[0-9]+$$') THEN TRY_CAST(t AS BIGINT) END) AS n_numeric,
        |  CAST(sum(CASE WHEN regexp_matches(t, '^[+-]?[0-9]+$$') THEN TRY_CAST(t AS BIGINT) END) AS BIGINT) AS sum_numeric,
        |  count(*) AS n_tokens
        |FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |      FROM documents)
        |GROUP BY doc_id""") { (s, dir) =>
      // rlike-gate before try_cast: ANSI cast rejects by throwing, and
      // try_cast catching one exception per non-numeric token (the vast
      // majority of a text corpus) costs ~10x the whole aggregation. The
      // gate equals the cast's accept set minus whitespace trim (split
      // output never has whitespace), so only overflow rows still pay the
      // internal catch, yielding NULL (try_cast never propagates a throw).
      t(s, dir, "documents")
        .select(col("doc_id"), explode(expr(raw"split(trim(text), '\\s+')")).as("t"))
        .select(col("doc_id"),
          when(col("t").rlike("^[+-]?[0-9]+$"), expr("try_cast(t as bigint)")).as("v"))
        .groupBy(col("doc_id"))
        .agg(
          count(col("v")).as("n_numeric"),
          sum(col("v")).cast("bigint").as("sum_numeric"),
          count(lit(1)).as("n_tokens"))
    },

    // ---- TPC-H Q18 shape: large-quantity orders -----------------------------
    // groupBy-then-semi-join: the aggregate runs once over lineitem, the
    // qualifying keys join back to orders (AQE broadcasts the tiny
    // qualifying set at any scale where it stays small).
    Q(
      "q_tpch_q18",
      """SELECT c_custkey, o_orderkey, o_orderdate,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 210)
        |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY totalprice DESC, o_orderkey LIMIT 100""") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val bigKeys = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
        .filter(col("q") > 210)
        .select(col("l_orderkey").as("bk"))
      li.join(bigKeys, col("l_orderkey") === col("bk"), "left_semi")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          call_function("dec_cast", col("o_totalprice"), lit(18), lit(2))
            .cast("double").as("totalprice"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("totalprice"), col("sum_qty"))
    },

    // ---- table checksums: copy/replication integrity -----------------------
    // The operation a dist-copy deployment (the reference's actual job)
    // needs after every transfer: prove source and destination hold the
    // same rows WITHOUT moving the data again. Per-row 60-bit CrossHash
    // of a canonical key serialization, folded with ORDER-FREE
    // aggregates only (xor + min + max + count) so the fingerprint is
    // partition- and layout-independent: any engine, any row order, any
    // file split produces the same line. One map pass per table with
    // map-side combine — the 100 TB cost is one scan, the shuffle is
    // four longs per partition. Float/decimal/timestamp columns stay
    // OUT of the canonical string (their text renderings are
    // engine-specific); integer epochs stand in for timestamps.
    Q(
      "q_table_checksum", {
        def leg(tbl: String, expr: String) =
          s"""SELECT '$tbl' AS tbl, count(*) AS n_rows,
             |  bit_xor(fp) AS xor_fp, min(fp) AS min_fp, max(fp) AS max_fp
             |FROM (SELECT ${graft.functions.CrossHash.duck(expr)} AS fp FROM $tbl)""".stripMargin
        Seq(
          leg("documents", "concat(doc_id::VARCHAR, '|', lang, '|', text)"),
          leg("events",
            "concat(event_id::VARCHAR, '|', event_type, '|', user_id::VARCHAR, '|', epoch_us(ts)::VARCHAR)"),
          leg("orders", "concat(o_orderkey::VARCHAR, '|', o_custkey::VARCHAR, '|', o_orderstatus)"))
          .mkString("\nUNION ALL\n")
      }) { (s, dir) =>
      def leg(tbl: String, serial: String) =
        Tables(s, dir, tbl)
          .select(expr(graft.functions.CrossHash.h(serial)).as("fp"))
          .agg(
            count(lit(1)).as("n_rows"), expr("bit_xor(fp)").as("xor_fp"),
            min(col("fp")).as("min_fp"), max(col("fp")).as("max_fp"))
          .select(lit(tbl).as("tbl"), col("n_rows"), col("xor_fp"),
            col("min_fp"), col("max_fp"))
      leg("documents", "concat(cast(doc_id as string), '|', lang, '|', text)")
        .unionByName(leg("events",
          "concat(cast(event_id as string), '|', event_type, '|', cast(user_id as string), '|', cast(ts_ns div 1000 as string))"))
        .unionByName(leg("orders",
          "concat(cast(o_orderkey as string), '|', cast(o_custkey as string), '|', o_orderstatus)"))
    },

    // ---- join-key skew profile ---------------------------------------------
    // The pre-flight diagnostic before any big join at 100 TB: the
    // frequency histogram of a join key in power-of-two buckets, which
    // is exactly the information that decides broadcast vs shuffle vs
    // salting (the project skew notes). Per-key counts are one
    // HashAggregate with map-side combine; the bucket roll-up runs on
    // the BOUNDED key-count frame. The bucket index is
    // length(bin(cnt)) - 1 — integer floor(log2) on both engines, no
    // float log whose last-ulp could flip a 2^k boundary.
    Q(
      "q_skew_profile", {
        def leg(tbl: String, key: String) =
          s"""SELECT '$tbl' AS tbl, length(bin(cnt)) - 1 AS bucket,
             |  count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows, min(k) AS min_key
             |FROM (SELECT $key AS k, count(*) AS cnt FROM $tbl GROUP BY $key)
             |GROUP BY 2""".stripMargin
        Seq(
          leg("lineitem", "l_orderkey"),
          leg("events", "user_id")).mkString("\nUNION ALL\n")
      }) { (s, dir) =>
      def leg(tbl: String, key: String) =
        Tables(s, dir, tbl)
          .groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
          .select(col("k"), col("cnt"),
            (length(expr("bin(cnt)")) - 1).cast("long").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
            min(col("k")).as("min_key"))
          .select(lit(tbl).as("tbl"), col("bucket"), col("n_keys"),
            col("n_rows"), col("min_key"))
      leg("lineitem", "l_orderkey").unionByName(leg("events", "user_id"))
    })
}
