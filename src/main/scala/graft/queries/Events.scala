package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Event-stream batch operators over the `events` table. Gap-based
  * sessionization is the batch twin of the Structured Streaming
  * state-timeout sessionizer in [[graft.streaming]]; both use the same
  * 30-minute gap. Timestamps are compared as microsecond longs
  * (`ts_ns div 1000` ≡ DuckDB's µs TIMESTAMP) so the cross-engine hash
  * never touches sub-µs precision.
  *
  * Scale shape: one shuffle on user_id (the window partition), then a
  * groupBy on (user_id, session_id) that reuses the same partitioning —
  * no second exchange.
  */
object Events {

  private val gapUs = 1800000000L // 30 min in µs
  private val hourUs = 3600000000L // 1 hour in µs (interval-join bucket)
  private val weekUs = 604800000000L // 7 days in µs

  /** Power-iteration rounds for the stationary distribution (plenty for
    * a ≤ dozens-of-types chain; both engines run the same count, so
    * convergence is a quality knob, not a correctness one). Declared
    * BEFORE `queries`: object vals initialize in declaration order. */
  private val MARKOV_ROUNDS = 12

  val queries: Seq[Q] = Seq(
    Q(
      "q_sessionize",
      s"""WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $gapUs
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT user_id, tus, event_id,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM e
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(tus) AS t_start, max(tus) AS t_end
        |FROM s GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("tus"))
        .withColumn(
          "new_s",
          when(lag(col("tus"), 1).over(w).isNull ||
            col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1).otherwise(0))
        .withColumn(
          "session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("tus")).as("t_start"),
          max(col("tus")).as("t_end"))
    },

    // ---- gap sessions via the session_window() builtin (batch) -------------
    // the declarative twin of q_sessionize, oracle-checked against the
    // hand-rolled lag/cumsum formulation — proving the builtin merges
    // sessions with exactly the 30-min-gap semantics (window end is
    // exclusive: last event + gap)
    Q(
      "q_session_window",
      s"""WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS tus,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $gapUs
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT user_id, tus, value,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM e
        |)
        |SELECT user_id, min(tus) AS s_start, max(tus) + $gapUs AS s_end,
        |  count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(expr("dec_cast(value, 18, 2)")).cast("decimal(18,2)").cast("double")
            .as("sum_value"))
        .select(
          expr("unix_micros(cast(session_window.start as timestamp))").as("s_start"),
          expr("unix_micros(cast(session_window.end as timestamp))").as("s_end"),
          col("user_id"), col("n_events"), col("sum_value"))
    },

    // ---- tumbling time-window aggregation (the window() builtin) -----------
    // the batch form of the streaming windowedAgg: 1-hour tumbling
    // windows via window(), start/end surfaced as epoch-µs longs so the
    // oracle (date_trunc arithmetic) hash-matches exactly
    Q(
      "q_tumbling_window",
      """SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS w_start,
        |  CAST(epoch_us(date_trunc('hour', ts)) + 3600000000 AS BIGINT) AS w_end,
        |  event_type, count(*) AS cnt,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(expr("dec_cast(value, 18, 2)")).cast("decimal(18,2)").cast("double").as("sum_value"))
        .select(
          expr("unix_micros(cast(window.start as timestamp))").as("w_start"),
          expr("unix_micros(cast(window.end as timestamp))").as("w_end"),
          col("event_type"), col("cnt"), col("sum_value"))
    },

    // ---- sliding (hopping) time windows ------------------------------------
    // 1-hour windows every 30 minutes: each event lands in exactly two
    // windows. The window() builtin plans this as a 2-row explode + the
    // same single aggregation as tumbling — the oracle materializes the
    // two candidate starts explicitly.
    Q(
      "q_sliding_window",
      """SELECT w_start, w_start + 3600000000 AS w_end, event_type,
        |  count(*) AS cnt,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT event_type, value, unnest([fl, fl - 1800000000]) AS w_start
        |  FROM (SELECT event_type, value,
        |          (epoch_us(ts) // 1800000000) * 1800000000 AS fl FROM events))
        |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(expr("dec_cast(value, 18, 2)")).cast("decimal(18,2)").cast("double").as("sum_value"))
        .select(
          expr("unix_micros(cast(window.start as timestamp))").as("w_start"),
          expr("unix_micros(cast(window.end as timestamp))").as("w_end"),
          col("event_type"), col("cnt"), col("sum_value"))
    },

    // ---- conversion funnel (sequential pattern) ----------------------------
    // click -> first purchase AFTER that click, with a 1h-conversion
    // tier: the sequential-event query behind attribution/retention
    // reports. Two aggregations + one equi-join on user_id; the time
    // predicate rides the join, so no per-user event blowup.
    Q(
      "q_events_funnel",
      """WITH c AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_click
        |  FROM events WHERE event_type = 'click' GROUP BY 1
        |), fp AS (
        |  SELECT c.user_id, c.first_click, min(epoch_us(p.ts)) AS first_purchase
        |  FROM c LEFT JOIN events p
        |    ON p.user_id = c.user_id AND p.event_type = 'purchase'
        |       AND epoch_us(p.ts) >= c.first_click
        |  GROUP BY 1, 2
        |)
        |SELECT count(*) AS n_click_users,
        |  count(first_purchase) AS n_converted,
        |  count(CASE WHEN first_purchase - first_click <= 3600000000 THEN 1 END) AS n_converted_1h,
        |  min(first_click) AS earliest_click
        |FROM fp""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"))
        .agg(min(expr("ts_ns div 1000")).as("first_click"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), expr("ts_ns div 1000").as("p_tus"))
      clicks
        .join(purchases,
          col("user_id") === col("p_user") && col("p_tus") >= col("first_click"), "left")
        .groupBy(col("user_id"), col("first_click"))
        .agg(min(col("p_tus")).as("first_purchase"))
        .agg(
          count(lit(1)).as("n_click_users"),
          count(col("first_purchase")).as("n_converted"),
          count(when(col("first_purchase") - col("first_click") <= 3600000000L, 1))
            .as("n_converted_1h"),
          min(col("first_click")).as("earliest_click"))
    },

    // ---- time-weighted average value per user ------------------------------
    // each event's value weighted by how long it was "current" (gap to
    // the user's next event): the time-series aggregation behind
    // duration-weighted metrics. value*gap products route through
    // DECIMAL so the weighted sum is exact and order-free; the final
    // ratio is one double division of two exact aggregates.
    Q(
      "q_time_weighted",
      """WITH g AS (
        |  SELECT user_id, value,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |      - epoch_us(ts) AS gap_us
        |  FROM events
        |)
        |SELECT user_id,
        |  count(*) AS n_gaps,
        |  CAST(sum(gap_us) AS BIGINT) AS total_us,
        |  CAST(CAST(
        |    CAST(CAST(sum(CAST(value * gap_us AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS DOUBLE)
        |      / CAST(sum(gap_us) AS DOUBLE)
        |    AS DECIMAL(18,9)) AS DOUBLE) AS tw_avg_value
        |FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
        |GROUP BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"), expr("ts_ns div 1000").as("tus"))
        .withColumn("gap_us", lead(col("tus"), 1).over(w) - col("tus"))
        .filter(col("gap_us").isNotNull && col("gap_us") > 0)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_gaps"),
          sum(col("gap_us")).cast("bigint").as("total_us"),
          call_function("dec_cast",
            sum(call_function("dec_cast", col("value") * col("gap_us"), lit(28), lit(6)))
              .cast("decimal(38,6)").cast("double")
              / sum(col("gap_us")).cast("double"),
            lit(18), lit(9)).cast("double").as("tw_avg_value"))
    },

    // ---- retention cohorts (weekly matrix) ---------------------------------
    // users grouped by first-seen epoch-week, counted per week offset —
    // the cohort retention report. Integer day/week arithmetic only
    // (floor division on positive epochs), so the matrix is bit-identical
    // across engines. Two aggregations + one equi-join on user_id.
    Q(
      "q_retention_cohorts",
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), f AS (
        |  SELECT user_id, min(day) AS d0 FROM d GROUP BY 1
        |)
        |SELECT f.d0 // 7 AS cohort_week,
        |  (d.day - f.d0) // 7 AS week_offset,
        |  count(DISTINCT d.user_id) AS active_users
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "events")
        .select(col("user_id"), expr("(ts_ns div 1000) div 86400000000").as("day"))
      val f = d.groupBy(col("user_id").as("f_user")).agg(min(col("day")).as("d0"))
      d.join(f, col("user_id") === col("f_user"))
        .groupBy(
          expr("d0 div 7").as("cohort_week"),
          expr("(day - d0) div 7").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
    },

    // ---- AS-OF join (custom operator, DuckDB native ASOF as oracle) --------
    // for every event: the user's latest purchase at-or-before that
    // event. Runs through graft.plans.AsOfJoinExec — co-partitioned
    // linear merge, no pair blowup.
    Q(
      "q_asof_join",
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        |), p AS (
        |  SELECT user_id AS p_user, epoch_us(ts) AS p_tus, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT e.event_id, e.user_id, e.tus, p.purchase_id, p.p_tus
        |FROM e ASOF LEFT JOIN p ON e.user_id = p.p_user AND e.tus >= p.p_tus""".stripMargin) {
      (s, dir) =>
        val ev = Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("tus"))
        // dedup to one purchase per (user, time) so the as-of pick is
        // deterministic under time ties
        val purchases = Tables(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("p_user"), expr("ts_ns div 1000").as("p_tus"))
          .agg(max(col("event_id")).as("purchase_id"))
          .select(col("p_user"), col("p_tus"), col("purchase_id"))
        org.apache.spark.sql.graft.AsOfApi
          .join(ev, purchases, "user_id", "p_user", "tus", "p_tus")
          .select(col("event_id"), col("user_id"), col("tus"), col("purchase_id"), col("p_tus"))
    },

    // ---- as-of join with tolerance (bounded lookback) ----------------------
    // same merge, but a match older than 1h is discarded — the form
    // sensor/trade enrichment needs (a stale quote is not a quote). The
    // oracle nulls out-of-tolerance matches from the unbounded ASOF:
    // equivalent, since any earlier right row is farther away.
    Q(
      "q_asof_tolerance",
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
        |), p AS (
        |  SELECT user_id AS p_user, epoch_us(ts) AS p_tus, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT event_id, user_id, tus,
        |  CASE WHEN tus - p_tus <= 3600000000 THEN purchase_id END AS purchase_id,
        |  CASE WHEN tus - p_tus <= 3600000000 THEN p_tus END AS p_tus
        |FROM (SELECT e.event_id, e.user_id, e.tus, p.purchase_id, p.p_tus
        |      FROM e ASOF LEFT JOIN p
        |      ON e.user_id = p.p_user AND e.tus >= p.p_tus)""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("tus"))
      val purchases = Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id").as("p_user"), expr("ts_ns div 1000").as("p_tus"))
        .agg(max(col("event_id")).as("purchase_id"))
        .select(col("p_user"), col("p_tus"), col("purchase_id"))
      org.apache.spark.sql.graft.AsOfApi
        .join(ev, purchases, "user_id", "p_user", "tus", "p_tus",
          tolerance = Some(3600000000L)) // 1 hour in microseconds
        .select(col("event_id"), col("user_id"), col("tus"), col("purchase_id"), col("p_tus"))
    },

    // ---- behavioral Markov chain: stationary distribution ------------------
    // Which event types dominate long-run user behavior: per-user
    // transition edges (the sessionize window shape — ONE corpus
    // shuffle, partitioned on user_id, which scales with users, not a
    // categorical), aggregated to a k×k transition-count matrix that is
    // BOUNDED by the event-type vocabulary, then the stationary
    // distribution by power iteration on the tiny matrix. Cross-engine
    // determinism is the q_pca_power recipe: transition counts are
    // exact integers, probabilities one int/int division each, and the
    // 12 iteration rounds run in IEEE doubles with every reduction a
    // pinned left fold in lexicographic node order — Spark in the
    // driver over the collected k² counts (bounded telemetry, the
    // k-means/BPE pattern), DuckDB in unrolled MATERIALIZED CTEs —
    // so the vectors are bit-equal pre-snap. Dangling types (no
    // outgoing edges) get the uniform 1/k row on both engines.
    Q(
      "q_markov_stationary", {
        val rounds = (1 to MARKOV_ROUNDS).map { r =>
          s"""v$r AS MATERIALIZED (
             |  SELECT list(u ORDER BY j) AS v FROM (
             |    SELECT c.ti AS j,
             |      list_reduce(list_transform(generate_series(1, len(pv.v)), i -> pv.v[i] * c.pcol[i]),
             |        (x, y) -> x + y) AS u
             |    FROM cols c, v${r - 1} pv)
             |)""".stripMargin
        }.mkString(",\n")
        s"""WITH ord AS MATERIALIZED (
           |  SELECT event_type AS et, row_number() OVER (ORDER BY event_type) AS idx
           |  FROM (SELECT DISTINCT event_type FROM events)
           |), seq AS (
           |  SELECT event_type AS ft,
           |    lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS tt
           |  FROM events
           |), cnts AS (
           |  SELECT ft, tt, count(*) AS c FROM seq WHERE tt IS NOT NULL GROUP BY ft, tt
           |), grid AS MATERIALIZED (
           |  SELECT f.idx AS fi, t.idx AS ti, coalesce(c.c, 0) AS c
           |  FROM ord f CROSS JOIN ord t
           |  LEFT JOIN cnts c ON c.ft = f.et AND c.tt = t.et
           |), probs AS MATERIALIZED (
           |  SELECT fi, ti, rs,
           |    CASE WHEN rs > 0 THEN CAST(c AS DOUBLE) / rs
           |         ELSE 1.0 / (SELECT count(*) FROM ord) END AS p
           |  FROM (SELECT fi, ti, c, sum(c) OVER (PARTITION BY fi) AS rs FROM grid)
           |), cols AS MATERIALIZED (
           |  SELECT ti, list(p ORDER BY fi) AS pcol FROM probs GROUP BY ti
           |), rsums AS (
           |  SELECT fi, any_value(rs) AS rs FROM probs GROUP BY fi
           |),
           |v0 AS (SELECT list_transform(generate_series(1, kk.k), x -> 1.0 / kk.k) AS v
           |       FROM (SELECT count(*) AS k FROM ord) kk),
           |$rounds
           |SELECT o.et AS event_type, CAST(r.rs AS BIGINT) AS n_out,
           |  CAST(CAST(pv.v[o.idx] AS DECIMAL(18, 12)) AS DOUBLE) AS p_stat
           |FROM ord o JOIN rsums r ON r.fi = o.idx CROSS JOIN v$MARKOV_ROUNDS pv""".stripMargin
      }) { (s, dir) =>
      val seqW = Window.partitionBy(col("user_id"))
        .orderBy(expr("ts_ns div 1000"), col("event_id"))
      // node set from ALL events (not just transitions): a type whose
      // occurrences are all session-final must still get its uniform row
      val nodes = Tables(s, dir, "events").select(col("event_type"))
        .distinct().collect().map(_.getString(0)).sorted
      val k = nodes.length
      // LOUD driver-matrix guard (the minLabelComponents maxRounds
      // pattern), checked BEFORE the k² collect below: the k×k
      // transition matrix and its power iteration are driver-side by
      // design — bounded by the event-type VOCABULARY, not the corpus —
      // but an unexpectedly wide vocabulary (a misparsed type column,
      // an id leaking into event_type) would OOM the driver silently at
      // k². Fail with the actual k instead.
      val maxK = 4096
      require(k <= maxK,
        s"q_markov_stationary: event-type vocabulary k=$k exceeds $maxK — " +
          "the k×k driver-side transition matrix is only sound for a bounded " +
          "type vocabulary; widen maxK deliberately or pre-bucket event_type")
      val cnts = Tables(s, dir, "events")
        .select(col("event_type").as("ft"),
          lead(col("event_type"), 1).over(seqW).as("tt"))
        .filter(col("tt").isNotNull)
        .groupBy(col("ft"), col("tt"))
        .agg(count(lit(1)).as("c"))
        .collect() // k² rows, bounded by the guarded vocabulary above
      val idx = nodes.zipWithIndex.toMap
      val cm = Array.ofDim[Long](k, k)
      cnts.foreach(r => cm(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
      val rs = cm.map(_.sum)
      val pm = Array.tabulate(k, k) { (i, j) =>
        if (rs(i) > 0) cm(i)(j).toDouble / rs(i) else 1.0 / k
      }
      // pinned-order iteration: product list, then a strict left fold —
      // operation-for-operation the DuckDB CTE rounds
      var v = Array.fill(k)(1.0 / k)
      for (_ <- 1 to MARKOV_ROUNDS) {
        v = Array.tabulate(k) { j =>
          var acc = v(0) * pm(0)(j)
          var i = 1
          while (i < k) { acc = acc + v(i) * pm(i)(j); i += 1 }
          acc
        }
      }
      import s.implicits._
      nodes.toSeq.map(et => (et, rs(idx(et)), v(idx(et))))
        .toDF("event_type", "n_out", "p_raw")
        .select(col("event_type"), col("n_out"),
          call_function("dec_cast", col("p_raw"), lit(18), lit(12))
            .cast("double").as("p_stat"))
    },

    // ---- ordered funnel: view -> click -> purchase --------------------------
    // The product-analytics staple: how many users progress through the
    // step sequence IN ORDER (first view, first click strictly after
    // it, first purchase strictly after that). Three user_id-keyed
    // stage aggregates — each a HashAggregate joined on the same key,
    // so AQE reuses the user partitioning; counts are exact integers
    // and the conversion ratios one int/int division each.
    Q(
      "q_event_funnel",
      s"""WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
        |), v AS (
        |  SELECT user_id, min(tus) AS tv FROM ev WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT ev.user_id, min(tus) AS tc FROM ev JOIN v ON ev.user_id = v.user_id
        |  WHERE event_type = 'click' AND tus > tv GROUP BY ev.user_id
        |), p AS (
        |  SELECT ev.user_id, min(tus) AS tp FROM ev JOIN c ON ev.user_id = c.user_id
        |  WHERE event_type = 'purchase' AND tus > tc GROUP BY ev.user_id
        |), f AS (
        |  SELECT 1 AS step_idx, 'view' AS step, (SELECT count(*) FROM v) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
        |)
        |SELECT step_idx, step, n_users,
        |  CASE WHEN lag(n_users) OVER (ORDER BY step_idx) > 0
        |       THEN CAST(n_users AS DOUBLE) / lag(n_users) OVER (ORDER BY step_idx) END AS conv_prev,
        |  CASE WHEN (SELECT n_users FROM f WHERE step_idx = 1) > 0
        |       THEN CAST(n_users AS DOUBLE) / (SELECT n_users FROM f WHERE step_idx = 1) END AS conv_first
        |FROM f""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), expr("ts_ns div 1000").as("tus"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("tus")).as("tv"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("tus") > col("tv"))
        .groupBy(col("user_id")).agg(min(col("tus")).as("tc"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("tus") > col("tc"))
        .groupBy(col("user_id")).agg(min(col("tus")).as("tp"))
      def cnt(df: org.apache.spark.sql.DataFrame, i: Int, n: String) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i).as("step_idx"), lit(n).as("step"), col("n_users"))
      val f = cnt(v, 1, "view").unionByName(cnt(c, 2, "click"))
        .unionByName(cnt(p, 3, "purchase"))
      // the funnel frame is 3 rows: the unpartitioned window and the
      // first-step rejoin run on a bounded frame, not the corpus
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("step_idx"))
      f.withColumn("prev", lag(col("n_users"), 1).over(w))
        .crossJoin(broadcast(
          f.filter(col("step_idx") === 1).select(col("n_users").as("first_n"))))
        .select(
          col("step_idx"), col("step"), col("n_users"),
          when(col("prev") > 0, col("n_users").cast("double") / col("prev"))
            .as("conv_prev"),
          when(col("first_n") > 0, col("n_users").cast("double") / col("first_n"))
            .as("conv_first"))
    },

    // ---- weekly cohort retention -------------------------------------------
    // Cohort = the ISO-epoch week of a user's first event (exact BIGINT
    // µs division — no calendar arithmetic to disagree on); retention =
    // distinct active users per (cohort, week offset) over the cohort
    // size. One groupBy(user) for cohorts, one distinct user-week
    // frame, one bounded roll-up — every ratio an int/int division.
    Q(
      "q_cohort_retention",
      s"""WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // $weekUs AS wk FROM events
        |), coh AS (
        |  SELECT user_id, min(wk) AS cwk FROM uw GROUP BY user_id
        |), size_ AS (
        |  SELECT cwk, count(*) AS n_cohort FROM coh GROUP BY cwk
        |)
        |SELECT uw.wk - coh.cwk AS week_offset, coh.cwk AS cohort_week,
        |  count(*) AS n_active, any_value(size_.n_cohort) AS n_cohort,
        |  CAST(count(*) AS DOUBLE) / any_value(size_.n_cohort) AS retention
        |FROM uw JOIN coh ON uw.user_id = coh.user_id
        |JOIN size_ ON coh.cwk = size_.cwk
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val uw = Tables(s, dir, "events")
        .select(col("user_id"), expr(s"(ts_ns div 1000) div $weekUs").as("wk"))
        .distinct()
      val coh = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
      val size = coh.groupBy(col("cwk")).agg(count(lit(1)).as("n_cohort"))
      uw.join(coh, "user_id")
        .join(broadcast(size), "cwk")
        .groupBy((col("wk") - col("cwk")).as("week_offset"),
          col("cwk").as("cohort_week"))
        .agg(count(lit(1)).as("n_active"), first(col("n_cohort")).as("n_cohort"))
        .select(col("week_offset"), col("cohort_week"), col("n_active"),
          col("n_cohort"),
          (col("n_active").cast("double") / col("n_cohort")).as("retention"))
    },

    // ---- interval join: cross-user session co-activity ---------------------
    // WHO is active at the same time — the temporal join a plain
    // equi-join cannot express. The naive formulation is a quadratic
    // range self-join (a.t0 <= b.t1 AND b.t0 <= a.t1); the scale shape
    // here is the classical BUCKETIZED interval join: every session
    // explodes into the hour buckets it spans (sessions are gap-bounded,
    // so the span — and the explode factor — is small), overlap
    // candidates come from an EQUI-join on the bucket, the exact
    // interval predicate filters, and a distinct collapses pairs that
    // share several buckets (their overlap value is identical in every
    // copy). Per-bucket fan-out is bounded by CONCURRENCY (sessions
    // live per hour), not corpus size; at a hotter scale the bucket
    // width is the knob (and AQE's skew split handles a flash-crowd
    // hour). Output is the per-user co-activity profile: distinct
    // partners, overlapping session pairs, total overlapped µs — all
    // exact integers. Directed (a != b), so each user's row counts its
    // own perspective and no union-of-orientations is needed.
    Q(
      "q_session_overlap",
      s"""WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $gapUs
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), s AS (
        |  SELECT user_id, tus, event_id,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM e
        |), sess AS (
        |  SELECT user_id, sid, min(tus) AS t0, max(tus) AS t1 FROM s GROUP BY user_id, sid
        |), hb AS (
        |  SELECT user_id, sid, t0, t1,
        |    unnest(generate_series(t0 // $hourUs, t1 // $hourUs)) AS h
        |  FROM sess
        |), pairs AS (
        |  SELECT DISTINCT a.user_id AS ua, a.sid AS sa, b.user_id AS ub, b.sid AS sb,
        |    least(a.t1, b.t1) - greatest(a.t0, b.t0) AS overlap_us
        |  FROM hb a JOIN hb b ON a.h = b.h AND a.user_id <> b.user_id
        |  WHERE a.t0 <= b.t1 AND b.t0 <= a.t1
        |)
        |SELECT ua AS user_id,
        |  CAST(count(DISTINCT ub) AS BIGINT) AS n_partners,
        |  count(*) AS n_session_overlaps,
        |  CAST(sum(overlap_us) AS BIGINT) AS total_overlap_us
        |FROM pairs GROUP BY ua""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val sess = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("tus"))
        .withColumn(
          "new_s",
          when(lag(col("tus"), 1).over(w).isNull ||
            col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1).otherwise(0))
        .withColumn(
          "sid",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("tus")).as("t0"), max(col("tus")).as("t1"))
      val hb = sess.select(col("user_id"), col("sid"), col("t0"), col("t1"),
        explode(expr(s"sequence(t0 div $hourUs, t1 div $hourUs)")).as("h"))
      // r20: a qualifying pair is emitted ONLY from the bucket holding
      // the overlap's start (greatest(t0a, t0b) — inside both spans by
      // the interval predicate, so exactly one shared bucket matches).
      // That replaces the oracle's DISTINCT collapse of multi-bucket
      // duplicates with a map-side predicate: same pair set, one fewer
      // corpus exchange (the distinct's all-column shuffle is gone).
      val pairs = hb.as("a")
        .join(hb.as("b"),
          expr("a.h = b.h and a.user_id <> b.user_id " +
            "and a.t0 <= b.t1 and b.t0 <= a.t1 " +
            s"and a.h = greatest(a.t0, b.t0) div $hourUs"))
        .select(
          col("a.user_id").as("ua"), col("a.sid").as("sa"),
          col("b.user_id").as("ub"), col("b.sid").as("sb"),
          expr("least(a.t1, b.t1) - greatest(a.t0, b.t0)").as("overlap_us"))
      pairs.groupBy(col("ua").as("user_id"))
        .agg(
          countDistinct(col("ub")).cast("bigint").as("n_partners"),
          count(lit(1)).as("n_session_overlaps"),
          sum(col("overlap_us")).cast("bigint").as("total_overlap_us"))
    },

    // ---- temporal anomaly scan: hourly volume z-scores ---------------------
    // The ingest-monitoring pass an event pipeline runs before trusting
    // a day's data: per-hour event counts scored against the corpus'
    // own hourly mean/stddev — a traffic spike (bot burst, replayed
    // partition) or a silent gap (dropped producer) both surface as
    // |z| > 2 hours. Counts are one map-side-combinable aggregate to a
    // BOUNDED frame (hours, not events); mean/std come from exact
    // integer power sums over that frame (the q_stats_moments recipe —
    // no Welford float ordering), broadcast back as one row; the
    // z-score is a per-row double tree snapped through dec_cast.
    Q(
      "q_events_anomaly",
      s"""WITH hc AS (
        |  SELECT epoch_us(ts) // $hourUs AS hb, count(*) AS cnt FROM events GROUP BY 1
        |), st AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(cnt*cnt) AS BIGINT) AS DOUBLE) AS sx2
        |  FROM hc
        |)
        |SELECT hour_bucket, cnt, zscore FROM (
        |  SELECT hb AS hour_bucket, cnt,
        |    CAST(CAST((cnt - sx/n) / sqrt((sx2 - sx*(sx/n)) / n)
        |      AS DECIMAL(18,9)) AS DOUBLE) AS zscore
        |  FROM hc, st
        |  WHERE CAST(CAST((sx2 - sx*(sx/n)) / n AS DECIMAL(18,9)) AS DOUBLE) > 0)
        |WHERE abs(zscore) > 2.0""".stripMargin) { (s, dir) =>
      // membership filters on the SNAPPED z, not the raw double: the
      // sx2 - sx*(sx/n) term is FMA-contractible in DuckDB, and a row
      // whose raw |z| sits within an ulp of 2.0 must not flip sides.
      // The variance > 0 guard kills the zero-variance degenerate case
      // BEFORE the snap: 0/0 = NaN, which Spark's cast silently nulls
      // while DuckDB's CAST(NaN AS DECIMAL) raises — without the guard
      // a uniform corpus crashes the oracle instead of returning empty.
      // The guard itself compares the SNAPPED variance (ADVICE r11):
      // the raw residual of the contractible a*b - c*d shape can land
      // on opposite sides of 0 per engine on a near-uniform corpus.
      // snap > 0 implies raw >= 0.5e-9 > 0 under both rounding modes,
      // so the raw variance inside sqrt stays strictly positive.
      val hc = Tables(s, dir, "events")
        .select(expr(s"(ts_ns div 1000) div $hourUs").as("hb"))
        .groupBy(col("hb")).agg(count(lit(1)).as("cnt"))
      val st = hc.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("cnt")).cast("double").as("sx"),
        sum(col("cnt") * col("cnt")).cast("double").as("sx2"))
      hc.crossJoin(broadcast(st))
        .filter(expr("cast(dec_cast((sx2 - sx*(sx/n)) / n, 18, 9) as double) > 0"))
        .select(col("hb").as("hour_bucket"), col("cnt"),
          expr("cast(dec_cast((cnt - sx/n) / sqrt((sx2 - sx*(sx/n)) / n), 18, 9) as double)")
            .as("zscore"))
        .filter(abs(col("zscore")) > 2.0)
    },

    // ---- recursive CTE: order-sensitive event-sequence fingerprint ---------
    // ONE dialect-shared WITH RECURSIVE text executed verbatim by both
    // engines (Spark 4.1 UnionLoop / DuckDB native recursion) — the SQL
    // surface the reference's TDL exposes nowhere and plain aggregation
    // cannot express: a NON-commutative fold. Each user's first 8 events
    // (by ts, event_id) fold into a Lehmer-style hash chain
    // fp' = (fp*48271 + id) mod (2^31-1) — an order-SENSITIVE sequence
    // fingerprint (two users with the same event multiset in different
    // order differ), the per-entity sequence checksum an event-log
    // replication audit wants, where q_table_checksum's order-free folds
    // are blind. All arithmetic is exact BIGINT (max fp*48271 ≈ 1.04e14),
    // so the hash gate never touches a float. Depth is CAPPED at 8 rows
    // per user: Spark executes one join round per recursion level, so
    // the iteration count is a schema constant, never data-driven
    // (the CC/BPE loop rule); the ORDER BY is safe to share because the
    // events table carries no sub-µs components and no per-user µs ties
    // (checked at both sf0.01 and sf0.1), and event_id breaks any future
    // ones deterministically. Scale shape: one user_id window shuffle,
    // then 8 bounded equi-join rounds on (user_id, rn) — each round's
    // frontier is ≤ |users| rows, and the final join is user_id-keyed.
    Q.sqlShared(
      "q_recursive_cte",
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS rn
        |  FROM events
        |), capped AS (
        |  SELECT user_id, event_id, rn FROM ev WHERE rn <= 8
        |), nmax AS (SELECT user_id, max(rn) AS mx FROM capped GROUP BY user_id),
        |chain(user_id, rn, fp) AS (
        |  SELECT user_id, rn, (event_id % 1000003) % 2147483647 FROM capped WHERE rn = 1
        |  UNION ALL
        |  SELECT c.user_id, e.rn, (c.fp * 48271 + e.event_id % 1000003) % 2147483647
        |  FROM chain c JOIN capped e ON e.user_id = c.user_id AND e.rn = c.rn + 1
        |)
        |SELECT c.user_id, c.rn AS chain_len, c.fp AS seq_fingerprint
        |FROM chain c JOIN nmax m ON m.user_id = c.user_id AND m.mx = c.rn""".stripMargin))
}
