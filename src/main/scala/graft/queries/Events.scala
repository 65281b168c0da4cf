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
    })
}
