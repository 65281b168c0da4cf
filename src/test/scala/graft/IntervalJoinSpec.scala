package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** The bucketized interval join (q_session_overlap) must produce the
  * SAME co-activity profile as the naive quadratic range join — the
  * bucketing is a candidate-generation optimization, never a semantics
  * change. The naive twin here is derived independently (no bucket
  * explode, a direct interval-predicate self-join), so a bucketing bug
  * that drops a cross-bucket pair fails this equivalence, where the
  * DuckDB oracle (which mirrors the bucketing 1:1) cannot see it. */
class IntervalJoinSpec extends SparkSpec {

  private val gapUs = 1800000000L

  test("bucketized session overlap == naive interval self-join") {
    val dir = sf()
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val sess = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), expr("ts_ns div 1000").as("tus"))
      .withColumn("new_s",
        when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("sid",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("tus")).as("t0"), max(col("tus")).as("t1"))
    // naive quadratic truth: direct interval predicate, no bucketing
    val naive = sess.as("a")
      .join(sess.as("b"),
        expr("a.user_id <> b.user_id and a.t0 <= b.t1 and b.t0 <= a.t1"))
      .select(col("a.user_id").as("ua"),
        col("b.user_id").as("ub"),
        expr("least(a.t1, b.t1) - greatest(a.t0, b.t0)").as("overlap_us"))
      .groupBy(col("ua"))
      .agg(countDistinct(col("ub")).cast("bigint").as("n_partners"),
        count(lit(1)).as("n_session_overlaps"),
        sum(col("overlap_us")).cast("bigint").as("total_overlap_us"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val bucketized = SparkEntry.queries("q_session_overlap")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(naive.nonEmpty, "corpus must contain overlapping sessions")
    assert(bucketized == naive,
      s"bucketized and naive profiles differ: ${bucketized.size} vs ${naive.size} users")
  }
}
