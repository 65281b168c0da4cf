package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.types.LongType

import graft.plans.AsOfJoinPlan

/** Public entry for the AS-OF join operator. Lives under
  * `org.apache.spark.sql` only to reach `Dataset.ofRows` (private[sql]);
  * contains no Spark-internal logic beyond plan construction.
  *
  * `AsOfApi.join(events, orders, "user_id", "o_custkey", "tus", "otime")`
  * returns, per left row, the columns of the right row with equal key and
  * the greatest time <= the left time (left outer; LongType key/time).
  */
object AsOfApi {

  /** `tolerance`: optional max lookback — a right row only matches when
    * `leftTime - rightTime <= tolerance` (same unit as the time
    * columns). None = unbounded (classic as-of). */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long] = None): DataFrame = {
    graft.functions.GraftRuntime.ensure(left.sparkSession)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"Column '$n' not found in [${plan.output.map(_.name).mkString(", ")}]"))
    val (lk, rk, lt, rt) =
      (attr(lp, leftKey), attr(rp, rightKey), attr(lp, leftTime), attr(rp, rightTime))
    for (a <- Seq(lk, rk, lt, rt) if a.dataType != LongType)
      throw new IllegalArgumentException(
        s"as-of join v1 requires BIGINT key/time columns; '${a.name}' is ${a.dataType.simpleString}")
    Dataset.ofRows(
      left.sparkSession.asInstanceOf[ClassicSession],
      AsOfJoinPlan(lp, rp, lk, rk, lt, rt, tolerance))
  }
}
