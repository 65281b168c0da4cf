package graft

import org.apache.spark.sql.functions._

/** Sketch aggregations: HLL approx_count_distinct stays within its
  * configured relative error against the exact counts. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 2x the configured 2% rsd") {
    val li = graft.io.Tables(spark, sf("sf0.01"), "lineitem")
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact < 0.04,
        s"flag ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }
}
