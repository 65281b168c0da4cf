package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join strategy for repeated big joins at
  * 100 TB — both fact tables bucketed+sorted on the join key join with
  * ZERO exchanges (no shuffle at query time; the shuffle was paid once
  * at write time). */
class BucketingSpec extends SparkSpec {

  test("bucketed+sorted tables join without any exchange") {
    val bak = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      graft.io.Tables(spark, sf(), "orders")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      graft.io.Tables(spark, sf(), "lineitem")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must be exchange-free; only the final groupBy
      // re-shuffles (on a different key)
      val joinPart = plan.split("HashAggregate").last
      assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      // and it computes the same result as the plain-parquet join
      val plain = graft.io.Tables(spark, sf(), "lineitem")
        .join(graft.io.Tables(spark, sf(), "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val bucketed = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(bucketed == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bak)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
