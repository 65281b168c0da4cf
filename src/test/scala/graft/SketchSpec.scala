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

  test("count-min sketch: never underestimates, overestimate bounded by eps*n") {
    val li = graft.io.Tables(spark, sf("sf0.01"), "lineitem")
    val n = li.count()
    val cms = li.stat.countMinSketch(col("l_returnflag"), eps = 0.001, confidence = 0.99, seed = 42)
    val exact = li.groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, cnt) =>
      val est = cms.estimateCount(flag)
      assert(est >= cnt, s"$flag: CMS underestimated $est < $cnt")
      assert(est <= cnt + (0.001 * n).toLong * 3, s"$flag: CMS overestimate $est vs $cnt")
    }
  }

  test("approx_percentile lands within rank tolerance of the exact percentile") {
    val orders = graft.io.Tables(spark, sf("sf0.01"), "orders")
    val rows = orders.groupBy(col("o_orderpriority"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx"),
        expr("percentile(o_totalprice, 0.5)").as("exact"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getDouble(1), r.getDouble(2))
      // accuracy 1000 => rank error <= n/1000; prices spread ~[850, 600k],
      // so a generous relative value-tolerance is a safe proxy
      assert(math.abs(approx - exact) / exact < 0.05,
        s"prio ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("bloom filter: no false negatives, false-positive rate near fpp") {
    val orders = graft.io.Tables(spark, sf("sf0.01"), "orders")
    val keys = orders.select(col("o_orderkey")).collect().map(_.getLong(0))
    val bf = orders.stat.bloomFilter("o_orderkey", keys.length.toLong, 0.03)
    assert(keys.forall(bf.mightContain), "bloom filter dropped a present key")
    val absent = (1L to 20000L).map(_ + 10_000_000L)
    val fp = absent.count(bf.mightContain).toDouble / absent.size
    assert(fp < 0.09, s"false-positive rate $fp far above configured 0.03")
  }
}
