package graft

import graft.io.Sessions

/** Per-round benchmark: runs every registered query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line for the driver.
  *
  * Materialization is a `noop`-sink write, not `count()`: count() lets
  * Catalyst prune every projected column (a projection-only query would
  * measure an empty scan), while the noop sink computes all columns and
  * discards rows on the executor — the honest cost of the full plan
  * without any I/O in the measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = Sessions.local("graft-bench", cpus)

    // one cheap warmup to absorb JVM/codegen first-run cost
    SparkEntry.queries("q_filter_pushdown")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val results = SparkEntry.allQueries.map { q =>
      val t0 = System.nanoTime()
      val sec =
        try {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
