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

    // min of two runs per query: this box's wall-clock variance between
    // identical runs is 2-3x, and min-of-n is the standard de-noiser.
    // When the two runs disagree by more than 2x the query is in a
    // noise band (GC pause, compilation storm) and a third run breaks
    // the tie — two consecutive rounds produced false regression bands
    // from exactly these queries. The cache is cleared per run so
    // queries that persist() internal frames still pay their full
    // compute every time — we time the query, not a warm cache.
    def once(q: graft.queries.Q): Double = {
      graft.io.CacheScope.releaseAll()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }
    // SPARK_GRAFT_ONLY=q_a,q_b limits the run (dev iteration; driver unsets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val picked = SparkEntry.allQueries.filter(q => only.forall(_.contains(q.name)))
    val results = picked.map { q =>
      val (a, b) = (once(q), once(q))
      val best =
        if (a < 0 || b < 0) math.max(a, b)
        else if (math.max(a, b) > 2 * math.min(a, b)) {
          val c = once(q)
          if (c < 0) math.min(a, b) else math.min(math.min(a, b), c)
        } else math.min(a, b)
      q.name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
