package graft

import java.nio.file.{Files, Paths}

import graft.io.Sessions

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Marker lifecycle, crash-safe: `_PARTIAL_RUN` is written BEFORE any
    * dump — for FULL runs too (sentinel content) — and removed only
    * once a full dump has completed. A crashed full run, or a filtered
    * run, therefore always leaves the marker behind, and check.py
    * refuses the directory instead of passing a half-finished or stale
    * mix as the gate. */
  def startMarker(outDir: String, only: Option[Set[String]]): Unit =
    Files.writeString(
      Paths.get(s"$outDir/_PARTIAL_RUN"),
      only.map(_.toSeq.sorted.mkString("\n")).getOrElse("FULL_RUN_IN_PROGRESS"))

  def finishMarker(outDir: String, only: Option[Set[String]]): Unit =
    if (only.isEmpty) Files.deleteIfExists(Paths.get(s"$outDir/_PARTIAL_RUN"))

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // SPARK_GRAFT_ONLY=q_a,q_b limits the dump (dev iteration; driver unsets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(name: String) = only.forall(_.contains(name))
    only.foreach { sel =>
      val kept = SparkEntry.queries.keys.count(sel.contains)
      System.err.println(
        s"[verify] *** SPARK_GRAFT_ONLY ACTIVE: dumping $kept of " +
          s"${SparkEntry.queries.size} queries — NOT a full gate run ***")
    }
    val spark = Sessions.local("graft-verify")
    new java.io.File(outDir).mkdirs()
    startMarker(outDir, only)
    val failed = collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
        // a failed dump must not leave a stale (or half-overwritten)
        // parquet dir from a previous run for check.py to compare — the
        // gate would pass OLD code's output as this run's result. Delete
        // it: a missing output dir fails that query's check honestly.
        val p = new org.apache.hadoop.fs.Path(s"$outDir/$name")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      // queries cache internal frames via CacheScope; release them so
      // cached partitions don't accumulate in executor storage across
      // the full dump (clearCache stays as harness belt-and-braces)
      graft.io.CacheScope.releaseAll()
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // informational marker (check.py doesn't refuse on it; the failed
    // queries' outputs were deleted above so they fail honestly)
    if (failed.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/_FAILED"), failed.sorted.mkString("\n"))
    else Files.deleteIfExists(Paths.get(s"$outDir/_FAILED"))
    finishMarker(outDir, only)
    graft.io.Sessions.stop(spark)
  }
}
