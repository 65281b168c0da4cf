package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical access to the harness tables (TESTDATA.md).
  *
  * Everything is plain `spark.read.parquet` — vectorized scan, column
  * pruning and predicate pushdown come free — except `events`, whose `ts`
  * column is parquet TIMESTAMP(NANOS): Spark reads it as a ns-epoch long
  * (see [[Sessions]]) and we surface it as a µs-precision TIMESTAMP_NTZ
  * (truncation, matching DuckDB's ns→µs cast) plus the raw `ts_ns` long.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    name match {
      case "events" =>
        raw
          .withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)"))
      case _ => raw
    }
  }

  /** Register every table as a temp view so `spark.sql` works on it. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
