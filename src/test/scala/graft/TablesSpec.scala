package graft

import org.apache.spark.sql.functions._

/** [[graft.io.Tables]] events normalization: the NANOS data drop (what
  * the harness ships) and a MICROS data drop must surface the identical
  * (schema, ts, ts_ns) contract. */
class TablesSpec extends SparkSpec {

  test("a TIMESTAMP_MICROS events drop normalizes to the NANOS-path contract") {
    val nanos = graft.io.Tables(spark, sf(), "events")
    // synthesize a micros drop: same rows, ts re-encoded as µs-precision
    // TIMESTAMP_NTZ (parquet TIMESTAMP(MICROS, isAdjustedToUTC=false))
    val origCols = nanos.schema.fieldNames.filter(_ != "ts_ns").toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft-micros-events").toString
    nanos.select(origCols.map(col): _*)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val micros = graft.io.Tables(spark, tmp, "events")

    // identical schema: names, order, types
    assert(micros.schema.map(f => (f.name, f.dataType)) ==
      nanos.schema.map(f => (f.name, f.dataType)))

    // identical values: ts exactly; ts_ns up to the µs truncation a
    // micros drop inherently applies
    val n = nanos.select(col("event_id"), col("ts"),
      expr("(ts_ns div 1000) * 1000").as("ts_us"))
    val m = micros.select(col("event_id"), col("ts").as("ts2"), col("ts_ns").as("ts_ns2"))
    val joined = n.join(m, "event_id")
    assert(joined.count() > 0)
    assert(joined.filter(not(col("ts") <=> col("ts2"))).count() == 0)
    assert(joined.filter(not(col("ts_us") <=> col("ts_ns2"))).count() == 0)
  }
}
