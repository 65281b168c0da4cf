package graft

import org.apache.spark.sql.functions._

import graft.functions.CrossHash.h

/** [[graft.functions.SimHashAgg]]: value parity with the 60-sum builtin
  * formulation it replaced, plus empty/null-group semantics. */
class SimHashAggSpec extends SparkSpec {

  private def hashedTokens = graft.io.Tables(spark, sf(), "documents")
    .select(col("doc_id"), explode(expr("split(trim(text), '\\\\s+')")).as("t"))
    .select(col("doc_id"), expr(h("t")).as("v"))

  test("simhash_agg equals the 60-conditional-sum formulation on harness docs") {
    val bitSums = (0 until 60).map(b =>
      sum(expr(s"CASE WHEN (shiftright(v, $b) & 1) = 1 THEN 1 ELSE -1 END")).as(s"s$b"))
    val assemble = (0 until 60)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b}L ELSE 0L END)")
      .mkString(" + ")
    val builtin = hashedTokens
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), expr(assemble).as("sim_builtin"))
    val native = hashedTokens
      .groupBy(col("doc_id"))
      .agg(expr("simhash_agg(v)").as("sim_native"))
    val joined = native.join(builtin, "doc_id")
    assert(joined.count() == 500)
    assert(joined.filter(col("sim_native") =!= col("sim_builtin")).count() == 0)
  }

  test("null inputs are skipped; all-null group yields 0") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5L)), (1L, None), (1L, Some(5L)),
      (2L, None)
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(expr("simhash_agg(v)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 5L) // bits 0 and 2 set in both non-null rows
    assert(out(2L) == 0L)
  }

  test("bit set only on strict majority") {
    import spark.implicits._
    // two rows with bit0 set, two clear -> tie -> bit stays 0
    val df = Seq(1L, 1L, 0L, 0L).toDF("v")
    assert(df.agg(expr("simhash_agg(v)")).head().getLong(0) == 0L)
    // three set, one clear -> majority -> bit 0 lights up
    val df2 = Seq(1L, 1L, 1L, 0L).toDF("v")
    assert(df2.agg(expr("simhash_agg(v)")).head().getLong(0) == 1L)
  }
}
