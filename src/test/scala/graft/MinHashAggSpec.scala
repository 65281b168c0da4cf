package graft

import org.apache.spark.sql.functions._

import graft.functions.CrossHash
import graft.functions.CrossHash.h

/** [[graft.functions.MinHashAgg]]: value parity with k separate
  * min(v ^ seed) aggregate columns. */
class MinHashAggSpec extends SparkSpec {

  private val seeds = (0 until 16).map(i => CrossHash.local(s"seed#$i"))

  test("minhash_agg equals 16 min(v ^ seed) columns on harness shingles") {
    val hashed = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("w"))
      .filter(expr("size(w) >= 3"))
      .select(col("doc_id"), explode(expr("shingles(w, 3)")).as("s"))
      .select(col("doc_id"), expr(h("s")).as("v"))
    val mins = seeds.zipWithIndex.map { case (sd, i) => min(expr(s"v ^ ${sd}L")).as(s"m$i") }
    val builtin = hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val native = hashed.groupBy(col("doc_id"))
      .agg(expr(s"minhash_agg(v, array(${seeds.map(sd => s"${sd}L").mkString(",")}))").as("sig"))
    val cond = (0 until 16)
      .map(i => s"element_at(sig, ${i + 1}) <=> m$i")
      .mkString(" AND ")
    val joined = native.join(builtin, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(not(expr(cond))).count() == 0)
  }

  test("nulls skipped; empty group gives an all-null signature") {
    import spark.implicits._
    val df = Seq((1L, Some(7L)), (1L, None), (2L, None)).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(expr("minhash_agg(v, array(1L, 2L))").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(out(1L) == Seq(7L ^ 1L, 7L ^ 2L))
    assert(out(2L) == Seq(null, null))
  }
}
