package graft

import org.apache.spark.sql.functions._

/** Native shingles expression: value parity with the HOF formulation,
  * edge cases, codegen participation. */
class ShinglesSpec extends SparkSpec {

  private val hof =
    "array_distinct(transform(sequence(1, size(w)-2), i -> concat_ws(' ', element_at(w,i), element_at(w,i+1), element_at(w,i+2))))"

  test("shingles(w, 3) equals the HOF formulation on harness documents") {
    val rows = graft.io.Tables(spark, sf(), "documents")
      .select(expr("split(trim(text), '\\\\s+')").as("w"))
      .filter(expr("size(w) >= 3"))
      .select(expr("shingles(w, 3)").as("native"), expr(hof).as("hofv"))
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("edge cases: short arrays, duplicates, n=1") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b"), // shorter than n -> empty
      Seq("a", "b", "a", "b", "a"), // "a b a","b a b","a b a" -> dedup
      Seq("x", "y", "z")
    ).toDF("w")
    val out = df.selectExpr("shingles(w, 3) s").collect().map(_.getSeq[String](0))
    assert(out(0) == Seq())
    assert(out(1) == Seq("a b a", "b a b"))
    assert(out(2) == Seq("x y z"))
    val uni = df.selectExpr("shingles(w, 1) s").collect().map(_.getSeq[String](0))
    assert(uni(1) == Seq("a", "b"))
  }

  test("ngrams keeps duplicates in position order (multiset variant)") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b"), // shorter than n -> empty
      Seq("a", "b", "a", "b", "a"), // repeats preserved
      Seq("x", "y", "z")
    ).toDF("w")
    val out = df.selectExpr("ngrams(w, 3) g").collect().map(_.getSeq[String](0))
    assert(out(0) == Seq())
    assert(out(1) == Seq("a b a", "b a b", "a b a"))
    assert(out(2) == Seq("x y z"))
    // parity with the non-distinct HOF formulation on harness documents
    val hofRaw =
      "transform(sequence(1, size(w)-1), i -> concat_ws(' ', element_at(w,i), element_at(w,i+1)))"
    graft.io.Tables(spark, sf(), "documents")
      .select(expr("split(trim(text), '\\\\s+')").as("w"))
      .filter(expr("size(w) >= 2"))
      .select(expr("ngrams(w, 2)").as("native"), expr(hofRaw).as("hofv"))
      .collect()
      .foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("ngram_stats equals the explode+groupBy formulation on harness documents") {
    import org.apache.spark.sql.functions._
    val docs = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("w"))
      .filter(expr("size(w) >= 3"))
      .persist()
    for (n <- Seq(2, 3)) {
      val native = docs
        .select(col("doc_id"), expr(s"ngram_stats(w, $n)").as("s"))
        .select(col("doc_id"), col("s.total"), col("s.top"), col("s.dup"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val viaGroupBy = docs
        .select(col("doc_id"), explode(expr(s"ngrams(w, $n)")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("total"), max(col("c")).as("top"),
          sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(native == viaGroupBy, s"n=$n")
    }
    docs.unpersist()
  }

  test("ngram_stats short-array edge: fewer tokens than n") {
    import spark.implicits._
    val out = Seq(Seq("a"), Seq("a", "a"), Seq("a", "a", "a"))
      .toDF("w")
      .selectExpr("ngram_stats(w, 3) s")
      .collect().map(r => r.getStruct(0))
      .map(s => (s.getLong(0), s.getLong(1), s.getLong(2)))
    assert(out(0) == ((0L, 0L, 0L)))
    assert(out(1) == ((0L, 0L, 0L)))
    assert(out(2) == ((1L, 1L, 0L))) // one trigram, unique
  }

  test("shingles runs inside WholeStageCodegen") {
    val plan = graft.io.Tables(spark, sf(), "documents")
      .select(expr("shingles(split(trim(text), '\\\\s+'), 3)").as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("shingles") && l.contains("*(")))
  }
}
