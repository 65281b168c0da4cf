package graft

import org.apache.spark.sql.functions._

/** Native dot_f expression: value parity with the interpreted HOF
  * formulation, null semantics, and codegen participation. */
class VectorExpressionsSpec extends SparkSpec {

  test("dot_f matches the HOF left-fold exactly on real embeddings") {
    val e = graft.io.Tables(spark, sf(), "embeddings").limit(100)
    val both = e.crossJoin(e.select(col("embedding").as("e2"), col("vec_id").as("v2")).limit(5))
      .select(
        expr("dot_f(embedding, e2)").as("native"),
        expr("""aggregate(zip_with(embedding, e2, (x, y) -> cast(x as double) * cast(y as double)),
               |cast(0 as double), (acc, v) -> acc + v)""".stripMargin).as("hof"))
      .collect()
    assert(both.nonEmpty)
    // bit-identical, not approximately equal: same ops in same order
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("dot_f null and shape semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))), // 11.0
      (None, Some(Seq(1.0f))), // null
      (Some(Seq(1.0f, 2.0f, 9.0f)), Some(Seq(2.0f, 2.0f))) // extra ignored -> 6.0
    ).toDF("a", "b")
    val out = df.selectExpr("dot_f(a, b)").collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(out(0) == 11.0)
    assert(out(1) == null)
    assert(out(2) == 6.0)
  }

  test("dot_f runs inside WholeStageCodegen") {
    val e = graft.io.Tables(spark, sf(), "embeddings").limit(10)
    val plan = e.select(expr("dot_f(embedding, embedding)").as("d"))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes a WholeStageCodegen stage; the Project carrying
    // dot_f must be inside one
    assert(plan.linesIterator.exists(l => l.contains("dot_f") && l.contains("*(")))
  }
}
