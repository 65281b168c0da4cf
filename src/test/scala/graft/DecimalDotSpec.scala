package graft

import org.apache.spark.sql.functions._

/** Native dot_dec must be bit-identical to the oracle-checked HOF
  * decimal formulation — it replicates Spark's double→decimal Cast
  * rounding (shortest-string + HALF_UP at scale 12) per product. */
class DecimalDotSpec extends SparkSpec {

  private val hof =
    """aggregate(zip_with(a, b,
      |  (x, y) -> cast(cast(x as double) * cast(y as double) as decimal(28,12))),
      |  cast(0 as decimal(28,12)), (acc, v) -> cast(acc + v as decimal(28,12)))""".stripMargin

  test("dot_dec equals the HOF decimal dot on all embedding pairs sample") {
    val e = graft.io.Tables(spark, sf(), "embeddings")
    val pairs = e.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("b"))
        .filter(col("idb") % 7 === 0))
      .select(expr("dot_dec(a, b)").as("native"), expr(hof).as("hofv"))
      .collect()
    assert(pairs.length > 30000)
    pairs.foreach { r =>
      assert(r.getDecimal(0) == r.getDecimal(1),
        s"native ${r.getDecimal(0)} != hof ${r.getDecimal(1)}")
    }
  }

  test("dot_dec codegen and null semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.5f, -2.25f)), Some(Seq(4.0f, 8.0f))), // 6 - 18 = -12
      (None, Some(Seq(1.0f)))
    ).toDF("a", "b")
    val out = df.selectExpr("dot_dec(a, b)").collect()
    assert(out(0).getDecimal(0).compareTo(new java.math.BigDecimal("-12")) == 0)
    assert(out(1).isNullAt(0))
    val plan = graft.io.Tables(spark, sf(), "embeddings")
      .select(expr("dot_dec(embedding, embedding)"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("dot_dec") && l.contains("*(")))
  }
}
