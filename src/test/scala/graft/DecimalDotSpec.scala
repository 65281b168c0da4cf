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

  test("term12 fast path equals the BigDecimal string path (sweep + adversarial boundaries)") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def slow(p: Double): Long =
      JBD.valueOf(p).setScale(12, RoundingMode.HALF_UP).unscaledValue().longValueExact()
    // deterministic magnitude sweep: products of float-ish values across
    // the scales the engine's vectors live in, both signs
    val rnd = new scala.util.Random(421)
    var checked = 0
    for (_ <- 0 until 200000) {
      val mag = math.pow(10, rnd.nextInt(10) - 6) // 1e-6 .. 1e3
      val p = (rnd.nextFloat().toDouble * 2 - 1) * mag *
        (rnd.nextFloat().toDouble * 2 - 1)
      val f = graft.functions.DecimalDotOps.term12(p)
      assert(f == slow(p), s"term12($p): fast $f != slow ${slow(p)}")
      checked += 1
    }
    // adversarial: exact decimal half-ties at scale 12 (the values whose
    // shortest repr ENDS on the boundary — the fast path must detect the
    // closeness and fall back, not guess), plus zero/negative-zero and
    // integer-boundary straddles
    val edges = Seq(
      0.0, -0.0, 1.5e-12, -1.5e-12, 2.5e-12, -2.5e-12, 0.5e-12, -0.5e-12,
      1.0000000000005, -1.0000000000005, 3.0e-13, 123.4567890123455,
      9.9999999999995e-1, -9.9999999999995e-1, 1e-15, -1e-15, 4.0e15 / 1e12,
      5000.0000000000005, 1234567.0)
    for (p <- edges) {
      assert(graft.functions.DecimalDotOps.term12(p) == slow(p),
        s"term12 edge $p: ${graft.functions.DecimalDotOps.term12(p)} != ${slow(p)}")
    }
    info(s"term12 checked on $checked sweep values + ${edges.size} edges")
  }

  test("dot fast accumulation equals dotSlow on real embedding pairs") {
    val e = graft.io.Tables(spark, sf(), "embeddings")
    val rows = e.limit(64).collect()
    val arrs = rows.map(_.getAs[scala.collection.Seq[Float]]("embedding"))
      .map(s => new org.apache.spark.sql.catalyst.util.GenericArrayData(
        s.map(x => x: Any).toArray))
    for (a <- arrs.take(16); b <- arrs) {
      val fast = graft.functions.DecimalDotOps.dot(a, b)
      val ref = graft.functions.DecimalDotOps.dotSlow(a, b)
      assert(fast.toJavaBigDecimal.compareTo(ref.toJavaBigDecimal) == 0,
        s"dot fast $fast != slow $ref")
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
