package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.FastDecimalCast]]: bit parity with Spark's builtin
  * double→decimal Cast across harness columns and adversarial values. */
class FastDecimalCastSpec extends SparkSpec {

  private def assertParity(df: org.apache.spark.sql.DataFrame, colName: String): Unit = {
    for (s <- Seq(2, 4, 8, 12)) {
      val p = 18
      val bad = df
        .select(col(colName).cast("double").as("v"))
        .select(
          col("v"),
          expr(s"dec_cast(v, $p, $s)").as("fast"),
          expr(s"try_cast(v as decimal($p,$s))").as("ref"))
        .filter(not(col("fast") <=> col("ref")))
      assert(bad.count() == 0, s"scale $s mismatch: ${bad.take(3).mkString(", ")}")
    }
  }

  test("parity on harness lineitem/orders/events doubles") {
    assertParity(graft.io.Tables(spark, sf("sf0.01"), "lineitem"), "l_extendedprice")
    assertParity(graft.io.Tables(spark, sf("sf0.01"), "orders"), "o_totalprice")
    assertParity(graft.io.Tables(spark, sf("sf0.01"), "events"), "value")
  }

  test("parity on adversarial values: scale-boundary ties, tiny, huge, negatives") {
    import spark.implicits._
    val vals = Seq(
      0.145, -0.145, 0.155, 2.675, 1.005, 0.285, // repr ties at scale 2
      0.00005, -0.00005, 1e-13, -1e-13,
      123456789012345.678, -9.87e17, 1e18, -1e18, // overflow / beyond 2^53
      0.0, -0.0, 1.0 / 3.0, math.Pi, 1e12 + 0.5,
      Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue)
    val rnd = new scala.util.Random(42)
    val fuzz = Seq.fill(20000)(rnd.nextDouble() * math.pow(10, rnd.nextInt(16) - 4) *
      (if (rnd.nextBoolean()) 1 else -1))
    assertParity((vals ++ fuzz).toDF("v"), "v")
  }

  test("non-finite inputs yield null") {
    import spark.implicits._
    val out = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
      .toDF("v").select(expr("dec_cast(v, 18, 2)")).collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
