package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.GramAgg]]: value parity with the explicit
  * posexplode sum/Gram formulation it replaced in q_pca_power. */
class GramAggSpec extends SparkSpec {

  private val D = 64
  private val SCALE = 1024

  test("gram_agg equals the posexplode sums and Gram upper triangle") {
    val e = graft.io.Tables(spark, sf(), "embeddings")
    def quant(x: String) = s"cast(floor(cast($x as double) * $SCALE) as bigint)"
    val ex1 = e
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i0", "x")))
      .select(col("embedding"), (col("i0") + 1).as("i"), expr(quant("x")).as("qi"))
    val sums = ex1.groupBy(col("i"))
      .agg(sum(col("qi")).as("s"), count(lit(1)).as("cnt"))
      .collect()
    val gram = ex1
      .select(col("i"), col("qi"), posexplode(col("embedding")).as(Seq("j0", "y")))
      .select(col("i"), (col("j0") + 1).as("j"), col("qi"), expr(quant("y")).as("qj"))
      .filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("qi") * col("qj")).as("g"))
      .collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) -> r.getAs[Long]("g"))
      .toMap
    val buf = e.agg(expr(s"gram_agg(embedding, $D, $SCALE)").as("b"))
      .head().getSeq[Long](0)
    assert(buf.length == 1 + D + D * (D + 1) / 2)
    assert(buf(0) == sums.head.getAs[Long]("cnt"))
    sums.foreach(r => assert(buf(r.getAs[Int]("i")) == r.getAs[Long]("s")))
    var idx = 1 + D
    for (i <- 1 to D; j <- i to D) {
      assert(buf(idx) == gram((i, j)), s"gram mismatch at ($i,$j)")
      idx += 1
    }
  }

  test("null vectors are skipped; short vectors zero-pad") {
    import spark.implicits._
    val df = Seq(
      (1, Some(Seq(1.0f, 2.0f))),
      (2, None),
      (3, Some(Seq(3.0f)))).toDF("id", "v")
    // d=2, scale=1: q rows are [1,2] and [3,0]
    val buf = df.agg(expr("gram_agg(v, 2, 1)").as("b")).head().getSeq[Long](0)
    // [n, s1, s2, g11, g12, g22]
    assert(buf == Seq(2L, 4L, 2L, 10L, 2L, 4L))
  }
}
