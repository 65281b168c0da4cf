package graft

import org.apache.spark.sql.functions._

/** The native plane_cell / plane_sums loops (round 13) replaced giant
  * inlined literal-weight trees. Three things must hold forever:
  *  - bit-identity with the LEGACY inlined formulation (the oracle's
  *    contract) on real-shaped data;
  *  - interpreted eval == codegen output (ConvertToLocalRelation folds
  *    expressions over LocalRelations with the interpreted path — a
  *    divergence would be a silent plan-dependent wrong answer);
  *  - the documented degenerate-input semantics (short array, NULL
  *    element, NULL array). */
class PlaneExprSpec extends SparkSpec {

  import graft.functions.CrossHash

  private def legacyCell(v: String, bits: Int, prefix: String) = {
    def planeSum(j: Int) = (1 to 64).map { i =>
      val w = ((CrossHash.local(s"$prefix$j#$i") % 2001) - 1000) / 1000.0
      lit(w) * element_at(col(v), i).cast("double")
    }.reduceLeft(_ + _)
    (0 until bits)
      .map(j => when(planeSum(j) >= 0, lit(1 << j)).otherwise(lit(0)))
      .reduceLeft(_ + _)
  }

  private lazy val vecs = {
    graft.functions.GraftRuntime.ensure(spark)
    graft.io.Tables(spark, sf(), "embeddings")
      .select(col("vec_id"), col("embedding"))
  }

  test("plane_cell matches the legacy inlined tree on the real embeddings") {
    for (bits <- Seq(1, 4, 8)) {
      val diff = vecs
        .select(expr(s"plane_cell(embedding, $bits, 'sem#')").as("nc"),
          legacyCell("embedding", bits, "sem#").as("lc"))
        .filter(col("nc") =!= col("lc")).count()
      assert(diff == 0L, s"bits=$bits: native cell diverged from the legacy tree")
    }
    // the q_ann_lsh seed family (empty prefix) too
    val diff = vecs
      .select(expr("plane_cell(embedding, 4, '')").as("nc"),
        legacyCell("embedding", 4, "").as("lc"))
      .filter(col("nc") =!= col("lc")).count()
    assert(diff == 0L)
  }

  test("plane_sums matches the legacy fold (exact doubles) on the real embeddings") {
    val w = (0 until 3).map(k => (1 to 64).map(i =>
      if (CrossHash.local(s"rp#$k#$i") % 2 == 0) 1.0 else -1.0))
    val wSql = w.map(_.map(x => s"${x}D").mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    def legacySum(k: Int) = w(k).zipWithIndex.map { case (x, i) =>
      lit(x) * element_at(col("embedding"), i + 1).cast("double")
    }.reduceLeft(_ + _)
    val diff = vecs
      .select((0 until 3).flatMap(k => Seq(
        element_at(expr(s"plane_sums(embedding, $wSql)"), k + 1).as(s"n$k"),
        legacySum(k).as(s"l$k"))): _*)
      .filter((0 until 3).map(k => col(s"n$k") =!= col(s"l$k")).reduce(_ || _))
      .count()
    assert(diff == 0L, "native sums diverged from the legacy fold")
  }

  test("interpreted eval equals codegen output") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rows = vecs.limit(50).collect()
    val cellExpr = graft.functions.PlaneCell(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType),
        nullable = true),
      4, "sem#")
    val sumExpr = graft.functions.PlaneSums(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType),
        nullable = true),
      Seq((1 to 64).map(i => if (i % 3 == 0) -1.0 else 1.0)))
    val viaSql = vecs.limit(50)
      .select(expr("plane_cell(embedding, 4, 'sem#')").as("c"))
      .collect().map(_.getInt(0))
    rows.map(_.getSeq[Float](1)).zip(viaSql).foreach { case (emb, sqlCell) =>
      val ir = org.apache.spark.sql.catalyst.InternalRow(
        new GenericArrayData(emb.map(f => f: Any).toArray))
      assert(cellExpr.eval(ir) == sqlCell, "interpreted plane_cell != codegen result")
      // plane_sums interpreted path at least runs and returns one sum per row
      val s = sumExpr.eval(ir).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      assert(s.numElements() == 1 && !s.isNullAt(0))
    }
  }

  test("degenerate inputs: short array, null element, null array") {
    graft.functions.GraftRuntime.ensure(spark)
    val df = spark.sql(
      """SELECT
        |  plane_cell(cast(array(1.0, 2.0) as array<float>), 4, 'sem#') AS short_cell,
        |  plane_cell(cast(array(null, 1.0) as array<float>), 4, 'sem#') AS nullelem_cell,
        |  plane_cell(cast(null as array<float>), 4, 'sem#') AS nullarr_cell,
        |  plane_sums(cast(array(1.0, 2.0) as array<float>),
        |             array(array(1.0D, -1.0D))) AS short_sums,
        |  plane_sums(cast(null as array<float>),
        |             array(array(1.0D, -1.0D))) AS nullarr_sums
        |""".stripMargin)
    val r = df.head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 0 && r.getInt(2) == 0)
    // weight rows are 2-dim here, so the short array IS long enough
    assert(r.getSeq[Double](3) == Seq(1.0 - 2.0))
    assert(r.isNullAt(4), "null input array must yield a NULL sums array")
  }

  test("registration builders: decimal literals coerce, wrong types fail usably (ADVICE r13)") {
    import spark.implicits._
    // a natural SQL call writes DECIMAL literals — the builder must
    // coerce them to double instead of dying in getDouble
    val r = Seq(Seq(1.0f, 2.0f)).toDF("v")
      .selectExpr("plane_sums(v, array(array(1.0, 0.5)))")
      .head().getSeq[Double](0)
    assert(r == Seq(1.0 * 1.0 + 2.0 * 0.5))
    // minhash_bands / hashed_score: integer-literal seeds and weights
    // coerce to bigint through the same Cast path
    val b = Seq(Seq("a b c", "b c d")).toDF("sh")
      .selectExpr("minhash_bands(sh, array(1, 2, 3, 4), 2)")
      .head().getSeq[Long](0)
    assert(b.length == 2)
    val h = Seq(Seq("x", "y")).toDF("w")
      .selectExpr("hashed_score(w, array(10, 20, 5))")
      .head().getLong(0)
    // bias 5 + two token-bucket lookups from {10, 20}
    assert(h == 5 + 10 + 10 || h == 5 + 10 + 20 || h == 5 + 20 + 20)
    // wrong types fail with a usable message, not a ClassCastException
    val e1 = intercept[Exception](
      Seq(Seq(1.0f)).toDF("v").selectExpr("plane_sums(v, array('x'))").head())
    assert(e1.getMessage.contains("plane_sums weights"), e1.getMessage)
    val e2 = intercept[Exception](
      Seq(Seq("a")).toDF("sh").selectExpr("minhash_bands(sh, array('x'), 2)").head())
    assert(e2.getMessage.contains("minhash_bands seeds"), e2.getMessage)
    val e3 = intercept[Exception](
      Seq(Seq(1.0f)).toDF("v").selectExpr("plane_cell(v, 'four', 'p#')").head())
    assert(e3.getMessage.contains("plane_cell bits"), e3.getMessage)
  }
}
