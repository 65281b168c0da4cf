package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrderUtil

/** Z-order interleave: bit-exactness vs a naive per-bit reference,
  * codegen participation, and the data-skipping property the expression
  * exists for — blocks of a z-sorted layout are narrow in BOTH
  * dimensions, where a lexicographic sort leaves the second dimension
  * unconstrained. */
class ZOrderSpec extends SparkSpec {

  private def naive(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((b >> i) & 1L) << (2 * i)
      z |= ((a >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the per-bit reference") {
    val samples = Seq[(Long, Long)](
      (0, 0), (1, 0), (0, 1), (1, 1), (0xFFFFFFFFL, 0), (0, 0xFFFFFFFFL),
      (0xFFFFFFFFL, 0xFFFFFFFFL), (12345, 67890), (1L << 31, 1L << 31))
    samples.foreach { case (a, b) =>
      assert(ZOrderUtil.interleave(a, b) == naive(a, b), s"($a, $b)")
    }
    val rnd = new scala.util.Random(7)
    (1 to 1000).foreach { _ =>
      val a = rnd.nextLong() & 0xFFFFFFFFL
      val b = rnd.nextLong() & 0xFFFFFFFFL
      assert(ZOrderUtil.interleave(a, b) == naive(a, b))
    }
  }

  test("zorder2 SQL function is registered and codegen'd") {
    val df = spark.range(100).selectExpr("zorder2(id, id + 1) z")
    assert(df.count() == 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("zorder2") && l.contains("*(")))
    // monotone on the diagonal: z(k,k) increases with k
    val zs = df.collect().map(_.getLong(0))
    assert(zs.sameElements(zs.sorted))
  }

  test("interleaveN: per-bit reference, N=2 equivalence, nulls, codegen") {
    def naiveN(xs: Array[Long]): Long = {
      val n = xs.length
      var z = 0L
      for (i <- 0 until n; j <- 0 until 64 / n)
        z |= ((xs(i) >>> j) & 1L) << (j * n + (n - 1 - i))
      z
    }
    val rnd = new scala.util.Random(11)
    for (n <- 2 to 8; _ <- 1 to 200) {
      val xs = Array.fill(n)(rnd.nextLong() & ((1L << (64 / n)) - 1))
      assert(ZOrderUtil.interleaveN(xs) == naiveN(xs), xs.mkString(","))
    }
    // N=2 on 32-bit inputs is exactly the magic-mask interleave
    (1 to 200).foreach { _ =>
      val a = rnd.nextLong() & 0xFFFFFFFFL
      val b = rnd.nextLong() & 0xFFFFFFFFL
      assert(ZOrderUtil.interleaveN(Array(a, b)) == ZOrderUtil.interleave(a, b))
    }
    // known placements: bit 0 of key i lands at position (n-1-i)
    assert(ZOrderUtil.interleaveN(Array(1L, 0L, 0L)) == 4L)
    assert(ZOrderUtil.interleaveN(Array(0L, 1L, 0L)) == 2L)
    assert(ZOrderUtil.interleaveN(Array(0L, 0L, 1L)) == 1L)
    // SQL registration + codegen + null propagation
    val df = spark.range(50).selectExpr("zordern(id, id + 1, id + 2) z")
    assert(df.count() == 50)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("zordern") && l.contains("*(")),
      s"zordern must stay inside WholeStageCodegen:\n$plan")
    val withNull = spark.sql("SELECT zordern(1L, CAST(NULL AS BIGINT), 3L) z")
    assert(withNull.collect().head.isNullAt(0))
  }

  test("3-col z-sorted blocks are narrow in ALL three dimensions") {
    import spark.implicits._
    val n = 16 // 16^3 grid, 4096 points, 64 blocks of 64
    val grid = (0 until n).flatMap(x => (0 until n).flatMap(y => (0 until n)
      .map(z => (x.toLong, y.toLong, z.toLong)))).toDF("x", "y", "z")
    val rows = grid.selectExpr("x", "y", "z", "zordern(x, y, z) zz").orderBy("zz")
      .select($"x", $"y", $"z").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val spans = rows.grouped(64).map { blk =>
      (blk.map(_._1).max - blk.map(_._1).min,
        blk.map(_._2).max - blk.map(_._2).min,
        blk.map(_._3).max - blk.map(_._3).min)
    }.toSeq
    // a 64-point block of a 3-d z-curve covers a 4x4x4 tile
    assert(spans.map(_._1).max <= 4 && spans.map(_._2).max <= 4 && spans.map(_._3).max <= 4,
      s"spans ${spans.map(_._1).max}, ${spans.map(_._2).max}, ${spans.map(_._3).max}")
  }

  test("z-sorted blocks are narrow in both dimensions; lex sort is not") {
    import spark.implicits._
    val n = 64 // 64x64 grid, 4096 points, 64 blocks of 64
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")

    def maxBlockSpans(sorted: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val rows = sorted.collect().map(r => (r.getLong(0), r.getLong(1)))
      val spans = rows.grouped(64).map { blk =>
        (blk.map(_._1).max - blk.map(_._1).min, blk.map(_._2).max - blk.map(_._2).min)
      }.toSeq
      (spans.map(_._1).max, spans.map(_._2).max)
    }

    val (zx, zy) = maxBlockSpans(
      grid.selectExpr("x", "y", "zorder2(x, y) z").orderBy("z").select($"x", $"y"))
    val (_, ly) = maxBlockSpans(grid.orderBy("x", "y").select($"x", $"y"))
    // a 64-point z-block covers an 8x8 tile: both spans stay ~8, far
    // below the 63 a full dimension would span; lexicographic leaves y
    // unconstrained at the full range
    assert(zx <= 8 && zy <= 8, s"z spans ($zx, $zy)")
    assert(ly == 63, s"lex y span $ly")
  }
}
