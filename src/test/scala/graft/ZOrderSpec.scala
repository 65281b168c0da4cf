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
