package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit-interleave of two keys — the sort key for
  * multi-dimensional data skipping.
  *
  * Sorting (or range-partitioning) a table by `zorder2(a, b)` before a
  * parquet write makes the per-row-group min/max statistics selective on
  * BOTH columns at once: a point/range predicate on either column prunes
  * row groups at scan time, where a lexicographic `ORDER BY a, b` only
  * prunes on `a`. This is the layout trick behind Delta/Iceberg Z-order
  * compaction, exposed here as a plain codegen'd expression so any write
  * path can use `df.repartitionByRange(n, zorder).sortWithinPartitions
  * (zorder).write...`.
  *
  * Semantics: the low 32 bits of each input are interleaved (`a` takes
  * the odd/high positions) into one 64-bit key. Inputs are expected
  * non-negative (keys, days-since-epoch, bucketed values); offset or
  * hash signed inputs first. NOTE the result is a BIT key, not a signed
  * quantity: if `a` uses its full 32-bit budget, its top bit lands at
  * position 63 and the long goes negative — consumers that ORDER by the
  * key must compare unsigned (`z ^ Long.MinValue`, as the `zorder_by`
  * sink does) or the first half of the curve sorts after the second.
  * No reference-engine counterpart — the reference has no layout
  * control beyond `part_count`
  * (`/root/reference/.../S3DirectColumnarInput.java:96-98`).
  */
object ZOrderUtil {

  /** Spread the low 32 bits of x one position apart (even positions). */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def interleave(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)

  /** Round-robin bit-interleave of N keys (2 ≤ N ≤ 8): each key
    * contributes its low 64/N bits; bit `j` of key `i` lands at position
    * `j*N + (N-1-i)`, so key 0 takes the highest slot of each group —
    * for N = 2 this is exactly [[interleave]] restricted to 32 bits.
    * A plain loop rather than the magic-mask spread: 64 iterations of
    * shift/mask inside codegen, still branch-free per row. */
  def interleaveN(xs: Array[Long]): Long = {
    val n = xs.length
    val bits = 64 / n
    var z = 0L
    var i = 0
    while (i < n) {
      val x = xs(i)
      var j = 0
      while (j < bits) {
        z |= ((x >>> j) & 1L) << (j * n + (n - 1 - i))
        j += 1
      }
      i += 1
    }
    z
  }
}

case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderUtil.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

/** N-ary Morton interleave (`zordern(c1, ..., cN)`, 2 ≤ N ≤ 8) — the
  * multi-column generalization of [[ZOrder2]] for `zorder_by` layouts
  * over more than two dimensions. Each key keeps its low 64/N bits. */
case class ZOrderN(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2 || children.size > 8)
      TypeCheckResult.TypeCheckFailure(
        s"zordern takes 2 to 8 BIGINT keys, got ${children.size}")
    else if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zordern requires BIGINT keys, got ${children.map(_.dataType.simpleString).mkString(", ")}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zordern"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val xs = new Array[Long](children.size)
    var i = 0
    while (i < xs.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      xs(i) = v.asInstanceOf[Long]
      i += 1
    }
    ZOrderUtil.interleaveN(xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val xs = ctx.freshName("zxs")
    val childBlocks = evals.zipWithIndex.map { case (e, i) =>
      code"""
        |${e.code}
        |if (!${ev.isNull}) {
        |  if (${e.isNull}) { ${ev.isNull} = true; } else { $xs[$i] = ${e.value}; }
        |}"""
    }.reduce(_ + _)
    ev.copy(code =
      code"""
        |boolean ${ev.isNull} = false;
        |long ${ev.value} = 0L;
        |long[] $xs = new long[${children.size}];
        |$childBlocks
        |if (!${ev.isNull}) ${ev.value} = graft.functions.ZOrderUtil.interleaveN($xs);""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderN = copy(children = newChildren)
}
