package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Every corpus-wide reduction of the centered second-moment matrix in
  * ONE pass over the vectors and ONE `long` buffer:
  * `gram_agg(vec, d, scale)` quantizes each element to
  * `floor(cast(x as double) * scale)` BIGINT (bit-identical to the SQL
  * quantization the PCA oracle runs) and accumulates
  *
  *   `[ n, s_1..s_d, g_11, g_12 .. g_1d, g_22 .. g_dd ]`
  *
  * — the row count, per-dimension sums, and the upper triangle of the
  * Gram matrix Σ qᵢqⱼ in row-major order (1 + d + d(d+1)/2 longs;
  * d = 64 → 2 145). All sums are exact integers, so the merge is
  * order-free and the result deterministic under any partitioning.
  *
  * This replaces the double-posexplode Gram formulation, which fanned
  * every vector out to d² = 4 096 rows before a HashAggregate could
  * combine them: correct and map-side-combined, but paying a 4 096×
  * row-expansion constant on a 100 TB scan for what is per-row
  * imperative arithmetic. Here each row costs one tight d(d+1)/2 loop
  * inside the aggregate update, the shuffle is a single 17 KB buffer
  * per partition, and the plan is one ObjectHashAggregate over ONE
  * group — the 128-key sort-fallback hazard of keyed imperative
  * aggregates (project notes) cannot apply to a global aggregate.
  *
  * Null vectors are skipped; null ELEMENTS are treated as 0 (the
  * harness embeddings contain neither).
  */
case class GramAgg(
    child: Expression,
    dExpr: Expression,
    scaleExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val d: Int = dExpr.eval(null).asInstanceOf[Number].intValue()
  private lazy val scale: Double =
    scaleExpr.eval(null).asInstanceOf[Number].doubleValue()
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def bufLen: Int = 1 + d + d * (d + 1) / 2

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if dExpr.foldable && scaleExpr.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT|DOUBLE>, foldable INT dim, " +
        s"foldable numeric scale), got ${child.dataType.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(d, arr.numElements())
      val q = new Array[Long](d) // beyond-input slots stay 0
      var k = 0
      while (k < n) {
        if (!arr.isNullAt(k)) {
          val x = if (isFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
          q(k) = math.floor(x * scale).toLong
        }
        k += 1
      }
      buf(0) += 1L
      var i = 0
      var idx = 1 + d
      while (i < d) {
        buf(1 + i) += q(i)
        val qi = q(i)
        var j = i
        while (j < d) { buf(idx) += qi * q(j); idx += 1; j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_agg"
  override def children: Seq[Expression] = Seq(child, dExpr, scaleExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren(0), dExpr = newChildren(1), scaleExpr = newChildren(2))
}
