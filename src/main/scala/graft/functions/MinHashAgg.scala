package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature as ONE typed imperative aggregate.
  *
  * `minhash_agg(v, array(seed0, ..., seedk-1))` over pre-hashed shingles
  * computes `[min(v ^ seed0), ..., min(v ^ seedk-1)]` — value-identical
  * to k separate `min(v ^ seedL)` aggregate columns (the shape the
  * DuckDB oracle runs), but one long[k] buffer updated in a tight loop
  * instead of k agg expressions, with normal map-side partials.
  *
  * Null inputs are skipped; an empty group evals to an all-null
  * signature array (matching k `min()`s over an empty group).
  */
case class MinHashAgg(
    child: Expression,
    seedsExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val seeds: Array[Long] = {
    val arr = seedsExpr.eval(null).asInstanceOf[ArrayData]
    arr.toLongArray()
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, seedsExpr.dataType) match {
      case (LongType, ArrayType(LongType, _)) if seedsExpr.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, foldable ARRAY<BIGINT>), got " +
          s"${child.dataType.simpleString}, ${seedsExpr.dataType.simpleString}")
    }

  // buffer slot k = current min for permutation k; MaxValue = "no input yet"
  override def createAggregationBuffer(): Array[Long] =
    Array.fill(seeds.length)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < buf.length) {
        val p = h ^ seeds(i)
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) new GenericArrayData(Array.fill[Any](buf.length)(null))
    else new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"
  override def children: Seq[Expression] = Seq(child, seedsExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren(0), seedsExpr = newChildren(1))
}
