package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash as ONE typed imperative aggregate over pre-hashed
  * tokens.
  *
  * Value-identical to the builtin formulation (60 separate
  * `sum(CASE WHEN bit THEN 1 ELSE -1)` aggregates followed by a bit
  * assembly projection — the shape the DuckDB oracle still runs), but
  * each input row updates one int[60] buffer in a tight loop instead of
  * 60 independent agg expressions writing 60 UnsafeRow slots — ~60
  * buffer-schema updates collapse into one array pass, and the
  * per-group state is a single 240-byte blob that partial-aggregates
  * map-side like any other agg.
  *
  * Semantics: null inputs are skipped; an all-null/empty group yields 0L
  * (the builtin CASE chain also falls through to 0 when the sums are
  * null). Bit b of the result is set iff strictly more inputs had bit b
  * set than clear.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  private val bits = 60

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT token-hash column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var b = 0
    while (b < bits) { b1(b) += b2(b); b += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var r = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}
