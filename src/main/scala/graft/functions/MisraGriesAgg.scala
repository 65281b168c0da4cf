package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as one typed imperative aggregate:
  * `mg_agg(token, k)` keeps at most `k` (token, weight) counters over a
  * stream of any length.
  *
  * Guarantee (Misra & Gries 1982; mergeability per Agarwal et al. 2013,
  * "Mergeable Summaries"): after processing `n` items — across any
  * partitioning, since `merge` re-prunes to `k` by subtracting the
  * (k+1)-th largest weight — every item with true frequency
  * `f > n/(k+1)` is present in the summary, and each surviving weight is
  * a lower bound on the true count (undercount ≤ n/(k+1)).
  *
  * This is the bounded-memory half of exact heavy hitters at 100 TB:
  * a map-side O(k) sketch finds the candidate superset with one tiny
  * (≤ k rows) shuffle, then a second pass joins the candidates back
  * against the stream for exact counts — no full-vocabulary shuffle,
  * no top-k sort of the whole key space (contrast `q_vocab_topk`,
  * which shuffles every distinct token). See `q_heavy_hitters`.
  *
  * Nulls are skipped. `eval` returns `array<struct<t,lb>>` sorted by
  * (weight desc, token asc) so the output is deterministic.
  */
/** The algorithm itself, shared between the batch aggregate and the
  * streaming sharded processor ([[graft.streaming.Streams]]): one
  * implementation of update/merge/prune/serialize, two execution
  * surfaces. */
object MisraGries {

  /** Classic MG ingest of one item. */
  def ingest(buf: java.util.HashMap[String, Long], t: String, k: Int): Unit = {
    val cur: Long = buf.get(t) // absent unboxes to 0L; live weights >= 1
    if (cur != 0L) buf.put(t, cur + 1L)
    else if (buf.size < k) buf.put(t, 1L)
    else {
      // a full table + a new item cancels one unit of every counter
      // (amortized O(1): each decrement is paid for by a prior increment)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Merge `b2` into `b1` and re-prune to `k` (Agarwal et al. 2013):
    * subtract the (k+1)-th largest weight from every counter and drop
    * the non-positive ones — keeps the n/(k+1) undercount bound
    * additive across merges. */
  def merge(
      b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long],
      k: Int): java.util.HashMap[String, Long] = {
    val addIt = b2.entrySet().iterator()
    while (addIt.hasNext) {
      val e = addIt.next()
      val old: Long = b1.get(e.getKey)
      b1.put(e.getKey, old + e.getValue)
    }
    if (b1.size > k) {
      val ws = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { ws(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(ws)
      val cut = ws(ws.length - (k + 1)) // (k+1)-th largest
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    b1
  }

  /** Deterministic (weight desc, token asc) ordering of the summary. */
  def sorted(buf: java.util.HashMap[String, Long]): Array[(String, Long)] = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    buf.forEach((t, c) => { entries(i) = (t, c); i += 1 })
    scala.util.Sorting.stableSort(
      entries, (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    entries
  }

  def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val items = new java.util.ArrayList[(Array[Byte], Long)](buf.size)
    buf.forEach((t, c) => {
      val b = t.getBytes(StandardCharsets.UTF_8)
      items.add((b, c))
      bytes += 4 + b.length + 8
    })
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(items.size)
    items.forEach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      m.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }
}

case class MisraGriesAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  private lazy val k: Int = kExpr.eval(null).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType) match {
      case (StringType, IntegerType) if kExpr.foldable =>
        // eval before the cast: a foldable NULL literal would otherwise
        // NPE during analysis instead of failing the type check
        val kv = kExpr.eval(null)
        if (kv != null && kv.asInstanceOf[Number].intValue() >= 1)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName capacity must be a non-null literal >= 1")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING, foldable INT), got " +
          s"${child.dataType.simpleString}, ${kExpr.dataType.simpleString}")
    }

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MisraGries.ingest(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(
      b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] =
    MisraGries.merge(b1, b2, k)

  override def eval(buf: java.util.HashMap[String, Long]): Any =
    new GenericArrayData(MisraGries.sorted(buf).map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] =
    MisraGries.serialize(buf)

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] =
    MisraGries.deserialize(bytes)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("t", StringType), StructField("lb", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_agg"
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
