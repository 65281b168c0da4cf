package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StructField, StructType}

/** Per-row residual-IVFADC encode as ONE native loop — the serving-tier
  * ingest of the trained IVF-PQ index (`q_ann_ivfadc`): route the vector
  * to its nearest coarse centroid, subtract it, product-quantize the
  * residual. Batch runs the three steps relationally (the two-level
  * assignment switch matters at corpus scale); a STREAM encodes one
  * vector at a time against the in-RAM coarse quantizer — exactly how a
  * FAISS IndexIVFPQ add() works — so the whole encode rides the plan as
  * one stateless expression (no stream-side join, no state store).
  *
  * Bit-for-bit contract with the batch pipeline (StreamingSpec's
  * batch-twin gate):
  *  - cell = argmax over centroids of the exact-DECIMAL(28,12) dot
  *    (Σ [[DecimalDotOps.term12]] scaled-long terms — ≡ `dot_dec`),
  *    ties to the LOWEST cell id (kmAssign's `ORDER BY cd DESC, cell`);
  *    a certified-margin double prefilter (the [[PqCodes]] two-phase
  *    pattern: float×float products are exact in double, so the only
  *    error is the 64-term summation and the per-term scaled-12
  *    rounding distance) skips the decimal terms when the leader
  *    provably clears the runner-up; NaN / near-overflow magnitudes
  *    force the exact path so its LOUD failure is preserved;
  *  - residual(i) = FLOAT(DOUBLE(v(i)) − DOUBLE(c(i))) — the
  *    `zip_with(…, (x, y) -> cast(cast(x as double) - cast(y as double)
  *    as float))` narrowing, null/absent elements null exactly like
  *    zip_with's max-length extension;
  *  - codes delegate to [[PqCodes.compute]] on the residual — the same
  *    object the batch `pq_codes` call evaluates.
  *
  * CONTRACT BOUND (r15 ADVICE): the flat exact argmax here is
  * batch-identical only while the batch assignment itself runs flat —
  * i.e. \|C\| ≤ `Similarity.PRUNE_SWITCH_C`; past the switch the batch
  * pipeline routes through the SRP radius-2 pruned candidate set, which
  * agrees with the flat argmax on only ~85% of vectors. Both entry
  * points (`ivfadcEncodeSql`, `Streams.encodeIvfadc`) assert the bound,
  * so a larger coarse quantizer fails loudly instead of silently
  * diverging from the batch index.
  *
  * Constructor fields are Seq (structural equality) so identical
  * encodes canonicalize equal — the [[PlaneSums]] rule; hot loops read
  * primitive arrays. Entries are sorted by cell id at build time so
  * "lowest index" IS "lowest cell id". */
case class IvfAdcEncode(
    child: Expression,
    cells: Seq[Long],
    cents: Seq[Seq[Float]],
    cb: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  require(cells.nonEmpty && cells.length == cents.length,
    "ivfadc_encode: cells and cents must be non-empty parallel arrays")
  require(cells.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "ivfadc_encode: cells must be strictly ascending (builder sorts)")

  @transient private lazy val cellArr: Array[Long] = cells.toArray
  @transient private lazy val centArr: Array[Array[Float]] =
    cents.map(_.toArray).toArray
  /** The residual quantizer — [[PqCodes]] as a computation object (its
    * child is never evaluated; compute() takes the residual directly). */
  @transient private lazy val pq = PqCodes(child, cb)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "ivfadc_encode"

  def compute(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val len = v.numElements()
    // ---- phase 1: double-scored argmax with a certified margin ----
    var b1 = Double.NegativeInfinity
    var b2 = Double.NegativeInfinity
    var bi = 0
    var m1 = 0.0
    var mMax = 0.0 // max margin over every NON-LEADER centroid
    var forceExact = false
    var c = 0
    while (c < centArr.length) {
      val ce = centArr(c)
      var d = 0.0
      var a = 0.0
      var i = 0
      while (i < ce.length) {
        if (i < len && !v.isNullAt(i)) {
          val p = v.getFloat(i).toDouble * ce(i).toDouble // exact in double
          d += p
          a += math.abs(p)
        }
        i += 1
      }
      if (d != d || a > 8.0e6) forceExact = true
      // 64 terms: per-term scaled-12 rounding ≤ 0.5e-12 each (≤ 3.2e-11
      // total) plus the double summation error ~ A·len·eps — margin is
      // ≥ 2× both
      val mg = 1e-10 + a * 1e-13
      // sound bound needs the WORST margin among non-leaders, not the
      // runner-up's: a third centroid just below b2 can carry a larger
      // Σ|p| error term than the runner-up (r15 ADVICE) — so when a new
      // leader arrives, the dethroned leader's margin joins mMax too
      if (d > b1) { b2 = b1; mMax = math.max(mMax, m1); b1 = d; m1 = mg; bi = c }
      else { if (d > b2) b2 = d; mMax = math.max(mMax, mg) }
      c += 1
    }
    // for any non-leader c: exact_c ≤ d_c + mg_c ≤ b2 + mMax, and
    // exact_leader ≥ b1 − m1 — a strict win here certifies the argmax
    val cellIdx =
      if (!forceExact && b1 - b2 > m1 + mMax) { IvfAdcEncode.fastRoutes.increment(); bi }
      else { IvfAdcEncode.exactRoutes.increment(); exactArgmax(v, len) }
    // ---- residual: the zip_with narrowing, max-length extension ----
    val ce = centArr(cellIdx)
    val rlen = math.max(len, ce.length)
    val res = new Array[Any](rlen)
    var i = 0
    while (i < rlen) {
      res(i) =
        if (i < len && !v.isNullAt(i) && i < ce.length)
          (v.getFloat(i).toDouble - ce(i).toDouble).toFloat
        else null
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](cellArr(cellIdx), pq.compute(new GenericArrayData(res))))
  }

  /** Exact scaled-long argmax (Σ term12 terms ≡ dot_dec), ties to the
    * lowest INDEX = lowest cell id — the semantics anchor. */
  private def exactArgmax(v: ArrayData, len: Int): Int = {
    var bestScore = Long.MinValue
    var bestI = 0
    var c = 0
    while (c < centArr.length) {
      val ce = centArr(c)
      var dot = 0L
      var i = 0
      while (i < ce.length) {
        if (i < len && !v.isNullAt(i))
          dot = Math.addExact(dot,
            DecimalDotOps.term12(v.getFloat(i).toDouble * ce(i).toDouble))
        i += 1
      }
      if (dot > bestScore) { bestScore = dot; bestI = c }
      c += 1
    }
    bestI
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("ivfAdcEncode", this, classOf[IvfAdcEncode].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAdcEncode =
    copy(child = newChild)
}

/** Registration-time builder: validates the literals, coerces numeric
  * element types to FLOAT/BIGINT through foldable evaluation, and sorts
  * the (cell, centroid) entries by cell id. */
object IvfAdcEncode {
  /** Per-JVM diagnostic counters for the routing prefilter (the
    * [[PqCodes.fastSubspaces]] pattern): cell decisions taken by the
    * certified double prefilter vs the exact scaled-long fallback. The
    * margin proof makes the CELL correct either way — these only make
    * the prefilter's coverage visible; IvfAdcEncodeSpec asserts
    * coverage on the real corpus and that duplicate centroids force
    * the fallback. */
  val fastRoutes = new java.util.concurrent.atomic.LongAdder
  val exactRoutes = new java.util.concurrent.atomic.LongAdder

  def build(children: Seq[Expression]): Expression = {
    require(children.size == 4,
      s"ivfadc_encode expects (vector, cells, cents, codebook), got ${children.size} arguments")
    def lit(e: Expression, what: String): ArrayData = {
      if (!e.foldable)
        throw new IllegalArgumentException(s"ivfadc_encode $what must be a literal, got " + e.sql)
      val v = e.eval()
      if (v == null)
        throw new IllegalArgumentException(s"ivfadc_encode $what must be non-null, got " + e.sql)
      v.asInstanceOf[ArrayData]
    }
    val cellsAd = lit(children(1), "cells")
    val cellIds = children(1).dataType match {
      case ArrayType(LongType, _) => cellsAd.toLongArray().toSeq
      case ArrayType(IntegerType, _) =>
        // only the element widths whose accessor we actually call: a
        // getInt over array<double>/<smallint>/<decimal> UnsafeArrayData
        // would read the wrong bytes and yield garbage cell ids silently
        (0 until cellsAd.numElements()).map(i =>
          cellsAd.getInt(i).toLong)
      case other =>
        throw new IllegalArgumentException(
          s"ivfadc_encode cells must be array(bigint) or array(int), got ${other.simpleString}")
    }
    val centsAd = lit(children(2), "cents")
    val centRows = (0 until centsAd.numElements()).map { c =>
      val a = centsAd.getArray(c)
      (0 until a.numElements()).map(a.getFloat)
    }
    require(cellIds.length == centRows.length,
      "ivfadc_encode: cells and cents must be parallel arrays")
    require(cellIds.distinct.length == cellIds.length,
      "ivfadc_encode: duplicate cell ids")
    val sorted = cellIds.zip(centRows).sortBy(_._1)
    val cbAd = lit(children(3), "codebook")
    val cbRows = (0 until cbAd.numElements()).map { m =>
      val ks = cbAd.getArray(m)
      (0 until ks.numElements()).map { k =>
        val e = ks.getArray(k)
        (0 until e.numElements()).map(e.getFloat)
      }
    }
    IvfAdcEncode(children(0), sorted.map(_._1), sorted.map(_._2), cbRows)
  }
}
