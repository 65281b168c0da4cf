package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row SimHash block-combination claim keys as ONE native loop —
  * the streaming twin of the batch `simhash_agg` + masked-key join
  * pipeline (`q_dedup_simhash_blocks`), built by the
  * [[MinHashBands]] rule: a HOF formulation would run interpreted and
  * CollapseProject would re-inline the 60-bit signature computation
  * into every masked-key expression.
  *
  * Contract: for token strings t_i, h_i = [[CrossHash.localUtf8]] (the
  * active-profile per-row twin of `CrossHash.h` — CrossHashSpec pins
  * agreement), signature bit b is set iff strictly more h_i have bit b
  * set than clear (the [[SimHashAgg]] rule, value-identical), and key
  * m = a 64-bit mix of (m, simhash AND masks(B)(m)) over the C(B,5)
  * canonical exclusion masks ([[SimhashBlockKeys.masks]] — the SAME
  * family the batch query joins on, one source of truth). The key
  * VALUES are not the batch join's (mask, bkey) pairs — a stream
  * state key must be one value — but they partition identically on
  * (mask index, masked signature), which is what the StreamingSpec
  * batch-twin equality gate proves. Two signatures at hamming ≤ 5
  * share a key for SOME m by pigeonhole (SimhashBlocksSpec), so a
  * first-writer-wins claim per key is an EXACT-recall streaming
  * prefilter at hamming ≤ 5 — the mediaDedup claim protocol at the
  * text tier. NULL input array → NULL; NULL elements are skipped; a
  * row with zero hashable tokens yields NULL (callers filter).
  *
  * B is the caller's dedup-horizon choice (the streaming
  * `semanticDedup(bits)` rule — a stream cannot derive corpus size);
  * batch derives it from the corpus ([[graft.queries.Dedup]]). */
case class SimhashBlockKeys(child: Expression, bB: Int)
    extends UnaryExpression {

  require(SimhashBlockKeys.ValidB.contains(bB),
    s"simhash_block_keys: B must be one of ${SimhashBlockKeys.ValidB.toSeq.sorted.mkString("{", ",", "}")} " +
      s"(larger divisors of 60 make the C(B,5) per-row key fan-out impractical), got $bB")

  @transient private lazy val maskArr: Array[Long] = SimhashBlockKeys.masks(bB)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> of tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_block_keys"

  /** One reusable instance method so interpreted eval and generated
    * code share the implementation (the MinHashBands rule). */
  def compute(arr: ArrayData): GenericArrayData = {
    val counters = new Array[Int](60)
    val n = arr.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = CrossHash.localUtf8(arr.getUTF8String(i))
        var b = 0
        while (b < 60) {
          counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (counters(b) > 0) sim |= (1L << b)
      b += 1
    }
    val t = maskArr.length
    val out = new Array[Any](t)
    var m = 0
    while (m < t) {
      // fixed 64-bit mix of (mask index, masked signature) — the
      // MinHashBands splitmix-style fold
      var acc = 1125899906842597L * (m + 1)
      acc = (acc ^ (sim & maskArr(m))) * -7046029254386353131L // 0x9E3779B97F4A7C15
      acc ^= (acc >>> 32)
      out(m) = acc
      m += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(
      "simhashBlockKeys", this, classOf[SimhashBlockKeys].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = $self.compute($a);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): SimhashBlockKeys =
    copy(child = newChild)
}

object SimhashBlockKeys {

  /** The supported block-count ladder: divisors of 60 whose C(B,5)
    * mask count stays a practical per-row fan-out (B = 20 is already
    * 15,504 keys/row; B = 30/60 also divide 60 and leave included
    * blocks, but their 142k/5.4M-mask families are excluded on
    * cost, not correctness). */
  val ValidB: Set[Int] = Set(6, 10, 12, 15, 20)

  /** The canonical C(B,5) exclusion-mask family over B blocks of
    * 60/B bits — each mask keeps B−5 blocks (full60 minus the 5
    * excluded blocks' bits; blocks are disjoint so subtraction is
    * exact). `combinations` enumerates in deterministic lexicographic
    * order, so mask INDEX m is stable — both the batch oracle's
    * generate_series enumeration and the streaming key mix rely on
    * the family, and [[graft.queries.Dedup.simhashBlockMasks]]
    * delegates here (one source of truth). */
  def masks(bB: Int): Array[Long] = {
    require(ValidB.contains(bB), s"simhash blocks: invalid B $bB")
    val width = 60 / bB
    val full = (1L << 60) - 1
    (0 until bB).combinations(5).map { ex =>
      ex.foldLeft(full)((m, e) => m - (((1L << width) - 1) << (e * width)))
    }.toArray
  }

  /** Registration-time builder (shared by GraftRuntime and the session
    * extension): validates the literal block count. */
  def build(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"simhash_block_keys expects (tokens, B), got ${children.size} arguments")
    val bE = children(1)
    if (!bE.foldable || bE.eval() == null)
      throw new IllegalArgumentException(
        s"simhash_block_keys B must be a non-null literal, got ${bE.sql}")
    SimhashBlockKeys(children(0), bE.eval().asInstanceOf[Number].intValue())
  }
}
