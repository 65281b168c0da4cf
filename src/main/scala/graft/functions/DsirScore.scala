package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document DSIR importance weight as ONE native loop — the
  * streaming scorer's hot path for the q_dsir_weights family.
  *
  * `dsir_score(tokens, lr_scaled)` returns
  * `struct<n_feats: bigint, weight: double>` where `n_feats` is the
  * number of DISTINCT unigrams plus DISTINCT bigrams in the token
  * array (exactly the batch explode of
  * `concat(array_distinct(tokens), shingles(tokens, 2))` — bigram
  * assembly shares [[Shingler.gramAt]], so the two formulations can
  * never disagree on joining semantics) and `weight` is the double
  * image of the exact DECIMAL(28,9) sum Σ lr[CrossHash('dsir#'‖g) % B]
  * over those grams. The trained per-bucket log-ratios ride the
  * expression as a SCALE-9 UNSCALED long[] reference object (the
  * [[HashedScore]] treatment): integer addition is order-free, so the
  * streaming score is bit-identical to the batch aggregate's
  * DECIMAL(9,0)×DECIMAL(18,9) sum — the StreamingSpec batch-twin gate
  * relies on it. A SQL-text rendering of the 1024-weight array would
  * re-create the giant-literal hazard; build through
  * [[org.apache.spark.sql.graft.ColumnBridge]] (tests may use the
  * registered SQL builder with small models).
  *
  * NULL input array → NULL; NULL tokens are skipped (split() never
  * produces them — belt-and-braces, the HashedScore rule). An empty
  * token array yields (0, 0.0) where the batch inner join emits no row
  * — the streaming twin's documented widening.
  */
case class DsirScore(child: Expression, lrScaled: Seq[Long])
    extends UnaryExpression {

  require(lrScaled.nonEmpty, "dsir_score needs >= 1 bucket log-ratio")

  @transient private lazy val lrArr: Array[Long] = lrScaled.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> of tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = false)))
  override def prettyName: String = "dsir_score"

  private val Prefix = UTF8String.fromString("dsir#")

  def compute(arr: ArrayData): InternalRow = {
    val lr = lrArr
    val b = lr.length
    val n = arr.numElements()
    var total = 0L
    var nFeats = 0L
    val seenUni = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (seenUni.add(t)) {
          total += lr((CrossHash.localUtf8(UTF8String.concat(Prefix, t)) % b).toInt)
          nFeats += 1
        }
      }
      i += 1
    }
    if (n >= 2) {
      val seenBi = new java.util.HashSet[UTF8String]()
      i = 0
      while (i + 1 < n) {
        if (!arr.isNullAt(i) && !arr.isNullAt(i + 1)) {
          val g = Shingler.gramAt(arr, i, 2)
          if (seenBi.add(g)) {
            total += lr((CrossHash.localUtf8(UTF8String.concat(Prefix, g)) % b).toInt)
            nFeats += 1
          }
        }
        i += 1
      }
    }
    // the batch surface is cast(sum(...) as decimal(28,9)) cast double:
    // identical to the scale-9 unscaled total's decimal double image
    new GenericInternalRow(Array[Any](nFeats, Decimal(total, 28, 9).toDouble))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("dsirScore", this, classOf[DsirScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

/** Registration-time builder: validates the literal log-ratio array
  * (the SQL entry path — tests and small models; production streaming
  * builds through ColumnBridge instead). */
object DsirScore {
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}

  def build(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"dsir_score expects (tokens, lr_scaled), got ${children.size} arguments")
    val wE = children(1)
    if (!wE.foldable || wE.eval() == null)
      throw new IllegalArgumentException(
        "dsir_score lr_scaled must be a non-null literal array(bigint), got " + wE.sql)
    val coerced = wE.dataType match {
      case ArrayType(LongType, _) => wE
      // integral widths only: a fractional array (e.g. unscaled double
      // log-ratios) would Cast-truncate toward zero — a silently
      // all-zero model through the SQL entry path (ADVICE r17)
      case ArrayType(ByteType | ShortType | IntegerType, _) =>
        Cast(wE, ArrayType(LongType))
      case other => throw new IllegalArgumentException(
        "dsir_score lr_scaled must be array(bigint) (integral, pre-scaled " +
          s"by 10^9 — see duckDsirCtes), got ${other.simpleString}: ${wE.sql}")
    }
    val ad = coerced.eval().asInstanceOf[ArrayData]
    val w = (0 until ad.numElements()).map { i =>
      if (ad.isNullAt(i))
        throw new IllegalArgumentException(s"dsir_score lr_scaled $i is NULL in ${wE.sql}")
      ad.getLong(i)
    }
    DsirScore(children(0), w)
  }
}
