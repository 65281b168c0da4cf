package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hashed-linear classifier score of a token array as ONE native loop —
  * the streaming scorer's hot path (round 14). The SQL formulation
  * (`aggregate(tokens, bias, (acc, t) -> acc + element_at(array(<4097
  * literals>), hash(t) % B + 1))`) had two structural costs: the
  * `aggregate` HOF runs interpreted, and the 4097-element literal
  * array constructor pushes the generated method past janino's 64 KB
  * limit, dropping the WHOLE fused stage to interpreted mode (the
  * plane-weights lesson, recurring in the streaming path). Here the
  * weight vector rides the expression as a serialized long[] reference
  * object and the score is a tight loop: per token the active-profile
  * [[CrossHash.localUtf8]] hash, bucket = hash % (len-1), plus the
  * bias slot once — the EXACT integer sum the batch explode+groupBy
  * computes (integer addition is order-free), so stream and batch
  * decisions stay bit-identical (StreamingSpec batch-twin gate).
  * NULL input array → NULL; NULL tokens are skipped (they hash
  * nowhere in the batch explode either — explode drops nothing, but
  * split() never produces NULL elements; the skip is belt-and-braces).
  */
case class HashedScore(child: Expression, weights: Seq[Long])
    extends UnaryExpression {

  require(weights.length >= 2, "hashed_score needs >= 1 bucket + bias")

  @transient private lazy val wArr: Array[Long] = weights.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> of tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_score"

  def compute(arr: ArrayData): Long = {
    val w = wArr
    val b = w.length - 1
    var acc = w(b) // bias
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = CrossHash.localUtf8(arr.getUTF8String(i))
        acc += w((h % b).toInt)
      }
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hashedScore", this, classOf[HashedScore].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedScore =
    copy(child = newChild)
}

/** Registration-time builder: validates the literal weight array. */
object HashedScore {
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.NumericType

  def build(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"hashed_score expects (tokens, weights), got ${children.size} arguments")
    val wE = children(1)
    if (!wE.foldable || wE.eval() == null)
      throw new IllegalArgumentException(
        "hashed_score weights must be a non-null literal array(bigint), got " + wE.sql)
    val coerced = wE.dataType match {
      case ArrayType(LongType, _) => wE
      case ArrayType(_: NumericType, _) => Cast(wE, ArrayType(LongType))
      case other => throw new IllegalArgumentException(
        s"hashed_score weights must be array(bigint), got ${other.simpleString}: ${wE.sql}")
    }
    val ad = coerced.eval().asInstanceOf[ArrayData]
    val w = (0 until ad.numElements()).map { i =>
      if (ad.isNullAt(i))
        throw new IllegalArgumentException(s"hashed_score weight $i is NULL in ${wE.sql}")
      ad.getLong(i)
    }
    HashedScore(children(0), w)
  }
}
