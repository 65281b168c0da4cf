package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-class character-trigram language-ID score as ONE native loop —
  * the corpus-wide scorer of the trained langid model (round 18; the
  * `hashed_score` rule). Per input string: every UTF-8 BYTE trigram is
  * hashed with the active-profile [[CrossHash.localUtf8]], bucketed
  * `hash % B`, and each class accumulates `w_c[bucket]`, starting from
  * its bias slot `w_c[B]` — k exact BIGINT sums in one pass, no
  * explode, no HOF, no giant literal (the weight matrix rides as a
  * reference object; the SQL entry path exists for tests, production
  * models go through ColumnBridge — the r16 rule).
  *
  * Byte trigrams == character trigrams on single-byte text, which is
  * what the DuckDB oracle's `substr(s, i, 3)` mirrors; the engine's
  * derived corpus is ASCII by construction (LangId.scala). On
  * multi-byte text the expression remains a well-defined byte-trigram
  * model — only the SQL-text oracle equivalence is ASCII-scoped. */
case class LangIdScore(child: Expression, weights: Seq[Seq[Long]])
    extends UnaryExpression {

  require(weights.nonEmpty && weights.head.length >= 2,
    "langid_score needs >= 1 class, each >= 1 bucket + bias")
  require(weights.forall(_.length == weights.head.length),
    "langid_score classes must share one bucket count")

  @transient private lazy val wArr: Array[Array[Long]] =
    weights.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "langid_score"

  def compute(u: UTF8String): ArrayData = {
    val w = wArr
    val k = w.length
    val b = w(0).length - 1
    val acc = new Array[Long](k)
    var c = 0
    while (c < k) { acc(c) = w(c)(b); c += 1 } // bias slots
    val bytes = u.getBytes
    val n = bytes.length - 2
    var i = 0
    while (i < n) {
      val h = CrossHash.localUtf8(UTF8String.fromBytes(bytes, i, 3))
      val bucket = (h % b).toInt
      c = 0
      while (c < k) { acc(c) += w(c)(bucket); c += 1 }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("langIdScore", this, classOf[LangIdScore].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $self.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdScore =
    copy(child = newChild)
}

/** Registration-time builder (SQL entry path, small models/tests only —
  * production weights go through ColumnBridge). */
object LangIdScore {

  def build(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"langid_score expects (text, weights), got ${children.size} arguments")
    val wE = children(1)
    if (!wE.foldable || wE.eval() == null)
      throw new IllegalArgumentException(
        "langid_score weights must be a non-null literal array(array(bigint)), got " + wE.sql)
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    // integral widths only — the dsir_score rule: fractional input
    // would Cast-truncate to a silently wrong model
    val coerced = wE.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => wE
      case ArrayType(ArrayType(ByteType | ShortType | IntegerType, _), _) =>
        Cast(wE, ArrayType(ArrayType(LongType)))
      case other => throw new IllegalArgumentException(
        s"langid_score weights must be array(array(bigint)), got ${other.simpleString}: ${wE.sql}")
    }
    val outer = coerced.eval().asInstanceOf[ArrayData]
    val w = (0 until outer.numElements()).map { c =>
      if (outer.isNullAt(c))
        throw new IllegalArgumentException(s"langid_score class $c is NULL in ${wE.sql}")
      val inner = outer.getArray(c)
      (0 until inner.numElements()).map { i =>
        if (inner.isNullAt(i))
          throw new IllegalArgumentException(
            s"langid_score weight ($c, $i) is NULL in ${wE.sql}")
        inner.getLong(i)
      }
    }
    LangIdScore(children(0), w)
  }
}
