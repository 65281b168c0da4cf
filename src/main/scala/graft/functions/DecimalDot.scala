package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, FloatType}

/** Exact-DECIMAL dot product of two float vectors as a native expression.
  *
  * Replicates, value-for-value, the oracle-checked HOF formulation
  * `aggregate(zip_with(a, b, (x,y) -> cast(cast(x as double)*cast(y as double) as decimal(28,12))), 0, +)`:
  * each pairwise product is computed in IEEE double, converted to
  * decimal through the double's shortest string (`BigDecimal.valueOf`,
  * the same path Spark's double→decimal Cast takes) and rounded
  * HALF_UP to scale 12 (Cast.changePrecision's mode); the sum is exact
  * at scale 12. The HOF runs interpreted per element — this is one
  * static loop inside WholeStageCodegen, which is what the IVF/ANN
  * assignment stages (|vectors| × |centroids| dots) need.
  */
object DecimalDotOps {
  private val twelve = 12

  def dot(a: ArrayData, b: ArrayData): Decimal = {
    val n = math.min(a.numElements(), b.numElements())
    var s = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
        s = s.add(JBigDecimal.valueOf(p).setScale(twelve, RoundingMode.HALF_UP))
      }
      i += 1
    }
    Decimal(s, 28, twelve)
  }
}

case class DecimalDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DecimalType(28, 12)
  override def prettyName: String = "dot_dec"

  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalDotOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DecimalDotOps.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDot =
    copy(left = newLeft, right = newRight)
}
