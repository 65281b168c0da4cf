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

  /** The per-term scaled-12 integer: exactly
    * `BigDecimal.valueOf(p).setScale(12, HALF_UP)·10^12` — i.e. the
    * double's SHORTEST decimal string rounded half-up at scale 12, the
    * value Spark's double→DECIMAL(28,12) Cast produces — but computed
    * without the string render for ~98% of inputs (round 15; the
    * valueOf/Double.toString per term dominated every dot_dec and
    * pq_codes stage: encode_pq streamed at 1.4k rows/s).
    *
    * Fast path: let d(p) be the shortest-repr decimal of p; we need
    * round_half_up(d(p)·10^12). With x = fl(p·10^12),
    * |x − d(p)·10^12| ≤ |d(p)−p|·10^12 + |p·10^12|·2⁻⁵³
    *                 ≤ |x|·2⁻⁵³·(1+ε) + |x|·2⁻⁵³ ≈ |x|·2⁻⁵²
    * (shortest repr is within half an ulp of p; 10^12 is double-exact).
    * round_half_up is constant on any interval that avoids the
    * half-integer boundaries of |value|, so whenever |frac(|x|) − 0.5|
    * exceeds a 4×-safety margin of that bound the binary rounding IS
    * the decimal rounding. Boundary-adjacent values (≈ 2·eps of the
    * unit interval) and magnitudes past 4e15 (frac resolution) take the
    * exact valueOf path — same value, just slower. HALF_UP is
    * magnitude-symmetric, so rounding |x| and restoring the sign is the
    * tie rule. Throws (longValueExact) past ~9.2e6·10^12 instead of
    * wrapping — the ANSI decimal→bigint contract. */
  def term12(p: Double): Long = {
    val x = p * 1e12
    val y = math.abs(x)
    if (y < 4.0e15) {
      val fl = math.floor(y)
      val f = y - fl
      val eps = y * 8.9e-16 + 1e-15
      if (math.abs(f - 0.5) > eps) {
        val n = (if (f > 0.5) fl + 1.0 else fl).toLong
        return if (x < 0) -n else n
      }
    }
    JBigDecimal.valueOf(p).setScale(twelve, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  def dot(a: ArrayData, b: ArrayData): Decimal = {
    val n = math.min(a.numElements(), b.numElements())
    // exact long accumulation of the scaled-12 terms (each term is the
    // exact unscaled value, so the sum is the exact unscaled sum);
    // overflow of the LONG accumulator — unreachable for any sane
    // vector data but possible in principle — falls back to the
    // BigDecimal formulation, which is value-identical term for term
    try {
      var s = 0L
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i))
          s = Math.addExact(s,
            term12(a.getFloat(i).toDouble * b.getFloat(i).toDouble))
        i += 1
      }
      Decimal(s, 28, twelve)
    } catch {
      case _: ArithmeticException => dotSlow(a, b)
    }
  }

  /** The r10 reference formulation (string-path BigDecimal per term) —
    * the overflow fallback and the equality oracle DecimalDotSpec
    * pins the fast path against. */
  def dotSlow(a: ArrayData, b: ArrayData): Decimal = {
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
