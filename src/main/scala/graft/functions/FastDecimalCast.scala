package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType}

/** `dec_cast(v, p, s)` — DOUBLE → DECIMAL(p, s), value-identical to
  * Spark's `cast(v as decimal(p, s))`, with a fast integer path.
  *
  * Spark's Cast goes through the double's shortest decimal string
  * (`BigDecimal.valueOf`) then `setScale(s, HALF_UP)` — two object
  * allocations and a string render per row, which dominates the
  * DECIMAL-accumulating aggregations (the engine's no-float-aggregates
  * rule makes this the hot path of every revenue-style sum).
  *
  * Fast path: `l = Math.round(v * 10^s)`; accept when
  * `(double) l / 10^s == v` and `Math.ulp(v) < 0.5 * 10^-s`. Then the
  * rounding interval of `v` (width = ulp) is narrower than half a
  * scale-s step, so EVERY decimal that reads back as `v` — including the
  * shortest one Cast renders — lies strictly within `0.5*10^-s` of
  * `l*10^-s` and rounds (HALF_UP or any nearest mode) to exactly `l`.
  * Values that fail either guard (needs rounding at scale s, or too
  * large for the interval argument) take the exact valueOf path — same
  * result, just slower. Overflow of DECIMAL(p, s) yields NULL — i.e.
  * `try_cast` semantics (Spark 4's ANSI-default Cast throws instead;
  * the engine's aggregation paths never overflow their accumulators by
  * construction).
  */
object FastDecimalOps {
  private val pow10: Array[Double] = (0 to 18).map(i => math.pow(10, i)).toArray
  private val halfStep: Array[Double] = (0 to 18).map(i => 0.5 * math.pow(10, -i)).toArray

  /** @return null on precision overflow (non-ANSI Cast semantics). */
  def cast(v: Double, precision: Int, scale: Int): Decimal = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) return null
    val m = pow10(scale)
    val scaled = v * m
    if (math.abs(scaled) < 9.007199254740992e15) { // 2^53: long-exact range
      val l = Math.round(scaled)
      if (l.toDouble / m == v && Math.ulp(v) < halfStep(scale)) {
        // digits(l) <= precision <=> |l| < 10^precision
        return if (precision >= 19 || math.abs(l) < pow10(precision)) {
          Decimal(l, precision, scale)
        } else null
      }
    }
    val bd = JBigDecimal.valueOf(v).setScale(scale, RoundingMode.HALF_UP)
    if (bd.precision() - bd.scale() > precision - scale) null
    else Decimal(bd, precision, scale)
  }
}

case class FastDecimalCast(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && scale >= 0 && scale <= 18 &&
      precision >= scale && precision <= 38) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (DOUBLE, 0<=s<=18<=p<=38), got ${child.dataType.simpleString}($precision,$scale)")

  override def dataType: DataType = DecimalType(precision, scale)
  override def nullable: Boolean = true
  override def prettyName: String = "dec_cast"

  override def nullSafeEval(input: Any): Any =
    FastDecimalOps.cast(input.asInstanceOf[Double], precision, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("dec")
      s"""
         |org.apache.spark.sql.types.Decimal $r =
         |  graft.functions.FastDecimalOps.cast($v, $precision, $scale);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FastDecimalCast =
    copy(child = newChild)
}
