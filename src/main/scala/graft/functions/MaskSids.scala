package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Set-bit positions of a multi-word bitmask (`mask_sids(mask)`) — the
  * source-overlap sid encoding: 62 bits per BIGINT word, word `w` bit
  * `b` → sid `w*62 + b` (VERDICT r19 #5).
  *
  * The scale-proof overlap kernel explodes each distinct membership
  * mask into its member sids (then sid PAIRS) instead of nested-loop
  * joining the |S|²/2 source pair grid against the mask histogram —
  * the histogram is bounded by observed membership-pattern diversity,
  * which at web-domain source granularity approaches the distinct
  * shingle count, so the per-row cost here must be O(popcount), never
  * O(|S|): one `Long.numberOfTrailingZeros` loop per word, evaluated
  * inside WholeStageCodegen via a static helper call (the
  * [[Shingler]] pattern; a `filter(sequence(0, |S|-1), ...)` HOF would
  * run interpreted AND scan all |S| candidate bits per row). */
object MaskSidsHelper {
  def sids(words: ArrayData): ArrayData = {
    val nW = words.numElements()
    val out = new java.util.ArrayList[Any]()
    var w = 0
    while (w < nW) {
      var m = words.getLong(w)
      while (m != 0L) {
        out.add((w * 62 + java.lang.Long.numberOfTrailingZeros(m)).toLong)
        m &= m - 1
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class MaskSids(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "mask_sids"

  override def nullSafeEval(v: Any): Any =
    MaskSidsHelper.sids(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MaskSidsHelper.sids($c);")

  override protected def withNewChildInternal(newChild: Expression): MaskSids =
    copy(child = newChild)
}
