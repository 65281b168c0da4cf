package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Zero-exchange Lloyd assignment: the nearest-centroid cell of a float
  * vector against a PLAN-TIME centroid model, as one native loop.
  *
  * Replicates, value for value, the engine's pinned two-phase argmax
  * (`Similarity.kmAssign`'s flat arm — the shape the DuckDB oracle
  * verifies through `duckKmAssign`):
  *
  *   1. double prefilter: `dd_j = dot_f(v, c_j)` (IEEE double sum of
  *      pairwise float products in index order, null elements skipped),
  *      survivors are `dd_j >= max(dd) - 1e-9` — identical ops to the
  *      `max().over(partitionBy(vec_id))` window + filter;
  *   2. exact re-rank: survivors ranked by
  *      (`dot_dec(v, c_j)` DESC, cell ASC) via [[DecimalDotOps.dot]] —
  *      identical to the `row_number()` pick.
  *
  * The SQL formulation shuffles the full (vector, cell, dd) score
  * stream through the vec_id window exchange and then joins the
  * survivors back twice; at the flat arm (|C| <= PRUNE_SWITCH_C, where
  * every vector's candidates are generated inside one task anyway) the
  * whole reduction is per-row — this expression makes the assignment a
  * pure map stage. The centroid model rides as reference objects
  * (never SQL literals — the giant-literal codegen/parse hazard), with
  * Seq constructor fields so canonicalization/CSE keep structural
  * equality (the PlaneSums rule).
  *
  * NULL input array → NULL (the SQL path drops those vectors after the
  * window; callers filter the NULL cells to match). Empty centroid
  * model → NULL (the SQL cross join produces no rows). */
case class BestCell(child: Expression, cells: Seq[Long], embs: Seq[Seq[Float]])
    extends UnaryExpression {

  @transient private lazy val cellArr: Array[Long] = cells.toArray
  @transient private lazy val embArr: Array[Array[Float]] = embs.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "best_cell"

  override def nullSafeEval(input: Any): Any =
    BestCellOps.eval(input.asInstanceOf[ArrayData], cellArr, embArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("bestCells", cellArr, "long[]")
    val es = ctx.addReferenceObj("bestEmbs", embArr, "float[][]")
    val r = ctx.freshName("bestCellRes")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |Object $r = graft.functions.BestCellOps.eval($a, $cs, $es);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BestCell =
    copy(child = newChild)
}

object BestCellOps {
  /** One static call per row; the inner |C|·dims loop amortizes it. */
  def eval(v: ArrayData, cells: Array[Long], embs: Array[Array[Float]]): java.lang.Long = {
    val nC = cells.length
    if (nC == 0) return null
    // phase 1: double dots, identical term order/skip rules to dot_f
    val dd = new Array[Double](nC)
    var mx = Double.NegativeInfinity
    var j = 0
    while (j < nC) {
      val c = embs(j)
      val n = math.min(v.numElements(), c.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) s += v.getFloat(i).toDouble * c(i).toDouble
        i += 1
      }
      if (java.lang.Double.isNaN(s)) {
        // Spark's double ordering ranks NaN greatest: the window max
        // becomes NaN, `dd >= NaN - 1e-9` is false for every row, and
        // the vector drops out of the SQL assignment entirely — mirror
        // that exactly (a NULL here is filtered by the caller)
        return null
      }
      dd(j) = s
      if (s > mx) mx = s
      j += 1
    }
    val thr = mx - 1e-9
    // phase 2: exact-DECIMAL re-rank of the survivors, ties to lowest
    // cell — DecimalDotOps.dot is the dot_dec the SQL path evaluates
    var bestCell = 0L
    var bestCd: java.math.BigDecimal = null
    j = 0
    while (j < nC) {
      if (dd(j) >= thr) {
        val cd = DecimalDotOps
          .dot(v, org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(embs(j)))
          .toJavaBigDecimal
        val cmp = if (bestCd == null) 1 else cd.compareTo(bestCd)
        if (cmp > 0 || (cmp == 0 && bestCd != null && cells(j) < bestCell)) {
          bestCd = cd
          bestCell = cells(j)
        }
      }
      j += 1
    }
    if (bestCd == null) null else java.lang.Long.valueOf(bestCell)
  }
}
