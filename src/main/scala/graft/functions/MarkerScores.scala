package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row marker-word scoring in ONE pass over the token array:
  * `marker_scores(w, 'the,a,of,and,is', 'der,die,das,und,ist', ...)` →
  * struct(total, c0, c1, ...) where `total` is the token count and `ci`
  * how many tokens fall in the i-th comma-joined word set.
  *
  * Why an expression and not N higher-order `filter(w, t -> t in (...))`
  * calls: HOF lambdas have no `doGenCode`, so each one runs interpreted
  * AND pins its own copy of the (CollapseProject-inlined) tokenization —
  * the language-ID audit was tokenizing every row ~6 times. This is a
  * single hash-map lookup per token inside WholeStageCodegen; with every
  * consumer codegen'd, subexpression elimination evaluates the `split`
  * feeding it exactly once per row.
  */
object MarkerScoresHelper {
  /** word → indices of the sets containing it (a word may appear in
    * several sets; each gets the count). */
  def buildLookup(sets: Seq[Seq[String]]): java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    for ((ws, i) <- sets.zipWithIndex; w <- ws) {
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(i) else prev :+ i)
    }
    m
  }
}

case class MarkerScores(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if sets.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"marker_scores requires ARRAY<STRING> plus >=1 word set, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = StructType(
    StructField("total", LongType, nullable = false) +:
      sets.indices.map(i => StructField(s"c$i", LongType, nullable = false)))

  override def prettyName: String = "marker_scores"

  @transient private lazy val lookup = MarkerScoresHelper.buildLookup(sets)

  /** Shared by interpreted eval and generated code (referenced via
    * `addReferenceObj`, the standard route for expressions carrying
    * driver-built state into codegen). */
  def compute(words: ArrayData): GenericInternalRow = {
    val n = words.numElements()
    val counts = new Array[Long](sets.length)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val hit = lookup.get(words.getUTF8String(i))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j)) += 1L; j += 1 }
        }
      }
      i += 1
    }
    val out = new Array[Any](sets.length + 1)
    out(0) = n.toLong
    var k = 0
    while (k < sets.length) { out(k + 1) = counts(k); k += 1 }
    new GenericInternalRow(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerScores", this, classOf[MarkerScores].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerScores =
    copy(child = newChild)
}
