package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row word n-gram repetition statistics:
  * `ngram_stats(w, n)` → struct(total, top, dup) where `total` is the
  * n-gram count (multiset), `top` the frequency of the most frequent
  * n-gram, and `dup` the number of n-gram occurrences whose gram occurs
  * more than once — the raw ingredients of the Gopher/MassiveText
  * repetition gates (top-n-gram fraction, duplicate-n-gram fraction).
  *
  * Why an expression and not a groupBy: the statistic depends only on
  * the row itself, so shipping |tokens| (doc, gram) rows through an
  * exchange to count them is pure waste at corpus scale. This is one
  * hash-map pass over the token array inside WholeStageCodegen — the
  * repetition query becomes a map-only plan (PlanShapeSpec gates zero
  * exchanges before its final projection).
  */
object NGramStatsHelper {

  /** Static entry used by both interpreted eval and generated code.
    * Gram assembly is [[Shingler.gramAt]] — the same joining the
    * `shingles`/`ngrams` expressions use. */
  def stats(words: ArrayData, n: Int): InternalRow = {
    val len = words.numElements()
    if (len < n) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Int]()
    var i = 0
    while (i <= len - n) {
      counts.merge(Shingler.gramAt(words, i, n), 1, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any]((len - n + 1).toLong, top, dup))
  }
}

case class NGramStats(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"ngram_stats requires ARRAY<STRING> and n >= 1, got ${child.dataType.simpleString}, n=$n")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))

  override def prettyName: String = "ngram_stats"

  override def nullSafeEval(v: Any): Any =
    NGramStatsHelper.stats(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramStatsHelper.stats($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramStats =
    copy(child = newChild)
}
