package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams as a native expression — distinct shingle set
  * (`shingles(w, n)`) or the full multiset (`ngrams(w, n)`, duplicates
  * kept, for repetition statistics where frequency IS the signal).
  *
  * The builtin formulation
  * `array_distinct(transform(sequence(1, size(w)-n+1), i -> concat_ws(' ', ...)))`
  * runs interpreted (HOFs have no codegen) and dominated the dedup
  * pipeline: ~11s to shingle 5k documents at sf0.1. This expression is
  * one tight loop over the `ArrayData` with a LinkedHashSet dedup —
  * same output values (space-joined word n-grams, first-occurrence
  * order), evaluated inside WholeStageCodegen via a static helper call.
  */
object Shingler {
  private val SPACE = UTF8String.fromString(" ")

  /** The space-joined n-gram starting at position `i` — the single
    * definition of gram assembly, shared with [[NGramStatsHelper]] so
    * `shingles`/`ngrams` values and `ngram_stats` counts can never
    * disagree on joining semantics. */
  def gramAt(words: ArrayData, i: Int, n: Int): UTF8String = {
    var s = words.getUTF8String(i)
    var j = 1
    while (j < n) {
      s = UTF8String.concat(s, SPACE, words.getUTF8String(i + j))
      j += 1
    }
    s
  }

  /** Static entry used by both interpreted eval and generated code. */
  def shingle(words: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = words.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out.add(gramAt(words, i, n))
      i += 1
    }
    new GenericArrayData(out.toArray().asInstanceOf[Array[Any]])
  }
}

case class Shingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> and n >= 1, got ${child.dataType.simpleString}, n=$n")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = if (distinct) "shingles" else "ngrams"

  override def nullSafeEval(v: Any): Any =
    Shingler.shingle(v.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingler.shingle($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}
