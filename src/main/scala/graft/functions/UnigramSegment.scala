package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram-LM piece table —
  * the inner loop of the SentencePiece-style tokenizer
  * (`q_unigram_lm_train` / `q_unigram_encode`, Kudo 2018).
  *
  * `unigram_segment(word)` returns the piece sequence maximizing the
  * EXACT-INTEGER total of the pieces' scale-9 log-prob scores (the
  * model rides as parallel piece/score Seqs — a reference object, the
  * HashedScore rule). Determinism is structural: scores are integers
  * (no float compares), and ties on total break toward the LONGER
  * piece at each position, decided right to left — which makes the
  * chosen segmentation the lexicographically GREATEST length sequence
  * among total-optimal ones, the exact ordering the DuckDB oracle
  * reproduces by enumerating segmentations and sorting
  * (total DESC, length-string DESC). Every single character is
  * guaranteed a piece by the trainer, so segmentation never fails;
  * a character OUTSIDE the piece table (impossible under the trainer's
  * closure, belt-and-braces for direct SQL use) yields NULL.
  *
  * DP is O(len · MAX_PIECE) per word and runs over the Heap's-law
  * bounded VOCABULARY frame, never the corpus — the corpus only ever
  * joins the finished (word → pieces) table.
  */
case class UnigramSegment(
    child: Expression, pieces: Seq[String], scores: Seq[Long])
    extends UnaryExpression {

  require(pieces.nonEmpty && pieces.length == scores.length,
    "unigram_segment needs parallel non-empty piece/score lists")

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.iterator.zip(scores.iterator).foreach { case (p, s) =>
      m.put(p, java.lang.Long.valueOf(s))
    }
    m
  }
  @transient private lazy val maxPieceLen: Int = pieces.map(_.length).max

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_segment"

  def compute(wordU: UTF8String): ArrayData = {
    val word = wordU.toString
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // best[i] = optimal suffix total from position i; len[i] = the
    // chosen piece length (ties -> longest piece, the oracle's
    // length-string DESC order)
    val best = new Array[Long](n + 1)
    val len = new Array[Int](n + 1)
    java.util.Arrays.fill(len, 0)
    var i = n - 1
    while (i >= 0) {
      var bestTotal = Long.MinValue
      var bestLen = 0
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        val sc = table.get(word.substring(i, i + l))
        if ((sc ne null) && len(i + l) != -1) {
          val total = sc.longValue + best(i + l)
          // >= : equal totals prefer the LARGER l (we scan upward)
          if (total >= bestTotal) { bestTotal = total; bestLen = l }
        }
        l += 1
      }
      if (bestLen == 0) { len(i) = -1; best(i) = Long.MinValue }
      else { len(i) = bestLen; best(i) = bestTotal }
      i -= 1
    }
    if (len(0) == -1) return null // unreachable under trainer closure
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = 0
    while (p < n) {
      val l = len(p)
      out += UTF8String.fromString(word.substring(p, p + l))
      p += l
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unigramSegment", this, classOf[UnigramSegment].getName)
    nullSafeCodeGen(ctx, ev, w => s"""
      |${ev.value} = $self.compute($w);
      |if (${ev.value} == null) { ${ev.isNull} = true; }
    """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}
