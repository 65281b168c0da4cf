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
/** The shared Viterbi DP core — ONE implementation behind both the
  * per-word `unigram_segment` and the per-doc `unigram_doc_stats`
  * expressions, so batch training and streaming encode can never
  * disagree on a segmentation. */
object UnigramDp {
  /** Chosen piece length at each start position (right-to-left DP,
    * ties toward the longer piece), or null when some character is
    * uncovered. Walk it from position 0 to reconstruct the pieces. */
  def pieceLens(
      word: String,
      table: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): Array[Int] = {
    val n = word.length
    val best = new Array[Long](n + 1)
    val len = new Array[Int](n + 1)
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
    if (n > 0 && len(0) == -1) null else len
  }

  def buildTable(
      pieces: Seq[String], scores: Seq[Long]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    pieces.iterator.zip(scores.iterator).foreach { case (p, s) =>
      m.put(p, java.lang.Long.valueOf(s))
    }
    m
  }
}

case class UnigramSegment(
    child: Expression, pieces: Seq[String], scores: Seq[Long])
    extends UnaryExpression {

  require(pieces.nonEmpty && pieces.length == scores.length,
    "unigram_segment needs parallel non-empty piece/score lists")

  @transient private lazy val table = UnigramDp.buildTable(pieces, scores)
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
    val len = UnigramDp.pieceLens(word, table, maxPieceLen)
    if (len == null) return null // uncovered char (trainer closure makes this unreachable)
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

/** Per-document unigram-LM encode statistics as ONE native loop — the
  * streaming encoder's hot path. `unigram_doc_stats(tokens)` lowers
  * each token, keeps the `^[a-z]+$` words (the q_unigram_encode
  * filter), Viterbi-segments each under the trained piece table
  * ([[UnigramDp]] — the SAME DP `unigram_segment` runs, so stream and
  * batch can never disagree) and returns
  * `struct<n_words, n_pieces, n_chars>`. A word with an uncovered
  * character contributes nothing (the batch inner join drops it the
  * same way — single-char coverage in the trainer makes this
  * unreachable for trained models). NULL input array → NULL; NULL
  * tokens are skipped. */
case class UnigramDocStats(
    child: Expression, pieces: Seq[String], scores: Seq[Long])
    extends UnaryExpression {

  require(pieces.nonEmpty && pieces.length == scores.length,
    "unigram_doc_stats needs parallel non-empty piece/score lists")

  @transient private lazy val table = UnigramDp.buildTable(pieces, scores)
  @transient private lazy val maxPieceLen: Int = pieces.map(_.length).max

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> of tokens, got ${other.simpleString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "n_words", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "n_pieces", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(
        "n_chars", org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "unigram_doc_stats"

  private def isAlpha(s: String): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 'a' || c > 'z') return false
      i += 1
    }
    true
  }

  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    var nWords = 0L; var nPieces = 0L; var nChars = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString.toLowerCase(java.util.Locale.ROOT)
        if (isAlpha(w)) {
          val lens = UnigramDp.pieceLens(w, table, maxPieceLen)
          if (lens != null) {
            nWords += 1
            nChars += w.length
            var p = 0
            while (p < w.length) { nPieces += 1; p += lens(p) }
          }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, nPieces, nChars))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("unigramDocStats", this, classOf[UnigramDocStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramDocStats =
    copy(child = newChild)
}
