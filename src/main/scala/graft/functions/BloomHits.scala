package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType}

/** Per-row bloom-membership count in ONE native pass over a shingle
  * array — the streaming DECONTAMINATION gate ([[graft.streaming
  * .Streams.gateContaminated]]): count how many of the row's distinct
  * shingles hit the offline-built eval-set bloom filter. The batch
  * bloom path (`q_decontaminate_bloom`) explodes the corpus to
  * (doc, shingle) rows and probes `might_contain` relationally — right
  * for a corpus-wide join pipeline, but a streaming ingest gate wants
  * a stateless per-row map with no explode and no aggregation state.
  *
  * Probe-compatibility contract (the batch-twin gate pins it): each
  * non-null element hashes with Spark's builtin `xxhash64(string)`
  * (XXH64, seed 42 — exactly the `xxhash64(sv)` the batch SQL feeds
  * `bloom_agg`/`might_contain`) and probes
  * `BloomFilter.mightContainLong`, the same sketch class both builtins
  * wrap — so stream hits ≡ batch prefilter hits for the same bloom
  * bytes by construction. Bloom semantics are the bloom's: no false
  * negatives, FP rate per its sizing — the gate is a PREFILTER (the
  * r11 approx-sketch contract; exact confirmation stays a batch join).
  *
  * The bloom rides the expression as a reference object deserialized
  * once per (de)serialized instance; the constructor field is the
  * base64 STRING (structural equality — the PlaneSums Seq rule; a raw
  * Array[Byte] field would break canonicalization/CSE). */
case class BloomHits(child: Expression, bloomB64: String)
    extends UnaryExpression {

  require(bloomB64.nonEmpty, "bloom_hits: empty bloom filter literal")

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(
        java.util.Base64.getDecoder.decode(bloomB64)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hits"

  def compute(arr: ArrayData): Long = {
    var hits = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          arr.getUTF8String(i), StringType, 42L)
        if (bloom.mightContainLong(h)) hits += 1L
      }
      i += 1
    }
    hits
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomHits", this, classOf[BloomHits].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHits =
    copy(child = newChild)
}

/** Registration-time builder: second argument is a foldable BINARY (the
  * serialized bloom — typically `unbase64('...')` or a driver literal);
  * validated and re-encoded to the base64 constructor field. */
object BloomHits {
  def build(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"bloom_hits expects (shingles, bloom), got ${children.size} arguments")
    val b = children(1)
    if (!b.foldable || b.dataType != BinaryType)
      throw new IllegalArgumentException(
        "bloom_hits bloom must be a foldable BINARY literal, got " + b.sql)
    val bytes = b.eval().asInstanceOf[Array[Byte]]
    if (bytes == null || bytes.isEmpty)
      throw new IllegalArgumentException("bloom_hits bloom must be non-empty")
    BloomHits(children(0), java.util.Base64.getEncoder.encodeToString(bytes))
  }
}
