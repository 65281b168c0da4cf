package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Unit contract of the native `bloom_hits` loop (the streaming
  * decontamination gate): per-element xxhash64(seed 42) probes of a
  * serialized sketch bloom — membership, null/empty edges, builder
  * validation. The real-corpus prefilter equivalence is StreamingSpec's
  * gateContaminated batch-twin gate. */
class BloomHitsSpec extends SparkSpec {

  private def xx(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      UTF8String.fromString(s), StringType, 42L)

  private def bloomOf(items: Seq[String]): Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.001)
    items.foreach(s => bf.putLong(xx(s)))
    val baos = new java.io.ByteArrayOutputStream()
    bf.writeTo(baos)
    baos.toByteArray
  }

  private def hits(arr: Seq[java.lang.String], bloom: Array[Byte]): Long = {
    graft.functions.GraftRuntime.ensure(spark)
    import spark.implicits._
    val b64 = java.util.Base64.getEncoder.encodeToString(bloom)
    Seq(Tuple1(arr)).toDF("a")
      .select(expr(s"bloom_hits(a, unbase64('$b64'))")).head().getLong(0)
  }

  test("counts exactly the inserted members; skips nulls; empty array is 0") {
    val bloom = bloomOf(Seq("alpha beta", "gamma delta"))
    assert(hits(Seq("alpha beta", "gamma delta", "no such shingle xyzzy"), bloom) == 2L)
    assert(hits(Seq(null, "alpha beta", null), bloom) == 1L)
    assert(hits(Seq.empty, bloom) == 0L)
  }

  test("no false negatives: every inserted item always hits") {
    val items = (1 to 200).map(i => s"shingle number $i of the eval suite")
    val bloom = bloomOf(items)
    assert(hits(items.map(s => s: java.lang.String), bloom) == items.size.toLong)
  }

  test("builder rejects a non-binary or non-foldable bloom argument") {
    graft.functions.GraftRuntime.ensure(spark)
    import spark.implicits._
    val df = Seq(Tuple1(Seq("x"))).toDF("a")
    intercept[Exception](df.select(expr("bloom_hits(a, 'not binary')")).head())
    intercept[Exception](df.select(expr("bloom_hits(a, cast(a[0] as binary))")).head())
  }
}
