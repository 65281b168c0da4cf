package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Edge contract of the native `ivfadc_encode` loop (the streaming
  * IVFADC ingest): tie-break, builder sorting, short/null vectors —
  * the real-corpus equivalence is StreamingSpec's batch-twin gate. */
class IvfAdcEncodeSpec extends SparkSpec {

  private def enc(
      vec: Seq[java.lang.Float],
      cents: Seq[(Long, Seq[Float])],
      cb: Seq[(Int, Int, Seq[Float])]): (Long, Seq[Int]) = {
    graft.functions.GraftRuntime.ensure(spark)
    import spark.implicits._
    val r = Seq(Tuple1(vec)).toDF("embedding")
      .select(expr(Similarity.ivfadcEncodeSql("embedding", cents, cb)).as("e"))
      .select(col("e.cell"), col("e.codes")).head()
    (r.getLong(0), r.getSeq[Int](1))
  }

  private val cb1 = Seq((0, 0, Seq(1.0f, 0.0f)), (0, 1, Seq(0.0f, 1.0f)))

  test("duplicate centroids tie to the LOWEST cell id, not input order") {
    val c = Seq(0.5f, 0.5f)
    // passed deliberately unsorted: id 7 first, id 3 second — builder
    // sorts, so the tie must resolve to cell 3
    val (cell, _) = enc(Seq(1.0f, 1.0f).map(Float.box),
      Seq((7L, c), (3L, c)), cb1)
    assert(cell == 3L, s"tie must break to the lowest cell id, got $cell")
  }

  test("clear winner routes correctly and codes quantize the RESIDUAL") {
    val cents = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
    // v = (0.1, 0.9) -> cell 2; residual = (0.1, -0.1) -> nearest of
    // cb entries (1,0)/(0,1) by min L2 is... ||r-(1,0)||^2 = 0.81+0.01,
    // ||r-(0,1)||^2 = 0.01+1.21 -> code 0
    val (cell, codes) = enc(Seq(0.1f, 0.9f).map(Float.box), cents, cb1)
    assert(cell == 2L)
    assert(codes == Seq(0), s"residual quantization picked $codes")
  }

  test("short vectors and null elements follow the zip_with/dot_dec skip rules") {
    val cents = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(-1.0f, -1.0f)))
    // only element 0 present: dot against cell 1 = 0.5, cell 2 = -0.5
    val (cell, codes) = enc(Seq(Float.box(0.5f), null), cents, cb1)
    assert(cell == 1L)
    // residual = (float(0.5 - 1.0), null) — pq skips the null term:
    // scores 2·(-0.5·1) - 1 = -2 for code 0 vs 2·0 - 1 = -1 for code 1
    assert(codes == Seq(1), s"null-element residual quantization picked $codes")
  }

  test("builder rejects mismatched or duplicate cell arrays") {
    intercept[Exception] {
      enc(Seq(Float.box(1.0f)), Seq((1L, Seq(1.0f)), (1L, Seq(0.5f))), cb1)
    }
  }

  test("flat-routing contract: |C| above the batch pruning switch is rejected") {
    // r15 ADVICE: past PRUNE_SWITCH_C the batch assignment routes through
    // the SRP pruned candidate set, so the flat stream argmax would
    // silently diverge — both entry points must fail loudly instead
    val big = (0L until (Similarity.PRUNE_SWITCH_C + 1).toLong)
      .map(i => (i, Seq(i.toFloat, 1.0f)))
    val ex1 = intercept[IllegalArgumentException] {
      Similarity.ivfadcEncodeSql("embedding", big, cb1)
    }
    assert(ex1.getMessage.contains("PRUNE_SWITCH") || ex1.getMessage.contains("flat"))
    import spark.implicits._
    val vecs = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.streaming.Streams.encodeIvfadc(vecs, big, cb1)
    }
  }

  test("routing prefilter covers the real corpus; duplicate centroids force the fallback") {
    import graft.functions.IvfAdcEncode
    val dir = sf("sf0.01")
    val (cents, cb) = Similarity.ivfadcModel(spark, dir)
    val (f0, e0) = (IvfAdcEncode.fastRoutes.sum(), IvfAdcEncode.exactRoutes.sum())
    graft.streaming.Streams
      .encodeIvfadc(
        graft.io.Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding")),
        cents, cb)
      .write.format("noop").mode("overwrite").save()
    val (fast, exact) =
      (IvfAdcEncode.fastRoutes.sum() - f0, IvfAdcEncode.exactRoutes.sum() - e0)
    assert(fast + exact > 0)
    assert(fast.toDouble / (fast + exact) > 0.9,
      s"routing prefilter coverage too low: fast=$fast exact=$exact")
    info(s"routing prefilter: fast=$fast exact=$exact")
    // duplicate centroids score within any margin — must take the exact path
    val e1 = IvfAdcEncode.exactRoutes.sum()
    val c = Seq(0.5f, 0.5f)
    enc(Seq(1.0f, 1.0f).map(Float.box), Seq((7L, c), (3L, c)), cb1)
    assert(IvfAdcEncode.exactRoutes.sum() > e1, "duplicate centroids must force the exact path")
  }
}
