package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Residual IVFADC (round 15): product-quantizing the residual
  * x − c(cell(x)) under the TRAINED coarse quantizer must beat the raw
  * trained-PQ geometry at equal M·K code budget — and the spec also
  * pins the measurement that DECIDED the design: under the r15
  * HASH-SEEDED centroids the residuals carry MORE energy than the raw
  * unit-norm vectors (so q_ann_ivfpq correctly quantizes raw vectors),
  * while under the Lloyd-trained quantizer they carry less (so
  * q_ann_ivfadc correctly quantizes residuals). */
class PqResidualSpec extends SparkSpec {

  private def dir = sf("sf0.01")

  private def meanSq(vecs: DataFrame): Double =
    vecs.select(expr(
        "aggregate(embedding, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")
        .as("sq"))
      .agg(avg(col("sq"))).head().getDouble(0)

  test("q_pq_residual_gain: residual codes beat raw codes in every subspace at equal budget") {
    val rows = SparkEntry.queries("q_pq_residual_gain")(spark, dir).collect()
    assert(rows.length == 8, "expected one row per subspace")
    for (r <- rows) {
      val (m, raw, res, gain) =
        (r.getInt(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(res < raw,
        f"subspace $m: residual mean_d2 $res%.5f not below raw $raw%.5f")
      assert(gain > 1.0, f"subspace $m: gain $gain%.3f")
    }
    val gains = rows.map(_.getDouble(4))
    info(f"residual gain per subspace: min ${gains.min}%.2fx, max ${gains.max}%.2fx")
  }

  test("residual energy: below raw under the trained quantizer, above raw under hash seeds") {
    val e = io.Tables(spark, dir, "embeddings")
    val raw = meanSq(e.select(col("vec_id"), col("embedding")))

    val trained = Similarity.adcCents(spark, dir)
    val resTrained = meanSq(
      Similarity.adcResiduals(Similarity.kmAssign(spark, dir, trained), trained))

    // the r15 hash-seeded IVF centroids (the q_ann_ivf/ivfpq routing)
    val n = io.Tables.rowCount(spark, dir, "embeddings")
    val seeds = e
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"),
        expr(functions.CrossHash.h("concat('c#', cast(vec_id as string))")).as("ch"))
      .orderBy(col("ch"), col("cell")).limit(Similarity.ncIvf(n))
      .select(col("cell"), col("c_emb"))
    val resHash = meanSq(
      Similarity.adcResiduals(Similarity.kmAssign(spark, dir, seeds), seeds))

    info(f"mean ||x||^2 $raw%.3f; ||x - c||^2 trained $resTrained%.3f, hash-seeded $resHash%.3f")
    assert(resTrained < raw,
      f"trained-quantizer residuals must carry less energy: $resTrained%.3f vs $raw%.3f")
    assert(resHash > raw,
      f"hash-seed residuals carry MORE energy on this corpus (why ivfpq stays raw): $resHash%.3f vs $raw%.3f")
  }

  test("q_ann_ivfadc: adc approximates the true dot (offset + residual codes)") {
    // the cell-centroid offset is carried in the score precisely so
    // adc is an estimate of q·x, not just a within-cell ranking value —
    // pin that the approximation error is small relative to the score
    // spread (a dropped offset or a subspace misalignment would blow
    // this up immediately)
    val rows = SparkEntry.queries("q_ann_ivfadc")(spark, dir)
      .select(col("adc"), col("exact_dot")).collect()
    assert(rows.nonEmpty)
    val errs = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    val spread = {
      val ds = rows.map(_.getDouble(1))
      ds.max - ds.min max 1e-9
    }
    assert(errs.max < 0.5, f"max |adc - exact| ${errs.max}%.3f")
    info(f"mean |adc - exact| ${errs.sum / errs.length}%.4f over ${rows.length} rows (exact spread $spread%.3f)")
  }
}
