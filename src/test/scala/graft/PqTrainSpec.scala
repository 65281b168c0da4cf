package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trained PQ codebooks (VERDICT r13 #4): per-subspace Lloyd over a
  * bounded content-hash sample must beat the r13 hash-seeded
  * training-free codebooks on BOTH axes the verdict named —
  * reconstruction distortion (q_pq_distortion's own `gain` column) and
  * ANN recall at equal code budget (identical M/K/ADC, only the
  * codebook + encode differ). */
class PqTrainSpec extends SparkSpec {

  private def dir = sf("sf0.01")

  test("q_pq_distortion: trained codebook strictly below the hash baseline in every subspace") {
    val rows = SparkEntry.queries("q_pq_distortion")(spark, dir).collect()
    assert(rows.length == 8, "expected one row per subspace")
    for (r <- rows) {
      val (m, mean, hash, gain) =
        (r.getInt(0), r.getDouble(2), r.getDouble(4), r.getDouble(5))
      assert(mean < hash,
        f"subspace $m: trained mean_d2 $mean%.5f not below hash baseline $hash%.5f")
      assert(gain > 1.0, f"subspace $m: gain $gain%.3f")
    }
    val gains = rows.map(_.getDouble(5))
    info(f"distortion gain per subspace: min ${gains.min}%.2fx, max ${gains.max}%.2fx")
  }

  test("q_pq_train: sample distortion decreases every Lloyd round; moves shrink") {
    // Lloyd is monotone non-increasing on its training objective
    // (assignment and mean-update each only reduce the sample's total
    // squared error, modulo the float narrowing of the means) — a
    // round that INCREASES distortion means the assignment rule and
    // the update rule disagree about the metric
    val rows = SparkEntry.queries("q_pq_train")(spark, dir)
      .orderBy(col("round")).collect()
    assert(rows.length == 3, "seed round + 2 Lloyd rounds")
    val d2 = rows.map(_.getDouble(1))
    assert(d2(1) < d2(0) && d2(2) < d2(1),
      s"sample distortion must strictly decrease: ${d2.toSeq}")
    assert(rows(0).isNullAt(2), "seed round has no moved count")
    val moved = rows.drop(1).map(_.getLong(2))
    assert(moved(1) < moved(0), s"code churn must shrink as Lloyd converges: ${moved.toSeq}")
    info(f"sample_d2 ${d2(0)}%.1f -> ${d2(1)}%.1f -> ${d2(2)}%.1f; moved ${moved(0)} -> ${moved(1)}")
  }

  test("trained ADC recall@3 >= seed-codebook recall@3 at equal code budget") {
    import graft.queries.Similarity
    def recallOf(top: DataFrame, exact: DataFrame): Double = {
      val hit = top.select(col("query_id"), col("cand_id"))
        .join(exact, Seq("query_id", "cand_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      val r = exact.select(col("query_id")).distinct()
        .join(hit, Seq("query_id"), "left")
        .agg(sum(coalesce(col("h"), lit(0L))).cast("long").as("hits"),
          count(lit(1)).as("q")).head()
      r.getLong(0).toDouble / (3.0 * r.getLong(1))
    }
    val exact = Similarity.pqExactTop3(spark, dir).persist()
    val trained = recallOf(Similarity.pqAdcTopTrained(spark, dir), exact)
    val seed = recallOf(Similarity.pqAdcTopSeedBaseline(spark, dir), exact)
    exact.unpersist()
    info(f"ADC recall@3: trained $trained%.4f vs seed baseline $seed%.4f")
    assert(trained >= seed,
      f"training must not lose recall at equal code budget: $trained%.4f < $seed%.4f")
    assert(trained > 0.0, "degenerate: zero recall")
  }
}
