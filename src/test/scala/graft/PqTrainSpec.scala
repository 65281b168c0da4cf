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
    // round 16: depth is CONVERGENCE-DERIVED (first round with
    // moved·10 < sample assignments, max-rounds guard 4) — so the
    // trajectory length is a property of the corpus, not a constant
    assert(rows.length >= 3 && rows.length <= 5,
      s"seed round + 2..4 convergence-derived Lloyd rounds, got ${rows.length}")
    val d2 = rows.map(_.getDouble(1))
    d2.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"sample distortion must strictly decrease: ${d2.toSeq}")
    }
    assert(rows(0).isNullAt(2), "seed round has no moved count")
    val moved = rows.drop(1).map(_.getLong(2))
    moved.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, s"code churn must shrink as Lloyd converges: ${moved.toSeq}")
    }
    // the convergence rule itself: every executed round except the last
    // was unconverged (moved·10 >= sample assignments); the last is
    // converged or hit the max-rounds guard
    val assigns = graft.queries.Similarity.pqTrainN(spark, dir).toLong * 8
    moved.dropRight(1).foreach(m =>
      assert(m * 10 >= assigns, s"an unconverged round must precede every later round: " +
        s"moved=${moved.toSeq}, n=$assigns"))
    assert(moved.last * 10 < assigns || moved.length == 4,
      s"the last round must be converged or the guard: moved=${moved.toSeq}, n=$assigns")
    info(s"depth ${moved.length}; sample_d2 ${d2.map(v => f"$v%.1f").mkString(" -> ")}; " +
      s"moved ${moved.mkString(" -> ")}")
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
