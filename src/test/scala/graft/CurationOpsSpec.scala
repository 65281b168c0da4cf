package graft

import org.apache.spark.sql.functions.col

/** Semantic properties of the round-17 curation operators — DSIR
  * importance weighting, DoReMi domain reweighting, margin-based bitext
  * mining. The DuckDB oracle proves cross-engine value identity; these
  * prove the operators MEAN what their papers mean, with the margin
  * math re-derived independently of the engine's window/aggregate
  * plumbing. */
class CurationOpsSpec extends SparkSpec {

  test("q_dsir_weights: target-slice docs score above the off-target mean") {
    // DSIR's defining behavior: documents resembling the target
    // distribution (here lang='en') get HIGHER importance weights than
    // off-target ones — if this inverts, the log-ratio is upside down.
    val rows = SparkEntry.queries("q_dsir_weights")(spark, sf())
      .select(col("lang"), col("weight")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    graft.io.CacheScope.releaseAll()
    val (en, other) = rows.partition(_._1 == "en")
    assert(en.nonEmpty && other.nonEmpty, "corpus must have both slices")
    val enMean = en.map(_._2).sum / en.length
    val otherMean = other.map(_._2).sum / other.length
    // the absolute level is corpus-dependent (Laplace smoothing pulls
    // every sum down by the singleton-gram mass) — the OPERATOR
    // guarantee is relative separation, and it should be wide: at
    // least one nat between the means (measured ~2.9 at sf0.001)
    assert(enMean > otherMean + 1.0,
      s"en mean $enMean must exceed off-target mean $otherMean by >= 1 nat")
  }

  test("q_doremi_weights: a simplex, floored by smoothing, monotone in excess") {
    val rows = SparkEntry.queries("q_doremi_weights")(spark, sf())
      .select(col("source"), col("excess"), col("alpha")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    graft.io.CacheScope.releaseAll()
    val k = rows.length
    assert(k >= 2, "need at least two domains")
    // simplex: each round renormalizes then mixes with the uniform, so
    // the final alphas sum to 1 up to the per-domain 1e-12 snaps
    val total = rows.map(_._3).sum
    assert(math.abs(total - 1.0) < k * 2e-12, s"alphas must sum to 1, got $total")
    // smoothing floor: alpha >= c/k with c = 0.01 (the last round mixes
    // c/k in unconditionally; anything below means the mix is broken)
    val floor = 0.01 / k
    assert(rows.forall(_._3 >= floor - 1e-12),
      s"every alpha must clear the smoothing floor $floor: " +
        rows.filter(_._3 < floor - 1e-12).take(3).mkString(", "))
    // monotone: all domains share one multiplicative-weights update, so
    // final alpha order == excess-loss order (ties allowed both sides)
    val byExcess = rows.sortBy(r => (r._2, r._1)).toSeq
    val alphas = byExcess.map(_._3)
    alphas.sliding(2).toSeq.zip(byExcess.sliding(2).toSeq).foreach {
      case (Seq(a1, a2), Seq(r1, r2)) =>
        if (r2._2 > r1._2 + 1e-15)
          assert(a2 >= a1,
            s"alpha must be monotone in excess: ${r1} then ${r2}")
      case _ =>
    }
    // the update must actually MOVE weight: uniform only if all excesses tie
    if (rows.map(_._2).distinct.length > 1)
      assert(alphas.last > alphas.head, "distinct excesses must separate alphas")
  }

  test("q_mine_bitext: margins re-derived from the candidate set match") {
    // Re-derive the forward/backward ranks, k-NN averages and margins
    // in plain Scala from the engine's own candidate frame (cells +
    // pinned-fold dots), independently of the window/aggregate
    // plumbing — then the emitted pair set must match exactly.
    val bits = graft.queries.Similarity.semBits(spark, sf())
    val assign = graft.queries.Similarity.semanticAssign(spark, sf(), bits)
      .select(col("vec_id"), col("embedding"), col("label"), col("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2), r.getInt(3)))
    val aSide = assign.filter(_._3 < 5)
    val bSide = assign.filter(_._3 >= 5)
    val bByCell = bSide.groupBy(_._4)
    def dotF(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    // candidates: hamming <= 1 cell probes, each pair found once
    val cand = for {
      (ida, ea, _, cellA) <- aSide.toSeq
      probe <- cellA +: (0 until bits).map(j => cellA ^ (1 << j))
      (idb, eb, _, _) <- bByCell.getOrElse(probe, Array.empty)
    } yield (ida, idb, dotF(ea, eb))
    assert(cand.nonEmpty)
    def snap9(v: Double): BigDecimal =
      BigDecimal(java.math.BigDecimal.valueOf(v).setScale(9, java.math.RoundingMode.HALF_UP))
    def topAvg(xs: Seq[(Long, Double)]): Map[Long, Double] =
      xs.groupBy(_._1).map { case (id, g) =>
        val top = g.map(_._2).sorted(Ordering[Double].reverse).take(4)
        // exact decimal sum -> double image -> ONE double division,
        // the engine's aggregation order
        id -> top.map(snap9).sum.toDouble / top.length
      }
    val avgA = topAvg(cand.map(c => (c._1, c._3)))
    val avgB = topAvg(cand.map(c => (c._2, c._3)))
    val fwd1 = cand.groupBy(_._1).map { case (_, g) =>
      g.minBy(c => (-c._3, c._2)) }.toSet
    val bwd1 = cand.groupBy(_._2).map { case (_, g) =>
      g.minBy(c => (-c._3, c._1)) }.toSet
    val expected = (fwd1 & bwd1).toSeq
      .map { case (ida, idb, dt) =>
        (ida, idb, dt / (0.5 * (avgA(ida) + avgB(idb)))) }
      .filter { case (ida, idb, m) => avgA(ida) + avgB(idb) > 0 && m > 1.05 }
      .map { case (ida, idb, m) => (ida, idb) }.toSet
    val got = SparkEntry.queries("q_mine_bitext")(spark, sf())
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.io.CacheScope.releaseAll()
    assert(got == expected,
      s"pair sets differ: engine-only ${(got -- expected).take(3)}, " +
        s"reference-only ${(expected -- got).take(3)}")
    assert(got.nonEmpty, "the corpus must yield mined pairs")
    // mutuality: top-1 both ways means each id appears at most once per side
    assert(got.toSeq.map(_._1).distinct.length == got.size, "id_a must be unique")
    assert(got.toSeq.map(_._2).distinct.length == got.size, "id_b must be unique")
  }
}
