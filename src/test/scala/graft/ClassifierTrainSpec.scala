package graft

/** In-engine classifier training (`q_classifier_train`): the VERDICT r12
  * "done" criterion is that the TRAINED weights beat the FIXED
  * production weights on held-out labels. The query's own telemetry is
  * the evidence — round 0 scores the fixed w0, round 3 the trained
  * weights, both on the same content-hash 80/20 split — so the spec
  * reads the registered query (what ships) rather than re-deriving a
  * second training loop that could drift. */
class ClassifierTrainSpec extends SparkSpec {

  private lazy val rows = SparkEntry.queries("q_classifier_train")(spark, sf("sf0.01"))
    .collect()
    .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    .toMap

  test("telemetry covers rounds 0..3 with a positive error baseline") {
    assert(rows.keySet == Set(0, 1, 2, 3))
    val (te0, he0, _) = rows(0)
    // the fixed pseudo-random weights must actually misclassify some
    // docs on both splits, else "beats fixed" would be vacuous
    assert(te0 > 0 && he0 > 0, s"degenerate baseline: train_err=$te0 held_err=$he0")
  }

  test("trained weights beat the fixed weights on the held-out split") {
    val (te0, he0, _) = rows(0)
    val (te3, he3, _) = rows(3)
    assert(he3 < he0, s"held-out error did not improve: $he0 -> $he3")
    assert(te3 < te0, s"train error did not improve: $te0 -> $te3")
    info(s"held-out err $he0 -> $he3, train err $te0 -> $te3")
  }

  test("training moved the weights (L1 checksum changes round over round)") {
    val l1 = (0 to 3).map(r => rows(r)._3)
    assert(l1.distinct.size >= 2, s"weights never moved: $l1")
    assert(l1.forall(_ > 0))
  }

  test("sample-trained ≈ full-trained on the full held-out split (VERDICT r13 #2)") {
    // the registered trainer reads only the ClsTrainDocBudget=256
    // content-hash sample (over half the sf0.01 corpus — the truncation
    // path is exercised, not vacuous); training on EVERYTHING must not
    // be meaningfully better, or the bounded-cost claim would be a
    // quality trade. Evaluation is the full-corpus held split (the
    // deployment metric), not the sample-internal telemetry. Measured
    // (sf0.01): sample 0.040, full 0.051, fixed 0.333 — the tolerance
    // (3 percentage points) is ~6x the observed gap's noise floor.
    val dir = sf("sf0.01")
    import graft.queries.TextAnalysis
    val (wSample, _) = TextAnalysis.trainClassifier(spark, dir)
    val (wFull, _) = TextAnalysis.trainClassifier(spark, dir, Int.MaxValue)
    val eSample = TextAnalysis.heldErrorRate(spark, dir, wSample)
    val eFull = TextAnalysis.heldErrorRate(spark, dir, wFull)
    info(f"held-out error: sample-trained $eSample%.4f, full-trained $eFull%.4f")
    assert(eSample <= eFull + 0.03,
      f"bounded training lost too much: sample $eSample%.4f vs full $eFull%.4f")
    // and both must still beat the fixed production weights decisively
    val eFixed = TextAnalysis.heldErrorRate(spark, dir,
      Array.tabulate(4097)(b => (b.toLong * 2654435761L) % 2001L - 1000L))
    assert(eSample < eFixed / 2, f"sample-trained $eSample%.4f vs fixed $eFixed%.4f")
  }
}
