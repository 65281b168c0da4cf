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
}
