package graft

import org.apache.spark.sql.functions._

/** Cross-query consistency of the substring-fingerprint family
  * (q_dedup_substring / q_dedup_spans / q_text_dup_fraction): all three
  * derive from the same window fingerprints, so their outputs must
  * agree with each other — a property the per-query oracles can't see
  * because each checks one query in isolation. */
class SubstringDedupSpec extends SparkSpec {

  private def rows(q: String) = SparkEntry.queries(q)(spark, sf("sf0.01")).collect()

  test("every substring-dup pair end has at least one flagged span and a nonzero dup fraction") {
    val pairDocs = rows("q_dedup_substring")
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pairDocs.nonEmpty, "corpus must contain substring dups")
    val spanDocs = rows("q_dedup_spans").map(_.getLong(0)).toSet
    // pairs come from kept (df <= 8) windows; spans flag df >= 2 with no
    // upper cap, so span docs are a superset of pair-end docs
    assert(pairDocs.subsetOf(spanDocs),
      s"pair ends without flagged spans: ${pairDocs -- spanDocs}")
    val fracByDoc = rows("q_text_dup_fraction")
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    pairDocs.foreach { d =>
      assert(fracByDoc.get(d).exists(_ > 0), s"doc $d in a dup pair but dup_frac == 0")
    }
  }

  test("span extents agree with the pair query: same pairs, spans >= one window") {
    val pairs = rows("q_dedup_substring")
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val extents = rows("q_dedup_span_extent")
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // both derive candidates from the same kept-window inverted index
    assert(extents.keySet == pairs.keySet, "pair sets must be identical")
    extents.foreach { case (p, (span, nMatches)) =>
      assert(span >= 30, s"$p: a shared window is at least W tokens")
      // matches count positions; the pair query counts distinct fps
      assert(nMatches >= pairs(p), s"$p: matches can't be fewer than shared fps")
    }
  }

  test("span removal cuts exactly the flagged docs, and only whole windows") {
    val flagged = rows("q_dedup_spans").map(_.getLong(0)).toSet
    val rem = rows("q_dedup_span_removal")
    assert(rem.length == 500)
    rem.foreach { r =>
      val (doc, before, after) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (flagged(doc)) assert(after < before, s"doc $doc flagged but uncut")
      else assert(after == before, s"doc $doc unflagged but cut")
    }
  }

  test("dup fractions are well-formed and within-doc repetition alone never flags") {
    val fr = rows("q_text_dup_fraction")
    assert(fr.nonEmpty)
    fr.foreach { r =>
      val (n, dup, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(dup <= n && frac >= 0.0 && frac <= 1.0)
      assert(math.abs(frac - dup.toDouble / n) < 1e-15)
    }
  }

  test("q_dedup_substring_exact equals brute-force maximal duplicated spans (stride-1 theorem)") {
    // the exactness claim (VERDICT r16 #3): a maximal cross-doc
    // duplicated span of length L >= 30 is exactly a maximal run of
    // consecutive flagged stride-1 window starts. Brute force here
    // works on the RAW token strings (no hashes), so this also proves
    // the 60-bit fingerprints collide nowhere on the corpus.
    val docs = graft.io.Tables(spark, sf("sf0.01"), "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val occ = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - 30)
      occ.getOrElseUpdate(w.slice(i, i + 30).mkString(" "),
        scala.collection.mutable.Set.empty[Long]) += id
    val brute = (for ((id, w) <- docs) yield {
      val flaggedIdx = (0 to w.length - 30)
        .filter(i => occ(w.slice(i, i + 30).mkString(" ")).size >= 2)
      // merge consecutive runs into maximal spans (1-based starts)
      val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
      var k = 0
      while (k < flaggedIdx.length) {
        var j = k
        while (j + 1 < flaggedIdx.length && flaggedIdx(j + 1) == flaggedIdx(j) + 1) j += 1
        val n = (j - k + 1).toLong
        spans += ((id, flaggedIdx(k).toLong + 1, n + 29, n))
        k = j + 1
      }
      spans.toList
    }).flatten.toSet
    val got = rows("q_dedup_substring_exact")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(brute.nonEmpty, "corpus must contain duplicated spans")
    assert(got == brute,
      s"missing ${(brute -- got).take(3)}, spurious ${(got -- brute).take(3)}")
    // and the stride-10 approximation's flags are a SUBSET: every
    // stride-aligned flagged window start lies inside an exact span
    val byDoc = got.groupBy(_._1)
    rows("q_dedup_spans").foreach { r =>
      val (d, s10) = (r.getLong(0), r.getLong(1))
      assert(byDoc.getOrElse(d, Set.empty).exists(sp => s10 >= sp._2 && s10 + 29 < sp._2 + sp._3),
        s"stride-10 flag ($d, $s10) outside every exact span")
    }
  }
}
