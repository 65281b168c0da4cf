package graft

import org.apache.spark.unsafe.types.UTF8String

/** Theorems behind the unigram-LM tokenizer (`q_unigram_lm_train` /
  * `q_unigram_encode`): the native Viterbi DP must pick exactly the
  * segmentation the oracle's brute-force enumeration picks under
  * (total DESC, length-string DESC) — including the tie geometry — and
  * must behave on the degenerate inputs. */
class UnigramSpec extends SparkSpec {

  private def seg(word: String, model: Seq[(String, Long)]): Seq[String] = {
    val e = graft.functions.UnigramSegment(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(word),
        org.apache.spark.sql.types.StringType),
      model.map(_._1), model.map(_._2))
    val r = e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    if (r == null) null
    else {
      val ad = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
    }
  }

  /** Oracle semantics: enumerate EVERY segmentation, order by
    * (total DESC, length-string DESC), take the first. */
  private def brute(word: String, model: Map[String, Long]): Option[(Seq[String], Long)] = {
    def all(pos: Int): Seq[List[String]] =
      if (pos == word.length) Seq(Nil)
      else (1 to math.min(4, word.length - pos)).flatMap { l =>
        val p = word.substring(pos, pos + l)
        if (model.contains(p)) all(pos + l).map(p :: _) else Nil
      }
    val cands = all(0).map { pcs =>
      (pcs, pcs.map(model).sum, pcs.map(p => ('0' + p.length).toChar).mkString)
    }
    if (cands.isEmpty) None
    else {
      val best = cands.maxBy { case (_, t, lens) => (t, lens) } // lens lexicographic DESC via max
      Some((best._1, best._2))
    }
  }

  test("DP equals brute-force enumeration on random models (tie geometry included)") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    for (trial <- 0 until 300) {
      val word = (0 until (1 + rnd.nextInt(8))).map(_ => alphabet(rnd.nextInt(3))).mkString
      // pieces: all single chars + random multi-char substrings; COARSE
      // random scores so exact total ties actually occur and exercise
      // the longer-piece-first tie-break
      val multis = (0 until 6).map { _ =>
        val i = rnd.nextInt(word.length)
        val l = 2 + rnd.nextInt(3)
        word.substring(i, math.min(word.length, i + l))
      }.filter(_.length >= 2)
      val pieces = (alphabet.map(_.toString) ++ multis).distinct
      val model = pieces.map(p => p -> (-(1 + rnd.nextInt(4)).toLong * 1000000L)).toMap
      val got = seg(word, model.toSeq)
      val expect = brute(word, model)
      assert(expect.isDefined, s"single chars guarantee coverage: $word")
      assert(got == expect.get._1,
        s"trial $trial word '$word' model $model: DP $got vs brute ${expect.get._1}")
      assert(got.mkString == word, "pieces must concatenate to the word")
    }
  }

  test("degenerate inputs: empty word, uncovered character, single piece") {
    assert(seg("", Seq("a" -> -1L)) == Seq.empty)
    assert(seg("ab", Seq("a" -> -1L)) == null, "uncovered char must yield NULL")
    assert(seg("abab", Seq("abab" -> -2L, "a" -> -1L, "b" -> -1L)) == Seq("abab"),
      "one whole-word piece (total -2) must beat the char split (total -4)")
    assert(seg("abab", Seq("abab" -> -10L, "a" -> -1L, "b" -> -1L)) ==
      Seq("a", "b", "a", "b"),
      "the char split (total -4) must beat a worse whole-word piece (-10)")
  }

  test("coverage floor: every corpus word segments under the trained table") {
    val enc = SparkEntry.queries("q_unigram_encode")(spark, sf())
    val rows = enc.collect()
    graft.io.CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        "pieces per doc can never be fewer than words")
      assert(r.getLong(3) >= r.getLong(2),
        "pieces per doc can never exceed characters")
    }
  }
}
