package graft

import org.apache.spark.sql.functions._

import graft.queries.{Html, TextAnalysis}

/** Brute-force reference for the HTML extraction family: the derived
  * wrapper → tag-strip chain must reconstruct EXACTLY the title line,
  * nav line, e/p-broken paragraph lines and footer line of every doc
  * (string equality, all docs); the boilerplate table and the composed
  * pipeline must match a plain-Scala recomputation. */
class HtmlSpec extends SparkSpec {

  /** The expected extraction of one document, per the derivation's own
    * definition (title + nav + break-after-e/p paragraphs + footer). */
  private def expected(docId: Long, source: String, text: String): String = {
    val paragraphs = text.replaceAll("([a-z0-9]*[ep]) ", "$1\n")
    (s"doc & $docId" ::
      s"home about contact $source" ::
      paragraphs ::
      s"copyright 2024 $source all rights reserved" :: Nil).mkString("\n")
  }

  private def docs(): Seq[(Long, String, String, String)] =
    graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSeq

  test("extraction reconstructs title/nav/paragraphs/footer exactly, every doc") {
    val got = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"),
        expr(Html.extractSql(Html.htmlSql)).as("extracted"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ds = docs()
    assert(ds.nonEmpty && got.size == ds.size)
    for ((id, src, _, text) <- ds) {
      val exp = expected(id, src, text)
      assert(got(id) == exp,
        s"doc $id extraction mismatch:\n got=${got(id).take(200)}\n exp=${exp.take(200)}")
    }
  }

  test("boilerplate table == brute-force per-source line df at the threshold") {
    val exp = docs()
      .flatMap { case (id, src, _, text) =>
        expected(id, src, text).split("\n").toSeq.distinct.map(l => (src, l, id))
      }
      .groupBy { case (src, l, _) => (src, l) }
      .map { case ((src, l), rows) => (src, l, rows.map(_._3).distinct.size.toLong) }
      .filter(_._3 >= Html.BoilerMinDocs)
      .map { case (src, l, n) => (src, l, n) }
      .toSet
    val got = SparkEntry.queries("q_boilerplate_lines")(spark, sf())
      .collect().map(r => (r.getString(0), r.getString(2), r.getLong(3))).toSet
    assert(got == exp,
      s"missing=${(exp -- got).take(3)} extra=${(got -- exp).take(3)}")
    // the chrome is IN the table for every source with >= k docs, and
    // no per-doc title line ever is
    assert(exp.exists(_._2.startsWith("home about contact ")))
    assert(exp.exists(_._2.startsWith("copyright 2024 ")))
    assert(!got.exists(_._2.startsWith("doc & ")))
  }

  test("composed pipeline == brute force: de-chromed quality keeps per lang") {
    val boiler: Set[(String, String)] = docs()
      .flatMap { case (id, src, _, text) =>
        expected(id, src, text).split("\n").toSeq.distinct.map(l => (src, l, id))
      }
      .groupBy { case (src, l, _) => (src, l) }
      .toSeq // a pair-valued collect on the Map would re-collapse by key
      .collect { case ((src, l), rows)
          if rows.map(_._3).distinct.size >= Html.BoilerMinDocs => (src, l) }
      .toSet
    val stops = TextAnalysis.stopWords.toSet
    val exp = docs()
      .map { case (id, src, lang, text) =>
        val kept = expected(id, src, text).split("\n").toSeq
          .filterNot(l => boiler.contains((src, l)))
        val w = kept.mkString(" ").trim.split("\\s+").toSeq
        // brute-force twin of TextAnalysis.extQualitySql (round 20):
        // token floor + stopwords + symbol ratio + mean word length +
        // bullet/ellipsis line fractions over the \n-joined kept lines
        val qt = kept.mkString("\n")
        val symbols = "#|\\.{3}|…".r.findAllIn(qt).size
        val chars = qt.replaceAll("\\s+", "").length
        val nLines = qt.split("\n", -1).length
        val bullets = "(^|\n)[ \t]*[-*•]".r.findAllIn(qt).size
        val ellipses = "(\\.{3}|…)(\n|$)".r.findAllIn(qt).size
        val meanWl = chars.toDouble / w.size
        val ok = w.size >= 10 &&
          w.count(stops.contains).toDouble / w.size >= 0.01 &&
          symbols.toDouble / w.size <= TextAnalysis.SymbolRatioMax &&
          meanWl >= TextAnalysis.WordLenMin && meanWl <= TextAnalysis.WordLenMax &&
          bullets.toDouble / nLines <= TextAnalysis.BulletFracMax &&
          ellipses.toDouble / nLines <= TextAnalysis.EllipsisFracMax
        (lang, ok)
      }
      .groupBy(_._1)
      .map { case (lang, rows) =>
        (lang, rows.size.toLong, rows.count(_._2).toLong)
      }.toSet
    val got = SparkEntry.queries("q_html_pipeline")(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    graft.io.CacheScope.releaseAll()
    assert(got == exp, s"got=$got exp=$exp")
  }
}
