package graft

import org.apache.spark.sql.functions._

/** The newline-aware line segmenter behind q_dedup_lines_nl
  * (VERDICT r16 #2): segmentation must exactly cover the token stream
  * — disjoint, order-preserving, nothing lost or invented — for BOTH
  * arms (newline split and the fixed-width newline-free fallback). */
class LineSegmentSpec extends SparkSpec {

  test("nlLineFrame covers the token stream exactly (disjoint, ordered, both arms)") {
    val docs = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val seg = graft.queries.Dedup.nlLineFrame(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(seg.length == docs.size)
    var sawNewline = false
    var sawFallback = false
    seg.foreach { case (id, lines) =>
      // coverage: concatenating the lines' tokens reproduces the doc's
      // token stream exactly — segments are disjoint, ordered, lossless
      assert(lines.flatMap(_.split(" ").toSeq) == docs(id),
        s"doc $id: segmentation must cover the token stream in order")
      assert(lines.forall(_.nonEmpty), s"doc $id: no empty lines")
      if (id % 7 == 0) {
        sawFallback = true
        // the newline-free fallback regroups into LINE_W-token segments
        // (only the last may be shorter)
        assert(lines.dropRight(1).forall(_.split(" ").length == 10),
          s"doc $id: fallback lines must be 10 tokens wide")
      } else sawNewline = true
    }
    assert(sawNewline && sawFallback, "both segmenter arms must be exercised")
    // the newline arm must produce genuinely variable-length lines
    val widths = seg.filter(_._1 % 7 != 0)
      .flatMap(_._2.map(_.split(" ").length)).distinct
    assert(widths.size >= 3, s"variable-length lines expected, got widths $widths")
  }

  test("paraFrame covers the token stream exactly (disjoint, ordered, both arms)") {
    // round 19 (VERDICT r18 #4): the blank-line paragraph segmenter —
    // same coverage theorem as the line segmenter, plus: paragraphs on
    // the blank-line arm genuinely contain INTERNAL newlines (the
    // crawl-text shape the fixture exists to model)
    val docs = graft.io.Tables(spark, sf(), "documents")
      .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val seg = graft.queries.Dedup.paraFrame(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(seg.length == docs.size)
    var sawBlankLine = false
    var sawFallback = false
    var sawInternalNewline = false
    seg.foreach { case (id, paras) =>
      assert(paras.flatMap(_.split("\\s+").toSeq) == docs(id),
        s"doc $id: segmentation must cover the token stream in order")
      assert(paras.forall(_.nonEmpty), s"doc $id: no empty paragraphs")
      if (id % 7 == 0) {
        sawFallback = true
        assert(paras.dropRight(1).forall(_.split("\\s+").length == 30),
          s"doc $id: fallback paragraphs must be 30 tokens wide")
        assert(paras.forall(!_.contains("\n")),
          s"doc $id: the fallback arm joins with spaces, never newlines")
      } else {
        sawBlankLine = true
        assert(paras.forall(!_.contains("\n\n")),
          s"doc $id: a paragraph must not contain a blank-line boundary")
        if (paras.exists(_.contains("\n"))) sawInternalNewline = true
      }
    }
    assert(sawBlankLine && sawFallback, "both segmenter arms must be exercised")
    assert(sawInternalNewline,
      "blank-line-arm paragraphs must carry internal single newlines")
    // genuinely variable-length paragraphs on the blank-line arm
    val widths = seg.filter(_._1 % 7 != 0)
      .flatMap(_._2.map(_.split("\\s+").length)).distinct
    assert(widths.size >= 3, s"variable-length paragraphs expected, got widths $widths")
  }
}
