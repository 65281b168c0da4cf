package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.multimodal.Media

/** Query-surface entries for the multimodal plumbing. `q_media_meta`
  * exercises the binary-column schema end-to-end in pure SQL (oracle-
  * checked). `q_media_features` is a REAL decode for images AND audio:
  * payloads are genuine JDK-encoded PNGs/WAVs whose pixels/samples are
  * a known function of the id, the query decodes them back via
  * ImageIO / AudioSystem and histograms the result, and the DuckDB
  * oracle reproduces both histograms analytically — an
  * encode→decode→aggregate round-trip under the hash gate. The resize/
  * frame queries exercise the stub (video) path. */
object Multimodal {

  val queries: Seq[Q] = Seq(

    Q(
      "q_media_meta",
      """SELECT kind, count(*) AS cnt, CAST(sum(byte_len) AS BIGINT) AS sum_bytes,
        |  min(byte_len) AS min_bytes, max(byte_len) AS max_bytes
        |FROM (SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
        |      FROM documents)
        |GROUP BY kind""") { (s, dir) =>
      Tables(s, dir, "documents")
        .select(
          expr("CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END").as("kind"),
          expr("cast(octet_length(cast(text as binary)) as bigint)").as("byte_len"))
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("byte_len")).as("sum_bytes"),
          min(col("byte_len")).as("min_bytes"),
          max(col("byte_len")).as("max_bytes"))
    },

    // Real image AND audio decode under the hash gate: synthesize PNGs
    // with pixel(x,y) = (id*7 + y*8 + x) % 256 and WAVs with
    // sample(i) = (id*11 + i) % 256, decode via ImageIO / AudioSystem,
    // histogram into 16 bins; the oracle computes both distributions
    // analytically from the formulas. Bins that decode to zero
    // pixels/samples are filtered so both sides emit the same row set.
    Q(
      "q_media_features",
      """SELECT kind, bin, count(*) AS total FROM (
        |  SELECT 'image' AS kind, CAST(((d.doc_id * 7 + p.i) % 256) // 16 AS INT) AS bin
        |  FROM documents d CROSS JOIN generate_series(0, 63) p(i) WHERE d.doc_id % 3 = 0
        |  UNION ALL
        |  SELECT 'audio' AS kind, CAST(((d.doc_id * 11 + p.i) % 256) // 16 AS INT) AS bin
        |  FROM documents d CROSS JOIN generate_series(0, 63) p(i) WHERE d.doc_id % 3 = 1
        |) GROUP BY kind, bin""") { (s, dir) =>
      Media.extractFeatures(Media.synthesize(s, dir).filter(col("kind") =!= "video"))
        .select(col("kind"), posexplode(col("histogram")).as(Seq("bin", "cnt")))
        .groupBy(col("kind"), col("bin"))
        .agg(sum(col("cnt")).as("total"))
        .filter(col("total") > 0)
    },

    // Resize contract under the hash gate (video, whose payload is the
    // UTF-8 text bytes): the byte budget (w*h cap) and the stub
    // decoder's byte histogram are both reproduced analytically by the
    // oracle — the corpus is pure ASCII (TESTDATA), so byte offsets equal
    // char offsets and bins 2/6 are the regex classes [ -/] and [`a-o].
    // Image/audio payloads are PNG/WAV containers (not SQL-
    // reproducible); their resize fallback is covered by MediaSpec.
    Q(
      "q_media_resize",
      """SELECT 'video' AS kind, count(*) AS cnt,
        |  CAST(max(least(len, 1024)) AS BIGINT) AS max_bytes,
        |  CAST(sum(least(len, 1024)) AS BIGINT) AS sum_bytes,
        |  CAST(sum(len(regexp_extract_all(p, '[ -/]'))) AS BIGINT) AS hist_bin2,
        |  CAST(sum(len(regexp_extract_all(p, '[`a-o]'))) AS BIGINT) AS hist_bin6
        |FROM (SELECT substring(text, 1, 1024) AS p, octet_length(encode(text)) AS len
        |      FROM documents WHERE doc_id % 3 = 2)
        |GROUP BY 1""") { (s, dir) =>
      Media.extractFeatures(
        Media.resize(Media.synthesize(s, dir).filter(col("kind") === "video"), 32, 32))
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("cnt"),
          max(col("byte_len")).as("max_bytes"), // capped at 32*32
          sum(col("byte_len")).as("sum_bytes"),
          sum(expr("histogram[2]")).as("hist_bin2"),
          sum(expr("histogram[6]")).as("hist_bin6"))
    },

    // Frame sampling under the hash gate: n evenly-spaced 16-byte windows
    // per record; for video the payload is the text's UTF-8 bytes, so
    // the oracle re-derives every window offset and its bytes with
    // substring arithmetic (ASCII corpus: char index == byte index).
    Q(
      "q_media_frames",
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS len
        |  FROM documents WHERE doc_id % 3 = 2
        |), fr AS (
        |  SELECT media_id,
        |    substring(text, CAST(f.f * greatest(0, len - 16) // 3 AS BIGINT) + 1, 16) AS frame
        |  FROM m CROSS JOIN generate_series(0, 3) f(f)
        |)
        |SELECT media_id, count(*) AS n_frames,
        |  CAST(sum(octet_length(encode(frame))) AS BIGINT) AS sum_frame_bytes,
        |  CAST(count(DISTINCT frame) AS BIGINT) AS distinct_frames
        |FROM fr GROUP BY media_id""") { (s, dir) =>
      Media.frameSample(Media.synthesize(s, dir).filter(col("kind") === "video"), 4)
        .groupBy(col("media_id"))
        .agg(
          count(lit(1)).as("n_frames"),
          sum(expr("octet_length(frame_bytes)")).cast("long").as("sum_frame_bytes"),
          countDistinct(hex(col("frame_bytes"))).as("distinct_frames"))
    })
}
