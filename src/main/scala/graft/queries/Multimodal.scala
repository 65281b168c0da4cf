package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.multimodal.Media

/** Query-surface entries for the multimodal plumbing. `q_media_meta`
  * exercises the binary-column schema end-to-end in pure SQL (oracle-
  * checked). `q_media_features` is a REAL decode for all three kinds:
  * payloads are genuine JDK-encoded PNGs/WAVs/frame-containers whose
  * pixels/samples are a known function of the id, the query decodes
  * them back via ImageIO / AudioSystem / container-parse and histograms
  * the result, and the DuckDB oracle reproduces every histogram
  * analytically — encode→decode→aggregate round-trips under the hash
  * gate. `q_media_resize` decodes, resamples and re-encodes for real;
  * `q_media_frames` extracts and decodes real container frames. */
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

    // Real image, audio AND video decode under the hash gate:
    // synthesize PNGs with pixel(x,y) = (id*7 + y*8 + x) % 256, WAVs
    // with sample(i) = (id*11 + i) % 256, and frame containers whose
    // frame f has pixel k = (id*7 + f*13 + k) % 256; decode via
    // ImageIO / AudioSystem / container-parse+ImageIO, histogram into
    // 16 bins; the oracle computes all three distributions analytically
    // from the formulas. Bins that decode to zero pixels/samples are
    // filtered so both sides emit the same row set.
    Q(
      "q_media_features",
      """SELECT kind, bin, count(*) AS total FROM (
        |  SELECT 'image' AS kind, CAST(((d.doc_id * 7 + p.i) % 256) // 16 AS INT) AS bin
        |  FROM documents d CROSS JOIN generate_series(0, 63) p(i) WHERE d.doc_id % 3 = 0
        |  UNION ALL
        |  SELECT 'audio' AS kind, CAST(((d.doc_id * 11 + p.i) % 256) // 16 AS INT) AS bin
        |  FROM documents d CROSS JOIN generate_series(0, 63) p(i) WHERE d.doc_id % 3 = 1
        |  UNION ALL
        |  SELECT 'video' AS kind, CAST(((d.doc_id * 7 + f.f * 13 + p.i) % 256) // 16 AS INT) AS bin
        |  FROM documents d CROSS JOIN generate_series(0, 3) f(f)
        |                   CROSS JOIN generate_series(0, 63) p(i) WHERE d.doc_id % 3 = 2
        |) GROUP BY kind, bin""") { (s, dir) =>
      Media.extractFeatures(Media.synthesize(s, dir))
        .select(col("kind"), posexplode(col("histogram")).as(Seq("bin", "cnt")))
        .groupBy(col("kind"), col("bin"))
        .agg(sum(col("cnt")).as("total"))
        .filter(col("total") > 0)
    },

    // REAL resize under the hash gate: images and video frames decode,
    // nearest-neighbor resample 8x8 -> 4x4 (out(x,y) = in(2x, 2y),
    // exact integer index math — no interpolation), re-encode, then the
    // feature decode histograms the RESIZED pixels; the oracle
    // reproduces the resampled distributions analytically from the
    // pixel formulas. Audio (a visual no-op) keeps the byte-budget
    // truncation fallback, covered by MediaSpec.
    Q(
      "q_media_resize",
      """SELECT kind, bin, count(*) AS total FROM (
        |  SELECT 'image' AS kind,
        |    CAST(((d.doc_id * 7 + (p.i // 4) * 16 + (p.i % 4) * 2) % 256) // 16 AS INT) AS bin
        |  FROM documents d CROSS JOIN generate_series(0, 15) p(i) WHERE d.doc_id % 3 = 0
        |  UNION ALL
        |  SELECT 'video' AS kind,
        |    CAST(((d.doc_id * 7 + f.f * 13 + (p.i // 4) * 16 + (p.i % 4) * 2) % 256) // 16 AS INT) AS bin
        |  FROM documents d CROSS JOIN generate_series(0, 3) f(f)
        |                   CROSS JOIN generate_series(0, 15) p(i) WHERE d.doc_id % 3 = 2
        |) GROUP BY kind, bin""") { (s, dir) =>
      Media.extractFeatures(
        Media.resize(Media.synthesize(s, dir).filter(col("kind") =!= "audio"), 4, 4))
        .select(col("kind"), posexplode(col("histogram")).as(Seq("bin", "cnt")))
        .groupBy(col("kind"), col("bin"))
        .agg(sum(col("cnt")).as("total"))
        .filter(col("total") > 0)
    },

    // REAL frame sampling under the hash gate: 4 evenly-spaced frames
    // out of each video's 4-frame container are ACTUAL decoded PNG
    // frames; per-frame pixel count and exact pixel sum are reproduced
    // analytically by the oracle from the frame formula.
    Q(
      "q_media_frames",
      """SELECT d.doc_id AS media_id, f.f AS frame_no,
        |  CAST(64 AS BIGINT) AS n_px,
        |  CAST(sum((d.doc_id * 7 + f.f * 13 + p.i) % 256) AS BIGINT) AS px_sum
        |FROM documents d CROSS JOIN generate_series(0, 3) f(f)
        |                 CROSS JOIN generate_series(0, 63) p(i)
        |WHERE d.doc_id % 3 = 2
        |GROUP BY 1, 2""") { (s, dir) =>
      Media.frameStats(
        Media.frameSample(Media.synthesize(s, dir).filter(col("kind") === "video"), 4))
    })
}
