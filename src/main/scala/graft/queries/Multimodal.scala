package graft.queries

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.multimodal.Media

/** Query-surface entries for the multimodal plumbing. `q_media_meta`
  * exercises the binary-column schema end-to-end in pure SQL (oracle-
  * checked); `q_media_features` runs the real batch-decode path
  * (mapPartitions over typed records — stub decoder, real plumbing), and
  * gets the driver's rows-only check since the stub is not
  * SQL-expressible. */
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

    Q.noOracle("q_media_features") { (s, dir) =>
      Media.extractFeatures(Media.synthesize(s, dir))
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("byte_len")).as("sum_bytes"),
          sum(expr("histogram[6]")).as("hist_bin6"),
          sum(expr("size(embedding)")).as("emb_dims"))
    },

    // resize plumbing: byte-budget contract (w*h cap) + metadata update,
    // then re-extract features over the resized payloads
    Q.noOracle("q_media_resize") { (s, dir) =>
      Media.extractFeatures(Media.resize(Media.synthesize(s, dir), 32, 32))
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("cnt"),
          max(col("byte_len")).as("max_bytes"), // capped at 32*32
          sum(expr("size(embedding)")).as("emb_dims"))
    },

    // frame-sampling plumbing: n evenly-spaced per-video frames (stub
    // 16-byte windows; real batch shape/schema), summarized per media id
    Q.noOracle("q_media_frames") { (s, dir) =>
      Media.frameSample(Media.synthesize(s, dir), 4)
        .groupBy(col("media_id"))
        .agg(
          count(lit(1)).as("n_frames"),
          sum(expr("octet_length(frame_bytes)")).as("sum_frame_bytes"),
          countDistinct(expr("xxhash64(frame_bytes)")).as("distinct_frames"))
    })
}
