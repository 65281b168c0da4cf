package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise on executors.
  *
  * The Spark side is real and tested — schema, typed Datasets, batch
  * shape (fixed-size batches inside mapPartitions, the same shape an
  * Arrow/Pandas-UDF pipeline hands a Python decoder), partition
  * preservation, deterministic feature output. The *decoders* are STUBS:
  * this container has no image/audio libraries, so `decodeStub` computes
  * a deterministic fake (byte histogram + hash-derived pseudo-features)
  * clearly marked below. Swapping in a real decoder changes only the
  * body of `decodeStub` — every schema and plan stays identical.
  *
  * Scale shape: feature extraction is a pure map stage (no shuffle); a
  * 100 TB media corpus partitions by file and streams batch-by-batch
  * through the decoder with bounded memory (`batchSize` × payload).
  */
object Media {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long)

  final case class MediaRecord(
      media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      histogram: Array[Long], // 16 bins over byte values
      embedding: Array[Float]) // 8-dim pseudo-embedding

  val kinds: Seq[String] = Seq("image", "audio", "video")

  /** Deterministic synthetic media corpus derived from `documents`:
    * payload = UTF-8 bytes of the text, kind round-robins, metadata is
    * derived from the id. Stands in for a real binary source (S3 blobs,
    * tar shards) with an identical schema. */
  def synthesize(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        MediaRecord(
          id,
          kinds((id % 3).toInt),
          text.getBytes("UTF-8"),
          MediaMeta(
            width = 64 + (id % 16).toInt * 16,
            height = 64 + (id % 9).toInt * 16,
            sampleRate = if (id % 3 == 1) 16000 else 0,
            durationMs = if (id % 3 != 0) 1000 + id % 9000 else 0))
      }
  }

  /** STUB decoder — deterministic fake standing in for a real
    * image/audio decode (libraries unavailable in this environment).
    * Consumes one bounded batch, exactly like an Arrow batch handed to a
    * Pandas UDF; replace the body with the real decoder at deployment. */
  private def decodeStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val hist = new Array[Long](16)
      var i = 0
      while (i < r.payload.length) {
        hist((r.payload(i) & 0xff) >> 4) += 1
        i += 1
      }
      val emb = Array.tabulate(8) { d =>
        // hash-derived pseudo-feature in [-1, 1); a real decoder would
        // produce model activations here
        val h = java.util.Arrays.hashCode(r.payload) * 31 + d
        (h % 1000) / 1000.0f
      }
      MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, hist, emb)
    }

  /** Batch-wise feature extraction: partition-preserving map stage with
    * bounded per-batch memory. */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(decodeStub))
  }

  /** STUB resize: keeps the byte-budget contract (w*h) of a real resize
    * without decoding; metadata updated for real. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { r =>
      val budget = math.min(r.payload.length, w * h)
      r.copy(
        payload = java.util.Arrays.copyOf(r.payload, budget),
        meta = r.meta.copy(width = w, height = h))
    }
  }

  /** STUB frame sampling: n evenly spaced 16-byte windows standing in
    * for n decoded video frames; batch shape and schema are real. */
  def frameSample(ds: Dataset[MediaRecord], n: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val len = r.payload.length
      (0 until n).iterator.map { f =>
        val off = if (n == 1) 0 else (f.toLong * math.max(0, len - 16) / math.max(1, n - 1)).toInt
        (r.media_id, f, java.util.Arrays.copyOfRange(r.payload, off, math.min(len, off + 16)))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }
}
