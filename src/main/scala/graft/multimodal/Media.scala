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
  * preservation, deterministic feature output.
  *
  * The IMAGE path is fully real: `synthesize` emits genuine PNG payloads
  * (encoded with the JDK's `javax.imageio`, no external libraries) whose
  * pixel values are a known function of the id, and `extractFeatures`
  * decodes them back through `ImageIO.read` into real pixel histograms —
  * so the encode→decode round-trip is verified against a DuckDB oracle
  * that computes the same histogram analytically. Corrupt/truncated
  * images (e.g. after the byte-budget `resize`) and sample depths the
  * histogram doesn't model (e.g. 16-bit grayscale) fall back to the
  * byte histogram, the usual skip-don't-crash posture of a decode stage.
  *
  * The AUDIO path is real the same way: `synthesize` emits genuine WAV
  * payloads (8-bit unsigned mono PCM via `javax.sound.sampled`, no
  * external libraries) whose samples are a known function of the id,
  * and the decoder reads them back through `AudioSystem` into sample
  * histograms, oracle-checked analytically like the image path.
  *
  * The VIDEO decoder remains a STUB (no codec libraries in this
  * container): `decodeStub` computes a deterministic fake (byte
  * histogram + hash-derived pseudo-features) clearly marked below.
  * Swapping in a real codec changes only the body of `decodeStub` —
  * every schema and plan stays identical.
  *
  * Scale shape: feature extraction is a pure map stage (no shuffle); a
  * 100 TB media corpus partitions by file and streams batch-by-batch
  * through the decoder with bounded memory (`batchSize` × payload).
  */
object Media {

  /** Synthetic images are IMG_DIM×IMG_DIM 8-bit grayscale PNGs with
    * pixel(x, y) = (id * 7 + y * IMG_DIM + x) mod 256 — analytically
    * reproducible in SQL, so a real decode can be oracle-checked. */
  val IMG_DIM = 8

  /** Real PNG encode via the JDK — deterministic pixels from the id. */
  def encodePng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      IMG_DIM, IMG_DIM, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < IMG_DIM) {
      var x = 0
      while (x < IMG_DIM) {
        raster.setSample(x, y, 0, (((id * 7 + y * IMG_DIM + x) % 256).toInt))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real PNG decode via the JDK; None on corrupt/undecodable bytes.
    * ImageIO's PNG reader throws RuntimeExceptions (not just
    * IOException) on malformed chunk lengths/headers, so catch
    * NonFatal — a corrupt blob must never fail the task. */
  private def decodePng(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Synthetic audio is AUD_N samples of 8-bit unsigned mono PCM at
    * 16 kHz with sample(i) = (id * 11 + i) mod 256 — analytically
    * reproducible in SQL, so the real decode is oracle-checked exactly
    * like the image path. */
  val AUD_N = 64

  /** Real WAV encode via `javax.sound.sampled` — deterministic samples
    * from the id, wrapped in a genuine RIFF/WAVE container. */
  def encodeWav(id: Long): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, 16000f, 8, 1, 1, 16000f, false)
    val samples = Array.tabulate(AUD_N)(i => ((id * 11 + i) % 256).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, AUD_N.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real WAV decode via `AudioSystem`; None on undecodable bytes or
    * any format the 16-bin byte histogram doesn't model — it reads raw
    * sample bytes, so only UNSIGNED 8-bit MONO qualifies (a signed
    * sample of -1 would land in bin 15 instead of mid-scale, and
    * multi-channel would interleave) — everything else falls back to
    * the stub, like the deep-sample image path. */
  private def decodeWav(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 8 || f.getChannels != 1 ||
        f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) None
      else Some(ais.readAllBytes())
    } catch { case scala.util.control.NonFatal(_) => None }

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
    * image rows carry a REAL PNG payload (JDK-encoded, known pixels),
    * audio rows a REAL WAV payload (known samples), video rows the
    * UTF-8 bytes of the text as an opaque stand-in; kind round-robins,
    * metadata derives from the id. Stands in for a real binary source
    * (S3 blobs, tar shards) with an identical schema. */
  def synthesize(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = kinds((id % 3).toInt)
        MediaRecord(
          id,
          kind,
          if (kind == "image") encodePng(id)
          else if (kind == "audio") encodeWav(id)
          else text.getBytes("UTF-8"),
          MediaMeta(
            width = if (kind == "image") IMG_DIM else 64 + (id % 16).toInt * 16,
            height = if (kind == "image") IMG_DIM else 64 + (id % 9).toInt * 16,
            sampleRate = if (id % 3 == 1) 16000 else 0,
            durationMs = if (id % 3 != 0) 1000 + id % 9000 else 0))
      }
  }

  /** STUB decoder for video — deterministic fake standing in for a real
    * codec (libraries unavailable in this environment), and the
    * skip-don't-crash fallback for undecodable images/audio. Consumes
    * one bounded batch, exactly like an Arrow batch handed to a Pandas
    * UDF; replace the body with the real decoder at deployment. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
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

  private def histFeatures(r: MediaRecord, hist: Array[Long]): MediaFeatures = {
    val emb = Array.tabulate(8) { d =>
      val h = java.util.Arrays.hashCode(hist) * 31 + d
      (h % 1000) / 1000.0f
    }
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, hist, emb)
  }

  /** Real image/audio decode: 16-bin histogram over the decoded 8-bit
    * gray raster (images) or the 8-bit PCM samples (audio). Undecodable
    * bytes (corrupt, truncated by the byte-budget resize) and deeper
    * sample formats the 16-bin histogram doesn't model (e.g. a valid
    * 16-bit grayscale PNG) fall back to the byte-histogram stub —
    * skip-don't-crash, never an exception out of the decode stage. */
  private def decodeOne(r: MediaRecord): MediaFeatures = r.kind match {
    case "image" =>
      decodePng(r.payload) match {
        case Some(img) if img.getSampleModel.getSampleSize(0) <= 8 =>
          val raster = img.getRaster
          val hist = new Array[Long](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              hist(raster.getSample(x, y, 0) >> 4) += 1
              x += 1
            }
            y += 1
          }
          histFeatures(r, hist)
        case _ => decodeStub(r)
      }
    case "audio" =>
      decodeWav(r.payload) match {
        case Some(samples) =>
          val hist = new Array[Long](16)
          var i = 0
          while (i < samples.length) {
            hist((samples(i) & 0xff) >> 4) += 1
            i += 1
          }
          histFeatures(r, hist)
        case None => decodeStub(r)
      }
    case _ => decodeStub(r)
  }

  /** One bounded batch through the decoders — the seam where a
    * vectorized decoder (an Arrow batch handed to a Pandas UDF, a GPU
    * decode) consumes the whole Seq at once; the JDK decoders here are
    * scalar, so the batch maps element-wise. */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map(decodeOne)

  /** Batch-wise feature extraction: partition-preserving map stage with
    * bounded per-batch memory (`batchSize` × payload). Images decode for
    * real (ImageIO), audio for real (AudioSystem); video goes through
    * the stub. */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(decodeBatch))
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
