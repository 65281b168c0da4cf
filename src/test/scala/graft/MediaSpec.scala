package graft

import graft.multimodal.Media

/** Multimodal plumbing: schema, determinism, batch shape, partition
  * preservation, and the stubbed resize/frame-sample contracts. */
class MediaSpec extends SparkSpec {

  test("corpus is pure ASCII — the byte-arithmetic oracles' precondition") {
    // q_media_resize / q_media_frames oracles substring the VARCHAR text
    // where Spark slices payload BYTES; valid only while char offsets
    // equal byte offsets (docs/determinism.md "Binary payloads")
    import org.apache.spark.sql.functions._
    for (dir <- Seq(sf(), sf("sf0.01"))) {
      val nonAscii = graft.io.Tables(spark, dir, "documents")
        .filter(expr("octet_length(cast(text as binary)) <> length(text)"))
        .count()
      assert(nonAscii == 0, s"$dir has non-ASCII documents; byte oracles invalid")
    }
  }

  test("synthesize: stable schema, kinds, payload bytes") {
    val ds = Media.synthesize(spark, sf())
    assert(ds.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "payload", "meta"))
    assert(ds.schema("payload").dataType.typeName == "binary")
    val r = ds.filter(_.media_id == 7).head()
    assert(r.kind == "audio") // 7 % 3 == 1
    // audio rows carry a real RIFF/WAVE container
    assert(new String(r.payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(r.payload.slice(8, 12), "US-ASCII") == "WAVE")
    assert(r.meta.sampleRate == 16000)
    // image rows carry a real PNG (magic bytes) that the JDK can decode
    val img = ds.filter(_.media_id == 6).head()
    assert(img.kind == "image")
    assert((img.payload(0) & 0xff) == 0x89 && img.payload(1) == 'P'.toByte)
  }

  test("extractFeatures: deterministic; stub hist sums to byte_len, image hist to pixels") {
    val ds = Media.synthesize(spark, sf())
    val a = Media.extractFeatures(ds, batchSize = 7).collect().sortBy(_.media_id)
    val b = Media.extractFeatures(ds, batchSize = 64).collect().sortBy(_.media_id)
    assert(a.length == 500)
    // batch size must not change results (pure batch-wise map)
    assert(a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && x.byte_len == y.byte_len &&
        x.histogram.sameElements(y.histogram) && x.embedding.sameElements(y.embedding)
    })
    assert(a.filter(_.kind == "video").forall(f => f.histogram.sum == f.byte_len))
    assert(a.filter(_.kind == "image")
      .forall(f => f.histogram.sum == Media.IMG_DIM.toLong * Media.IMG_DIM))
    // audio histograms count decoded SAMPLES, not container bytes
    assert(a.filter(_.kind == "audio")
      .forall(f => f.histogram.sum == Media.AUD_N.toLong && f.byte_len > Media.AUD_N))
    assert(a.forall(_.embedding.length == 8))
  }

  test("image decode round-trips the analytic pixel formula") {
    val ds = Media.synthesize(spark, sf()).filter(_.kind == "image")
    val feats = Media.extractFeatures(ds).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val expected = new Array[Long](16)
      (0 until Media.IMG_DIM * Media.IMG_DIM).foreach { i =>
        expected((((f.media_id * 7 + i) % 256) >> 4).toInt) += 1
      }
      assert(f.histogram.sameElements(expected), s"media ${f.media_id}")
    }
  }

  test("audio decode round-trips the analytic sample formula") {
    val ds = Media.synthesize(spark, sf()).filter(_.kind == "audio")
    val feats = Media.extractFeatures(ds).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val expected = new Array[Long](16)
      (0 until Media.AUD_N).foreach { i =>
        expected((((f.media_id * 11 + i) % 256) >> 4).toInt) += 1
      }
      assert(f.histogram.sameElements(expected), s"media ${f.media_id}")
    }
  }

  test("16-bit PCM WAV falls back to the stub (histogram models unsigned 8-bit mono only)") {
    import spark.implicits._
    // a VALID 16-bit mono WAV: raw frame bytes are not 8-bit samples,
    // so the decode stage must skip (stub), never mis-bin. (8-bit
    // signed can't be tested this way — the WAV container only stores
    // 8-bit as unsigned, so the JDK writer converts on write.)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED, 16000f, 16, 1, 2, 16000f, false)
    val samples = Array.tabulate(64)(i => (i * 31).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, 32L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val bytes = out.toByteArray
    val rec = Media.MediaRecord(1L, "audio", bytes, Media.MediaMeta(0, 0, 16000, 2L))
    val f = Media.extractFeatures(spark.createDataset(Seq(rec))).head()
    assert(f.histogram.sum == bytes.length, "expected the byte-histogram stub")
  }

  test("16-bit grayscale PNG falls back to the stub instead of throwing") {
    import spark.implicits._
    // a VALID deep-sample PNG the 16-bin histogram can't model: the
    // decode stage must skip (stub), never crash the task
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    (0 until 4).foreach(y => (0 until 4).foreach(x =>
      img.getRaster.setSample(x, y, 0, x * 4096 + y * 997)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val bytes = out.toByteArray
    val rec = Media.MediaRecord(1L, "image", bytes, Media.MediaMeta(4, 4, 0, 0L))
    val f = Media.extractFeatures(spark.createDataset(Seq(rec))).head()
    assert(f.histogram.sum == bytes.length, "expected the byte-histogram stub")
  }

  test("truncated image payloads fall back to the byte-histogram stub") {
    val resized = Media.resize(Media.synthesize(spark, sf()).filter(_.kind == "image"), 4, 4)
    val feats = Media.extractFeatures(resized).collect()
    // 16-byte payloads can't decode as PNG; stub hist sums to byte_len
    assert(feats.nonEmpty)
    assert(feats.forall(f => f.histogram.sum == f.byte_len && f.byte_len <= 16))
  }

  test("extractFeatures preserves partitioning (map-only stage)") {
    val ds = Media.synthesize(spark, sf()).repartition(5)
    assert(Media.extractFeatures(ds).rdd.getNumPartitions == 5)
  }

  test("resize caps payload at w*h and rewrites metadata") {
    val out = Media.resize(Media.synthesize(spark, sf()), 8, 8).collect()
    assert(out.forall(_.payload.length <= 64))
    assert(out.forall(r => r.meta.width == 8 && r.meta.height == 8))
  }

  test("frameSample emits n frames per record with bounded windows") {
    val frames = Media.frameSample(Media.synthesize(spark, sf()).limit(10), 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_bytes"))
    assert(frames.count() == 40)
    assert(frames.selectExpr("max(octet_length(frame_bytes))").head().getInt(0) <= 16)
  }
}
