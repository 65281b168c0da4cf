package graft

import graft.multimodal.Media

/** Multimodal plumbing: schema, determinism, batch shape, partition
  * preservation, and the stubbed resize/frame-sample contracts. */
class MediaSpec extends SparkSpec {

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
    // video rows carry a frame container whose first frame is a PNG
    // behind the 4-byte length prefix
    val vid = ds.filter(_.media_id == 8).head()
    assert(vid.kind == "video")
    assert((vid.payload(4) & 0xff) == 0x89 && vid.payload(5) == 'P'.toByte)
  }

  test("extractFeatures: deterministic; every kind's hist counts decoded pixels/samples") {
    val ds = Media.synthesize(spark, sf())
    val a = Media.extractFeatures(ds, batchSize = 7).collect().sortBy(_.media_id)
    val b = Media.extractFeatures(ds, batchSize = 64).collect().sortBy(_.media_id)
    assert(a.length == 500)
    // batch size must not change results (pure batch-wise map)
    assert(a.zip(b).forall { case (x, y) =>
      x.media_id == y.media_id && x.byte_len == y.byte_len &&
        x.histogram.sameElements(y.histogram) && x.embedding.sameElements(y.embedding)
    })
    // video histograms count decoded PIXELS across every container frame
    assert(a.filter(_.kind == "video").forall(f =>
      f.histogram.sum == Media.VID_FRAMES.toLong * Media.IMG_DIM * Media.IMG_DIM))
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

  test("video decode round-trips the analytic per-frame pixel formula") {
    val ds = Media.synthesize(spark, sf()).filter(_.kind == "video")
    val feats = Media.extractFeatures(ds).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val expected = new Array[Long](16)
      for (fr <- 0 until Media.VID_FRAMES; i <- 0 until Media.IMG_DIM * Media.IMG_DIM)
        expected((((f.media_id * 7 + fr * 13 + i) % 256) >> 4).toInt) += 1
      assert(f.histogram.sameElements(expected), s"media ${f.media_id}")
    }
  }

  test("resize resamples real pixels (nearest neighbor) for images and video frames") {
    val ds = Media.synthesize(spark, sf()).filter(r => r.kind != "audio" && r.media_id < 30)
    val feats = Media.extractFeatures(Media.resize(ds, 4, 4)).collect()
    assert(feats.exists(_.kind == "image") && feats.exists(_.kind == "video"))
    feats.foreach { f =>
      val frames = if (f.kind == "video") Media.VID_FRAMES else 1
      val expected = new Array[Long](16)
      for (fr <- 0 until frames; y <- 0 until 4; x <- 0 until 4)
        expected((((f.media_id * 7 + fr * 13 + (y * 2) * Media.IMG_DIM + x * 2) % 256) >> 4).toInt) += 1
      assert(f.histogram.sameElements(expected), s"media ${f.media_id} (${f.kind})")
      assert(f.histogram.sum == frames.toLong * 16)
    }
  }

  test("undecodable payloads fall back to byte-budget truncation + byte-histogram stub") {
    import spark.implicits._
    // corrupt PNG: the resize must truncate to the w*h budget and the
    // feature decode must byte-histogram, never throw
    val rec = Media.MediaRecord(1L, "image",
      Array.tabulate[Byte](200)(i => (i * 7).toByte), Media.MediaMeta(8, 8, 0, 0L))
    val out = Media.resize(spark.createDataset(Seq(rec)), 4, 4).head()
    assert(out.payload.length == 16, "byte budget w*h for the undecodable fallback")
    val f = Media.extractFeatures(spark.createDataset(Seq(out))).head()
    assert(f.histogram.sum == 16, "expected the byte-histogram stub")
    // truncated video container (cut mid-frame): same posture
    val vid = Media.MediaRecord(2L, "video",
      java.util.Arrays.copyOf(Media.encodeVideo(2L), 50), Media.MediaMeta(8, 8, 0, 0L))
    val vf = Media.extractFeatures(spark.createDataset(Seq(vid))).head()
    assert(vf.histogram.sum == 50, "expected the byte-histogram stub on a torn container")
    // hostile frame-length prefix near Int.MaxValue: the bounds check
    // must not int-overflow into an uncaught copyOfRange
    val hostile = Media.MediaRecord(3L, "video",
      Array[Byte](0x7f, -1, -1, -4, 1, 2, 3), Media.MediaMeta(8, 8, 0, 0L))
    val hf = Media.extractFeatures(spark.createDataset(Seq(hostile))).head()
    assert(hf.histogram.sum == 7, "expected the byte-histogram stub on an overflowing length")
  }

  test("extractFeatures preserves partitioning (map-only stage)") {
    val ds = Media.synthesize(spark, sf()).repartition(5)
    assert(Media.extractFeatures(ds).rdd.getNumPartitions == 5)
  }

  test("resize rewrites metadata and truncates audio to the byte budget") {
    val out = Media.resize(Media.synthesize(spark, sf()), 8, 8).collect()
    assert(out.forall(r => r.meta.width == 8 && r.meta.height == 8))
    assert(out.filter(_.kind == "audio").forall(_.payload.length <= 64))
  }

  test("dHashItems: real-decode hashes match the analytic gradient formula, every modality") {
    val items = Media.dHashItems(Media.synthesize(spark, sf()).filter(_.media_id < 60))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // 20 images (1 row) + 20 audio (1 row) + 20 videos (4 frames each)
    assert(items.length == 120)
    assert(items.count(_._3 == "audio") == 20)
    def analytic(seed: Long): Long = {
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 7) {
        val a = (seed + y * 8 + x) % 256
        h = (h << 1) | (if ((a + 1) % 256 > a) 1L else 0L)
      }
      h
    }
    // audio: the Walsh–Hadamard band-energy fingerprint (band-major
    // grid, time gradients within each band)
    def analyticAudio(id: Long): Long = {
      val seed = (id * 11) % 256
      val e = Array.tabulate(8, 8) { (k, w) =>
        math.abs((0 until 8).map { n =>
          val s = ((seed + w * 8 + n) % 256).toInt
          if (java.lang.Integer.bitCount(k & n) % 2 == 0) s else -s
        }.sum)
      }
      var h = 0L
      for (k <- 0 until 8; w <- 0 until 7)
        h = (h << 1) | (if (e(k)(w + 1) > e(k)(w)) 1L else 0L)
      h
    }
    items.foreach { case (id, f, kind, dh) =>
      val exp = kind match {
        case "image" => analytic((id * 7) % 256)
        case "audio" => analyticAudio(id)
        case _ => analytic((id * 7 + f * 13) % 256)
      }
      assert(dh == exp, s"media $id frame $f ($kind)")
      assert(dh >= 0, "56-bit dHash must stay non-negative")
    }
  }

  test("audio spectral hash is invariant to DC offset and integer gain") {
    import spark.implicits._
    // a WAV whose samples stay small enough that +DC and ×gain keep
    // every byte in 0..255 — the invariance claims are about the WHT
    // grid, not about byte wraparound
    def wav(samples: Array[Byte]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        16000f, 8, 1, 1, 16000f, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val rnd = new scala.util.Random(17)
    val base = Array.fill(64)((rnd.nextInt(60) + 1).toByte)
    def hashOf(samples: Array[Byte], id: Long): Long =
      Media.dHashItems(Seq(Media.MediaRecord(
        id, "audio", wav(samples), Media.MediaMeta(0, 0, 16000, 4L))).toDS())
        .head().getLong(3)
    val h0 = hashOf(base, 1L)
    // DC offset: every window's c_0 shifts equally, bands 1..7 exactly
    // unchanged — all 56 time-gradient signs survive
    assert(hashOf(base.map(b => (b + 100).toByte), 2L) == h0, "DC offset must not move the hash")
    // integer gain: |c| scales uniformly, strict comparisons survive
    assert(hashOf(base.map(b => (b * 4).toByte), 3L) == h0, "integer gain must not move the hash")
    // a genuine spectral change (one window's content replaced) must move it
    val changed = base.clone(); for (i <- 8 until 16) changed(i) = (200 - base(i)).toByte
    assert(hashOf(changed, 4L) != h0, "a real spectral change must move the hash")
  }

  test("dHash resamples larger rasters through the exact NN rule (16x16 -> 8x8)") {
    import spark.implicits._
    // 16x16 gray PNG with pixel(x, y) = (y*16 + x) % 256; the NN grid
    // reads in(2x, 2y), so grid(x, y) = (y*32 + 2x) % 256
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, (y * 16 + x) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rec = Media.MediaRecord(1L, "image", bos.toByteArray,
      Media.MediaMeta(16, 16, 0, 0))
    val dh = Media.dHashItems(Seq(rec).toDS()).head().getLong(3)
    var exp = 0L
    for (y <- 0 until 8; x <- 0 until 7) {
      val a = (y * 32 + 2 * x) % 256
      val b = (y * 32 + 2 * (x + 1)) % 256
      exp = (exp << 1) | (if (b > a) 1L else 0L)
    }
    assert(dh == exp)
  }

  test("PngDecoder fast gray path: pixel-identical to ImageIO on every payload class") {
    // round 19 (VERDICT r18 #5): the direct zlib-path gray8 decoder
    // must be indistinguishable from ImageIO through the seam —
    // accept-and-match on the gray subset, reject-and-fall-through on
    // everything else
    val dec = new Media.PngDecoder
    def gray(img: java.awt.image.BufferedImage): Seq[Int] =
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield img.getRaster.getSample(x, y, 0)
    // 1. synthesized gray PNGs: fast path fires and matches ImageIO
    for (id <- 0L until 64L) {
      val png = Media.encodePng(id)
      val fast = dec.fastGray(png)
      assert(fast.isDefined, s"fast path must accept the synthetic gray png (id=$id)")
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(gray(fast.get) == gray(ref), s"pixels must match ImageIO (id=$id)")
    }
    // 2. a larger gray image with varied content (exercises non-trivial
    // scanline filters the encoder picks at this size)
    val big = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 48; x <- 0 until 64)
      big.getRaster.setSample(x, y, 0, (x * y * 7 + x + 3 * y) % 256)
    val bigOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "png", bigOut)
    val bigPng = bigOut.toByteArray
    assert(dec.fastGray(bigPng).isDefined)
    assert(gray(dec.fastGray(bigPng).get) ==
      gray(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bigPng))))
    // 3. RGB png: fast path rejects, the seam still decodes via ImageIO
    val rgb = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) rgb.setRGB(x, y, x * 123457 + y * 31)
    val rgbOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", rgbOut)
    assert(dec.fastGray(rgbOut.toByteArray).isEmpty, "RGB must fall through")
    assert(dec.decode(rgbOut.toByteArray).isDefined, "the seam still decodes RGB")
    // 4. tampering: flip one IDAT payload byte (CRC now wrong) — the
    // fast path must refuse; the seam's answer is whatever ImageIO says
    val tampered = Media.encodePng(5L).clone()
    val idatAt = {
      val s = new String(tampered.map(_.toChar))
      s.indexOf("IDAT")
    }
    tampered(idatAt + 6) = (tampered(idatAt + 6) ^ 0x41).toByte
    assert(dec.fastGray(tampered).isEmpty, "CRC mismatch must fall through")
    // 5. truncation and garbage: everything returns None, never throws
    for (bad <- Seq(
        Media.encodePng(9L).take(20),
        Array.tabulate[Byte](64)(i => (i * 37).toByte),
        Array.emptyByteArray))
      assert(dec.fastGray(bad).isEmpty && dec.decode(bad).isEmpty)
  }

  test("hamming-ball probe join is EXACT at radius 2 (recall AND precision, randomized)") {
    // the q_media_dedup candidate generator (VERDICT r16 #1): each
    // distinct hash emits 57 ball keys (itself + 56 one-bit flips).
    // Midpoint theorem: d(a,b) <= 2 ⟺ ball(a) ∩ ball(b) ≠ ∅ — so the
    // equi-join on the ball key finds EVERY hamming-<=2 pair (recall)
    // and ONLY those (precision; candidate volume O(57·H + true
    // pairs), no 2^14 bucket-floor birthday collisions)
    val rnd = new scala.util.Random(11)
    val base = Array.fill(40)(rnd.nextLong() & ((1L << 56) - 1))
    // plant pairs at hamming 1, 2 (must match) and 3 (must NOT) plus
    // exact dups (collapse upstream; distinct() removes them here)
    val hashes = (base ++ base.take(10).map(_ ^ (1L << rnd.nextInt(56))) ++
      base.slice(10, 20).map(h => h ^ (1L << 7) ^ (1L << 33)) ++
      base.slice(20, 30).map(h => h ^ (1L << 3) ^ (1L << 40) ^ (1L << 55)) ++
      base.take(5)).distinct
    def ball(h: Long): Set[Long] = (0 until 56).map(b => h ^ (1L << b)).toSet + h
    val probed = (for {
      a <- hashes; b <- hashes
      if a < b && (ball(a) & ball(b)).nonEmpty
    } yield (a, b)).toSet
    val brute = (for {
      a <- hashes; b <- hashes
      if a < b && java.lang.Long.bitCount(a ^ b) <= 2
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "the planted near pairs must survive distinct()")
    assert(hashes.combinations(2).exists(p =>
      java.lang.Long.bitCount(p(0) ^ p(1)) == 3), "a distance-3 pair must be planted")
    assert(probed == brute,
      s"recall lost ${(brute -- probed).size}, precision leaked ${(probed -- brute).size}")
  }

  test("ballKeys (Scala) equals BALL_FLIP_SQL (the streaming stage-1 twin)") {
    // the two-level streaming claim tier emits ball keys from inside a
    // stateful function via Media.ballKeys; pin it against the SQL
    // projection the batch join uses so the renderings can never drift
    val rnd = new scala.util.Random(23)
    val hashes = Array.fill(25)(rnd.nextLong() & ((1L << 56) - 1))
    import spark.implicits._
    val viaSql = hashes.toSeq.toDF("dhash")
      .select(org.apache.spark.sql.functions.col("dhash"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.expr("sequence(0, 56)")).as("b"))
      .selectExpr("dhash", s"${graft.multimodal.Media.BALL_FLIP_SQL} AS k")
      .collect().groupBy(_.getLong(0))
      .map { case (h, rows) => h -> rows.map(_.getLong(1)).toSeq }
    hashes.foreach { h =>
      assert(graft.multimodal.Media.ballKeys(h).toSeq == viaSql(h),
        s"ballKeys($h) drifted from the SQL projection")
    }
  }

  test("frameSample: real PNG frames for video, bounded windows otherwise") {
    val ds = Media.synthesize(spark, sf()).filter(_.media_id < 30)
    val frames = Media.frameSample(ds, 4)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_bytes"))
    assert(frames.count() == 120) // 30 records x 4 frames
    val byKind = frames.withColumn("is_png",
      org.apache.spark.sql.functions.expr("substring(frame_bytes, 2, 3) = cast('PNG' as binary)"))
    // video ids are 2 mod 3; every sampled video frame is a decodable PNG
    assert(byKind.filter("media_id % 3 = 2 and not is_png").count() == 0)
    assert(byKind.filter("media_id % 3 <> 2 and octet_length(frame_bytes) > 16").count() == 0)
    // frame stats on the video frames match the analytic pixel sum
    val stats = Media.frameStats(frames.filter("media_id % 3 = 2")).collect()
    stats.foreach { r =>
      val (id, f) = (r.getLong(0), r.getLong(1))
      val exp = (0 until 64).map(i => (id * 7 + f * 13 + i) % 256).sum
      assert(r.getLong(2) == 64 && r.getLong(3) == exp, s"media $id frame $f")
    }
  }
}
