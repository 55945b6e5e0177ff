package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Multimodal binary-column plumbing: decode batches, corrupt-row
  * isolation, frame explode, content dedup. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("decode stage is deterministic and isolates corrupt rows") {
    val media = Multimodal.syntheticMedia(spark, 20)
      .union(Seq((99L, "image", "application/x-fake", Array.empty[Byte]))
        .toDF("media_id", "kind", "mime", "content"))
    val decoded = Multimodal.decodeImages(media).cache()
    assert(decoded.count() === 21)
    val bad = decoded.filter($"decode_error").collect()
    assert(bad.map(_.getAs[Long]("media_id")).toSeq === Seq(99L))
    val ok = decoded.filter(!$"decode_error")
    assert(ok.filter($"width" < 1 || $"height" < 1).count() === 0)
    // histogram is a probability vector
    val hist = ok.head().getSeq[Double](ok.head().fieldIndex("histogram"))
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    // deterministic: second run identical
    val again = Multimodal.decodeImages(media)
    assert(decoded.exceptAll(again).count() === 0)
  }

  test("frame sampling explodes videos into per-frame rows") {
    val media = Multimodal.syntheticMedia(spark, 6).filter($"kind" === "video")
    val frames = Multimodal.explodeFrames(media, 4)
    assert(frames.count() === media.count() * 4)
    assert(frames.columns.toSeq === Seq("media_id", "frame_no", "frame_bytes"))
  }

  test("decode reports the true pixel dimensions of the generated PNGs") {
    val decoded = Multimodal.decodeImages(Multimodal.syntheticMedia(spark, 30))
      .filter(!$"decode_error").collect()
    assert(decoded.length === 30) // videos decode via their first PNG frame
    decoded.foreach { r =>
      val i = r.getAs[Long]("media_id").toInt
      assert(r.getAs[Int]("width") === 8 + (i % 24))
      assert(r.getAs[Int]("height") === 8 + ((i * 7) % 24))
    }
  }

  test("JPEG payloads decode through the ImageIO JPEG reader branch") {
    // JPEG stays OUT of syntheticMedia (its golden pins are re-derived by
    // an independent Python PNG decoder; JPEG pixel output is not
    // bit-standardized across decoders) — so the JPEG branch is gated
    // here on the facts that ARE decoder-independent: SOI marker, decode
    // success, exact dimensions.
    import spark.implicits._
    val media = (0 until 12).map { i =>
      val w = 8 + (i % 24)
      val h = 8 + ((i * 7) % 24)
      (i.toLong, "image", "image/jpeg", Multimodal.syntheticJpeg(i, w, h))
    }.toDF("media_id", "kind", "mime", "content")
    media.collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      // JPEG SOI marker, not a PNG signature in disguise
      assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xff) === 0xd8)
    }
    val decoded = Multimodal.decodeImages(media).collect()
    assert(decoded.length === 12)
    assert(decoded.forall(!_.getAs[Boolean]("decode_error")))
    decoded.foreach { r =>
      val i = r.getAs[Long]("media_id").toInt
      assert(r.getAs[Int]("width") === 8 + (i % 24))
      assert(r.getAs[Int]("height") === 8 + ((i * 7) % 24))
    }
  }

  test("nearest-neighbor resize selects exactly src=(dst*srcDim)/outDim pixels") {
    // pixel-exact gate: re-implement the index arithmetic here and compare
    // the stage's histogram against a histogram computed directly from the
    // selected source pixels — any drift in the resample math fails
    val media = Multimodal.syntheticMedia(spark, 12)
    val got = Multimodal.resizeImages(media, 16, 12).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    media.collect().foreach { m =>
      val id = m.getAs[Long]("media_id")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.getAs[Array[Byte]]("content")))
      val counts = new Array[Long](8)
      for (y <- 0 until 12; x <- 0 until 16) {
        val rgb = img.getRGB((x.toLong * img.getWidth / 16).toInt,
          (y.toLong * img.getHeight / 12).toInt)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        counts(lum >> 5) += 1
      }
      val r = got(id)
      assert(!r.getAs[Boolean]("decode_error"))
      assert(r.getAs[Int]("src_width") === img.getWidth)
      assert(r.getAs[Int]("src_height") === img.getHeight)
      assert(r.getAs[Int]("width") === 16 && r.getAs[Int]("height") === 12)
      assert(r.getAs[Seq[Double]]("histogram") ===
        counts.map(_.toDouble / (16 * 12)).toSeq)
    }
    // corrupt payload isolates, never fails the stage
    import spark.implicits._
    val bad = Seq((99L, Array.fill(32)(7.toByte))).toDF("media_id", "content")
    val badOut = Multimodal.resizeImages(bad, 16, 12).collect()
    assert(badOut.length === 1 && badOut.head.getAs[Boolean]("decode_error"))
  }

  test("sampled frames are themselves decodable PNG images") {
    val media = Multimodal.syntheticMedia(spark, 4).filter($"kind" === "video")
    val frames = Multimodal.explodeFrames(media, 3).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("frame_bytes")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"frame ${r.getAs[Int]("frame_no")} not decodable")
    }
    // frame sampling on a payload with no PNG frames yields nothing
    assert(Multimodal.sampleFrames(Array.fill(256)(7.toByte), 4).isEmpty)
  }

  test("WAV decode recovers exact per-channel RMS from known PCM") {
    // stereo: channel 0 constant +16384 (rms 0.5), channel 1 constant -8192
    // (rms 0.25) — exact values, no tolerance needed beyond float repr
    val nFrames = 1000
    val pcm = new Array[Byte](nFrames * 2 * 2)
    for (f <- 0 until nFrames; c <- 0 until 2) {
      val s = if (c == 0) 16384 else -8192
      val o = (f * 2 + c) * 2
      pcm(o) = (s & 0xff).toByte
      pcm(o + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val (rate, nCh, durMs, rms) = Multimodal.decodeWav(out.toByteArray)
    assert(rate === 16000 && nCh === 2)
    assert(durMs === nFrames * 1000L / 16000)
    assert(math.abs(rms(0) - 0.5) < 1e-12)
    assert(math.abs(rms(1) - 0.25) < 1e-12)
  }

  test("audio decode stage reports true header params and isolates corrupt rows") {
    val decoded = Multimodal.decodeAudios(Multimodal.syntheticAudio(spark, 30))
      .cache()
    val bad = decoded.filter($"decode_error").collect()
    assert(bad.map(_.getAs[Long]("media_id")).sorted.toSeq === Seq(8L, 17L, 26L))
    val rates = Array(8000, 16000, 22050, 44100)
    decoded.filter(!$"decode_error").collect().foreach { r =>
      val i = r.getAs[Long]("media_id").toInt
      val nFrames = 500 + (i * 37) % 3000
      assert(r.getAs[Int]("sample_rate") === rates(i % 4))
      assert(r.getAs[Int]("channels") === 1 + (i % 2))
      assert(r.getAs[Long]("duration_ms") === nFrames * 1000L / rates(i % 4))
      val rms = r.getSeq[Double](r.fieldIndex("rms"))
      assert(rms.length === 1 + (i % 2))
      // full-scale uniform random PCM has rms ≈ 1/sqrt(3) ≈ 0.577
      rms.foreach(v => assert(v > 0.4 && v < 0.75, s"rms $v out of band"))
    }
    // deterministic: second run identical
    val again = Multimodal.decodeAudios(Multimodal.syntheticAudio(spark, 30))
    assert(decoded.exceptAll(again).count() === 0)
  }

  test("Goertzel band amplitude recovers a pure tone; windows tile the stream") {
    // 200ms of 440Hz sine at 16kHz → 20ms windows = 10 full windows of 320
    // samples each; the 440Hz band must read ≈ the tone's 0.5 amplitude,
    // the off-tone bands ≈ 0
    val wav = Multimodal.syntheticToneWav(440.0, 16000, 1, 3200)
    val frames = Multimodal.wavFeatureFrames(wav, 20, Seq(440.0, 1000.0, 2500.0))
    assert(frames.length === 10)
    assert(frames.map(_._2).distinct.toSeq === Seq(10))
    assert(frames.map(_._3).toSeq === (0 until 10).map(_ * 20L))
    frames.foreach { case (_, _, _, rms, bands) =>
      // sine RMS = A/√2 ≈ 0.3536; Goertzel at the tone ≈ A (window is not
      // an integer number of periods, so allow a few percent of leakage)
      assert(math.abs(rms - 0.5 / math.sqrt(2.0)) < 0.01, s"rms=$rms")
      assert(math.abs(bands(0) - 0.5) < 0.05, s"on-tone band=${bands(0)}")
      assert(bands(1) < 0.05 && bands(2) < 0.05,
        s"off-tone bands must be near zero, got ${bands.toSeq}")
    }
    // tail window keeps its true length: 3360 samples → 10 full + 160-sample tail
    val tail = Multimodal.wavFeatureFrames(
      Multimodal.syntheticToneWav(440.0, 16000, 2, 3360), 20, Seq(440.0))
    assert(tail.length === 11 && tail.last._3 === 200L)
    assert(math.abs(tail.last._5(0) - 0.5) < 0.05) // stereo mono-mix intact
  }

  test("audio feature-frame stage isolates corrupt rows and matches direct decode") {
    val df = Multimodal.decodeAudioFrames(
      Multimodal.syntheticAudio(spark, 18), 20, Seq(440.0, 1000.0))
    val rows = df.collect()
    val bad = rows.filter(_.getAs[Boolean]("decode_error"))
    assert(bad.map(_.getAs[Long]("media_id")).toSet === Set(8L, 17L))
    assert(bad.forall(r => r.getAs[Int]("frame_no") === -1))
    // window rows agree with a driver-side decode of the same payload
    val content = Multimodal.syntheticAudio(spark, 18)
      .filter($"media_id" === 3L).select($"content")
      .collect()(0).getAs[Array[Byte]](0)
    val direct = Multimodal.wavFeatureFrames(content, 20, Seq(440.0, 1000.0))
    val staged = rows.filter(_.getAs[Long]("media_id") === 3L)
      .sortBy(_.getAs[Int]("frame_no"))
    assert(staged.length === direct.length)
    staged.zip(direct).foreach { case (r, (wi, nWin, startMs, rms, bands)) =>
      assert(r.getAs[Int]("frame_no") === wi)
      assert(r.getAs[Int]("n_frames") === nWin)
      assert(r.getAs[Long]("start_ms") === startMs)
      assert(r.getAs[Double]("rms") === rms)
      assert(r.getSeq[Double](r.fieldIndex("band_amp")).toSeq === bands.toSeq)
    }
  }

  test("GIF demux reads true frame count, dims, and exact 8-level histograms") {
    // 5 frames of 12×10 grayscale pixels at the 8 bin-center levels
    val gif = Multimodal.syntheticGif(seed = 3, w = 12, h = 10, nFrames = 5)
    val all = Multimodal.demuxGif(gif, 100)
    assert(all.length === 5)
    assert(all.map(_._1) === Seq(0, 1, 2, 3, 4)) // frame_no
    assert(all.forall(f => f._2 === 5 && f._3 === 12 && f._4 === 10))
    all.foreach { case (_, _, w, h, hist) =>
      assert(math.abs(hist.sum - 1.0) < 1e-9)
      // every mass sits on a multiple of 1/(w*h): palette round-trip exact
      hist.foreach(p => assert(math.abs(p * w * h - (p * w * h).round) < 1e-6))
    }
    // evenly spaced sampling: 5 frames, take 2 → frames 0 and 2
    assert(Multimodal.demuxGif(gif, 2).map(_._1) === Seq(0, 2))
  }

  test("GIF demux stage isolates corrupt payloads and is deterministic") {
    val media = Multimodal.syntheticGifMedia(spark, 27) // ids 8, 17, 26 corrupt
    val decoded = Multimodal.decodeGifFrames(media, 3).cache()
    val bad = decoded.filter($"decode_error")
      .collect().map(_.getAs[Long]("media_id")).sorted
    assert(bad.toSeq === Seq(8L, 17L, 26L))
    val ok = decoded.filter(!$"decode_error")
    // every non-corrupt video yields min(3, nFrames) frames
    val perVideo = ok.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 27).filter(_ % 9 != 8).foreach { i =>
      assert(perVideo(i.toLong) === math.min(3, 2 + (i % 7)).toLong, s"id $i")
    }
    val again = Multimodal.decodeGifFrames(media, 3)
    assert(decoded.exceptAll(again).count() === 0)
  }

  test("GIF demux composites dirty-rect frames onto the logical screen") {
    // frame 0: 8×8 all black; frame 1: 2×2 all white stored as a patch at
    // (3,3) — a renderer must show 60 black + 4 white pixels, not a 2×2
    // white raster
    def solid(w: Int, h: Int, rgb: Int) = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    def write(img: java.awt.image.BufferedImage, x: Int, y: Int): Unit = {
      val spec = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
      val md = writer.getDefaultImageMetadata(spec, writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = md.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val kids = tree.getChildNodes
      (0 until kids.getLength).foreach { i =>
        val n = kids.item(i)
        if (n.getNodeName == "ImageDescriptor") {
          val e = n.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          e.setAttribute("imageLeftPosition", x.toString)
          e.setAttribute("imageTopPosition", y.toString)
        }
      }
      md.setFromTree(fmt, tree)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, md),
        writer.getDefaultWriteParam)
    }
    write(solid(8, 8, 0x000000), 0, 0)
    write(solid(2, 2, 0xffffff), 3, 3)
    writer.endWriteSequence(); writer.dispose(); ios.close()

    val frames = Multimodal.demuxGif(out.toByteArray, 10)
    assert(frames.length === 2)
    val (_, _, w1, h1, hist1) = frames(1)
    assert((w1, h1) === ((8, 8)), "composited frame must be the logical screen")
    assert(hist1(0) === 60.0 / 64 && hist1(7) === 4.0 / 64,
      s"expected 60 black + 4 white composited pixels, got ${hist1.toSeq}")
  }

  test("GIF disposal=3 restores the previous screen; disposal=2 clears to background") {
    def solid(w: Int, h: Int, v: Int) = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (v << 16) | (v << 8) | v // R=G=B → Rec.601 luminance == v
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    // f0: gray 108 (bin 3), stays; f1: white 252 (bin 7) full-screen with
    // restore-to-previous — so f2, a 4×4 black patch, composites on f0's
    // gray, NOT f1's white
    val gif = Multimodal.syntheticGifDisposal(Seq(
      (solid(8, 8, 108), "doNotDispose", 0, 0),
      (solid(8, 8, 252), "restoreToPrevious", 0, 0),
      (solid(4, 4, 0), "doNotDispose", 0, 0)))
    val frames = Multimodal.demuxGif(gif, 3)
    assert(frames.length === 3)
    val hist1 = frames(1)._5
    assert(hist1(7) === 1.0, "frame 1 displays full-screen white")
    val hist2 = frames(2)._5
    assert(hist2(0) === 16.0 / 64 && hist2(3) === 48.0 / 64,
      s"disposal=3 must restore frame 0's gray under the patch, got ${hist2.toSeq}")

    // same GIF but disposal=2 on f1: the screen under f2 is the black
    // background, so the whole composited frame 2 lands in bin 0
    val gif2 = Multimodal.syntheticGifDisposal(Seq(
      (solid(8, 8, 108), "doNotDispose", 0, 0),
      (solid(8, 8, 252), "restoreToBackgroundColor", 0, 0),
      (solid(4, 4, 0), "doNotDispose", 0, 0)))
    val hist2b = Multimodal.demuxGif(gif2, 3)(2)._5
    assert(hist2b(0) === 1.0,
      s"disposal=2 must clear to background before frame 2, got ${hist2b.toSeq}")
  }

  test("content fingerprint dedups identical payloads") {
    val m = Multimodal.syntheticMedia(spark, 5)
    val dup = m.union(m.limit(2))
    val groups = dup.groupBy(Multimodal.contentFingerprint($"content"))
      .count()
    assert(groups.count() === 5)
    assert(groups.filter($"count" === 2).count() === 2)
  }

  test("dHash: re-encode invariant, edit tolerant, corrupt isolated") {
    // byte-level re-encode (different PNG bytes, same pixels) → SAME hash:
    // the property contentFingerprint lacks and dHash exists for
    val png = Multimodal.syntheticPng(7, 20, 16)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val out = new java.io.ByteArrayOutputStream()
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val p = w.getDefaultWriteParam
    w.setOutput(javax.imageio.ImageIO.createImageOutputStream(out))
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    assert(Multimodal.dHash(png) === Multimodal.dHash(out.toByteArray))
    assert(Multimodal.dHash(png).matches("[0-9a-f]{16}"))
    // the near-dup join finds each patched copy and nothing else, and a
    // corrupt payload drops from the join instead of failing it
    val media = Multimodal.syntheticNearDupMedia(spark, 20)
      .union(Seq((77777L, "image", "image/png", Array[Byte](1, 2, 3)))
        .toDF("media_id", "kind", "mime", "content"))
    val pairs = Multimodal.imageNearDupPairs(media, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.length === 20)
    assert(pairs.toSeq === (0 until 20).map(i => (i.toLong, i + 10000L)))
  }

  test("audioDHash: re-level invariant, one dominant band per span, corrupt isolated") {
    val bands = Multimodal.audioDHashBands.toIndexedSeq
    // uniform re-leveling (volume normalization) must not move the hash:
    // a span's bands and its mean scale together
    val base = Multimodal.syntheticScheduleWav(3, bands, 8000, 1000, 1.0)
    val releveled = Multimodal.syntheticScheduleWav(3, bands, 8000, 1000, 0.8)
    val h = Multimodal.audioDHash(base, bands)
    assert(h === Multimodal.audioDHash(releveled, bands))
    assert(h.matches("[0-9a-f]{16}"))
    // tone schedules put exactly ONE band above each span's mean → 8 set
    // bits, one per span
    assert(java.lang.Long.bitCount(java.lang.Long.parseUnsignedLong(h, 16)) === 8)
    // distinct schedules disagree well past the near-dup threshold
    val other = Multimodal.audioDHash(
      Multimodal.syntheticScheduleWav(4, bands, 8000, 1000, 1.0), bands)
    val dist = java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(h, 16) ^
        java.lang.Long.parseUnsignedLong(other, 16))
    assert(dist > 3, s"distinct schedules too close: hamming $dist")
    // the near-dup join finds every planted re-leveled copy and nothing
    // else; corrupt payloads drop from the join instead of failing it
    val pairs = Multimodal.audioNearDupPairs(
      Multimodal.syntheticNearDupAudio(spark, 18), bands, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val expected = (0 until 18).filter(_ % 9 != 8)
      .map(i => (i.toLong, i + 10000L, 0))
    assert(pairs.toSeq === expected)
  }
}
