package graft.ops

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("stub decoder is deterministic and derives metadata from bytes") {
    val payload = Array[Byte](10, 20, 30, 40)
    val a = StubDecoder.decode(payload)
    val b = StubDecoder.decode(payload)
    assert(a == b.copy(feature = a.feature) && a.feature.sameElements(b.feature))
    assert(a.width == 26 && a.height == 36) // 16 + byte values
    assert(StubDecoder.decode(Array.empty[Byte]).width == 16)
  }

  test("decodeFeatures runs via mapPartitions and drops payload bytes") {
    val media = Seq(
      MediaRow(1L, "hello world".getBytes("UTF-8")),
      MediaRow(2L, Array.empty[Byte])
    ).toDS()
    val out = decodeFeatures(media, StubDecoder)
    assert(!out.columns.contains("payload")) // media bytes never reach downstream shuffles
    val rows = out.collect().sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(rows(0).width == 16 + 'h'.toInt)
    assert(rows(0).feat_len == 11.0f)
    assert(rows(1).n_frames == 1)
  }

  test("ImageIoDecoder recovers real PNG dimensions, channels and frame count") {
    val png = syntheticPng(47, 23, seed = 5L)
    // genuine PNG container: magic bytes present
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val m = ImageIoDecoder.decode(png)
    assert(m.width == 47 && m.height == 23)
    assert(m.feature(0) == 3.0f) // TYPE_3BYTE_BGR -> 3 components
    assert(m.nFrames == 1)
    assert(m.feature(1) == png.length.toFloat)
  }

  test("ImageIoDecoder recovers JPEG dimensions from the SOF header") {
    val img = new java.awt.image.BufferedImage(31, 9, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val m = ImageIoDecoder.decode(bos.toByteArray)
    assert(m.width == 31 && m.height == 9 && m.feature(0) == 3.0f)
  }

  test("decode is header-only: a pixel-data-truncated PNG still yields its dimensions") {
    // PNG layout: 8-byte signature + IHDR chunk (dims at fixed offsets);
    // cutting everything past 64 bytes removes the IDAT pixel stream.
    // Header-only metadata access is the 100 TB property: cost per row
    // must be O(header), not O(pixels).
    val full = syntheticPng(200, 100, seed = 1L)
    assert(full.length > 64)
    val truncated = full.take(64)
    val m = ImageIoDecoder.decode(truncated)
    assert(m.width == 200 && m.height == 100)
  }

  test("ImageIoDecoder refuses a payload no reader recognizes") {
    intercept[IllegalArgumentException] {
      ImageIoDecoder.decode("not an image at all".getBytes("UTF-8"))
    }
  }

  test("decodeFeatures with the real decoder through the mapPartitions seam") {
    val media = Seq(
      MediaRow(1L, syntheticPng(20, 10, seed = 1L)),
      MediaRow(2L, syntheticPng(33, 7, seed = 2L))
    ).toDS()
    val rows = decodeFeatures(media, ImageIoDecoder).collect().sortBy(_.doc_id)
    assert(rows(0).width == 20 && rows(0).height == 10 && rows(0).feat_mean == 3.0f)
    assert(rows(1).width == 33 && rows(1).height == 7)
  }

  test("resizeTo composes with the real decoder") {
    val media = Seq(MediaRow(1L, syntheticPng(200, 100, seed = 3L))).toDS()
    val out = resizeTo(media, ImageIoDecoder, maxW = 64, maxH = 64).collect()
    assert(out(0).width == 200 && out(0).height == 100)
    assert(out(0).out_width == 64 && out(0).out_height == 32)
  }

  test("WavHeaderDecoder recovers real RIFF/WAVE parameters from the fmt chunk") {
    val wav = syntheticWav(nFrames = 100, sampleRate = 16000, channels = 2, seed = 7L)
    // genuine RIFF/WAVE container: outer tag + form type present
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
    val m = WavHeaderDecoder.decode(wav)
    assert(m.sampleRate == 16000 && m.channels == 2 && m.bitsPerSample == 16 && m.nFrames == 100L)
  }

  test("WavHeaderDecoder is deterministic across mono/stereo and sample rates") {
    for (sr <- Seq(8000, 16000, 24000); ch <- Seq(1, 2); nf <- Seq(64, 191)) {
      val m = WavHeaderDecoder.decode(syntheticWav(nf, sr, ch, seed = sr + ch))
      assert(m.sampleRate == sr && m.channels == ch && m.nFrames == nf.toLong)
    }
  }

  test("WavHeaderDecoder refuses a payload no reader recognizes") {
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      WavHeaderDecoder.decode("definitely not audio".getBytes("UTF-8"))
    }
  }

  test("AviHeaderDecoder recovers avih parameters by walking the chunk tree") {
    val avi = syntheticAvi(width = 64, height = 48, nFrames = 12, microSecPerFrame = 40000, seed = 3L)
    // genuine RIFF/AVI container: outer tag + form type present
    assert(avi(0) == 'R' && avi(1) == 'I' && avi(2) == 'F' && avi(3) == 'F')
    assert(avi(8) == 'A' && avi(9) == 'V' && avi(10) == 'I' && avi(11) == ' ')
    // the hdrl list is NOT at a fixed offset: a JUNK chunk precedes it,
    // so recovery proves chunk-walking, not byte-peeking
    assert(new String(avi, 12, 4, "US-ASCII") == "JUNK")
    val m = AviHeaderDecoder.decode(avi)
    assert(m.width == 64 && m.height == 48 && m.nFrames == 12 && m.microSecPerFrame == 40000)
  }

  test("AviHeaderDecoder is deterministic across the parameter grid") {
    for (w <- Seq(32, 112); h <- Seq(16, 64); nf <- Seq(8, 31); mspf <- Seq(10000, 50000)) {
      val m = AviHeaderDecoder.decode(syntheticAvi(w, h, nf, mspf, seed = w + h))
      assert(m.width == w && m.height == h && m.nFrames == nf && m.microSecPerFrame == mspf)
    }
  }

  test("AviHeaderDecoder refuses non-AVI payloads, including WAV (same outer magic)") {
    intercept[IllegalArgumentException] {
      AviHeaderDecoder.decode("not a container".getBytes("UTF-8"))
    }
    // RIFF but form type WAVE: must refuse on the form type, not pass on the outer tag
    intercept[IllegalArgumentException] {
      AviHeaderDecoder.decode(syntheticWav(nFrames = 16, sampleRate = 8000, channels = 1, seed = 1L))
    }
  }

  test("AviHeaderDecoder refuses a structurally valid AVI without an avih chunk") {
    val junk = Array.tabulate[Byte](16)(_.toByte)
    val body = {
      val hdrl = "LIST".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0) ++ "hdrl".getBytes("US-ASCII")
      "JUNK".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++ junk ++ hdrl
    }
    val avi = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](((body.length + 4) & 0xff).toByte, 0, 0, 0) ++ "AVI ".getBytes("US-ASCII") ++ body
    intercept[IllegalArgumentException] { AviHeaderDecoder.decode(avi) }
  }

  test("frameOffsets walks the movi directory and lands on real frame data") {
    val nf = 9
    val avi = syntheticAvi(width = 32, height = 32, nFrames = nf, microSecPerFrame = 40000, seed = 11L)
    val dir = AviHeaderDecoder.frameOffsets(avi)
    assert(dir.length == nf)
    assert(dir.map(_._1) == (0 until nf))
    // deterministic layout: 296-byte preamble, 32 bytes per frame chunk
    assert(dir.map(_._2) == (0 until nf).map(i => 304L + 32L * i))
    assert(dir.forall(_._3 == 24))
    // the offset points at the actual seed-derived frame bytes
    for ((idx, off, sz) <- dir) {
      val expected = Array.tabulate[Byte](24)(j => ((11L * 13L + idx * 7L + j) % 256).toByte)
      assert(avi.slice(off.toInt, off.toInt + sz).sameElements(expected))
    }
    // and the directory agrees with the avih header's frame count
    assert(AviHeaderDecoder.decode(avi).nFrames == nf)
  }

  test("sniffMime classifies genuine containers by magic bytes, as a pure expression") {
    val rows = Seq(
      (1L, syntheticPng(16, 16, seed = 1L)),
      (2L, syntheticWav(64, 8000, 1, seed = 2L)),
      (3L, "just text".getBytes("UTF-8")),
      (4L, {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(
          new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR), "jpg", bos)
        bos.toByteArray
      }),
      (5L, Array.empty[Byte]),
      (6L, syntheticAvi(width = 32, height = 32, nFrames = 4, microSecPerFrame = 40000, seed = 6L))
    ).toDF("doc_id", "payload")
    val out = rows
      .select($"doc_id", Multimodal.sniffMime($"payload").as("mime"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out(1L) == "image/png")
    assert(out(2L) == "audio/wav")
    assert(out(3L) == "application/octet-stream")
    assert(out(4L) == "image/jpeg")
    assert(out(5L) == "application/octet-stream")
    assert(out(6L) == "video/avi")
  }

  test("RIFF walkers honor word alignment: odd-size chunks pad to even offsets") {
    import Multimodal.{riffChunk, riffList, le32}
    // odd-size JUNK (63 B) before hdrl, and odd-size frames (23 B):
    // every subsequent offset depends on the +1 alignment pad, so a
    // walker that forgets `sz & 1` lands mid-chunk and fails
    val avih = le32(40000L) ++ le32(0) ++ le32(0) ++ le32(0x10) ++ le32(5L) ++ le32(0) ++
      le32(1) ++ le32(0) ++ le32(48L) ++ le32(32L) ++ Array.fill[Byte](16)(0)
    val frames = (0 until 5)
      .map(i => riffChunk("00dc", Array.tabulate[Byte](23)(j => (i * 31 + j).toByte)))
      .foldLeft(Array.empty[Byte])(_ ++ _)
    val body = riffChunk("JUNK", Array.fill[Byte](63)(7)) ++
      riffList("hdrl", riffChunk("avih", avih)) ++
      riffList("movi", frames)
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong + 4) ++
      "AVI ".getBytes("US-ASCII") ++ body
    val m = Multimodal.AviHeaderDecoder.decode(avi)
    assert(m.width == 48 && m.height == 32 && m.nFrames == 5 && m.microSecPerFrame == 40000)
    val dir = Multimodal.AviHeaderDecoder.frameOffsets(avi)
    assert(dir.length == 5 && dir.forall(_._3 == 23))
    // offsets step by 32 (8-byte header + 23 data + 1 pad) and land on
    // the crafted first byte of each frame
    assert(dir.sliding(2).forall { case Seq(a, b) => b._2 - a._2 == 32 })
    for ((idx, off, _) <- dir) assert(avi(off.toInt) == (idx * 31).toByte)
  }

  test("sniffBytes agrees with the sniffMime expression on every payload kind") {
    val payloads = Seq(
      syntheticPng(16, 16, seed = 1L),
      syntheticWav(64, 8000, 1, seed = 2L),
      syntheticAvi(32, 32, 4, 40000, seed = 3L),
      "just text".getBytes("UTF-8"),
      Array.empty[Byte], {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(
          new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR), "jpg", bos)
        bos.toByteArray
      }
    )
    val viaExpr = payloads.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }
      .toDF("doc_id", "payload")
      .select($"doc_id", Multimodal.sniffMime($"payload").as("mime"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      assert(Multimodal.sniffBytes(p) == viaExpr(i.toLong), s"payload $i")
    }
  }

  test("sniffBytes ≡ sniffMime on an adversarial corpus: truncations, random form types") {
    val rnd = new scala.util.Random(0xc0ffeeL)
    def randBytes(n: Int) = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
    val payloads: Seq[Array[Byte]] = (0 until 400).map { i =>
      (i % 8) match {
        case 0 => randBytes(rnd.nextInt(17))
        case 1 => syntheticPng(16 + i % 8, 16, seed = i.toLong)
        case 2 => val p = syntheticPng(16, 16, seed = i.toLong); p.take(1 + rnd.nextInt(p.length))
        case 3 => syntheticWav(32, 8000, 1, seed = i.toLong)
        case 4 => val w = syntheticWav(32, 8000, 1, seed = i.toLong); w.take(1 + rnd.nextInt(w.length))
        case 5 => val a = syntheticAvi(32, 16, 3, 40000, seed = i.toLong); a.take(1 + rnd.nextInt(a.length))
        case 6 => "RIFF".getBytes("US-ASCII") ++ randBytes(4) ++ randBytes(4 + rnd.nextInt(8))
        case _ => randBytes(17 + rnd.nextInt(48))
      }
    }
    val viaExpr = payloads.zipWithIndex
      .map { case (p, i) => (i.toLong, p) }
      .toDF("doc_id", "payload")
      .select($"doc_id", Multimodal.sniffMime($"payload").as("mime"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    payloads.zipWithIndex.foreach { case (p, i) =>
      assert(Multimodal.sniffBytes(p) == viaExpr(i.toLong),
        s"payload $i (${p.length} B, head=${p.take(12).map(b => f"${b & 0xff}%02x").mkString})")
    }
  }

  test("decodeMixed routes each container to its decoder, nulls elsewhere") {
    val media = Seq(
      MediaRow(0L, syntheticPng(20, 18, seed = 0L)),
      MediaRow(1L, syntheticWav(nFrames = 100, sampleRate = 16000, channels = 2, seed = 1L)),
      MediaRow(2L, syntheticAvi(width = 48, height = 32, nFrames = 6, microSecPerFrame = 40000, seed = 2L)),
      MediaRow(3L, "unrecognized".getBytes("UTF-8"))
    ).toDS()
    val out = Multimodal.decodeMixed(media).collect().map(m => m.doc_id -> m).toMap
    assert(out(0L).mime == "image/png" && out(0L).img_width.contains(20) && out(0L).img_height.contains(18))
    assert(out(0L).sample_rate.isEmpty && out(0L).vid_width.isEmpty)
    assert(out(1L).mime == "audio/wav" && out(1L).sample_rate.contains(16000) && out(1L).n_audio_frames.contains(100L))
    assert(out(1L).img_width.isEmpty && out(1L).vid_width.isEmpty)
    assert(out(2L).mime == "video/avi" && out(2L).vid_width.contains(48) && out(2L).n_video_frames.contains(6))
    assert(out(2L).img_width.isEmpty && out(2L).sample_rate.isEmpty)
    assert(out(3L).mime == "application/octet-stream")
    assert(out(3L).img_width.isEmpty && out(3L).sample_rate.isEmpty && out(3L).vid_width.isEmpty)
  }

  test("decodeMixed quarantines corrupt payloads per row instead of failing the pass") {
    // intact magic bytes, unreadable content: the sniff routes each to
    // its decoder, the decoder throws, the ROW must survive with its
    // sniffed mime and all-null metadata — one torn object cannot kill
    // a corpus-wide ingest
    val corruptPng = syntheticPng(20, 20, seed = 1L).take(12) // signature intact, IHDR torn
    val corruptWav = syntheticWav(32, 8000, 1, seed = 2L).take(16) // RIFF/WAVE tag intact, fmt gone
    val corruptAvi = syntheticAvi(32, 16, 3, 40000, seed = 3L).take(12) // RIFF/AVI tag only
    assert(sniffBytes(corruptPng) == "image/png") // routed, not octet-stream
    intercept[Exception](ImageIoDecoder.decode(corruptPng)) // and the decoder DOES throw
    val media = Seq(
      MediaRow(0L, corruptPng),
      MediaRow(1L, corruptWav),
      MediaRow(2L, corruptAvi),
      MediaRow(3L, syntheticPng(20, 18, seed = 4L)) // healthy neighbor decodes normally
    ).toDS()
    val out = Multimodal.decodeMixed(media).collect().map(m => m.doc_id -> m).toMap
    assert(out(0L).mime == "image/png" && out(0L).img_width.isEmpty)
    assert(out(1L).mime == "audio/wav" && out(1L).sample_rate.isEmpty)
    assert(out(2L).mime == "video/avi" && out(2L).vid_width.isEmpty)
    assert(out(3L).mime == "image/png" && out(3L).img_width.contains(20) && out(3L).img_height.contains(18))
  }

  test("resizeImage writes a real PNG at box-fit dimensions; identity path returns the bytes unchanged") {
    // clamp-width branch: 200x100 into 64x64 -> 64x32
    val wide = resizeImage(syntheticPng(200, 100, seed = 3L), 64, 64)
    val mw = ImageIoDecoder.decode(wide)
    assert(mw.width == 64 && mw.height == 32)
    assert((wide(0) & 0xff) == 0x89 && wide(1) == 'P') // genuine PNG out
    // clamp-height branch: 100x200 into 64x64 -> 32x64
    val tall = ImageIoDecoder.decode(resizeImage(syntheticPng(100, 200, seed = 4L), 64, 64))
    assert(tall.width == 32 && tall.height == 64)
    // identity: already inside the box -> the SAME byte array, no re-encode
    val small = syntheticPng(20, 10, seed = 5L)
    assert(resizeImage(small, 64, 64) eq small)
  }

  test("resizeImage and resizeTo share one box-fit: output dims agree across a branch-covering grid") {
    for (w <- Seq(16, 24, 25, 47); h <- Seq(16, 20, 21, 32)) {
      val expected = boxFit(w, h, 24, 20)
      val m = ImageIoDecoder.decode(resizeImage(syntheticPng(w, h, seed = w * 100L + h), 24, 20))
      assert((m.width, m.height) == expected, s"($w x $h)")
      val meta = resizeTo(Seq(MediaRow(1L, syntheticPng(w, h, seed = 1L))).toDS(), ImageIoDecoder, 24, 20).collect()(0)
      assert((meta.out_width, meta.out_height) == expected, s"($w x $h) metadata path")
    }
  }

  test("pixelSums recovers exact per-channel sums from real PNG bytes") {
    // independent channel-order pin: 2x1 image with hand-picked colors —
    // a BGR/RGB flip in the decode path cannot cancel out
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    img.setRGB(0, 0, (255 << 16) | (0 << 8) | 0)
    img.setRGB(1, 0, (0 << 16) | (128 << 8) | 64)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(pixelSums(bos.toByteArray) == ((2L, 255L, 128L, 64L)))
    // and against the syntheticPng formula over the full grid
    val (w, h, seed) = (23, 17, 9L)
    var (er, eg, eb) = (0L, 0L, 0L)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((seed + x * 31L + y * 17L) % 256).toInt
      er += v; eg += 255 - v; eb += (v * 7) % 256
    }
    assert(pixelSums(syntheticPng(w, h, seed)) == ((w.toLong * h, er, eg, eb)))
  }

  test("pcmStats recovers exact sample stats from real WAV bytes") {
    val (nf, sr, ch, seed) = (100, 16000, 2, 7L)
    val data = Array.tabulate[Byte](nf * ch * 2)(i => ((seed + i * 131L) % 256).toByte)
    var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
    var i = 0
    while (i + 1 < data.length) {
      val v = ((data(i + 1) << 8) | (data(i) & 0xff)).toShort.toInt
      sum += v; mn = math.min(mn, v); mx = math.max(mx, v)
      i += 2
    }
    assert(pcmStats(syntheticWav(nf, sr, ch, seed)) == ((nf.toLong * ch, sum, mn, mx)))
    // mono edge: one sample per frame
    assert(pcmStats(syntheticWav(1, 8000, 1, seed = 0L))._1 == 1L)
  }

  test("pcmStats refuses non-PCM16LE input loudly") {
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      pcmStats("not audio".getBytes("UTF-8"))
    }
  }

  test("dHash: gradient saturates all bits, flat image none, grid math matches the formula") {
    def png(fill: (Int, Int) => Int, w: Int = 36, h: Int = 24): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, fill(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // brightness strictly rising left to right: every comparison fires
    val rising = png((x, _) => { val v = x * 7; (v << 16) | (v << 8) | v })
    assert(dHashOf(rising) == ((0xffffffffL, 0xffffffffL)))
    // flat image: no comparison fires
    assert(dHashOf(png((_, _) => 0x808080)) == ((0L, 0L)))
    // exact grid agreement with the syntheticPng pixel formula
    val (w, h, seed) = (29, 21, 13L)
    var (elo, ehi) = (0L, 0L)
    for (r <- 0 until 8; k <- 0 until 8) {
      def gray(x: Int, y: Int): Int = {
        val v = ((seed + x * 31L + y * 17L) % 256).toInt
        (v + (255 - v) + (v * 7) % 256) / 3
      }
      val y = r * h / 8
      val bit = if (gray((k + 1) * w / 9, y) > gray(k * w / 9, y)) 1L else 0L
      if (r < 4) elo |= bit << (r * 8 + k) else ehi |= bit << ((r - 4) * 8 + k)
    }
    assert(dHashOf(syntheticPng(w, h, seed)) == ((elo, ehi)))
  }

  test("dHash sees content, not container bytes: PNG and BMP of the same raster collide") {
    val img = new java.awt.image.BufferedImage(33, 19, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 19; x <- 0 until 33)
      img.setRGB(x, y, ((x * 11 + y * 5) % 256) << 16 | ((x * 3) % 256) << 8 | (y * 13) % 256)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos)); bos.toByteArray
    }
    val (png, bmp) = (enc("png"), enc("bmp"))
    assert(!png.sameElements(bmp)) // different bytes...
    assert(dHashOf(png) == dHashOf(bmp)) // ...same fingerprint
    intercept[IllegalArgumentException](dHashOf(syntheticPng(9, 8, 1L))) // raster too small
  }

  test("audioFingerprint: rising loudness saturates all 31 bits, constant none") {
    def wav(sample: Int => Short, n: Int): Array[Byte] = {
      val af = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val data = new Array[Byte](n * 2)
      for (j <- 0 until n) {
        val v = sample(j)
        data(2 * j) = (v & 0xff).toByte
        data(2 * j + 1) = ((v >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), af, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // strictly rising |sample| -> every adjacent window-energy pair rises
    assert(audioFingerprint(wav(j => (j + 1).toShort, 64)) == 0x7fffffffL)
    // constant samples -> no comparison fires
    assert(audioFingerprint(wav(_ => 100.toShort, 64)) == 0L)
    // deterministic on the synthetic corpus and content-derived: a
    // different seed (different samples) gives a different profile
    val a = audioFingerprint(syntheticWav(128, 8000, 1, seed = 1L))
    assert(a == audioFingerprint(syntheticWav(128, 8000, 1, seed = 1L)))
    intercept[IllegalArgumentException](audioFingerprint(wav(_ => 1.toShort, 16)))
  }

  test("resizeTo fits into the box aspect-preserving, never upscales") {
    // StubDecoder: width = 16+b0, height = 16+b1
    val media = Seq(
      MediaRow(1L, Array[Byte](200.toByte, 20)), // 216x36 → wide: clamp W
      MediaRow(2L, Array[Byte](20, 200.toByte)), // 36x216 → tall: clamp H
      MediaRow(3L, Array[Byte](2, 2)) // 18x18 → already fits, untouched
    ).toDS()
    val out = resizeTo(media, StubDecoder, maxW = 64, maxH = 64).collect().sortBy(_.doc_id)
    assert(out(0).out_width == 64 && out(0).out_height == 36 * 64 / 216)
    assert(out(1).out_height == 64 && out(1).out_width == 36 * 64 / 216)
    assert(out(2).out_width == 18 && out(2).out_height == 18)
    // aspect preserved within integer floor; box respected
    assert(out.forall(r => r.out_width <= 64 && r.out_height <= 64))
  }
}
