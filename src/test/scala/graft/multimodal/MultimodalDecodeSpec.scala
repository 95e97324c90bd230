package graft.multimodal

import graft.SparkSpec

/** The real-vs-fallback decode contract: JDK-readable image bytes
  * yield true header geometry; bytes no reader can claim — and bytes a
  * LAX reader would misclaim — take the deterministic hash-derived
  * fallback. */
class MultimodalDecodeSpec extends SparkSpec {

  private def png(w: Int, h: Int, argb: Boolean): Array[Byte] = {
    val t = if (argb) java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_INT_RGB
    val img = new java.awt.image.BufferedImage(w, h, t)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage reads true geometry from png/jpeg headers") {
    assert(Multimodal.decodeImage(png(13, 7, argb = true)).contains((13, 7, 4, "png")))
    assert(Multimodal.decodeImage(png(320, 1, argb = false)).contains((320, 1, 3, "png")))
    val img = new java.awt.image.BufferedImage(5, 9, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val Some((w, h, ch, fmt)) = Multimodal.decodeImage(bos.toByteArray)
    assert((w, h, ch, fmt) == (5, 9, 3, "jpeg"))
  }

  test("non-image bytes fall back to the hash stub — including text opening with 'BM'") {
    val text = "BMW drivers, read the manual".getBytes("UTF-8")
    assert(Multimodal.decodeImage(text).isEmpty,
      "the two-letter BMP magic must not claim running text")
    assert(Multimodal.decodeImage("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)).isEmpty,
      "the magic-less WBMP sniffer must stay gated")
    // truncated real header: claimed by the png reader, fails parse, falls back
    assert(Multimodal.decodeImage(png(4, 4, argb = false).take(16)).isEmpty)
    // the batch path stitches the fallback in deterministically
    val meta = Multimodal.decodeBatch(Seq(Multimodal.MediaIn(1L, text))).head
    assert(meta.width >= 320 && meta.format == "rgb" || meta.format == "yuv")
  }

  test("audio headers decode to true parameters; non-audio falls back to the pcm stub") {
    AudioFixture.ensure()
    (0 until AudioFixture.n).foreach { i =>
      val f = new java.io.File(AudioFixture.root).listFiles()
        .find(_.getName.contains(f"clip_$i%03d")).get
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val Some((rate, ch, frames, fmt)) = Multimodal.decodeAudioHeader(bytes)
      assert((rate, ch, frames, fmt) ==
        (AudioFixture.sampleRateOf(i), AudioFixture.channelsOf(i),
          AudioFixture.framesOf(i).toLong, AudioFixture.formatOf(i)),
        s"clip $i decoded to ($rate,$ch,$frames,$fmt)")
    }
    assert(Multimodal.decodeAudioHeader("not audio at all".getBytes("UTF-8")).isEmpty)
    val meta = Multimodal.decodeAudioBatch(
      Seq(Multimodal.MediaIn(1L, "not audio".getBytes("UTF-8")))).head
    assert(meta.format == "pcm" && meta.sample_rate >= 8000)
    // an image is not audio and audio is not an image — the two real
    // decoders never claim each other's bytes
    assert(Multimodal.decodeAudioHeader(png(4, 4, argb = false)).isEmpty)
    val wav = java.nio.file.Files.readAllBytes(
      new java.io.File(AudioFixture.root).listFiles().minBy(_.getName).toPath)
    assert(Multimodal.decodeImage(wav).isEmpty)
  }

  test("video container probe reads true mvhd/trak parameters; hostile bytes degrade") {
    VideoFixture.ensure()
    (0 until VideoFixture.n).foreach { i =>
      val f = new java.io.File(VideoFixture.root).listFiles()
        .find(_.getName.contains(f"vid_$i%03d")).get
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val Some((ts, dur, tracks, brand, frames, sampleBytes)) =
        Multimodal.decodeVideoHeader(bytes)
      assert((ts, dur, tracks, brand) ==
        (VideoFixture.timescaleOf(i), VideoFixture.durationOf(i),
          VideoFixture.tracksOf(i), VideoFixture.brandOf(i)),
        s"fixture $i probed to ($ts,$dur,$tracks,$brand)")
      // sample tables: per-track frame count nf with sizes 100..100+nf-1,
      // summed across tracks — stts/stsz arithmetic truths
      val nf = VideoFixture.framesOf(i).toLong
      val tr = VideoFixture.tracksOf(i).toLong
      assert(frames == tr * nf, s"fixture $i frames: $frames")
      assert(sampleBytes == tr * (100L * nf + nf * (nf - 1) / 2),
        s"fixture $i sample bytes: $sampleBytes")
      // truncating mid-moov must degrade to None (declared size past
      // the buffer = structural corruption), never throw
      assert(Multimodal.decodeVideoHeader(bytes.take(bytes.length / 2)).isEmpty)
      // a declared box size past the buffer is structural corruption
      val corrupt = bytes.clone()
      corrupt(0) = 0x7f.toByte // ftyp size becomes enormous
      assert(Multimodal.decodeVideoHeader(corrupt).isEmpty)
      // a hostile stsz whose declared sample COUNT overruns its own box
      // must raise to the corrupt-tree path, never read neighboring
      // boxes' bytes as sample sizes (the fixtures use the explicit
      // table form: count sits at tag+12)
      val stszAt = bytes.indices.find(o => o + 4 <= bytes.length - 4 &&
        bytes(o) == 's' && bytes(o + 1) == 't' && bytes(o + 2) == 's' &&
        bytes(o + 3) == 'z').get
      val lying = bytes.clone()
      lying(stszAt + 12) = 0x00; lying(stszAt + 13) = 0x7f.toByte
      lying(stszAt + 14) = 0xff.toByte; lying(stszAt + 15) = 0xff.toByte
      intercept[IndexOutOfBoundsException](Multimodal.decodeVideoHeader(lying))
      // ...and the batch path degrades that to the deterministic
      // fallback instead of throwing
      val m = Multimodal.decodeVideoBatch(Seq(Multimodal.MediaIn(7L, lying))).head
      assert(m.brand == "none", s"corrupt stsz must route to the fallback: $m")
      // uniform-form overflow: sample_size * count past Long.MaxValue
      // is the same structural lie
      val over = bytes.clone()
      (0 until 4).foreach(k => over(stszAt + 8 + k) = 0xff.toByte)  // uniform
      (0 until 4).foreach(k => over(stszAt + 12 + k) = 0xff.toByte) // count
      intercept[IndexOutOfBoundsException](Multimodal.decodeVideoHeader(over))
    }
    // non-video bytes route to the deterministic fallback
    val meta = Multimodal.decodeVideoBatch(
      Seq(Multimodal.MediaIn(1L, "not a video".getBytes("UTF-8")))).head
    assert(meta.brand == "none" && meta.timescale >= 600)
    // the probe never claims image or audio bytes
    assert(Multimodal.decodeVideoHeader(png(4, 4, argb = false)).isEmpty)
  }

  test("dHash: bit-identical copies at 0, one-pixel variants within 1 bit, blocking sound") {
    import spark.implicits._
    ImageFixture.ensure()
    ImageFixture.ensureVariants()
    def bytesOf(dir: String, prefix: String, i: Int): Array[Byte] =
      java.nio.file.Files.readAllBytes(new java.io.File(dir).listFiles()
        .find(_.getName.contains(f"$prefix$i%03d")).get.toPath)
    val ids = (0 until 24).filter(_ % 3 != 2)
    ids.foreach { i =>
      val orig = Multimodal.dHash(bytesOf(ImageFixture.root, "img_", i)).get
      // a byte-identical copy hashes identically (trivially) and a
      // ONE-PIXEL variant moves at most the single grid bit its cell
      // feeds — re-encode noise would show up right here
      val variant = Multimodal.dHash(
        bytesOf(ImageFixture.variantRoot, "var_", i)).get
      val d = java.lang.Long.bitCount(orig ^ variant)
      assert(d <= 1, s"variant of $i drifted $d bits")
    }
    // unrelated fixture images do not collide within the threshold
    val hashes = ids.map(i =>
      Multimodal.dHash(bytesOf(ImageFixture.root, "img_", i)).get)
    val crossPairs = for {
      a <- hashes.indices; b <- hashes.indices if a < b
    } yield java.lang.Long.bitCount(hashes(a) ^ hashes(b))
    assert(crossPairs.forall(_ > 3),
      s"unrelated fixtures collided: min distance ${crossPairs.min}")
    // the pairing operator: distance-0 copies and ≤1 variants all come
    // back; pigeonhole guard refuses an unsound threshold/bands combo
    val frame = (ids.map(i => (i.toLong,
        Multimodal.dHash(bytesOf(ImageFixture.root, "img_", i)).get)) ++
      ids.map(i => (1000L + i,
        Multimodal.dHash(bytesOf(ImageFixture.root, "img_", i)).get)))
      .toDF("doc_id", "hash")
    val pairs = Multimodal.bandedNearDupPairs(frame, maxDistance = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(ids.forall(i => pairs.contains((i.toLong, 1000L + i, 0))),
      "a bit-identical copy pair is missing")
    intercept[IllegalArgumentException](
      Multimodal.bandedNearDupPairs(frame, maxDistance = 4, bands = 4))
    // undecodable bytes drop out instead of hashing garbage
    assert(Multimodal.dHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("audio fingerprint: copies at 0, one-sample variants within 1 bit, all containers") {
    AudioFixture.ensure()
    AudioFixture.ensureVariants()
    def bytesOf(dir: String, prefix: String, i: Int): Array[Byte] =
      java.nio.file.Files.readAllBytes(new java.io.File(dir).listFiles()
        .find(_.getName.startsWith(f"$prefix$i%03d")).get.toPath)
    (0 until AudioFixture.n).foreach { i =>
      // WAV (LE), AIFF and AU (BE) must all decode to a print — the
      // endianness branch is exercised by construction (i % 3)
      val orig = Multimodal.audioFingerprint(
        bytesOf(AudioFixture.root, "clip_", i))
      assert(orig.isDefined, s"clip $i (${AudioFixture.formatOf(i)}) printed nothing")
      val variant = Multimodal.audioFingerprint(
        bytesOf(AudioFixture.variantRoot, "var_", i)).get
      val d = java.lang.Long.bitCount(orig.get ^ variant)
      assert(d <= 1, s"one-sample variant of clip $i drifted $d bits")
    }
    // unrelated clips stay far apart at the pairing threshold
    val prints = (0 until AudioFixture.n).map(i =>
      Multimodal.audioFingerprint(bytesOf(AudioFixture.root, "clip_", i)).get)
    val cross = for {
      a <- prints.indices; b <- prints.indices if a < b
    } yield java.lang.Long.bitCount(prints(a) ^ prints(b))
    assert(cross.forall(_ > 3), s"unrelated clips collided: min ${cross.min}")
    // undecodable bytes drop out
    assert(Multimodal.audioFingerprint("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("the fixture tree decodes to exactly its construction parameters") {
    ImageFixture.ensure()
    (0 until ImageFixture.n).foreach { i =>
      val f = new java.io.File(ImageFixture.root).listFiles()
        .find(_.getName.contains(f"img_$i%03d")).get
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val Some((w, h, ch, fmt)) = Multimodal.decodeImage(bytes)
      assert((w, h, ch, fmt) ==
        (ImageFixture.widthOf(i), ImageFixture.heightOf(i),
          ImageFixture.channelsOf(i), ImageFixture.formatOf(i)),
        s"fixture $i decoded to ($w,$h,$ch,$fmt)")
    }
  }
}
