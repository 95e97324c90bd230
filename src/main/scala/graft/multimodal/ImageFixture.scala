package graft.multimodal

import java.awt.image.BufferedImage
import java.io.File

/** Deterministic on-disk image fixtures for the REAL decode path:
  * `n` tiny images of KNOWN geometry, cycling through the three
  * JDK-writable formats the decode query checks —
  *
  *   i % 3 == 0 → PNG with alpha   (4 components)
  *   i % 3 == 1 → BMP 24-bit       (3 components)
  *   i % 3 == 2 → JPEG             (3 components)
  *
  * with width = 8 + i%16 and height = 8 + (i*7)%16 — pure arithmetic
  * in i, so the DuckDB oracle recomputes every expected value from a
  * `range()` without ever touching an image library. Pixel content is
  * a deterministic function of (i, x, y); it never enters the check
  * (JPEG is lossy) — only the header geometry does, which is exactly
  * what the header-only decoder reads. */
object ImageFixture {
  val root: String = "/tmp/graft_state/image_fixture"
  val n = 48

  def widthOf(i: Int): Int = 8 + i % 16
  def heightOf(i: Int): Int = 8 + (i * 7) % 16
  def formatOf(i: Int): String = (i % 3) match {
    case 0 => "png"; case 1 => "bmp"; case _ => "jpeg"
  }
  def channelsOf(i: Int): Int = if (i % 3 == 0) 4 else 3

  /** Write the fixture tree once per JVM (and reuse an intact one from
    * a prior run); returns the root directory. */
  def ensure(): String = synchronized {
    val dir = new File(root)
    val want = (0 until n).map(fileName).toSet
    val have = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    if (have != want) {
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); () }
      dir.mkdirs()
      (0 until n).foreach(write)
    }
    root
  }

  private def fileName(i: Int): String = f"img_$i%03d.${formatOf(i)}"

  /** NEAR-DUPLICATE variants for the perceptual-hash dedup path: the
    * same arithmetic pixel fill as image `i` with EXACTLY pixel (0,0)
    * overridden to a fixed color — one cell of the dHash grid moves,
    * so the variant lands within 1 bit of its original (the oracle
    * recomputes both hashes from the formulas). Lossless formats only
    * (`i % 3 != 2` — JPEG would perturb every pixel), first 24 ids. */
  val variantRoot: String = "/tmp/graft_state/image_fixture_variants"
  val VariantPixel: Int = 0xFF123456

  def ensureVariants(): String = synchronized {
    val dir = new File(variantRoot)
    val ids = (0 until 24).filter(_ % 3 != 2)
    val want = ids.map(i => f"var_$i%03d.${formatOf(i)}").toSet
    val have = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    if (have != want) {
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); () }
      dir.mkdirs()
      ids.foreach { i =>
        val img = filled(i)
        img.setRGB(0, 0, VariantPixel)
        val ok = javax.imageio.ImageIO.write(img, formatOf(i),
          new File(variantRoot, f"var_$i%03d.${formatOf(i)}"))
        require(ok, s"no JDK writer for ${formatOf(i)}")
      }
    }
    variantRoot
  }

  /** HEAVY variants for the banded-recall evaluation: the same
    * arithmetic fill with ONE pixel per scan row forced to white —
    * x = (i + y) % w at every y — so every dHash cell ROW (= every
    * 8-bit band) takes edits and the variant lands a MID-RANGE Hamming
    * distance from its original (several bits, spread across bands).
    * That is the regime where banding past the pigeonhole bound is
    * lossy, which is exactly what [[Multimodal.bandedRecallReport]]
    * exists to measure; the 1-pixel [[ensureVariants]] set only
    * exercises the lossless end. Lossless formats, first 24 ids, same
    * contract as ensureVariants (the oracle replays the override
    * formula relationally). */
  val heavyVariantRoot: String = "/tmp/graft_state/image_fixture_heavy"

  def ensureHeavyVariants(): String = synchronized {
    val dir = new File(heavyVariantRoot)
    val ids = (0 until 24).filter(_ % 3 != 2)
    val want = ids.map(i => f"hvar_$i%03d.${formatOf(i)}").toSet
    val have = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    if (have != want) {
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); () }
      dir.mkdirs()
      ids.foreach { i =>
        val img = filled(i)
        for (y <- 0 until img.getHeight)
          img.setRGB((i + y) % img.getWidth, y, 0xFFFFFFFF)
        val ok = javax.imageio.ImageIO.write(img, formatOf(i),
          new File(heavyVariantRoot, f"hvar_$i%03d.${formatOf(i)}"))
        require(ok, s"no JDK writer for ${formatOf(i)}")
      }
    }
    heavyVariantRoot
  }

  private def filled(i: Int): BufferedImage = {
    val (w, h) = (widthOf(i), heightOf(i))
    val imgType =
      if (i % 3 == 0) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_3BYTE_BGR
    val img = new BufferedImage(w, h, imgType)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, 0xFF000000 | ((i * 37 + x * 11 + y * 29) * 2654435761L).toInt & 0xFFFFFF)
    img
  }

  private def write(i: Int): Unit = {
    val ok = javax.imageio.ImageIO.write(filled(i), formatOf(i),
      new File(root, fileName(i)))
    require(ok, s"no JDK writer for ${formatOf(i)}")
  }
}

/** Deterministic audio fixtures for the real audio-decode path: `n`
  * tiny PCM clips of KNOWN header parameters, cycling the three
  * JDK-writable containers (WAV little-endian, AIFF and AU
  * big-endian), with
  *
  *   sample rate = 8000 + 1000·(i%5)
  *   channels    = 1 + i%2
  *   frames      = 200 + 40·(i%8)
  *
  * — pure arithmetic in i for the DuckDB `range()` oracle, same
  * contract as [[ImageFixture]]. Sample values are deterministic and
  * never enter the check; only the header does. */
object AudioFixture {
  val root: String = "/tmp/graft_state/audio_fixture"
  val n = 30

  def sampleRateOf(i: Int): Int = 8000 + 1000 * (i % 5)
  def channelsOf(i: Int): Int = 1 + i % 2
  def framesOf(i: Int): Int = 200 + 40 * (i % 8)
  def formatOf(i: Int): String = (i % 3) match {
    case 0 => "wave"; case 1 => "aiff"; case _ => "au"
  }

  def ensure(): String = synchronized {
    val dir = new File(root)
    val want = (0 until n).map(fileName).toSet
    val have = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    if (have != want) {
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); () }
      dir.mkdirs()
      (0 until n).foreach(write)
    }
    root
  }

  private def fileName(i: Int): String = {
    val ext = (i % 3) match { case 0 => "wav"; case 1 => "aiff"; case _ => "au" }
    f"clip_$i%03d.$ext"
  }

  private def write(i: Int): Unit = writeClip(i, root, fileName(i), mute0 = false)

  /** NEAR-DUPLICATE variants for the audio-fingerprint dedup path: the
    * same arithmetic PCM fill with EXACTLY the first sample of frame 0
    * muted (both bytes zero) — one energy window moves, so the variant
    * lands within 1 bit of its original (the oracle recomputes both
    * fingerprints from the byte formula). */
  val variantRoot: String = "/tmp/graft_state/audio_fixture_variants"

  def ensureVariants(): String = synchronized {
    val dir = new File(variantRoot)
    val want = (0 until n).map(i => "var_" + fileName(i).stripPrefix("clip_")).toSet
    val have = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    if (have != want) {
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); () }
      dir.mkdirs()
      (0 until n).foreach(i => writeClip(i, variantRoot,
        "var_" + fileName(i).stripPrefix("clip_"), mute0 = true))
    }
    variantRoot
  }

  /** HEAVY variants for the banded-recall evaluation — the audio
    * sibling of [[ImageFixture.ensureHeavyVariants]]: channel 0 of
    * every 8th frame muted, so edits land in EVERY energy window and
    * the variant sits a mid-range Hamming distance from its original
    * (several bits, spread across all width-8 bands — the lossy
    * regime [[Multimodal.bandedRecallReport]] measures). The oracle
    * replays the mute formula relationally. */
  val heavyVariantRoot: String = "/tmp/graft_state/audio_fixture_heavy"

  def ensureHeavyVariants(): String = synchronized {
    val dir = new File(heavyVariantRoot)
    val want = (0 until n).map(i => "hvar_" + fileName(i).stripPrefix("clip_")).toSet
    val have = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    if (have != want) {
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); () }
      dir.mkdirs()
      (0 until n).foreach(i => writeClip(i, heavyVariantRoot,
        "hvar_" + fileName(i).stripPrefix("clip_"), mute0 = false,
        muteEvery8 = true))
    }
    heavyVariantRoot
  }

  private def writeClip(i: Int, dir: String, name: String, mute0: Boolean,
      muteEvery8: Boolean = false): Unit = {
    import javax.sound.sampled._
    val (rate, ch, frames) = (sampleRateOf(i), channelsOf(i), framesOf(i))
    val fmt = new AudioFormat(rate.toFloat, 16, ch, true, i % 3 != 0) // WAV LE, AIFF/AU BE
    val pcm = Array.tabulate[Byte](frames * ch * 2)(j => ((i * 131 + j * 7) & 0x7F).toByte)
    if (mute0) { pcm(0) = 0; pcm(1) = 0 }
    if (muteEvery8)
      (0 until frames by 8).foreach { f =>
        pcm((f * ch) * 2) = 0
        pcm((f * ch) * 2 + 1) = 0
      }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val tpe = (i % 3) match {
      case 0 => AudioFileFormat.Type.WAVE
      case 1 => AudioFileFormat.Type.AIFF
      case _ => AudioFileFormat.Type.AU
    }
    val written = AudioSystem.write(ais, tpe, new File(dir, name))
    require(written > 0, s"no JDK writer for $tpe")
  }
}

/** Deterministic MP4 fixtures for the real container-decode path: `n`
  * minimal but VALID ISO-BMFF streams (`ftyp` + `moov`[`mvhd` +
  * `trak`×k]) of KNOWN header parameters,
  *
  *   timescale = 600·(1 + i%4)
  *   duration  = 600·(1 + i%10) ticks
  *   tracks    = 1 + i%2
  *   brand     = isom / mp42 (alternating)
  *
  * — pure arithmetic in i for the DuckDB `range()` oracle, same
  * contract as [[ImageFixture]]/[[AudioFixture]]. Container metadata
  * is exactly what a header-only video probe reads at scale; sample
  * data (mdat) never enters the check and none is written. Even files
  * use mvhd VERSION 1 (64-bit times) so both parser paths are
  * exercised end to end. */
object VideoFixture {
  import java.io.File
  val root: String = "/tmp/graft_state/video_fixture"
  val n = 24

  def timescaleOf(i: Int): Long = 600L * (1 + i % 4)
  def durationOf(i: Int): Long = 600L * (1 + i % 10)
  def tracksOf(i: Int): Int = 1 + i % 2
  def brandOf(i: Int): String = if (i % 2 == 0) "isom" else "mp42"
  /** Per-track sample (frame) count; every track of file i carries the
    * same two-entry stts and an explicit stsz size table sized 100+k,
    * so frame count AND mean frame size are arithmetic-known. */
  def framesOf(i: Int): Int = 8 + i % 5

  /** Fixture layout generation — bumped when the written byte shape
    * changes (file NAMES stay stable, so the freshness check needs a
    * marker, not just the name set; the dot-prefix keeps it invisible
    * to Spark's binary scan). */
  private val marker = ".fixture_v2_sample_tables"

  def ensure(): String = synchronized {
    val dir = new File(root)
    val want = (0 until n).map(fileName).toSet + marker
    val have = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    if (have != want) {
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); () }
      dir.mkdirs()
      (0 until n).foreach(write)
      val m = new java.io.FileOutputStream(new File(root, marker))
      try m.write(Array.empty[Byte]) finally m.close()
    }
    root
  }

  private def fileName(i: Int): String = f"vid_$i%03d.mp4"

  private def u32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)
  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    u32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
  }

  /** Fixture set for the CONTAINER-LEVEL video fingerprint
    * ([[Multimodal.videoFingerprint]]): same minimal ISO-BMFF shape but
    * with VARIED per-sample stsz sizes —
    *
    *   tracks   = 1 + i%2
    *   frames   = 40 + i%16 per track  (≥ 33 so adjacent 65-grid
    *              windows co-occupy and the print is value-sensitive,
    *              not just occupancy-sensitive)
    *   size(t,k) = 100 + (i*31 + t*53 + k*17) % 97
    *
    * — pure arithmetic in (i, t, k) for the DuckDB oracle. The main
    * [[ensure]] set keeps its monotone sizes (its decode oracle pins
    * mean_frame_bytes); monotone sizes print degenerately (every
    * window quieter than the next), hence this separate set. */
  val fpRoot: String = "/tmp/graft_state/video_fixture_fp"
  val fpVariantRoot: String = "/tmp/graft_state/video_fixture_fp_variants"

  def fpFramesOf(i: Int): Int = 40 + i % 16
  def fpSizeOf(i: Int, t: Int, k: Int): Long =
    100L + (i * 31 + t * 53 + k * 17) % 97

  def ensureFingerprintSet(): String = synchronized {
    ensureFpDir(fpRoot, "fvid", variant = false); fpRoot
  }

  /** NEAR-DUP variants: identical sample tables with EXACTLY track 1's
    * sample 0 grown by 911 bytes — one window of the print moves, so
    * the variant lands within a few bits of its original. */
  def ensureFingerprintVariants(): String = synchronized {
    ensureFpDir(fpVariantRoot, "fvar", variant = true); fpVariantRoot
  }

  private def ensureFpDir(root: String, prefix: String, variant: Boolean): Unit = {
    val dir = new File(root)
    val want = (0 until n).map(i => f"${prefix}_$i%03d.mp4").toSet
    val have = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    if (have != want) {
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); () }
      dir.mkdirs()
      (0 until n).foreach { i =>
        val bytes = fpBytes(i, variant)
        val out = new java.io.FileOutputStream(
          new File(root, f"${prefix}_$i%03d.mp4"))
        try out.write(bytes) finally out.close()
      }
    }
  }

  private def fpBytes(i: Int, variant: Boolean): Array[Byte] = {
    val ftyp = box("ftyp",
      brandOf(i).getBytes("US-ASCII"), u32(0), "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0),
      u32(0), u32(0),
      u32(timescaleOf(i)), u32(durationOf(i)),
      u32(0x00010000L), Array[Byte](1, 0),
      new Array[Byte](10),
      u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L),
      u32(0), u32(0), u32(0), u32(0x40000000L),
      new Array[Byte](24), u32(tracksOf(i) + 1L))
    val traks = (1 to tracksOf(i)).map { t =>
      val nf = fpFramesOf(i)
      val stsz = box("stsz", u32(0), u32(0), u32(nf.toLong),
        (0 until nf).toArray.flatMap { k =>
          val base = fpSizeOf(i, t, k)
          u32(if (variant && t == 1 && k == 0) base + 911 else base)
        })
      box("trak", box("mdia", box("minf", box("stbl", stsz))))
    }
    ftyp ++ box("moov", (mvhd +: traks): _*)
  }

  private def write(i: Int): Unit = {
    val ftyp = box("ftyp",
      brandOf(i).getBytes("US-ASCII"), u32(0), "isom".getBytes("US-ASCII"))
    val mvhd =
      if (i % 2 == 0)
        box("mvhd", Array[Byte](1, 0, 0, 0),      // version 1, flags
          u64(0), u64(0),                          // creation, modification
          u32(timescaleOf(i)), u64(durationOf(i)), // timescale, duration
          u32(0x00010000L), Array[Byte](1, 0),     // rate 1.0, volume 1.0
          new Array[Byte](10),                     // reserved
          u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L),
          u32(0), u32(0), u32(0), u32(0x40000000L), // unity matrix
          new Array[Byte](24), u32(tracksOf(i) + 1L)) // pre_defined, next id
      else
        box("mvhd", Array[Byte](0, 0, 0, 0),      // version 0
          u32(0), u32(0),
          u32(timescaleOf(i)), u32(durationOf(i)),
          u32(0x00010000L), Array[Byte](1, 0),
          new Array[Byte](10),
          u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L),
          u32(0), u32(0), u32(0), u32(0x40000000L),
          new Array[Byte](24), u32(tracksOf(i) + 1L))
    // each track carries a real sample table: a TWO-entry stts (n-1
    // samples at delta 100, then 1 at delta 200 — multi-entry parsing
    // is exercised, counts still sum to n) and an explicit stsz size
    // table (sample_size=0 → per-sample sizes 100+k), nested at the
    // spec path trak → mdia → minf → stbl
    val traks = (1 to tracksOf(i)).map { t =>
      val nf = framesOf(i)
      val stts = box("stts", u32(0), u32(2),
        u32(nf - 1L), u32(100), u32(1), u32(200))
      val stsz = box("stsz", u32(0), u32(0), u32(nf.toLong),
        (0 until nf).toArray.flatMap(k => u32(100L + k)))
      val stbl = box("stbl", stts, stsz)
      box("trak", box("tkhd", Array[Byte](0, 0, 0, 7), // v0, enabled flags
        u32(0), u32(0), u32(t.toLong), u32(0), u32(durationOf(i)),
        new Array[Byte](8), new Array[Byte](8),        // reserved, layer/group/vol/rsvd
        u32(0x00010000L), u32(0), u32(0), u32(0), u32(0x00010000L),
        u32(0), u32(0), u32(0), u32(0x40000000L),
        u32(640L << 16), u32(360L << 16)),             // 16.16 fixed w/h
        box("mdia", box("minf", stbl)))
    }
    val bytes = ftyp ++ box("moov", (mvhd +: traks): _*)
    val out = new java.io.FileOutputStream(new File(root, fileName(i)))
    try out.write(bytes) finally out.close()
  }
}
