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

  private def write(i: Int): Unit = {
    val (w, h) = (widthOf(i), heightOf(i))
    val imgType =
      if (i % 3 == 0) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_3BYTE_BGR
    val img = new BufferedImage(w, h, imgType)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, 0xFF000000 | ((i * 37 + x * 11 + y * 29) * 2654435761L).toInt & 0xFFFFFF)
    val ok = javax.imageio.ImageIO.write(img, formatOf(i), new File(root, fileName(i)))
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

  private def write(i: Int): Unit = {
    import javax.sound.sampled._
    val (rate, ch, frames) = (sampleRateOf(i), channelsOf(i), framesOf(i))
    val fmt = new AudioFormat(rate.toFloat, 16, ch, true, i % 3 != 0) // WAV LE, AIFF/AU BE
    val pcm = Array.tabulate[Byte](frames * ch * 2)(j => ((i * 131 + j * 7) & 0x7F).toByte)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val tpe = (i % 3) match {
      case 0 => AudioFileFormat.Type.WAVE
      case 1 => AudioFileFormat.Type.AIFF
      case _ => AudioFileFormat.Type.AU
    }
    val written = AudioSystem.write(ais, tpe, new File(root, fileName(i)))
    require(written > 0, s"no JDK writer for $tpe")
  }
}
