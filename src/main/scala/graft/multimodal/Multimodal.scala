package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (builder brief: image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * frame-sample as batch transforms).
  *
  * The reference's multimodal surface is the MP4 telemetry extraction
  * (images/mp4/process_mp4.sh:5-7 — ffmpeg pulls data stream #3, a
  * `gopro` binary renders metadata.json), i.e. binary in → typed
  * metadata out. Here that becomes: `binary` column + `struct` metadata
  * column, with the decode step executed per-partition in batches (the
  * JVM shape of a Pandas `mapInPandas` UDF).
  *
  * THE DECODE IS REAL FOR IMAGES, STUBBED FOR THE REST: the JDK's
  * `javax.imageio` registry (java.desktop — pure JVM, present in every
  * container this runs in) decodes PNG/JPEG/BMP/GIF/TIFF/WBMP headers,
  * so `decodeBatch` emits true width/height/channels/format for any
  * payload a registered reader sniffs (`multimodal_decode_image`
  * oracle-checks this against fixture images of known geometry). Bytes
  * NO reader claims — video, audio, text; their codecs don't ship in
  * this container — fall back to deterministic pseudo-metadata derived
  * from the sha256 of the bytes, which keeps the fallback a pure
  * function of content that the DuckDB oracle re-derives
  * (`multimodal_decode`). Swapping the fallback for ffmpeg changes no
  * plan shape: both paths run inside the same partition-batched seam.
  *
  * Scale: content bytes never shuffle — decode is a mapPartitions
  * (narrow), metadata is the only thing that aggregates. Frame sampling
  * explodes bounded per-row counts. At 100 TB the binary column stays
  * columnar-compressed in parquet and scan-pruned when queries touch
  * only metadata.
  */
object Multimodal {

  /** One binary record entering decode. */
  final case class MediaIn(doc_id: Long, content: Array[Byte])

  /** Typed metadata out of the (stubbed) decoder. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, content_hash: String,
      width: Int, height: Int, channels: Int, format: String)

  private def hexVal(c: Char): Int = Integer.parseInt(c.toString, 16)

  /** Header-only image decode of one payload via the JDK's ImageIO
    * reader registry. Reads the HEADER, not the pixel buffer:
    * width/height come from the stream metadata and the channel count
    * from the reader's image-type specifier, so per-row cost is
    * O(header bytes), not O(pixels) — the property that keeps a
    * metadata pass over a 100 TB media corpus affordable. None = no
    * registered reader claims the bytes (video/audio/text), or the
    * header is truncated/corrupt — the caller's fallback path.
    *
    * Sniffing must not MISCLAIM arbitrary bytes as images, so two lax
    * readers are gated: WBMP (no magic at all — its sniffer accepts
    * near-anything starting with low bytes) is rejected outright, and
    * BMP (magic is just "BM", two ASCII letters any text can open
    * with) is accepted only when the header's reserved bytes 6–9 are
    * zero, which the BMP spec mandates and running text never hits. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, String)] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          val fmt = r.getFormatName.toLowerCase
          val plausible = fmt match {
            case "wbmp" => false
            case "bmp" => bytes.length > 10 &&
              bytes(6) == 0 && bytes(7) == 0 && bytes(8) == 0 && bytes(9) == 0
            case _ => true // png/jpeg/gif/tiff: strong multi-byte magic
          }
          if (!plausible) None
          else {
            r.setInput(iis, true, true)
            val channels = r.getImageTypes(0).next().getColorModel.getNumComponents
            Some((r.getWidth(0), r.getHeight(0), channels, fmt))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Decode one batch: real header decode for anything the JVM's image
    * readers recognize; deterministic sha256-derived pseudo-metadata
    * for bytes no reader claims (the honest stand-in for codecs this
    * container lacks — a real ffmpeg integration lands in this same
    * per-partition batch seam, which is what a vectorized UDF needs
    * either way). */
  def decodeBatch(batch: Seq[MediaIn]): Seq[MediaMeta] = batch.map { m =>
    val h = graft.core.Hashing.sha256HexBytes(m.content) // raw bytes: non-UTF8 binaries must not collide
    decodeImage(m.content) match {
      case Some((w, ht, ch, fmt)) =>
        MediaMeta(m.doc_id, m.content.length.toLong, h, w, ht, ch, fmt)
      case None => MediaMeta(
        doc_id = m.doc_id,
        n_bytes = m.content.length.toLong,
        content_hash = h,
        width = 320 + 16 * hexVal(h.charAt(0)),
        height = 240 + 16 * hexVal(h.charAt(1)),
        channels = 1 + hexVal(h.charAt(2)) % 3,
        format = if (hexVal(h.charAt(3)) < 8) "rgb" else "yuv")
    }
  }

  /** Decode a binary column into typed metadata, batched per partition
    * (batch size mirrors an Arrow record batch). */
  def decode(ds: Dataset[MediaIn], batchSize: Int = 64): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Attach the metadata struct to a DataFrame carrying (doc_id,
    * content: binary): the multimodal column pattern — opaque bytes +
    * typed struct side by side. */
  def withMetadata(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val meta = decode(df.select(col("doc_id"), col("content")).as[MediaIn])
      .select(col("doc_id"),
        struct(col("n_bytes"), col("content_hash"), col("width"),
          col("height"), col("channels"), col("format")).as("meta"))
    df.join(meta, "doc_id")
  }

  /** Typed metadata out of the audio decoder. */
  final case class AudioMeta(
      doc_id: Long, n_bytes: Long, content_hash: String,
      sample_rate: Int, channels: Int, n_frames: Long, format: String)

  /** Header-only audio decode via the JDK's sampled-audio registry
    * (java.desktop ships WAV/AIFF/AU/SND parsers — pure JVM). Like
    * decodeImage: reads the header, never the sample data, so per-row
    * cost is O(header). None = not a recognized audio container or a
    * corrupt header. All three containers carry ≥ 4-byte magics
    * ("RIFF…WAVE", "FORM…AIFF", ".snd"), so there is no lax-sniffer
    * misclaim class to gate here. */
  def decodeAudioHeader(bytes: Array[Byte]): Option[(Int, Int, Long, String)] =
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val f = aff.getFormat
      Some((f.getSampleRate.toInt, f.getChannels, aff.getFrameLength.toLong,
        aff.getType.toString.toLowerCase))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Decode one audio batch: real header decode for JDK-recognized
    * containers, deterministic hash-derived pseudo-metadata for the
    * rest (the same honest-fallback contract as decodeBatch). */
  def decodeAudioBatch(batch: Seq[MediaIn]): Seq[AudioMeta] = batch.map { m =>
    val h = graft.core.Hashing.sha256HexBytes(m.content)
    decodeAudioHeader(m.content) match {
      case Some((rate, ch, frames, fmt)) =>
        AudioMeta(m.doc_id, m.content.length.toLong, h, rate, ch, frames, fmt)
      case None => AudioMeta(
        doc_id = m.doc_id,
        n_bytes = m.content.length.toLong,
        content_hash = h,
        sample_rate = 8000 + 800 * hexVal(h.charAt(0)),
        channels = 1 + hexVal(h.charAt(1)) % 2,
        n_frames = 1000L + 100L * hexVal(h.charAt(2)),
        format = "pcm")
    }
  }

  /** Audio decode over a binary Dataset, partition-batched like
    * decode. */
  def decodeAudio(ds: Dataset[MediaIn], batchSize: Int = 64): Dataset[AudioMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => decodeAudioBatch(g.toSeq)))
  }

  /** Typed metadata out of the video container probe. `n_frames` /
    * `sample_bytes` are summed over every track's sample tables
    * (stts/stsz); 0 for a container without them. */
  final case class VideoMeta(
      doc_id: Long, n_bytes: Long, content_hash: String,
      timescale: Long, duration_ticks: Long, n_tracks: Int, brand: String,
      n_frames: Long, sample_bytes: Long)

  /** Header-only MP4 (ISO-BMFF) container probe — REAL parsing, no
    * codec required: container metadata lives in big-endian
    * size-tagged boxes (`ftyp` brand; `moov` → `mvhd` timescale +
    * duration, one `trak` per stream), which is exactly what ffprobe
    * reads for duration/track topology without touching a sample. Both
    * mvhd versions are handled (v0 32-bit times, v1 64-bit). The walk
    * additionally descends each `trak → mdia → minf → stbl` to the
    * SAMPLE TABLES: `stsz` yields per-track frame counts and total
    * sample bytes (uniform-size and explicit-table forms both read),
    * summed across tracks — frame count and mean frame size from pure
    * header metadata, still codec-free (`stts` rides the same stbl;
    * the fixture exercises its multi-entry form). Per-row cost is
    * O(moov bytes) — the property that keeps a metadata pass over a
    * 100 TB video corpus affordable; sample data (`mdat`) is never
    * read. None = not ISO-BMFF (no `ftyp` at offset 4) or a
    * structurally corrupt box tree — the caller's fallback path. The
    * 4-byte `ftyp` magic at a fixed offset leaves no lax-sniffer
    * misclaim class to gate (the image path's WBMP/BMP problem). */
  def decodeVideoHeader(bytes: Array[Byte])
      : Option[(Long, Long, Int, String, Long, Long)] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def typ(off: Int): String = new String(bytes, off + 4, 4, "US-ASCII")
    // first direct child named `name` inside (start, end) — the
    // generic container walk; None on absence, a STRUCTURAL lie
    // (undersized / overrunning child) raises to the corrupt-tree path
    def child(start: Int, end: Int, name: String): Option[(Int, Int)] = {
      var c = start
      while (c + 8 <= end) {
        val cs = u32(c)
        if (cs < 8 || c + cs > end)
          throw new IndexOutOfBoundsException(s"corrupt box at $c")
        if (typ(c) == name) return Some((c + 8, c + cs.toInt))
        c += cs.toInt
      }
      None
    }
    // one track's sample-table contribution: (sample count, total
    // sample bytes) from stbl's stts/stsz at the spec nesting
    // trak → mdia → minf → stbl — 0s when the path is absent (a
    // bare-header container). stsz carries either a uniform
    // sample_size or an explicit per-sample table; both forms read.
    def sampleTables(trakStart: Int, trakEnd: Int): (Long, Long) = {
      val stbl = for {
        (ms, me) <- child(trakStart, trakEnd, "mdia")
        (fs, fe) <- child(ms, me, "minf")
        s <- child(fs, fe, "stbl")
      } yield s
      stbl match {
        case None => (0L, 0L)
        case Some((ss, se)) =>
          child(ss, se, "stsz") match {
            case None => (0L, 0L)
            case Some((zs, ze)) =>
              val uniform = u32(zs + 4)
              val count = u32(zs + 8)
              // a declared count whose explicit table overruns the stsz
              // box would silently read NEIGHBORING boxes' bytes as
              // sample sizes — a structural lie, so it raises to the
              // corrupt-tree path exactly as child() does; likewise a
              // uniform*count that cannot fit a Long
              val total =
                if (uniform > 0) {
                  if (count != 0L && uniform > Long.MaxValue / count)
                    throw new IndexOutOfBoundsException(
                      s"stsz uniform*count overflows at $zs")
                  uniform * count
                } else {
                  if (zs + 12 + 4L * count > ze)
                    throw new IndexOutOfBoundsException(
                      s"truncated stsz table at $zs: $count entries past box end $ze")
                  (0L until count).foldLeft(0L)((acc, k) =>
                    acc + u32(zs + 12 + 4 * k.toInt))
                }
              (count, total)
          }
      }
    }
    if (bytes.length < 16 || typ(0) != "ftyp") return None
    val brand = new String(bytes, 8, 4, "US-ASCII")
    var off = 0
    while (off + 8 <= bytes.length) {
      val size = u32(off)
      if (size < 8 || off + size > bytes.length) return None
      if (typ(off) == "moov") {
        var c = off + 8
        var ts = -1L; var dur = -1L; var tracks = 0
        var frames = 0L; var sampleBytes = 0L
        while (c + 8 <= off + size) {
          val cs = u32(c)
          if (cs < 8 || c + cs > off + size) return None
          typ(c) match {
            case "mvhd" if bytes(c + 8) == 1 => // v1: 64-bit times
              ts = u32(c + 28); dur = u64(c + 32)
            case "mvhd" => // v0: 32-bit times
              ts = u32(c + 20); dur = u32(c + 24)
            case "trak" =>
              tracks += 1
              val (f, b) = sampleTables(c + 8, c + cs.toInt)
              frames += f; sampleBytes += b
            case _ => ()
          }
          c += cs.toInt
        }
        return if (ts > 0) Some((ts, dur, tracks, brand, frames, sampleBytes)) else None
      }
      off += size.toInt
    }
    None
  }

  /** Decode one video batch: real container probe for ISO-BMFF bytes,
    * deterministic hash-derived pseudo-metadata for the rest (the same
    * honest-fallback contract as decodeBatch/decodeAudioBatch). */
  def decodeVideoBatch(batch: Seq[MediaIn]): Seq[VideoMeta] = batch.map { m =>
    val h = graft.core.Hashing.sha256HexBytes(m.content)
    try decodeVideoHeader(m.content) match {
      case Some((ts, dur, tracks, brand, frames, sampleBytes)) =>
        VideoMeta(m.doc_id, m.content.length.toLong, h, ts, dur, tracks, brand,
          frames, sampleBytes)
      case None => fallbackVideoMeta(m, h)
    } catch { // a hostile/truncated box tree must degrade, never throw
      case _: IndexOutOfBoundsException => fallbackVideoMeta(m, h)
    }
  }

  private def fallbackVideoMeta(m: MediaIn, h: String): VideoMeta =
    VideoMeta(
      doc_id = m.doc_id,
      n_bytes = m.content.length.toLong,
      content_hash = h,
      timescale = 600L * (1 + hexVal(h.charAt(0)) % 4),
      duration_ticks = 600L * (1 + hexVal(h.charAt(1)) % 10),
      n_tracks = 1 + hexVal(h.charAt(2)) % 2,
      brand = "none",
      n_frames = 8L + hexVal(h.charAt(3)) % 5,
      sample_bytes = 100L * (8 + hexVal(h.charAt(3)) % 5))

  /** Video probe over a binary Dataset, partition-batched like decode. */
  def decodeVideo(ds: Dataset[MediaIn], batchSize: Int = 64): Dataset[VideoMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => decodeVideoBatch(g.toSeq)))
  }

  /** One media record's stub feature vector (doc_id, per-dim rows via
    * posexplode downstream). */
  final case class MediaFeatures(doc_id: Long, features: Seq[Double])

  /** STUB feature extraction (the brief's feature-extract step): a
    * real implementation batches these bytes through an embedding
    * model right here — same seam, same batch shape as decodeBatch.
    * The stub derives dim hex-pair bytes of the sha256 normalized to
    * [0,1], so the oracle re-derives every component. */
  def extractFeaturesBatch(batch: Seq[MediaIn], dim: Int): Seq[MediaFeatures] = {
    require(dim >= 1 && dim <= 32, s"stub features take dim in [1,32], got $dim")
    batch.map { m =>
      val h = graft.core.Hashing.sha256HexBytes(m.content)
      val f = Array.tabulate(dim) { j =>
        (hexVal(h.charAt(2 * j)) * 16 + hexVal(h.charAt(2 * j + 1))) / 255.0
      }
      MediaFeatures(m.doc_id, f.toSeq)
    }
  }

  /** Feature extraction over a binary Dataset, partition-batched like
    * decode (the vectorized-UDF shape an embedding model needs). */
  def extractFeatures(ds: Dataset[MediaIn], dim: Int = 8,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => extractFeaturesBatch(g.toSeq, dim)))
  }

  /** Frame sampling: one row per sampled frame, frame count derived
    * (stub) from the content hash, frame id = hash(content, idx). The
    * explode is bounded (≤ maxFrames) so the fan-out is predictable. */
  def sampleFrames(metaDf: DataFrame, maxFrames: Int = 8): DataFrame =
    metaDf.select(col("doc_id"), col("meta.content_hash").as("content_hash"),
        (lit(1) + pmod(col("meta.n_bytes"), lit(maxFrames))).cast("int").as("n_frames"))
      .select(col("doc_id"), col("content_hash"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        sha2(concat(col("content_hash"), lit(":"), col("frame_idx").cast("string")), 256)
          .as("frame_hash"))

  /** Resize (stub): recompute target dimensions to fit `maxDim`
    * preserving aspect ratio — the metadata half of a real resize; the
    * pixel half would run in the same decodeBatch seam. Pure integer
    * math (floor scaling) so the oracle re-derives it. */
  def resizeMeta(metaDf: DataFrame, maxDim: Int = 256): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val longest = greatest(w, h)
    val needs = longest > maxDim
    val outW = when(needs, floor(w * lit(maxDim) / longest)).otherwise(w).cast("int")
    val outH = when(needs, floor(h * lit(maxDim) / longest)).otherwise(h).cast("int")
    metaDf.select(col("doc_id"), w.as("width"), h.as("height"),
      outW.as("resized_width"), outH.as("resized_height"))
  }

  /** One media item's 64-bit perceptual hash/fingerprint. */
  final case class MediaHash(doc_id: Long, hash: Long)

  /** `a*b > c*d` for NONNEGATIVE longs, EXACT under overflow — the
    * cross-multiplied window/cell comparisons all route through here
    * (unsigned 128-bit via Math.multiplyHigh): a >2 h max-volume
    * stereo clip or a container with u32-sized samples pushes the
    * products past Long.MaxValue, where a wrapped comparison would
    * silently invert fingerprint bits. */
  private def productGreater(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val h1 = Math.multiplyHigh(a, b)
    val h2 = Math.multiplyHigh(c, d)
    h1 > h2 ||
      (h1 == h2 && java.lang.Long.compareUnsigned(a * b, c * d) > 0)
  }

  /** dHash — the classic perceptual near-duplicate fingerprint: the
    * image box-downsamples to a 9×8 luminance grid and each bit
    * records whether a cell is brighter than its right neighbor, so
    * re-encodes, format conversions, and small pixel edits perturb
    * only the bits whose cells they touch while unrelated images land
    * ~32 bits apart. INTEGER-EXACT by construction (the oracle
    * recomputes it relationally): luminance is the BT.601 integer
    * sum 299r+587g+114b (never divided), cells partition pixels by
    * `cx = x*9/w`, `cy = y*8/h` (integer division), and the
    * brightness comparison cross-multiplies sums by counts instead of
    * averaging — no float enters the pipeline. An empty cell (w < 9)
    * contributes sum 0 with count clamped to 1. None = bytes no
    * reader decodes. */
  def dHash(bytes: Array[Byte]): Option[Long] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map(dHashOf)
    } catch { case scala.util.control.NonFatal(_) => None }

  private[multimodal] def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sum = Array.ofDim[Long](8, 9)
    val cnt = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cx = x * 9 / w
        val rgb = img.getRGB(x, y)
        sum(cy)(cx) += 299L * ((rgb >> 16) & 0xFF) +
          587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
        cnt(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val nL = math.max(cnt(cy)(cx), 1L)
        val nR = math.max(cnt(cy)(cx + 1), 1L)
        // avg(cx) > avg(cx+1), cross-multiplied exactly
        if (productGreater(sum(cy)(cx), nR, sum(cy)(cx + 1), nL))
          hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  /** dHash per row; rows whose bytes no reader decodes drop out
    * (they have no perceptual content to compare). */
  def dHashes(ds: Dataset[MediaIn]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.flatMap(m => dHash(m.content).map(MediaHash(m.doc_id, _)))
  }

  /** 64-bit PCM energy fingerprint — the AUDIO sibling of [[dHash]],
    * same integer-exact discipline so the oracle replays it: decode to
    * signed 16-bit PCM (the JDK's sampled-audio readers — WAV/AIFF/AU,
    * endianness per container), per-frame energy = Σ_channels
    * |sample| (integer), frames partition into 65 windows by
    * `w = f*65/F` (integer division), and bit w records whether
    * window w is louder than window w+1 via cross-multiplied
    * sums×counts — no float, no FFT (a chromaprint-class spectral
    * print slots into this same seam; the energy profile is the
    * codec-free deterministic baseline). Empty windows (F < 65) clamp
    * their count to 1. None = bytes no audio reader claims. */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    try {
      import javax.sound.sampled._
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val ch = fmt.getChannels
          val big = fmt.isBigEndian
          // the window grid comes from the HEADER's frame count, so the
          // PCM payload can STREAM through a bounded buffer instead of
          // materializing per row (an hour of 96 kHz stereo is ~1.4 GB;
          // the window state is 2×65 longs) — the same O(header-driven)
          // cost discipline as the image and video paths. A payload
          // shorter than its header claims leaves trailing windows
          // empty (count-clamped), matching the corrupt-input contract
          // of the decoders: degrade deterministically, never throw.
          val frameBytes = 2 * ch
          val sum = new Array[Long](65)
          val cnt = new Array[Long](65)
          def addFrame(buf: Array[Byte], off: Int, w: Int): Unit = {
            var c = 0
            var e = 0L
            while (c < ch) {
              val k = off + c * 2
              val v =
                if (big) (buf(k) << 8) | (buf(k + 1) & 0xFF)
                else (buf(k + 1) << 8) | (buf(k) & 0xFF)
              e += math.abs(v)
              c += 1
            }
            sum(w) += e
            cnt(w) += 1
          }
          val declared = ais.getFrameLength
          var f = 0L
          if (declared > 0) {
            val buf = new Array[Byte](frameBytes * 4096)
            var filled = 0
            var eof = false
            while (!eof && f < declared) {
              val n = ais.read(buf, filled, buf.length - filled)
              if (n < 0) eof = true
              else {
                filled += n
                val whole = filled / frameBytes
                var k = 0
                while (k < whole && f < declared) {
                  addFrame(buf, k * frameBytes, (f * 65 / declared).toInt)
                  f += 1
                  k += 1
                }
                val consumed = k * frameBytes
                System.arraycopy(buf, consumed, buf, 0, filled - consumed)
                filled -= consumed
              }
            }
          } else {
            // the container reports NO frame count (e.g. an AU stream
            // written with unknown length 0xFFFFFFFF): the window grid
            // needs F up front, so this rare shape materializes and
            // derives F from the payload — the pre-streaming behavior,
            // kept so unknown-length clips don't silently vanish from
            // dedup coverage
            val pcm = ais.readAllBytes()
            val frames = pcm.length / frameBytes
            while (f < frames) {
              addFrame(pcm, (f * frameBytes).toInt, (f * 65 / frames).toInt)
              f += 1
            }
          }
          if (f <= 0) None // declared frames but zero decodable payload
          else {
            var hash = 0L
            var w = 0
            while (w < 64) {
              val nL = math.max(cnt(w), 1L)
              val nR = math.max(cnt(w + 1), 1L)
              if (productGreater(sum(w), nR, sum(w + 1), nL)) hash |= 1L << w
              w += 1
            }
            Some(hash)
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** [[audioFingerprint]] per row, like [[dHashes]]. */
  def audioFingerprints(ds: Dataset[MediaIn]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.flatMap(m => audioFingerprint(m.content).map(MediaHash(m.doc_id, _)))
  }

  /** 64-bit VIDEO container fingerprint — CODEC-FREE near-dup for
    * ISO-BMFF: the per-sample size sequence from every track's `stsz`
    * (in track order — the same sample tables [[decodeVideoHeader]]
    * already walks) is the container's structural rhythm: a remux or
    * metadata edit preserves it exactly, a re-encode or cut perturbs
    * only the samples it touches. The print applies the identical
    * integer-exact window math as [[audioFingerprint]] with sample
    * SIZE standing in for frame energy: sizes partition into 65
    * windows by `w = g*65/N` over the global sample index, bit w =
    * cross-multiplied sums×counts comparison of window w vs w+1.
    * Per-row cost is O(sample-table bytes) — still header-only; `mdat`
    * is never read. None = not ISO-BMFF, a structurally corrupt box
    * tree, or no sample tables to print (uniform-size `stsz` reads
    * without materializing; a hostile uniform count past 2^24 degrades
    * to None like any other structural lie). */
  def videoFingerprint(bytes: Array[Byte]): Option[Long] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def typ(off: Int): String = new String(bytes, off + 4, 4, "US-ASCII")
    def child(start: Int, end: Int, name: String): Option[(Int, Int)] = {
      var c = start
      while (c + 8 <= end) {
        val cs = u32(c)
        if (cs < 8 || c + cs > end)
          throw new IndexOutOfBoundsException(s"corrupt box at $c")
        if (typ(c) == name) return Some((c + 8, c + cs.toInt))
        c += cs.toInt
      }
      None
    }
    try {
      if (bytes.length < 16 || typ(0) != "ftyp") return None
      var off = 0
      var moov: Option[(Int, Int)] = None
      while (off + 8 <= bytes.length && moov.isEmpty) {
        val size = u32(off)
        if (size < 8 || off + size > bytes.length) return None
        if (typ(off) == "moov") moov = Some((off + 8, off + size.toInt))
        off += size.toInt
      }
      moov.flatMap { case (ms, me) =>
        // pass 1: locate each track's stsz (uniform, count, table off)
        // in track order — N must be known before windows assign
        val descs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
        var c = ms
        while (c + 8 <= me) {
          val cs = u32(c)
          if (cs < 8 || c + cs > me)
            throw new IndexOutOfBoundsException(s"corrupt box at $c")
          if (typ(c) == "trak")
            for {
              (ds, de) <- child(c + 8, c + cs.toInt, "mdia")
              (fs, fe) <- child(ds, de, "minf")
              (ss, se) <- child(fs, fe, "stbl")
              (zs, ze) <- child(ss, se, "stsz")
            } {
              val uniform = u32(zs + 4)
              val count = u32(zs + 8)
              if (uniform > 0 && count > (1L << 24))
                throw new IndexOutOfBoundsException(
                  s"implausible uniform stsz count $count at $zs")
              if (uniform == 0 && zs + 12 + 4L * count > ze)
                throw new IndexOutOfBoundsException(
                  s"truncated stsz table at $zs: $count entries past box end $ze")
              descs += ((uniform, count, zs + 12))
            }
          c += cs.toInt
        }
        val total = descs.iterator.map(_._2).sum
        // the per-box cap bounds ONE uniform stsz; a crafted moov with
        // thousands of such traks could still sum to an unbounded
        // pass-2 loop — cap the AGGREGATE too (a 10 h 60 fps movie is
        // ~2×10^6 samples, well under 2^24)
        if (total > (1L << 24))
          throw new IndexOutOfBoundsException(
            s"implausible aggregate sample count $total")
        if (total <= 0) None
        else {
          // pass 2: stream the size sequence through the 65-window grid
          val sum = new Array[Long](65)
          val cnt = new Array[Long](65)
          var g = 0L
          descs.foreach { case (uniform, count, tOff) =>
            var k = 0L
            while (k < count) {
              val v = if (uniform > 0) uniform else u32(tOff + 4 * k.toInt)
              val w = (g * 65 / total).toInt
              sum(w) += v
              cnt(w) += 1
              g += 1
              k += 1
            }
          }
          var hash = 0L
          var w = 0
          while (w < 64) {
            val nL = math.max(cnt(w), 1L)
            val nR = math.max(cnt(w + 1), 1L)
            if (productGreater(sum(w), nR, sum(w + 1), nL)) hash |= 1L << w
            w += 1
          }
          Some(hash)
        }
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** [[videoFingerprint]] per row, like [[dHashes]]. */
  def videoFingerprints(ds: Dataset[MediaIn]): Dataset[MediaHash] = {
    import ds.sparkSession.implicits._
    ds.flatMap(m => videoFingerprint(m.content).map(MediaHash(m.doc_id, _)))
  }

  /** Perceptual near-duplicate pairs over (doc_id, hash) — shared by
    * the image (dHash) and audio (energy fingerprint) dedup paths:
    * the 64-bit hash splits into `bands`
    * equal slices and candidate pairs join on (band index, band
    * value) equality — a HASH join, never all-pairs, the same
    * banding shape as MinHash-LSH text dedup. Pigeonhole soundness:
    * two hashes within `maxDistance < bands` bits MUST agree on some
    * band, so blocking loses nothing at the declared threshold (the
    * require pins it). Verification is one codegen'd
    * `bit_count(xor)` per candidate. At 100 TB: decode cost is
    * one pass per image at ingest (store the hash column); pairing
    * shuffles only (id, 64-bit hash) scalars through band-keyed
    * exchanges. */
  def bandedNearDupPairs(hashes: DataFrame, maxDistance: Int = 3,
      bands: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxDistance >= 0 && maxDistance < bands,
      s"maxDistance $maxDistance needs $bands bands > it — pigeonhole " +
        "blocking only guarantees a shared band below the band count")
    bandedCandidates(hashes, bands)
      .filter(col("distance") <= maxDistance)
      .select("id_a", "id_b", "distance")
  }

  /** [[bandedNearDupPairs]] with the pigeonhole guard DELIBERATELY
    * waived — the production shape for thresholds the band count
    * cannot guarantee (e.g. Hamming ≤ 10 on 64-bit dHash with 8 bands,
    * where 16 guaranteed bands of width 4 would bucket-collide half
    * the corpus): same band-keyed hash join, same verification, but
    * pairs disagreeing on every band are MISSED. Run
    * [[bandedRecallReport]] first — it measures exactly this config's
    * recall/precision — and record the measured trade-off next to the
    * job; the explicit name is the opt-in. */
  def bandedNearDupPairsLossy(hashes: DataFrame, maxDistance: Int,
      bands: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxDistance >= 0, s"negative maxDistance: $maxDistance")
    bandedCandidates(hashes, bands)
      .filter(col("distance") <= maxDistance)
      .select("id_a", "id_b", "distance")
  }

  /** The CANDIDATE half of [[bandedNearDupPairs]]: every distinct pair
    * sharing at least one band, with its verified Hamming distance —
    * NO threshold and NO pigeonhole guard, because this is also the
    * lossy-regime primitive: past `bands - 1` bits a pair may disagree
    * on every band and never surface, which is exactly the trade-off
    * [[bandedRecallReport]] measures before anyone runs that config in
    * production. */
  def bandedCandidates(hashes: DataFrame, bands: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions._
    val banded = bandedIndex(hashes, bands)
    val left = banded.select(col("doc_id").as("id_a"), col("hash").as("h_a"),
      col("band"), col("bv"))
    val right = banded.select(col("doc_id").as("id_b"), col("hash").as("h_b"),
      col("band"), col("bv"))
    left.join(right, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "h_a", "h_b").distinct()
      .withColumn("distance",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int"))
  }

  /** Recall/precision report for the banded near-dup path — the eval a
    * production image/audio dedup runs BEFORE trusting a band config
    * past the pigeonhole bound (the `ann_recall_report` analog for this
    * family). For each threshold t: `n_true` = ALL pairs within t bits
    * (exact all-pairs baseline), `n_found` = banded candidates within
    * t, `recall = n_found / n_true`; `n_candidates` = every banded
    * candidate pair regardless of distance and
    * `precision = n_found / n_candidates` (the fraction of candidate
    * verifications that pay off at t). Thresholds below `bands` are
    * guaranteed recall 1.0 by pigeonhole; above it the report carries
    * the measured loss. The exact baseline is O(n²) BY DESIGN — this
    * is an EVAL operator: at 100 TB it runs over a drawn sample of the
    * corpus (the same contract as ann_recall_report's brute-force
    * half), never the corpus itself; the banded production path stays
    * all-pairs-free. */
  def bandedRecallReport(hashes: DataFrame, bands: Int = 8,
      thresholds: Seq[Int] = Seq(3, 7, 10, 16)): DataFrame = {
    import org.apache.spark.sql.functions._
    require(thresholds.nonEmpty, "no thresholds to evaluate")
    val spark = hashes.sparkSession
    val th = spark.createDataFrame(
      spark.sparkContext.parallelize(thresholds.map(Tuple1(_)), 1))
      .toDF("threshold")
    val a = hashes.select(col("doc_id").as("id_a"), col("hash").as("h_a"))
    val b = hashes.select(col("doc_id").as("id_b"), col("hash").as("h_b"))
    // all-pairs as a broadcast nested-loop (the eval sample is bounded
    // by contract), never a shuffle cartesian
    val exact = a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("int")
        .as("score"))
    val cand = bandedCandidates(hashes, bands)
      .select(col("distance").as("score"))
    graft.operators.RecallEval.aggregate(th, exact, cand,
      hit = _ <= _, config = Seq("bands" -> lit(bands)))
  }

  /** The hash frame exploded into its LSH band entries — the AT-REST
    * index layout for INCREMENTAL near-dup: (band, bv, doc_id, hash)
    * appended to a logged table once per arrival batch, so the next
    * batch probes the corpus-so-far with a band-keyed hash join
    * instead of rescanning it. */
  def bandedIndex(hashes: DataFrame, bands: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions._
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64: $bands")
    val width = 64 / bands
    // bands = 1 → width 64: 1L << 64 wraps to 1 (shift counts are mod
    // 64), so the all-bits mask must be spelled explicitly
    val mask = if (width == 64) -1L else (1L << width) - 1
    hashes.select(col("doc_id"), col("hash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          // arithmetic shift + mask ≡ logical shift + mask on the low
          // bits — the form both engines reproduce bit-identically
          shiftright(col("hash"), b * width).bitwiseAND(lit(mask)).as("bv"))
      ): _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bv").as("bv"),
        col("doc_id"), col("hash"),
        // the band count rides every row so a probe with a DIFFERENT
        // band count fails loudly instead of silently joining nothing
        lit(bands).as("bands"))
  }

  /** Probe an at-rest [[bandedIndex]] with an ARRIVING hash batch —
    * incremental near-dup detection: each arriving hash joins only
    * the index buckets its bands select, so per-batch work scales
    * with the INCREMENT × matched buckets, never the corpus (probe
    * BEFORE appending the batch's own bands, so a batch never
    * self-pairs through the index). Same pigeonhole soundness
    * contract as [[bandedNearDupPairs]]. Output: (index_id,
    * incoming_id, distance). */
  def probeBandedIndex(index: DataFrame, incoming: DataFrame,
      maxDistance: Int = 3, bands: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions._
    require(maxDistance >= 0 && maxDistance < bands,
      s"maxDistance $maxDistance needs $bands bands > it — pigeonhole " +
        "blocking only guarantees a shared band below the band count")
    // an index built with a DIFFERENT band count would (band, bv)-join
    // almost nothing — silent recall loss. The guard rides IN the plan
    // (a filter whose assert_true raises on the first mismatched row)
    // so it costs zero extra Spark jobs per probe — a streaming loop
    // probes every micro-batch, and a driver-side row-peek here was one
    // wasted job each (round-12 advisory). Logged indexes carry the
    // band count in their properties ledger too — [[probeBandedIndexAt]]
    // validates that metadata-only, before any plan is built.
    val guarded =
      if (index.columns.contains("bands"))
        index.filter(assert_true(col("bands") === lit(bands),
          concat(lit("at-rest index was built with "), col("bands"),
            lit(s" bands; probing with $bands would silently miss " +
              "near-duplicates"))).isNull)
      else index
    val probe = bandedIndex(incoming, bands)
      .select(col("band"), col("bv"),
        col("doc_id").as("incoming_id"), col("hash").as("h_in"))
    guarded
      .select(col("band"), col("bv"),
        col("doc_id").as("index_id"), col("hash").as("h_ix"))
      .join(probe, Seq("band", "bv"))
      .filter(col("index_id") =!= col("incoming_id"))
      .select("index_id", "incoming_id", "h_ix", "h_in").distinct()
      .withColumn("distance",
        bit_count(col("h_ix").bitwiseXOR(col("h_in"))).cast("int"))
      .filter(col("distance") <= maxDistance)
      .select("index_id", "incoming_id", "distance")
  }

  /** Properties-ledger key recording a logged banded index's band
    * count — written at append time so probes validate the layout
    * metadata-only (one driver-side log read, zero Spark jobs). */
  val BandsProperty = "graft.bands"

  /** Refuse a band count that contradicts the index's recorded layout
    * — BEFORE any data lands (an index mixing band counts is silent
    * recall loss). No-op for a table not yet stamped. */
  private def requireBandsMatch(spark: SparkSession, tablePath: String,
      bands: Int): Unit =
    graft.store.CommitLog.propertiesAt(spark, tablePath).get(BandsProperty)
      .foreach { v =>
        require(v.toInt == bands,
          s"banded index $tablePath was built with $v bands; " +
            s"appending/probing with $bands would silently miss near-duplicates")
      }

  /** CLAIM the band-count layout BEFORE any data lands — one fenced
    * metadata commit per table lifetime
    * ([[graft.store.CommitLog.setPropertiesIfAbsent]]). Two writers
    * bootstrapping the same index with DIFFERENT band counts serialize
    * here: exactly one claim commits; the loser re-reads and
    * [[requireBandsMatch]] refuses its mismatched layout before a
    * single row lands — the stamp-after-append ordering this replaces
    * let both appends land and then recorded one count over a mixed
    * index (silent recall loss). A crash between the claim and the
    * first append leaves an empty STAMPED table: every later append
    * must match, nothing can ever mix. */
  private def claimOrCheckBands(spark: SparkSession, tablePath: String,
      bands: Int): Unit =
    if (!graft.store.CommitLog.setPropertiesIfAbsent(spark, tablePath,
        Map(BandsProperty -> bands.toString)))
      requireBandsMatch(spark, tablePath, bands)

  /** Append a hash batch's band entries to an AT-REST logged index
    * (creating it on first use), claiming the band count in the
    * table's properties ledger BEFORE the data commit so later probes
    * and appends validate the layout without touching data. A
    * mismatched band count is refused before any data lands. */
  def appendBandedIndex(spark: SparkSession, tablePath: String,
      hashes: DataFrame, bands: Int = 4): Long = {
    import graft.store.CommitLog
    claimOrCheckBands(spark, tablePath, bands)
    CommitLog.append(bandedIndex(hashes, bands), tablePath,
      mergeSchema = true)
  }

  /** [[appendBandedIndex]] with exactly-once streaming semantics: the
    * band append rides [[graft.store.CommitLog.appendOnce]]'s
    * `txn=<queryId>:<batchId>` claim, so a replayed micro-batch is
    * fenced to a no-op instead of double-inserting band entries.
    * Returns the version won, None for a replay skip. */
  def appendBandedIndexOnce(spark: SparkSession, tablePath: String,
      hashes: DataFrame, queryId: String, batchId: Long,
      bands: Int = 4): Option[Long] = {
    import graft.store.CommitLog
    claimOrCheckBands(spark, tablePath, bands)
    CommitLog.appendOnce(bandedIndex(hashes, bands), tablePath,
      queryId, batchId)
  }

  /** Probe a LOGGED at-rest banded index by table path: the band-count
    * layout check reads the table's properties ledger — driver-side
    * metadata, ZERO Spark jobs — then hands the snapshot to
    * [[probeBandedIndex]]. This is the probe a streaming loop calls
    * every micro-batch. */
  def probeBandedIndexAt(spark: SparkSession, tablePath: String,
      incoming: DataFrame, maxDistance: Int = 3, bands: Int = 4): DataFrame = {
    import graft.store.CommitLog
    requireBandsMatch(spark, tablePath, bands)
    probeBandedIndex(
      CommitLog.read(spark, tablePath, CommitLog.tableSchema(spark, tablePath)),
      incoming, maxDistance, bands)
  }

  /** Binary scan of an object tree (S5/S6's Spark shape): the
    * binaryFile datasource — content + length + path, executor-side
    * reads, no driver materialization. */
  def scanBinary(spark: SparkSession, rootDir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(rootDir)
      .select(
        // substring, not regexp_replace: a root containing regex
        // metacharacters must not corrupt (or crash) the key-stripping
        col("path").substr(lit(s"file:$rootDir/".length + 1), length(col("path")))
          .as("key"),
        col("length"), col("content"))
}
