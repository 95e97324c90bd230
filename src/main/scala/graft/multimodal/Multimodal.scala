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
  * THE DECODE IS A STUB: no image/audio libs ship in this container, so
  * `decodeBatch` derives deterministic pseudo-metadata from the sha256
  * of the bytes. Every piece of Spark plumbing around it — binary
  * schema, typed Dataset, partition-batched iteration, exploded frame
  * sampling — is real; swapping `decodeBatch`'s body for an actual
  * decoder changes no plan shape. Because the stub is a pure function
  * of the bytes, the DuckDB oracle re-derives every value (full
  * value-level check of the plumbing).
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

  /** STUB decode of one batch. Real implementation: hand `batch` to an
    * image/audio codec (libjpeg/ffmpeg/...) exactly here — the
    * per-partition batching is what a vectorized UDF needs either way. */
  def decodeBatch(batch: Seq[MediaIn]): Seq[MediaMeta] = batch.map { m =>
    val h = graft.core.Hashing.sha256HexBytes(m.content) // raw bytes: non-UTF8 binaries must not collide
    MediaMeta(
      doc_id = m.doc_id,
      n_bytes = m.content.length.toLong,
      content_hash = h,
      width = 320 + 16 * hexVal(h.charAt(0)),
      height = 240 + 16 * hexVal(h.charAt(1)),
      channels = 1 + hexVal(h.charAt(2)) % 3,
      format = if (hexVal(h.charAt(3)) < 8) "rgb" else "yuv")
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
