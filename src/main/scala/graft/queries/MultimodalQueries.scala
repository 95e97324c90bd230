package graft.queries

import graft.{Q, Tables}
import graft.ingest.FixtureTree
import graft.multimodal.{AudioFixture, ImageFixture, Multimodal, VideoFixture}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the multimodal-column family. The binary
  * payloads are the documents' UTF-8 bytes (and the fixture-tree files
  * whose content is their own key), so DuckDB can re-derive n_bytes /
  * hashes / stub-decoded metadata from text alone — a full value check
  * of the mapPartitions decode plumbing.
  */
object MultimodalQueries {

  /** documents with a real binary content column (UTF-8 of text). */
  private def mediaDocs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("content"))

  private val hexValSql = (c: String) => s"(instr('0123456789abcdef', $c) - 1)"

  /** The shared dHash-pipeline CTEs (DuckDB): fixture ids → arithmetic
    * pixels → luminance cells → gradient bits → 64-bit hashes → band
    * values. The three phash oracles here — and StreamQueries'
    * stream_phash_incremental — compose their own pair/cluster finals
    * over `banded`. */
  private[queries] val PhashPipelineCtes: String =
    """ids AS (
      |  SELECT i AS img, CAST(i AS BIGINT) AS id
      |  FROM range(0, 48) t(i) WHERE i % 3 <> 2
      |  UNION ALL
      |  SELECT i, 1000 + i FROM range(0, 24) t(i) WHERE i % 3 <> 2
      |  UNION ALL
      |  SELECT i, 2000 + i FROM range(0, 24) t(i) WHERE i % 3 <> 2),
      |dims AS (
      |  SELECT DISTINCT img, 8 + img % 16 AS w, 8 + (img * 7) % 16 AS h
      |  FROM ids),
      |pix AS (
      |  SELECT i.id, i.img, d.w, d.h, xs.x, ys.y,
      |    CASE WHEN i.id >= 2000 AND xs.x = 0 AND ys.y = 0 THEN 45710
      |         ELSE 299 * ((v.v >> 16) & 255) + 587 * ((v.v >> 8) & 255)
      |              + 114 * (v.v & 255) END AS gray
      |  FROM ids i
      |  JOIN dims d USING (img)
      |  CROSS JOIN range(0, 24) xs(x)
      |  CROSS JOIN range(0, 24) ys(y)
      |  CROSS JOIN LATERAL (SELECT
      |    ((i.img * 37 + xs.x * 11 + ys.y * 29) * 2654435761) & 16777215 AS v) v
      |  WHERE xs.x < d.w AND ys.y < d.h),
      |cells AS (
      |  SELECT id, (y * 8) // h AS cy, (x * 9) // w AS cx,
      |    SUM(gray) AS s, COUNT(*) AS n
      |  FROM pix GROUP BY id, (y * 8) // h, (x * 9) // w),
      |grid AS (
      |  SELECT b.id, cys.cy, cxs.cx,
      |    COALESCE(c.s, 0) AS s, GREATEST(COALESCE(c.n, 0), 1) AS n
      |  FROM (SELECT DISTINCT id FROM ids) b
      |  CROSS JOIN range(0, 8) cys(cy)
      |  CROSS JOIN range(0, 9) cxs(cx)
      |  LEFT JOIN cells c ON c.id = b.id AND c.cy = cys.cy AND c.cx = cxs.cx),
      |bits AS (
      |  SELECT l.id, l.cy, l.cx,
      |    CASE WHEN l.s * r.n > r.s * l.n THEN 1 ELSE 0 END AS bit
      |  FROM grid l
      |  JOIN grid r ON r.id = l.id AND r.cy = l.cy AND r.cx = l.cx + 1
      |  WHERE l.cx < 8),
      |hashes AS (
      |  SELECT id, CAST(SUM(CASE
      |      WHEN cy * 8 + cx = 63
      |        THEN CASE WHEN bit = 1 THEN -9223372036854775808 ELSE 0 END
      |      ELSE bit * (1::BIGINT << (cy * 8 + cx)) END) AS BIGINT) AS dhash
      |  FROM bits GROUP BY id),
      |banded AS (
      |  SELECT id, dhash, bs.band, (dhash >> (bs.band * 16)) & 65535 AS bv
      |  FROM hashes CROSS JOIN range(0, 4) bs(band))""".stripMargin

  /** The AUDIO print pipeline (DuckDB): 30 originals + 30 bit-identical
    * copies (1000s) + 30 one-sample-muted variants (2000s) → PCM energy
    * → 65 windows → 64 brightness bits → 64-bit print → width-16 band
    * values. Shared by multimodal_audio_fingerprint and
    * stream_audio_incremental so the batch operator and the streaming
    * drain replay the identical pipeline. */
  private[queries] val AudioPipelineCtes: String =
    """ids AS (
      |  SELECT i AS clip, CAST(i AS BIGINT) AS id, 0 AS muted
      |  FROM range(0, 30) t(i)
      |  UNION ALL SELECT i, 1000 + i, 0 FROM range(0, 30) t(i)
      |  UNION ALL SELECT i, 2000 + i, 1 FROM range(0, 30) t(i)),
      |dims AS (
      |  SELECT DISTINCT clip, 1 + clip % 2 AS ch,
      |    200 + 40 * (clip % 8) AS frames
      |  FROM ids),
      |e AS (
      |  SELECT i.id, d.frames, fs.f,
      |    SUM(CASE WHEN i.muted = 1 AND fs.f = 0 AND cs.c = 0 THEN 0
      |      WHEN i.clip % 3 = 0
      |        THEN ((i.clip*131 + (2*(fs.f*d.ch+cs.c)+1)*7) & 127) * 256
      |             + ((i.clip*131 + (2*(fs.f*d.ch+cs.c))*7) & 127)
      |      ELSE ((i.clip*131 + (2*(fs.f*d.ch+cs.c))*7) & 127) * 256
      |           + ((i.clip*131 + (2*(fs.f*d.ch+cs.c)+1)*7) & 127)
      |      END) AS e
      |  FROM ids i
      |  JOIN dims d USING (clip)
      |  CROSS JOIN range(0, 480) fs(f)
      |  CROSS JOIN range(0, 2) cs(c)
      |  WHERE fs.f < d.frames AND cs.c < d.ch
      |  GROUP BY i.id, d.frames, fs.f),
      |win AS (
      |  SELECT id, (f * 65) // frames AS w, SUM(e) AS s, COUNT(*) AS n
      |  FROM e GROUP BY id, (f * 65) // frames),
      |grid AS (
      |  SELECT b.id, ws.w, COALESCE(win.s, 0) AS s,
      |    GREATEST(COALESCE(win.n, 0), 1) AS n
      |  FROM (SELECT DISTINCT id FROM ids) b
      |  CROSS JOIN range(0, 65) ws(w)
      |  LEFT JOIN win ON win.id = b.id AND win.w = ws.w),
      |bits AS (
      |  SELECT l.id, l.w,
      |    CASE WHEN l.s * r.n > r.s * l.n THEN 1 ELSE 0 END AS bit
      |  FROM grid l JOIN grid r ON r.id = l.id AND r.w = l.w + 1
      |  WHERE l.w < 64),
      |hashes AS (
      |  SELECT id, CAST(SUM(CASE
      |      WHEN w = 63 THEN CASE WHEN bit = 1 THEN -9223372036854775808 ELSE 0 END
      |      ELSE bit * (1::BIGINT << w) END) AS BIGINT) AS h
      |  FROM bits GROUP BY id),
      |banded AS (
      |  SELECT id, h, bs.band, (h >> (bs.band * 16)) & 65535 AS bv
      |  FROM hashes CROSS JOIN range(0, 4) bs(band))""".stripMargin

  /** The VIDEO container-fingerprint pipeline (DuckDB): 24 varied-size
    * fixtures + 24 bit-identical copies (1000s) + 24 one-sample-grown
    * variants (2000s) → stsz size sequence → 65 windows → 64 bits →
    * 64-bit print → width-16 band values. Shared by
    * multimodal_video_fingerprint and stream_video_incremental. */
  private[queries] val VideoPipelineCtes: String =
    """ids AS (
      |  SELECT i AS vid, CAST(i AS BIGINT) AS id, 0 AS mut
      |  FROM range(0, 24) t(i)
      |  UNION ALL SELECT i, 1000 + i, 0 FROM range(0, 24) t(i)
      |  UNION ALL SELECT i, 2000 + i, 1 FROM range(0, 24) t(i)),
      |dims AS (
      |  SELECT DISTINCT vid, 1 + vid % 2 AS tr, 40 + vid % 16 AS nf
      |  FROM ids),
      |sizes AS (
      |  SELECT i.id, d.tr * d.nf AS total, gs.g,
      |    100 + (i.vid * 31 + (gs.g // d.nf + 1) * 53 + (gs.g % d.nf) * 17) % 97
      |      + CASE WHEN i.mut = 1 AND gs.g = 0 THEN 911 ELSE 0 END AS sz
      |  FROM ids i
      |  JOIN dims d USING (vid)
      |  CROSS JOIN range(0, 112) gs(g)
      |  WHERE gs.g < d.tr * d.nf),
      |win AS (
      |  SELECT id, (g * 65) // total AS w, SUM(sz) AS s, COUNT(*) AS n
      |  FROM sizes GROUP BY id, (g * 65) // total),
      |grid AS (
      |  SELECT b.id, ws.w, COALESCE(win.s, 0) AS s,
      |    GREATEST(COALESCE(win.n, 0), 1) AS n
      |  FROM (SELECT DISTINCT id FROM ids) b
      |  CROSS JOIN range(0, 65) ws(w)
      |  LEFT JOIN win ON win.id = b.id AND win.w = ws.w),
      |bits AS (
      |  SELECT l.id, l.w,
      |    CASE WHEN l.s * r.n > r.s * l.n THEN 1 ELSE 0 END AS bit
      |  FROM grid l JOIN grid r ON r.id = l.id AND r.w = l.w + 1
      |  WHERE l.w < 64),
      |hashes AS (
      |  SELECT id, CAST(SUM(CASE
      |      WHEN w = 63 THEN CASE WHEN bit = 1 THEN -9223372036854775808 ELSE 0 END
      |      ELSE bit * (1::BIGINT << w) END) AS BIGINT) AS h
      |  FROM bits GROUP BY id),
      |banded AS (
      |  SELECT id, h, bs.band, (h >> (bs.band * 16)) & 65535 AS bv
      |  FROM hashes CROSS JOIN range(0, 4) bs(band))""".stripMargin

  /** The recall-evaluation corpus pipeline (DuckDB): originals +
    * 1-pixel variants (2000s) + heavy one-white-pixel-per-row variants
    * (3000s) → 64-bit hashes → WIDTH-8 band values (the lossy-regime
    * config). Shared by multimodal_phash_recall and
    * multimodal_phash_lossy_near_dup so the report and the operator it
    * justifies replay the identical pipeline. */
  private val PhashRecallCtes: String =
    """ids AS (
      |  SELECT i AS img, CAST(i AS BIGINT) AS id
      |  FROM range(0, 48) t(i) WHERE i % 3 <> 2
      |  UNION ALL
      |  SELECT i, 2000 + i FROM range(0, 24) t(i) WHERE i % 3 <> 2
      |  UNION ALL
      |  SELECT i, 3000 + i FROM range(0, 24) t(i) WHERE i % 3 <> 2),
      |dims AS (
      |  SELECT DISTINCT img, 8 + img % 16 AS w, 8 + (img * 7) % 16 AS h
      |  FROM ids),
      |pix AS (
      |  SELECT i.id, i.img, d.w, d.h, xs.x, ys.y,
      |    CASE WHEN i.id >= 3000 AND xs.x = (i.img + ys.y) % d.w THEN 255000
      |         WHEN i.id >= 2000 AND i.id < 3000 AND xs.x = 0 AND ys.y = 0
      |           THEN 45710
      |         ELSE 299 * ((v.v >> 16) & 255) + 587 * ((v.v >> 8) & 255)
      |              + 114 * (v.v & 255) END AS gray
      |  FROM ids i
      |  JOIN dims d USING (img)
      |  CROSS JOIN range(0, 24) xs(x)
      |  CROSS JOIN range(0, 24) ys(y)
      |  CROSS JOIN LATERAL (SELECT
      |    ((i.img * 37 + xs.x * 11 + ys.y * 29) * 2654435761) & 16777215 AS v) v
      |  WHERE xs.x < d.w AND ys.y < d.h),
      |cells AS (
      |  SELECT id, (y * 8) // h AS cy, (x * 9) // w AS cx,
      |    SUM(gray) AS s, COUNT(*) AS n
      |  FROM pix GROUP BY id, (y * 8) // h, (x * 9) // w),
      |grid AS (
      |  SELECT b.id, cys.cy, cxs.cx,
      |    COALESCE(c.s, 0) AS s, GREATEST(COALESCE(c.n, 0), 1) AS n
      |  FROM (SELECT DISTINCT id FROM ids) b
      |  CROSS JOIN range(0, 8) cys(cy)
      |  CROSS JOIN range(0, 9) cxs(cx)
      |  LEFT JOIN cells c ON c.id = b.id AND c.cy = cys.cy AND c.cx = cxs.cx),
      |bits AS (
      |  SELECT l.id, l.cy, l.cx,
      |    CASE WHEN l.s * r.n > r.s * l.n THEN 1 ELSE 0 END AS bit
      |  FROM grid l
      |  JOIN grid r ON r.id = l.id AND r.cy = l.cy AND r.cx = l.cx + 1
      |  WHERE l.cx < 8),
      |hashes AS (
      |  SELECT id, CAST(SUM(CASE
      |      WHEN cy * 8 + cx = 63
      |        THEN CASE WHEN bit = 1 THEN -9223372036854775808 ELSE 0 END
      |      ELSE bit * (1::BIGINT << (cy * 8 + cx)) END) AS BIGINT) AS dhash
      |  FROM bits GROUP BY id),
      |banded8 AS (
      |  SELECT id, dhash, bs.band, (dhash >> (bs.band * 8)) & 255 AS bv
      |  FROM hashes CROSS JOIN range(0, 8) bs(band))""".stripMargin

  val queries: Seq[Q] = Seq(

    // ── Decode: binary → typed metadata struct via batched mapPartitions
    Q(
      "multimodal_decode",
      s"""SELECT doc_id,
         |  CAST(strlen(text) AS BIGINT) AS n_bytes,
         |  sha256(text) AS content_hash,
         |  CAST(320 + 16 * ${hexValSql("substring(sha256(text), 1, 1)")} AS INTEGER) AS width,
         |  CAST(240 + 16 * ${hexValSql("substring(sha256(text), 2, 1)")} AS INTEGER) AS height,
         |  CAST(1 + ${hexValSql("substring(sha256(text), 3, 1)")} % 3 AS INTEGER) AS channels,
         |  CASE WHEN ${hexValSql("substring(sha256(text), 4, 1)")} < 8
         |       THEN 'rgb' ELSE 'yuv' END AS format
         |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      Multimodal.decode(mediaDocs(s, dir).as[Multimodal.MediaIn]).toDF()
    },

    // ── REAL image decode: fixture images of known geometry (pure
    // arithmetic in the image index — ImageFixture), scanned via the
    // binaryFile source and decoded header-only by the JDK's ImageIO
    // readers. The oracle recomputes width/height/channels/format from
    // range() alone — if the engine's decode path were hashing instead
    // of decoding, every row would miss. ───────────────────────────────
    Q(
      "multimodal_decode_image",
      """SELECT CAST(i AS BIGINT) AS doc_id,
        |  CAST(8 + i % 16 AS INTEGER) AS width,
        |  CAST(8 + (i * 7) % 16 AS INTEGER) AS height,
        |  CAST(CASE WHEN i % 3 = 0 THEN 4 ELSE 3 END AS INTEGER) AS channels,
        |  CASE i % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'jpeg' END AS format
        |FROM range(0, 48) t(i)""".stripMargin) { (s, _) =>
      import s.implicits._
      val media = Multimodal.scanBinary(s, ImageFixture.ensure())
        .select(regexp_extract(col("key"), "img_(\\d+)", 1).cast("long").as("doc_id"),
          col("content"))
        .as[Multimodal.MediaIn]
      Multimodal.decode(media).toDF()
        .select("doc_id", "width", "height", "channels", "format")
    },

    // ── REAL audio decode: same contract as the image row — fixture
    // clips of arithmetic-known header parameters (WAV/AIFF/AU),
    // header-only decode via the JDK's sampled-audio registry, oracle
    // recomputed from range() alone. ───────────────────────────────────
    Q(
      "multimodal_decode_audio",
      """SELECT CAST(i AS BIGINT) AS doc_id,
        |  CAST(8000 + 1000 * (i % 5) AS INTEGER) AS sample_rate,
        |  CAST(1 + i % 2 AS INTEGER) AS channels,
        |  CAST(200 + 40 * (i % 8) AS BIGINT) AS n_frames,
        |  CASE i % 3 WHEN 0 THEN 'wave' WHEN 1 THEN 'aiff' ELSE 'au' END AS format
        |FROM range(0, 30) t(i)""".stripMargin) { (s, _) =>
      import s.implicits._
      val media = Multimodal.scanBinary(s, AudioFixture.ensure())
        .select(regexp_extract(col("key"), "clip_(\\d+)", 1).cast("long").as("doc_id"),
          col("content"))
        .as[Multimodal.MediaIn]
      Multimodal.decodeAudio(media).toDF()
        .select("doc_id", "sample_rate", "channels", "n_frames", "format")
    },

    // ── REAL video container decode: ISO-BMFF fixtures of
    // arithmetic-known mvhd/trak parameters (both mvhd versions),
    // parsed box-by-box — container metadata without a codec, oracle
    // recomputed from range() alone. duration_s = ticks/timescale is
    // computed IN the engine to prove the unit relationship, not just
    // the raw fields. ─────────────────────────────────────────────────
    Q(
      "multimodal_decode_video",
      """WITH t AS (SELECT i, 8 + i % 5 AS fr, 1 + i % 2 AS tr FROM range(0, 24) t(i))
        |SELECT CAST(i AS BIGINT) AS doc_id,
        |  CAST(600 * (1 + i % 4) AS BIGINT) AS timescale,
        |  CAST(600 * (1 + i % 10) AS BIGINT) AS duration_ticks,
        |  CAST(tr AS INTEGER) AS n_tracks,
        |  CASE WHEN i % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
        |  round(CAST(600 * (1 + i % 10) AS DOUBLE)
        |    / (600 * (1 + i % 4)), 6) AS duration_s,
        |  CAST(tr * fr AS BIGINT) AS n_frames,
        |  round(CAST(tr * (100 * fr + fr * (fr - 1) / 2) AS DOUBLE)
        |    / (tr * fr), 6) AS mean_frame_bytes
        |FROM t""".stripMargin) { (s, _) =>
      import s.implicits._
      val media = Multimodal.scanBinary(s, VideoFixture.ensure())
        .select(regexp_extract(col("key"), "vid_(\\d+)", 1).cast("long").as("doc_id"),
          col("content"))
        .as[Multimodal.MediaIn]
      Multimodal.decodeVideo(media).toDF()
        .select(col("doc_id"), col("timescale"), col("duration_ticks"),
          col("n_tracks"), col("brand"),
          round(col("duration_ticks").cast("double") / col("timescale"), 6)
            .as("duration_s"),
          col("n_frames"),
          round(col("sample_bytes").cast("double") / col("n_frames"), 6)
            .as("mean_frame_bytes"))
    },

    // ── Frame sampling: bounded explode keyed by content hash ──────────
    Q(
      "multimodal_frame_sample",
      """SELECT doc_id, CAST(f.i AS BIGINT) AS frame_idx,
        |  sha256(sha256(text) || ':' || f.i) AS frame_hash
        |FROM documents,
        |  LATERAL (SELECT unnest(range(0, 1 + strlen(text) % 8)) AS i) f""".stripMargin) { (s, dir) =>
      Multimodal.sampleFrames(Multimodal.withMetadata(mediaDocs(s, dir)))
    },

    // ── Resize: aspect-preserving dimension scaling (metadata half) ────
    Q(
      "multimodal_resize",
      s"""WITH m AS (SELECT doc_id,
         |  CAST(320 + 16 * ${hexValSql("substring(sha256(text), 1, 1)")} AS INTEGER) AS width,
         |  CAST(240 + 16 * ${hexValSql("substring(sha256(text), 2, 1)")} AS INTEGER) AS height
         |  FROM documents)
         |SELECT doc_id, width, height,
         |  CAST(CASE WHEN greatest(width, height) > 256
         |       THEN floor(width * 256.0 / greatest(width, height)) ELSE width END AS INT) AS resized_width,
         |  CAST(CASE WHEN greatest(width, height) > 256
         |       THEN floor(height * 256.0 / greatest(width, height)) ELSE height END AS INT) AS resized_height
         |FROM m""".stripMargin) { (s, dir) =>
      Multimodal.resizeMeta(Multimodal.withMetadata(mediaDocs(s, dir)), maxDim = 256)
    },

    // ── Feature extraction: batched stub-embedding over binary content,
    // exploded to (doc_id, dim_idx, value) scalar rows so the oracle
    // value-checks every component ─────────────────────────────────────
    Q(
      "multimodal_features",
      s"""SELECT doc_id, CAST(f.j AS BIGINT) AS dim_idx,
         |  (${hexValSql("substring(sha256(text), 1 + 2 * f.j, 1)")} * 16
         |   + ${hexValSql("substring(sha256(text), 2 + 2 * f.j, 1)")}) / 255.0 AS value
         |FROM documents,
         |  LATERAL (SELECT unnest(range(0, 8)) AS j) f""".stripMargin) { (s, dir) =>
      import s.implicits._
      Multimodal.extractFeatures(mediaDocs(s, dir).as[Multimodal.MediaIn], dim = 8)
        .toDF()
        .select(col("doc_id"), posexplode(col("features")).as(Seq("dim_idx", "value")))
        .select(col("doc_id"), col("dim_idx").cast("long").as("dim_idx"), col("value"))
    },

    // ── Perceptual-hash near-dup: dHash over REAL decoded pixels (the
    // image half of the dedup family) — corpus = 32 lossless fixture
    // originals + 16 bit-identical copies + 16 one-pixel variants;
    // banded LSH candidates, bit_count(xor) verification. The ORACLE
    // recomputes the ENTIRE pipeline relationally from the fixture's
    // arithmetic pixel formula: luminance sums, 9×8 integer-division
    // cells, cross-multiplied brightness bits, the 64-bit hash (bit 63
    // via its two's-complement value — DuckDB refuses 1<<63), band
    // values, candidate join, and Hamming verification — so a wrong
    // decode, cell boundary, bit order, or band slice flips the row
    // set. JPEG originals are excluded: lossy re-encode would decouple
    // pixels from the formula (stated, not hidden). ───────────────────
    Q(
      "multimodal_phash_near_dup",
      s"""WITH $PhashPipelineCtes,
         |pairs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.dhash AS h_a, b.dhash AS h_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
         |SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INTEGER) AS distance
         |FROM pairs WHERE bit_count(xor(h_a, h_b)) <= 3""".stripMargin) { (s, _) =>
      import s.implicits._
      def scan(root: String, pat: String, offset: Long) =
        Multimodal.scanBinary(s, root)
          .select((regexp_extract(col("key"), pat, 1).cast("long") + offset)
            .as("doc_id"), col("content"))
      val originals = scan(ImageFixture.ensure(), "img_(\\d+)", 0L)
        .filter(col("doc_id") % 3 =!= 2)
      val copies = originals.filter(col("doc_id") < 24)
        .select((col("doc_id") + 1000).as("doc_id"), col("content"))
      val variants = scan(ImageFixture.ensureVariants(), "var_(\\d+)", 2000L)
      val hashes = Multimodal.dHashes(
        originals.unionByName(copies).unionByName(variants)
          .as[Multimodal.MediaIn]).toDF()
      Multimodal.bandedNearDupPairs(hashes, maxDistance = 3)
    },

    // ── INCREMENTAL phash near-dup: the arrival-batch shape — the
    // originals' band entries live AT REST in a LOGGED index table;
    // the arriving batch (copies + variants) probes only the buckets
    // its bands select, then appends its own bands (the index grows;
    // the query proves the growth landed). Per-batch cost scales with
    // the increment, never the corpus. Oracle = the full phash
    // pipeline restricted to (original, arrival) pairs. ───────────────
    Q(
      "multimodal_phash_incremental",
      s"""WITH $PhashPipelineCtes,
         |pairs AS (
         |  SELECT DISTINCT a.id AS index_id, b.id AS incoming_id,
         |    a.dhash AS h_a, b.dhash AS h_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv
         |   AND a.id < 1000 AND b.id >= 1000)
         |SELECT index_id, incoming_id,
         |  CAST(bit_count(xor(h_a, h_b)) AS INTEGER) AS distance
         |FROM pairs WHERE bit_count(xor(h_a, h_b)) <= 3""".stripMargin) { (s, _) =>
      import graft.store.CommitLog
      import s.implicits._
      def scan(root: String, pat: String, offset: Long) =
        Multimodal.scanBinary(s, root)
          .select((regexp_extract(col("key"), pat, 1).cast("long") + offset)
            .as("doc_id"), col("content"))
      val originals = scan(ImageFixture.ensure(), "img_(\\d+)", 0L)
        .filter(col("doc_id") % 3 =!= 2)
      // bootstrap: the corpus-so-far's band index lives in a LOGGED
      // table (rebuilt per run — the fixture state is tiny)
      val idxTable = "/tmp/graft_state/phash_band_index"
      val fs = new org.apache.hadoop.fs.Path(idxTable)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(idxTable), true)
      // appendBandedIndex stamps graft.bands into the properties
      // ledger, so the probe below validates the layout metadata-only
      Multimodal.appendBandedIndex(s, idxTable,
        Multimodal.dHashes(originals.as[Multimodal.MediaIn]).toDF())
      // the ARRIVAL batch probes the at-rest index…
      val copies = originals.filter(col("doc_id") < 24)
        .select((col("doc_id") + 1000).as("doc_id"), col("content"))
      val variants = scan(ImageFixture.ensureVariants(), "var_(\\d+)", 2000L)
      val incoming = Multimodal.dHashes(
        copies.unionByName(variants).as[Multimodal.MediaIn]).toDF()
        .localCheckpoint(true)
      // the snapshot is pinned at CONSTRUCTION (CommitLog.read
      // resolves the live file list eagerly), so the probe result is
      // unaffected by the append below AND its JOIN plan stays visible
      // to PlanAuditSpec's global assertions (a checkpoint here would
      // hide it behind a LogicalRDD leaf)
      val pairs = Multimodal.probeBandedIndexAt(s, idxTable, incoming,
        maxDistance = 3)
      // …then appends its own bands; the index must have grown by
      // exactly the increment's band entries (4 per hash)
      val before = CommitLog.read(s, idxTable,
        CommitLog.tableSchema(s, idxTable)).count()
      Multimodal.appendBandedIndex(s, idxTable, incoming)
      val after = CommitLog.read(s, idxTable,
        CommitLog.tableSchema(s, idxTable)).count()
      require(after == before + incoming.count() * 4,
        s"index growth mismatch: $before -> $after")
      pairs
    },

    // ── Phash near-dup CLUSTERS: the composite a production image
    // dedup pipeline actually ends with — banded pairs → connected
    // components (the same min-label operator as text dedup), so
    // transitive chains dedupe as ONE cluster with a deterministic
    // canonical label. Expected structure: 16 {original, copy,
    // variant} triangles labeled by the original's id. Oracle: the
    // shared pipeline + a recursive min-reachable CTE. ────────────────
    Q(
      "multimodal_phash_components",
      s"""WITH RECURSIVE $PhashPipelineCtes,
         |good AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 3),
         |${OracleSnippets.componentsCte}
         |SELECT id AS doc_id, CAST(component AS BIGINT) AS component
         |FROM comp""".stripMargin) { (s, _) =>
      import s.implicits._
      def scan(root: String, pat: String, offset: Long) =
        Multimodal.scanBinary(s, root)
          .select((regexp_extract(col("key"), pat, 1).cast("long") + offset)
            .as("doc_id"), col("content"))
      val originals = scan(ImageFixture.ensure(), "img_(\\d+)", 0L)
        .filter(col("doc_id") % 3 =!= 2)
      val copies = originals.filter(col("doc_id") < 24)
        .select((col("doc_id") + 1000).as("doc_id"), col("content"))
      val variants = scan(ImageFixture.ensureVariants(), "var_(\\d+)", 2000L)
      val hashes = Multimodal.dHashes(
        originals.unionByName(copies).unionByName(variants)
          .as[Multimodal.MediaIn]).toDF()
      graft.dedup.Dedup.connectedComponents(
        Multimodal.bandedNearDupPairs(hashes, maxDistance = 3), "id_a", "id_b")
        .select(col("doc_id"), col("component").cast("long").as("component"))
    },

    // ── Banded-recall REPORT: the eval a production image dedup runs
    // before trusting a band config past the pigeonhole bound. 8 bands
    // of width 8 guarantee recall only to Hamming ≤ 7; real image
    // dedup wants ≤ 10 — so the report measures, per threshold, the
    // banded path's recall against the exact all-pairs baseline plus
    // the verification precision (found / candidates). Corpus =
    // lossless originals + 1-pixel variants (the lossless end) + NEW
    // heavy variants (one white pixel per scan row — several bits,
    // spread across all 8 bands: the lossy regime). The ORACLE replays
    // BOTH paths relationally from the pixel formulas — exact
    // distances, 8-band candidates, and the ratio arithmetic — so even
    // the eval is hash-checked. MultimodalDedupSpec pins recall = 1.0
    // at the pigeonhole bound and the measured 0.9375 at t=16. ────────
    Q(
      "multimodal_phash_recall",
      s"""WITH $PhashRecallCtes,
         |exact AS (
         |  SELECT bit_count(xor(a.dhash, b.dhash)) AS distance
         |  FROM hashes a JOIN hashes b ON a.id < b.id),
         |cdist AS (
         |  SELECT bit_count(xor(h_a, h_b)) AS distance FROM (
         |    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |      a.dhash AS h_a, b.dhash AS h_b
         |    FROM banded8 a JOIN banded8 b
         |      ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)),
         |th AS (SELECT unnest([3, 7, 10, 16]) AS threshold),
         |tc AS (
         |  SELECT th.threshold, COUNT(e.distance) AS n_true
         |  FROM th LEFT JOIN exact e ON e.distance <= th.threshold GROUP BY 1),
         |fc AS (
         |  SELECT th.threshold, COUNT(c.distance) AS n_found
         |  FROM th LEFT JOIN cdist c ON c.distance <= th.threshold GROUP BY 1),
         |nc AS (SELECT COUNT(*) AS n_candidates FROM cdist)
         |SELECT CAST(tc.threshold AS INTEGER) AS threshold,
         |  CAST(8 AS INTEGER) AS bands,
         |  CAST(tc.n_true AS BIGINT) AS n_true,
         |  CAST(fc.n_found AS BIGINT) AS n_found,
         |  CASE WHEN tc.n_true > 0 THEN round(fc.n_found / tc.n_true, 6) END
         |    AS recall,
         |  CAST(nc.n_candidates AS BIGINT) AS n_candidates,
         |  CASE WHEN nc.n_candidates > 0
         |       THEN round(fc.n_found / nc.n_candidates, 6) END
         |    AS verify_precision
         |FROM tc JOIN fc USING (threshold) CROSS JOIN nc""".stripMargin) { (s, _) =>
      import s.implicits._
      def scan(root: String, pat: String, offset: Long) =
        Multimodal.scanBinary(s, root)
          .select((regexp_extract(col("key"), pat, 1).cast("long") + offset)
            .as("doc_id"), col("content"))
      val originals = scan(ImageFixture.ensure(), "img_(\\d+)", 0L)
        .filter(col("doc_id") % 3 =!= 2)
      val light = scan(ImageFixture.ensureVariants(), "var_(\\d+)", 2000L)
      val heavy = scan(ImageFixture.ensureHeavyVariants(), "hvar_(\\d+)", 3000L)
      val hashes = Multimodal.dHashes(
        originals.unionByName(light).unionByName(heavy)
          .as[Multimodal.MediaIn]).toDF()
      Multimodal.bandedRecallReport(hashes, bands = 8,
        thresholds = Seq(3, 7, 10, 16))
    },

    // ── LOSSY banded near-dup at the config the recall report
    // justifies: Hamming ≤ 10 with 8 width-8 bands — past the
    // pigeonhole bound, so pairs disagreeing on every band are missed
    // BY DESIGN (the report above measures this exact config at
    // recall 1.0 on this corpus, 0.9375 at t=16). Same corpus, same
    // pipeline CTEs as the report, so the operator and the eval that
    // justifies it can never drift apart. ─────────────────────────────
    Q(
      "multimodal_phash_lossy_near_dup",
      s"""WITH $PhashRecallCtes,
         |pairs AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |    a.dhash AS h_a, b.dhash AS h_b
         |  FROM banded8 a JOIN banded8 b
         |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
         |SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INTEGER) AS distance
         |FROM pairs WHERE bit_count(xor(h_a, h_b)) <= 10""".stripMargin) { (s, _) =>
      import s.implicits._
      def scan(root: String, pat: String, offset: Long) =
        Multimodal.scanBinary(s, root)
          .select((regexp_extract(col("key"), pat, 1).cast("long") + offset)
            .as("doc_id"), col("content"))
      val originals = scan(ImageFixture.ensure(), "img_(\\d+)", 0L)
        .filter(col("doc_id") % 3 =!= 2)
      val light = scan(ImageFixture.ensureVariants(), "var_(\\d+)", 2000L)
      val heavy = scan(ImageFixture.ensureHeavyVariants(), "hvar_(\\d+)", 3000L)
      val hashes = Multimodal.dHashes(
        originals.unionByName(light).unionByName(heavy)
          .as[Multimodal.MediaIn]).toDF()
      // the pigeonhole-guarded operator refuses this config; the
      // explicitly-lossy one runs it
      Multimodal.bandedNearDupPairsLossy(hashes, maxDistance = 10, bands = 8)
    },

    // ── Audio-fingerprint near-dup: the AUDIO sibling of the phash row
    // — 64-bit PCM energy-profile prints over real decoded samples
    // (WAV/AIFF/AU, endianness per container), the same banded-LSH
    // pairing operator, and the ORACLE again replays the whole
    // decode→energy→window→bit→band→Hamming pipeline relationally
    // from the fixture's arithmetic PCM byte formula. Corpus = 30
    // originals + 30 bit-identical copies + 30 one-sample-muted
    // variants. ───────────────────────────────────────────────────────
    Q(
      "multimodal_audio_fingerprint",
      s"""WITH $AudioPipelineCtes,
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.h AS h_a, b.h AS h_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
        |SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INTEGER) AS distance
        |FROM pairs WHERE bit_count(xor(h_a, h_b)) <= 3""".stripMargin) { (s, _) =>
      import s.implicits._
      def scan(root: String, pat: String, offset: Long) =
        Multimodal.scanBinary(s, root)
          .select((regexp_extract(col("key"), pat, 1).cast("long") + offset)
            .as("doc_id"), col("content"))
      val originals = scan(AudioFixture.ensure(), "clip_(\\d+)", 0L)
      val copies = originals
        .select((col("doc_id") + 1000).as("doc_id"), col("content"))
      val variants = scan(AudioFixture.ensureVariants(), "var_(\\d+)", 2000L)
      val prints = Multimodal.audioFingerprints(
        originals.unionByName(copies).unionByName(variants)
          .as[Multimodal.MediaIn]).toDF()
      Multimodal.bandedNearDupPairs(prints, maxDistance = 3)
    },

    // ── Banded-recall report for the AUDIO print family — the same
    // eval as multimodal_phash_recall over PCM energy prints: corpus =
    // originals + one-sample-muted variants (the lossless end) + NEW
    // heavy variants (channel 0 of every 8th frame muted — edits in
    // every energy window, mid-range distances 5-35). Audio shows the
    // lossy regime harder than images: measured recall 0.922 at t=10
    // and 0.657 at t=16 with 8 bands — exactly the number that tells a
    // deployment this config needs more bands for audio than for
    // dHash. Oracle replays decode→energy→window→hash→8-band→report
    // arithmetic relationally. ────────────────────────────────────────
    Q(
      "multimodal_audio_recall",
      """WITH ids AS (
        |  SELECT i AS clip, CAST(i AS BIGINT) AS id, 0 AS kind
        |  FROM range(0, 30) t(i)
        |  UNION ALL SELECT i, 2000 + i, 1 FROM range(0, 30) t(i)
        |  UNION ALL SELECT i, 3000 + i, 2 FROM range(0, 30) t(i)),
        |dims AS (
        |  SELECT DISTINCT clip, 1 + clip % 2 AS ch,
        |    200 + 40 * (clip % 8) AS frames
        |  FROM ids),
        |e AS (
        |  SELECT i.id, d.frames, fs.f,
        |    SUM(CASE WHEN i.kind = 1 AND fs.f = 0 AND cs.c = 0 THEN 0
        |      WHEN i.kind = 2 AND fs.f % 8 = 0 AND cs.c = 0 THEN 0
        |      WHEN i.clip % 3 = 0
        |        THEN ((i.clip*131 + (2*(fs.f*d.ch+cs.c)+1)*7) & 127) * 256
        |             + ((i.clip*131 + (2*(fs.f*d.ch+cs.c))*7) & 127)
        |      ELSE ((i.clip*131 + (2*(fs.f*d.ch+cs.c))*7) & 127) * 256
        |           + ((i.clip*131 + (2*(fs.f*d.ch+cs.c)+1)*7) & 127)
        |      END) AS e
        |  FROM ids i
        |  JOIN dims d USING (clip)
        |  CROSS JOIN range(0, 480) fs(f)
        |  CROSS JOIN range(0, 2) cs(c)
        |  WHERE fs.f < d.frames AND cs.c < d.ch
        |  GROUP BY i.id, d.frames, fs.f),
        |win AS (
        |  SELECT id, (f * 65) // frames AS w, SUM(e) AS s, COUNT(*) AS n
        |  FROM e GROUP BY id, (f * 65) // frames),
        |grid AS (
        |  SELECT b.id, ws.w, COALESCE(win.s, 0) AS s,
        |    GREATEST(COALESCE(win.n, 0), 1) AS n
        |  FROM (SELECT DISTINCT id FROM ids) b
        |  CROSS JOIN range(0, 65) ws(w)
        |  LEFT JOIN win ON win.id = b.id AND win.w = ws.w),
        |bits AS (
        |  SELECT l.id, l.w,
        |    CASE WHEN l.s * r.n > r.s * l.n THEN 1 ELSE 0 END AS bit
        |  FROM grid l JOIN grid r ON r.id = l.id AND r.w = l.w + 1
        |  WHERE l.w < 64),
        |hashes AS (
        |  SELECT id, CAST(SUM(CASE
        |      WHEN w = 63 THEN CASE WHEN bit = 1 THEN -9223372036854775808 ELSE 0 END
        |      ELSE bit * (1::BIGINT << w) END) AS BIGINT) AS h
        |  FROM bits GROUP BY id),
        |exact AS (
        |  SELECT bit_count(xor(a.h, b.h)) AS distance
        |  FROM hashes a JOIN hashes b ON a.id < b.id),
        |banded8 AS (
        |  SELECT id, h, bs.band, (h >> (bs.band * 8)) & 255 AS bv
        |  FROM hashes CROSS JOIN range(0, 8) bs(band)),
        |cdist AS (
        |  SELECT bit_count(xor(h_a, h_b)) AS distance FROM (
        |    SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.h AS h_a, b.h AS h_b
        |    FROM banded8 a JOIN banded8 b
        |      ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)),
        |th AS (SELECT unnest([3, 7, 10, 16]) AS threshold),
        |tc AS (
        |  SELECT th.threshold, COUNT(e.distance) AS n_true
        |  FROM th LEFT JOIN exact e ON e.distance <= th.threshold GROUP BY 1),
        |fc AS (
        |  SELECT th.threshold, COUNT(c.distance) AS n_found
        |  FROM th LEFT JOIN cdist c ON c.distance <= th.threshold GROUP BY 1),
        |nc AS (SELECT COUNT(*) AS n_candidates FROM cdist)
        |SELECT CAST(tc.threshold AS INTEGER) AS threshold,
        |  CAST(8 AS INTEGER) AS bands,
        |  CAST(tc.n_true AS BIGINT) AS n_true,
        |  CAST(fc.n_found AS BIGINT) AS n_found,
        |  CASE WHEN tc.n_true > 0 THEN round(fc.n_found / tc.n_true, 6) END
        |    AS recall,
        |  CAST(nc.n_candidates AS BIGINT) AS n_candidates,
        |  CASE WHEN nc.n_candidates > 0
        |       THEN round(fc.n_found / nc.n_candidates, 6) END
        |    AS verify_precision
        |FROM tc JOIN fc USING (threshold) CROSS JOIN nc""".stripMargin) { (s, _) =>
      import s.implicits._
      def scan(root: String, pat: String, offset: Long) =
        Multimodal.scanBinary(s, root)
          .select((regexp_extract(col("key"), pat, 1).cast("long") + offset)
            .as("doc_id"), col("content"))
      val originals = scan(AudioFixture.ensure(), "clip_(\\d+)", 0L)
      val light = scan(AudioFixture.ensureVariants(), "var_(\\d+)", 2000L)
      val heavy = scan(AudioFixture.ensureHeavyVariants(), "hvar_(\\d+)", 3000L)
      val prints = Multimodal.audioFingerprints(
        originals.unionByName(light).unionByName(heavy)
          .as[Multimodal.MediaIn]).toDF()
      Multimodal.bandedRecallReport(prints, bands = 8,
        thresholds = Seq(3, 7, 10, 16))
    },

    // ── VIDEO container fingerprint near-dup: codec-free — the print
    // is the per-sample stsz size sequence (the sample tables the
    // ISO-BMFF parser already walks) through the same integer-exact
    // 65-window math as the audio print, paired by the same banded
    // operator. Corpus = 24 varied-size fixtures + 24 bit-identical
    // copies + 24 one-sample-grown variants; the ORACLE replays
    // size-formula → windows → bits → hash → bands → Hamming
    // relationally from the fixture arithmetic. ───────────────────────
    Q(
      "multimodal_video_fingerprint",
      s"""WITH $VideoPipelineCtes,
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.h AS h_a, b.h AS h_b
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id)
        |SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)) AS INTEGER) AS distance
        |FROM pairs WHERE bit_count(xor(h_a, h_b)) <= 3""".stripMargin) { (s, _) =>
      import s.implicits._
      def scan(root: String, pat: String, offset: Long) =
        Multimodal.scanBinary(s, root)
          .select((regexp_extract(col("key"), pat, 1).cast("long") + offset)
            .as("doc_id"), col("content"))
      val originals = scan(VideoFixture.ensureFingerprintSet(), "fvid_(\\d+)", 0L)
      val copies = originals
        .select((col("doc_id") + 1000).as("doc_id"), col("content"))
      val variants = scan(VideoFixture.ensureFingerprintVariants(),
        "fvar_(\\d+)", 2000L)
      val prints = Multimodal.videoFingerprints(
        originals.unionByName(copies).unionByName(variants)
          .as[Multimodal.MediaIn]).toDF()
      Multimodal.bandedNearDupPairs(prints, maxDistance = 3)
    },

    // ── Binary scan: binaryFile source over the fixture object tree ────
    Q(
      "multimodal_binary_scan",
      """SELECT key, CAST(strlen(key) AS BIGINT) AS length, sha256(key) AS content_hash
        |FROM (VALUES
        |  ('video/a.MOV'), ('video/b.mov'), ('video/c.mp4'),
        |  ('video/deep/d.mov'), ('video/deep/deeper/e.mov'),
        |  ('video/noext'), ('docs/readme.txt')) t(key)""".stripMargin) { (s, _) =>
      FixtureTree.ensure()
      Multimodal.scanBinary(s, FixtureTree.root)
        .select(col("key"), col("length"),
          sha2(col("content"), 256).as("content_hash"))
    })
}
