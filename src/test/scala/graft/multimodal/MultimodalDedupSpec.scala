package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The banded near-dup family past the basics: the recall/precision
  * report in its lossy regime, the metadata-only logged-index probe
  * (zero Spark jobs per call), the streamed audio fingerprint on
  * multi-buffer clips, and the codec-free video container fingerprint. */
class MultimodalDedupSpec extends SparkSpec {

  private def bytesOf(dir: String, prefix: String, i: Int): Array[Byte] =
    java.nio.file.Files.readAllBytes(new java.io.File(dir).listFiles()
      .find(_.getName.startsWith(f"$prefix$i%03d")).get.toPath)

  /** The recall-report corpus: lossless originals + 1-pixel variants +
    * heavy (one-white-pixel-per-row) variants, by composite id. */
  private def recallCorpus(): DataFrame = {
    import spark.implicits._
    ImageFixture.ensure(); ImageFixture.ensureVariants()
    ImageFixture.ensureHeavyVariants()
    val ids = (0 until 48).filter(_ % 3 != 2)
    val lightIds = (0 until 24).filter(_ % 3 != 2)
    (ids.map(i => (i.toLong,
        Multimodal.dHash(bytesOf(ImageFixture.root, "img_", i)).get)) ++
      lightIds.map(i => (2000L + i,
        Multimodal.dHash(bytesOf(ImageFixture.variantRoot, "var_", i)).get)) ++
      lightIds.map(i => (3000L + i,
        Multimodal.dHash(bytesOf(ImageFixture.heavyVariantRoot, "hvar_", i)).get)))
      .toDF("doc_id", "hash")
  }

  test("recall report: 1.0 through the pigeonhole bound, measured loss past it") {
    val report = Multimodal
      .bandedRecallReport(recallCorpus(), bands = 8, thresholds = Seq(3, 7, 10, 16))
      .collect().map(r => r.getAs[Int]("threshold") ->
        ((r.getAs[Long]("n_true"), r.getAs[Long]("n_found"),
          r.getAs[Double]("recall"), r.getAs[Long]("n_candidates"))))
      .toMap
    // pigeonhole: ≤ bands-1 differing bits MUST share a band — recall
    // is 1.0 BY CONSTRUCTION at t=3 and t=7, not merely measured
    assert(report(3)._3 == 1.0 && report(7)._3 == 1.0,
      s"pigeonhole recall broken: $report")
    // heavy variants put true pairs at 8..13 bits; at t=10 the banded
    // path happens to catch all of them (measured, not guaranteed)...
    assert(report(10)._3 == 1.0, s"t=10 measured recall moved: ${report(10)}")
    // ...and at t=16 the loss is REAL: 45 of 48 true pairs surface —
    // the number a production config review would read off this report
    assert(report(16)._1 == 48 && report(16)._2 == 45 &&
      report(16)._3 == 0.9375, s"t=16 measured loss moved: ${report(16)}")
    // candidate volume is threshold-independent (one banding pass)
    assert(report.values.map(_._4).toSet == Set(248L),
      s"candidate count moved: $report")
  }

  test("recall report agrees with a driver-side brute-force reference") {
    val hashes = recallCorpus().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def shares(a: Long, b: Long) =
      (0 until 8).exists(k => ((a >> (k * 8)) & 255) == ((b >> (k * 8)) & 255))
    val all = for { (ia, ha) <- hashes; (ib, hb) <- hashes; if ia < ib }
      yield (dist(ha, hb), shares(ha, hb))
    val report = Multimodal
      .bandedRecallReport(recallCorpus(), bands = 8, thresholds = Seq(3, 7, 10, 16))
      .collect()
    report.foreach { r =>
      val t = r.getAs[Int]("threshold")
      assert(r.getAs[Long]("n_true") == all.count(_._1 <= t).toLong, s"n_true@$t")
      assert(r.getAs[Long]("n_found") == all.count(p => p._1 <= t && p._2).toLong,
        s"n_found@$t")
      assert(r.getAs[Long]("n_candidates") == all.count(_._2).toLong)
    }
  }

  test("audio recall report: the lossy regime bites harder than images") {
    import spark.implicits._
    AudioFixture.ensure(); AudioFixture.ensureVariants()
    AudioFixture.ensureHeavyVariants()
    def prints(dir: String, prefix: String, offset: Long) =
      (0 until AudioFixture.n).map(i => (offset + i,
        Multimodal.audioFingerprint(bytesOf(dir, prefix, i)).get))
    val corpus = (prints(AudioFixture.root, "clip_", 0L) ++
      prints(AudioFixture.variantRoot, "var_", 2000L) ++
      prints(AudioFixture.heavyVariantRoot, "hvar_", 3000L))
      .toDF("doc_id", "hash")
    val report = Multimodal
      .bandedRecallReport(corpus, bands = 8, thresholds = Seq(3, 7, 10, 16))
      .collect().map(r => r.getAs[Int]("threshold") ->
        ((r.getAs[Long]("n_true"), r.getAs[Long]("n_found"),
          r.getAs[Double]("recall")))).toMap
    // pigeonhole floor holds for any print family
    assert(report(3)._3 == 1.0 && report(7)._3 == 1.0)
    // the measured lossy-regime values — notably WORSE than the image
    // family's at the same config (0.9375 at t=16): the eval exists
    // precisely because the trade-off is per-family, not universal
    assert(report(10) == ((77L, 71L, 0.922078)), s"t=10 moved: ${report(10)}")
    assert(report(16) == ((137L, 90L, 0.656934)), s"t=16 moved: ${report(16)}")
  }

  test("lossy pairs: explicit opt-in past the pigeonhole bound, recall as reported") {
    val hashes = recallCorpus()
    // the guarded operator REFUSES the config the report measures...
    intercept[IllegalArgumentException](
      Multimodal.bandedNearDupPairs(hashes, maxDistance = 10, bands = 8))
    // ...the explicitly-lossy one runs it, and finds exactly the
    // report's n_found@10 (42 pairs here — measured recall 1.0 on this
    // corpus: every ≤10-bit pair happens to share a band)
    val lossy = Multimodal.bandedNearDupPairsLossy(hashes, maxDistance = 10, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lossy.size == 42, s"lossy pair count moved: ${lossy.size}")
    // within the pigeonhole bound, lossy ≡ guaranteed (same bands)
    val safeT = Multimodal.bandedNearDupPairs(hashes, maxDistance = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lossyT = Multimodal.bandedNearDupPairsLossy(hashes, maxDistance = 7, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(safeT == lossyT)
  }

  test("the band-count claim precedes the first append: a bootstrap race cannot mix layouts") {
    import spark.implicits._
    import graft.store.CommitLog
    val idx = java.nio.file.Files
      .createTempDirectory("graft_banded_claim").toString + "/idx"
    val hashes = (0 until 8).map(i => (i.toLong, i.toLong * 0x9E3779B97F4A7C15L))
      .toDF("doc_id", "hash")
    // writer A claimed bands=4 but crashed BEFORE its first append
    // (the window the old stamp-after-append ordering left open)
    assert(CommitLog.setPropertiesIfAbsent(spark, idx,
      Map(Multimodal.BandsProperty -> "4")))
    // writer B bootstrapping with bands=8 must refuse BEFORE any data
    // lands — the old ordering would have appended B's 8-band rows and
    // then recorded one count over a mixed index
    intercept[IllegalArgumentException](
      Multimodal.appendBandedIndex(spark, idx, hashes, bands = 8))
    assert(CommitLog.liveFiles(spark, idx)._2.isEmpty,
      "mismatched bootstrap landed data")
    // the matching writer proceeds; the claim is once-per-lifetime
    Multimodal.appendBandedIndex(spark, idx, hashes, bands = 4)
    assert(!CommitLog.setPropertiesIfAbsent(spark, idx,
      Map(Multimodal.BandsProperty -> "8")))
    assert(CommitLog.propertiesAt(spark, idx)(Multimodal.BandsProperty) == "4")
  }

  test("logged-index probe validates the band count metadata-only: ZERO Spark jobs") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft_banded_idx").toString + "/idx"
    val hashes = (0 until 32).map(i => (i.toLong, i.toLong * 0x9E3779B97F4A7C15L))
      .toDF("doc_id", "hash")
    Multimodal.appendBandedIndex(spark, idx, hashes)
    // a second append with a DIFFERENT band count is refused by the
    // properties ledger before any data lands
    intercept[IllegalArgumentException](
      Multimodal.appendBandedIndex(spark, idx, hashes, bands = 8))
    // ...as is a mismatched probe — metadata-only, no plan built
    intercept[IllegalArgumentException](
      Multimodal.probeBandedIndexAt(spark, idx, hashes, maxDistance = 3, bands = 8))
    // the matched probe's CONSTRUCTION runs zero Spark jobs (the
    // round-12 advisory: a per-call row-peek was one wasted job per
    // streaming micro-batch). The marker job flushes the FIFO listener
    // bus, so "only the marker was observed" is deterministic.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val incoming = Seq((1000L, 0x9E3779B97F4A7C15L)).toDF("doc_id", "hash")
      val probe = Multimodal.probeBandedIndexAt(spark, idx, incoming)
      // RDD marker = EXACTLY one job (a SQL count would be 2 under AQE)
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 10e9.toLong
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(jobs.get() == 1,
        s"probe construction ran ${jobs.get() - 1} Spark job(s); must be 0")
      // and the probe itself still answers: doc 1's hash matches
      assert(probe.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet == Set((1L, 1000L, 0)))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("DataFrame probe's in-plan band guard still fails loudly, without a driver peek") {
    import spark.implicits._
    val hashes = (0 until 8).map(i => (i.toLong, i.toLong)).toDF("doc_id", "hash")
    val index = Multimodal.bandedIndex(hashes, bands = 4)
    val probeDf = Multimodal.probeBandedIndex(index, hashes,
      maxDistance = 3, bands = 8) // mismatched — guard must fire at RUN time
    val e = intercept[Exception](probeDf.collect())
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("silently miss near-duplicates"),
      s"expected the band guard, got: ${msgs(e)}")
  }

  test("streamed audio fingerprint matches the materialized reference on multi-buffer clips") {
    import javax.sound.sampled._
    // a clip far larger than the 4096-frame read buffer, with a frame
    // count that is NOT a buffer multiple (exercises the carry-over
    // seam), stereo LE and mono BE
    def clip(frames: Int, ch: Int, bigEndian: Boolean, seed: Int): Array[Byte] = {
      val fmt = new AudioFormat(44100f, 16, ch, true, bigEndian)
      val pcm = Array.tabulate[Byte](frames * ch * 2)(j =>
        ((seed * 131 + j * 7) & 0xFF).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais,
        if (bigEndian) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // the pre-streaming reference: materialize the PCM and window it
    def reference(bytes: Array[Byte]): Long = {
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val ch = fmt.getChannels
        val big = fmt.isBigEndian
        val pcm = ais.readAllBytes()
        val frames = pcm.length / (2 * ch)
        val sum = new Array[Long](65); val cnt = new Array[Long](65)
        var f = 0
        while (f < frames) {
          val w = (f.toLong * 65 / frames).toInt
          var c = 0; var e = 0L
          while (c < ch) {
            val k = (f * ch + c) * 2
            val v = if (big) (pcm(k) << 8) | (pcm(k + 1) & 0xFF)
                    else (pcm(k + 1) << 8) | (pcm(k) & 0xFF)
            e += math.abs(v); c += 1
          }
          sum(w) += e; cnt(w) += 1; f += 1
        }
        var hash = 0L; var w = 0
        while (w < 64) {
          val nL = math.max(cnt(w), 1L); val nR = math.max(cnt(w + 1), 1L)
          if (sum(w) * nR > sum(w + 1) * nL) hash |= 1L << w
          w += 1
        }
        hash
      } finally ais.close()
    }
    for ((frames, ch, be, seed) <- Seq((100003, 2, false, 3), (65537, 1, true, 11),
        (4096 * 3, 2, true, 7), (31, 1, false, 5))) {
      val b = clip(frames, ch, be, seed)
      assert(Multimodal.audioFingerprint(b).contains(reference(b)),
        s"streamed print drifted on frames=$frames ch=$ch be=$be")
    }
  }

  test("property: banded candidates ≡ share-a-band over arbitrary 64-bit hashes") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // adversarial hash sets the fixtures never produce: clustered
    // values, all-zeros, sign-boundary values, duplicates — batched
    // into a handful of Spark round trips (one per (bands, seed))
    val hashGen: Gen[Long] = Gen.frequency(
      5 -> Gen.long,
      2 -> Gen.chooseNum(-4L, 4L), // near-identical low-bit hashes
      1 -> Gen.oneOf(0L, -1L, Long.MinValue, Long.MaxValue))
    for (bands <- Seq(1, 2, 4, 8, 16); seed <- 0 until 2) {
      val width = 64 / bands
      val mask = if (width == 64) -1L else (1L << width) - 1
      // duplicates stay IN: identical hashes under different doc_ids
      // are the core dedup case (distance-0 pairs) and must pair
      val hs = (0 until 40).flatMap(i =>
        hashGen(Gen.Parameters.default, Seed(seed * 1000L + i)))
      val frame = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("doc_id", "hash")
      val got = Multimodal.bandedCandidates(frame, bands).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("distance")).toMap
      val want = (for {
        a <- hs.indices; b <- hs.indices if a < b
        if (0 until bands).exists(k =>
          ((hs(a) >> (k * width)) & mask) == ((hs(b) >> (k * width)) & mask))
      } yield (a.toLong, b.toLong) ->
        java.lang.Long.bitCount(hs(a) ^ hs(b))).toMap
      assert(got == want, s"bands=$bands seed=$seed diverged: " +
        s"extra=${(got.keySet -- want.keySet).take(3)} " +
        s"missing=${(want.keySet -- got.keySet).take(3)}")
      // pigeonhole, as a property: every pair within bands-1 bits IS a
      // candidate (the guarantee bandedNearDupPairs' require rests on)
      val within = for { a <- hs.indices; b <- hs.indices if a < b
        if java.lang.Long.bitCount(hs(a) ^ hs(b)) < bands } yield (a.toLong, b.toLong)
      assert(within.forall(want.contains))
    }
  }

  test("the at-rest band index survives OPTIMIZE: compacted files, same probe answers") {
    import spark.implicits._
    import graft.store.CommitLog
    val idx = java.nio.file.Files
      .createTempDirectory("graft_banded_opt").toString + "/idx"
    val mk = (lo: Int, hi: Int) => (lo until hi)
      .map(i => (i.toLong, i.toLong * 0x9E3779B97F4A7C15L)).toDF("doc_id", "hash")
    // several small appends = several small files (the streaming shape)
    (0 until 4).foreach(k => Multimodal.appendBandedIndex(spark, idx, mk(k * 8, k * 8 + 8)))
    val probeOf = () => Multimodal
      .probeBandedIndexAt(spark, idx, Seq((99L, 5L * 0x9E3779B97F4A7C15L)).toDF("doc_id", "hash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = probeOf()
    assert(before == Set((5L, 99L, 0)))
    val filesBefore = CommitLog.liveFiles(spark, idx)._2.size
    CommitLog.compact(spark, idx, targetBytes = 512 * 1024 * 1024)
    assert(CommitLog.liveFiles(spark, idx)._2.size < filesBefore,
      "OPTIMIZE did not compact the band index")
    // the properties ledger (band count) and the probe survive
    assert(probeOf() == before)
    intercept[IllegalArgumentException](
      Multimodal.probeBandedIndexAt(spark, idx, mk(0, 1), bands = 8))
  }

  test("audio fingerprint: unknown-length containers fall back instead of vanishing") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, true)
    val pcm = Array.tabulate[Byte](2000)(j => ((j * 7) & 0x7F).toByte)
    def au(lengthKnown: Boolean): Array[Byte] = {
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt,
        if (lengthKnown) 1000L else AudioSystem.NOT_SPECIFIED.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.AU, bos)
      bos.toByteArray
    }
    val known = Multimodal.audioFingerprint(au(lengthKnown = true))
    val unknown = Multimodal.audioFingerprint(au(lengthKnown = false))
    // a streaming encoder writes AU dataSize 0xFFFFFFFF (length
    // unknown); the header grid can't size its windows, so the
    // fallback materializes and derives F from the payload — the same
    // print the streamed path produces for the same samples
    assert(unknown.isDefined, "unknown-length clip vanished from dedup coverage")
    assert(unknown == known, s"fallback drifted: $unknown vs $known")
  }

  test("video fingerprint: hostile aggregates and extreme sizes stay safe") {
    // minimal ISO-BMFF builders (the fixture's, inlined)
    def u32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
      val body = parts.flatten.toArray
      u32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    }
    def mp4(traks: Array[Byte]*): Array[Byte] =
      box("ftyp", "isom".getBytes("US-ASCII"), u32(0),
        "isom".getBytes("US-ASCII")) ++ box("moov", traks: _*)
    def uniformTrak(size: Long, count: Long): Array[Byte] =
      box("trak", box("mdia", box("minf", box("stbl",
        box("stsz", u32(0), u32(size), u32(count))))))
    // MANY traks each under the per-box cap but summing past it: the
    // aggregate guard must degrade to None, never a 10^11-step loop
    val hostile = mp4(
      uniformTrak(100, 1L << 23), uniformTrak(100, 1L << 23),
      uniformTrak(100, 1L << 23))
    assert(Multimodal.videoFingerprint(hostile).isEmpty)
    // u32-extreme uniform sizes at the aggregate cap: window sums ×
    // counts overflow a Long product, where a wrapped comparison would
    // invert bits — the exact comparison keeps the uniform profile's
    // true print (all windows equal → no bit set)
    val extreme = mp4(uniformTrak(0xFFFFFFF0L, 1L << 24))
    assert(Multimodal.videoFingerprint(extreme).contains(0L),
      s"overflow corrupted the uniform print: ${Multimodal.videoFingerprint(extreme)}")
  }

  test("video container fingerprint: copies at 0, one-sample variants near, structure real") {
    VideoFixture.ensureFingerprintSet()
    VideoFixture.ensureFingerprintVariants()
    (0 until VideoFixture.n).foreach { i =>
      val orig = Multimodal.videoFingerprint(
        bytesOf(VideoFixture.fpRoot, "fvid_", i))
      assert(orig.isDefined, s"fp fixture $i printed nothing")
      val variant = Multimodal.videoFingerprint(
        bytesOf(VideoFixture.fpVariantRoot, "fvar_", i)).get
      val d = java.lang.Long.bitCount(orig.get ^ variant)
      assert(d <= 2, s"one-sample variant of video $i drifted $d bits")
    }
    val bytes = bytesOf(VideoFixture.fpRoot, "fvid_", 0)
    // uniform-size stsz reads without materializing: overwrite the
    // first track's sample_size field (tag + 4) to a nonzero constant
    val stszAt = bytes.indices.find(o => o + 8 <= bytes.length &&
      bytes(o) == 's' && bytes(o + 1) == 't' && bytes(o + 2) == 's' &&
      bytes(o + 3) == 'z').get
    val uniform = bytes.clone()
    // tag at stszAt; version+flags at +4, sample_size at +8, count at +12
    uniform(stszAt + 8 + 3) = 7 // sample_size = 7
    assert(Multimodal.videoFingerprint(uniform).isDefined)
    // a hostile uniform count degrades to None, never a 4-billion loop
    val hostile = uniform.clone()
    (0 until 4).foreach(k => hostile(stszAt + 12 + k) = 0x7f.toByte)
    assert(Multimodal.videoFingerprint(hostile).isEmpty)
    // truncation and non-video degrade to None
    assert(Multimodal.videoFingerprint(bytes.take(bytes.length / 2)).isEmpty)
    assert(Multimodal.videoFingerprint("not a video".getBytes("UTF-8")).isEmpty)
    // the MAIN fixture set (monotone sizes) still prints — degenerate
    // but defined — so the operator is total over valid containers
    VideoFixture.ensure()
    assert(Multimodal.videoFingerprint(
      bytesOf(VideoFixture.root, "vid_", 3)).isDefined)
  }
}
