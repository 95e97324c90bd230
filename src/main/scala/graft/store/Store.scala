package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Engine-owned table layer (SURVEY.md §7.1, K9 analog).
  *
  * The reference keeps pipeline state in external systems — a Redis SET as
  * the resource index (resource.go:77-87), SQS as the task queue, a Redis
  * SET of task hashes as the done-registry (task.go:157-179), and an SQS
  * DLQ (task.go:132-147). Here state lives in parquet tables under one
  * work root; every job is a pure DataFrame transform between tables, so
  * Spark's planner sees the whole pipeline.
  *
  * Scale: append-only writes, partitioned by Spark's natural output
  * partitioning (no driver materialization); dedup/claim joins are
  * key-partitioned shuffles or broadcast anti-joins depending on AQE's
  * runtime sizes. At cluster scale these paths would be s3a:// prefixes
  * (or Delta tables for ACID appends) — the API is path-based so nothing
  * else changes.
  */
final case class Store(root: String) {
  val resourceIndex: String = s"$root/resource_index"
  val taskQueue: String = s"$root/task_queue"
  val taskDone: String = s"$root/task_done"
  val dlq: String = s"$root/dlq"
  val metadata: String = s"$root/metadata"
}

/** Advisory exclusive lock on a store table, held as an atomically
  * created lock FILE under the store root. Guards the one genuinely
  * destructive section in the engine — the batch drain's
  * read-snapshot → execute → queue-swap in Execute.run — against
  * concurrent queue APPENDS (Plan.run / planStream): an append landing
  * between the snapshot and the swap would be silently dropped by the
  * rewrite (lost update), so both sides serialize on this lock.
  * Local/HDFS `create(overwrite=false)` is atomic; object stores
  * without atomic create want the commit-log layer instead (graft.store
  * .CommitLog — same seam, log-serialized writers, no lock file at
  * all). A crash can leave the file behind —
  * the timeout error names it for manual removal (same operational
  * contract as any advisory lock file). */
object StoreLock {
  def withLock[T](spark: SparkSession, store: Store, table: String,
      timeoutMs: Long = 60000)(body: => T): T = {
    val p = new org.apache.hadoop.fs.Path(s"${store.root}/.lock_$table")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val deadline = System.currentTimeMillis() + timeoutMs
    // Hadoop's LOCAL create(overwrite=false) is check-then-create (not
    // atomic — concurrent creators all pass the exists check), so the
    // file:// path uses NIO's O_CREAT|O_EXCL instead; HDFS enforces
    // no-overwrite atomically namenode-side via the Hadoop call.
    def tryAcquire(): Boolean =
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath))
          java.nio.file.Files.write(java.nio.file.Paths.get(p.toUri.getPath),
            s"pid=${ProcessHandle.current().pid()}\n".getBytes)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        // Only the create() can mean "someone else holds it". A failure
        // AFTER the create succeeded (write/close) would otherwise leave
        // the caller spinning against its OWN orphaned lock file until
        // timeout — and block every later writer until manual deletion —
        // so the file is best-effort removed before reporting failure.
        val created =
          try Some(fs.create(p, false))
          catch { case _: java.io.IOException => None }
        created match {
          case None => false
          case Some(out) =>
            try {
              out.writeBytes(s"pid=${ProcessHandle.current().pid()}\n")
              out.close()
              true
            } catch {
              case _: java.io.IOException =>
                // close the won handle FIRST — an open stream leaks a
                // descriptor per retry, and some filesystems refuse to
                // delete a file with a live writer (which would
                // resurrect exactly the orphan this path removes)
                try out.close() catch { case _: java.io.IOException => () }
                try fs.delete(p, false) catch { case _: java.io.IOException => () }
                false
            }
        }
      }
    while (!tryAcquire()) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"could not acquire '$table' lock at $p within ${timeoutMs}ms — " +
            "held by a live writer, or stale after a crash (delete the file to recover)")
      Thread.sleep(100)
    }
    try body
    finally { fs.delete(p, false); () }
  }
}

/** Bucketed (pre-partitioned, pre-sorted) table copies — Spark's
  * at-rest co-location primitive. A join between two tables bucketed
  * by the join key into the same bucket count needs NO exchange on
  * either side: each bucket pair joins locally, which at 100 TB is the
  * difference between a full-corpus shuffle per join and none. The
  * same layout serves every future join on that key (the write is
  * amortized across reads — exactly how fact tables are laid out in
  * production warehouses). `sortBy` additionally lets SortMergeJoin
  * skip its per-bucket sort.
  *
  * Bucket metadata lives in the session catalog (this build has no
  * Hive metastore), so the physical files persist in the warehouse but
  * each new session re-registers by rewriting — the operator's plan
  * effect (PlanAuditSpec pins zero pre-join exchanges) is identical to
  * a metastore deployment. */
object Bucketing {
  def ensureBucketed(spark: SparkSession, sfDir: String, table: String,
      bucketCol: String, buckets: Int): String = {
    // content-fingerprinted key (same contract as Staging.contentKeyed):
    // regenerating the fixture in place yields a NEW table name, so a
    // long-lived session can never serve a stale bucketed copy while
    // the oracle reads the live parquet (round-5 review)
    val fp = Staging.fingerprintOf(spark, s"$sfDir/$table.parquet")
    val key = graft.core.Hashing.sha256Hex(s"$sfDir|$bucketCol|$buckets|$fp").take(12)
    val name = s"graft_bkt_${table}_$key"
    if (spark.catalog.tableExists(name)) return name
    val conf = spark.sparkContext.hadoopConfiguration
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, name.toLowerCase)
    val fs = loc.getFileSystem(conf)
    if (!fs.exists(loc)) {
      // write through a pid-unique throwaway MANAGED table, then
      // publish its files at the content-keyed location by rename —
      // never delete-then-rewrite a shared path another JVM may be
      // scanning (first completed publish wins; losers discard).
      // Bucket ids are encoded in the part filenames, so the files
      // stay a valid bucketed layout wherever the directory lands.
      val tmpName = s"${name}_w${ProcessHandle.current().pid()}_${System.nanoTime()}"
      graft.Tables.load(spark, sfDir, table)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, bucketCol)
        .sortBy(bucketCol)
        .saveAsTable(tmpName)
      val tmpLoc = new org.apache.hadoop.fs.Path(warehouse, tmpName.toLowerCase)
      Store.publishDir(spark, tmpLoc.toString, loc.toString, reuseExisting = true)
      // the files have moved; dropping the throwaway entry only clears
      // catalog metadata (its managed location no longer exists)
      spark.sql(s"DROP TABLE IF EXISTS $tmpName")
      // prune SUPERSEDED versions (older fingerprints) of this table's
      // bucketed copies — never tmp writer dirs (their names carry the
      // _w<pid> marker), mirroring Staging's bounded-growth contract
      val prefix = s"graft_bkt_${table}_"
      fs.listStatus(new org.apache.hadoop.fs.Path(warehouse)).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && n != name.toLowerCase && n.matches(s"$prefix[0-9a-f]{12}")) {
          fs.delete(st.getPath, true); ()
        }
      }
    }
    // register the content-keyed location as an EXTERNAL bucketed table
    // (explicit schema + CLUSTERED BY DDL — catalog API has no bucket
    // spec); external, so dropping/re-registering never touches files
    val schemaDdl = graft.Tables.load(spark, sfDir, table).schema.toDDL
    spark.sql(
      s"""CREATE TABLE $name ($schemaDdl) USING parquet
         |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) INTO $buckets BUCKETS
         |LOCATION '$loc'""".stripMargin)
    name
  }
}


/** Content-keyed staged copies of source tables (stream staging, the
  * at-rest IVF index): the stage path folds in a FINGERPRINT of the
  * source files (name/length/mtime per file), so regenerating a fixture
  * in place can never silently reuse a stale copy — which would change
  * query results (round-4 advice; round-5 review generalized it from
  * the IVF call site to every stager). Layout is
  * `<root>/<srcKey>/<versionKey>`: all versions of one source share a
  * parent, so publishing a fresh version prunes the stale siblings and
  * tmp growth stays bounded at one live copy per source. */
object Staging {

  /** Per-file name/length/mtime digest of a source table/dir — the
    * "has this fixture been regenerated in place?" signal every
    * content-keyed copy (stage, IVF index, bucketed table) keys on. */
  def fingerprintOf(spark: SparkSession, src: String): String = {
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val srcFs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    srcFs.listStatus(srcPath)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString(",")
  }

  def contentKeyed(spark: SparkSession, src: String, stageRoot: String,
      salt: String = "")(write: String => Unit): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fingerprint = fingerprintOf(spark, src)
    // salt belongs in the PARENT key, not the version key: consumers
    // staging different derivations of one source (different salt) get
    // separate parents, so one consumer's publish-and-prune can never
    // delete another's live stage — pruning only ever supersedes
    // versions of the SAME derivation
    val srcKey = graft.core.Hashing.sha256Hex(s"$src|$salt").take(16)
    val verKey = graft.core.Hashing.sha256Hex(fingerprint).take(16)
    val parent = new org.apache.hadoop.fs.Path(s"$stageRoot/$srcKey")
    val stage = new org.apache.hadoop.fs.Path(parent, verKey)
    val fs = stage.getFileSystem(conf)
    if (!fs.exists(stage)) {
      // write-then-rename so a crashed half-write can never satisfy the
      // exists() check on a later run; writer-unique tmp path so
      // concurrent JVMs staging the same version can't publish each
      // other's half-written copies (first COMPLETED rename wins)
      val tmp = s"${stage}__staging_${ProcessHandle.current().pid()}_${System.nanoTime()}"
      write(tmp)
      Store.publishDir(spark, tmp, stage.toString, reuseExisting = true)
      // prune STALE versions of this source — only completed version
      // dirs (16-hex names), never a concurrent writer's live
      // `__staging_` tmp, whose publish must be allowed to lose the
      // race on its own terms
      fs.listStatus(parent).foreach { st =>
        val n = st.getPath.getName
        if (n != verKey && n.matches("[0-9a-f]{16}")) { fs.delete(st.getPath, true); () }
      }
      // one-time migration sweep: the pre-versioned layout wrote flat
      // `<name>_<hash16>` dirs (stream stages), bare 16-hex dirs
      // holding files DIRECTLY (old IVF indexes), and root-level
      // `__staging_` tmps — none visible to the per-parent prune
      // above, so without this they'd hold full table copies in tmp
      // forever (round-5 review). New-scheme parents are pure 16-hex
      // dirs containing only subdirs, so the patterns can't collide.
      fs.listStatus(new org.apache.hadoop.fs.Path(stageRoot)).foreach { st =>
        val n = st.getPath.getName
        val legacyFlat = n.matches(".+_[0-9a-f]{16}") || n.contains("__staging_")
        val legacyBare = n.matches("[0-9a-f]{16}") && st.isDirectory &&
          fs.listStatus(st.getPath).exists(_.isFile)
        if (legacyFlat || legacyBare) { fs.delete(st.getPath, true); () }
      }
    }
    stage.toString
  }
}

/** Z-order (Morton) clustering for two-column compaction layouts.
  * Single-column range clustering gives disjoint per-file ranges on ONE
  * column; scans filtering the other column still read every file. The
  * z-value interleaves the bit patterns of both columns' normalized
  * bucket indices, so sorting by it co-locates rows that are close in
  * BOTH dimensions — each output file covers a rectangle of the value
  * space and parquet min/max footers prune scans on EITHER column (the
  * standard lakehouse multi-dimension layout; at 100 TB, data layout is
  * the cheapest index there is).
  *
  * Buckets are min/max-normalized `bits`-bit indices (one tiny agg job
  * over the snapshot — negligible next to the rewrite it feeds); the
  * interleave is plain integer arithmetic inside codegen. */
object ZOrder {
  def zValue(df: DataFrame, c1: String, c2: String, bits: Int = 8): org.apache.spark.sql.Column =
    zValueN(df, Seq(c1, c2), bits)

  /** N-column Morton value: bit `i` of column `j`'s bucket index lands
    * at z-bit `i*n + j` (round-robin interleave — the direct
    * generalization of the 2-column form; at n=2 the bit layout is
    * identical to the original). `n*bits` must fit a signed Long, so
    * the default 8-bit buckets cluster up to 7 columns; trade bucket
    * resolution for dimensions past that (4 bits × 15 columns). Each
    * output file then covers an n-dimensional hyper-rectangle and
    * parquet min/max footers prune scans filtering ANY clustered
    * column. */
  def zValueN(df: DataFrame, cols: Seq[String], bits: Int = 8): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val n = cols.length
    require(n >= 2, s"z-order needs at least two columns, got $cols")
    require(n * bits <= 63,
      s"$n columns × $bits bits = ${n * bits} z-bits exceeds a signed Long (63) — lower `bits`")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    // fail with a NAMED error, not a mid-compaction NPE: an all-null,
    // non-numeric (cast → null), or zero-row snapshot has no value
    // range to normalize
    cols.zipWithIndex.foreach { case (c, j) =>
      require(!r.isNullAt(2 * j) && !r.isNullAt(2 * j + 1),
        s"z-order column '$c' has no numeric values to cluster on " +
          "(non-numeric, all-null, or empty snapshot)")
    }
    def bucket(c: String, mn: Double, mx: Double): org.apache.spark.sql.Column =
      if (!(mx > mn)) lit(0L)
      // per-row nulls cluster at the origin corner (bucket 0), the
      // conventional nulls-first layout — least() alone would silently
      // send them to the MAX corner because it skips null operands
      else coalesce(
        least(lit((1L << bits) - 1),
          floor((col(c).cast("double") - mn) / (mx - mn) * (1L << bits)).cast("long")),
        lit(0L))
    val buckets = cols.zipWithIndex.map { case (c, j) =>
      bucket(c, r.getDouble(2 * j), r.getDouble(2 * j + 1))
    }
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (b, j) =>
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (i * n + j))
      }
    }.reduce(_ + _)
  }

  /** Lay a compaction rewrite out into `nOut` files: plain repartition
    * (None), single-column range clustering ("c" — disjoint per-file
    * ranges, min/max footers prune on c), or multi-column Z-order
    * ("a,b[,c,…]" — each file covers a hyper-rectangle of the value
    * space, prunes on any listed column; up to 7 columns at the
    * default 8-bit buckets). Shared by the unlogged compactor
    * (Store.compact) and the commit-log one (CommitLog.compact) so the
    * two layers cannot drift on layout semantics. */
  def layout(df: DataFrame, nOut: Int, clusterBy: Option[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    clusterBy match {
      case Some(spec) if spec.contains(',') =>
        val cols = spec.split(',').map(_.trim).toSeq
        // writer-unique scratch column name — withColumn would
        // silently OVERWRITE (and drop would then delete) a real
        // table column that happened to share the name
        val zc = s"__z_${System.nanoTime()}"
        df.withColumn(zc, zValueN(df, cols))
          .repartitionByRange(nOut, col(zc))
          .sortWithinPartitions(zc)
          .drop(zc)
      case Some(c) =>
        df.repartitionByRange(nOut, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(nOut)
    }
  }
}

object Store {

  /** Read a parquet table, or an empty frame with the given schema when
    * the table doesn't exist yet (first run). */
  def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  def append(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Small-file compaction: rewrite a store table into
    * max(1, ceil(totalBytes / targetBytes)) files and swap the
    * directory in. Micro-batch sinks (execute-stream's per-trigger
    * appends) and partition-batched bulk inserts accumulate files far
    * below a scan-efficient split, and at 100 TB file COUNT is itself
    * a scale limit: listing cost, per-file task overhead,
    * split-planning memory. `repartition` (not coalesce) so output
    * files are evenly sized — the one shuffle IS the compaction job's
    * cost, amortized across every later scan.
    *
    * Concurrency (the queue drain's lock discipline, Execute.run): the
    * whole operation is serialized against OTHER COMPACTORS by a
    * dedicated `compact_<table>` lock (plus a writer-unique tmp dir, so
    * even a rogue unserialized compactor can't clobber a rewrite in
    * progress), while the TABLE lock — the one writers contend on — is
    * held only for reconcile + swap, never across the unbounded
    * rewrite. The rewrite reads a file SNAPSHOT; files appended since
    * the snapshot are COPIED into the compacted output inside the table
    * lock, so a locked writer (task_queue's planners) can never lose an
    * append. Writers that do NOT take the table lock (done/dlq/index
    * appends) are covered too: after the atomic park rename the parked
    * directory is re-listed and any file the reconcile listing missed
    * is folded into the rewrite — the listing-to-park window is closed
    * exactly, not documented away. An append that begins after the park
    * re-creates the table directory, which publishDir detects and
    * REFUSES (loud failure, never silent loss).
    *
    * Crash safety: the swap parks the old directory at
    * `<table>__pre_compact`, publishes the rewrite (whose `_COMPACTED`
    * marker is the positive completion signal recovery keys on), then
    * drops the parked copy — a crash at ANY point leaves the data
    * intact under one of the two names, and the next compact (or any
    * caller of `recoverParked`) restores it, folding in files any
    * writer appended to a post-crash re-created table; no window ends
    * in silent loss, unlike a bare delete-then-rename.
    *
    * `clusterBy` additionally range-partitions and sorts the rewrite on
    * a column, so each output file covers a DISJOINT value range and
    * parquet min/max footer stats let later scans skip whole files —
    * compaction doubling as the table's clustered index. A two-column
    * spec ("a,b") upgrades this to true Z-ORDER (see ZOrder): each file
    * covers a rectangle of the two-dimensional value space, so scans
    * filtering on EITHER column skip files. At 100 TB, data layout is
    * the cheapest index there is. Returns (files, bytes) before/after.
    */
  def compact(spark: SparkSession, store: Store, table: String,
      targetBytes: Long = 128L * 1024 * 1024,
      clusterBy: Option[String] = None): ((Int, Long), (Int, Long)) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val path = s"${store.root}/$table"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dataFiles(): Array[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(p)) Array.empty
      else {
        val entries = fs.listStatus(p)
        // engine store tables are flat parquet dirs; a nested layout
        // (hive-partitioned) would be INVISIBLE to this census and
        // silently skipped — refuse loudly. `_`/`.`-prefixed dirs are
        // exempt: an in-flight append keeps a live `_temporary` dir
        // here, and aborting on one would fail compact for exactly the
        // concurrency this design permits
        require(!entries.exists(st => st.isDirectory &&
            !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith(".")),
          s"compact does not support nested/partitioned layouts: $path")
        entries.filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      }

    // one compactor at a time — a second concurrent compact would
    // mistake the first's published output for "late appends" (its
    // part-file names differ from every snapshot name) and duplicate
    // the whole table into its own rewrite
    StoreLock.withLock(spark, store, s"compact_$table") {
      StoreLock.withLock(spark, store, table) { recoverParked(spark, path) }
      // sweep rewrite dirs left by compactors that crashed mid-write —
      // safe under the compact lock: no other compactor is live
      fs.globStatus(new org.apache.hadoop.fs.Path(path + "__compact_w*"))
        .foreach(st => fs.delete(st.getPath, true))
      val snapshot = dataFiles()
      val before = (snapshot.length, snapshot.map(_.getLen).sum)
      if (before._1 == 0) (before, before)
      else {
        // unbounded rewrite, table lock NOT held: read the snapshot
        // files by name so appends landing mid-rewrite are neither read
        // twice nor lost — they are reconciled below
        val nOut = math.max(1L, (before._2 + targetBytes - 1) / targetBytes).toInt
        val tmp = path + s"__compact_w${ProcessHandle.current().pid()}_${System.nanoTime()}"
        val df = spark.read.parquet(snapshot.map(_.getPath.toString): _*)
        val laid = ZOrder.layout(df, nOut, clusterBy)
        laid.write.parquet(tmp)
        // the positive completion signal recoverParked keys on: only a
        // fully-written compacted directory carries it, and parquet
        // readers ignore `_`-prefixed files
        fs.create(new org.apache.hadoop.fs.Path(tmp, CompactedMarker), true).close()

        StoreLock.withLock(spark, store, table) {
          // reconcile: copy (not move — the live table stays complete
          // until the park) every file appended since the snapshot into
          // the compacted output
          val snapNames = snapshot.map(_.getPath.getName).toSet
          val late = dataFiles().filterNot(st => snapNames(st.getPath.getName))
          late.foreach { st =>
            org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
              new org.apache.hadoop.fs.Path(tmp, s"late-${st.getPath.getName}"),
              false, spark.sparkContext.hadoopConfiguration)
          }
          // test seam: CompactSpec injects an unlocked append HERE to
          // pin that the listing-to-park window cannot lose files
          testHookBeforePark()
          val parked = new org.apache.hadoop.fs.Path(path + "__pre_compact")
          if (!fs.rename(p, parked))
            throw new IllegalStateException(s"compact could not park $path")
          // Writers that do NOT take the table lock (done/dlq/index
          // appends) may have landed files between the reconcile
          // listing above and the park rename — inside the parked
          // directory now, and a bare delete would silently drop them
          // (round-5 advice: an operator compacting dlq against a live
          // executeStream lost dead letters). The park rename is atomic,
          // so re-listing the PARKED directory closes the window
          // exactly: copy any file not already accounted for into the
          // rewrite. (Appends that start after the park re-create the
          // table directory, which publishDir detects and refuses —
          // loud, never silent loss.)
          val accounted = snapNames ++ late.map(_.getPath.getName)
          fs.listStatus(parked)
            .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
              !st.getPath.getName.startsWith(".") && !accounted(st.getPath.getName))
            .foreach { st =>
              org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
                new org.apache.hadoop.fs.Path(tmp, s"late-${st.getPath.getName}"),
                false, spark.sparkContext.hadoopConfiguration)
            }
          publishDir(spark, tmp, path, reuseExisting = false)
          fs.delete(parked, true)
          ()
        }
        val after = dataFiles()
        (before, (after.length, after.map(_.getLen).sum))
      }
    }
  }

  private val CompactedMarker = "_COMPACTED"

  /** Test-only injection point inside compact's reconcile-to-park
    * window (no-op in production) — the only way to exercise that race
    * deterministically. */
  private[store] var testHookBeforePark: () => Unit = () => ()

  /** Restore a table left parked by a compact that crashed mid-swap.
    * The decision keys on the POSITIVE completion marker, not bare
    * existence (a writer may have re-created the table directory after
    * the crash, which bare existence would mistake for a completed
    * publish and delete the parked original):
    *  - parked present, table missing → crash between park and publish:
    *    the parked directory IS the table — rename it back;
    *  - parked present, table carries `_COMPACTED` → the publish
    *    completed and only the cleanup was lost — drop the parked twin;
    *  - parked present, table present WITHOUT the marker → a writer
    *    re-created the table post-crash: fold its files into the parked
    *    original (as `post_crash-` appends), then restore the parked
    *    directory — both pre-crash and post-crash rows survive.
    * Callers hold the table lock. */
  private[store] def recoverParked(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val parked = new org.apache.hadoop.fs.Path(path + "__pre_compact")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(parked)) {
      if (!fs.exists(p)) {
        if (!fs.rename(parked, p))
          throw new IllegalStateException(s"could not restore parked table at $parked")
      } else if (fs.exists(new org.apache.hadoop.fs.Path(p, CompactedMarker))) {
        fs.delete(parked, true); ()
      } else {
        fs.listStatus(p)
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .foreach { st =>
            if (!fs.rename(st.getPath,
                new org.apache.hadoop.fs.Path(parked, s"post_crash-${st.getPath.getName}")))
              throw new IllegalStateException(
                s"could not fold post-crash file ${st.getPath} into $parked")
          }
        fs.delete(p, true)
        if (!fs.rename(parked, p))
          throw new IllegalStateException(s"could not restore parked table at $parked")
      }
    }
  }

  /** Publish a freshly-written `tmp` directory at `dst` via rename —
    * the ONE implementation of the two Hadoop local-FS publish traps
    * (previously hand-rolled separately by the stream staging and the
    * queue swap):
    *  - `rename` returns false when dst exists as a file / reappeared;
    *  - `rename` "succeeds" against a dst DIRECTORY that appeared
    *    concurrently by falling back to FileUtil.copy — it copies tmp
    *    INTO dst (a nested non-partition subdir that breaks parquet
    *    discovery), detected via the tmp-basename child.
    *
    * `reuseExisting = true` — staging semantics: losing the publish
    * race is fine (tmp is discarded, the winner's complete dst is
    * used) and a nested copy is repaired by deleting it.
    * `reuseExisting = false` — swap semantics: ANY anomaly throws,
    * because proceeding against a stale dst is a lost update. */
  def publishDir(spark: SparkSession, tmp: String, dst: String,
      reuseExisting: Boolean): Unit = {
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val fs = tmpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.rename(tmpPath, dstPath)) {
      if (!reuseExisting)
        throw new IllegalStateException(
          s"table swap rename failed; data remains at $tmp")
      fs.delete(tmpPath, true)
      if (!fs.exists(dstPath))
        throw new IllegalStateException(s"publish rename failed and no table at $dst")
      ()
    } else {
      val nested = new org.apache.hadoop.fs.Path(dstPath, tmpPath.getName)
      if (fs.exists(nested)) {
        if (reuseExisting) { fs.delete(nested, true); () }
        else throw new IllegalStateException(
          s"table swap landed nested at $nested (concurrent writer re-created $dst); " +
            "the table is polluted — recover from the nested copy")
      }
    }
  }
}
