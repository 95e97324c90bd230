package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet bloom filters for point-lookup file skipping — the
  * EQUALITY-predicate complement to the min/max pruning the Z-order
  * layout serves. Min/max statistics skip nothing for a point lookup
  * on a high-cardinality, unclustered key (every file's [min, max]
  * straddles the probe); a per-column bloom filter answers "definitely
  * not in this row group" from the footer, so a
  * `WHERE event_id = X` over a 100 TB table touches the handful of
  * row groups whose filter fires instead of scanning every page of
  * the key column. Writer-side only — the Spark parquet reader
  * consults the filters automatically wherever the predicate pushes
  * down (the plan shows the pushed filter either way; the bloom
  * decides per row group whether the pages are even read).
  *
  * NDV matters: parquet sizes each filter from the expected distinct
  * count; defaulting it on a billion-key column yields a saturated,
  * always-firing filter. Callers pass per-column NDV estimates — at
  * scale, from the HLL distinct sketch this engine already maintains
  * (`events_approx_distinct`), closing the loop: sketch estimates
  * size the index.
  *
  * Provenance: the reference stores derived artifacts back to S3 with
  * no layout thought (`pkg/aws/s3.go` plain puts); the at-rest index
  * surface (bucketing, Z-order, blooms) is engine extension scope. */
object Bloom {

  /** Write `df` as parquet with bloom filters on `ndvByCol`'s columns
    * (value = expected distinct count for that column). */
  def writeWithBloomFilters(df: DataFrame, path: String,
      ndvByCol: Map[String, Long]): Unit = {
    require(ndvByCol.nonEmpty, "no bloom columns given")
    ndvByCol.keys.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val opts = ndvByCol.flatMap { case (c, ndv) =>
      require(ndv > 0, s"ndv must be positive for $c: $ndv")
      Seq(s"parquet.bloom.filter.enabled#$c" -> "true",
        s"parquet.bloom.filter.expected.ndv#$c" -> ndv.toString)
    }
    df.write.options(opts).parquet(path)
  }

  /** The columns that actually carry a bloom filter in each data file
    * of `path`, per the parquet footers — (file, column) rows, the
    * verification hook for specs and table audits. */
  def bloomColumns(spark: SparkSession, path: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .flatMap { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
            .filter(_.getBloomFilterOffset >= 0)
            .map(c => (st.getPath.getName, c.getPath.toDotString))
            .distinct.toSeq
        } finally reader.close()
      }
  }
}
