package graft.queries0

import graft.Q

/** Single place that stitches the per-module query lists together.
  * (Package named queries0 to avoid clashing with SparkEntry.queries.) */
object Registry {
  lazy val all: Seq[Q] = {
    val qs =
      graft.queries.Relational.queries ++
      graft.queries.PipelineOps.queries ++
      graft.queries.IngestOps.queries ++
      graft.queries.PlanOps.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.StreamQueries.queries ++
      graft.queries.ExecOps.queries ++
      graft.queries.FormatQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.MetadataQueries.queries ++
      graft.queries.JoinQueries.queries ++
      graft.queries.SqlPassthrough.queries
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }
}
