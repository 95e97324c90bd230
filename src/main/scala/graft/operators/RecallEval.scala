package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The threshold/recall/precision aggregation shared by every
  * measure-before-trust eval in the engine —
  * [[graft.multimodal.Multimodal.bandedRecallReport]] (Hamming over
  * perceptual hashes), [[graft.dedup.Dedup.lshRecallReport]] (Jaccard
  * over MinHash bands), and
  * [[graft.sim.Similarity.nearDupRecallReport]] (cosine over sign
  * blocks). Each eval produces one `score` row per pair on both the
  * exact-baseline and the candidate path; this helper turns them into
  * one row per threshold: n_true, n_found, recall, candidate volume,
  * and verification precision. The score semantics stay with the
  * caller via `hit` (≤ for distances, ≥ for similarities), as does the
  * threshold column's type (Hamming thresholds are ints, similarity
  * thresholds doubles — the oracle schemas pin both). */
object RecallEval {

  def aggregate(th: DataFrame, exact: DataFrame, cand: DataFrame,
      hit: (Column, Column) => Column,
      config: Seq[(String, Column)]): DataFrame = {
    val trueCounts = exact.join(broadcast(th),
        hit(col("score"), col("threshold")))
      .groupBy("threshold").agg(count(lit(1)).as("n_true"))
    val foundCounts = cand.join(broadcast(th),
        hit(col("score"), col("threshold")))
      .groupBy("threshold").agg(count(lit(1)).as("n_found"))
    val nCand = cand.agg(count(lit(1)).as("n_candidates"))
    th.join(trueCounts, Seq("threshold"), "left")
      .join(foundCounts, Seq("threshold"), "left")
      .crossJoin(broadcast(nCand))
      .select((col("threshold") +:
        config.map { case (n, c) => c.as(n) }) ++ Seq(
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        when(coalesce(col("n_true"), lit(0L)) > 0,
          round(coalesce(col("n_found"), lit(0L)) / col("n_true"), 6))
          .as("recall"),
        col("n_candidates"),
        when(col("n_candidates") > 0,
          round(coalesce(col("n_found"), lit(0L)) / col("n_candidates"), 6))
          .as("verify_precision")): _*)
  }
}
