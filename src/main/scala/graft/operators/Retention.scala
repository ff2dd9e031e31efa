package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sinks.Sinks

/** The end of the training-data pipeline: everything upstream (scoring,
  * gating, near-dup detection, clustering) produces VERDICTS about
  * documents; this operator applies them and materializes the curated
  * corpus as a size-targeted parquet layout — the artifact a tokenizer
  * job actually reads.
  */
object Retention {

  /** Curate `documents` into `outPath`: admission-gate on the shared
    * quality formulas ([[TextOps.admittedDocs]] — same source as
    * `q_quality_filter`), drop every non-canonical member of a near-dup
    * cluster (`q_dedup_clusters` drop list), and write through
    * [[Sinks.writeCompacted]] so the output layout avoids both 100 TB
    * file-size failure modes. Returns the curated DataFrame (the plan,
    * re-runnable; the parquet under `outPath` is the committed copy).
    *
    * Canonical election happens AMONG the gate survivors, not globally:
    * `q_dedup_clusters`' canonical is the cluster-wide min doc_id, but if
    * that document fails the admission gate the family would lose every
    * member (canonical dropped by the gate, members dropped as
    * non-canonical) even though an admittable representative existed. So
    * the drop list here is recomputed per cluster as "admitted members
    * that are not the minimum ADMITTED member" — every near-dup family
    * with at least one admitted member keeps exactly one copy, and a
    * family whose members all fail the gate vanishes because the gate
    * says so, not because of canonical roulette.
    *
    * Join shapes: LEFT SEMI against the gate survivors and LEFT ANTI
    * against the drop list, both keyed on `doc_id` and both UNHINTED —
    * the gate output is corpus-sized (never broadcastable) and the drop
    * list, while usually small, is unbounded under heavy duplication
    * (a 10× duplicated corpus has a drop list 90% of corpus size), so
    * the strategy belongs to the planner's stats (AQE at cluster scale),
    * not to a hint. The re-election itself is one window min over
    * cluster-member rows — pair-graph-sized, never corpus-sized.
    */
  def curate(s: SparkSession, dir: String, outPath: String,
             minQuality: Double = 0.35, minTokens: Long = 30L,
             threshold: Double = 0.5,
             maxRecordsPerFile: Long = 1L << 20,
             targetFiles: Option[Int] = None): DataFrame =
    curateObserved(s, dir, outPath, minQuality, minTokens, threshold,
      maxRecordsPerFile, targetFiles)._1

  /** [[curate]] with pipeline health metrics attached via
    * `Dataset.observe`: the counters accumulate DURING the write job
    * itself — zero extra passes, zero extra shuffles (an `observe` node
    * is a map-side accumulator, not an aggregation plan) — and become
    * readable from the returned [[org.apache.spark.sql.Observation]]
    * after the action. This is the operational seam a 100 TB curation
    * run needs: survivors, retained token volume, and per-run
    * quality-score bounds land in the job's own telemetry instead of a
    * second corpus scan that could silently diverge from what was
    * actually written.
    */
  def curateObserved(s: SparkSession, dir: String, outPath: String,
                     minQuality: Double = 0.35, minTokens: Long = 30L,
                     threshold: Double = 0.5,
                     maxRecordsPerFile: Long = 1L << 20,
                     targetFiles: Option[Int] = None)
  : (DataFrame, org.apache.spark.sql.Observation) = {
    val admitted = TextOps.admittedDocs(s, dir, minQuality, minTokens)
    val admittedMembers = DedupOps.dedupClusters(s, dir, threshold)
      .select(col("cluster_id"), col("doc_id"))
      .join(admitted, Seq("doc_id"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    val drops = admittedMembers
      .withColumn("canon", min(col("doc_id")).over(w))
      .filter(col("doc_id") =!= col("canon"))
      .select(col("doc_id"))
    val curated = Tables(s, dir, "documents")
      .join(admitted, Seq("doc_id"), "left_semi")
      .join(drops, Seq("doc_id"), "left_anti")
    // the observe node rides ONLY the write's plan: an Observation binds
    // to a single action, and the returned DataFrame must stay
    // re-runnable for callers
    val obs = new org.apache.spark.sql.Observation()
    Sinks.writeCompacted(
      curated.observe(obs,
        count(lit(1)).as("n_written"),
        sum(col("n_chars")).as("chars_written"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id")),
      outPath, maxRecordsPerFile, targetFiles)
    (curated, obs)
  }
}
