package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.sources.Manifest

/** The maintenance verbs of [[Sinks]], paired with their file-stats
  * manifest upkeep — closing the r8 residual where a partition rewrite
  * left `_graft_manifest` stale until the caller remembered
  * `Manifest.refreshPartition`: a merge-then-skipping-scan would read
  * pruned-away rows (stale file stats) or silently miss new files (the
  * manifest's on-disk-but-unlisted files are skipped by design).
  *
  * Each verb here is exactly its [[Sinks]] namesake followed by a
  * manifest re-stat of the partitions it touched: present partitions
  * re-stat from the data the rewrite just paid to read, dropped/retired
  * partitions are forgotten. A table with no manifest pays nothing —
  * the wrapper delegates and returns. Stat columns are recovered from
  * the manifest's own schema, so call sites don't restate how it was
  * built.
  *
  * Use these verbs (not the raw [[Sinks]] ones) on any manifested
  * table; `LakeSink.sealDays` already pairs its own compaction the same
  * way.
  */
object Maintenance {

  /** [[Sinks.compactPartitions]] + manifest re-stat of `values`. */
  def compactPartitions(s: SparkSession, path: String, partitionCol: String,
                        values: Seq[String], targetFiles: Int = 1,
                        maxRecordsPerFile: Long = 1L << 20): Unit = {
    Sinks.compactPartitions(s, path, partitionCol, values, targetFiles,
      maxRecordsPerFile)
    Manifest.refreshPartitions(s, path, partitionCol, values)
  }

  /** [[Sinks.erasePartitionRows]] + manifest re-stat — including the
    * erase-to-empty case, where the retired partition's manifest rows
    * are forgotten rather than re-stated.
    */
  def erasePartitionRows(s: SparkSession, path: String, partitionCol: String,
                         values: Seq[String], condition: Column,
                         targetFiles: Int = 1,
                         maxRecordsPerFile: Long = 1L << 20): Unit = {
    Sinks.erasePartitionRows(s, path, partitionCol, values, condition,
      targetFiles, maxRecordsPerFile)
    Manifest.refreshPartitions(s, path, partitionCol, values)
  }

  /** [[Sinks.dropPartitions]] (TTL) + manifest forget of `values`. */
  def dropPartitions(s: SparkSession, path: String, partitionCol: String,
                     values: Seq[String]): Unit = {
    Sinks.dropPartitions(s, path, partitionCol, values)
    Manifest.refreshPartitions(s, path, partitionCol, values)
  }

  /** [[Sinks.overwritePartitions]] (backfill/re-statement) + manifest
    * re-stat of exactly the partitions `df` re-states. Single-partition-
    * column form — the manifest pairing is per-partition-dir.
    */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCol: String): Unit = {
    val s = df.sparkSession
    // distinct partition values: bounded by partitions touched, never rows
    val values = df.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    Sinks.overwritePartitions(df, path, partitionCol)
    Manifest.refreshPartitions(s, path, partitionCol, values)
  }

  /** [[Sinks.mergePartitions]] (CDC apply) + manifest re-stat of every
    * partition the changeset touches — created partitions gain stats,
    * deleted-to-empty ones are forgotten.
    */
  def mergePartitions(s: SparkSession, path: String, partitionCol: String,
                      changes: DataFrame, keyCols: Seq[String],
                      opCol: Option[String] = None,
                      deleteOp: String = "delete",
                      targetFiles: Int = 1,
                      maxRecordsPerFile: Long = 1L << 20): Unit = {
    // a NULL partition value is rejected by the delegate's require —
    // filtering here just keeps this pre-pass from NPEing before it does
    val values = changes.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0))
      .filter(_ != null).sorted.toSeq
    Sinks.mergePartitions(s, path, partitionCol, changes, keyCols, opCol,
      deleteOp, targetFiles, maxRecordsPerFile)
    Manifest.refreshPartitions(s, path, partitionCol, values)
  }
}
