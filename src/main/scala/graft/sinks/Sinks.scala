package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Sink surface (SURVEY.md §2.1): batch parquet (plain + hive-partitioned)
  * and streaming sinks (parquet-append with checkpointing, foreachBatch
  * for sinks Spark lacks a connector for — the webhook-engine's "deliver
  * downstream" half).
  */
object Sinks {

  /** Plain parquet write, overwrite semantics (the Verify harness shape).
    */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned layout: `path/col=value/part-*.parquet`.
    * Partition pruning then turns predicates on `cols` into directory
    * skips — the layout a 100 TB event archive needs (e.g. partition by
    * event date, prune to the queried day). Caller picks low-cardinality
    * columns; a high-cardinality partition column is the classic
    * small-files trap.
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Streaming append to parquet with exactly-once file commit via the
    * checkpoint's write-ahead log.
    */
  def streamToParquet(df: DataFrame, path: String,
                      checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Micro-batch escape hatch: run arbitrary batch logic (JDBC upsert,
    * HTTP push, dedup-merge) per micro-batch. Delivery is at-least-once —
    * `batchId` is the replay key an idempotent sink must dedup on.
    */
  def streamForeachBatch(df: DataFrame, checkpoint: String)
                        (f: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch(f)
      .outputMode("update")
      .start()
}
