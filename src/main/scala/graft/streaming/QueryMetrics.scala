package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Operational metrics surface for long-running streaming deployments
  * (SURVEY §2.9 operations): a [[StreamingQueryListener]] that captures
  * one row per (query, micro-batch) of the numbers an on-call engineer
  * actually pages on — input rate, processing rate, batch duration,
  * state-store rows/bytes, and watermark lag — exportable as a DataFrame
  * or appended to a parquet metrics table.
  *
  * Why a listener and not a metrics query: progress events are emitted
  * driver-side by the engine after each batch with ZERO extra work in the
  * batch itself — no observe node, no second aggregation, nothing on the
  * hot path. The listener only copies already-computed numbers out of the
  * progress JSON, so attaching it to a 1000-executor deployment is free.
  *
  * Retention: the in-memory buffer is bounded (`maxRows`, default 65 536
  * ≈ one row per batch for days of a steady deploy); [[drainTo]] moves
  * the buffer into a parquet table — call it on a timer or after each
  * run. At 100 TB the metrics table is partitioned by nothing: it grows
  * with batches, not data volume.
  */
class QueryMetrics(maxRows: Int = 65536) extends StreamingQueryListener {
  import QueryMetrics.BatchProgress

  private val buf = new ConcurrentLinkedQueue[BatchProgress]()
  // ConcurrentLinkedQueue.size() is an O(n) traversal — on a listener
  // called once per micro-batch of every query, that compounds to O(n²)
  // over a long deploy; the counter keeps admission O(1)
  private val buffered = new java.util.concurrent.atomic.AtomicInteger(0)
  private val dropped = new java.util.concurrent.atomic.AtomicLong(0L)

  override def onQueryStarted(
      event: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(
      event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(
      event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = event.progress
    if (buffered.get() >= maxRows) { dropped.incrementAndGet(); return }
    buffered.incrementAndGet()
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum
    val wmLag = Option(p.eventTime.get("watermark")) match {
      case Some(wm) if wm.nonEmpty =>
        try {
          val wmMs = java.time.Instant.parse(wm).toEpochMilli
          // epoch-0 watermark = "no event seen yet", not a real lag
          if (wmMs <= 0L) -1L else System.currentTimeMillis() - wmMs
        } catch { case _: Exception => -1L }
      case _ => -1L
    }
    buf.add(BatchProgress(
      Option(p.name).getOrElse(""), p.id.toString, p.batchId,
      new java.sql.Timestamp(java.time.Instant.parse(p.timestamp)
        .toEpochMilli),
      p.numInputRows,
      zeroIfNaN(p.inputRowsPerSecond), zeroIfNaN(p.processedRowsPerSecond),
      Option(p.durationMs.get("triggerExecution")).map(_.toLong)
        .getOrElse(0L),
      stateRows, stateBytes, wmLag))
  }

  private def zeroIfNaN(d: Double): Double = if (d.isNaN) 0.0 else d

  /** Snapshot the buffered progress rows as a DataFrame (buffer kept). */
  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    buf.iterator().asScala.toSeq.toDF()
  }

  /** Move the buffered rows into a parquet metrics table (append) and
    * clear the buffer. Returns the number of rows drained.
    */
  def drainTo(spark: SparkSession, path: String): Long = {
    val rows = List.newBuilder[BatchProgress]
    var n = 0L
    var next = buf.poll()
    while (next != null) {
      rows += next; n += 1; buffered.decrementAndGet(); next = buf.poll()
    }
    if (n > 0) {
      import spark.implicits._
      rows.result().toDF().write.mode("append").parquet(path)
    }
    n
  }

  /** Progress events discarded because the buffer was full (a drain
    * cadence slower than the batch cadence).
    */
  def droppedEvents: Long = dropped.get()
}

object QueryMetrics {

  /** One micro-batch progress snapshot. `watermark_lag_ms` is
    * wall-clock-now minus watermark at capture time — the staleness a
    * consumer of this query's output observes; -1 when the query carries
    * no watermark (stateless pipelines). Top-level case class so the
    * Encoder derives without an outer-instance scope.
    */
  case class BatchProgress(
      query_name: String, query_id: String, batch_id: Long,
      ts: java.sql.Timestamp, input_rows: Long,
      input_rows_per_sec: Double, processed_rows_per_sec: Double,
      batch_duration_ms: Long, state_rows: Long, state_bytes: Long,
      watermark_lag_ms: Long)

  /** Attach a fresh listener to the session; the caller owns draining. */
  def attach(spark: SparkSession, maxRows: Int = 65536): QueryMetrics = {
    val m = new QueryMetrics(maxRows)
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: QueryMetrics): Unit =
    spark.streams.removeListener(m)
}
