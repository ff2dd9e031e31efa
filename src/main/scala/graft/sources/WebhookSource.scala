package graft.sources

import java.util
import java.util.concurrent.ConcurrentSkipListMap
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Webhook ingest: HTTP POST JSON → rows in an unbounded stream
  * (SURVEY.md §3.3 / §7.4).
  *
  * `POST /webhook/<topic>` lands in a bounded in-memory queue keyed by a
  * monotonically increasing sequence number; a DataSource-v2
  * MicroBatchStream exposes queue slices as micro-batch partitions.
  * Delivery semantics are at-least-once (entries are retained until the
  * engine commits the batch offset); exactly-once end-to-end is obtained
  * by composing with StreamOps.dedup on a payload id — the webhook-domain
  * pattern.
  *
  * Usage:
  * {{{
  *   WebhookQueue.startServer(8099)
  *   val raw = spark.readStream.format("graft.sources.WebhookSourceProvider").load()
  *   val events = raw.select(from_json($"body", schema).as("e"), $"ingest_ts").select("e.*", "ingest_ts")
  * }}}
  *
  * Scale notes: one HTTP listener feeds one queue — at production scale
  * this class sits behind a real pub-sub/broker (one listener per
  * executor, or a durable log); the MicroBatchStream contract is identical
  * either way, which is the point of keeping ingest behind DSv2. Each
  * micro-batch is planned as task-width-many InputPartitions (contiguous
  * seq ranges), so downstream parsing/enrichment runs wide even before the
  * partition-per-broker-shard production extension.
  */
object WebhookQueue {
  // value = (ingest ts µs, topic, body, delivery key) — the delivery key
  // is the X-Delivery-Key idempotency header ("" when the sender sent
  // none): a receiver that dedups on the header can only do so if its
  // HTTP layer records the header NEXT TO the payload, so the key is
  // part of the queue record, the WAL record, and the source schema
  private val buf = new ConcurrentSkipListMap[Long, (Long, String, String, String)]()
  private val seq = new AtomicLong(0L)
  // retained-entry count tracked separately: ConcurrentSkipListMap.size()
  // is an O(n) traversal, and post() runs it under the global lock on
  // every request — exactly when a backlog makes n large. The counter can
  // only over-count transiently (truncate removes, then decrements), which
  // errs toward 503, never toward shedding.
  private val retained = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var server: HttpServer = _
  val maxRetained = 100000

  // --- optional write-ahead durability ------------------------------------
  // The in-memory queue loses uncommitted deliveries on restart — fine for
  // tests, wrong for a webhook engine (the sender got a 200). With
  // durability enabled, every accepted delivery is appended to a WAL
  // BEFORE the 200 is sent, and the committed low-water mark persists on
  // truncate; enableDurability() replays everything in (lowWater, ∞) back
  // into the queue. Flush-per-post durability is to the OS page cache; a
  // production deployment would group-commit with fsync — the at-least-once
  // contract (replay on unclean restart) is the same either way.
  @volatile private var wal: java.io.Writer = _
  @volatile private var walDir: java.nio.file.Path = _
  private var lowWater = 0L

  /** One WAL record = one line of exactly 6 tab-separated tokens:
    * `id \t ts \t b64(topic) \t b64(body) \t b64(deliveryKey) \t crc32`.
    * ALL variable fields are base64-encoded — the topic comes from a URL
    * path where %09/%0A decode to tab/newline, the delivery key is a raw
    * client header, and either containing a tab/newline would corrupt
    * the framing so recovery's stop-at-first-malformed-line policy silently
    * discarded every later 200-acked delivery. The trailing CRC32 (over the
    * preceding tokens) catches the torn tail a 4-char base64 boundary
    * hides: a truncated body can still parse and decode, and without the
    * checksum it would be recovered and delivered as if intact.
    */
  private def record(id: Long, ts: Long, topic: String, body: String,
                     deliveryKey: String): String = {
    val enc = java.util.Base64.getEncoder
    val t64 = enc.encodeToString(
      topic.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val b64 = enc.encodeToString(
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val k64 = enc.encodeToString(
      deliveryKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val payload = s"$id\t$ts\t$t64\t$b64\t$k64"
    s"$payload\t${crc32(payload)}\n"
  }

  private def crc32(s: String): Long = {
    val c = new java.util.zip.CRC32
    c.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    c.getValue
  }

  /** Switch the queue durable, replaying any uncommitted WAL entries into
    * memory. Returns the number of recovered deliveries. Sequence numbers
    * continue monotonically after the recovered maximum.
    *
    * Torn-tail tolerance: a crash mid-append can leave a partial final
    * line (flush is to the page cache; appends aren't atomic). Recovery
    * parses defensively and STOPS at the first malformed line — the valid
    * prefix is recovered instead of aborting the whole replay, which
    * would defeat the WAL in exactly the crash it exists for. Recovery
    * also COMPACTS: the rewritten WAL holds only the live tail, so file
    * size and restart time track the uncommitted backlog, not lifetime
    * traffic.
    */
  def enableDurability(dir: String): Int = synchronized {
    if (wal != null) { wal.close(); wal = null }
    walDir = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(walDir)
    val lwFile = walDir.resolve("lowwater")
    lowWater =
      if (java.nio.file.Files.exists(lwFile))
        new String(java.nio.file.Files.readAllBytes(lwFile)).trim.toLong
      else 0L
    val walFile = walDir.resolve("webhook.wal")
    var recovered = 0
    var maxSeq = seq.get()
    if (java.nio.file.Files.exists(walFile)) {
      // Format detection BEFORE parsing: a 4-token line is acceptable
      // legacy framing only in a file the legacy writer produced — i.e.
      // one with NO CRC-framed (≥5-token) lines anywhere. In a CRC-format
      // file a 4-token line can only be a line torn before its checksum
      // (Base64 decodes most truncation points without complaint), and
      // accepting it would launder a truncated body into the next
      // compaction with a fresh valid CRC — exactly the corruption the
      // CRC exists to catch. Mixed files don't occur: recovery compacts
      // legacy logs to CRC framing wholesale. The pre-scan is one cheap
      // pass; compaction keeps the file bounded by the uncommitted
      // backlog.
      val crcFormat = {
        val probe = java.nio.file.Files.lines(walFile)
        try probe.iterator().asScala
          .exists(l => l.nonEmpty && l.split("\t", -1).length >= 5)
        finally probe.close()
      }
      val stream = java.nio.file.Files.lines(walFile)
      try {
        val it = stream.iterator()
        var ok = true
        var parsed = 0
        // Restores one fully-parsed entry into the live buffer. Shared by
        // every framing generation (k64 = "" for pre-delivery-key lines).
        def restore(idS: String, tsS: String, t64: String, b64: String,
                    k64: String): Unit = {
          val id = idS.toLong
          val ts = tsS.toLong
          val dec = java.util.Base64.getDecoder
          val topic = new String(dec.decode(t64),
            java.nio.charset.StandardCharsets.UTF_8)
          val body = new String(dec.decode(b64),
            java.nio.charset.StandardCharsets.UTF_8)
          val dk = if (k64.isEmpty) ""
            else new String(dec.decode(k64),
              java.nio.charset.StandardCharsets.UTF_8)
          maxSeq = math.max(maxSeq, id)
          if (id > lowWater && !buf.containsKey(id)) {
            buf.put(id, (ts, topic, body, dk))
            retained.incrementAndGet()
            recovered += 1
          }
        }
        while (ok && it.hasNext) {
          val line = it.next()
          if (line.nonEmpty) {
            line.split("\t", -1) match {
              case Array(idS, tsS, t64, b64, k64, crcS) =>
                try {
                  if (crc32(s"$idS\t$tsS\t$t64\t$b64\t$k64") != crcS.toLong)
                    ok = false // truncated-but-parseable tail
                  else { restore(idS, tsS, t64, b64, k64); parsed += 1 }
                } catch { case _: IllegalArgumentException => ok = false }
              case Array(idS, tsS, t64, b64, crcS) =>
                // previous CRC framing without the delivery-key token: a
                // torn current-format line can also land here (crc token
                // position holds k64) — then the CRC check fails and the
                // stop-at-first-malformed policy holds
                try {
                  if (crc32(s"$idS\t$tsS\t$t64\t$b64") != crcS.toLong)
                    ok = false
                  else { restore(idS, tsS, t64, b64, ""); parsed += 1 }
                } catch { case _: IllegalArgumentException => ok = false }
              case Array(idS, tsS, t64, b64) if !crcFormat =>
                // legacy pre-CRC framing (id, ts, topic64, body64): a
                // pre-upgrade WAL must survive the format upgrade; the
                // crcFormat pre-scan guarantees this branch never fires
                // on a torn current-format line
                try { restore(idS, tsS, t64, b64, ""); parsed += 1 }
                catch { case _: IllegalArgumentException => ok = false }
              case _ => ok = false // torn tail — keep the valid prefix
            }
          }
        }
        // `parsed`, not `recovered`: a fully-committed or already-buffered
        // WAL parses fine and legitimately restores nothing — only a file
        // where no line parsed at all suggests foreign framing
        if (parsed == 0 && java.nio.file.Files.size(walFile) > 0)
          System.err.println(
            s"[WebhookQueue] WARNING: non-empty WAL $walFile parsed 0 " +
              "lines — unrecognized framing? Compaction will rewrite it.")
      } finally stream.close()
    }
    seq.set(maxSeq)
    compactWal()
    recovered
  }

  /** Rewrite the WAL to only the live (uncommitted) entries, atomically,
    * and reopen the appender. Caller holds the queue lock.
    */
  private def compactWal(): Unit = {
    if (wal != null) wal.close()
    val walFile = walDir.resolve("webhook.wal")
    val tmp = walDir.resolve("webhook.wal.tmp")
    val w = java.nio.file.Files.newBufferedWriter(tmp,
      java.nio.charset.StandardCharsets.UTF_8)
    try {
      buf.entrySet().iterator().asScala.foreach { e =>
        w.write(record(e.getKey, e.getValue._1, e.getValue._2,
          e.getValue._3, e.getValue._4))
      }
    } finally w.close()
    java.nio.file.Files.move(tmp, walFile,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    wal = java.nio.file.Files.newBufferedWriter(walFile,
      java.nio.charset.StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    walCommitted = 0L
  }

  // committed-but-still-logged entries since the last compaction; once
  // they dominate the live backlog, truncate() rotates the log so disk
  // and future recovery time track the uncommitted tail, not lifetime
  // traffic
  private var walCommitted = 0L

  /** Close the WAL (files stay for a later recovery). */
  def disableDurability(): Unit = synchronized {
    if (wal != null) { wal.close(); wal = null; walDir = null; lowWater = 0L }
  }

  private def persistLowWater(): Unit = {
    val tmp = walDir.resolve("lowwater.tmp")
    java.nio.file.Files.write(tmp, lowWater.toString.getBytes)
    java.nio.file.Files.move(tmp, walDir.resolve("lowwater"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Enqueue one delivery. Returns the sequence id, or -1 when the queue
    * is at capacity (caller answers 503 — real back-pressure; shedding
    * retained-but-uncommitted entries would silently break at-least-once).
    *
    * Synchronized so `latest` can never observe a sequence number whose
    * entry hasn't landed in the map yet — otherwise a concurrent
    * latestOffset()/planInputPartitions() pair could plan a batch that
    * skips the in-flight entry and the committed offset would pass it
    * unread (permanent loss despite the 200 response).
    */
  def post(topic: String, body: String,
           deliveryKey: String = ""): Long = synchronized {
    if (retained.get() >= maxRetained) -1L
    else {
      val id = seq.incrementAndGet()
      val ts = System.currentTimeMillis() * 1000L
      buf.put(id, (ts, topic, body, deliveryKey))
      retained.incrementAndGet()
      if (wal != null) { // write-ahead: land in the log before the 200
        wal.write(record(id, ts, topic, body, deliveryKey))
        wal.flush()
      }
      id
    }
  }

  def latest: Long = synchronized { seq.get() }

  def slice(fromExclusive: Long, toInclusive: Long)
  : Array[(Long, Long, String, String, String)] =
    // iterator, not entrySet().asScala: mapping the Set wrapper rebuilds a
    // hash set and loses the skip list's ascending-seq order
    buf.subMap(fromExclusive, false, toInclusive, true)
      .entrySet().iterator().asScala
      .map(e => (e.getKey, e.getValue._1, e.getValue._2, e.getValue._3,
        e.getValue._4))
      .toArray

  // --- consumer registry --------------------------------------------------
  // Several independent streaming queries can read the one queue (e.g. the
  // processing pipeline and the delivered-results receiver in the domain
  // loop). Truncation must respect ALL of them: each MicroBatchStream
  // registers under its checkpoint id, commits its own offset, and the
  // queue truncates at the MINIMUM committed offset — broker consumer-group
  // retention ("keep until the slowest registered reader has it").
  private val committedBy = new java.util.HashMap[String, Long]()

  /** Start retaining entries for reader `id` (idempotent; a restart from
    * the same checkpoint re-registers and resumes its committed floor at
    * the first commit).
    */
  def registerConsumer(id: String): Unit = synchronized {
    if (!committedBy.containsKey(id)) committedBy.put(id, 0L)
  }

  /** Drop reader `id` from retention accounting (a stopped query no
    * longer holds the queue back; its checkpoint still lets it resume —
    * durability willing — from whatever is retained then).
    */
  def unregisterConsumer(id: String): Unit = synchronized {
    committedBy.remove(id)
  }

  /** Record reader `id` at `upto` and truncate to the slowest reader.
    * Monotonic per reader — a replayed commit can't move it backwards.
    */
  def commitConsumer(id: String, upto: Long): Unit = synchronized {
    committedBy.put(id,
      math.max(upto, committedBy.getOrDefault(id, 0L)))
    var min = upto
    val it = committedBy.values().iterator()
    while (it.hasNext) min = math.min(min, it.next())
    truncate(min)
  }

  /** At-least-once retention: entries survive until the committed offset
    * passes them.
    */
  def truncate(uptoInclusive: Long): Unit = synchronized {
    val it = buf.headMap(uptoInclusive, true).keySet().iterator()
    var removed = 0
    while (it.hasNext) { it.next(); it.remove(); removed += 1 }
    retained.addAndGet(-removed)
    if (walDir != null && uptoInclusive > lowWater) {
      lowWater = uptoInclusive
      persistLowWater()
      walCommitted += removed
      if (walCommitted > math.max(1024L, retained.get().toLong))
        compactWal()
    }
  }

  /** Drop in-memory state only — a durable log (if any) survives, which is
    * exactly what `enableDurability` recovers from.
    */
  def clear(): Unit = synchronized {
    buf.clear(); retained.set(0); committedBy.clear()
  }

  def startServer(port: Int): Int = synchronized {
    if (server == null) {
      server = HttpServer.create(new java.net.InetSocketAddress(port), 0)
      server.createContext("/webhook", new HttpHandler {
        override def handle(x: HttpExchange): Unit = {
          val topic = x.getRequestURI.getPath.stripPrefix("/webhook")
            .stripPrefix("/") match { case "" => "default"; case t => t }
          if (x.getRequestMethod == "POST") {
            val body = new String(x.getRequestBody.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            // the idempotency header rides the record: receiver-side
            // dedup (StreamOps.dedupDeliveries) keys on it
            val dk = Option(x.getRequestHeaders
              .getFirst("X-Delivery-Key")).getOrElse("")
            val id = post(topic, body, dk)
            if (id < 0) {
              val resp = """{"error":"queue full, retry later"}""".getBytes
              x.sendResponseHeaders(503, resp.length)
              x.getResponseBody.write(resp)
            } else {
              val resp = s"""{"accepted":$id}""".getBytes
              x.sendResponseHeaders(200, resp.length)
              x.getResponseBody.write(resp)
            }
          } else x.sendResponseHeaders(405, -1)
          x.close()
        }
      })
      server.setExecutor(null)
      server.start()
    }
    server.getAddress.getPort
  }

  def stopServer(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }
}

object WebhookSource {
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("ingest_ts", TimestampType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    // X-Delivery-Key idempotency header; NULL when the sender sent none
    StructField("delivery_key", StringType, nullable = true)))
}

class WebhookSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "webhook"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebhookSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WebhookTable
}

class WebhookTable extends Table with SupportsRead {
  override def name(): String = "webhook"
  override def schema(): StructType = WebhookSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
  : ScanBuilder = new ScanBuilder {
    // admission control: .option("maxRowsPerBatch", n) caps every
    // micro-batch at n deliveries (the Kafka maxOffsetsPerTrigger analog)
    private val maxRows =
      Option(options.get("maxRowsPerBatch")).map(_.toLong)
    override def build(): Scan = new WebhookScan(maxRows)
  }
}

class WebhookScan(maxRows: Option[Long] = None) extends Scan {
  override def readSchema(): StructType = WebhookSource.schema
  override def toMicroBatchStream(checkpointLocation: String)
  : MicroBatchStream =
    new WebhookMicroBatchStream(maxRows, checkpointLocation)
}

case class WebhookOffset(seqNo: Long) extends Offset {
  override def json(): String = s"""{"seq":$seqNo}"""
}

/** Micro-batch stream over the webhook queue. With `maxRows` set the
  * stream declares a rows-per-batch ReadLimit (DSv2 admission control),
  * and `latestOffset(start, limit)` advances at most that many sequence
  * numbers per trigger — backpressure that turns an ingest burst into a
  * series of bounded batches instead of one giant one (bounding per-batch
  * task memory and commit latency), exactly the Kafka-source
  * `maxOffsetsPerTrigger` contract. Deliveries beyond the cap stay queued
  * (and WAL-retained when durability is on) for the next trigger.
  */
class WebhookMicroBatchStream(maxRows: Option[Long] = None,
                              consumerId: String = "default")
  extends MicroBatchStream with SupportsAdmissionControl {

  // retention holds for this reader from construction (query start), so a
  // second query's commits can't truncate rows this one hasn't read yet
  WebhookQueue.registerConsumer(consumerId)

  override def getDefaultReadLimit: ReadLimit =
    maxRows.fold(ReadLimit.allAvailable())(n => ReadLimit.maxRows(n))

  /** Seq numbers are contiguous (the queue's AtomicLong), so a rows cap
    * is an offset-range cap.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startSeq = start.asInstanceOf[WebhookOffset].seqNo
    val latest = WebhookQueue.latest
    limit match {
      case r: ReadMaxRows =>
        WebhookOffset(math.min(latest, startSeq + r.maxRows()))
      case _ => WebhookOffset(latest)
    }
  }

  /** Task width for batch splitting, captured ONCE at stream construction
    * (driver-side, inside the owning query's startup, where the query's
    * session is the active one). Resolving `SparkSession.active` per batch
    * would throw on a thread with no active/default session and would
    * silently follow whichever session happens to be active, not the
    * query's own.
    */
  private val width: Int = math.max(1,
    scala.util.Try(org.apache.spark.sql.SparkSession.active
      .conf.get("spark.sql.shuffle.partitions", "32").toInt).getOrElse(32))

  override def initialOffset(): Offset = WebhookOffset(0L)
  override def latestOffset(): Offset = WebhookOffset(WebhookQueue.latest)
  override def deserializeOffset(json: String): Offset =
    WebhookOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))
  override def commit(end: Offset): Unit =
    WebhookQueue.commitConsumer(consumerId,
      end.asInstanceOf[WebhookOffset].seqNo)
  override def stop(): Unit = WebhookQueue.unregisterConsumer(consumerId)

  /** The batch slice is split across the session's task width — one
    * partition per batch would serialize the whole micro-batch through a
    * single task, a choke the broker-sharded production variant never has.
    * Chunks are contiguous seq ranges, so per-partition order is ascending
    * and a range maps 1:1 onto a future broker shard.
    */
  override def planInputPartitions(start: Offset, end: Offset)
  : Array[InputPartition] = {
    val rows = WebhookQueue.slice(
      start.asInstanceOf[WebhookOffset].seqNo,
      end.asInstanceOf[WebhookOffset].seqNo)
    if (rows.isEmpty) Array.empty
    else {
      val chunk = (rows.length + width - 1) / width
      rows.grouped(chunk)
        .map(WebhookInputPartition(_): InputPartition).toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    WebhookReaderFactory
}

/** The batch slice travels inside the partition (serialized to executors —
  * correct beyond local mode, where the queue singleton wouldn't exist).
  */
case class WebhookInputPartition(
    rows: Array[(Long, Long, String, String, String)])
  extends InputPartition

object WebhookReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
  : PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[WebhookInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (seqNo, tsMicros, topic, body, dk) = rows(i)
        InternalRow(seqNo, tsMicros,
          UTF8String.fromString(topic), UTF8String.fromString(body),
          if (dk.isEmpty) null else UTF8String.fromString(dk))
      }
      override def close(): Unit = ()
    }
  }
}
