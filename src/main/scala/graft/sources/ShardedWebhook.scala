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
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Broker-sharded webhook ingest — the production-shaped extension of
  * [[WebhookQueue]]'s single listener/single queue: N listeners feed N
  * independent queues, and every micro-batch plans ONE InputPartition PER
  * SHARD behind the exact same DSv2 MicroBatchStream contract, so swapping
  * the demo source for this one changes no downstream query.
  *
  * Ordering model is the broker one (Kafka partition-key semantics): a
  * topic routes to one shard ([[route]] — murmur3 of the topic), each
  * shard's sequence numbers are assigned under its own lock, and a batch
  * partition is a contiguous ascending seq range of one shard — so
  * per-topic FIFO holds end-to-end while NO global cross-shard order
  * exists (that promise is what caps a broker's throughput; deliberately
  * not made). The HTTP front door mirrors the deployment: listener i owns
  * shard i, and key-routing lives in front (the producer/LB picks the
  * listener, exactly like a Kafka client picks the partition); in-process
  * callers get the same routing from [[post]].
  *
  * Offsets are per-shard sequence VECTORS (`{"seqs":[a,b,…]}`), the
  * Kafka-source offset-map shape: commit truncates each shard to its own
  * committed mark, so one slow shard never blocks retention on the others.
  * Kept in-memory/demo-grade like the single-queue source — the WAL
  * durability seam ([[WebhookQueue.enableDurability]]) applies per shard
  * unchanged and is not duplicated here.
  */
object ShardedWebhookQueue {

  /** One broker shard: its own skip-list buffer and seq counter — the
    * single-queue design, minus WAL, times N.
    */
  final class Shard {
    private val buf = new ConcurrentSkipListMap[Long, (Long, String, String)]()
    private val seqNo = new AtomicLong(0L)

    /** Post under the shard lock (same latest-vs-enqueue race as the
      * single queue: `latest` must never lead the buffer).
      */
    def post(topic: String, body: String): Long = synchronized {
      val id = seqNo.incrementAndGet()
      buf.put(id, (System.currentTimeMillis() * 1000L, topic, body))
      id
    }
    def latest: Long = synchronized { seqNo.get() }
    def slice(fromExclusive: Long, toInclusive: Long)
    : Array[(Long, Long, String, String)] =
      buf.subMap(fromExclusive, false, toInclusive, true)
        .entrySet().iterator().asScala
        .map(e => (e.getKey, e.getValue._1, e.getValue._2, e.getValue._3))
        .toArray
    def truncate(uptoInclusive: Long): Unit = synchronized {
      val it = buf.headMap(uptoInclusive, true).keySet().iterator()
      while (it.hasNext) { it.next(); it.remove() }
    }
    def clear(): Unit = synchronized { buf.clear(); seqNo.set(0L) }
  }

  @volatile private var shards: Array[Shard] = Array.fill(2)(new Shard)
  private var servers: Seq[HttpServer] = Nil

  /** (Re)configure the shard count; drops all queued state and listeners. */
  def init(n: Int): Unit = synchronized {
    require(n > 0, "need at least one shard")
    stopServers()
    shards = Array.fill(n)(new Shard)
  }

  def nShards: Int = shards.length
  def shard(i: Int): Shard = shards(i)

  /** Broker-key routing: same topic → same shard → per-topic FIFO. */
  def route(topic: String): Int = routeIn(shards, topic)

  private def routeIn(sh: Array[Shard], topic: String): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(topic),
      sh.length)

  /** In-process producer path: key-route then post. Returns (shard, seq).
    * The @volatile shards array is captured ONCE so the routed index and
    * the posted shard always come from the same array — a concurrent
    * init() to a smaller shard count can no longer land the post between
    * the two reads (index from the old array, shard from the new one:
    * out-of-range or inconsistent routing).
    */
  def post(topic: String, body: String): (Int, Long) = {
    val sh = shards
    val i = routeIn(sh, topic)
    (i, sh(i).post(topic, body))
  }

  def latestVector: Seq[Long] = shards.map(_.latest).toSeq

  /** One HTTP listener per shard on ephemeral ports; listener i posts
    * into shard i. Returns the bound ports in shard order.
    */
  def startServers(): Seq[Int] = synchronized {
    stopServers()
    servers = shards.indices.map { i =>
      val srv = HttpServer.create(new java.net.InetSocketAddress(0), 0)
      srv.createContext("/webhook", new HttpHandler {
        override def handle(x: HttpExchange): Unit = {
          val topic = x.getRequestURI.getPath.stripPrefix("/webhook")
            .stripPrefix("/") match { case "" => "default"; case t => t }
          if (x.getRequestMethod == "POST") {
            val body = new String(x.getRequestBody.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            val id = shards(i).post(topic, body)
            val resp = s"""{"accepted":$id,"shard":$i}""".getBytes
            x.sendResponseHeaders(200, resp.length)
            x.getResponseBody.write(resp)
          } else x.sendResponseHeaders(405, -1)
          x.close()
        }
      })
      srv.setExecutor(null)
      srv.start()
      srv
    }
    servers.map(_.getAddress.getPort)
  }

  def stopServers(): Unit = synchronized {
    servers.foreach(_.stop(0))
    servers = Nil
  }

  def clear(): Unit = synchronized { shards.foreach(_.clear()) }
}

object ShardedWebhookSource {
  val schema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("ingest_ts", TimestampType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("body", StringType, nullable = false)))
}

class ShardedWebhookProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "webhook-sharded"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardedWebhookSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ShardedWebhookTable
}

class ShardedWebhookTable extends Table with SupportsRead {
  override def name(): String = "webhook-sharded"
  override def schema(): StructType = ShardedWebhookSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
  : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new ShardedWebhookScan
  }
}

class ShardedWebhookScan extends Scan {
  override def readSchema(): StructType = ShardedWebhookSource.schema
  override def toMicroBatchStream(checkpointLocation: String)
  : MicroBatchStream = new ShardedWebhookMicroBatchStream
}

/** Per-shard sequence vector — the Kafka offset-map shape. */
case class ShardedOffset(seqs: Seq[Long]) extends Offset {
  override def json(): String = seqs.mkString("""{"seqs":[""", ",", "]}")
}

object ShardedOffset {
  def parse(json: String): ShardedOffset =
    ShardedOffset("""\d+""".r.findAllIn(json).map(_.toLong).toSeq)
}

class ShardedWebhookMicroBatchStream extends MicroBatchStream {
  private val n = ShardedWebhookQueue.nShards

  override def initialOffset(): Offset = ShardedOffset(Seq.fill(n)(0L))
  override def latestOffset(): Offset =
    ShardedOffset(ShardedWebhookQueue.latestVector)
  override def deserializeOffset(json: String): Offset =
    ShardedOffset.parse(json)
  override def commit(end: Offset): Unit =
    end.asInstanceOf[ShardedOffset].seqs.zipWithIndex.foreach {
      case (s, i) if i < n => ShardedWebhookQueue.shard(i).truncate(s)
      case _ => ()
    }
  override def stop(): Unit = ()

  /** One partition per non-empty shard: the 1:1 partition↔shard map is
    * the point of the sharded design — each task reads one broker shard's
    * contiguous ascending seq range, so per-shard order survives into the
    * task and ingest parallelism equals shard count with no splitting
    * logic. (A restart with a smaller checkpointed vector reads missing
    * shards from seq 0 — at-least-once, same as the single queue.)
    */
  override def planInputPartitions(start: Offset, end: Offset)
  : Array[InputPartition] = {
    val s = start.asInstanceOf[ShardedOffset].seqs
    val e = end.asInstanceOf[ShardedOffset].seqs
    (0 until n).flatMap { i =>
      val rows = ShardedWebhookQueue.shard(i)
        .slice(s.lift(i).getOrElse(0L), e.lift(i).getOrElse(0L))
      if (rows.isEmpty) None
      else Some(ShardedInputPartition(i, rows): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ShardedReaderFactory
}

case class ShardedInputPartition(shard: Int,
                                 rows: Array[(Long, Long, String, String)])
  extends InputPartition

object ShardedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
  : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardedInputPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.rows.length }
      override def get(): InternalRow = {
        val (seqNo, tsMicros, topic, body) = p.rows(i)
        InternalRow(p.shard, seqNo, tsMicros,
          UTF8String.fromString(topic), UTF8String.fromString(body))
      }
      override def close(): Unit = ()
    }
  }
}
