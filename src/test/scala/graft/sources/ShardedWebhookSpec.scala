package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Broker-sharded ingest: N listeners → N queues → partition-per-shard
  * micro-batch planning, per-shard FIFO preserved end-to-end.
  */
class ShardedWebhookSpec extends SparkSpec {

  test("two listeners feed two queues; per-queue order survives to the sink") {
    ShardedWebhookQueue.init(2)
    val ports = ShardedWebhookQueue.startServers()
    try {
      assert(ports.length == 2)
      val client = HttpClient.newHttpClient()
      def post(port: Int, topic: String, body: String): Int = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://localhost:$port/webhook/$topic"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString()).statusCode()

      // the front door owns key-routing: topic "orders" → listener 0,
      // "alerts" → listener 1; interleave to prove isolation
      (1 to 25).foreach { i =>
        assert(post(ports(0), "orders", s"""{"i":$i}""") == 200)
        assert(post(ports(1), "alerts", s"""{"i":$i}""") == 200)
      }

      val q = spark.readStream
        .format("graft.sources.ShardedWebhookProvider").load()
        .writeStream.format("memory").queryName("t_sharded")
        .outputMode("append").start()
      q.processAllAvailable()
      val rows = spark.table("t_sharded")
        .select(col("shard"), col("seq"), col("topic"), col("body"))
        .collect()
      q.stop()

      assert(rows.length == 50)
      // every topic lands wholly on its listener's shard
      assert(rows.filter(_.getString(2) == "orders").forall(_.getInt(0) == 0))
      assert(rows.filter(_.getString(2) == "alerts").forall(_.getInt(0) == 1))
      // per-queue FIFO: shard seqs are gapless 1..25 and the i-th seq
      // carries the i-th posted body — arrival order, not just seq order
      Seq(0, 1).foreach { sh =>
        val inOrder = rows.filter(_.getInt(0) == sh).sortBy(_.getLong(1))
        assert(inOrder.map(_.getLong(1)).toSeq == (1L to 25L))
        inOrder.zipWithIndex.foreach { case (r, idx) =>
          assert(r.getString(3) == s"""{"i":${idx + 1}}""",
            s"shard $sh seq ${idx + 1} out of arrival order")
        }
      }
    } finally {
      ShardedWebhookQueue.stopServers()
      ShardedWebhookQueue.clear()
    }
  }

  test("micro-batch planning emits one partition per non-empty shard") {
    ShardedWebhookQueue.init(2)
    // in-process producer path: key-routing must send a topic to one
    // stable shard
    val (shA, _) = ShardedWebhookQueue.post("orders", """{"i":1}""")
    assert(ShardedWebhookQueue.route("orders") == shA)
    (2 to 5).foreach(i => ShardedWebhookQueue.post("orders", s"""{"i":$i}"""))
    val other = (1 to 3).map(i =>
      ShardedWebhookQueue.shard(1 - shA).post("t", s"""{"j":$i}"""))
    assert(other == (1L to 3L))

    val stream = new ShardedWebhookMicroBatchStream
    val parts = stream
      .planInputPartitions(stream.initialOffset(), stream.latestOffset())
      .map(_.asInstanceOf[ShardedInputPartition])
    assert(parts.map(_.shard).sorted.toSeq == Seq(0, 1))
    // a partition is one shard's contiguous ascending seq range
    parts.foreach { p =>
      val seqs = p.rows.map(_._1).toSeq
      assert(seqs == (1L to seqs.length))
    }
    // offsets roundtrip through JSON (checkpoint shape)
    val off = stream.latestOffset().asInstanceOf[ShardedOffset]
    assert(ShardedOffset.parse(off.json()) == off)
    // commit truncates each shard independently
    stream.commit(ShardedOffset(if (shA == 0) Seq(2L, 1L) else Seq(1L, 2L)))
    assert(ShardedWebhookQueue.shard(shA).slice(0L, Long.MaxValue)
      .map(_._1).toSeq == (3L to 5L))
    assert(ShardedWebhookQueue.shard(1 - shA).slice(0L, Long.MaxValue)
      .map(_._1).toSeq == (2L to 3L))
    ShardedWebhookQueue.clear()
  }
}
