package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, Quality, Retention, TextOps}

/** End-to-end pipeline integration: the operators are graded one by one
  * elsewhere; this suite chains them the way a real curation run does —
  * curate (gate + near-dup retention) → materialize → constraint-check
  * the output → split → pack — and asserts the invariants that only
  * hold if the STAGES compose correctly, not just pass alone.
  */
class PipelineSpec extends SparkSpec {

  test("curate → check → split → pack composes with its invariants") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pipe").toString
    val (_, obs) = Retention.curateObserved(spark, sfTest,
      s"$dir/documents.parquet", maxRecordsPerFile = 200L)
    val nWritten = obs.get("n_written").asInstanceOf[Long]
    assert(nWritten > 0)

    // the curated output is itself a valid documents table: read it back
    // through the same Tables entry every operator uses
    val curated = Tables(spark, dir, "documents")
    assert(curated.count() == nWritten)

    // contract gate on the OUTPUT: key integrity and schema sanity must
    // survive the write
    val report = Quality.check(curated, Seq(
      Quality.NotNull("doc_id"), Quality.Unique("doc_id"),
      Quality.NotNull("text"),
      Quality.Satisfies("n_chars", col("n_chars") > 0, "positive_chars")))
    assert(Quality.passed(report), report.collect().mkString(", "))

    // retention invariant: the curated corpus has NO remaining near-dup
    // pair at the curation threshold. Survivors are per-cluster
    // canonicals; two surviving docs that still paired would have shared
    // a connected component and one of them would have been dropped.
    val residualPairs = DedupOps.ngramDedupAuto(spark, dir).count()
    assert(residualPairs == 0L,
      s"curated corpus still contains $residualPairs near-dup pairs")

    // the curated corpus flows into the split stage: deterministic,
    // exhaustive, disjoint
    val split = TextOps.splitAssign(spark, dir)
    val totals = split.groupBy().agg(sum($"n_docs")).head().getLong(0)
    assert(totals == nWritten, s"split covered $totals of $nWritten docs")

    // and into packing: per-doc offsets are a strictly increasing exact
    // prefix sum of the curated docs' token counts
    val packed = TextOps.packSequences(spark, dir)
      .select($"doc_id", $"n_tokens", $"start_off").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(packed.length == nWritten)
    packed.sliding(2).foreach {
      case Array((_, n1, o1), (_, _, o2)) => assert(o2 == o1 + n1)
      case _ => ()
    }
    // total tokens via the packing bookkeeping: last offset + last count
    val (_, lastN, lastOff) = packed.last
    val expectedTokens = curated
      .select(size(org.apache.spark.sql.functions.split($"text", " "))
        .cast("long").as("n")).agg(sum($"n")).head().getLong(0)
    assert(lastOff + lastN == expectedTokens)

    // the curated corpus materializes as training shards: every curated
    // doc lands exactly once, in the seed's deterministic order
    graft.sinks.Sinks.exportShuffled(curated, s"$dir/shards", "doc_id",
      shards = 4)
    val shardIds = spark.read.json(s"$dir/shards")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(shardIds == curated.select($"doc_id").as[Long]
      .collect().sorted.toSeq,
      "shard export lost or duplicated curated docs")
  }

  test("domain loop end-to-end: POST in → dedup → aggregate → deliver out " +
    "→ re-ingest → X-Delivery-Key dedup is exactly-once under replay") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.sources.WebhookQueue
    import graft.streaming.StreamOps
    import graft.sinks.WebhookDelivery

    val port = WebhookQueue.startServer(0)
    val dir = Files.createTempDirectory("graft_loop").toString
    val client = java.net.http.HttpClient.newHttpClient()
    def post(topic: String, body: String, dk: String = null): Int = {
      val b = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://localhost:$port/webhook/$topic"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      if (dk != null) b.header("X-Delivery-Key", dk)
      client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
    }
    WebhookQueue.clear()

    def source() = spark.readStream
      .format("graft.sources.WebhookSourceProvider").load()

    // ---- receiver side first (registration precedes data): one wire
    // view (at-least-once: shows every duplicate POST) and the deduped
    // view keyed on the captured X-Delivery-Key header
    val out = source().filter($"topic" === "out")
    val qWire = out.select($"delivery_key", $"body")
      .writeStream.format("memory").queryName("t_loop_wire")
      .option("checkpointLocation", s"$dir/ckpt_wire")
      .outputMode("append").start()
    val resultSchema = StructType(Seq(
      StructField("window_start", LongType),
      StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("sum_value", DoubleType),
      StructField("key", LongType)))
    val qRecv = StreamOps.dedupDeliveries(
        out.select($"ingest_ts", $"delivery_key",
          from_json($"body", resultSchema).as("r")))
      .select($"delivery_key", $"r.*")
      .writeStream.format("memory").queryName("t_loop_recv")
      .option("checkpointLocation", s"$dir/ckpt_recv")
      .outputMode("append").start()

    // ---- processing side: parse → sender-retry dedup on event_id →
    // watermark-finalized hourly aggregate → outbound delivery with
    // idempotency headers and a ledger
    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val events = source().filter($"topic" === "in")
      .select(from_json($"body", payloadSchema).as("e")).select("e.*")
    // aggregate only the product event types — AFTER the watermark node
    // inside dedup, so watermark carriers (the test's zz_flush sentinel)
    // advance event time without polluting the delivered results
    val agg = StreamOps.tumbling(StreamOps.dedup(events)
        .filter($"event_type".isin("click", "view", "error")))
      .select(unix_millis($"window.start").as("window_start"),
        $"event_type", $"n", $"sum_value")
      .withColumn("key", abs(xxhash64($"window_start", $"event_type")))
    val qProc = WebhookDelivery.streamDeliver(agg,
      s"http://localhost:$port/webhook/out", "key",
      s"$dir/ledger", s"$dir/ckpt_proc")

    try {
      // await initialization: a query registers its queue consumer during
      // startup, which is asynchronous to .start() returning — posting
      // before all three are registered lets one query's commit truncate
      // entries another has not read yet
      Seq(qWire, qRecv, qProc).foreach(_.processAllAvailable())
      def body(id: Long, h: Int, typ: String): String =
        s"""{"event_id":$id,"ts":"2024-03-01 $h:05:00","user_id":${id % 3},""" +
          s""""event_type":"$typ","value":$id.0}"""
      val evs = Seq(
        (1L, 10, "click"), (2L, 10, "click"), (3L, 10, "click"),
        (4L, 10, "view"), (5L, 10, "view"),
        (6L, 11, "click"), (7L, 11, "click"), (8L, 11, "view"),
        (9L, 11, "error"), (10L, 11, "error"))
      evs.foreach { case (id, h, t) => assert(post("in", body(id, h, t)) == 200) }
      // sender retries: 3 deliveries arrive twice (at-least-once ingest)
      Seq((2L, 10, "click"), (5L, 10, "view"), (9L, 11, "error"))
        .foreach { case (id, h, t) => assert(post("in", body(id, h, t)) == 200) }
      qProc.processAllAvailable()
      // event-time sentinel finalizes both hours (its own window stays
      // open and is never delivered)
      assert(post("in", body(999, 20, "zz_flush")) == 200)
      qProc.processAllAvailable()
      qWire.processAllAvailable(); qRecv.processAllAvailable()

      // 13 wire-in (3 dups) → 10 distinct → 5 finalized groups delivered
      val wire1 = spark.sql("select delivery_key, body from t_loop_wire")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(wire1.length == 5, s"expected 5 deliveries, got ${wire1.length}")
      assert(wire1.forall { case (dk, _) => dk != null && dk.nonEmpty },
        "X-Delivery-Key header not captured on ingest")

      // ---- injected replay: the crash-in-the-POST→ledger-window / task
      // retry shape — every delivery re-POSTs with the SAME header+body
      wire1.foreach { case (dk, b) => assert(post("out", b, dk) == 200) }
      qWire.processAllAvailable(); qRecv.processAllAvailable()

      assert(spark.sql("select * from t_loop_wire").count() == 10,
        "replay duplicates never reached the wire — injection failed")
      val recv = spark.sql(
        """select delivery_key, window_start, event_type, n, sum_value, key
          |from t_loop_recv""".stripMargin).collect()
      assert(recv.length == 5,
        s"receiver dedup broke exactly-once: ${recv.length} rows")
      // header ↔ payload contract: the header IS "<batch>:<key>"
      recv.foreach(r =>
        assert(r.getString(0).endsWith(":" + r.getLong(5)),
          s"header ${r.getString(0)} does not carry key ${r.getLong(5)}"))
      // end-to-end accounting equals the batch-computed truth over the
      // 10 DISTINCT events (a lost sender-dedup would double 2, 5, 9)
      val h10 = java.time.Instant.parse("2024-03-01T10:00:00Z").toEpochMilli
      val h11 = h10 + 3600000L
      val gotAgg = recv.map(r => (r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
      assert(gotAgg == Set(
        (h10, "click", 3L, 6.0), (h10, "view", 2L, 9.0),
        (h11, "click", 2L, 13.0), (h11, "view", 1L, 8.0),
        (h11, "error", 2L, 19.0)), s"got $gotAgg")
      // the delivery ledger settled every row exactly once, none dead
      val ledger = WebhookDelivery.ledger(spark, s"$dir/ledger")
      assert(ledger.count() == 5)
      assert(WebhookDelivery.deadLetters(spark, s"$dir/ledger").count() == 0)
    } finally {
      qProc.stop(); qWire.stop(); qRecv.stop()
      WebhookQueue.stopServer()
      WebhookQueue.clear()
    }
  }

  test("domain loop survives a processor restart mid-stream: dedup state, " +
    "aggregate state, ledger, and batch ids all resume") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.sources.WebhookQueue
    import graft.streaming.StreamOps
    import graft.sinks.WebhookDelivery

    val port = WebhookQueue.startServer(0)
    val dir = Files.createTempDirectory("graft_loop_rs").toString
    val client = java.net.http.HttpClient.newHttpClient()
    def post(topic: String, body: String): Int =
      client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/webhook/$topic"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
    WebhookQueue.clear()

    def source() = spark.readStream
      .format("graft.sources.WebhookSourceProvider").load()
    val out = source().filter($"topic" === "out")
    val qWire = out.select($"delivery_key", $"body")
      .writeStream.format("memory").queryName("t_loop2_wire")
      .option("checkpointLocation", s"$dir/ckpt_wire")
      .outputMode("append").start()

    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def startProc() = {
      val events = source().filter($"topic" === "in")
        .select(from_json($"body", payloadSchema).as("e")).select("e.*")
      val agg = StreamOps.tumbling(StreamOps.dedup(events)
          .filter($"event_type".isin("click", "view", "error")))
        .select(unix_millis($"window.start").as("window_start"),
          $"event_type", $"n", $"sum_value")
        .withColumn("key", abs(xxhash64($"window_start", $"event_type")))
      WebhookDelivery.streamDeliver(agg,
        s"http://localhost:$port/webhook/out", "key",
        s"$dir/ledger", s"$dir/ckpt_proc")
    }
    val qProc1 = startProc()
    var qProc2: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      Seq(qWire, qProc1).foreach(_.processAllAvailable())
      def body(id: Long, h: Int, typ: String): String =
        s"""{"event_id":$id,"ts":"2024-03-01 $h:05:00","user_id":${id % 3},""" +
          s""""event_type":"$typ","value":$id.0}"""
      // phase 1: hour-10 traffic (one duplicate) — ingested, deduped, and
      // sitting OPEN in the aggregate when the processor stops
      Seq((1L, 10, "click"), (2L, 10, "click"), (2L, 10, "click"),
        (3L, 10, "view"))
        .foreach { case (id, h, t) => assert(post("in", body(id, h, t)) == 200) }
      qProc1.processAllAvailable()
      qProc1.stop() // planned restart — nothing was delivered yet

      // phase 2, after the restart: a LATE duplicate of event 2 (only the
      // restored dedup state can drop it), hour-11 traffic, the sentinel
      qProc2 = startProc()
      qProc2.processAllAvailable()
      Seq((2L, 10, "click"), (4L, 11, "click"), (5L, 11, "error"))
        .foreach { case (id, h, t) => assert(post("in", body(id, h, t)) == 200) }
      qProc2.processAllAvailable()
      assert(post("in", body(999, 20, "zz_flush")) == 200)
      qProc2.processAllAvailable()
      qWire.processAllAvailable()

      // 4 finalized groups, each delivered EXACTLY once at the wire —
      // hour-10 groups finalize entirely from restored state, and the
      // replayed duplicate of event 2 must not inflate the click count
      val wire = spark.sql("select delivery_key, body from t_loop2_wire")
        .collect().map(r => (r.getString(0), r.getString(1)))
      assert(wire.length == 4,
        s"expected 4 post-restart deliveries, got ${wire.toSeq}")
      val h10 = java.time.Instant.parse("2024-03-01T10:00:00Z").toEpochMilli
      val h11 = h10 + 3600000L
      val gotAgg = wire.map(_._2).map { b =>
        val r = spark.read.json(Seq(b).toDS()).head()
        (r.getAs[Long]("window_start"), r.getAs[String]("event_type"),
          r.getAs[Long]("n"), r.getAs[Double]("sum_value"))
      }.toSet
      assert(gotAgg == Set(
        (h10, "click", 2L, 3.0), (h10, "view", 1L, 3.0),
        (h11, "click", 1L, 4.0), (h11, "error", 1L, 5.0)), s"got $gotAgg")
      // ledger settled each group once, none dead, under post-restart
      // batch ids (monotonic from the checkpoint, never reused)
      val ledger = WebhookDelivery.ledger(spark, s"$dir/ledger")
      assert(ledger.count() == 4)
      assert(WebhookDelivery.deadLetters(spark, s"$dir/ledger").count() == 0)
    } finally {
      if (qProc2 != null) qProc2.stop()
      qWire.stop()
      WebhookQueue.stopServer()
      WebhookQueue.clear()
    }
  }

  test("full-system walk: webhook ingest feeds the lake, a sealed day's " +
    "aggregate delivers downstream exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    import graft.sources.WebhookQueue
    import graft.sinks.{LakeSink, WebhookDelivery}

    val port = WebhookQueue.startServer(0)
    val dir = Files.createTempDirectory("graft_walk").toString
    val client = java.net.http.HttpClient.newHttpClient()
    def post(topic: String, body: String): Int =
      client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://localhost:$port/webhook/$topic"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
    WebhookQueue.clear()

    def source() = spark.readStream
      .format("graft.sources.WebhookSourceProvider").load()
    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))

    // capture wire for the outbound report (register before posting)
    val qWire = source().filter($"topic" === "report")
      .select($"body")
      .writeStream.format("memory").queryName("t_walk_wire")
      .option("checkpointLocation", s"$dir/ckpt_wire")
      .outputMode("append").start()

    // ingest feed: webhook events land in the date-partitioned lake
    val events = source().filter($"topic" === "ingest")
      .select(from_json($"body", payloadSchema).as("e")).select("e.*")
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    val qFeed = LakeSink.start(events, s"$dir/lake", s"$dir/ckpt_feed",
      "day")
    try {
      Seq(qWire, qFeed).foreach(_.processAllAvailable())
      def body(id: Long, day: String, typ: String, v: Double) =
        s"""{"event_id":$id,"ts":"$day 10:0$id:00","event_type":"$typ","value":$v}"""
      Seq(
        body(1, "2024-03-01", "click", 2.0),
        body(2, "2024-03-01", "click", 3.0),
        body(3, "2024-03-01", "view", 5.0),
        body(4, "2024-03-02", "view", 7.0)).foreach { b =>
        assert(post("ingest", b) == 200)
      }
      qFeed.processAllAvailable()
      qFeed.stop()

      // day 1 closed: seal it, aggregate THE SEALED VIEW, deliver the
      // report, with the ledger making a crash-replay exactly-once
      LakeSink.sealDays(spark, s"$dir/lake", "day", Seq("2024-03-01"))
      val dayAgg = LakeSink.read(spark, s"$dir/lake", "day")
        .filter($"day".cast("string") === "2024-03-01")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .withColumn("key", abs(xxhash64($"event_type")))
      val (posted, dead) = WebhookDelivery.deliverBatch(dayAgg, 1L,
        s"http://localhost:$port/webhook/report", "key", s"$dir/ledger")
      assert(posted == 2 && dead == 0)
      // replay of the same batch settles without re-posting
      val (re, reDead) = WebhookDelivery.deliverBatch(dayAgg, 1L,
        s"http://localhost:$port/webhook/report", "key", s"$dir/ledger")
      assert(re == 0 && reDead == 0)

      qWire.processAllAvailable()
      val got = spark.sql("select body from t_walk_wire").collect()
        .map { r =>
          val b = spark.read.json(Seq(r.getString(0)).toDS()).head()
          (b.getAs[String]("event_type"), b.getAs[Long]("n"),
            b.getAs[Double]("sum_value"))
        }.toSet
      assert(got == Set(("click", 2L, 5.0), ("view", 1L, 5.0)),
        s"delivered report diverged: $got")
      // the open day stayed out of the sealed-day report
      assert(!got.exists(_._3 == 7.0))
    } finally {
      qWire.stop()
      WebhookQueue.stopServer()
      WebhookQueue.clear()
    }
  }

  test("lake lifecycle composes: feed → seal → CDC correction → erasure " +
    "→ manifest scan → TTL, with exact accounting at every step") {
    import spark.implicits._
    import graft.sinks.{LakeSink, Sinks}
    import graft.sources.Manifest
    val dir = Files.createTempDirectory("graft_lakelife").toString
    val lake = s"$dir/lake"
    def row(id: Long, day: String, user: Long, v: Long) = (id, day, user, v)
    // model: what the lake must contain after each verb
    val model = scala.collection.mutable.Set[(Long, String, Long, Long)]()

    // two ingest batches spanning three days (the streaming wiring is
    // proven in LakeSinkSpec; here the subject is verb COMPOSITION)
    val b0 = Seq(row(1, "2024-05-01", 7, 10), row(2, "2024-05-01", 13, 20),
      row(3, "2024-05-02", 7, 30))
    val b1 = Seq(row(4, "2024-05-02", 13, 40), row(5, "2024-05-03", 7, 50))
    LakeSink.applyBatch(b0.toDF("id", "day", "user", "v"), 0, lake, "day")
    LakeSink.applyBatch(b1.toDF("id", "day", "user", "v"), 1, lake, "day")
    model ++= b0 ++= b1
    def read() = LakeSink.read(spark, lake, "day")
      .select($"id", $"day".cast("string"), $"user", $"v")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(read() == model.toSet)

    // watermark passed days 1-2: seal them, manifest maintained
    LakeSink.sealDays(spark, lake, "day", Seq("2024-05-01", "2024-05-02"),
      manifestCols = Seq("id", "day"))
    assert(read() == model.toSet, "sealing changed the data")

    // late CDC correction lands on the SEALED side: revise row 1,
    // retract row 2, one genuinely-late insert for day 1
    Sinks.mergePartitions(spark, s"$lake/sealed", "day",
      Seq((1L, "2024-05-01", 7L, 11L, "upsert"),
        (2L, "2024-05-01", 13L, 0L, "delete"),
        (9L, "2024-05-01", 9L, 90L, "upsert"))
        .toDF("id", "day", "user", "v", "op"),
      Seq("id"), opCol = Some("op"))
    model -= row(1, "2024-05-01", 7, 10) -= row(2, "2024-05-01", 13, 20)
    model += row(1, "2024-05-01", 7, 11) += row(9, "2024-05-01", 9, 90)
    assert(read() == model.toSet, "CDC correction diverged")

    // right-to-be-forgotten: user 13's rows leave day 2
    Sinks.erasePartitionRows(spark, s"$lake/sealed", "day",
      Seq("2024-05-02"), col("user") === 13L)
    model -= row(4, "2024-05-02", 13, 40)
    assert(read() == model.toSet, "erasure diverged")

    // maintenance invalidated the manifest: per-day refresh, then a
    // skipping scan must agree with the maintained truth
    Seq("2024-05-01", "2024-05-02").foreach { d =>
      Manifest.refreshPartition(spark, s"$lake/sealed", "day", d,
        Seq("id", "day"))
    }
    val viaManifest = Manifest.scan(spark, s"$lake/sealed",
      Map("id" -> (1L, 4L)))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(viaManifest == model.toSeq
      .filter(r => r._2 != "2024-05-03" && r._1 >= 1 && r._1 <= 4)
      .map(_._1).sorted,
      "manifest scan disagrees with the maintained lake")

    // retention horizon passes day 1: a directory delete
    Sinks.dropPartitions(spark, s"$lake/sealed", "day", Seq("2024-05-01"))
    model.retain(_._2 != "2024-05-01")
    assert(read() == model.toSet, "TTL diverged")
  }
}
