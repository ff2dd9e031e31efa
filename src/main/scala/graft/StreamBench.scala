package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Event, StreamOps}

/** Streaming throughput bench: replays the events table through the three
  * stateful streaming pipelines (tumbling agg, exactly-once dedup, session
  * windows) via MemoryStream in fixed-size micro-batches and reports
  * events/second per pipeline as one JSON line. Complements graft.Bench
  * (batch latency) on the stream-processor side of the engine.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamBench"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // stateful micro-batches pay per-state-store-partition overhead each
    // batch (checkpoint + commit per partition), so width should track
    // STATE volume, not core count: 4 partitions ≈ 10k/19k/14k events/s
    // for tumbling/dedup/sessions here vs ~3.4k/7.4k/7.4k at 32. An
    // explicit SPARK_GRAFT_STREAM_CPUS (or the general SPARK_GRAFT_CPUS
    // contract variable) still wins over the measured default.
    val cpus = sys.env.get("SPARK_GRAFT_STREAM_CPUS")
      .orElse(sys.env.get("SPARK_GRAFT_CPUS"))
      .getOrElse("4")
    val batchSize = 10000
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the media gate's in-stream MapState (round 14) runs on
    // transformWithState — RocksDB provider required, and every other
    // stateful pipeline here runs fine on it too
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // operational seam: every micro-batch of every pipeline lands one
    // progress row (rates, durations, state size, watermark lag) in the
    // metrics table — the thing a long-running deploy actually monitors
    val metrics = graft.streaming.QueryMetrics.attach(spark)
    val metricsPath = sys.env.getOrElse("SPARK_GRAFT_METRICS_DIR",
      "/tmp/graft_stream_metrics")

    val events = Tables(spark, sfDir, "events").as[Event].collect()

    def runOn(name: String, evs: Array[Event],
              pipe: org.apache.spark.sql.DataFrame =>
                org.apache.spark.sql.DataFrame,
              mode: String): (String, Double) = {
      val ms = MemoryStream[Event]
      val q = pipe(ms.toDF())
        .writeStream.format("memory").queryName(s"sb_$name")
        .outputMode(mode).start()
      val t0 = System.nanoTime()
      evs.grouped(batchSize).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      name -> (evs.length / secs)
    }

    def run(name: String,
            pipe: org.apache.spark.sql.DataFrame =>
              org.apache.spark.sql.DataFrame,
            mode: String): (String, Double) =
      runOn(name, events, pipe, mode)

    /** CONTROL pipeline (round 16 — the r15 verdict's unverified-weather
      * item): the tumbling agg over a PINNED 50k-event slice, measured
      * FIRST every run and never changed again. Its rate calibrates the
      * machine window for the whole record, so two records' per-pipeline
      * ratios are judged against the control ratio instead of a bare
      * weather claim — the batch bench's epoch_plan-control discipline,
      * stream side (`tools/streambench_diff.py` is the install gate).
      * The slice is fixed-size so the control cost stays constant even
      * if the fixture grows.
      */
    def runControl(): (String, Double) =
      runOn("control", events.take(50000), StreamOps.tumbling, "update")

    // two-stream pipelines: the event stream splits by type into the
    // click/purchase sides, fed in lockstep micro-batches so both
    // watermarks advance together (a starved side would hold the join
    // watermark at zero and buffer the other side forever)
    def runJoin(name: String,
                join: (org.apache.spark.sql.DataFrame,
                  org.apache.spark.sql.DataFrame) =>
                  org.apache.spark.sql.DataFrame): (String, Double) = {
      val mc = MemoryStream[Event]
      val mp = MemoryStream[Event]
      val q = join(mc.toDF(), mp.toDF())
        .writeStream.format("memory").queryName(s"sb_$name")
        .outputMode("append").start()
      val (clicks, purchases) = events.partition(_.event_type == "click")
      val cChunks = clicks.grouped(batchSize).toSeq
      val pChunks = purchases.grouped(batchSize).toSeq
      val t0 = System.nanoTime()
      for (i <- 0 until math.max(cChunks.size, pChunks.size)) {
        cChunks.lift(i).foreach(ch => mc.addData(ch.toIndexedSeq))
        pChunks.lift(i).foreach(ch => mp.addData(ch.toIndexedSeq))
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      name -> (events.length / secs)
    }

    // the weighted reservoir streams the documents table (doc_id,
    // n_chars), not events — smaller chunks so the run still spans
    // several micro-batches at the fixture's corpus size
    def runReservoir(): (String, Double) = {
      val docsRows = Tables(spark, sfDir, "documents")
        .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
      val ms = MemoryStream[(Long, Long)]
      val q = StreamOps
        .streamWeightedSample(ms.toDS().toDF("doc_id", "n_chars"))
        .writeStream.format("memory").queryName("sb_reservoir")
        .outputMode("complete").start()
      val t0 = System.nanoTime()
      docsRows.grouped(500).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      "reservoir" -> (docsRows.length / secs)
    }

    // the drift monitor joins each finalized window against a frozen
    // baseline computed once from the same corpus (the production shape:
    // last vetted profile vs live windows)
    val (baseline, lo, hi) =
      StreamOps.driftBaseline(Tables(spark, sfDir, "events"))

    // content novelty streams documents (like the reservoir) against the
    // frozen corpus shingle set; rate is docs/second
    def runNovelty(): (String, Double) = {
      val corpus = StreamOps.noveltyCorpus(Tables(spark, sfDir, "documents"))
      val docsRows = Tables(spark, sfDir, "documents")
        .select($"doc_id", $"source", $"text")
        .as[(Long, String, String)].collect()
      val ms = MemoryStream[(Long, String, String)]
      val q = StreamOps
        .contentNovelty(ms.toDS().toDF("doc_id", "source", "text"), corpus)
        .writeStream.format("memory").queryName("sb_novelty")
        .outputMode("complete").start()
      val t0 = System.nanoTime()
      docsRows.grouped(500).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      "novelty" -> (docsRows.length / secs)
    }
    // the quality monitor judges events against the same rule set the
    // replay spec uses (null/range/category gates on the event schema)
    val qualityRules = Seq(
      graft.operators.Quality.NotNull("user_id"),
      graft.operators.Quality.InRange("value", 0.0, 1e6),
      graft.operators.Quality.Accepted("event_type",
        Seq("click", "view", "signup", "purchase", "error")))

    // media dedup streams the synthesized image table against the frozen
    // corpus hash set; rate is images/second (each pays a real PNG
    // decode + 8×8 resample)
    def runMediaDedup(): (String, Double) = {
      // one synthesis pass, sorted so the first-200 corpus slice is
      // pinned regardless of collect partition order
      val media = graft.operators.Multimodal.mediaTable(spark, sfDir)
        .select($"media_id", $"content")
        .as[(Long, Array[Byte])].collect().sortBy(_._1)
      val corpus = StreamOps.mediaCorpusHashes(
        media.take(200).map(_._2).toSeq.toDF("content"))
      val ms = MemoryStream[(Long, Array[Byte])]
      val q = StreamOps
        .mediaDedup(ms.toDS().toDF("media_id", "content"), corpus)
        .writeStream.format("memory").queryName("sb_media_dedup")
        .outputMode("append").start()
      val t0 = System.nanoTime()
      media.grouped(500).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      "media_dedup" -> (media.length / secs)
    }
    def runOov(): (String, Double) = {
      val docs = Tables(spark, sfDir, "documents")
        .select($"doc_id", $"lang", $"text")
        .as[(Long, String, String)].collect()
      val vocab = graft.operators.TextOps
        .corpusVocab(Tables(spark, sfDir, "documents"))
        .localCheckpoint(true) // freeze: the monitor must not rescan
      val ms = MemoryStream[(Long, String, String)]
      val q = StreamOps.oovMonitor(
        ms.toDS().toDF("doc_id", "lang", "text"), vocab)
        .writeStream.format("memory").queryName("sb_oov")
        .outputMode("complete").start()
      val t0 = System.nanoTime()
      docs.grouped(500).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      "oov" -> (docs.length / secs)
    }
    // tokenization monitor: docs/second through the frozen-merge BPE
    // apply (each doc pays full word-level merge application)
    def runTokenize(): (String, Double) = {
      val docs = Tables(spark, sfDir, "documents")
        .select($"doc_id", $"source", $"text")
        .as[(Long, String, String)].collect()
      val merges = graft.operators.TextOps.bpeMerges(spark, sfDir)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val ms = MemoryStream[(Long, String, String)]
      val q = StreamOps.tokenMonitor(
        ms.toDS().toDF("doc_id", "source", "text"), merges)
        .writeStream.format("memory").queryName("sb_tokmon")
        .outputMode("complete").start()
      val t0 = System.nanoTime()
      docs.grouped(500).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      "tokenize" -> (docs.length / secs)
    }
    // cluster maintenance: docs/second through the incremental CC
    // (init on the first half, stream the rest in micro-batch-sized
    // applyBatch calls — the foreachBatch path without the sink)
    def runClusterMaint(): (String, Double) = {
      val docs = Tables(spark, sfDir, "documents")
        .select($"doc_id", $"text")
        .as[(Long, String)].collect().sortBy(_._1)
      val (corpus, arriving) = docs.splitAt(docs.length / 2)
      val path = java.nio.file.Files
        .createTempDirectory("sb_cmaint").toString
      graft.streaming.ClusterMaint.init(
        corpus.toSeq.toDF("doc_id", "text"), path)
      val t0 = System.nanoTime()
      arriving.grouped(1000).zipWithIndex.foreach { case (chunk, i) =>
        graft.streaming.ClusterMaint.applyBatch(
          chunk.toSeq.toDF("doc_id", "text"), i.toLong, path).count()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      "cluster_maint" -> (arriving.length / secs)
    }
    // semantic tier: vectors/second through the frozen-quantizer
    // incremental CC (same split protocol as the text tier)
    def runSemanticMaint(): (String, Double) = {
      val vecs = Tables(spark, sfDir, "embeddings")
        .select($"vec_id", $"embedding")
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val (corpus, arriving) = vecs.splitAt(vecs.length / 2)
      val path = java.nio.file.Files
        .createTempDirectory("sb_smaint").toString
      graft.streaming.SemanticMaint.init(
        corpus.toSeq.toDF("vec_id", "embedding"), path)
      val t0 = System.nanoTime()
      arriving.grouped(500).zipWithIndex.foreach { case (chunk, i) =>
        graft.streaming.SemanticMaint.applyBatch(
          chunk.toSeq.toDF("vec_id", "embedding"), i.toLong, path).count()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      "semantic_maint" -> (arriving.length / secs)
    }
    // media tier: blobs/second through the pre-banded phash CC (each
    // arriving blob pays a real decode + hash in the stateless pass)
    def runMediaMaint(): (String, Double) = {
      val media = graft.operators.Multimodal.mediaTable(spark, sfDir)
        .select($"media_id", $"content")
        .as[(Long, Array[Byte])].collect().sortBy(_._1)
      val (corpus, arriving) = media.splitAt(media.length / 2)
      val path = java.nio.file.Files
        .createTempDirectory("sb_mmaint").toString
      graft.streaming.MediaMaint.init(
        corpus.toSeq.toDF("media_id", "content"), path)
      val t0 = System.nanoTime()
      arriving.grouped(500).zipWithIndex.foreach { case (chunk, i) =>
        graft.streaming.MediaMaint.applyBatch(
          chunk.toSeq.toDF("media_id", "content"), i.toLong, path).count()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      "media_maint" -> (arriving.length / secs)
    }
    // served-index tier (r19): vectors/second through frozen-epoch
    // quantization + cell assignment + the anti-join-guarded index
    // append (same split protocol as the other maintainers)
    def runQuantMaint(): (String, Double) = {
      val vecs = Tables(spark, sfDir, "embeddings")
        .select($"vec_id", $"embedding")
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val (corpus, arriving) = vecs.splitAt(vecs.length / 2)
      val path = java.nio.file.Files
        .createTempDirectory("sb_qmaint").toString
      graft.streaming.QuantMaint.init(
        corpus.toSeq.toDF("vec_id", "embedding"), path)
      val t0 = System.nanoTime()
      arriving.grouped(500).zipWithIndex.foreach { case (chunk, i) =>
        graft.streaming.QuantMaint.applyBatch(
          chunk.toSeq.toDF("vec_id", "embedding"), i.toLong, path).count()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      "quant_maint" -> (arriving.length / secs)
    }
    val results = Seq(
      runControl(),
      run("tumbling", StreamOps.tumbling, "update"),
      run("dedup", StreamOps.dedup, "append"),
      run("sessions", StreamOps.sessions, "append"),
      run("drift", df => StreamOps.psiDrift(df, baseline, lo, hi), "update"),
      run("quality", df => StreamOps.qualityMonitor(df, qualityRules),
        "update"),
      // rate gate at 100 tokens/s so replayed fixture traffic actually
      // exercises both admit and reject paths per user
      run("rate_limit",
        df => StreamOps.rateLimit(df.as[Event], ratePerSec = 100,
          capacity = 500).toDF(), "append"),
      runJoin("join_inner", StreamOps.conversionJoin),
      runJoin("join_outer", StreamOps.conversionJoinOuter),
      runReservoir(),
      runNovelty(),
      runOov(),
      runMediaDedup(),
      runTokenize(),
      runClusterMaint(),
      runSemanticMaint(),
      runMediaMaint(),
      runQuantMaint())
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.0f" }
      .mkString("{", ",", "}")
    val nMetrics = metrics.drainTo(spark, metricsPath)
    // provider is part of the record since r14: the media gate forced a
    // global switch to RocksDB, so r14+ rates are NOT like-for-like with
    // pre-r14 HDFS-backed runs — the bench-env-confound rule applies
    val out = s"""{"metric":"stream_events_per_sec","pipelines":$qs,""" +
      s""""n_events":${events.length},"batch_size":$batchSize,""" +
      s""""state_store":"rocksdb","cpus":"$cpus",""" +
      s""""cpus_env_set":${sys.env.contains("SPARK_GRAFT_STREAM_CPUS") ||
        sys.env.contains("SPARK_GRAFT_CPUS")},""" +
      s""""metrics_rows":$nMetrics,"metrics_path":"$metricsPath",""" +
      s""""sf":"$sfDir"}"""
    println(out)
    // lossless copy (stdout truncates on some drivers) — the batch
    // bench's SPARK_GRAFT_BENCH_OUT convention
    sys.env.get("SPARK_GRAFT_STREAMBENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), out)
    }
    spark.stop()
  }
}
