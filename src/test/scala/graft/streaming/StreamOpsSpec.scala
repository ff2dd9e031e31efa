package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Deterministic-replay tests for the streaming inventory (SURVEY.md §5.3):
  * stream ≡ batch on identical data, exactly-once dedup, late-data drop,
  * session finalization, custom stateful alarms.
  */
class StreamOpsSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long, typ: String,
                 v: Double): Event =
    Event(id, Timestamp.valueOf(t), user, typ, v, """{"k":1}""")

  test("stream tumbling aggregate equals its batch twin on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfTest, "events").as[Event].collect()

    val ms = MemoryStream[Event]
    val q = StreamOps.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("t_tumb")
      .outputMode("complete").start()
    ms.addData(events.toIndexedSeq)
    q.processAllAvailable()

    val streamed = spark.sql(
      "select window.start as hour, event_type, n, sum_value from t_tumb")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
        (r.getLong(2), math.round(r.getDouble(3) * 100)))
      .toMap
    val batch = Tables(spark, sfTest, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
        (r.getLong(2), math.round(r.getDouble(3) * 100)))
      .toMap
    q.stop()
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("watermark composition accepts an equal horizon, rejects a foreign " +
    "column or delay loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // equal column+delay upstream: composes (the dedup→tumbling chain)
    val ok = MemoryStream[Event]
    val composed = StreamOps.tumbling(
      ok.toDF().withWatermark("ts", "2 hours"))
    assert(composed.isStreaming)
    // a watermark on a DIFFERENT event-time column must not silently
    // govern this operator's late-data semantics (the advice finding:
    // tumbling over an ingest_ts/replay-horizon watermark)
    val wrongCol = MemoryStream[Event]
    val e1 = intercept[IllegalArgumentException] {
      StreamOps.tumbling(wrongCol.toDF()
        .withColumn("ingest_ts", col("ts"))
        .withWatermark("ingest_ts", "2 hours"))
    }
    assert(e1.getMessage.contains("ingest_ts"))
    // same column, different horizon: also loud — "15 minutes" admits
    // less lateness than the documented 2h contract
    val wrongDelay = MemoryStream[Event]
    val e2 = intercept[IllegalArgumentException] {
      StreamOps.tumbling(wrongDelay.toDF().withWatermark("ts", "15 minutes"))
    }
    assert(e2.getMessage.contains("15 minutes") ||
      e2.getMessage.contains("2 hours"))
  }

  test("stream windowed approx-distinct equals its batch twin on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfTest, "events").as[Event].collect()

    val ms = MemoryStream[Event]
    val q = StreamOps.tumblingUniques(ms.toDF())
      .writeStream.format("memory").queryName("t_uniq")
      .outputMode("complete").start()
    // two batches: the HLL state must MERGE across micro-batches, not
    // restart — a non-mergeable sketch would diverge from batch here
    val (first, second) = events.splitAt(events.length / 2)
    ms.addData(first.toIndexedSeq)
    q.processAllAvailable()
    ms.addData(second.toIndexedSeq)
    q.processAllAvailable()

    val streamed = spark.sql(
      "select window.start as hour, event_type, n_users_approx from t_uniq")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = Tables(spark, sfTest, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(approx_count_distinct($"user_id", 0.01).as("n_users_approx"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2))
      .toMap
    q.stop()
    // same sketch, same data → identical estimates, however it was batched
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming PSI drift equals its batch twin against the frozen " +
    "baseline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfTest, "events").as[Event].collect()
    // the baseline is the full historical corpus — the same reference
    // distribution the batch twin derives internally, so stream ≡ batch
    // must hold row-for-row, drift booleans included
    val (baseline, lo, hi) =
      StreamOps.driftBaseline(Tables(spark, sfTest, "events"))

    val ms = MemoryStream[Event]
    val q = StreamOps.psiDrift(ms.toDF(), baseline, lo, hi)
      .writeStream.format("memory").queryName("t_drift")
      .outputMode("complete").start()
    // uneven micro-batches: the histogram counters must merge across
    // batch boundaries, not restart per batch
    events.grouped(371).foreach { g =>
      ms.addData(g.toIndexedSeq)
      q.processAllAvailable()
    }

    val streamed = spark.sql(
      "select cast(window.start as date) as day, event_type, psi, drift " +
        "from t_drift")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        (r.getDouble(2), r.getBoolean(3)))
      .toMap
    val batch = graft.operators.Events.psiDrift(spark, sfTest).collect()
      .map(r => (r.getDate(1).toString, r.getString(0)) ->
        (r.getDouble(2), r.getBoolean(3)))
      .toMap
    q.stop()
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming PSI drift counts live values OUTSIDE the frozen " +
    "baseline range (low-side clamp)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // baseline profile: values uniform in [10, 20]
    val static = (0 until 100)
      .map(i => ("a", 10.0 + (i % 11))).toDF("event_type", "value")
    val (baseline, lo, hi) = StreamOps.driftBaseline(static)
    assert(lo == 10.0 && hi == 20.0)
    // live window: every value BELOW the baseline minimum — the drifted
    // producer the monitor exists for. Pre-fix, these landed in a
    // negative bucket (no cell) while still inflating the window total,
    // so the distribution silently lost its mass and PSI under-reported.
    val ms = MemoryStream[Event]
    val q = StreamOps.psiDrift(ms.toDF(), baseline, lo, hi)
      .writeStream.format("memory").queryName("t_drift_low")
      .outputMode("complete").start()
    ms.addData((1 to 50).map(i =>
      ev(i.toLong, "2024-01-01 12:00:00", i.toLong, "a", -5.0)))
    q.processAllAvailable()
    val rows = spark.sql("select psi, drift from t_drift_low").collect()
    q.stop()
    assert(rows.length == 1)
    // all mass in bucket 0 vs a flat baseline: a large, FINITE psi that
    // trips the alarm
    assert(rows.head.getDouble(0) > 0.2 && !rows.head.getDouble(0).isNaN)
    assert(rows.head.getBoolean(1))
  }

  test("streaming content novelty tracks per-source novel-shingle rates " +
    "against the frozen corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = StreamOps.noveltyCorpus(
      Tables(spark, sfTest, "documents"))
    val corpusSet = corpus.as[String].collect().toSet
    // arriving docs: src_old re-crawls corpus content (novelty 0),
    // src_new mixes known and unseen trigrams
    val oldDocs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().take(10)
      .map { case (id, t) => (id, "src_old", t) }
    val newDocs = (0 until 8).map { i =>
      (1000L + i, "src_new",
        s"zz$i yy$i xx$i ww$i " + oldDocs(i % oldDocs.length)._3)
    }
    val all = (oldDocs ++ newDocs).toSeq

    val ms = MemoryStream[(Long, String, String)]
    val q = StreamOps.contentNovelty(
      ms.toDS().toDF("doc_id", "source", "text"), corpus)
      .writeStream.format("memory").queryName("t_novelty")
      .outputMode("complete").start()
    // uneven micro-batches: the per-source counters must accumulate
    all.grouped(7).foreach { g =>
      ms.addData(g.toIndexedSeq)
      q.processAllAvailable()
    }
    val streamed = spark.sql(
      "select source, n_shingles, n_novel, novelty_rate from t_novelty")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    q.stop()
    // local recompute over everything streamed
    val expected = all
      .flatMap { case (_, src, t) =>
        graft.operators.DedupOps.shingleSet(t).iterator.map(s => (src, s)) }
      .groupBy(_._1).view.mapValues { g =>
        val novel = g.count(p => !corpusSet(p._2)).toLong
        (g.size.toLong, novel,
          BigDecimal(novel.toDouble / g.size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    assert(streamed == expected)
    // the re-crawl is recognized as adding nothing; the new feed is not
    assert(streamed("src_old")._2 == 0L)
    assert(streamed("src_new")._3 > 0.0)
  }

  test("streaming OOV monitor tracks per-lang rates against the frozen " +
    "vocab and equals the batch recompute under uneven splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vocab = graft.operators.TextOps.corpusVocab(
      Tables(spark, sfTest, "documents"))
    val vocabSet = vocab.as[String].collect().toSet
    assert(vocabSet.size == 25)
    // lang "known" streams pure-vocab text (rate 0); lang "drift" mixes
    // vocab words with unseen tokens the tokenizer would UNK
    val known = (0 until 6).map { i =>
      (i.toLong, "known", vocabSet.toSeq.sorted.take(8).mkString(" ")) }
    val drift = (0 until 9).map { i =>
      (100L + i, "drift",
        s"qq$i rr$i " + vocabSet.toSeq.sorted.take(3).mkString(" ")) }
    val all = (known ++ drift).toSeq
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamOps.oovMonitor(
      ms.toDS().toDF("doc_id", "lang", "text"), vocab)
      .writeStream.format("memory").queryName("t_oov")
      .outputMode("complete").start()
    all.grouped(4).foreach { g =>
      ms.addData(g.toIndexedSeq)
      q.processAllAvailable()
    }
    val streamed = spark.sql(
      "select lang, n_tokens, n_oov, oov_rate from t_oov").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    q.stop()
    val expected = all.flatMap { case (_, lang, t) =>
      t.toLowerCase.split(" ").map(w => (lang, w)) }
      .groupBy(_._1).view.mapValues { g =>
        val oov = g.count(p => !vocabSet(p._2)).toLong
        (g.size.toLong, oov,
          BigDecimal(oov.toDouble / g.size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    assert(streamed == expected)
    assert(streamed("known")._2 == 0L, "pure-vocab feed must read 0 OOV")
    assert(streamed("drift")._3 > 0.3, "unseen tokens must move the rate")
  }

  test("streaming token monitor: running BPE compression counters equal " +
    "the batch encode recompute under uneven splits; a non-compressing " +
    "feed reads lower compression") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextOps
    // frozen merges learned from a tiny corpus where 'low' compresses
    val trainDir = java.nio.file.Files
      .createTempDirectory("graft_tokmon").toString
    Seq((1L, "low low low low lower slow glow", "en", "s", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$trainDir/documents.parquet")
    val merges = TextOps.bpeMerges(spark, trainDir, k = 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    // src_good streams trained-distribution text; src_drift streams
    // text the merges never saw (compression stays ~1)
    val docs = (0 until 6).map(i => (i.toLong, "src_good",
      "low low glow slow lower")) ++
      (0 until 5).map(i => (50L + i, "src_drift", s"zzz$i qqq$i kkk$i"))
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamOps.tokenMonitor(
      ms.toDS().toDF("doc_id", "source", "text"), merges)
      .writeStream.format("memory").queryName("t_tokmon")
      .outputMode("complete").start()
    docs.grouped(4).foreach { g =>
      ms.addData(g.toIndexedSeq)
      q.processAllAvailable()
    }
    val streamed = spark.sql(
      "select source, n_docs, n_words, n_symbols, n_bpe_tokens, " +
        "compression from t_tokmon").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    q.stop()
    // batch recompute through the SAME seam (bpeApply) — stream ≡ batch
    val expected = docs.groupBy(_._2).view.mapValues { g =>
      var (d, w, sy, tk) = (0L, 0L, 0L, 0L)
      g.foreach { case (_, _, t) =>
        val ws = t.split("\\s+").filter(_.nonEmpty)
        d += 1; w += ws.length
        ws.foreach { x =>
          val (a, b) = TextOps.bpeApply(x, merges); sy += a; tk += b }
      }
      (d, w, sy, tk,
        BigDecimal(sy.toDouble / tk)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    assert(streamed == expected, s"stream $streamed vs batch $expected")
    assert(streamed("src_good")._5 > streamed("src_drift")._5,
      "drifting feed must read lower compression")
    assert(streamed("src_drift")._5 >= 1.0)
  }

  test("streaming quality monitor: running counters equal the batch gate " +
    "under uneven micro-batches; a corrupting producer moves its counters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Quality
    val rules = Seq(
      Quality.NotNull("user_id"),
      Quality.InRange("value", 0.0, 1000.0),
      Quality.Accepted("event_type",
        Seq("click", "view", "signup", "purchase", "error")))
    // a healthy feed, then a producer that starts shipping nulls,
    // out-of-range values, and an unknown type (one row violates TWO
    // rules — the counters are per-violation, not per-row)
    val rows: Seq[(String, Option[Long], Double)] =
      (1 to 20).map(i => ("click", Some(i.toLong), i * 10.0)) ++
        (1 to 5).map(i => ("view", Some(i.toLong), 5.0)) ++
        Seq(
          ("click", None, 50.0), // null user
          ("click", Some(9L), -4.0), // range
          ("garbage", Some(3L), 10.0), // unknown type
          ("garbage", None, 2000.0)) // unknown type + range + null
    val ms = MemoryStream[(String, Option[Long], Double)]
    val q = StreamOps.qualityMonitor(
      ms.toDS().toDF("event_type", "user_id", "value"), rules)
      .writeStream.format("memory").queryName("t_quality")
      .outputMode("complete").start()
    rows.grouped(9).foreach { g =>
      ms.addData(g.toIndexedSeq)
      q.processAllAvailable()
    }
    val streamed = spark.sql("select key, metric, n from t_quality")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    q.stop()
    // batch recompute THROUGH THE SHARED GATE: Quality.split over
    // everything streamed must yield identical counters
    val batch = rows.toDF("event_type", "user_id", "value")
    val (clean, rejects) = Quality.split(batch, rules)
    val expected =
      batch.groupBy($"event_type").count().collect()
        .map(r => (r.getString(0), "_rows") -> r.getLong(1)).toMap ++
      clean.groupBy($"event_type").count().collect()
        .map(r => (r.getString(0), "_clean") -> r.getLong(1)).toMap ++
      rejects.select($"event_type", explode($"violations").as("v"))
        .groupBy($"event_type", $"v").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == expected,
      s"stream $streamed\nvs batch gate $expected")
    // the corrupting producer is visible per metric
    assert(streamed(("click", "not_null(user_id)")) == 1L)
    assert(streamed(("click", "in_range(value)")) == 1L)
    assert(streamed(("garbage", "accepted_values(event_type)")) == 2L)
    assert(streamed(("garbage", "in_range(value)")) == 1L)
    assert(streamed(("click", "_clean")) == 20L)
    assert(!streamed.contains(("garbage", "_clean")))
  }

  test("stream windowed approx-percentiles equal their batch twin " +
    "across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfTest, "events").as[Event].collect()
    val ms = MemoryStream[Event]
    val q = StreamOps.tumblingPercentiles(ms.toDF())
      .writeStream.format("memory").queryName("t_pct")
      .outputMode("complete").start()
    // two uneven batches: the KLL-style sketch state must MERGE across
    // micro-batches — a non-mergeable buffer would diverge from batch
    val (first, second) = events.splitAt(events.length / 3)
    ms.addData(first.toIndexedSeq)
    q.processAllAvailable()
    ms.addData(second.toIndexedSeq)
    q.processAllAvailable()
    val streamed = spark.sql(
      "select window.start as hour, event_type, n, p50, p95 from t_pct")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val batch = Tables(spark, sfTest, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(value, 0.5, 10000)").as("p50"),
        expr("approx_percentile(value, 0.95, 10000)").as("p95"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    q.stop()
    assert(batch.nonEmpty)
    assert(streamed.keySet == batch.keySet)
    // same sketch algorithm over the same data: counts exact; the
    // percentile estimates must sit within the groups' value range and
    // be ordered (the sketch's merge path may differ from the batch
    // accumulation path, so exact equality is not the contract)
    streamed.foreach { case (k, (n, p50, p95)) =>
      val (bn, bp50, bp95) = batch(k)
      assert(n == bn)
      assert(p50 <= p95 && bp50 <= bp95)
      assert(math.abs(p50 - bp50) <= math.max(1.0, bp50.abs * 0.2),
        s"$k p50 diverged: stream $p50 vs batch $bp50")
      assert(math.abs(p95 - bp95) <= math.max(1.0, bp95.abs * 0.2),
        s"$k p95 diverged: stream $p95 vs batch $bp95")
    }
  }

  test("dropDuplicatesWithinWatermark yields exactly-once from replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = (1 to 50).map(i =>
      ev(i, f"2024-01-01 10:${i % 60}%02d:00", i % 5, "click", 1.0))

    val ms = MemoryStream[Event]
    val q = StreamOps.dedup(ms.toDF())
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    ms.addData(base)               // original deliveries
    q.processAllAvailable()
    ms.addData(base)               // full replay (webhook retry storm)
    ms.addData(base.take(10))      // partial replay
    q.processAllAvailable()
    val got = spark.sql("select event_id from t_dedup").collect()
      .map(_.getLong(0))
    q.stop()
    assert(got.length == 50, s"expected 50 unique, got ${got.length}")
    assert(got.toSet == (1 to 50).map(_.toLong).toSet)
  }

  test("delivery dedup collapses replayed keys but passes keyless posts " +
    "through untouched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val ms = MemoryStream[(java.sql.Timestamp, String, String)]
    val q = StreamOps.dedupDeliveries(
        ms.toDF().toDF("ingest_ts", "delivery_key", "body"))
      .writeStream.format("memory").queryName("t_ddel")
      .outputMode("append").start()
    ms.addData(Seq(
      (at(0), "1:100", "r100"), (at(1), "1:200", "r200"),
      // two deliveries from a sender with NO idempotency header: null
      // keys must NOT collapse into each other (dropDuplicates compares
      // nulls equal — the trap this spec pins shut)
      (at(2), null, "keyless-a"), (at(3), null, "keyless-b")))
    q.processAllAvailable()
    // replay storm: both keyed rows re-POST with the same header
    ms.addData(Seq((at(4), "1:100", "r100"), (at(5), "1:200", "r200")))
    q.processAllAvailable()
    val got = spark.sql("select delivery_key, body from t_ddel").collect()
      .map(r => (Option(r.getString(0)), r.getString(1)))
    q.stop()
    assert(got.length == 4, s"expected 4 rows, got ${got.toSeq}")
    assert(got.count(_._1.isEmpty) == 2, "keyless rows must both survive")
    assert(got.collect { case (Some(k), _) => k }.sorted.toSeq ==
      Seq("1:100", "1:200"), "keyed replays must collapse to one each")
  }

  test("events older than the watermark are dropped from aggregates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamOps.tumbling(ms.toDF())
      .writeStream.format("memory").queryName("t_late")
      .outputMode("append").start()
    // batch 1: establish max event time 15:00 → watermark 13:00
    ms.addData(Seq(
      ev(1, "2024-01-01 10:10:00", 1, "click", 1.0),
      ev(2, "2024-01-01 15:00:00", 1, "click", 1.0)))
    q.processAllAvailable()
    // batch 2: 09:30 is far behind the 13:00 watermark → must be dropped
    ms.addData(Seq(ev(3, "2024-01-01 09:30:00", 1, "click", 99.0)))
    q.processAllAvailable()
    // batch 3: advance watermark past every window so all windows finalize
    ms.addData(Seq(ev(4, "2024-01-02 00:00:00", 1, "click", 1.0)))
    q.processAllAvailable()
    val rows = spark.sql(
      "select window.start as s, n, sum_value from t_late").collect()
    q.stop()
    val h9 = rows.filter(_.getTimestamp(0).toString.startsWith("2024-01-01 09"))
    assert(h9.isEmpty, s"late event leaked into an aggregate: ${h9.toSeq}")
    val h10 = rows.filter(_.getTimestamp(0).toString.startsWith("2024-01-01 10"))
    assert(h10.length == 1 && h10.head.getLong(1) == 1)
  }

  test("session windows finalize with 30-minute gap semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamOps.sessions(ms.toDF())
      .writeStream.format("memory").queryName("t_sess")
      .outputMode("append").start()
    // user 1: 10:00, 10:10 (same session), 11:00 (50-min gap → new session)
    ms.addData(Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:10:00", 1, "view", 2.0),
      ev(3, "2024-01-01 11:00:00", 1, "click", 3.0)))
    q.processAllAvailable()
    // sentinel far in the future finalizes all of user 1's sessions
    ms.addData(Seq(ev(99, "2024-01-02 12:00:00", 42, "click", 0.0)))
    q.processAllAvailable()
    val sessions = spark.sql(
      "select user_id, n_events from t_sess where user_id = 1").collect()
    q.stop()
    assert(sessions.length == 2,
      s"expected 2 finalized sessions, got ${sessions.toSeq}")
    assert(sessions.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
  }

  test("stream-static enrichment attaches dimension columns per event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val customer = Tables(spark, sfTest, "customer")
    val someKey = customer.select($"c_custkey").as[Long].head()
    val ms = MemoryStream[Event]
    val q = StreamOps.enrich(ms.toDF(), customer)
      .writeStream.format("memory").queryName("t_enrich")
      .outputMode("append").start()
    ms.addData(Seq(
      ev(1, "2024-01-01 10:00:00", someKey, "click", 1.0),
      ev(2, "2024-01-01 10:01:00", -999, "view", 2.0))) // no such customer
    q.processAllAvailable()
    val rows = spark.sql(
      "select event_id, c_mktsegment from t_enrich order by event_id")
      .collect()
    q.stop()
    assert(rows.length == 2)
    assert(!rows(0).isNullAt(1), "known user must gain dimension columns")
    assert(rows(1).isNullAt(1), "unknown user must survive with nulls (left join)")
  }

  test("sliding stream assigns each event to 4 windows (batch-twin check)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamOps.sliding(ms.toDF())
      .writeStream.format("memory").queryName("t_slide")
      .outputMode("complete").start()
    ms.addData(Seq(ev(1, "2024-01-01 10:17:00", 1, "click", 2.0)))
    q.processAllAvailable()
    val wins = spark.sql("select window.start from t_slide").collect()
      .map(_.getTimestamp(0).toString).sorted
    q.stop()
    assert(wins.length == 4, s"expected 4 covering windows, got ${wins.toSeq}")
    assert(wins.head == "2024-01-01 09:30:00.0" &&
      wins.last == "2024-01-01 10:15:00.0")
  }

  test("SCD-2 temporal enrich joins the version valid at EVENT time, " +
    "NULLs uncovered events, and picks up a snapshot republish on " +
    "restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_scd").toString
    def writeDim(path: String,
                 rows: Seq[(Long, String, String, Option[String])]): Unit =
      rows.map { case (k, seg, from, to) =>
        (k, seg, java.sql.Timestamp.valueOf(from + " 00:00:00"),
          to.map(t => java.sql.Timestamp.valueOf(t + " 00:00:00")).orNull)
      }.toDF("key", "segment", "valid_from", "valid_to")
        .coalesce(1).write.mode("overwrite").parquet(path)
    // user 1: GOLD before 2024-02-01, SILVER after; user 2: one open
    // version from 2024-03-01 (events before it are uncovered)
    writeDim(s"$root/v1", Seq(
      (1L, "GOLD", "2024-01-01", Some("2024-02-01")),
      (1L, "SILVER", "2024-02-01", None),
      (2L, "BASIC", "2024-03-01", None)))
    val ms = MemoryStream[Event]
    val q1 = StreamOps.scdEnrich(ms.toDS().toDF(),
        spark.read.parquet(s"$root/v1"))
      .select(col("event_id"), col("segment"))
      .writeStream.format("memory").queryName("t_scd")
      .outputMode("append").start()
    ms.addData(Seq(
      ev(1, "2024-01-15 10:00:00", 1, "post", 0.0), // GOLD era
      ev(2, "2024-02-15 10:00:00", 1, "post", 0.0), // SILVER era
      ev(3, "2024-01-15 10:00:00", 2, "post", 0.0))) // before any version
    q1.processAllAvailable()
    q1.stop()
    // republish as a NEW snapshot (user 2 gains history) and bounce the
    // query — the documented pattern for path-backed dims (an in-place
    // overwrite would fail the running stream with FILE_NOT_EXIST: the
    // listing pins at query start; see scdEnrich's Scaladoc)
    writeDim(s"$root/v2", Seq(
      (1L, "GOLD", "2024-01-01", Some("2024-02-01")),
      (1L, "SILVER", "2024-02-01", None),
      (2L, "BASIC", "2024-03-01", None),
      (2L, "TRIAL", "2024-01-01", Some("2024-03-01"))))
    // a real bounce resumes from the committed offset; a fresh stream
    // carrying only the post-restart batch models that here (the memory
    // sink has no recovery - replaying 1-3 through q2 would re-enrich
    // event 3 under the NEW snapshot, which is genuine reprocessing
    // semantics, not what a checkpointed resume does)
    val ms2 = MemoryStream[Event]
    val q2 = StreamOps.scdEnrich(ms2.toDS().toDF(),
        spark.read.parquet(s"$root/v2"))
      .select(col("event_id"), col("segment"))
      .writeStream.format("memory").queryName("t_scd2")
      .outputMode("append").start()
    ms2.addData(Seq(
      ev(4, "2024-01-20 10:00:00", 1, "post", 0.0), // LATE GOLD-era event
      ev(5, "2024-02-10 10:00:00", 2, "post", 0.0))) // TRIAL after refresh
    q2.processAllAvailable()
    q2.stop()
    val got = (spark.sql("select event_id, segment from t_scd").collect() ++
      spark.sql("select event_id, segment from t_scd2").collect())
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // the late event still sees GOLD — the property a current-version
    // join silently violates for every late arrival
    assert(got == Map(1L -> Some("GOLD"), 2L -> Some("SILVER"),
      3L -> None, 4L -> Some("GOLD"), 5L -> Some("TRIAL")),
      s"temporal enrich wrong: $got")
    // SCD-2 windows must not overlap (the ≤1-match contract)
    val versions = spark.read.parquet(s"$root/v2")
      .collect().map(r => (r.getLong(0), r.getTimestamp(2).getTime,
        Option(r.getTimestamp(3)).map(_.getTime).getOrElse(Long.MaxValue)))
    versions.groupBy(_._1).values.foreach { g =>
      val s = g.sortBy(_._2)
      s.sliding(2).foreach { p =>
        if (p.size == 2) assert(p(0)._3 <= p(1)._2, s"overlap in $s")
      }
    }
  }

  test("stateful detector alarms on 3 consecutive errors, resets on success") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamOps.errorAlarms(ms.toDS())
      .writeStream.format("memory").queryName("t_alarm")
      .outputMode("append").start()
    ms.addData(Seq(
      // user 1: 3 consecutive errors → one alarm
      ev(1, "2024-01-01 10:00:00", 1, "error", 0.0),
      ev(2, "2024-01-01 10:01:00", 1, "error", 0.0),
      ev(3, "2024-01-01 10:02:00", 1, "error", 0.0),
      // user 2: run broken by a click → no alarm
      ev(4, "2024-01-01 10:00:00", 2, "error", 0.0),
      ev(5, "2024-01-01 10:01:00", 2, "click", 0.0),
      ev(6, "2024-01-01 10:02:00", 2, "error", 0.0),
      ev(7, "2024-01-01 10:03:00", 2, "error", 0.0)))
    q.processAllAvailable()
    // user 2's run continues across micro-batches: a third error now
    ms.addData(Seq(ev(8, "2024-01-01 10:04:00", 2, "error", 0.0)))
    q.processAllAvailable()
    val alarms = spark.sql(
      "select user_id, consecutive_errors from t_alarm").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    q.stop()
    assert(alarms.toSet == Set((1L, 3), (2L, 3)),
      s"got ${alarms.toSeq} — state must carry runs across micro-batches")
  }

  test("token-bucket rate limiter: burst capped at capacity, refill by " +
    "event time, stream equals the batch fold across batch splits and " +
    "within-batch disorder") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: a 8-event burst in one second (capacity 3 → 3 admitted),
    // then 2 s of quiet at 1 token/s → 2 more admitted from the next
    // burst. user 2: steady 1 event/s → all admitted. Batches split
    // mid-burst and batch 1 arrives internally SHUFFLED.
    val batch1 = Seq(
      ev(3, "2024-01-01 10:00:00.400", 1, "post", 0.0),
      ev(1, "2024-01-01 10:00:00.000", 1, "post", 0.0),
      ev(4, "2024-01-01 10:00:00.600", 1, "post", 0.0),
      ev(2, "2024-01-01 10:00:00.200", 1, "post", 0.0),
      ev(21, "2024-01-01 10:00:00.000", 2, "post", 0.0),
      ev(22, "2024-01-01 10:00:01.000", 2, "post", 0.0))
    val batch2 = Seq(
      ev(5, "2024-01-01 10:00:00.800", 1, "post", 0.0),
      ev(6, "2024-01-01 10:00:00.900", 1, "post", 0.0),
      ev(7, "2024-01-01 10:00:00.950", 1, "post", 0.0),
      ev(8, "2024-01-01 10:00:01.000", 1, "post", 0.0),
      ev(9, "2024-01-01 10:00:03.000", 1, "post", 0.0),
      ev(10, "2024-01-01 10:00:03.100", 1, "post", 0.0),
      ev(11, "2024-01-01 10:00:03.200", 1, "post", 0.0),
      ev(23, "2024-01-01 10:00:02.000", 2, "post", 0.0))
    val ms = MemoryStream[Event]
    val q = StreamOps.rateLimit(ms.toDS(), ratePerSec = 1, capacity = 3)
      .writeStream.format("memory").queryName("t_ratelimit")
      .outputMode("append").start()
    ms.addData(batch1); q.processAllAvailable()
    ms.addData(batch2); q.processAllAvailable()
    val got = spark.sql("select event_id from t_ratelimit").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    val expected = StreamOps
      .rateLimitBatch(batch1 ++ batch2, ratePerSec = 1, capacity = 3)
      .map(_.event_id).toSet
    assert(got == expected,
      s"stream admitted $got, batch fold admits $expected")
    // the burst math, stated concretely: full bucket admits 1,2,3 (one
    // 200 ms refill each leaves 400 m); 4-7 each arrive under a whole
    // token; 8 lands exactly as the balance refills back to 1000 m →
    // admitted to zero; by 10:00:03 two whole tokens have refilled →
    // 9,10 admitted, 11 rejected. user 2 never throttles.
    assert(got == Set(1L, 2L, 3L, 8L, 9L, 10L, 21L, 22L, 23L),
      s"burst math: $got")
  }

  test("dedup pipeline resumes exactly-once from its checkpoint after restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_out").toString
    val ms = MemoryStream[Event]
    def start() = StreamOps.dedup(ms.toDF())
      .select($"event_id", $"user_id", $"value")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").start()

    val q1 = start()
    ms.addData((1 to 20).map(i =>
      ev(i, f"2024-01-01 10:${i % 60}%02d:00", i % 3, "click", 1.0)))
    q1.processAllAvailable()
    q1.stop() // planned or unplanned — the checkpoint carries the offsets

    // restart against the SAME checkpoint: replayed + new data arrive
    val q2 = start()
    ms.addData((1 to 20).map(i => // full replay of batch 1 (retry storm)
      ev(i, f"2024-01-01 10:${i % 60}%02d:00", i % 3, "click", 1.0)))
    ms.addData((21 to 30).map(i =>
      ev(i, f"2024-01-01 11:${i % 60}%02d:00", i % 3, "view", 2.0)))
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir).select($"event_id").collect()
      .map(_.getLong(0)).sorted
    assert(got.length == 30,
      s"restart must neither lose nor duplicate: ${got.length} rows")
    assert(got.toSeq == (1L to 30L))
  }

  test("streaming funnel tolerates webhook retry storms: duplicate " +
    "deliveries never advance or duplicate a stage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.funnelStages(ms.toDS())
        .writeStream.format("memory").queryName("t_fretry")
        .outputMode("append").start()
      val base = Seq(
        ev(1, "2024-01-01 10:00:00", 1, "view", 0.0),
        ev(2, "2024-01-01 10:10:00", 1, "click", 0.0),
        ev(3, "2024-01-01 10:20:00", 1, "purchase", 5.0))
      ms.addData(base)
      q.processAllAvailable()
      // full replay (at-least-once webhook redelivery) + partial replay
      ms.addData(base)
      ms.addData(base.take(2))
      q.processAllAvailable()
      ms.addData(Seq(ev(99, "2024-01-02 00:00:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      val got = spark.sql("select user_id, stage from t_fretry").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      q.stop()
      // a duplicate view/click at the same ts can't beat the already-set
      // earlier (equal) stage time, and each slot fills once — so the
      // output is exactly one row per stage despite 8 deliveries
      assert(got.sorted.toSeq == Seq((1L, 1), (1L, 2), (1L, 3)),
        s"retry storm corrupted the funnel: ${got.sorted.toSeq}")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming funnel resumes from its checkpoint with buffered " +
    "events and chain state intact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft_fckpt").toString
    val outDir =
      java.nio.file.Files.createTempDirectory("graft_fout").toString
    try {
      val ms = MemoryStream[Event]
      def start() = StreamOps.funnelStages(ms.toDS())
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append").start()

      // before the stop: user 1's full chain and user 4's click+purchase
      // sit in BUFFERED ListState (watermark hasn't passed them), the
      // exact state a crash must not lose
      val q1 = start()
      ms.addData(Seq(
        ev(1, "2024-01-01 10:00:00", 1, "view", 0.0),
        ev(2, "2024-01-01 10:10:00", 1, "click", 0.0),
        ev(3, "2024-01-01 10:20:00", 1, "purchase", 5.0),
        ev(12, "2024-01-01 10:10:00", 4, "click", 0.0),
        ev(13, "2024-01-01 10:15:00", 4, "purchase", 9.0)))
      q1.processAllAvailable()
      q1.stop()

      // restart: user 4's EARLIER view arrives only now, then the
      // sentinel finalizes everything — the restored buffer must
      // re-order it before the click from before the restart
      val q2 = start()
      ms.addData(Seq(ev(14, "2024-01-01 10:05:00", 4, "view", 0.0)))
      ms.addData(Seq(ev(99, "2024-01-02 00:00:00", 42, "ping", 0.0)))
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(outDir)
        .select($"user_id", $"stage", $"ts").collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getTimestamp(2).toString.substring(0, 19)))
      val expected = Set(
        (1L, 1, "2024-01-01 10:00:00"), (1L, 2, "2024-01-01 10:10:00"),
        (1L, 3, "2024-01-01 10:20:00"),
        (4L, 1, "2024-01-01 10:05:00"), (4L, 2, "2024-01-01 10:10:00"),
        (4L, 3, "2024-01-01 10:15:00"))
      assert(got.toSet == expected, s"got ${got.sorted.toSeq}")
      assert(got.length == expected.size,
        s"restart duplicated emissions: ${got.sorted.toSeq}")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-stream interval join attributes purchases to clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamOps.conversionJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("t_conv")
      .outputMode("append").start()
    clicks.addData(Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
      ev(2, "2024-01-01 12:00:00", 1, "click", 0.0),
      ev(3, "2024-01-01 10:05:00", 2, "click", 0.0)))
    purchases.addData(Seq(
      ev(10, "2024-01-01 10:30:00", 1, "purchase", 9.99), // ← click 1 only
      ev(11, "2024-01-01 12:45:00", 1, "purchase", 5.00), // ← click 2 only
      ev(12, "2024-01-01 11:30:00", 2, "purchase", 1.00), // > 1h after click 3
      ev(13, "2024-01-01 10:20:00", 3, "purchase", 2.00))) // user never clicked
    q.processAllAvailable()
    val got = spark.sql(
      "select click_id, purchase_id from t_conv order by click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    q.stop()
    assert(got.toSeq == Seq((1L, 10L), (2L, 11L)),
      s"interval-join attribution wrong: ${got.toSeq}")
  }

  test("left-outer interval join: matched clicks pair, unmatched clicks " +
    "emit nulls on watermark expiry, late events drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = StreamOps.conversionJoinOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("t_conv_outer")
      .outputMode("append").start()
    // batch 1 — one converting click, one that never will
    clicks.addData(Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
      ev(2, "2024-01-01 10:05:00", 2, "click", 0.0)))
    purchases.addData(Seq(
      ev(10, "2024-01-01 10:30:00", 1, "purchase", 9.99))) // ← click 1
    q.processAllAvailable()
    // batch 2 — advance BOTH watermarks past click2_ts + 1h + 2h delay,
    // so the engine can prove click 2 unmatched (join watermark is the
    // min across sides; one side alone would hold it back)
    clicks.addData(Seq(ev(3, "2024-01-01 16:00:00", 9, "click", 0.0)))
    purchases.addData(Seq(
      ev(11, "2024-01-01 16:00:00", 7, "nonmatching", 1.0)))
    q.processAllAvailable()
    // watermark advances at end-of-batch; the null emission lands in the
    // NEXT micro-batch — nudge one through
    purchases.addData(Seq(
      ev(12, "2024-01-01 16:00:01", 8, "nonmatching", 1.0)))
    q.processAllAvailable()
    // batch 3 — late on both sides (watermark sits ~14:00): a click from
    // 09:00 and a purchase that WOULD pair with click 2 (10:40 ≤ 11:05)
    // must both drop — no resurrected pair, no duplicate unmatched row
    clicks.addData(Seq(ev(4, "2024-01-01 09:00:00", 3, "click", 0.0)))
    purchases.addData(Seq(
      ev(13, "2024-01-01 10:40:00", 2, "purchase", 2.0)))
    q.processAllAvailable()
    val got = spark.sql(
      """select click_id,
        |  purchase_id, purchase_value is null as no_value
        |from t_conv_outer order by click_id""".stripMargin)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getBoolean(2)))
    q.stop()
    // click 1 matched; click 2 unmatched → nulls; click 3 still buffered
    // (its horizon is inside the watermark) → not emitted; click 4 late →
    // dropped; purchase 13 late → must NOT create (2, 13)
    assert(got.toSeq == Seq((1L, 10L, false), (2L, -1L, true)),
      s"left-outer trichotomy wrong: ${got.toSeq}")
  }

  test("transformWithState alarm matches flatMapGroupsWithState on replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.errorAlarmsTws(ms.toDS())
        .writeStream.format("memory").queryName("t_tws")
        .outputMode("append").start()
      // same replay as the fMGWS test: user 1 alarms in batch 1, user 2's
      // run carries across the batch boundary and alarms in batch 2
      ms.addData(Seq(
        ev(1, "2024-01-01 10:00:00", 1, "error", 0.0),
        ev(2, "2024-01-01 10:01:00", 1, "error", 0.0),
        ev(3, "2024-01-01 10:02:00", 1, "error", 0.0),
        ev(4, "2024-01-01 10:00:00", 2, "error", 0.0),
        ev(5, "2024-01-01 10:01:00", 2, "click", 0.0),
        ev(6, "2024-01-01 10:02:00", 2, "error", 0.0),
        ev(7, "2024-01-01 10:03:00", 2, "error", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(8, "2024-01-01 10:04:00", 2, "error", 0.0)))
      q.processAllAvailable()
      val alarms = spark.sql(
        "select user_id, consecutive_errors from t_tws").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      q.stop()
      assert(alarms.toSet == Set((1L, 3), (2L, 3)),
        s"got ${alarms.toSeq} — transformWithState must match fMGWS semantics")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming weighted reservoir equals batch A-ES at every " +
    "micro-batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()

    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def aes(rows: Seq[(Long, Long)]): Seq[(Long, Double)] = rows
      .map { case (id, nc) =>
        val u = (java.lang.Long.parseLong(
          md5Hex(id.toString).substring(0, 8), 16).toDouble + 0.5) /
          4294967296.0
        (id, BigDecimal(math.pow(u, 1.0 / nc.toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, k) => (-k, id) }.take(100)

    var snapshots = Vector.empty[Seq[(Long, Double)]]
    val ms = MemoryStream[(Long, Long)]
    val q = StreamOps.streamWeightedSample(ms.toDS().toDF("doc_id", "n_chars"))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty && !rows.head.isNullAt(0))
          snapshots :+= rows.head
            .getSeq[org.apache.spark.sql.Row](0)
            .map(r => (r.getLong(0), r.getDouble(1)))
      }.start()
    // three uneven micro-batches: after EACH, the single state row must
    // be exactly the batch A-ES sample of everything streamed so far
    val (b1, rest) = docs.splitAt(docs.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 5)
    Seq(b1, b2, b3).foreach { b =>
      ms.addData(b.toIndexedSeq); q.processAllAvailable()
    }
    q.stop()
    assert(snapshots.length == 3)
    val prefixes = Seq(b1, b1 ++ b2, b1 ++ b2 ++ b3)
    snapshots.zip(prefixes).zipWithIndex.foreach {
      case ((snap, prefix), i) =>
        assert(snap == aes(prefix.toSeq),
          s"reservoir after batch ${i + 1} diverges from batch A-ES")
    }
    // and the final reservoir matches the graded batch operator's cut
    val batchTop = graft.operators.TextOps.sampleWeighted(spark, sfTest)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(snapshots.last == batchTop,
      "final reservoir != q_sample_weighted batch result")
  }

  test("streaming top-k sketch equals exact counts across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val buckets = 8
      // Update-mode snapshot sink: latest counter per (bucket, token) —
      // the serving pattern the operator's Scaladoc describes
      val snapshot =
        scala.collection.concurrent.TrieMap[(Int, String), Long]()
      val ms = MemoryStream[String]
      val q = StreamOps.streamTopK(ms.toDS(), m = 1024, buckets = buckets)
        .toDF().writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r =>
            snapshot((r.getInt(0), r.getString(1))) = r.getLong(2))
        }.start()
      // the corpus token stream, replayed in three uneven micro-batches —
      // sequential MG across batch boundaries must equal MG over the
      // concatenation (and the vocab 31 ≪ m regime makes that EXACT)
      val tokens = Tables(spark, sfTest, "documents")
        .select(explode(split(lower($"text"), " ")).as("w"))
        .as[String].collect()
      val (b1, rest) = tokens.splitAt(tokens.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 5)
      Seq(b1, b2, b3).foreach { b =>
        ms.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      q.stop()
      val exact = tokens.groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      // a token's entire count lives in ONE bucket, so the snapshot is
      // directly comparable token-by-token
      val got = snapshot.map { case ((_, t), c) => t -> c }.toMap
      assert(got == exact,
        s"sketch != exact: missing=${exact.keySet -- got.keySet} " +
          s"diff=${got.collect { case (t, c) if exact.get(t).exists(_ != c) => (t, c, exact(t)) }}")
      // overflow regime: m=4 per bucket forces evictions; every counter
      // must stay a lower bound within n_bucket/(m+1) of exact
      val snap2 =
        scala.collection.concurrent.TrieMap[(Int, String), Long]()
      val ms2 = MemoryStream[String]
      val q2 = StreamOps.streamTopK(ms2.toDS(), m = 4, buckets = buckets)
        .toDF().writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r =>
            snapshot2Put(snap2, r))
        }.start()
      Seq(b1, b2, b3).foreach { b =>
        ms2.addData(b.toIndexedSeq); q2.processAllAvailable()
      }
      q2.stop()
      val bucketOf = (t: String) =>
        math.floorMod(scala.util.hashing.MurmurHash3.stringHash(t), buckets)
      val nBucket = tokens.groupBy(bucketOf).view
        .mapValues(_.length.toLong).toMap
      snap2.foreach { case ((bkt, t), c) =>
        assert(bucketOf(t) == bkt)
        assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
        assert(c >= exact(t) - nBucket(bkt) / 5,
          s"$t below the MG error bound")
      }
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def snapshot2Put(
      m: scala.collection.concurrent.TrieMap[(Int, String), Long],
      r: org.apache.spark.sql.Row): Unit =
    m((r.getInt(0), r.getString(1))) = r.getLong(2)

  /** transformWithState requires the RocksDB state store provider;
    * restore whatever the session had afterwards.
    */
  private def withRocksDb[A](body: => A): A = {
    val prev =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  /** Amplitude-modulated mono WAV at `rate` Hz — the near-dup fixture
    * family: (470 Hz, 12.1 Hz, 0.19 s) rendered at 8 kHz vs 16 kHz
    * lands exactly 1 hash bit apart (measured), while the 333 Hz tone
    * sits 24 bits away.
    */
  private def amWav(rate: Float, f: Double, mod: Double): Array[Byte] = {
    val n = (rate * 0.19).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val t = i / rate.toDouble
      val a = (math.sin(2 * math.Pi * f * t) *
        (0.5 + 0.5 * math.sin(2 * math.Pi * mod * t)) * 12000).toInt
      pcm(2 * i) = (a & 0xff).toByte
      pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("streaming ingest dedup drops corpus dups, shuffled dups, and replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = graft.operators.TextOps.fingerprint(spark, sfTest)
    val known = Tables(spark, sfTest, "documents")
      .select($"text").as[String].head(2)
    val ms = MemoryStream[(Long, String)]
    val q = StreamOps.dedupAgainstCorpus(
        ms.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("t_ingest")
      .outputMode("append").start()
    val fresh = "entirely new document text never seen in the corpus"
    ms.addData(Seq(
      (9001L, known(0)), // verbatim corpus dup → dropped
      // word-permuted corpus dup → same bag-of-words fp → dropped
      (9002L, known(1).split(' ').reverse.mkString(" ")),
      (9003L, fresh))) // genuinely new → admitted
    q.processAllAvailable()
    // replay of the admitted doc in a later batch → in-stream dedup
    ms.addData(Seq((9004L, fresh)))
    q.processAllAvailable()
    val got = spark.sql("select doc_id from t_ingest").collect()
      .map(_.getLong(0)).toSeq
    q.stop()
    assert(got == Seq(9003L), s"ingest gate admitted $got")
  }

  test("streaming media dedup drops re-encoded corpus images AND " +
    "re-encoded corpus audio, dedups in-stream perceptual replays per " +
    "codec; undecodable bytes are excluded") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    // corpus: two known images + one known audio track; the gate must
    // recognize a RE-ENCODE of each (identical pixels through a fresh
    // Graphics2D + PNG pass; identical PCM rewrapped stereo)
    val imgA = Multimodal.synthesizePng("media-A".getBytes, 24, 16)
    val imgB = Multimodal.synthesizePng("media-B".getBytes, 20, 12)
    val wavA = Multimodal.synthesizeWav("audio-A".getBytes)
    val corpus = StreamOps.mediaCorpusHashes(
      Seq(imgA, imgB, wavA).toDF("content"))
    val novelC = Multimodal.synthesizePng("media-C".getBytes, 24, 16)
    val novelD = Multimodal.synthesizePng("media-D".getBytes, 16, 16)
    val novelWav = Multimodal.synthesizeWav("audio-B".getBytes)
    val novelVid = Multimodal.synthesizeVideo("vid-A".getBytes)
    // same pixels through a fresh encode — bytes may differ, hash must not
    val reEncodedA = Multimodal.resizeImage(imgA, 24, 16)
    // same PCM re-rendered as 2-channel (frames average back to the
    // identical samples → identical energy grid → identical hash)
    val reEncodedWavA = {
      val src = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wavA))
      val fmt = src.getFormat
      val stereo = new javax.sound.sampled.AudioFormat(
        fmt.getSampleRate, 16, 2, true, false)
      val raw = src.readAllBytes()
      val dup = new Array[Byte](raw.length * 2)
      for (i <- 0 until raw.length / 2; c <- 0 to 1) {
        dup((i * 2 + c) * 2) = raw(i * 2)
        dup((i * 2 + c) * 2 + 1) = raw(i * 2 + 1)
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(dup), stereo, raw.length / 2L)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.mediaDedup(
      ms.toDS().toDF("media_id", "content"), corpus)
      .writeStream.format("memory").queryName("t_media_dedup")
      .outputMode("append").start()
    ms.addData(Seq(
      (1L, reEncodedA), // visually identical to corpus → dropped
      (2L, novelC), // admitted
      (3L, "junk bytes".getBytes), // undecodable → excluded
      (6L, reEncodedWavA), // audibly identical to corpus → dropped
      (7L, novelWav))) // admitted
    q.processAllAvailable()
    ms.addData(Seq(
      (4L, novelC), // in-stream perceptual replay → dropped
      (5L, novelD), // admitted
      (8L, novelWav), // in-stream audio replay → dropped
      (9L, novelVid))) // admitted (video leg)
    q.processAllAvailable()
    val got = spark.sql("select media_id from t_media_dedup").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(2L, 5L, 7L, 9L), s"media gate admitted $got")
    // the admitted set matches the batch recompute over everything sent
    val corpusSet = corpus.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val sent = Seq((1L, reEncodedA), (2L, novelC), (3L, "junk bytes".getBytes),
      (6L, reEncodedWavA), (7L, novelWav),
      (4L, novelC), (5L, novelD), (8L, novelWav), (9L, novelVid))
    val expected = sent
      .flatMap { case (id, b) => Multimodal.mediaHash(b).map(h => (id, h)) }
      .filterNot { case (_, h) => corpusSet(h) }
      .groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    assert(got == expected)
  }}

  test("streaming media gate drops a 2x RESAMPLED corpus audio dup " +
    "(hamming-tolerant corpus match, not just exact re-encodes)") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    // amplitude-modulated tone rendered at two sample rates: same
    // content, DIFFERENT bytes and (within <=3 bits) different hash —
    // the case the r12 exact-hash gate provably let through
    // (470 Hz, 12.1 Hz envelope, 0.19 s) measured: the 2x re-render
    // lands exactly 1 bit from the original — the NEAR case — while the
    // 333 Hz tone below sits 24 bits away
    val corpusWav = amWav(8000f, 470, 12.1)
    val resampled = amWav(16000f, 470, 12.1) // 2x re-render, same content
    val hc = Multimodal.audioHash(corpusWav).get
    val hr = Multimodal.audioHash(resampled).get
    assert(hc != hr, "fixture must exercise the NEAR path, not exact")
    assert(java.lang.Long.bitCount(hc ^ hr) <= 3)
    val freshWav = amWav(8000f, 333, 10) // different tone — >3 bits away
    assert(java.lang.Long.bitCount(
      hc ^ Multimodal.audioHash(freshWav).get) > 3,
      "admitted fixture drifted within the gate's tolerance")
    val corpus = StreamOps.mediaCorpusHashes(Seq(corpusWav).toDF("content"))
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.mediaDedup(
      ms.toDS().toDF("media_id", "content"), corpus)
      .writeStream.format("memory").queryName("t_media_near")
      .outputMode("append").start()
    ms.addData(Seq(
      (1L, resampled), // near corpus dup (hamming 1..3) → dropped
      (2L, freshWav))) // genuinely new → admitted
    q.processAllAvailable()
    val got = spark.sql("select media_id from t_media_near").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(2L), s"near gate admitted $got")
  }}

  test("in-stream media near-dup admission: a 1-bit-drifted resample " +
    "is admitted exactly once whether its twin came from the corpus " +
    "or earlier in the SAME stream") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    val twinA = amWav(8000f, 470, 12.1)
    val twinB = amWav(16000f, 470, 12.1) // 2x re-render, 1 bit drifted
    val ha = Multimodal.audioHash(twinA).get
    val hb = Multimodal.audioHash(twinB).get
    assert(ha != hb && java.lang.Long.bitCount(ha ^ hb) <= 3,
      "fixture must exercise the NEAR path, not exact")
    val fresh = amWav(8000f, 333, 10) // 24 bits away — genuinely new
    // the corpus holds NOTHING near these: the r13 gate (hamming vs the
    // frozen corpus only) provably admitted BOTH twins on this fixture —
    // the in-stream MapState path is the one under test
    val corpus = StreamOps.mediaCorpusHashes(
      Seq(Multimodal.synthesizePng("unrelated".getBytes, 8, 8))
        .toDF("content"))
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.mediaDedup(
      ms.toDS().toDF("media_id", "content"), corpus)
      .writeStream.format("memory").queryName("t_media_instream")
      .outputMode("append").start()
    ms.addData(Seq((1L, twinA))) // novel vs corpus AND stream → admitted
    q.processAllAvailable()
    // cross-batch: twinB is novel vs the corpus but within hamming 1 of
    // the PRIOR in-stream admission → dropped; fresh is admitted
    ms.addData(Seq((2L, twinB), (3L, fresh)))
    q.processAllAvailable()
    val got = spark.sql("select media_id from t_media_instream").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(1L, 3L), s"in-stream near gate admitted $got")
    // same-batch twins on fresh state: exactly the lower id is admitted
    // (media_id-ordered processing — replay-deterministic)
    val ms2 = MemoryStream[(Long, Array[Byte])]
    val q2 = StreamOps.mediaDedup(
      ms2.toDS().toDF("media_id", "content"), corpus)
      .writeStream.format("memory").queryName("t_media_instream2")
      .outputMode("append").start()
    ms2.addData(Seq((11L, twinB), (10L, twinA)))
    q2.processAllAvailable()
    val got2 = spark.sql("select media_id from t_media_instream2")
      .collect().map(_.getLong(0)).toSet
    q2.stop()
    assert(got2 == Set(10L), s"same-batch twins admitted $got2")
  }}

  test("media admit gate chunked state: a twin of a NON-tail-chunk " +
    "admission still drops, and admissions are invariant to chunkCap " +
    "(the round-15 O(n²)-churn fix changes layout, not semantics)") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // six pairwise-hamming-8 hashes sharing the band-3 (and band-0)
    // slice: at chunkCap=2 the shared buckets hold THREE chunks, so
    // hash #1's twin can only be caught if the probe walks past the
    // tail chunk
    val far = (0 until 6).map(i => 0xFL << (16 + 4 * i))
    for (a <- far; b <- far if a != b)
      assert(java.lang.Long.bitCount(a ^ b) > 3)
    val twin = far.head ^ 1L // hamming 1 from the CHUNK-0 admission
    val fresh = 0xFL << 40 // hamming 8 from everything
    def run(cap: Int, name: String): Set[Long] = {
      val ms = MemoryStream[(Long, String, Long)]
      val q = StreamOps.mediaAdmitGate(ms.toDS(), maxHamming = 3, cap)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      ms.addData(far.zipWithIndex.map { case (h, i) =>
        (i + 1L, "img", h) })
      q.processAllAvailable()
      ms.addData(Seq((7L, "img", twin), (8L, "img", fresh)))
      q.processAllAvailable()
      val got = spark.sql(s"select media_id from $name").collect()
        .map(_.getLong(0)).toSet
      q.stop()
      got
    }
    val chunked = run(2, "t_admit_cap2")
    assert(chunked == Set(1L, 2L, 3L, 4L, 5L, 6L, 8L),
      s"cap=2 admitted $chunked")
    assert(run(64, "t_admit_cap64") == chunked,
      "admission set must not depend on the chunk layout")
  }}

  test("streaming cluster maintenance: stream ≡ batch CC recompute on " +
    "the union corpus at every micro-batch boundary, incl. a cluster " +
    "merge; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val thr = 0.3
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_cmaint").toString
    val resultPath = java.nio.file.Files
      .createTempDirectory("graft_cmaint_res").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cmaint_ck").toString
    // init corpus: two 2-doc near-dup clusters {1,2} and {5,6} + a
    // singleton 9 (4 shingles per text; variants share 3 → jac 0.6)
    val t1 = "a b c d e f"; val t2 = "a b c d e g"
    val t5 = "p q r s t u"; val t6 = "p q r s t v"
    val t9 = "x y z w h k"
    val corpus = Seq((1L, t1), (2L, t2), (5L, t5), (6L, t6), (9L, t9))
    ClusterMaint.init(corpus.toDF("doc_id", "text"), statePath,
      threshold = thr)
    // batch CC ≡ check against a from-scratch dedupClusters on the
    // union corpus written as a documents table
    def checkAgainstBatch(union: Seq[(Long, String)], tag: String): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_cmaint_$tag").toString
      union.map { case (id, tx) => (id, tx, "en", "src0", tx.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val batch = graft.operators.DedupOps
        .dedupClusters(spark, dir, threshold = thr)
        .select($"doc_id", $"cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val stream = ClusterMaint.assignments(spark, statePath).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stream == batch, s"[$tag] stream $stream vs batch $batch")
    }
    checkAgainstBatch(corpus, "init")
    val ms = MemoryStream[(Long, String)]
    val q = ClusterMaint.start(ms.toDF().toDF("doc_id", "text"),
      statePath, resultPath, ckpt, threshold = thr)
    // batch 0: 11 joins cluster 1; {12,13} form a NEW cluster; 15 is a
    // singleton (reported, never persisted)
    val t11 = "a b c d e h"
    val t12 = "m n o p2 q3 r2"; val t13 = "m n o p2 q3 r3"
    val t15 = "zz yy xx ww vv uu"
    ms.addData(Seq((11L, t11), (12L, t12), (13L, t13), (15L, t15)))
    q.processAllAvailable()
    val b0 = spark.read.parquet(resultPath).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_new_cluster")))
      .toMap
    assert(b0(11L) == (1L, false), s"doc 11 got ${b0(11L)}")
    assert(b0(12L) == (12L, true) && b0(13L) == (12L, true))
    assert(b0(15L) == (15L, true))
    val union0 = corpus ++ Seq((11L, t11), (12L, t12), (13L, t13),
      (15L, t15))
    checkAgainstBatch(union0, "b0")
    // batch 1: doc 14 BRIDGES clusters {1,2,11} and {5,6} (4 shared
    // shingles with each family, 10 of its own → jac 0.4 ≥ 0.3) — the
    // merge event: the union CC collapses both into cluster 1
    val t14 = t1 + " " + t5
    ms.addData(Seq((14L, t14)))
    q.processAllAvailable()
    q.stop()
    val b1 = spark.read.parquet(s"$resultPath/batch_id=1").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_new_cluster")))
      .toMap
    assert(b1(14L) == (1L, false), s"bridge doc got ${b1(14L)}")
    val union1 = union0 :+ (14L, t14)
    checkAgainstBatch(union1, "b1")
    // absorbed cluster 5's members now resolve to 1 through the merge map
    val a = ClusterMaint.assignments(spark, statePath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a(5L) == 1L && a(6L) == 1L && a(14L) == 1L)
    assert(!a.contains(15L), "singletons must not persist in assign/")
    // crash-replay idempotence: re-apply batch 1 against the advanced
    // state — the dynamic overwrite + resolved merge map must converge
    ClusterMaint.applyBatch(Seq((14L, t14)).toDF("doc_id", "text"), 1L,
      statePath, threshold = thr)
    checkAgainstBatch(union1, "replay")
    // compaction folds the per-batch partitions + bakes the merge map
    // into the stored ids; assignments and future batches are unchanged
    ClusterMaint.compact(spark, statePath)
    checkAgainstBatch(union1, "compacted")
    assert(MaintCore.readMerges(spark, statePath).count() == 0,
      "compaction must empty the resolved merge map")
    val b2 = ClusterMaint.applyBatch(
      Seq((20L, t2 + " tail20")).toDF("doc_id", "text"), 2L,
      statePath, threshold = thr).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(b2(20L) == 1L, s"post-compaction batch got ${b2.get(20L)}")
    checkAgainstBatch(union1 :+ (20L, t2 + " tail20"), "post_compact")
  }

  test("streaming SEMANTIC cluster maintenance: stream ≡ batch CC over " +
    "the frozen-quantizer edge set at every micro-batch boundary, incl. " +
    "a cluster merge; replay + compaction idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val thr = 0.4
    // dim-6 axis fixture: same-cluster vectors are SCALAR MULTIPLES
    // (cosine exactly 1, and identical cell rankings under ANY frozen
    // quantizer); cross-cluster axes are orthogonal (cosine 0 < 0.4);
    // the bridge is a0+a1 (cosine 1/√2 ≈ 0.707 to both families).
    // nassign is set to the cell count, so candidate recall is 1 BY
    // CONSTRUCTION and the batch-equality pin is exact (the frozen-
    // quantizer recall contract is the documented divergence).
    def axis(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](6); v(i) = s; v
    }
    def plus(i: Int, j: Int): Array[Float] = {
      val v = new Array[Float](6); v(i) = 1f; v(j) = 1f; v
    }
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_smaint").toString
    val resultPath = java.nio.file.Files
      .createTempDirectory("graft_smaint_res").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_smaint_ck").toString
    // init corpus: two near-dup clusters {1,2} and {5,6} + singleton 9
    val corpus = Seq((1L, axis(0, 1f)), (2L, axis(0, 2f)),
      (5L, axis(1, 1f)), (6L, axis(1, 3f)), (9L, axis(2, 1f)))
    SemanticMaint.init(corpus.toDF("vec_id", "embedding"), statePath,
      threshold = thr, nassign = 16, nlist = 16)
    // independent batch truth: local union-find over brute-force exact
    // cosine edges on the union corpus (no shared code with the impl)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def checkAgainstBatch(union: Seq[(Long, Array[Float])],
                          tag: String): Unit = {
      val parent = scala.collection.mutable.Map(
        union.map(u => u._1 -> u._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      val edged = scala.collection.mutable.Set.empty[Long]
      for (i <- union.indices; j <- i + 1 until union.size
           if cos(union(i)._2, union(j)._2) >= thr) {
        edged += union(i)._1 += union(j)._1
        val (ra, rb) = (find(union(i)._1), find(union(j)._1))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val batch = edged.map(id => (id, find(id))).toSet
      val stream = SemanticMaint.assignments(spark, statePath).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stream == batch, s"[$tag] stream $stream vs batch $batch")
    }
    checkAgainstBatch(corpus, "init")
    val ms = MemoryStream[(Long, Array[Float])]
    val q = SemanticMaint.start(ms.toDF().toDF("vec_id", "embedding"),
      statePath, resultPath, ckpt, threshold = thr, nassign = 16)
    // batch 0: 11 joins cluster 1; {12,13} form a NEW cluster; 15 is a
    // singleton (reported, never persisted)
    ms.addData(Seq((11L, axis(0, 1.5f)), (12L, axis(3, 1f)),
      (13L, axis(3, 2f)), (15L, axis(4, 1f))))
    q.processAllAvailable()
    val b0 = spark.read.parquet(resultPath).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_new_cluster")))
      .toMap
    assert(b0(11L) == (1L, false), s"vec 11 got ${b0(11L)}")
    assert(b0(12L) == (12L, true) && b0(13L) == (12L, true))
    assert(b0(15L) == (15L, true))
    val union0 = corpus ++ Seq((11L, axis(0, 1.5f)), (12L, axis(3, 1f)),
      (13L, axis(3, 2f)), (15L, axis(4, 1f)))
    checkAgainstBatch(union0, "b0")
    // batch 1: vec 14 = a0+a1 BRIDGES clusters {1,2,11} and {5,6} — the
    // merge event: the union CC collapses both into cluster 1
    ms.addData(Seq((14L, plus(0, 1))))
    q.processAllAvailable()
    q.stop()
    val b1 = spark.read.parquet(s"$resultPath/batch_id=1").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_new_cluster")))
      .toMap
    assert(b1(14L) == (1L, false), s"bridge vec got ${b1(14L)}")
    val union1 = union0 :+ (14L, plus(0, 1))
    checkAgainstBatch(union1, "b1")
    // absorbed cluster 5's members now resolve to 1 through the merge map
    val a = SemanticMaint.assignments(spark, statePath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a(5L) == 1L && a(6L) == 1L && a(14L) == 1L)
    assert(!a.contains(15L), "singletons must not persist in assign/")
    // crash-replay idempotence: re-apply batch 1 against advanced state
    SemanticMaint.applyBatch(
      Seq((14L, plus(0, 1))).toDF("vec_id", "embedding"), 1L, statePath,
      threshold = thr, nassign = 16)
    checkAgainstBatch(union1, "replay")
    // compaction folds partitions + bakes the merge map into stored ids
    SemanticMaint.compact(spark, statePath)
    checkAgainstBatch(union1, "compacted")
    assert(MaintCore.readMerges(spark, statePath).count() == 0,
      "compaction must empty the resolved merge map")
    val b2 = SemanticMaint.applyBatch(
      Seq((20L, axis(1, 0.5f))).toDF("vec_id", "embedding"), 2L,
      statePath, threshold = thr, nassign = 16).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(b2(20L) == 1L, s"post-compaction batch got ${b2.get(20L)}")
    checkAgainstBatch(union1 :+ (20L, axis(1, 0.5f)), "post_compact")
  }

  test("text-tier df refresh: arrival-time df drift (cap-crossing " +
    "shingle keeps spurious edges) repairs to the exact batch " +
    "recompute — including a SPLIT that re-exposes an absorbed rep as " +
    "a live label; crash window heals; refresh is idempotent") {
    import spark.implicits._
    val thr = 0.3
    val cap = 3
    val sp = java.nio.file.Files
      .createTempDirectory("graft_refresh").toString
    // two identical-text families; doc 7 bridges BOTH at arrival —
    // its edges to family {1,2} ride exactly the shingles qrs/rst/stu,
    // which doc 10 later pushes over the df cap
    val t1 = "p q r s t u"
    val t5 = "k l m n o v"
    val t7 = "q r s t u k l m n o"
    val t10 = "q r s t u h1 h2 h3 h4 h5 h6 h7"
    ClusterMaint.init(Seq((1L, t1), (2L, t1)).toDF("doc_id", "text"),
      sp, threshold = thr, maxDf = cap)
    val r0 = ClusterMaint.applyBatch(
      Seq((5L, t5), (6L, t5)).toDF("doc_id", "text"), 0L, sp, thr, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r0 == Map(5L -> 5L, 6L -> 5L))
    // the bridge: {1,2} ∪ {5,6} ∪ {7} merge under label 1, and the
    // absorbed rep 5 lands in the merge map
    val r1 = ClusterMaint.applyBatch(
      Seq((7L, t7)).toDF("doc_id", "text"), 1L, sp, thr, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1 == Map(7L -> 1L), s"bridge got $r1")
    assert(MaintCore.readMerges(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((5L, 1L)))
    // doc 10 pushes df(qrs/rst/stu) to 4 > cap; no new edges (its
    // jaccard to everything stays under threshold)
    val r2 = ClusterMaint.applyBatch(
      Seq((10L, t10)).toDF("doc_id", "text"), 2L, sp, thr, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r2 == Map(10L -> 10L))
    def batchTwin(union: Seq[(Long, String)]): Set[(Long, Long)] = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_refresh_b").toString
      union.map { case (id, tx) => (id, tx, "en", "src0", tx.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      graft.operators.DedupOps
        .dedupClusters(spark, dir, threshold = thr, maxDf = cap)
        .select($"doc_id", $"cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val union = Seq((1L, t1), (2L, t1), (5L, t5), (6L, t5), (7L, t7),
      (10L, t10))
    val expected = batchTwin(union)
    // the DRIFT the verb exists for: the batch recompute drops the
    // cap-crossed bridge edges ({1,2} splits back off; 7 stays with
    // {5,6} through its under-cap shingles) while the stream keeps the
    // arrival-time merge
    assert(expected ==
      Set((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L), (7L, 5L)))
    val drifted = ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(drifted.forall(_._2 == 1L) && drifted.map(_._1) ==
      Set(1L, 2L, 5L, 6L, 7L), s"pre-refresh state should drift: $drifted")
    ClusterMaint.refresh(spark, sp, thr, cap)
    val repaired = ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(repaired == expected,
      s"refresh must equal the batch recompute: $repaired vs $expected")
    // the split re-exposed rep 5 as a LIVE label — its stale merge
    // route must be gone, or reads would collapse the split again
    assert(MaintCore.readMerges(spark, sp).count() == 0,
      "stale (5 -> 1) route must be dropped for the re-exposed label")
    // refreshed sizes govern future arrivals: an identical re-send of
    // doc 10 pairs with it through the final-df kept set
    val r3 = ClusterMaint.applyBatch(
      Seq((11L, t10)).toDF("doc_id", "text"), 3L, sp, thr, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // is_new=false: the component contains OLD node 10 (the late-
    // singleton-twin rule — pre-existing content is reachable)
    assert(r3.toSeq == Seq((11L, 10L, false)), s"post-refresh twin: $r3")
    assert(ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      expected ++ Set((10L, 10L), (11L, 10L)))
    // crash window: live assign deleted, rename never ran — the next
    // read heals it (MaintCore.recover) and sees the identical world
    val fs = new org.apache.hadoop.fs.Path(sp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$sp/assign"),
      new org.apache.hadoop.fs.Path(s"$sp/assign.sealed")))
    assert(ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      expected ++ Set((10L, 10L), (11L, 10L)),
      "crash recovery changed the assignments")
    // idempotent: a second refresh reproduces the same repaired state
    ClusterMaint.refresh(spark, sp, thr, cap)
    assert(ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      batchTwin(union ++ Seq((11L, t10))))
  }

  test("sealGroup atomicity (r17, the r16-advice window): pre-sentinel " +
    "stages are discarded, a post-sentinel crash completes the WHOLE " +
    "swap set on the next read, a mid-swap crash finishes the rest — " +
    "a reader can never see new assignments over an old merge map") {
    import spark.implicits._
    def hp(p: String) = new org.apache.hadoop.fs.Path(p)
    val sp = java.nio.file.Files
      .createTempDirectory("graft_groupseal").toString
    ClusterMaint.init(Seq((1L, "a b c d e f"), (2L, "a b c d e f"))
      .toDF("doc_id", "text"), sp)
    val fs = hp(sp).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def assignSet = ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def stage(sub: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.withColumn("batch_id", lit(-1L))
        .write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$sp/$sub.staged")
    def sentinel(subs: String*): Unit = {
      val out = fs.create(hp(s"$sp/SEAL_COMMIT"), true)
      try out.write(subs.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
    val before = assignSet
    assert(before == Set((1L, 1L), (2L, 1L)))
    // window 1: crash BEFORE the sentinel — live state is the truth,
    // the orphan stage is garbage and must be discarded, not applied
    stage("assign", Seq((9L, 9L)).toDF("doc_id", "cluster_id"))
    assert(assignSet == before, "pre-sentinel stage must not be visible")
    assert(!fs.exists(hp(s"$sp/assign.staged")),
      "orphan stage must be discarded by recover")
    // window 2: crash AFTER the sentinel, before any swap — the next
    // read completes BOTH swaps together (the advice scenario was one
    // family swapped without the other)
    stage("assign", Seq((1L, 3L), (2L, 3L), (3L, 3L))
      .toDF("doc_id", "cluster_id"))
    stage("merges", Seq((1L, 3L)).toDF("old_id", "new_id"))
    sentinel("assign", "merges")
    assert(assignSet == Set((1L, 3L), (2L, 3L), (3L, 3L)),
      "post-sentinel read must see the complete new state")
    assert(MaintCore.readMerges(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 3L)),
      "merge map must swap with the assignments, not after them")
    assert(!fs.exists(hp(s"$sp/SEAL_COMMIT")) &&
      !fs.exists(hp(s"$sp/assign.staged")) &&
      !fs.exists(hp(s"$sp/merges.staged")))
    // window 3: crash MID-swap — assign already swapped (stage gone),
    // merges still staged under the sentinel; recover finishes the rest
    stage("merges", Seq.empty[(Long, Long)].toDF("old_id", "new_id"))
    sentinel("merges")
    assert(assignSet == Set((1L, 3L), (2L, 3L), (3L, 3L)))
    assert(MaintCore.readMerges(spark, sp).count() == 0L,
      "mid-swap recovery must complete the remaining family")
    assert(!fs.exists(hp(s"$sp/SEAL_COMMIT")))
    // window 4 (r18, the r17-advice hole): crash MID-SENTINEL-WRITE.
    // The sentinel is now staged as SEAL_COMMIT.tmp and renamed into
    // place atomically, so the only possible crash artifact is the
    // .tmp — here deliberately PREFIX-TRUNCATED (naming only one of the
    // two staged families, the exact mixed-swap recipe a non-atomic
    // create/write/close could have committed). recover must treat it
    // as pre-sentinel: live state untouched, BOTH stages and the tmp
    // discarded — never a partial swap from a half-written member list.
    stage("assign", Seq((7L, 7L)).toDF("doc_id", "cluster_id"))
    stage("merges", Seq((3L, 7L)).toDF("old_id", "new_id"))
    val tmpOut = fs.create(hp(s"$sp/SEAL_COMMIT.tmp"), true)
    try tmpOut.write("assign".getBytes("UTF-8")) // truncated: merges lost
    finally tmpOut.close()
    assert(assignSet == Set((1L, 3L), (2L, 3L), (3L, 3L)),
      "a half-written sentinel must not publish anything")
    assert(MaintCore.readMerges(spark, sp).count() == 0L,
      "a half-written sentinel must not swap any family")
    assert(!fs.exists(hp(s"$sp/SEAL_COMMIT.tmp")) &&
      !fs.exists(hp(s"$sp/assign.staged")) &&
      !fs.exists(hp(s"$sp/merges.staged")),
      "recover must discard the tmp sentinel and its orphan stages")
  }

  test("semantic requantize: a drifted corpus recovers candidate recall " +
    "(recallAudit measures the decay and the repair), previously-" +
    "assigned cluster ids survive, and the epoch-swap crash window " +
    "recovers") {
    import spark.implicits._
    val thr = 0.4
    def axis(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](6); v(i) = s; v
    }
    // axis4-dominant with a small axis-i lean: under the BOOTSTRAP
    // quantizer (cells = axes 0..3 — no axis-4 cell exists) the lean
    // alone decides the single nearest cell, so two cosine-0.978
    // drifted twins land in DIFFERENT cells at nassign=1 — the
    // decayed-recall geometry the frozen-quantizer contract documents
    def drift(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](6); v(4) = s; v(i) = 0.15f * s; v
    }
    val sp = java.nio.file.Files
      .createTempDirectory("graft_requant").toString
    // bootstrap: scalar-multiple clusters on axes 0 and 1 + two
    // singletons; 4 cells → centroids are exactly the four axes
    // (deterministic farthest-point + Lloyd on orthogonal families)
    val corpus = Seq((1L, axis(0, 1f)), (2L, axis(0, 2f)),
      (3L, axis(1, 1f)), (4L, axis(1, 3f)),
      (5L, axis(2, 1f)), (6L, axis(3, 1f)))
    SemanticMaint.init(corpus.toDF("vec_id", "embedding"), sp,
      threshold = thr, nassign = 1, nlist = 4)
    val va = drift(0, 1f)
    val vb = drift(1, 1f)
    val r0 = SemanticMaint.applyBatch(
      Seq((100L, va)).toDF("vec_id", "embedding"), 0L, sp, thr, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(r0.toSeq == Seq((100L, 100L, true)))
    // the MISS: cos(va, vb) ≈ 0.978 >= thr, but the frozen cells split
    // the pair — vb forms its own cluster instead of joining 100
    val r1 = SemanticMaint.applyBatch(
      Seq((101L, vb)).toDF("vec_id", "embedding"), 1L, sp, thr, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(r1.toSeq == Seq((101L, 101L, true)),
      s"drifted twin should have been MISSED under the frozen cells: $r1")
    // the audit sees the decay: truth = {1,2},{3,4},{100,101}; the
    // stored cells find only the first two
    val pre = SemanticMaint.recallAudit(spark, sp, thr).collect().head
    assert(pre.getAs[Long]("truth_pairs") == 3L &&
      pre.getAs[Long]("found_pairs") == 2L,
      s"pre-requantize audit: $pre")
    assert(pre.getAs[Double]("recall") < 1.0)
    val idsBefore = SemanticMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(idsBefore == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    SemanticMaint.requantize(spark, sp, thr, nassign = 1, nlist = 5)
    val after = SemanticMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // continuity: every previously-assigned id survives verbatim
    idsBefore.foreach { case (id, c) =>
      assert(after(id) == c, s"requantize moved $id: ${after(id)} != $c")
    }
    // repair: the missed pair is now one cluster under the min id
    assert(after(100L) == 100L && after(101L) == 100L,
      s"requantize should repair the missed pair: $after")
    val post = SemanticMaint.recallAudit(spark, sp, thr).collect().head
    assert(post.getAs[Double]("recall") == 1.0 &&
      post.getAs[Long]("found_pairs") == 3L,
      s"post-requantize audit: $post")
    // future arrivals probe the NEW cells: a drifted twin now joins the
    // repaired cluster instead of founding another
    val r2 = SemanticMaint.applyBatch(
      Seq((102L, drift(1, 2f))).toDF("vec_id", "embedding"), 2L, sp,
      thr, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(r2.toSeq == Seq((102L, 100L, false)),
      s"post-requantize arrival: $r2")
    // crash window: simulate "live epoch deleted, rename never ran" —
    // the next state read must heal it (MaintCore.recover) and see the
    // identical world
    val withNew = SemanticMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val fs = new org.apache.hadoop.fs.Path(sp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$sp/quant"),
      new org.apache.hadoop.fs.Path(s"$sp/quant.sealed")))
    val healed = SemanticMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(healed == withNew, "crash recovery changed the assignments")
    assert(SemanticMaint.recallAudit(spark, sp, thr).collect()
      .head.getAs[Double]("recall") == 1.0)
  }

  test("semantic maintainer emits recallAudit rows at the configured " +
    "cadence (auditEvery), each equal to the batch operator on the " +
    "state at that boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val thr = 0.4
    def axis(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](6); v(i) = s; v
    }
    val sp = java.nio.file.Files
      .createTempDirectory("graft_smaudit").toString
    val res = java.nio.file.Files
      .createTempDirectory("graft_smaudit_res").toString
    val ap = java.nio.file.Files
      .createTempDirectory("graft_smaudit_ap").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_smaudit_ck").toString
    SemanticMaint.init(
      Seq((1L, axis(0, 1f)), (2L, axis(0, 2f)), (9L, axis(2, 1f)))
        .toDF("vec_id", "embedding"), sp, threshold = thr,
      nassign = 16, nlist = 16)
    val ms = MemoryStream[(Long, Array[Float])]
    val q = SemanticMaint.start(ms.toDF().toDF("vec_id", "embedding"),
      sp, res, ckpt, threshold = thr, nassign = 16,
      auditEvery = 2, auditPath = ap)
    ms.addData(Seq((11L, axis(0, 1.5f)))) // batch 0 → audited
    q.processAllAvailable()
    ms.addData(Seq((12L, axis(3, 1f)))) // batch 1 → no audit row
    q.processAllAvailable()
    ms.addData(Seq((13L, axis(3, 2f)))) // batch 2 → audited
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(ap).collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("truth_pairs"), r.getAs[Long]("found_pairs"),
          r.getAs[Double]("recall"))).toMap
    assert(rows.keySet == Set(0L, 2L),
      s"audit cadence emitted ${rows.keySet}")
    // the boundary-2 row equals the by-hand batch operator on the
    // final state (batch 2 was the last applied)
    val hand = SemanticMaint.recallAudit(spark, sp, thr).collect().head
    assert(rows(2L) == ((hand.getAs[Long]("truth_pairs"),
      hand.getAs[Long]("found_pairs"), hand.getAs[Double]("recall"))))
    // nassign = nlist → every pair shares a cell: recall is exactly 1
    assert(rows.values.forall(_._3 == 1.0), s"audit rows: $rows")
  }

  test("streaming MEDIA cluster maintenance: stream ≡ batch " +
    "mediaClustersOf on the union corpus at every boundary, incl. a " +
    "same-codec merge; replay + compaction idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    def dist(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    // fixture SEARCH over the deterministic AM-tone grid: two families
    // each a (8k, 16k-resample) twin pair (hamming ≤ 3 inside), ALL
    // cross distances ≥ 4 (so the families never pair directly), and a
    // bridge tone within ≤ 3 of a member of EACH family — the
    // same-codec merge case. The grid is deterministic, so the picked
    // fixture is too; every relation is re-asserted so hash drift
    // fails loudly here, not downstream.
    case class Tone(f: Int, a8: Array[Byte], a16: Array[Byte],
                    h8: Long, h16: Long)
    val grid = (300 to 640 by 10).flatMap { f =>
      val a8 = amWav(8000f, f, 12.1); val a16 = amWav(16000f, f, 12.1)
      for (h8 <- Multimodal.audioHash(a8);
           h16 <- Multimodal.audioHash(a16)
           if dist(h8, h16) <= 3) yield Tone(f, a8, a16, h8, h16)
    }
    def far(t: Tone, u: Tone) = Seq(dist(t.h8, u.h8), dist(t.h8, u.h16),
      dist(t.h16, u.h8), dist(t.h16, u.h16)).min >= 4
    val triple = (for {
      t1 <- grid; t2 <- grid if t1.f < t2.f && far(t1, t2)
      br <- grid if br.f != t1.f && br.f != t2.f &&
        dist(br.h8, t1.h8) <= 3 && dist(br.h8, t2.h8) <= 3
    } yield (t1, t2, br)).headOption
    assert(triple.isDefined, "tone grid yielded no merge fixture - " +
      "audioHash geometry drifted; widen the grid")
    val (t1, t2, br) = triple.get
    // singletons come from a SEPARATE modulation family (the 12.1 Hz
    // grid is dense enough at this spacing that every tone sits within
    // 3 bits of the picked triple): any single-rate tone ≥ 4 bits from
    // every triple member and from the other singleton
    case class LoneTone(bytes: Array[Byte], h: Long)
    val lonePool = for {
      mod <- Seq(8.3, 15.7, 21.9); f <- 300 to 640 by 20
      bytes = amWav(8000f, f, mod)
      h <- Multimodal.audioHash(bytes)
      if Seq(t1, t2, br).forall(u =>
        dist(h, u.h8) >= 4 && dist(h, u.h16) >= 4)
    } yield LoneTone(bytes, h)
    val lone = lonePool.foldLeft(Vector.empty[LoneTone]) { (acc, t) =>
      if (acc.size < 2 && acc.forall(u => dist(t.h, u.h) >= 4)) acc :+ t
      else acc
    }
    assert(lone.size >= 2, "need two isolated tones for the singletons")
    val (s9, s15) = (lone(0), lone(1))
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_mmaint").toString
    val resultPath = java.nio.file.Files
      .createTempDirectory("graft_mmaint_res").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_mmaint_ck").toString
    // corpus: twin family {1,2} + isolated 9; an image rides along to
    // pin codec separation (its hash shares no (codec, band) bucket
    // with any WAV whatever the bits)
    val img = Multimodal.synthesizePng("mm-img".getBytes, 24, 16)
    val corpus = Seq((1L, t1.a8), (2L, t1.a16), (9L, s9.bytes), (10L, img))
    MediaMaint.init(corpus.toDF("media_id", "content"), statePath)
    def checkAgainstBatch(union: Seq[(Long, Array[Byte])],
                          tag: String): Unit = {
      val batch = Multimodal
        .mediaClustersOf(union.toDF("media_id", "content"))
        .select($"media_id", $"cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val stream = MediaMaint.assignments(spark, statePath).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stream == batch, s"[$tag] stream $stream vs batch $batch")
    }
    checkAgainstBatch(corpus, "init")
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = MediaMaint.start(ms.toDF().toDF("media_id", "content"),
      statePath, resultPath, ckpt)
    // batch 0: 11 (byte-identical re-send of t1.a8) joins cluster 1;
    // {12,13} open the second twin family; 15 is a singleton; 16 is
    // undecodable → excluded from clustering entirely
    ms.addData(Seq((11L, t1.a8), (12L, t2.a8), (13L, t2.a16),
      (15L, s15.bytes), (16L, "junk bytes".getBytes)))
    q.processAllAvailable()
    val b0 = spark.read.parquet(resultPath).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_new_cluster")))
      .toMap
    assert(b0(11L) == (1L, false), s"blob 11 got ${b0(11L)}")
    assert(b0(12L) == (12L, true) && b0(13L) == (12L, true))
    assert(b0(15L) == (15L, true))
    assert(!b0.contains(16L), "undecodable blob must not cluster")
    val union0 = corpus ++ Seq((11L, t1.a8), (12L, t2.a8),
      (13L, t2.a16), (15L, s15.bytes))
    checkAgainstBatch(union0, "b0")
    // batch 1: the bridge tone MERGES families {1,2,11} and {12,13}
    ms.addData(Seq((14L, br.a8)))
    q.processAllAvailable()
    q.stop()
    val b1 = spark.read.parquet(s"$resultPath/batch_id=1").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_new_cluster")))
      .toMap
    assert(b1(14L) == (1L, false), s"bridge blob got ${b1(14L)}")
    val union1 = union0 :+ (14L, br.a8)
    checkAgainstBatch(union1, "b1")
    val a = MediaMaint.assignments(spark, statePath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a(12L) == 1L && a(13L) == 1L && a(14L) == 1L,
      s"absorbed family must resolve through the merge map: $a")
    // crash-replay idempotence + compaction + post-compaction batch
    MediaMaint.applyBatch(Seq((14L, br.a8)).toDF("media_id", "content"),
      1L, statePath)
    checkAgainstBatch(union1, "replay")
    MediaMaint.compact(spark, statePath)
    checkAgainstBatch(union1, "compacted")
    assert(MaintCore.readMerges(spark, statePath).count() == 0)
    val b2 = MediaMaint.applyBatch(
      Seq((20L, t2.a8)).toDF("media_id", "content"), 2L, statePath)
      .collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    assert(b2(20L) == 1L, s"post-compaction batch got ${b2.get(20L)}")
    checkAgainstBatch(union1 :+ (20L, t2.a8), "post_compact")
  }

  test("media maintainer clusters a TRIMMED video re-encode with its " +
    "original (min-anchor fingerprint — the r14 first-frame rule " +
    "provably escaped this case)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    def gfv1Frames(v: Array[Byte]): Seq[Array[Byte]] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(v))
      in.readInt()
      val nf = in.readInt()
      (0 until nf).map { _ =>
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b); b
      }
    }
    def gfv1(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.writeInt(0x47465631); dos.writeInt(frames.length)
      frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
      dos.flush(); out.toByteArray
    }
    // deterministic fixture search: anchor frame NOT frame 0, and frame
    // 0 more than 3 bits from the anchor — under the first-frame rule
    // the trimmed twin's fingerprint would land > maxHamming away and
    // escape every media gate; re-asserted so hash drift fails loudly
    val vid = (0 until 64).map(i =>
        Multimodal.synthesizeVideo(s"trim-$i".getBytes, frames = 4))
      .find { v =>
        val ph = gfv1Frames(v).map(f =>
          Multimodal.videoHash(gfv1(Seq(f))).get)
        val anchor = ph.minBy(h => h ^ Long.MinValue)
        ph.head != anchor &&
          java.lang.Long.bitCount(ph.head ^ anchor) > 3
      }.get
    val trimmed = gfv1(gfv1Frames(vid).drop(1))
    assert(Multimodal.videoHash(trimmed) == Multimodal.videoHash(vid))
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_vtrim").toString
    val resultPath = java.nio.file.Files
      .createTempDirectory("graft_vtrim_res").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_vtrim_ck").toString
    // corpus holds only unrelated media — the twins meet in-stream
    MediaMaint.init(Seq(
      (1L, Multimodal.synthesizePng("unrelated".getBytes, 16, 12)))
      .toDF("media_id", "content"), statePath)
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = MediaMaint.start(ms.toDF().toDF("media_id", "content"),
      statePath, resultPath, ckpt)
    ms.addData(Seq((10L, vid)))
    q.processAllAvailable()
    ms.addData(Seq((11L, trimmed))) // cross-batch trimmed re-encode
    q.processAllAvailable()
    q.stop()
    val res = spark.read.parquet(resultPath).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_new_cluster")))
      .toMap
    assert(res.get(10L).contains((10L, true)), s"results: $res")
    assert(res.get(11L).contains((10L, false)),
      s"trimmed twin must join the original's cluster: $res")
    val a = MediaMaint.assignments(spark, statePath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a(10L) == 10L && a(11L) == 10L, s"assignments: $a")
  }

  test("K-min anchors live: an anchor-frame-REMOVING video edit is " +
    "caught by the maintainer and the stream gate (the r15 min-anchor " +
    "escape); cross-version media state refuses loudly") { withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    def gfv1Frames(v: Array[Byte]): Seq[Array[Byte]] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(v))
      in.readInt()
      val nf = in.readInt()
      (0 until nf).map { _ =>
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b); b
      }
    }
    def gfv1(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.writeInt(0x47465631); dos.writeInt(frames.length)
      frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
      dos.flush(); out.toByteArray
    }
    // fixture: 4 distinct frame hashes pairwise > 3 bits apart, so the
    // anchor-removing edit provably re-anchors the r15 single-min rule
    // beyond tolerance (the escape) while sharing 3 K-min anchors
    val vid = (0 until 64).map(i =>
        Multimodal.synthesizeVideo(s"kmin-$i".getBytes, frames = 4))
      .find { v =>
        val ph = gfv1Frames(v).map(f =>
          Multimodal.videoHash(gfv1(Seq(f))).get)
        ph.distinct.size == 4 &&
          ph.combinations(2).forall(p =>
            java.lang.Long.bitCount(p(0) ^ p(1)) > 3)
      }.get
    val frames = gfv1Frames(vid)
    val hMin = Multimodal.videoHash(vid).get
    val edited = gfv1(frames.filter(f =>
      Multimodal.videoHash(gfv1(Seq(f))).get != hMin))
    assert(java.lang.Long.bitCount(
      Multimodal.videoHash(edited).get ^ hMin) > 3,
      "edit must re-anchor the single-min rule")
    // maintainer: edit joins the original's cluster across batches
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_kmin").toString
    val resultPath = java.nio.file.Files
      .createTempDirectory("graft_kmin_res").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_kmin_ck").toString
    MediaMaint.init(Seq(
      (1L, Multimodal.synthesizePng("unrelated-k".getBytes, 16, 12)))
      .toDF("media_id", "content"), statePath)
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = MediaMaint.start(ms.toDF().toDF("media_id", "content"),
      statePath, resultPath, ckpt)
    ms.addData(Seq((10L, vid)))
    q.processAllAvailable()
    ms.addData(Seq((11L, edited)))
    q.processAllAvailable()
    q.stop()
    val a = MediaMaint.assignments(spark, statePath).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.get(10L).contains(10L) && a.get(11L).contains(10L),
      s"anchor-removing edit must join the original's cluster: $a")
    // stream ≡ batch recompute still holds at the boundary
    val batch = Multimodal.mediaClustersOf(Seq((10L, vid), (11L, edited),
        (1L, Multimodal.synthesizePng("unrelated-k".getBytes, 16, 12)))
        .toDF("media_id", "content"))
      .select($"media_id", $"cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.toSet == batch, s"stream $a vs batch $batch")
    // stream GATE: an anchor-removing edit of a CORPUS video drops
    val corpus = StreamOps.mediaCorpusHashes(Seq(vid).toDF("content"))
    val ms2 = MemoryStream[(Long, Array[Byte])]
    val q2 = StreamOps.mediaDedup(
      ms2.toDS().toDF("media_id", "content"), corpus)
      .writeStream.format("memory").queryName("t_kmin_gate")
      .outputMode("append").start()
    val novel = Multimodal.synthesizeVideo("kmin-novel".getBytes,
      frames = 3)
    ms2.addData(Seq((20L, edited), (21L, novel)))
    q2.processAllAvailable()
    // in-stream leg: an anchor-removing edit of an ADMITTED video drops
    val novelFrames = gfv1Frames(novel)
    val novelMin = Multimodal.videoHash(novel).get
    val novelEdit = gfv1(novelFrames.filter(f =>
      Multimodal.videoHash(gfv1(Seq(f))).get != novelMin))
    ms2.addData(Seq((22L, novelEdit)))
    q2.processAllAvailable()
    q2.stop()
    val admitted = spark.sql("select media_id from t_kmin_gate")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(21L), s"gate admitted $admitted")
    // cross-version refusal: state without a marker (pre-r16) and a
    // mismatched marker both throw instead of silently reading
    val stale = java.nio.file.Files
      .createTempDirectory("graft_kmin_stale").toString
    java.nio.file.Files
      .createDirectories(java.nio.file.Paths.get(s"$stale/index"))
    val e1 = intercept[IllegalStateException] {
      MediaMaint.assignments(spark, stale)
    }
    assert(e1.getMessage.contains("no MEDIA_STATE_VERSION"), e1.getMessage)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$stale/MEDIA_STATE_VERSION"), "2")
    val e2 = intercept[IllegalStateException] {
      MediaMaint.applyBatch(Seq((30L, vid)).toDF("media_id", "content"),
        0L, stale)
    }
    assert(e2.getMessage.contains("version 2"), e2.getMessage)
  }}

  test("media rehash migrates cross-rule state from the retained " +
    "corpus: ids survive, a TTL'd bridge splits exactly as the batch " +
    "recompute (stale route dropped for the re-exposed label), a " +
    "re-bridged corpus re-merges through the routed map, the marker " +
    "is stamped LAST (crash window refuses loudly until a re-run), " +
    "and the verb is idempotent") {
    import spark.implicits._
    import graft.operators.Multimodal
    def gfv1Frames(v: Array[Byte]): Seq[Array[Byte]] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(v))
      in.readInt()
      val nf = in.readInt()
      (0 until nf).map { _ =>
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b); b
      }
    }
    def gfv1(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.writeInt(0x47465631); dos.writeInt(frames.length)
      frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
      dos.flush(); out.toByteArray
    }
    def frameHashes(v: Array[Byte]): Seq[Long] =
      gfv1Frames(v).map(f => Multimodal.videoHash(gfv1(Seq(f))).get)
    // two video families whose 8 frame hashes are pairwise > 3 bits
    // apart (so the families are far under the K-min rule), plus a
    // BRIDGE cut from 2 frames of each — its anchors match both
    // families at hamming 0
    val (vidA, vidB) = (for {
      i <- (0 until 64).iterator
      a = Multimodal.synthesizeVideo(s"rehash-a$i".getBytes, frames = 4)
      b = Multimodal.synthesizeVideo(s"rehash-b$i".getBytes, frames = 4)
      hs = frameHashes(a) ++ frameHashes(b)
      if hs.distinct.size == 8 && hs.combinations(2).forall(p =>
        java.lang.Long.bitCount(p(0) ^ p(1)) > 3)
    } yield (a, b)).next()
    val bridge = gfv1(gfv1Frames(vidA).take(2) ++ gfv1Frames(vidB).take(2))
    val sp = java.nio.file.Files
      .createTempDirectory("graft_rehash").toString
    val markerP = java.nio.file.Paths.get(s"$sp/MEDIA_STATE_VERSION")
    // write through the Hadoop fs — init's fs.create leaves a .crc
    // sidecar a bare Files.writeString would invalidate
    def setMarker(v: String): Unit = {
      val hfs = new org.apache.hadoop.fs.Path(sp)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = hfs.create(
        new org.apache.hadoop.fs.Path(s"$sp/MEDIA_STATE_VERSION"), true)
      try out.write(v.getBytes("UTF-8")) finally out.close()
    }
    MediaMaint.init(Seq((1L, vidA), (2L, vidA)).toDF("media_id", "content"),
      sp)
    val r0 = MediaMaint.applyBatch(
      Seq((5L, vidB), (6L, vidB)).toDF("media_id", "content"), 0L, sp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r0 == Map(5L -> 5L, 6L -> 5L))
    val r1 = MediaMaint.applyBatch(
      Seq((7L, bridge)).toDF("media_id", "content"), 1L, sp)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1 == Map(7L -> 1L), s"bridge got $r1")
    assert(MaintCore.readMerges(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((5L, 1L)))
    // the upgrade scenario: state written under an older rule — every
    // standard verb refuses; rehash is the documented cure
    setMarker("2")
    intercept[IllegalStateException] { MediaMaint.assignments(spark, sp) }
    // retained corpus lost the bridge (TTL'd upstream) — the migration
    // must split the families exactly as the batch recompute does
    val retained = Seq((1L, vidA), (2L, vidA), (5L, vidB), (6L, vidB))
    MediaMaint.rehash(retained.toDF("media_id", "content"), sp)
    assert(java.nio.file.Files.readString(markerP).trim == "3",
      "rehash must stamp the current rule")
    def batchTwin(union: Seq[(Long, Array[Byte])]): Set[(Long, Long)] =
      Multimodal.mediaClustersOf(union.toDF("media_id", "content"))
        .select($"media_id", $"cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val split = MediaMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(split == batchTwin(retained) &&
      split == Set((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)),
      s"rehash must equal the batch recompute on the retained corpus: " +
        s"$split")
    // label 5 is LIVE again — its stale (5 -> 1) route must be gone
    assert(MaintCore.readMerges(spark, sp).count() == 0,
      "stale route to the re-exposed label must be dropped")
    // migrated state serves normal traffic: a vidB twin joins family 5
    val r2 = MediaMaint.applyBatch(
      Seq((11L, vidB)).toDF("media_id", "content"), 2L, sp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(r2.toSeq == Seq((11L, 5L, false)), s"post-rehash twin: $r2")
    // a later rehash over a RE-BRIDGED corpus re-merges: the absorbed
    // live label routes through the rebuilt map, members resolve to 1
    val retained2 = retained ++ Seq((7L, bridge), (11L, vidB))
    MediaMaint.rehash(retained2.toDF("media_id", "content"), sp)
    val merged = MediaMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == batchTwin(retained2) && merged.forall(_._2 == 1L),
      s"re-bridged rehash: $merged")
    assert(MaintCore.readMerges(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((5L, 1L)))
    // marker-last crash ordering: new-rule seals + old marker = every
    // verb refuses until the re-run completes the migration
    setMarker("2")
    intercept[IllegalStateException] {
      MediaMaint.applyBatch(
        Seq((12L, vidA)).toDF("media_id", "content"), 3L, sp)
    }
    MediaMaint.rehash(retained2.toDF("media_id", "content"), sp)
    // idempotent: the re-run reproduced the same migrated world
    assert(MediaMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == merged)
    // seal crash window mid-verb: live assign gone, .sealed complete —
    // the next read heals it (MaintCore.recover on every read path)
    val fs = new org.apache.hadoop.fs.Path(sp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$sp/assign"),
      new org.apache.hadoop.fs.Path(s"$sp/assign.sealed")))
    assert(MediaMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == merged,
      "crash recovery changed the assignments")
    // singleton re-emergence (r16 self-review finding): the retained
    // corpus loses 6 AND the bridge — blob 5 survives as a present
    // SINGLETON, so its stale (5 -> 1) route must DROP: a later vidB
    // twin mints label 5 live, and the stale route would silently
    // redirect the new family to the unrelated vidA cluster
    val retained3 = Seq((1L, vidA), (2L, vidA), (5L, vidB))
    MediaMaint.rehash(retained3.toDF("media_id", "content"), sp)
    assert(MediaMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 1L), (2L, 1L)))
    assert(MaintCore.readMerges(spark, sp).count() == 0,
      "stale route to a present-singleton old label must drop")
    val r4 = MediaMaint.applyBatch(
      Seq((31L, vidB)).toDF("media_id", "content"), 4L, sp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(r4.toSeq == Seq((31L, 5L, false)), s"re-emerged label: $r4")
    assert(MediaMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      batchTwin(retained3 :+ (31L, vidB)),
      "stream must equal the batch recompute after re-emergence")
    // same-version crash sentinel: a rehash interrupted between seals
    // leaves NO marker — standard verbs refuse loudly (not a silent
    // valid-marker/mixed-state read) until the re-run completes
    fs.delete(
      new org.apache.hadoop.fs.Path(s"$sp/MEDIA_STATE_VERSION"), false)
    val e3 = intercept[IllegalStateException] {
      MediaMaint.assignments(spark, sp)
    }
    assert(e3.getMessage.contains("interrupted"), e3.getMessage)
    MediaMaint.rehash((retained3 :+ (31L, vidB))
      .toDF("media_id", "content"), sp)
    assert(MediaMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet ==
      batchTwin(retained3 :+ (31L, vidB)))
    // fresh path: the verb is a migration, not a bootstrap
    intercept[IllegalArgumentException] {
      MediaMaint.rehash(retained.toDF("media_id", "content"),
        java.nio.file.Files.createTempDirectory("graft_rehash_f").toString)
    }
  }

  test("text-tier refresh drops stale routes to present-singleton old " +
    "labels: a full dissolve leaves the map empty, and a later twin " +
    "re-mints the old label live, equal to the batch recompute") {
    import spark.implicits._
    val thr = 0.3
    val cap = 3
    val sp = java.nio.file.Files
      .createTempDirectory("graft_refresh_sing").toString
    // family {4,5,6} pairs through the shared klm/lmn shingles; extra
    // arrivals 20/21 push BOTH over the df cap, dissolving the family
    // to singletons at refresh — while each doc keeps one private
    // under-cap shingle (identical docs could never re-split)
    ClusterMaint.init(Seq((1L, "p q r s t u")).toDF("doc_id", "text"),
      sp, threshold = thr, maxDf = cap)
    val r0 = ClusterMaint.applyBatch(
      Seq((5L, "k l m n x1"), (6L, "k l m n y1"))
        .toDF("doc_id", "text"), 0L, sp, thr, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r0 == Map(5L -> 5L, 6L -> 5L))
    val r1 = ClusterMaint.applyBatch(
      Seq((4L, "k l m n w1")).toDF("doc_id", "text"), 1L, sp, thr, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1 == Map(4L -> 4L), s"smaller id takes the label: $r1")
    assert(MaintCore.readMerges(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((5L, 4L)))
    // 20/21 arrive after klm/lmn crossed the cap — edgeless singletons
    val r2 = ClusterMaint.applyBatch(
      Seq((20L, "k l m n z1"), (21L, "k l m n v1"))
        .toDF("doc_id", "text"), 2L, sp, thr, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r2 == Map(20L -> 20L, 21L -> 21L))
    ClusterMaint.refresh(spark, sp, thr, cap)
    // final df(klm) = df(lmn) = 5 > cap: the batch recompute has ZERO
    // clusters; doc 5 is a present SINGLETON, so the stale (5 -> 4)
    // route must drop — the old code kept it (5 was neither a live
    // label nor relabeled) and would misroute the re-minted family
    assert(ClusterMaint.assignments(spark, sp).count() == 0,
      "full dissolve: no clustered docs")
    assert(MaintCore.readMerges(spark, sp).count() == 0,
      "stale route to a present-singleton old label must drop")
    // the twin: shares doc 5's one surviving private shingle (m n x1),
    // jaccard 1/3 >= 0.3 — label 5 re-emerges LIVE
    val r3 = ClusterMaint.applyBatch(
      Seq((30L, "m n x1 a1 a2")).toDF("doc_id", "text"), 3L, sp, thr,
      cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(r3.toSeq == Seq((30L, 5L, false)), s"re-minted label: $r3")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_refresh_sing_b").toString
    (Seq((1L, "p q r s t u"), (5L, "k l m n x1"), (6L, "k l m n y1"),
      (4L, "k l m n w1"), (20L, "k l m n z1"), (21L, "k l m n v1"),
      (30L, "m n x1 a1 a2")))
      .map { case (id, tx) => (id, tx, "en", "src0", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val expected = graft.operators.DedupOps
      .dedupClusters(spark, dir, threshold = thr, maxDf = cap)
      .select($"doc_id", $"cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected == Set((5L, 5L), (30L, 5L)))
    assert(ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expected,
      "stream must equal the batch recompute after re-emergence")
  }

  test("state-derived media dup report equals the batch corpus audit " +
    "across codecs, singletons and undecodables (one rollup source, " +
    "zero re-hashing)") {
    import spark.implicits._
    import graft.operators.Multimodal
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val vid = Multimodal.synthesizeVideo("dupr-v".getBytes, frames = 4)
    val png1 = Multimodal.synthesizePng("dupr-p1".getBytes, 24, 16)
    val h1 = Multimodal.aHash(png1).get
    // a second image family far from the first under aHash, so the
    // image codec carries one twin family + one singleton
    val png2 = (0 until 64).iterator
      .map(i => Multimodal.synthesizePng(s"dupr-p2-$i".getBytes, 24, 16))
      .find(p => ham(Multimodal.aHash(p).get, h1) > 3).get
    val sp = java.nio.file.Files
      .createTempDirectory("graft_dupreport").toString
    // state built the way a deploy builds it: bootstrap + live batches
    MediaMaint.init(
      Seq((1L, vid), (3L, png1)).toDF("media_id", "content"), sp)
    MediaMaint.applyBatch(
      Seq((2L, vid), (4L, png1), (9L, png2)).toDF("media_id", "content"),
      0L, sp)
    MediaMaint.applyBatch(
      Seq((16L, "not media".getBytes)).toDF("media_id", "content"), 1L, sp)
    val union = Seq((1L, vid), (2L, vid), (3L, png1), (4L, png1),
      (9L, png2), (16L, "not media".getBytes))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    val fromState = rows(MediaMaint.dupReport(spark, sp))
    val fromCorpus = rows(
      Multimodal.dupRateOf(union.toDF("media_id", "content")))
    assert(fromState == fromCorpus,
      s"state report $fromState vs corpus audit $fromCorpus")
    // the numbers themselves: video {1,2} one family of 2; img {3,4}
    // one family of 2 plus singleton 9; the undecodable appears nowhere
    assert(fromState.toSet == Set(
      ("video", 2L, 2L, 1L, 1L, 0.5), ("img", 3L, 2L, 1L, 1L, 0.3333)),
      s"report read $fromState")
    // post-compaction the same report holds (ids baked, partitions
    // folded — the state shapes a long-running deploy actually has)
    MediaMaint.compact(spark, sp)
    assert(rows(MediaMaint.dupReport(spark, sp)) == fromCorpus)
  }

  test("media maintainer emits dupReport rows at the configured " +
    "cadence (auditEvery), each equal to the by-hand verb on the " +
    "state at that boundary (s_media_dup_probe)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val png1 = Multimodal.synthesizePng("mdp-A".getBytes, 24, 16)
    val twin1 = Multimodal.resizeImage(png1, 24, 16)
    val h1 = Multimodal.aHash(png1).get
    // two further image families far from png1 (and each other) under
    // aHash — each must stay a singleton, not accidentally band-pair
    val fars = (0 until 256).iterator
      .map(i => Multimodal.synthesizePng(s"mdp-far-$i".getBytes, 24, 16))
      .filter(p => ham(Multimodal.aHash(p).get, h1) > 3)
      .scanLeft(List.empty[Array[Byte]]) { (acc, p) =>
        if (acc.forall(q =>
          ham(Multimodal.aHash(q).get, Multimodal.aHash(p).get) > 3))
          p :: acc
        else acc
      }.find(_.size >= 2).get
    val (farA, farB) = (fars.head, fars(1))
    val sp = java.nio.file.Files
      .createTempDirectory("graft_mdprobe").toString
    val rp = java.nio.file.Files
      .createTempDirectory("graft_mdprobe_res").toString
    val ap = java.nio.file.Files
      .createTempDirectory("graft_mdprobe_ap").toString
    val ck = java.nio.file.Files
      .createTempDirectory("graft_mdprobe_ck").toString
    MediaMaint.init(Seq((1L, png1)).toDF("media_id", "content"), sp)
    val ms = MemoryStream[(Long, Array[Byte])]
    val q = MediaMaint.start(ms.toDF().toDF("media_id", "content"),
      sp, rp, ck, auditEvery = 2, auditPath = ap)
    def report() = MediaMaint.dupReport(spark, sp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    ms.addData(Seq((2L, twin1))) // batch 0 → audited: family {1,2}
    q.processAllAvailable()
    val hand0 = report() // by-hand verb on the boundary-0 state
    ms.addData(Seq((3L, farA))) // batch 1 → NO audit row
    q.processAllAvailable()
    ms.addData(Seq((4L, farB))) // batch 2 → audited
    q.processAllAvailable()
    q.stop()
    val hand2 = report()
    val byBatch = spark.read.parquet(ap).collect()
      .groupBy(_.getAs[Number]("batch_id").longValue)
      .view.mapValues(_.map(r => (r.getAs[String]("codec"),
        r.getAs[Long]("n_blobs"), r.getAs[Long]("n_clustered"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("n_dup_excess"),
        r.getAs[Double]("dup_rate"))).toSet).toMap
    assert(byBatch.keySet == Set(0L, 2L),
      s"audit cadence emitted ${byBatch.keySet}")
    assert(byBatch(0L) == hand0,
      s"boundary-0 probe ${byBatch(0L)} vs by-hand $hand0")
    assert(byBatch(2L) == hand2,
      s"boundary-2 probe ${byBatch(2L)} vs by-hand $hand2")
    // the numbers: boundary 0 = one twin family; boundary 2 adds two
    // singletons the probe must NOT count as duplicated
    assert(hand0 == Set(("img", 2L, 2L, 1L, 1L, 0.5)))
    assert(hand2 == Set(("img", 4L, 2L, 1L, 1L, 0.25)))
  }

  test("an unpersisted singleton that gains its first twin in a LATER " +
    "batch is persisted alongside the twin (MaintCore fix, all tiers); " +
    "crash replay re-derives the same rows") {
    import spark.implicits._
    val thr = 0.3
    val sp = java.nio.file.Files
      .createTempDirectory("graft_latesing").toString
    // the corpus holds only an unrelated doc — everything is a
    // singleton until the twin arrives
    ClusterMaint.init(Seq((1L, "x y z w q r"))
      .toDF("doc_id", "text"), sp, threshold = thr)
    val r0 = ClusterMaint.applyBatch(Seq((10L, "a b c d e f"))
      .toDF("doc_id", "text"), 0L, sp, threshold = thr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(r0.toSeq == Seq((10L, 10L, true)))
    assert(ClusterMaint.assignments(spark, sp).count() == 0,
      "pure singletons must not persist")
    val r1 = ClusterMaint.applyBatch(Seq((11L, "a b c d e g"))
      .toDF("doc_id", "text"), 1L, sp, threshold = thr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(r1.toSeq == Seq((11L, 10L, false)))
    // BOTH members persist — before the r15 MaintCore fix, only the
    // twin did, so "members of cluster 10" lost the canonical itself
    def amap = ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(amap == Map(10L -> 10L, 11L -> 10L), s"assignments: $amap")
    // crash replay of batch 1: the prior-state read excludes the
    // replayed batch's own partition, so the rows re-derive identically
    ClusterMaint.applyBatch(Seq((11L, "a b c d e g"))
      .toDF("doc_id", "text"), 1L, sp, threshold = thr)
    assert(amap == Map(10L -> 10L, 11L -> 10L), s"post-replay: $amap")
  }

  test("crash replay of the batch that first persisted an old singleton " +
    "re-derives identically — SMALLER-id twin (the r15 review case: " +
    "without the pre-batch assign read the replay self-edges and drops " +
    "the singleton's row)") {
    import spark.implicits._
    val thr = 0.3
    val sp = java.nio.file.Files
      .createTempDirectory("graft_smalltwin").toString
    ClusterMaint.init(Seq((1L, "x y z w q r"))
      .toDF("doc_id", "text"), sp, threshold = thr)
    ClusterMaint.applyBatch(Seq((10L, "a b c d e f"))
      .toDF("doc_id", "text"), 0L, sp, threshold = thr)
    def run(): Seq[(Long, Long, Boolean)] =
      ClusterMaint.applyBatch(Seq((5L, "a b c d e g"))
        .toDF("doc_id", "text"), 1L, sp, threshold = thr).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    def amap = ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // first run: the twin's id is SMALLER than the singleton's, so the
    // component label is the twin itself — but the content is not new
    val r1 = run()
    assert(r1 == Seq((5L, 5L, false)), s"first run: $r1")
    assert(amap == Map(5L -> 5L, 10L -> 5L), s"first run assign: $amap")
    // crash replay: must re-derive the SAME rows and the SAME result —
    // pre-fix, the replay read its own crashed partition, routed the
    // singleton to the new label, degenerated the edge to a self-edge,
    // dropped (10 -> 5) and flipped is_new_cluster to true
    val r2 = run()
    assert(r2 == Seq((5L, 5L, false)), s"replay run: $r2")
    assert(amap == Map(5L -> 5L, 10L -> 5L), s"replay assign: $amap")
  }

  test("requantize relabel continuity: a repair that hands an " +
    "established cluster a smaller NEVER-clustered id routes the old " +
    "id through the merge map (r15 review case)") {
    import spark.implicits._
    val thr = 0.4
    def axis(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](6); v(i) = s; v
    }
    def drift(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](6); v(4) = s; v(i) = 0.15f * s; v
    }
    val sp = java.nio.file.Files
      .createTempDirectory("graft_relabel").toString
    // bootstrap: two orthogonal singleton axes → frozen cells {a2, a3}
    SemanticMaint.init(Seq((20L, axis(2, 1f)), (21L, axis(3, 1f)))
      .toDF("vec_id", "embedding"), sp, threshold = thr,
      nassign = 1, nlist = 2)
    // {5,7} form an established cluster labeled 5 (same drift lean →
    // same frozen cell); vec 1's pair with them (cos ≈ 0.978) is
    // MISSED — its lean parks it in the other cell
    SemanticMaint.applyBatch(Seq((5L, drift(2, 1f)))
      .toDF("vec_id", "embedding"), 0L, sp, thr, 1)
    SemanticMaint.applyBatch(Seq((7L, drift(2, 2f)))
      .toDF("vec_id", "embedding"), 1L, sp, thr, 1)
    SemanticMaint.applyBatch(Seq((1L, drift(3, 1f)))
      .toDF("vec_id", "embedding"), 2L, sp, thr, 1)
    def amap = SemanticMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(amap == Map(5L -> 5L, 7L -> 5L), s"pre-requantize: $amap")
    val pre = SemanticMaint.recallAudit(spark, sp, thr).collect().head
    assert(pre.getAs[Long]("truth_pairs") == 3L &&
      pre.getAs[Long]("found_pairs") == 1L, s"pre audit: $pre")
    SemanticMaint.requantize(spark, sp, thr, nassign = 1, nlist = 3)
    // the repaired component's min id is 1 — a vector that was never a
    // cluster id — so cluster 5 RELABELS, and the old id must route
    assert(amap == Map(1L -> 1L, 5L -> 1L, 7L -> 1L),
      s"post-requantize: $amap")
    val merges = MaintCore.readMerges(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merges.contains((5L, 1L)),
      s"old cluster id 5 must route through the merge map: $merges")
    assert(SemanticMaint.recallAudit(spark, sp, thr).collect()
      .head.getAs[Double]("recall") == 1.0)
    // future arrival joins the relabeled cluster through the new cells
    val r3 = SemanticMaint.applyBatch(Seq((2L, drift(3, 2f)))
      .toDF("vec_id", "embedding"), 3L, sp, thr, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(r3 == Seq((2L, 1L, false)), s"post-requantize arrival: $r3")
  }

  test("unified cross-tier ingest: a text twin, a semantic twin, a media " +
    "re-encode, and an undecodable payload each alone sink the row; " +
    "modality-free rows pass vacuously; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    def axis(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](6); v(i) = s; v
    }
    def png(seed: String): Array[Byte] =
      Multimodal.synthesizePng(seed.getBytes, 16, 12)
    val tp = java.nio.file.Files.createTempDirectory("graft_uni_t").toString
    val sp = java.nio.file.Files.createTempDirectory("graft_uni_s").toString
    val mp = java.nio.file.Files.createTempDirectory("graft_uni_m").toString
    val rp = java.nio.file.Files.createTempDirectory("graft_uni_r").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_uni_c").toString
    // per-tier bootstrap, each over its own historical corpus
    ClusterMaint.init(Seq((900L, "x y z w q r"))
      .toDF("doc_id", "text"), tp)
    SemanticMaint.init(Seq((901L, axis(5, 1f)))
      .toDF("vec_id", "embedding"), sp, nassign = 16, nlist = 16)
    MediaMaint.init(Seq((902L, png("corpus-img")))
      .toDF("media_id", "content"), mp)
    val ms = MemoryStream[(Long, String, Array[Float], Array[Byte])]
    val q = UnifiedIngest.start(
      ms.toDF().toDF("id", "text", "embedding", "content"),
      tp, sp, mp, rp, ck, nassign = 16)
    // batch 0: novel in every modality → admitted
    ms.addData(Seq((10L, "a b c d e f", axis(0, 1f), png("mediaA"))))
    q.processAllAvailable()
    // batch 1: one row per kill-path + two admits
    val batch1 = Seq(
      (20L, "a b c d e g", axis(1, 1f), png("mediaB")), // text twin of 10
      (21L, "p q r s t u", axis(0, 2f), png("mediaC")), // semantic twin
      (22L, "h i j k l m", axis(2, 1f), png("mediaA")), // media re-encode
      (23L, "n o p2 q2 r2 s2", axis(3, 1f), png("mediaE")), // clean
      (24L, "t1 u1 v1 w1 x1 y1", null, null), // text-only → vacuous tiers
      (25L, "z1 z2 z3 z4 z5 z6", axis(4, 1f),
        "junk bytes".getBytes)) // undecodable media → dead-letter
    ms.addData(batch1)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(rp).collect()
      .map(r => r.getAs[Number]("batch_id").longValue ->
        r.getAs[Long]("id"))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(got(0L) == Set(10L), s"batch 0 admitted ${got(0L)}")
    assert(got(1L) == Set(23L, 24L), s"batch 1 admitted ${got(1L)}")
    // crash replay of batch 1 re-derives the same admissions
    val replay = UnifiedIngest.applyBatch(
      batch1.toDF("id", "text", "embedding", "content"), 1L,
      tp, sp, mp, nassign = 16).collect().map(_.getAs[Long]("id")).toSet
    assert(replay == Set(23L, 24L), s"replay admitted $replay")
  }

  test("merge-map writes are crash-consistent: a seal left half-done " +
    "recovers on the next read instead of silently reading empty") {
    import spark.implicits._
    // the merge map is the ONE state family that is not re-derivable
    // from appends (r14 review finding): a plain in-place overwrite
    // crashing mid-write would lose every absorbed-rep routing. All
    // merge writes now go through the two-phase seal; this simulates
    // the worst crash window — live dir deleted, .sealed complete,
    // rename not yet done — and asserts the next read heals it.
    val thr = 0.3
    val sp = java.nio.file.Files.createTempDirectory("graft_mseal").toString
    val t1 = "a b c d e f"; val t5 = "p q r s t u"
    ClusterMaint.init(Seq((1L, t1), (2L, "a b c d e g"),
      (5L, t5), (6L, "p q r s t v")).toDF("doc_id", "text"), sp,
      threshold = thr)
    // bridge doc merges cluster 5 into cluster 1 → merge map nonempty
    ClusterMaint.applyBatch(Seq((14L, t1 + " " + t5))
      .toDF("doc_id", "text"), 0L, sp, threshold = thr)
    val before = ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(before(5L) == 1L && before(6L) == 1L,
      s"fixture must produce a merge: $before")
    // crash simulation: live merges/ gone, .sealed complete
    val fs = new org.apache.hadoop.fs.Path(sp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$sp/merges"),
      new org.apache.hadoop.fs.Path(s"$sp/merges.sealed")))
    val after = ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after == before,
      s"recovery lost the merge routing: $after vs $before")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$sp/merges")),
      "recover must have renamed the sealed copy back into place")
  }

  test("maintainer tiers survive empty and undecodable-only batches " +
    "without corrupting state") {
    import spark.implicits._
    // an idle webhook topic delivers empty micro-batches routinely, and
    // a poisoned feed can deliver a batch where NOTHING decodes — both
    // must advance cleanly and leave assignments untouched
    val t1 = "a b c d e f"
    val sp = java.nio.file.Files.createTempDirectory("graft_eb_t").toString
    ClusterMaint.init(Seq((1L, t1), (2L, "a b c d e g"))
      .toDF("doc_id", "text"), sp, threshold = 0.3)
    val before = ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r0 = ClusterMaint.applyBatch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 0L, sp,
      threshold = 0.3).collect()
    assert(r0.isEmpty)
    assert(ClusterMaint.assignments(spark, sp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == before)
    // semantic tier
    def axis(i: Int, s0: Float): Array[Float] = {
      val v = new Array[Float](6); v(i) = s0; v
    }
    val sp2 = java.nio.file.Files.createTempDirectory("graft_eb_s").toString
    SemanticMaint.init(Seq((1L, axis(0, 1f)), (2L, axis(0, 2f)))
      .toDF("vec_id", "embedding"), sp2, nassign = 16, nlist = 16)
    val sBefore = SemanticMaint.assignments(spark, sp2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = SemanticMaint.applyBatch(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), 0L,
      sp2, nassign = 16).collect()
    assert(r1.isEmpty)
    assert(SemanticMaint.assignments(spark, sp2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == sBefore)
    // media tier: an undecodable-ONLY batch hashes to zero rows — the
    // maintainer must treat it exactly like an empty batch
    import graft.operators.Multimodal
    val imgA = Multimodal.synthesizePng("eb-A".getBytes, 24, 16)
    val sp3 = java.nio.file.Files.createTempDirectory("graft_eb_m").toString
    MediaMaint.init(Seq((1L, imgA), (2L, Multimodal.resizeImage(imgA, 24, 16)))
      .toDF("media_id", "content"), sp3)
    val mBefore = MediaMaint.assignments(spark, sp3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mBefore.nonEmpty, "fixture must cluster at init")
    val r2 = MediaMaint.applyBatch(
      Seq((7L, "not media".getBytes), (8L, Array.empty[Byte]))
        .toDF("media_id", "content"), 0L, sp3).collect()
    assert(r2.isEmpty, "undecodable blobs must not cluster")
    assert(MediaMaint.assignments(spark, sp3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == mBefore)
  }

  test("streaming NEAR-dup ingest gates (text + semantic): a near-dup " +
    "is dropped whether its twin is in the corpus, a prior batch, or " +
    "the same batch; the canonical is admitted exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val thr = 0.3
    // ---- text tier: ClusterMaint.dedupStream
    val sp = java.nio.file.Files.createTempDirectory("graft_ndg").toString
    val rp = java.nio.file.Files.createTempDirectory("graft_ndg_r").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_ndg_c").toString
    val t1 = "a b c d e f"
    ClusterMaint.init(Seq((1L, t1), (9L, "x y z w h k"))
      .toDF("doc_id", "text"), sp, threshold = thr)
    val ms = MemoryStream[(Long, String)]
    val q = ClusterMaint.dedupStream(ms.toDF().toDF("doc_id", "text"),
      sp, rp, ck, threshold = thr)
    // 11 = near-dup of CORPUS doc 1 → dropped; 12 = novel → admitted
    ms.addData(Seq((11L, "a b c d e g"), (12L, "m n o p q r")))
    q.processAllAvailable()
    // 13 = near-dup of PRIOR-BATCH admission 12 → dropped; same-batch
    // twins 15/16 (novel family) → only the min id admits
    ms.addData(Seq((13L, "m n o p q r2"), (15L, "s t u v w x1"),
      (16L, "s t u v w x2")))
    q.processAllAvailable()
    // NON-MONOTONIC ids (r14 review finding): doc 5 is a near-dup of
    // admitted doc 12 with a SMALLER id — the component min shifts to
    // 5, so a bare canonical check would re-admit it; is_new_cluster
    // must veto (the twin is already in the output)
    ms.addData(Seq((5L, "m n o p q r3")))
    q.processAllAvailable()
    q.stop()
    val gotT = spark.read.parquet(rp).select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(gotT == Set(12L, 15L), s"text near-dup gate admitted $gotT")
    // ---- semantic tier: SemanticMaint.dedupStream (same composition)
    def axis(i: Int, s0: Float): Array[Float] = {
      val v = new Array[Float](6); v(i) = s0; v
    }
    val sp2 = java.nio.file.Files.createTempDirectory("graft_sdg").toString
    val rp2 = java.nio.file.Files.createTempDirectory("graft_sdg_r").toString
    val ck2 = java.nio.file.Files.createTempDirectory("graft_sdg_c").toString
    SemanticMaint.init(Seq((1L, axis(0, 1f)), (9L, axis(2, 1f)))
      .toDF("vec_id", "embedding"), sp2, threshold = 0.4,
      nassign = 16, nlist = 16)
    val ms2 = MemoryStream[(Long, Array[Float])]
    val q2 = SemanticMaint.dedupStream(
      ms2.toDF().toDF("vec_id", "embedding"), sp2, rp2, ck2,
      threshold = 0.4, nassign = 16)
    ms2.addData(Seq((11L, axis(0, 2f)), (12L, axis(3, 1f))))
    q2.processAllAvailable()
    ms2.addData(Seq((13L, axis(3, 4f)), (15L, axis(4, 1f)),
      (16L, axis(4, 2f))))
    q2.processAllAvailable()
    // the non-monotonic case, one tier over
    ms2.addData(Seq((5L, axis(3, 3f))))
    q2.processAllAvailable()
    q2.stop()
    val gotS = spark.read.parquet(rp2).select($"vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(gotS == Set(12L, 15L), s"semantic near-dup gate admitted $gotS")
  }

  test("idle users' alarm state is evicted by the event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamOps.errorAlarms(ms.toDS())
      .writeStream.format("memory").queryName("t_evict")
      .outputMode("append").start()
    // user 1 builds a partial run (2 of 3 errors), armed to time out at
    // 10:01 + 2h = 12:01 event time
    ms.addData(Seq(
      ev(1, "2024-01-01 10:00:00", 1, "error", 0.0),
      ev(2, "2024-01-01 10:01:00", 1, "error", 0.0)))
    q.processAllAvailable()
    // advance the watermark far past 12:01 (sentinel user, next day);
    // watermark updates between batches, so a second tick lets the
    // timeout actually fire and remove user 1's counter
    ms.addData(Seq(ev(90, "2024-01-02 00:00:00", 42, "click", 0.0)))
    q.processAllAvailable()
    ms.addData(Seq(ev(91, "2024-01-02 00:05:00", 42, "click", 0.0)))
    q.processAllAvailable()
    // user 1 returns with a third error: with state evicted this is run 1
    // of a fresh window — no alarm may fire
    ms.addData(Seq(ev(3, "2024-01-02 01:00:00", 1, "error", 0.0)))
    q.processAllAvailable()
    val alarms = spark.sql("select user_id from t_evict").collect()
    q.stop()
    assert(alarms.isEmpty,
      s"stale run survived eviction and alarmed: ${alarms.toSeq}")
  }

  test("silence detector alerts once per proven quiet period and " +
    "re-arms when the user returns") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.silenceAlerts(ms.toDS())
        .writeStream.format("memory").queryName("t_silence")
        .outputMode("append").start()
      // user 1 sends two events then goes quiet; user 2 keeps heartbeating
      ms.addData(Seq(
        ev(1, "2024-01-01 10:00:00", 1, "click", 0.0),
        ev(2, "2024-01-01 10:20:00", 1, "click", 0.0),
        ev(3, "2024-01-01 10:20:00", 2, "click", 0.0)))
      q.processAllAvailable()
      // user 2's heartbeats push the watermark past 10:20 + 1h while
      // keeping user 2's own timer ahead of it
      ms.addData(Seq(ev(4, "2024-01-01 11:10:00", 2, "click", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(5, "2024-01-01 11:45:00", 2, "click", 0.0)))
      q.processAllAvailable()
      val first = spark.sql(
        "select user_id, last_ts from t_silence").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString.substring(0, 19)))
      assert(first.toSeq == Seq((1L, "2024-01-01 10:20:00")),
        s"expected exactly user 1's silence: ${first.toSeq}")
      // user 1 returns, then goes quiet again → a SECOND alert must fire
      // off the new last-seen time
      ms.addData(Seq(ev(6, "2024-01-01 11:50:00", 1, "click", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(7, "2024-01-01 13:10:00", 2, "click", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(8, "2024-01-01 13:20:00", 2, "click", 0.0)))
      q.processAllAvailable()
      val all = spark.sql(
        "select user_id, last_ts from t_silence").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString.substring(0, 19)))
      q.stop()
      assert(all.toSet == Set(
        (1L, "2024-01-01 10:20:00"), (1L, "2024-01-01 11:50:00")),
        s"got ${all.toSeq}")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming funnel finalizes out-of-order stages in event-time " +
    "order and matches batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.funnelStages(ms.toDS())
        .writeStream.format("memory").queryName("t_funnel")
        .outputMode("append").start()
      // user 1: clean ordered funnel (later duplicate view ignored)
      // user 2: click BEFORE the first view must not qualify
      // user 3: purchase before any click must not qualify; no conversion
      // user 4: stages arrive out of order ACROSS batches — the view
      //         comes in batch 2 with an EARLIER ts than user 4's click
      //         from batch 1; an eager fold would have rejected the click
      ms.addData(Seq(
        ev(1, "2024-01-01 10:00:00", 1, "view", 0.0),
        ev(2, "2024-01-01 10:10:00", 1, "click", 0.0),
        ev(3, "2024-01-01 10:20:00", 1, "purchase", 5.0),
        ev(4, "2024-01-01 10:30:00", 1, "view", 0.0),
        ev(5, "2024-01-01 10:00:00", 2, "click", 0.0),
        ev(6, "2024-01-01 10:05:00", 2, "view", 0.0),
        ev(7, "2024-01-01 10:15:00", 2, "click", 0.0),
        ev(8, "2024-01-01 10:20:00", 2, "purchase", 7.0),
        ev(9, "2024-01-01 10:00:00", 3, "purchase", 1.0),
        ev(10, "2024-01-01 10:05:00", 3, "view", 0.0),
        ev(11, "2024-01-01 10:30:00", 3, "click", 0.0),
        ev(12, "2024-01-01 10:10:00", 4, "click", 0.0),
        ev(13, "2024-01-01 10:15:00", 4, "purchase", 9.0)))
      q.processAllAvailable()
      // nothing may finalize yet: the watermark (max ts − 2 h) is still
      // behind every buffered event
      assert(spark.sql("select * from t_funnel").collect().isEmpty,
        "funnel emitted before the watermark finalized the order")
      // user 4's view arrives late but within the watermark, with a ts
      // BEFORE the click that is already buffered
      ms.addData(Seq(ev(14, "2024-01-01 10:05:00", 4, "view", 0.0)))
      q.processAllAvailable()
      // sentinel (non-funnel type) pushes the watermark past everything
      ms.addData(Seq(ev(99, "2024-01-02 00:00:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      val got = spark.sql("select user_id, stage, ts from t_funnel")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getTimestamp(2).toString.substring(0, 19)))
      q.stop()
      val expected = Set(
        (1L, 1, "2024-01-01 10:00:00"), (1L, 2, "2024-01-01 10:10:00"),
        (1L, 3, "2024-01-01 10:20:00"),
        (2L, 1, "2024-01-01 10:05:00"), (2L, 2, "2024-01-01 10:15:00"),
        (2L, 3, "2024-01-01 10:20:00"),
        (3L, 1, "2024-01-01 10:05:00"), (3L, 2, "2024-01-01 10:30:00"),
        (4L, 1, "2024-01-01 10:05:00"), (4L, 2, "2024-01-01 10:10:00"),
        (4L, 3, "2024-01-01 10:15:00"))
      assert(got.toSet == expected, s"got ${got.sorted.toSeq}")
      // append-mode finality: each (user, stage) exactly once
      assert(got.length == expected.size,
        s"duplicate stage emissions: ${got.sorted.toSeq}")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("query metrics listener captures per-batch progress incl. state " +
    "size and watermark lag, and drains to parquet") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val metrics = QueryMetrics.attach(spark)
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.tumbling(ms.toDF())
        .writeStream.format("memory").queryName("t_metrics")
        .outputMode("update").start()
      ms.addData(Seq(ev(1, "2024-01-01 10:00:00", 1, "view", 1.0),
        ev(2, "2024-01-01 10:30:00", 2, "click", 2.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(3, "2024-01-01 11:10:00", 1, "view", 3.0)))
      q.processAllAvailable()
      q.stop()
      // listener events deliver async off the streaming bus
      spark.streams.listListeners // no-op; real wait below
      var tries = 0
      def rows() = metrics.snapshot(spark)
        .filter($"query_name" === "t_metrics" && $"input_rows" > 0)
        .collect()
      while (rows().length < 2 && tries < 50) { Thread.sleep(100); tries += 1 }
      val got = rows()
      assert(got.length >= 2, s"expected >=2 data batches, got ${got.length}")
      got.foreach { r =>
        assert(r.getAs[Long]("batch_duration_ms") >= 0L)
        assert(r.getAs[Double]("processed_rows_per_sec") >= 0.0)
        // the tumbling agg is stateful: window state rows must register
      }
      assert(got.map(_.getAs[Long]("state_rows")).max >= 2L,
        "state-store rows never surfaced")
      // second data batch runs under the first batch's watermark →
      // a real (non-sentinel) lag value
      assert(got.map(_.getAs[Long]("watermark_lag_ms")).max > 0L,
        "watermark lag never surfaced")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_metrics").toString
      val drained = metrics.drainTo(spark, s"$dir/metrics")
      assert(drained >= got.length)
      val back = spark.read.parquet(s"$dir/metrics")
      assert(back.count() == drained)
      assert(back.columns.toSet == Set("query_name", "query_id", "batch_id",
        "ts", "input_rows", "input_rows_per_sec", "processed_rows_per_sec",
        "batch_duration_ms", "state_rows", "state_bytes",
        "watermark_lag_ms"))
      // drain empties the buffer
      assert(metrics.snapshot(spark).isEmpty)
    } finally QueryMetrics.detach(spark, metrics)
  }

  test("streaming anomaly detection equals the batch twin row-for-row " +
    "on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // time-ordered replay in 4 micro-batches: the watermark trails by
      // the lateness so no fixture event drops, and hours finalize in
      // waves as it advances (multi-hour drains exercised)
      val events = graft.Tables(spark, sfTest, "events").as[Event]
        .collect().sortBy(_.ts.getTime)
      val ms = MemoryStream[Event]
      val q = StreamOps.anomalyAlerts(ms.toDS())
        .writeStream.format("memory").queryName("t_anom")
        .outputMode("append").start()
      events.grouped(math.max(events.length / 4, 1)).foreach { chunk =>
        ms.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      // far-future sentinel pushes the watermark past every fixture hour
      val last = events.last.ts.getTime
      ms.addData(Seq(Event(0L, new java.sql.Timestamp(last + 6L * 3600000L),
        0L, "zz_flush", 0.0, "{}")))
      q.processAllAvailable()
      q.stop()
      val streamed = spark.sql(
        """select date_format(hour, 'yyyy-MM-dd HH:mm:ss') as hour,
          | event_type, c, n_hist, anomaly from t_anom
          |where event_type <> 'zz_flush'""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .toMap
      val batch = graft.operators.Events.anomalyHours(spark, sfTest)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getBoolean(5)))
        .toMap
      assert(batch.nonEmpty, "batch twin produced nothing")
      assert(streamed == batch,
        s"stream/batch divergence: stream-only=${(streamed.keySet -- batch.keySet).take(3)} " +
          s"batch-only=${(batch.keySet -- streamed.keySet).take(3)}")
      // the fixture must exercise the alarm itself, not just quiet hours
      assert(streamed.values.exists(_._3), "no anomaly fired in replay")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming anomaly resumes from its checkpoint: ring history and " +
    "open hours survive a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft_ackpt").toString
    val outDir =
      java.nio.file.Files.createTempDirectory("graft_aout").toString
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def at(hour: Int, min: Int) =
        new java.sql.Timestamp(t0 + hour * 3600000L + min * 60000L)
      var id = 0L
      def mk(hour: Int, min: Int, typ: String = "err") = {
        id += 1; Event(id, at(hour, min), 1L, typ, 1.0, "{}")
      }
      val ms = MemoryStream[Event]
      def start() = StreamOps.anomalyAlerts(ms.toDS())
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append").start()

      // phase 1: a flat baseline of 2 events/hour for hours 0..19. The
      // 2h lateness leaves hours 17..19 OPEN and the ring holding hours
      // 0..16 at the stop — exactly the state a crash must not lose.
      val q1 = start()
      ms.addData((0 to 19).flatMap(h => Seq(mk(h, 0), mk(h, 30))))
      q1.processAllAvailable()
      q1.stop()

      // restart: continue the baseline through hour 25, then a 25×
      // spike in hour 26, then a sentinel to finalize everything
      val q2 = start()
      ms.addData((20 to 25).flatMap(h => Seq(mk(h, 0), mk(h, 30))) ++
        (0 until 50).map(m => mk(26, m)))
      ms.addData(Seq(mk(32, 0, "zz")))
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(outDir)
        .filter($"event_type" === "err")
        .collect()
        .map(r => ((r.getTimestamp(1).getTime - t0) / 3600000L).toInt ->
          (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      // one row per post-warm-up hour 12..26, exactly once across the
      // restart (hours 0..11 enter the ring but are warm-up-suppressed,
      // same as the batch twin's n >= 12 gate — the suppression must
      // also survive the restart: a lost ring would re-warm and swallow
      // hours 12..16 too)
      assert(got.map(_._1).sorted.toSeq == (12 to 26),
        s"hours emitted: ${got.map(_._1).sorted.toSeq}")
      val byHour = got.toMap
      (12 to 25).foreach { h =>
        assert(byHour(h) == ((2L, math.min(h, 24).toLong, false)),
          s"hour $h: ${byHour(h)}")
      }
      // the spike judges against the RESTORED flat history: 24 hours of
      // count 2, zero variance → any positive deviation flags
      assert(byHour(26) == ((50L, 24L, true)), s"spike: ${byHour(26)}")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("windowed HLL uniques resume from their checkpoint: sketch state " +
    "merges across a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfTest, "events").as[Event].collect()
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft_uckpt").toString
    val ms = MemoryStream[Event]
    def start() = StreamOps.tumblingUniques(ms.toDF())
      .writeStream.format("memory").queryName("t_uniq_rs")
      .option("checkpointLocation", checkpoint)
      .outputMode("complete").start()
    // half the corpus, stop, restart, the other half: every window that
    // spans the boundary must merge its restored HLL buffer with the
    // post-restart arrivals — lost state would undercount exactly there
    val (first, second) = events.splitAt(events.length / 2)
    val q1 = start()
    ms.addData(first.toIndexedSeq)
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    ms.addData(second.toIndexedSeq)
    q2.processAllAvailable()
    val streamed = spark.sql(
      "select window.start as hour, event_type, n_users_approx from t_uniq_rs")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2))
      .toMap
    q2.stop()
    val batch = Tables(spark, sfTest, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(approx_count_distinct($"user_id", 0.01).as("n_users_approx"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(batch.nonEmpty)
    assert(streamed == batch,
      "restart diverged from the batch twin: HLL state did not survive")
  }

  test("windowed percentile sketches resume from their checkpoint across " +
    "a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sfTest, "events").as[Event].collect()
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft_pckpt").toString
    val ms = MemoryStream[Event]
    def start() = StreamOps.tumblingPercentiles(ms.toDF())
      .writeStream.format("memory").queryName("t_pct_rs")
      .option("checkpointLocation", checkpoint)
      .outputMode("complete").start()
    val (first, second) = events.splitAt(events.length / 3)
    val q1 = start()
    ms.addData(first.toIndexedSeq)
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    ms.addData(second.toIndexedSeq)
    q2.processAllAvailable()
    val streamed = spark.sql(
      "select window.start as hour, event_type, n, p50, p95 from t_pct_rs")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    q2.stop()
    val batch = Tables(spark, sfTest, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(value, 0.5, 10000)").as("p50"),
        expr("approx_percentile(value, 0.95, 10000)").as("p95"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(batch.nonEmpty)
    assert(streamed.keySet == batch.keySet,
      "restart lost or invented windows")
    // counts are exact even across the restart (a reset KLL buffer would
    // also reset its count); estimates stay in the sketch envelope
    streamed.foreach { case (k, (n, p50, p95)) =>
      val (bn, bp50, bp95) = batch(k)
      assert(n == bn, s"$k count diverged after restart: $n vs $bn")
      assert(p50 <= p95)
      assert(math.abs(p50 - bp50) <= math.max(1.0, bp50.abs * 0.2),
        s"$k p50 diverged: stream $p50 vs batch $bp50")
      assert(math.abs(p95 - bp95) <= math.max(1.0, bp95.abs * 0.2),
        s"$k p95 diverged: stream $p95 vs batch $bp95")
    }
  }

  test("streaming top-k sketch resumes from its checkpoint: MapState " +
    "counters survive a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft_tkckpt").toString
    try {
      val buckets = 8
      val tokens = Tables(spark, sfTest, "documents")
        .select(explode(split(lower($"text"), " ")).as("w"))
        .as[String].collect()
      val (b1, b2) = tokens.splitAt(tokens.length / 2)
      // one occurrence of every distinct token, fed AFTER the restart:
      // update mode re-emits every touched counter, so the post-restart
      // snapshot covers the whole vocabulary — a counter that lost its
      // pre-restart history cannot hide behind a stale earlier emission
      val tick = tokens.distinct
      val snapshot =
        scala.collection.concurrent.TrieMap[(Int, String), Long]()
      val ms = MemoryStream[String]
      def start() = StreamOps.streamTopK(ms.toDS(), m = 1024,
          buckets = buckets)
        .toDF().writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => snapshot2Put(snapshot, r))
        }.start()
      val q1 = start()
      ms.addData(b1.toIndexedSeq)
      q1.processAllAvailable()
      q1.stop()
      snapshot.clear() // only post-restart emissions count
      val q2 = start()
      ms.addData(b2.toIndexedSeq)
      q2.processAllAvailable()
      ms.addData(tick.toIndexedSeq)
      q2.processAllAvailable()
      q2.stop()
      val exact = (tokens ++ tick).groupBy(identity).view
        .mapValues(_.length.toLong).toMap
      val got = snapshot.map { case ((_, t), c) => t -> c }.toMap
      // vocab ≪ m → Misra-Gries is exact; equality only holds if the
      // b1 counters were restored from the checkpoint
      assert(got == exact,
        s"restart lost sketch state: missing=${exact.keySet -- got.keySet} " +
          s"diff=${got.collect {
            case (t, c) if exact.get(t).exists(_ != c) => (t, c, exact(t))
          }.take(5)}")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("completed funnel user who stays active is not retired: retirement " +
    "is idle-based, not completion-based") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.funnelStages(ms.toDS(), lateness = "10 minutes",
          idleRetention = "30 minutes")
        .writeStream.format("memory").queryName("t_funnel_active")
        .outputMode("append").start()
      // user 7 completes the funnel at 10:00–10:02
      ms.addData(Seq(ev(1, "2024-01-01 10:00:00", 7, "view", 0.0),
        ev(2, "2024-01-01 10:01:00", 7, "click", 0.0),
        ev(3, "2024-01-01 10:02:00", 7, "purchase", 0.0)))
      q.processAllAvailable()
      // watermark to 10:10 → all three stages finalize; the cleanup
      // timer sits at completion lastMs 10:02 + 30 min = 10:32
      ms.addData(Seq(ev(4, "2024-01-01 10:20:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      // user 7 keeps browsing at 10:25 — the retirement clock must
      // slide to 10:55 even though the chain is complete
      ms.addData(Seq(ev(5, "2024-01-01 10:25:00", 7, "ping", 0.0)))
      q.processAllAvailable()
      // watermark to 10:50: past the ORIGINAL 10:32 horizon but inside
      // the slid one — user 7 must still hold state…
      ms.addData(Seq(ev(6, "2024-01-01 11:00:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      // …so this view hits the completed chain and emits NOTHING (a
      // wrongly-retired user would re-open a cycle and re-emit stage 1)
      ms.addData(Seq(ev(7, "2024-01-01 11:05:00", 7, "view", 0.0)))
      q.processAllAvailable()
      // genuine idleness: watermark to 12:00 > 11:05 + 30 min → retire
      ms.addData(Seq(ev(8, "2024-01-01 12:10:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      // a RETIRED user starts a fresh cycle → exactly one new stage-1
      ms.addData(Seq(ev(9, "2024-01-01 12:20:00", 7, "view", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(10, "2024-01-01 12:40:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      val got = spark.sql("select user_id, stage, ts from t_funnel_active")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getTimestamp(2).toString.substring(0, 19)))
      q.stop()
      assert(got.toSet == Set(
        (7L, 1, "2024-01-01 10:00:00"), (7L, 2, "2024-01-01 10:01:00"),
        (7L, 3, "2024-01-01 10:02:00"), (7L, 1, "2024-01-01 12:20:00")),
        s"got ${got.sorted.toSeq}")
      assert(got.length == 4, s"duplicate emissions: ${got.sorted.toSeq}")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("funnel state retires after idle-retention; a returning user " +
    "starts a fresh cycle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      // short horizons so the cleanup timer fires inside the test: a user
      // idle (event-time) past 30 min loses ALL funnel state — without
      // this, every bounced visitor ever seen lives in state forever
      val q = StreamOps.funnelStages(ms.toDS(), lateness = "10 minutes",
          idleRetention = "30 minutes")
        .writeStream.format("memory").queryName("t_funnel_ttl")
        .outputMode("append").start()
      ms.addData(Seq(ev(1, "2024-01-01 10:00:00", 7, "view", 0.0)))
      q.processAllAvailable()
      // watermark to 10:21 → the view finalizes (stage 1 emitted);
      // cleanup timer armed at lastSeen + 30 min = 10:30
      ms.addData(Seq(ev(2, "2024-01-01 10:31:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      // watermark to 11:20 → the 10:30 cleanup fires → user 7 retired
      ms.addData(Seq(ev(3, "2024-01-01 11:30:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      // user 7 returns: a RETIRED user re-opens the funnel (fresh cycle
      // → a second stage-1 row); an un-retired chain would ignore the
      // duplicate view (pinned by the ordered-funnel spec)
      ms.addData(Seq(ev(4, "2024-01-01 11:40:00", 7, "view", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(5, "2024-01-01 12:30:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      val got = spark.sql("select user_id, stage, ts from t_funnel_ttl")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getTimestamp(2).toString.substring(0, 19)))
      q.stop()
      assert(got.toSet == Set(
        (7L, 1, "2024-01-01 10:00:00"), (7L, 1, "2024-01-01 11:40:00")),
        s"got ${got.sorted.toSeq}")
      assert(got.length == 2, s"duplicate emissions: ${got.sorted.toSeq}")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming transitions finalize per-user pairs in event-time " +
    "order, bridge across drains, and drop too-late events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.transitions(ms.toDS())
        .writeStream.format("memory").queryName("t_trans")
        .outputMode("append").start()
      ms.addData(Seq(
        ev(1, "2024-01-01 10:00:00", 1, "view", 0.0),
        ev(3, "2024-01-01 10:20:00", 1, "purchase", 0.0),
        ev(5, "2024-01-01 10:05:00", 2, "view", 0.0)))
      q.processAllAvailable()
      assert(spark.sql("select * from t_trans").collect().isEmpty,
        "pairs emitted before the watermark finalized the order")
      // the click lands BETWEEN two already-buffered events — an eager
      // pairing would have emitted view→purchase and double-counted
      ms.addData(Seq(ev(2, "2024-01-01 10:10:00", 1, "click", 0.0)))
      q.processAllAvailable()
      ms.addData(Seq(ev(99, "2024-01-02 00:00:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      def got() = spark.sql(
        "select user_id, from_type, to_type, at from t_trans").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getTimestamp(3).toString.substring(0, 19))).toSet
      val phase1 = Set(
        (1L, "view", "click", "2024-01-01 10:10:00"),
        (1L, "click", "purchase", "2024-01-01 10:20:00"))
      assert(got() == phase1, s"got ${got()}")
      // an event older than the watermark is dropped, not inserted
      ms.addData(Seq(ev(7, "2024-01-01 10:15:00", 1, "error", 0.0)))
      q.processAllAvailable()
      assert(got() == phase1, "a too-late event changed finalized pairs")
      // the cursor bridges drains: the next finalized event pairs with
      // the LAST finalized one, hours later
      ms.addData(Seq(ev(8, "2024-01-02 01:00:00", 1, "view", 0.0)))
      ms.addData(Seq(ev(98, "2024-01-03 00:00:00", 42, "ping", 0.0)))
      q.processAllAvailable()
      assert(got() == phase1 +
        ((1L, "purchase", "view", "2024-01-02 01:00:00")),
        s"got ${got()}")
      q.stop()
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming transitions resume from their checkpoint: buffered " +
    "events and the chain cursor survive a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val checkpoint =
      java.nio.file.Files.createTempDirectory("graft_tckpt").toString
    val outDir =
      java.nio.file.Files.createTempDirectory("graft_tout").toString
    try {
      val ms = MemoryStream[Event]
      def start() = StreamOps.transitions(ms.toDS())
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append").start()

      // phase 1: two events buffer, nothing finalizes — the exact state
      // a crash must not lose
      val q1 = start()
      ms.addData(Seq(
        ev(1, "2024-01-01 10:00:00", 1, "view", 0.0),
        ev(3, "2024-01-01 10:20:00", 1, "purchase", 0.0)))
      q1.processAllAvailable()
      q1.stop()

      // restart: a click lands BETWEEN the two buffered events — only
      // possible if the restored buffer still holds both — then flush
      val q2 = start()
      ms.addData(Seq(ev(2, "2024-01-01 10:10:00", 1, "click", 0.0)))
      ms.addData(Seq(ev(99, "2024-01-02 00:00:00", 42, "ping", 0.0)))
      q2.processAllAvailable()
      q2.stop()

      val got = spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getTimestamp(3).toString.substring(0, 19))).toSet
      assert(got == Set(
        (1L, "view", "click", "2024-01-01 10:10:00"),
        (1L, "click", "purchase", "2024-01-01 10:20:00")),
        s"got $got")
      assert(spark.read.parquet(outDir).count() == 2,
        "a pair was emitted more than once across the restart")
    } finally prevProvider match {
      case Some(p) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
