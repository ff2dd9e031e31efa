package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.Event

class LakeSinkSpec extends SparkSpec {

  private def mk(ids: Seq[Int], day: String) = {
    import spark.implicits._
    ids.map(i => (i.toLong, day, s"p$i")).toDF("id", "day", "payload")
  }

  test("batch replay converges instead of duplicating, and read hides " +
    "the batch scaffolding") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lake").toString
    val b0 = mk(1 to 3, "2024-03-01").unionByName(mk(4 to 5, "2024-03-02"))
    val b1 = mk(6 to 7, "2024-03-02").unionByName(mk(8 to 8, "2024-03-03"))
    LakeSink.applyBatch(b0, 0, dir, "day")
    LakeSink.applyBatch(b1, 1, dir, "day")
    // crash-replay of batch 1: same id, same rows — must overwrite its
    // own (day, batch) cells, not append next to them
    LakeSink.applyBatch(b1, 1, dir, "day")
    val got = LakeSink.read(spark, dir, "day")
    assert(!got.columns.contains("batch_id"), "batch scaffolding leaked")
    assert(got.select($"id").as[Long].collect().sorted.toSeq ==
      (1L to 8L).toSeq, "replay duplicated or lost rows")
    // a replayed batch with REVISED content converges to the revision
    LakeSink.applyBatch(mk(6 to 6, "2024-03-02"), 1, dir, "day")
    assert(LakeSink.read(spark, dir, "day")
      .filter($"day".cast("string") === "2024-03-02")
      .select($"id").as[Long].collect().sorted.toSeq == Seq(4L, 5L, 6L))
  }

  test("sealing compacts a closed day, survives the crash window, and " +
    "TTL applies to the sealed side") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lakeseal").toString
    LakeSink.applyBatch(mk(1 to 4, "2024-03-01"), 0, dir, "day")
    LakeSink.applyBatch(mk(5 to 8, "2024-03-01")
      .unionByName(mk(9 to 10, "2024-03-02")), 1, dir, "day")
    assert(LakeSink.openDays(spark, dir, "day") ==
      Seq("2024-03-01", "2024-03-02"))
    val before = LakeSink.read(spark, dir, "day")
      .select($"id").as[Long].collect().sorted.toSeq

    LakeSink.sealDays(spark, dir, "day", Seq("2024-03-01"),
      manifestCols = Seq("id", "day"))
    assert(!new java.io.File(s"$dir/open/day=2024-03-01").exists())
    val sealedFiles = new java.io.File(s"$dir/sealed/day=2024-03-01")
      .listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith("."))
    assert(sealedFiles.length == 1, "seal did not compact to one file")
    assert(LakeSink.read(spark, dir, "day")
      .select($"id").as[Long].collect().sorted.toSeq == before,
      "sealing changed the data")

    // crash window: sealed published but open not yet deleted — the day
    // exists on BOTH sides; read must not double-count, and the next
    // sealDays call completes the cleanup
    LakeSink.applyBatch(mk(101 to 102, "2024-03-01"), 7, dir, "day")
    assert(LakeSink.read(spark, dir, "day")
      .select($"id").as[Long].collect().sorted.toSeq == before,
      "a double-stored day was double-read")
    LakeSink.sealDays(spark, dir, "day", Seq("2024-03-01"),
      manifestCols = Seq("id", "day"))
    assert(!new java.io.File(s"$dir/open/day=2024-03-01").exists())
    assert(LakeSink.read(spark, dir, "day")
      .select($"id").as[Long].collect().sorted.toSeq == before)

    // the seal-maintained manifest serves skipping scans on sealed/
    val viaManifest = graft.sources.Manifest
      .scan(spark, s"$dir/sealed", Map("id" -> (1L, 4L)))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(viaManifest == Seq(1L, 2L, 3L, 4L))

    // TTL on the sealed side is the plain partition-drop verb
    Sinks.dropPartitions(spark, s"$dir/sealed", "day", Seq("2024-03-01"))
    assert(LakeSink.read(spark, dir, "day")
      .select($"id").as[Long].collect().sorted.toSeq == Seq(9L, 10L))
  }

  test("read caches the sealed-day listing per lake: repeat constructions " +
    "list once, a new seal invalidates, semantics unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lakecache").toString
    LakeSink.applyBatch(mk(1 to 4, "2024-03-01")
      .unionByName(mk(5 to 6, "2024-03-02"))
      .unionByName(mk(7 to 8, "2024-03-03")), 0, dir, "day")
    LakeSink.sealDays(spark, dir, "day", Seq("2024-03-01"))

    def ids() = LakeSink.read(spark, dir, "day")
      .select($"id").as[Long].collect().sorted.toSeq
    val l0 = LakeSink.sealedListings.get()
    assert(ids() == (1L to 8L).toSeq)
    val afterFirst = LakeSink.sealedListings.get()
    assert(afterFirst == l0 + 1, "first construction must list sealed/")
    // a hot caller (dashboard): many constructions + actions, ZERO
    // further sealed-root walks while no seal has landed
    for (_ <- 1 to 5) assert(ids() == (1L to 8L).toSeq)
    assert(LakeSink.sealedListings.get() == afterFirst,
      "unchanged sealed root was re-listed")

    // sealing a new day bumps the root mtime → exactly one re-list, and
    // the fresh exclusion set keeps the double-stored-day guarantee
    LakeSink.sealDays(spark, dir, "day", Seq("2024-03-02"))
    assert(ids() == (1L to 8L).toSeq, "cache served a stale day list")
    assert(LakeSink.sealedListings.get() == afterFirst + 1,
      "a changed sealed root must re-list exactly once")
    // stale-cache hazard probe: the crash window writes an open leftover
    // for a SEALED day; a stale exclusion list would double-read it
    LakeSink.applyBatch(mk(201 to 202, "2024-03-02"), 9, dir, "day")
    assert(ids() == (1L to 8L).toSeq,
      "a double-stored day was double-read through the cache")
  }

  test("streaming CDC apply: a changelog stream merges into the lake, " +
    "survives a restart, and a replayed batch converges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_cdc").toString
    // base archive
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("id", "part", "v").write.partitionBy("part")
      .parquet(s"$dir/t")
    val ms = MemoryStream[(Long, String, Long, String)]
    def feed() = LakeSink.streamApplyChanges(
      ms.toDF().toDF("id", "part", "v", "op"),
      s"$dir/t", s"$dir/ckpt", "part", Seq("id"), Some("op"))

    val q1 = feed()
    ms.addData((1L, "a", 111L, "upsert"), (2L, "a", 0L, "delete"))
    q1.processAllAvailable()
    q1.stop()
    def table() = spark.read.parquet(s"$dir/t").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("part"),
        r.getAs[Long]("v"))).toSet
    assert(table() == Set((1L, "a", 111L), (3L, "b", 30L)))

    // restart from the checkpoint, apply a second batch incl. a fresh
    // partition
    val q2 = feed()
    ms.addData((4L, "c", 40L, "upsert"), (3L, "b", 333L, "upsert"))
    q2.processAllAvailable()
    q2.stop()
    val settled = Set((1L, "a", 111L), (3L, "b", 333L), (4L, "c", 40L))
    assert(table() == settled)

    // at-least-once replay: re-applying the SAME batch's changes (what
    // a crash between merge and commit would cause) must converge
    Sinks.mergePartitions(spark, s"$dir/t", "part",
      Seq((4L, "c", 40L, "upsert"), (3L, "b", 333L, "upsert"))
        .toDF("id", "part", "v", "op"),
      Seq("id"), opCol = Some("op"))
    assert(table() == settled, "a replayed CDC batch changed the table")
  }

  test("tailing the sealed side delivers each day exactly when it seals, " +
    "never a partial or open day") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_tail").toString
    LakeSink.applyBatch(mk(1 to 4, "2024-06-01")
      .unionByName(mk(5 to 6, "2024-06-02")), 0, dir, "day")
    LakeSink.sealDays(spark, dir, "day", Seq("2024-06-01"))

    val q = LakeSink.tailSealed(spark, dir)
      .writeStream.format("memory").queryName("t_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def seen() = spark.sql("select id from t_tail")
        .as[Long].collect().sorted.toSeq
      // only the sealed day arrives; the open day 06-02 stays invisible
      assert(seen() == (1L to 4L).toSeq, s"got ${seen()}")

      // a second day seals while the tail runs: its rows arrive, once
      LakeSink.sealDays(spark, dir, "day", Seq("2024-06-02"))
      q.processAllAvailable()
      assert(seen() == (1L to 6L).toSeq, s"got ${seen()}")
      // partition column rides along
      assert(spark.sql("select distinct cast(day as string) from t_tail")
        .as[String].collect().sorted.toSeq ==
        Seq("2024-06-01", "2024-06-02"))
    } finally q.stop()
  }

  test("a streaming query feeds the lake end-to-end and a restart replay " +
    "does not duplicate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_lakestream").toString
    val ms = MemoryStream[Event]
    def feed() = LakeSink.start(
      ms.toDF().withColumn("day", date_format($"ts", "yyyy-MM-dd")),
      s"$dir/lake", s"$dir/ckpt", "day")
    val q = feed()
    ms.addData((1 to 6).map(i => Event(i,
      java.sql.Timestamp.valueOf(s"2024-01-0${1 + i % 2} 10:00:00"),
      i, "view", 1.0, "{}")))
    q.processAllAvailable()
    ms.addData((7 to 9).map(i => Event(i,
      java.sql.Timestamp.valueOf("2024-01-03 10:00:00"),
      i, "view", 1.0, "{}")))
    q.processAllAvailable()
    q.stop()
    // restart from the same checkpoint: nothing new to do, nothing dups
    val q2 = feed()
    q2.processAllAvailable()
    q2.stop()
    val got = LakeSink.read(spark, s"$dir/lake", "day")
    assert(got.select($"event_id").as[Long].collect().sorted.toSeq ==
      (1L to 9L).toSeq)
    assert(LakeSink.openDays(spark, s"$dir/lake", "day") ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03"))
  }
}
