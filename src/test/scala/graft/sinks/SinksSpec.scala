package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.streaming.Event

class SinksSpec extends SparkSpec {

  test("partitioned write produces a prunable hive layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_sink").toString
    val docs = Tables(spark, sfTest, "documents")
    Sinks.writePartitioned(docs, s"$dir/docs", "lang")
    val langs = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(langs.forall(_.startsWith("lang=")) && langs.length == 5)
    // read back through the partitioned layout; a lang predicate must
    // become a partition filter (no data read from other dirs)
    val back = spark.read.parquet(s"$dir/docs").filter($"lang" === "en")
    assert(back.count() ==
      docs.filter($"lang" === "en").count())
    val planStr = back.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [isnotnull(lang"),
      s"lang predicate did not reach partition pruning:\n$planStr")
  }

  test("streaming parquet sink appends exactly the arriving rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ssink").toString
    val ms = MemoryStream[Event]
    val q = Sinks.streamToParquet(
      ms.toDF(), s"$dir/out", s"$dir/ckpt")
    ms.addData((1 to 20).map(i => Event(i,
      java.sql.Timestamp.valueOf(f"2024-01-01 10:00:${i % 60}%02d"),
      i % 3, "click", i.toDouble, "{}")))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 20)
    assert(back.select(sum($"value")).head().getDouble(0) == 210.0)
  }

  test("foreachBatch sink sees every micro-batch with its id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_fsink").toString
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val ms = MemoryStream[Event]
    val q = Sinks.streamForeachBatch(ms.toDF(), s"$dir/ckpt") {
      (batch, id) => seen.put(id, batch.count())
    }
    ms.addData(Seq(Event(1, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      1, "click", 1.0, "{}")))
    q.processAllAvailable()
    ms.addData((2 to 4).map(i => Event(i,
      java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 1, "view",
      i.toDouble, "{}")))
    q.processAllAvailable()
    q.stop()
    var total = 0L
    seen.values().forEach(v => total += v)
    assert(total == 4, s"foreachBatch saw $seen")
  }
}
