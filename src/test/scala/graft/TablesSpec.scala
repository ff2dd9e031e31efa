package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The ingestion contract for `events.ts` (VERDICT r9 #1): the producer has
  * shipped the column as parquet TIMESTAMP(NANOS) (arriving as a long under
  * `nanosAsLong`), TIMESTAMP(MICROS, isAdjustedToUTC=false) (arriving as
  * TIMESTAMP_NTZ), and instant-adjusted TIMESTAMP. `Tables.events` is the one
  * seam that normalizes all three to a canonical `TimestampType` — this spec
  * writes the same rows in each encoding and asserts one schema and identical
  * query output, so the next producer-side re-encode breaks here first, not
  * in seven window queries at verify time.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // Same logical instants, expressed per-encoding. Microsecond values chosen
  // non-round so ns→µs truncation and NTZ casting are actually exercised.
  private val micros = Seq(1700000000123456L, 1700003600987654L, 1700007200000001L)

  private def writeEvents(df: DataFrame): String = {
    val dir = Files.createTempDirectory("tables-spec-").toString
    df.write.parquet(s"$dir/events.parquet")
    dir
  }

  private def canonical(dir: String): DataFrame = Tables(spark, dir, "events")

  private lazy val asLongNs = writeEvents(
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us * 1000L) }
      .toDF("user_id", "ts"))

  private lazy val asNtz = writeEvents(
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").cast(TimestampNTZType).as("ts")))

  private lazy val asTimestamp = writeEvents(
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("user_id", "us")
      .select($"user_id", timestamp_micros($"us").as("ts")))

  test("all three physical encodings arrive as one canonical TimestampType") {
    for (dir <- Seq(asLongNs, asNtz, asTimestamp))
      assert(canonical(dir).schema("ts").dataType == TimestampType)
  }

  test("NTZ parquet round-trips value-preserving under the pinned-UTC session") {
    // the regression class: unix_micros over the loaded column must analyze
    // AND produce the original microsecond values
    val got = canonical(asNtz)
      .select($"user_id", unix_micros($"ts").as("us"))
      .orderBy($"user_id").as[(Long, Long)].collect().map(_._2).toSeq
    assert(got == micros)
  }

  test("identical query output across all three encodings") {
    def run(dir: String): Seq[(Long, Long)] =
      canonical(dir)
        .select($"user_id", unix_micros($"ts").as("us"))
        .orderBy($"user_id").as[(Long, Long)].collect().toSeq
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    assert(run(asLongNs) == expected)
    assert(run(asNtz) == expected)
    assert(run(asTimestamp) == expected)
  }

  test("driver testdata loads with a TimestampType ts") {
    assert(canonical(sfTest).schema("ts").dataType == TimestampType)
  }

  test("archive JSON and CSV round-trips preserve microseconds from every " +
    "producer encoding") {
    // r10 optional item: the Archive sources sit downstream of the same
    // seam (events load via Tables, archives are written from the loaded
    // frame), but only the instant arrival was spec-fed through them.
    // Feed all THREE producer encodings through Tables → archive write →
    // archive read, both formats: canonical TimestampType, zero
    // dead-letters, and the exact original microseconds must survive.
    def fullRows(dir: String): DataFrame =
      canonical(dir).select(
        $"user_id".as("event_id"), $"ts", $"user_id",
        lit("click").as("event_type"), lit(1.5).as("value"),
        lit("{}").as("props"))
    for (src <- Seq(asLongNs, asNtz, asTimestamp)) {
      val df = fullRows(src)
      val dir = Files.createTempDirectory("tables-archive-").toString
      graft.sources.Archive.writeEvents(df, s"$dir/j")
      graft.sources.Archive.writeEventsCsv(df, s"$dir/c")
      val reads = Seq(
        "json" -> graft.sources.Archive.readEvents(spark, s"$dir/j"),
        "csv" -> graft.sources.Archive.readEventsCsv(spark, s"$dir/c"))
      for ((fmt, back) <- reads) {
        assert(back.schema("ts").dataType == TimestampType, s"$fmt schema")
        val cached = back.cache()
        assert(cached.filter($"_corrupt".isNotNull).count() == 0,
          s"$fmt round-trip dead-lettered clean rows")
        val got = cached.select($"user_id", unix_micros($"ts").as("us"))
          .orderBy($"user_id").as[(Long, Long)].collect().map(_._2).toSeq
        assert(got == micros, s"$fmt round-trip lost microseconds: $got")
        cached.unpersist()
      }
    }
  }
}
