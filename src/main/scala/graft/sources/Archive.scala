package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** JSON-lines archive of the webhook event stream (SURVEY §2.1 source
  * breadth): the batch replay path for payloads that already left the
  * queue. Schema is DECLARED, never inferred — at 100 TB an inference
  * pass is a full extra read, and a malformed line would silently widen a
  * column for the whole archive. Reading uses the same PERMISSIVE
  * corrupt-record convention as the live path (WebhookIngest), so a
  * damaged archive line surfaces as a row with `_corrupt` set instead of
  * failing the job or vanishing.
  */
object Archive {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Spark's default JSON timestamp format carries milliseconds only —
    * an archive written with it silently truncates the µs the live path
    * keeps. Pinned to full microsecond precision on both sides.
    */
  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeEvents(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TsFormat)
      .json(path)

  /** Archived events plus a `_corrupt` column (null on clean rows). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventSchema.add("_corrupt", StringType))
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", TsFormat)
      .json(path)

  /** CSV flavor of the archive (the export format partners actually
    * send): same DECLARED schema, same PERMISSIVE dead-letter convention.
    * A row with the wrong arity or an unparseable cell surfaces with
    * `_corrupt` carrying the raw line — `malformed` splits the frame into
    * (clean, dead-letter) halves the way `WebhookIngest` routes payloads.
    * Header off by default: a 100 TB archive is thousands of part files,
    * and header-per-file costs a skipped line and a schema trap each.
    */
  def writeEventsCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TsFormat)
      .csv(path)

  def readEventsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(eventSchema.add("_corrupt", StringType))
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", TsFormat)
      .csv(path)

  /** (clean rows without the `_corrupt` column, dead-lettered rows).
    *
    * The dead-letter half keeps the FULL row — the partially-parsed
    * typed columns plus `_corrupt` carrying the raw line — not just the
    * raw line. Partly because a triage job wants whatever cells did
    * parse; mostly because Spark disallows a query over a raw JSON/CSV
    * read whose only referenced column is the internal corrupt-record
    * column (it would throw AnalysisException at runtime unless the
    * caller cached first — a trap this helper must not set). Referencing
    * the data columns keeps the natural uncached
    * `readEventsCsv → malformed → write dead-letter` path legal; the
    * uncached-path spec pins it. Residual Spark restriction (documented,
    * not fixable here): an aggregate that prunes every data column away —
    * a bare `count()` on either half — still reduces the scan to
    * `_corrupt` alone and throws; cache the read first for that shape.
    */
  def malformed(read: DataFrame): (DataFrame, DataFrame) =
    (read.filter(read("_corrupt").isNull).drop("_corrupt"),
      read.filter(read("_corrupt").isNotNull))
}
