package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * One parquet file per table under `sfDir`. Schemas are fixed and carried by
  * the parquet footers; no inference needed. At cluster scale these would be
  * directory-partitioned datasets — the loader is the single seam where
  * partition discovery / bucketing metadata would plug in.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read it as a long (legacy
    * conf) and truncate ns→µs with integer division — the same truncation
    * DuckDB's CAST(ts AS TIMESTAMP) applies, so oracle SQL stays aligned.
    */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // Re-written copies of the table (tests, downstream materializations)
    // already carry µs timestamps — only the driver's ns parquet needs the
    // long→timestamp conversion.
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
