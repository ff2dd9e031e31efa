package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manual end-to-end drive of the webhook ingest path: starts the HTTP
  * listener + a streaming query over the DSv2 source, runs for
  * `args(1)` ms (default 20s), then prints what arrived. Drive it with:
  * {{{ curl -XPOST localhost:<port>/webhook/orders -d '{"event_id":1,...}' }}}
  */
object WebhookDemo {
  def main(args: Array[String]): Unit = {
    val port = if (args.nonEmpty) args(0).toInt else 8099
    val runMs = if (args.length > 1) args(1).toLong else 20000L
    val bound = WebhookQueue.startServer(port)
    println(s"WEBHOOK_LISTENING=$bound")
    val spark = graft.GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val q = spark.readStream
      .format("graft.sources.WebhookSourceProvider").load()
      .select(col("seq"), col("topic"),
        from_json(col("body"), payloadSchema).as("e"))
      .select("seq", "topic", "e.event_id", "e.event_type", "e.value")
      .writeStream.format("memory").queryName("webhook_demo")
      .outputMode("append").start()
    q.awaitTermination(runMs)
    val rows = spark.sql(
      "select * from webhook_demo order by seq").collect()
    println(s"WEBHOOK_ROWS=${rows.length}")
    rows.foreach(r => println(s"WEBHOOK_ROW=$r"))
    q.stop()
    WebhookQueue.stopServer()
    spark.stop()
  }
}
