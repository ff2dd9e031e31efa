package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: calls SparkEntry.entry and
  * prints the row count (driver checks rows > 0 on sf0.001).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"SMOKE_ROWS=${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
