package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc SQL entry point with graft's native functions loaded via the
  * SparkSessionExtensions path and the test tables registered as views:
  *   sbt "runMain graft.Sql 'SELECT cosine_sim(...) FROM embeddings ...'"
  * Optional env: SPARK_GRAFT_SF_DIR (default sf0.001).
  */
object Sql {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.udf.register("top_k",
      org.apache.spark.sql.functions.udaf(
        new graft.functions.TopKAggregator(5)))
    Tables.names.foreach { t =>
      Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }
    args.foreach { sql =>
      spark.sql(sql).show(50, truncate = false)
    }
    spark.stop()
  }
}
