package graft

import org.apache.spark.sql.SparkSession

/** Repeated-run timer for one query: prints per-iteration seconds.
  *   sbt "runMain graft.TimeQ q_topk_parts 5"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // mirror Bench's session exactly (incl. hot-table cache)
    val spark = GraftSession.builder(cpus)
      .config("spark.graft.cacheTables", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 5
    val fn = SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"TIME[$name][$i] ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
