package graft

import org.apache.spark.sql.SparkSession

/** Repeated-run timer for one query: prints per-iteration seconds.
  *   sbt "runMain graft.TimeQ q_topk_parts 5"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // mirror Bench's session exactly (incl. hot-table cache)
    val spark = GraftSession.builder(GraftSession.benchCpus)
      .config("spark.graft.cacheTables", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // env stamp first: the r11 q_dedup_embed cross-check was circular
    // because neither build's TimeQ recorded spark.master — both silently
    // ran local[4]. Every TimeQ transcript now states its config.
    val rt = Runtime.getRuntime
    println(s"ENV master=${spark.sparkContext.master} " +
      s"max_heap_mb=${rt.maxMemory / (1024 * 1024)} " +
      s"cpus_env_set=${GraftSession.envCpusSet}")
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
