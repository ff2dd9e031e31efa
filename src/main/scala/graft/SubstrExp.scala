package graft

import org.apache.spark.sql.functions._

/** Stage decomposition for q_dedup_substring (r12 verdict: 1.23 s at
  * 3.9× its anchor — "three digest-width shuffles is the designed
  * shape; acceptable to close as floor if a stage decomposition proves
  * it"). Cumulative-prefix timings over the graded plan:
  *   grams = scan → positional explode → 128-bit xxhash digest pair
  *           (no shuffle)
  *   pdg   = grams + groupBy(doc_id, g) position counts   (shuffle 1)
  *   wnd   = pdg + count window over g                    (shuffle 2)
  *   full  = the graded query (per-doc rollup + sort)     (shuffle 3)
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     SPARK_DRIVER_MEM=89g sbt "runMain graft.SubstrExp"
  */
object SubstrExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.benchCpus)
      .config("spark.graft.cacheTables", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rt = Runtime.getRuntime
    println(s"ENV master=${spark.sparkContext.master} " +
      s"max_heap_mb=${rt.maxMemory / (1024 * 1024)} " +
      s"cpus_env_set=${GraftSession.envCpusSet}")
    import spark.implicits._
    val k = 8
    def grams = Tables(spark, sfDir, "documents")
      .repartition(32)
      .select($"doc_id", split(lower($"text"), " ").as("ts"))
      .filter(size($"ts") >= k)
      .select($"doc_id", $"ts",
        explode(sequence(lit(1), size($"ts") - (k - 1))).as("i"))
      .select($"doc_id",
        struct(
          xxhash64(array_join(slice($"ts", $"i", lit(k)), " ")),
          xxhash64(lit(1), array_join(slice($"ts", $"i", lit(k)), " ")))
          .as("g"))
    def pdg = grams.groupBy($"doc_id", $"g").agg(count(lit(1)).as("n_pos"))
    def wnd = pdg.withColumn("nd", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy($"g")))
    def time(tag: String, f: => Long): Unit = (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      val c = f
      println(f"EXP[$tag][$i] ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$c")
    }
    time("grams", grams.count())
    time("pdg", pdg.count())
    time("wnd", wnd.count())
    time("full", operators.DedupOps.substringDup(spark, sfDir).count())
    spark.stop()
  }
}
