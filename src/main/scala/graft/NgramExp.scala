package graft

/** Plan-experiment timer for the ngram-dedup family: graded bounded-collect
  * plan vs the PPJoin prefix-filter twin, repeated runs so the JIT curve is
  * visible.
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.NgramExp"
  */
object NgramExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.envCpus)
      .config("spark.graft.cacheTables", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String, f: => Long): Unit = (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      val c = f
      println(f"EXP[$tag][$i] ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$c")
    }
    time("graded", operators.DedupOps.ngramJaccard(spark, sfDir).count())
    time("prefix", operators.DedupOps.ngramJaccardPrefix(spark, sfDir).count())
    time("graded2", operators.DedupOps.ngramJaccard(spark, sfDir).count())
    spark.stop()
  }
}
