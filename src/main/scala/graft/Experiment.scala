package graft

/** Scratch harness for plan/config experiments (not part of the contract).
  * Current experiment: the BASELINE-18 subset under
  * {no-cache, cache} × {AQE on, AQE off} — quantifies the single-row-group
  * scan floor vs per-query AQE stage-scheduling overhead.
  */
object Experiment {
  private val base18 = Seq(
    "q_scan_filter", "q_agg_pricing", "q_join_segment", "q_join_5way",
    "q_semi_join", "q_anti_join", "q_window_rank", "q_window_running",
    "q_topk_parts", "q_distinct_users", "q_approx_distinct", "q_tumbling_1h",
    "q_sessionize", "q_json_extract", "q_text_wordcount", "q_dedup_docs",
    "q_vector_knn", "q_setops")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runSubset(tag: String): Unit = {
      val per = base18.map { name =>
        def once: Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        name -> math.min(once, once)
      }
      val total = per.map(_._2).sum
      println(f"EXP[$tag] total=$total%.2f " +
        per.sortBy(-_._2).take(6)
          .map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
    }

    spark.conf.set("spark.graft.cacheTables", "false")
    runSubset("nocache_aqe")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    runSubset("nocache_noaqe")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.graft.cacheTables", "true")
    runSubset("cache_aqe")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    runSubset("cache_noaqe")
    spark.stop()
  }
}
