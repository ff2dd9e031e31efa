package graft

import org.apache.spark.sql.functions._

/** Stage decomposition for q_winnow_pairs (r12 verdict: 1.51 s at 4.1×
  * its anchor with a 1.24× unexplained r11→r12 drift; the suggested
  * long-packed join key measured FLAT in the r13 cross-check, so the
  * cost lives elsewhere). Cumulative-prefix timings:
  *   fps    = winnowFps: tokens → positional explode → md5 key →
  *            doc-window min → distinct                  (selection)
  *   dfwin  = fps + fingerprint df window + cap filter   (posting cap)
  *   pairs  = full winnowPairs (join + pair aggregate)   (graded query)
  * Each prefix recomputes its predecessors (no caching — the graded
  * query doesn't cache either), so stage cost ≈ successive deltas.
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     SPARK_DRIVER_MEM=89g sbt "runMain graft.WinnowExp"
  */
object WinnowExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.benchCpus)
      .config("spark.graft.cacheTables", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rt = Runtime.getRuntime
    println(s"ENV master=${spark.sparkContext.master} " +
      s"max_heap_mb=${rt.maxMemory / (1024 * 1024)} " +
      s"cpus_env_set=${GraftSession.envCpusSet}")
    import operators.DedupOps
    val w = DedupOps.DefaultWinnowW
    def time(tag: String, f: => Long): Unit = (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      val c = f
      println(f"EXP[$tag][$i] ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$c")
    }
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    // the pre-r13 selection pipeline (gram explode → doc-window min →
    // DISTINCT), inlined so old vs new run interleaved in ONE JVM —
    // the only way to a machine-weather-free ratio on this box
    def oldFps = {
      import spark.implicits._
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"i").rowsBetween(0, w - 1)
      graft.Tables(spark, sfDir, "documents")
        .repartition(32)
        .select($"doc_id",
          expr("filter(split(text, ' '), t -> t != '')").as("ts"))
        .filter(size($"ts") >= 3)
        .select($"doc_id", (size($"ts") - 2).cast("long").as("n_grams"),
          $"ts", explode(sequence(lit(1), size($"ts") - 2)).as("i"))
        .select($"doc_id", $"n_grams", $"i",
          (conv(substring(md5(array_join(slice($"ts", $"i", lit(3)), " ")),
            1, 8), 16, 10).cast("long") * lit(2147483648L)
            + (lit(2147483647L) - $"i")).as("key"))
        .withColumn("sk", min($"key").over(win))
        .filter($"i" <= greatest($"n_grams" - (w - 1), lit(1L)))
        .select($"doc_id", $"n_grams", shiftrightunsigned($"sk", 31).as("fp"))
        .distinct()
    }
    def oldPairs = {
      import spark.implicits._
      val fps = oldFps
        .withColumn("nd", count(lit(1)).over(byFp))
        .filter($"nd" >= 2 && $"nd" <= DedupOps.DefaultMaxShingleDf)
        .select($"doc_id", $"fp")
      fps.toDF("da", "fp").join(fps.toDF("db", "fp"), Seq("fp"))
        .filter($"da" < $"db")
        .groupBy($"da", $"db").agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= DedupOps.DefaultWinnowMinShared)
    }
    // the r13–r17 form (count window + collect_list inside the fp
    // exchange), inlined over the CURRENT winnowFps so the r18
    // bounded-hash-agg rewrite is isolated to the one changed stage
    def winPairs = {
      import spark.implicits._
      DedupOps.winnowFps(spark, sfDir, w)
        .withColumn("nd", count(lit(1)).over(byFp))
        .filter($"nd" >= 2 && $"nd" <= DedupOps.DefaultMaxShingleDf)
        .groupBy($"fp")
        .agg(sort_array(collect_list($"doc_id")).as("ds"))
        .select(explode(expr(
          """flatten(transform(ds, (a, i) ->
            |  transform(slice(ds, i + 2, size(ds)), b ->
            |    struct(a AS da, b AS db))))""".stripMargin)).as("p"))
        .groupBy(col("p.da").as("da"), col("p.db").as("db"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= DedupOps.DefaultWinnowMinShared)
        .orderBy(col("da"), col("db"))
    }
    for (round <- 1 to 3) {
      time(s"old_fps_$round", oldFps.count())
      time(s"new_fps_$round", DedupOps.winnowFps(spark, sfDir, w).count())
      time(s"old_pairs_$round", oldPairs.count())
      time(s"win_pairs_$round", winPairs.count())
      time(s"new_pairs_$round", DedupOps.winnowPairs(spark, sfDir).count())
    }
    spark.stop()
  }
}
