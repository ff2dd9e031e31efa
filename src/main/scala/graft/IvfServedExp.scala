package graft

import org.apache.spark.sql.functions._

/** Stage decomposition for q_ivf_served_recall (r19: after the shared
  * truth pass landed — VERDICT r18 item 4 projected "roughly halve
  * 3.94 s" but isolated-warm readings moved only ~3.6 → ~3.4 s clean,
  * so the truth pass was NOT the dominant cost; this experiment
  * attributes the wall). Cumulative prefixes over the SAME code paths
  * the graded query runs (each stage recomputes its predecessors except
  * where the graded query itself checkpoints):
  *   live   = reps (int8 + pca scales + both vq columns) → float-live
  *            filter → localCheckpoint            (scale/PCA subtree)
  *   truth  = live + anchors + the shared exact-float top-k window
  *   int8   = truth + int8 index build (buildIvfFrom: driver k-means
  *            train, assignment map, cell-partitioned parquet write)
  *            + probeIvfBatch + overlap rollup    (one full served leg)
  *   full   = VectorOps.ivfServedRecall           (both legs, graded)
  * Stage cost ≈ successive deltas; the per-leg fixed cost is the JOB
  * floor (build = assignment job + shuffle-write + centroid write;
  * probe = centroid collect + cell collect + pruned scan join; rollup
  * = checkpoint) at the documented ~0.135 s/stage local-mode floor.
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     SPARK_DRIVER_MEM=89g sbt "runMain graft.IvfServedExp"
  */
object IvfServedExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.benchCpus)
      .config("spark.graft.cacheTables", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rt = Runtime.getRuntime
    println(s"ENV master=${spark.sparkContext.master} " +
      s"max_heap_mb=${rt.maxMemory / (1024 * 1024)} " +
      s"cpus_env_set=${GraftSession.envCpusSet}")
    def time(tag: String, f: => Long): Unit = (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      val c = f
      println(f"EXP[$tag][$i] ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$c")
    }
    for (round <- 1 to 3) {
      time(s"live_$round",
        operators.VectorOps.servedLiveProbe(spark, sfDir).count())
      time(s"truth_$round",
        operators.VectorOps.servedTruthProbe(spark, sfDir).count())
      time(s"int8_$round",
        operators.VectorOps.servedOneLegProbe(spark, sfDir).count())
      time(s"full_$round",
        operators.VectorOps.ivfServedRecall(spark, sfDir).count())
    }
    spark.stop()
  }
}
