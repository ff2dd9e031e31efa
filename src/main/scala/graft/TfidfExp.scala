package graft

import org.apache.spark.sql.functions._

/** Stage decomposition for q_tfidf (r18 verdict item 3: the only weak-set
  * member with NO committed floor decomposition — 0.79 s median in the
  * dilated r18 window at 8.7× its 0.091 s anchor; r16 official 0.49 s).
  * Forms, interleaved in ONE JVM — the only way to a machine-weather-
  * free ratio on this box:
  *   tf       = scan → explode → (doc, term, tf) hash agg    (r13–r18)
  *   tf_hof   = scan → per-row sorted-array run-length HOFs  (r19),
  *              EXCEPT-both-ways pinned row-identical to tf
  *   old_full = tf + term-window df + rank window + sort     (r13–r18)
  *   hof_full = tf_hof + the same df/rank/sort tail          (r19 graded)
  *   bhj_full = tf + (term, df) agg broadcast-joined back — REJECTED:
  *              the optimizer prunes the df branch's inner aggregate
  *              differently, canonical equality breaks, ReuseExchange
  *              can't serve it, and the corpus scans twice
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     SPARK_DRIVER_MEM=89g sbt "runMain graft.TfidfExp"
  */
object TfidfExp {
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
    def time(tag: String, f: => Long): Unit = (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      val c = f
      println(f"EXP[$tag][$i] ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$c")
    }
    def tf = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    // candidate: per-doc run-length tf via codegen'd HOFs — a doc's
    // tokens all live in ITS OWN row, so no exchange is needed to
    // count them; sort the token array, take run starts, emit
    // (term, runLength) structs, explode — zero shuffles to tf rows
    def tfHof = graft.Tables(spark, sfDir, "documents")
      .where($"text".isNotNull)
      .select($"doc_id", array_sort(split(lower($"text"), " ")).as("ts"))
      .select($"doc_id", $"ts",
        filter(sequence(lit(1), size($"ts")),
          i => !(get($"ts", i - 1) <=> get($"ts", i - 2))).as("st"))
      .select($"doc_id", explode(transform($"st", (s, j) =>
        struct(get($"ts", s - 1).as("term"),
          (coalesce(get($"st", j + 1), size($"ts") + 1) - s)
            .cast("long").as("tf")))).as("p"))
      .select($"doc_id", $"p.term".as("term"), $"p.tf".as("tf"))
    def nDocs = graft.Tables(spark, sfDir, "documents")
      .select(count(lit(1)).as("n_docs"))
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy($"term")
    def oldDf = tf.withColumn("df", count(lit(1)).over(wTerm))
    def newDf = tf.join(broadcast(tf.groupBy($"term")
      .agg(count(lit(1)).as("df"))), Seq("term"))
    def rank(base: org.apache.spark.sql.DataFrame) = {
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id")
        .orderBy(($"tf".cast("double") * ($"n_docs".cast("double") / $"df"))
          .desc, $"term")
      base.crossJoin(broadcast(nDocs))
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .filter($"rk" <= 3)
        .select($"doc_id", $"rk", $"term", $"tf", $"df",
          round($"tf" * log($"n_docs".cast("double") / $"df"), 4)
            .as("tfidf_log"))
        .orderBy($"doc_id", $"rk")
    }
    def hofDf = tfHof.withColumn("df", count(lit(1)).over(wTerm))
    // equivalence: the HOF run-length tf must be row-identical to the
    // explode+aggregate form (both directions of EXCEPT are empty)
    val d1 = tfHof.exceptAll(tf).count()
    val d2 = tf.exceptAll(tfHof).count()
    println(s"EQUIV hof_vs_agg except=$d1/$d2 (must be 0/0)")
    require(d1 == 0 && d2 == 0, "HOF tf diverges from explode+agg tf")
    for (round <- 1 to 3) {
      time(s"tf_$round", tf.count())
      time(s"tf_hof_$round", tfHof.count())
      time(s"old_full_$round", rank(oldDf).count())
      time(s"hof_full_$round", rank(hofDf).count())
      time(s"bhj_full_$round", rank(newDf).count())
    }
    spark.stop()
  }
}
