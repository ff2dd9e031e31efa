package graft

import org.apache.spark.sql.functions._

/** Stage decomposition for q_source_containment — the one r14 weak
  * entry with neither a ≤2× record nor a committed floor (VERDICT r14
  * item 2). Cumulative prefixes, the [[HopperExp]]/SubstrExp protocol:
  * each stage recomputes its predecessors, stage cost = successive
  * deltas, warm medians of 5. Mirrors
  * `DedupOps.sourceContainmentFrom` stage for stage:
  *
  *   c_shingles:  the corpus shingle explode + doc join (map-side —
  *                the scan both engines pay)
  *   c_group:     + groupBy(shingle).collect_set(source) — the ONE
  *                corpus-sized shuffle in the query
  *   c_expand:    + the k²-ordered-pair flatMap + (src_a, src_b)
  *                rollup (vocab-bounded input, |sources|² output)
  *   c_full:      the graded query (adds per-source totals + the
  *                broadcast grid + presentation sort)
  *   novelty:     q_ngram_novelty, the committed same-subtree control
  *                (shares the shingle scan; its recorded anchor ratio
  *                calibrates the window)
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     SPARK_DRIVER_MEM=89g sbt "runMain graft.ContainExp"
  */
object ContainExp {
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

    def docs = Tables(spark, sfDir, "documents")
      .repartition(spark.conf
        .get("spark.sql.shuffle.partitions", "32").toInt)
    def srcs = docs.select($"doc_id", $"source")
    def sh = operators.DedupOps
      .shinglesOf(docs.select($"doc_id", $"text")).join(srcs, "doc_id")
    def g = sh.groupBy($"s").agg(collect_set($"source").as("ss"))
      .select($"ss")
    def expand = g.as[Seq[String]]
      .flatMap(set => for (a <- set; b <- set if a != b) yield (a, b))
      .toDF("src_a", "src_b")
      .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("shared"))

    time("c_shingles", sh.count())
    time("c_group", g.count())
    time("c_expand", expand.count())
    time("c_full",
      operators.DedupOps.sourceContainment(spark, sfDir).count())
    time("novelty", operators.DedupOps.ngramNovelty(spark, sfDir).count())
    spark.stop()
  }
}
