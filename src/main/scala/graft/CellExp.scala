package graft

import org.apache.spark.sql.functions._

/** Experiment harness (not part of the contract): edge recall of the
  * cell-candidate pair stream (VectorOps.cellPairs) vs the brute-force
  * truth (embedNearDup) per nassign, at the graded threshold — the
  * measurement behind wiring q_semantic_clusters to the cell source.
  *   sbt "runMain graft.CellExp /root/testdata/sf0.1"
  */
object CellExp {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("crossover")) return crossover(args.drop(1))
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder(GraftSession.benchCpus)
      .config("spark.graft.cacheTables", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val brute = operators.VectorOps.embedNearDup(spark, dir)
      .select($"a_id", $"b_id").cache()
    val nBrute = brute.count()
    println(s"[cellexp] $dir brute edges: $nBrute")
    for (na <- 2 to 5) {
      val t0 = System.nanoTime()
      val cell = operators.VectorOps.cellPairs(spark, dir, 0.4, na)
        .select($"a_id", $"b_id").cache()
      val nCell = cell.count()
      val missed = brute.except(cell).count()
      val extra = cell.except(brute).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[cellexp] nassign=$na cell=$nCell missed=$missed " +
        f"extra=$extra recall=${(nBrute - missed).toDouble / nBrute}%.4f " +
        f"(${dt}%.1f s)")
      cell.unpersist()
    }
    spark.stop()
  }

  /** Crossover study: brute-force vs cell-candidate edge generation over
    * K-replicated embeddings (the ScaleProbe replica recipe — key-shifted
    * copies with hash-derived ±1% per-dimension offsets, no RNG), timing
    * both paths per scale. Answers "at what corpus size does the Σ n_c²
    * machinery beat the n² broadcast BNLJ on this box".
    *   sbt "runMain graft.CellExp crossover 4 8 16"
    */
  private def crossover(ks: Array[String]): Unit = {
    val copies = if (ks.nonEmpty) ks.map(_.toInt).toSeq else Seq(4, 8, 16)
    val spark = GraftSession.builder(GraftSession.benchCpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val src = "/root/testdata/sf0.1"
    for (k <- copies) {
      // recipe-version token in the path (ADVICE r12): existence-keyed
      // reuse of /tmp/cellx_$k silently measured stale data whenever
      // the replica recipe changed; bump v2→v3… with any recipe edit
      val dir = s"/tmp/cellx_v2_$k"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val base = spark.read.parquet(s"$src/embeddings.parquet")
        val n = base.count()
        val parts = (0 until k).map { i =>
          if (i == 0) base
          else base
            .withColumn("vec_id", $"vec_id" + lit(i * 10L * n))
            .withColumn("embedding",
              transform($"embedding", (x, j) =>
                (x + (pmod(xxhash64($"vec_id", j, lit(i)), lit(2000L))
                  .cast("double") / 100000.0 - 0.01)).cast("float")))
        }
        parts.reduce(_ unionByName _).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
      }
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      def time(tag: String)(body: => Long): Unit = {
        body // warm (plan + codegen)
        val t0 = System.nanoTime()
        val rows = body
        println(f"[cellx] n=$n%6d $tag%-6s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($rows edges)")
      }
      time("brute") {
        operators.VectorOps.embedNearDup(spark, dir).count()
      }
      time("cell") {
        operators.VectorOps.cellPairs(spark, dir, 0.4).count()
      }
    }
    spark.stop()
  }
  // Measured 2026-08-14 (local[32], this box):
  //   n= 8000  brute  1.33s (26629 edges)   cell  1.45s (24575)
  //   n=16000  brute  3.67s (114365)        cell  2.23s (98676)
  //   n=32000  brute 10.69s (472680)        cell  5.46s (412019)
  // Crossover ≈ 10k vectors; above it the Σ n_c² candidate machinery
  // pulls away from the n² BNLJ (2× at 32k and widening). Note the
  // replica recipe itself inflates the OUTPUT quadratically (±1% copies
  // of one vector form cross-copy cliques: 920 edges at sf0.1 → 26.6k
  // at 4×) — so cluster-level timings at sf1 are CC-dominated for ANY
  // edge source (decomposed 2026-08-14: clusters_brute 20.2s vs
  // clusters_cell 21.9s at sf1, pair stage 1.17 vs 1.26s), and the
  // cell path's recall at replica scales is ~0.87 (the SemDeDup trade;
  // recall-1 is pinned only at the graded fixtures, where it is exact).
}
