package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The sf1 scale probe (round-11 verdict item #2): generate a seeded 10×
  * replica of the sf0.1 fixtures, time the most expensive queries at both
  * scales, and print the sf0.1→sf1 scaling exponent per query —
  * log10(t_sf1 / t_sf0.1), so 1.0 = perfectly linear, > 1 = superlinear.
  * This turns the "would the plan survive 100×" argument from plan-shape
  * reasoning into a measured number and catches any accidentally
  * superlinear plan one scale step early.
  *
  *   sbt "runMain graft.ScaleProbe /tmp/sf1 [q_name ...]"
  *
  * Generation is DETERMINISTIC (no RNG): each table is the union of K
  * key-shifted copies of its sf0.1 original, mirroring the fixtures' own
  * growth pattern (sf0.01→sf0.1 multiplied every entity table 10×, kept
  * region/nation fixed, embeddings 4×). Keys shift by copy × (max+1) so
  * per-entity densities — items per order, events per user, orders per
  * customer — are preserved exactly; what grows is the entity population,
  * which is how real deployments grow.
  *
  * Two tables need more than a key shift:
  *  - documents: verbatim copies would make every doc a 10-way exact+near
  *    duplicate, inflating dedup pair counts quadratically IN THE COPY
  *    COUNT — a semantics change, not a scale-up. Each copy k > 0 instead
  *    suffixes every token with "·k": per-copy shingle/df distributions
  *    (and so per-copy dup rates) are preserved, copies share zero
  *    shingles, and the vocabulary grows with the corpus — the shape of
  *    10× fresh content.
  *  - embeddings: verbatim copies would stack k identical points per
  *    cell; each copy adds a small deterministic hash-derived offset per
  *    dimension (±1%), so copies land in the same REGION (cell balance
  *    preserved) without being degenerate duplicates.
  */
object ScaleProbe {
  /** Queries probed by default: every query ≥ ~0.6 s in BENCH_FULL_r10
    * plus the three vector paths (knn is the documented brute-force
    * baseline — its superlinear exponent is the expected contrast with
    * the IVF scale path, not a finding).
    */
  val DefaultQueries: Seq[String] = Seq(
    "q_basket_pairs", "q_dedup_clusters", "q_dedup_ngram",
    "q_conversion_lag", "q_dedup_incremental", "q_cohort_retention",
    "q_dedup_substring", "q_decontaminate", "q_above_avg", "q_dau_mau",
    "q_setops_all", "q_tfidf", "q_funnel",
    "q_ann_ivf", "q_ann_ivfpq", "q_vector_knn",
    // round-11 additions: the iterative/CC-backed newcomers (bm25 and
    // perplexity ride along as the new text family's representatives —
    // note copy-k documents suffix tokens with ·k, so the fixed bm25
    // query terms match only the original copy: the absolute score list
    // is copy-0's, while the corpus stats side still scales 10×)
    "q_kmeans", "q_cluster_sizes", "q_bm25", "q_doc_perplexity",
    // round-11 batch 4: dedup_keep rides the CC plan plus a corpus-side
    // enrichment join; shuffle_order's stride rollup grows as
    // corpus/n_sources — both worth an exponent. (hard_negatives /
    // embedding_outliers are single broadcast scans; knn already
    // represents that cost class.)
    "q_dedup_keep", "q_shuffle_order",
    // round-11 batches 6–7: the pair/CC-riding reports and the
    // model-building calibration query
    "q_sim_histogram", "q_cross_source_dups", "q_dup_rate_by_source",
    "q_quality_perplexity",
    // round-11 batch 8: minhash_recall runs BOTH pair machineries,
    // ngram_novelty a full (shingle, source) distinct; the rest are
    // group-rows-only reports (cohesion is the embeddings-table F=4)
    "q_minhash_recall", "q_ngram_novelty", "q_label_cohesion",
    "q_psi_drift", "q_epoch_plan",
    // round-11 batch 9: leakage walks the full shingle set, entropy the
    // full (doc, word) explode
    "q_eval_leakage", "q_text_entropy",
    // round-11 batch 10: the estimator runs the signature pass AND the
    // unfiltered inter machinery
    "q_minhash_est",
    // round-11 batch 11–15: the two new pair/CC machines (KL/Zipf/
    // profiles are vocab- or source-bounded; market_share/top_value
    // are single fact scans already represented)
    "q_winnow_pairs", "q_semantic_clusters")

  def main(args: Array[String]): Unit = {
    val outRoot = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val queries = if (args.length > 1) args.drop(1).toSeq else DefaultQueries
    val src = "/root/testdata/sf0.1"
    // benchCpus: probes are measurement — a silent local[4] session would
    // confound exponents the same way it confounded the r11 bench record
    val spark = GraftSession.builder(GraftSession.benchCpus)
      .config("spark.graft.cacheTables", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(s"$outRoot/_GENERATED").exists()) {
      generate(spark, src, outRoot)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outRoot/_GENERATED"), "ok")
    }

    // `edgecheck`: verify the de-clique property of the r13 embeddings
    // recipe — at-threshold pairs of the generated fixture, split into
    // within-copy vs cross-copy. The r12 jitter recipe read ~quadratic
    // cross-copy cliques here; rotation should read within ≈ 4× the
    // source pair count and cross ≈ 0.
    if (args.length > 1 && args(1) == "edgecheck") {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, floor, lit, call_function}
      val off = spark.read.parquet(s"$src/embeddings.parquet")
        .agg(org.apache.spark.sql.functions.max(col("vec_id"))).head
        .getLong(0) + 1L
      val emb = spark.read.parquet(s"$outRoot/embeddings.parquet")
      val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("va"))
      val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("vb"))
      val pairs = a.crossJoin(b).where(col("a_id") < col("b_id"))
        .where(call_function("cosine_sim", col("va"), col("vb")) >= 0.4)
        .select((floor(col("a_id") / lit(off)) ===
          floor(col("b_id") / lit(off))).as("within"))
      val byKind = pairs.groupBy(col("within")).count().as[(Boolean, Long)]
        .collect().toMap
      val w = byKind.getOrElse(true, 0L)
      val x = byKind.getOrElse(false, 0L)
      println(s"""EDGECHECK {"within_copy":$w,"cross_copy":$x,""" +
        s""""cross_share":${if (w + x == 0) 0.0
          else x.toDouble / (w + x)}}""")
      spark.stop()
      return
    }

    def time3(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count(); fn(spark, dir).count() // warm (plan + C2)
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }

    // Locale-pinned number rendering: the f-interpolator delegates to the
    // default locale, and a comma-decimal locale would emit invalid JSON.
    def num(d: Double, dec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(d))

    println(f"${"query"}%-22s ${"sf0.1"}%8s ${"sf1"}%8s  F  exponent")
    val rows = queries.map { q =>
      val t01 = time3(q, src)
      val t1 = time3(q, outRoot)
      // exponent in the query's OWN data-growth factor: embeddings grew
      // 4x (the fixtures' own sf-step ratio), every row table 10x — a
      // log10 exponent for a 4x-grown input would understate superlinear
      // vector plans by log10(4) ≈ 0.6
      val factor = if (EmbeddingsQueries(q)) 4 else 10
      val exp = math.log(t1 / t01) / math.log(factor.toDouble)
      println(s"$q".padTo(22, ' ') +
        f" ${num(t01, 2)}%8s ${num(t1, 2)}%8s $factor%2d  ${num(exp, 2)}")
      s""""$q":{"sf01":$t01,"sf1":$t1,"factor":$factor,""" +
        s""""exponent":${num(exp, 3)}}"""
    }
    // env stamp: same confound class as the bench record (VERDICT r11) —
    // a probe row means nothing without the master/heap it ran under
    val rt = Runtime.getRuntime
    val envJson = s""""env":{"master":"${spark.sparkContext.master}",""" +
      s""""max_heap_mb":${rt.maxMemory / (1024 * 1024)},""" +
      s""""cpus_env_set":${GraftSession.envCpusSet}}"""
    val json = rows.mkString(
      s"""{"probe":"sf0.1->sf1",$envJson,"queries":{""", ",", "}}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/scaleprobe.json"), json + "\n")
    println("wrote /tmp/scaleprobe.json")
    spark.stop()
  }

  /** Queries whose only scaled input is the embeddings table (4× per sf
    * step in the fixtures, vs 10× for the row tables).
    */
  val EmbeddingsQueries: Set[String] = Set(
    "q_ann_ivf", "q_ann_ivfpq", "q_vector_knn", "q_vector_search",
    "q_semantic_dedup", "q_dedup_embed", "q_embed_neardup_lsh",
    "q_decontaminate_embed", "q_label_stats", "q_label_centroids",
    "q_kmeans", "q_hard_negatives", "q_embedding_outliers",
    "q_label_cohesion", "q_semantic_clusters", "q_embedding_pca",
    // round 16: both read ONLY the embeddings table — srp_recall's
    // exact-cosine truth join is the documented quadratic audit cost,
    // and reporting it against F=10 would understate the exponent by
    // log10(4) ≈ 0.6 (exactly the trap the factor split exists for)
    "q_srp_recall", "q_pca_project",
    "q_embed_quantize", "q_quantize_recall", "q_ivf_balance",
    // round 17: all four read ONLY the embeddings table (clip variants,
    // the label rollup over the cell CC, the PCA+int8 composition).
    // q_label_token_yield is mixed (CC over 4x-embeddings + a linear
    // 10x-documents token join); F=4 is the conservative label — the
    // dominant-cost CC input grows 4x, and a larger F would only
    // understate the exponent
    "q_embed_quantize_clip", "q_quantize_recall_clip", "q_label_dup_rate",
    "q_pca_quantize_recall", "q_label_token_yield")

  /** Key-shifted K-fold replication of every sf0.1 table into outRoot. */
  def generate(spark: SparkSession, src: String, outRoot: String): Unit = {
    new java.io.File(outRoot).mkdirs()
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outRoot/$t.parquet")
      println(s"[scaleprobe] $t: ${spark.read.parquet(s"$outRoot/$t.parquet").count()} rows")
    }
    // fixed-size dims copy through unchanged
    for (t <- Seq("region", "nation")) write(t, read(t))

    // One offset per KEY FAMILY, computed from the key-OWNING table, so a
    // fact table's foreign keys shift by exactly the stride its dimension
    // shifts by. Computing each table's offsets from its own column maxes
    // would only align replicas while max(fact FK) == max(dim PK) — true
    // of today's fixtures, but any regenerated fixture with an
    // unreferenced highest-keyed dim row would silently dangle every
    // replica FK and invalidate the probe's join selectivities.
    def keyMax(t: String, c: String): Long =
      read(t).agg(max(col(c))).head.getLong(0) + 1L
    val offset: Map[String, Long] = Map(
      "c_custkey" -> keyMax("customer", "c_custkey"),
      "o_custkey" -> keyMax("customer", "c_custkey"),
      "s_suppkey" -> keyMax("supplier", "s_suppkey"),
      "l_suppkey" -> keyMax("supplier", "s_suppkey"),
      "p_partkey" -> keyMax("part", "p_partkey"),
      "l_partkey" -> keyMax("part", "p_partkey"),
      "o_orderkey" -> keyMax("orders", "o_orderkey"),
      "l_orderkey" -> keyMax("orders", "o_orderkey"),
      "event_id" -> keyMax("events", "event_id"),
      "user_id" -> keyMax("events", "user_id"),
      "doc_id" -> keyMax("documents", "doc_id"),
      "vec_id" -> keyMax("embeddings", "vec_id"))

    /** Union of `copies` key-shifted replicas; each key column shifts by
      * copy × its family offset so replica key ranges never collide and
      * replica FKs resolve inside their own copy's dimension rows.
      */
    def replicate(t: String, keys: Seq[String], copies: Int = 10,
                  tweak: (DataFrame, Int) => DataFrame = (d, _) => d)
    : DataFrame = {
      val base = read(t)
      (0 until copies).map { i =>
        val shifted = keys.foldLeft(base)((d, k) =>
          d.withColumn(k, col(k) + lit(i * offset(k))))
        tweak(shifted, i)
      }.reduce(_ union _)
    }

    write("customer", replicate("customer", Seq("c_custkey")))
    write("supplier", replicate("supplier", Seq("s_suppkey")))
    write("part", replicate("part", Seq("p_partkey")))
    write("orders", replicate("orders", Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicate("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", replicate("events", Seq("event_id", "user_id")))
    write("documents", replicate("documents", Seq("doc_id"),
      tweak = (d, i) =>
        if (i == 0) d
        else d.withColumn("text", array_join(
          transform(split(col("text"), " "),
            w => concat(w, lit("·" + i))), " "))))
    // embeddings grew 4× per sf step in the fixtures. r13 recipe
    // (VERDICT r12 item 5): each copy ROTATES the dimension axis by
    // 7·i — within-copy cosines are EXACTLY preserved (the pair/CC
    // machinery sees 4× the original pair structure, which is the
    // linear growth a probe should measure), while cross-copy
    // alignments scramble to near-orthogonal. The previous ±1%
    // per-dimension jitter made every copy a NEAR-DUP of copy 0, so
    // cross-copy cliques inflated the edge graph quadratically
    // (920→26.6k edges at 4×, SCALEPROBE_r12 _doc) and probe
    // exponents measured the FIXTURE, not the machinery. The
    // de-clique property (cross-copy edge share ≈ 0) is verified at
    // probe time and recorded in the probe JSON.
    val rotStep = 7
    write("embeddings", replicate("embeddings", Seq("vec_id"), copies = 4,
      tweak = (d, i) =>
        if (i == 0) d
        else {
          val r = (rotStep * i) % 64
          d.withColumn("embedding",
            expr(s"concat(slice(embedding, ${r + 1}, ${64 - r}), " +
              s"slice(embedding, 1, $r))"))
        }))
  }
}
