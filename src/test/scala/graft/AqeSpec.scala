package graft

/** The local harness pins AQE OFF (GraftSession: compile-time stats are
  * accurate at harness scale, so adaptive re-planning only pays per-exchange
  * query-stage materialization), while SCALE.md tells a cluster deployment
  * to submit with AQE ON for skew-join splitting and runtime partition
  * coalescing. This suite de-risks that flip: every headline query must be
  * result-identical under adaptive execution, and the plan properties the
  * engine relies on must survive in their AQE forms — dim joins still
  * broadcast, the unhinted `q_above_avg` still free of forced broadcasts.
  *
  * The AQE session shares the test JVM's SparkContext (`newSession`) so the
  * suite exercises exactly the same data and function registry, differing
  * only in the adaptive flag.
  */
class AqeSpec extends SparkSpec {

  lazy val aqe: org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s
  }

  /** Broad slice of the inventory: every join family, window, rollup,
    * set-op, subquery, sketchless dedup signature, CC loop, and vector
    * path. Excluded by design: the approx sketches (HLL/KLL/Misra-Gries
    * merge order varies with partitioning — their contracts are
    * bounded-error, not byte equality) and the ANN paths (sample-trained;
    * own recall specs).
    */
  private val headline = Seq(
    "q_agg_pricing", "q_join_5way", "q_semi_join", "q_anti_join",
    "q_above_avg", "q_range_join", "q_asof_lookup", "q_window_rank",
    "q_window_running", "q_sessionize", "q_topk_parts", "q_topk_brand",
    "q_setops", "q_rollup_revenue", "q_dedup_docs", "q_dedup_ngram",
    "q_dedup_minhash", "q_dedup_clusters", "q_vector_knn",
    "q_vector_search", "q_text_stats", "q_mix_sources",
    "q_pack_sequences", "q_decontaminate", "q_user_deltas",
    "q_semantic_dedup", "q_dedup_incremental")

  test("headline queries are result-identical with AQE on") {
    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      val off = fn(spark, sfTest).collect().toSeq
      val on = fn(aqe, sfTest).collect().toSeq
      assert(on == off, s"$name differs under AQE")
    }
  }

  test("AQE re-plans (flag took) and the dim joins still broadcast") {
    val df = SparkEntry.queries("q_join_5way")(aqe, sfTest)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AdaptiveSparkPlan"), "adaptive flag did not take")
    assert(plan.contains("BroadcastHashJoin"),
      "dim joins must stay broadcast under AQE")
  }

  test("q_above_avg stays unhinted under AQE (no forced broadcast)") {
    val df = SparkEntry.queries("q_above_avg")(aqe, sfTest)
    df.collect()
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    assert(joins.forall(_.hint == org.apache.spark.sql.catalyst.plans
      .logical.JoinHint.NONE), "q_above_avg must carry no join hints")
  }
}
