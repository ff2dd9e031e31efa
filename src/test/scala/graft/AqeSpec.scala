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

  /** EVERY oracle-backed query (the oracle set is deterministic by
    * construction — ORDER BY + rounded floats — or its DuckDB hash diff
    * could never pass), plus the deterministic sample-trained vector
    * entries. Excluded by design: the approx sketches (HLL/KLL merge
    * order varies with partitioning — their contracts are bounded-error,
    * not byte equality), the ANN recall paths (own specs), and the
    * multimodal stub.
    */
  private val headline =
    SparkEntry.oracleSql.keys.toSeq.sorted :+ "q_semantic_dedup"

  test("all deterministic queries are result-identical with AQE on") {
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

  test("AQE splits a skewed sort-merge join at runtime") {
    // the planner-side complement of SkewOps.saltedJoin: on a cluster
    // (AQE on) a lopsided key histogram is handled by
    // OptimizeSkewedJoin splitting the oversized partition into
    // subpartitions after the map stage materializes. Local data is MBs,
    // so the detection thresholds scale down; a real deployment keeps
    // the 256 MB defaults.
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    import s2.implicits._
    // one hot key carrying ~90% of the left side; the payload column
    // stays in the join output so the hot partition has real bytes.
    // NOTE no groupBy(key) downstream: a hash-distribution requirement
    // on the join output would veto the split (it would need an extra
    // shuffle, and forceOptimizeSkewedJoin stays at its default false).
    val left = (1 to 20000).map(i =>
      (if (i % 10 == 0) i.toLong % 97 else 7L, s"payload-$i-${"x" * 40}"))
      .toDF("key", "lv")
    val right = (0L to 96L).map(k => (k, s"dim-$k")).toDF("key", "rv")
    val j = left.join(right, "key")
    assert(j.collect().length == 20000)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("skew="), s"AQE did not mark the skewed join:\n$plan")
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
