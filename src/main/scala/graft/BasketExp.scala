package graft

import org.apache.spark.sql.functions._

/** A/B decomposition for q_basket_pairs (r20, VERDICT r19 item 3 — the
  * only weak-set member without a committed floor closure, and the r19
  * record's worst untouched-code ratio at 1.63× vs r18).
  *
  * Two forms of the same pair expansion, interleaved in ONE JVM so the
  * per-form medians are machine-weather-free (the BpeExp protocol):
  *
  *   join_form  — the r1–r19 shape: lineitem self-joined on l_orderkey
  *                (two scans, two order-keyed exchanges feeding the join,
  *                then the pair agg exchange);
  *   group_form — the r20 shape (`Relational.basketPairs`): one scan,
  *                one order-keyed exchange into collect_list, codegen'd
  *                HOF pair expansion in-row, then the same pair agg.
  *
  * Row-pair semantics are identical (for every two lineitem rows of one
  * order with part_a < part_b, exactly one pair — duplicate-part
  * multiplicities included); the oracle hash-gate pins that on the
  * graded surface. Job/stage counters witness the structural claim the
  * wall clock can't show through phase noise. Counters are sampled
  * after a short listener-bus settle (r19 ADVICE: listener events are
  * async; an immediate read can attribute a lagging onJobStart to the
  * wrong leg).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BasketExp"
  */
object BasketExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(GraftSession.benchCpus)
      .config("spark.graft.cacheTables", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rt = Runtime.getRuntime
    println(s"ENV master=${spark.sparkContext.master} " +
      s"max_heap_mb=${rt.maxMemory / (1024 * 1024)} " +
      s"cpus_env_set=${GraftSession.envCpusSet}")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          stages.addAndGet(j.stageInfos.size)
        }
      })
    def joinForm(): Long = {
      val li = Tables(spark, sfDir, "lineitem")
        .select($"l_orderkey", $"l_partkey")
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"),
          col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), $"part_a", $"part_b")
        .limit(20).count()
    }
    def groupForm(): Long =
      operators.Relational.basketPairs(spark, sfDir).count()
    def time(tag: String, f: => Long): Unit = {
      val t0 = System.nanoTime()
      val j0 = jobs.get(); val s0 = stages.get()
      val c = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120) // listener-bus settle before sampling counters
      println(f"EXP[$tag] $secs%.3f s " +
        s"rows=$c jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
    }
    // warm both forms once (codegen + C2), then interleave timed rounds
    time("join_warm", joinForm()); time("group_warm", groupForm())
    for (r <- 1 to 5) {
      time(s"join_$r", joinForm())
      time(s"group_$r", groupForm())
    }
    spark.stop()
  }
}
