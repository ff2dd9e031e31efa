package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for plan-shape experiments (not part of the contract). */
object Experiment {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time(tag: String)(f: => Long): Unit =
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"EXP[$tag][$i] ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
      }
    val li = () => Tables(spark, sfDir, "lineitem")
    time("scan_count") { li().count() }
    time("scan_agg_serial") {
      li().join(Tables(spark, sfDir, "part"), $"l_partkey" === $"p_partkey")
        .groupBy($"p_partkey", $"p_name")
        .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev"))
        .orderBy(desc("rev")).limit(10).count()
    }
    time("join5_current") {
      graft.operators.Relational.join5Way(spark, sfDir).count()
    }
    time("join5_preagg") {
      val liAgg = Tables(spark, sfDir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("orev"),
          count(lit(1)).as("ocnt"))
      liAgg.join(Tables(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(Tables(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables(spark, sfDir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables(spark, sfDir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(round(sum($"orev")).cast("long").as("revenue"), sum($"ocnt").as("n_lines"))
        .orderBy($"r_name", $"n_name").count()
    }
    time("scan_agg_repart") {
      li().repartition(32)
        .join(Tables(spark, sfDir, "part"), $"l_partkey" === $"p_partkey")
        .groupBy($"p_partkey", $"p_name")
        .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev"))
        .orderBy(desc("rev")).limit(10).count()
    }
    val slideUs = 900L * 1000000L
    val floorStart = expr(s"unix_micros(ts) div $slideUs") * slideUs
    val starts4 = transform(sequence(lit(0L), lit(3L)), i => floorStart - i * slideUs)
    time("slide_serial") {
      Tables(spark, sfDir, "events")
        .select($"event_type", $"value", explode(starts4).as("ws"))
        .groupBy(date_format(timestamp_micros($"ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"window_start", $"event_type").count()
    }
    time("slide_repart") {
      Tables(spark, sfDir, "events").repartition(32)
        .select($"event_type", $"value", explode(starts4).as("ws"))
        .groupBy(date_format(timestamp_micros($"ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"window_start", $"event_type").count()
    }
    // minhash stage isolation
    val tok = split($"text", " ")
    val shArr = when(size(tok) >= 3, array_distinct(transform(
      sequence(lit(0), size(tok) - 3),
      i => concat_ws(" ", slice(tok, i + lit(1), lit(3)))))).otherwise(array())
    def sh0 = Tables(spark, sfDir, "documents").repartition(32)
      .select($"doc_id", shArr.as("shs"))
      .select($"doc_id", explode($"shs").as("s"))
    time("mh_explode_only") { sh0.count() }
    def shFlat = Tables(spark, sfDir, "documents").repartition(32)
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(' ')
        if (t.length < 3) Iterator.empty
        else {
          val seen = new scala.collection.mutable.HashSet[String]
          (0 to t.length - 3).iterator
            .map(i => t(i) + " " + t(i + 1) + " " + t(i + 2))
            .filter(seen.add)
            .map(s => (id, s))
        }
      }.toDF("doc_id", "s")
    time("mh_explode_flatmap") { shFlat.count() }
    val distinctOff = Tables(spark, sfDir, "documents").repartition(32)
      .select($"doc_id", explode(transform(
        sequence(lit(0), size(split($"text"," ")) - 3),
        i => concat_ws(" ", slice(split($"text"," "), i + lit(1), lit(3))))).as("s"))
    time("mh_explode_nodistinct") { distinctOff.count() }
    time("mh_md5") { sh0.withColumn("d", concat(md5($"s"), md5(concat(lit("x:"), $"s")))).count() }
    val mins16 = (0 until 16).map(i => min(substring($"d", 4 * i + 1, 4)).as(s"h$i"))
    time("mh_agg16") { sh0.withColumn("d", concat(md5($"s"), md5(concat(lit("x:"), $"s"))))
      .groupBy($"doc_id").agg(mins16.head, mins16.tail: _*).count() }
    time("mh_full") { graft.operators.DedupOps.minhashLsh(spark, sfDir).count() }
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_exp_sink").toString
    graft.sinks.Sinks.writePartitioned(
      Tables(spark, sfDir, "documents"), s"$sinkDir/docs", "lang")
    new java.io.File(s"$sinkDir/docs").listFiles().filter(_.isDirectory)
      .map(_.getName).sorted.foreach(d => println(s"SINK_DIR=$d"))
    val pruned = spark.read.parquet(s"$sinkDir/docs").filter($"lang" === "en")
    println(s"SINK_EN_ROWS=${pruned.count()}")
    println("SINK_PLAN_PRUNES=" + pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(lang"))
    spark.stop()
  }
}
