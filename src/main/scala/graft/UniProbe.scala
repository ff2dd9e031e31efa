package graft

/** Production-shaped-vocab scale probe for the unigram-LM tokenizer
  * (r13 verdict item 6): the graded q_unigram_train/encode run at
  * vocabSize=40 — this times the pair at vocabSize=400 (seedFactor
  * held at 4, so the seed inventory is ~1600 multis + charset: the
  * "driver rows ~2k — still bounded" claim, asserted live through the
  * emProbe seam) at sf0.1 and the seeded sf1 replica, printing the
  * same scaling-exponent rows as [[ScaleProbe]] plus the EM-round
  * count and max piece-table size at each scale. A same-session
  * q_dedup_clusters control calibrates the machine-day factor (its
  * committed exponent is 0.50 clean, 0.75–0.90 on a loaded box).
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=89g \
  *     sbt "runMain graft.UniProbe /tmp/sf1"
  */
object UniProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val src = "/root/testdata/sf0.1"
    val spark = GraftSession.builder(GraftSession.benchCpus)
      .config("spark.graft.cacheTables", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rt = Runtime.getRuntime
    println(s"ENV master=${spark.sparkContext.master} " +
      s"max_heap_mb=${rt.maxMemory / (1024 * 1024)} " +
      s"cpus_env_set=${GraftSession.envCpusSet}")
    require(new java.io.File(s"$sf1/_GENERATED").exists(),
      s"sf1 replica missing at $sf1 - run graft.ScaleProbe first")

    def med3(f: => Long): Double = {
      f; // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }
    def probeTrain(dir: String): (Double, Int, Int) = {
      var rounds = 0
      var maxPieces = 0
      val t = med3 {
        rounds = 0; maxPieces = 0
        operators.TextOps.unigramTrain(spark, dir, vocabSize = 400,
          emProbe = (r, n) => {
            rounds = math.max(rounds, r); maxPieces = math.max(maxPieces, n)
          }).count()
      }
      (t, rounds, maxPieces)
    }
    def num(d: Double): String = java.lang.String.format(
      java.util.Locale.ROOT, "%.3f", Double.box(d))

    val ctrl0 = med3(SparkEntry.queries("q_dedup_clusters")(spark, src).count())
    val ctrl1 = med3(SparkEntry.queries("q_dedup_clusters")(spark, sf1).count())
    println(s"""PROBE {"q":"q_dedup_clusters(control)","t_sf01":${num(ctrl0)},""" +
      s""""t_sf1":${num(ctrl1)},"exp":${num(math.log10(ctrl1 / ctrl0))}}""")

    val (t0, r0, p0) = probeTrain(src)
    val (t1, r1, p1) = probeTrain(sf1)
    println(s"""PROBE {"q":"unigram_train@v400","t_sf01":${num(t0)},""" +
      s""""t_sf1":${num(t1)},"exp":${num(math.log10(t1 / t0))},""" +
      s""""rounds_sf01":$r0,"rounds_sf1":$r1,""" +
      s""""max_pieces_sf01":$p0,"max_pieces_sf1":$p1}""")

    val e0 = med3(operators.TextOps
      .unigramEncode(spark, src, vocabSize = 400).count())
    val e1 = med3(operators.TextOps
      .unigramEncode(spark, sf1, vocabSize = 400).count())
    println(s"""PROBE {"q":"unigram_encode@v400","t_sf01":${num(e0)},""" +
      s""""t_sf1":${num(e1)},"exp":${num(math.log10(e1 / e0))}}""")
    spark.stop()
  }
}
