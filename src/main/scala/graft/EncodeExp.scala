package graft

import org.apache.spark.sql.functions._

/** A/B decomposition for the tokenizer APPLY operators (r20, VERDICT r19
  * item 4): `q_bpe_encode` / `q_unigram_encode` pay their training loop
  * by contract; the question is the apply side. Two forms, interleaved
  * in ONE JVM (the BpeExp protocol, weather-free):
  *
  *   occ_form  — the r13–r19 shape: one corpus scan, the merge/Viterbi
  *               fold once per word OCCURRENCE, straight-line rollup;
  *   word_form — the r20 shape (`TextOps.bpeEncode`/`unigramEncode`):
  *               per-(source, word) frequency table materialized from a
  *               prep thread WHILE training runs (§2.6), fold once per
  *               DISTINCT word, weighted rollup + doc-spine join.
  *
  * Both forms produce identical rows (Verify-differ checked); at 100 TB
  * the fold count is the difference between corpus occurrences and the
  * Heaps-sublinear vocabulary. This harness prices the trade at fixture
  * scale, where the fold is cheap and the added exchange + join are not
  * free. Counters sample after a listener-bus settle (r19 ADVICE).
  *
  *   SPARK_DRIVER_MEM=89g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     SPARK_GRAFT_CPUS=32 sbt "runMain graft.EncodeExp"
  */
object EncodeExp {
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
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
        }
      })
    // the r13–r19 per-occurrence BPE apply, verbatim
    def bpeOcc(): Long = {
      val merges: Seq[(String, String)] =
        operators.TextOps.bpeMerges(spark, sfDir).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
      Tables(spark, sfDir, "documents")
        .select($"source", $"text")
        .as[(String, String)]
        .map { case (source, text) =>
          val words = text.split("\\s+").filter(_.nonEmpty)
          var nSyms = 0L
          var nToks = 0L
          words.foreach { w =>
            val (sy, tk) = operators.TextOps.bpeApply(w, merges)
            nSyms += sy; nToks += tk
          }
          (source, 1L, words.length.toLong, nSyms, nToks)
        }
        .toDF("source", "d", "w", "sy", "tk")
        .groupBy($"source")
        .agg(sum($"d").cast("long").as("n_docs"),
          sum($"w").cast("long").as("n_words"),
          sum($"sy").cast("long").as("n_symbols"),
          sum($"tk").cast("long").as("n_bpe_tokens"))
        .withColumn("compression",
          round($"n_symbols".cast("double") / $"n_bpe_tokens", 4))
        .orderBy($"source").count()
    }
    def bpeWord(): Long =
      operators.TextOps.bpeEncode(spark, sfDir).count()
    // the r13–r19 per-occurrence unigram apply, verbatim
    def uniOcc(): Long = {
      val table: Map[String, Double] =
        operators.TextOps.unigramTrain(spark, sfDir).collect()
          .map(r => r.getString(1) -> r.getDouble(3)).toMap
      val unk = table.values.min - 1.0
      Tables(spark, sfDir, "documents")
        .select($"source", $"text")
        .as[(String, String)]
        .map { case (source, text) =>
          val ws = text.split("\\s+").filter(_.nonEmpty)
          var nChars = 0L
          var nPieces = 0L
          ws.foreach { w =>
            nChars += w.length
            nPieces += operators.TextOps
              .viterbiPieces(w, table, 4, unk).length
          }
          (source, 1L, ws.length.toLong, nChars, nPieces)
        }
        .toDF("source", "d", "w", "ch", "pc")
        .groupBy($"source")
        .agg(sum($"d").cast("long").as("n_docs"),
          sum($"w").cast("long").as("n_words"),
          sum($"ch").cast("long").as("n_chars"),
          sum($"pc").cast("long").as("n_pieces"))
        .withColumn("compression",
          round($"n_chars".cast("double") / $"n_pieces", 4))
        .orderBy($"source").count()
    }
    def uniWord(): Long =
      operators.TextOps.unigramEncode(spark, sfDir).count()
    def time(tag: String, f: => Long): Unit = {
      val t0 = System.nanoTime()
      val j0 = jobs.get()
      val c = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120)
      println(f"EXP[$tag] $secs%.3f s rows=$c jobs=${jobs.get() - j0}")
    }
    time("occ_warm", bpeOcc()); time("word_warm", bpeWord())
    time("uocc_warm", uniOcc()); time("uword_warm", uniWord())
    for (r <- 1 to 5) {
      time(s"occ_$r", bpeOcc())
      time(s"word_$r", bpeWord())
      time(s"uocc_$r", uniOcc())
      time(s"uword_$r", uniWord())
    }
    spark.stop()
  }
}
