package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: times every SparkEntry.queries entry on SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Methodology mirrors BASELINE.md — warm
  * steady-state first. The baseline's DuckDB (C++) reaches steady state
  * after its single cache-warming run; a JVM does not — C2 compilation of
  * the generated stage code keeps landing for several executions
  * (measured: q_agg_pricing 0.41 s on run 2 vs 0.27 s steady) — so each
  * query warms until the run-over-run improvement plateaus, the JVM-side
  * analog of the baseline's warm page/buffer cache.
  *
  * Post-plateau, each query is timed THREE times and reports the MEDIAN,
  * with the [min, max] envelope beside it under "spread". Single-shot
  * timings on this harness drift 15-100 % between same-code runs (machine
  * weather — documented every round since ROUND5.md), which made
  * round-over-round BENCH diffs unreadable: a regression could not be
  * told from noise without hand re-profiling. The median damps one bad
  * run per query; the recorded envelope lets the differ
  * (tools/bench_diff.py, policy in BENCH_TOLERANCE.json) separate "the
  * machine was slow" from "this query got slower". Timing covers full
  * computation via .count() per the driver contract.
  *
  * The three timed samples are taken as three FULL SWEEPS over the whole
  * query inventory (warm all, then time q1..qN, q1..qN, q1..qN) rather
  * than back-to-back per query. Back-to-back sampling concentrated any
  * transient driver-machine load onto whichever queries happened to run
  * inside the loaded window: the round-10 record showed q_basket_pairs
  * at 5.8x its round-8 time while a warm re-measure the same day sat at
  * its old level — every flagged-slow query was in the first ~15 of the
  * alphabetical order, every flagged-fast one mid/late alphabet. With
  * interleaved sweeps a loaded window dilates ALL queries a little, and
  * the per-query median over sweeps spaced minutes apart damps it.
  *
  * Within a sweep each sample is run 2 of a PAIR (one untimed run, then
  * the timed one). Cycling 87 queries between samples thrashes Spark's
  * fixed-size generated-code cache (~100 compiled classes; the inventory
  * needs several hundred), so a naively interleaved sample pays Janino
  * recompilation on every codegen stage — measured as a uniform
  * +0.2-0.3 s on every sub-second query (first interleaved record ran
  * 51 s vs 35 s back-to-back with per-query TimeQ unchanged). The
  * untimed first run of the pair eats the recompilation; the timed run
  * sees the warm-cache conditions the old protocol measured, while the
  * sweep structure still spreads machine weather across the alphabet.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // benchCpus, not envCpus: a bare shell must measure the CONTRACT
    // config (local[32]), never a silent local[4] (the r11 close-record
    // confound). The env stamp below records whether the width was
    // explicit so bench_diff can refuse provenance-unclean installs.
    // cold-I/O seam (r20, VERDICT item 2): SPARK_GRAFT_CACHE_TABLES=false
    // runs the identical sweep with the hot-table cache off, so every
    // timed query pays its parquet scans — the companion record that
    // makes the warm-table share of each row measurable. Default (unset)
    // is the historical warm protocol; the env stamp records which ran,
    // and bench_diff's env gate refuses to compare across the two.
    val cacheTables =
      sys.env.getOrElse("SPARK_GRAFT_CACHE_TABLES", "true")
    val spark = GraftSession.builder(GraftSession.benchCpus)
      .config("spark.graft.cacheTables", cacheTables)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
    : Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // Sweep 0 — untimed warmups, per query until the run-over-run
    // improvement plateaus (JMH-style steady-state detection, ≤4 runs):
    // cheap fully-codegen'd queries settle after one, but the typed hot
    // loops (the md5 signature passes, the IVF/PQ cogroups) keep dropping
    // through execution ~4-5 as C2 recompiles them (measured: q_ann_ivfpq
    // 6.6 → 0.87 → 0.74 → 0.72 → 0.60 s) — a fixed warmup count times
    // those mid-slope, and driver-machine load multiplies the error.
    val warmOk = ordered.map { case (name, fn) =>
      var w = timeOnce(fn)
      var prev = Double.MaxValue
      var n = 1
      while (w >= 0 && n < 4 && w > 0.4 && w < prev * 0.85) {
        prev = w; w = timeOnce(fn); n += 1
      }
      name -> (w >= 0)
    }.toMap
    // Sweeps 1-3 — one timing per query per sweep, whole inventory per
    // sweep, so the three samples for any query are spaced minutes apart.
    val samples = collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to 3; (name, fn) <- ordered if warmOk(name)) {
      timeOnce(fn) // re-warm pair run: absorbs codegen-cache recompilation
      samples(name) = timeOnce(fn) :: samples(name)
    }
    val results = ordered.map { case (name, _) =>
      val runs = samples(name)
      if (!warmOk(name) || runs.exists(_ < 0)) name -> (-1.0, -1.0, -1.0)
      else {
        val s = runs.sorted
        name -> (s(1), s(0), s(2)) // (median, min, max)
      }
    }
    val qs = results.map { case (k, (med, _, _)) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, (_, lo, hi)) => "\"" + k + "\":[" + lo + "," + hi + "]" }
      .mkString("{", ",", "}")
    // failed queries report -1 per-query but must not shrink the headline
    // total (a failure would otherwise make the run look FASTER)
    val total = results.collect { case (_, (med, _, _)) if med >= 0 => med }.sum
    // machine fingerprint: driver-vs-local deltas have run 1.5-4x across
    // rounds; recording cores/heap/master/cache makes them attributable.
    // "cores" is the MACHINE (availableProcessors); "bench_cpus" is the
    // parsed master width — the r19 c8 scaling record stamped cores=32
    // while correctly running local[8], which read as config-ignored.
    val rt = Runtime.getRuntime
    val env = s""""env":{"cores":${rt.availableProcessors},""" +
      s""""bench_cpus":${GraftSession.benchCpus},""" +
      s""""max_heap_mb":${rt.maxMemory / (1024 * 1024)},""" +
      s""""master":"${spark.sparkContext.master}",""" +
      s""""cpus_env_set":${GraftSession.envCpusSet},""" +
      s""""cache_tables":${spark.conf.get("spark.graft.cacheTables")},""" +
      s""""aqe":${spark.conf.get("spark.sql.adaptive.enabled")}}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""spread":$spread,"runs_per_query":3,"stat":"median",""" +
        s""""sampling":"interleaved-sweeps-paired",""" +
        s""""sf":"$sfDir",$env}"""
    // The lossless record goes to the FILE; the full line stopped being
    // stdout-parseable rounds ago (the driver's capture keeps only the
    // last ~2000 chars and BENCH_r01..r19 all show parsed:null; the 171
    // query names alone sum to 2550 chars, so no line carrying the whole
    // map can ever fit that window). Write the file FIRST, then print a
    // single compact contract line — medians only, 3-decimal precision,
    // no spread/env — as the LAST stdout byte, so any parser that reads
    // the last JSON line of full stdout (or any capture window >= ~4.2 KB)
    // gets the complete object, and a 2000-char tail still shows the
    // total/sf/master suffix intact.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $out: $e")
    }
    def d3(v: Double): String =
      if (v < 0) "-1" else "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs3 = results.map { case (k, (med, _, _)) => "\"" + k + "\":" + d3(med) }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${d3(total)},"unit":"sec",""" +
        s""""queries":$qs3,"sf":"$sfDir",""" +
        s""""bench_cpus":${GraftSession.benchCpus},""" +
        s""""master":"${spark.sparkContext.master}",""" +
        s""""full_record":"$out"}"""
    spark.stop()
    // Write the contract line to the REAL process stdout (FileDescriptor
    // FD 1), not through println: under `sbt runMain` System.out is
    // redirected into sbt's logger, which prefixes every line with
    // "[info] " — so no round's stdout line ever started with '{' and a
    // JSON parse of any captured line fails regardless of length. The
    // direct FD write bypasses the logger and lands unprefixed.
    val fd = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    fd.println(compact)
    fd.flush()
  }
}
