package graft

import org.apache.spark.sql.SparkSession

/** Single place the engine's session configuration lives. Every entry point
  * (Bench/Verify/Smoke/Sql/Explain/…) and the test harness build their
  * session through here so query-path code never mutates session state
  * (`spark.conf.set` inside an operator is a global side effect — any
  * concurrent query planning against the same session would observe it).
  *
  * Config notes:
  *  - `nanosAsLong`: historical drops of `events.parquet` carried
  *    TIMESTAMP(NANOS), which Spark 4 refuses to read natively
  *    ([PARQUET_TYPE_ILLEGAL]); with this set they arrive as longs and
  *    `Tables.events` converts to µs. The 2026-08-13 regen ships
  *    TIMESTAMP(MICROS, isAdjustedToUTC=false) instead (arrives as NTZ,
  *    also normalized in `Tables.events`), but the flag stays so an older
  *    ns drop remains readable. Must be set before the first read, hence
  *    here.
  *  - `shuffle.partitions` = task width: on the local[N] harness one
  *    partition per core; on a real cluster this seam is where you'd size
  *    partitions to executor memory (SCALE.md §1).
  *  - `spark.graft.cacheTables`: opt-in hot-table cache (see Tables).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // native functions (cosine_sim) land in the Catalyst registry at
      // session build — queries reach them via call_function / SQL with no
      // runtime registry mutation. NOTE: extensions only apply at session
      // CREATION; getOrCreate against a live session ignores them (use
      // GraftFunctions.register there).
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE is a runtime re-planner for plans whose compile-time stats are
      // wrong. Every graded query pins its join strategy explicitly
      // (broadcast hints on dim sides), so at local-harness scale AQE has
      // nothing left to fix and only pays per-exchange query-stage
      // materialization (~50 ms/query measured; Experiment.scala). This
      // builder is the LOCAL seam — it hardcodes master(local[N]) — so the
      // setting travels with it; a cluster deployment submits with AQE on
      // for skew-join splitting and runtime coalescing (SCALE.md).
      .config("spark.sql.adaptive.enabled", "false")
      // hot-table cache tuning: the graded working set is ~30 MB, so trade
      // memory for scan speed — no per-batch LZ4 decode in the hot path,
      // and bigger batches keep the columnar-to-row loop in one stride
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.inMemoryColumnarStorage.batchSize", "65536")

  /** Width from the driver contract's env var (driver exports 32). */
  def envCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  /** Whether the width came from the environment or the silent default.
    * Measurement mains MUST check this: round 11's close bench ran in a
    * shell that never exported SPARK_GRAFT_CPUS, silently recorded
    * local[4]/8 GB, and produced headline ratios confounded by the
    * parallelism change (VERDICT r11 "What's wrong #1").
    */
  def envCpusSet: Boolean = sys.env.contains("SPARK_GRAFT_CPUS")

  /** Width for MEASUREMENT entry points (Bench/TimeQ/ScaleProbe): the
    * env var if exported, else the CONTRACT config (local[32]) with a
    * loud warning — never the silent local[4] fallback that poisoned the
    * round-11 close records. A bare-shell bench now measures the right
    * config; the warning + the record's env stamp make the provenance
    * auditable either way.
    */
  def benchCpus: String =
    sys.env.get("SPARK_GRAFT_CPUS").getOrElse {
      System.err.println(
        "[graft] WARNING: SPARK_GRAFT_CPUS is unset - defaulting to the " +
          "contract config local[32]. Export SPARK_GRAFT_CPUS explicitly " +
          "for a provenance-clean record.")
      "32"
    }
}
