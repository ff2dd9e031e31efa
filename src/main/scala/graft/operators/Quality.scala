package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints, verified in ONE aggregate pass
  * (the Deequ-style contract gate an ingest pipeline runs before
  * accepting a new data drop). Every constraint compiles to a metric
  * expression inside a single `df.agg(...)`, so checking N constraints
  * over 100 TB costs one scan with map-side partial aggregation — never
  * one job per rule. Only the uniqueness rule adds shuffle weight (exact
  * distinct), and only when present.
  *
  * The verdict comes back as a small DataFrame (constraint, column,
  * violations, passed) built from the single collected metrics row —
  * constraint counts are human-sized by definition, so the driver-side
  * materialization is O(rules), not O(data).
  */
object Quality {

  sealed trait Constraint {
    def name: String
    def column: String
    /** Number of violating rows (0 ⇒ passed). */
    private[operators] def metric: Column
    /** Row-level violation predicate, where the constraint is about a
      * single row (None for dataset-level constraints like [[Unique]]).
      */
    private[operators] def rowViolation: Option[Column] = None
  }

  /** No NULLs in `column`. */
  final case class NotNull(column: String) extends Constraint {
    val name = "not_null"
    private[operators] def metric: Column =
      sum(when(col(column).isNull, 1L).otherwise(0L))
    override private[operators] def rowViolation: Option[Column] =
      Some(col(column).isNull)
  }

  /** `column` is a key: every value appears exactly once. Violations =
    * rows beyond the first of each duplicated value (so a clean column
    * reports 0, one duplicated pair reports 1). NULL is treated as one
    * key value — `count`/`countDistinct` both drop NULLs, so without the
    * explicit NULL term a column that is mostly NULL would pass silently;
    * here the second and every later NULL row counts as a violation.
    * NULL *presence* is still [[NotNull]]'s job — pair them for a full
    * primary-key check.
    */
  final case class Unique(column: String) extends Constraint {
    val name = "unique"
    private[operators] def metric: Column = {
      val nulls = sum(when(col(column).isNull, 1L).otherwise(0L))
      count(col(column)) - countDistinct(col(column)) +
        greatest(nulls - lit(1L), lit(0L))
    }
  }

  /** Numeric `column` within [lo, hi]; NULLs are not range violations
    * (pair with [[NotNull]] to forbid them).
    */
  final case class InRange(column: String, lo: Double, hi: Double)
    extends Constraint {
    val name = "in_range"
    private[operators] def metric: Column =
      sum(when(col(column).isNotNull &&
        (col(column) < lo || col(column) > hi), 1L).otherwise(0L))
    override private[operators] def rowViolation: Option[Column] =
      Some(col(column).isNotNull && (col(column) < lo || col(column) > hi))
  }

  /** `column` drawn from a closed value set; NULLs are violations (an
    * unknown category, not an absent one).
    */
  final case class Accepted(column: String, values: Seq[String])
    extends Constraint {
    val name = "accepted_values"
    private[operators] def metric: Column =
      sum(when(col(column).isin(values: _*), 0L).otherwise(1L))
    override private[operators] def rowViolation: Option[Column] =
      Some(!col(column).isin(values: _*) || col(column).isNull)
  }

  /** Arbitrary row predicate that must hold everywhere. */
  final case class Satisfies(column: String, predicate: Column,
                             label: String = "satisfies")
    extends Constraint {
    val name = label
    private[operators] def metric: Column =
      sum(when(predicate, 0L).otherwise(1L))
    override private[operators] def rowViolation: Option[Column] =
      Some(!coalesce(predicate, lit(false)))
  }

  /** Run every constraint in one aggregate pass; returns one row per
    * constraint: (constraint, column, violations, passed), plus the
    * scanned row count under constraint name `_row_count`.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    val metrics = count(lit(1)).as("_n") +:
      constraints.zipWithIndex.map { case (c, i) =>
        coalesce(c.metric, lit(0L)).cast("long").as(s"_m$i")
      }
    val row = df.agg(metrics.head, metrics.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    val out = ("_row_count", "", row.getLong(0), true) +:
      constraints.zipWithIndex.map { case (c, i) =>
        val v = row.getLong(i + 1)
        (c.name, c.column, v, v == 0L)
      }
    out.toDF("constraint", "column", "violations", "passed")
  }

  /** True iff every constraint passed (row count row is informational). */
  def passed(report: DataFrame): Boolean =
    report.filter(!col("passed")).isEmpty

  /** Row-level admission gate — [[check]]'s per-row companion: split a
    * batch into (clean, rejects) where a reject carries the names of
    * EVERY constraint it violates (`violations ARRAY<STRING>`) — the
    * dead-letter convention the webhook sources use, applied to
    * constraint checking. All predicates evaluate in one projection
    * (no shuffle, no extra scan: the split is two filters over the same
    * codegen'd stage), so gating a 100 TB drop costs the scan it
    * already needed. Dataset-level constraints ([[Unique]]) have no
    * per-row meaning and are rejected loudly — run [[check]] for those.
    * Streaming use: call inside `foreachBatch` and route each half to
    * its sink.
    */
  def split(df: DataFrame, constraints: Seq[Constraint])
  : (DataFrame, DataFrame) = {
    require(constraints.nonEmpty, "no constraints given")
    // withColumn REPLACES an existing column of the same name — a batch
    // already carrying either name would silently lose it in the clean
    // half (the r8 advice finding); the reject contract owns "violations"
    require(!df.columns.contains("_violations") &&
      !df.columns.contains("violations"),
      "input must not carry a violations/_violations column — " +
        "rename it before gating")
    val rowPreds = rowPredicates(constraints)
    val tags = array(rowPreds.map { case (label, p) =>
      when(p, lit(label)) }: _*)
    val tagged = df.withColumn("_violations",
      filter(tags, _.isNotNull))
    (tagged.filter(size(col("_violations")) === 0).drop("_violations"),
      tagged.filter(size(col("_violations")) > 0)
        .withColumnRenamed("_violations", "violations"))
  }

  /** (label, per-row violation predicate) for every row-level
    * constraint — the seam [[split]] shares with the streaming quality
    * monitor (`StreamOps.qualityMonitor`), so the two gates can never
    * drift on what counts as a violation. Dataset-level constraints
    * ([[Unique]]) are rejected loudly.
    */
  private[graft] def rowPredicates(constraints: Seq[Constraint])
  : Seq[(String, Column)] =
    constraints.map { c =>
      c.rowViolation match {
        case Some(p) => (s"${c.name}(${c.column})", p)
        case None => throw new IllegalArgumentException(
          s"${c.name} is a dataset-level constraint — use check()")
      }
    }

  /** One-pass column profile — the "what is this data drop" look a lake
    * operator takes before writing constraints at all: per column, null
    * count/rate, approximate distinct count (HLL++, mergeable, never an
    * exact-distinct shuffle), min/max (as strings so one report schema
    * serves every column type), and the mean for numeric columns. Like
    * [[check]], EVERY metric for EVERY column compiles into one
    * `df.agg(...)` — profiling 50 columns of 100 TB costs one scan with
    * map-side partials, not 50 jobs — and the driver materializes one
    * row per column, O(columns) regardless of data.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "no columns to profile")
    val fields = df.schema.fields.map(f => f.name -> f).toMap
    def isNumeric(c: String) = fields(c).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val metrics = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(
        // sum() over ZERO rows is NULL, and getLong would unbox it before
        // the n==0 guard below can apply — coalesce keeps the empty-input
        // profile reachable (count/approx_count_distinct return 0, min/
        // max/avg NULLs are already read through Option/isNullAt)
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long"),
        approx_count_distinct(col(c)).cast("long"),
        min(col(c)).cast("string"),
        max(col(c)).cast("string"),
        (if (isNumeric(c)) round(avg(col(c)), 4)
         else lit(null).cast("double")))
    }
    val row = df.agg(metrics.head, metrics.tail: _*).head()
    val n = row.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    cols.zipWithIndex.map { case (c, i) =>
      val b = 1 + i * 5
      val nulls = row.getLong(b)
      (c, fields(c).dataType.simpleString, n, nulls,
        if (n == 0) 0.0 else math.rint(nulls.toDouble / n * 1e6) / 1e6,
        row.getLong(b + 1),
        Option(row.getAs[String](b + 2)),
        Option(row.getAs[String](b + 3)),
        if (row.isNullAt(b + 4)) None else Some(row.getDouble(b + 4)))
    }.toDF("column", "dtype", "n_rows", "n_null", "null_rate",
      "approx_distinct", "min", "max", "mean")
  }
}
