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
  }

  /** No NULLs in `column`. */
  final case class NotNull(column: String) extends Constraint {
    val name = "not_null"
    private[operators] def metric: Column =
      sum(when(col(column).isNull, 1L).otherwise(0L))
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
  }

  /** `column` drawn from a closed value set; NULLs are violations (an
    * unknown category, not an absent one).
    */
  final case class Accepted(column: String, values: Seq[String])
    extends Constraint {
    val name = "accepted_values"
    private[operators] def metric: Column =
      sum(when(col(column).isin(values: _*), 0L).otherwise(1L))
  }

  /** Arbitrary row predicate that must hold everywhere. */
  final case class Satisfies(column: String, predicate: Column,
                             label: String = "satisfies")
    extends Constraint {
    val name = label
    private[operators] def metric: Column =
      sum(when(predicate, 0L).otherwise(1L))
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
}
