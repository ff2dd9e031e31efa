package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window-function inventory (SURVEY.md §2.5).
  *
  * All windows partition by a key (custkey / user_id) — state for one key
  * fits one task, so these scale horizontally with the key cardinality; the
  * only shuffle is the hash partition on the window key.
  *
  * Ordering inside every window carries an explicit unique tie-break
  * (o_orderkey / event_id) so results are deterministic across engines.
  * `row_number` is cast to long: Spark yields IntegerType, DuckDB BIGINT.
  */
object Windows {

  /** Top-3 orders per customer by totalprice (rank-per-group pattern). */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** Running SUM(value) per user ordered by event time. Rounded to 2
    * decimals: DuckDB computes frame sums with a segment tree, Spark
    * sequentially — float accumulation order differs.
    */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .select($"user_id", $"event_id",
        round(sum($"value").over(w), 2).as("running_value"))
      .orderBy($"user_id", $"event_id")
  }

  /** Batch sessionization: 30-minute-gap sessions via lag + cumulative sum
    * of gap-breaks, then per-session aggregation. The streaming twin is
    * `session_window` in graft.streaming.StreamOps.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum($"new_sess").over(cum).cast("long"))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }
}
