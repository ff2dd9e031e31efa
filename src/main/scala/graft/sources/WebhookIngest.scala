package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.sinks.Sinks

/** Payload parsing for the webhook stream, with dead-lettering
  * (SURVEY.md §1.3: "malformed → null row / dead-letter").
  *
  * A malformed body must neither kill the pipeline nor silently flow on as
  * an all-null row: it is routed to a dead-letter lane carrying the RAW
  * payload (for replay after the producer bug is fixed) plus a reason tag.
  *
  * == Schema evolution contract (spec-pinned in WebhookSourceSpec) ==
  * The per-topic schema is DECLARED in code, and producers upgrade on
  * their own clock, so the parse behavior under drift is part of the
  * API:
  *   - producer ADDS a field → ignored (`from_json` drops unknown keys):
  *     consumers upgrade by adding the nullable field to their declared
  *     schema when ready — old payloads then read it as null.
  *   - producer DROPS a field (or old payloads predate it) → that field
  *     is NULL in the parsed row; required-ness is a downstream contract
  *     (`Quality.NotNull`), not a parse failure.
  *   - producer RETYPES a field (value that can't convert) → the whole
  *     delivery DEAD-LETTERS (PERMISSIVE sets the corrupt column on any
  *     field-level parse failure): silent null-out of a retyped column
  *     would corrupt aggregates downstream, so type drift is loud.
  * Versioning convention: within a topic, schema changes must be
  * ADDITIVE (new nullable fields). Removing or retyping a field is a new
  * topic (`orders` → `orders.v2`) routed to its own declared schema —
  * the queue carries the topic per delivery precisely so readers can
  * route versions independently.
  */
object WebhookIngest {

  /** Split one DataFrame of raw deliveries into (parsed, deadLetters).
    * Pure column logic — works identically on a batch DataFrame or inside
    * a micro-batch.
    *
    * Detection uses PERMISSIVE mode's corrupt-record column, not a
    * null-struct check: `from_json` answers malformed input with a struct
    * of all-null FIELDS (so the struct itself is non-null), while the
    * corrupt column is populated exactly when parsing failed. A parseable
    * body with missing fields is a schema question for downstream, not a
    * dead-letter.
    */
  def parseOrDeadLetter(raw: DataFrame, payloadSchema: StructType)
  : (DataFrame, DataFrame) = {
    require(!payloadSchema.fieldNames.contains(CorruptCol))
    val withCorrupt = payloadSchema.add(CorruptCol, "string")
    val parsed = raw.withColumn("e",
      from_json(col("body"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> CorruptCol, "mode" -> "PERMISSIVE")))
    // two dead shapes: unparseable body → corrupt column set; empty /
    // whitespace / literal-null body → from_json returns a NULL STRUCT
    // (no record, no corrupt marker) which would otherwise slip into the
    // good lane as an all-null row
    val isDead = col(s"e.$CorruptCol").isNotNull || col("e").isNull
    val good = parsed.filter(!isDead)
      .select(col("seq"), col("ingest_ts"), col("topic"), col("e.*"))
      .drop(CorruptCol)
    val dead = parsed.filter(isDead)
      .select(col("seq"), col("ingest_ts"), col("topic"), col("body"),
        when(col("e").isNull, "empty_body").otherwise("malformed_json")
          .as("reason"))
    (good, dead)
  }

  private val CorruptCol = "_graft_corrupt"

  /** Run the webhook stream as ONE query that fans each micro-batch out to
    * a good sink and a dead-letter sink.
    *
    * Deliberately a single foreachBatch query, not two writeStream queries
    * over the same source: each streaming query commits offsets
    * independently, and the webhook queue truncates on commit — a second
    * query racing the first's commit could find its slice already
    * truncated (data loss). One query → one offset log → at-least-once
    * holds for BOTH lanes.
    */
  def streamWithDeadLetter(raw: DataFrame, payloadSchema: StructType,
                           checkpoint: String)
                          (goodSink: DataFrame => Unit)
                          (deadSink: DataFrame => Unit): StreamingQuery =
    Sinks.streamForeachBatch(raw, checkpoint) { (batch, _) =>
      val (good, dead) = parseOrDeadLetter(batch, payloadSchema)
      goodSink(good)
      deadSink(dead)
    }
}
