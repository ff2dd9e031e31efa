package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DedupOps
import graft.sinks.Sinks

/** CROSS-TIER UNIFIED INGEST GATE (s_unified_ingest, round 15) — the
  * composition the three per-tier dedup gates exist for: a real
  * training-data arrival is ONE document carrying several modalities
  * (text always; an embedding and/or a media payload when the producer
  * has them), and the admission question is "is this content new in
  * EVERY modality it carries?" — a paraphrase-resistant text twin, a
  * SemDeDup-near embedding, or a re-encoded media payload must each
  * alone sink the row, because training pays for the duplicate however
  * it re-enters.
  *
  * Semantics per tier are EXACTLY the tier gates' (zero new state or
  * rules — the `s_ingest_neardup` composition discipline one level up):
  *
  *  - text: [[ClusterMaint.applyBatch]] over (id, text); admit iff
  *    `is_new_cluster && cluster_id == id` (min-id canonical — the
  *    non-monotonic-id conjunction);
  *  - embedding (when present): [[SemanticMaint.applyBatch]] under the
  *    frozen quantizer, same canonical rule; rows WITHOUT an embedding
  *    pass this tier vacuously;
  *  - media (when present): [[MediaMaint.applyBatch]], same rule; a
  *    row whose payload is UNDECODABLE is NOT admitted — the
  *    dead-letter contract every media gate here carries (it gets no
  *    fingerprint, so "new in the media modality" is unverifiable);
  *    rows without a payload pass vacuously.
  *
  * Admission = the conjunction. Every tier STILL INDEXES its modality
  * for dropped rows (the maintainers' documented behavior), so the
  * per-tier stream ≡ batch equivalence contracts are untouched by the
  * composition, and a row dropped for one modality still sharpens the
  * other tiers' future candidate sets. THE CONSEQUENCE IS PERMANENT
  * EXCLUSION, stated as contract (r16 advice): a row rejected by ONE
  * modality has already indexed its OTHERS, so a later clean re-send
  * of the same content is rejected as a text/embedding twin of the
  * never-admitted first arrival — dead-lettered rows block their own
  * retries — and a re-send under a fresh id fares no better, because
  * its healthy modalities are twins of the first arrival's indexed
  * entries. This is deliberate: index-on-arrival is what keeps each
  * tier's stream state ≡ the batch recompute over everything SEEN
  * (not everything admitted), which is the equivalence the per-tier
  * specs pin, and for the training-dedup question it is usually the
  * right answer (the content DID arrive; a duplicate is a duplicate
  * whether its first carrier decoded). A deployment that instead
  * wants poisoned arrivals to be retryable must quarantine rows with
  * an undecodable payload UPSTREAM of this gate (decode-validate
  * before ingest) so they never index — the gate itself will not
  * forget a seen modality. Replay: each tier's
  * applyBatch is idempotent under foreachBatch replay and the result
  * lands as a batch_id-partitioned dynamic overwrite, so the composed
  * gate is replay-idempotent end to end.
  *
  * The three state paths are bootstrapped by the tiers' own `init`
  * verbs (the caller runs them over the historical corpus — each tier
  * may legitimately freeze different model state, e.g. the semantic
  * quantizer).
  *
  * Scale shape: the row stream forks into three column-pruned legs;
  * each leg pays its tier's documented per-batch bound (posting-probe /
  * cell-probe / band-probe joins — never corpus × batch), and the
  * conjunction is three id-keyed left-semi joins at batch grain.
  */
object UnifiedIngest {

  /** One micro-batch of the composed gate — exposed for direct batch
    * tests; [[start]] is the streaming entry. `rows` carries
    * (id BIGINT, text STRING, embedding ARRAY<FLOAT> nullable,
    * content BINARY nullable).
    */
  def applyBatch(rows: DataFrame, batchId: Long, textPath: String,
                 semPath: String, mediaPath: String,
                 textThreshold: Double = DedupOps.DefaultJaccardThreshold,
                 semThreshold: Double = 0.4, nassign: Int = 5,
                 maxHamming: Int = 3): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    val b = rows.localCheckpoint(false)
    def canonical(res: DataFrame, idCol: String): DataFrame =
      res.filter(col("is_new_cluster") && col("cluster_id") === col(idCol))
        .select(col(idCol).as("id"))
    val textOk = canonical(
      ClusterMaint.applyBatch(b.select($"id".as("doc_id"), $"text"),
        batchId, textPath, textThreshold), "doc_id")
    val withEmb = b.filter($"embedding".isNotNull)
    val semOk = canonical(
      SemanticMaint.applyBatch(
        withEmb.select($"id".as("vec_id"), $"embedding"),
        batchId, semPath, semThreshold, nassign), "vec_id")
      .union(b.filter($"embedding".isNull).select($"id"))
    val withMedia = b.filter($"content".isNotNull)
    val mediaOk = canonical(
      MediaMaint.applyBatch(
        withMedia.select($"id".as("media_id"), $"content"),
        batchId, mediaPath, maxHamming), "media_id")
      .union(b.filter($"content".isNull).select($"id"))
    b.join(textOk, Seq("id"), "left_semi")
      .join(semOk, Seq("id"), "left_semi")
      .join(mediaOk, Seq("id"), "left_semi")
  }

  /** Streaming entry: admitted rows land under `resultPath/batch_id=N`
    * (idempotent dynamic overwrite, the maintainer convention).
    */
  def start(rows: DataFrame, textPath: String, semPath: String,
            mediaPath: String, resultPath: String, checkpoint: String,
            textThreshold: Double = DedupOps.DefaultJaccardThreshold,
            semThreshold: Double = 0.4, nassign: Int = 5,
            maxHamming: Int = 3): StreamingQuery =
    Sinks.streamForeachBatch(rows, checkpoint, "append") { (b, id) =>
      MaintCore.writeBatch(
        applyBatch(b, id, textPath, semPath, mediaPath, textThreshold,
          semThreshold, nassign, maxHamming),
        resultPath, id)
    }
}
