package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{DedupOps, Multimodal}
import graft.sinks.Sinks

/** STREAMING MEDIA (perceptual-tier) CLUSTER MAINTENANCE
  * (s_media_maint) — the third tier of the [[MaintCore]] family,
  * completing the symmetry: [[ClusterMaint]] maintains the n-gram text
  * clusters, [[SemanticMaint]] the embedding clusters, this the
  * `q_media_clusters` families — arriving media gets its perceptual
  * cluster id at ingest time, a re-encode storm that bridges two
  * frozen families MERGES them exactly.
  *
  * Edge rule byte-shared with the batch query: the codec-dispatched
  * `Multimodal.mediaAnchors` fingerprint set (one hash for img/audio,
  * the K-min anchor set for video — one index row per anchor) and the
  * 4×16-bit band pigeonhole (`Multimodal.bandsOf` — the same expansion
  * `mediaDupPairs` joins on), exact `bit_count` verification at
  * `maxHamming` ≤ 3 between ANY anchor pair. Unlike the
  * text tier (arrival-time df caveat) and the embedding tier (frozen-
  * quantizer recall contract), this tier's incremental equivalence is
  * UNCONDITIONAL: the pigeonhole candidate rule is complete for
  * hamming ≤ 3 by construction, so stream ≡ a from-scratch
  * `mediaClustersOf` on the union corpus at EVERY micro-batch
  * boundary, merges included — spec-pinned with no fixture caveat.
  *
  * Scale shape: the index is stored PRE-BANDED — (codec, band, key,
  * media_id, phash_bits), 4 rows per anchor (≤16 per video, 4 per
  * img/audio blob), so the per-batch probe is one equi-join of the
  * batch's ≤16·|batch| band keys against the keyed index (n_codec/2¹⁶
  * expected rows per key — the LSH-band bound), never a re-band of
  * the stored corpus. Pixels/PCM decode in
  * the stateless hashing pass and never enter state; everything the
  * maintainer stores is 8-byte hashes and ids. Undecodable payloads
  * carry no hash, are excluded from clustering (exactly as the batch
  * audit excludes them), and belong to the dead-letter path.
  *
  * State layout under `path`:
  *   MEDIA_STATE_VERSION  (fingerprint-rule marker — [[StateVersion]])
  *   index/  batch_id=N/ (codec, band, key, media_id, phash_bits)
  *   assign/ batch_id=N/ (media_id, cluster_id)
  *   merges/ (old_id, new_id)
  */
object MediaMaint {

  private val StateSubs = Seq("index", "assign", "merges")
  private val IndexSchema =
    "codec STRING, band INT, key BIGINT, media_id BIGINT, phash_bits BIGINT"

  /** Fingerprint-rule + layout version of everything under `path`.
    * Bump whenever EITHER changes — stored hashes are only comparable
    * to live hashes computed under the same rule. History: 1 = r14
    * first-frame video hash; 2 = r15 single min-anchor; 3 = r16 K-min
    * multi-anchor rows (a video carries ≤4 index rows).
    */
  private[streaming] val StateVersion = 3

  /** Refuse cross-version state LOUDLY (r16 advice — the media mirror
    * of `SemanticMaint.checkLayout`): after a hash-rule upgrade, a
    * duplicate of a previously indexed video hashes differently and
    * would silently escape every media gate that probes the stale
    * index. A marker file `$path/MEDIA_STATE_VERSION` is written by
    * [[init]] (and by first [[applyBatch]] use on a fresh path); any
    * verb that finds STATE WITHOUT A MARKER (a pre-r16 deploy) or a
    * mismatched version throws instead of reading. Old state stores
    * only hashes, not pixels, so rule-N hashes cannot be re-derived in
    * place; the migration path is [[rehash]] with the retained corpus
    * (which preserves cluster identity), or delete + [[init]] (which
    * does not).
    */
  private def checkVersion(s: SparkSession, path: String,
                           createIfFresh: Boolean): Unit = {
    val fs = new Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$path/MEDIA_STATE_VERSION")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val v = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      if (v != StateVersion.toString)
        throw new IllegalStateException(
          s"MediaMaint state at $path was written under fingerprint-rule " +
            s"version $v; this build is version $StateVersion. Stored " +
            "hashes are not comparable across rules (a twin of an " +
            "indexed blob would silently escape) — run MediaMaint.rehash " +
            "with the retained corpus (keeps cluster ids), or delete " +
            "the state dir and re-init.")
    } else if (StateSubs.exists(sub =>
        fs.exists(new Path(s"$path/$sub")) ||
          fs.exists(new Path(s"$path/$sub.sealed"))))
      throw new IllegalStateException(
        s"MediaMaint state at $path carries no MEDIA_STATE_VERSION " +
          "marker (a pre-r16 deploy, or a rehash interrupted mid-" +
          "migration); its stored hashes are not trustworthy under " +
          s"the current rule (version $StateVersion) — run " +
          "MediaMaint.rehash with the retained corpus (keeps cluster " +
          "ids), or delete the state dir and re-init.")
    else if (createIfFresh) {
      val out = fs.create(marker, true)
      try out.write(StateVersion.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Bootstrap from the historical corpus (media_id, content): hash,
    * band, batch CC over the exact banded pairs. Batch id −1 marks the
    * bootstrap partition.
    */
  def init(media: DataFrame, path: String, maxHamming: Int = 3): Unit = {
    val s = media.sparkSession
    import s.implicits._
    checkVersion(s, path, createIfFresh = true)
    val hashes = Multimodal.hashesOf(media).localCheckpoint(false)
    val assign = DedupOps.clusterPairs(s,
        Multimodal.mediaDupPairs(hashes, maxHamming)
          .select($"ma".as("a"), $"mb".as("b")))
      .select($"doc_id".as("media_id"), $"cluster_id")
    MaintCore.writeBatch(Multimodal.bandsOf(hashes)
      .select($"codec", $"band", $"key", $"media_id", $"phash_bits"),
      s"$path/index", -1L)
    MaintCore.writeBatch(assign, s"$path/assign", -1L)
    MaintCore.writeEmptyMerges(s, path)
  }

  /** Current resolved assignments: insert-time cluster ids routed
    * through the merge map.
    */
  def assignments(s: SparkSession, path: String): DataFrame = {
    checkVersion(s, path, createIfFresh = false)
    MaintCore.assignments(s, path, "media_id", StateSubs)
  }

  /** Fold per-batch state partitions into the bootstrap partition —
    * the [[ClusterMaint.compact]] discipline (two-phase seal, crash-
    * recovered; run between micro-batches).
    */
  def compact(s: SparkSession, path: String): Unit = {
    checkVersion(s, path, createIfFresh = false)
    MaintCore.recover(s, path, StateSubs)
    MaintCore.seal(s, path, "index",
      MaintCore.readState(s, path, "index", IndexSchema))
    MaintCore.seal(s, path, "assign", assignments(s, path))
    MaintCore.writeEmptyMerges(s, path)
  }

  /** Apply one micro-batch of (media_id, content) blobs: returns every
    * DECODABLE batch blob's (media_id, cluster_id, is_new_cluster) AND
    * advances the state — idempotent under foreachBatch replay (the
    * [[ClusterMaint.applyBatch]] contract).
    */
  def applyBatch(newMedia: DataFrame, batchId: Long, path: String,
                 maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"MediaMaint: 4-band pigeonhole covers maxHamming<=3, got $maxHamming")
    val s = newMedia.sparkSession
    import s.implicits._
    checkVersion(s, path, createIfFresh = true)
    MaintCore.recover(s, path, StateSubs)
    val newH = Multimodal.hashesOf(newMedia).localCheckpoint(false)
    // distinct: hashesOf is at ANCHOR grain since r16 (≤4 rows per
    // video) and the CC advance needs each node once
    val newIds = newH.select($"media_id").distinct().localCheckpoint(false)
    val newBands = Multimodal.bandsOf(newH)
    // stored banded index rows in the batch's touched (codec,band,key)
    // buckets only, minus the batch's own ids (crash-replay exclusion);
    // select BY NAME after the using-joins (the column-order trap)
    val oldIdx = MaintCore.readState(s, path, "index", IndexSchema)
      .join(newBands.select($"codec", $"band", $"key").distinct(),
        Seq("codec", "band", "key"))
      .join(newIds, Seq("media_id"), "left_anti")
      .select($"codec", $"band", $"key",
        $"media_id".as("b"), $"phash_bits".as("hb"))
    // pre-batch assign state (replay exclusion — the MaintCore note)
    val assignNow = MaintCore.assignments(s, path, "media_id", StateSubs,
      excludeBatch = Some(batchId))
    // new↔old edges: band-bucket candidates, exact hamming verify,
    // compressed to (new blob, old blob's cluster rep)
    val edgesNO = newBands
      .select($"codec", $"band", $"key",
        $"media_id".as("a"), $"phash_bits".as("ha"))
      .join(oldIdx, Seq("codec", "band", "key"))
      .filter(bit_count($"ha".bitwiseXOR($"hb")) <= lit(maxHamming))
      .select($"a", $"b").distinct()
      .join(assignNow.toDF("b", "rep"), Seq("b"), "left_outer")
      .select($"a", coalesce($"rep", $"b").as("b"))
    // new↔new edges inside the batch — the batch query's own machinery
    val edgesNN = Multimodal.mediaDupPairs(newH, maxHamming)
      .select($"ma".as("a"), $"mb".as("b"))
    // EAGER: the edge set reads index/assign state the writes below
    // replace in place on a replay
    val edges = edgesNO.union(edgesNN).localCheckpoint()
    MaintCore.writeBatch(newBands
      .select($"codec", $"band", $"key", $"media_id", $"phash_bits"),
      s"$path/index", batchId)
    MaintCore.advance(s, path, batchId, newIds.toDF("media_id"), edges,
      "media_id")
  }

  /** Per-codec duplication report off the maintainer's OWN state —
    * the read side of `q_media_dup_rate` at deployment scale: the
    * batch audit re-hashes the whole corpus (a LINEAR decode+hash
    * pass, measured at exponent 1.01 in SCALEPROBE_r16), which is the
    * wrong cost for a dashboard refresh at 100 TB when the maintainer
    * already holds every fingerprint. This derives the identical
    * report from stored ids alone: blobs = distinct (media_id, codec)
    * over the banded index (every decodable blob has index rows, at
    * any anchor grain), clustered = the resolved assignments (only
    * edge-bearing blobs persist — the same membership the batch CC
    * emits, by the tier's unconditional stream ≡ batch contract), and
    * the rollup is byte-shared with the batch audit
    * (`Multimodal.dupRateRollup`). Group-rows-only: nothing here
    * decodes, hashes, or pairs — two distincts and a codec-grain
    * rollup over state.
    */
  def dupReport(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    checkVersion(s, path, createIfFresh = false)
    MaintCore.recover(s, path, StateSubs)
    val blobs = MaintCore.readState(s, path, "index", IndexSchema)
      .select($"media_id", $"codec").distinct()
    val clustered = MaintCore
      .assignments(s, path, "media_id", StateSubs)
      .join(blobs, "media_id")
    Multimodal.dupRateRollup(blobs, clustered)
  }

  /** FINGERPRINT-RULE MIGRATION (s_media_rehash, round 16) — the verb
    * [[checkVersion]]'s refusal points at, completing the maintainer
    * repair triad (`SemanticMaint.requantize` / `ClusterMaint.refresh` /
    * this): rebuild every stored hash from the RETAINED corpus under
    * the CURRENT rule, repair the clusters to the exact
    * `mediaClustersOf` recompute, and keep cluster-id continuity — so
    * a hash-rule upgrade no longer costs a deploy its cluster
    * identities (the pre-r16 contract was "delete the state dir and
    * re-init", which renames every family).
    *
    * Unlike [[ClusterMaint.refresh]] (whose index stores
    * rule-independent shingles), stored media state is rule-stamped
    * hashes that CANNOT be re-derived — so the verb's input is the
    * corpus itself, the same (media_id, content) frame [[init]] takes.
    * Only the rule-independent halves of old state are read: assign +
    * merges (ids). Blobs GONE from the retained corpus (TTL'd,
    * erased) drop out of the index and their components may split —
    * the refresh discipline applies: survivors keep their min-labels,
    * old resolved ids route to their new label through the merge map,
    * and a stale route whose old_id re-emerges as a live label is
    * dropped (it would collapse the split on read).
    *
    * Crash ordering: the marker is DELETED before the publication and
    * rewritten LAST, and the three state families publish ATOMICALLY
    * via [[MaintCore.sealGroup]] (r17) — so every crash window,
    * including a same-version reconciliation run (corpus-retention
    * cleanup on current-rule state), leaves marker-less or old-marker
    * state that every standard verb refuses loudly until a re-run
    * completes, and that re-run always reads an all-old or all-new
    * `before` state — STRICTLY idempotent (the r16-advice window,
    * where a crash between per-family seals left new assignments over
    * the old merge map and the re-run lost relabel routes, is closed
    * by the group sentinel). Run between micro-batches, like
    * `compact`; undecodable blobs are excluded exactly as everywhere
    * else (no hash, no index row, no cluster).
    */
  def rehash(media: DataFrame, path: String, maxHamming: Int = 3): Unit = {
    val s = media.sparkSession
    import s.implicits._
    val fs = new Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    require(StateSubs.exists(sub =>
      fs.exists(new Path(s"$path/$sub")) ||
        fs.exists(new Path(s"$path/$sub.sealed"))),
      s"MediaMaint.rehash: no state at $path — use init on a fresh path")
    MaintCore.recover(s, path, StateSubs)
    // EAGER: read off the files the seals below replace
    val before = MaintCore.assignments(s, path, "media_id", StateSubs)
      .localCheckpoint()
    val priorMerges = MaintCore.readMerges(s, path).localCheckpoint()
    val hashes = Multimodal.hashesOf(media).localCheckpoint(false)
    val repaired = DedupOps.clusterPairs(s,
        Multimodal.mediaDupPairs(hashes, maxHamming)
          .select($"ma".as("a"), $"mb".as("b")))
      .select($"doc_id".as("media_id"), $"cluster_id")
      .localCheckpoint()
    // continuity routing — the shared split-capable repair rules
    // ([[MaintCore.repairMergeMap]]: relabel / direct-route / drop
    // re-emergible old_ids — current labels and present-but-singleton
    // blobs a later twin batch would mint as live labels)
    val routedMap = MaintCore.repairMergeMap(s, priorMerges, before,
      repaired, hashes.select($"media_id").distinct())
    // sentinel: drop the marker BEFORE the publication — every crash
    // window (same-version reconciliation runs included) then leaves
    // marker-less state that the standard verbs refuse loudly until
    // the idempotent re-run completes; marker-last alone only covered
    // the cross-version upgrade path
    fs.delete(new Path(s"$path/MEDIA_STATE_VERSION"), false)
    // the three families publish ATOMICALLY (MaintCore.sealGroup, r17 —
    // closes the r16-advice window where a crash between per-family
    // seals left NEW assignments over the OLD merge map and the re-run,
    // reading that mixture as `before`, lost relabel routes): every
    // crash leaves all-old or all-new state, so the re-run is strictly
    // idempotent from either side
    MaintCore.sealGroup(s, path, Seq(
      "index" -> Multimodal.bandsOf(hashes)
        .select($"codec", $"band", $"key", $"media_id", $"phash_bits"),
      "assign" -> repaired,
      "merges" -> routedMap))
    // LAST: stamp the rule every hash above was computed under
    val out = fs.create(new Path(s"$path/MEDIA_STATE_VERSION"), true)
    try out.write(StateVersion.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Streaming entry: foreachBatch-applied maintenance over a
    * (media_id, content) stream; per-batch results land as parquet
    * under `resultPath/batch_id=N` (same idempotent overwrite).
    *
    * `auditEvery` > 0 turns on the OPERATIONAL DUP-RATE PROBE
    * (s_media_dup_probe, round 17 — the media-tier twin of
    * `SemanticMaint.start`'s recall probe): every `auditEvery`-th
    * batch id, the zero-rehash [[dupReport]] rollup lands under
    * `auditPath/batch_id=N` — the same idempotent partition overwrite,
    * so a replayed micro-batch rewrites its own audit rows and the
    * cadence survives restarts. A media deploy watches per-codec
    * dup-rate decay in its metrics lake (is the ingest gate holding?
    * did a new feed arrive pre-duplicated?) instead of running the
    * verb by hand — the r16 verdict's named telemetry gap.
    */
  def start(media: DataFrame, path: String, resultPath: String,
            checkpoint: String, maxHamming: Int = 3,
            auditEvery: Int = 0, auditPath: String = null)
  : StreamingQuery = {
    require(auditEvery <= 0 || auditPath != null,
      "MediaMaint.start: auditEvery > 0 needs an auditPath")
    Sinks.streamForeachBatch(media, checkpoint, "append") { (b, id) =>
      MaintCore.writeBatch(applyBatch(b, id, path, maxHamming),
        resultPath, id)
      if (auditEvery > 0 && id % auditEvery == 0)
        MaintCore.writeBatch(dupReport(b.sparkSession, path),
          auditPath, id)
    }
  }
}
