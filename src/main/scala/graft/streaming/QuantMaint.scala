package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{VectorIndex, VectorOps}
import graft.sinks.Sinks

/** STREAMING SERVED-INDEX MAINTENANCE AT THE QUANTIZED (int8) TIER
  * (s_quant_maint) — the live half of the r18/r19 served-recall audit
  * family (`q_ivf_served_recall` / `_clip`): those queries measure what
  * a deployed ANN index that stores a COMPRESSED representation
  * actually serves; this maintainer IS that deploy. Arriving vectors
  * are int8-quantized under per-dim scales FROZEN at [[init]] (the
  * quantization EPOCH), appended into a live on-disk [[VectorIndex]]
  * (hive cell-partitioned inverted lists — probes stay partition-pruned
  * directory reads, the `PartitionFilters` contract), and served
  * through [[probe]] in the same representation space. When the audit
  * says the scale rule is wrong for the corpus — one outlier inflating
  * a max-rule scale wastes the whole int8 range, the exact trade
  * `q_embed_quantize_clip` prices — [[requantize]] migrates the live
  * index to a new clip rule WITHOUT a serving gap and without any
  * probe ever seeing mixed-epoch state.
  *
  * ONE rule family: the scale rule is always the exact
  * ceil(clipQ·n)-th order statistic of |x| per dim
  * ([[VectorOps.clipScalesOf]]); clipQ = 1.0 IS the max rule (rank n =
  * max |x| — the degeneracy the batch specs pin bit-for-bit), so
  * "max → clip migration" and "re-clip on the current corpus" are the
  * same verb with a different argument.
  *
  * Epoch atomicity BY LAYOUT (the [[SemanticMaint]] `quant/` epoch-dir
  * discipline, one tier over): scales and index must never be observed
  * from different epochs — a probe quantizing its query under new
  * scales against lists stored under old scales degrades recall
  * SILENTLY (nothing errors; the audit just decays). So
  *   quant/scales/          (dim, scale, clip_q)   frozen epoch scales
  *   quant/idx/lists/cell=N/ (vec_id, embedding)   dequantized-rep lists
  *   quant/idx/centroids/                          coarse quantizer
  * live under ONE epoch dir that [[requantize]] replaces with a single
  * rename (build the complete `quant.sealed/` tree first, delete live,
  * rename — [[MaintCore.recover]]'s standard heal window). The
  * multi-family mixed-publication problem [[MaintCore.sealGroup]]
  * solves for frame families is solved here at the layout level: the
  * epoch IS one family.
  *
  * State families under `path`:
  *   src/ batch_id=N/ (vec_id, v)   exact float source vectors — the
  *     migration + audit substrate. A deployed index that keeps only
  *     codes cannot be re-scaled losslessly (dequantize → requantize
  *     compounds grid error); keeping the float source beside the
  *     served codes is what makes the migration verb EXACT. At 100 TB
  *     this is the cold half (written once, read only by requantize /
  *     audit); the served hot half is the compressed index.
  *   quant/ — the epoch dir above.
  *
  * Scale shape per batch: one driver read of model state (≤ nlist
  * centroid rows + n_dims scale rows — never data), executor-side
  * quantization + cell assignment of BATCH vectors only, one
  * partition-pruned anti-join against the batch's TOUCHED cells (the
  * posting-probe discipline: stored lists outside those cells are
  * never read), one cell-partitioned append. [[requantize]] is the
  * only full-corpus pass, and it is the point of the verb.
  *
  * Reference framing: the reference repo is empty (SURVEY §0); this
  * component extends the engine's own streaming §2.9 surface, mirroring
  * `VectorIndex` (frozen-quantizer append contract) and the
  * `ivfServedRecall` audit discipline.
  */
object QuantMaint {

  private val StateSubs = Seq("src", "quant")
  private val SrcSchema = "vec_id BIGINT, v ARRAY<FLOAT>"

  /** Per-dim epoch scales of `vecs` under the clipQ order-statistic
    * rule, as a (dim, scale, clip_q) frame — [[VectorOps.clipScalesOf]]
    * over the exploded coordinates, the exact rule the batch audit
    * family uses (clipQ = 1.0 ≡ the max rule).
    */
  private def scalesOf(vecs: DataFrame, clipQ: Double): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    VectorOps.clipScalesOf(
      vecs.select(posexplode($"v").as(Seq("dim", "xf")))
        .select($"dim", $"xf".cast("double").as("x")), clipQ)
      .withColumn("clip_q", lit(clipQ))
  }

  /** Frozen epoch scales, driver-side: (dim-ordered scale array,
    * clip_q). Model rows (n_dims), never data.
    */
  private def readScales(s: SparkSession, path: String)
  : (Array[Double], Double) = {
    import s.implicits._
    val rows = s.read.parquet(s"$path/quant/scales")
      .select($"dim".cast("int"), $"scale".cast("double"),
        $"clip_q".cast("double"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    require(rows.nonEmpty, s"no epoch scales at $path/quant/scales")
    (rows.map(_._2), rows.head._3)
  }

  private def readSrc(s: SparkSession, path: String): DataFrame =
    MaintCore.readState(s, path, "src", SrcSchema)

  /** Quantize a (vec_id, v) frame into the epoch's dequantized-grid rep,
    * dropping dead rows (a vector whose grid image is all-zero has no
    * direction to index — the `servedRecallOf` float-live rule, applied
    * at the rep level). The grid image is computed by the SAME codegen'd
    * column expression the batch audit family uses
    * ([[VectorOps.dequantizeInt8]]: Spark `round` HALF_UP, clamp ±127,
    * zero-scale dim → exactly 0) — bit-for-bit parity with
    * `q_embed_quantize` / `q_ivf_served_recall` by construction, not by
    * a re-implemented rounding rule (r19 review: a Scala
    * `floor(a + 0.5)` copy diverges from BigDecimal HALF_UP at
    * IEEE tie-crossing values).
    */
  private def quantized(vecs: DataFrame, sc: Array[Double])
  : org.apache.spark.sql.Dataset[(Long, Array[Float])] = {
    val s = vecs.sparkSession
    import s.implicits._
    vecs
      // zip_with null-pads a length mismatch silently — fail loud like
      // the old driver-side require did
      .filter(assert_true(size($"v") === lit(sc.length),
        lit(s"QuantMaint: vector dim != epoch scale dim ${sc.length}"))
        .isNull)
      .select($"vec_id",
        zip_with(
          transform($"v", x => x.cast("double")),
          typedLit(sc.toSeq),
          (x, scale) => VectorOps.dequantizeInt8(x, scale).cast("float"))
        .as("vq"))
      .filter(aggregate($"vq", lit(0.0),
        (acc, x) => acc + x.cast("double") * x) > 0.0)
      .as[(Long, Array[Float])]
  }

  /** Bootstrap from the historical corpus (vec_id, embedding): freeze
    * the epoch scales under `clipQ` (1.0 = max rule), quantize, and
    * build the served [[VectorIndex]] over the grid rep. Batch id −1
    * marks the bootstrap src partition. Crash mid-init = re-run init
    * (every write is an overwrite).
    */
  def init(vectors: DataFrame, path: String, clipQ: Double = 1.0,
           nlist: Int = 0, sampleN: Int = 512): Unit = {
    val s = vectors.sparkSession
    import s.implicits._
    val src = vectors.selectExpr("vec_id",
      "cast(embedding as array<float>) as v")
    MaintCore.writeBatch(src, s"$path/src", -1L)
    val sc = scalesOf(src, clipQ)
    sc.repartition(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/quant/scales")
    val (scArr, _) = readScales(s, path)
    val dq = quantized(src, scArr)
    require(!dq.isEmpty,
      "QuantMaint.init: every vector quantized to zero under the epoch " +
        "scales - nothing to serve")
    VectorIndex.buildIvfFrom(s, dq, s"$path/quant/idx", nlist, sampleN)
  }

  /** Coarse-quantizer centroids of the live epoch, driver-side (≤ nlist
    * model rows) — the same frozen-assignment rule as
    * [[VectorIndex.appendIvf]].
    */
  private def readCentroids(s: SparkSession, path: String)
  : Array[Array[Double]] = {
    import s.implicits._
    val c = s.read.parquet(s"$path/quant/idx/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    require(c.nonEmpty, s"no index centroids at $path/quant/idx - run init")
    c
  }

  /** Apply one micro-batch of (vec_id, embedding) vectors: persist the
    * float source, quantize under the FROZEN epoch scales, assign to
    * the FROZEN cells, and append to the served lists. Returns every
    * batch vector's (vec_id, cell, served): served = false for rows
    * whose grid image is all-zero (genuine representation loss — the
    * audit counts them, the index cannot hold them).
    *
    * Replay idempotence: the src write is a batch_id partition
    * overwrite; the index append anti-joins the batch's ids against the
    * stored lists of the batch's TOUCHED cells only (parquet job
    * commits are all-or-nothing at the file-visibility level, so a
    * crashed append is either fully absent or fully present — both
    * sides of the anti-join are replay-stable). The lists read and the
    * lists append never conflict: append-mode writes delete nothing.
    */
  def applyBatch(newVecs: DataFrame, batchId: Long, path: String)
  : DataFrame = {
    val s = newVecs.sparkSession
    import s.implicits._
    MaintCore.recover(s, path, StateSubs)
    val src = newVecs.selectExpr("vec_id",
      "cast(embedding as array<float>) as v")
    MaintCore.writeBatch(src, s"$path/src", batchId)
    val (scArr, _) = readScales(s, path)
    val centroids = readCentroids(s, path)
    // the ONE frozen-assignment kernel (shared with buildIvfFrom /
    // appendIvf) — the live lists and the probe path must compute the
    // same cell for the same vector forever
    val assigned = VectorIndex
      .assignToCells(quantized(src, scArr), centroids)
      .localCheckpoint(false)
    val touched = assigned.select($"cell").distinct()
    val present = s.read.parquet(s"$path/quant/idx/lists")
      .join(touched, Seq("cell"), "left_semi")
      .select($"vec_id")
    val fresh = assigned.join(present, Seq("vec_id"), "left_anti")
    fresh.repartition($"cell")
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/quant/idx/lists")
    src.select($"vec_id")
      .join(assigned.select($"vec_id", $"cell"), Seq("vec_id"), "left_outer")
      .select($"vec_id", coalesce($"cell", lit(-1)).as("cell"),
        $"cell".isNotNull.as("served"))
  }

  /** Serve a query batch: quantize the float queries onto the SAME
    * epoch grid the lists store (query and corpus must meet in one
    * representation space — the audit's serving rule), then the
    * partition-pruned [[VectorIndex.probeIvfBatch]]. A GRID-DEAD query
    * (all-zero image under the epoch scales) has no direction to probe
    * and returns NO rows for its q_id — a caller that must distinguish
    * "unservable under this epoch" from "no neighbors" left-anti-joins
    * its batch against the result's q_ids (the same condition
    * [[applyBatch]] reports explicitly as `served = false`).
    */
  def probe(s: SparkSession, path: String,
            queries: org.apache.spark.sql.Dataset[(Long, Array[Float])],
            k: Int = 5, nprobe: Int = 4): DataFrame = {
    MaintCore.recover(s, path, StateSubs)
    val (scArr, _) = readScales(s, path)
    VectorIndex.probeIvfBatch(s, s"$path/quant/idx",
      quantized(queries.toDF("vec_id", "v"), scArr), k, nprobe)
  }

  /** CLIP-REQUANTIZATION (the scale-rule migration verb): recompute the
    * per-dim order-statistic scales at `clipQ` from the CURRENT float
    * source corpus, re-quantize every stored vector EXACTLY (from
    * floats, not from old codes — no compounded grid error), rebuild
    * the served index over the new rep, and publish scales+index as ONE
    * atomic epoch swap. The operational trigger is the served audit
    * ([[servedAudit]] / batch `q_ivf_served_recall_clip`): when
    * max-rule scales waste the int8 range on outliers, migrate to p99
    * clipping without a serving gap.
    *
    * Crash windows: the complete `quant.sealed/{scales,idx}` tree is
    * built BEFORE the live dir is touched — a crash mid-build leaves
    * the live epoch serving and the orphan `.sealed` tree is deleted on
    * the next attempt; a crash between delete-live and rename is healed
    * by [[MaintCore.recover]] (which every verb and read runs first).
    * No observable state ever mixes epochs.
    */
  def requantize(s: SparkSession, path: String, clipQ: Double,
                 nlist: Int = 0, sampleN: Int = 512): Unit = {
    import s.implicits._
    MaintCore.recover(s, path, StateSubs)
    val src = readSrc(s, path).dropDuplicates("vec_id")
    val sc = scalesOf(src, clipQ)
    val fs = new Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$path/quant.sealed"), true)
    sc.repartition(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/quant.sealed/scales")
    // read the scales BACK from the sealed parquet (n_dims rows)
    // instead of re-running the full-corpus order-statistic pass a
    // second time (r19 review) — also guarantees the epoch serves
    // exactly what it persisted
    val scArr = s.read.parquet(s"$path/quant.sealed/scales")
      .select($"dim".cast("int"), $"scale".cast("double"))
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    val dq = quantized(src, scArr)
    require(!dq.isEmpty,
      s"QuantMaint.requantize(clipQ=$clipQ): every vector quantized to " +
        "zero - refusing to publish an empty serving epoch")
    VectorIndex.buildIvfFrom(s, dq, s"$path/quant.sealed/idx", nlist,
      sampleN)
    fs.delete(new Path(s"$path/quant"), true)
    require(fs.rename(new Path(s"$path/quant.sealed"),
      new Path(s"$path/quant")),
      s"requantize: failed to publish epoch at $path/quant")
  }

  /** Fold the per-batch src partitions into the bootstrap partition —
    * the standard two-phase [[MaintCore.seal]], crash-recovered; run
    * between micro-batches. The served index needs no compaction verb
    * of its own (appends land inside cell partitions — [[VectorIndex]]'s
    * layout is its own compact form; file-count hygiene inside a cell
    * is [[graft.sinks.Maintenance]]'s generic job).
    */
  def compact(s: SparkSession, path: String): Unit = {
    MaintCore.recover(s, path, StateSubs)
    MaintCore.seal(s, path, "src", readSrc(s, path))
  }

  /** SERVED-RECALL AUDIT against the maintainer's OWN state — the
    * `q_ivf_served_recall` discipline pointed at the live deploy:
    * truth = exact-float top-k of the stride-spine anchors over the
    * float source corpus (representation-independent); served = what
    * [[probe]] actually returns for those anchors at the deploy config.
    * One row: (clip_q, n_anchors, n_k, n_overlap, recall) — pooled
    * overlap ratio, the micro-averaged recall@k. [[start]] emits this
    * every `auditEvery`-th batch so scale-rule drift shows up in the
    * metrics lake ([[SemanticMaint.recallAudit]]'s cadence contract),
    * and a deploy schedules [[requantize]] off it.
    *
    * Empty-truth convention: recall = 1.0 when n_k = 0 — the
    * STATE-AUDIT convention ([[SemanticMaint.recallAudit]]: nothing to
    * find means nothing was missed), NOT the batch per-anchor
    * convention (`servedRecallOf` reports a zero-truth anchor as 0.0).
    * The row carries n_anchors and n_k precisely so an alarm consumer
    * can tell vacuous-1.0 from measured-1.0: alert on
    * `recall < θ OR n_anchors = 0` — a deploy whose stride matches no
    * vec_id would otherwise read perfect forever (r19 review).
    */
  def servedAudit(s: SparkSession, path: String, k: Int = 10,
                  nprobe: Int = 4, stride: Int = 50): DataFrame = {
    import s.implicits._
    MaintCore.recover(s, path, StateSubs)
    val (_, clipQ) = readScales(s, path)
    val vecs = readSrc(s, path).dropDuplicates("vec_id")
      .select($"vec_id", transform($"v", x => x.cast("double")).as("vf"))
      .filter(aggregate($"vf", lit(0.0), (acc, x) => acc + x * x) > 0.0)
      .localCheckpoint(false)
    val anchors = vecs.filter($"vec_id" % stride === 0)
      .localCheckpoint(false)
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"sim_f".desc, $"vec_id")
    val topF = vecs
      .join(broadcast(anchors.select($"vec_id".as("q_id"),
        $"vf".as("af"))), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        call_function("cosine_sim", $"vf", $"af").as("sim_f"))
      .withColumn("rn", row_number().over(wf))
      .filter($"rn" <= k).select($"q_id", $"vec_id")
      .localCheckpoint(false)
    val served = probe(s, path,
      anchors.select($"vec_id",
        transform($"vf", x => x.cast("float")).as("v"))
        .as[(Long, Array[Float])], k, nprobe)
      .select($"q_id", $"b_id".as("vec_id"))
    val nk = topF.count()
    val nov = topF.join(served, Seq("q_id", "vec_id"), "left_semi").count()
    Seq((clipQ, anchors.count(), nk, nov,
      if (nk == 0L) 1.0 else math.rint(nov.toDouble / nk * 1e6) / 1e6))
      .toDF("clip_q", "n_anchors", "n_k", "n_overlap", "recall")
  }

  /** Streaming entry: foreachBatch-applied maintenance over a
    * (vec_id, embedding) stream; per-batch (vec_id, cell, served) rows
    * land under `resultPath/batch_id=N` (idempotent overwrite).
    * `auditEvery` > 0 lands one [[servedAudit]] row under
    * `auditPath/batch_id=N` at that cadence — the replayed-batch
    * rewrite discipline of `s_recall_probe`.
    */
  def start(vectors: DataFrame, path: String, resultPath: String,
            checkpoint: String, auditEvery: Int = 0,
            auditPath: String = null, k: Int = 10, nprobe: Int = 4,
            stride: Int = 50): StreamingQuery = {
    require(auditEvery <= 0 || auditPath != null,
      "QuantMaint.start: auditEvery > 0 needs an auditPath")
    Sinks.streamForeachBatch(vectors, checkpoint, "append") { (b, id) =>
      MaintCore.writeBatch(applyBatch(b, id, path), resultPath, id)
      if (auditEvery > 0 && id % auditEvery == 0)
        MaintCore.writeBatch(
          servedAudit(b.sparkSession, path, k, nprobe, stride),
          auditPath, id)
    }
  }
}
