package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.sinks.Sinks

/** Shared machinery of the incremental cluster maintainers
  * ([[ClusterMaint]] text/ngram tier, [[SemanticMaint]] embedding
  * tier, [[MediaMaint]] perceptual tier): the batch_id-partitioned
  * idempotent state writes, schema-safe
  * reads, the two-phase compaction recovery, the resolved merge map,
  * and the super-node CC advance — given this batch's edges (new node ↔
  * new node, or new node ↔ old cluster rep), run the small CC, derive
  * per-node (cluster_id, is_new_cluster), fold merge events into the
  * resolved map, and append the clustered assignments. The min-label
  * invariant that makes the compression exact lives here once; the
  * tiers differ ONLY in how they derive candidate edges (shingle
  * postings vs IVF cell probes vs phash band buckets), which stays in
  * the tier objects.
  */
private[streaming] object MaintCore {

  def writeBatch(df: DataFrame, path: String, id: Long): Unit =
    Sinks.overwritePartitions(df.withColumn("batch_id", lit(id)), path,
      "batch_id")

  /** True iff `dir` holds at least one parquet footer to infer from —
    * the FileSystem-API probe for "legitimately empty state" (an
    * AnalysisException-message match would silently break the moment a
    * Spark release rewords UNABLE_TO_INFER_SCHEMA / PATH_NOT_FOUND).
    * State dirs are per-batch-partitioned and periodically compacted,
    * so the recursive listing is bounded.
    */
  private def hasParquet(s: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) false
    else {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val name = it.next().getPath.getName
        found = name.endsWith(".parquet")
      }
      found
    }
  }

  /** Schema-safe state read: a state dir that is absent, or was written
    * only from empty frames (e.g. an init corpus with no near-dup pairs
    * → empty assign/), has no parquet footers to infer from — probe
    * with the FileSystem API and fall back to the declared schema.
    * `excludeBatch` drops that batch's own partition BEFORE the
    * batch_id column goes — the crash-replay exclusion [[advance]]
    * needs to see the state as it was before the replayed batch first
    * ran (the tiers' index reads do the same by id anti-join).
    */
  def readState(s: SparkSession, path: String, sub: String,
                schema: String,
                excludeBatch: Option[Long] = None): DataFrame =
    if (hasParquet(s, s"$path/$sub")) {
      val raw = s.read.parquet(s"$path/$sub")
      excludeBatch.fold(raw)(id => raw.filter(col("batch_id") =!= lit(id)))
        .drop("batch_id")
    } else
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))

  def readMerges(s: SparkSession, path: String): DataFrame =
    readState(s, path, "merges", "old_id BIGINT, new_id BIGINT")

  /** ALL merge-map writes go through the two-phase [[seal]] (write the
    * sibling `.sealed` dir first, delete live, rename): the map is the
    * one state family that is NOT re-derivable from appends — a plain
    * in-place Overwrite crashing between its delete and its commit
    * would silently read back as a legitimately-empty map and every
    * absorbed-rep routing would be lost (r14 review finding). With the
    * seal, a crash leaves either the old live dir (pre-delete) or a
    * complete `.sealed` copy that [[recover]] renames into place — so
    * "merges" must be in every tier's recover list.
    */
  def writeMerges(s: SparkSession, path: String, df: DataFrame): Unit =
    seal(s, path, "merges", df)

  def writeEmptyMerges(s: SparkSession, path: String): Unit = {
    import s.implicits._
    writeMerges(s, path, Seq.empty[(Long, Long)].toDF("old_id", "new_id"))
  }

  /** Complete any compaction a crash interrupted: a missing live dir
    * with a `<sub>.sealed` sibling means the delete happened but the
    * rename didn't — finish it. Idempotent, cheap (one FS stat per sub).
    *
    * Also completes or discards a crashed GROUP publication
    * ([[sealGroup]]): a `SEAL_COMMIT` sentinel means every staged dir
    * in its list is complete — finish the swap set; no sentinel means
    * any `<sub>.staged` leftovers predate the commit point — discard
    * them, the live dirs are the consistent truth.
    */
  def recover(s: SparkSession, path: String, subs: Seq[String]): Unit = {
    val fs = new Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // a `.tmp` sentinel is a [[sealGroup]] that crashed before its
    // atomic rename — pre-commit-point by definition, discard it (the
    // no-marker branch below then discards its orphan stages too)
    fs.delete(new Path(s"$path/$SealCommitMarker.tmp"), false)
    val marker = new Path(s"$path/$SealCommitMarker")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val groupSubs =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        finally in.close()
      commitStaged(fs, path, groupSubs)
    } else
      for (sub <- subs)
        fs.delete(new Path(s"$path/$sub.staged"), true)
    for (sub <- subs) {
      val live = new Path(s"$path/$sub")
      val sealedP = new Path(s"$path/$sub.sealed")
      if (!fs.exists(live) && fs.exists(sealedP)) fs.rename(sealedP, live)
    }
  }

  private val SealCommitMarker = "SEAL_COMMIT"

  /** Atomic GROUP publication for the split-capable repair verbs
    * ([[ClusterMaint.refresh]], [[MediaMaint.rehash]] — r16 advice):
    * per-family [[seal]]s left a window where a crash between the
    * assign seal and the merge-map write published NEW assignments over
    * the OLD merge map, and the repair's re-run — reading that mixture
    * as its `before` state — lost relabel information (a gone absorbed
    * id whose old target relabeled kept a stale route to a dead label).
    * Here every family stages under `<sub>.staged` while the live dirs
    * stay untouched, a `SEAL_COMMIT` sentinel naming the group marks
    * the commit point, and only then are the live dirs swapped;
    * [[recover]] — which every verb calls first — completes the swap
    * set after a post-sentinel crash and discards orphan stages after a
    * pre-sentinel one. A state reader can therefore never observe a
    * partially-published repair: it sees all-old or all-new, and the
    * repair re-run is strictly idempotent from either.
    */
  def sealGroup(s: SparkSession, path: String,
                parts: Seq[(String, DataFrame)]): Unit = {
    val fs = new Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // discard leftovers of a crashed pre-sentinel attempt
    fs.delete(new Path(s"$path/$SealCommitMarker"), false)
    fs.delete(new Path(s"$path/$SealCommitMarker.tmp"), false)
    for ((sub, _) <- parts)
      fs.delete(new Path(s"$path/$sub.staged"), true)
    // stage everything first — live dirs (and so every input the
    // staged frames might still lazily read) remain intact throughout
    for ((sub, df) <- parts)
      df.withColumn("batch_id", lit(-1L))
        .write.mode(SaveMode.Overwrite).partitionBy("batch_id")
        .parquet(s"$path/$sub.staged")
    // the sentinel is the COMMIT POINT, so its member list must appear
    // atomically: a create/write/close crashing mid-write would leave a
    // prefix-truncated list that recover's commitStaged would happily
    // swap PARTIALLY (e.g. sizes+assign without merges — the exact
    // mixed state this group seal exists to prevent, r17 advice).
    // Write to a `.tmp` sibling and rename into place — the same
    // atomic primitive the per-dir seal swap already relies on; a
    // crash before the rename leaves only the inert `.tmp`, which
    // recover and the pre-clean above treat as pre-sentinel garbage.
    val tmp = new Path(s"$path/$SealCommitMarker.tmp")
    val out = fs.create(tmp, true)
    try out.write(parts.map(_._1).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // Hadoop rename reports failure by RETURNING FALSE, not throwing
    // (r18 advice): falling through to commitStaged with no sentinel on
    // disk would let a crash mid-swap be recovered as pre-sentinel and
    // the remaining staged families discarded — the exact partial state
    // this seal exists to prevent. Fail loud instead; the staged dirs
    // and inert .tmp are pre-sentinel garbage the next attempt cleans.
    require(fs.rename(tmp, new Path(s"$path/$SealCommitMarker")),
      s"sealGroup: failed to publish commit sentinel at $path/$SealCommitMarker")
    commitStaged(fs, path, parts.map(_._1))
  }

  /** The swap half of [[sealGroup]], shared with [[recover]]'s crash
    * completion: replace each live dir whose staged sibling exists (an
    * absent stage means that swap already happened), then drop the
    * sentinel. Idempotent.
    */
  private def commitStaged(fs: org.apache.hadoop.fs.FileSystem,
                           path: String, subs: Seq[String]): Unit = {
    for (sub <- subs) {
      val staged = new Path(s"$path/$sub.staged")
      if (fs.exists(staged)) {
        fs.delete(new Path(s"$path/$sub"), true)
        fs.rename(staged, new Path(s"$path/$sub"))
      }
    }
    fs.delete(new Path(s"$path/$SealCommitMarker"), false)
  }

  /** Two-phase dir seal for [[recover]]-covered compactions: publish
    * the compacted copy FIRST, delete the live dir, rename.
    */
  def seal(s: SparkSession, path: String, sub: String,
           df: DataFrame): Unit = {
    val fs = new Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    df.withColumn("batch_id", lit(-1L))
      .write.mode(SaveMode.Overwrite).partitionBy("batch_id")
      .parquet(s"$path/$sub.sealed")
    fs.delete(new Path(s"$path/$sub"), true)
    fs.rename(new Path(s"$path/$sub.sealed"), new Path(s"$path/$sub"))
  }

  /** Current resolved assignments: insert-time cluster ids routed
    * through the merge map (one non-corpus-sized join — the map holds
    * only ever-absorbed reps). `idCol` names the node column in the
    * returned frame; `recoverSubs` is the tier's FULL state-dir family,
    * so a crash mid-compaction is healed before ANY read (not just
    * assign/ — the drift the r13 advice flagged).
    *
    * `excludeBatch` is the REPLAY seam (r15 review finding): the
    * rep-compression read inside a tier's applyBatch must see the
    * assign state as it was BEFORE the replayed batch first ran —
    * otherwise a crashed batch that persisted a previously-singleton
    * old node routes that node to the crashed run's label, the replay
    * edge degenerates to a self-edge, and the dynamic overwrite drops
    * the node's row (stream ≠ batch on exactly the late-twin case,
    * with is_new_cluster flipping too). Tier-facing reads pass None.
    */
  def assignments(s: SparkSession, path: String, idCol: String,
                  recoverSubs: Seq[String],
                  excludeBatch: Option[Long] = None): DataFrame = {
    import s.implicits._
    recover(s, path, recoverSubs)
    readState(s, path, "assign", s"$idCol BIGINT, cluster_id BIGINT",
      excludeBatch)
      .join(readMerges(s, path)
        .withColumnRenamed("old_id", "cluster_id"),
        Seq("cluster_id"), "left_outer")
      .select(col(idCol),
        coalesce($"new_id", $"cluster_id").as("cluster_id"))
  }

  /** Post-repair merge-map routing shared by the SPLIT-capable repair
    * verbs ([[ClusterMaint.refresh]], [[MediaMaint.rehash]]) — one
    * formula source for the continuity rules, which are subtler than
    * the advance-time fold because a repair can dissolve components:
    *
    *  1. An old resolved LABEL still clustered under a new label
    *     relabels to it; split survivors keep their label, no entry.
    *  2. A prior ABSORBED id that is edge-bearing in the repaired CC
    *     routes to its OWN new component label (where its node
    *     actually lives now), not to its old target's relabel — the
    *     old target may have split away from it entirely.
    *  3. Entries whose old_id could RE-EMERGE as a live label are
    *     dropped: current labels (the r16 refresh rule), AND ids whose
    *     node is PRESENT in the repaired corpus but edge-bearing in no
    *     component — a later twin batch mints exactly that id as a
    *     live label (the late-singleton-twin rule), and a stale route
    *     would silently redirect the new family to an unrelated old
    *     cluster (stream ≠ batch on a path no read would flag).
    *
    * `before` = resolved pre-repair assignments, `repaired` = the
    * fresh batch-rule CC (both (id, cluster_id) and EAGER — read off
    * the files the caller reseals), `presentIds` = one id column of
    * every node the repair re-derived from (indexed docs / hashed
    * blobs). Returns the eager routed map, ready for [[writeMerges]].
    */
  def repairMergeMap(s: SparkSession, priorMerges: DataFrame,
                     before: DataFrame, repaired: DataFrame,
                     presentIds: DataFrame): DataFrame = {
    import s.implicits._
    val rep = repaired.toDF("old_id", "direct")
    val relabels = before.select(col("cluster_id").as("old_id")).distinct()
      .join(rep, Seq("old_id"))
      .filter($"old_id" =!= $"direct")
      .select($"old_id", $"direct".as("new_id"))
    val currentLabels = rep.select($"direct".as("old_id")).distinct()
    val presentSingles = presentIds.toDF("old_id").distinct()
      .join(rep.select($"old_id"), Seq("old_id"), "left_anti")
    priorMerges
      .join(rep, Seq("old_id"), "left_outer")
      .join(relabels.toDF("r_old", "r_new"), $"new_id" === $"r_old",
        "left_outer")
      .select($"old_id",
        coalesce($"direct", $"r_new", $"new_id").as("new_id"))
      .union(relabels)
      .distinct()
      .filter($"old_id" =!= $"new_id")
      .join(currentLabels, Seq("old_id"), "left_anti")
      .join(presentSingles, Seq("old_id"), "left_anti")
      .localCheckpoint()
  }

  /** The super-node CC advance shared by the maintainers: `edges`
    * carries (a, b) where a is always a NEW node id and b is either a
    * new node id or an OLD cluster rep (its min-label — the compression
    * that makes incremental CC equal the union-corpus batch CC,
    * including merges). Runs the small CC, derives every new node's
    * (cluster_id, is_new_cluster), appends clustered assignments under
    * `batchId`, folds merge events into the resolved map (rewritten
    * LAST, eagerly checkpointed off its own files), and returns the
    * per-node result. Replay-idempotent with the caller's own
    * batch_id-partitioned appends.
    */
  def advance(s: SparkSession, path: String, batchId: Long,
              newIds: DataFrame, edges: DataFrame, idCol: String)
  : DataFrame = {
    import s.implicits._
    val comp = DedupOps.clusterPairs(s, edges)
      .select($"doc_id".as("node"), $"cluster_id".as("cid"))
      .localCheckpoint(false)
    // a component is PRE-EXISTING iff it contains a non-batch node (an
    // old cluster rep); every new node in it inherits that cluster
    val ids = newIds.toDF(idCol)
    val oldCids = comp.join(ids.toDF("node"), Seq("node"), "left_anti")
      .select($"cid").distinct()
    val res = ids
      .join(comp.toDF(idCol, "cid"), Seq(idCol), "left_outer")
      .join(oldCids.toDF("rescid").withColumn("pre", lit(true)),
        $"cid" === $"rescid", "left_outer")
      .select(col(idCol),
        coalesce($"cid", col(idCol)).as("cluster_id"),
        coalesce(!$"pre", lit(true)).as("is_new_cluster"))
      .localCheckpoint(false)
    // merge events: an old rep whose component label dropped below it
    // was absorbed — record rep → label, fold into the resolved map
    val newMerges = comp
      .join(ids.toDF("node"), Seq("node"), "left_anti")
      .filter($"node" =!= $"cid")
      .select($"node".as("old_id"), $"cid".as("new_id"))
      .localCheckpoint(false)
    val resolved = readMerges(s, path)
      .join(newMerges.toDF("t_old", "t_new"), $"new_id" === $"t_old",
        "left_outer")
      .select($"old_id", coalesce($"t_new", $"new_id").as("new_id"))
      .union(newMerges)
      .distinct()
      // EAGER: the map is rewritten in place, so its rows must be OFF
      // the old files before SaveMode.Overwrite deletes them (a lazy
      // checkpoint would read during the overwrite job and race it)
      .localCheckpoint()
    // only CLUSTERED nodes persist (edge-bearing — the batch CC output
    // likewise excludes singletons); the result reports every node.
    // An OLD node can become edge-bearing here for the first time — it
    // arrived as an unpersisted singleton and this batch brought its
    // first twin (the r15 trimmed-video spec caught all three tiers
    // missing it: only the twin got an assign row, so "members of
    // cluster X" lost the canonical itself). Persist those too, under
    // THIS batch's partition; the prior-state read excludes the
    // replayed batch's own partition so a crash replay re-derives the
    // same rows instead of seeing them as already-assigned (idempotent
    // like every other append here).
    // assign lands before merges so a crash between the two leaves only
    // re-derivable appends behind; the merge map itself goes through
    // the two-phase seal ([[writeMerges]]) because it is NOT
    // re-derivable
    val priorAssigned = readState(s, path, "assign",
      s"$idCol BIGINT, cluster_id BIGINT", excludeBatch = Some(batchId))
      .select(col(idCol).as("node"))
    val oldNewlyClustered = comp
      .join(ids.toDF("node"), Seq("node"), "left_anti")
      .join(priorAssigned, Seq("node"), "left_anti")
      .select($"node".as(idCol), $"cid".as("cluster_id"))
      // EAGER, same discipline as `resolved`: this subtree READS
      // $path/assign and the writeBatch below dynamic-partition-
      // overwrites $path/assign. Today the read is safe without it
      // (the batch_id filter prunes the replaced partition and file
      // deletion defers to job commit), but that is two implementation
      // details deep — rows must be OFF those files before the write,
      // not coincidentally untouched by it (r16 advice).
      .localCheckpoint()
    writeBatch(res
      .join(comp.toDF(idCol, "c2"), Seq(idCol), "left_semi")
      .select(col(idCol), $"cluster_id")
      .union(oldNewlyClustered),
      s"$path/assign", batchId)
    writeMerges(s, path, resolved)
    res
  }
}
