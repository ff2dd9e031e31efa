package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DedupOps
import graft.sinks.Sinks

/** STREAMING NEAR-DUP CLUSTER MAINTENANCE (s_cluster_maint) — the live
  * half of the dedup ACTION chain the r12 verdict named missing:
  * `s_ingest_dedup` drops exact/fingerprint duplicates at the gate;
  * this maintains the NEAR-dup cluster assignments (`q_dedup_clusters`)
  * incrementally, so each arriving document gets its cluster id at
  * ingest time instead of waiting for the nightly CC recompute.
  *
  * The invariant that makes incremental exact: a connected component's
  * label is its MINIMUM doc id (the `clusterPairs` contract), so an
  * existing cluster can stand in for ALL its members as one super-node
  * carrying that min. Per micro-batch the union graph's new edges are
  * (a) new↔new pairs inside the batch and (b) new↔old pairs COMPRESSED
  * to (new doc, old doc's cluster id); CC over that small graph — new
  * docs plus touched cluster reps only, never the corpus — yields
  * labels equal to a full batch CC over the union corpus, INCLUDING
  * cluster merges: when a new doc bridges two frozen clusters, the
  * bridged reps land in one component whose min is exactly the merged
  * cluster's batch-CC label, and the absorbed rep is recorded in a
  * resolved merge map that readers apply on the way out
  * ([[assignments]]). Stream ≡ batch at every micro-batch boundary is
  * spec-pinned (StreamOpsSpec), merge event included.
  *
  * Edge rule: byte-identical to the batch query — `DedupOps.shingleSet`
  * 3-token shingles, df-capped postings, Jaccard ≥ threshold over
  * KEPT-shingle sizes. One documented divergence: document frequency
  * and kept sizes are evaluated at ARRIVAL time (stored postings + the
  * batch), so a shingle whose df crosses `maxDf` only after a document
  * was scored keeps that document's earlier edges, where a from-scratch
  * recompute would drop them; the equivalence spec therefore pins
  * fixtures whose dfs stay under the cap (the realistic regime — a
  * cap-crossing shingle is boilerplate whose edges are spurious either
  * way). The same caveat governs `q_dedup_incremental`'s batch twin.
  *
  * Scale shape: per batch the work is (1) one posting-index probe join
  * keyed on the batch's shingles (stream-static, the
  * `dedupAgainstCorpus` discipline — the index re-resolves every batch
  * so a compaction is picked up live), (2) batch-bounded pair
  * generation, (3) CC over a graph of new docs + touched reps, (4)
  * appends partitioned by batch_id via dynamic overwrite, so a crash
  * replay REPLACES its own partition instead of duplicating (the
  * LakeSink idempotence trick); the resolved merge map is tiny (one row
  * per ever-absorbed cluster id) and rewritten atomically per batch.
  * Nothing corpus-sized shuffles except the index probe, which is
  * keyed and prunable.
  *
  * State layout under `path`:
  *   index/  batch_id=N/ (doc_id, s)       raw distinct shingles
  *   sizes/  batch_id=N/ (doc_id, n)       kept-shingle count at arrival
  *   assign/ batch_id=N/ (doc_id, cluster_id)  clustered docs, id at insert
  *   merges/ (old_id, new_id)              resolved absorbed-rep map
  */
object ClusterMaint {

  /** Bootstrap state from the historical corpus (doc_id, text): batch
    * CC over the same ngram-Jaccard edge rule, postings, kept sizes.
    * Batch id −1 marks the bootstrap partition.
    */
  def init(docs: DataFrame, path: String,
           threshold: Double = DedupOps.DefaultJaccardThreshold,
           maxDf: Int = DedupOps.DefaultMaxShingleDf): Unit = {
    val s = docs.sparkSession
    import s.implicits._
    val sh = DedupOps.shinglesOf(docs).localCheckpoint(false)
    val df = sh.groupBy($"s").agg(count(lit(1)).as("df"))
    val kept = sh.join(df.filter($"df" <= maxDf).select($"s"), "s")
      .select($"doc_id", $"s").localCheckpoint(false)
    val sizes = kept.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val inter = kept.toDF("da", "s").join(kept.toDF("db", "s"), "s")
      .filter($"da" < $"db")
      .groupBy($"da", $"db").agg(count(lit(1)).as("i"))
    val pairs = inter
      .join(sizes.toDF("da", "na"), "da")
      .join(sizes.toDF("db", "nb"), "db")
      .filter($"i".cast("double") / ($"na" + $"nb" - $"i") >= threshold)
      .select($"da", $"db")
    val assign = DedupOps.clusterPairs(s, pairs)
      .select($"doc_id", $"cluster_id")
    writeBatch(sh, s"$path/index", -1L)
    writeBatch(sizes, s"$path/sizes", -1L)
    writeBatch(assign, s"$path/assign", -1L)
    Seq.empty[(Long, Long)].toDF("old_id", "new_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/merges")
  }

  private def writeBatch(df: DataFrame, path: String, id: Long): Unit =
    Sinks.overwritePartitions(df.withColumn("batch_id", lit(id)), path,
      "batch_id")

  /** Schema-safe state read: a state dir written only from empty frames
    * (e.g. an init corpus with no near-dup pairs → empty assign/) has no
    * parquet footers to infer from — fall back to the declared schema.
    */
  private def readState(s: SparkSession, path: String, sub: String,
                        schema: String): DataFrame =
    try s.read.parquet(s"$path/$sub").drop("batch_id")
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getMessage.contains("infer schema") ||
          e.getMessage.contains("PATH_NOT_FOUND") =>
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(schema))
    }

  private def readMerges(s: SparkSession, path: String): DataFrame =
    try s.read.parquet(s"$path/merges")
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getMessage.contains("infer schema") ||
          e.getMessage.contains("PATH_NOT_FOUND") =>
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "old_id BIGINT, new_id BIGINT"))
    }

  /** Compact a state dir family: the per-batch partitions accumulate
    * one dir per micro-batch forever (the scaffolding that buys replay
    * idempotence), so a long-running maintainer periodically folds them
    * into the single bootstrap partition — the LakeSink seal discipline
    * applied to maintainer state. Two-phase with crash recovery:
    * publish the compacted copy to `<sub>.sealed` FIRST, delete the
    * live dir, rename — and [[recover]] (called by [[applyBatch]] and
    * [[assignments]] before any read) completes a rename a crash left
    * half-done, so state is never silently read as empty. Run with the
    * stream stopped (between micro-batches); the fold also re-resolves
    * assign/ rows through the merge map and EMPTIES the map — after a
    * compaction the merge history is baked into the stored ids.
    */
  def compact(s: SparkSession, path: String): Unit = {
    import s.implicits._
    recover(s, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def seal(sub: String, df: DataFrame): Unit = {
      df.withColumn("batch_id", lit(-1L))
        .write.mode(SaveMode.Overwrite).partitionBy("batch_id")
        .parquet(s"$path/$sub.sealed")
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$sub"), true)
      fs.rename(new org.apache.hadoop.fs.Path(s"$path/$sub.sealed"),
        new org.apache.hadoop.fs.Path(s"$path/$sub"))
    }
    seal("index", readState(s, path, "index", "doc_id BIGINT, s STRING"))
    seal("sizes", readState(s, path, "sizes", "doc_id BIGINT, n BIGINT"))
    // assignments resolve through the merge map on the way in, so the
    // map can be emptied afterwards (ids are final as of this fold)
    seal("assign", assignments(s, path))
    Seq.empty[(Long, Long)].toDF("old_id", "new_id")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/merges")
  }

  /** Complete any compaction a crash interrupted: a missing live dir
    * with a `<sub>.sealed` sibling means the delete happened but the
    * rename didn't — finish it. Idempotent, cheap (three FS stats).
    */
  private def recover(s: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    for (sub <- Seq("index", "sizes", "assign")) {
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      val sealedP = new org.apache.hadoop.fs.Path(s"$path/$sub.sealed")
      if (!fs.exists(live) && fs.exists(sealedP)) fs.rename(sealedP, live)
    }
  }

  /** Current resolved assignments: insert-time cluster ids routed
    * through the merge map (one non-corpus-sized join — the map holds
    * only ever-absorbed reps).
    */
  def assignments(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    recover(s, path)
    val merges = readMerges(s, path)
    readState(s, path, "assign", "doc_id BIGINT, cluster_id BIGINT")
      .join(merges.withColumnRenamed("old_id", "cluster_id"),
        Seq("cluster_id"), "left_outer")
      .select($"doc_id",
        coalesce($"new_id", $"cluster_id").as("cluster_id"))
  }

  /** Apply one micro-batch of (doc_id, text) documents: returns every
    * batch doc's (doc_id, cluster_id, is_new_cluster) AND advances the
    * state — idempotent under foreachBatch replay (same batchId ⇒ the
    * dynamic overwrite replaces its own partitions and the recomputed
    * merge rows resolve to the same map).
    */
  def applyBatch(newDocs: DataFrame, batchId: Long, path: String,
                 threshold: Double = DedupOps.DefaultJaccardThreshold,
                 maxDf: Int = DedupOps.DefaultMaxShingleDf): DataFrame = {
    val s = newDocs.sparkSession
    import s.implicits._
    recover(s, path)
    val newIds = newDocs.select($"doc_id").localCheckpoint(false)
    val newSh = DedupOps.shinglesOf(newDocs).localCheckpoint(false)
    // postings of the batch's shingles, minus the batch's own docs (a
    // crash replay sees its own appended partition in the index — the
    // exclusion makes the edge computation replay-stable)
    val oldPost = readState(s, path, "index", "doc_id BIGINT, s STRING")
      .join(newSh.select($"s").distinct(), "s")
      .join(newIds, Seq("doc_id"), "left_anti")
      .select($"s", $"doc_id".as("old_id"))
      .localCheckpoint(false)
    // union-at-arrival df gate (see the cap caveat in the class doc)
    val dfu = newSh.groupBy($"s").agg(count(lit(1)).as("dfn"))
      .join(oldPost.groupBy($"s").agg(count(lit(1)).as("dfo")),
        Seq("s"), "left_outer")
      .select($"s", ($"dfn" + coalesce($"dfo", lit(0L))).as("df"))
    val keptS = dfu.filter($"df" <= maxDf).select($"s")
    val newKept = newSh.join(keptS, "s")
      .select($"doc_id", $"s").localCheckpoint(false)
    val nn = newKept.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val oldSizes = readState(s, path, "sizes", "doc_id BIGINT, n BIGINT")
    // new↔old edges, compressed to (new doc, old doc's cluster rep)
    val io = newKept.toDF("new_id", "s")
      .join(oldPost.join(keptS, "s"), "s")
      .groupBy($"new_id", $"old_id").agg(count(lit(1)).as("i"))
    val assignNow = assignments(s, path)
    val edgesNO = io
      .join(nn.toDF("new_id", "na"), "new_id")
      .join(oldSizes.toDF("old_id", "nb"), "old_id")
      .filter($"i".cast("double") / ($"na" + $"nb" - $"i") >= threshold)
      .join(assignNow.toDF("old_id", "rep"), Seq("old_id"), "left_outer")
      .select($"new_id".as("a"), coalesce($"rep", $"old_id").as("b"))
    // new↔new edges inside the batch
    val innI = newKept.toDF("da", "s").join(newKept.toDF("db", "s"), "s")
      .filter($"da" < $"db")
      .groupBy($"da", $"db").agg(count(lit(1)).as("i"))
    val edgesNN = innI
      .join(nn.toDF("da", "na"), "da")
      .join(nn.toDF("db", "nb"), "db")
      .filter($"i".cast("double") / ($"na" + $"nb" - $"i") >= threshold)
      .select($"da".as("a"), $"db".as("b"))
    // CC over the compressed graph: new docs + touched reps only
    val comp = DedupOps.clusterPairs(s, edgesNO.union(edgesNN))
      .select($"doc_id".as("node"), $"cluster_id".as("cid"))
      .localCheckpoint(false)
    // a component is PRE-EXISTING iff it contains a non-batch node (an
    // old cluster rep); every new doc in it inherits that cluster
    val oldCids = comp.join(newIds.toDF("node"), Seq("node"), "left_anti")
      .select($"cid").distinct()
    val res = newIds
      .join(comp.toDF("doc_id", "cid"), Seq("doc_id"), "left_outer")
      .join(oldCids.toDF("rescid").withColumn("pre", lit(true)),
        $"cid" === $"rescid", "left_outer")
      .select($"doc_id",
        coalesce($"cid", $"doc_id").as("cluster_id"),
        coalesce(!$"pre", lit(true)).as("is_new_cluster"))
      .localCheckpoint(false)
    // merge events: an old rep whose component label dropped below it
    // was absorbed — record rep → label, fold into the resolved map
    val newMerges = comp
      .join(newIds.toDF("node"), Seq("node"), "left_anti")
      .filter($"node" =!= $"cid")
      .select($"node".as("old_id"), $"cid".as("new_id"))
      .localCheckpoint(false)
    val oldMap = readMerges(s, path).localCheckpoint(false)
    val resolved = oldMap
      .join(newMerges.toDF("t_old", "t_new"), $"new_id" === $"t_old",
        "left_outer")
      .select($"old_id", coalesce($"t_new", $"new_id").as("new_id"))
      .union(newMerges)
      .distinct()
      // EAGER: the map is rewritten in place, so its rows must be OFF
      // the old files before SaveMode.Overwrite deletes them (a lazy
      // checkpoint would read during the overwrite job and race it)
      .localCheckpoint()
    // state advance: appends replace their own batch partition on
    // replay; the merge map rewrite lands last so a crash between the
    // two leaves only re-derivable appends behind
    writeBatch(newSh, s"$path/index", batchId)
    writeBatch(nn, s"$path/sizes", batchId)
    // only CLUSTERED docs persist (edge-bearing nodes — batch
    // dedupClusters likewise excludes singletons); the emitted result
    // still reports every batch doc
    writeBatch(res
      .join(comp.toDF("doc_id", "c2"), Seq("doc_id"), "left_semi")
      .select($"doc_id", $"cluster_id"),
      s"$path/assign", batchId)
    resolved.write.mode(SaveMode.Overwrite).parquet(s"$path/merges")
    res
  }

  /** Streaming entry: foreachBatch-applied maintenance over a
    * (doc_id, text) stream; per-batch results land as parquet under
    * `resultPath/batch_id=N` (same idempotent overwrite).
    */
  def start(docs: DataFrame, path: String, resultPath: String,
            checkpoint: String,
            threshold: Double = DedupOps.DefaultJaccardThreshold,
            maxDf: Int = DedupOps.DefaultMaxShingleDf): StreamingQuery =
    Sinks.streamForeachBatch(docs, checkpoint, "append") { (b, id) =>
      writeBatch(applyBatch(b, id, path, threshold, maxDf), resultPath, id)
    }
}
