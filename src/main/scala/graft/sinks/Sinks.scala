package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Sink surface (SURVEY.md §2.1): batch parquet (plain + hive-partitioned)
  * and streaming sinks (parquet-append with checkpointing, foreachBatch
  * for sinks Spark lacks a connector for — the webhook-engine's "deliver
  * downstream" half).
  */
object Sinks {

  /** Plain parquet write, overwrite semantics (the Verify harness shape).
    */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned layout: `path/col=value/part-*.parquet`.
    * Partition pruning then turns predicates on `cols` into directory
    * skips — the layout a 100 TB event archive needs (e.g. partition by
    * event date, prune to the queried day). Caller picks low-cardinality
    * columns; a high-cardinality partition column is the classic
    * small-files trap.
    */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Size-targeted parquet write — the small-files/row-group lever. Two
    * failure modes at 100 TB: thousands of tiny files per partition (one
    * per task; NameNode pressure, per-file open cost on every read) and
    * the opposite one this harness's own testdata exhibits — one giant
    * row group, which caps scan parallelism at ONE task no matter how
    * many executors exist. `maxRecordsPerFile` bounds file size without a
    * shuffle (a task rolls to a new file at the limit); the optional
    * `targetFiles` repartition additionally coalesces a fragmented
    * upstream (e.g. post-filter partitions at 1% fill) into evenly-sized
    * outputs, at the cost of one round-robin exchange. Streaming jobs get
    * the same effect from `maxRecordsPerFile` plus trigger sizing; a
    * separate compaction pass over closed partitions is the usual cure
    * for what that still leaves behind.
    */
  def writeCompacted(df: DataFrame, path: String, maxRecordsPerFile: Long,
                     targetFiles: Option[Int] = None): Unit =
    targetFiles.fold(df)(df.repartition(_))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Z-ordered parquet layout — the data-skipping lever for the
    * two-predicate access pattern hive partitioning can't serve. Parquet
    * readers prune files and row groups from column min/max statistics;
    * a linear `sortBy(a)` makes those stats tight for `a` and useless for
    * `b`. Interleaving the bits of both columns' bucket ranks (a Morton /
    * Z-curve, the technique behind Delta Lake's OPTIMIZE ZORDER) and
    * range-partitioning + sorting on that key gives every output file a
    * SMALL RECTANGLE of (a, b) space, so min/max pruning works for
    * filters on either column or both — at 100 TB this is the difference
    * between scanning a shard and scanning the archive.
    *
    * Buckets are equi-width from one 4-scalar min/max aggregate (the only
    * driver action, constant-size); heavily skewed columns would prefer
    * equi-depth boundaries from `approxQuantile` — same interleave, one
    * sketch pass more. The interleave itself is pure bit arithmetic on
    * two integer ranks, fully codegen'd; the sort key is dropped before
    * the write so the layout, not the schema, carries the structure.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    bits: Int = 8, targetFiles: Int = 16,
                    maxRecordsPerFile: Long = 1L << 20): Unit = {
    require(bits >= 1 && bits <= 20, "bits must be in [1, 20]")
    val Array(loA, hiA, loB, hiB) =
      df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
          min(col(colB)).cast("double"), max(col(colB)).cast("double"))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val n = 1 << bits
    def bucket(c: String, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(n - 1L), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit((hi - lo) / n))))
    // native codegen'd interleave (graft.functions.MortonInterleave) —
    // one generated loop instead of a 2·bits-deep shift/plus tree on
    // the archive-write hot path; registered by GraftExtensions
    df.withColumn("_zba", bucket(colA, loA, hiA))
      .withColumn("_zbb", bucket(colB, loB, hiB))
      .withColumn("_z", call_function("morton_interleave",
        col("_zba").cast("long"), col("_zbb").cast("long"), lit(bits)))
      .repartitionByRange(targetFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_zba", "_zbb", "_z")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** In-place compaction of selected hive partitions — the maintenance
    * verb [[writeCompacted]]'s doc promises ("a separate compaction pass
    * over closed partitions is the usual cure"): a streaming or
    * daily-append writer leaves one file per task per batch, and after a
    * partition CLOSES (its event-time date passed the watermark; nothing
    * appends there again) those hundreds of small files pay per-file
    * open cost on every read forever. This rewrites each named
    * partition's files into `targetFiles` outputs bounded by
    * `maxRecordsPerFile`, leaving every other partition byte-untouched.
    *
    * Swap protocol per partition: write compacted files to a
    * dot-prefixed STAGING dir (hidden from Spark/Hadoop listings, so
    * concurrent readers of `path` never see doubled rows), then
    * rename live→trash, staging→live, delete trash. The two renames are
    * each atomic on HDFS-like stores but not jointly atomic: a crash
    * between them leaves the partition ABSENT until the next
    * [[compactPartitions]] call on the same value, which detects the
    * half-swap (staging present, live missing) and completes it instead
    * of re-reading what is no longer there. Readers in that window miss
    * one partition rather than double-count it — the safe side of the
    * failure. (Table formats — Delta/Iceberg — exist precisely to make
    * this swap a metadata transaction; on a plain-parquet lake this
    * rename dance is the standard compromise, and it must NOT be
    * pointed at a `writeStream` file-sink output, whose _spark_metadata
    * log pins the exact file list the sink committed.)
    *
    * Caller picks WHICH partitions are closed (event-time watermark,
    * date < today, …); [[partitionFileCounts]] lists candidates worth
    * the rewrite.
    */
  def compactPartitions(s: SparkSession, path: String, partitionCol: String,
                        values: Seq[String], targetFiles: Int = 1,
                        maxRecordsPerFile: Long = 1L << 20): Unit =
    swapRewrite(s, path, partitionCol, values, targetFiles,
      maxRecordsPerFile, identity)

  /** Row-level erasure from selected partitions — the right-to-be-
    * forgotten / bad-batch-removal shape on a plain-parquet lake: rows
    * matching `condition` are DROPPED from the named partitions by the
    * same staging + rename-swap rewrite as [[compactPartitions]] (same
    * crash recovery, same other-partitions-byte-untouched guarantee),
    * with the compaction thrown in for free since the partition is being
    * rewritten anyway. The caller scopes the partition list (e.g. from
    * the deletion request's date range) so the rewrite cost tracks the
    * affected data, never the archive.
    */
  def erasePartitionRows(s: SparkSession, path: String, partitionCol: String,
                         values: Seq[String], condition: Column,
                         targetFiles: Int = 1,
                         maxRecordsPerFile: Long = 1L << 20): Unit =
    swapRewrite(s, path, partitionCol, values, targetFiles,
      maxRecordsPerFile, _.filter(!condition))

  private def swapRewrite(s: SparkSession, path: String, partitionCol: String,
                          values: Seq[String], targetFiles: Int,
                          maxRecordsPerFile: Long,
                          rewrite: DataFrame => DataFrame): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    values.foreach { v =>
      val live = new org.apache.hadoop.fs.Path(root, s"$partitionCol=$v")
      val staging = new org.apache.hadoop.fs.Path(root, s".compacting_$v")
      val trash = new org.apache.hadoop.fs.Path(root, s".compacted_old_$v")
      if (!fs.exists(live) && fs.exists(staging)) {
        // crashed between the two renames of a previous run: the staged
        // rewrite is complete (it is written before any rename) — finish
        fs.rename(staging, live)
        fs.delete(trash, true)
      } else {
        require(fs.exists(live), s"no partition $partitionCol=$v under $path")
        fs.delete(staging, true) // stale staging from a pre-rename crash
        val rewritten = rewrite(s.read.parquet(live.toString))
        if (rewritten.isEmpty) {
          // the rewrite empties the partition (erase-all, delete-all
          // merge): retire the dir instead of publishing an empty one —
          // hive convention. Checked on the PLAN (isEmpty = a limit-1
          // probe), not on the staged output: Spark writes a schema-only
          // parquet file even for zero rows, so a file-presence test
          // publishes a ghost partition instead of retiring (found by
          // MaintenanceSpec's erase-all case in r9).
          fs.delete(live, true)
        } else {
          rewritten
            .repartition(targetFiles)
            .write.mode(SaveMode.Overwrite)
            .option("maxRecordsPerFile", maxRecordsPerFile)
            .parquet(staging.toString)
          fs.delete(trash, true)
          if (!fs.rename(live, trash))
            throw new java.io.IOException(s"cannot move $live aside")
          if (!fs.rename(staging, live)) // roll back: restore the original
            { fs.rename(trash, live)
              throw new java.io.IOException(s"cannot publish $staging") }
          fs.delete(trash, true)
        }
      }
    }
  }

  /** Retention TTL: delete whole expired partitions (`date < horizon` is
    * the caller's worklist — [[partitionFileCounts]] lists what exists).
    * A directory delete per partition, no data read: dropping a day from
    * a 100 TB archive costs a metadata operation, which is exactly why
    * the archive partitions by date in the first place. Idempotent —
    * already-absent values are skipped.
    */
  def dropPartitions(s: SparkSession, path: String, partitionCol: String,
                     values: Seq[String]): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    values.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"$partitionCol=$v"), true)
    }
  }

  /** Partition re-statement — the backfill/correction verb: `df` (which
    * must carry `cols` as columns) REPLACES exactly the partitions it
    * contains rows for, and no others (dynamic partition overwrite; a
    * static overwrite here would silently truncate the whole table to
    * the backfill's partitions — the classic lake-corruption accident
    * this wrapper exists to make unmakeable). The recompute-a-closed-day
    * companion to the streaming path: very-late data beyond the
    * watermark lands by re-deriving that day from the archive and
    * re-stating its partition.
    */
  def overwritePartitions(df: DataFrame, path: String,
                          cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*)
      .parquet(path)

  /** CDC apply — the MERGE verb on a plain-parquet lake, completing the
    * maintenance family ([[compactPartitions]] rewrite, [[dropPartitions]]
    * TTL, [[overwritePartitions]] re-statement, [[erasePartitionRows]]
    * erasure): `changes` carries data rows plus the partition column and
    * (optionally) an op column; per affected partition the live rows
    * whose key appears in the changeset are dropped and the non-delete
    * change rows are inserted — an upsert with last-write-wins against
    * the archive. Rows for a partition value that does not exist yet
    * CREATE it (the insert-into-a-fresh-day case), through the same
    * staging+rename publish so readers never see a half-written
    * partition.
    *
    * Scale shape: the changeset is computed ONCE (lazy local checkpoint)
    * no matter how many partitions it spans; the only driver
    * materialization is the distinct partition-value list (bounded by
    * partitions touched, never rows); each partition rewrite reads only
    * that partition, and the anti-join's right side is the changeset
    * slice — small against an archive partition, so AQE broadcasts it.
    * Cost tracks the touched data, never the archive — the property that
    * makes a daily CDC apply feasible against 100 TB.
    *
    * Contracts: key collisions WITHIN one changeset are not resolved
    * (both rows land — dedup upstream on (keys) if the feed can emit
    * them); a delete row's non-key data columns are ignored; a NULL
    * partition value is rejected (hive null-partition escapes are not
    * worth their ambiguity in a maintenance verb).
    */
  def mergePartitions(s: SparkSession, path: String, partitionCol: String,
                      changes: DataFrame, keyCols: Seq[String],
                      opCol: Option[String] = None,
                      deleteOp: String = "delete",
                      targetFiles: Int = 1,
                      maxRecordsPerFile: Long = 1L << 20): Unit = {
    require(keyCols.nonEmpty, "mergePartitions needs at least one key column")
    val staged = changes.localCheckpoint(false) // one compute across partitions
    require(staged.filter(col(partitionCol).isNull).isEmpty,
      s"changeset has rows with NULL $partitionCol")
    val values = staged.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    values.foreach { v =>
      val slice = staged
        .filter(col(partitionCol).cast("string") === v).drop(partitionCol)
      val upserts = opCol.fold(slice)(c => slice.filter(col(c) =!= deleteOp
        || col(c).isNull).drop(c))
      val changedKeys = opCol.fold(slice)(slice.drop(_))
        .select(keyCols.map(col): _*).distinct()
      val live = new org.apache.hadoop.fs.Path(root, s"$partitionCol=$v")
      val staging = new org.apache.hadoop.fs.Path(root, s".compacting_$v")
      if (!fs.exists(live) && fs.exists(staging))
        // a PREDECESSOR crashed between its two renames: complete that
        // swap first (identity rewrite hits the recovery path), so the
        // merge below applies on top of it instead of vanishing into it
        swapRewrite(s, path, partitionCol, Seq(v), targetFiles,
          maxRecordsPerFile, identity)
      if (fs.exists(live)) {
        swapRewrite(s, path, partitionCol, Seq(v), targetFiles,
          maxRecordsPerFile,
          liveDf => liveDf.join(changedKeys, keyCols, "left_anti")
            .unionByName(upserts))
      } else if (!upserts.isEmpty) {
        // fresh partition value: nothing to merge against — publish the
        // inserts through the same staging dance for crash consistency.
        // An all-deletes slice against an absent partition is a no-op
        // (the isEmpty guard), not an empty-dir create.
        upserts.repartition(targetFiles)
          .write.mode(SaveMode.Overwrite)
          .option("maxRecordsPerFile", maxRecordsPerFile)
          .parquet(staging.toString)
        if (!fs.rename(staging, live))
          throw new java.io.IOException(s"cannot publish $staging")
      }
    }
  }

  /** (partition value, data-file count) per hive partition of `path` —
    * the compaction worklist (filter on count, pass values to
    * [[compactPartitions]]). One driver-side listing, proportional to
    * partition count, never to file count per partition beyond the leaf
    * listing itself.
    */
  def partitionFileCounts(s: SparkSession, path: String,
                          partitionCol: String): Seq[(String, Int)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol="))
      .map { st =>
        val n = fs.listStatus(st.getPath)
          .count(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        (st.getPath.getName.stripPrefix(s"$partitionCol="), n)
      }
      .sortBy(_._1)
  }

  /** Deterministic seeded global shuffle into training shards — the
    * export step between curation and the trainer: rows are permuted by
    * `md5(seed : key)` and written as `shard=K/part-*.json[l]` dirs with
    * a stable row ORDER inside each shard, so the same (data, seed,
    * shards) produces byte-identical shards REGARDLESS of how the input
    * happened to be partitioned — reproducible data order is part of a
    * reproducible training run, and a re-export after a lake rebuild
    * must not silently re-order the corpus. A different seed is a
    * different permutation (epoch reshuffles without rewriting
    * upstream).
    *
    * Shape for scale: the hash, shard assignment, and sort key are all
    * codegen'd column expressions; one exchange distributes by shard id
    * and the per-shard sort is task-local (spillable). `keyCol` must be
    * unique per row (the usual doc_id/event_id) — ties under the same
    * hash would leave sibling order to the engine. JSON-lines is the
    * interchange format trainers read; `format` swaps in parquet when
    * the consumer prefers columnar shards.
    */
  def exportShuffled(df: DataFrame, path: String, keyCol: String,
                     shards: Int = 64, seed: Long = 42L,
                     format: String = "json"): Unit = {
    require(shards >= 1, "need at least one shard")
    val h = md5(concat_ws(":", lit(seed.toString),
      col(keyCol).cast("string")))
    df.withColumn("_h", h)
      .withColumn("shard",
        pmod(conv(substring(col("_h"), 1, 8), 16, 10).cast("long"),
          lit(shards.toLong)).cast("int"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("_h"))
      .drop("_h")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .format(format)
      .save(path)
  }

  /** Bucketed (hash-clustered) table layout — the CO-LOCATED JOIN lever:
    * rows are hash-distributed into `buckets` files per partition by
    * `bucketCol` at WRITE time, and the catalog records that layout, so
    * a join or aggregate keyed on the bucket column reads each side
    * already partitioned — NO exchange at query time. At 100 TB this is
    * the difference between re-shuffling the fact table on every
    * fact⋈dim join and paying the shuffle once at ingest: the classic
    * warehouse trade for a table that is joined on the same key far
    * more often than it is written.
    *
    * `sortBy(bucketCol)` additionally records per-file sort order so a
    * sort-merge join can skip its sorts when Spark trusts the layout.
    * Bucketed layout needs the session catalog (bucket metadata lives
    * there, not in parquet footers) — `path` keeps the data at an
    * explicit location while the table name carries the metadata.
    * Requires one-file-per-bucket discipline upstream for read-time
    * bucketing to engage; `repartition(buckets, col)` before the write
    * achieves it (done here).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int = 16, path: Option[String] = None): Unit = {
    val w = df
      .repartition(buckets, col(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Streaming append to parquet with exactly-once file commit via the
    * checkpoint's write-ahead log.
    */
  def streamToParquet(df: DataFrame, path: String,
                      checkpoint: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Micro-batch escape hatch: run arbitrary batch logic (JDBC upsert,
    * HTTP push, dedup-merge) per micro-batch. Delivery is at-least-once —
    * `batchId` is the replay key an idempotent sink must dedup on.
    *
    * `outputMode` decides WHAT a micro-batch contains when `df` holds a
    * streaming aggregate: "update" hands the sink every group touched
    * this batch (running values — partials included), "append" hands it
    * only groups the watermark has finalized, exactly once. Stateless
    * streams are identical under both.
    */
  def streamForeachBatch(df: DataFrame, checkpoint: String,
                         outputMode: String = "update")
                        (f: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch(f)
      .outputMode(outputMode)
      .start()
}
