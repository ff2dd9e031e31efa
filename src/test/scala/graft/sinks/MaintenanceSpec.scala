package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.sources.Manifest

/** The maintenance↔manifest pairing law (r8 residual): after ANY
  * [[Maintenance]] verb on a manifested table, a skipping scan answers
  * exactly like a full scan — no manual `refreshPartition` call, no
  * stale file stats (silent misses), no dangling file pointers (loud
  * read failures).
  */
class MaintenanceSpec extends SparkSpec {

  /** Skipping-scan ≡ full-scan over bands that exercise both pruning and
    * full coverage; plus file-list consistency both ways (no manifest row
    * for a dead file, no on-disk data file missing from the manifest —
    * the silent-skip hazard).
    */
  private def assertFresh(dir: String, label: String): Unit = {
    import spark.implicits._
    for (bands <- Seq(
        Map[String, (Any, Any)]("doc_id" -> (0L, 150L)),
        Map[String, (Any, Any)]("doc_id" -> (0L, 10000000L)))) {
      val viaManifest = Manifest.scan(spark, dir, bands)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      val (lo, hi) = bands("doc_id")
      val full = spark.read.parquet(dir)
        .filter($"doc_id".between(lo, hi))
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(viaManifest == full,
        s"$label: skipping scan diverged from full scan for band $bands " +
          s"(${viaManifest.size} vs ${full.size} rows)")
    }
    def diskFiles(f: java.io.File): Seq[String] =
      if (f.isDirectory && f.getName != "_graft_manifest")
        f.listFiles().toSeq.flatMap(diskFiles)
      else if (f.isFile && f.getName.endsWith(".parquet"))
        Seq(f.getAbsolutePath)
      else Nil
    val onDisk = diskFiles(new java.io.File(dir))
      .map(p => p.substring(p.indexOf("/lang="))).sorted
    val listed = spark.read.parquet(s"$dir/_graft_manifest")
      .select($"file").as[String].collect().toSeq
      .map(p => p.substring(p.indexOf("/lang="))).sorted
    assert(listed == onDisk,
      s"$label: manifest file list drifted from disk\n" +
        s"  manifest: $listed\n  disk:     $onDisk")
  }

  test("every maintenance verb keeps the manifest fresh: skipping scan ≡ " +
    "full scan with no manual refresh call") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_maint").toString
    val dir = s"$root/docs"
    val docs = Tables(spark, sfTest, "documents")
    Sinks.writePartitioned(docs, dir, "lang")
    Manifest.write(spark, dir, Seq("doc_id", "lang"))
    assertFresh(dir, "baseline")

    // CDC merge: upsert + an out-of-band doc_id insert (900001 — far above
    // en's old max, so STALE stats would silently skip its file) + a fresh
    // partition + deletes, all in one changeset
    val enIds = docs.filter($"lang" === "en").select($"doc_id")
      .orderBy($"doc_id").limit(2).as[Long].collect().toSeq
    val deIds = docs.filter($"lang" === "de").select($"doc_id")
      .orderBy($"doc_id").limit(2).as[Long].collect().toSeq
    val changes = docs.filter($"doc_id".isin(enIds: _*))
      .withColumn("n_chars", lit(-5L)).withColumn("op", lit("upsert"))
      .unionByName(Seq(
        (900001L, "brand new english doc", "en", "cdc", 21L, "upsert"),
        (900002L, "cau un document nou", "xx", "cdc", 19L, "upsert"))
        .toDF("doc_id", "text", "lang", "source", "n_chars", "op"))
      .unionByName(docs.filter($"doc_id".isin(deIds: _*))
        .withColumn("op", lit("delete")))
    Maintenance.mergePartitions(spark, dir, "lang", changes,
      Seq("doc_id"), opCol = Some("op"))
    assertFresh(dir, "after merge")
    // the out-of-band insert is FINDABLE through the skipping scan — the
    // exact silent miss a stale manifest causes
    assert(Manifest.scan(spark, dir, Map("doc_id" -> (900000L, 900100L)))
      .count() == 2, "stale stats hid the out-of-band inserts")

    // erasure: partial on en; TOTAL on es (retires the partition — its
    // manifest rows must be forgotten, not left dangling)
    Maintenance.erasePartitionRows(spark, dir, "lang", Seq("en"),
      col("doc_id").isin(enIds: _*))
    Maintenance.erasePartitionRows(spark, dir, "lang", Seq("es"),
      lit(true))
    assert(!new java.io.File(s"$dir/lang=es").exists(),
      "erase-all should retire the partition dir")
    assertFresh(dir, "after erasure")

    // compaction + backfill re-statement
    Maintenance.compactPartitions(spark, dir, "lang", Seq("de"),
      targetFiles = 1)
    assertFresh(dir, "after compaction")
    val restated = docs.filter($"lang" === "fr")
      .withColumn("n_chars", $"n_chars" + 1000L)
    Maintenance.overwritePartitions(restated, dir, "lang")
    assertFresh(dir, "after backfill")
    assert(Manifest.scan(spark, dir,
      Map[String, (Any, Any)]("lang" -> ("fr", "fr")))
      .filter($"n_chars" >= 1000L).count() > 0,
      "re-stated rows invisible through the skipping scan")

    // TTL drop forgets the dropped partition's rows
    Maintenance.dropPartitions(spark, dir, "lang", Seq("fr"))
    assert(!new java.io.File(s"$dir/lang=fr").exists())
    assertFresh(dir, "after TTL drop")
    assert(spark.read.parquet(s"$dir/_graft_manifest")
      .filter($"file".contains("/lang=fr/")).count() == 0,
      "dropped partition still listed in the manifest")
  }

  test("maintenance verbs on an UN-manifested table stay plain rewrites — " +
    "no manifest appears, results unchanged") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_maint_nm").toString
    val dir = s"$root/docs"
    val docs = Tables(spark, sfTest, "documents")
    Sinks.writePartitioned(docs, dir, "lang")
    Maintenance.compactPartitions(spark, dir, "lang", Seq("en"))
    Maintenance.erasePartitionRows(spark, dir, "lang", Seq("de"),
      col("doc_id") % 2 === 0)
    assert(!new java.io.File(s"$dir/_graft_manifest").exists(),
      "maintenance invented a manifest the table never had")
    val expect = docs.filter($"lang" =!= "de" ||
      $"doc_id" % 2 =!= 0).count()
    assert(spark.read.parquet(dir).count() == expect)
  }
}
