package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.sinks.Sinks

class ManifestSpec extends SparkSpec {

  test("manifest skipping scan prunes files on a z-ordered layout and " +
    "returns exactly the full scan's rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_manifest").toString
    val docs = Tables(spark, sfTest, "documents")
    Sinks.writeZOrdered(docs, s"$dir/docs", "doc_id", "n_chars",
      targetFiles = 8)
    Manifest.write(spark, s"$dir/docs", Seq("doc_id", "n_chars"))

    // the manifest dir must be invisible to plain readers of the table
    assert(spark.read.parquet(s"$dir/docs").count() == docs.count(),
      "manifest rows leaked into table reads")

    val all = Manifest.prunedFiles(spark, s"$dir/docs", Map.empty)
    assert(all.size >= 6, s"fixture produced too few files: ${all.size}")

    val lo = 100L; val hi = 180L
    val bands = Map("doc_id" -> (lo, hi))
    val pruned = Manifest.prunedFiles(spark, s"$dir/docs", bands)
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"no skipping happened: ${pruned.size} of ${all.size} files survive")

    val viaManifest = Manifest.scan(spark, s"$dir/docs", bands)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val full = spark.read.parquet(s"$dir/docs")
      .filter($"doc_id" >= lo && $"doc_id" <= hi)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(viaManifest == full, "skipping scan lost or invented rows")

    // two-column band: the z-order rectangle promise — both columns
    // prune, the conjunction reads fewer files than either alone
    val bands2 = Map("doc_id" -> (lo, hi), "n_chars" -> (50L, 120L))
    val pruned2 = Manifest.prunedFiles(spark, s"$dir/docs", bands2)
    assert(pruned2.size <= pruned.size)
    val via2 = Manifest.scan(spark, s"$dir/docs", bands2)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val full2 = spark.read.parquet(s"$dir/docs")
      .filter($"doc_id".between(lo, hi) && $"n_chars".between(50L, 120L))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(via2 == full2)

    // a band no file can satisfy: empty result, schema intact, no error
    val none = Manifest.scan(spark, s"$dir/docs",
      Map("doc_id" -> (10000000L, 20000000L)))
    assert(none.isEmpty && none.columns.toSeq ==
      spark.read.parquet(s"$dir/docs").columns.toSeq)
  }

  test("manifest scan keeps hive partition columns via basePath") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_manifp").toString
    val docs = Tables(spark, sfTest, "documents")
    Sinks.writePartitioned(docs, s"$dir/docs", "lang")
    Manifest.write(spark, s"$dir/docs", Seq("doc_id", "lang"))

    val bands = Map("doc_id" -> (0L, 150L))
    val got = Manifest.scan(spark, s"$dir/docs", bands)
    assert(got.columns.contains("lang"),
      "partition column lost when reading leaf files")
    val expect = docs.filter($"doc_id".between(0L, 150L))
      .select($"doc_id", $"lang").collect().map(_.toString).sorted.toSeq
    assert(got.select($"doc_id", $"lang").collect()
      .map(_.toString).sorted.toSeq == expect)

    // a partition column listed in statCols prunes files too: lang is
    // constant per file, so a lang band keeps only that partition's files
    Manifest.write(spark, s"$dir/docs", Seq("doc_id", "lang"))
    val enOnly = Manifest.prunedFiles(spark, s"$dir/docs",
      Map("lang" -> ("en", "en")))
    assert(enOnly.nonEmpty && enOnly.forall(_.contains("lang=en")),
      s"lang band kept foreign files: $enOnly")
  }

  test("refreshPartition replaces one partition's manifest rows and " +
    "leaves the rest untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_manifr").toString
    val docs = Tables(spark, sfTest, "documents")
    Sinks.writePartitioned(docs, s"$dir/docs", "lang")
    // built incrementally from nothing: one partition at a time
    Seq("en", "de").foreach { v =>
      Manifest.refreshPartition(spark, s"$dir/docs", "lang", v,
        Seq("doc_id", "lang"))
    }
    val m0 = spark.read.parquet(s"$dir/docs/_graft_manifest")
    assert(m0.filter($"min_lang" === "en").count() >= 1 &&
      m0.filter($"min_lang" === "de").count() >= 1)
    val deRowsBefore = m0.filter($"min_lang" === "de")
      .collect().map(_.toString).sorted.toSeq

    // compaction rewrites en's files; the refresh replaces en's rows
    // (no stale files, no duplicates) and de's rows carry over verbatim
    Sinks.compactPartitions(spark, s"$dir/docs", "lang", Seq("en"),
      targetFiles = 1)
    Manifest.refreshPartition(spark, s"$dir/docs", "lang", "en",
      Seq("doc_id", "lang"))
    val m1 = spark.read.parquet(s"$dir/docs/_graft_manifest")
    val enFiles = m1.filter($"min_lang" === "en").select($"file")
      .as[String].collect().toSeq
    assert(enFiles.length == 1, s"stale or duplicated en rows: $enFiles")
    assert(new java.io.File(new java.net.URI(enFiles.head)).exists(),
      "manifest points at a rewritten-away file")
    assert(m1.filter($"min_lang" === "de").collect()
      .map(_.toString).sorted.toSeq == deRowsBefore,
      "an untouched partition's manifest rows changed")

    // the refreshed manifest still serves a skipping scan correctly
    val got = Manifest.scan(spark, s"$dir/docs",
      Map("lang" -> ("en", "en"), "doc_id" -> (0L, 100L)))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val expect = docs.filter($"lang" === "en" && $"doc_id".between(0L, 100L))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got == expect)
  }

  test("refreshPartition keeps a NUMERIC partition column's stats in its " +
    "native type — no silent string coercion, no lexicographic skips") {
    import spark.implicits._
    // the r8 advice finding: refresh recorded the partition value as a
    // string lit while build() records the hive-discovered native type;
    // unionByName then coerced the merged min_/max_ columns to string and
    // prunedFiles compared lexicographically ('9' > '10') — silently
    // skipping overlapping files. Buckets 0..11 make the 2-vs-10 ordering
    // trap live.
    val dir = Files.createTempDirectory("graft_manifnum").toString
    val docs = Tables(spark, sfTest, "documents")
      .withColumn("bucket", ($"doc_id" % 12).cast("int"))
    Sinks.writePartitioned(docs, s"$dir/docs", "bucket")
    Manifest.write(spark, s"$dir/docs", Seq("doc_id", "bucket"))
    val nativeType = spark.read.parquet(s"$dir/docs/_graft_manifest")
      .schema("min_bucket").dataType
    assert(nativeType.typeName == "integer",
      s"build() no longer records the native type: $nativeType")

    // refresh two partitions (one >= 10, so lexicographic order differs
    // from numeric) — the merged manifest must KEEP the native type
    Seq("2", "10").foreach { v =>
      Manifest.refreshPartition(spark, s"$dir/docs", "bucket", v,
        Seq("doc_id", "bucket"))
    }
    val merged = spark.read.parquet(s"$dir/docs/_graft_manifest")
    assert(merged.schema("min_bucket").dataType == nativeType &&
      merged.schema("max_bucket").dataType == nativeType,
      s"refresh coerced bucket stats to " +
        s"${merged.schema("min_bucket").dataType}")

    // and the skipping scan over a band that straddles the refreshed
    // partitions still answers exactly like the full scan
    val bands = Map("bucket" -> (2, 10))
    val got = Manifest.scan(spark, s"$dir/docs", bands)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val expect = docs.filter($"bucket".between(2, 10))
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got == expect, "numeric band skipped overlapping files")
    // pruning still actually prunes (buckets 0,1,11 are skippable)
    val all = Manifest.prunedFiles(spark, s"$dir/docs", Map.empty)
    val kept = Manifest.prunedFiles(spark, s"$dir/docs", bands)
    assert(kept.size < all.size, "band kept every file — no skipping")
  }
}
