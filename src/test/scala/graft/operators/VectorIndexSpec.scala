package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Build-once/probe-many IVF index: correctness against the in-query
  * `annIvf` (same deterministic quantizer, so probes must reproduce its
  * results exactly) and the layout property that makes it a serving
  * index — probing nprobe cells partition-prunes the list scan.
  */
class VectorIndexSpec extends SparkSpec {

  test("probing the saved index reproduces annIvf for the same queries " +
    "and partition-prunes the list scan") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_ivf").toString
    val nlist = VectorIndex.buildIvf(spark, sfTest, idx)
    assert(nlist > 1)

    val queries = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding")
      .orderBy($"vec_id").limit(8)
      .as[(Long, Array[Float])].collect().toSeq
    val probe = VectorIndex.probeIvf(spark, idx, queries)

    // partition pruning: the scan of lists/ must carry the cell IN (…)
    // partition filter — only the probed directories are read
    val scans = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata("Location").contains("lists") => f
    }
    assert(scans.nonEmpty)
    val pf = scans.head.metadata("PartitionFilters")
    assert(pf.contains("cell"), s"no cell partition filter: $pf")

    val got = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val qIds = queries.map(_._1).toSet
    val expected = VectorOps.annIvf(spark, sfTest).collect()
      .filter(r => qIds.contains(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq,
      s"index probe diverged from annIvf:\n got ${got.take(8).toSeq}\n " +
        s"exp ${expected.take(8).toSeq}")

    // the saved layout is engine-neutral plain parquet
    assert(spark.read.parquet(s"$idx/centroids").count() == nlist)
    assert(spark.read.parquet(s"$idx/lists").count() ==
      Tables(spark, sfTest, "embeddings").count())
  }

  test("incremental append ingests new vectors into the saved lists " +
    "and probes see them immediately") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_ivf_app").toString
    VectorIndex.buildIvf(spark, sfTest, idx)
    val before = spark.read.parquet(s"$idx/lists").count()

    // new batch: exact copies of two existing vectors under fresh ids —
    // their cell assignment is forced identical (frozen quantizer), and
    // each must surface as its twin's top neighbor with sim 1.0
    val twins = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding")
      .orderBy($"vec_id").limit(2)
      .as[(Long, Array[Float])].collect()
    val batch = twins.map { case (id, v) => (id + 1000000L, v) }.toSeq
    val n = VectorIndex.appendIvf(spark, idx, spark.createDataset(batch))
    assert(n == 2)
    assert(spark.read.parquet(s"$idx/lists").count() == before + 2)

    val probe = VectorIndex.probeIvf(spark, idx,
      twins.map { case (id, v) => (id, v) }.toSeq, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    twins.foreach { case (id, _) =>
      val hit = probe.find(_._1 == id).get
      assert(hit._2 == id + 1000000L && hit._3 == 1.0,
        s"appended twin not the top neighbor of $id: $hit")
    }
  }

  test("removal erases vectors from the serving index: probes forget " +
    "them, untouched cells stay byte-identical") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_ivf_rm").toString
    VectorIndex.buildIvf(spark, sfTest, idx)
    val lists = spark.read.parquet(s"$idx/lists")
    val total = lists.count()

    // doom two ids from one cell; find an unaffected cell to byte-check
    val victims = lists.select($"cell", $"vec_id").orderBy($"vec_id")
      .limit(2).collect().map(r => (r.getInt(0), r.getLong(1)))
    val doomedIds = victims.map(_._2).toSeq
    val doomedCells = victims.map(_._1).toSet
    val quietCell = lists.select($"cell").distinct()
      .as[Int].collect().filterNot(doomedCells).head
    def filesOf(c: Int) =
      new java.io.File(s"$idx/lists/cell=$c").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.startsWith("."))
        .map(f => (f.getName, f.length)).sorted.toSeq
    val quietBefore = filesOf(quietCell)

    // probes with the doomed vectors' OWN embeddings under shifted query
    // ids (probeIvf excludes query_id == vec_id self-matches) must find
    // them at sim 1.0 before removal
    val qs = Tables(spark, sfTest, "embeddings")
      .filter($"vec_id".isin(doomedIds: _*))
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id + 500000L, v) }.toSeq
    val preHits = VectorIndex.probeIvf(spark, idx, qs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    qs.foreach { case (qid, _) => assert(preHits(qid) == 1.0,
      s"probe for $qid missed the still-indexed twin: ${preHits(qid)}") }

    val cellsRewritten = VectorIndex.removeIvf(spark, idx, doomedIds)
    assert(cellsRewritten == doomedCells.size)
    val after = spark.read.parquet(s"$idx/lists")
    assert(after.count() == total - doomedIds.size)
    assert(after.filter($"vec_id".isin(doomedIds: _*)).count() == 0,
      "removed vectors still in the lists")
    assert(filesOf(quietCell) == quietBefore,
      "removal rewrote a cell it had no business touching")
    // probes no longer return the removed vectors (a duplicate embedding
    // elsewhere in the corpus may still score 1.0 — the claim is about
    // the removed IDS, not the similarity value)
    val postHits = VectorIndex.probeIvf(spark, idx, qs, k = 3).collect()
      .map(r => r.getLong(1)).toSet
    assert(doomedIds.forall(id => !postHits.contains(id)),
      s"a removed vector still answers probes: $postHits")
  }

  test("distributed batch probe matches the driver-side probe byte-for-" +
    "byte through one partition-pruned list scan") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_ivf_batch").toString
    VectorIndex.buildIvf(spark, sfTest, idx)
    val queries = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding")
      .orderBy($"vec_id").limit(20)
      .as[(Long, Array[Float])].collect().toSeq

    val batched = VectorIndex.probeIvfBatch(spark, idx,
      spark.createDataset(queries))
    // one scan of lists/, still carrying the literal cell IN (…)
    // partition filter — the bulk join must not give up pruning
    val scans = batched.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.metadata("Location").contains("lists") => f
    }
    assert(scans.length == 1,
      s"expected exactly one list scan, found ${scans.length}")
    assert(scans.head.metadata("PartitionFilters").contains("cell"),
      s"batch probe lost partition pruning: ${scans.head.metadata}")

    // the join + codegen'd cosine path must reproduce the broadcast
    // mapPartitions path EXACTLY (same double accumulation order, same
    // tie-breaks) — any drift here is a wrong answer, not noise
    val a = VectorIndex.probeIvf(spark, idx, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val b = batched.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(a.nonEmpty && a.toSeq == b.toSeq,
      s"batched probe diverged:\n got ${b.take(5).toSeq}\n exp ${a.take(5).toSeq}")
  }
}
