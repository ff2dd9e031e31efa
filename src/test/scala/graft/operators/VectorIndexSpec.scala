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

  test("ivf-served recall audit: at nprobe = nlist the probe is a full " +
    "scan through the index and per-anchor int8 recall matches the " +
    "driver recompute exactly — so any sub-1.0 recall at the deploy " +
    "config is genuinely representation + candidate loss") {
    import spark.implicits._
    def rhu(x: Double, sc: Int) = BigDecimal(x)
      .setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    val k = 10
    // nprobe far above the auto-sized nlist (16 at the fixture): every
    // cell is probed, so the served candidate set is the whole corpus
    // through the index path — candidate loss is zero BY CONSTRUCTION
    // and the report isolates pure representation loss
    val full = VectorOps.ivfServedRecall(spark, sfTest, k = k,
      nprobe = 4096).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val d = vecs.head._2.length
    val scales = (0 until d).map(i =>
      vecs.iterator.map(v => math.abs(v._2(i).toDouble)).max).toArray
    def dq(x: Float, s: Double): Double =
      if (s == 0.0) 0.0
      else math.max(math.min(
        rhu(x.toDouble / s * 127.0, 0), 127.0), -127.0) / 127.0 * s
    // the stored representation is float32 — replicate the cast, then
    // score in double exactly as the codegen'd cosine does
    val rep = vecs.map { case (id, v) =>
      (id, v.indices.map(i => dq(v(i), scales(i)).toFloat.toDouble).toArray)
    }
    val orig = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
    def ssq(v: Array[Double]) = v.map(x => x * x).sum
    // pools mirror the r19 shared-truth contract: truth candidates and
    // the anchor spine are FLOAT-live; the rep's index additionally
    // drops vq-zero vectors (they have no direction to serve)
    val liveF = orig.filter { case (_, v) => ssq(v) > 0.0 }
      .map(_._1).toSet
    val liveRep = rep.filter { case (id, v) => liveF(id) && ssq(v) > 0.0 }
      .map(_._1).toSet
    val anchors = liveF.filter(_ % 50 == 0).toSeq.sorted
    def topk(space: Map[Long, Array[Double]], q: Long,
             pool: Set[Long]) =
      space.keysIterator.filter(b => b != q && pool(b)).toSeq
        .map(b => (b, VectorOps.cosine(space(q), space(b))))
        .sortBy { case (b, s) => (-s, b) }.take(k).map(_._1).toSet
    val origM = orig.toMap
    val repM = rep.toMap
    val int8Full = full.filter(_._1 == "int8")
    assert(int8Full.map(_._2).toSeq == anchors,
      "anchor spine must be the live stride ids")
    int8Full.foreach { case (_, q, nK, nOv, rec) =>
      val truth = topk(origM, q, liveF)
      val served = topk(repM, q, liveRep)
      assert(nK == k.toLong, s"anchor $q: n_k $nK")
      assert(nOv == (truth & served).size.toLong,
        s"anchor $q: overlap $nOv vs ${(truth & served).size}")
      assert(rec == rhu(nOv.toDouble / k, 4))
    }
    // deploy config: both representations reported, spine and bounds
    // hold, and the audit is deterministic end-to-end (fresh index
    // build + probe both times)
    val dep = VectorOps.ivfServedRecall(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(dep.map(_._1).distinct.sorted.toSeq == Seq("int8", "pca8_int8"))
    dep.groupBy(_._1).foreach { case (rp, rows) =>
      assert(rows.map(_._2).toSeq == anchors, s"$rp anchor spine")
      rows.foreach { case (_, q, nK, nOv, rec) =>
        assert(nK == k.toLong && nOv >= 0L && nOv <= nK, s"$rp $q")
        assert(rec >= 0.0 && rec <= 1.0 && rec == rhu(nOv.toDouble / k, 4))
      }
    }
    val dep2 = VectorOps.ivfServedRecall(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(dep2.toSeq == dep.toSeq, "served audit must be deterministic")
  }

  test("clip-rule served audit: at nprobe = nlist per-anchor int8_clip " +
    "recall matches the driver recompute under the exact order-statistic " +
    "scales, clipQ = 1.0 degenerates to the max rule, and the deploy " +
    "run reports both clip reps on the shared float-live spine") {
    import spark.implicits._
    def rhu(x: Double, sc: Int) = BigDecimal(x)
      .setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    val k = 10
    val clipQ = 0.99
    val full = VectorOps.ivfServedRecallClip(spark, sfTest, clipQ = clipQ,
      k = k, nprobe = 4096).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val d = vecs.head._2.length
    val n = vecs.length
    // clip scale = the exact ceil(clipQ·n)-th smallest |x| per dim —
    // the same one-IEEE-product rank clipScalesOf computes
    val rank = math.ceil(clipQ * n).toInt
    val scales = (0 until d).map { i =>
      vecs.map(v => math.abs(v._2(i).toDouble)).sorted.apply(rank - 1)
    }.toArray
    def dq(x: Float, s: Double): Double =
      if (s == 0.0) 0.0
      else math.max(math.min(
        rhu(x.toDouble / s * 127.0, 0), 127.0), -127.0) / 127.0 * s
    val rep = vecs.map { case (id, v) =>
      (id, v.indices.map(i => dq(v(i), scales(i)).toFloat.toDouble).toArray)
    }
    val orig = vecs.map { case (id, v) => (id, v.map(_.toDouble)) }
    def ssq(v: Array[Double]) = v.map(x => x * x).sum
    val liveF = orig.filter { case (_, v) => ssq(v) > 0.0 }
      .map(_._1).toSet
    val liveRep = rep.filter { case (id, v) => liveF(id) && ssq(v) > 0.0 }
      .map(_._1).toSet
    val anchors = liveF.filter(_ % 50 == 0).toSeq.sorted
    def topk(space: Map[Long, Array[Double]], q: Long,
             pool: Set[Long]) =
      space.keysIterator.filter(b => b != q && pool(b)).toSeq
        .map(b => (b, VectorOps.cosine(space(q), space(b))))
        .sortBy { case (b, s) => (-s, b) }.take(k).map(_._1).toSet
    val origM = orig.toMap
    val repM = rep.toMap
    val clipFull = full.filter(_._1 == "int8_clip")
    assert(clipFull.map(_._2).toSeq == anchors,
      "clip anchor spine must be the float-live stride ids")
    clipFull.foreach { case (_, q, nK, nOv, rec) =>
      val truth = topk(origM, q, liveF)
      val served = topk(repM, q, liveRep)
      assert(nK == k.toLong, s"anchor $q: n_k $nK")
      assert(nOv == (truth & served).size.toLong,
        s"anchor $q: overlap $nOv vs ${(truth & served).size}")
      assert(rec == rhu(nOv.toDouble / k, 4))
    }
    // the clip rule must BITE at the graded default on this corpus —
    // otherwise the leg degenerates to a rerun of the max audit
    val maxScales = (0 until d).map(i =>
      vecs.iterator.map(v => math.abs(v._2(i).toDouble)).max).toArray
    assert(scales.indices.exists(i => scales(i) != maxScales(i)),
      "p99 clip scales must differ from the max rule on the fixture")
    // boundary identity: rank ceil(1.0·n) = n = the abs-max element,
    // so the whole audit collapses to the max rule (rep tags aside)
    val idClip = VectorOps.ivfServedRecallClip(spark, sfTest, clipQ = 1.0)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(0).stripSuffix("_clip"))).toSeq
    val idMax = VectorOps.ivfServedRecall(spark, sfTest)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(0))).toSeq
    assert(idClip == idMax, "clipQ = 1.0 must degenerate to the max rule")
    // deploy config: both clip reps reported, spine and bounds hold
    val dep = VectorOps.ivfServedRecallClip(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(dep.map(_._1).distinct.sorted.toSeq ==
      Seq("int8_clip", "pca8_int8_clip"))
    dep.groupBy(_._1).foreach { case (rp, rows) =>
      assert(rows.map(_._2).toSeq == anchors, s"$rp anchor spine")
      rows.foreach { case (_, q, nK, nOv, rec) =>
        assert(nK == k.toLong && nOv >= 0L && nOv <= nK, s"$rp $q")
        assert(rec >= 0.0 && rec <= 1.0 && rec == rhu(nOv.toDouble / k, 4))
      }
    }
  }
}
