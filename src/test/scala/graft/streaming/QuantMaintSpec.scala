package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** QuantMaint (s_quant_maint / s_clip_requantize / s_served_probe):
  * the streaming served-index tier. Pins: probe ≡ spec-local brute
  * force over the SAME grid rep at nprobe = nlist; clipQ = 1.0 epoch
  * scales ≡ the max rule; replay-idempotent appends; the clip
  * migration's scales = the driver-recomputed exact order statistic
  * with the vector set preserved; epoch-swap crash heal; audit recall
  * + cadence.
  */
class QuantMaintSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_qmaint_$tag").toString

  /** Spec-local grid image — independent recompute of the int8
    * dequantize formula (HALF_UP away from zero, clamp ±127,
    * zero-scale dim → 0).
    */
  private def grid(v: Array[Float], sc: Array[Double]): Array[Float] =
    v.indices.map { i =>
      val s = sc(i)
      if (s == 0.0) 0f
      else {
        val a = v(i).toDouble / s * 127.0
        val r = if (a >= 0) math.floor(a + 0.5) else math.ceil(a - 0.5)
        (math.max(-127.0, math.min(127.0, r)) / 127.0 * s).toFloat
      }
    }.toArray

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact order-statistic scale per dim: the ceil(q·n)-th smallest
    * |x| — the clipScalesOf contract, recomputed locally.
    */
  private def clipScales(vs: Seq[Array[Float]], q: Double): Array[Double] =
    vs.head.indices.map { d =>
      val xs = vs.map(v => math.abs(v(d).toDouble)).sorted
      xs(math.ceil(q * xs.size).toInt - 1)
    }.toArray

  // mixed-direction fixture: two near-dup families + an off-axis vector
  // + id 8 carrying an OUTLIER coordinate (dim 2 = 100 vs otherwise
  // ≤ 3) so a p75 clip rule genuinely differs from max
  private val fixture: Seq[(Long, Array[Float])] = Seq(
    0L -> Array(1f, 0.1f, 0f, 0f),
    2L -> Array(2f, 0.3f, 0f, 0f),
    4L -> Array(0f, 1f, 2f, 0f),
    6L -> Array(0f, 1.2f, 3f, 0.5f),
    8L -> Array(0.5f, 0f, 100f, 1f),
    9L -> Array(0.2f, 0.4f, 1f, 3f))

  private def initState(tag: String, clipQ: Double = 1.0): String = {
    import spark.implicits._
    val path = tmp(tag)
    QuantMaint.init(fixture.toDF("vec_id", "embedding"), path,
      clipQ = clipQ, nlist = 4)
    path
  }

  /** Local brute-force served truth over a grid rep: top-k grid-cosine
    * neighbors per query (sim DESC, id ASC), self excluded, dead rows
    * out on both sides.
    */
  private def bruteTopK(corpus: Seq[(Long, Array[Float])],
                        sc: Array[Double], k: Int)
  : Set[(Long, Long, Long)] = {
    val g = corpus.map { case (id, v) => id -> grid(v, sc) }
      .filter(_._2.exists(_ != 0f))
    g.flatMap { case (qId, qv) =>
      g.filter(_._1 != qId)
        .map { case (bId, bv) => (bId, cos(qv, bv)) }
        .sortBy { case (bId, s) => (-s, bId) }
        .take(k).zipWithIndex
        .map { case ((bId, _), i) => (qId, bId, i + 1L) }
    }.toSet
  }

  test("init freezes max-rule scales at clipQ=1.0 and serves " +
    "probe ≡ brute force at nprobe=nlist") {
    import spark.implicits._
    val path = initState("initmax")
    val scales = spark.read.parquet(s"$path/quant/scales")
      .select($"dim".cast("int"), $"scale".cast("double"),
        $"clip_q".cast("double"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(scales.map(_._3).toSet == Set(1.0))
    val expMax = fixture.head._2.indices
      .map(d => fixture.map(v => math.abs(v._2(d).toDouble)).max)
    assert(scales.map(_._2).toSeq == expMax, "clipQ=1.0 must BE the max rule")
    val served = QuantMaint.probe(spark, path,
      fixture.toDF("vec_id", "v").as[(Long, Array[Float])],
      k = 3, nprobe = 4)
      .select($"q_id", $"b_id", $"rn").as[(Long, Long, Long)]
      .collect().toSet
    assert(served == bruteTopK(fixture, scales.map(_._2), 3),
      "probe at nprobe=nlist must equal the spec-local brute force " +
        "over the same grid rep")
  }

  test("applyBatch appends under frozen scales, reports dead rows, " +
    "and replays idempotently") {
    import spark.implicits._
    val path = initState("apply")
    val batch = Seq(
      20L -> Array(1.1f, 0.2f, 0f, 0f), // joins the dim-0 family
      21L -> Array(0f, 0f, 0f, 0.001f), // grid-dead: |x| far below the
      // dim-3 scale (3.0) → code 0 on every dim
      22L -> Array(0f, 1f, 2.5f, 0f))
    val before = spark.read.parquet(s"$path/quant/idx/lists").count()
    val r0 = QuantMaint.applyBatch(batch.toDF("vec_id", "embedding"), 0L,
      path).select($"vec_id", $"cell", $"served")
      .as[(Long, Int, Boolean)].collect().sortBy(_._1)
    assert(r0.map(x => x._1 -> x._3).toSeq ==
      Seq(20L -> true, 21L -> false, 22L -> true))
    assert(r0.filter(_._3).forall(_._2 >= 0) &&
      r0.filter(!_._3).forall(_._2 == -1))
    val after = spark.read.parquet(s"$path/quant/idx/lists").count()
    assert(after == before + 2, "only the two live grid rows append")
    // crash replay: the same batch id re-applies byte-identically
    val r1 = QuantMaint.applyBatch(batch.toDF("vec_id", "embedding"), 0L,
      path).select($"vec_id", $"cell", $"served")
      .as[(Long, Int, Boolean)].collect().sortBy(_._1)
    assert(r1.toSeq == r0.toSeq, "replay must report the same rows")
    assert(spark.read.parquet(s"$path/quant/idx/lists").count() == after,
      "replay must not duplicate index rows")
    // the appended vectors are served
    val hits = QuantMaint.probe(spark, path,
      Seq(20L -> Array(1.1f, 0.2f, 0f, 0f)).toDF("vec_id", "v")
        .as[(Long, Array[Float])], k = 2, nprobe = 4)
      .select($"b_id").as[Long].collect().toSet
    assert(hits.contains(0L) || hits.contains(2L),
      s"appended vector must meet its dim-0 family, got $hits")
  }

  test("requantize migrates to the exact clip order statistic, " +
    "preserves the vector set, and still serves ≡ brute force") {
    import spark.implicits._
    val path = initState("clipmig")
    val idsBefore = spark.read.parquet(s"$path/quant/idx/lists")
      .select($"vec_id").as[Long].collect().toSet
    QuantMaint.requantize(spark, path, clipQ = 0.75, nlist = 4)
    val scales = spark.read.parquet(s"$path/quant/scales")
      .select($"dim".cast("int"), $"scale".cast("double"),
        $"clip_q".cast("double"))
      .as[(Int, Double, Double)].collect().sortBy(_._1)
    assert(scales.map(_._3).toSet == Set(0.75))
    val expClip = clipScales(fixture.map(_._2), 0.75)
    assert(scales.map(_._2).toSeq == expClip.toSeq,
      "epoch scales must be the driver-recomputed exact order statistic")
    assert(expClip(2) != fixture.map(v => math.abs(v._2(2))).max.toDouble,
      "fixture must exercise a genuinely clipped dim")
    val idsAfter = spark.read.parquet(s"$path/quant/idx/lists")
      .select($"vec_id").as[Long].collect().toSet
    assert(idsAfter == idsBefore,
      "the migration re-quantizes from float source - no vector lost")
    val served = QuantMaint.probe(spark, path,
      fixture.toDF("vec_id", "v").as[(Long, Array[Float])],
      k = 3, nprobe = 4)
      .select($"q_id", $"b_id", $"rn").as[(Long, Long, Long)]
      .collect().toSet
    assert(served == bruteTopK(fixture, expClip, 3),
      "post-migration probe must equal brute force over the NEW rep")
  }

  test("a crash between epoch delete and rename heals on the next read") {
    import spark.implicits._
    val path = initState("crash")
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate: complete sealed tree exists, live epoch already deleted
    assert(fs.rename(new Path(s"$path/quant"),
      new Path(s"$path/quant.sealed")))
    val audit = QuantMaint.servedAudit(spark, path, k = 10, nprobe = 4,
      stride = 2)
    assert(audit.count() == 1, "recover must heal the epoch before reads")
    assert(fs.exists(new Path(s"$path/quant")) &&
      !fs.exists(new Path(s"$path/quant.sealed")))
  }

  test("servedAudit reads recall 1.0 at nprobe=nlist with k covering " +
    "the corpus, and echoes the epoch rule") {
    import spark.implicits._
    val path = initState("audit", clipQ = 0.75)
    val r = QuantMaint.servedAudit(spark, path, k = 10, nprobe = 4,
      stride = 2)
      .select($"clip_q", $"n_anchors", $"n_k", $"n_overlap", $"recall")
      .as[(Double, Long, Long, Long, Double)].head()
    assert(r._1 == 0.75, "audit must echo the live epoch's rule")
    // anchors: even ids 0,2,4,6,8 (all float-live)
    assert(r._2 == 5L)
    assert(r._3 == 25L, "k=10 > corpus: truth = all 5 float-live others")
    assert(r._4 == r._3 && r._5 == 1.0,
      s"nprobe=nlist serves the whole corpus - expected recall 1.0, got $r")
  }

  test("streaming start applies batches and lands audit rows at the " +
    "configured cadence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = initState("stream")
    val (resP, ckP, audP) = (tmp("res"), tmp("ck"), tmp("aud"))
    val ms = MemoryStream[(Long, Array[Float])]
    val q = QuantMaint.start(ms.toDF().toDF("vec_id", "embedding"), path,
      resP, ckP, auditEvery = 2, auditPath = audP, k = 10, nprobe = 4,
      stride = 2)
    ms.addData(Seq(30L -> Array(1.3f, 0.1f, 0f, 0f)))
    q.processAllAvailable()
    ms.addData(Seq(31L -> Array(0f, 1.1f, 2.2f, 0f)))
    q.processAllAvailable()
    q.stop()
    val res = spark.read.parquet(resP)
      .select($"batch_id", $"vec_id", $"served")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(res == Set((0L, 30L, true), (1L, 31L, true)))
    val auditBatches = spark.read.parquet(audP)
      .select($"batch_id").as[Long].collect().toSeq
    assert(auditBatches == Seq(0L),
      s"auditEvery=2 lands a row at batch 0 only, got $auditBatches")
    // streamed vectors are served from the live epoch
    val hits = QuantMaint.probe(spark, path,
      Seq(31L -> Array(0f, 1.1f, 2.2f, 0f)).toDF("vec_id", "v")
        .as[(Long, Array[Float])], k = 1, nprobe = 4)
      .select($"b_id").as[Long].collect().toSet
    assert(hits.nonEmpty && !hits.contains(31L))
  }
}
