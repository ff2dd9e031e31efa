package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Persistent IVF index: build once, probe many — the serving-side
  * counterpart of [[VectorOps.annIvf]] (which trains and probes inside a
  * single query, the right shape for one-shot batch jobs but wasteful
  * when the same corpus serves many query batches).
  *
  * Layout on disk (all plain parquet — readable by any engine):
  *   - `<path>/centroids`: (cell INT, centroid ARRAY<DOUBLE>) — nlist rows.
  *   - `<path>/lists`: (vec_id, embedding), HIVE-PARTITIONED BY cell —
  *     probing nprobe cells is a PARTITION-PRUNED scan that reads only
  *     those directories; at 100 TB the other nlist−nprobe cells never
  *     leave object storage (the plan's PartitionFilters prove it, and
  *     the spec pins that).
  *
  * Build cost is one pass over the corpus (executor-side cell assignment
  * against broadcast centroids) plus one shuffle by cell for the
  * partitioned write. The quantizer is the SAME deterministic
  * sample-trained k-means as `annIvf` (shared code), so a probe of the
  * saved index reproduces `annIvf`'s candidate geometry exactly.
  */
object VectorIndex {

  /** Train the coarse quantizer and materialize the inverted-list layout.
    * Returns the centroid count actually written.
    */
  def buildIvf(s: SparkSession, dir: String, indexPath: String,
               nlist: Int = 0, sampleN: Int = 512): Int =
    // same quantizer resolution as annIvf (same auto-sizing rule, same
    // lowest-id bounded sample), so a default build probes identically
    // to the default in-memory query — the VectorIndexSpec equivalence
    // depends on the two agreeing
    buildIvfFrom(s, VectorOps.vectorsParallel(s, dir), indexPath,
      nlist, sampleN)

  /** [[buildIvf]] over an arbitrary (vec_id, vector) dataset — the seam
    * that lets an index serve a DERIVED representation (int8-dequantized,
    * PCA-projected) instead of the raw corpus column: the serving deploy
    * [[VectorOps.ivfServedRecall]] audits stores exactly such a
    * representation. Same deterministic sample-trained quantizer
    * ([[VectorOps.resolveQuantizerOf]]), same hive-partitioned layout.
    */
  /** The frozen-assignment kernel — ONE definition of "which cell does
    * this vector live in" shared by [[buildIvfFrom]], [[appendIvf]] and
    * the streaming [[graft.streaming.QuantMaint]] tier (r19 review: three
    * divergent copies of this 5-line maxBy-cosine map would let a
    * tie-break or accumulation-order change strand a live index's rows
    * in cells the probe path no longer computes). Returns
    * (cell, vec_id, embedding).
    */
  private[graft] def assignToCells(
      vectors: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      centroids: Array[Array[Double]])
  : org.apache.spark.sql.DataFrame = {
    val s = vectors.sparkSession
    import s.implicits._
    val bcCent = s.sparkContext.broadcast(centroids)
    vectors
      .map { case (id, vf) =>
        val v = vf.map(_.toDouble)
        val cent = bcCent.value
        (cent.indices.maxBy(c => VectorOps.cosine(v, cent(c))), id, vf)
      }
      .toDF("cell", "vec_id", "embedding")
  }

  def buildIvfFrom(s: SparkSession,
                   vectors: org.apache.spark.sql.Dataset[(Long, Array[Float])],
                   indexPath: String, nlist: Int = 0,
                   sampleN: Int = 512): Int = {
    import s.implicits._
    val (_, centroids) = VectorOps.resolveQuantizerOf(
      vectors, nlist, sampleN, VectorOps.autoNlist)
    assignToCells(vectors, centroids)
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexPath/lists")
    centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/centroids")
    centroids.length
  }

  /** Remove vectors from a saved index — right-to-be-forgotten reaching
    * the ANN serving layer (an erased document whose embedding still
    * answers similarity queries is not erased). Two bounded steps:
    * one column-pruned scan of (vec_id, cell) finds WHICH inverted
    * lists hold the doomed ids (the collect is the affected-cell list,
    * bounded by nlist), then [[graft.sinks.Sinks.erasePartitionRows]]
    * rewrites exactly those cell partitions through the staging+rename
    * swap — untouched cells stay byte-identical, probes before/after
    * never see a half-rewritten list, and cell geometry is unchanged
    * (deletion never moves a surviving vector). Returns the number of
    * cells rewritten.
    */
  def removeIvf(s: SparkSession, indexPath: String,
                vecIds: Seq[Long]): Int = {
    require(vecIds.nonEmpty, "no ids to remove")
    val doomed = col("vec_id").isin(vecIds: _*)
    val cells = s.read.parquet(s"$indexPath/lists")
      .filter(doomed).select(col("cell").cast("string"))
      .distinct().collect().map(_.getString(0)).sorted
    graft.sinks.Sinks.erasePartitionRows(s, s"$indexPath/lists", "cell",
      cells.toIndexedSeq, doomed)
    cells.length
  }

  /** Incrementally ingest a new vector batch into a saved index — the
    * daily-drop operation that makes the index a living artifact instead
    * of a rebuild-every-time one. New vectors are assigned with the
    * SAVED centroids (the quantizer is frozen at build time — FAISS
    * semantics: cell geometry never shifts under appends, so existing
    * list entries stay valid) and appended to the hive-partitioned list
    * layout in place; a probe after the append sees old and new members
    * of each probed cell together with no read-side merge step, because
    * the partition directory IS the inverted list. Re-train (a fresh
    * `buildIvf`) only when drift degrades recall — that tradeoff is the
    * operator's, not the engine's.
    */
  def appendIvf(s: SparkSession, indexPath: String,
                vectors: org.apache.spark.sql.Dataset[(Long, Array[Float])])
  : Long = {
    import s.implicits._
    val centroids = s.read.parquet(s"$indexPath/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    require(centroids.nonEmpty, s"no centroids at $indexPath")
    val assigned = assignToCells(vectors, centroids)
    // the ingest count rides the write job itself (Retention
    // .curateObserved idiom): a separate count() action would evaluate
    // the caller's dataset twice — doubling ingest cost, and reporting a
    // count that can diverge from the rows actually written when the
    // input is non-deterministic (sampled / limit-derived)
    val obs = new org.apache.spark.sql.Observation()
    assigned.observe(obs, count(lit(1)).as("n_appended"))
      .repartition($"cell")
      .write.mode("append").partitionBy("cell")
      .parquet(s"$indexPath/lists")
    obs.get("n_appended").asInstanceOf[Long]
  }

  /** Serve a batch of queries from the saved index: top-k cosine
    * neighbors per query, probing each query's `nprobe` closest cells.
    *
    * The probe cells of the whole batch are resolved driver-side against
    * the (nlist-row) centroid table and pushed into the scan as LITERAL
    * partition predicates — `cell IN (…)` prunes at the file-listing
    * level, which is what makes a 5-cell probe of a 10k-cell index read
    * 0.05% of the corpus. Queries broadcast (a serving batch is small by
    * definition); candidates never leave their cell partition until the
    * final top-k rank over ≤ queries·nprobe·cellsize rows.
    */
  def probeIvf(s: SparkSession, indexPath: String,
               queries: Seq[(Long, Array[Float])], k: Int = 5,
               nprobe: Int = 4): DataFrame = {
    import s.implicits._
    val centroids = s.read.parquet(s"$indexPath/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    val probes: Seq[(Long, Array[Double], Int)] = queries.flatMap {
      case (qId, qv) =>
        val q = qv.map(_.toDouble)
        centroids.indices.sortBy(c => -VectorOps.cosine(q, centroids(c)))
          .take(nprobe).map(c => (qId, q, c))
    }
    val cells = probes.map(_._3).distinct.sorted
    val lists = s.read.parquet(s"$indexPath/lists")
      .filter($"cell".isin(cells: _*))
      .select($"cell", $"vec_id", $"embedding")
      .as[(Int, Long, Array[Float])]
    val bcProbes = s.sparkContext.broadcast(
      probes.groupBy(_._3).map { case (c, ps) =>
        c -> ps.map(p => (p._1, p._2)).toArray
      })
    val cands = lists.mapPartitions { it =>
      val byCell = bcProbes.value
      it.flatMap { case (cell, bId, bf) =>
        byCell.get(cell) match {
          case None => Iterator.empty
          case Some(qs) =>
            val b = bf.map(_.toDouble)
            qs.iterator.filter(_._1 != bId).map { case (qId, q) =>
              (qId, bId, VectorOps.cosine(q, b))
            }
        }
      }
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy(desc("sim_raw"), $"b_id")
    cands.toDF("q_id", "b_id", "sim_raw")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= k)
      .select($"q_id", $"b_id", round($"sim_raw", 6).as("sim"), $"rn")
      .orderBy($"q_id", $"rn")
  }

  /** Serve a DISTRIBUTED batch of queries from the saved index — the
    * bulk-probe shape (re-rank a corpus, entity-match two datasets)
    * where the query set is itself a Dataset too large to hold on the
    * driver, which [[probeIvf]]'s Seq signature requires.
    *
    * Plan shape: probe-cell assignment runs executor-side against the
    * broadcast (nlist-row) centroid table, nprobe rows per query; the
    * distinct probed cells — bounded by nlist, never by the batch size —
    * are the ONLY driver collect, and compile to the same literal
    * `cell IN (…)` partition predicates as the driver-side probe, so
    * even a million-query batch reads only the directories some query
    * probes. Candidates then meet their queries in ONE equi-join on
    * `cell` (broadcast or shuffle, the planner's call by batch size) and
    * score through the codegen'd `cosine_sim` expression — same
    * double-accumulation order as [[VectorOps.cosine]], so results are
    * byte-identical to [[probeIvf]] for the same queries.
    */
  def probeIvfBatch(s: SparkSession, indexPath: String,
                    queries: org.apache.spark.sql.Dataset[(Long, Array[Float])],
                    k: Int = 5, nprobe: Int = 4): DataFrame = {
    import s.implicits._
    val centroids = s.read.parquet(s"$indexPath/centroids")
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
    require(centroids.nonEmpty, s"no centroids at $indexPath")
    val bcCent = s.sparkContext.broadcast(centroids)
    val probes = queries.flatMap { case (qId, qv) =>
      val q = qv.map(_.toDouble)
      val cent = bcCent.value
      cent.indices.sortBy(c => -VectorOps.cosine(q, cent(c)))
        .take(nprobe).map(c => (c, qId, qv))
    }.toDF("cell", "q_id", "q_emb")
    val cells = probes.select($"cell").distinct().as[Int].collect().sorted
    val lists = s.read.parquet(s"$indexPath/lists")
      .filter($"cell".isin(cells.toIndexedSeq: _*))
      .select($"cell", $"vec_id", $"embedding")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy(desc("sim_raw"), $"b_id")
    lists.join(probes, Seq("cell"))
      .filter($"q_id" =!= $"vec_id")
      .select($"q_id", $"vec_id".as("b_id"),
        call_function("cosine_sim", $"q_emb", $"embedding").as("sim_raw"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= k)
      .select($"q_id", $"b_id", round($"sim_raw", 6).as("sim"), $"rn")
      .orderBy($"q_id", $"rn")
  }
}
