package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan for each named query
  * (all queries if no args). Usage:
  *   sbt "runMain graft.Explain q_topk_parts q_dedup_ngram"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // cache OFF here: Explain's job is the cold plan — PushedFilters /
    // ReadSchema on the parquet scans must stay visible.
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
