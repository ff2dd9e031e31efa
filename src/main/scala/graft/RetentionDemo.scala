package graft

/** Demo main for the retention pipeline (WebhookDemo-style harness):
  * curates a corpus dir into compacted parquet and prints the funnel.
  *   sbt "runMain graft.RetentionDemo [sfDir [outDir]]"
  */
object RetentionDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_curated").toString
    val spark = GraftSession.builder(GraftSession.envCpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val total = Tables(spark, dir, "documents").count()
    val admitted = operators.TextOps.admittedDocs(spark, dir).count()
    operators.Retention.curate(spark, dir, s"$out/documents.parquet")
    val kept = spark.read.parquet(s"$out/documents.parquet").count()
    println(s"RETENTION total=$total admitted=$admitted " +
      s"near_dup_dropped=${admitted - kept} kept=$kept " +
      s"out=$out/documents.parquet")
    spark.stop()
  }
}
