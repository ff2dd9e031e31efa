package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg (dev only — the driver passes two): comma-separated
    // query names to dump, for fast single-query iteration against
    // tools/diff_local.py.
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(',').toSet))
    }
    // cacheTables ON: the correctness-graded path and the bench-graded path
    // must be the same path (Tables Scaladoc).
    val spark = GraftSession.builder(GraftSession.envCpus)
      .config("spark.graft.cacheTables", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          lintGradedSchema(name, df.schema)
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        }
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Run provenance (r10 ADVICE): tie the dump to the commit and the data
    // snapshot it ran against, so a correctness record can't silently mix
    // a new testdata drop with an old build (the events.ts re-encodings
    // made exactly that ambiguity real three rounds running).
    Files.writeString(Paths.get(s"$outDir/provenance.json"),
      provenanceJson(sfDir))
    spark.stop()
  }

  /** Graded-output boundary lint (r17, from the r16 q_pca_project /
    * q_shingle_df driver failures): the driver's differ hashes values via
    * pandas, which cannot hash Array/Map/Struct cells and represents
    * parquet DECIMAL as object-Decimal (hash-splitting against the
    * oracle's numeric even when values are identical). No graded output
    * column may carry these types — complex shapes are graded in long
    * form (posexplode), decimals cast to BIGINT/DOUBLE at the boundary.
    * Throwing here (caught per-query above) keeps the defect loud in
    * BOTH the local differ run and the driver dump instead of shipping a
    * silent hash mismatch.
    */
  def lintGradedSchema(name: String,
                       schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types._
    val bad = schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] ||
        f.dataType.isInstanceOf[DecimalType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }
    if (bad.nonEmpty) throw new IllegalStateException(
      s"graded output of $name carries driver-unhashable column type(s) " +
        bad.mkString("[", ", ", "]") +
        " — emit scalar columns (long form / boundary cast) instead")
  }

  /** {sha, sf_dir, timestamp, table → {bytes, md5}} for every parquet in
    * the sf dir. md5 here is a content fingerprint, not a security hash.
    */
  def provenanceJson(sfDir: String): String = {
    // `git rev-parse` first: hand-parsing .git/HEAD silently degrades to
    // "unknown" the moment refs get packed (git gc) or cwd isn't the repo
    // root — exactly the field this provenance exists to pin
    def sha: String = try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      if (p.waitFor() == 0 && out.matches("[0-9a-f]{40}")) out
      else shaFromFiles
    } catch { case _: Exception => shaFromFiles }
    def shaFromFiles: String = try {
      val head = Files.readString(Paths.get(".git/HEAD")).trim
      if (head.startsWith("ref: "))
        Files.readString(Paths.get(".git/" + head.drop(5))).trim
      else head
    } catch { case _: Exception => "unknown" }
    def md5(p: java.nio.file.Path): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(Files.readAllBytes(p))
        .map("%02x".format(_)).mkString
    val tables = {
      val d = new java.io.File(sfDir)
      val fs = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      fs.map { f =>
        val p = f.toPath
        s""""${f.getName}":{"bytes":${f.length},"md5":"${md5(p)}"}"""
      }.mkString("{", ",", "}")
    }
    s"""{"git_sha":"$sha","sf_dir":"$sfDir",""" +
      s""""timestamp":"${java.time.Instant.now()}",""" +
      s""""n_queries":${SparkEntry.queries.size},"tables":$tables}"""
  }
}
