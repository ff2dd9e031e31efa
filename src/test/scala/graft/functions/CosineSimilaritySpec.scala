package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native expression must agree with the SQL-composed cosine
  * (aggregate+zip_with built-ins) bit-for-bit, run inside whole-stage
  * codegen, and survive nulls. Registered at runtime (the extensions class
  * only applies at session build; the JVM-shared test session already
  * exists) — the extension wiring itself is smoke-checked separately.
  */
class CosineSimilaritySpec extends SparkSpec {

  GraftFunctions.register(spark)

  test("GraftExtensions injects without error") {
    new GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("cosine_sim matches the built-in-composed form on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/embeddings.parquet")
      .createOrReplaceTempView("emb")
    val rows = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS fast,
        |  aggregate(zip_with(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                     CAST(b.embedding AS ARRAY<DOUBLE>),
        |                     (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
        |  / (sqrt(aggregate(CAST(a.embedding AS ARRAY<DOUBLE>), 0.0D,
        |       (acc, v) -> acc + v * v))
        |   * sqrt(aggregate(CAST(b.embedding AS ARRAY<DOUBLE>), 0.0D,
        |       (acc, v) -> acc + v * v))) AS ref
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id AND a.vec_id < 20
        |""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"fast=${r.getDouble(0)} ref=${r.getDouble(1)}")
    }
  }

  test("cosine_sim participates in whole-stage codegen") {
    val plan = spark.sql(
      """SELECT cosine_sim(a.embedding, a.embedding) FROM emb a""")
      .queryExecution.executedPlan.toString
    // '*' prefix on an operator marks whole-stage-codegen membership in the
    // compact plan string (full form: WholeStageCodegen(id))
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"expression fell out of codegen:\n$plan")
    // self-similarity is exactly 1 (same bits, same accumulation)
    val sims = spark.sql(
      "SELECT cosine_sim(embedding, embedding) FROM emb").collect()
    assert(sims.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("cosine_sim is null-safe and type-checked") {
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(1.0F))").collect()
    assert(r.head.isNullAt(0))
    // ragged lengths and null elements → NULL, not a silently truncated
    // or zero-padded similarity
    val ragged = spark.sql(
      "SELECT cosine_sim(array(1.0F, 2.0F), array(1.0F))").collect()
    assert(ragged.head.isNullAt(0), "length mismatch must yield NULL")
    val nullElem = spark.sql(
      "SELECT cosine_sim(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 1.0F))")
      .collect()
    assert(nullElem.head.isNullAt(0), "null element must yield NULL")
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim('not an array', array(1.0F))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("morton_interleave matches the composed shift/plus form and a " +
    "reference bit walk, inside codegen") {
    import spark.implicits._
    val bits = 8
    val n = 1L << bits
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      (0 until bits).foreach { i =>
        z |= ((a >> i) & 1L) << (2 * i + 1)
        z |= ((b >> i) & 1L) << (2 * i)
      }
      z
    }
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(500)((rnd.nextLong(n), rnd.nextLong(n))) ++
      Seq((0L, 0L), (n - 1, n - 1), (0L, n - 1), (n - 1, 0L))
    val df = pairs.toDF("a", "b")
    // native expression vs the composed built-ins vs the Scala walk
    val composed = (0 until bits).foldLeft(org.apache.spark.sql.functions.lit(0L)) { (acc, i) =>
      acc.plus(shiftleft(shiftright($"a", i).bitwiseAND(lit(1L)), 2 * i + 1))
        .plus(shiftleft(shiftright($"b", i).bitwiseAND(lit(1L)), 2 * i))
    }
    val rows = df.select($"a", $"b",
      call_function("morton_interleave", $"a", $"b", lit(bits)).as("fast"),
      composed.as("slow")).collect()
    rows.foreach { r =>
      val (a, b, fast, slow) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(fast == slow && fast == ref(a, b),
        s"a=$a b=$b fast=$fast slow=$slow ref=${ref(a, b)}")
    }
    // adjacent cells in (a, b) stay within a bounded z-distance: the
    // locality property the layout relies on (sanity, not a proof)
    assert(ref(3, 3) < ref(4, 4) && ref(0, 0) == 0L && ref(1, 0) == 2L &&
      ref(0, 1) == 1L && ref(1, 1) == 3L)
    // SQL surface + codegen: runs through a whole-stage-codegen plan
    val viaSql = df.createOrReplaceTempView("mz")
    val sqlRows = spark.sql(
      "SELECT morton_interleave(a, b, 8) AS z FROM mz").collect()
    assert(sqlRows.map(_.getLong(0)).sorted.toSeq ==
      rows.map(_.getLong(2)).sorted.toSeq)
  }
}
