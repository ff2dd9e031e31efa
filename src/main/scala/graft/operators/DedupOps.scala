package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection over `documents` — the LLM-data-pipeline dedup
  * family (driver mandate; SURVEY.md §2.7 stretch goals made first-class):
  *
  *  - exact dedup: TextOps.dedupDocs / TextOps.fingerprint
  *  - n-gram Jaccard: shingle → explode → shuffle-on-shingle self-join.
  *    The join is on the *shingle*, never doc×doc, so cost is
  *    Σ_shingle count² — at 100 TB you'd additionally drop ultra-frequent
  *    shingles (stop-shingles) to bound the worst key.
  *  - MinHash + LSH banding: constant-size signature (8 hashes) per doc,
  *    band-bucket join — candidate generation cost is independent of
  *    document length and near-linear in corpus size. THE scale path.
  *  - SimHash: one 16-bit signature per doc; hamming-ball lookup.
  *
  * All hashing is md5-based so the DuckDB oracle can reproduce it exactly
  * (Spark's murmur `hash()` and DuckDB's `hash()` differ).
  */
object DedupOps {

  private val N = 3 // shingle width (tokens)

  /** Documents spread across the full task parallelism. The source is a
    * single parquet row group → a single scan task; everything downstream
    * here (shingling, md5, self-joins) is CPU-bound per document, so a
    * cheap shuffle of the small doc table buys full-width execution.
    */
  private def docsParallel(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** doc_id + shingle-set size + exploded distinct shingles — the single
    * source of the shingle rule for both ngramJaccard and minhashLsh.
    *
    * Deliberately a typed flatMap, not expression composition: the
    * declarative form (`array_distinct(transform(sequence(...), slice))`)
    * measured 12× slower at sf0.1 (3.9 s vs 0.3 s for the same 260k
    * shingles) — array_distinct over string arrays is quadratic and falls
    * out of codegen — and Spark's `sequence(0, -1)` descending-range
    * behavior made the short-document guard fragile. One pass with a
    * per-doc HashSet dedups, counts the set size, and guards length < N
    * for free.
    */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docsParallel(s, dir)
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = text.split(' ')
        if (t.length < N) Iterator.empty
        else {
          val seen = new scala.collection.mutable.LinkedHashSet[String]
          var i = 0
          while (i <= t.length - N) {
            seen.add(t(i) + " " + t(i + 1) + " " + t(i + 2))
            i += 1
          }
          val n = seen.size
          seen.iterator.map(sh => (id, n, sh))
        }
      }
      .toDF("doc_id", "n", "s")
  }

  /** All document pairs with 3-gram Jaccard ≥ threshold. Jaccard is an
    * exact integer ratio (|A∩B| / (|A|+|B|−|A∩B|)) so the double compare
    * is deterministic across engines.
    */
  def ngramJaccard(s: SparkSession, dir: String,
                   threshold: Double = 0.5): DataFrame = {
    import s.implicits._
    // set size rides along with each exploded shingle — saves two
    // doc-size joins after the pair aggregation
    val sh = shingles(s, dir)
    val a = sh.toDF("da", "na", "sa")
    val b = sh.toDF("db", "nb", "sb")
    a.join(b, $"sa" === $"sb" && $"da" < $"db")
      .groupBy($"da", $"db", $"na", $"nb").agg(count(lit(1)).as("i"))
      .withColumn("jac", $"i".cast("double") / ($"na" + $"nb" - $"i"))
      .filter($"jac" >= threshold)
      .select($"da", $"db", round($"jac", 6).as("jac"))
      .orderBy($"da", $"db")
  }

  /** MinHash (k=16) + LSH banding (8 bands × 2 rows): emit candidate
    * pairs sharing ≥1 band with how many bands they share. Collision
    * probability per band is j² (j = true Jaccard), so low-sim pairs are
    * pruned without ever being compared; 8 bands put the miss rate for a
    * j≈0.7 near-dup below 1% ((1−j²)^8).
    *
    * The 16 hash functions are the disjoint 4-hex slices of TWO md5s per
    * shingle (16-bit hashes each) — two digests instead of sixteen, same
    * md5-reproducibility in the DuckDB oracle.
    */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = shingles(s, dir)
      .withColumn("d", concat(md5($"s"), md5(concat(lit("x:"), $"s"))))
    val mins = (0 until 16).map(i =>
      min(substring($"d", 4 * i + 1, 4)).as(s"h$i"))
    val mh = sh.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
    val bands = mh.selectExpr("doc_id",
      "stack(8, " + (0 until 8).map(j =>
        s"$j, md5(concat(h${2 * j}, h${2 * j + 1}))").mkString(", ") +
        ") AS (band, sig)")
    val a = bands.toDF("da", "band_a", "sig_a")
    val b = bands.toDF("db", "band_b", "sig_b")
    a.join(b, $"band_a" === $"band_b" && $"sig_a" === $"sig_b" &&
        $"da" < $"db")
      .groupBy($"da", $"db").agg(count(lit(1)).as("n_bands"))
      .orderBy($"da", $"db")
  }

  /** 16-bit SimHash per document: dimension i flips ±1 on the i-th hex
    * digit of each distinct token's md5 (≥'8' → +1), bit set where the
    * sum is positive. Near-dup lookup is then a hamming-ball scan over
    * 2-byte signatures (SimHashSpec covers the pairing).
    */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // typed one-pass distinct for the same reason as shingles():
    // array_distinct over string arrays is quadratic and non-codegen
    val words = docsParallel(s, dir)
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) =>
        val seen = new scala.collection.mutable.LinkedHashSet[String]
        text.split(' ').foreach(seen.add)
        seen.iterator.map(w => (id, w))
      }
      .toDF("doc_id", "w")
    val sums = (1 to 16).map(i =>
      sum(when(substring(md5($"w"), i, 1).between("0", "7"), -1)
        .otherwise(1)).as(s"s$i"))
    val sig: Column = (1 to 16)
      .map(i => when(col(s"s$i") > 0, lit(1L << (i - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
    words.groupBy($"doc_id").agg(sums.head, sums.tail: _*)
      .select($"doc_id", sig.cast("long").as("simhash"))
      .orderBy($"doc_id")
  }

  /** Oracle SQL fragments shared by SparkEntry (generated so the 16-term
    * simhash CASE chain stays in lockstep with the Scala side).
    */
  val shingleCte: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
      |  FROM documents),
      |sh AS (SELECT doc_id, UNNEST(list_distinct(
      |  [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)]))
      |  AS s FROM t)""".stripMargin

  val ngramOracle: String =
    shingleCte +
      """,
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db,
        | ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jac
        |FROM inter
        |JOIN sizes sa ON da = sa.doc_id
        |JOIN sizes sb ON db = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
        |ORDER BY da, db""".stripMargin

  val minhashOracle: String = {
    val mins = (0 until 16)
      .map(i => s"min(substring(md5(s) || md5('x:' || s), ${4 * i + 1}, 4)) AS h$i")
      .mkString(", ")
    val bands = (0 until 8).map(j =>
      s"SELECT doc_id, $j AS band, md5(h${2 * j} || h${2 * j + 1}) AS sig FROM mh")
      .mkString(" UNION ALL ")
    shingleCte +
      s""",
         |mh AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
         |bands AS ($bands)
         |SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_bands
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY da, db""".stripMargin
  }

  val simhashOracle: String = {
    val sums = (1 to 16).map(i =>
      s"SUM(CASE WHEN substring(md5(w), $i, 1) BETWEEN '0' AND '7' " +
        s"THEN -1 ELSE 1 END) AS s$i").mkString(", ")
    val bits = (1 to 16).map(i =>
      s"(CASE WHEN s$i > 0 THEN ${1L << (i - 1)} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH t AS (SELECT doc_id,
       |  UNNEST(list_distinct(string_split(text, ' '))) AS w
       |  FROM documents),
       |b AS (SELECT doc_id, $sums FROM t GROUP BY doc_id)
       |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |FROM b ORDER BY doc_id""".stripMargin
  }
}
