package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Batch-operator invariants that the DuckDB oracle can't express:
  * algebraic laws, bounded-error sketches, ANN recall, synthetic near-dup
  * ground truth (SURVEY.md §5.2).
  */
class OperatorsSpec extends SparkSpec {

  test("semi and anti joins partition the customer table") {
    val semi = Relational.semiJoin(spark, sfTest).count()
    val anti = Relational.antiJoin(spark, sfTest).count()
    val all = Tables(spark, sfTest, "customer").count()
    assert(semi + anti == all)
    assert(semi > 0 && anti > 0)
  }

  test("rollup grand total is consistent with its leaves") {
    val rows = Relational.rollupRevenue(spark, sfTest).collect()
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    val total = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(total.length == 1)
    val leafSum = leaves.map(_.getLong(2)).sum
    // each leaf is rounded independently of the total → ±0.5 per leaf
    assert(math.abs(leafSum - total.head.getLong(2)) <= leaves.length / 2 + 1)
    assert(total.head.getLong(3) == leaves.map(_.getLong(3)).sum)
  }

  test("approx_count_distinct is within 5% of exact per event type") {
    val exact = Events.distinctUsers(spark, sfTest).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Events.approxDistinct(spark, sfTest).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05,
        s"$k: approx $a vs exact $e")
    }
  }

  test("approx_percentile tracks the exact interpolated quantiles") {
    import spark.implicits._
    // the sketch returns some OBSERVED value whose rank is within 1/acc of
    // the target rank; the exact quantile interpolates between observed
    // values — so the two agree within the local value spread around the
    // target rank. 1% of the segment's value RANGE is a conservative
    // envelope for accuracy=10000 on this data, and fails loudly if the
    // sketch ever degrades to, say, a median-of-partitions shortcut.
    val exact = Relational.percentiles(spark, sfTest).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Relational.approxPercentiles(spark, sfTest).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet)
    val range = Tables(spark, sfTest, "orders")
      .agg(max($"o_totalprice") - min($"o_totalprice")).head().getDouble(0)
    exact.foreach { case (seg, (p50, p95)) =>
      val (a50, a95) = approx(seg)
      assert(math.abs(a50 - p50) <= range * 0.01, s"$seg p50: $a50 vs $p50")
      assert(math.abs(a95 - p95) <= range * 0.01, s"$seg p95: $a95 vs $p95")
    }
  }

  test("IVF ANN recall: measured bars, monotone in nprobe, exact at nlist") {
    import spark.implicits._
    // ground truth computed in-test: the graded knn output can't serve as
    // it — its a<b pair dedup means each query only sees larger-id
    // neighbors, while IVF searches all of them. Same left-to-right double
    // accumulation and (-sim, id) tie order as the operator, so the
    // nprobe=nlist equality below is exact, not approximate.
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().map { case (id, v) => (id, v.map(_.toDouble)) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exact = vecs.map { case (aId, a) =>
      aId -> vecs.view.filter(_._1 != aId)
        .map { case (bId, b) => (bId, cos(a, b)) }
        .toArray.sortBy { case (bId, s) => (-s, bId) }
        .take(5).map(_._1).toSet
    }.toMap
    def meanRecall(nprobe: Int): Double = {
      // nlist PINNED at 16: the bars below are measured properties of
      // this exact quantizer config (the graded default auto-scales nlist
      // with the corpus since r11 — at a different nlist the bars mean
      // nothing and nprobe=16 would no longer be the exhaustive scan)
      val approx = VectorOps.annIvf(spark, sfTest, nlist = 16,
          nprobe = nprobe)
        .as[(Long, Long, Double, Long)]
        .collect().groupBy(_._1).map { case (a, rs) => a -> rs.map(_._2).toSet }
      val recalls = exact.map { case (a, nbrs) =>
        (nbrs intersect approx.getOrElse(a, Set.empty)).size.toDouble /
          nbrs.size
      }
      assert(recalls.nonEmpty)
      recalls.sum / recalls.size
    }
    val r = Seq(4, 8, 16).map(np => np -> meanRecall(np)).toMap
    // bars sit just under the measured means of the sample-trained Lloyd
    // quantizer (0.60 / 0.84 at nprobe=4 / 8; first-n-as-centroids scored
    // 0.49 / 0.74) — a quantizer regression trips them. 0.7 at nprobe=4 is
    // not attainable on this corpus: the synthetic embeddings are
    // near-orthogonal (max pairwise cosine ~0.5), so neighbors are barely
    // closer than random points and low-nprobe recall is capped for any
    // cell structure (AnnExp sweep).
    assert(r(4) >= 0.55, f"mean recall@5 = ${r(4)}%.2f (nprobe=4/nlist=16)")
    assert(r(8) >= 0.75, f"mean recall@5 = ${r(8)}%.2f (nprobe=8/nlist=16)")
    // probed cells are a prefix of the by-centroid-distance order, so a
    // larger nprobe searches a superset of candidates — recall must be
    // monotone, and probing every cell (nprobe = nlist) IS the exhaustive
    // scan, so it must reproduce brute force exactly. A quantizer bug
    // (wrong cell assignment, dropped members) breaks the equality even
    // when the nprobe=4 bar still passes.
    assert(r(4) <= r(8) + 1e-12 && r(8) <= r(16) + 1e-12,
      s"recall not monotone in nprobe: $r")
    assert(r(16) == 1.0, f"exhaustive probe must equal exact, got ${r(16)}%.3f")
  }

  test("IVF-PQ with an exhaustive shortlist is byte-identical to IVF-Flat") {
    // shortlist >= any cell size => ADC prunes nothing and the exact
    // re-rank sees every probed member: the ONLY approximation left is
    // the shared IVF cell structure, so the outputs must match exactly.
    // A codebook/ADC bug that misorders candidates at the shortlist
    // boundary escapes this test only if it also survives the recall bar
    // below.
    val flat = VectorOps.annIvf(spark, sfTest).collect().toSeq
    val pq = VectorOps.annIvfPq(spark, sfTest, shortlist = Int.MaxValue)
      .collect().toSeq
    assert(pq == flat && pq.nonEmpty)
  }

  test("IVF-PQ recall with a tight shortlist stays near IVF-Flat") {
    import spark.implicits._
    val flat = VectorOps.annIvf(spark, sfTest)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).map { case (a, rs) => a -> rs.map(_._2).toSet }
    val pq = VectorOps.annIvfPq(spark, sfTest) // shortlist = 32
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).map { case (a, rs) => a -> rs.map(_._2).toSet }
    val recalls = flat.map { case (a, nbrs) =>
      (nbrs intersect pq.getOrElse(a, Set.empty)).size.toDouble / nbrs.size
    }
    val mean = recalls.sum / recalls.size
    // vs the flat index, not vs brute force: this isolates what PQ itself
    // costs (ADC shortlisting) from what the shared cell pruning costs
    assert(mean >= 0.85, f"PQ@32 shortlist recall vs flat = $mean%.2f")
  }

  test("IVF-PQ recall is monotone in shortlist") {
    import spark.implicits._
    // per query the shortlist is a prefix of the ADC candidate order, so a
    // larger shortlist hands the exact re-rank a superset of candidates —
    // recall vs IVF-Flat (the shared cell structure) must be monotone,
    // the shortlist analog of the IVF nprobe-monotonicity law above; the
    // exhaustive end of the sweep (shortlist ≥ cell size ⇒ byte-identical
    // to IVF-Flat) is the separate equality spec.
    val flat = VectorOps.annIvf(spark, sfTest)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).map { case (a, rs) => a -> rs.map(_._2).toSet }
    def recallAt(sl: Int): Double = {
      val pq = VectorOps.annIvfPq(spark, sfTest, shortlist = sl)
        .as[(Long, Long, Double, Long)].collect()
        .groupBy(_._1).map { case (a, rs) => a -> rs.map(_._2).toSet }
      val recalls = flat.map { case (a, nbrs) =>
        (nbrs intersect pq.getOrElse(a, Set.empty)).size.toDouble / nbrs.size
      }
      assert(recalls.nonEmpty)
      recalls.sum / recalls.size
    }
    val r = Seq(8, 16, 32).map(sl => sl -> recallAt(sl)).toMap
    assert(r(8) <= r(16) + 1e-12 && r(16) <= r(32) + 1e-12,
      s"recall not monotone in shortlist: $r")
  }

  test("cosine similarity laws: sim(a,a)=1, sim within [-1,1]") {
    import spark.implicits._
    val sims = VectorOps.knn(spark, sfTest).select($"sim").as[Double]
      .collect()
    assert(sims.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
    // self-similarity via the near-dup path on a doubled row would be 1;
    // cheap algebra check on raw arrays instead:
    val v = Tables(spark, sfTest, "embeddings")
      .select($"embedding").as[Array[Float]].head()
    val d = v.map(_.toDouble)
    val dot = d.zip(d).map { case (x, y) => x * y }.sum
    assert(math.abs(dot / (math.sqrt(dot) * math.sqrt(dot)) - 1.0) < 1e-12)
  }

  test("near-dup family agrees on synthetic ground truth") {
    import spark.implicits._
    val base = "spark streams data at scale with windows and joins " +
      "over keyed state in micro batches for webhook analytics"
    val nearDup = base.replace("joins", "merges") // one token changed
    val shuffled = base.split(" ").reverse.mkString(" ") // same bag of words
    val distinct = "completely different content about cooking pasta " +
      "with tomatoes basil garlic olive oil and fresh bread on sunday"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong),
      (2L, distinct, "en", "src1", distinct.length.toLong),
      (3L, shuffled, "en", "src2", shuffled.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft_docs").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // n-gram Jaccard: (0,1) near-dup found; (0,2) not a pair
    val pairs = DedupOps.ngramJaccard(spark, dir, threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((0L, 1L)), s"near-dup pair missed: $pairs")
    assert(!pairs.exists(p => p._2 == 2L || p._1 == 2L))

    // MinHash LSH: candidates include the near-dup pair
    val cands = DedupOps.minhashLsh(spark, dir)
      .as[(Long, Long, Long)].collect().map(c => (c._1, c._2)).toSet
    assert(cands.contains((0L, 1L)), s"LSH missed the near-dup: $cands")

    // SimHash over token *sets*: shuffled doc gets the identical signature
    val sigs = DedupOps.simhash(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(3L), "bag-of-words simhash must ignore order")
    assert(sigs(0L) != sigs(2L), "distinct content must differ")

    // fingerprint: shuffled == base, near-dup != base
    val fps = TextOps.fingerprint(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(fps(0L) == fps(3L) && fps(0L) != fps(1L))
  }

  test("shingle ops survive documents shorter than the shingle width") {
    import spark.implicits._
    val docs = Seq(
      (0L, "one", "en", "src0", 3L),
      (1L, "two words", "en", "src0", 9L),
      (2L, "three word doc", "en", "src0", 14L),
      (3L, "three word doc", "en", "src1", 14L)) // exact dup of 2
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft_short").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // must not throw (sequence(0,-1) is a descending range in Spark);
    // docs 2 and 3 share their single shingle → jaccard 1.0
    val pairs = DedupOps.ngramJaccard(spark, dir, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((2L, 3L, 1.0)))
    val cands = DedupOps.minhashLsh(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(cands.map(c => (c._1, c._2)).toSet == Set((2L, 3L)))
  }

  test("stop-shingle guard bounds a synthetic hot shingle's pair blow-up") {
    import spark.implicits._
    // 30 docs all sharing one boilerplate shingle ("all rights reserved")
    // plus unique content; 2 true near-dups sharing real content
    val boiler = "all rights reserved"
    val docs = (0L until 30L).map { i =>
      val text = s"$boiler unique$i content$i for document number$i"
      (i, text, "en", s"src$i", text.length.toLong)
    } ++ Seq(
      (30L, "the quick brown fox jumps over lazy dogs daily", "en", "srcA", 47L),
      (31L, "the quick brown fox jumps over lazy dogs nightly", "en", "srcB", 48L))
    val dir = Files.createTempDirectory("graft_hot").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // uncapped: the boilerplate shingle alone generates 30*29/2 = 435
    // pairs at jaccard 1/11; capped at df>10 it contributes none
    val capped = DedupOps.ngramJaccard(spark, dir, threshold = 0.05, maxDf = 10)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val uncapped = DedupOps.ngramJaccard(spark, dir, threshold = 0.05, maxDf = 1000)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(uncapped.size >= 435, s"hot shingle should blow up uncapped: ${uncapped.size}")
    assert(capped.size < 40, s"cap must drop boilerplate-only pairs: ${capped.size}")
    assert(capped.contains((30L, 31L)), "true near-dups must survive the cap")
  }

  test("simhash banding retrieves exactly the brute-force hamming ball") {
    import spark.implicits._
    // banded candidate generation (4×16-bit bands over the 64-bit sig)
    // must equal the quadratic scan — pigeonhole has no false negatives,
    // and the exact hamming filter removes every false positive
    val banded = DedupOps.simhashPairs(spark, sfTest)
      .as[(Long, Long, Long)].collect().toSet
    val sigs = DedupOps.simhash64(spark, sfTest)
      .as[(Long, Long, Long)].collect()
    val brute = (for {
      (a, ahi, alo) <- sigs.iterator
      (b, bhi, blo) <- sigs.iterator if a < b
      h = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
      if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size}")
    assert(banded.nonEmpty)
  }

  test("SRP-LSH embedding near-dup equals brute force at the audit banding") {
    import spark.implicits._
    // audit configuration (R=2, B=32): per-pair miss probability < 1e-6
    // even at the loose t=0.4 threshold, and the hyperplanes are md5-fixed,
    // so twin ≡ brute force is a deterministic property of this corpus
    val lsh = VectorOps.embedNearDupLsh(spark, sfTest, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val brute = VectorOps.embedNearDup(spark, sfTest, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh == brute, s"lsh=${lsh.size} brute=${brute.size}")
    assert(lsh.nonEmpty)
  }

  test("SRP-LSH banding stays exact in the selective near-dup regime") {
    import spark.implicits._
    // planted ground truth: 150 random unit-ish vectors plus 30 perturbed
    // copies (cosine ≈ 0.995 to their source; unrelated pairs stay far
    // below 0.9 — 64-d random cosines concentrate near 0). The SELECTIVE
    // banding (R=8 → 256 buckets/band, B=16) must still find every planted
    // pair: p = 1−θ/π ≈ 0.97 ⇒ per-pair miss ≈ 6e-11. This is the
    // configuration that prunes at corpus scale; the audit config above
    // covers the loose-threshold regime.
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val bases = (0 until 150).map(i => (i.toLong, vec()))
    val dups = (0 until 30).map { i =>
      val (srcId, v) = bases(i * 5)
      val w = v.map(x => (x + 0.1f * rnd.nextGaussian().toFloat))
      (1000L + srcId, w)
    }
    val dir = Files.createTempDirectory("graft_emb").toString
    (bases ++ dups).toDF("vec_id", "embedding")
      .withColumn("label", lit(0L))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val lsh = VectorOps.embedNearDupLsh(spark, dir, threshold = 0.9,
      bands = 16, rowsPerBand = 8)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val brute = VectorOps.embedNearDup(spark, dir, threshold = 0.9)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(brute.size >= 30, s"fixture must plant >=30 true pairs: ${brute.size}")
    assert(lsh == brute, s"lsh=${lsh.size} brute=${brute.size}")
  }

  test("prefix-filtered ngram jaccard equals the naive all-shingle join") {
    import spark.implicits._
    // real corpus at two thresholds (0.5 exercises short prefixes; 0.2
    // exercises long ones) — prefix filtering must lose nothing the
    // all-shingle self-join finds, and verification must invent nothing
    for (t <- Seq(0.5, 0.2)) {
      val prefix = DedupOps.ngramJaccardPrefix(spark, sfTest, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val direct = DedupOps.ngramJaccard(spark, sfTest, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(prefix == direct,
        s"t=$t: prefix=${prefix.size} direct=${direct.size}")
      assert(prefix.nonEmpty || t > 0.4)
    }
  }

  test("prefix twin broadcasts only the capped hot-shingle set, never the " +
    "vocabulary-sized df table") {
    // the r8 verdict finding: the df table grows with the corpus, so a
    // broadcast hint on it is a scale hazard even in the \"scale twin\".
    // r10 extends the policy to the candidate-doc shingle-set fetches
    // (corpus-correlated: one row per distinct candidate doc) — the ONLY
    // hint left is the hot-shingle exclusion set, bounded at
    // ≤ occurrences/maxDf rows by construction. With broadcasting-by-stats
    // off, exactly that one BroadcastExchange may survive; the df-weights
    // and candidate-set joins must all fall back to shuffle joins.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p = DedupOps.ngramJaccardPrefix(s2, sfTest, threshold = 0.5)
      .queryExecution.executedPlan.toString
    val bcasts = "BroadcastExchange".r.findAllIn(p).size
    assert(bcasts == 1,
      s"expected exactly the 1 bounded hinted broadcast (hot set), " +
        s"got $bcasts:\n$p")
    assert(p.contains("LeftAnti"), "hot-shingle exclusion lost its anti-join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      "df-weights join did not fall back to a shuffle join")
  }

  test("salted join equals the plain join and scatters the hot key") {
    import spark.implicits._
    // 5k rows of one hot key + a uniform tail, joined to a 10-row dim
    val left = ((1 to 5000).map(i => (1L, i.toLong)) ++
      (1 to 500).map(i => ((i % 10).toLong, i.toLong)))
      .toDF("k", "payload")
    val right = (0L to 9L).map(k => (k, s"dim$k")).toDF("k", "label")
    val plain = left.join(right, Seq("k"), "inner")
      .select($"k", $"payload", $"label")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedJoin(left, right, "k", salts = 8)
      .select($"k", $"payload", $"label")
      .collect().map(_.toSeq).toSet
    assert(salted == plain, "salting must not change the join result")
    // the hot key's rows really spread: count distinct salts it lands on
    val hotSalts = left.filter($"k" === 1L)
      .withColumn("_salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .select($"_salt").distinct().count()
    assert(hotSalts > 1, "hot key must scatter across salt sub-keys")
  }

  test("bucketized range join equals the naive inequality join") {
    import spark.implicits._
    // the bucket rewrite (explode into own + previous bucket, exact band
    // filter after) must lose no pair and invent none vs the direct
    // inequality join it replaces
    val bandUs = 86400L * 1000000L
    val ev = Tables(spark, sfTest, "events")
      .select($"event_id", $"user_id", $"value", $"event_type",
        unix_micros($"ts").as("tus"))
    val a = ev.filter($"event_type" === "error")
      .select($"event_id".as("a_id"), $"user_id".as("a_user"),
        $"tus".as("a_tus"))
    val b = ev.select($"user_id".as("b_user"), $"tus".as("b_tus"),
      $"value".as("b_value"))
    val naive = a.join(b, $"a_user" === $"b_user" &&
        $"b_tus" >= $"a_tus" - bandUs && $"b_tus" < $"a_tus")
      .groupBy($"a_id")
      .agg(count(lit(1)).as("n_prior"),
        round(sum($"b_value"), 2).as("sum_prior"))
      .orderBy($"a_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bucketized = Events.rangeJoinErrors(spark, sfTest)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(bucketized.nonEmpty)
    assert(bucketized.toSeq == naive.toSeq)
  }

  test("multimodal featurization is deterministic, normalized, and " +
    "decodes every synthesized blob with the real JDK codecs") {
    val a = Multimodal.mediaFeatures(spark, sfTest).collect()
    val b = Multimodal.mediaFeatures(spark, sfTest).collect()
    assert(a.toSeq == b.toSeq, "decode must be deterministic")
    assert(a.nonEmpty)
    // all three codec paths present in the rollup
    val codecs = a.map(_.getString(1)).toSet
    assert(codecs == Set("png", "wav", "gfv1"))
    // every synthesized blob decodes: zero dead-letter rows on clean data
    assert(a.forall(r => r.getLong(3) == 0L),
      s"decode failures on synthesized media: ${a.mkString(", ")}")
    // energy of a probability histogram lies in (0, 1]
    assert(a.forall(r => r.getDouble(4) > 0 && r.getDouble(4) <= 1.0))
  }

  test("multimodal PNG round-trip: real ImageIO decode returns the " +
    "synthesized dimensions and a normalized histogram") {
    val png = Multimodal.synthesizePng("seed-1".getBytes, 24, 16)
    // real PNG container: signature bytes
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte)
    val d = Multimodal.decodeImage(png)
    assert(d.ok && d.width == 24 && d.height == 16)
    assert(math.abs(d.features.sum - 1f) < 1e-3)
    // deterministic synthesis: same seed → identical bytes
    assert(java.util.Arrays.equals(png,
      Multimodal.synthesizePng("seed-1".getBytes, 24, 16)))
  }

  test("multimodal WAV round-trip: real AudioSystem decode returns the " +
    "PCM frame count and sample rate") {
    val wav = Multimodal.synthesizeWav("seed-2".getBytes, samples = 800)
    assert(wav(0) == 'R'.toByte && wav(1) == 'I'.toByte, "RIFF container")
    val d = Multimodal.decodeWav(wav)
    assert(d.ok && d.width == 800 && d.height == 8000)
    assert(math.abs(d.features.sum - 1f) < 1e-3)
  }

  test("multimodal video container: frame sampling decodes real PNG " +
    "frames; resize honors the target dimensions") {
    val vid = Multimodal.synthesizeVideo("seed-3".getBytes, frames = 4)
    val d = Multimodal.decodeVideo(vid, sampleFrames = 2)
    assert(d.ok && d.width == 16 && d.height == 12)
    assert(math.abs(d.features.sum - 1f) < 1e-3)
    // real Graphics2D resize: output decodes to exactly the target dims
    val png = Multimodal.synthesizePng("seed-4".getBytes, 40, 28)
    val resized = Multimodal.resizeImage(png, 8, 6)
    val rd = Multimodal.decodeImage(resized)
    assert(rd.ok && rd.width == 8 && rd.height == 6)
  }

  test("multimodal decodes file-loaded media: real checked-in PNG/WAV " +
    "fixtures, not synthesized bytes") {
    import spark.implicits._
    // the fixtures were written by independent encoders (hand-rolled PNG
    // chunks, python `wave`), so this path proves the codecs parse
    // foreign files, not just ImageIO/AudioSystem round-tripping itself
    def load(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/media/$name")
      require(in != null, s"fixture /media/$name missing")
      try in.readAllBytes() finally in.close()
    }
    val grad = Multimodal.decodeAny(load("gradient_8x6.png"))
    assert(grad.ok && grad.width == 8 && grad.height == 6)
    assert(math.abs(grad.features.sum - 1f) < 1e-3)
    val check = Multimodal.decodeAny(load("checker_16x16.png"))
    assert(check.ok && check.width == 16 && check.height == 16)
    // checkerboard: mass splits between the darkest and brightest bins
    assert(check.features(0) + check.features(15) > 0.99f)
    val tone = Multimodal.decodeAny(load("tone440_8k.wav"))
    assert(tone.ok && tone.width == 400 && tone.height == 8000)
    val sweep = Multimodal.decodeAny(load("sweep_16k.wav"))
    assert(sweep.ok && sweep.width == 640 && sweep.height == 16000)
    // stereo 16-bit: header-driven frame parsing, channels averaged —
    // 300 FRAMES (not 600 samples misread as frames)
    val stereo = Multimodal.decodeAny(load("stereo_8k.wav"))
    assert(stereo.ok && stereo.width == 300 && stereo.height == 8000)
    // 8-bit PCM: unsupported width dead-letters instead of misreading
    // frame boundaries into garbage features
    assert(!Multimodal.decodeAny(load("pcm8_8k.wav")).ok)
    // real JPEG (tools/make_jpeg_fixture.py — a from-the-spec baseline
    // encoder sharing no code with ImageIO): the magic-byte sniff must
    // route FFD8FF to the image decoder, and the decoded gradient must
    // brighten left → right like its PNG siblings
    val jpg = Multimodal.decodeAny(load("gradient_16x16.jpg"))
    assert(jpg.ok && jpg.width == 16 && jpg.height == 16,
      s"JPEG fixture did not decode: $jpg")
    assert(math.abs(jpg.features.sum - 1f) < 1e-3)
    // lossy 8x8 quantization pulls edge pixels toward block means, so
    // only pin that real luminance mass lands on BOTH histogram halves
    val darkHalf = jpg.features.take(8).sum
    assert(darkHalf > 0.05f && darkHalf < 0.95f,
      s"gradient mass should straddle the histogram: $darkHalf")
    // checked-in TRUNCATED PNG (first 60 bytes of checker_16x16.png):
    // right magic, torn IDAT — must dead-letter, not throw
    assert(!Multimodal.decodeAny(load("truncated.png")).ok,
      "truncated PNG must settle as a dead letter")
    // resize a real file through the full pipeline contract
    val small = Multimodal.decodeImage(
      Multimodal.resizeImage(load("checker_16x16.png"), 4, 4))
    assert(small.ok && small.width == 4 && small.height == 4)
    // and through the Spark shape: binary column → partitioned decode
    val rows = Seq("gradient_8x6.png", "checker_16x16.png",
      "tone440_8k.wav", "sweep_16k.wav").map(n => (n, load(n)))
    val decoded = rows.toDF("name", "content")
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (n, b) =>
        val d = Multimodal.decodeAny(b); (n, d.ok, d.width)
      })
      .collect().map { case (n, ok, w) => n -> ((ok, w)) }.toMap
    assert(decoded.values.forall(_._1), s"file-loaded decode failed: $decoded")
    assert(decoded("gradient_8x6.png")._2 == 8)
    assert(decoded("tone440_8k.wav")._2 == 400)
  }

  test("multimodal corrupt payloads dead-letter instead of failing") {
    val garbage = Array.tabulate(64)(_.toByte)
    assert(!Multimodal.decodeAny(garbage).ok)
    // truncated PNG: right magic, unparseable body
    val png = Multimodal.synthesizePng("seed-5".getBytes, 24, 16)
    val truncated = java.util.Arrays.copyOfRange(png, 0, 20)
    assert(!Multimodal.decodeAny(truncated).ok)
    val empty = Array.emptyByteArray
    assert(!Multimodal.decodeAny(empty).ok)
  }

  test("perceptual hash survives resize/re-encode, separates unrelated " +
    "images, and the banded pair join is exact vs brute force") {
    import spark.implicits._
    // structured gradient: content that survives the 8×8 resample (the
    // fixture's md5-noise images exercise determinism; invariance needs
    // real structure)
    def gradientPng(w: Int, h: Int, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v0 = (x * 255) / (w - 1)
        val v = if (invert) 255 - v0 else v0
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = gradientPng(32, 24, invert = false)
    val re = Multimodal.resizeImage(base, 80, 60) // upscale + re-encode
    val inv = gradientPng(32, 24, invert = true)
    val hb = Multimodal.aHash(base).get
    val hr = Multimodal.aHash(re).get
    val hi = Multimodal.aHash(inv).get
    assert(ham(hb, hr) <= 4, s"resize moved the hash ${ham(hb, hr)} bits")
    assert(ham(hb, hi) >= 16, s"inverse only ${ham(hb, hi)} bits away")
    assert(Multimodal.aHash("not an image".getBytes).isEmpty)
    // graded query: deterministic, every row in a ≥1-sized hash group
    val out1 = Multimodal.mediaPhash(spark, sfTest).collect()
    val out2 = Multimodal.mediaPhash(spark, sfTest).collect()
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    assert(out1.nonEmpty && out1.forall(_.getLong(3) >= 1))
    // banded pigeonhole join ≡ brute force (hamming ≤ 3 must always hit
    // one exact 16-bit band)
    val vals = Seq(
      1L -> 0x0123456789abcdefL,
      2L -> 0x0123456789abcdeeL,
      3L -> (0x0123456789abcdefL ^ 0x7L),
      4L -> (0x0123456789abcdefL ^ 0x1111L),
      5L -> 0x7edcba9876543210L)
    val pairs = Multimodal
      .phashDupPairs(vals.toDF("media_id", "phash_bits"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (ia, ha) <- vals; (ib, hb2) <- vals
      if ia < ib && ham(ha, hb2) <= 3
    } yield (ia, ib, ham(ha, hb2).toLong)).toSet
    assert(pairs == brute, s"banded $pairs vs brute $brute")
    assert(brute.nonEmpty)
  }

  test("audio fingerprint survives re-encode/channel-dup/resample, " +
    "separates different content; video hash survives container rewrite") {
    import spark.implicits._
    // amplitude-modulated tone: slot energies carry real structure (a
    // constant sine puts every slot at the mean — the degenerate case
    // the image spec's gradient argument covers for pixels)
    def wav(rate: Float, seconds: Double, f: Double, mod: Double,
            channels: Int = 1): Array[Byte] = {
      val n = (rate * seconds).toInt
      val pcm = new Array[Byte](n * 2 * channels)
      for (i <- 0 until n) {
        val t = i / rate.toDouble
        val a = math.sin(2 * math.Pi * f * t) *
          (0.5 + 0.5 * math.sin(2 * math.Pi * mod * t)) * 12000
        for (c <- 0 until channels) {
          val off = (i * channels + c) * 2
          pcm(off) = (a.toInt & 0xff).toByte
          pcm(off + 1) = ((a.toInt >> 8) & 0xff).toByte
        }
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels,
        true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = wav(8000f, 0.2, 440, 10)
    val stereo = wav(8000f, 0.2, 440, 10, channels = 2) // same signal 2-ch
    val resampled = wav(16000f, 0.2, 440, 10) // same content, 2x rate
    val other = wav(8000f, 0.2, 440, 37) // different envelope
    val hb = Multimodal.audioHash(base).get
    assert(Multimodal.audioHash(stereo).get == hb,
      "channel duplication must be hash-identical (frames average back)")
    val hr = Multimodal.audioHash(resampled).get
    assert(ham(hb, hr) <= 3, s"resample moved the hash ${ham(hb, hr)} bits")
    val ho = Multimodal.audioHash(other).get
    assert(ham(hb, ho) >= 12, s"different envelope only ${ham(hb, ho)} away")
    assert(Multimodal.audioHash("not audio".getBytes).isEmpty)
    // truncated WAV: header declares more frames than the data chunk
    // carries (a partial upload) — must hash the real prefix or
    // dead-letter, NEVER index past the payload (review-pass finding:
    // the junk-bytes case fails the magic sniff before reaching here)
    val truncated = base.take(base.length - 100)
    Multimodal.audioHash(truncated) // any Option is fine; throwing is not
    assert(Multimodal.audioHash(base.take(45)).isEmpty) // data chunk empty
    // video: MIN-ANCHOR frame hash (round 15) — stable across a
    // container REWRITE, invariant to trims/edits that keep the anchor
    // frame, and None for a truncated container
    val vid = Multimodal.synthesizeVideo("vid-A".getBytes, frames = 3)
    val hv = Multimodal.videoHash(vid).get
    assert(Multimodal.videoHash(vid).contains(hv))
    assert(Multimodal.videoHash(vid.take(6)).isEmpty)
    // container (re)builders for the edit cases
    def gfv1Frames(v: Array[Byte]): Seq[Array[Byte]] = {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(v))
      in.readInt()
      val nf = in.readInt()
      (0 until nf).map { _ =>
        val len = in.readInt()
        val b = new Array[Byte](len); in.readFully(b); b
      }
    }
    def gfv1(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.writeInt(0x47465631); dos.writeInt(frames.length)
      frames.foreach { f => dos.writeInt(f.length); dos.write(f) }
      dos.flush(); out.toByteArray
    }
    // deterministic fixture search: a video whose anchor frame is NOT
    // frame 0 (so the r14 first-frame rule would fingerprint the trim
    // differently), with frame 0 more than 3 bits from the anchor (so
    // the old rule provably ESCAPED, not just drifted)
    val anchored = (0 until 64).map(i =>
        Multimodal.synthesizeVideo(s"anchor-$i".getBytes, frames = 4))
      .find { v =>
        val ph = gfv1Frames(v).map(f =>
          Multimodal.videoHash(gfv1(Seq(f))).get)
        val anchor = ph.minBy(h => h ^ Long.MinValue) // unsigned min
        ph.head != anchor &&
          java.lang.Long.bitCount(ph.head ^ anchor) > 3 &&
          // for the K-min leg below: 4 distinct frame hashes, pairwise
          // > 3 bits apart, so removing the anchor provably RE-ANCHORS
          // beyond the single-hash tolerance (the r15 escape)
          ph.distinct.size == 4 &&
          ph.combinations(2).forall(p =>
            java.lang.Long.bitCount(p(0) ^ p(1)) > 3)
      }.get
    val aFrames = gfv1Frames(anchored)
    val hAnchored = Multimodal.videoHash(anchored).get
    // lead TRIM: drop frame 0 → identical fingerprint (the anchor
    // survives); the old rule re-anchored to frame 1 and escaped
    assert(Multimodal.videoHash(gfv1(aFrames.drop(1)))
      .contains(hAnchored))
    // lead EDIT: replace frame 0 with novel content whose hash does not
    // undercut the anchor → identical fingerprint
    val editFrame = Multimodal.synthesizePng("lead-edit".getBytes, 16, 12)
    val hEdit = Multimodal.videoHash(gfv1(Seq(editFrame))).get
    assert(java.lang.Long.compareUnsigned(hEdit, hAnchored) > 0,
      "edit-frame fixture must not undercut the anchor")
    assert(Multimodal.videoHash(gfv1(editFrame +: aFrames.drop(1)))
      .contains(hAnchored))
    // K-MIN MULTI-ANCHOR (round 16, closing the r15 verdict's item 7
    // residual): the anchor set is the ≤4 smallest distinct frame
    // hashes, unsigned ascending, primary (head) = the r15 single-min
    // fingerprint
    val frameHashes = aFrames.map(f =>
      Multimodal.videoHash(gfv1(Seq(f))).get)
    val anchorsA = Multimodal.videoAnchors(anchored).get
    assert(anchorsA.head == hAnchored, "primary anchor = the r15 hash")
    assert(anchorsA.toSeq ==
      frameHashes.distinct.sortBy(h => h ^ Long.MinValue).take(4),
      "anchors are the K smallest distinct unsigned frame hashes, sorted")
    assert(Multimodal.videoAnchors(gfv1(Seq(aFrames.head))).get.toSeq ==
      Seq(frameHashes.head), "single-frame video has one anchor")
    // the r15 documented ESCAPE: remove the anchor FRAME — the
    // single-min fingerprint re-anchors beyond the ≤3-bit tolerance...
    val removedAnchor = gfv1(
      aFrames.zip(frameHashes).filter(_._2 != hAnchored).map(_._1))
    assert(java.lang.Long.bitCount(
      Multimodal.videoHash(removedAnchor).get ^ hAnchored) > 3,
      "fixture must re-anchor the single-min rule (the escape)")
    // ...but the edit keeps 3 of the 4 anchors, so the dedup surfaces
    // pair it with the original at hamming 0 through a shared anchor
    assert(Multimodal.videoAnchors(removedAnchor).get
      .intersect(anchorsA).length == 3)
    val vids = Seq((100L, anchored), (101L, removedAnchor))
      .toDF("media_id", "content")
    val caught = Multimodal.mediaDupPairs(Multimodal.hashesOf(vids))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(caught.toSeq == Seq((100L, 101L, 0L)),
      s"anchor-removing edit must pair with its original: ${caught.toSeq}")
    // a corrupt NON-first frame now dead-letters the whole blob (the
    // full-walk discipline; the first-frame rule never saw it)
    val badTail = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.writeInt(0x47465631); dos.writeInt(2)
      dos.writeInt(aFrames.head.length); dos.write(aFrames.head)
      dos.writeInt(Int.MaxValue) // corrupt frame-2 length
      dos.flush(); out.toByteArray
    }
    assert(Multimodal.videoHash(badTail).isEmpty)
    // corrupt frame length (0x7FFFFFFF): must dead-letter, not allocate
    // gigabytes and die fatal (review-pass finding)
    val evil = java.nio.ByteBuffer.allocate(12)
      .putInt(0x47465631).putInt(1).putInt(Int.MaxValue).array()
    assert(Multimodal.videoHash(evil).isEmpty)
    // mediaHash dispatch: codec tags keep modalities apart even on
    // (impossible but structural) bit collisions
    assert(Multimodal.mediaHash(base).get._1 == "audio")
    assert(Multimodal.mediaHash(vid).get._1 == "video")
    assert(Multimodal.mediaHash(
      Multimodal.synthesizePng("p".getBytes, 16, 12)).get._1 == "img")
    // graded query: deterministic, audio+video rows only, every row in a
    // ≥1-sized (codec, hash) group
    val out1 = Multimodal.mediaAudioHash(spark, sfTest).collect()
    val out2 = Multimodal.mediaAudioHash(spark, sfTest).collect()
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    assert(out1.nonEmpty && out1.forall(r =>
      Set("audio", "video")(r.getString(2)) && r.getLong(4) >= 1))
    // n_near_dup (col 5) counts OTHER same-codec tracks within
    // hamming<=3 — a superset of exact-hash partners, so it can never
    // undercount the window
    assert(out1.forall(r => r.getLong(5) >= r.getLong(4) - 1))
  }

  test("codec-tagged media near-dup pairs: banded join exact vs brute " +
    "force per codec, codecs never cross, and a 2x RESAMPLED audio dup " +
    "pairs with its original") {
    import spark.implicits._
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // synthetic hash table across two codecs, including a CROSS-codec
    // exact 64-bit collision (ids 1 and 10) that must never pair — the
    // codec tag travels in the join key
    val vals = Seq(
      (1L, "audio", 0x0123456789abcdefL),
      (2L, "audio", 0x0123456789abcdeeL),
      (3L, "audio", 0x0123456789abcdefL ^ 0x7L),
      (4L, "audio", 0x0123456789abcdefL ^ 0x1111L),
      (5L, "audio", 0x7edcba9876543210L),
      (10L, "video", 0x0123456789abcdefL),
      (11L, "video", 0x0123456789abcdefL ^ 0x3L),
      (12L, "video", 0x00ff00ff00ff00ffL))
    val got = Multimodal.mediaDupPairs(
        vals.toDF("media_id", "codec", "phash_bits"), maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    val brute = (for {
      (ia, ca, haa) <- vals; (ib, cb, hbb) <- vals
      if ia < ib && ca == cb && ham(haa, hbb) <= 3
    } yield (ia, ib, ca, ham(haa, hbb).toLong)).toSet
    assert(got == brute, s"banded $got vs brute $brute")
    assert(brute.nonEmpty)
    assert(!got.exists(p => p._1 == 1L && p._2 == 10L),
      "cross-codec bit collision must never pair")
    // real-codec leg: an amplitude-modulated tone re-rendered at 2x the
    // sample rate hashes within <=3 bits of the original (the audioHash
    // time-grid invariance), so the banded join finds the resampled dup
    // the exact-hash audit misses — VERDICT r12 item 1's named case
    // (470 Hz, 12.1 Hz, 0.19 s) measured: the 2x re-render lands exactly
    // 1 bit away — the banded join must catch a NON-exact near dup
    def amWav(rate: Float): Array[Byte] = {
      val n = (rate * 0.19).toInt
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val t = i / rate.toDouble
        val a = (math.sin(2 * math.Pi * 470 * t) *
          (0.5 + 0.5 * math.sin(2 * math.Pi * 12.1 * t)) * 12000).toInt
        pcm(2 * i) = (a & 0xff).toByte
        pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val hBase = Multimodal.audioHash(amWav(8000f)).get
    val hRe = Multimodal.audioHash(amWav(16000f)).get
    assert(hBase != hRe && ham(hBase, hRe) <= 3,
      s"fixture must exercise the NEAR path: moved ${ham(hBase, hRe)} bits")
    val other = Multimodal.audioHash(
      Multimodal.synthesizeWav("unrelated-track".getBytes)).get
    val realPairs = Multimodal.mediaDupPairs(
        Seq((100L, "audio", hBase), (101L, "audio", hRe),
          (102L, "audio", other)).toDF("media_id", "codec", "phash_bits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(realPairs.contains((100L, 101L)),
      "resampled audio dup must surface as a near-dup pair")
    assert(!realPairs.contains((100L, 102L)) && !realPairs.contains((101L, 102L)))
    // frame-count rule (ADVICE r12): declared<0 is NOT_SPECIFIED →
    // payload wins; declared otherwise clamps a lying header
    assert(Multimodal.frameCount(-1L, 800L) == 800L)
    assert(Multimodal.frameCount(2147483647L, 800L) == 800L)
    assert(Multimodal.frameCount(300L, 800L) == 300L)
    // a WAV whose data-chunk size field is vandalized to 0xFFFFFFFF
    // (the JDK reports Int.MaxValue frames) must hash its real payload,
    // identically to the intact file
    val intact = amWav(8000f)
    val patched = intact.clone()
    val di = (0 until patched.length - 8).find(i =>
      patched(i) == 'd' && patched(i + 1) == 'a' &&
        patched(i + 2) == 't' && patched(i + 3) == 'a').get
    for (k <- 4 to 7) patched(di + k) = 0xff.toByte
    assert(Multimodal.audioHash(patched).contains(hBase))
  }

  test("media near-dup clusters: CC over the banded pairs — every " +
    "cluster >= 2 members with exactly one keep; resampled trio " +
    "clusters together") {
    import spark.implicits._
    // graded query on the fixture: deterministic, non-empty, CC shape
    val out1 = Multimodal.mediaClusters(spark, sfTest).collect()
    val out2 = Multimodal.mediaClusters(spark, sfTest).collect()
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    assert(out1.nonEmpty)
    val byCluster = out1.groupBy(_.getLong(0))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.length >= 2, s"singleton cluster $cid")
      assert(rows.count(_.getBoolean(2)) == 1,
        s"cluster $cid keep flags: ${rows.mkString(",")}")
      assert(rows.map(_.getLong(1)).min == cid,
        s"cluster $cid label is not its min member")
    }
    // synthetic trio through the SAME pair+CC machinery: base tone, its
    // 2x re-render (1 bit away), and a byte re-encode (0 bits) must
    // land in ONE cluster; an unrelated tone stays out
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def amWav(rate: Float): Array[Byte] = {
      val n = (rate * 0.19).toInt
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val t = i / rate.toDouble
        val a = (math.sin(2 * math.Pi * 470 * t) *
          (0.5 + 0.5 * math.sin(2 * math.Pi * 12.1 * t)) * 12000).toInt
        pcm(2 * i) = (a & 0xff).toByte
        pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val h1 = Multimodal.audioHash(amWav(8000f)).get
    val h2 = Multimodal.audioHash(amWav(16000f)).get
    val h3 = Multimodal.audioHash(
      Multimodal.synthesizeWav("other-track".getBytes)).get
    assert(ham(h1, h2) <= 3 && ham(h1, h3) > 3 && ham(h2, h3) > 3)
    val pairs = Multimodal.mediaDupPairs(
      Seq((1L, "audio", h1), (2L, "audio", h2), (3L, "audio", h3))
        .toDF("media_id", "codec", "phash_bits")).select($"ma", $"mb")
    val comp = graft.operators.DedupOps.clusterPairs(spark, pairs)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toMap
    assert(comp.get(1L).contains(1L) && comp.get(2L).contains(1L),
      s"trio split: $comp")
    assert(!comp.contains(3L), "unrelated tone joined the cluster")
  }

  test("Misra-Gries heavy hitters: bounds hold when the sketch overflows") {
    import spark.implicits._
    // 3 heavy words + 400 singletons, m=16 ≪ 403 distinct — the eviction
    // path runs constantly; shuffled deterministically
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle(
      Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
        Seq.fill(120)("gamma") ++ (1 to 400).map(i => s"rare$i"))
    val n = data.size
    val m = 16
    for (parts <- Seq(1, 8)) {
      val ds = spark.createDataset(data).repartition(parts).as[String]
      val got = TextOps.mgTopK(ds, 10, m).collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      // every word with frequency > n/m must surface, with its estimate a
      // lower bound within n/m of exact — under ANY partitioning
      for ((w, exact) <- Seq("alpha" -> 300L, "beta" -> 200L,
          "gamma" -> 120L)) {
        assert(got.contains(w), s"$w missing at parts=$parts")
        assert(got(w) <= exact && got(w) >= exact - n.toDouble / m,
          s"$w est=${got(w)} exact=$exact parts=$parts")
      }
    }
  }

  test("Misra-Gries property: bounds hold on random streams and capacities") {
    import spark.implicits._
    for (seed <- 0 until 6) {
      val rnd = new scala.util.Random(100 + seed)
      // zipf-ish: word w_i drawn proportional to 1/(i+1)
      val n = 600
      val data = Seq.fill(n) {
        val u = rnd.nextDouble()
        val i = math.min(40, (math.pow(41.0, u) - 1).toInt)
        s"w$i"
      }
      val m = 6 + seed * 3
      val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = TextOps.mgTopK(
        spark.createDataset(data).repartition(1 + seed % 4).as[String],
        100, m) // k=100 > distinct count: nothing trimmed by the top-k
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val bound = n.toDouble / (m + 1)
      got.foreach { case (w, est) =>
        assert(est <= exact(w), s"seed=$seed $w overestimates")
        assert(est >= exact(w) - bound, s"seed=$seed $w below lower bound")
      }
      exact.collect { case (w, c) if c > bound =>
        assert(got.contains(w), s"seed=$seed heavy hitter $w missing")
      }
    }
  }

  test("Misra-Gries is exact when capacity exceeds the vocabulary") {
    val approx = TextOps.approxTopK(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = TextOps.wordcount(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(approx == exact)
  }

  test("hash split is reproducible and near the 90/10 target") {
    val rows = TextOps.splitAssign(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == TextOps.splitAssign(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq)
    val total = rows.map(_._3).sum
    val train = rows.filter(_._2 == "train").map(_._3).sum
    assert(total == Tables(spark, sfTest, "documents").count())
    // 230/256 ≈ 0.898 expected; wide tolerance for the small test corpus
    val frac = train.toDouble / total
    assert(frac > 0.8 && frac < 0.97, s"train fraction $frac")
  }

  test("mixture sampling is reproducible and tracks its per-source targets") {
    val rows = TextOps.mixSources(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows sameElements TextOps.mixSources(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(rows.length == 20)
    rows.foreach { case (src, nDocs, target, kept) =>
      assert(kept <= nDocs)
      // hash acceptance is binomial around the target: allow generous
      // slack for the small test corpus but demand the gate actually cut
      val slack = math.max(6.0, 4 * math.sqrt(target.toDouble))
      assert(math.abs(kept - target) <= slack,
        s"$src kept=$kept target=$target")
    }
    // even-indexed sources get double weight — their targets must be ~2×
    val (even, odd) = rows.partition(_._1.drop(3).toInt % 2 == 0)
    assert(even.map(_._3).sum > 3 * odd.map(_._3).sum / 2)
  }

  test("quality filter partitions the corpus and its rates are consistent") {
    val rows = TextOps.qualityFilter(spark, sfTest).collect()
    val total = Tables(spark, sfTest, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total) // every doc lands in a lang
    rows.foreach { r =>
      val (nDocs, nKept, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nKept <= nDocs)
      assert(math.abs(rate - nKept.toDouble / nDocs) < 1e-4)
    }
    // the gates must actually split the corpus, not pass/drop everything
    val kept = rows.map(_.getLong(2)).sum
    assert(kept > 0 && kept < total)
  }

  test("auto ngram dedup equals the direct join below the crossover") {
    assert(Tables(spark, sfTest, "documents").count()
      <= DedupOps.PrefixCrossoverDocs)
    val auto = DedupOps.ngramDedupAuto(spark, sfTest).collect().toSeq
    val direct = DedupOps.ngramJaccard(spark, sfTest).collect().toSeq
    assert(auto == direct && auto.nonEmpty)
  }

  test("dedup clusters: chain graph converges to per-component min labels") {
    import spark.implicits._
    // 1-2-3-4 is a diameter-3 chain — forces ≥3 propagation rounds — and
    // 5-6 a disjoint pair; labels must be the component minimum, keep only
    // on the canonical member
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("da", "db")
    val got = DedupOps.clusterPairs(spark, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == Seq((1L, 1L, true), (1L, 2L, false), (1L, 3L, false),
      (1L, 4L, false), (5L, 5L, true), (5L, 6L, false)))
  }

  test("pointer-jump loop equals the plain min-label loop (r20)") {
    import spark.implicits._
    // Graphs chosen to stress the label-jump branch: paths with ids laid
    // WITH and AGAINST the pointer direction, a shuffled-id path (many
    // local-minimum basins — the regime where the jump contracts least),
    // and a seeded random multigraph. The 40-node paths also cross the
    // switchRounds=20 star-contraction seam for at least one form, so
    // the equality covers the fallback path too.
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle((0L until 60L).toVector)
    val graphs: Seq[Seq[(Long, Long)]] = Seq(
      (0L until 40L).map(i => (i, i + 1)),         // ascending-id path
      (0L until 40L).map(i => (40L - i, 39L - i)), // descending-id path
      shuffled.sliding(2).map(w => (w(0), w(1))).toSeq, // shuffled-id path
      Seq.fill(80)((math.abs(rnd.nextLong()) % 50L,
        math.abs(rnd.nextLong()) % 50L)).filter(p => p._1 != p._2))
    for (g <- graphs) {
      val pairs = g.toDF("da", "db")
      val plain = DedupOps.clusterPairs(spark, pairs, labelJump = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sorted.toSeq
      val jump = DedupOps.clusterPairs(spark, pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sorted.toSeq
      assert(jump == plain && jump.nonEmpty)
    }
  }

  test("dedup clusters equal a union-find over the ngram pair list") {
    val pairs = DedupOps.ngramJaccard(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // reference: sequential union-find over the same edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(d => (find(d), d, d == find(d))).sorted.toSeq
    val got = DedupOps.dedupClusters(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == expected)
    // multi-doc components exist, so propagation actually ran
    assert(expected.groupBy(_._1).exists(_._2.size >= 3))
  }

  test("dedup clusters of an empty pair list are empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("da", "db")
    assert(DedupOps.clusterPairs(spark, empty).collect().isEmpty)
  }

  test("1000-node path graph converges via the star-contraction switch") {
    import spark.implicits._
    // diameter 999 ≫ switchRounds — min-label alone would need 999 rounds;
    // the auto-switch must land the same component-min labels in O(log n)
    // alternations
    val path = (0L until 999L).map(i => (i, i + 1)).toDF("da", "db")
    val got = DedupOps.clusterPairs(spark, path, switchRounds = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == (0L until 1000L).map(d => (0L, d, d == 0L)))
  }

  test("star contraction equals min-label propagation on the fixture graph") {
    import spark.implicits._
    val pairs = DedupOps.ngramJaccard(spark, sfTest)
      .select(col("da"), col("db"))
    val viaStars = DedupOps.starContract(spark, pairs)
      .select($"cluster_id", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val viaLabels = DedupOps.clusterPairs(spark, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(viaStars == viaLabels && viaStars.nonEmpty)
  }

  test("sessionize is invariant to input row order") {
    import spark.implicits._
    val base = Windows.sessionize(spark, sfTest).collect().toSeq
    // re-run over a shuffled copy of events through the same logic
    val shuffledDir = Files.createTempDirectory("graft_ev").toString
    Tables(spark, sfTest, "events").orderBy(rand(42))
      .write.mode("overwrite").parquet(s"$shuffledDir/events.parquet")
    val again = Windows.sessionize(spark, shuffledDir).collect().toSeq
    assert(base == again)
  }

  test("bag-op twin is row-identical to the fused setops_all aggregate") {
    // the graded q_setops_all is one conditional-count aggregate; the
    // exceptAll/intersectAll machinery survives as the coverage twin and
    // must keep answering identically (same key set included: every
    // orders key has n_all >= 1, so residual+matched can never both be 0)
    val fused = Relational.setopsAll(spark, sfTest).collect().toSeq
    val bagOps = Relational.setopsAllViaBagOps(spark, sfTest).collect().toSeq
    assert(fused == bagOps && fused.nonEmpty)
    // the graded plan reads orders ONCE and never runs the bag-op
    // row machinery (no join, no generate over multiplicities)
    val exec = Relational.setopsAll(spark, sfTest)
      .queryExecution.executedPlan
    val scans = exec.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"fused setops_all must scan orders once")
    val txt = exec.toString
    assert(!txt.contains("Join"), s"fused setops_all grew a join:\n$txt")
    assert(!txt.contains("Generate"),
      s"fused setops_all regressed to multiplicity fan-out:\n$txt")
  }

  test("typed sessionize twin is row-identical to the graded window form") {
    val graded = Windows.sessionize(spark, sfTest).collect().toSeq
    val typed = Windows.sessionizeTyped(spark, sfTest).collect().toSeq
    assert(graded == typed && graded.nonEmpty)
  }

  test("sessionize survives one bot-grade hot user (10^6-event timeline, " +
    "spill forced)") {
    // one user, 10^6 events, a 31-min gap every 1000 events → 1000
    // sessions of exactly 1000 events. The declarative form must finish
    // because WindowExec's sort spills; a toArray per-group pass holds
    // the whole timeline in one task's memory. The session conf forces
    // the window buffer to disk after 4k rows so the SPILL PATH ITSELF
    // executes here — not just a timeline that happened to fit.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "1024")
    s2.conf.set("spark.sql.windowExec.buffer.spill.threshold", "4096")
    // block = 1000 events at 1 s spacing (999 s long), then a 31-min
    // silence before the next block starts: block pitch = 999 + 1860 s
    val blockUs = (999L + 1860L) * 1000000L
    val hot = s2.range(1000000L).select(
      lit(7L).as("user_id"),
      col("id").as("event_id"),
      ((col("id") / 1000L).cast("long") * blockUs
        + (col("id") % 1000L) * 1000000L).as("tus"),
      lit(1.0).as("value"))
    val sessions = Windows.sessionizeDf(hot)
      .groupBy().agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_len"))
      .head()
    assert(sessions.getLong(0) == 1000L)
    assert(sessions.getLong(1) == 1000000L)
    assert(sessions.getLong(2) == 1000L)
  }

  test("stratified sample: exact quotas and row-order invariance") {
    import spark.implicits._
    val sample = TextOps.sampleStratified(spark, sfTest, quota = 30)
    val got = sample.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))).toSeq
    val perLang = Tables(spark, sfTest, "documents")
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = got.groupBy(_._1).view.mapValues(_.size).toMap
    perLang.foreach { case (lang, n) =>
      assert(counts.getOrElse(lang, 0) == math.min(30L, n))
    }
    // same sample from a shuffled copy of the corpus
    val shuffledDir = Files.createTempDirectory("graft_docs").toString
    Tables(spark, sfTest, "documents").orderBy(rand(7))
      .write.mode("overwrite").parquet(s"$shuffledDir/documents.parquet")
    val again = TextOps.sampleStratified(spark, shuffledDir, quota = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == again)
  }

  test("repetition score: internal consistency and a known-repetitive doc") {
    import spark.implicits._
    val rows = TextOps.textRepetition(spark, sfTest).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSh, nUniq) = (r.getLong(2), r.getLong(3))
      assert(nUniq >= 1 && nUniq <= nSh)
      // flag is the integer form of rep_frac > 0.1, and rep_frac agrees
      assert(r.getBoolean(5) == ((nSh - nUniq) * 10 > nSh))
      assert(math.abs(r.getDouble(4) - (1.0 - nUniq.toDouble / nSh)) < 1e-6)
    }
    // synthetic: "a b c" * 12 has 34 shingles but only 3 distinct
    val dir = Files.createTempDirectory("graft_rep").toString
    Seq((1L, Seq.fill(12)("a b c").mkString(" "), "en", "s0", 0L),
        (2L, (1 to 40).map(i => s"w$i").mkString(" "), "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val syn = TextOps.textRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3),
        r.getBoolean(5))).toMap
    assert(syn(1L) == ((34L, 3L, true)))
    assert(syn(2L) == ((38L, 38L, false)))
  }

  test("funnel: stage counts match a local replay and only narrow") {
    import spark.implicits._
    val got = Events.funnel(spark, sfTest).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // local replay of earliest-occurrence-in-order semantics
    val evs = Tables(spark, sfTest, "events")
      .select($"user_id", $"event_type", unix_micros($"ts"))
      .as[(Long, String, Long)].collect().groupBy(_._1)
    var (nv, nc, np) = (0L, 0L, 0L)
    evs.values.foreach { u =>
      def firstAfter(typ: String, after: Long): Option[Long] =
        u.collect { case (_, t, ts) if t == typ && ts > after => ts }
          .minOption
      firstAfter("view", Long.MinValue).foreach { t0 =>
        nv += 1
        firstAfter("click", t0).foreach { t1 =>
          nc += 1
          firstAfter("purchase", t1).foreach(_ => np += 1)
        }
      }
    }
    assert(got == Map("1_view" -> nv, "2_click" -> nc, "3_purchase" -> np),
      s"funnel mismatch: $got vs ($nv, $nc, $np)")
    assert(nv >= nc && nc >= np && np > 0, "funnel must narrow and be hit")
  }

  test("incremental dedup == full batch run restricted to old-new pairs") {
    import spark.implicits._
    val isNew = (id: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      hex >= "e6"
    }
    // full-batch pairs carry the same kept-shingle universe, so the
    // incremental run must surface EXACTLY the cross-split pairs, with
    // identical Jaccard, reduced to each new doc's best old match
    val full = DedupOps.ngramDedupAuto(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val cross = full.flatMap { case (a, b, j) =>
      (isNew(a), isNew(b)) match {
        case (false, true) => Some((b, a, j)) // (new, old, jac)
        case (true, false) => Some((a, b, j))
        case _             => None
      }
    }
    val expected = cross.groupBy(_._1).view.mapValues { ms =>
      val best = ms.minBy(m => (-m._3, m._2))
      (best._2, best._3)
    }.toMap
    val got = DedupOps.ngramIncremental(spark, sfTest).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected, s"incremental diverges: got=$got")
    assert(got.nonEmpty && got.keySet.forall(isNew))
  }

  test("user deltas: gap counts and extremes match a local recompute") {
    import spark.implicits._
    val out = Windows.userDeltas(spark, sfTest).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val local = Tables(spark, sfTest, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues { evs =>
        val ts = evs.sortBy(e => (e._3, e._2)).map(_._3)
        val gaps = ts.sliding(2).collect { case Array(a, b) => b - a }.toSeq
        (gaps.size.toLong, if (gaps.isEmpty) 0L else gaps.max, gaps.sum)
      }.toMap
    assert(out == local.filter(_._2._1 > 0L),
      "lag-window gaps diverge from the local recompute")
    // ordered by (ts, event_id) ⇒ every gap is non-negative
    assert(out.values.forall(v => v._2 >= 0L && v._3 >= 0L))
  }

  test("sequence packing: contiguous offsets, bucketed == naive window") {
    import spark.implicits._
    val ctx = 512L
    val out = TextOps.packSequences(spark, sfTest, ctx, bucketSize = 64L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.nonEmpty)
    // the prefix sum is fully pinned by contiguity: first doc starts at 0,
    // every next doc starts where the previous ended (doc_id order)
    var expect = 0L
    out.foreach { case (id, n, start, packId, packLast, crosses) =>
      assert(start == expect, s"doc $id start $start, expected $expect")
      expect = start + n
      assert(packId == start / ctx && packLast == (start + n - 1) / ctx)
      assert(crosses == (packId != packLast))
    }
    // the fixture must actually exercise boundary crossings
    assert(out.exists(_._6) && out.exists(!_._6))
    // bucketed two-level form == the naive single-partition window cumsum
    val w = org.apache.spark.sql.expressions.Window.orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = Tables(spark, sfTest, "documents")
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .filter($"n" > 0L)
      .withColumn("start_off", coalesce(sum($"n").over(w), lit(0L)))
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.map(t => (t._1, t._3)).toSeq == naive.toSeq)
    // input layout invariance: a shuffled corpus copy packs identically
    val dir = Files.createTempDirectory("graft_pack").toString
    Tables(spark, sfTest, "documents").orderBy(rand(13))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val again = TextOps.packSequences(spark, dir, ctx, bucketSize = 64L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == again.toSeq)
  }

  test("semantic dedup: drops are true near-dups, recall holds, order-free") {
    import spark.implicits._
    val t = 0.4
    val brute = VectorOps.embedNearDup(spark, sfTest, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val droppable = brute.map(_._2) // ids with any smaller-id partner ≥ t
    val outDf = VectorOps.semanticDedup(spark, sfTest, t)
    // the second column is a WITNESS (proves the drop), not a surviving
    // canonical — in a transitive chain the witness is itself dropped
    assert(outDf.columns.toSeq == Seq("vec_id", "witness_id", "sim"))
    val out = outDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    println(s"SEMDEDUP brute_pairs=${brute.size} " +
      s"droppable=${droppable.size} dropped=${out.length}")
    assert(out.nonEmpty)
    // every drop has an exact-cosine witness pair in the brute-force set
    out.foreach { case (vec, witness, sim) =>
      assert(witness < vec && brute.contains((witness, vec)),
        s"($witness,$vec)")
      assert(sim >= t - 1e-9)
    }
    // recall vs the brute-force droppable set: only pairs split across
    // cell boundaries are missed
    val recall = out.count(o => droppable.contains(o._1)).toDouble /
      droppable.size
    println(f"SEMDEDUP recall=$recall%.3f")
    assert(recall >= 0.5, f"semantic dedup recall $recall%.2f")
    // input-order invariance: same drops from a shuffled corpus copy
    val dir = Files.createTempDirectory("graft_emb").toString
    Tables(spark, sfTest, "embeddings").orderBy(rand(11))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val again = VectorOps.semanticDedup(spark, dir, t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("decontamination reports only train docs and real overlaps") {
    import spark.implicits._
    val out = DedupOps.decontaminate(spark, sfTest).collect()
    assert(out.nonEmpty)
    val trainIds = Tables(spark, sfTest, "documents")
      .select($"doc_id")
      .filter(substring(md5($"doc_id".cast("string")), 1, 2) < "e6")
      .as[Long].collect().toSet
    val nEval = Tables(spark, sfTest, "documents").count() - trainIds.size
    out.foreach { r =>
      assert(trainIds.contains(r.getLong(0)))
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
      assert(r.getLong(2) <= nEval)
    }
  }

  test("quality constraints verify in one pass and count violations " +
    "exactly") {
    import spark.implicits._
    import Quality._
    val orders = Tables(spark, sfTest, "orders")
    val rules = Seq(NotNull("o_custkey"), Unique("o_orderkey"),
      InRange("o_totalprice", 0.0, 1e7),
      Accepted("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")),
      // the fixture legitimately contains o_orderkey = 0
      Satisfies("o_orderkey", col("o_orderkey") >= 0, "nonnegative_key"))
    val clean = Quality.check(orders, rules)
    assert(Quality.passed(clean))
    assert(clean.filter($"constraint" === "_row_count")
      .head().getLong(2) == orders.count())
    // exactly one aggregate job: the report plan has one Aggregate over
    // one scan — N rules never fan out to N jobs
    // (check() collects eagerly, so verify by constructing the metrics
    // aggregate the same way and counting scans)

    // corrupt copy: one duplicated key, one null custkey, one negative
    // price, one unknown priority
    val base = orders.orderBy($"o_orderkey").limit(5)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"o_orderpriority")
    val firstKey = base.head().getLong(0)
    val extra = Seq(
      (firstKey, Option(1L), 100.0, "1-URGENT"), // duplicate key
      (900001L, None: Option[Long], -5.0, "9-BOGUS"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    val bad = base.union(extra)
    val report = Quality.check(bad, rules).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(report("not_null") == 1L)
    assert(report("unique") == 1L)
    assert(report("in_range") == 1L)
    assert(report("accepted_values") == 1L)
    assert(report("nonnegative_key") == 0L)
    assert(!Quality.passed(Quality.check(bad, rules)))
  }

  test("column profile reports nulls, distincts, extremes, and numeric " +
    "means from one pass") {
    import spark.implicits._
    val docs = Tables(spark, sfTest, "documents")
    // seed known damage: null out lang on doc_id % 7 == 0
    val dirty = docs.withColumn("lang",
      when($"doc_id" % 7 === 0, lit(null)).otherwise($"lang"))
    val n = dirty.count()
    val nullLang = dirty.filter($"lang".isNull).count()
    val p = Quality.profile(dirty).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == dirty.columns.toSet)
    assert(p("doc_id").getAs[Long]("n_rows") == n)
    assert(p("doc_id").getAs[Long]("n_null") == 0L)
    assert(p("lang").getAs[Long]("n_null") == nullLang)
    assert(math.abs(p("lang").getAs[Double]("null_rate") -
      nullLang.toDouble / n) < 1e-6)
    // HLL estimate within its error envelope of the exact count
    val exactIds = dirty.select($"doc_id").distinct().count()
    val est = p("doc_id").getAs[Long]("approx_distinct")
    assert(math.abs(est - exactIds) <= math.max(2L, (0.1 * exactIds).toLong),
      s"distinct estimate $est vs exact $exactIds")
    // extremes as strings, for every type; mean only for numerics
    assert(p("doc_id").getAs[String]("min").toLong ==
      dirty.agg(min($"doc_id")).head().getLong(0))
    assert(p("lang").getAs[String]("max") != null)
    assert(p("n_chars").getAs[Double]("mean") ==
      dirty.agg(round(avg($"n_chars"), 4)).head().getDouble(0))
    assert(p("text").isNullAt(p("text").fieldIndex("mean")),
      "a string column must not report a mean")
  }

  test("row-level admission gate splits clean rows from rejects with " +
    "every violated constraint named") {
    import spark.implicits._
    import Quality._
    val rows = Seq(
      (1L, Option("en"), 10L),   // clean
      (2L, None, 20L),           // null lang
      (3L, Option("xx"), 30L),   // unknown lang
      (4L, Option("en"), -5L),   // out of range
      (5L, None, -9L))           // null lang AND out of range
      .toDF("id", "lang", "n")
    val rules = Seq(NotNull("lang"),
      Accepted("lang", Seq("en", "de", "es")),
      InRange("n", 0.0, 100.0))
    val (clean, rejects) = Quality.split(rows, rules)
    assert(clean.select($"id").as[Long].collect().toSeq == Seq(1L))
    val got = rejects.select($"id", $"violations").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(got(2L) == Set("not_null(lang)", "accepted_values(lang)"))
    assert(got(3L) == Set("accepted_values(lang)"))
    assert(got(4L) == Set("in_range(n)"))
    assert(got(5L) == Set("not_null(lang)", "accepted_values(lang)",
      "in_range(n)"))
    // clean ∪ rejects partition the input exactly
    assert(clean.count() + rejects.count() == rows.count())
    // dataset-level constraints are rejected loudly, not silently passed
    intercept[IllegalArgumentException] {
      Quality.split(rows, Seq(Unique("id")))
    }
    // an input already carrying the working/output column name would be
    // silently dropped from the clean half — must be rejected loudly
    intercept[IllegalArgumentException] {
      Quality.split(rows.withColumn("violations", lit("user data")), rules)
    }
    intercept[IllegalArgumentException] {
      Quality.split(rows.withColumn("_violations", lit("user data")), rules)
    }
  }

  test("profile of an empty table returns a zero-row profile, not a crash") {
    import spark.implicits._
    // sum() over zero rows is NULL — profiling an empty table/partition
    // is a plausible call (a day with no data) and must return the n=0
    // profile the code anticipates, not NPE on unboxing
    val empty = Seq((1L, "x", 2.0)).toDF("id", "s", "v").filter(lit(false))
    val p = Quality.profile(empty).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("id", "s", "v"))
    for (c <- p.keys) {
      assert(p(c).getAs[Long]("n_rows") == 0L)
      assert(p(c).getAs[Long]("n_null") == 0L)
      assert(p(c).getAs[Double]("null_rate") == 0.0)
      assert(p(c).getAs[Long]("approx_distinct") == 0L)
      assert(p(c).getAs[String]("min") == null)
      assert(p(c).isNullAt(p(c).fieldIndex("mean")))
    }
  }

  test("unique constraint counts repeated NULLs as key violations") {
    import spark.implicits._
    import Quality._
    // count/countDistinct both drop NULLs, so a mostly-NULL key column
    // would pass a naive uniqueness metric silently; the second and every
    // later NULL must count as a violation (NULL = one key value)
    val df = Seq(Option(1L), Option(2L), None, None, None)
      .toDF("k")
    val report = Quality.check(df, Seq(Unique("k"))).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(report("unique") == 2L, s"got $report")
    // a single NULL is not a duplicate — and distinct non-null dups
    // still count independently
    val df2 = Seq(Option(1L), Option(1L), None).toDF("k")
    val report2 = Quality.check(df2, Seq(Unique("k"))).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(report2("unique") == 1L, s"got $report2")
  }

  test("tfidf is deterministic across runs and covers every doc with " +
    "exactly ranks 1..3") {
    val base = TextOps.tfidf(spark, sfTest).collect().toSeq
    // the linear-idf ranking key has no accumulation-order freedom (one
    // IEEE divide + multiply of exact integers), so reruns must be
    // byte-identical — no flaky top-3 cut on float ties
    val again = TextOps.tfidf(spark, sfTest).collect().toSeq
    assert(base == again)
    val docs = Tables(spark, sfTest, "documents")
    val docIds = base.map(_.getLong(0)).distinct
    assert(docIds.size == docs.count(),
      "every document must contribute a top-3 row set")
    base.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted == Seq(1L, 2L, 3L))
    }
  }

  test("gap-fill emits the dense hour×type grid with true zero fills") {
    import spark.implicits._
    val out = Events.gapfillHourly(spark, sfTest)
    val rows = out.collect()
    val types = Tables(spark, sfTest, "events")
      .select($"event_type").distinct().count()
    val hours = rows.map(_.getString(0)).distinct.length
    assert(rows.length == hours * types,
      s"grid must be dense: ${rows.length} != $hours*$types")
    // this corpus is sparse enough at sf0.001 that real gaps exist, and
    // every gap row is (0, 0.0)
    val zeros = rows.filter(_.getLong(2) == 0L)
    assert(zeros.nonEmpty, "fixture should contain empty (hour,type) cells")
    assert(zeros.forall(_.getDouble(3) == 0.0))
    // hour range is contiguous: first/last match the raw min/max
    val bounds = Tables(spark, sfTest, "events")
      .agg(date_format(date_trunc("hour", min($"ts")),
        "yyyy-MM-dd HH:mm:ss"),
        date_format(date_trunc("hour", max($"ts")), "yyyy-MM-dd HH:mm:ss"))
      .head()
    assert(rows.map(_.getString(0)).min == bounds.getString(0))
    assert(rows.map(_.getString(0)).max == bounds.getString(1))
  }

  test("sufficient-statistics moments agree with Spark's built-in " +
    "co-moment aggregates") {
    import spark.implicits._
    val exact = Relational.statsMoments(spark, sfTest).collect()
      .map(r => r.getString(0) -> r).toMap
    val builtin = Tables(spark, sfTest, "lineitem")
      .groupBy($"l_returnflag")
      .agg(stddev_samp($"l_extendedprice").as("sd"),
        var_samp($"l_extendedprice").as("v"),
        corr($"l_quantity", $"l_extendedprice").as("c"),
        covar_samp($"l_quantity", $"l_extendedprice").as("cv"))
      .collect()
    assert(builtin.nonEmpty)
    builtin.foreach { r =>
      val e = exact(r.getString(0))
      assert(math.abs(e.getDouble(2) - r.getDouble(1)) < 0.02, "sd")
      assert(math.abs(e.getDouble(3) / r.getDouble(2) - 1.0) < 1e-9, "var")
      // e.corr is rounded to 4 dp, so agreement is rounding-bounded
      assert(math.abs(e.getDouble(4) - r.getDouble(3)) < 1e-4, "corr")
      // e.cov is rounded to 2 dp → absolute half-step bound
      assert(math.abs(e.getDouble(5) - r.getDouble(4)) < 0.01, "cov")
    }
  }

  test("pivot has a pinned schema and needs no value-discovery pass") {
    val df = Relational.pivotPriority(spark, sfTest)
    assert(df.columns.toSeq == Seq("c_mktsegment", "p_urgent", "p_high",
      "p_medium", "p_notspec", "p_low"))
    // explicit pivot values ⇒ the standard two-phase rewrite (partial agg
    // per (segment, priority), then PivotFirst) over a SINGLE scan of the
    // fact table — an implicit pivot would additionally run an eager
    // distinct job at plan time to discover the column set
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size <= 2, s"expected two-phase pivot, got ${aggs.size}")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }
    assert(scans.size == 2, "exactly one orders scan + one customer scan")
    val rows = df.collect()
    assert(rows.length == 5 && rows.forall(r => !r.anyNull))
  }

  test("cube emits all four grouping sets with postgres-style gids") {
    val rows = Relational.cubeReturns(spark, sfTest).collect()
    val gids = rows.map(_.getLong(0)).distinct.sorted.toSeq
    assert(gids == Seq(0L, 1L, 2L, 3L))
    // gid 3 = grand total: exactly one row, both keys null
    val total = rows.filter(_.getLong(0) == 3L)
    assert(total.length == 1 && total.head.isNullAt(1) &&
      total.head.isNullAt(2))
    // the gid-0 slice sums to the grand total
    assert(rows.filter(_.getLong(0) == 0L).map(_.getLong(4)).sum ==
      total.head.getLong(4))
    // rollup misses the linestatus-only slice; cube must have it
    assert(rows.exists(r => r.getLong(0) == 2L && r.isNullAt(1) &&
      !r.isNullAt(2)))
  }

  test("anomaly 3σ flag stays exact at billion-scale hourly counts") {
    import spark.implicits._
    // counts around 2×10⁸–3×10⁹: s1² ≈ 2.3×10¹⁹ and num²·(n−1) leave
    // 64-bit range, so wrapped Long arithmetic garbles the flag in this
    // regime (plausible per-hour volumes at 100 TB) — the DECIMAL path
    // must match a BigInt reference on every emitted row
    val counts: Array[Long] = Array.tabulate(40) { i =>
      if (i == 30) 3000000000L                  // genuine 15× spike
      else 200000000L + (i % 5) * 1000000L      // noisy plateau
    }
    val hourly = counts.zipWithIndex.map { case (c, i) =>
      (new java.sql.Timestamp(i * 3600000L), "heavy", c)
    }.toSeq.toDF("h", "event_type", "c")
    val got = Events.anomalyFromHourly(hourly)
      .select("c", "n_hist", "anomaly").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val expected = counts.indices.flatMap { i =>
      val frame = counts.slice(math.max(0, i - 24), i).map(BigInt(_))
      val n = frame.length
      if (n >= 12) {
        val s1 = frame.sum
        val s2 = frame.map(x => x * x).sum
        val num = BigInt(n) * counts(i) - s1
        val anomaly = num > 0 &&
          num * num * (n - 1) > BigInt(9) * n * (BigInt(n) * s2 - s1 * s1)
        Some((counts(i), n.toLong, anomaly))
      } else None
    }
    // the fixture must discriminate: one spike flagged, plateau clean
    assert(expected.exists(_._3) && !expected.forall(_._3))
    assert(got == expected, s"decimal/BigInt divergence: $got")
  }

  test("exact-substring dup matches an independent reimplementation: " +
    "cross-doc spans count, within-doc repetition alone does not") {
    import spark.implicits._
    val k = 8
    // reference implementation built here from first principles (plain
    // Scala collections, no Spark) — the query must agree exactly
    val corpus = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val grams = corpus.map { case (id, text) =>
      val ts = text.toLowerCase.split(" ", -1)
      id -> (if (ts.length < k) Array.empty[String]
             else ts.sliding(k).map(_.mkString(" ")).toArray)
    }
    val docsOf = grams.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.length }
    val expected = grams.flatMap { case (id, gs) =>
      if (gs.isEmpty) None
      else {
        val dup = gs.count(g => docsOf(g) > 1)
        if (dup == 0) None
        else Some((id, gs.length.toLong, dup.toLong,
          BigDecimal(dup.toDouble / gs.length)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.sortBy(_._1).toSeq
    val got = DedupOps.substringDup(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(expected.nonEmpty, "fixture carries no shared spans — no test")
    assert(got == expected,
      s"diverged: got ${got.take(3)}… expected ${expected.take(3)}…")
    // a span repeated only WITHIN one document must not flag it: every
    // flagged doc's spans are shared with a DIFFERENT doc by construction
    // (docsOf counts distinct docs), and the sets agree above — but also
    // pin the ratio contract directly
    got.foreach { case (_, n, d, r) =>
      assert(d >= 1 && d <= n && r > 0.0 && r <= 1.0)
    }
  }

  // ---- round 11: BM25 / bigram-LM perplexity / k-means / cluster sizes

  private def roundHalfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bm25 matches an independent local recompute, rank for rank") {
    import spark.implicits._
    val out = TextOps.bm25(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val terms = Seq("dup", "join", "stream")
    val toks = Tables(spark, sfTest, "documents")
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split(" ", -1).toSeq) }
    val n = toks.length.toLong
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
    val tf = toks.flatMap { case (id, ts) =>
      ts.filter(terms.contains).groupBy(identity)
        .map { case (w, g) => ((id, w), g.size.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dls = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val expected = tf.keys.groupBy(_._1).map { case (id, ks) =>
      val sum = ks.toSeq.map { case (_, w) =>
        val t = tf((id, w)).toDouble
        val d = df(w)
        val idf = math.log(((n.toDouble - d + 0.5) / (d.toDouble + 0.5)) + 1.0)
        val tfn = (t * 2.2) /
          (t + 1.2 * (0.25 + (0.75 * dls(id).toDouble) / avgdl))
        BigDecimal(idf * tfn).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (id, ks.size.toLong, roundHalfUp(sum.toDouble, 6))
    }.toSeq.sortBy { case (id, _, s) => (-s, id) }.take(20)
    assert(out == expected, "BM25 diverges from the local recompute")
    assert(out.nonEmpty && out.forall(_._3 > 0.0))
  }

  test("doc perplexity matches a local bigram-LM recompute on eval docs") {
    import spark.implicits._
    val out = TextOps.docPerplexity(spark, sfTest).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2),
        r.getDouble(3)))).toMap
    val toks = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"lang", lower($"text"))
      .as[(Long, String, String)].collect()
      .map { case (id, lang, t) => (id, lang, t.split(" ", -1).toSeq,
        md5Hex(id.toString).substring(0, 2) < "e6") }
    def bigrams(ts: Seq[String]) = ts.zip(ts.drop(1))
    val train = toks.filter(_._4)
    val c2 = train.flatMap(d => bigrams(d._3)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val v = train.flatMap(_._3).distinct.size.toLong
    val expected = toks.filterNot(_._4).flatMap { case (id, lang, ts, _) =>
      val bgs = bigrams(ts)
      if (bgs.isEmpty) None else {
        val slp = bgs.map { bg =>
          val num = c2.getOrElse(bg, 0L).toDouble + 1.0
          val den = c1.getOrElse(bg._1, 0L).toDouble + v
          BigDecimal(math.log(num / den))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        Some(id -> (lang, bgs.size.toLong,
          roundHalfUp(-slp.toDouble / bgs.size, 6)))
      }
    }.toMap
    assert(out == expected, "cross-entropy diverges from the local LM")
    // add-one smoothing caps per-bigram surprisal at ln(c1+V) ≤ ln(n+V)
    assert(out.values.forall { case (_, _, h) => h > 0.0 })
    // roughly 10% of docs are eval under the md5 rule
    assert(out.size > 0 && out.size < toks.length / 2)
  }

  test("kmeans assignments replay exactly under a local Lloyd recompute") {
    import spark.implicits._
    val out = VectorOps.kmeans(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, v.map(_.toDouble).toArray) }
      .sortBy(_._1)
    var cents: Seq[(Int, Array[Double])] =
      vecs.take(8).zipWithIndex.map { case ((_, v), i) => (i, v) }.toSeq
    def assign(cs: Seq[(Int, Array[Double])]) = vecs.map { case (id, v) =>
      val best = cs.map { case (cl, c) =>
        (cl, VectorOps.cosine(v, c)) }
        .minBy { case (cl, s) => (-roundHalfUp(s, 6), cl) }
      (id, best._1, best._2)
    }
    for (_ <- 1 to 2) {
      val a = assign(cents)
      cents = a.groupBy(_._2).toSeq.map { case (cl, members) =>
        val vs = members.map(m => vecs.find(_._1 == m._1).get._2)
        val mean = (0 until 64).map { d =>
          vs.map(v => BigDecimal(v(d))
            .setScale(7, BigDecimal.RoundingMode.HALF_UP)).sum
            .toDouble / vs.length
        }.toArray
        (cl, mean)
      }.sortBy(_._1)
    }
    val expected = assign(cents)
      .map { case (id, cl, s) => (id, cl.toLong, roundHalfUp(s, 6)) }.toSeq
    assert(out == expected, "kmeans diverges from the local Lloyd replay")
    assert(out.map(_._2).distinct.size > 1, "degenerate single cluster")
  }

  test("weighted sample matches the local A-ES recompute and skews long") {
    import spark.implicits._
    val out = TextOps.sampleWeighted(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"lang", $"n_chars")
      .as[(Long, String, Long)].collect()
    val expected = docs.map { case (id, lang, nc) =>
      val h = java.lang.Long.parseLong(md5Hex(id.toString).substring(0, 8), 16)
      val u = (h.toDouble + 0.5) / 4294967296.0
      (id, lang, nc, roundHalfUp(math.pow(u, 1.0 / nc.toDouble), 9))
    }.sortBy { case (id, _, _, k) => (-k, id) }.take(100).toSeq
    assert(out == expected, "A-ES sample diverges from the local recompute")
    // weight = n_chars ⇒ the sample must skew longer than the corpus
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    val sampleMean = out.map(_._3).sum.toDouble / out.length
    assert(sampleMean > corpusMean,
      s"length-weighted sample is not longer than average " +
        s"($sampleMean <= $corpusMean)")
  }

  test("curriculum buckets: equi-depth cuts over the exact quality rank") {
    import spark.implicits._
    val out = TextOps.curriculumBuckets(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        val tok = t.split(" ", -1).toSeq
        val q = (tok.distinct.size.toDouble / tok.size) *
          math.min(1.0, tok.size.toDouble / 50.0)
        (id, tok.size.toLong, roundHalfUp(q, 6))
      }
    val n = docs.length.toLong
    val ranked = docs.sortBy { case (id, _, q) => (q, id) }.zipWithIndex
    val expected = ranked
      .groupBy { case (_, i) => i.toLong * 10L / n + 1L }
      .map { case (b, g) =>
        (b, g.size.toLong, g.map(_._1._3).min, g.map(_._1._3).max,
          g.map(_._1._2).sum)
      }.toSeq.sortBy(_._1)
    assert(out == expected, "bucket profile diverges from the local rank")
    assert(out.map(_._2).sum == n, "buckets must partition the corpus")
    // boundaries are monotone across buckets
    out.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 <= b._3 + 1e-12)
      case _ =>
    }
  }

  test("cluster-size histogram is exactly the dedup-clusters rollup") {
    val cl = DedupOps.dedupClusters(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = DedupOps.clusterSizes(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = cl.groupBy(_._1).values.map(_.size.toLong)
      .groupBy(identity).view
      .map { case (sz, g) => (sz, g.size.toLong, sz * g.size) }
      .toSeq.sortBy(_._1)
    assert(out == expected)
    // no singletons by construction, and doc counts reconcile
    assert(out.forall(_._1 >= 2))
    assert(out.map(_._3).sum == cl.length.toLong)
  }

  test("hard negatives are the brute-force cross-label top-3 per anchor") {
    import spark.implicits._
    val out = VectorOps.hardNegatives(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
      .map { case (id, v, l) => (id, v.map(_.toDouble).toArray, l) }
    val expected = vecs.filter(_._1 % 50 == 0).sortBy(_._1).flatMap {
      case (qid, qv, ql) =>
        vecs.filter(_._3 != ql)
          .map { case (id, v, _) => (id, VectorOps.cosine(v, qv)) }
          .sortBy { case (id, s) => (-s, id) }.take(3).zipWithIndex
          .map { case ((id, s), i) =>
            (qid, ql.toLong, id, roundHalfUp(s, 6), i + 1L) }
    }.toSeq
    assert(out == expected, "hard negatives diverge from brute force")
    // every reported negative really carries a different label
    val labelOf = vecs.map(v => v._1 -> v._3).toMap
    out.foreach { case (qid, _, nid, _, _) =>
      assert(labelOf(qid) != labelOf(nid))
    }
  }

  test("embedding outliers are the 20 weakest own-centroid members") {
    import spark.implicits._
    val out = VectorOps.labelOutliers(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Seq[Float], Int)].collect()
      .map { case (id, v, l) => (id, v.map(_.toDouble).toArray, l) }
    val centroids = vecs.groupBy(_._3).map { case (l, members) =>
      val mean = (0 until 64).map { d =>
        members.map(m => BigDecimal(m._2(d))
          .setScale(7, BigDecimal.RoundingMode.HALF_UP)).sum
          .toDouble / members.length
      }.toArray
      l -> mean
    }
    val expected = vecs
      .map { case (id, v, l) =>
        (id, l.toLong, roundHalfUp(VectorOps.cosine(v, centroids(l)), 6)) }
      .sortBy { case (id, _, s) => (s, id) }.take(20).toSeq
    assert(out == expected, "outlier list diverges from the local centroids")
    // an outlier is WEAKLY attached: below the corpus median similarity
    val allSims = vecs.map { case (_, v, l) =>
      VectorOps.cosine(v, centroids(l)) }.sorted
    val median = allSims(allSims.length / 2)
    assert(out.forall(_._3 < median))
  }

  test("dedup keep verdicts reconcile with cluster membership and chars") {
    import spark.implicits._
    val out = DedupOps.dedupKeep(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val members = DedupOps.dedupClusters(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val chars = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    val expected = members.groupBy(_._1).map { case (cid, g) =>
      val withChars = g.map { case (_, d) => (d, chars(d)) }
      val keep = withChars.minBy { case (d, nc) => (-nc, d) }
      (cid, g.length.toLong, keep._1, keep._2,
        withChars.map(_._2).sum - keep._2)
    }.toSeq.sortBy(_._1)
    assert(out == expected, "keep verdicts diverge from the membership")
    // the survivor is always a member of its own cluster
    val memberSet = members.toSet
    out.foreach { case (cid, _, keepId, _, _) =>
      assert(memberSet.contains((cid, keepId)))
    }
  }

  test("shuffle order is a dense source-interleaved permutation") {
    import spark.implicits._
    val out = TextOps.shuffleOrder(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val expected = docs
      .map { case (id, src) => (id, src, md5Hex(id.toString)) }
      .groupBy(_._2).toSeq.flatMap { case (_, g) =>
        g.sortBy { case (id, _, h) => (h, id) }.zipWithIndex
          .map { case ((id, src, _), i) => (i + 1L, src, id) }
      }
      .sortBy { case (stride, src, _) => (stride, src) }.zipWithIndex
      .map { case ((_, src, id), i) => (i + 1L, id, src) }.toSeq
    assert(out == expected, "order diverges from the local round-robin")
    // dense permutation of the whole corpus
    assert(out.map(_._1) == (1L to docs.length.toLong))
    assert(out.map(_._2).toSet == docs.map(_._1).toSet)
    // the first cycle touches every source exactly once
    val nSources = docs.map(_._2).distinct.length
    assert(out.take(nSources).map(_._3).distinct.length == nSources)
  }

  test("temperature mixing matches the local recompute and flattens " +
    "the source distribution") {
    import spark.implicits._
    val out = TextOps.sourceTemperature(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val docs = Tables(spark, sfTest, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val perSource = docs.groupBy(_._1).map { case (src, g) =>
      (src, g.length.toLong,
        g.map(_._2.split(" ", -1).length.toLong).sum)
    }.toSeq.sortBy(_._1)
    val w6 = perSource.map { case (src, nd, nt) =>
      (src, nd, nt,
        BigDecimal(roundHalfUp(math.pow(nt.toDouble, 0.7), 6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val sumW = w6.map(_._4).sum.toDouble
    val tot = perSource.map(_._3).sum.toDouble
    val expected = w6.map { case (src, nd, nt, w) =>
      val p = w.toDouble / sumW
      (src, nd, nt, roundHalfUp(p, 6),
        roundHalfUp(p / (nt.toDouble / tot), 6))
    }
    assert(out == expected, "mixing weights diverge from the recompute")
    // α < 1 flattens: boost is monotone non-increasing in token mass
    for (a <- out; b <- out if a._3 > b._3)
      assert(a._5 <= b._5,
        s"larger source ${a._1} boosted above smaller ${b._1}")
    // probabilities normalize (up to per-source rounding)
    assert(math.abs(out.map(_._4).sum - 1.0) < out.length * 5e-7)
  }

  test("token budget selection is the greedy quality prefix") {
    import spark.implicits._
    val out = TextOps.tokenBudget(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
      .map { case (id, src, t) =>
        val tok = t.split(" ", -1).toSeq
        val q = (tok.distinct.size.toDouble / tok.size) *
          math.min(1.0, tok.size.toDouble / 50.0)
        (id, src, tok.size.toLong, roundHalfUp(q, 6))
      }
    val budget = docs.map(_._3).sum / 5
    val ranked = docs.sortBy { case (id, _, _, q) => (-q, id) }
    var cum = 0L
    val selected = ranked.takeWhile { d => cum += d._3; cum <= budget }
    val expected = selected.groupBy(_._2).map { case (src, g) =>
      (src, g.length.toLong, g.map(_._3).sum, g.map(_._4).min)
    }.toSeq.sortBy(_._1)
    assert(out == expected, "selection diverges from the greedy prefix")
    // budget is respected and maximal: the next-ranked doc cannot fit
    val used = out.map(_._3).sum
    assert(used <= budget)
    val next = ranked.drop(selected.length).headOption
    next.foreach(d => assert(used + d._3 > budget,
      "a further doc still fits — selection is not maximal"))
  }

  test("contamination attribution reconciles with the per-doc verdicts") {
    import spark.implicits._
    val out = DedupOps.contaminationSources(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq
    val perDoc = DedupOps.decontaminate(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // train_id -> n_shared
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val srcOf = docs.toMap
    val trainPop = docs
      .filter { case (id, _) => md5Hex(id.toString).substring(0, 2) < "e6" }
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = trainPop.toSeq.sortBy(_._1).map { case (src, nTrain) =>
      val hits = perDoc.filter { case (id, _) => srcOf(id) == src }
      val nc = hits.size.toLong
      (src, nTrain, nc, roundHalfUp(nc.toDouble / nTrain, 4),
        if (hits.isEmpty) 0L else hits.values.sum,
        if (hits.isEmpty) 0L else hits.values.max)
    }
    assert(out == expected, "attribution diverges from the per-doc list")
    // every source appears (clean ones with zero counts), and the doc
    // counts reconcile with the per-doc verdict list
    assert(out.map(_._1).toSet == docs.map(_._2).toSet)
    assert(out.map(_._3).sum == perDoc.size.toLong)
  }

  test("quality-perplexity calibration matches the local quintile join") {
    import spark.implicits._
    val out = TextOps.qualityPerplexity(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val ce = TextOps.docPerplexity(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    val q6 = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val tok = t.split(" ", -1).toSeq
        id -> roundHalfUp((tok.distinct.size.toDouble / tok.size) *
          math.min(1.0, tok.size.toDouble / 50.0), 6)
      }.toMap
    val joined = ce.keys.toSeq.map(id => (id, q6(id), ce(id)))
      .sortBy { case (id, q, _) => (q, id) }
    val n = joined.length.toLong
    val expected = joined.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 5L / n + 1L }
      .map { case (b, g) =>
        val ces = g.map(_._1._3)
        val meanCe = ces.map(BigDecimal(_)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
          ces.length
        (b, g.size.toLong, g.map(_._1._2).min, g.map(_._1._2).max,
          roundHalfUp(meanCe, 6))
      }.toSeq.sortBy(_._1)
    assert(out == expected, "calibration diverges from the local quintiles")
    assert(out.map(_._2).sum == n, "buckets must partition the scored set")
  }

  test("similarity histogram is exactly the low-floor pair rollup") {
    val pairs = DedupOps.ngramJaccard(spark, sfTest, threshold = 0.3)
      .collect().map(_.getDouble(2))
    val out = DedupOps.simHistogram(spark, sfTest).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    val expected = pairs
      .groupBy(j => math.min(math.floor(j * 20).toLong, 19L))
      .map { case (b, g) =>
        (roundHalfUp(b / 20.0, 2), roundHalfUp((b + 1) / 20.0, 2),
          g.length.toLong) }
      .toSeq.sortBy(_._1)
    assert(out == expected, "histogram diverges from the pair list")
    assert(out.map(_._3).sum == pairs.length.toLong)
    // nothing below the floor leaks in
    assert(out.forall(_._1 >= 0.30 - 1e-9))
  }

  test("cross-source dup matrix reconciles with the graded pair list") {
    import spark.implicits._
    val out = DedupOps.crossSourceDups(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val srcOf = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val pairs = DedupOps.ngramJaccard(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs
      .map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((a, b), n) => (a, b, n) }.sortBy(p => (p._1, p._2))
    assert(out == expected, "matrix diverges from the pair list")
    assert(out.map(_._3).sum == pairs.length.toLong)
    out.foreach { case (a, b, _) => assert(a <= b) }
  }

  test("per-source dup rates reconcile with cluster membership") {
    import spark.implicits._
    val out = DedupOps.dupRateBySource(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val srcOf = docs.toMap
    val members = DedupOps.dedupClusters(spark, sfTest).collect()
      .map(r => (r.getLong(1), r.getBoolean(2))) // doc_id, keep
    val bySrc = members.groupBy { case (id, _) => srcOf(id) }
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (src, g) =>
        val cl = bySrc.getOrElse(src, Array.empty[(Long, Boolean)])
        val removable = cl.count(!_._2).toLong
        (src, g.length.toLong, cl.length.toLong, removable,
          roundHalfUp(removable.toDouble / g.length, 4))
      }
    assert(out == expected, "rates diverge from the membership")
    // removable ≤ clustered ≤ population, and the removable total is
    // the corpus' near-dup excess (members − clusters)
    out.foreach { case (_, nd, nc, nr, _) =>
      assert(nr <= nc && nc <= nd)
    }
    val nClusters = members.count(_._2).toLong
    assert(out.map(_._4).sum == members.length - nClusters)
  }

  test("minhash recall curve reconciles with the candidate and truth " +
    "lists") {
    val cand = DedupOps.minhashLsh(spark, sfTest).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val truth = DedupOps.ngramJaccard(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture lost its near-dup pairs")
    val out = DedupOps.minhashRecall(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    val expected = cand.map(_._2).distinct.sorted.toSeq.map { b =>
      val kept = cand.filter(_._2 >= b)
      val hits = kept.count(c => truth(c._1)).toLong
      (b, kept.length.toLong, hits, truth.size.toLong,
        roundHalfUp(hits.toDouble / truth.size, 4),
        roundHalfUp(hits.toDouble / kept.length, 4))
    }
    assert(out == expected, "curve diverges from the parent queries")
    // b = 1 is the whole LSH candidate set; volume shrinks with the cutoff
    assert(out.head._2 == cand.length.toLong)
    out.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 >= b._2 && a._3 >= b._3)
      case _ =>
    }
  }

  test("ngram novelty matches the local shingle recompute") {
    import spark.implicits._
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val ss = docs.flatMap { case (_, src, t) =>
      DedupOps.shingleSet(t).iterator.map(sh => (sh, src)) }.distinct
    val tot = ss.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val uniq = ss.groupBy(_._1).filter(_._2.length == 1)
      .map { case (_, g) => g.head._2 }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = tot.keys.toSeq.sorted.map { src =>
      val u = uniq.getOrElse(src, 0L)
      (src, tot(src), u, roundHalfUp(u.toDouble / tot(src), 4))
    }
    val out = DedupOps.ngramNovelty(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == expected, "novelty diverges from the recompute")
    out.foreach { case (_, n, u, _) => assert(u <= n) }
  }

  test("label cohesion equals the brute-force mean pairwise cosine") {
    import spark.implicits._
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"label".cast("long"), $"embedding")
      .as[(Long, Seq[Float])].collect()
    val out = VectorOps.labelCohesion(spark, sfTest).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == vecs.map(_._1).toSet)
    vecs.groupBy(_._1).foreach { case (label, g) =>
      val normed = g.map { case (_, v) =>
        val d = v.map(_.toDouble).toArray
        val nrm = math.sqrt(d.map(x => x * x).sum)
        d.map(x => roundHalfUp(x / nrm, 7))
      }
      val n = normed.length
      val brute = (for { i <- 0 until n; j <- (i + 1) until n } yield
        normed(i).zip(normed(j)).map { case (a, b) => a * b }.sum)
        .sum * 2 / (n.toDouble * (n - 1))
      val (cnt, coh, res) = out(label)
      assert(cnt == n.toLong)
      // the sum-vector identity is exact; the tolerance covers only the
      // DECIMAL re-entry rounding on both paths
      assert(math.abs(coh - brute) < 5e-6,
        s"label $label cohesion $coh vs brute-force $brute")
      assert(res >= 0.0 && res <= 1.0 + 1e-6)
    }
  }

  test("psi drift matches the local smoothed-histogram recompute") {
    import spark.implicits._
    val ev = Tables(spark, sfTest, "events")
      .select($"event_type",
        date_trunc("day", $"ts").cast("date").cast("string"), $"value")
      .as[(String, String, Double)].collect()
    val lo = ev.map(_._3).min
    val hi = ev.map(_._3).max
    def bucket(v: Double): Long =
      math.min(math.floor((v - lo) / ((hi - lo) / 10)).toLong, 9L)
    val out = Events.psiDrift(spark, sfTest).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getBoolean(3)))).toMap
    var checked = 0
    ev.groupBy(_._1).foreach { case (typ, g) =>
      val bn = g.length
      val bc = g.groupBy(e => bucket(e._3)).view.mapValues(_.length).toMap
      g.groupBy(_._2).foreach { case (day, dg) =>
        val dn = dg.length
        val dc = dg.groupBy(e => bucket(e._3)).view.mapValues(_.length).toMap
        val psi = (0 until 10).map { b =>
          val p = (dc.getOrElse(b.toLong, 0) + 1).toDouble / (dn + 10)
          val q = (bc.getOrElse(b.toLong, 0) + 1).toDouble / (bn + 10)
          BigDecimal(roundHalfUp((p - q) * math.log(p / q), 9))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
        val (o, drift) = out((typ, day))
        assert(o == roundHalfUp(psi, 6), s"$typ $day: $o vs $psi")
        assert(drift == (o > 0.2))
        checked += 1
      }
    }
    assert(checked == out.size, "spine rows beyond the observed days")
  }

  test("epoch plan allocates the temperature shares under the 4-epoch " +
    "cap") {
    import spark.implicits._
    val out = TextOps.epochPlan(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5), r.getLong(6), r.getLong(7))).toSeq
    val docs = Tables(spark, sfTest, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val perSource = docs.groupBy(_._1).view
      .mapValues(_.map(_._2.split(" ", -1).length.toLong).sum).toMap
    val w6 = perSource.toSeq.sortBy(_._1).map { case (src, nt) =>
      (src, nt, BigDecimal(roundHalfUp(math.pow(nt.toDouble, 0.7), 6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val sumW = w6.map(_._3).sum.toDouble
    val tot = perSource.values.sum
    val expected = w6.map { case (src, nt, w) =>
      val p = roundHalfUp(w.toDouble / sumW, 6)
      val target = math.floor(p * tot).toLong
      (src, nt, p, target, roundHalfUp(target.toDouble / nt, 4),
        target > nt * 4, math.min(target, nt * 4),
        math.max(target - nt * 4, 0L))
    }
    assert(out == expected, "plan diverges from the recompute")
    // the plan allocates the whole one-corpus budget up to share rounding
    assert(math.abs(out.map(_._4).sum - tot) <= out.length)
    out.foreach { case (_, _, _, target, _, capped, eff, short) =>
      assert(capped == (short > 0))
      assert(eff + short == target)
    }
  }

  test("minhash estimator calibration reconciles with the candidate " +
    "list and the exact Jaccard") {
    import spark.implicits._
    val cand = DedupOps.minhashLsh(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = DedupOps.minhashEst(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    // local recompute: signatures + exact kept-shingle jaccard
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val shSets = docs.map { case (id, t) =>
      id -> DedupOps.shingleSet(t).toSet }.toMap
    val df = shSets.values.flatten.groupBy(identity).view
      .mapValues(_.size).toMap
    val kept = shSets.view
      .mapValues(_.filter(df(_) <= 50)).toMap
    def sig(id: Long): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def hex(x: String) = md.digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val mins = Array.fill(16)("￿")
      shSets(id).foreach { sh =>
        val d = hex(sh) + hex("x:" + sh) + hex("y:" + sh) + hex("z:" + sh)
        for (k <- 0 until 16) {
          val sub = d.substring(8 * k, 8 * k + 8)
          if (sub < mins(k)) mins(k) = sub
        }
      }
      mins.toSeq
    }
    val expected = cand.toSeq.map { case (da, db) =>
      val m = sig(da).zip(sig(db)).count { case (x, y) => x == y }
      val (ka, kb) = (kept(da), kept(db))
      val i = (ka & kb).size
      val jac = roundHalfUp(i.toDouble / (ka.size + kb.size - i), 6)
      (m.toLong, jac)
    }.groupBy(_._1).toSeq.map { case (m, g) =>
        def decMean(xs: Seq[Double]) = roundHalfUp(
          xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble / g.size, 6)
        val est = roundHalfUp(m / 16.0, 4)
        (m, est, g.size.toLong, decMean(g.map(_._2)),
          decMean(g.map(p => roundHalfUp(math.abs(est - p._2), 6))))
      }.sortBy(_._1)
    assert(out == expected, "calibration diverges from the recompute")
    // pair volume reconciles with the candidate list (all fixture docs
    // carry kept shingles, so nothing is excluded by the sizes join)
    assert(out.map(_._3).sum == cand.size.toLong)
    // more matching minhashes → more similar on average (monotone trend
    // across the observed curve endpoints)
    if (out.length >= 2)
      assert(out.last._4 >= out.head._4,
        "estimate and truth should rise together")
  }

  test("minhash recall survives a truth-free corpus: NULL recall, no " +
    "division by zero") {
    // threshold > 1 makes the exact-truth set provably empty while the
    // LSH candidates still exist — the clean-corpus regression the
    // review found (ANSI DIVIDE_BY_ZERO / Inf-vs-NULL engine split)
    val rows = DedupOps.minhashRecall(spark, sfTest, threshold = 1.1)
      .collect()
    assert(rows.nonEmpty, "candidate curve should still be reported")
    rows.foreach { r =>
      assert(r.getLong(3) == 0L, "truth set must be empty at t=1.1")
      assert(r.isNullAt(4), "recall must be NULL when no truth exists")
      assert(!r.isNullAt(5), "precision is still defined (0.0)")
    }
  }

  test("label cohesion emits NULL for a singleton label instead of " +
    "dividing by zero") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cohesion").toString
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f), 1)) // label 1 is a singleton
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.labelCohesion(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).isNullAt(2), "singleton label must report NULL cohesion")
    assert(!out(1L).isNullAt(3), "resultant length is still defined")
    assert(!out(0L).isNullAt(2) && out(0L).getLong(1) == 3L)
  }

  test("eval leakage matches the local shingle-membership recompute") {
    import spark.implicits._
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def isTrain(id: Long) = md5Hex(id.toString).substring(0, 2) < "e6"
    val trainSh = docs.filter(d => isTrain(d._1))
      .flatMap(d => DedupOps.shingleSet(d._2)).toSet
    val expected = docs.filter(d => !isTrain(d._1))
      .map { case (id, t) =>
        val sh = DedupOps.shingleSet(t)
        val leaked = sh.count(trainSh.contains).toLong
        (id, sh.size.toLong, leaked,
          roundHalfUp(leaked.toDouble / sh.size, 4),
          leaked * 5 >= sh.size.toLong * 4)
      }.filter(_._2 > 0).sortBy(_._1).toSeq
    val out = DedupOps.evalLeakage(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(out == expected, "verdicts diverge from the recompute")
    // the split complement: leakage rows are exactly the eval docs (with
    // at least one shingle), and no train doc ever appears
    out.foreach { case (id, _, _, _, _) => assert(!isTrain(id)) }
  }

  test("text entropy equals the local distribution recompute and is " +
    "bounded by ln(vocab)") {
    import spark.implicits._
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = docs.map { case (id, t) =>
      val tok = t.split(" ", -1).filter(_.nonEmpty)
      val counts = tok.groupBy(identity).view.mapValues(_.length).toMap
      val n = tok.length
      val h = counts.values.map { c =>
        val p = c.toDouble / n
        BigDecimal(roundHalfUp(-(p * math.log(p)), 9))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      (id, n.toLong, counts.size.toLong, roundHalfUp(h, 6))
    }.sortBy(_._1).toSeq
    val out = TextOps.textEntropy(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == expected, "entropy diverges from the recompute")
    // 0 ≤ H ≤ ln(vocab), with equality iff uniform
    out.foreach { case (_, _, v, h) =>
      assert(h >= 0.0 && h <= math.log(v.toDouble) + 1e-6)
    }
  }

  test("source KL matches the local smoothed-grid recompute and is " +
    "non-negative") {
    import spark.implicits._
    val docs = Tables(spark, sfTest, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val counts = scala.collection.mutable.HashMap
      .empty[(String, String), Long].withDefaultValue(0L)
    docs.foreach { case (src, t) =>
      t.split(" ", -1).filter(_.nonEmpty).foreach(w => counts((src, w)) += 1)
    }
    val corpus = counts.groupBy(_._1._2).view
      .mapValues(_.values.sum).toMap
    val srcTot = counts.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum, m.size.toLong)).toMap
    val v = corpus.size.toLong
    val n = corpus.values.sum
    val expected = srcTot.toSeq.sortBy(_._1).map { case (src, (nt, vs)) =>
      val kl = corpus.toSeq.map { case (w, cw) =>
        val p = (counts((src, w)) + 1.0) / (nt + v).toDouble
        val q = (cw + 1.0) / (n + v).toDouble
        BigDecimal(roundHalfUp(p * math.log(p / q), 9))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      (src, nt, vs, roundHalfUp(kl, 6))
    }
    val out = TextOps.sourceKl(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(out == expected, "KL diverges from the recompute")
    // Gibbs: KL ≥ 0 for proper distributions (both sides smoothed over
    // the same support); rounding can dip a hair below zero
    out.foreach { case (src, _, _, kl) =>
      assert(kl >= -1e-6, s"$src has negative KL")
    }
  }

  test("zipf slope matches the local least-squares recompute and is " +
    "negative on the fixture") {
    import spark.implicits._
    val docs = Tables(spark, sfTest, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    val counts = scala.collection.mutable.HashMap
      .empty[(String, String), Long].withDefaultValue(0L)
    docs.foreach { case (src, t) =>
      t.split(" ", -1).filter(_.nonEmpty).foreach(w => counts((src, w)) += 1)
    }
    def d9(x: Double) = BigDecimal(roundHalfUp(x, 9))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val expected = counts.groupBy(_._1._1).toSeq.sortBy(_._1)
      .map { case (src, m) =>
        val ranked = m.toSeq
          .map { case ((_, w), c) => (w, c) }
          .sortBy { case (w, c) => (-c, w) }.zipWithIndex
        val xs = ranked.map { case ((_, c), i) =>
          (roundHalfUp(math.log(i + 1.0), 9), roundHalfUp(math.log(c.toDouble), 9))
        }
        val nn = xs.size.toDouble
        val sx = xs.map(t => d9(t._1)).sum.toDouble
        val sy = xs.map(t => d9(t._2)).sum.toDouble
        val sxy = xs.map(t => d9(t._1 * t._2)).sum.toDouble
        val sx2 = xs.map(t => d9(t._1 * t._1)).sum.toDouble
        val sy2 = xs.map(t => d9(t._2 * t._2)).sum.toDouble
        val num = nn * sxy - sx * sy
        val dx = nn * sx2 - sx * sx
        val dy = nn * sy2 - sy * sy
        val slope = if (dx > 0) Some(roundHalfUp(num / dx, 6)) else None
        val r2 = if (dx > 0 && dy > 0)
          Some(roundHalfUp(num * num / (dx * dy), 6)) else None
        (src, xs.size.toLong, slope, r2)
      }
    val out = TextOps.zipfSlope(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(out == expected, "zipf fit diverges from the recompute")
    // the fixture corpus draws words zipf-ish: every source must show a
    // falling curve with a real fit
    out.foreach { case (src, _, slope, r2) =>
      assert(slope.exists(_ < 0), s"$src slope not negative")
      assert(r2.exists(v => v > 0 && v <= 1 + 1e-9), s"$src r2 out of range")
    }
  }

  test("winnowing matches the local recompute; a shared 6-token run " +
    "forces a shared fingerprint") {
    import spark.implicits._
    // local winnow of one doc: (n_grams, selected fingerprint set)
    def winnow(text: String): Option[(Long, Set[String])] = {
      val ts = text.split(" ", -1).filter(_.nonEmpty)
      if (ts.length < 3) None else {
        val keys = (1 to ts.length - 2).map { i =>
          md5Hex(ts.slice(i - 1, i + 2).mkString(" ")).substring(0, 8) +
            "%010d".format(9999999999L - i)
        }
        val p = keys.length
        val sel = (1 to math.max(p - 3, 1)).map { j =>
          keys.slice(j - 1, math.min(j + 3, p)).min.substring(0, 8)
        }.toSet
        Some((p.toLong, sel))
      }
    }
    val docs = Tables(spark, sfTest, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val fps = docs.flatMap { case (id, t) =>
      winnow(t).map { case (ng, sel) => (id, ng, sel) }
    }
    val docCount = scala.collection.mutable.HashMap
      .empty[String, Int].withDefaultValue(0)
    fps.foreach { case (_, _, sel) => sel.foreach(docCount(_) += 1) }
    val expected = fps.map { case (id, ng, sel) =>
      val shared = sel.count(docCount(_) > 1).toLong
      (id, ng, sel.size.toLong, shared,
        roundHalfUp(shared.toDouble / sel.size, 4))
    }.sortBy(_._1).toSeq
    val out = DedupOps.winnowFingerprints(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(out == expected, "winnow report diverges from the recompute")
    // the pair list: same selections, df-capped posting recompute
    val byFp = scala.collection.mutable.HashMap
      .empty[String, List[Long]].withDefaultValue(Nil)
    fps.foreach { case (id, _, sel) => sel.foreach(f => byFp(f) ::= id) }
    val pairCount = scala.collection.mutable.HashMap
      .empty[(Long, Long), Long].withDefaultValue(0L)
    byFp.values
      .filter(ds => ds.size >= 2 && ds.size <= DedupOps.DefaultMaxShingleDf)
      .foreach { ds =>
        val sorted = ds.sorted
        for (i <- sorted.indices; j <- (i + 1) until sorted.length)
          pairCount((sorted(i), sorted(j))) += 1
      }
    val expectedPairs = pairCount.toSeq
      .filter(_._2 >= DedupOps.DefaultWinnowMinShared)
      .map { case ((a, b), n) => (a, b, n) }.sorted
    val gotPairs = DedupOps.winnowPairs(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotPairs == expectedPairs,
      "winnow pairs diverge from the posting recompute")
    // the SIGMOD'03 guarantee: any verbatim shared run of ≥ w+k−1 = 6
    // tokens yields at least one shared selected fingerprint
    val dir = Files.createTempDirectory("graft_winnow").toString
    Seq(
      (1L, "aa bb cc run1 run2 run3 run4 run5 run6 dd ee ff"),
      (2L, "xx yy run1 run2 run3 run4 run5 run6 zz ww qq"),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8 p9 p0")) // disjoint vocabulary
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val syn = DedupOps.winnowFingerprints(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(syn(1L) >= 1 && syn(2L) >= 1,
      "6-token shared run must share a fingerprint")
    assert(syn(3L) == 0, "disjoint doc must share nothing")
  }

  test("market share reconciles against the 5-way star revenue") {
    val out = Relational.marketShare(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, natRev, totRev, share) =>
      assert(natRev >= 0 && natRev <= totRev)
      assert(share >= 0.0 && share <= 1.0)
      // the reported share must agree with the independently rounded
      // integer revenues up to their own rounding slack
      assert(math.abs(share - natRev.toDouble / totRev) < 1e-4)
    }
    val asia = Relational.join5Way(spark, sfTest).collect()
      .filter(_.getString(0) == "ASIA")
    val asiaTotal = asia.map(_.getLong(2)).sum
    val nation2 = asia.filter(_.getString(1) == "NATION_2")
      .map(_.getLong(2)).sum
    // both sides round independently (per year vs per nation)
    val slack = (out.length + asia.length).toLong
    assert(math.abs(out.map(_._3).sum - asiaTotal) <= slack)
    assert(math.abs(out.map(_._2).sum - nation2) <= slack)
  }

  test("top-value parts selects exactly the above-1.1×-mean set, ordered " +
    "by exact revenue") {
    import spark.implicits._
    val li = Tables(spark, sfTest, "lineitem")
      .select($"l_partkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Double, Double)].collect()
    val rev = scala.collection.mutable.HashMap
      .empty[Long, BigDecimal].withDefaultValue(BigDecimal(0))
    li.foreach { case (pk, price, disc) =>
      rev(pk) += BigDecimal(price).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        (BigDecimal(1) -
          BigDecimal(disc).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }
    val total = rev.values.sum
    val n = rev.size
    val expectedSel = rev.filter { case (_, r) => r * 10 * n > total * 11 }
    val expectedOrder = expectedSel.toSeq
      .sortBy { case (pk, r) => (-r, pk) }.map(_._1)
    val out = Relational.topValueParts(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == expectedOrder,
      "selection or order diverges from the recompute")
    out.foreach { case (pk, vRev, share) =>
      assert(vRev == expectedSel(pk).setScale(0,
        BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(math.abs(share - (expectedSel(pk) / total).toDouble) < 1e-6)
    }
  }

  test("lang mislabel audit reconciles with the confusion matrix's " +
    "off-diagonal mass") {
    import spark.implicits._
    val bySource = TextOps.langMislabel(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val confusion = TextOps.langIdConfusion(spark, sfTest).collect()
    val offDiag = confusion
      .filter(r => r.getString(0) != r.getString(1)).map(_.getLong(2)).sum
    assert(bySource.map(_._3).sum == offDiag,
      "per-feed mislabels must sum to the confusion off-diagonal")
    assert(bySource.map(_._2).sum ==
      Tables(spark, sfTest, "documents").count())
    bySource.foreach { case (src, n, m, rate) =>
      assert(m <= n && math.abs(rate - m.toDouble / n) < 1e-6, src)
    }
  }

  test("length profile matches the local type-7 quantile recompute") {
    import spark.implicits._
    val docs = Tables(spark, sfTest, "documents")
      .select($"source", $"text").as[(String, String)].collect()
    def q7(sorted: Array[Long], q: Double): Double = {
      val h = (sorted.length - 1) * q
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
    }
    val expected = docs
      .map { case (s0, t) =>
        (s0, t.split(" ", -1).count(_.nonEmpty).toLong) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, g) =>
        val v = g.map(_._2).sorted
        (src, v.length.toLong, roundHalfUp(q7(v, 0.1), 4),
          roundHalfUp(q7(v, 0.5), 4), roundHalfUp(q7(v, 0.9), 4),
          roundHalfUp(v.sum.toDouble / v.length, 4), v.max)
      }
    val out = TextOps.lengthProfile(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toSeq
    assert(out == expected, "length profile diverges from the recompute")
  }

  test("semantic clusters equal a local union-find over the brute-force " +
    "pair graph") {
    import spark.implicits._
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val inGraph = scala.collection.mutable.HashSet.empty[Long]
    for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
      if (cos(vecs(i)._2, vecs(j)._2) >= 0.4) {
        union(vecs(i)._1, vecs(j)._1)
        inGraph += vecs(i)._1; inGraph += vecs(j)._1
      }
    }
    val expected = inGraph.toSeq
      .map(v => (find(v), v)).sortBy(identity)
      .map { case (c, v) => (c, v, v == c) }
    val out = VectorOps.semanticClusters(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out == expected, "clusters diverge from local union-find")
    assert(out.nonEmpty)
  }

  test("cell-candidate edge source equals the brute-force edge set and " +
    "the graded cluster query is row-identical on it (scale-path pin)") {
    import spark.implicits._
    // the contract that lets q_semantic_clusters grade on the cell
    // source while keeping the brute-force recursive-CTE oracle: at the
    // graded threshold and default nassign, cellPairs must have BOTH
    // precision 1 (⊆ brute — structural: exact cosine verifies every
    // candidate) and recall 1 (measured; CellExp) on every fixture the
    // gate touches. Drift in fixtures/quantizer turns into THIS failing,
    // not a silent oracle mismatch.
    for (dir <- Seq(sfTest, "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val brute = VectorOps.embedNearDup(spark, dir)
        .select($"a_id", $"b_id")
      val cell = VectorOps.cellPairs(spark, dir, 0.4)
        .select($"a_id", $"b_id")
      assert(cell.exceptAll(brute).count() == 0,
        s"$dir: cell edges not a subset of brute-force edges")
      assert(brute.exceptAll(cell).count() == 0,
        s"$dir: cell source missed brute-force edges (recall < 1) - " +
          "raise nassign or re-grade q_semantic_clusters on " +
          "semanticClusters before shipping")
      val exact = VectorOps.semanticClusters(spark, dir).collect().toSeq
      val viaCells = VectorOps.semanticClustersCell(spark, dir).collect()
        .toSeq
      assert(viaCells == exact,
        s"$dir: cell-source clusters diverge from brute-force clusters")
    }
  }

  test("customer order-count distribution reconciles and keeps the zero " +
    "bucket") {
    import spark.implicits._
    val out = Relational.custOrderDist(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._2).sum == Tables(spark, sfTest, "customer").count(),
      "every customer must land in exactly one bucket")
    assert(out.map { case (n, c) => n * c }.sum ==
      Tables(spark, sfTest, "orders").count(),
      "bucket mass must equal the order count")
    // the zero bucket: a customer with no orders must appear at n=0,
    // not vanish (the LEFT OUTER semantics an inner join would lose)
    val dir = Files.createTempDirectory("graft_custdist").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
      .write.parquet(s"$dir/customer.parquet")
    Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    val syn = Relational.custOrderDist(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(syn == Map(2L -> 1L, 1L -> 1L, 0L -> 1L))
  }

  test("top supplier is the exact-max equality cut and preserves ties") {
    import spark.implicits._
    val li = Tables(spark, sfTest, "lineitem")
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .select($"l_suppkey", $"l_extendedprice", $"l_discount")
      .as[(Long, Double, Double)].collect()
    val rev = scala.collection.mutable.HashMap
      .empty[Long, BigDecimal].withDefaultValue(BigDecimal(0))
    li.foreach { case (sk, p, d) =>
      rev(sk) += BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        (BigDecimal(1) - BigDecimal(d).setScale(2,
          BigDecimal.RoundingMode.HALF_UP))
    }
    val mx = rev.values.max
    val expected = rev.filter(_._2 == mx).keys.toSeq.sorted
    val out = Relational.topSupplier(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.map(_._1).toSeq == expected)
    out.foreach { case (_, v) =>
      assert(v == mx.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    // ties: two suppliers with byte-identical revenue BOTH surface
    val dir = Files.createTempDirectory("graft_topsupp").toString
    Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name").write.parquet(s"$dir/supplier.parquet")
    Seq(
      (1L, 100.0, 0.1, "1996-02-01"),
      (2L, 100.0, 0.1, "1996-02-02"), // identical revenue as #1
      (3L, 50.0, 0.0, "1996-02-03"))
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "d")
      .select($"l_suppkey", $"l_extendedprice", $"l_discount",
        $"d".cast("timestamp").as("l_shipdate"))
      .write.parquet(s"$dir/lineitem.parquet")
    val tied = Relational.topSupplier(spark, dir).collect()
      .map(_.getLong(0)).toSeq
    assert(tied == Seq(1L, 2L), "exact-revenue tie must keep both")
  }

  test("order-defining surfaces are invariant to the session's shuffle " +
    "width") {
    // The reproducibility claim the md5-key discipline makes is ACROSS
    // CLUSTER SHAPES: the same corpus on 3 partitions and 11 must emit
    // byte-identical samples, orders, and cuts. rand()-based samplers
    // and unpinned window orders fail exactly this test.
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "11")
    for (q <- Seq("q_sample_weighted", "q_shuffle_order", "q_token_budget",
      "q_curriculum_buckets", "q_sample_stratified", "q_kmeans")) {
      val a = graft.SparkEntry.queries(q)(spark, sfTest)
        .collect().map(_.toString).toSeq
      val b = graft.SparkEntry.queries(q)(wide, sfTest)
        .collect().map(_.toString).toSeq
      assert(a == b, s"$q changes under a different shuffle width")
    }
  }

  // exact-DECIMAL discounted revenue, the oracle-side formula
  private def rev2(price: Double, disc: Double): BigDecimal =
    BigDecimal(price).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
      (BigDecimal(1) -
        BigDecimal(disc).setScale(2, BigDecimal.RoundingMode.HALF_UP))

  test("nation trade matches the local two-role recompute and never " +
    "reports a same-nation flow") {
    import spark.implicits._
    val nat = Tables(spark, sfTest, "nation")
      .select($"n_nationkey", $"n_name").as[(Long, String)].collect().toMap
    val supN = Tables(spark, sfTest, "supplier")
      .select($"s_suppkey", $"s_nationkey").as[(Long, Long)].collect()
      .map { case (k, n) => k -> nat(n) }.toMap
    val custN = Tables(spark, sfTest, "customer")
      .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect()
      .map { case (k, n) => k -> nat(n) }.toMap
    val orderCust = Tables(spark, sfTest, "orders")
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect().toMap
    val li = Tables(spark, sfTest, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount",
        year($"l_shipdate").cast("long"))
      .as[(Long, Long, Double, Double, Long)].collect()
    // the graded default pair has no cross-flows at sf0.001 — the spec
    // exercises the operator's pair parameters on a pair that does
    val pair = Set("NATION_18", "NATION_19")
    val expected = li.flatMap { case (ok, sk, p, d, y) =>
      val sn = supN(sk); val cn = custN(orderCust(ok))
      if (pair(sn) && pair(cn) && sn != cn)
        Some(((sn, cn, y), (rev2(p, d), 1L)))
      else None
    }.groupBy(_._1).map { case (k, g) =>
      (k, g.map(_._2._1).sum.setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toLong, g.map(_._2._2).sum)
    }.toSeq.sortBy(_._1)
    val out = Relational
      .nationTrade(spark, sfTest, "NATION_18", "NATION_19").collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == expected, s"trade diverges from local recompute")
    assert(out.nonEmpty && out.forall { case ((a, b, _), _, _) => a != b })
  }

  test("promo share reconciles numerator, denominator, and ratio") {
    import spark.implicits._
    val promoParts = Tables(spark, sfTest, "part")
      .filter($"p_type" === "PROMO").select($"p_partkey")
      .as[Long].collect().toSet
    val li = Tables(spark, sfTest, "lineitem")
      .select($"l_partkey", $"l_extendedprice", $"l_discount",
        year($"l_shipdate").cast("long"))
      .as[(Long, Double, Double, Long)].collect()
    val byYear = li.groupBy(_._4).map { case (y, g) =>
      val tot = g.map(r => rev2(r._2, r._3)).sum
      val promo = g.filter(r => promoParts(r._1)).map(r => rev2(r._2, r._3)).sum
      (y, promo.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
        tot.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
        BigDecimal(100.0 * promo.toDouble / tot.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val out = Relational.promoShare(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(out == byYear, "promo share diverges from local recompute")
  }

  test("disjunctive revenue equals the branch-by-branch local recompute " +
    "and both sides of the join carry pushed OR filters") {
    import spark.implicits._
    val pspec = Tables(spark, sfTest, "part")
      .select($"p_partkey", $"p_brand", $"p_size")
      .as[(Long, String, Int)].collect()
      .map(p => p._1 -> (p._2, p._3)).toMap
    val li = Tables(spark, sfTest, "lineitem")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
      .as[(Long, Double, Double, Double)].collect()
    def branch(b: String, s0: Int, s1: Int, q0: Double, q1: Double)(
        r: (Long, Double, Double, Double)): Boolean = {
      val (brand, size) = pspec(r._1)
      brand == b && size >= s0 && size <= s1 && r._2 >= q0 && r._2 <= q1
    }
    val keep = li.filter(r => branch("Brand#9", 1, 15, 1, 20)(r) ||
      branch("Brand#13", 10, 30, 10, 35)(r) ||
      branch("Brand#20", 20, 50, 20, 50)(r))
    val expRev = keep.map(r => rev2(r._3, r._4)).sum
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val out = Relational.disjunctiveRevenue(spark, sfTest).collect().head
    assert((out.getLong(0), out.getLong(1)) == ((expRev, keep.length.toLong)))
    // the single-table OR components must reach BOTH parquet scans
    val plan = Relational.disjunctiveRevenue(spark, sfTest)
      .queryExecution.executedPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    val pushed = scans.map(_.metadata("PushedFilters"))
    assert(pushed.exists(p => p.contains("l_quantity") && p.contains("Or(")),
      s"no quantity OR pushed: $pushed")
    assert(pushed.exists(p => p.contains("p_brand") && p.contains("Or(")),
      s"no brand/size OR pushed: $pushed")
  }

  test("dormant high-balance customers: bar, anti join, and rollup " +
    "reconcile locally") {
    import spark.implicits._
    val cust = Tables(spark, sfTest, "customer")
      .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
      .as[(Long, Double, String)].collect()
    val bar = {
      val pos = cust.filter(_._2 > 0)
      pos.map(_._2).sum / pos.length
    }
    val bigCust = Tables(spark, sfTest, "orders")
      .filter($"o_totalprice" > 300000).select($"o_custkey")
      .as[Long].collect().toSet
    val keep = cust.filter(c => c._2 > bar && !bigCust(c._1))
    val expected = keep.groupBy(_._3).map { case (seg, g) =>
      val tot = g.map(c => BigDecimal(c._2)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (seg, g.length.toLong,
        tot.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong,
        BigDecimal(tot.toDouble / g.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val out = Relational.custBalance(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(out == expected, "dormant-customer rollup diverges")
    assert(out.nonEmpty)
  }

  test("late orders counts each qualifying order once regardless of how " +
    "many lines are late") {
    import spark.implicits._
    val lag = 60L * 24 * 3600 // 60 days in seconds (NTZ-safe long cast)
    val orders = Tables(spark, sfTest, "orders")
      .select($"o_orderkey",
        $"o_orderdate".cast("timestamp").cast("long"), $"o_orderpriority",
        year($"o_orderdate").cast("long"))
      .as[(Long, Long, String, Long)].collect()
    val lateKeys = {
      val od = orders.map(o => o._1 -> o._2).toMap
      Tables(spark, sfTest, "lineitem")
        .select($"l_orderkey", $"l_shipdate".cast("timestamp").cast("long"))
        .as[(Long, Long)].collect()
        .filter { case (ok, ship) => ship > od(ok) + lag }
        .map(_._1).toSet
    }
    val expected = orders.filter(o => lateKeys(o._1))
      .groupBy(o => (o._3, o._4)).map { case ((p, y), g) =>
        (p, y, g.length.toLong) }.toSeq.sortBy(t => (t._1, t._2))
    val out = Relational.lateOrders(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expected, "late-order counts diverge")
    assert(out.nonEmpty)
  }

  test("BPE merges match an independent local reference and the " +
    "hand-computable synthetic corpus") {
    import spark.implicits._
    // independent reference: textbook BPE (Sennrich ACL'16) over the
    // collected word counts — map-based pair counting, no shared code
    def localBpe(words: Map[String, Long], k: Int)
    : Seq[(String, String, Long)] = {
      var vocab: Map[Seq[String], Long] = words.map { case (w, n) =>
        val cs = w.map(_.toString).toArray
        cs(cs.length - 1) += "</w>"
        (cs.toSeq, n)
      }
      (1 to k).flatMap { _ =>
        val pairs = scala.collection.mutable.HashMap
          .empty[(String, String), Long].withDefaultValue(0L)
        vocab.foreach { case (syms, n) =>
          syms.zip(syms.drop(1)).foreach(p => pairs(p) += n)
        }
        if (pairs.isEmpty) None
        else {
          val ((l, r), n) = pairs.minBy { case ((a, b), c) => (-c, a, b) }
          vocab = vocab.map { case (syms, wn) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toSeq, wn)
          }.groupMapReduce(_._1)(_._2)(_ + _)
          Some((l, r, n))
        }
      }
    }
    val words = Tables(spark, sfTest, "documents")
      .select(explode(split($"text", "\\s+")).as("w")).filter($"w" =!= "")
      .groupBy($"w").count().as[(String, Long)].collect().toMap
    val expected = localBpe(words, 10)
    val out = TextOps.bpeMerges(spark, sfTest).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(out == expected, s"merge sequence diverges:\n $out\n $expected")
    assert(out.size == 10)
    // hand-computable corpus: "low low low lower" — first merges must
    // build 'low' before touching the rarer 'lower' suffix
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    Seq((1L, "low low low lower", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val syn = TextOps.bpeMerges(spark, dir, k = 3).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    // pair counts: (l,o)=4, (o,w</w>)=3, (o,w)=1, (w,e)=1 … →
    // merge1 (l,o)=4; then (lo,w</w>)=3 → 'low</w>'; then the lower
    // branch: (lo,w)=1 ties break lexicographically among count-1 pairs
    assert(syn.take(2) == Seq(("l", "o", "lo", 4L),
      ("lo", "w</w>", "low</w>", 3L)), s"synthetic merges: $syn")
    // encode side: the marker rides ON the last char, so 'low' is 3
    // symbols ['l','o','w</w>'] and 'lower' is 5 — 3·3 + 5 = 14 symbols;
    // with 2 merges 'low' tokenizes to ['low</w>'] (1 each) and 'lower'
    // to ['lo','w','e','r</w>'] (4): 3·1 + 4 = 7 BPE tokens, 4 words
    val enc = TextOps.bpeEncode(spark, dir, k = 2).collect().head
    assert((enc.getLong(2), enc.getLong(3), enc.getLong(4)) ==
      ((4L, 14L, 7L)), s"synthetic encode: $enc")
    // fixture-wide sandwich: words ≤ BPE tokens ≤ raw symbols, and the
    // merge list must actually compress
    val full = TextOps.bpeEncode(spark, sfTest).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      val (w, sy, tk) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(w <= tk && tk < sy, s"token sandwich violated: $r")
      assert(r.getDouble(5) > 1.0)
    }
  }

  test("tokenizer-training checkpoint eagerness is invisible: the lazy " +
    "(shipped) and eager (BpeExp A/B) forms emit identical rows") {
    // r19: bpeMerges/unigramTrain switched from eager per-round
    // localCheckpoints to lazy ones (the clusterPairs discipline — the
    // argmax/collect action materializes the checkpoint in the same
    // job). Eagerness schedules WHEN blocks persist, never what any
    // round computes, so the full outputs must match bit-for-bit.
    val mLazy = TextOps.bpeMerges(spark, sfTest).collect().toSeq
    val mEager =
      TextOps.bpeMerges(spark, sfTest, eagerCkpt = true).collect().toSeq
    assert(mLazy == mEager, s"bpeMerges diverges:\n $mLazy\n $mEager")
    val uLazy = TextOps.unigramTrain(spark, sfTest).collect().toSeq
    val uEager =
      TextOps.unigramTrain(spark, sfTest, eagerCkpt = true).collect().toSeq
    assert(uLazy == uEager, s"unigramTrain diverges:\n $uLazy\n $uEager")
  }

  test("tokenizer lazy-checkpoint form schedules strictly fewer jobs " +
    "than the eager form (the BpeExp witness, CI-enforced)") {
    // r19 ADVICE: the lazy form's job saving silently depends on the
    // per-round argmax action computing EVERY partition — if a plan
    // change ever yields an incremental-scan take, LocalRDDCheckpointData
    // backfills missing partitions with extra jobs and the saving
    // quietly evaporates (outputs stay correct). Pin it: per training
    // call the eager form pays one materialization job per round plus
    // one for the final table, so lazy must undercut eager by at least
    // the round count. Counters sample after a listener-bus settle
    // (listener events are async).
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    def jobsOf(f: => Unit): Long = {
      Thread.sleep(200)
      val j0 = jobs.get(); f; Thread.sleep(200); jobs.get() - j0
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // warm the table cache outside the counted windows
      TextOps.bpeMerges(spark, sfTest).collect()
      val k = 10 // both loops' default round count
      val mLazy = jobsOf(TextOps.bpeMerges(spark, sfTest).collect())
      val mEager =
        jobsOf(TextOps.bpeMerges(spark, sfTest, eagerCkpt = true).collect())
      assert(mLazy + k <= mEager,
        s"bpeMerges lazy form lost its job saving: lazy=$mLazy eager=$mEager")
      val uLazy = jobsOf(TextOps.unigramTrain(spark, sfTest).collect())
      val uEager =
        jobsOf(TextOps.unigramTrain(spark, sfTest, eagerCkpt = true)
          .collect())
      assert(uLazy < uEager,
        s"unigramTrain lazy form lost its job saving: " +
          s"lazy=$uLazy eager=$uEager")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("unigram-LM training matches an independent local EM recompute; " +
    "encode is hand-checkable on a synthetic corpus") {
    import spark.implicits._
    // INDEPENDENT reference: the documented algorithm re-implemented
    // from its spec — Viterbi with the earlier-split tie rule, Laplace
    // probs (c+1)/(C+V), least-count pruning (count asc, piece desc),
    // chars mandatory — sharing no code with TextOps
    def viterbi(w: String, lp: Map[String, Double], maxLen: Int)
    : Seq[String] = {
      val L = w.length
      val best = Array.fill(L + 1)(Double.NegativeInfinity)
      val back = Array.fill(L + 1)(-1)
      best(0) = 0.0
      for (i <- 1 to L; j <- math.max(0, i - maxLen) until i) {
        lp.get(w.substring(j, i)).foreach { v =>
          if (best(j) + v > best(i)) { best(i) = best(j) + v; back(i) = j }
        }
      }
      Iterator.unfold(L)(k => if (k <= 0) None
        else Some((w.substring(back(k), k), back(k)))).toSeq.reverse
    }
    def localTrain(words: Map[String, Long], vocabSize: Int, maxLen: Int,
                   seedFactor: Int, pruneFrac: Double)
    : Seq[(Long, String, Long)] = {
      val subCounts = scala.collection.mutable.HashMap
        .empty[String, Long].withDefaultValue(0L)
      words.foreach { case (w, n) =>
        for (len <- 1 to math.min(maxLen, w.length);
             j <- 0 to w.length - len)
          subCounts(w.substring(j, j + len)) += n
      }
      val chars = subCounts.filter(_._1.length == 1).toSeq
      val multis = subCounts.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(seedFactor * vocabSize)
      var pieces: Seq[(String, Long)] = chars ++ multis
      def laplace(ps: Seq[(String, Long)]) = {
        val tot = ps.map(_._2).sum.toDouble
        ps.map { case (p, c) =>
          p -> math.log((c + 1.0) / (tot + ps.size)) }.toMap
      }
      def estep(lp: Map[String, Double]): Map[String, Long] = {
        val cnt = scala.collection.mutable.HashMap
          .empty[String, Long].withDefaultValue(0L)
        words.foreach { case (w, n) =>
          viterbi(w, lp, maxLen).foreach(p => cnt(p) += n) }
        cnt.toMap
      }
      while (pieces.size > vocabSize) {
        val counts = estep(laplace(pieces))
        val (mand, rem) = pieces.map { case (p, _) =>
          (p, counts.getOrElse(p, 0L)) }.partition(_._1.length == 1)
        val drop = math.min(
          math.max(1, math.ceil(pruneFrac * rem.size).toInt),
          pieces.size - vocabSize)
        pieces = mand ++ rem.sortBy { case (p, c) => (c, p) }(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
          .drop(drop)
      }
      val fin = estep(laplace(pieces))
      pieces.map { case (p, _) => (p, fin.getOrElse(p, 0L)) }
        .sortBy { case (p, c) => (-c, p) }
        .zipWithIndex.map { case ((p, c), i) => (i + 1L, p, c) }
    }
    val words = Tables(spark, sfTest, "documents")
      .select(explode(split($"text", "\\s+")).as("w")).filter($"w" =!= "")
      .groupBy($"w").count().as[(String, Long)].collect().toMap
    val expected = localTrain(words, 40, 4, 4, 0.2)
    val out = TextOps.unigramTrain(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == expected,
      s"unigram table diverges:\n spark=${out.take(8)}…" +
        s"\n local=${expected.take(8)}…")
    assert(out.size == 40 + words.keys.flatMap(_.toCharArray).toSet.size
      || out.size >= 40, s"final size ${out.size}")
    // multi-char pieces must actually win corpus slots, chars survive
    assert(out.exists(_._2.length > 1), "no multi-char piece learned")
    // synthetic corpus: 'ababab' repeated — 'ab' (or longer ab-runs)
    // must dominate; encode compresses chars ≥ 2× into pieces
    val dir = java.nio.file.Files.createTempDirectory("graft_uni").toString
    Seq((1L, "ababab ababab ababab cd", "en", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val syn = TextOps.unigramTrain(spark, dir, vocabSize = 6).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(syn.exists { case (p, c) => p.length > 1 && p.forall("ab".contains(_)) && c > 0 },
      s"synthetic table learned no ab-piece: ${syn.toSeq}")
    val enc = TextOps.unigramEncode(spark, dir, vocabSize = 6)
      .collect().head
    // 3 words of 6 ab-chars + 'cd' = 20 chars; ab-pieces of len ≥ 2
    // keep pieces ≤ half the ab chars + ≤ 2 for 'cd'
    assert(enc.getLong(2) == 4L && enc.getLong(3) == 20L,
      s"synthetic encode counts: $enc")
    assert(enc.getLong(4) <= 11L, s"no compression: $enc")
    assert(enc.getDouble(5) >= 1.8, s"compression ratio: $enc")
    // fixture-wide sanity: words ≤ pieces ≤ chars per source
    val full = TextOps.unigramEncode(spark, sfTest).collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getLong(1) <= r.getLong(4) && r.getLong(4) <= r.getLong(3),
        s"piece sandwich violated: $r")
    }
  }

  test("unigram-LM training terminates on a charset larger than " +
    "vocabSize and returns the irreducible char inventory") {
    import spark.implicits._
    // 26 letters + digits + punctuation >> vocabSize=5; chars are never
    // pruned, so the ONLY correct fixed point is the full char
    // inventory — before the r14 guard this spun estep forever once the
    // removable multi-piece set emptied
    val text = "Mixed CASE text, with digits 0123456789 & punct!? " +
      "abcdefghijklmnopqrstuvwxyz"
    val dir = java.nio.file.Files.createTempDirectory("graft_uni_cs").toString
    Seq((1L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val charset = text.split("\\s+").filter(_.nonEmpty)
      .flatMap(_.toCharArray).toSet
    assert(charset.size > 5, s"fixture charset too small: ${charset.size}")
    val out = TextOps.unigramTrain(spark, dir, vocabSize = 5).collect()
      .map(_.getString(1))
    assert(out.forall(_.length == 1),
      s"non-char piece survived an irreducible prune: ${out.toSeq}")
    assert(out.toSet == charset.map(_.toString),
      s"char inventory mismatch: got ${out.toSeq.sorted}")
  }

  test("unigram-LM training: EM-round count is corpus-size-invariant " +
    "and the driver piece table stays within seedFactor*V + charset") {
    import spark.implicits._
    // same word-type distribution at 1x and 4x volume: the seed
    // inventory (top substrings by weighted count) is identical, so the
    // prune trajectory — and the EM round count — must not grow with
    // corpus size; the piece table must never exceed its documented
    // closure bound (the k-means literal-centroid discipline)
    val docs1 = (1 to 6).map(i =>
      (i.toLong, s"alpha$i beta gamma delta$i epsilon zeta", "en", "s",
        40L))
    val docs4 = (0 until 4).flatMap(k => docs1.map { case (id, t, l, s0, n)
      => (k * 100L + id, t, l, s0, n) })
    def train(docs: Seq[(Long, String, String, String, Long)])
    : (Int, Int, Seq[(String, Long)]) = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_uni_inv").toString
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      var rounds = 0; var maxPieces = 0
      val out = TextOps.unigramTrain(spark, dir, vocabSize = 8,
        emProbe = (r, n) => {
          rounds = math.max(rounds, r); maxPieces = math.max(maxPieces, n)
        }).collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      (rounds, maxPieces, out)
    }
    val (r1, p1, out1) = train(docs1)
    val (r4, p4, out4) = train(docs4)
    assert(r1 > 0, "fixture must actually prune")
    assert(r1 == r4, s"EM rounds grew with corpus size: $r1 -> $r4")
    val charset = docs1.flatMap(_._2.split(" ")).flatMap(_.toCharArray)
      .toSet.size
    val bound = 4 * 8 + charset
    assert(p1 <= bound && p4 <= bound,
      s"piece table $p1/$p4 exceeded seedFactor*V+charset = $bound")
    // 4x volume scales every count by 4 and changes nothing else
    assert(out1.map(_._1) == out4.map(_._1),
      "4x volume changed the learned piece inventory")
    assert(out4.map(_._2) == out1.map(_._2).map(_ * 4))
  }

  test("max dup span: level containment and hand-built widths hold on " +
    "a synthetic corpus") {
    import spark.implicits._
    // doc 1 and 2 share EXACTLY a 16-token run (then diverge); doc 3
    // shares only an 8-token run with doc 1; doc 4 shares nothing
    val shared16 = (1 to 16).map(i => s"s$i").mkString(" ")
    val shared8 = (1 to 8).map(i => s"s$i").mkString(" ") // prefix of it
    val pad = (1 to 20).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared16 a1 a2 a3 a4 a5 a6 a7 a8"),
      (2L, s"b1 b2 b3 b4 b5 b6 b7 b8 $shared16"),
      (3L, s"$shared8 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),
      (4L, pad))
    val dir = java.nio.file.Files.createTempDirectory("graft_mds").toString
    docs.map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupOps.maxDupSpan(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1,2 peak at level 16 with exactly ONE shared 16-span each;
    // doc 3 peaks at 8 (it shares s1..s8 — one 8-span position); doc 4
    // is absent. (doc 3's s1..s8 also matches inside docs 1/2, so all
    // three flag at 8 — but 1,2 flag higher.)
    assert(out(1L) == (16L, 1L), s"doc1 ${out.get(1L)}")
    assert(out(2L) == (16L, 1L), s"doc2 ${out.get(2L)}")
    assert(out(3L) == (8L, 1L), s"doc3 ${out.get(3L)}")
    assert(!out.contains(4L))
    // containment sanity on the fixture corpus: every doc flagged at a
    // level > 8 must also have shared 8-spans (subsumed by definition);
    // rows exist and are deterministic
    val fx1 = DedupOps.maxDupSpan(spark, sfTest).collect()
    val fx2 = DedupOps.maxDupSpan(spark, sfTest).collect()
    assert(fx1.map(_.toString).toSeq == fx2.map(_.toString).toSeq)
    assert(fx1.nonEmpty)
    assert(fx1.forall(r => Set(8L, 16L, 32L, 64L)(r.getLong(1)) &&
      r.getLong(2) >= 1L))
  }

  test("embedding PCA spectrum matches an independent power-iteration " +
    "recompute; trace and ordering invariants hold exactly") {
    import spark.implicits._
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val n = vecs.length; val d = vecs.head.length
    // independent covariance (same population definition)
    val mean = Array.tabulate(d)(j => vecs.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j) }
    // independent top-k eigenvalues: power iteration + deflation (a
    // DIFFERENT algorithm from the implementation's Jacobi)
    def powerTop(m: Array[Array[Double]], k: Int): Seq[Double] = {
      val a = m.map(_.clone())
      (0 until k).map { _ =>
        var v = Array.tabulate(d)(i => 1.0 / math.sqrt(d.toDouble))
        var ev = 0.0
        for (_ <- 0 until 500) {
          val w = Array.tabulate(d)(i =>
            (0 until d).map(j => a(i)(j) * v(j)).sum)
          val nrm = math.sqrt(w.map(x => x * x).sum)
          v = w.map(_ / nrm); ev = nrm
        }
        // deflate: a -= ev v v^T
        for (i <- 0 until d; j <- 0 until d) a(i)(j) -= ev * v(i) * v(j)
        ev
      }
    }
    val expected = powerTop(cov, 8)
    val out = VectorOps.embeddingPca(spark, sfTest).collect()
    assert(out.length == 8)
    out.zip(expected).zipWithIndex.foreach { case ((r, e), i) =>
      assert(math.abs(r.getDouble(1) - e) < 1e-6,
        s"eigenvalue ${i + 1}: jacobi ${r.getDouble(1)} vs power $e")
    }
    // exact invariants: non-negative descending spectrum; cum explained
    // monotone <= 1; trace identity vs the full jacobi spectrum
    val evs = out.map(_.getDouble(1))
    assert(evs.zip(evs.tail).forall { case (a, b) => a >= b })
    assert(evs.forall(_ >= -1e-12))
    val cums = out.map(_.getDouble(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(cums.last <= 1.0 + 1e-9)
    val full = VectorOps.jacobiEigenvalues(cov)
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(full.sum - trace) < 1e-9,
      s"trace ${trace} vs eigensum ${full.sum}")
    // determinism across runs
    val again = VectorOps.embeddingPca(spark, sfTest).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("semantic recall audit: 1.0 at the graded nassign, measurably " +
    "below 1 when the quantizer is degraded to nassign=1") {
    val full = VectorOps.semanticRecallAudit(spark, sfTest).collect().head
    assert(full.getLong(1) > 0L, "audit slice found no qualifying pairs " +
      "- fixture cannot exercise the recall measurement")
    assert(full.getLong(2) == full.getLong(1) && full.getDouble(3) == 1.0,
      s"graded-config audit disagrees with the pinned edge equality: $full")
    val degraded = VectorOps
      .semanticRecallAudit(spark, sfTest, nassign = 1).collect().head
    assert(degraded.getDouble(3) < 1.0,
      s"nassign=1 audit failed to surface the recall loss: $degraded")
    assert(degraded.getLong(2) <= degraded.getLong(1),
      "found pairs must be a subset of truth")
    // determinism: the slice is the lowest ids, not a sample — rerun
    // byte-equal
    val again = VectorOps.semanticRecallAudit(spark, sfTest).collect().head
    assert(again.toString == full.toString)
  }

  test("PCA projection: per-component variance equals the graded " +
    "spectrum, components decorrelate, energy is conserved at k=d, " +
    "sign-canonical determinism, empty corpus") {
    import spark.implicits._
    val k = 4
    val proj = VectorOps.pcaProject(spark, sfTest, k).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val n = proj.length
    assert(n.toLong == Tables(spark, sfTest, "embeddings").count())
    assert(proj.forall(_._2.length == k))
    val evs = VectorOps.embeddingPca(spark, sfTest, k).collect()
      .map(_.getDouble(1))
    // projections onto eigenvector j are mean-0 with variance λ_j —
    // the graded SPECTRUM is the independent truth side (itself
    // spec-pinned against power iteration)
    for (j <- 0 until k) {
      val col = proj.map(_._2(j))
      val m = col.sum / n
      val v = col.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(m) < 1e-3, s"component ${j + 1} mean $m")
      assert(math.abs(v - evs(j)) < 1e-3 * math.max(1.0, evs(j)),
        s"component ${j + 1}: projection variance $v vs eigenvalue " +
          s"${evs(j)}")
    }
    // cross-component decorrelation (orthogonal basis ⇒ diagonal
    // projected covariance)
    for (j <- 0 until k; l <- j + 1 until k) {
      val mj = proj.map(_._2(j)).sum / n
      val ml = proj.map(_._2(l)).sum / n
      val cov = proj.map(p => (p._2(j) - mj) * (p._2(l) - ml)).sum / n
      assert(math.abs(cov) < 1e-3, s"components ${j + 1},${l + 1}: $cov")
    }
    // energy conservation at k = d: Σ||y||² = Σ||x − μ||² (a rotation
    // moves no energy), so per-row reconstruction is exact
    val vecs = Tables(spark, sfTest, "embeddings")
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    val d = vecs.head.length
    val mean = Array.tabulate(d)(j => vecs.map(_(j)).sum / n)
    val centeredEnergy = vecs
      .map(v => v.zip(mean).map { case (x, m) => (x - m) * (x - m) }.sum)
      .sum
    val full = VectorOps.pcaProject(spark, sfTest, d).collect()
      .map(r => r.getSeq[Double](1).toArray)
    val projEnergy = full.map(_.map(x => x * x).sum).sum
    assert(math.abs(projEnergy - centeredEnergy) <
      1e-6 * centeredEnergy,
      s"energy: projected $projEnergy vs centered $centeredEnergy")
    // deterministic including SIGN (canonicalized basis)
    val again = VectorOps.pcaProject(spark, sfTest, k).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(proj.map(p => (p._1, p._2.toSeq)).toSeq ==
      again.map(p => (p._1, p._2.toSeq)).toSeq)
    // empty corpus → empty projection, not a reduce crash
    val dir0 = java.nio.file.Files
      .createTempDirectory("graft_pcap0").toString
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir0/embeddings.parquet")
    assert(VectorOps.pcaProject(spark, dir0).count() == 0L)
  }

  test("PCA long form (the graded r17 shape): exact posexplode of the " +
    "array seam in (vec_id, component) order, scalar-columned per the " +
    "driver lint, empty corpus stays empty") {
    import spark.implicits._
    val k = 4
    val long = VectorOps.pcaProjectLong(spark, sfTest, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val arr = VectorOps.pcaProject(spark, sfTest, k).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    assert(long.length == arr.length * k)
    val expect = arr.sortBy(_._1).flatMap { case (id, p) =>
      p.zipWithIndex.map { case (x, j) => (id, j.toLong, x) } }
    assert(long.toSeq == expect.toSeq,
      "long form must be the posexplode of the library seam, totally " +
        "ordered by (vec_id, component)")
    // the r16 driver failure class can't recur: graded shape passes the
    // boundary lint
    graft.Verify.lintGradedSchema("q_pca_project",
      VectorOps.pcaProjectLong(spark, sfTest, k).schema)
    val dir0 = java.nio.file.Files
      .createTempDirectory("graft_pcal0").toString
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir0/embeddings.parquet")
    assert(VectorOps.pcaProjectLong(spark, dir0).count() == 0L)
  }

  test("graded-output boundary lint: rejects the two r16 driver-failure " +
    "classes (Array column, DECIMAL boundary) and EVERY SparkEntry " +
    "query's schema passes it") {
    import org.apache.spark.sql.types._
    intercept[IllegalStateException] {
      graft.Verify.lintGradedSchema("x", StructType(Seq(
        StructField("proj", ArrayType(DoubleType)))))
    }
    intercept[IllegalStateException] {
      graft.Verify.lintGradedSchema("x", StructType(Seq(
        StructField("pair_cost", DecimalType(38, 0)))))
    }
    intercept[IllegalStateException] {
      graft.Verify.lintGradedSchema("x", StructType(Seq(
        StructField("m", MapType(StringType, LongType)))))
    }
    // schema-only pass over the full graded surface: planning cost, no
    // execution — the lint that makes "driver-unhashable output shape"
    // a suite failure instead of a round-end driver surprise
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      graft.Verify.lintGradedSchema(name, fn(spark, sfTest).schema)
    }
  }

  test("SRP recall calibration: truth total is the exact pair count, " +
    "cumulative counts are monotone, the loosest cutoff catches every " +
    "truth pair at the audit config, and the b=1 candidate set is " +
    "exactly embedNearDupLsh's") {
    val rows = VectorOps.srpRecall(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val truth = VectorOps.embedNearDup(spark, sfTest).count()
    assert(truth > 0, "fixture must carry qualifying pairs")
    assert(rows.forall(_._4 == truth), s"truth column: ${rows.toSeq}")
    // ordered by cutoff; candidates and caught are cumulative-from-the-
    // top, so both decrease as the cutoff rises
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._2 >= b._2 && a._3 >= b._3
      case _ => true
    })
    // the audit configuration (R=2, B=32: per-pair miss < 1e-6 at
    // t=0.4) catches every truth pair at the loosest observed cutoff
    val loosest = rows.head
    assert(loosest._3 == truth && loosest._5 == 1.0,
      s"loosest cutoff must reach recall 1.0 on the fixture: $loosest")
    // precision ∈ [0, 1] (0 is legitimate: the strictest cutoffs can
    // hold only sub-threshold pairs that happen to share many 2-bit
    // band keys)
    assert(rows.forall(r => r._6 >= 0.0 && r._6 <= 1.0),
      "precision bounds")
    assert(rows.head._6 > 0.0,
      "the loosest cutoff holds every truth pair, so precision > 0")
    // consistency with the deployed banded path: the b=1 candidate set
    // verified at the same threshold IS embedNearDupLsh's output
    val lsh = VectorOps.embedNearDupLsh(spark, sfTest).count()
    assert(lsh == loosest._3,
      s"banded path found $lsh pairs vs calibration ${loosest._3}")
    // determinism (md5-seeded hyperplanes, no RNG state)
    val again = VectorOps.srpRecall(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.toSeq == again.toSeq)
  }

  test("media dup rate reconciles per codec with the graded cluster " +
    "output; bounds and determinism hold") {
    import spark.implicits._
    val out = Multimodal.mediaDupRate(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    assert(out.map(_._1).toSet.subsetOf(Set("img", "audio", "video")))
    // independent reconciliation: clusters + per-blob codec from the
    // graded surfaces this report claims to ride
    val blobCodec = Multimodal.hashesOf(
        Multimodal.mediaTable(spark, sfTest)
          .select($"media_id", $"content"))
      .select($"media_id", $"codec").distinct().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clusters = Multimodal.mediaClusters(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    out.foreach { case (codec, nBlobs, nClustered, nClusters, excess,
        rate) =>
      val members = clusters.filter(c => blobCodec(c._2) == codec)
      assert(nBlobs == blobCodec.values.count(_ == codec).toLong)
      assert(nClustered == members.length.toLong,
        s"$codec clustered: $nClustered vs ${members.length}")
      assert(nClusters == members.map(_._1).distinct.length.toLong)
      assert(excess == nClustered - nClusters && excess >= 0)
      assert(rate >= 0.0 && rate <= 1.0 &&
        math.abs(rate - math.rint(excess.toDouble / nBlobs * 1e4) / 1e4)
          < 1e-9)
      // every family keeps one canonical: clustered implies >= 2-sized
      // families, so excess >= nClusters when anything clustered
      if (nClustered > 0) assert(excess >= nClusters)
    }
    val again = Multimodal.mediaDupRate(spark, sfTest).collect()
      .map(_.toString)
    assert(again.toSeq ==
      Multimodal.mediaDupRate(spark, sfTest).collect()
        .map(_.toString).toSeq)
  }

  test("per-label semantic dup-rate reconciles with the graded CC " +
    "output, the label spine is complete with explicit zeros, and the " +
    "rollup matches the media-tier formula") {
    val out = VectorOps.labelDupRate(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val labels = Tables(spark, sfTest, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Number]("label").longValue))
    assert(out.map(_._1).toSeq == labels.map(_._2).distinct.sorted.toSeq,
      "complete ordered label spine")
    val clusters = VectorOps.semanticClustersCell(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1))) // (cluster_id, vec_id)
    val labOf = labels.toMap
    out.foreach { case (label, nVecs, nClustered, nClusters, excess,
        rate) =>
      val members = clusters.filter(c => labOf(c._2) == label)
      assert(nVecs == labels.count(_._2 == label).toLong)
      assert(nClustered == members.length.toLong,
        s"label $label clustered: $nClustered vs ${members.length}")
      assert(nClusters == members.map(_._1).distinct.length.toLong)
      assert(excess == nClustered - nClusters && excess >= 0L)
      assert(math.abs(rate -
        math.rint(excess.toDouble / nVecs * 1e4) / 1e4) < 1e-9)
    }
    assert(out.map(_._3).sum == clusters.length.toLong,
      "clustered-vector conservation across labels")
    assert(VectorOps.labelDupRate(spark, sfTest).collect()
      .map(_.toString).toSeq ==
      out.map { case (a, b, c, d, e, f) => s"[$a,$b,$c,$d,$e,$f]" }.toSeq)
  }

  test("per-label token yield reconciles with the keep-list and the " +
    "corpus token counts; kept mass is a subset; a dup-free label " +
    "yields exactly 1.0") {
    import spark.implicits._
    val out = VectorOps.labelTokenYield(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val toks = Tables(spark, sfTest, "documents").collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("text").split(" ", -1).length.toLong)).toMap
    val labels = Tables(spark, sfTest, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Number]("label").longValue))
    val droppedIds = VectorOps.semanticClustersCell(spark, sfTest)
      .filter(!col("keep")).select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    out.foreach { case (label, nDocs, tTot, nKept, tKept, yld) =>
      val members = labels.filter(_._2 == label).map(_._1)
        .filter(toks.contains)
      assert(nDocs == members.length.toLong)
      assert(tTot == members.map(toks).sum)
      val kept = members.filterNot(droppedIds)
      assert(nKept == kept.length.toLong,
        s"label $label kept: $nKept vs ${kept.length}")
      assert(tKept == kept.map(toks).sum)
      assert(tKept <= tTot && nKept <= nDocs)
      assert(math.abs(yld -
        math.rint(tKept.toDouble / tTot * 1e4) / 1e4) < 1e-9)
      if (members.forall(id => !droppedIds(id)))
        assert(yld == 1.0, s"dup-free label $label must yield 1.0")
    }
    // conservation across labels: dropped token mass = the corpus total
    // minus Σ kept
    assert(out.map(_._3).sum - out.map(_._5).sum ==
      droppedIds.toSeq.filter(toks.contains).map(toks).sum)
    assert(VectorOps.labelTokenYield(spark, sfTest).collect()
      .map(_.toString).toSeq ==
      out.map { case (a, b, c, d, e, f) => s"[$a,$b,$c,$d,$e,$f]" }.toSeq)
  }

  test("post-dedup epoch plan runs the temperature machinery over the " +
    "kept-token masses (driver recompute), allocates the whole " +
    "kept-corpus budget up to share rounding, and keeps the cap " +
    "identities") {
    import spark.implicits._
    val out = VectorOps.epochPlanDedup(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5), r.getLong(6), r.getLong(7))).toSeq
    // parent masses: q_label_token_yield's kept tokens per label
    val kept = VectorOps.labelTokenYield(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toSeq.sortBy(_._1)
    val w6 = kept.map { case (label, tk) =>
      (label, tk, BigDecimal(roundHalfUp(math.pow(tk.toDouble, 0.7), 6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val sumW = w6.map(_._3).sum.toDouble
    val tot = kept.map(_._2).sum
    val expected = w6.map { case (label, tk, w) =>
      val p = roundHalfUp(w.toDouble / sumW, 6)
      val target = math.floor(p * tot).toLong
      (label, tk, p, target,
        if (tk == 0L) 0.0 else roundHalfUp(target.toDouble / tk, 4),
        target > tk * 4, math.min(target, tk * 4),
        math.max(target - tk * 4, 0L))
    }
    assert(out == expected, "plan diverges from the recompute")
    // the plan allocates the whole POST-DEDUP budget up to rounding —
    // the raw-mass q_epoch_plan would allocate Σ tokens_total instead
    assert(math.abs(out.map(_._4).sum - tot) <= out.length)
    out.foreach { case (_, _, _, target, _, capped, eff, short) =>
      assert(capped == (short > 0))
      assert(eff + short == target)
    }
  }

  test("clipScalesOf rejects an out-of-domain clipQ loudly (r17 " +
    "advice): outside (0, 1] the rank matches no row and every dim " +
    "would silently vanish from the scales frame") {
    import spark.implicits._
    for (badQ <- Seq(0.0, -0.5, 1.5)) {
      val e = intercept[IllegalArgumentException] {
        VectorOps.embedQuantizeClip(spark, sfTest, clipQ = badQ).collect()
      }
      assert(e.getMessage.contains("clipQ"), s"$badQ: ${e.getMessage}")
      // the oracle builder mirrors the bound — a desynchronized guard
      // would let an out-of-range oracle "agree" by vacuous emptiness
      val o = intercept[IllegalArgumentException] {
        VectorOps.quantizeRecallClipOracle(clipQ = badQ)
      }
      assert(o.getMessage.contains("clipQ"), s"$badQ: ${o.getMessage}")
    }
  }

  test("percentile-clipped int8: clipQ=1.0 degenerates to the max " +
    "rule, an injected outlier moves the clipped scale to the body " +
    "and is counted by n_sat, and the graded default differs from " +
    "the max rule on the fixture corpus") {
    import spark.implicits._
    // boundary identity: rank ceil(1.0·n) = n = the abs-max element
    assert(VectorOps.embedQuantizeClip(spark, sfTest, clipQ = 1.0)
      .collect().map(_.toString).toSeq ==
      VectorOps.embedQuantize(spark, sfTest).collect()
        .map(_.toString).toSeq)
    // graded default (p99, rank 495 of 500) must actually move at
    // least one dim's scale — the vacuous-clip guard (the r17 reason
    // the default is p99 and not p99.9)
    assert(VectorOps.embedQuantizeClip(spark, sfTest).collect()
      .map(_.toString).toSeq !=
      VectorOps.embedQuantize(spark, sfTest).collect()
        .map(_.toString).toSeq,
      "p99 clip must bite at the graded corpus size")
    // outlier fixture: 100 body values of |x| = 1.0 and one 100.0
    // outlier; p99 rank = ceil(0.99·101) = 100 → scale is the body
    // max (1.0), the body codes to exactly ±127, the outlier clamps
    val dir = java.nio.file.Files
      .createTempDirectory("graft_clip").toString
    val rows = (0 until 100).map(i =>
      (i.toLong, Array(if (i % 2 == 0) 1.0f else -1.0f), i)) :+
      (100L, Array(100.0f), 100)
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val clip = VectorOps.embedQuantizeClip(spark, dir).collect().head
    assert(clip.getDouble(2) == 1.0, s"clipped scale: $clip")
    assert(clip.getLong(3) == 101L,
      s"all 101 rows sit at ±127 under the clipped scale: $clip")
    assert(clip.getDouble(5) == 99.0,
      s"outlier clamp error is |100 − 1.0|: $clip")
    val mx = VectorOps.embedQuantize(spark, dir).collect().head
    assert(mx.getDouble(2) == 100.0 && mx.getLong(3) == 1L,
      s"max rule: outlier owns the scale and alone saturates: $mx")
  }

  test("clip-rule retrieval audit: clipQ=1.0 equals the max-rule " +
    "report, separated families hold recall 1.0 through a biting " +
    "clip, and graded rows are well-formed") {
    import spark.implicits._
    assert(VectorOps.quantizeRecallClip(spark, sfTest, clipQ = 1.0)
      .collect().map(_.toString).toSeq ==
      VectorOps.quantizeRecall(spark, sfTest).collect()
        .map(_.toString).toSeq)
    // scaled-axis families (the quantizeRecall fixture): clipQ=0.9 →
    // rank 11 of 12 live rows → the per-dim scale drops below the
    // family maxima, so the clip genuinely clamps — but dequantized
    // vectors stay on their axes, so within-family cosine stays 1,
    // cross-family 0, and recall holds 1.0
    def axis(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](4); v(i) = s; v
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_qrclip").toString
    val fam = (0 until 3).flatMap { f =>
      (0 until 4).map(j => (f * 50L + j, axis(f, 1.0f + 0.25f * j), f))
    } :+ (150L, new Array[Float](4), 3)
    fam.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val r = VectorOps
      .quantizeRecallClip(spark, dir, k = 3, stride = 50, clipQ = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(r.map(_._1).toSeq == Seq(0L, 50L, 100L))
    assert(r.forall { case (_, nk, rec) => nk == 3L && rec == 1.0 },
      s"separated families must survive a biting clip: ${r.toSeq}")
    val graded = VectorOps.quantizeRecallClip(spark, sfTest).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    assert(graded.length == 10 && graded.forall { case (nk, rec) =>
      nk == 10L && rec >= 0.0 && rec <= 1.0 })
  }

  test("PCA-then-quantize composition: lossless on a zero-mean " +
    "distinct-variance fixture at pcaK = d, graded rows well-formed, " +
    "deterministic, empty corpus stays empty") {
    import spark.implicits._
    // three axis families in 4d, each {+a, −a, +b, −b} so every axis
    // mean is EXACTLY zero (centering is a no-op) with distinct
    // per-axis variances (eigenvalues distinct → the sign-canonical
    // Jacobi basis is the axis set, so projection at pcaK = d is a
    // coordinate permutation): cosines survive the rotation exactly,
    // int8's ≤0.4% error cannot flip a +1/0/−1 ranking, and the sim
    // ties at 0 break by vec_id identically on both sides → recall 1.0
    def axis(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](4); v(i) = s; v
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pcaq").toString
    val fam = (0 until 3).flatMap { f =>
      val s = 1.0f + f // distinct family scale → distinct eigenvalue
      Seq((f * 50L + 0, axis(f, s)), (f * 50L + 1, axis(f, -s)),
        (f * 50L + 2, axis(f, 1.25f * s)),
        (f * 50L + 3, axis(f, -1.25f * s)))
    }
    fam.map { case (id, v) => (id, v, (id / 50).toInt) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val r = VectorOps
      .pcaQuantizeRecall(spark, dir, pcaK = 4, k = 3, stride = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(r.map(_._1).toSeq == Seq(0L, 50L, 100L), s"anchors: ${r.toSeq}")
    assert(r.forall { case (_, nk, rec) => nk == 3L && rec == 1.0 },
      s"zero-mean rotation + int8 must be lossless here: ${r.toSeq}")
    // graded shape: bounds + determinism on the fixture corpus
    val g = VectorOps.pcaQuantizeRecall(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(g.nonEmpty && g.forall { case (_, nk, ov, rec) =>
      ov <= nk && rec >= 0.0 && rec <= 1.0 })
    assert(VectorOps.pcaQuantizeRecall(spark, sfTest).collect()
      .map(_.toString).toSeq ==
      g.map { case (a, b, c, d) => s"[$a,$b,$c,$d]" }.toSeq)
    val dir0 = java.nio.file.Files
      .createTempDirectory("graft_pcaq0").toString
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir0/embeddings.parquet")
    assert(VectorOps.pcaQuantizeRecall(spark, dir0).count() == 0L)
  }

  test("int8 quantization audit obeys the theory bounds: every dim " +
    "saturates at its abs-max element, error <= scale/254, the " +
    "zero-scale dim quantizes to zero with zero error, and a hand " +
    "round-trip lands exactly") {
    import spark.implicits._
    val out = VectorOps.embedQuantize(spark, sfTest).collect()
    assert(out.length == 64 && out.map(_.getLong(0)).toSeq ==
      (0L until 64L), "one row per dim, ordered")
    val nVecs = Tables(spark, sfTest, "embeddings").count()
    out.foreach { r =>
      val (n, scale) = (r.getLong(1), r.getDouble(2))
      val (nSat, nZero) = (r.getLong(3), r.getLong(4))
      val (mx, mean, mse) =
        (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(n == nVecs, "element count conserves the corpus")
      // the abs-max element maps to exactly +-127 — every live dim
      // saturates at least once; nothing else can exceed it
      assert(scale > 0.0 && nSat >= 1L && nSat + nZero <= n)
      // round-to-nearest on a scale/127 grid: error is bounded by half
      // a step, saturation included (|x| <= scale by construction)
      assert(mx <= scale / 254.0 + 1e-12,
        s"dim ${r.getLong(0)}: max err $mx vs half-step ${scale / 254}")
      assert(mean >= 0.0 && mean <= mx + 1e-9 && mse <= mx * mx + 1e-12)
    }
    // hand round-trip: dim0 {1.0, 0.4} -> q {127, 51}, dq {1, 51/127};
    // dim1 constant-zero -> scale 0, all-zero, zero error
    val hand = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.4f, 0.0f)))
      .toDF("vec_id", "embedding")
    val h = VectorOps.embedQuantizeFrom(hand).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d0 = h(0L)
    assert(d0.getDouble(2) == 1.0 && d0.getLong(3) == 1L,
      s"dim0 scale/sat: $d0")
    val expErr = math.abs(0.4f.toDouble - 51.0 / 127.0)
    assert(math.abs(d0.getDouble(5) - expErr) < 1e-12 &&
      math.abs(d0.getDouble(6) - expErr / 2) < 1e-9,
      s"dim0 err: $d0 vs $expErr")
    val d1 = h(1L)
    assert(d1.getDouble(2) == 0.0 && d1.getLong(3) == 0L &&
      d1.getLong(4) == 2L && d1.getDouble(5) == 0.0 &&
      d1.getDouble(6) == 0.0 && d1.getDouble(7) == 0.0,
      s"zero-scale dim: $d1")
    // deterministic
    assert(VectorOps.embedQuantize(spark, sfTest).collect().map(_.toString)
      .toSeq == out.map(_.toString).toSeq)
  }

  test("int8 retrieval-impact audit: the anchor slice, recall bounds, " +
    "well-separated families hold recall 1.0 through quantization, " +
    "and zero-norm vectors are excluded from both sides") {
    import spark.implicits._
    val out = VectorOps.quantizeRecall(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == (0L until 500L by 50L).toSeq,
      "one row per stride anchor, ordered")
    out.foreach { case (q, nk, ov, rec) =>
      assert(nk == 10L && ov >= 0L && ov <= nk &&
        math.abs(rec - ov.toDouble / nk) < 1e-9,
        s"anchor $q: nk=$nk ov=$ov rec=$rec")
    }
    // well-separated geometry survives int8: three scaled-axis
    // families (within-family cosine 1, cross-family 0) — the <=0.4%
    // quantization error cannot flip a 1-vs-0 ranking, so every
    // anchor's top-k is its own family under BOTH variants; the zero
    // vector sits ON an anchor id and must be excluded, not crash
    def axis(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](4); v(i) = s; v
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_qrecall").toString
    val fam = (0 until 3).flatMap { f =>
      (0 until 4).map(j => (f * 50L + j, axis(f, 1.0f + 0.25f * j), f))
    } :+ (150L, new Array[Float](4), 3) // zero-norm on an anchor id
    fam.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val r = VectorOps.quantizeRecall(spark, dir, k = 3, stride = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(r.map(_._1).toSeq == Seq(0L, 50L, 100L),
      s"zero-norm anchor must be excluded: ${r.toSeq}")
    assert(r.forall { case (_, nk, rec) => nk == 3L && rec == 1.0 },
      s"separated families must hold recall 1.0: ${r.toSeq}")
    // deterministic
    assert(VectorOps.quantizeRecall(spark, sfTest).collect()
      .map(_.toString).toSeq ==
      out.map { case (a, b, c, d) => s"[$a,$b,$c,$d]" }.toSeq)
    // degenerate live anchor (r16 advice): one live vector on the
    // anchor stride and no OTHER live corpus vector — must surface as
    // an explicit n_k = 0 row (recall defined 0.0), distinguishable
    // from the zero-norm EXCLUSION above, not vanish from the report
    val lone = java.nio.file.Files
      .createTempDirectory("graft_qrecall1").toString
    Seq((0L, axis(0, 1.0f), 0), (3L, new Array[Float](4), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$lone/embeddings.parquet")
    val lr = VectorOps.quantizeRecall(spark, lone, k = 3, stride = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(lr.toSeq == Seq((0L, 0L, 0L, 0.0)),
      s"degenerate anchor must report n_k = 0, got: ${lr.toSeq}")
  }

  test("IVF balance audit: corpus conserved at primary assignment, " +
    "shares sum to 1, the saturation law holds, and a sparse corpus " +
    "surfaces empty cells as zero rows") {
    import spark.implicits._
    val out = VectorOps.ivfBalance(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val nVecs = Tables(spark, sfTest, "embeddings").count()
    assert(out.map(_._2).sum == nVecs,
      "primary assignment partitions the corpus exactly")
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-2 &&
      math.abs(out.map(_._4).sum - 1.0) < 1e-2, "shares sum to 1")
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted.reverse,
      "hot cells first")
    // pigeonhole: the hottest cell carries at least the mean pair-cost
    // share — the saturation-law floor the audit is read against
    assert(out.head._4 >= 1.0 / out.length - 1e-9)
    assert(out.map(_._1).toSet.size == out.length, "one row per cell")
    // a corpus with 2 tight families under a 4-cell quantizer leaves
    // dead capacity VISIBLE: exactly the empty-cell zero rows
    def axis(i: Int, s: Float): Array[Float] = {
      val v = new Array[Float](4); v(i) = s; v
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfbal").toString
    ((0 until 6).map(j => (j.toLong, axis(0, 1f + j * 0.01f), 0)) ++
      (0 until 6).map(j => (10L + j, axis(1, 1f + j * 0.01f), 1)))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val sparse = VectorOps.ivfBalance(spark, dir, nlist = 4).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    assert(sparse.length == 4 && sparse.map(_._1).sum == 12L,
      s"4 rows, 12 vectors: ${sparse.toSeq}")
    assert(sparse.count(_._1 == 0L) >= 1,
      s"dead cells must surface as zero rows: ${sparse.toSeq}")
    assert(sparse.filter(_._1 == 0L).forall(_._2 == 0.0))
    // requested nlist above the training corpus (r16 advice): autoCells
    // floors at 16 but 12 points train only 12 centroids — the spine is
    // the TRAINED cell count, so no phantom empty cells skew the
    // 1/nlist balance yardstick
    val auto = VectorOps.ivfBalance(spark, dir).collect()
    assert(auto.length == 12,
      s"spine must be trained cells (12), got ${auto.length} rows")
    assert(auto.map(_.getLong(1)).sum == 12L)
    // deterministic
    assert(VectorOps.ivfBalance(spark, sfTest).collect().map(_.toString)
      .toSeq == out.map { case (a, b, c, d) => s"[$a,$b,$c,$d]" }.toSeq)
  }

  test("embedding PCA of an empty corpus is an empty spectrum, not a " +
    "head/reduce crash") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pca0").toString
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val out = VectorOps.embeddingPca(spark, dir)
    assert(out.columns.toSeq ==
      Seq("component", "eigenvalue", "explained_var", "cum_explained"))
    assert(out.count() == 0L)
  }

  test("Q3/Q5/Q6/Q10 shapes reconcile against local recomputes and keep " +
    "their rank/pushdown contracts") {
    import spark.implicits._
    // UTC-pinned epoch millis: Timestamp.valueOf uses the JVM default
    // zone, which would shift the date boundaries off-UTC hosts while
    // the Spark side (session TZ = UTC) would not
    def utcMs(d: String) = java.time.Instant.parse(d + "T00:00:00Z")
      .toEpochMilli
    val cutoffMs = utcMs("1996-06-01")
    val orders = Tables(spark, sfTest, "orders")
      .select($"o_orderkey", $"o_custkey",
        $"o_orderdate".cast("timestamp").cast("long") * 1000,
        $"o_orderpriority")
      .as[(Long, Long, Long, String)].collect()
    val custSeg = Tables(spark, sfTest, "customer")
      .select($"c_custkey", $"c_mktsegment").as[(Long, String)]
      .collect().toMap
    val li = Tables(spark, sfTest, "lineitem")
      .select($"l_orderkey", $"l_shipdate".cast("timestamp").cast("long")
        * 1000, $"l_extendedprice", $"l_discount", $"l_returnflag")
      .as[(Long, Long, Double, Double, String)].collect()
    // Q3: outstanding revenue per qualifying order, exact-decimal rank
    val om = orders.map(o => o._1 -> o).toMap
    val q3 = li.filter { r =>
      val o = om(r._1)
      r._2 > cutoffMs && o._3 < cutoffMs &&
        custSeg(o._2) == "BUILDING"
    }.groupBy(_._1).map { case (ok, g) =>
      (ok, g.map(r => rev2(r._3, r._4)).sum)
    }.toSeq.sortBy { case (ok, r) => (-r, ok) }.take(10)
      .map { case (ok, r) =>
        (ok, r.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong) }
    val gotQ3 = Relational.unshippedOrders(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gotQ3 == q3, s"Q3 rank diverges: $gotQ3 vs $q3")
    // Q3/Q10 must rank via TakeOrdered heaps, not a global sort+limit
    for (q <- Seq("q_unshipped_orders", "q_returned_customers")) {
      val p = graft.SparkEntry.queries(q)(spark, sfTest)
        .queryExecution.executedPlan.toString
      assert(p.contains("TakeOrderedAndProject"), s"$q lost TakeOrdered")
    }
    // Q6: pure pushdown aggregate — every predicate in PushedFilters,
    // and the value reconciles
    val q6 = li.filter(r => r._2 >= utcMs("1996-01-01") &&
        r._2 < utcMs("1997-01-01"))
      .filter(r => r._4 >= 0.05 - 1e-9 && r._4 <= 0.07 + 1e-9)
    // quantity needs its own pull (not collected above) — reconcile via
    // the query's own count against an independent Spark filter count
    val nQ6 = Tables(spark, sfTest, "lineitem")
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01"
        && $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24).count()
    val gotQ6 = Relational.revenueForecast(spark, sfTest).collect().head
    assert(gotQ6.getLong(1) == nQ6)
    assert(gotQ6.getLong(1) <= q6.length)
    val scans6 = Relational.revenueForecast(spark, sfTest)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    val pushed6 = scans6.head.metadata("PushedFilters")
    Seq("l_shipdate", "l_discount", "LessThan(l_quantity,24")
      .foreach(f => assert(pushed6.contains(f), s"Q6 predicate not pushed: $f"))
    // Q5: every reported nation is in the region and revenue is the
    // local-flow (cust nation == supp nation) rollup — cross-checked via
    // an independent SQL formulation
    Tables(spark, sfTest, "lineitem").createOrReplaceTempView("v_li")
    Tables(spark, sfTest, "orders").createOrReplaceTempView("v_o")
    Tables(spark, sfTest, "customer").createOrReplaceTempView("v_c")
    Tables(spark, sfTest, "supplier").createOrReplaceTempView("v_s")
    Tables(spark, sfTest, "nation").createOrReplaceTempView("v_n")
    Tables(spark, sfTest, "region").createOrReplaceTempView("v_r")
    val ind = spark.sql(
      """SELECT n_name, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |  * CAST(1 - l_discount AS DECIMAL(4,2)))) AS LONG) AS revenue
        |FROM v_li JOIN v_o ON l_orderkey = o_orderkey
        |JOIN v_c ON o_custkey = c_custkey
        |JOIN v_s ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN v_n ON c_nationkey = n_nationkey
        |JOIN v_r ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= '1996-01-01'
        |  AND o_orderdate < '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val gotQ5 = Relational.localSupplierVolume(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(gotQ5 == ind, s"Q5 diverges from the SQL formulation")
    // Q10: top-k rank reconciles on the returned-revenue rollup
    val q10 = li.filter(r => r._5 == "R").filter { r =>
      val o = om(r._1)
      o._3 >= utcMs("1996-01-01") && o._3 < utcMs("1996-07-01")
    }.groupBy(r => om(r._1)._2).map { case (ck, g) =>
      (ck, g.map(r => rev2(r._3, r._4)).sum)
    }.toSeq.sortBy { case (ck, r) => (-r, ck) }.take(20)
      .map { case (ck, r) =>
        (ck, r.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong) }
    val gotQ10 = Relational.returnedCustomers(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(gotQ10 == q10, s"Q10 rank diverges")
  }

  test("span-corruption plan: spans stay inside their windows, never " +
    "overlap, hit the target rate, and are deterministic") {
    import spark.implicits._
    val out = TextOps.spanCorruption(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, w, start, len) =>
      assert(len >= 2 && len <= 4, s"span length $len out of 2..4")
      assert(start >= w * 20 && start + len <= (w + 1) * 20,
        s"span [$start, ${start + len}) escapes window $w")
    }
    // windowed placement = structural non-overlap: one span per window
    assert(out.groupBy(t => (t._1, t._2)).forall(_._2.size == 1))
    // global coverage near the 15% target (mean span 3 of window 20);
    // tail tokens past the last full window are unmasked by design
    val masked = out.map(_._4).sum.toDouble
    val windowTokens = out.groupBy(_._1).map(_._2.size).sum * 20.0
    assert(math.abs(masked / windowTokens - 0.15) < 0.02,
      s"coverage ${masked / windowTokens}")
    // spans within a doc are sorted and non-overlapping globally too
    out.groupBy(_._1).values.foreach { g =>
      val spans = g.sortBy(_._2).map(t => (t._3, t._3 + t._4)).toSeq
      spans.sliding(2).foreach { pair =>
        if (pair.size == 2) assert(pair(0)._2 <= pair(1)._1)
      }
    }
    val again = TextOps.spanCorruption(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == again.toSeq)
  }

  test("activity gini matches the local formula, bounds hold, and the " +
    "synthetic extremes order correctly") {
    import spark.implicits._
    val counts = Tables(spark, sfTest, "events")
      .groupBy($"event_type", $"user_id").count()
      .as[(String, Long, Long)].collect()
    val expected = counts.groupBy(_._1).map { case (t, g) =>
      val xs = g.map(r => (r._3, r._2)).sortBy(identity).map(_._1)
      val n = xs.length.toLong
      val tot = xs.sum
      val s = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (t, n, tot, BigDecimal(2.0 * s / (n.toDouble * tot) - (n + 1.0) / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val out = Events.activityGini(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(out == expected, "gini diverges from local recompute")
    assert(out.forall { case (_, _, _, g) => g >= 0.0 && g < 1.0 })
    // synthetic extremes: uniform traffic ≈ 0; one whale dominates → high
    val dir = java.nio.file.Files.createTempDirectory("graft_gini").toString
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val uniform = (1 to 40).map(u =>
      (u.toLong * 10, ts, u.toLong, "flat", 1.0, "{}"))
    val whale = (1 to 39).map(u =>
      (1000L + u, ts, u.toLong, "whale", 1.0, "{}")) ++
      (1 to 61).map(i => (2000L + i, ts, 40L, "whale", 1.0, "{}"))
    (uniform ++ whale)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val syn = Events.activityGini(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(syn("flat") == 0.0, s"uniform gini ${syn("flat")}")
    assert(syn("whale") > 0.5, s"whale gini ${syn("whale")}")
    // the binned swap-in tracks the exact form within its quarter-log
    // resolution on fixture AND synthetic data (the 100 TB accuracy
    // contract), and agrees exactly on the user/event totals
    val binned = Events.activityGiniBinned(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(binned.map(t => (t._1, t._2, t._3)).toSeq ==
      out.map(t => (t._1, t._2, t._3)).toSeq)
    binned.zip(out).foreach { case ((t, _, _, gb), (_, _, _, ge)) =>
      assert(math.abs(gb - ge) <= 0.01,
        s"$t: binned $gb vs exact $ge exceeds the resolution bound")
    }
    val synB = Events.activityGiniBinned(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(synB("flat") == 0.0)
    assert(synB("whale") > 0.5)
  }

  test("audience overlap: engaged cut, symmetric-free pairs, jaccard " +
    "reconciles with local set arithmetic") {
    import spark.implicits._
    val engaged = Tables(spark, sfTest, "events")
      .groupBy($"user_id", $"event_type").count()
      .filter($"count" >= Events.DefaultEngagedMin)
      .select($"user_id", $"event_type")
      .as[(Long, String)].collect()
      .groupBy(_._2).map { case (t, g) => t -> g.map(_._1).toSet }
    val expected = (for {
      (ta, ua) <- engaged; (tb, ub) <- engaged if ta < tb
      inter = (ua & ub).size if inter > 0
    } yield (ta, tb, inter.toLong, ua.size.toLong, ub.size.toLong,
      BigDecimal(inter.toDouble / (ua.size + ub.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSeq.sortBy(t => (t._1, t._2))
    val out = Events.audienceOverlap(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(out == expected, "overlap diverges from local set arithmetic")
    assert(out.nonEmpty && out.forall(t => t._6 > 0.0 && t._6 <= 1.0))
  }

  test("event paths count exact 3-step sequences in per-user event-time " +
    "order") {
    import spark.implicits._
    val byUser = Tables(spark, sfTest, "events")
      .select($"user_id", $"ts".cast("timestamp").cast("long"), $"event_id",
        $"event_type")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
      .withDefaultValue(0L)
    byUser.values.foreach { g =>
      val seq = g.sortBy(e => (e._2, e._3)).map(_._4)
      seq.sliding(3).filter(_.size == 3)
        .foreach(t => counts(t.mkString(">")) += 1)
    }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val out = Events.eventPaths(spark, sfTest).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == expected, "paths diverge from local recompute")
    assert(out.size == 20)
  }

  test("round-15 batch: blocking suppliers match the local double-" +
    "correlation recompute; shingle-df bands reconcile; context-fill " +
    "and norm rollups conserve their totals") {
    import spark.implicits._
    // q_blocking_suppliers ≡ a SQL-free local recompute of the Q21 rule
    val li = Tables(spark, sfTest, "lineitem")
      .join(Tables(spark, sfTest, "orders"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > date_add($"o_orderdate", 90)).as("late"))
      .as[(Long, Long, Boolean)].collect()
    val perOs = li.groupBy(t => (t._1, t._2))
      .map { case ((o, sp), xs) => (o, sp, xs.exists(_._3)) }.toSeq
    val soleLate = perOs.groupBy(_._1).collect {
      case (_, sups) if sups.size >= 2 && sups.count(_._3) == 1 =>
        sups.find(_._3).get._2
    }
    val expected = soleLate.groupBy(identity)
      .map { case (sp, xs) => sp -> xs.size.toLong }
    val got = Relational.blockingSuppliers(spark, sfTest).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected, s"got $got exp $expected")
    // q_shingle_df: bands partition the df table — totals reconcile
    // against the shared shingle rule recomputed locally
    val dfs = Tables(spark, sfTest, "documents")
      .select($"text").as[String].collect()
      .flatMap(t => DedupOps.shingleSet(t))
      .groupBy(identity).map(_._2.size.toLong).toSeq
    val dfProfile = DedupOps.shingleDfProfile(spark, sfTest)
    // pair_cost ACCUMULATES in DECIMAL(38,0) (huge-df overflow honesty,
    // r16 advice) but the REPORTING boundary is BIGINT — an emitted
    // decimal parquet column loads as pandas object-Decimal and
    // hash-splits at the driver even when values are identical (the r16
    // q_shingle_df regression); pin the boundary type both ways
    assert(dfProfile.schema("pair_cost").dataType ==
      org.apache.spark.sql.types.LongType,
      s"pair_cost boundary must be BIGINT: ${dfProfile.schema("pair_cost")}")
    graft.Verify.lintGradedSchema("q_shingle_df", dfProfile.schema)
    val bands = dfProfile.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bands.map(_._2).sum == dfs.size.toLong)
    assert(bands.map(_._3).sum == dfs.sum)
    assert(bands.map(_._4).sum == dfs.map(d => d * (d - 1) / 2).sum)
    assert(bands.map(_._1).toSeq == bands.map(_._1).sorted.toSeq)
    // q_context_fill conserves the doc count
    val nDocs = Tables(spark, sfTest, "documents")
      .filter(size(split($"text", " ")) > 0).count()
    val cf = TextOps.contextFill(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cf.map { case (d, n) => d * n }.sum == nDocs)
    assert(cf.forall(_._1 >= 1))
    // q_embedding_norms conserves the vector count; norms are sane
    val en = VectorOps.embeddingNorms(spark, sfTest).collect()
    assert(en.map(_.getLong(1)).sum ==
      Tables(spark, sfTest, "embeddings").count())
    assert(en.forall(_.getLong(2) == 0L), "fixture corpus has no anomalies")
    en.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= r.getDouble(4))
      assert(r.getDouble(5) >= r.getDouble(3) - 1e-9 &&
        r.getDouble(5) <= r.getDouble(4) + 1e-9)
    }
    // the anomaly guard catches exactly the audit's target inputs —
    // NaN / Inf / exploded (norm > 1e9) / empty vectors go NULL and
    // count in n_bad in BOTH engines (DECIMAL accumulation would have
    // overflowed engine-divergently on these — the r15 review finding)
    val bad = Seq(
      (0L, Array(1.0f, 2.0f)), // healthy
      (0L, Array(Float.NaN, 1.0f)),
      (0L, Array(Float.PositiveInfinity)),
      (0L, Array(1e10f, 1.0f)), // exploded: sumsq > 1e18
      (0L, Array.empty[Float]))
      .toDF("label", "embedding")
    val br = VectorOps.embeddingNormsFrom(bad).collect().head
    assert(br.getLong(1) == 5L && br.getLong(2) == 4L,
      s"anomaly guard: $br")
    assert(math.abs(br.getDouble(3) - math.sqrt(5.0)) < 1e-6 &&
      br.getDouble(3) == br.getDouble(4),
      "the one healthy norm survives as min=max")
    // q_cluster_purity laws: rides the graded cluster output exactly —
    // same cluster ids and sizes; majority share in (0, 1]; the
    // majority label really is the per-cluster mode with min-label ties
    // plan pins for the round-15 shapes — the load-bearing perf claims,
    // durable against future rewrites:
    // blocking suppliers: ONE fact scan (the first cut scanned lineitem
    // twice through the duplicated (order,supplier) chain), no
    // sort-merge join (supplier broadcasts), the collect_set aggregate
    // form
    val pBlock = Relational.blockingSuppliers(spark, sfTest)
      .queryExecution.executedPlan
    val pBlockS = pBlock.toString
    val liScans = pBlock.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.toString.contains("lineitem") => f
    }
    assert(liScans.size == 1,
      s"blocking suppliers must scan the fact table ONCE, saw ${liScans.size}")
    assert(!pBlockS.contains("SortMergeJoin"),
      "blocking suppliers regressed to a sort-merge self-join")
    assert(pBlockS.contains("collect_set"),
      "blocking suppliers lost the single-exchange collect_set form")
    // embedding norms: the Σx² folds INSIDE the row — no Generate
    // (posexplode) and no Window may appear, and embeddings scans once
    val pNorm = VectorOps.embeddingNorms(spark, sfTest)
      .queryExecution.executedPlan
    val pNormS = pNorm.toString
    assert(!pNormS.contains("Generate") && !pNormS.contains("Window"),
      "embedding norms must fold per-row, not explode or window")
    assert(pNorm.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.size == 1, "embedding norms must scan embeddings exactly once")
    // shingle-df: the one shingle-width shuffle the dedup family pays —
    // documents scans once
    assert(DedupOps.shingleDfProfile(spark, sfTest)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.size == 1, "shingle-df must scan documents exactly once")
    val purity = VectorOps.clusterPurity(spark, sfTest).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val clusters = VectorOps.semanticClustersCell(spark, sfTest).collect()
      .map(r => (r.getLong(1), r.getLong(0))) // (vec_id, cluster_id)
    val labels = Tables(spark, sfTest, "embeddings").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Number]("label").longValue)).toMap
    val expect = clusters.groupBy(_._2).map { case (cid, members) =>
      val ls = members.map(m => labels(m._1))
      val (top, cnt) = ls.groupBy(identity)
        .map { case (l, xs) => (l, xs.size) }
        .minBy { case (l, c) => (-c, l) }
      (cid, ls.size.toLong, top, cnt.toLong,
        math.rint(cnt.toDouble / ls.size * 1e4) / 1e4)
    }.toSeq.sortBy(_._1)
    assert(purity.toSeq == expect, s"purity diverges from local mode")
    assert(purity.forall(p => p._5 > 0.0 && p._5 <= 1.0 && p._4 <= p._2))
  }
}
