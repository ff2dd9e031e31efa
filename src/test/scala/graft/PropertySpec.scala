package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sinks.Sinks

/** Property tests for algebraic laws (SURVEY.md §5.2). Uses ScalaCheck
  * generators with a fixed seed and a manual sampling loop (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  private val vecGen: Gen[Array[Double]] =
    Gen.listOfN(16, Gen.choose(-10.0, 10.0)).map(_.toArray)
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("cosine: bounds, self-similarity, positive-scale invariance") {
    val vs = samples(Gen.zip(vecGen, vecGen, Gen.choose(0.1, 100.0)), 200)
    assert(vs.size > 150)
    vs.foreach { case (a, b, c) =>
      val s = cosine(a, b)
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
      assert(math.abs(cosine(a, a) - 1.0) < 1e-9)
      assert(math.abs(cosine(a, b.map(_ * c)) - s) < 1e-9,
        "cosine must be invariant under positive scaling")
    }
  }

  test("session gap-split law: session count = 1 + number of big gaps") {
    val tsGen = Gen.nonEmptyListOf(Gen.choose(0L, 6L * 3600)).map(_.sorted)
    samples(tsGen, 200).foreach { ts =>
      val gap = 1800L
      val expected = 1 + ts.zip(ts.tail).count { case (a, b) => b - a > gap }
      // reference sessionizer mirroring Windows.sessionize's law
      var sessions = 1
      var prev = ts.head
      ts.tail.foreach { t => if (t - prev > gap) sessions += 1; prev = t }
      assert(sessions == expected)
    }
  }

  test("jaccard: bounds, identity, symmetry on token sets") {
    val setGen = Gen.nonEmptyListOf(Gen.choose(0, 50)).map(_.toSet)
    samples(Gen.zip(setGen, setGen), 200).foreach { case (a, b) =>
      val j = (a intersect b).size.toDouble / (a union b).size
      assert(j >= 0.0 && j <= 1.0)
      assert((a intersect a).size.toDouble / (a union a).size == 1.0)
      assert(j == (b intersect a).size.toDouble / (b union a).size)
    }
  }

  test("TopKAggregator: equals sort-take on any input, any partitioning") {
    import spark.implicits._
    import graft.functions.TopKAggregator
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 500L), Gen.choose(-1000.0, 1000.0)))
    samples(rowsGen, 8).foreach { rows =>
      val k = 5
      val expected = rows.sortBy { case (id, s) => (-s, id) }.take(k)
      // distributed path across 4 partitions → partial heaps must merge
      // to the same answer
      val got = rows.toDS().repartition(4)
        .select(new TopKAggregator(k).toColumn)
        .head()
      assert(got == expected, s"topk mismatch: $got vs $expected")
    }
    // tie regression: equal scores must resolve by id regardless of
    // arrival order / partitioning (the reduce fast path once dropped
    // equal-score lower-id elements)
    val ties = List((9L, 0.5), (3L, 0.5), (7L, 0.5))
    val gotTies = ties.toDS().repartition(3)
      .select(new TopKAggregator(1).toColumn).head()
    assert(gotTies == Seq((3L, 0.5)), s"tie-break broken: $gotTies")
  }

  test("sequence packing: bucketed prefix sum is exact on any corpus shape") {
    import spark.implicits._
    import java.nio.file.Files
    // random corpora: sparse, duplicate-free random doc ids (buckets of
    // wildly different fills, including empty ones) with random token
    // counts — the law is pure prefix-sum contiguity in doc_id order
    val corpusGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 4000L), Gen.choose(1, 60)))
      .map(_.toMap.toList) // dedup ids
    samples(corpusGen, 6).foreach { docs =>
      val dir = Files.createTempDirectory("graft_packprop").toString
      docs.map { case (id, n) =>
        (id, (1 to n).map(i => s"t$i").mkString(" "), "en", "s0", 0L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.operators.TextOps
        .packSequences(spark, dir, context = 64L, bucketSize = 128L)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val expected = docs.sortBy(_._1)
        .scanLeft((0L, 0L)) { case ((_, off), (id, n)) => (id, off + n) }
      // scanLeft pairs each doc with the offset BEFORE it
      val offs = docs.sortBy(_._1).map(_._1)
        .zip(expected.map(_._2).init)
      assert(got.toSeq == offs,
        s"prefix sum diverges on ${docs.size} docs")
    }
  }

  test("salted join law: row-identical to the plain join for any salt " +
    "count and key histogram") {
    import spark.implicits._
    // skewed key generators: a hot key plus a long tail, arbitrary sizes
    val sideGen = Gen.zip(
      Gen.listOfN(60, Gen.frequency((5, Gen.const(1L)),
        (2, Gen.choose(1L, 8L)))),
      Gen.listOfN(12, Gen.choose(1L, 8L)))
    samples(Gen.zip(sideGen, Gen.choose(1, 7)), 12).foreach {
      case ((lKeys, rKeys), salts) =>
        val left = lKeys.zipWithIndex.map { case (k, i) => (k, s"l$i") }
          .toDF("key", "lv")
        val right = rKeys.zipWithIndex.map { case (k, i) => (k, s"r$i") }
          .toDF("key", "rv")
        val plain = left.join(right, "key")
          .select("key", "lv", "rv").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .sorted.toSeq
        val salted = graft.operators.SkewOps
          .saltedJoin(left, right, "key", salts)
          .select("key", "lv", "rv").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .sorted.toSeq
        assert(salted == plain,
          s"salts=$salts changed the join result (plain ${plain.size} " +
            s"rows, salted ${salted.size})")
    }
  }

  test("substring dup law: equals brute force on any corpus, any k") {
    import spark.implicits._
    // tiny vocabulary → dense span collisions; doc lengths straddle k so
    // the too-short path, within-doc-only repeats (e.g. "a a a a"), and
    // cross-doc sharing all occur across the samples
    val vocab = Vector("a", "b", "c", "d")
    val docGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.zip(
      Gen.choose(3, 9).flatMap(nd => Gen.listOfN(nd, docGen)),
      Gen.choose(2, 4)) // k
    samples(corpusGen, 20).foreach { case (texts, k) =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = {
        val grams = corpus.map { case (id, text) =>
          val ts = text.toLowerCase.split(" ", -1)
          id -> (if (ts.length < k) Array.empty[String]
                 else ts.sliding(k).map(_.mkString(" ")).toArray)
        }
        val docsOf = grams.flatMap { case (id, gs) =>
          gs.distinct.map(_ -> id)
        }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).distinct.size }
        grams.flatMap { case (id, gs) =>
          val dup = gs.count(g => docsOf(g) > 1)
          if (dup == 0) None
          else Some((id, gs.length.toLong, dup.toLong,
            BigDecimal(dup.toDouble / gs.length)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }.sortBy(_._1)
      }
      val got = graft.operators.DedupOps
        .substringDupFrom(corpus.toDF("doc_id", "text"), k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(got == expected,
        s"k=$k corpus=${texts.take(4)}…: got $got expected $expected")
    }
  }

  test("containment matrix law: equals set arithmetic on any corpus; " +
    "diagonal excluded, shared symmetric, containment in [0,1]") {
    import spark.implicits._
    // small vocab + short docs → heavy cross-source shingle sharing AND
    // sources with empty shingle sets (docs under 3 tokens) both occur
    val vocab = Vector("a", "b", "c")
    val docGen = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.choose(4, 10).flatMap(nd =>
      Gen.listOfN(nd, Gen.zip(docGen, Gen.oneOf("s0", "s1", "s2"))))
    samples(corpusGen, 15).foreach { texts =>
      val corpus = texts.zipWithIndex.map { case ((t, src), i) =>
        (i.toLong, t, src) }
      // brute force: 3-gram shingle SETS per source, pairwise overlap
      def sh(t: String): Set[String] = {
        val ts = t.split(' ').filter(_.nonEmpty)
        if (ts.length < 3) Set.empty
        else ts.sliding(3).map(_.mkString(" ")).toSet
      }
      val bySrc = corpus.groupBy(_._3).map { case (src, ds) =>
        src -> ds.map(d => sh(d._2)).fold(Set.empty)(_ ++ _) }
      // the spine is sources WITH >=1 shingle (n_a would be 0 otherwise
      // and the query's totals table has no row to join)
      val live = bySrc.filter(_._2.nonEmpty)
      val expected = (for {
        a <- live.keys; b <- live.keys if a != b
      } yield {
        val shared = (live(a) intersect live(b)).size.toLong
        (a, b, shared, live(a).size.toLong,
          BigDecimal(shared.toDouble / live(a).size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }).toSeq.sortBy(x => (x._1, x._2))
      val got = graft.operators.DedupOps
        .sourceContainmentFrom(corpus.toDF("doc_id", "text", "source"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
      assert(got == expected, s"corpus=${corpus.take(4)}…:\n got " +
        s"$got\n exp $expected")
      // laws on the output itself
      val sharedOf = got.map(x => (x._1, x._2) -> x._3).toMap
      got.foreach { case (a, b, shr, na, c) =>
        assert(a != b, "diagonal leaked")
        assert(sharedOf((b, a)) == shr, "shared not symmetric")
        assert(c >= 0.0 && c <= 1.0 && shr <= na)
      }
    }
  }

  test("dup inflation law: equals union-find brute force on any corpus; " +
    "inflation >= 1, NULL when a source's whole volume is removable") {
    import spark.implicits._
    // tiny vocab + repeated docs → real near-dup clusters at the
    // default 0.5 Jaccard; sources attribute the chars
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.choose(3, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.choose(5, 10).flatMap(nd =>
      Gen.listOfN(nd, Gen.zip(docGen, Gen.oneOf("s0", "s1"))))
    // the denominator-zero corpus: every "mirror" doc is an exact copy
    // of a lower-id "orig" doc, so the min-id canonical always lives in
    // orig and mirror loses ALL its chars → inflation must be NULL (the
    // round-15 advice case; Infinity would differ-split the engines)
    val mirrorCorpus: List[(String, String)] = List(
      ("aa bb cc dd ee", "orig"), ("aa bb cc dd ee", "mirror"),
      ("ff aa bb cc dd", "orig"), ("ff aa bb cc dd", "mirror"))
    (samples(corpusGen, 8) :+ mirrorCorpus).foreach { texts =>
      val corpus = texts.zipWithIndex.map { case ((t, src), i) =>
        (i.toLong, t, src, t.length.toLong) }
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dinf").toString
      corpus.map { case (id, t, src, nc) => (id, t, "en", src, nc) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      // brute force, mirroring the dedup rule exactly: 3-gram shingle
      // sets, df-capped postings, Jaccard over KEPT sizes >= 0.5,
      // union-find, min-id canonical keeps its chars
      def sh(t: String): Set[String] = {
        val ts = t.split(' ').filter(_.nonEmpty)
        if (ts.length < 3) Set.empty
        else ts.sliding(3).map(_.mkString(" ")).toSet
      }
      val all = corpus.map(d => d._1 -> sh(d._2)).toMap
      val df = all.values.flatten.groupBy(identity)
        .map { case (g, xs) => g -> xs.size }
      val kept = all.map { case (id, gs) =>
        id -> gs.filter(g => df(g) <= 50) }
      val parent = scala.collection.mutable.Map(
        corpus.map(d => d._1 -> d._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for (a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b) {
        val (ka, kb) = (kept(a), kept(b))
        val i = (ka intersect kb).size
        if (ka.nonEmpty && kb.nonEmpty &&
            i.toDouble / (ka.size + kb.size - i) >= 0.5) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      val removableIds = corpus.map(_._1)
        .filter(id => find(id) != id).toSet
      val expected = corpus.groupBy(_._3).map { case (src, ds) =>
        val total = ds.map(_._4).sum
        val rem = ds.filter(d => removableIds(d._1)).map(_._4).sum
        (src, ds.size.toLong, total, rem,
          if (rem == total) None
          else Some(BigDecimal(total.toDouble / (total - rem))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toSeq.sortBy(_._1)
      val got = graft.operators.DedupOps.dupInflation(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
      assert(got == expected,
        s"corpus=${corpus.take(3)}…:\n got $got\n exp $expected")
      got.foreach { case (_, _, total, rem, infl) =>
        assert(rem <= total)
        infl match {
          case Some(x) => assert(rem < total && x >= 1.0)
          case None    => assert(rem == total,
            "NULL inflation only when the whole volume is removable")
        }
      }
    }
  }

  test("max dup span law: equals the per-level brute force on any " +
    "corpus — the widest shared level with its count") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d")
    val levels = Seq(2, 4, 8)
    val docGen = Gen.choose(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val corpusGen = Gen.choose(3, 8).flatMap(nd => Gen.listOfN(nd, docGen))
    samples(corpusGen, 15).foreach { texts =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = {
        def dupAt(k: Int): Map[Long, Long] = {
          val grams = corpus.map { case (id, text) =>
            val ts = text.toLowerCase.split(" ", -1)
            id -> (if (ts.length < k) Array.empty[String]
                   else ts.sliding(k).map(_.mkString(" ")).toArray)
          }
          val docsOf = grams.flatMap { case (id, gs) =>
            gs.distinct.map(_ -> id)
          }.groupBy(_._1).map { case (g, xs) =>
            g -> xs.map(_._2).distinct.size }
          grams.flatMap { case (id, gs) =>
            val dup = gs.count(g => docsOf(g) > 1)
            if (dup == 0) None else Some(id -> dup.toLong)
          }.toMap
        }
        val perLevel = levels.map(k => k -> dupAt(k))
        corpus.flatMap { case (id, _) =>
          perLevel.reverse.collectFirst {
            case (k, m) if m.contains(id) => (id, k.toLong, m(id))
          }
        }.sortBy(_._1)
      }
      // docs shorter than the smallest level are filtered up front by
      // the implementation (size >= min level), matching dupAt's
      // empty-gram handling
      val got = graft.operators.DedupOps
        .maxDupSpanFrom(corpus.toDF("doc_id", "text"), levels)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected,
        s"corpus=${texts.take(4)}…: got $got expected $expected")
    }
  }

  test("winnowing guarantee: any shared ≥ w+k−1 token run yields a " +
    "shared fingerprint; disjoint vocabularies share nothing") {
    // local reference implementation of the SIGMOD'03 selection (k=3,
    // w=4) — the Spark pipeline is pinned equal to this in OperatorsSpec
    def md5Hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def winnow(tokens: Seq[String]): Set[String] = {
      if (tokens.length < 3) Set.empty
      else {
        val keys = (1 to tokens.length - 2).map { i =>
          md5Hex(tokens.slice(i - 1, i + 2).mkString(" ")).substring(0, 8) +
            "%010d".format(9999999999L - i)
        }
        val p = keys.length
        (1 to math.max(p - 3, 1))
          .map(j => keys.slice(j - 1, math.min(j + 3, p)).min.substring(0, 8))
          .toSet
      }
    }
    val tok = Gen.choose(0, 29).map(i => s"t$i")
    val alien = Gen.choose(0, 29).map(i => s"z$i")
    val caseGen = for {
      pre1 <- Gen.choose(0, 20).flatMap(Gen.listOfN(_, tok))
      pre2 <- Gen.choose(0, 20).flatMap(Gen.listOfN(_, tok))
      run <- Gen.choose(6, 14).flatMap(Gen.listOfN(_, tok)) // ≥ w+k−1 = 6
      suf1 <- Gen.choose(0, 20).flatMap(Gen.listOfN(_, tok))
      suf2 <- Gen.choose(0, 20).flatMap(Gen.listOfN(_, tok))
      other <- Gen.choose(6, 40).flatMap(Gen.listOfN(_, alien))
    } yield (pre1 ++ run ++ suf1, pre2 ++ run ++ suf2, other)
    samples(caseGen, 120).foreach { case (d1, d2, d3) =>
      val (f1, f2, f3) = (winnow(d1), winnow(d2), winnow(d3))
      assert((f1 & f2).nonEmpty,
        s"shared run produced no shared fingerprint: $d1 / $d2")
      assert((f1 & f3).isEmpty && (f2 & f3).isEmpty,
        "disjoint-vocabulary doc shares a fingerprint")
      // density: selections never exceed the full-window count
      assert(f1.size <= math.max(d1.length - 2 - 3, 1))
    }
  }

  test("media near-dup band law: mediaDupPairs equals brute force on " +
    "any codec-tagged hash set, and codecs never pair") {
    import spark.implicits._
    // clustered hashes: a base long plus 0-6 flipped bits, so pairs at
    // every hamming distance around the <=3 boundary actually occur
    val rowGen = for {
      base <- Gen.oneOf(0x0123456789abcdefL, 0x7edcba9876543210L,
        0x00ff00ff00ff00ffL)
      nflip <- Gen.choose(0, 6)
      bits <- Gen.listOfN(nflip, Gen.choose(0, 63))
      codec <- Gen.oneOf("img", "audio", "video")
    } yield (codec, bits.foldLeft(base)((h, b) => h ^ (1L << b)))
    val setGen = Gen.listOfN(24, rowGen)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    samples(setGen, 8).foreach { rows =>
      val ids = rows.zipWithIndex.map { case ((c, h), i) => (i.toLong, c, h) }
      val got = graft.operators.Multimodal.mediaDupPairs(
          ids.toDF("media_id", "codec", "phash_bits"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      val brute = (for {
        (ia, ca, haa) <- ids; (ib, cb, hbb) <- ids
        if ia < ib && ca == cb && ham(haa, hbb) <= 3
      } yield (ia, ib, ca, ham(haa, hbb).toLong)).toSet
      assert(got == brute, s"banded $got\nbrute $brute\nrows $ids")
      assert(!got.exists { case (a, b, c, _) =>
        ids(a.toInt)._2 != ids(b.toInt)._2 },
        "cross-codec pair emitted")
    }
  }

  test("mergePartitions law: any changeset sequence matches the " +
    "(partition, key)-keyed reference model") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mprop").toString
    val init = (0L until 30L).map(i => (i, Seq("a", "b", "c")(i.toInt % 3),
      i * 10L))
    init.toDF("id", "part", "v")
      .write.partitionBy("part").parquet(s"$dir/t")
    // reference model: the table IS a (partition, key) -> value map —
    // merge is per-partition keyed, so a key living in two partitions
    // is two independent entries (the documented contract)
    val model = scala.collection.mutable.Map[(String, Long), Long]()
    init.foreach { case (i, p, v) => model((p, i)) = v }

    val opGen = for {
      del <- Gen.frequency((3, false), (1, true))
      id <- Gen.choose(0L, 40L)
      part <- Gen.oneOf("a", "b", "c", "d") // d: starts absent
      v <- Gen.choose(0L, 999L)
    } yield (del, id, part, v)

    samples(Gen.listOfN(25, opGen), 4).foreach { ops0 =>
      // within-changeset (partition, key) collisions are out of contract
      val ops = ops0.groupBy(o => (o._3, o._2)).map(_._2.head).toSeq
      val changes = ops.map { case (del, id, p, v) =>
        (id, p, v, if (del) "delete" else "upsert") }
        .toDF("id", "part", "v", "op")
      Sinks.mergePartitions(spark, s"$dir/t", "part", changes,
        Seq("id"), opCol = Some("op"))
      ops.foreach { case (del, id, p, v) =>
        if (del) model.remove((p, id)) else model((p, id)) = v
      }
      val got = spark.read.parquet(s"$dir/t").collect()
        .map(r => (r.getAs[String]("part"), r.getAs[Long]("id")) ->
          r.getAs[Long]("v")).toMap
      assert(got == model.toMap,
        s"diverged: extra=${(got.toSet -- model.toSet).take(5)} " +
          s"missing=${(model.toSet -- got.toSet).take(5)}")
    }
  }

  test("manifest skipping law: scan(bands) == full-scan filter for any " +
    "band combination, including empty and inverted bands") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_manprop")
      .toString
    val docs = Tables(spark, sfTest, "documents")
    graft.sinks.Sinks.writeZOrdered(docs, s"$dir/t", "doc_id", "n_chars",
      targetFiles = 8)
    graft.sources.Manifest.write(spark, s"$dir/t",
      Seq("doc_id", "n_chars"))
    val full = docs.select($"doc_id", $"n_chars")
      .as[(Long, Long)].collect().toSeq

    val bandGen = for {
      useId <- Gen.oneOf(true, false)
      useChars <- Gen.oneOf(true, false)
      idLo <- Gen.choose(-50L, 600L); idW <- Gen.choose(-20L, 300L)
      chLo <- Gen.choose(-50L, 400L); chW <- Gen.choose(-20L, 200L)
    } yield {
      val m = Map.newBuilder[String, (Any, Any)]
      if (useId) m += "doc_id" -> (idLo, idLo + idW)
      if (useChars) m += "n_chars" -> (chLo, chLo + chW)
      m.result()
    }
    samples(bandGen.suchThat(_.nonEmpty), 25).foreach { bands =>
      val got = graft.sources.Manifest.scan(spark, s"$dir/t", bands)
        .select($"doc_id", $"n_chars").as[(Long, Long)]
        .collect().toSeq.sorted
      val expect = full.filter { case (id, nc) =>
        bands.forall {
          case ("doc_id", (lo: Long, hi: Long)) => id >= lo && id <= hi
          case ("n_chars", (lo: Long, hi: Long)) => nc >= lo && nc <= hi
          case _ => true
        }
      }.sorted
      assert(got == expect, s"bands=$bands: got ${got.size} rows, " +
        s"expected ${expect.size}")
    }
  }
}
