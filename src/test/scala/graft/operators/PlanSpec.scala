package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Physical-plan regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast choice, map-side reduction, single
  * TakeOrdered instead of a global sort) asserted as plan text, so a
  * refactor that silently de-optimizes a plan fails a test instead of a
  * bench round. Cache is OFF in the shared spec session, so parquet scans
  * (and their PushedFilters/ReadSchema) stay visible.
  */
class PlanSpec extends SparkSpec {

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sfTest)
      .queryExecution.executedPlan.toString

  private def analyzed(name: String): String =
    SparkEntry.queries(name)(spark, sfTest)
      .queryExecution.analyzed.toString

  test("scan filter pushes every predicate into the parquet scan") {
    val scans = SparkEntry.queries("q_scan_filter")(spark, sfTest)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scans.size == 1)
    val pushed = scans.head.metadata("PushedFilters")
    Seq("GreaterThanOrEqual(l_shipdate", "GreaterThanOrEqual(l_discount",
      "LessThanOrEqual(l_discount", "LessThan(l_quantity")
      .foreach(f => assert(pushed.contains(f), s"predicate not pushed: $f"))
    // column pruning: the untouched wide columns never leave the scan
    val read = scans.head.metadata("ReadSchema")
    assert(!read.contains("l_comment") && !read.contains("l_shipmode"))
  }

  test("dimension joins broadcast the small side, never sort-merge") {
    for (q <- Seq("q_join_segment", "q_join_5way", "q_enrich_segments")) {
      val p = physical(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast")
      assert(!p.contains("SortMergeJoin"), s"$q shuffles a dim join")
    }
  }

  test("above-avg leaves the unbounded aggregate side unhinted") {
    // the per-customer aggregate grows with the customer population —
    // a forced broadcast() here is the r2-verdict scale hazard; the
    // planner must stay free to pick a shuffle join at scale
    assert(!analyzed("q_above_avg").contains("ResolvedHint"))
  }

  test("knn is a broadcast loop join with map-side top-k, no global sort of pairs") {
    val p = physical("q_vector_knn")
    assert(p.contains("BroadcastNestedLoopJoin"))
    // the bounded-heap aggregator reduces each partition to <= k rows per
    // query BEFORE the shuffle; the n^2 pair stream must never hit a sort
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"))
  }

  test("wordcount: one shuffle, partial agg, TakeOrdered instead of global sort") {
    val p = physical("q_text_wordcount")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
    assert(p.contains("TakeOrderedAndProject"))
    // partial + final hash aggregate (map-side combine)
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("pricing agg combines map-side") {
    val p = physical("q_agg_pricing")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("sequence packing never runs a corpus-wide single-partition window") {
    val windows = SparkEntry.queries("q_pack_sequences")(spark, sfTest)
      .queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
    assert(windows.size == 2, s"expected the two-level form, got $windows")
    val (partitioned, global) = windows.partition(_.partitionSpec.nonEmpty)
    // the corpus-sized cumsum is the PARTITIONED window; the single
    // unpartitioned window may only ever see bucket-total rows — its
    // subtree must aggregate (one row per bucket) before anything reaches
    // it, never feed it raw corpus rows
    assert(partitioned.size == 1 && global.size == 1)
    val aggBelow = global.head.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggBelow.nonEmpty,
      "the unpartitioned window is not fed by the bucket-total aggregate")
  }

  test("incremental dedup shares the posting-list exchange, never recomputes it") {
    // sizes and pairs both consume the grouped posting lists; the heavy
    // scan→shingle→BoundedCollect pipeline must be shared via exchange
    // reuse, not re-executed per consumer
    assert(physical("q_dedup_incremental").contains("ReusedExchange"))
  }

  test("decontamination reads the shingle pipeline exactly once") {
    // the r5 form referenced the tagged-shingle plan in the hot-set agg,
    // the anti-join probe, AND both self-join sides; the posting-list form
    // must keep a single documents scan in the whole plan
    val scans = SparkEntry.queries("q_decontaminate")(spark, sfTest)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
    assert(scans.size == 1,
      s"expected one documents scan, got ${scans.size}")
  }

  test("tfidf reaches (doc, term, tf) rows with zero exchanges and " +
    "explodes run structs exactly once") {
    // tf is a per-row HOF run-length over each doc's own sorted token
    // array (r19) — the plan must contain a single explode (of the
    // (term, tf) run structs; the 1-row n_docs count scans zero columns
    // and never explodes), NO exchange below it (the r13–r18 regression
    // this pin guards: a (doc, term) hash-aggregate shuffle just to
    // count tokens that already live in one row), exactly two pair
    // exchanges in the whole plan (by term for the df window, by doc
    // for the rank) plus the output range sort, and the top-3 cut must
    // push map-side via WindowGroupLimit
    val p = physical("q_tfidf")
    val explodes = "Generate explode".r.findAllIn(p).length
    assert(explodes == 1, s"expected one run-struct explode, got $explodes:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 2,
      s"expected exactly two pair exchanges (term window, doc rank), " +
        s"got $hashEx:\n$p")
    assert(p.contains("WindowGroupLimit"), s"rank cut not pushed down:\n$p")
  }

  test("dau/mau is single-pass: one scan, interval endpoints, no day join") {
    // the interval-endpoint form reads events ONCE and never fans
    // activity out by the horizon: visibility intervals come from a
    // per-user lag/cumsum chain, the MAU curve from +1/−1 endpoint
    // deltas (a flat 2× explode) prefix-summed along the calendar axis.
    // A BroadcastNestedLoopJoin (predicate day-range join) or a >2×
    // generator (the old explode(0..27) fan-out) are the regressions.
    val q = SparkEntry.queries("q_dau_mau")(spark, sfTest)
    val p = q.queryExecution.executedPlan
    val scans = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 1,
      s"q_dau_mau must read events exactly once, got ${scans.length}")
    val txt = p.toString
    assert(!txt.contains("BroadcastNestedLoopJoin"),
      s"q_dau_mau regressed to a nested-loop day join:\n$txt")
    assert(txt.contains("Generate explode"), "endpoint-delta generator missing")
    assert(!txt.contains("sequence("),
      s"horizon-sized sequence fan-out reappeared:\n$txt")
  }

  test("funnel stages materialize once — consumers read checkpointed rows") {
    // shared-subplan cut (lazy localCheckpoint): without it the events
    // scan re-executes per consumer branch — ~6× in the funnel chain,
    // 3× in dau/mau and gapfill (measured; zero exchange reuse fires
    // for any of them). The top-level plan must read only RDD scans —
    // zero parquet scans means no recompute. (q_dau_mau left this set
    // in r9 and q_cohort_retention in r13: their single-consumer
    // window forms read the scan exactly once, pinned below.)
    for (q <- Seq("q_funnel", "q_conversion_lag", "q_gapfill")) {
      val scans = SparkEntry.queries(q)(spark, sfTest)
        .queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
      assert(scans.isEmpty,
        s"$q re-reads events ${scans.size}× — stage checkpoint cut lost")
    }
    // cohort retention (r14 form): ONE user-keyed aggregate (cohort
    // min + collect_set dedup in the same shuffle) → explode → group —
    // one lazy chain, no checkpoint, no join, no window; exactly one
    // events scan
    val p = SparkEntry.queries("q_cohort_retention")(spark, sfTest)
      .queryExecution.executedPlan
    val scans = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 1,
      s"q_cohort_retention must read events exactly once, got ${scans.length}")
    assert(!"(SortMerge|BroadcastHash|ShuffledHash)Join"
      .r.findFirstIn(p.toString).isDefined,
      s"cohort retention regressed to the first-day self-join:\n$p")
  }

  test("substring dup is join-free: one scan, one explode, digests not " +
    "grams on the wire") {
    // the span-frequency question needs no pair generation and no
    // posting lists; the plan must stay scan → explode → md5 →
    // partial-agg'd groupBy → count window → final agg. A join or a
    // second scan here means the gram stream is being re-derived or
    // matched pairwise — both are the regressions this pin exists for.
    val q = SparkEntry.queries("q_dedup_substring")(spark, sfTest)
    val p = q.queryExecution.executedPlan
    val scans = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 1, s"expected one documents scan, got ${scans.length}")
    val txt = p.toString
    assert(!txt.contains("Join"), s"substring dup grew a join:\n$txt")
    assert("Generate ".r.findAllIn(txt).size == 1,
      "exactly one explode should produce the position stream")
    assert(txt.contains("partial_count") || txt.contains("HashAggregate"),
      "per-(doc,gram) aggregate lost its map-side combine")
    // the shuffle keys are fixed-width xxhash64 digests, computed
    // map-side: in the printed tree (root first, leaves last) the digest
    // projection must sit BELOW even the deepest exchange — i.e. print
    // after it — so the k-token strings never cross the wire
    val deepestExchange = txt.lastIndexOf("Exchange hashpartitioning")
    val digestIdx = txt.lastIndexOf("xxhash64")
    assert(deepestExchange > 0 && digestIdx > deepestExchange,
      "digests must be computed map-side, before the first shuffle")
  }

  test("sessionize shuffles once and keeps the spill-safe window form") {
    // the graded entry must stay the declarative lag+cumsum pipeline
    // (WindowExec sorts spill; a typed toArray pass cannot). Both window
    // passes share one partition/order spec → exactly one hash exchange,
    // and the session aggregate rides the same user_id partitioning.
    val p = physical("q_sessionize")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"sessionize pays more than the single user_id shuffle:\n$p")
    assert("WindowExec|Window ".r.findAllIn(p).nonEmpty || p.contains("Window"),
      "sessionize lost its window form")
    assert(!p.contains("MapGroups"),
      "graded sessionize regressed to the unbounded per-group buffer")
  }

  test("anomaly window runs over group rows, never the raw stream") {
    // the stream must collapse to (hour, type) rows BEFORE the trailing
    // window: one events scan, and the WindowExec's subtree aggregates —
    // a window over raw events would sort the whole stream per type
    val exec = SparkEntry.queries("q_anomaly_hours")(spark, sfTest)
      .queryExecution.executedPlan
    val scans = exec.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1, s"expected one events scan, got ${scans.size}")
    val windows = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 1)
    val aggBelow = windows.head.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggBelow.nonEmpty, "window consumes raw rows, not group rows")
  }

  test("round-8 analytics queries keep their scale shapes: single event " +
    "scan, broadcast small sides, partial aggs") {
    // transitions: ONE events scan feeds the lead window; pair counting
    // is partial+final; normalization windows over group rows only
    val pt = physical("q_event_transitions")
    assert("Scan parquet".r.findAllIn(pt).size == 1,
      "transitions re-scans the event stream")
    assert("HashAggregate".r.findAllIn(pt).size >= 2)

    // order gaps: dim join broadcasts, the fact side shuffles once for
    // the per-customer window
    val pg = physical("q_order_gaps")
    assert(pg.contains("BroadcastHashJoin") && !pg.contains("SortMergeJoin"),
      "order gaps shuffles its dimension join")
    assert("Exchange hashpartitioning".r.findAllIn(pg).size <= 2,
      "order gaps added an unexpected shuffle")

    // oov: both consumers share the (lang, word) aggregation prefix, so
    // the vocab branch must ride a ReusedExchange — one corpus scan, no
    // second explode of the token stream
    val po = physical("q_oov_rate")
    assert("Scan parquet".r.findAllIn(po).size == 1,
      "oov re-scans the corpus for the vocab branch")
    assert(po.contains("ReusedExchange"),
      "the vocab branch stopped reusing the group-rows exchange")
    assert(po.contains("TakeOrderedAndProject"),
      "vocab cut lost its TakeOrdered")
    assert(po.contains("BroadcastHashJoin") && !po.contains("SortMergeJoin"),
      "oov membership join stopped broadcasting")
  }

  test("sf-scaling dimension joins are unhinted: planner broadcasts at " +
    "graded scale, falls back to sort-merge when the threshold drops") {
    // The r8-verdict finding: an explicit broadcast() on customer/part/
    // supplier bypasses autoBroadcastJoinThreshold, so the AQE fallback
    // SCALE.md argues for can never fire — at 100 TB the job would pin
    // an sf-scaling dimension in memory until the 8 GiB broadcast hard
    // limit kills it. These 12 queries must (a) carry NO broadcast hint
    // on an sf-scaling table, (b) still plan a BroadcastHashJoin at
    // graded scale purely from stats, and (c) fall back to a shuffle
    // join row-identically once the threshold forbids broadcasting —
    // which is exactly the behavior a 1000-executor run relies on.
    val dehinted = Seq("q_topk_parts", "q_topk_brand", "q_supplier_nation",
      "q_percentiles", "q_approx_percentiles", "q_rfm_segments",
      "q_pivot_priority", "q_small_qty_revenue", "q_grouping_sets",
      "q_order_gaps", "q_order_quartiles", "q_enrich_segments")
    // (a) no hint on a scaling dim. Two queries keep ONE hint each on a
    // side that never scales: rfm's 1-row date anchor and
    // supplier_nation's 25-row nation table — everything else is bare.
    for (q <- dehinted) {
      val hints = "ResolvedHint".r.findAllIn(analyzed(q)).size
      val allowed =
        if (Set("q_rfm_segments", "q_supplier_nation")(q)) 1 else 0
      assert(hints == allowed,
        s"$q carries ${hints} broadcast hint(s), expected $allowed")
    }
    // (b) stats still pick broadcast for every dim join at graded scale.
    // small_qty_revenue legitimately sort-merges its UNBOUNDED per-part
    // aggregate back onto the fact rows (the q_above_avg decorrelation
    // discipline) — only its part-dim join must broadcast.
    for (q <- dehinted) {
      val p = physical(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q no longer broadcasts its dimension at graded scale")
      if (q != "q_small_qty_revenue")
        assert(!p.contains("SortMergeJoin"),
          s"$q shuffles a dim join that stats should broadcast")
    }
    // (c) threshold off → sort-merge fallback, byte-identical rows (the
    // representative set covers each de-hinted dim: part, supplier,
    // customer, and a derived/filtered side)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (q <- Seq("q_topk_brand", "q_supplier_nation", "q_percentiles",
        "q_small_qty_revenue", "q_order_gaps")) {
      val fallback = SparkEntry.queries(q)(s2, sfTest)
      val pf = fallback.queryExecution.executedPlan.toString
      assert(pf.contains("SortMergeJoin") || pf.contains("ShuffledHashJoin"),
        s"$q did not fall back to a shuffle join with broadcasting off:\n$pf")
      // the kept nation hint (constant 25 rows) is SUPPOSED to survive the
      // threshold — a hint on a scaling dim is what must not
      if (q != "q_supplier_nation")
        assert(!pf.contains("BroadcastHashJoin"),
          s"$q still broadcasts with the threshold off — a hint survives")
      val a = SparkEntry.queries(q)(spark, sfTest)
        .collect().map(_.toString).toSeq
      val b = fallback.collect().map(_.toString).toSeq
      assert(a == b, s"$q: fallback plan changed the result")
    }
  }

  test("dedup sizes joins are unhinted: planner broadcasts at graded " +
    "scale, falls back to a shuffle join when the threshold drops") {
    // The r9-verdict finding: ngramPairs/ngramIncremental joined their
    // per-document `sizes` table through explicit broadcast() hints. That
    // table is one row per document — it grows with the corpus (strictly
    // faster than the kept vocabulary), so a hint pins a corpus-sized
    // build side in memory at 100 TB, exactly the hazard the r8/r9 dim
    // de-hints removed. Same three-part contract as the dimension test.
    val dehinted = Seq("q_dedup_ngram", "q_dedup_clusters",
      "q_dedup_incremental")
    // (a) no hint anywhere except the bounded hot-shingle anti-join side
    // (≤ total-occurrences/maxDf rows by construction — scale-constant
    // relative to the corpus); at the graded corpus size ngramDedupAuto
    // takes the direct-join branch, which carries zero hints.
    for (q <- dehinted) {
      val hints = "ResolvedHint".r.findAllIn(analyzed(q)).size
      assert(hints == 0, s"$q carries $hints broadcast hint(s), expected 0")
    }
    // (b) stats still pick broadcast for the sizes joins at graded scale.
    // q_dedup_clusters is excluded: its executed plan is rooted in the
    // localCheckpointed CC iteration result, so the pair-generation joins
    // (the ones that carried the hint, via ngramPairs) are not visible in
    // the final plan — q_dedup_ngram checks that shared subplan directly.
    for (q <- Seq("q_dedup_ngram", "q_dedup_incremental")) {
      val p = physical(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q no longer broadcasts its sizes join at graded scale")
    }
    // (c) threshold off → shuffle-join fallback, byte-identical rows
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (q <- Seq("q_dedup_ngram", "q_dedup_incremental")) {
      val fallback = SparkEntry.queries(q)(s2, sfTest)
      val pf = fallback.queryExecution.executedPlan.toString
      assert(pf.contains("SortMergeJoin") || pf.contains("ShuffledHashJoin"),
        s"$q did not fall back to a shuffle join with broadcasting off:\n$pf")
      assert(!pf.contains("BroadcastHashJoin"),
        s"$q still broadcasts with the threshold off — a hint survives")
      val a = SparkEntry.queries(q)(spark, sfTest)
        .collect().map(_.toString).toSeq
      val b = fallback.collect().map(_.toString).toSeq
      assert(a == b, s"$q: fallback plan changed the result")
    }
  }

  test("basket pairs: the r20 group+HOF pair expansion plans no join and " +
    "matches the join form row-identically (duplicate parts included)") {
    // r20 (guide §2.4 — remove shuffles outright): pair generation used
    // to be a lineitem self-join on the order key — two fact scans and
    // two order-keyed exchanges (or, with stats under the threshold, a
    // full-fact broadcast: the r10 cold-path cliff this test used to
    // guard). The group+HOF form has no join to mis-plan: ONE
    // order-keyed exchange into collect_list, in-row pair expansion,
    // then the same partial+final pair agg and TakeOrdered cut.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val p = physical("q_basket_pairs")
    assert(!p.contains("Join"), s"q_basket_pairs must plan no join:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected exactly 2 exchanges (order group, pair agg):\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "pair counting lost its partial+final (map-side) aggregate")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k cut regressed to a global sort")
    // row identity vs the r1–r19 join form, on the fixture and on a
    // synthetic corpus with duplicate parts within one order — the
    // subtle bit the rewrite must preserve: ROW-pair multiplicities (a
    // part held twice in an order pairs twice with every greater part,
    // and never with itself)
    def joinForm(d: String) = {
      val li = graft.Tables(spark, d, "lineitem")
        .select($"l_orderkey", $"l_partkey")
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"),
          col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), $"part_a", $"part_b").limit(20)
    }
    val a = SparkEntry.queries("q_basket_pairs")(spark, sfTest)
      .collect().map(_.toString).toSeq
    val b = joinForm(sfTest).collect().map(_.toString).toSeq
    assert(a == b, "q_basket_pairs: group+HOF form diverged from the join form")
    val dir = java.nio.file.Files.createTempDirectory("graft_basket").toString
    Seq((1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 20L), (3L, 5L))
      .toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
    val syn = Relational.basketPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = joinForm(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(syn == exp, "synthetic multiset corpus diverged from the join form")
    // hand check: order 1 = [10,10,20,30] → (10,20)×2, (10,30)×2, (20,30);
    // order 2 = [10,20,20] → (10,20)×2; order 3 is a singleton
    assert(syn == Seq((10L, 20L, 4L), (10L, 30L, 2L), (20L, 30L, 1L)))
  }

  test("no graded query plans an unapproved nested-loop or cartesian join") {
    // the whole-surface sweep (graft.PlanAudit as a regression guard):
    // BNLJ is allowed only where documented — exact brute-force vector
    // queries and 1-row/plan-constant cross-join sides. A new query that
    // accidentally ships a predicate join (the q_dau_mau r6 finding)
    // fails here instead of in a verdict.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = physical(name)
      val bad =
        (p.contains("BroadcastNestedLoopJoin") &&
          !graft.PlanAudit.AllowedBnlj(name)) ||
        p.contains("CartesianProduct")
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"unapproved join shapes in: $offenders")
  }

  test("selective shuffle joins accept an injected runtime bloom filter") {
    // The cluster-deployment lever SCALE.md relies on for fact⋈dim joins
    // too big to broadcast: Spark's InjectRuntimeFilter builds a bloom
    // filter from the selective (filtered) creation side and applies it
    // as a semi-join-like row filter on the fact side BEFORE its shuffle,
    // cutting exchange volume by the dim filter's selectivity. Local
    // fixture tables sit under the application-side threshold, so the
    // test lowers it (the knob a real deployment leaves at 10 GB) and
    // pins (a) the rewrite fires and (b) results are unchanged.
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "1KB")
    def q(sess: org.apache.spark.sql.SparkSession) = {
      val li = graft.Tables(sess, sfTest, "lineitem")
      val p = graft.Tables(sess, sfTest, "part")
        .filter(col("p_brand") === "Brand#11")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("long")
            .as("sum_qty"))
        .orderBy(col("p_brand"))
    }
    val filtered = q(s2)
    val opt = filtered.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain") || opt.contains("bloom_filter"),
      s"runtime bloom filter not injected:\n$opt")
    assert(filtered.collect().toSeq == q(spark).collect().toSeq,
      "bloom-pruned join must not change results")
  }

  test("date-partitioned event layout: date predicates prune to the queried " +
    "directories and answer identically to the single-file layout") {
    // The graded fixtures are single-file parquet, so directory-partition
    // pruning — the #1 read-cost lever on a date-partitioned 100 TB event
    // lake — is otherwise exercised only by the IVF index probes. This
    // proves the full story on the EVENT path: write the stream date-
    // partitioned (Sinks.writePartitioned), run the scan/tumbling/anomaly
    // read shapes date-restricted over it, and pin (a) PartitionFilters in
    // the scan, (b) the files-read metric at exactly the selected days'
    // files, (c) row identity with the same queries over the single file.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpart").toString
    val single = graft.Tables(spark, sfTest, "events")
      .withColumn("date", to_date($"ts"))
    graft.sinks.Sinks.writePartitioned(single, s"$dir/events", "date")
    val part = spark.read.parquet(s"$dir/events")

    val dates = single.select($"date").distinct().orderBy($"date")
      .as[java.sql.Date].collect()
    assert(dates.length >= 10, "fixture spans too few days to prove pruning")
    val slice = dates.take(6)
    val (d0, dN) = (slice.head, slice.last)

    def scanLike(df: org.apache.spark.sql.DataFrame) = df
      .filter($"date" === lit(d0) && $"event_type" === "click")
      .select($"event_id", $"user_id", $"value")
    def hourly(df: org.apache.spark.sql.DataFrame) = df
      .filter($"date" >= lit(d0) && $"date" <= lit(dN))
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss")
        .as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
    def anomalyLike(df: org.apache.spark.sql.DataFrame) =
      Events.anomalyFromHourly(df
        .filter($"date" >= lit(d0) && $"date" <= lit(dN))
        .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type")
        .agg(count(lit(1)).as("c")))

    // (c) row identity across layouts, per read shape
    for ((q, label) <- Seq(
        (scanLike _, "scan"), (hourly _, "tumbling"),
        (anomalyLike _, "anomaly"))) {
      val a = q(single).collect().map(_.toString).sorted.toSeq
      val b = q(part).collect().map(_.toString).sorted.toSeq
      assert(a.nonEmpty, s"$label slice is empty — the proof proves nothing")
      assert(a == b, s"$label answers diverge across layouts")
    }

    // (a)+(b) the partitioned side prunes: the date range reaches the scan
    // as a partition filter and only the sliced days' files are opened
    def parquetFilesUnder(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(parquetFilesUnder).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    val totalFiles = parquetFilesUnder(new java.io.File(s"$dir/events"))
    val sliceFiles = slice.map(d =>
      parquetFilesUnder(new java.io.File(s"$dir/events/date=$d"))).sum
    assert(sliceFiles > 0 && sliceFiles < totalFiles,
      s"layout cannot demonstrate pruning ($sliceFiles of $totalFiles)")
    val q = hourly(part)
    val scan = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("date"),
      s"date range did not become a partition filter:\n${scan.metadata}")
    q.collect()
    assert(scan.metrics("numFiles").value == sliceFiles,
      s"scan opened ${scan.metrics("numFiles").value} files, " +
        s"expected the $sliceFiles in the sliced days (of $totalFiles)")
    // the non-partition predicate still pushes down as a data filter
    val s2 = scanLike(part).queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(s2.metadata("PartitionFilters").contains("date"))
    assert(s2.metadata("PushedFilters").contains("EqualTo(event_type,click)"),
      s"event_type not pushed beside the partition filter:\n${s2.metadata}")
  }

  test("bm25 is one scalar aggregate + map-side scoring: no wide shuffle, " +
    "no join of postings, TakeOrdered top-k") {
    val p = physical("q_bm25")
    // per-term tf comes from higher-order filter counts, df/avgdl/N fold
    // into ONE 1-row aggregate — nothing ever hash-partitions
    assert(!p.contains("Exchange hashpartitioning"),
      s"bm25 grew a wide shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "bm25 must not shuffle-join postings")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be TakeOrdered, not a global sort")
  }

  test("doc perplexity leaves the vocab-scaling model joins unhinted") {
    // same three-part contract as the dedup sizes pins: the c2/c1 model
    // tables scale with the VOCABULARY — only the 1-row V aggregate may
    // carry a hint; stats broadcast the model at graded scale; with the
    // threshold off the score joins degrade to shuffle joins with
    // byte-identical rows
    val hints = "ResolvedHint".r.findAllIn(analyzed("q_doc_perplexity")).size
    assert(hints == 1, s"expected only the 1-row V hint, found $hints")
    assert(physical("q_doc_perplexity").contains("BroadcastHashJoin"),
      "stats no longer broadcast the bigram model at graded scale")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fallback = SparkEntry.queries("q_doc_perplexity")(s2, sfTest)
    val pf = fallback.queryExecution.executedPlan.toString
    assert(pf.contains("SortMergeJoin") || pf.contains("ShuffledHashJoin"),
      s"no shuffle-join fallback with broadcasting off:\n$pf")
    val a = SparkEntry.queries("q_doc_perplexity")(spark, sfTest)
      .collect().map(_.toString).toSeq
    assert(a == fallback.collect().map(_.toString).toSeq,
      "fallback plan changed the result")
  }

  test("kmeans assignment is map-side: no window, no join, no wide shuffle " +
    "in the final pass") {
    val p = physical("q_kmeans")
    assert(!p.contains("Window"), s"assignment regressed to a window:\n$p")
    assert(!p.toLowerCase.contains("join"),
      "assignment must not join a centroid table")
    assert(!p.contains("Exchange hashpartitioning"),
      "nothing in the final assignment pass should hash-partition")
  }

  test("cluster-size histogram aggregates checkpointed CC rows only") {
    // the expensive pair/CC machinery is behind the localCheckpoint; the
    // visible plan is two bounded group-row aggregates
    val p = physical("q_cluster_sizes")
    assert(!p.toLowerCase.contains("join"),
      s"histogram must not re-join the pair graph:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "rollup grew extra shuffles")
  }

  test("hard negatives: anchors broadcast, candidates die map-side in " +
    "the partial top-k") {
    val p = physical("q_hard_negatives")
    // the cross-label condition is non-equi, so the anchor broadcast IS
    // the BNLJ the allowlist documents; the corpus must never shuffle
    // before the bounded-heap aggregate's partial phase
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"anchor batch no longer broadcasts:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "pair stream grew an extra shuffle")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "top-k heap lost its partial (map-side) phase")
  }

  test("embedding outliers: bounded centroid table broadcasts, corpus " +
    "pass ends in TakeOrdered") {
    val p = physical("q_embedding_outliers")
    assert(p.contains("BroadcastHashJoin"),
      s"label-domain centroid join must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "bottom-k must be TakeOrdered, not a global sort")
    // raw vectors shuffle only inside the posexplode'd (label, dim)
    // centroid aggregate — scalar group rows, never whole embeddings
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "corpus must not shuffle-join the centroids")
  }

  test("dedup keep: the chars join is unhinted and the survivor pick is " +
    "one aggregate, not a window") {
    val hints = "ResolvedHint".r.findAllIn(analyzed("q_dedup_keep")).size
    assert(hints == 0,
      s"clustered-side size scales with dup volume — no hints, found $hints")
    val p = physical("q_dedup_keep")
    assert(!p.contains("Window"),
      s"survivor pick regressed to a window:\n$p")
  }

  test("shuffle order: the global position is the two-level prefix sum, " +
    "not a corpus-wide window") {
    val p = physical("q_shuffle_order")
    // exactly one single-partition window may appear — the one over the
    // per-stride rollup (bounded by the largest source); the corpus-wide
    // windows stay hash-partitioned by source/stride
    assert(p.contains("BroadcastHashJoin"),
      s"stride-offset rollup no longer broadcasts:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 1,
      s"corpus rows entered a single-partition exchange:\n$p")
  }

  test("temperature mixing is one corpus scan into group rows") {
    val p = physical("q_source_temperature")
    // per-source agg is the only wide shuffle; the normalizer folds via
    // the allowlisted 1-row broadcast cross join
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"mixing grew a second wide shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "nothing here may shuffle-join")
  }

  test("source KL: the corpus scans once into checkpointed group rows; " +
    "the grid join stays unhinted") {
    val p = physical("q_source_kl")
    // all three aggregates (source totals, corpus totals, grid join) read
    // the checkpointed (source, word) group rows — documents itself is
    // never re-scanned
    assert(!p.contains("FileScan"),
      s"documents re-scanned past the checkpoint:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 3,
      s"counts no longer checkpoint-shared:\n$p")
    // only the two bounded sides carry hints (|sources|-row totals, 1-row
    // (N,V)); the vocab-scaling counts join is UNHINTED — stats broadcast
    // it at graded scale, shuffle fallback must be row-identical
    val hints = "ResolvedHint".r.findAllIn(analyzed("q_source_kl")).size
    assert(hints == 2, s"expected the two bounded hints, found $hints")
    assert(p.contains("BroadcastHashJoin"),
      "stats no longer broadcast the counts join at graded scale")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fallback = SparkEntry.queries("q_source_kl")(s2, sfTest)
    val pf = fallback.queryExecution.executedPlan.toString
    assert(pf.contains("SortMergeJoin") || pf.contains("ShuffledHashJoin"),
      s"no shuffle-join fallback with broadcasting off:\n$pf")
    val a = SparkEntry.queries("q_source_kl")(spark, sfTest)
      .collect().map(_.toString).toSeq
    assert(a == fallback.collect().map(_.toString).toSeq,
      "fallback plan changed the result")
  }

  test("winnowing is windows over one positional explode: no join " +
    "anywhere, no single-partition exchange") {
    val p = physical("q_winnow_fingerprints")
    // selection is a doc-partitioned min window, sharing a fp-partitioned
    // count window — a counter per fingerprint, never pair generation
    // (match operator names, not the array_join expression)
    assert(!"(SortMerge|BroadcastHash|ShuffledHash|BroadcastNestedLoop)Join"
      .r.findFirstIn(p).isDefined && !p.contains("CartesianProduct"),
      s"winnowing must not join:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size <= 1,
      s"documents scanned more than once:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"corpus rows entered a single-partition exchange:\n$p")
  }

  test("winnow pairs: join-free posting-list plan — one scan, one fp " +
    "exchange, pairs generated in the array domain") {
    val p = physical("q_winnow_pairs")
    // r13 shape: selection in the array domain (one documents scan),
    // df window + capped collect_list on ONE fp-keyed exchange, pair
    // generation via transform/explode — the a×b self-join (and its
    // second probe of the selection pipeline) is gone entirely
    assert(!"(SortMerge|BroadcastHash|ShuffledHash|BroadcastNestedLoop)Join"
      .r.findFirstIn(p).isDefined && !p.contains("CartesianProduct"),
      s"winnow pairs must not join:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size <= 1,
      s"documents scanned more than once:\n$p")
    assert("Exchange hashpartitioning\\(fp".r.findAllIn(p).size <= 1,
      s"selection pipeline shuffled to the fp key more than once:\n$p")
  }

  test("market share: the region filter pushes into the dim scan and " +
    "prunes through broadcast joins") {
    val p = physical("q_market_share")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      s"region predicate not pushed to the region scan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"dims no longer broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("top value parts: one checkpointed fact rollup feeds both the " +
    "scalar and the filter; only the part dim re-scans") {
    val p = physical("q_top_value_parts")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"per-part rollup no longer checkpoint-shared:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size <= 1,
      s"the fact table re-scanned past the checkpoint:\n$p")
  }

  test("token budget selection keeps the two-level prefix sum and never " +
    "single-partitions the corpus") {
    val p = physical("q_token_budget")
    // two single-partition exchanges are allowed — the offsets window
    // and the budget aggregate, BOTH over the ≤ qCells-row checkpointed
    // rollup; corpus rows stay behind hash partitionings
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 2,
      s"corpus rows entered a single-partition exchange:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"cell-offset rollup no longer broadcasts:\n$p")
    // the rollup is checkpointed: the corpus token aggregate must not
    // re-run for the budget (no third corpus-width aggregate)
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"cell rollup no longer checkpoint-shared:\n$p")
  }

  test("round-12 decision-support shapes: dims broadcast, the fact-fact " +
    "order-key join is the only shuffle join, EXISTS stays a semi join") {
    // Q7: nation-filtered supplier/customer slices broadcast; exactly one
    // SortMergeJoin (lineitem⋈orders on the order key) may remain
    val p7 = physical("q_nation_trade")
    assert(p7.contains("BroadcastHashJoin"), s"Q7 lost its dim broadcasts")
    assert("SortMergeJoin".r.findAllIn(p7).size <= 1,
      s"Q7 shuffles more than the fact-fact join:\n$p7")
    // Q14: part broadcasts; numerator+denominator live in ONE aggregate
    // pair (partial+final), not two scans
    val p14 = physical("q_promo_share")
    assert(p14.contains("BroadcastHashJoin"), "Q14 lost the part broadcast")
    assert(!p14.contains("SortMergeJoin"), s"Q14 shuffles the dim join")
    val scans14 = SparkEntry.queries("q_promo_share")(spark, sfTest)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans14.count(
      _.metadata("Location").contains("lineitem")) == 1,
      "Q14 scans the fact table more than once")
    // Q4: the correlated EXISTS must stay a LEFT SEMI (dedup inside the
    // join), never an inner join + distinct
    val p4 = physical("q_late_orders")
    assert(p4.contains("LeftSemi"), s"Q4 lost the semi join:\n$p4")
    // Q22: the scalar bar is a 1-row broadcast; the anti join survives
    val p22 = physical("q_cust_balance")
    assert(p22.contains("LeftAnti"), "Q22 lost the anti join")
    assert(p22.contains("BroadcastNestedLoopJoin") ||
      p22.contains("BroadcastHashJoin"), "Q22's scalar bar no longer " +
      "broadcasts")
  }

  test("round-14 shapes: Q18 aggregates before it joins, Q2 argmin " +
    "needs no window, containment's spine broadcasts, boilerplate " +
    "scans the corpus once") {
    // Q18: one lineitem scan feeding the total-quantity agg; the
    // customer dim broadcasts; nothing falls back to a shuffle join at
    // graded scale
    val p18 = physical("q_big_orders")
    assert(p18.contains("BroadcastHashJoin"), "Q18 lost its broadcasts")
    assert(!p18.contains("SortMergeJoin"), s"Q18 shuffle-joins:\n$p18")
    val scans18 = SparkEntry.queries("q_big_orders")(spark, sfTest)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans18.count(_.metadata("Location").contains("lineitem")) == 1,
      "Q18 scans the fact table more than once")
    // Q2: the decorrelated argmin is min-over-struct on group rows —
    // no Window operator anywhere; the supplier-region dim broadcasts
    val p2 = physical("q_cheapest_supplier")
    assert(p2.contains("BroadcastHashJoin"), "Q2 lost the dim broadcast")
    assert(!p2.contains("Window"), s"Q2 grew a window:\n$p2")
    assert(!p2.contains("SortMergeJoin"), s"Q2 shuffle-joins:\n$p2")
    // containment: the |sources|^2 output spine is a broadcast grid
    // (the gapfill plan-constant class), never a shuffled cross
    val pc = physical("q_source_containment")
    assert(pc.contains("BroadcastNestedLoopJoin"),
      s"containment spine no longer broadcasts:\n$pc")
    assert(!pc.contains("CartesianProduct"),
      s"containment grew a shuffled cross:\n$pc")
    // boilerplate: the checkpointed prefix table means the corpus text
    // is read (and tokenized) exactly once
    val scansBp = SparkEntry.queries("q_boilerplate_prefix")(spark, sfTest)
      .queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scansBp.count(_.metadata("Location").contains("documents")) <= 1,
      "boilerplate re-scans the corpus text")
  }
}
