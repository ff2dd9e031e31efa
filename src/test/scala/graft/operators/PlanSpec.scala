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
}
