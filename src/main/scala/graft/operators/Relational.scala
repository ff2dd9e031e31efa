package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator inventory (SURVEY.md §2.1–2.6, minus windows).
  *
  * Determinism rules (SURVEY §5.1): every query ends in a total ORDER BY;
  * computed integers are cast to LongType so the DuckDB oracle types line
  * up. Money aggregates run in exact DECIMAL, never double: a double sum's
  * low bits depend on partition/accumulation order, and ROUND of a 2-dp
  * money sum lands on an exact .5 boundary for ~1% of buckets — at which
  * point the rounded value flips between engines (observed: one
  * q_priority_years bucket summing to …2.50). Casting the 2-dp inputs to
  * DECIMAL(12,2) before SUM makes the aggregate exact integer arithmetic on
  * both sides — and DECIMAL is also the 100 TB-correct type (128-bit exact
  * accumulation, no precision decay with row count). Averages divide the
  * exact DECIMAL sum by the count in double: both engines then round the
  * SAME double, so the 4-dp round is deterministic too.
  *
  * Scale notes: all joins here are star-schema shaped — Catalyst broadcasts
  * the dim side automatically (customer @100TB-scale proportions would still
  * be the small side vs lineitem; nation/region are constants). Aggregations
  * are partial+final hash aggs (map-side combine), so the shuffle carries
  * groups, not rows.
  */
object Relational {

  /** Exact-decimal money types: DECIMAL(12,2) holds any TPC-H money column
    * (< 10^10); DECIMAL(4,2) holds the (1 ± discount/tax) factors. The
    * product (12,2)×(4,2)×(4,2) is DECIMAL(22,6) — exact and far below the
    * 38-digit cap in both Spark and DuckDB.
    */
  private val Money = org.apache.spark.sql.types.DecimalType(12, 2)
  private val Pct = org.apache.spark.sql.types.DecimalType(4, 2)

  /** Exact discounted-revenue term — l_extendedprice·(1−l_discount) in
    * DECIMAL, the ONE definition of the formula every TPC-H-shaped
    * query aggregates (nine call sites previously spelled it inline; a
    * precision or formula change now has a single home, in lockstep
    * with every oracle's CAST(...DECIMAL(12,2)) × CAST(...DECIMAL(4,2))).
    */
  private def discountedRev: org.apache.spark.sql.Column =
    col("l_extendedprice").cast(Money) *
      (lit(1) - col("l_discount")).cast(Pct)

  /** Exact money sum rounded to whole units as BIGINT. */
  private def moneySum(c: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column = round(sum(c)).cast("long")

  /** Deterministic 4-dp average: exact DECIMAL sum ÷ count in double. */
  private def avg4(c: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column =
    round(sum(c).cast("double") / count(lit(1)), 4)

  /** Parquet scan + multi-predicate filter. The predicates reach the scan as
    * PushedFilters (min/max row-group skipping); projection prunes to 6 of 11
    * columns (ReadSchema).
    */
  def scanFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= "1998-01-01" &&
        $"l_discount".between(0.02, 0.06) && $"l_quantity" < 24)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice", $"l_discount",
        $"l_shipdate".cast("date").as("ship_date"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** TPC-H Q1-style pricing summary: group by (returnflag, linestatus),
    * SUM/AVG/COUNT over derived measures. Partial aggregation means only 6
    * groups cross the shuffle regardless of fact-table size.
    */
  def aggPricing(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val price = $"l_extendedprice".cast(Money)
    val disc = price * (lit(1) - $"l_discount").cast(Pct)
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" <= "1998-09-02")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        moneySum($"l_quantity".cast(Money)).as("sum_qty"),
        moneySum(price).as("sum_base"),
        moneySum(disc).as("sum_disc"),
        moneySum(disc * (lit(1) + $"l_tax").cast(Pct)).as("sum_charge"),
        avg4($"l_quantity".cast(Money)).as("avg_qty"),
        avg4(price).as("avg_price"),
        avg4($"l_discount".cast(Pct)).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** 2-way equi join orders⋈customer, revenue per market segment. Customer is
    * the small side → broadcast-hash join, no shuffle of orders.
    */
  def joinSegment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(moneySum($"o_totalprice".cast(Money)).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"c_mktsegment")
  }

  /** 5-way star join lineitem⋈orders⋈customer⋈nation⋈region, revenue by
    * (region, nation). nation/region broadcast explicitly (constant 25/5
    * rows at every scale); customer broadcasts by threshold. Only the
    * lineitem⋈orders edge can ever need a shuffle at 100 TB.
    */
  def join5Way(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    starJoin(s, dir)
      .groupBy($"r_name", $"n_name")
      .agg(moneySum(discountedRev).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"r_name", $"n_name")
  }

  /** Rollup (grouping sets) over the same star join: revenue at
    * (region, nation), (region), and grand-total grain in one pass.
    * NULLS FIRST pinned explicitly — Spark and DuckDB default differently.
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    starJoin(s, dir)
      .rollup($"r_name", $"n_name")
      .agg(moneySum(discountedRev).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  private def starJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables(s, dir, "nation")),
        $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables(s, dir, "region")),
        $"n_regionkey" === $"r_regionkey")
  }

  /** EXISTS-style left-semi join: customers with ≥1 order > 400 000.
    * Semi join never duplicates the left side, so no post-dedup needed.
    */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables(s, dir, "orders").filter($"o_totalprice" > 400000)
    Tables(s, dir, "customer")
      .join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** NOT-EXISTS-style left-anti join: customers with no order > 400 000.
    * (A bare "no orders" anti-join is empty at every sf — FIXTURES.md.)
    */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables(s, dir, "orders").filter($"o_totalprice" > 400000)
    Tables(s, dir, "customer")
      .join(big, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  /** Top-10 parts by revenue: agg + global sort-limit + late dimension
    * join. Revenue only needs l_partkey, so the fact table is aggregated
    * FIRST (long keys, no strings in the hash map) and `part` is joined to
    * just the 10 survivors — at 100 TB that's the difference between
    * joining every fact row and joining ten. Spark plans
    * TakeOrderedAndProject: each partition keeps a 10-row heap, only 10×P
    * rows reach the driver. Inner join is revenue-preserving because
    * l_partkey is a foreign key into part (FIXTURES.md).
    */
  def topkParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev"))
      // l_partkey tie-break: an exact (or cross-engine float-accumulation
      // near-) tie at the rank-10 boundary must pick the same part in both
      // engines; the oracle sorts identically
      .orderBy(desc("rev"), $"l_partkey")
      .limit(10)
      // unhinted: the 10-row survivor side is what should broadcast, and
      // the planner sees that through the limit's size estimate; a forced
      // broadcast(part) would pin the sf-scaling dimension in memory
      .join(Tables(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .select($"p_partkey", $"p_name", round($"rev").cast("long").as("revenue"))
      .orderBy(desc("revenue"), $"p_partkey")
  }

  /** Grouped top-k via the bounded-heap `top_k` Aggregator: top-3 parts by
    * revenue within each brand. This is the shape `TakeOrderedAndProject`
    * cannot plan (the limit is per group, not global) and where the UDAF's
    * partial aggregation earns its keep: ~8 000 parts per brand reduce to
    * ≤3 per partition before the shuffle, so the exchange carries
    * O(brands × k × P) buffers instead of every (brand, part) row — the
    * window-function twin would shuffle and sort all 200 000 rows. Ranking
    * is (revenue DESC, p_partkey) in both the heap and the oracle's
    * ROW_NUMBER, so ties can't flip the boundary.
    */
  def topkBrand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perPart = Tables(s, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("rev"))
      .join(Tables(s, dir, "part")
        .select($"p_partkey", $"p_brand"), $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"p_partkey", $"rev")
      .as[(String, Long, Double)]
    perPart.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAggregator(3).toColumn.name("tops"))
      .flatMap { case (brand, tops) =>
        tops.zipWithIndex.map { case ((pk, r), i) =>
          (brand, pk, r, (i + 1).toLong)
        }
      }
      .toDF("p_brand", "p_partkey", "rev_raw", "rn")
      .select($"p_brand", $"p_partkey",
        round($"rev_raw").cast("long").as("revenue"), $"rn")
      .orderBy($"p_brand", $"rn")
  }

  /** Revenue attributed to the supplying nation (exercises the
    * lineitem→supplier FK edge): lineitem⋈supplier⋈nation, revenue per
    * nation. nation keeps its hint (constant 25 rows); supplier is
    * UNHINTED — it scales with sf, so the planner must stay free to fall
    * back to a shuffle join past `autoBroadcastJoinThreshold` (at graded
    * scale stats pick broadcast anyway). One partial+final agg.
    */
  def supplierNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "supplier"),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables(s, dir, "nation")),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(moneySum(discountedRev).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"n_name")
  }

  /** Order counts by (year, priority) — TPC-H Q4-flavoured date-bucket
    * aggregation over o_orderdate/o_orderpriority.
    */
  def priorityYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .groupBy(year($"o_orderdate").cast("long").as("order_year"),
        $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        moneySum($"o_totalprice".cast(Money)).as("revenue"))
      .orderBy($"order_year", $"o_orderpriority")
  }

  /** Part catalog statistics per brand: price/size profile. */
  def brandStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "part")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"),
        round(avg($"p_retailprice"), 4).as("avg_price"),
        min($"p_size").as("min_size"),
        max($"p_size").as("max_size"))
      .orderBy($"p_brand")
  }

  /** Orders strictly above their own customer's average order value — the
    * correlated-scalar-subquery pattern in its decorrelated form: one
    * partial+final aggregate builds per-customer totals (one row per
    * customer), which join back onto the fact table. The aggregate side is
    * NOT broadcast-hinted: it has one row per customer, which grows with
    * the population — a forced broadcast would build it on the driver and
    * OOM at scale. Both sides are keyed on custkey, so the planner picks a
    * broadcast only while stats say the aggregate is genuinely small, and
    * a shuffle equi-join otherwise.
    *
    * The boundary predicate runs ENTIRELY in integer cents:
    * `t_cents · n > Σ cents` — no division, no float accumulation, no
    * rounding. A float formulation (`price > round(avg, 2)`) measurably
    * diverges across engines: monetary averages land exactly on `.xx5`
    * whenever the order count is a power of two, and Spark's `round`
    * (HALF_UP on the shortest-decimal rendering) disagrees with DuckDB's
    * (on the binary value) for ~9% of customers. Integer arithmetic is
    * order-independent, so both engines agree bit-for-bit; the reported
    * average is likewise integer: ⌊(Σ + n/2) / n⌋ in cents.
    */
  def aboveAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = round($"o_totalprice" * 100).cast("long")
    val custAgg = Tables(s, dir, "orders")
      .select($"o_custkey".as("ck"), cents.as("tc"))
      .groupBy($"ck")
      .agg(sum($"tc").as("sum_cents"), count(lit(1)).as("n"))
    Tables(s, dir, "orders")
      .withColumn("tc", cents)
      .join(custAgg, $"o_custkey" === $"ck")
      .filter($"tc" * $"n" > $"sum_cents")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        expr("(2 * sum_cents + n) div (2 * n)").as("cust_avg_cents"))
      .orderBy($"o_orderkey")
  }

  /** Exact quantiles per market segment: median and p95 of order value.
    * Spark's `percentile` and DuckDB's `quantile_cont` both compute the
    * linearly-interpolated (type-7) quantile over the sorted values, so
    * the results align to the rounded digit. Exact quantiles buffer a
    * group's values in one task — correct while a (segment) group's
    * orders fit an executor; the 100 TB form swaps in
    * `approx_percentile` (t-digest-style mergeable sketch, map-side
    * combinable) exactly as `q_approx_distinct` twins `q_distinct_users`.
    */
  def percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"),
        count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }

  /** The 100 TB twin of [[percentiles]]: `approx_percentile`
    * (Greenwald–Khanna-style mergeable sketch). Where exact `percentile`
    * buffers every one of a group's values in a single task — billions of
    * doubles per market segment at corpus scale — the sketch is
    * constant-size per group, map-side combinable, and merges across
    * partitions, so the shuffle carries sketches, not values. Accuracy is
    * 1/10000 relative rank error here (sketch size grows with the inverse).
    *
    * No DuckDB oracle — sketch implementations differ across engines by
    * design (the `q_approx_distinct` precedent); the bounded-error spec
    * pins |approx − exact| per segment instead, and the driver records a
    * rows-only check.
    */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 4)
          .as("p50"),
        round(expr("approx_percentile(o_totalprice, 0.95, 10000)"), 4)
          .as("p95"),
        count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }

  /** Set operation: INTERSECT of customer keys with ordering custkeys.
    * Spark rewrites intersect as an aggregate+semi-join under the hood.
    */
  def setops(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, dir, "customer").select($"c_custkey")
    val o = Tables(s, dir, "orders").select($"o_custkey".as("c_custkey"))
    c.intersect(o).orderBy($"c_custkey").limit(100)
  }

  /** Set operation: EXCEPT (set difference with dedup) — ordering
    * custkeys minus the custkeys with any > 400k order. Spark rewrites
    * except as distinct + left-anti join (same set as `q_anti_join`, but
    * graded through the SET-OP surface: dedup semantics + the rewrite
    * are what this pins — closing the last oracle-untested member of
    * the §2.6 family after intersect and union).
    */
  def exceptBigSpenders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = Tables(s, dir, "orders").select($"o_custkey")
    val big = Tables(s, dir, "orders")
      .filter($"o_totalprice" > 400000).select($"o_custkey")
    all.except(big).orderBy($"o_custkey")
  }

  /** Market-basket co-occurrence: the top part pairs ordered together
    * (same order key), the association-mining primitive behind
    * "frequently bought together". Fan-out is bounded by
    * items-per-order² (≤17² per order in the 2026-08-13 regenerated
    * testdata, measured; ~1.2 M total pairs at sf0.1) — never parts²,
    * never orders² — and the surviving pair counts reduce through a
    * partial+final agg before a TakeOrdered cut with a total-ordered
    * tie-break (counts tie heavily at the tail; (n, part_a, part_b)
    * pins the boundary on both engines).
    *
    * Pair generation (r20, guide §2.4 — remove shuffles outright): the
    * r1–r19 form was a self-JOIN on the order key — lineitem scanned
    * twice and exchanged twice (both join inputs hash by l_orderkey)
    * before the pair rows even existed. An order's items all land in
    * one group anyway, so ONE exchange of (l_orderkey, l_partkey) into
    * a collect_list and a codegen'd HOF expansion inside the row
    * (for each element x, every element y with y > x — exactly the
    * join's row-pair semantics, duplicate part multiplicities included)
    * produce the same pair multiset from a single scan and a single
    * order-keyed exchange. At 100 TB that halves the bytes the pair
    * stage shuffles and deletes the join sort entirely; the per-order
    * expansion stays ≤ 17² in-row.
    */
  def basketPairs(s: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_partkey")
    li.groupBy($"l_orderkey")
      .agg(collect_list($"l_partkey").as("ps"))
      .select(explode(flatten(transform($"ps", x =>
        transform(filter($"ps", y => y > x),
          y => struct(x.as("part_a"), y.as("part_b")))))).as("p"))
      .select($"p.part_a".as("part_a"), $"p.part_b".as("part_b"))
      .groupBy($"part_a", $"part_b")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), $"part_a", $"part_b")
      .limit(topK)
  }

  /** RFM profile per market segment — the customer-value decomposition
    * (recency / frequency / monetary) every CRM-ish analytics layer
    * ships, aggregated to segment granularity: per-customer RFM rows
    * reduce to 5 segment profiles. Recency anchors on the corpus's max
    * order date (a 1-row broadcast — the `q_tfidf` scalar-side idiom)
    * in whole DATE days, frequency and monetary are exact
    * integer/DECIMAL sums; the only floats are the reported means,
    * rounded at the boundary. Two partial+final aggs (customer, then
    * segment) + an UNHINTED dim join (customer scales with sf; the
    * planner broadcasts while stats allow it) — group rows only ever
    * shuffle.
    */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perCust = Tables(s, dir, "orders")
      .select($"o_custkey", $"o_orderdate".cast("date").as("d"),
        $"o_totalprice")
      .groupBy($"o_custkey")
      .agg(max($"d").as("last_d"),
        count(lit(1)).as("frequency"),
        sum($"o_totalprice".cast("decimal(12,2)")).as("monetary"))
    val anchor = Tables(s, dir, "orders")
      .agg(max($"o_orderdate".cast("date")).as("anchor"))
    val seg = Tables(s, dir, "customer")
      .select($"c_custkey", $"c_mktsegment")
    perCust
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff($"anchor", $"last_d").cast("long"))
      .join(seg, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        round(avg($"recency_days"), 4).as("avg_recency_days"),
        round(avg($"frequency"), 4).as("avg_frequency"),
        sum($"monetary").cast("double").as("total_monetary"))
      .orderBy($"c_mktsegment")
  }

  /** BAG-semantics set ops — the ALL variants the distinct forms above
    * can't express: per customer, how many orders survive EXCEPT ALL
    * against the > 300k ones (multiplicity subtraction, not membership)
    * and how many pair up under INTERSECT ALL (min of multiplicities).
    *
    * Because both bags come from the SAME orders scan (big ⊆ all by
    * construction), the multiset algebra collapses to counting: per key,
    * INTERSECT ALL = min(n_all, n_big) and EXCEPT ALL = n_all − that —
    * so the graded plan is ONE scan + ONE partial+final aggregate with a
    * conditional count, no exceptAll/intersectAll row machinery at all
    * (Spark plans each of those as its own aggregate + generate, and the
    * full-outer recombine added a third shuffle — measured ~0.4 s of the
    * full-surface total at sf0.1). `least()` keeps the algebra honest
    * rather than assuming the subset relation. The generic bag-op form
    * survives as [[setopsAllViaBagOps]], pinned row-identical in
    * RelationalSpec, so the operator coverage (exceptAll/intersectAll)
    * stays exercised. 100 TB shape: only (key, n_all, n_big) group rows
    * ever shuffle.
    */
  def setopsAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select($"o_custkey", $"o_totalprice")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_all"),
        count(when($"o_totalprice" > 300000, 1)).as("n_big"))
      .select($"o_custkey",
        ($"n_all" - least($"n_all", $"n_big")).as("n_residual"),
        least($"n_all", $"n_big").as("n_matched"))
      .orderBy($"o_custkey")
  }

  /** The same result through Spark's native bag operators — EXCEPT ALL /
    * INTERSECT ALL on the row streams, recombined by full outer join.
    * Not graded (the fused counting form above is); kept as the operator-
    * coverage twin and pinned row-identical to [[setopsAll]].
    */
  def setopsAllViaBagOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = Tables(s, dir, "orders").select($"o_custkey")
    val big = Tables(s, dir, "orders")
      .filter($"o_totalprice" > 300000).select($"o_custkey")
    val exceptAll = all.exceptAll(big)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_residual"))
    val intersectAll = all.intersectAll(big)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_matched"))
    exceptAll.join(intersectAll, Seq("o_custkey"), "full_outer")
      .select($"o_custkey",
        coalesce($"n_residual", lit(0L)).as("n_residual"),
        coalesce($"n_matched", lit(0L)).as("n_matched"))
      .orderBy($"o_custkey")
  }

  /** Pivot: order revenue by market segment × order priority, one column
    * per priority. The pivot value list is EXPLICIT (all five TPC-H
    * priorities) — with an implicit list Spark runs an extra distinct job
    * to discover values and the output column set depends on the data;
    * pinning the list keeps the plan one-pass (single partial+final agg,
    * no discovery scan) and the schema stable, which is also the 100 TB
    * discipline: a pivot over an unbounded value domain is a bug, not a
    * query. Columns are renamed to identifier-safe names matching the
    * oracle's conditional-aggregation aliases.
    */
  def pivotPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderpriority",
        $"o_totalprice".cast("decimal(12,2)").as("price"))
      .groupBy($"c_mktsegment")
      .pivot("o_orderpriority", priorities)
      .agg(sum($"price"))
      .select($"c_mktsegment",
        col("1-URGENT").cast("double").as("p_urgent"),
        col("2-HIGH").cast("double").as("p_high"),
        col("3-MEDIUM").cast("double").as("p_medium"),
        col("4-NOT SPECIFIED").cast("double").as("p_notspec"),
        col("5-LOW").cast("double").as("p_low"))
      .orderBy($"c_mktsegment")
  }

  /** Small-quantity revenue (the TPC-H Q17 pattern): total revenue from
    * brand lineitems whose quantity is below 20% of their part's average
    * quantity — the second decorrelated-aggregate shape next to
    * `q_above_avg` (per-PART average folded back onto the fact rows,
    * where above_avg decorrelates per-customer). The boundary runs in
    * pure integers: `5·qty·n < Σqty` ⇔ `qty < 0.2·avg` exactly in
    * rationals, so no float average can split the predicate between
    * engines (quantities are small integers — double sums are exact).
    * The brand filter prunes the part side to ~1/25 before anything
    * joins; the per-part aggregate side stays UNHINTED (same planner
    * freedom argument as above_avg).
    */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val parts = Tables(s, dir, "part")
      .filter($"p_brand" === "Brand#11").select($"p_partkey")
    val f = Tables(s, dir, "lineitem")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(parts, $"l_partkey" === $"p_partkey")
    val perPart = f.groupBy($"l_partkey".as("pk"))
      .agg(sum($"l_quantity").cast("long").as("sum_q"),
        count(lit(1)).as("n"))
    f.join(perPart, $"l_partkey" === $"pk")
      .filter($"l_quantity".cast("long") * 5L * $"n" < $"sum_q")
      .agg(count(lit(1)).as("n_small"),
        round(sum($"l_extendedprice".cast("decimal(12,2)")).cast("double")
          / 7.0, 2).as("avg_yearly"))
  }

  /** Orders by ISO weekday (1=Monday … 7=Sunday): the date-part family
    * beyond EXTRACT(YEAR). Spark's `weekday()` is 0-based Monday, so
    * +1 aligns it with DuckDB's `isodow` exactly — both compute from the
    * DATE value, no timezone in play. One partial+final agg over 7
    * groups.
    */
  def weekdayOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select((weekday($"o_orderdate") + 1).cast("long").as("iso_weekday"),
        $"o_totalprice")
      .groupBy($"iso_weekday")
      .agg(count(lit(1)).as("n_orders"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double")
          .as("revenue"))
      .orderBy($"iso_weekday")
  }

  /** Unpivot (melt): the wide pivot table back to long form — one row
    * per (segment, priority measure). Spark's `unpivot` plans an Expand
    * (each input row fans out to 5 output rows map-side, like cube), so
    * the round trip pivot→unpivot costs one extra narrow projection, no
    * extra shuffle. The long form is what a charting/export consumer
    * reads; the oracle recomputes it directly from the base join with
    * the measure names mapped.
    */
  def unpivotPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    pivotPriority(s, dir)
      .unpivot(Array($"c_mktsegment"),
        Array($"p_urgent", $"p_high", $"p_medium", $"p_notspec", $"p_low"),
        "priority", "revenue")
      .orderBy($"c_mktsegment", $"priority")
  }

  /** CUBE over (returnflag, linestatus) with an explicit grouping_id —
    * the grouping-sets sibling of `q_rollup_revenue` (ROLLUP emits the
    * prefix lattice; CUBE emits all 2ⁿ subsets, including the
    * linestatus-only slice a rollup can't produce). grouping_id
    * disambiguates "NULL because aggregated away" from a genuine NULL
    * key. Spark plans one Expand + single hash agg: each input row fans
    * out to the 4 grouping sets map-side, so the shuffle still carries
    * groups, not rows — the same shape a hand-written UNION ALL of 4
    * aggregates would need 4 scans for.
    */
  def cubeReturns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .select($"l_returnflag", $"l_linestatus",
        $"l_quantity".cast("decimal(12,2)").as("qty"))
      .cube($"l_returnflag", $"l_linestatus")
      .agg(grouping_id().cast("long").as("gid"),
        sum($"qty").cast("long").as("sum_qty"),
        count(lit(1)).as("n"))
      .select($"gid", $"l_returnflag", $"l_linestatus", $"sum_qty", $"n")
      .orderBy($"gid", asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"))
  }

  /** Arbitrary GROUPING SETS — the lattice form neither rollup (prefix
    * sets) nor cube (all 2ⁿ sets) expresses: exactly the two
    * one-dimensional marginals (segment) and (priority), no combined
    * cell, no grand total. One Expand + one hash agg — two independent
    * reports for one scan of the join, which at 100 TB is the whole
    * point of asking the lattice instead of running two queries.
    */
  def groupingSetsRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_orderpriority",
        $"o_totalprice".cast("decimal(12,2)").as("price"))
      .groupingSets(Seq(Seq($"c_mktsegment"), Seq($"o_orderpriority")),
        $"c_mktsegment", $"o_orderpriority")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        sum($"price").cast("double").as("revenue"))
      .select($"gid", $"c_mktsegment", $"o_orderpriority", $"n_orders",
        $"revenue")
      .orderBy($"gid", asc_nulls_first("c_mktsegment"),
        asc_nulls_first("o_orderpriority"))
  }

  /** Fixed-width histogram of order value: bucket = floor(price/25k).
    * Bucketing is one IEEE division + floor on the same parquet doubles in
    * both engines — bit-deterministic — and the aggregate is a single
    * partial+final hash agg over ~30 buckets, so at any scale only the
    * bucket rows cross the shuffle. The per-bucket min/max are the raw
    * doubles (exact), the sum is exact DECIMAL.
    */
  def histogramOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select(floor($"o_totalprice" / 25000.0).cast("long").as("bucket"),
        $"o_totalprice")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        min($"o_totalprice").as("lo"),
        max($"o_totalprice").as("hi"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double")
          .as("sum_price"))
      .orderBy($"bucket")
  }

  /** Statistical moments + bivariate aggregates per return flag: sample
    * stddev/variance of extendedprice, Pearson correlation and sample
    * covariance of (quantity, extendedprice).
    *
    * NOT the built-in `var_samp`/`corr`: those accumulate co-moments in
    * double, where partition/merge order perturbs the low bits — at price
    * scale (var ≈ 5·10⁸) the 2-dp round would need ~1e-11 relative
    * agreement with a single-threaded oracle, inside the noise band.
    * Instead this aggregates EXACT sufficient statistics — Σx, Σy, Σx²,
    * Σy², Σxy in DECIMAL (inputs have 2 dp, so the products have 4 dp and
    * the sums are exact integers scaled by 10⁴) — and finalizes with the
    * textbook formulas in double. Both engines then round the SAME exact
    * decimals to the SAME doubles and apply the SAME IEEE ops (÷, √ are
    * correctly rounded), so the result is bit-deterministic.
    *
    * This is also the mergeable-at-scale shape: the shuffle carries 6
    * exact scalars per group (associative, order-free), and a 100 TB
    * two-pass Welford is unnecessary because DECIMAL(38,4) absorbs ~10³⁴
    * before overflow.
    */
  def statsMoments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = $"l_extendedprice".cast("decimal(12,2)")
    val y = $"l_quantity".cast("decimal(12,2)")
    Tables(s, dir, "lineitem")
      .select($"l_returnflag", x.as("x"), y.as("y"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"x").cast("double").as("sx"),
        sum($"y").cast("double").as("sy"),
        sum($"x" * $"x").cast("double").as("sxx"),
        sum($"y" * $"y").cast("double").as("syy"),
        sum($"x" * $"y").cast("double").as("sxy"))
      .select($"l_returnflag", $"n",
        round(sqrt(($"n" * $"sxx" - $"sx" * $"sx") /
          ($"n" * ($"n" - lit(1.0)))), 2).as("sd_price"),
        round(($"n" * $"sxx" - $"sx" * $"sx") /
          ($"n" * ($"n" - lit(1.0))), 2).as("var_price"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          (sqrt($"n" * $"sxx" - $"sx" * $"sx") *
            sqrt($"n" * $"syy" - $"sy" * $"sy")), 4).as("corr_qty_price"),
        round(($"n" * $"sxy" - $"sx" * $"sy") /
          ($"n" * ($"n" - lit(1.0))), 2).as("cov_qty_price"))
      .orderBy($"l_returnflag")
  }

  /** Inter-order cadence per market segment: for each customer the gaps
    * (in whole days) between consecutive orders, aggregated per segment —
    * the repeat-purchase / churn-signal shape (median time-to-next-order
    * is what a retention model trains on).
    *
    * Shape for scale: one shuffle partitions orders by customer for the
    * `lag` window; gaps then reduce per segment through an unhinted
    * customer join (planner-chosen broadcast at graded scale, shuffle
    * fallback beyond) and a partial+final hash agg over 5 group rows. Gap
    * arithmetic runs on DATE values (whole-day integers) so both engines
    * agree exactly; the mean is the only float, rounded at the boundary.
    * Ties (same customer, same order date) are broken by o_orderkey —
    * the gap multiset is already order-independent under date ties, the
    * tie-break just pins the frame.
    */
  def orderGaps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byCust = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"d", $"o_orderkey")
    val gaps = Tables(s, dir, "orders")
      .select($"o_custkey", $"o_orderdate".cast("date").as("d"),
        $"o_orderkey")
      .withColumn("prev_d", lag($"d", 1).over(byCust))
      .filter($"prev_d".isNotNull)
      .select($"o_custkey", datediff($"d", $"prev_d").cast("long")
        .as("gap_days"))
    val seg = Tables(s, dir, "customer")
      .select($"c_custkey", $"c_mktsegment")
    gaps.join(seg, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_gaps"),
        sum($"gap_days").as("sum_gap_days"),
        max($"gap_days").as("max_gap_days"),
        round(avg($"gap_days"), 4).as("avg_gap_days"))
      .orderBy($"c_mktsegment")
  }

  /** National market share (the TPC-H Q8 shape): within one region's
    * customer revenue, the share contributed by one nation, per order
    * year — the conditional-sum-over-star-join ratio report. The region
    * filter lands on the broadcast region dim and prunes through the
    * joins BEFORE the fact side aggregates; the share is a single
    * IEEE division of two exact DECIMAL sums (no float accumulation),
    * so `round(share, 6)` is engine-stable. ~7 year rows out.
    */
  def marketShare(s: SparkSession, dir: String,
                  region: String = "ASIA",
                  nation: String = "NATION_2"): DataFrame = {
    import s.implicits._
    val rev = discountedRev
    starJoin(s, dir)
      .filter($"r_name" === region)
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg(
        round(coalesce(sum(when($"n_name" === nation, rev)), lit(0))
          .cast("double") / sum(rev).cast("double"), 6).as("share"),
        round(coalesce(sum(when($"n_name" === nation, rev)), lit(0)))
          .cast("long").as("nation_rev"),
        round(sum(rev)).cast("long").as("total_rev"))
      .select($"o_year", $"nation_rev", $"total_rev", $"share")
      .orderBy($"o_year")
  }

  /** Oracle for [[marketShare]] — same star join, conditional DECIMAL
    * sums, and single-division share.
    */
  val marketShareOracle: String =
    """WITH j AS (SELECT year(o_orderdate) AS o_year, n_name,
      |  CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1 - l_discount AS DECIMAL(4,2)) AS rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'ASIA')
      |SELECT CAST(o_year AS BIGINT) AS o_year,
      |  CAST(ROUND(COALESCE(SUM(CASE WHEN n_name = 'NATION_2'
      |    THEN rev END), 0)) AS BIGINT) AS nation_rev,
      |  CAST(ROUND(SUM(rev)) AS BIGINT) AS total_rev,
      |  ROUND(CAST(COALESCE(SUM(CASE WHEN n_name = 'NATION_2'
      |      THEN rev END), 0) AS DOUBLE)
      |    / CAST(SUM(rev) AS DOUBLE), 6) AS share
      |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin

  /** High-value parts by GLOBAL revenue-share threshold (the TPC-H Q11
    * shape): parts whose total discounted revenue runs ≥ 10% above the
    * MEAN part's — the global-scalar-threshold decorrelation next to
    * `q_above_avg`'s per-group one, selective at every scale because the
    * bar tracks the part population. The per-part rollup is computed
    * once (localCheckpoint'd group rows) and feeds BOTH the 1-row
    * (total, n_parts) scalar and the filter, so the fact table scans
    * exactly once; the boundary `rev · 10 · n > total · 11` is exact
    * DECIMAL/integer arithmetic — no float threshold to split engines.
    */
  def topValueParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perPart = Tables(s, dir, "lineitem")
      .groupBy($"l_partkey")
      .agg(sum(discountedRev).as("rev"))
      .localCheckpoint(false)
    val total = perPart.agg(sum($"rev").as("total"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      .filter($"rev" * 10 * $"n_parts" > $"total" * 11)
      .join(Tables(s, dir, "part"), $"l_partkey" === $"p_partkey")
      .orderBy($"rev".desc, $"p_partkey")
      .select($"p_partkey", $"p_name",
        round($"rev").cast("long").as("value_rev"),
        round($"rev".cast("double") / $"total".cast("double"), 6)
          .as("share"))
  }

  /** Customer order-count distribution (the TPC-H Q13 shape): how many
    * customers placed exactly n orders, INCLUDING the zero bucket — the
    * LEFT OUTER + count-of-counts report (account-activity histograms,
    * engagement tiers). `count(o_orderkey)` counts non-NULL rows, so an
    * orderless customer lands in bucket 0 instead of vanishing — the
    * semantics an inner join would silently lose.
    *
    * Scale shape: one keyed left join (customer side hash-partitioned
    * with the orders side — no broadcast needed in either direction at
    * scale), then two group-rows-only aggregates (per-customer counts →
    * ≤ max-orders histogram rows).
    */
  def custOrderDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
      .groupBy($"n_orders")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"n_customers".desc, $"n_orders".desc)
  }

  /** Oracle for [[custOrderDist]]. */
  val custOrderDistOracle: String =
    """WITH pc AS (SELECT c_custkey,
      |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
      |FROM pc GROUP BY n_orders
      |ORDER BY n_customers DESC, n_orders DESC""".stripMargin

  /** Top supplier(s) by revenue in a quarter (the TPC-H Q15 shape):
    * EVERY supplier achieving the maximum — the ties-preserving
    * global-max equality filter, a different decorrelation than top-k
    * (`q_topk_parts` cuts at a count; this cuts at a VALUE, and two
    * suppliers at the same exact revenue both surface). The revenue
    * sums and the max are exact DECIMALs, so the equality cannot split
    * on float noise in either engine.
    *
    * Scale shape: the per-supplier rollup is computed once
    * (localCheckpoint'd group rows) feeding BOTH the 1-row max and the
    * filter; the supplier dim join is unhinted.
    */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perSupp = Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
      .groupBy($"l_suppkey")
      .agg(sum(discountedRev).as("rev"))
      .localCheckpoint(false)
    val mx = perSupp.agg(max($"rev").as("mx"))
    perSupp.crossJoin(broadcast(mx))
      .filter($"rev" === $"mx")
      .join(Tables(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        round($"rev").cast("long").as("total_rev"))
      .orderBy($"s_suppkey")
  }

  /** Oracle for [[topSupplier]] — same exact-DECIMAL rollup and
    * max-equality cut.
    */
  val topSupplierOracle: String =
    """WITH ps AS (SELECT l_suppkey,
      |  SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1 - l_discount AS DECIMAL(4,2))) AS rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey),
      |m AS (SELECT MAX(rev) AS mx FROM ps)
      |SELECT s_suppkey, s_name, CAST(ROUND(rev) AS BIGINT) AS total_rev
      |FROM ps CROSS JOIN m
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev = mx
      |ORDER BY s_suppkey""".stripMargin

  /** Oracle for [[topValueParts]] — same exact-DECIMAL rollup and
    * integer-scaled above-mean threshold.
    */
  val topValuePartsOracle: String =
    """WITH pp AS (SELECT l_partkey,
      |  SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1 - l_discount AS DECIMAL(4,2))) AS rev
      |  FROM lineitem GROUP BY l_partkey),
      |t AS (SELECT SUM(rev) AS total, COUNT(*) AS n_parts FROM pp)
      |SELECT p_partkey, p_name,
      |  CAST(ROUND(rev) AS BIGINT) AS value_rev,
      |  ROUND(CAST(rev AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
      |FROM pp CROSS JOIN t
      |JOIN part ON l_partkey = p_partkey
      |WHERE rev * 10 * n_parts > total * 11
      |ORDER BY rev DESC, p_partkey""".stripMargin

  /** Bilateral trade volumes (the TPC-H Q7 shape): discounted revenue
    * shipped between a fixed nation PAIR, in both directions, by ship
    * year — the two-sided dimension chain (supplier's nation AND
    * customer's nation on one fact row) that self-joins the nation dim
    * under two roles.
    *
    * Scale shape: both nation roles are filtered to the pair BEFORE
    * joining — the two-row nation slices broadcast into supplier and
    * (through orders) customer, so the fact table shrinks to the pair's
    * suppliers' lines FIRST and only that sliver meets the
    * orders-customer chain; the only non-broadcast join is
    * lineitem⋈orders on the order key (the bucketed-fact seam every
    * star query here shares). The pair predicate — exclude same-nation
    * flows — runs on two broadcast-joined dim columns, not on fact data.
    */
  def nationTrade(s: SparkSession, dir: String,
                  nationA: String = "NATION_1",
                  nationB: String = "NATION_2"): DataFrame = {
    import s.implicits._
    val pair = Tables(s, dir, "nation")
      .filter($"n_name".isin(nationA, nationB))
    val suppN = Tables(s, dir, "supplier")
      .join(broadcast(pair.select($"n_nationkey".as("sk"),
        $"n_name".as("supp_nation"))), $"s_nationkey" === $"sk")
      .select($"s_suppkey", $"supp_nation")
    val custN = Tables(s, dir, "customer")
      .join(broadcast(pair.select($"n_nationkey".as("ck"),
        $"n_name".as("cust_nation"))), $"c_nationkey" === $"ck")
      .select($"c_custkey", $"cust_nation")
    val rev = discountedRev
    Tables(s, dir, "lineitem")
      .join(broadcast(suppN), $"l_suppkey" === $"s_suppkey")
      .join(Tables(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(custN), $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation",
        year($"l_shipdate").cast("long").as("l_year"))
      .agg(moneySum(rev).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** Oracle for [[nationTrade]] — same two-role nation join and exact
    * DECIMAL rollup (the pair filter spelled as the direction
    * disjunction, which equals filtered-roles + inequality).
    */
  val nationTradeOracle: String =
    """WITH j AS (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1 - l_discount AS DECIMAL(4,2)) AS rev
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |SELECT supp_nation, cust_nation, CAST(l_year AS BIGINT) AS l_year,
      |  CAST(ROUND(SUM(rev)) AS BIGINT) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM j GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Promotion revenue share (the TPC-H Q14 shape) by ship year: the
    * conditional-aggregate ratio — promo-typed parts' discounted revenue
    * over all revenue, one pass, no second scan for the denominator.
    *
    * Scale shape: part is the broadcast dim; numerator and denominator
    * are two conditional DECIMAL sums in ONE partial+final aggregate (the
    * `q_market_share` discipline), so the fact table is read once and the
    * shuffle carries |years| group rows. The share divides the two exact
    * DECIMAL sums in double at the reporting boundary only.
    */
  def promoShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = discountedRev
    Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part")
        .select($"p_partkey", $"p_type")), $"l_partkey" === $"p_partkey")
      .groupBy(year($"l_shipdate").cast("long").as("l_year"))
      .agg(
        round(coalesce(sum(when($"p_type" === "PROMO", rev)), lit(0)))
          .cast("long").as("promo_rev"),
        moneySum(rev).as("total_rev"),
        round(lit(100.0) *
          coalesce(sum(when($"p_type" === "PROMO", rev)), lit(0))
            .cast("double") / sum(rev).cast("double"), 6).as("promo_share"))
      .orderBy($"l_year")
  }

  /** Oracle for [[promoShare]] — same conditional DECIMAL sums and
    * single-division share.
    */
  val promoShareOracle: String =
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(ROUND(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN
      |    CAST(l_extendedprice AS DECIMAL(12,2))
      |      * CAST(1 - l_discount AS DECIMAL(4,2)) END), 0)) AS BIGINT)
      |    AS promo_rev,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1 - l_discount AS DECIMAL(4,2)))) AS BIGINT) AS total_rev,
      |  ROUND(100.0 * CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN
      |      CAST(l_extendedprice AS DECIMAL(12,2))
      |        * CAST(1 - l_discount AS DECIMAL(4,2)) END), 0) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE), 6)
      |    AS promo_share
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** OR-of-conjunctions revenue cut (the TPC-H Q19 shape): three
    * (brand, size-range, quantity-range) branches unioned by OR — the
    * disjunctive join residual that defeats naive pushdown.
    *
    * Scale shape: the full disjunction must run after the part join (it
    * mixes columns of both tables), but Catalyst's OR-projection
    * extraction derives each side's single-table component on its own —
    * the plan shows the per-branch quantity OR pushed into the lineitem
    * scan and the (brand, size) OR pushed into the part scan as
    * PushedFilters (verified on this plan; no hand-stated prefilters
    * needed). The join is a broadcast of the
    * pruned part slice; output is one total row.
    */
  def disjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = discountedRev
    val li = Tables(s, dir, "lineitem")
    val p = Tables(s, dir, "part")
      .select($"p_partkey", $"p_brand", $"p_size")
    li.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#9" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1, 20)) ||
        ($"p_brand" === "Brand#13" && $"p_size".between(10, 30) &&
          $"l_quantity".between(10, 35)) ||
        ($"p_brand" === "Brand#20" && $"p_size".between(20, 50) &&
          $"l_quantity".between(20, 50)))
      .agg(moneySum(rev).as("revenue"), count(lit(1)).as("n_lines"))
  }

  /** Oracle for [[disjunctiveRevenue]] — the bare disjunction (the
    * implied prunes are plan-side optimizations, row-set-neutral).
    */
  val disjunctiveRevenueOracle: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1 - l_discount AS DECIMAL(4,2)))) AS BIGINT) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
      |    AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
      |    AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  /** Dormant high-balance customers (the TPC-H Q22 shape): customers
    * whose balance beats the positive-balance average yet placed no
    * order above 300 000, rolled up per market segment — the
    * scalar-subquery cut composed with an anti join (the fixture's
    * every-customer-orders fact makes the classic bare no-orders form
    * empty, the `q_anti_join` note; the big-order variant keeps the
    * shape AND the rows).
    *
    * Scale shape: the positive-balance average is ONE scalar row
    * cross-broadcast into the customer scan (no decorrelation needed —
    * stated as the 1-row join the optimizer would rewrite to); the anti
    * join's build side is pre-filtered to big orders only. Both engines
    * compare against the identical double average; balances aggregate
    * exact-DECIMAL.
    */
  def custBalance(s: SparkSession, dir: String,
                  bigOrder: Int = 300000): DataFrame = {
    import s.implicits._
    val cust = Tables(s, dir, "customer")
    val bar = cust.filter($"c_acctbal" > 0)
      .agg(avg($"c_acctbal".cast("double")).as("bar"))
    val big = Tables(s, dir, "orders")
      .filter($"o_totalprice" > bigOrder).select($"o_custkey")
    cust.crossJoin(broadcast(bar))
      .filter($"c_acctbal".cast("double") > $"bar")
      .join(big, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
        moneySum($"c_acctbal".cast(Money)).as("total_bal"),
        round(sum($"c_acctbal".cast(Money)).cast("double") /
          count(lit(1)), 4).as("avg_bal"))
      .orderBy($"c_mktsegment")
  }

  /** Oracle for [[custBalance]] — same scalar bar, NOT EXISTS spelled
    * as the engine's native correlated form.
    */
  val custBalanceOracle: String =
    """WITH pos AS (SELECT AVG(CAST(c_acctbal AS DOUBLE)) AS bar
      |  FROM customer WHERE c_acctbal > 0)
      |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_custs,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2)))) AS BIGINT)
      |    AS total_bal,
      |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
      |    / COUNT(*), 4) AS avg_bal
      |FROM customer CROSS JOIN pos
      |WHERE CAST(c_acctbal AS DOUBLE) > bar
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Late-fulfillment order counts (the TPC-H Q4 shape): orders with at
    * least one line shipped more than 60 days after the order date,
    * counted per priority per year — the correlated-EXISTS
    * decorrelation (the fixture carries no commit/receipt dates, so
    * lateness is ship-vs-order lag; same plan class).
    *
    * Scale shape: EXISTS compiles to a LEFT SEMI join on the order key
    * with the lag comparison as the join residual — the probe side
    * deduplicates order keys inside the join (no DISTINCT pass), and
    * the only shuffle is the fact-fact order-key join every star query
    * shares. The date arithmetic is timestamp + literal interval,
    * identical in both engines.
    */
  def lateOrders(s: SparkSession, dir: String, lagDays: Int = 60)
  : DataFrame = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    Tables(s, dir, "orders")
      .join(li, $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr(s"INTERVAL $lagDays DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority",
        year($"o_orderdate").cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_late_orders"))
      .orderBy($"o_orderpriority", $"o_year")
  }

  /** Oracle for [[lateOrders]] — the EXISTS form DuckDB decorrelates to
    * the same semi join.
    */
  val lateOrdersOracle: String =
    """SELECT o_orderpriority,
      |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(COUNT(*) AS BIGINT) AS n_late_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Top unshipped-revenue orders (the TPC-H Q3 shape): BUILDING-segment
    * orders placed before the cutoff whose lines ship after it, ranked
    * by outstanding discounted revenue, top 10.
    *
    * Scale shape: both date predicates push into their scans; the
    * segment filter prunes customer before its broadcast; per-order
    * rollup is partial+final on the order key; the top-10 ORDERS ON THE
    * EXACT DECIMAL (a rounded-long sort key would let two engines rank
    * .5-boundary orders differently) as a TakeOrderedAndProject — heaps,
    * no global sort.
    */
  def unshippedOrders(s: SparkSession, dir: String,
                      cutoff: String = "1996-06-01",
                      segment: String = "BUILDING"): DataFrame = {
    import s.implicits._
    val rev = discountedRev
    val cust = Tables(s, dir, "customer")
      .filter($"c_mktsegment" === segment).select($"c_custkey")
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" > lit(cutoff).cast("timestamp"))
      .join(Tables(s, dir, "orders")
        .filter($"o_orderdate" < lit(cutoff).cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate".cast("date").as("o_date"),
        $"o_orderpriority")
      .agg(sum(rev).as("rev_exact"))
      .orderBy($"rev_exact".desc, $"l_orderkey")
      .limit(10)
      .select($"l_orderkey", round($"rev_exact").cast("long").as("revenue"),
        $"o_date", $"o_orderpriority")
  }

  /** Oracle for [[unshippedOrders]] — same exact-DECIMAL rank order. */
  val unshippedOrdersOracle: String =
    """SELECT l_orderkey,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1 - l_discount AS DECIMAL(4,2)))) AS BIGINT) AS revenue,
      |  CAST(o_orderdate AS DATE) AS o_date, o_orderpriority
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-06-01'
      |  AND l_shipdate > TIMESTAMP '1996-06-01'
      |GROUP BY 1, 3, 4
      |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |  * CAST(1 - l_discount AS DECIMAL(4,2))) DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Local-supplier volume (the TPC-H Q5 shape): revenue within one
    * region's year where the supplying and buying nation COINCIDE — the
    * two-role dimension chain with an EQUALITY between the roles
    * (`q_nation_trade` is the between-pair complement).
    *
    * Scale shape: region filter prunes nation before broadcast; the
    * supplier join carries the `c_nationkey = s_nationkey` residual so
    * non-local flows die inside the join, not in a post-filter; the
    * only shuffle join is lineitem⋈orders.
    */
  def localSupplierVolume(s: SparkSession, dir: String,
                          region: String = "ASIA",
                          year: String = "1996"): DataFrame = {
    import s.implicits._
    val rev = discountedRev
    val nat = Tables(s, dir, "nation")
      .join(broadcast(Tables(s, dir, "region")
        .filter($"r_name" === region)), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit(s"$year-01-01").cast("timestamp") &&
          $"o_orderdate" < lit(s"${year.toInt + 1}-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables(s, dir, "customer")
        .select($"c_custkey", $"c_nationkey")), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables(s, dir, "supplier")
          .select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(moneySum(rev).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** Oracle for [[localSupplierVolume]]. (The revenue rank order is on
    * the ROUNDED long here — a whole-units tie across nations is broken
    * by name identically in both engines.)
    */
  val localSupplierVolumeOracle: String =
    """SELECT n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1 - l_discount AS DECIMAL(4,2)))) AS BIGINT) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin

  /** Forecast-revenue-change (the TPC-H Q6 shape): what raising the
    * 5–7 % discounts on small-quantity 1996 lines would have recovered —
    * ONE scan, every predicate pushed, one global aggregate. The
    * simplest shape in the inventory, kept because it is the canonical
    * pushdown/row-group-skipping benchmark.
    */
  def revenueForecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice".cast(Money) *
          $"l_discount".cast(Pct))).cast("long").as("revenue_delta"),
        count(lit(1)).as("n_lines"))
  }

  /** Oracle for [[revenueForecast]]. */
  val revenueForecastOracle: String =
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(l_discount AS DECIMAL(4,2)))) AS BIGINT) AS revenue_delta,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Returned-item reporting (the TPC-H Q10 shape): the 20 customers
    * with the most revenue lost to returns in a half-year window —
    * the churn-risk list. Rank on the EXACT DECIMAL with the customer
    * key tie-break (the [[unshippedOrders]] discipline), emitted
    * rounded.
    */
  def returnedCustomers(s: SparkSession, dir: String, k: Int = 20)
  : DataFrame = {
    import s.implicits._
    val rev = discountedRev
    Tables(s, dir, "lineitem")
      .filter($"l_returnflag" === "R")
      .join(Tables(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-07-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables(s, dir, "nation")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(sum(rev).as("rev_exact"))
      .orderBy($"rev_exact".desc, $"c_custkey")
      .limit(k)
      .select($"c_custkey", $"c_name", $"n_name",
        round($"rev_exact").cast("long").as("lost_revenue"))
  }

  /** Oracle for [[returnedCustomers]] — same exact-DECIMAL rank. */
  val returnedCustomersOracle: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(1 - l_discount AS DECIMAL(4,2)))) AS BIGINT)
      |    AS lost_revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |GROUP BY 1, 2, 3
      |ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |  * CAST(1 - l_discount AS DECIMAL(4,2))) DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q18 shape (q_big_orders, round 14): large-volume orders —
    * the HAVING-on-grouped-sum + enrichment-join classic this surface
    * was still missing. Orders whose total lineitem quantity clears
    * `bar` (exact DECIMAL sum of the DOUBLE quantities — both engines
    * sum the same 2-dp rationals exactly, so the > comparison cannot
    * split on accumulation order), joined to order+customer attributes,
    * ranked (total desc, orderkey).
    *
    * Scale shape: ONE map-side-combined groupBy over the fact table →
    * order-grain group rows; the HAVING bar prunes to a tiny survivor
    * set BEFORE the dimension joins (orders join is order-grain keyed;
    * customer side broadcasts). No window, no second fact scan.
    */
  def bigOrders(s: SparkSession, dir: String, bar: Long = 250)
  : DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val totals = Tables(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast(dec)).as("tq"),
        count(lit(1)).as("n_lines"))
      .filter($"tq" > lit(bar).cast(dec))
    totals
      .join(Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables(s, dir, "customer")
        .select($"c_custkey", $"c_name")),
        $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"c_name", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"tq".cast("double").as("total_qty"), $"n_lines")
      .orderBy($"total_qty".desc, $"o_orderkey")
  }

  /** Oracle for [[bigOrders]] — same exact-DECIMAL bar and rank. A def
    * interpolating `bar` so a non-default call can never silently
    * differ-compare against the default-bar oracle (round-15 advice).
    */
  def bigOrdersOracle(bar: Long = 250): String =
    s"""SELECT c_custkey, c_name, o_orderkey,
      |  strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |    AS total_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2, 3, 4
      |HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > $bar
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  /** TPC-H Q2 shape (q_cheapest_supplier, round 14): the
    * correlated-minimum classic — for every part with any
    * EUROPE-supplied lineitem, the supplier offering the LOWEST mean
    * unit price there (ties → smallest suppkey). The min is taken per
    * part over (part, supplier) group rows, never by re-scanning the
    * fact table per part (Q2's correlated subquery, decorrelated the
    * way every engine's optimizer rewrites it).
    *
    * Determinism: unit price = total extendedprice / total quantity
    * per (part, supplier) — BOTH sums accumulated as exact
    * DECIMAL(12,2) (the 2-dp source rationals sum exactly in any
    * order), each cast to double, then ONE IEEE divide. No per-line
    * arithmetic at all: the round-14 first cut rounded
    * extendedprice/quantity to 6 dp per LINE, which is the same
    * engine-splitting halfway-rounding class this file documents for
    * the post-division case (Spark rounds the shortest-decimal repr,
    * DuckDB the binary double) — fixture-green couldn't prove no
    * corpus lands a per-line quotient on a halfway case, so round 15
    * removed the lossy step entirely (the round-15 advice). The two
    * sum-doubles are bit-identical across engines (same rational →
    * same nearest double), so the quotient is too. Rank =
    * (price, suppkey) via min over a struct (no window needed —
    * argmin as a single aggregate over group rows).
    */
  def cheapestSupplier(s: SparkSession, dir: String,
                       region: String = "EUROPE"): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val sup = Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")),
        $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables(s, dir, "region")
        .filter($"r_name" === region)),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name")
    val perPs = Tables(s, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey",
        $"l_extendedprice".cast(dec).as("ep"),
        $"l_quantity".cast(dec).as("qty"))
      .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
      .groupBy($"l_partkey", $"s_suppkey", $"s_name")
      .agg((sum($"ep").cast("double") / sum($"qty").cast("double"))
        .as("price"))
    perPs
      .groupBy($"l_partkey")
      .agg(min(struct($"price", $"s_suppkey", $"s_name")).as("w"))
      .select($"l_partkey".as("p_partkey"), $"w.s_suppkey".as("s_suppkey"),
        $"w.s_name".as("s_name"), $"w.price".as("unit_price"))
      .orderBy($"p_partkey")
  }

  /** Oracle for [[cheapestSupplier]] — same decorrelated argmin. */
  val cheapestSupplierOracle: String =
    """WITH sup AS (SELECT s_suppkey, s_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |ps AS (SELECT l_partkey, s_suppkey, s_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |    AS price
      |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
      |  GROUP BY 1, 2, 3),
      |best AS (SELECT l_partkey, s_suppkey, s_name, price,
      |  ROW_NUMBER() OVER (PARTITION BY l_partkey
      |    ORDER BY price, s_suppkey) AS rn FROM ps)
      |SELECT l_partkey AS p_partkey, s_suppkey, s_name,
      |  price AS unit_price
      |FROM best WHERE rn = 1 ORDER BY p_partkey""".stripMargin

  /** TPC-H Q21 shape (q_blocking_suppliers, round 15): suppliers who
    * were the SOLE late shipper on a multi-supplier order — the
    * double-correlation classic (EXISTS another supplier on the order,
    * NOT EXISTS another LATE supplier) this surface was still missing.
    * This fixture carries no commit/receipt dates, so "late" is
    * `l_shipdate > o_orderdate + graceDays`; the predicate differs
    * from stock Q21, the SHAPE — two correlated sub-queries
    * decorrelated into group-row aggregates — is exactly Q21's, the
    * way every engine's optimizer rewrites it.
    *
    * Scale shape: ONE fact-table pass, ONE corpus exchange — the
    * `q_cohort_retention` collect_set trick: per order, the distinct
    * supplier set and the distinct LATE-supplier set collect inside
    * the same order-keyed aggregate (sets are order-bounded — a few
    * elements), the Q21 predicate becomes two size() tests on the
    * group row, and the sole late supplier IS the singleton set
    * element. The first cut ((order, supplier) pre-aggregate + either
    * a self-join or an order window) paid a second pass or sort over
    * what is effectively line grain — (order, supplier) is 598 807
    * groups from 600 000 lines at sf0.1 — and measured 1.19 s / 0.97 s
    * vs ~0.8 s warm for this form (same session; the residual is the
    * scan-join 0.26 + one corpus exchange + two group-row tail stages
    * at the 0.135 s class — the composed stage floor). The supplier dim
    * broadcasts. Exact date arithmetic only — no float anywhere, so
    * no engine-split surface.
    */
  def blockingSuppliers(s: SparkSession, dir: String,
                        graceDays: Int = 90): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey")
      .agg(collect_set($"l_suppkey").as("supps"),
        collect_set(when(
          $"l_shipdate" > date_add($"o_orderdate", graceDays),
          $"l_suppkey")).as("late_supps"))
      .filter(size($"supps") >= 2 && size($"late_supps") === 1)
      .select(element_at($"late_supps", 1).as("l_suppkey"))
      .join(broadcast(Tables(s, dir, "supplier")
        .select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_suppkey", $"s_name")
      .agg(count(lit(1)).as("n_blocked_orders"))
      .orderBy($"n_blocked_orders".desc, $"s_suppkey")
  }

  /** Oracle for [[blockingSuppliers]] — the same decorrelated form. */
  def blockingSuppliersOracle(graceDays: Int = 90): String =
    s"""WITH ls AS (SELECT l_orderkey, l_suppkey,
      |  MAX(CASE WHEN l_shipdate > o_orderdate
      |    + INTERVAL $graceDays DAY THEN 1 ELSE 0 END) AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2),
      |po AS (SELECT l_orderkey FROM ls GROUP BY 1
      |  HAVING COUNT(*) >= 2 AND SUM(late) = 1)
      |SELECT s_suppkey, s_name,
      |  CAST(COUNT(*) AS BIGINT) AS n_blocked_orders
      |FROM ls JOIN po USING (l_orderkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE ls.late = 1
      |GROUP BY 1, 2
      |ORDER BY n_blocked_orders DESC, s_suppkey""".stripMargin
}
