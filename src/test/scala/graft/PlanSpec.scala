package graft

/** Plan-shape assertions: the optimizations SCALE.md claims must be
  * visible in the executed plans — predicate/projection pushdown into
  * the parquet scans and broadcast joins for the dimensions. A
  * regression here (e.g. an operator change that breaks pushdown) fails
  * the build even though results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution.executedPlan.toString

  test("q02: filter and projection are pushed into the parquet scan") {
    val p = plan("q02_filter_project_limit")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,49.0)]"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate:timestamp>"))
  }

  test("q03: point lookup pushes the key predicate") {
    val p = plan("q03_point_lookup")
    assert(p.contains("EqualTo(o_orderkey,42)"))
  }

  test("q05: all four dimensions broadcast — the fact side never shuffles for joins") {
    val p = plan("q05_star_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q04: dimension-enrich is a broadcast left-outer join") {
    val p = plan("q04_dim_enrich_default")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"))
  }

  test("q06/q07: semi and anti joins read only the key column on the probe side") {
    assert(plan("q06_semi_join").contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"))
    assert(plan("q07_anti_join").contains("ReadSchema: struct<o_custkey:bigint,o_orderstatus:string>"))
  }

  test("q01: aggregation is two-phase (partial before the exchange)") {
    val p = plan("q01_pricing_summary")
    val firstAgg = p.indexOf("HashAggregate")
    val exch = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exch >= 0)
    assert("HashAggregate".r.findAllIn(p).size >= 2) // partial + final
  }

  test("q45: genre dimension-enrich broadcasts (no shuffle for the dim join)") {
    val p = plan("q45_epg_import")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q48: child load is one shuffle + object hash aggregate, parents join broadcast-or-shuffle on the key") {
    val p = plan("q48_child_load")
    // collect_list aggregates partially before the exchange (two phases)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q32: minhash signatures are ONE aggregate over the postings — no k-way explode") {
    val p = plan("q32_dedup_minhash_lsh")
    // the signature stage reads the staged posting parquet, aggregates
    // by id once (partial+final), and the only explode left is the
    // per-doc band struct fan-out — no Generate feeding an Exchange of
    // k× posting rows
    assert(!p.contains("sequence(0, 11"), "k-way posting explode must be gone")
  }

  test("q50: IVF centroid assignment broadcasts the centroid set") {
    val p = plan("q50_knn_ivf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q60: pivot with explicit values has no value-discovery pass or row expansion") {
    val p = plan("q60_pivot_matrix")
    // the plan is one scan feeding (hr,type)-count + pivotfirst, each
    // two-phase; a values-less pivot would first run a separate
    // distinct JOB over event_type, and a conditional-agg emulation
    // via grouping sets would Expand the rows
    assert("FileScan".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Expand"), "explicit-values pivot must not expand rows")
  }

  test("q67: unpivot is row-local — no Exchange in the plan") {
    val p = plan("q67_unpivot")
    assert(!p.contains("Exchange"), s"unpivot must not shuffle:\n$p")
  }

  test("q68: bucket assignment broadcasts the edges — no sort-merge join of the fact side") {
    val p = plan("q68_bucketize")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q63: k-means assignment broadcasts centroids and collapses via one aggregate pair") {
    val p = plan("q63_kmeans_step")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q76/q78: z-order keys and PII redaction are row-local — no Exchange") {
    assert(!plan("q76_zorder_layout").contains("Exchange"))
    assert(!plan("q78_pii_redact").contains("Exchange"))
  }

  test("q74: bloom prefilter tests run on the probe side BEFORE its exchange") {
    val p = plan("q74_bloom_semijoin")
    // the bitmap word test (shiftright of the position column) must sit
    // in a Filter below the semi-join, not after it
    val filt = p.indexOf("shiftright")
    val semi = p.indexOf("LeftSemi")
    assert(filt >= 0 && semi >= 0 && filt > semi,
      s"prefilter must be below (printed after) the semi join:\n$p")
  }

  test("q70: benchmark n-gram probe broadcasts — no corpus self-join") {
    val p = plan("q70_decontaminate")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q81: HLL state is a two-phase aggregate (map-side max combine)") {
    val p = plan("q81_hll_distinct")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q107: BM25 top-k is a TakeOrdered, never a global sort; tiny frames broadcast") {
    val p = plan("q107_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must use the bounded-heap TakeOrdered:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "df/stats frames are broadcast-sized — no sort-merge joins expected")
  }

  test("q106: LM scoring aggregates are two-phase (map-side partials)") {
    val p = plan("q106_lm_surprisal")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("CartesianProduct"),
      "the vocab-size scalar joins via broadcast, not a cartesian")
  }

  test("S9: scans are lazy until an action; a cached count memoizes (no file rescan)") {
    // laziness: composing transforms on a declared table runs NO jobs
    // (the read itself may run one footer/schema-inference job — that
    // is metadata, not data)
    val base = Tables.lineitem(spark, sf001)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = base.filter(org.apache.spark.sql.functions.col("l_quantity") > 1.0)
      .select("l_orderkey", "l_quantity")
      .groupBy("l_orderkey").count()
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length == before,
      "composing filter/project/aggregate must not launch a job")
    // memoized count: after cache(), the second count reads the
    // in-memory relation, not the parquet files
    val cached = df.cache()
    cached.count()
    val second = cached.queryExecution.executedPlan.toString
    assert(second.contains("InMemoryTableScan"),
      s"second action must hit the cache, not the file scan:\n$second")
    cached.unpersist()
  }

  test("q140/q142: gopher battery and blocklist scoring are row-local — no Exchange") {
    assert(!plan("q140_gopher_rules").contains("Exchange"),
      "gopher rule battery must be one pass over the scan")
    assert(!plan("q142_blocklist").contains("Exchange"),
      "blocklist scoring must be one pass over the scan")
  }

  test("q141: repetition rules are ONE tagged explode + aggregates — a single gram scan") {
    val p = plan("q141_repetition_rules")
    // nine n-gram streams must come from one Generate, not nine scans
    assert("Generate".r.findAllIn(p).length == 1, s"expected one explode:\n$p")
    assert("(?m)Scan parquet".r.findAllIn(p).length == 1, s"expected one file scan:\n$p")
  }

  test("q145: RRF fusion joins two k-bounded lists — the corpus never reaches the fusion join") {
    val p = plan("q145_hybrid_rrf")
    // both retriever lists are rank-limited before the full-outer fusion
    assert(p.contains("FullOuter") || p.contains("full_outer"), s"fusion must be full outer:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"BM25 side must stay TakeOrdered:\n$p")
  }

  test("q164: PII scrubbing is row-local — no Exchange, no Generate") {
    val p = plan("q164_pii_scrub")
    assert(!p.contains("Exchange"), s"PII scrub must be one pass over the scan:\n$p")
    assert(!p.contains("Generate"), s"PII scrub must not explode:\n$p")
  }

  test("q158: fused classifier inference is one scan — no Exchange, no model join at all") {
    val p = plan("q158_hashed_classifier")
    assert(!p.contains("Exchange"), s"fused inference must be scan-local:\n$p")
    assert(!p.contains("Join"), s"the model rides inside the expression, never a join:\n$p")
  }

  test("q162: heavy-hitter screen is broadcast lookups before the exact aggregate") {
    val p = plan("q162_heavy_hitters")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"all d sketch-row lookups must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"screen must not shuffle the fact side:\n$p")
  }

  test("q161: snapshot diff is ONE co-partitioned join — both sides share the key exchange") {
    val p = plan("q161_snapshot_diff")
    assert("(?m)SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).size == 1,
      s"diff must be exactly one shuffle join:\n$p")
    assert(p.contains("FullOuter"), s"diff join must be full outer:\n$p")
  }
}
