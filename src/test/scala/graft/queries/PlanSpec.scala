package graft.queries

import graft.SparkSpec

/** Physical-plan assertions (SURVEY.md §4: "Catalyst built-in; verify via
  * explain in tests") — the plans we would want at 100 TB, checked at
  * sf0.001 (plan shape is scale-invariant for these properties).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q05: filters and projection reach the parquet scan") {
    val p = plan("q05_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // pruned read schema: only the 5 selected columns survive to the scan
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("q03: dimension joins broadcast; fact join does not broadcast lineitem") {
    val p = plan("q03_segment_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    // lineitem-orders is the big join: must be a shuffle join at scale...
    // at sf0.001 AQE may broadcast it too; assert customer side broadcast
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q01: hash aggregate with map-side partial aggregation") {
    val p = plan("q01_pricing_summary")
    // partial + final pair: two HashAggregate nodes over the same keys
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q11: anti join stays a join (no subquery re-execution)") {
    val p = plan("q11_customers_without_orders")
    assert(p.contains("LeftAnti"), p)
  }

  test("d02: prefix-filter candidates via equi-join; counting verify; no all-pairs shape") {
    val p = plan("d02_jaccard_pairs")
    // candidate generation and verification must be equi-joins on the
    // fingerprint (hash/merge join), never an all-pairs shape
    assert(!p.contains("CartesianProduct"), "pair generation must not be a cross join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "pair generation must not be all-pairs")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), p)
    // df counts and the |A∩B| counting verify are hash aggregates
    // (map-side partial); no per-pair array materialization anywhere
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.toLowerCase.contains("array_intersect"),
      "verify is the counting join, not array intersection")
    // r12: the r11-widened shared silver must not leak into the
    // STANDALONE plan — with sharing off, d02 needs only (doc_id, sh),
    // so the token-stats kernel and source column are column-pruned
    // out of every scan/projection
    assert(!p.contains("graft_tokenstats"),
      "standalone d02 plan did not prune the widened silver's n_tokens kernel")
  }

  test("q29: every dimension broadcasts; the fact join is never a cartesian") {
    val p = plan("q29_local_supplier_volume")
    // region/nation/customer/supplier all ride broadcast exchanges; at
    // this SF orders broadcasts too (size-based) — at scale it becomes
    // the one shuffle join, which is the intended Q5 shape
    assert("BroadcastExchange".r.findAllIn(p).length >= 4, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("PushedFilters"), p)
  }

  test("c05: rule battery is scan-fused — the only exchange is the output order") {
    val p = plan("c05_gopher_rules")
    // the sole Exchange is the rangepartitioning for the output order
    // (now BELOW the kernels — round-10 sort-below-kernel pattern, so
    // the sampling pass never recomputes tokenStats/stopHits); the
    // rules still compose as one fused per-row predicate stage at
    // 100 TB, just post-shuffle instead of in the scan
    assert("Exchange".r.findAllIn(p).length <= 1, p)
    assert(!p.contains("ScalaUDF"), "rule inputs must stay codegen kernels")
  }

  test("v03: blocked pairs shuffle on label, never cross-join globally") {
    val p = plan("v03_neardup_blocked")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v01: query side broadcasts (BroadcastNestedLoopJoin over the base scan)") {
    val p = plan("v01_knn_exact")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("entry: flagship query runs and returns rows (driver smoke parity)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("q03: date-range predicate pushes to the orders scan (no year() wrap)") {
    val p = plan("q03_segment_revenue")
    assert(p.contains("GreaterThanOrEqual(o_orderdate") || p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p)
    assert(!p.contains("year(o_orderdate"), "year() in a filter defeats row-group pruning")
  }

  test("q08: symmetric diff is ONE scan of orders + one aggregation, not 4-scan exceptAll") {
    val p = plan("q08_symmetric_diff")
    assert("FileScan parquet".r.findAllIn(p).length === 1, p)
    assert(!p.contains("Except"), p)
    // pushable range predicate at the scan
    assert(p.contains("GreaterThanOrEqual(o_orderdate") || p.contains("IsNotNull(o_orderdate)"), p)
  }

  test("q02: top-k is TakeOrdered, not a global sort") {
    val p = plan("q02_topk_order_revenue")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("c01: contamination join is a semi-join on the shingle, never all-pairs") {
    val p = plan("c01_contamination")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftSemi"), "eval-vocabulary membership must be a semi join")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "hit counts need partial aggregation")
  }

  test("t12: repetition ratio partially aggregates; no all-pairs shape") {
    val p = plan("t12_repetition")
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, "per-source agg needs a map-side partial")
  }

  test("p03: budget cut never sorts a whole source in one task") {
    val p = plan("p03_token_budget")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    // every window spec must include the range bucket: no window may
    // partition by source alone over the raw doc stream except the
    // per-bucket-totals window, whose input is #buckets rows/source —
    // mechanically, all specs mention bkt (as partition key or order key)
    val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p).toList
    assert(specs.nonEmpty, p)
    assert(specs.forall(_.contains("bkt")),
      s"a window neither partitions nor orders by the range bucket:\n${specs.mkString("\n")}")
    // histogram side broadcasts (one tiny array row per source)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("p04: weights dim broadcasts; sampling accounting aggregates map-side") {
    val p = plan("p04_weighted_sample")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, "stratum agg needs a map-side partial")
  }

  test("m02: metadata synthesis is narrow — no exchange below the final sort") {
    val p = plan("m02_media_meta")
    assert("Exchange".r.findAllIn(p).length === 1, s"only the orderBy may shuffle:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("t07: bigram counts partially aggregate before the shuffle") {
    val p = plan("t07_bigram_topk")
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("r01: the trailing-window anchor is a broadcast one-row join, not a driver collect") {
    val p = plan("r01_weather_avg_province")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // partial + final hash agg over province
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), s"anchor join must broadcast:\n$p")
  }

  test("r02: top-k hottest is TakeOrdered over the ranking window, no global sort") {
    val p = plan("r02_weather_topk_hottest")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("d09: winner pick partially aggregates before the passage shuffle; no window, no cross join") {
    val p = plan("d09_passage_dedup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // min(struct(doc_id, pos)) must be an aggregate with a partial/final
    // pair (map-side combine absorbs hot passages) — NOT a row_number
    // window, which would serialize each hot passage into one task
    assert(!p.contains("Window"), "winner pick must not be a per-key window")
    assert("SortAggregate|HashAggregate".r.findAllIn(p).length >= 4,
      s"expected partial+final aggregate pairs for winners and reassembly:\n$p")
  }

  test("t13: tf is born in the scan (no doc-term aggregate); df partial+final; no cartesian") {
    val p = plan("t13_keyword_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // round-10 rewrite: the TermCounts kernel emits already-counted
    // (term, tf) pairs map-side, so ONLY df aggregates — exactly one
    // partial+final pair, where the old explode → groupBy(doc_id, term)
    // shape needed two (and shuffled every raw token pair)
    assert(p.contains("graft_termcounts"), p)
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs >= 2 && aggs <= 3, s"expected only df's aggregate pair, got $aggs:\n$p")
    assert(p.contains("Window"), p)
  }

  test("v09: candidate frontier pre-trims map-side (WindowGroupLimit below the exchange)") {
    val p = plan("v09_knn_int8")
    // the codes crossJoin is the deliberate broadcast of the 10-query set
    assert(!p.contains("CartesianProduct"), p)
    // phase-1 top-C must carry Spark's WindowGroupLimit pushdown: one
    // instance BELOW the q_id exchange so each map task trims to its
    // local top-20 by integer score before any row moves — without it
    // every scored candidate (n_corpus x n_q rows) would cross the wire
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      s"expected partial+final WindowGroupLimit pair for the frontier:\n$p")
  }

  test("c06: threshold relation broadcasts; doc pass stays map-side; rank pass is narrow") {
    val p = plan("c06_adaptive_quality")
    // the sources-sized threshold relation must come back as a
    // broadcast, and the per-doc membership pass must join map-side —
    // never a corpus-wide repartition on source for the docs
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    // r11: the threshold is the explicit rank-neighbor lerp (shared
    // IEEE formula with the oracle — ADVICE r10), so ONE window exists,
    // but it ranks a two-column (source, q) projection, not the corpus:
    // its scan must read only text+source (column pruning proves the
    // narrow shape; n_tokens/doc_id never enter the sort)
    assert("Window \\[row_number".r.findAllIn(p).length === 1, p)
    assert(p.contains("ReadSchema: struct<text:string,source:string>"),
      s"rank pass must scan only (text, source):\n$p")
    // exchanges: the rank pass's hash partition, the per-source count
    // agg, and the final agg's partial/final pair — nothing else (the
    // doc-side membership pass contributes zero exchanges below the
    // output order)
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 3, p)
  }

  test("v08b: IVF assignment is the scan kernel — no window, no assignment join") {
    val p = plan("v08b_semdedup_dial")
    // the argmax must be graft_nearest_centroid fused into the scan:
    // the old crossJoin+row_number shape materialized n·nlist vector
    // rows through a per-vec_id sort — n^1.5 at the √n dial (measured
    // 172 s at 100×; the kernel reads 12.5 s)
    assert(p.contains("graft_nearest_centroid"), p)
    assert(!p.contains("Window"), s"assignment must not rank n·nlist rows:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the only join left is the within-cluster pair join + the
    // keep-verdict left join — on c_id/vec_id, never a centroid join
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x04: the returned plan reads the checkpointed counts, not the corpus again") {
    val p = plan("x04_cms_heavy_hitters")
    // one-pass rewrite: by the time the result DF is built, the
    // vocabulary-sized counts relation is (lazily) checkpointed — the
    // top-10 side must scan blocks, not re-tokenize documents
    assert(!p.contains("FileScan parquet"), s"top-10 must not rescan the corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("x03: bloom probe is map-side (no exchange between scan and the probe project)") {
    val p = plan("x03_bloom_decontam")
    // the flags relation is ONE row — its crossJoin must be the
    // deliberate broadcast shape, never a shuffled cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // exact side stays a semi-join on the shingle
    assert(p.contains("LeftSemi"), p)
  }

  test("v12: the probed-list union reaches the code scan as static PartitionFilters") {
    val p = plan("v12_ivfadc")
    // the partitioned PqIndex scan must carry the probed c_id INSET —
    // directory-level pruning, not a post-scan filter (at production
    // nlist this is the nprobe/nlist read-fraction win)
    assert(p.contains("PartitionFilters: [c_id") && p.contains("INSET"),
      "probed union not pushed into the partitioned code scan")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("v10d: trained sharded gate keeps the shuffle-hash probe join") {
    val p = plan("v10d_sharded_trained")
    // the shard-codebook join must stay ShuffledHashJoin (the shape
    // that survives a non-broadcastable codebook), v10c's contract on
    // the trained book
    assert(p.contains("ShuffledHashJoin"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p)
  }
}
