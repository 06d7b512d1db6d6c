package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins the PLANS.md scale judgments that are cheap to regress silently:
  * filter pushdown reaching the parquet scan, column pruning, broadcast
  * choice for bounded dimensions, and single-exchange compaction. A change
  * that quietly turns one of these into a full scan or an extra shuffle
  * fails HERE, not in a 100 TB postmortem.
  */
class PlanPinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def executed(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def countOf(s: String, token: String): Int =
    s.sliding(token.length).count(_ == token)

  test("q01: shipdate filter pushed to the lineitem scan; columns pruned") {
    val p = executed("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    // 7 of 11 lineitem columns read — the ReadSchema must not be the full row
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment"), "q01 must not read unused wide columns")
  }

  test("q03: dimension filters pushed; customer joined broadcast") {
    val p = executed("q03_shipping_priority")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)") ||
      p.contains("c_mktsegment = BUILDING"), "segment filter must reach the scan")
  }

  test("cdc01: latest-state compaction is ONE hash aggregate, no window sort") {
    val p = executed("cdc01_latest_state")
    assert(!p.contains("Window"), "compaction must be max_by agg, not a window")
    // partial + final aggregate pair around a single exchange
    assert(countOf(p, "Exchange") <= 2, s"compaction grew extra exchanges:\n$p")
  }

  test("q33: lineitem scan reads only the probe column for the range join") {
    val p = executed("q33_range_join")
    assert(p.contains("l_extendedprice"))
    assert(!p.contains("l_quantity"), "range join must prune to 1 of 11 columns")
  }

  test("q36: per-group top-k is partial aggregation, never a whole-group sort") {
    val p = executed("q36_topk_per_group")
    assert(!p.contains("Window"))
    assert(p.contains("partial_topkagg") || p.contains("TopKAgg") ||
      p.contains("ObjectHashAggregate"), s"expected aggregate-based top-k:\n$p")
  }

  test("txt24: the Bloom probe runs BELOW the train-gram distinct's exchange") {
    // the whole point of the pruned variant: only eval-adjacent train grams
    // may enter the distinct. In the executed plan the bit_get membership
    // conjuncts must appear on the train side BEFORE the (partial) distinct
    // aggregate — i.e. the first distinct-aggregate mention comes after a
    // bit_get mention in the bottom-up plan text of that branch.
    val plan = SparkEntry.queries("txt24_ngram_overlap_pruned")(spark, dir)
      .queryExecution.executedPlan
    val p = plan.toString
    assert(p.contains("bit_get"), "membership probe must be codegen'd bit_get")
    // the bitset reaches the probe as a broadcast, never a plan literal
    assert(p.contains("Broadcast"), "bloom bitset must broadcast")
    assert(!p.contains("[76,"), "bitset words must not be inlined as a literal")
    // structural: some aggregate's SUBTREE contains the probe — the filter
    // feeds the distinct from below rather than running after it.
    // (AdaptiveSparkPlanExec hides its children from collect — unwrap.)
    val inner = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val probeBelowAgg = inner.collect {
      case n if n.nodeName.contains("Aggregate") => n.toString.contains("bit_get")
    }.exists(identity)
    assert(probeBelowAgg, s"bloom probe must run below the distinct:\n$p")
  }

  test("txt26: mixture thresholds broadcast; the corpus is never re-shuffled") {
    val p = executed("txt26_mixture_sample")
    assert(p.contains("BroadcastHashJoin"),
      s"per-source thresholds must broadcast into the corpus scan:\n$p")
    // acceptance is a filter, not an aggregation over the corpus: exactly
    // the threshold aggregate's exchanges, no corpus-wide extra exchange
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle for the join")
  }

  test("vec10: ADC scan joins codes hashed; codebooks and dtable broadcast") {
    val p = executed("vec10_ann_pq")
    // the compressed scan's joins are all bounded-side broadcasts — the
    // corpus side (codes) must never be nested-looped or cartesian'd
    assert(!p.contains("CartesianProduct"), s"ADC scan went all-pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"codebook/dtable joins must stay equi-joins:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"m·k codebooks and probe dtable must broadcast:\n$p")
  }

  test("txt25: sequence packing windows stay bucket-local (no global sort)") {
    val p = executed("txt25_pack_sequences")
    // the running sum must partition by the bucket column — a global-order
    // window would show an Exchange SinglePartition + Sort over everything
    assert(!p.contains("SinglePartition"),
      s"packing must never single-partition the corpus:\n$p")
    assert(p.contains("Window"), "per-bucket running sum is a window")
  }

  test("txt28: winnow selection is one shuffle-free, collapse-proof projection") {
    val p = graft.operators.Dedup.winnowFingerprints(
        graft.Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      "fingerprint selection must not shuffle — only selected fps may")
    // the let-binding pin: tokenization must appear ONCE in the projection.
    // If projection collapse ever re-inlines it per window element, the
    // plan shows split() once per read — and sf0.01 goes O(n²)
    assert(countOf(p, "split(") == 1,
      s"tokenize must be let-bound (evaluated once), plan shows:\n$p")
  }

  test("txt28: winnow projection computed once at runtime (AQE stage reuse)") {
    // winnowMatches reads the fingerprint set four ways (hot-fp aggregate,
    // anti-join, both self-join sides); the initial plan shows four copies
    // of the projection, but they all hang below the SAME distinct
    // exchange — AQE must dedupe them into one materialized stage, or the
    // corpus is tokenized four times at 100 TB
    val df = SparkEntry.queries("txt28_winnow_matches")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"winnow projection must be computed once, plan:\n$p")
  }

  test("txt38: boilerplate removal — hash joins only, no window, no cartesian") {
    val p = executed("txt38_boilerplate_lines")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"boilerplate df/join must stay equi-keyed:\n$p")
    assert(!p.contains("Window"),
      "df-count and reassembly are aggregations, never a window sort")
  }

  test("txt39: the position window reuses the shard exchange (one shuffle)") {
    val p = executed("txt39_shard_export")
    assert(countOf(p, "Exchange") <= 1,
      s"shard window must run inside the shard partitioning:\n$p")
    assert(!p.contains("SinglePartition"),
      "no global ordering anywhere in the export")
  }

  test("mm06: phash pairing meets in band buckets, never all-pairs") {
    val p = executed("mm06_phash_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"banded candidate join must be an equi-join on (band, value):\n$p")
  }

  test("vec13: decontamination joins train cells hashed, never all-pairs") {
    val p = executed("vec13_semantic_decontaminate")
    // eval×train must go through the cell equi-join — the ONLY permitted
    // nested-loop is the 16-row centroid broadcast for probe assignment
    assert(!p.contains("CartesianProduct"),
      s"decontamination went all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"cell join must be an equi-join:\n$p")
  }

  test("txt29: calibration thresholds broadcast back; corpus never sorted") {
    val p = executed("txt29_quality_calibrate")
    assert(p.contains("BroadcastHashJoin"),
      "per-source thresholds are a tiny frame — must broadcast onto the corpus")
    // the quantile comes from a histogram window over |sources|·bins rows,
    // partitioned BY SOURCE — the corpus (and even the histogram) must
    // never pass through a single-partition exchange or a global window
    assert(!p.contains("SinglePartition"),
      s"no single-partition exchange anywhere in the calibration plan:\n$p")
    assert(countOf(p, "SortMergeJoin") == 0,
      "threshold join must not sort-merge the corpus")
  }

  test("txt44: chunking is scan → project → generate — ZERO exchanges") {
    val p = executed("txt44_chunk_overlap")
    assert(countOf(p, "Exchange") == 0,
      s"per-document chunking must never shuffle:\n$p")
    assert(!p.contains("text,"), "only doc_id + text may be read")
  }

  test("cdc24: history alignment is one keyed equi-join, never a nested loop") {
    val p = executed("cdc24_history_align")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval residual must ride the user_id equi-join:\n$p")
  }

  test("vec21: balanced sampling ranks inside the cell partitioning — no global sort") {
    val p = executed("vec21_balanced_sample")
    assert(!p.contains("SinglePartition"),
      s"per-cell quota must not serialize through one partition:\n$p")
  }

  test("q55: daily sketches partial-aggregate before the shuffle; exact side joins broadcast") {
    val p = executed("q55_sketch_reaggregate")
    assert(p.contains("partial_hll_union_agg"),
      s"sketch merge must partial-aggregate map-side (the re-aggregation claim):\n$p")
    assert(p.contains("hll_sketch_agg"),
      s"daily sketches must be built by hll_sketch_agg:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "the |event_types|-row exact side must broadcast")
  }

  test("q57: PageRank rounds are hash joins + partial aggs — no nested loop, no collect") {
    val p = executed("q57_pagerank")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"graph rounds must stay equi-join shaped:\n$p")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"contributions must partial-aggregate before the dst shuffle:\n$p")
  }

  test("q61: the (user, day) dedup runs BEFORE the window-contribution explode") {
    val p = executed("q61_rolling_actives")
    // the Generate (explode) must consume the deduped frame, not raw events —
    // in the executed plan the first aggregate pair appears below Generate
    val gi = p.indexOf("Generate")
    val ai = p.indexOf("HashAggregate")
    assert(gi >= 0 && ai >= 0, s"expected Generate and HashAggregate:\n$p")
    assert(p.lastIndexOf("HashAggregate") > gi,
      s"dedup aggregate must sit beneath the explode:\n$p")
  }

  test("txt53: fuzzy candidates meet on neighborhood strings — never all-pairs") {
    val p = executed("txt53_fuzzy_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"deletion-neighborhood join must be an equi-join:\n$p")
  }

  test("q64: regression is ONE aggregation — no joins, no second scan") {
    val p = executed("q64_group_regression")
    assert(!p.contains("Join"), s"sufficient statistics need no join:\n$p")
    assert(countOf(p, "Exchange") <= 1,
      s"one partial→final aggregate exchange only:\n$p")
  }

  test("q67: N constraint checks cost ONE scan of orders (plus key distinct)") {
    val p = executed("q67_constraint_audit")
    // one orders scan feeds every conditional count; a per-check scan would
    // show up as multiple FileScans over orders
    assert(countOf(p, "orders.parquet") <= 1,
      s"constraint audit must not re-scan per check:\n$p")
  }

  test("q68: histogram boundaries broadcast; rows never globally sorted") {
    val p = executed("q68_equidepth_histogram")
    assert(p.contains("BroadcastExchange"),
      s"the one-row boundary frame must broadcast:\n$p")
    assert(!p.contains("SinglePartition") || !p.contains("Window"),
      s"equi-depth must not NTILE through a single-partition window:\n$p")
  }

  test("txt51: blocklist candidates meet on anchor tokens — never N·contains") {
    val p = executed("txt51_blocklist_filter")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"anchor candidate generation must be an equi-join:\n$p")
  }

  test("vec25: inertia report scans the assignment once, centroids broadcast") {
    val p = executed("vec25_inertia_report")
    assert(p.contains("BroadcastExchange"),
      s"centroids must broadcast into the SSE pass:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs:\n$p")
  }

  test("mm13: cross-modal scoring is one id equi-join, no cartesian") {
    val p = executed("mm13_cross_modal_align")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"text-vector ⋈ embedding must be an equi-join:\n$p")
  }

  test("q70: table diff is ONE full-outer join, output filtered before report") {
    val p = executed("q70_table_diff")
    assert(countOf(p, "SortMergeJoin") + countOf(p, "ShuffledHashJoin") +
      countOf(p, "BroadcastHashJoin") == 1,
      s"diff must be exactly one key join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs:\n$p")
  }

  test("q79: KS windows run on the bin frame, the corpus is never sorted") {
    val p = executed("q79_ks_drift")
    // the only sorts allowed are inside the 20-row bin-frame windows;
    // a global sort of orders would be a plan regression
    assert(!p.contains("rangepartitioning(o_totalprice"),
      s"corpus must not be range-partitioned for the bin windows:\n$p")
  }

  test("txt61: triplet mining rides banded candidates — no cartesian") {
    val p = executed("txt61_contrastive_triplets")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must meet in band buckets:\n$p")
  }

  test("mm14: fingerprint match joins on fp hashes — no cartesian") {
    val p = executed("mm14_audio_fingerprint")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the fp join is the inverted index:\n$p")
  }

  test("inventory invariant: every declared query publishes oracle SQL") {
    // the repo's core claim is ALL gates hash-exact against DuckDB; a query
    // added without an oracle would silently downgrade to a rows-only check
    // in the driver's ledger — fail HERE instead
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(qs == os,
      s"missing oracles: ${(qs -- os).toSeq.sorted.mkString(", ")}; " +
        s"orphan oracles: ${(os -- qs).toSeq.sorted.mkString(", ")}")
    assert(qs.size >= 279, s"inventory shrank: ${qs.size}")
  }

  test("no gate windows a data-proportional frame through a single partition") {
    // every global rank/cumsum/lead/lag in the gate surface rides
    // GlobalRank's two-level prefix decomposition (bucket-partitioned
    // windows + O(nBuckets) driver prefix) or TakeOrderedAndProject — a
    // WindowExec with an empty partitionSpec ("No Partition Defined…
    // Moving all data to a single partition") is a 100×-scale regression.
    // These are the 16 gates rewritten off that path; any new SinglePartition
    // exchange feeding a Window in them fails here.
    val rewritten = Seq(
      "txt75_spearman", "txt72_classifier_auc", "txt67_classifier_lift",
      "q85_abc_analysis", "q108_value_deciles", "cdc39_hot_keys",
      "cdc37_gap_detection", "q79_ks_drift", "q81_session_journeys",
      "q87_wow_change", "q88_skyline", "q95_cumulative_audience",
      "q109_max_drawdown", "txt54_vocab_coverage", "txt65_boilerplate_grams",
      "txt77_bm25_search",
      // GlobalRank-native from birth — pinned so they stay that way
      "q117_global_rank_leaderboard", "q118_ntile_quartiles")
    // precise check: a logical Window with an EMPTY partitionSpec is what
    // plans the single-partition WindowExec (scalar-aggregate SinglePartition
    // exchanges — one row per partition — are fine and expected)
    for (name <- rewritten) {
      val lp = SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
      val bad = lp.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name windows a frame with no partition spec:\n${bad.mkString("\n")}")
    }
  }

  test("brute pair loops build on the BOUNDED side (the vec39 1000× inversion, gate-inline sites)") {
    // the r14 1000× soak proved an unhinted probes.crossJoin(corpus) lets
    // the planner broadcast the multi-GB CORPUS and serialize the whole
    // pair loop onto the probe side's near-empty partition layout (vec39:
    // 643.8 s for linear work). Similarity's six brute faces were hinted
    // and guarded; these pins hold the GATE-INLINE sites (and the
    // SequenceAudit spine) to the same rule: every nested-loop join must
    // build (broadcast) its RIGHT child, and that child must be the
    // bounded relation — identified by a marker only the bounded side's
    // subtree can contain.
    def bnljs(df: DataFrame) = {
      val plan = df.queryExecution.executedPlan
      val inner = plan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      inner.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }
    }
    def pin(name: String, df: DataFrame, boundedMarker: String): Unit = {
      val js = bnljs(df)
      assert(js.nonEmpty, s"$name: expected a BroadcastNestedLoopJoin")
      js.foreach { j =>
        assert(j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight,
          s"$name: pair loop builds LEFT — the corpus side is broadcast:\n$j")
        assert(j.right.toString.contains(boundedMarker),
          s"$name: broadcast child is not the bounded side " +
            s"(no '$boundedMarker'):\n${j.right}")
      }
    }
    def gate(name: String) = SparkEntry.queries(name)(spark, dir)
    // vec33: ≤10 probes (vec_id < 10) vs the full embedding corpus
    pin("vec33_metric_agreement", gate("vec33_metric_agreement"), "vec_id")
    // vec30: the 3-row analogy-triple frame vs the corpus
    pin("vec30_analogy", gate("vec30_analogy"), "LocalTableScan")
    // mm16: ≤10 text-probe vectors vs the image-embedding corpus
    pin("mm16_cross_modal_recall", gate("mm16_cross_modal_recall"), "doc_id")
    // q58 spine: O(span) day rows (sequence-exploded off a 1-row agg) vs
    // the data-proportional distinct keys
    pin("q58_calendar_gap_fill", gate("q58_calendar_gap_fill"), "sequence")
  }

  test("merge write: compaction and bucketed write share ONE fused exchange") {
    // r15 optimization (guide §2.4): latest-state merges group by
    // (_bucket, keys) over input hash-distributed by _bucket, so the
    // compaction aggregate AND the partitioned write run off a single
    // exchange — the unfused shape paid two (agg re-key by key + write
    // re-key by _bucket). A regression (dropping _bucket from the grouping,
    // or re-adding a post-combine repartition) doubles the per-merge
    // shuffle at every scale and fails here.
    import org.apache.spark.sql.functions._
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (qe.toString.contains("InsertIntoHadoopFsRelation"))
          plans.add(qe.explainString(
            org.apache.spark.sql.execution.SimpleMode))
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val env = graft.cdc.ChangelogGen.fromEvents(spark, dir).toDF()
      val mx = env.agg(max(col("lsn"))).head().getLong(0)
      val t = java.nio.file.Files.createTempDirectory("fusepin").toString + "/t"
      graft.cdc.MaterializedTable.merge(spark, t,
        env.filter(col("lsn") < mx / 2), Seq("key"), Seq("lsn", "seq"))
      graft.cdc.MaterializedTable.merge(spark, t,
        env.filter(col("lsn") >= mx / 2), Seq("key"), Seq("lsn", "seq"))
      // listener fires async — wait for both write plans
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (plans.size < 2 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(plans.size >= 2, "expected two captured merge write plans")
      plans.forEach { p =>
        // count executed exchanges only: everything before the FIRST
        // "== Initial Plan ==" marker is final-plan tree (the write branch
        // plus the cached compaction plan's final section — the merge's
        // whole executed dataflow); the initial-plan sections that follow
        // reprint pre-AQE copies of the same exchanges
        val cut = p.indexOf("== Initial Plan ==")
        val executedRegion = if (cut < 0) p else p.substring(0, cut)
        val shuffles = executedRegion
          .sliding("Exchange hashpartitioning".length)
          .count(_ == "Exchange hashpartitioning")
        assert(shuffles == 1,
          s"merge write must carry exactly ONE shuffle exchange, got $shuffles:\n$p")
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("cdc01: the after-payload is parsed ONCE per row (from_json, not 2x get_json_object)") {
    val p = executed("cdc01_latest_state")
    assert(!p.contains("get_json_object"),
      s"payload fields must come from the single from_json parse:\n$p")
    assert(countOf(p, "from_json") == 1,
      s"exactly one JSON parse per row:\n$p")
  }

  test("partitioning invariance: rank/window-heavy gates identical at 5 vs 32 shuffle partitions") {
    // the failure mode this guards: a nondeterministic tie-break or a
    // partial-agg that isn't commutative shows up as different rows under a
    // different partitioning — the same way a cluster resize would corrupt
    // results in production. Sampled over the most order-sensitive gates.
    val sample = Seq("q36_topk_per_group", "q69_ewma_smoothing",
      "q83_ohlc_bars", "q94_gini", "txt39_shard_export", "vec01_knn_brute",
      "q85_abc_analysis", "txt54_vocab_coverage")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def rows(name: String): Set[String] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(_.toString).toSet
    try {
      for (name <- sample if SparkEntry.queries.contains(name)) {
        spark.conf.set(key, "32")
        val a = rows(name)
        spark.conf.set(key, "5")
        val b = rows(name)
        assert(a == b, s"$name differs across partitionings")
        assert(a.nonEmpty, s"$name empty")
      }
    } finally spark.conf.set(key, prev)
  }
}
