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
}
