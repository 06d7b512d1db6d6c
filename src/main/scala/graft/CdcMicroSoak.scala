package graft

import org.apache.spark.sql.SparkSession

/** A/B soak for the CDC micro-bench's compaction aggregate (bench tooling,
  * not a query operator): times generate→latest-state at the given corpus
  * with `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` as the
  * experimental variable, and prints one JSON line per run.
  *
  * Why this knob: [[graft.cdc.LatestState.batch]] compacts with
  * `max_by(struct(payload), struct(orderCols))` — the aggregation buffer is
  * a struct, which disqualifies the primitive-only HashAggregateExec fast
  * path, so Spark plans ObjectHashAggregateExec. That operator's in-memory
  * hash map falls back to SORT-based aggregation after only 128 distinct
  * keys per partition (the Spark default) — past that, every partition
  * SORTS its full input (O(envelopes log envelopes) on fat payload rows,
  * spilled to disk once partitions outgrow memory) even though the
  * compacted state it ships is only O(distinct keys). On a changelog the
  * distinct-key count per partition is the STATE size, orders of magnitude
  * below the envelope count — exactly the regime the hash map is for, and
  * the named suspect for the micro-bench's 6.85M → 3.09M ev/s drop at the
  * 1000× decade.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.CdcMicroSoak [threshold]`
  * — run once with no arg (Spark default 128) and once with a raised value
  * to A/B the same corpus; the JSON carries the effective threshold, the
  * aggregate operator the planner actually chose, the compacted row count
  * (a correctness echo: both runs must agree), and median-of-3 ev/s.
  */
object CdcMicroSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val threshold = args.headOption.getOrElse("128")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      // mirror Bench's file-split settings so ev/s is comparable 1:1 with
      // the per-round micro-bench rows
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      // non-numeric modes (scan/typed/argmax) still need a numeric value
      // here; `typed` gets a raised one — the mode exists to measure the
      // ObjectHashAggregate hash path, not its 128-key sort fallback
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        threshold.toLongOption.map(_.toString)
          .getOrElse(if (threshold == "typed") "10000000" else "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val nEvents = Tables.events(spark, sfDir).count()
      // `scan` instead of a threshold measures the generate-only floor:
      // every envelope column is forced through a cheap one-row rollup
      // (a bare count() lets Catalyst prune the whole projection down to
      // parquet footer counts — 86M ev/s of nothing). The compaction
      // overhead is the agg ev/s DELTA against this floor.
      import org.apache.spark.sql.functions.{col, concat_ws, octet_length, sum}
      def compacted() = threshold match {
        case "scan" =>
          graft.cdc.ChangelogGen.fromEvents(spark, sfDir).toDF()
            .agg(sum(octet_length(concat_ws("",
              col("op"), col("key"), col("after")))
              + col("lsn") + col("seq")))
        case "typed" =>
          // TypedImperativeAggregate route (ObjectHashAggregate): pays an
          // encoder round-trip per envelope but hashes instead of sorting
          import spark.implicits._
          graft.cdc.ChangelogGen.fromEvents(spark, sfDir)
            .groupByKey(e => (e.table, e.key))
            .agg(graft.cdc.LatestState.latestAggregator.toColumn)
            .map(_._2).filter(_.op != graft.cdc.Op.Delete).toDF()
        case "argmax" =>
          // the two-pass bounded-state fast path, now first-class:
          // LatestState.batchArgmax ((lsn, seq) packed — valid while
          // seq < 2²⁰ and lsn < 2⁴³, true of every soak corpus)
          graft.cdc.LatestState.batchArgmax(
            graft.cdc.ChangelogGen.fromEvents(spark, sfDir).toDF(),
            Seq("table", "key"), col("lsn") * 1048576L + col("seq"))
        case _ => graft.cdc.LatestState.batch(
          graft.cdc.ChangelogGen.fromEvents(spark, sfDir).toDF(),
          Seq("table", "key"), Seq("lsn", "seq"))
      }
      val plan = compacted().queryExecution.executedPlan.toString
      val aggNode =
        if (plan.contains("ObjectHashAggregate")) "ObjectHashAggregate"
        else if (plan.contains("SortAggregate")) "SortAggregate"
        else if (plan.contains("HashAggregate")) "HashAggregate"
        else "unknown"
      val nState = compacted().count()
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        compacted().count()
        nEvents / ((System.nanoTime() - t0) / 1e9)
      }.sorted
      // scalastyle:off println
      println(s"""{"metric":"cdc_micro_soak","threshold":"$threshold",""" +
        s""""agg_node":"$aggNode","n_events":$nEvents,"n_state":$nState,""" +
        s""""events_per_sec":${samples(1).toLong},""" +
        s""""samples":[${samples.map(_.toLong).mkString(",")}],""" +
        s""""shuffle":$shuffle,"sf":"$sfDir"}""")
      // scalastyle:on println
    } finally spark.stop()
  }
}
