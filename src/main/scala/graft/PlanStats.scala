package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape census over the declared surface (the r16 optimization
  * checklist instrument): for each selected gate, build its DataFrame and
  * print deterministic plan-shape counters from the executed plan's
  * pre-execution form — exchanges, join strategies, cartesian products,
  * single-partition windows/sorts, scans whose pushed filters are empty
  * while the gate filters that relation. Wall-clock on this VM swings
  * ±20%; these counters do not (guide §1/§7.2: read the plan).
  *
  * Usage: `runMain graft.PlanStats <prefix>...` — env contract as Bench.
  * NOTE: building a gate's DataFrame RUNS its eager setup (merges, index
  * builds), so a sweep costs roughly a bench of the selected families.
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        new java.io.File(sys.props("java.io.tmpdir"), "graft-warehouse").getPath)
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val selected = SparkEntry.queries
      .filter { case (n, _) => args.isEmpty || args.exists(n.startsWith) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        def c(pat: String) = pat.r.findAllIn(p).size
        val exch = c("Exchange hashpartitioning") + c("Exchange rangepartitioning") +
          c("Exchange RoundRobinPartitioning")
        val single = c("Exchange SinglePartition")
        val smj = c("SortMergeJoin")
        val bhj = c("BroadcastHashJoin")
        val shj = c("ShuffledHashJoin")
        val bnl = c("BroadcastNestedLoopJoin")
        val cart = c("CartesianProduct")
        val scans = c("FileScan parquet") + c("Scan parquet")
        val inmem = c("InMemoryTableScan")
        println(s"[planstats] $name exch=$exch single=$single smj=$smj " +
          s"bhj=$bhj shj=$shj bnl=$bnl cart=$cart scans=$scans cache=$inmem " +
          s"nodes=${p.linesIterator.size}")
      } catch {
        case e: Throwable =>
          println(s"[planstats] $name ERROR ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    spark.stop()
  }
}
