package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement tooling (the PlanAudit sibling): run gates and print their
  * DETERMINISTIC execution-shape counters — Spark jobs, stages, tasks and
  * shuffle bytes — which, unlike wall-clock on a noisy VM, are
  * window-independent A/B evidence for optimization claims (guide §1:
  * measure first; §7.1's UI counters, scripted).
  *
  * Usage: `runMain graft.JobCount <gatePrefix>...` — same env contract as
  * Bench (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS). Not part of the driver
  * bench contract; prints one line per gate.
  */
object JobCount {
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

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
        shuffleWrite.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })

    // same warm-up as Bench so first-gate init isn't in the counters
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.cdc.ChangelogGen.fromEvents(spark, sfDir).limit(64).toDF().count()

    val selected = SparkEntry.queries
      .filter { case (n, _) => args.exists(n.startsWith) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // listener bus is async — settle it so counters attribute per gate
      Thread.sleep(500)
      val (j0, s0, t0, w0) =
        (jobs.get(), stages.get(), tasks.get(), shuffleWrite.get())
      val t = System.nanoTime()
      fn(spark, sfDir).count()
      Thread.sleep(500)
      println(f"[jobcount] $name jobs=${jobs.get() - j0} " +
        f"stages=${stages.get() - s0} tasks=${tasks.get() - t0} " +
        f"shuffle_mb=${(shuffleWrite.get() - w0) / 1e6}%.1f " +
        f"sec=${(System.nanoTime() - t) / 1e9}%.1f")
    }
    spark.stop()
  }
}
