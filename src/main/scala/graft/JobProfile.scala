package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Measurement tooling (JobCount's sibling): run gates and print a per-job
  * wall-clock profile — job id, duration, submit gap (driver think-time
  * between jobs), and the job's call-site description — so a gate whose
  * cost is many small jobs shows WHICH actions and which driver-side gaps
  * absorb the time (guide §1.1 empirical loop, §7.3 driver-side work).
  *
  * Usage: `runMain graft.JobProfile <gatePrefix>...` — same env contract as
  * Bench. Not part of the driver bench contract.
  */
object JobProfile {
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

    case class J(id: Int, start: Long, var end: Long = -1L,
      var site: String = "", var tasks: Int = 0)
    val jobs = TrieMap.empty[Int, J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(j.jobId, J(j.jobId, j.time, site = site)); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs.get(j.jobId).foreach(_.end = j.time); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = ()
    })

    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    graft.cdc.ChangelogGen.fromEvents(spark, sfDir).limit(64).toDF().count()

    val selected = SparkEntry.queries
      .filter { case (n, _) => args.exists(n.startsWith) }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      Thread.sleep(800)
      jobs.clear()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[jobprofile] $name FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      val js = jobs.values.toSeq.sortBy(_.start)
      val inJobs = js.filter(_.end > 0).map(j => (j.end - j.start) / 1e3).sum
      println(f"[jobprofile] $name wall=$wall%.1f s, jobs=${js.size}, " +
        f"in-job=$inJobs%.1f s, gaps=${wall - inJobs}%.1f s")
      // aggregate by call site: where do the job-seconds go?
      js.groupBy(_.site).map { case (s, g) =>
        (g.map(j => math.max(0L, j.end - j.start)).sum / 1e3, g.size, s)
      }.toSeq.sortBy(-_._1).take(14).foreach { case (sec, n, s) =>
        println(f"[jobprofile]    $sec%7.2f s  n=$n%-4d $s")
      }
    }
    spark.stop()
  }
}
