package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A/B soak for the GlobalRank decomposition (bench tooling, not a query
  * operator): times the SAME global cumulative sum over the events table
  * two ways — the naive `SUM(v) OVER (ORDER BY …)` single-partition
  * window vs [[operators.GlobalRank.cumSum]]'s two-level prefix — and
  * prints one JSON line with both wall-clocks plus an exact-decimal
  * checksum equality verdict (the timing is only meaningful if both
  * formulations produce identical rows).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.RankSoak [copies]` —
  * the optional multiplier explodes events in-memory (key-shifted
  * replicas, the SoakSynth discipline without the disk write). Run at
  * the base sf and at growing multipliers to see the single-task
  * ceiling: the window form serializes O(rows) through one core (its
  * time scales with rows regardless of cluster width), the two-level
  * form's widest local frame is rows/nBuckets.
  */
object RankSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = if (args.nonEmpty) args(0).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.events(spark, sfDir)
      .select(col("event_id"), col("value").cast(DecimalType(18, 4)).as("v"))
    val ev =
      if (copies <= 1) base
      else base.crossJoin(broadcast(
          spark.range(copies).select(col("id").as("_rep"))))
        .select((col("event_id") + col("_rep") * 1000000000L).as("event_id"),
          col("v"))
    val n = ev.count() // also warms the parquet reader

    // checksum = exact-decimal sum of (cum mod p) × a position weight.
    // event_id is the (unique) order key, so weighting each cum by
    // event_id mod q makes the sum position-sensitive: two divergent cum
    // assignments that merely permute values across rows (e.g. across
    // near-ties) no longer collide. Decimals add/multiply exactly.
    def checksum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum((col("c") % lit(997)) *
        (pmod(col("event_id"), lit(1009L)) + lit(1L))).as("s"))
        .head().getDecimal(0)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (winSum, tWin) = timed(checksum(ev.withColumn("c",
      sum(col("v")).over(Window.orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))))
    val (grkSum, tGrk) = timed(checksum(
      operators.GlobalRank.cumSum(ev, Seq(col("event_id")), col("v"), "c")))
    val same = winSum != null && winSum.compareTo(grkSum) == 0
    println(s"""{"metric":"rank_soak","rows":$n,""" +
      s""""window_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, tWin)},""" +
      s""""globalrank_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, tGrk)},""" +
      s""""identical":$same,"sf":"$sfDir"}""")
    require(same, "formulations diverged — timing is meaningless")
  }
}
