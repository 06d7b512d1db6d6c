package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The nLists ≥ 10⁵ datapoint for the DISTRIBUTED IVF centroid layer — the
  * run that pins the round-13 scale fix: under a constant-cell-size sizing
  * policy the centroid set is O(corpus), and before this round every
  * consumer collected it to the driver (IvfIndex train seeds, final
  * centroids, two-level assignment, query-side probing) — ~150 GB of
  * driver metadata at a genuine 10¹⁰ vectors. With
  * `spark.graft.ivf.maxCentroidCollectRows` forced below nLists, the whole
  * build routes through the distributed twins (GlobalRank seeding,
  * localCheckpoint finalize, `_super` equi-join assignment), whose ONLY
  * driver materializations are O(√nLists) supers and O(superCount) means.
  *
  * Usage: `runMain graft.IvfDistSoak [nVectors] [nLists]` (defaults
  * 3,200,000 and 100,000 — cell size 32, the vec13 policy shape).
  * Prints one JSON line: corpus size, nLists, build seconds, assigned-row
  * count (must equal N), centroid count (must equal nLists), and the JVM
  * heap peak — measured for the ledger with the stated caveat that
  * local-mode executors share the driver heap, so the structural guarantee
  * (no O(nLists) collect on the plan, enforced by the routing guard the
  * run itself sets) is the load-bearing evidence, and the peak is the
  * sanity bound.
  */
object IvfDistSoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(3200000L)
    val nLists = args.lift(1).map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // force every O(nLists) collect/broadcast to refuse → the run IS the
      // proof that the distributed path needs none of them
      spark.conf.set("spark.graft.ivf.maxCentroidCollectRows",
        math.max(1000L, nLists / 2L).toString)
      // synthetic corpus: 8-dim integer-deterministic vectors from the id
      // (hash-scattered so cells form; no RNG — reruns are bit-identical)
      val emb = spark.range(n).select(col("id").as("vec_id"),
        array((0 until 8).map(d =>
          (pmod(hash(col("id") * 31 + lit(d)), lit(2048)) - 1024)
            .cast("double") / 1024.0): _*).as("embedding"))
      import java.lang.management.ManagementFactory
      import scala.jdk.CollectionConverters._
      val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
      pools.foreach(_.resetPeakUsage())
      val t0 = System.nanoTime()
      // maxTrainRows must sit comfortably ABOVE nLists: the deterministic
      // hash sample lands within ~±0.2% of the target, and a train set
      // that undershoots nLists seeds fewer cells (documented IvfIndex
      // behavior — fine for an index, wrong for this exact-count datapoint)
      val idx = graft.operators.IvfIndex.buildScaled(emb, "vec_id",
        "embedding", nLists, iters = 2, maxTrainRows = 4L * nLists)
      val nAssigned = idx.assigned.count()
      val nCentroids = idx.centroids.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val peakMb = pools.map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
      // scalastyle:off println
      println(s"""{"metric":"ivf_dist_soak","n":$n,"nLists":$nLists,""" +
        s""""build_sec":${BigDecimal(secs).setScale(1,
          BigDecimal.RoundingMode.HALF_UP)},""" +
        s""""assigned":$nAssigned,"centroids":$nCentroids,""" +
        s""""heap_peak_mb":$peakMb}""")
      // scalastyle:on println
      require(nAssigned == n, s"assignment lost rows: $nAssigned != $n")
      require(nCentroids == nLists.toLong,
        s"centroid count off: $nCentroids != $nLists")
    } finally spark.stop()
  }
}
