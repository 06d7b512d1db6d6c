package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-soak corpus synthesizer (bench tooling, not a query operator):
  * writes an N× copy of a driver testdata directory where each replica's
  * KEY columns are shifted by a large per-replica offset — every replica
  * is self-contained (joins resolve within it, referential integrity
  * preserved), so an operator that scales linearly in rows should run
  * ~N× its base time and anything super-linear stands out.
  *
  * Deterministic by construction (no randomness): replica i of a row is
  * the row with `key + i·10⁹` on every key column; `documents.text` gets
  * a per-replica suffix so near-dup/LSH operators see distinct content
  * (otherwise the soak would measure duplicate-pileup semantics — every
  * bucket 10× deep — instead of scan/shuffle scaling), while exact-dedup
  * keys still collide WITHIN a replica exactly as in the base corpus.
  *
  * Usage: `runMain graft.SoakSynth <srcSfDir> <dstDir> <copies>`.
  */
object SoakSynth {

  private val Shift = 1000000000L

  /** key columns to shift, per table (events keeps its ts untouched —
    * time-window behavior should scale in ROWS, not in time span)
    */
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private def replicate(base: DataFrame, table: String, copies: Int): DataFrame = {
    val shifted = (0 until copies).map { i =>
      val keyed = keyCols(table).foldLeft(base) { (df, k) =>
        df.withColumn(k, col(k) + lit(i.toLong * Shift))
      }
      if (table == "documents" && i > 0)
        keyed.withColumn("text", concat(col("text"), lit(s" r$i")))
      else keyed
    }
    shifted.reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val (src, dst, copies) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Tables.all) {
      // byName fixes the events ts encoding once; the copy is written as
      // plain timestamp[us], which every loader handles
      val base = Tables.byName(spark, src, t)
      replicate(base, t, copies)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[soak] $t x$copies written")
    }
    spark.stop()
  }
}
