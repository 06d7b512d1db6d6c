package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering for multi-dimensional
  * scan pruning.
  *
  * The scale story: parquet prunes row groups / files by per-column min-max
  * stats, but a table sorted by ONE column has useless stats on every other
  * column — a 2-D box predicate (e.g. customer range × date range) prunes on
  * the sort column only. Interleaving the bits of both dimensions into one
  * Morton key and sorting by THAT keeps both columns locally clustered:
  * every file covers a small rectangle of the key space, so a box predicate
  * touches only the files whose rectangle intersects it. This is the layout
  * trick Delta/Iceberg expose as OPTIMIZE ZORDER BY — here as a plain
  * column expression + range-partitioned write, nothing engine-specific.
  *
  * The Morton code is composed entirely of codegen'd built-ins (shifts and
  * masks — the standard bit-spreading magic numbers), so it can also serve
  * as a clustering key for repartitionByRange, bucketing, or sort-merge
  * co-location. Restatable in SQL (the oracle runs the same shifts in
  * DuckDB), deterministic everywhere.
  *
  * No reference analog; public literature (Morton 1966; the Delta OPTIMIZE
  * docs describe the same construction).
  */
object Layout {

  /** Bit-spread of a 16-bit value: inserts a 0 between consecutive bits
    * (abcd → 0a0b0c0d). The classic mask ladder — 4 shift+or+mask steps,
    * all inside whole-stage codegen.
    */
  def spread16(v: Column): Column = {
    val s0 = v.bitwiseAND(lit(0xFFFFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(lit(0x33333333L))
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton (Z-order) key of two 16-bit coordinates: x in the even
    * bits, y in the odd bits. Values are masked to 16 bits — callers map
    * their domain onto [0, 65535] first (quantile- or range-scaling; the
    * usual practice is ranking each dimension).
    */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write `df` Z-ordered on (x, y) as `numFiles` parquet files under
    * `path`: range-partition by the Morton key (contiguous key ranges per
    * file — the property that makes per-file min-max stats tight), sort
    * within partitions, drop the key. Returns the reloaded DataFrame.
    *
    * At cluster scale this is the compaction job that runs AFTER ingest;
    * the write is one range exchange (sampled boundaries) + local sorts.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
      numFiles: Int): DataFrame = {
    df.withColumn("_z", morton2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
