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

  /** Hilbert-curve index of two `bits`-bit coordinates — the layout key
    * with strictly better locality than [[morton2]]: consecutive Hilbert
    * positions are ALWAYS Manhattan-adjacent cells (Z-order jumps across
    * the plane at every power-of-two boundary), so range-partitioned files
    * cover tighter rectangles and per-file min-max stats prune harder.
    * This is the same upgrade Delta/Iceberg made over Z-order clustering.
    *
    * The standard per-bit rotate-and-accumulate walk (Hilbert 1891; the
    * iterative xy2d formulation is textbook): for each bit level s from
    * high to low, the quadrant (rx, ry) contributes s²·((3·rx) XOR ry)
    * curve positions and the sub-square's frame rotates/reflects. Each
    * level is LET-BOUND ([[TextOps.bind]]): the rotation reads the
    * previous level's (x, y) four times, so naive unrolling would square
    * the expression tree per level — 4^bits nodes by the last. Bound, the
    * tree is O(bits) and every step is codegen'd integer arithmetic.
    *
    * Values are masked to `bits` bits — callers map their domain onto the
    * grid first, exactly as with [[morton2]].
    */
  def hilbert2(xIn: Column, yIn: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1, 31]: $bits")
    val mask = (1L << bits) - 1
    var acc: Column = struct(xIn.bitwiseAND(lit(mask)).as("x"),
      yIn.bitwiseAND(lit(mask)).as("y"), lit(0L).as("d"))
    for (i <- bits - 1 to 0 by -1) {
      val s = 1L << i
      acc = TextOps.bind(acc, a => {
        val (x, y, d) = (a("x"), a("y"), a("d"))
        val rx = when(x.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
        val ry = when(y.bitwiseAND(lit(s)) > lit(0L), lit(1L)).otherwise(lit(0L))
        struct(
          when(ry === 0 && rx === 1, lit(s - 1) - y)
            .when(ry === 0, y).otherwise(x).as("x"),
          when(ry === 0 && rx === 1, lit(s - 1) - x)
            .when(ry === 0, x).otherwise(y).as("y"),
          (d + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)).as("d"))
      })
    }
    acc("d")
  }

  /** Write `df` Z-ordered on (x, y) as `numFiles` parquet files under
    * `path`: range-partition by the Morton key (contiguous key ranges per
    * file — the property that makes per-file min-max stats tight), sort
    * within partitions, drop the key. Returns the reloaded DataFrame.
    *
    * At cluster scale this is the compaction job that runs AFTER ingest;
    * the write is one range exchange (sampled boundaries) + local sorts.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
      numFiles: Int): DataFrame =
    writeOrderedBy(df, morton2(col(xCol), col(yCol)), path, numFiles)

  /** [[writeZOrdered]] with the [[hilbert2]] key: consecutive file key
    * ranges cover contiguous curve segments, and Hilbert segments are
    * always connected regions (Z-order segments jump), so per-file min-max
    * rectangles come out tighter for the same file count.
    */
  def writeHilbertOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int): DataFrame =
    writeOrderedBy(df, hilbert2(col(xCol), col(yCol)), path, numFiles)

  private def writeOrderedBy(df: DataFrame, key: Column, path: String,
      numFiles: Int): DataFrame = {
    df.withColumn("_k", key)
      .repartitionByRange(numFiles, col("_k"))
      .sortWithinPartitions(col("_k"))
      .drop("_k")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
