package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Global-order analytics — `row_number() OVER (ORDER BY …)`,
  * `SUM(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`, `lead(1)` — WITHOUT
  * the single-partition window Spark would otherwise plan (the
  * `WindowExec: No Partition Defined … Moving all data to a single
  * partition` path, where the whole frame flows through ONE task).
  *
  * The shape is the two-level prefix decomposition
  * [[graft.operators.TextOps.globalTokenOffsets]] pioneered for sequence
  * packing, generalized to any order and any additive statistic:
  *
  *  1. `repartitionByRange(nBuckets, order…)` — order-aligned range buckets
  *     (bucket b's rows all precede bucket b+1's in the requested order);
  *     `localCheckpoint` pins the sampled boundaries so both passes see the
  *     SAME bucketing.
  *  2. Pass 1 reduces each bucket to ONE row (count / sum / min) — an
  *     O(nBuckets)-row collect is the only thing that reaches the driver,
  *     where the exclusive prefix over sorted bucket ids is O(nBuckets).
  *  3. Pass 2 runs the window PARTITIONED BY bucket (parallel, no global
  *     sort) and adds the broadcast per-bucket base.
  *
  * The answer is independent of nBuckets and of where the range sampler
  * draws boundaries — order alignment is the only property used (pinned in
  * spec by varying nBuckets against the window formulation). At 100 TB the
  * widest machine-local frame is rows/nBuckets and the driver holds
  * O(nBuckets) scalars; the window formulation holds rows on one task.
  *
  * Reference analog: the reference reports ranked/percentile views over
  * changelog statistics (its test harness orders whole result sets — the
  * spec/functional Ruby specs compare sorted relations); at its single-node scale
  * a global sort is free. This operator is the cluster-scale replacement.
  */
object GlobalRank {

  private val B = "_grk_b"

  /** Range-bucket `df` by `order`, tagging each row with its bucket id.
    * localCheckpoint pins the (sampled, otherwise nondeterministic)
    * boundaries so pass 1's totals and pass 2's windows agree.
    */
  private def bucketed(df: DataFrame, order: Seq[Column], nBuckets: Int)
      : DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    df.repartitionByRange(nBuckets, order: _*)
      .withColumn(B, spark_partition_id())
      .localCheckpoint()
  }

  /** Exclusive prefix over per-bucket scalar rows (bucketId, value), in
    * bucket order, with type-faithful addition AND window-faithful null
    * semantics: a bucket whose preceding buckets are all null (or absent)
    * gets a NULL base — exactly when the global window's prefix sum would
    * be null — so the combine step can mirror sum's null-skipping. Returns
    * (bucketId, base) plus the grand total (null iff every value is null).
    */
  private def exclusivePrefix(rows: Array[(Int, Any)], dt: DataType)
      : (Seq[(Int, Any)], Any) = {
    val sorted = rows.sortBy(_._1)
    def scan[T](add: (T, Any) => T): (Seq[(Int, Any)], Any) = {
      var acc: Option[T] = None
      val bases = sorted.map { case (b, v) =>
        val out = (b, acc.map(x => x: Any).orNull)
        if (v != null) acc = Some(add(acc.getOrElse(null.asInstanceOf[T]), v))
        out
      }.toSeq
      (bases, acc.map(x => x: Any).orNull)
    }
    dt match {
      // LongType only, deliberately: Spark's sum() widens int→long, and a
      // boxed-Long base under an IntegerType schema would be a runtime
      // mismatch — an unexpected type must fail loudly below instead
      case LongType =>
        scan[java.lang.Long]((a, v) =>
          (if (a == null) 0L else a.longValue) + v.asInstanceOf[Number].longValue)
      case DoubleType =>
        scan[java.lang.Double]((a, v) =>
          (if (a == null) 0.0 else a.doubleValue) + v.asInstanceOf[Number].doubleValue)
      case _: DecimalType =>
        scan[java.math.BigDecimal]((a, v) =>
          (if (a == null) java.math.BigDecimal.ZERO else a)
            .add(v.asInstanceOf[java.math.BigDecimal]))
      case other =>
        throw new IllegalArgumentException(
          s"GlobalRank: unsupported additive type $other (Long/Double/Decimal)")
    }
  }

  /** Broadcast-join the per-bucket bases back onto the bucketed frame. */
  private def withBase(parts: DataFrame, bases: Seq[(Int, Any)], dt: DataType,
      baseCol: String): DataFrame = {
    val spark = parts.sparkSession
    val schema = StructType(Seq(
      StructField(B, IntegerType, nullable = false),
      StructField(baseCol, dt, nullable = true)))
    val rows = bases.map { case (b, v) => Row(b, v) }
    val baseDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    parts.join(broadcast(baseDf), Seq(B))
  }

  /** Global `row_number()` in `order` (which must be a TOTAL order — callers
    * tie-break with a unique column, same contract as the window form).
    * Output: `df`'s columns + `out` (LONG, 1-based) + optionally
    * `countCol` = the grand row count as a literal (free from pass 1 — it
    * replaces the `count(*) OVER ()` global window the naive form pays).
    */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String,
      nBuckets: Int = 64, countCol: Option[String] = None): DataFrame = {
    val parts = bucketed(df, order, nBuckets)
    val totals = parts.groupBy(col(B)).agg(count(lit(1)).as("_t"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1): Any))
    val (bases, grand) = exclusivePrefix(totals, LongType)
    val w = Window.partitionBy(col(B)).orderBy(order: _*)
    // counts are never null, but the null-aware prefix marks the first
    // bucket's (empty) prefix as null — zero is the right base for ranks
    val ranked = withBase(parts, bases, LongType, "_grk_base")
      .withColumn(out,
        coalesce(col("_grk_base"), lit(0L)) + row_number().over(w).cast("long"))
      .drop(B, "_grk_base")
    countCol.fold(ranked)(c => ranked.withColumn(c, lit(grand.asInstanceOf[Long])))
  }

  /** Global running sum of `value` in `order` — inclusive
    * (`ROWS UNBOUNDED PRECEDING` through current), exact in the value's own
    * arithmetic (decimal stays decimal; the driver prefix uses BigDecimal).
    * `totalCol`, when asked for, is the grand total as a type-stable literal
    * (replaces `sum(v) OVER ()`). Null semantics mirror the window's
    * null-skipping sum exactly: the result is null iff the global prefix
    * holds no non-null value (`coalesce(base + within, base, within)` —
    * null bases mark an all-null preceding-bucket prefix).
    */
  def cumSum(df: DataFrame, order: Seq[Column], value: Column, out: String,
      nBuckets: Int = 64, totalCol: Option[String] = None): DataFrame = {
    val parts = bucketed(df, order, nBuckets).withColumn("_grk_v", value)
    val totalsDf = parts.groupBy(col(B)).agg(sum(col("_grk_v")).as("_t"))
    val dt = totalsDf.schema("_t").dataType
    val totals = totalsDf.collect().map(r => r.getInt(0) -> r.get(1))
    val (bases, grand) = exclusivePrefix(totals, dt)
    val w = Window.partitionBy(col(B)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = sum(col("_grk_v")).over(w)
    val run = withBase(parts, bases, dt, "_grk_base")
      .withColumn(out,
        coalesce(col("_grk_base") + within, col("_grk_base"), within).cast(dt))
      .drop(B, "_grk_base", "_grk_v")
    totalCol.fold(run)(c => run.withColumn(c, lit(grand).cast(dt)))
  }

  /** Global `rank()` in `order` — ties allowed (gaps after tie runs, SQL
    * semantics). Correct under the same decomposition because a RANGE
    * partitioner is a function of the full order key: rows EQUAL on every
    * order column land in the same bucket, so a tie run never spans a
    * bucket boundary and `base rows + local rank` is the global rank.
    */
  def rank(df: DataFrame, order: Seq[Column], out: String,
      nBuckets: Int = 64): DataFrame = {
    val parts = bucketed(df, order, nBuckets)
    val totals = parts.groupBy(col(B)).agg(count(lit(1)).as("_t"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1): Any))
    val (bases, _) = exclusivePrefix(totals, LongType)
    val w = Window.partitionBy(col(B)).orderBy(order: _*)
    withBase(parts, bases, LongType, "_grk_base")
      .withColumn(out, coalesce(col("_grk_base"), lit(0L)) +
        org.apache.spark.sql.functions.rank().over(w).cast("long"))
      .drop(B, "_grk_base")
  }

  /** Global `dense_rank()` in `order` — the base is the count of DISTINCT
    * order keys in preceding buckets (ties never span buckets, see
    * [[rank]]), so `distinct base + local dense_rank` is exact.
    */
  def denseRank(df: DataFrame, order: Seq[Column], out: String,
      nBuckets: Int = 64): DataFrame = {
    val parts = bucketed(df, order, nBuckets)
    // strip sort direction: countDistinct needs the value expressions.
    // Wrap them in a struct: countDistinct skips NULL inputs, but
    // dense_rank() treats the null key group as a distinct key — a struct
    // is non-null even when every field is null, so null groups count.
    val keyExprs = order.map(org.apache.spark.sql.GraftShims.sortChild)
    val totals = parts.groupBy(col(B))
      .agg(countDistinct(struct(keyExprs: _*)).as("_t"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1): Any))
    val (bases, _) = exclusivePrefix(totals, LongType)
    val w = Window.partitionBy(col(B)).orderBy(order: _*)
    withBase(parts, bases, LongType, "_grk_base")
      .withColumn(out, coalesce(col("_grk_base"), lit(0L)) +
        dense_rank().over(w).cast("long"))
      .drop(B, "_grk_base")
  }

  /** Global `ntile(n)` in `order` (a total order, same contract as
    * [[rowNumber]]): SQL-standard tiling — the first `rows mod n` tiles
    * get one extra row — computed from the two-level rank and the grand
    * count, never a single-partition window. Output column is LONG.
    */
  def ntile(df: DataFrame, order: Seq[Column], n: Int, out: String,
      nBuckets: Int = 64): DataFrame = {
    require(n > 0, s"ntile count must be positive: $n")
    // SQL ntile with count c: base = c div n, rem = c mod n; tiles 1..rem
    // hold base+1 rows. Invert: rank r ≤ rem·(base+1) ⇒ tile = ceil(r /
    // (base+1)), else tile = rem + ceil((r − rem·(base+1)) / base) — all
    // exact integer arithmetic on the rank column.
    GlobalRank.rowNumber(df, order, "_grk_rn", nBuckets, Some("_grk_n"))
      .withColumn(out, {
        val r = col("_grk_rn")
        val baseL = expr(s"_grk_n div $n")
        val rem = expr(s"_grk_n % $n")
        val cut = rem * (baseL + 1L)
        // integer `div` throughout; the else-branch divisor is clamped (it
        // is only reached when base ≥ 1, but ANSI mode must never see a
        // constructible division by zero)
        when(r <= cut,
            expr(s"(_grk_rn - 1) div (_grk_n div $n + 1) + 1"))
          .otherwise(rem +
            expr(s"(_grk_rn - (_grk_n % $n) * (_grk_n div $n + 1) - 1) " +
              s"div greatest(_grk_n div $n, 1L) + 1"))
          .cast("long")
      })
      .drop("_grk_rn", "_grk_n")
  }

  /** Exclusive prefix MAX over per-bucket (bucketId, max) rows in bucket
    * order — `null` base for the first bucket (no identity for max). Boxed
    * Comparable covers Int/Long/Double/Decimal/Date uniformly.
    */
  private def exclusivePrefixMax(rows: Array[(Int, Any)]): Seq[(Int, Any)] = {
    val sorted = rows.sortBy(_._1)
    var best: Any = null
    sorted.map { case (b, v) =>
      val out = (b, best)
      if (v != null && (best == null ||
          v.asInstanceOf[Comparable[Any]].compareTo(best) > 0)) best = v
      out
    }.toSeq
  }

  /** Global running MAX of `value` in `order` — inclusive
    * (`ROWS UNBOUNDED PRECEDING` through current) or exclusive (through the
    * PREVIOUS row: the skyline/frontier frame, null for the global first
    * row). Bucket bases are per-bucket maxima prefix-maxed on the driver;
    * `greatest` skips nulls, so base/within null handling matches the
    * global window exactly.
    */
  def cumMax(df: DataFrame, order: Seq[Column], value: Column, out: String,
      nBuckets: Int = 64, exclusive: Boolean = false): DataFrame = {
    val parts = bucketed(df, order, nBuckets).withColumn("_grk_v", value)
    val maxDf = parts.groupBy(col(B)).agg(max(col("_grk_v")).as("_m"))
    val dt = maxDf.schema("_m").dataType
    val bases = exclusivePrefixMax(
      maxDf.collect().map(r => r.getInt(0) -> r.get(1)))
    val spark = parts.sparkSession
    val schema = StructType(Seq(
      StructField(B, IntegerType, nullable = false),
      StructField("_grk_base", dt, nullable = true)))
    val baseDf = spark.createDataFrame(
      spark.sparkContext.parallelize(bases.map { case (b, v) => Row(b, v) }, 1),
      schema)
    val hi = if (exclusive) -1L else Window.currentRow
    val w = Window.partitionBy(col(B)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, hi)
    parts.join(broadcast(baseDf), Seq(B))
      .withColumn(out,
        greatest(col("_grk_base"), max(col("_grk_v")).over(w)).cast(dt))
      .drop(B, "_grk_base", "_grk_v")
  }

  /** Global `lag(value, 1)` in `orderCol` order (orderCol unique, value
    * NON-NULL by contract — a null value is indistinguishable from "no
    * previous row"): within-bucket lag, and each bucket's FIRST row receives
    * the PREVIOUS non-empty bucket's last value via the O(nBuckets) handoff.
    */
  def lag1(df: DataFrame, orderCol: String, value: Column, out: String,
      nBuckets: Int = 64): DataFrame = {
    val parts = bucketed(df, Seq(col(orderCol)), nBuckets)
      .withColumn("_grk_v", value)
    val lastsDf = parts.groupBy(col(B))
      .agg(max_by(col("_grk_v"), col(orderCol)).as("_l"))
    val dt = lastsDf.schema("_l").dataType
    val lasts = lastsDf.collect().map(r => r.getInt(0) -> r.get(1)).sortBy(_._1)
    // handoff for bucket b = previous non-empty bucket's last value
    val handoffs: Seq[(Int, Any)] = lasts.indices.flatMap { i =>
      if (i == 0) None else Some(lasts(i)._1 -> lasts(i - 1)._2)
    }
    val spark = parts.sparkSession
    val schema = StructType(Seq(
      StructField(B, IntegerType, nullable = false),
      StructField("_grk_h", dt, nullable = true)))
    val hDf = spark.createDataFrame(
      spark.sparkContext.parallelize(handoffs.map { case (b, v) => Row(b, v) }, 1),
      schema)
    val w = Window.partitionBy(col(B)).orderBy(col(orderCol))
    parts.join(broadcast(hDf), Seq(B), "left")
      .withColumn(out, coalesce(lag(col("_grk_v"), 1).over(w), col("_grk_h")))
      .drop(B, "_grk_h", "_grk_v")
  }

  /** Global `lead(orderCol, 1)` over a frame whose `orderCol` is unique
    * (a sequence/LSN audit shape): within-bucket lead, and each bucket's
    * LAST row receives the NEXT non-empty bucket's minimum as its lead —
    * the one-edge-row-per-shard handoff a production range-sharded
    * sequence check uses. The handoff table is O(nBuckets) driver rows.
    */
  def lead1(df: DataFrame, orderCol: String, out: String,
      nBuckets: Int = 64): DataFrame = {
    val parts = bucketed(df, Seq(col(orderCol)), nBuckets)
    val minsDf = parts.groupBy(col(B)).agg(min(col(orderCol)).as("_m"))
    val dt = minsDf.schema("_m").dataType
    val mins = minsDf.collect().map(r => r.getInt(0) -> r.get(1)).sortBy(_._1)
    // handoff for bucket b = min of the next non-empty bucket (strictly
    // after b in bucket order); null for the last
    val handoffs: Seq[(Int, Any)] = mins.indices.flatMap { i =>
      mins.drop(i + 1).headOption.map(n => mins(i)._1 -> n._2)
    }
    val spark = parts.sparkSession
    val schema = StructType(Seq(
      StructField(B, IntegerType, nullable = false),
      StructField("_grk_h", dt, nullable = true)))
    val hDf = spark.createDataFrame(
      spark.sparkContext.parallelize(handoffs.map { case (b, v) => Row(b, v) }, 1),
      schema)
    val w = Window.partitionBy(col(B)).orderBy(col(orderCol))
    parts.join(broadcast(hDf), Seq(B), "left")
      .withColumn(out, coalesce(lead(col(orderCol), 1).over(w), col("_grk_h")))
      .drop(B, "_grk_h")
  }
}
