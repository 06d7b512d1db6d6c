package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — attach to each left row the single most recent right row
  * (same key, right time ≤ left time). The CDC shape behind "what did the
  * dimension look like when this event happened": the reference's consumers
  * get it implicitly from log-compacted topics + replay order
  * (README.md:288–297); batch engines need it as an operator, and Spark has
  * no built-in.
  *
  * Spark-first re-expression (scale path): tag both sides, UNION them, and
  * run ONE window over (key) ordered by (time, side) carrying the last
  * non-null right payload forward (`last(_, ignoreNulls)` over
  * unbounded-preceding..current). Cost = one hash shuffle of |L|+|R| rows +
  * one per-key sort — the same shape as latest-state compaction. The naive
  * alternative (theta join right.ts ≤ left.ts, then argmax per left row)
  * materializes O(|L|·|R|) candidate pairs per key and collapses them with a
  * second shuffle; at 100 TB the union-window plan ships each row once.
  *
  * Ties (right.ts == left.ts): the right row sorts BEFORE the left row, so
  * an exactly-simultaneous right row IS visible (non-strict ≤, matching
  * DuckDB/Pandas ASOF semantics); pass strict=true for <.
  */
object AsOfJoin {

  /** @param payload right columns to carry (renamed as given, so callers
    *                 disambiguate against left column names)
    * @param strict   true ⇒ right must be strictly before (after, when
    *                 `forward`) the left row; default includes ties
    * @param forward  false (default) = classic backward as-of (most recent
    *                 right at-or-before left); true = FORWARD as-of (the
    *                 "reaction" join: earliest right at-or-after left) —
    *                 the same one-exchange union-window plan running on the
    *                 reversed time order
    * @param fresh    optional tolerance predicate over (leftTs, matchedTs):
    *                 when it rejects, the match is nulled out (max-staleness
    *                 as-of). Sound under the window formulation because the
    *                 carried match is the EXTREME candidate — if the nearest
    *                 right row fails the bound, every other candidate fails
    *                 it too, so nulling ≡ restricting the join itself
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Map[String, String],
      strict: Boolean = false, forward: Boolean = false,
      fresh: Option[(Column, Column) => Column] = None): DataFrame = {
    // the two time columns order ONE union'd column — they must already share
    // a type; an implicit widening cast here could silently truncate
    // (double→long would collapse 10.2 and 10.9 into the same instant and
    // let a "future" right row match)
    require(left.schema(leftTs).dataType == right.schema(rightTs).dataType,
      s"as-of time columns must have identical types: " +
        s"$leftTs is ${left.schema(leftTs).dataType}, " +
        s"$rightTs is ${right.schema(rightTs).dataType}")
    val leftCols = left.columns.toSeq
    val outNames = payload.values.toSeq
    // right rows: key + ts + payload struct; left rows: key + ts + full row
    val rightTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("_ts"),
        lit(0).as("_side"),
        // the matched row's own ts rides IN the payload so the freshness
        // bound can compare it against the left ts after the window
        struct((payload.map { case (c, n) => col(c).as(n) }.toSeq :+
          col(rightTs).as("_match_ts")): _*).as("_payload"),
        lit(null).cast(org.apache.spark.sql.types.StructType(
          left.schema.fields)).as("_left")): _*)
    val leftTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("_ts"),
        lit(1).as("_side"),
        lit(null).cast(rightTagged.schema("_payload").dataType).as("_payload"),
        struct(leftCols.map(col): _*).as("_left")): _*)

    // strict <: left sorts before a same-ts right row, hiding it
    val sideOrder = if (strict) -col("_side") else col("_side")
    // forward as-of = the same scan over the REVERSED time order: "last
    // right at-or-before" becomes "first right at-or-after"
    val tsOrder = if (forward) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val keepMatch = fresh match {
      case None => col("_asof").isNotNull
      case Some(f) => col("_asof").isNotNull &&
        f(col("_ts"), col("_asof._match_ts"))
    }
    rightTagged.unionByName(leftTagged)
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_left.$c").as(c)) ++
        outNames.map(n =>
          when(keepMatch, col(s"_asof.$n")).as(n)): _*)
  }
}

/** Range join — match left points to right intervals (lo ≤ point ≤ hi).
  * Spark plans a raw BETWEEN join as broadcast-nested-loop: O(|L|·|R|)
  * comparisons, a non-starter at scale.
  *
  * Scale path (the standard binned range join): pick a bin width w; a point
  * lives in exactly ONE bin (floor(p/w)), an interval is exploded to every
  * bin it overlaps (⌈len/w⌉+1 rows — bounded when interval length is
  * bounded). Equi-join on the bin id = ONE hash shuffle, then the exact
  * BETWEEN predicate filters within the bin. Each qualifying (point,
  * interval) pair meets exactly once — in the point's bin — so no dedup
  * step is needed. Choose w near the typical interval length: smaller w
  * multiplies interval duplication, larger w multiplies within-bin
  * comparisons.
  */
object RangeJoin {

  def pointInInterval(left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val points = left.withColumn("_bin", binOf(col(pointCol)))
    val intervals = right.withColumn("_bin",
      explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    points.join(intervals, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Reference implementation for specs: the naive theta join. */
  def naive(left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String): DataFrame =
    left.join(right, col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))

  /** Interval × interval OVERLAP join — the two-sided completion of
    * [[pointInInterval]]: pairs whose `[lo, hi]` spans intersect (closed
    * ends), optionally under additional equi-keys (the realistic shape:
    * co-partition on an entity, overlap on time).
    *
    * Both sides explode to their overlapped bins and equi-join on
    * (bin, equiKeys) — ONE hash shuffle, no nested loop. Unlike the point
    * case, a qualifying pair can share SEVERAL bins; instead of a distinct
    * (an extra exchange over the whole output), each pair is attributed to
    * ONE canonical bin — the bin of the overlap region's start
    * `max(loL, loR)`, which both explosions necessarily produced — so the
    * exactly-once property falls out of a per-row filter. Column names must
    * be disjoint across the sides (standard join contract).
    */
  def intervalOverlap(left: DataFrame, loL: String, hiL: String,
      right: DataFrame, loR: String, hiR: String,
      binWidth: Double, equiKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val l = left.withColumn("_bin",
      explode(sequence(binOf(col(loL)), binOf(col(hiL)))))
    val r = right.withColumn("_bin",
      explode(sequence(binOf(col(loR)), binOf(col(hiR)))))
    l.join(r, "_bin" +: equiKeys)
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL))
      .filter(col("_bin") === binOf(greatest(col(loL), col(loR))))
      .drop("_bin")
  }

  /** Reference for specs: the naive overlap theta join. */
  def naiveOverlap(left: DataFrame, loL: String, hiL: String,
      right: DataFrame, loR: String, hiR: String,
      equiKeys: Seq[String] = Nil): DataFrame = {
    val cond = equiKeys.map(k => left(k) === right(k))
      .foldLeft(col(loL) <= col(hiR) && col(loR) <= col(hiL))(_ && _)
    equiKeys.foldLeft(left.join(right, cond))((df, k) => df.drop(right(k)))
  }
}
