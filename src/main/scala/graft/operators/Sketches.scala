package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch: fixed-size frequency summary for unbounded item
  * streams — the third member of the engine's sketch family (HLL distinct
  * counts = q27, GK quantiles = q39, CMS frequencies = here).
  *
  * The scale story: exact per-item counts shuffle O(vocabulary); the CMS is
  * a depth×width counter matrix (KBs, configuration-bounded) that any
  * number of partitions build independently and MERGE BY ADDITION — one
  * tiny all-to-one aggregation regardless of vocabulary or skew. Estimates
  * are biased one way only (est ≥ true; est ≤ true + ε·N with ε = e/width
  * at the usual analysis) — the bound the gate self-validates.
  *
  * Hash positions come from the portable md5 family (TextOps.hex32), with
  * ONE definition shared by both sides: the build computes positions as
  * codegen'd columns BEFORE the JVM aggregator (which only increments), and
  * the probe recomputes the same columns to index the sketch — so
  * build/probe agreement is by construction, not by reimplementation.
  * Determinism: counter addition is commutative, so the sketch is identical
  * under any partitioning/AQE re-plan (same property as the exact-decimal
  * sums elsewhere).
  *
  * Public literature (Cormode & Muthukrishnan 2005); no reference analog.
  */
object Sketches {

  /** Flattened depth×width counter matrix; row i occupies
    * counts[i·width, (i+1)·width).
    */
  final case class Cms(counts: Array[Long])

  val DefaultDepth = 4
  val DefaultWidth = 1024

  /** Hash row i's position for `item`: hex32 with per-row salt, mod width.
    * Codegen'd builtins only.
    */
  def positions(item: Column, depth: Int, width: Int): Seq[Column] =
    (0 until depth).map(i =>
      pmod(graft.operators.TextOps.hex32(item, salt = 1000 + i), lit(width.toLong)))

  private class CmsAgg(depth: Int, width: Int)
      extends Aggregator[Seq[Long], Cms, Cms] {
    override def zero: Cms = Cms(new Array[Long](depth * width))
    override def reduce(b: Cms, ps: Seq[Long]): Cms = {
      var i = 0
      while (i < depth) { b.counts(i * width + ps(i).toInt) += 1L; i += 1 }
      b
    }
    override def merge(x: Cms, y: Cms): Cms = {
      var i = 0
      while (i < x.counts.length) { x.counts(i) += y.counts(i); i += 1 }
      x
    }
    override def finish(b: Cms): Cms = b
    override def bufferEncoder: Encoder[Cms] = Encoders.product[Cms]
    override def outputEncoder: Encoder[Cms] = Encoders.product[Cms]
  }

  /** Build the sketch over `items(itemCol)` (nulls excluded): a one-row
    * DataFrame with `_cms` ARRAY<BIGINT> of depth·width counters.
    */
  def cmsBuild(items: DataFrame, itemCol: String, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): DataFrame = {
    require(depth >= 2, s"depth must be >= 2: $depth") // least() needs 2+ rows
    require(width > 0, s"width must be positive: $width")
    val spark = items.sparkSession
    import spark.implicits._
    items.filter(col(itemCol).isNotNull)
      .select(array(positions(col(itemCol), depth, width): _*).as("ps"))
      .as[Seq[Long]]
      .groupByKey(_ => 0)
      .agg(new CmsAgg(depth, width).toColumn.name("c"))
      .select(col("c.counts").as("_cms"))
  }

  /** Point estimate for `item` against a `_cms` column (ride the sketch in
    * via a one-row broadcast crossJoin): min over the depth rows — always
    * ≥ the true count.
    */
  def cmsEstimate(cms: Column, item: Column, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): Column =
    least(positions(item, depth, width).zipWithIndex.map { case (p, i) =>
      element_at(cms, (lit(i * width) + p + 1).cast("int"))
    }: _*)
}
