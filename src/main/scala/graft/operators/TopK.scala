package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact per-group top-k WITHOUT sorting any group: a bounded-buffer typed
  * `Aggregator` keeps each group's k best rows as it folds.
  *
  * The scale story vs the window formulation (q11's
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`): the window
  * plan must shuffle EVERY row to its group's reducer and sort the whole
  * group — O(rows) exchange, O(n·log n) per-group sort, and the largest
  * group must fit a single task. This aggregator does map-side partial
  * aggregation: each partition reduces its slice of every group to ≤k
  * candidates BEFORE the shuffle, so the exchange carries
  * O(groups·k·partitions) buffers, no group is ever materialized or sorted,
  * and group skew cannot OOM a task. Same answer, bit-for-bit — ties break
  * on the id column, so the order is total and engine-independent.
  */
object TopK {

  /** One candidate row: ordering value + unique tie-break id. */
  final case class Entry(v: Double, id: Long)

  /** Aggregation buffer: best-first sorted, length ≤ k. A case class wrapper
    * so the buffer has a product (columnar) encoder — no kryo blobs.
    */
  final case class Buf(items: List[Entry])

  /** Larger v first; equal v breaks toward smaller id (total order — ids are
    * unique by contract). `Double.compare`, not `>`: IEEE `>`/`==` are both
    * false for NaN, which would make NaN placement insertion-order-dependent
    * — compare() totalizes NaN as the largest value and equal to itself,
    * matching Spark's own sort order.
    */
  private def better(a: Entry, b: Entry): Boolean = {
    val c = java.lang.Double.compare(a.v, b.v)
    c > 0 || (c == 0 && a.id < b.id)
  }

  class TopKAgg(k: Int) extends Aggregator[Entry, Buf, Buf] {
    require(k > 0, s"k must be positive, got $k")
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Entry): Buf = Buf(ins(b.items, a))
    override def merge(x: Buf, y: Buf): Buf = Buf(y.items.foldLeft(x.items)(ins))
    override def finish(b: Buf): Buf = b
    // O(k) ordered insert + trim — k is small by contract, so the buffer
    // stays a plain sorted list (a heap would only help at large k)
    private def ins(b: List[Entry], a: Entry): List[Entry] = {
      val (pre, post) = b.span(e => better(e, a))
      if (pre.length >= k) b else (pre ::: (a :: post)).take(k)
    }
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Top `k` rows of `df` per `groupCol`, ordered by `valueCol` descending
    * with ties broken by ascending `idCol`. Output: (groupCol, rank LONG
    * 1-based, idCol LONG, valueCol DOUBLE) — identical to the window
    * `row_number()` formulation, computed without it. NaN ranks largest
    * (Spark's sort order). Rows with a null value or id are EXCLUDED — a
    * null can never hold a rank; the contract is explicit because the
    * tuple encoder below would otherwise throw at runtime.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"), col(idCol).cast("long").as("id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => Entry(t._2, t._3))
      .agg(new TopKAgg(k).toColumn.name("top"))
      .select(col("key").as(groupCol), posexplode(col("top.items")))
      .select(col(groupCol), (col("pos").cast("long") + 1L).as("rank"),
        col("col.id").as(idCol), col("col.v").as(valueCol))
  }
}
