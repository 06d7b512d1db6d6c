package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Exact distributed heavy hitters (frequent items) via per-partition
  * Misra-Gries candidate generation + a candidate-restricted exact count.
  *
  * The scale story: a naive `GROUP BY item HAVING count > N/k` shuffles the
  * ENTIRE vocabulary — O(distinct items) exchange rows, which for token
  * streams at 100 TB is the corpus itself. This operator instead:
  *
  *   1. streams each partition once through a Misra-Gries summary of
  *      capacity k (O(k) memory, amortized O(1) per item),
  *   2. collects the tiny per-partition summaries (≤ (k+1)·numPartitions
  *      rows — bounded by configuration, not data; the ONLY driver-side
  *      materialization),
  *   3. broadcast-semi-joins the candidate set back and exact-counts ONLY
  *      candidate rows — the exchange after map-side partial aggregation is
  *      O(candidates × partitions), independent of vocabulary size.
  *
  * Correctness is exact, not approximate: Misra-Gries with capacity k
  * guarantees every item with partition frequency > n_p/(k+1) survives that
  * partition's summary, and by pigeonhole any item with GLOBAL frequency
  * > N/(k+1) must exceed n_p/(k+1) in at least one partition — so the union
  * of local survivors is a superset of every item with frequency > N/k.
  * The exact pass then removes the false positives. (Misra & Gries 1982,
  * "Finding repeated elements" — public literature; no reference analog.)
  */
object HeavyHitters {

  /** All items occurring in strictly more than 1/k of `items` rows, with
    * their exact counts: columns (`itemCol` STRING, `cnt` LONG).
    *
    * Null items are EXCLUDED — from the candidates, the exact pass, and the
    * total N the threshold is computed against. (A null could neither ride
    * the (null, n_p) partition-count sentinel nor survive the semi-join,
    * whose SQL null semantics never match; defining the operator over
    * non-null occurrences makes all three consistent.)
    *
    * Scans `items` twice (summary pass + exact pass) — the price of an
    * exact answer with an O(k·partitions)-bounded shuffle.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val norm = items.select(col(itemCol).cast("string").as(itemCol))
      .filter(col(itemCol).isNotNull)
    // (null, n_p) sentinel carries the partition's row count so the total N
    // comes out of the same single pass as the candidates
    val summaries: Array[(String, Long)] = norm.as[String].mapPartitions { it =>
      val counts = mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { s =>
        n += 1
        counts.get(s) match {
          case Some(c)                  => counts.update(s, c + 1)
          case None if counts.size < k  => counts.update(s, 1L)
          case None => // decrement-all: amortized O(1) — each decrement pays
            for (key <- counts.keys.toArray) { // back a previous increment
              val c = counts(key) - 1
              if (c == 0L) counts.remove(key) else counts.update(key, c)
            }
        }
      }
      Iterator.single((null.asInstanceOf[String], n)) ++ counts.iterator
    }.collect()
    val total = summaries.collect { case (s, n) if s == null => n }.sum
    val cands = summaries.collect { case (s, _) if s != null => s }.distinct.toSeq
    norm
      .join(broadcast(cands.toDF(itemCol)), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > lit(total)) // strict: "more than N/k"
  }
}
