package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) materialization: turn a keyed changelog
  * into full VERSION HISTORY — one row per row-version, stamped with its
  * validity interval `[valid_from, valid_to)` in commit order and an
  * `is_current` flag.
  *
  * This is the other classic consumer of the reference's compacted topics
  * (README.md:30–32 "load it into a data warehouse"): where [[LatestState]]
  * reconstructs the present, SCD2 retains the past — every update closes the
  * previous version and opens a new one; a delete closes the last version
  * without opening another (the interval end IS the tombstone's LSN, so a
  * deleted key has no open version and `is_current` is false everywhere).
  *
  * Scale design: output is O(events) by definition (every insert/update is a
  * version), so the single hash exchange on the key columns + per-partition
  * sort that `lead()` needs is the minimal plan — nothing is shuffled twice,
  * and no state beyond one partition's sort buffer is held. Contrast with a
  * latest-state-then-join-back formulation, which would shuffle the changelog
  * twice. At 100 TB the exchange ships each event exactly once.
  */
object ScdHistory {

  /** @param changelog rows with key columns, ordering columns, an op column
    * @param keyCols   primary-key columns (≙ tuple_to_avro_key projection,
    *                  ext/oid2avro.c:221–260)
    * @param orderCols commit-order columns, e.g. (lsn, seq) — total order per key
    * @return all insert/update versions with `valid_to` (STRUCT of the order
    *         columns of the NEXT event for the key; null = open interval) and
    *         `is_current` (open interval ⇒ the key's live version)
    */
  def batch(
      changelog: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    val w = Window
      .partitionBy(keyCols.map(col).toIndexedSeq: _*)
      .orderBy(orderCols.map(col).toIndexedSeq: _*)
    val nextOrd: Column = lead(struct(orderCols.map(col).toIndexedSeq: _*), 1).over(w)
    changelog
      .withColumn("valid_to", nextOrd)
      .withColumn("is_current", col("valid_to").isNull && col(opCol) =!= Op.Delete)
      // deletes CLOSE the previous version (their order key is its valid_to,
      // already captured by lead) but are not versions themselves
      .filter(col(opCol) =!= Op.Delete)
  }
}
