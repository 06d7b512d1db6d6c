package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out join patterns (SURVEY §2b joins at 100 TB):
  *
  *   - [[bucketedTables]]: co-located joins via bucketing. Writing both fact
  *     tables bucketed+sorted by the join key means the join needs NO
  *     exchange at read time — the per-bucket layout IS the shuffle, paid
  *     once at write. The pattern for repeatedly-joined 100 TB fact tables.
  *   - [[saltedJoin]]: skew mitigation. A hot key floods one reducer in a
  *     plain shuffle join; salting fans the hot side out over `saltFactor`
  *     sub-keys and replicates the other side per salt, restoring balance.
  *     (AQE's skewedJoin does this adaptively; explicit salting is the
  *     deterministic fallback and works for aggregations too.)
  */
object ScaleJoins {

  /** Write both sides bucketed by the join key and return the bucketed
    * tables. Joining them produces a plan with no shuffle exchanges on
    * either side (asserted in the spec).
    */
  def bucketedTables(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, buckets: Int, leftName: String, rightName: String)
      : (DataFrame, DataFrame) = {
    left.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(leftName)
    right.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(rightName)
    (spark.table(leftName), spark.table(rightName))
  }

  /** Skew-safe equi-join: explode `right` (the small/medium side) once per
    * salt value, salt `left`'s hot keys uniformly, join on (key, salt).
    * Semantics identical to `left.join(right, key)` for any data; the win is
    * when some key dominates `left`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
