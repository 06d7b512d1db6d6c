package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TABLE DIFF / RECONCILIATION — the anti-entropy tool a CDC deployment
  * runs to answer "does the replica actually match the source?": compare
  * two keyed snapshots and report every divergent key as `added` (in new
  * only), `removed` (in old only), or `changed` (both, with the exact set
  * of differing columns). The reference's pipeline ships changes; this
  * operator audits that they all arrived — and after an incident it scopes
  * the damage to named keys and columns instead of "re-sync everything".
  *
  * Scale shape: ONE full-outer hash equi-join on the key (both sides
  * shuffle once on the key they would already be bucketed by in a
  * persisted deployment — co-located, zero-exchange); per-column
  * comparison is pure projection; rows that match are dropped BEFORE the
  * report materializes, so output is O(divergence), not O(table). No
  * row-by-row driver loop, no collect.
  */
object TableDiff {

  /** Diff `oldT` → `newT` on `key`. Returns (key, change, changed_cols)
    * where change ∈ {added, removed, changed} and changed_cols is a
    * comma-joined, schema-ordered list of columns whose values differ
    * (null-safe compare; empty for added/removed). Identical rows are not
    * returned. Schemas must match.
    */
  def diff(oldT: DataFrame, newT: DataFrame, key: String): DataFrame = {
    require(oldT.columns.toSeq == newT.columns.toSeq,
      s"schema mismatch: ${oldT.columns.mkString(",")} vs ${newT.columns.mkString(",")}")
    val cols = oldT.columns.filter(_ != key).toSeq
    val l = oldT.select(col(key).as("_lk"),
      struct(cols.map(col): _*).as("_l"))
    val r = newT.select(col(key).as("_rk"),
      struct(cols.map(col): _*).as("_r"))
    val changedCols = array_join(
      filter(
        array(cols.map(c =>
          when(!(col(s"_l.$c") <=> col(s"_r.$c")), lit(c))): _*),
        x => x.isNotNull),
      ",")
    l.join(r, col("_lk") === col("_rk"), "full_outer")
      .select(coalesce(col("_lk"), col("_rk")).as(key),
        when(col("_lk").isNull, lit("added"))
          .when(col("_rk").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change"),
        when(col("_lk").isNull || col("_rk").isNull, lit(""))
          .otherwise(changedCols).as("changed_cols"))
      .filter(col("change") =!= "changed" || col("changed_cols") =!= "")
  }

  /** [[diff]] plus the NEW-side row values for added/changed keys — a
    * PATCH: everything needed to move a replica from `oldT` to `newT`
    * without reshipping the table. Returns (key, change, changed_cols,
    * _new STRUCT — null for removed). `applyPatch(oldT, patch) ≡ newT` is
    * the contract (ScalaCheck-pinned).
    */
  def diffRows(oldT: DataFrame, newT: DataFrame, key: String): DataFrame = {
    require(oldT.columns.toSeq == newT.columns.toSeq,
      s"schema mismatch: ${oldT.columns.mkString(",")} vs ${newT.columns.mkString(",")}")
    val cols = oldT.columns.filter(_ != key).toSeq
    val l = oldT.select(col(key).as("_lk"), struct(cols.map(col): _*).as("_l"))
    val r = newT.select(col(key).as("_rk"), struct(cols.map(col): _*).as("_r"))
    val changedCols = array_join(
      filter(
        array(cols.map(c =>
          when(!(col(s"_l.$c") <=> col(s"_r.$c")), lit(c))): _*),
        x => x.isNotNull),
      ",")
    l.join(r, col("_lk") === col("_rk"), "full_outer")
      .select(coalesce(col("_lk"), col("_rk")).as(key),
        when(col("_lk").isNull, lit("added"))
          .when(col("_rk").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change"),
        when(col("_lk").isNull || col("_rk").isNull, lit(""))
          .otherwise(changedCols).as("changed_cols"),
        col("_r").as("_new"))
      .filter(col("change") =!= "changed" || col("changed_cols") =!= "")
  }

  /** Apply a [[diffRows]] patch: drop removed/changed keys from `oldT`,
    * add the patch's new rows for added/changed keys. One anti-join + one
    * union — the replica-side catch-up a full re-ship would waste a table
    * scan on. `applyPatch(oldT, diffRows(oldT, newT, k), k) ≡ newT`.
    */
  def applyPatch(oldT: DataFrame, patch: DataFrame, key: String): DataFrame = {
    val cols = oldT.columns.filter(_ != key).toSeq
    val gone = patch.filter(col("change").isin("removed", "changed"))
      .select(col(key))
    val kept = oldT.join(gone, Seq(key), "left_anti")
    val incoming = patch.filter(col("change").isin("added", "changed"))
      .select(col(key) +: cols.map(c => col(s"_new.$c").as(c)): _*)
    kept.select(oldT.columns.map(col): _*).unionByName(incoming)
  }
}
