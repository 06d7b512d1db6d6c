package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an EQUI-JOIN view from two keyed changelogs —
  * the join half of incremental view maintenance ([[IncrementalAgg]] is the
  * aggregate half). Downstream consumers of the reference's compacted topics
  * routinely join two of them (README.md:30–32 "combine it with other
  * datasets"); recomputing the join from full history on every refresh is
  * the thing IVM exists to avoid.
  *
  * The algebra is the standard signed-multiset (z-set) delta-join identity.
  * With `ΔA`/`ΔB` the signed row-deltas of one micro-batch and `A`/`B` the
  * standing latest-state relations:
  *
  *   Δ(A ⋈ B) = ΔA ⋈ B_old  +  A_new ⋈ ΔB
  *
  * (expanding `A_new = A_old + ΔA` recovers the symmetric three-term form
  * `ΔA⋈B + A⋈ΔB + ΔA⋈ΔB`). Each side's delta rows carry the full view
  * payload and a sign `dn ∈ {-1,+1}`; the view is a multiset of payload
  * rows with net multiplicity `n`, updated by unioning the signed pairs and
  * re-summing. Because payload values are carried VERBATIM (no arithmetic),
  * a retraction cancels the addition that produced it bit-exactly — the
  * fold is deterministic under any shuffle order.
  *
  * Why it scales: per micro-batch the work is two joins of O(|batch|)
  * deltas against a latest-state side plus one grouped sum over
  * O(|view_touched| + |ΔV|) rows — history is never re-read. In a persisted
  * deployment all three standing tables (latestA, latestB, view) live
  * hash-bucketed on the JOIN column ([[MaterializedTable.mergeBuckets]]
  * discipline, proven in [[IncrementalAgg.foldStanding]]): the big standing
  * side of each delta-join is consumed in place and only the delta side
  * shuffles, and the view re-sum rewrites only touched buckets.
  *
  * Contract: each changelog is keyed (its key columns are part of the
  * payload, so view rows from different keys can never collide) and batches
  * arrive in per-key commit order — the micro-batch property the streaming
  * sources here already guarantee ([[CdcPipeline]]).
  */
object JoinView {

  /** One side of the maintained join.
    *
    * @param keyCols     primary-key columns of this side's changelog
    * @param orderCols   commit-order columns, e.g. (lsn, seq)
    * @param payloadCols the columns this side contributes to the view —
    *                    MUST include `keyCols` (row identity) and the join
    *                    column; disjoint from the other side's payload
    * @param joinCol     payload column joined on
    * @param opCol       op column (`Op.Insert`/`Update`/`Delete`)
    */
  final case class Side(
      keyCols: Seq[String], orderCols: Seq[String],
      payloadCols: Seq[String], joinCol: String, opCol: String = "op") {
    require(keyCols.forall(payloadCols.contains),
      s"payloadCols must include keyCols: $keyCols ⊄ $payloadCols")
    require(payloadCols.contains(joinCol),
      s"payloadCols must include joinCol $joinCol")
  }

  /** Standing state: live latest versions of both sides (payload columns
    * only, one row per live key) and the view (payload ++ `n` multiplicity).
    */
  final case class State(latestA: DataFrame, latestB: DataFrame, view: DataFrame)

  /** The batch-final version of every key touched by `batch`:
    * (keyCols, payload STRUCT, live BOOLEAN). One `max_by` aggregation —
    * intra-batch supersedes collapse before anything else looks at them.
    */
  private def lastVersions(batch: DataFrame, side: Side): DataFrame = {
    val payload = struct(side.payloadCols.map(col): _*)
    batch.groupBy(side.keyCols.map(col): _*)
      .agg(max_by(
        struct(payload.as("p"), (col(side.opCol) =!= Op.Delete).as("live")),
        struct(side.orderCols.map(col): _*)).as("v"))
      .select(side.keyCols.map(col) :+ col("v.p").as("_p") :+ col("v.live").as("_live"): _*)
  }

  /** Signed payload deltas of `batch` relative to standing live rows `prev`:
    * retract prev's version of every touched key, add the batch-final
    * version where it is live. Returns payloadCols ++ dn.
    */
  def deltas(prev: DataFrame, batch: DataFrame, side: Side): DataFrame = {
    val last = lastVersions(batch, side)
    val adds = last.filter(col("_live"))
      .select(side.payloadCols.map(n => col(s"_p.$n").as(n)) :+ lit(1L).as("dn"): _*)
    val retracts = prev
      .join(last.select(side.keyCols.map(col): _*), side.keyCols, "left_semi")
      .select(side.payloadCols.map(col) :+ lit(-1L).as("dn"): _*)
    retracts.unionByName(adds)
  }

  /** `prev` with `batch` applied: untouched live rows kept, touched keys
    * replaced by their batch-final version (dropped if it is a delete).
    */
  private def applyBatch(prev: DataFrame, batch: DataFrame, side: Side): DataFrame = {
    val last = lastVersions(batch, side)
    val kept = prev.join(last.select(side.keyCols.map(col): _*), side.keyCols, "left_anti")
    val fresh = last.filter(col("_live"))
      .select(side.payloadCols.map(n => col(s"_p.$n").as(n)): _*)
    kept.unionByName(fresh)
  }

  /** Fold one micro-batch pair into the standing state. Either batch may be
    * empty. States are eagerly local-checkpointed so lineage stays O(1)
    * across folds (the persisted-bucket deployment makes this a table write).
    */
  def fold(state: State, batchA: DataFrame, batchB: DataFrame,
      a: Side, b: Side): State = {
    val dA = deltas(state.latestA, batchA, a)
    val dB = deltas(state.latestB, batchB, b)
    val aNew = applyBatch(state.latestA, batchA, a).localCheckpoint(true)
    val bNew = applyBatch(state.latestB, batchB, b).localCheckpoint(true)
    // Δ(A⋈B) = ΔA ⋈ B_old + A_new ⋈ ΔB; the sign of a pair is the delta
    // side's sign (the latest-state side always has multiplicity +1)
    val viewCols = a.payloadCols ++ b.payloadCols
    val dV =
      dA.join(state.latestB, dA(a.joinCol) === state.latestB(b.joinCol))
        .select(viewCols.map(col) :+ dA("dn"): _*)
        .unionByName(
          aNew.join(dB, aNew(a.joinCol) === dB(b.joinCol))
            .select(viewCols.map(col) :+ dB("dn"): _*))
    val viewNew = state.view
      .select(viewCols.map(col) :+ col("n").as("dn"): _*)
      .unionByName(dV)
      .groupBy(viewCols.map(col): _*)
      .agg(sum(col("dn")).as("n"))
      .filter(col("n") > 0)
      .localCheckpoint(true)
    State(aNew, bNew, viewNew)
  }

  /** Empty standing state shaped after the two sides (schemas taken from
    * zero-row projections of the given changelogs).
    */
  def emptyState(chlogA: DataFrame, chlogB: DataFrame, a: Side, b: Side): State = {
    val ea = chlogA.select(a.payloadCols.map(col): _*).limit(0)
    val eb = chlogB.select(b.payloadCols.map(col): _*).limit(0)
    val ev = ea.crossJoin(eb).withColumn("n", lit(0L)).limit(0)
    State(ea, eb, ev)
  }

  /** Fold a whole sequence of batch pairs from empty — the gate/spec driver.
    * Equivalent to joining the two compacted latest states, which is exactly
    * what the oracle checks.
    */
  def foldAll(batches: Seq[(DataFrame, DataFrame)], a: Side, b: Side): State = {
    require(batches.nonEmpty, "need at least one batch pair")
    val init = emptyState(batches.head._1, batches.head._2, a, b)
    batches.foldLeft(init) { case (st, (ba, bb)) => fold(st, ba, bb, a, b) }
  }
}
