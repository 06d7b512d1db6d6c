package graft.cdc

import org.apache.spark.sql.Dataset

/** Update splitting (key-change rewrite) — ≙ ext/protocol_server.c:129–136:
  * if an UPDATE changed the primary key, downstream compaction keyed on the
  * new key would silently leave the old key's state behind; the reference
  * rewrites such updates as DELETE(old key) + INSERT(new key).
  *
  * Spark-first: a `flatMap` over the envelope — narrow (no shuffle), fully
  * pipelined inside whole-stage codegen's surrounding stages.
  */
object UpdateSplit {

  /** Key of the "before" image when it differs from `key`; null otherwise.
    * (The generic envelope carries the old key inside `before`; a key change
    * is detectable as before-key ≠ key, mirroring the reference's memcmp of
    * old/new key bytes.)
    */
  /** Every event's seq is doubled (order-preserving), so the synthetic
    * insert's odd seq (2·seq+1) can never collide with the NEXT real event in
    * the transaction — `seq+1` would tie with it and make (lsn, seq)
    * compaction ordering ambiguous (a following delete of the new key could
    * lose to the synthetic insert and resurrect the row).
    */
  def apply(events: Dataset[CdcEvent], oldKeyOf: CdcEvent => String): Dataset[CdcEvent] = {
    import events.sparkSession.implicits._
    events.flatMap { e =>
      val oldKey = oldKeyOf(e)
      if (e.op == Op.Update && oldKey != null && oldKey != e.key)
        Seq(
          e.copy(op = Op.Delete, key = oldKey, after = null, seq = 2 * e.seq),
          e.copy(op = Op.Insert, before = null, seq = 2 * e.seq + 1))
      else Seq(e.copy(seq = 2 * e.seq))
    }
  }
}
