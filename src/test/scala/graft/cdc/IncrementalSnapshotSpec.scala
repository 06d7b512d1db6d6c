package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chunked-watermark snapshot merge: every interleaving of chunk reads and
  * stream tail must reconstruct exactly the full-history latest state.
  */
class IncrementalSnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def env(rows: Seq[(String, Long, String, Double)]) =
    rows.map { case (op, lsn, key, v) =>
      CdcEvent(op, "public.t", lsn, lsn / 10, 0L, key,
        before = null,
        after = if (op == Op.Delete) null else s"""{"v":$v}""")
    }.toDF()

  private def stateOf(df: org.apache.spark.sql.DataFrame) =
    df.select($"key", get_json_object($"after", "$.v").cast("double"))
      .as[(String, Double)].collect().toSet

  private val chunk = abs(hash(col("key"))) % 2

  test("merged chunked snapshot ≡ full-history latest state (all the hazard cases)") {
    val rows = Seq(
      ("insert", 1L, "dead_before_horizon", 1.0),
      ("delete", 2L, "dead_before_horizon", 0.0),  // must NOT resurrect
      ("insert", 3L, "stable_prefix", 2.0),         // only the chunk carries it
      ("insert", 4L, "updated_in_gap", 3.0),
      ("update", 6L, "updated_in_gap", 3.5),        // in (horizon, watermark]: chunk AND tail
      ("insert", 2L, "changed_after_wm", 4.0),
      ("update", 9L, "changed_after_wm", 4.5),      // tail must win
      ("insert", 7L, "born_in_tail", 5.0),
      ("insert", 1L, "deleted_in_tail", 6.0),
      ("delete", 8L, "deleted_in_tail", 0.0))
    val e = env(rows)
    val merged = IncrementalSnapshot.mergedState(e, Seq("table", "key"),
      chunk, watermarks = Seq(6L, 7L), horizon = 5L)
    val full = LatestState.batch(e, Seq("table", "key"), Seq("lsn", "seq"))
    assert(stateOf(merged) == stateOf(full))
    assert(stateOf(merged).map(_._1) ==
      Set("stable_prefix", "updated_in_gap", "changed_after_wm", "born_in_tail"))
    // not duplicated: one row per surviving key
    assert(merged.count() == 4)
  }

  test("a watermark below the stream horizon is refused (gap would lose changes)") {
    intercept[IllegalArgumentException] {
      IncrementalSnapshot.mergedState(env(Seq(("insert", 1L, "k", 1.0))),
        Seq("table", "key"), chunk, watermarks = Seq(3L, 9L), horizon = 5L)
    }
  }

  test("randomized: any horizon/watermark layout ≥ horizon reconstructs full state") {
    val rnd = new scala.util.Random(13)
    val ops = Array("insert", "update", "delete")
    for (trial <- 1 to 15) {
      val n = 5 + rnd.nextInt(30)
      val rows = (1 to n).map(i =>
        (ops(rnd.nextInt(3)), i.toLong, s"k${rnd.nextInt(6)}", rnd.nextInt(40).toDouble))
      val e = env(rows)
      val hz = rnd.nextInt(n).toLong
      val nChunks = 1 + rnd.nextInt(3)
      val wms = (1 to nChunks).map(_ => hz + rnd.nextInt(n - hz.toInt + 1).toLong)
      val merged = IncrementalSnapshot.mergedState(e, Seq("table", "key"),
        abs(hash(col("key"))) % nChunks, wms, hz)
      val full = LatestState.batch(e, Seq("table", "key"), Seq("lsn", "seq"))
      assert(stateOf(merged) == stateOf(full), s"trial=$trial hz=$hz wms=$wms rows=$rows")
    }
  }
}
