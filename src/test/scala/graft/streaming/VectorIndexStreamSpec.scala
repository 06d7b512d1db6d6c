package graft.streaming

import graft.SparkTestSession
import graft.operators.IvfIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** One change-stream row: an embedding upsert/tombstone for a document id. */
case class VecChange(op: String, vec_id: Long, embedding: Seq[Float],
    lsn: Long, seq: Long)

/** Streaming ANN index maintenance (VectorIndexStream): the saved IVF index
  * follows a CDC embedding stream without rebuilds — stream-built state
  * equals the frozen-centroid batch composition, and replays are silent.
  */
class VectorIndexStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  def emb = graft.Tables.embeddings(spark, dir)

  private def assignedSet(idx: IvfIndex.Index): Set[(Long, Seq[Long], Long, Int)] = {
    import spark.implicits._
    idx.assigned.select(col("neighbor_id"), col("cq"), col("n2c"), col("cell"))
      .as[(Long, Seq[Long], Long, Int)].collect().toSet
  }

  test("stream-built index ≡ frozen-centroid batch composition; replays silent") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = emb.filter(col("vec_id") % 2 === 0)
    val idxDir = java.nio.file.Files.createTempDirectory("vis_idx").toString
    IvfIndex.build(base, "vec_id", "embedding", nLists = 8).save(idxDir)
    // snapshot the base index BEFORE maintenance mutates the directory
    val centroids = spark.read.parquet(s"$idxDir/centroids").localCheckpoint()
    val baseAssigned = IvfIndex.load(spark, idxDir).assigned.localCheckpoint()

    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val flip = rows(1L).map(-_)
    val events = Seq(
      // batch of inserts (odd ids) — including an in-batch self-replay
      VecChange("insert", 1L, rows(1L), 10, 0),
      VecChange("insert", 1L, rows(1L), 10, 0),
      VecChange("insert", 3L, rows(3L), 11, 0),
      VecChange("insert", 5L, rows(5L), 12, 0),
      // update: id 1's vector REPLACED (flipped) — stale row must go
      VecChange("update", 1L, flip, 13, 0),
      // delete of a base (even) id and of a streamed id
      VecChange("delete", 2L, null, 14, 0),
      VecChange("delete", 5L, null, 15, 0))

    val input = MemoryStream[VecChange]
    input.addData(events)
    val ckpt = java.nio.file.Files.createTempDirectory("vis_ckpt").toString
    val q = VectorIndexStream.maintain(input.toDF(), idxDir,
      "vec_id", "embedding", Seq("lsn", "seq"), ckpt)
    q.awaitTermination()

    // expected: the same changes applied through the batch operators on the
    // frozen centroids (public API only — remove touched ids, append alive)
    val inMem0 = IvfIndex.Index(centroids, baseAssigned)
    val touched = Seq(1L, 3L, 5L, 2L).toDF("vec_id")
    val alive = Seq((1L, flip), (3L, rows(3L))).toDF("vec_id", "embedding")
    val expected = IvfIndex.append(
      IvfIndex.remove(inMem0, touched, "vec_id"), alive, "vec_id", "embedding")

    val got = IvfIndex.load(spark, idxDir)
    assert(assignedSet(got) == assignedSet(expected),
      "stream-maintained index must equal the frozen-centroid batch composition")
    assert(!assignedSet(got).exists(r => r._1 == 2L || r._1 == 5L),
      "deleted ids must leave the index")

    // replays are silent: re-apply the whole event set as one batch (the
    // at-least-once worst case — every event redelivered) → state unchanged
    VectorIndexStream.applyBatch(events.toDF(), idxDir,
      "vec_id", "embedding", Seq("lsn", "seq"))
    assert(assignedSet(IvfIndex.load(spark, idxDir)) == assignedSet(expected),
      "replaying every event must not change the index")

    // and searches over the maintained index actually see the new vectors
    val probe = emb.filter(col("vec_id") === 4L)
    val res = IvfIndex.searchIndex(probe, IvfIndex.load(spark, idxDir),
      "vec_id", "embedding", k = 3, nProbe = 8)
      .select("neighbor_id").as[Long].collect().toSet
    assert(res.nonEmpty && !res.contains(2L) && !res.contains(5L))
  }

  test("the same loop maintains an IVF-PQ index (IvfPqOps); replays silent") {
    import spark.implicits._
    import graft.operators.PqIndex
    val base = emb.filter(col("vec_id") % 2 === 0)
    val idxDir = java.nio.file.Files.createTempDirectory("vis_pq").toString
    PqIndex.buildIvf(base, "vec_id", "embedding", nLists = 8).save(idxDir)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    val events = Seq(
      VecChange("insert", 7L, rows(7L), 10, 0),
      VecChange("insert", 9L, rows(9L), 11, 0),
      VecChange("delete", 0L, null, 12, 0))
    VectorIndexStream.applyBatch(events.toDF(), idxDir,
      "vec_id", "embedding", Seq("lsn", "seq"), ops = VectorIndexStream.IvfPqOps)
    def codeMap(idx: PqIndex.IvfPq): Map[Long, (Int, Seq[Int])] =
      idx.codes.select(col("neighbor_id"), col("cell"), col("codes"))
        .as[(Long, Int, Seq[Int])].collect()
        .map { case (id, c, cs) => id -> (c, cs) }.toMap
    val after = codeMap(PqIndex.loadIvf(spark, idxDir))
    assert(after.contains(7L) && after.contains(9L) && !after.contains(0L))
    // replay the full batch: state unchanged
    VectorIndexStream.applyBatch(events.toDF(), idxDir,
      "vec_id", "embedding", Seq("lsn", "seq"), ops = VectorIndexStream.IvfPqOps)
    assert(codeMap(PqIndex.loadIvf(spark, idxDir)) == after)
  }
}
