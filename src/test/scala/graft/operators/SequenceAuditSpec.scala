package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SequenceAudit: gap detection (sharded lead) and day-spine zero-fill. */
class SequenceAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("gaps finds every hole with exact lengths; duplicates tolerated; dense → empty") {
    val ids = (1L to 200L).filterNot(Set(5L, 6L, 7L, 50L, 199L).contains)
    val df = (ids ++ ids.take(10)).toDF("lsn") // duplicates
    for (b <- Seq(1, 4, 64)) {
      val got = SequenceAudit.gaps(df, "lsn", b)
        .as[(Long, Long)].collect().toSet
      assert(got == Set((4L, 3L), (49L, 1L), (198L, 1L)), s"nBuckets=$b")
    }
    assert(SequenceAudit.gaps((1L to 50L).toDF("lsn"), "lsn").count() == 0)
  }

  test("gaps plan: no single-partition window over the id frame") {
    val p = SequenceAudit.gaps((1L to 100L).toDF("lsn"), "lsn", 8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), p)
  }

  test("dailyCounts ≡ the inline spine/cross-join/fill formulation") {
    val ev = Seq(
      ("a", "2024-01-01"), ("a", "2024-01-01"), ("a", "2024-01-04"),
      ("b", "2024-01-02")).toDF("k", "ts")
      .select(col("k"), col("ts").cast("timestamp").as("ts"))
    val got = SequenceAudit.dailyCounts(ev, Seq("k"), col("ts"))
      .as[(String, java.sql.Date, Long)].collect()
      .map { case (k, dd, n) => (k, dd.toString, n) }.toSet
    // 4-day span × 2 keys, zero-filled
    val want = (for {
      k <- Seq("a", "b"); d <- 1 to 4
    } yield (k, s"2024-01-0$d",
      (k, d) match {
        case ("a", 1) => 2L; case ("a", 4) => 1L; case ("b", 2) => 1L
        case _ => 0L
      })).toSet
    assert(got == want)
  }

  test("dailyCounts spine is generated, never a row-range join") {
    val ev = Seq(("a", "2024-01-01")).toDF("k", "ts")
      .select(col("k"), col("ts").cast("timestamp").as("ts"))
    val p = SequenceAudit.dailyCounts(ev, Seq("k"), col("ts"))
      .queryExecution.optimizedPlan.toString
    assert(p.contains("explode") || p.contains("Generate"),
      s"spine must come from explode(sequence(...)):\n$p")
  }
}
