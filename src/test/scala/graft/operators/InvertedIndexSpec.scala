package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  /** Straight-line truth: sliding window over the whitespace token list. */
  private def bruteCount(tokens: Array[String], q: Array[String]): Int =
    (0 to tokens.length - q.length)
      .count(i => q.indices.forall(j => tokens(i + j) == q(j)))

  test("phrase search ≡ sliding-window scan; save/load round-trip; bucket pruning") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val ixDir = java.nio.file.Files.createTempDirectory("ix_spec").toString + "/ix"
    InvertedIndex.save(docs, "doc_id", "text", ixDir, nBuckets = 8)
    val idx = InvertedIndex.load(spark, ixDir)
    assert(idx.nBuckets == 8, "artifact must be self-describing")

    val corpus = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }.toMap
    for (phrase <- Seq("table hash", "a a", "slow hash batch", "nosuchtoken q")) {
      val q = phrase.split(" ")
      val got = idx.searchPhrase(phrase)
        .as[(Long, Long)].collect().toMap
      val want = corpus.view.mapValues(t => bruteCount(t, q).toLong)
        .filter(_._2 > 0).toMap
      assert(got == want, s"phrase '$phrase'")
    }

    // loaded search ≡ in-memory postings (the artifact changes nothing)
    val mem = InvertedIndex.phraseMatches(
        InvertedIndex.postings(docs, "doc_id", "text"), Seq("table", "hash"))
      .as[(Long, Long)].collect().toSet
    val loaded = idx.searchPhrase("table hash").as[(Long, Long)].collect().toSet
    assert(mem == loaded)

    // the literal bucket isin must reach the postings scan as a PARTITION
    // filter — the pruning contract of the stored layout
    val plan = idx.searchPhrase("table hash").queryExecution.executedPlan
    val inner = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val scans = inner.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("postings")) => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.exists(_.toString.contains("tbucket"))),
      "query-token bucket filter must prune the postings partitions")
  }

  test("BM25 ranking ≡ straight-line scoring; fold order is token order") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val ixDir = java.nio.file.Files.createTempDirectory("ix_bm25").toString + "/ix"
    InvertedIndex.save(docs, "doc_id", "text", ixDir)
    val got = InvertedIndex.load(spark, ixDir)
      .searchRanked("table hash scan", k = 10)
      .select("doc_id", "score", "rank")
      .as[(Long, Double, Int)].collect().toSeq.sortBy(_._3)

    // straight-line truth: exact integer num/den per term, one double
    // divide, left-fold in sorted-token order
    val corpus = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }
    val n = corpus.length.toLong
    val total = corpus.map(_._2.length.toLong).sum
    val q = Seq("hash", "scan", "table") // sorted
    val dfm = q.map(t => t -> corpus.count(_._2.contains(t)).toLong).toMap
    val want = corpus.flatMap { case (id, toks) =>
      val terms = q.flatMap { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) None
        else {
          val num = (2 * n - 2 * dfm(t) + 1) * 44 * tf * total
          val den = (2 * dfm(t) + 1) *
            (20 * tf * total + 6 * total + 18 * toks.length.toLong * n)
          Some(num.toDouble / den.toDouble)
        }
      }
      if (terms.isEmpty) None
      else Some(id -> terms.foldLeft(0.0)(_ + _))
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(got.map(r => (r._1, r._2)) == want.toSeq,
      "scores and order must match the straight-line fold bit-for-bit")
  }

  test("append + tombstone delete + compact ≡ building on the final corpus") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val ixDir = java.nio.file.Files.createTempDirectory("ix_maint").toString + "/ix"
    InvertedIndex.save(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", ixDir)
    val idx = InvertedIndex.load(spark, ixDir)
    idx.appendDocs(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    idx.removeDocs(docs.filter(col("doc_id") % 7 === 0).select("doc_id"), "doc_id")
    // reference: an index built directly on the surviving corpus
    val refDir = java.nio.file.Files.createTempDirectory("ix_ref").toString + "/ix"
    InvertedIndex.save(docs.filter(col("doc_id") % 7 =!= 0), "doc_id", "text", refDir)
    val ref = InvertedIndex.load(spark, refDir)
    def res(i: InvertedIndex.Index) = (
      i.searchPhrase("table hash").as[(Long, Long)].collect().toSet,
      i.searchRanked("table hash scan", 10)
        .as[(Long, Double, Int)].collect().toSet)
    val before = res(idx)
    assert(before == res(ref),
      "tombstoned reads (incl. BM25's N/total) must equal the rebuilt index")
    // physical reclaim changes nothing visible and empties the tombstones
    assert(idx.compactDeletes() > 0)
    assert(res(idx) == before)
    assert(idx.compactDeletes() == 0, "second compact is a no-op")
  }

  test("segmented stream index: update/delete/resurrect semantics; replay idempotent") {
    import spark.implicits._
    import graft.streaming.InvertedIndexStream
    val ixDir = java.nio.file.Files.createTempDirectory("ix_seg").toString + "/ix"
    def batch(rows: (String, Long, Long, String)*) =
      rows.toSeq.toDF("op", "doc_id", "lsn", "text")
    val b0 = batch(("insert", 1L, 1L, "x y"), ("insert", 2L, 2L, "x z"))
    val b1 = batch(("update", 1L, 10L, "y y"), ("delete", 2L, 11L, null))
    val b2 = batch(("insert", 2L, 20L, "x y")) // resurrect after delete
    InvertedIndexStream.foldBatch(b0, ixDir, 0L, nBuckets = 4)
    InvertedIndexStream.foldBatch(b1, ixDir, 1L, nBuckets = 4)
    InvertedIndexStream.foldBatch(b2, ixDir, 2L, nBuckets = 4)
    def res(p: String) = InvertedIndexStream.searchPhrase(spark, ixDir, p)
      .as[(Long, Long)].collect().toMap
    def all() = (res("x"), res("y"), res("z"), res("x y"))
    val want = (
      Map(2L -> 1L),             // doc1's x died with its update
      Map(1L -> 2L, 2L -> 1L),   // updated doc1 has y twice; resurrected doc2 once
      Map.empty[Long, Long],     // z existed only in the deleted version
      Map(2L -> 1L))             // adjacency spans only the live version
    assert(all() == want)
    // foreachBatch replay: re-folding a batch rewrites its own partitions —
    // results identical, nothing double-counted
    InvertedIndexStream.foldBatch(b1, ixDir, 1L, nBuckets = 4)
    assert(all() == want)
  }

  test("stream searchRanked through segments+tombstones ≡ batch index on the churned corpus") {
    import spark.implicits._
    import graft.streaming.InvertedIndexStream
    val docs = graft.Tables.documents(spark, dir)
    val ixDir = java.nio.file.Files.createTempDirectory("ix_segrk").toString + "/ix"
    // churn: insert all → update %3 reversed → delete %5 (txt82's drive)
    InvertedIndexStream.foldBatch(
      docs.select(lit("insert").as("op"), col("doc_id"),
        col("doc_id").as("lsn"), col("text")), ixDir, 0L, nBuckets = 4)
    InvertedIndexStream.foldBatch(
      docs.filter(col("doc_id") % 3 === 0)
        .select(lit("update").as("op"), col("doc_id"),
          (col("doc_id") + 1000000L).as("lsn"), reverse(col("text")).as("text")),
      ixDir, 1L, nBuckets = 4)
    InvertedIndexStream.foldBatch(
      docs.filter(col("doc_id") % 5 === 0)
        .select(lit("delete").as("op"), col("doc_id"),
          (col("doc_id") + 2000000L).as("lsn"),
          lit(null).cast("string").as("text")), ixDir, 2L, nBuckets = 4)
    // reference: a batch index built directly on the final corpus — the
    // segment view must match it bit-for-bit, INCLUDING the corpus-level
    // N/total normalization (live doclens, not all-ever doclens)
    val refDir = java.nio.file.Files.createTempDirectory("ix_segrkref").toString + "/ix"
    InvertedIndex.save(
      docs.filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, reverse(col("text")))
            .otherwise(col("text")).as("text")),
      "doc_id", "text", refDir)
    val got = InvertedIndexStream.searchRanked(spark, ixDir, "table hash scan", 10)
      .as[(Long, Double, Int)].collect().toSet
    val want = InvertedIndex.load(spark, refDir)
      .searchRanked("table hash scan", 10)
      .as[(Long, Double, Int)].collect().toSet
    assert(got == want)
  }

  test("repeated-token adjacency on a handcrafted doc") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b a a"), (2L, "b a b"), (3L, ""))
      .toDF("doc_id", "text")
    def run(p: String) = InvertedIndex.phraseMatches(
        InvertedIndex.postings(docs, "doc_id", "text"),
        p.split(" ").toSeq)
      .as[(Long, Long)].collect().toMap
    assert(run("a a") == Map(1L -> 3L))     // bases 0,1 and 4 — overlap counts
    assert(run("a a a") == Map(1L -> 1L))
    assert(run("a b") == Map(1L -> 1L, 2L -> 1L))
    assert(run("b a b") == Map(2L -> 1L))
    assert(run("c") == Map.empty)
  }
}
