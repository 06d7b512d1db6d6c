package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer PageRank (hand-computed fixed point values, partitioning
  * invariance) and MMR diversity rerank (near-duplicate crowding broken).
  */
class RankDiversitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("integerPageRank: hand-computed 2-round values; sinks lose mass; dst-only nodes ranked") {
    // a→b, a→c, b→c; c is a sink (no out-edges) and appears only as dst
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val r = PageRank.integerPageRank(edges, "src", "dst", iters = 2)
      .as[(String, Long)].collect().toMap
    // r1: a=150000, b=150000+850*(1000000//2)//1000=575000,
    //     c=150000+850*(500000+1000000)//1000=1425000
    // r2: contribs a→{b,c}: 150000//2=75000; b→c: 575000
    assert(r == Map("a" -> 150000L, "b" -> 213750L, "c" -> 702500L))
    // zero iterations = everyone at initRank
    val r0 = PageRank.integerPageRank(edges, "src", "dst", iters = 0)
      .as[(String, Long)].collect().toMap
    assert(r0.values.toSet == Set(1000000L) && r0.keySet == Set("a", "b", "c"))
  }

  test("integerPageRank: invariant under repartitioning; cycle holds steady state") {
    val cyc = Seq(("x", "y"), ("y", "z"), ("z", "x")).toDF("src", "dst")
    val a = PageRank.integerPageRank(cyc, "src", "dst", 3)
      .as[(String, Long)].collect().toMap
    // out-degree 1 everywhere: every round r' = 150000 + 850*r//1000 — the
    // fixed-point sequence 1000000 → 1000000 (850000+150000) forever
    assert(a.values.toSet == Set(1000000L))
    val b = PageRank.integerPageRank(cyc.repartition(7), "src", "dst", 3)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("mmrRerank breaks near-duplicate crowding that plain top-k suffers") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),        // probe
      (10L, Array(1.0f, 0.05f, 0.0f)),      // near-dup pair, highest sims
      (11L, Array(1.0f, 0.051f, 0.0f)),
      (20L, Array(0.7f, -0.7f, 0.0f)),      // relevant but distinct
      (30L, Array(0.0f, 0.0f, 1.0f))        // orthogonal
    ).toDF("vec_id", "embedding")
    val probe = corpus.filter($"vec_id" === 1L)
    val top2 = Similarity.knnBrute(probe, corpus, "vec_id", "embedding", k = 2)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(top2 == Set(10L, 11L)) // plain top-k: both near-dups
    val mmr = Similarity.mmrRerank(probe, corpus, "vec_id", "embedding",
      k = 3, candidates = 4)
      .orderBy($"pick").select($"neighbor_id").as[Long].collect().toSeq
    assert(mmr.head == 10L || mmr.head == 11L) // first pick = most relevant
    assert(mmr(1) == 20L, s"second pick should diversify away: $mmr")
    assert(mmr.size == 3 && mmr.toSet.size == 3)
  }

  test("mmrTopK (single-exchange) ≡ mmrRerank picks on every (k, candidates)") {
    // deterministic synthetic corpus: 24 vectors on a seeded integer lattice
    val corpus = (0 until 24).map { i =>
      (i.toLong, Array(
        ((i * 37 + 11) % 19 - 9).toFloat / 9f,
        ((i * 53 + 7) % 17 - 8).toFloat / 8f,
        ((i * 71 + 3) % 13 - 6).toFloat / 6f))
    }.toDF("vec_id", "embedding")
    val probes = corpus.filter($"vec_id" < 4L)
    for ((k, c) <- Seq((3, 8), (5, 16), (8, 8))) {
      val a = Similarity.mmrRerank(probes, corpus, "vec_id", "embedding",
          k = k, candidates = c)
        .select($"probe_id", $"pick", $"neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
      val b = Similarity.mmrTopK(probes, corpus, "vec_id", "embedding",
          candidates = c, k = k)
        .select($"probe_id", $"rank", $"cand_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(a == b, s"variants diverged at k=$k candidates=$c")
    }
  }

  test("mmrTopK truncates when candidates run out; scores non-increasing is NOT assumed") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val probe = corpus.filter($"vec_id" === 1L)
    // only 2 candidates exist (probe excluded); k=5 truncates to 2 ranks
    val got = Similarity.mmrTopK(probe, corpus, "vec_id", "embedding",
        candidates = 5, k = 5)
      .select($"rank", $"cand_id").as[(Int, Long)].collect().sorted
    assert(got.map(_._1).toSeq == Seq(1, 2) && got.map(_._2).toSet == Set(2L, 3L))
  }

  test("recallAtK: identity = 1.0, disjoint = 0, partial counts exactly; missed probes anchored") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (2L, 22L))
      .toDF("probe_id", "neighbor_id")
    assert(Similarity.recallAtK(exact, exact, 3)
      .select($"recall").as[Double].collect().forall(_ == 1.0))
    val approx = Seq((1L, 10L), (1L, 99L), (1L, 98L)) // probe 2 entirely missed
      .toDF("probe_id", "neighbor_id")
    val r = Similarity.recallAtK(exact, approx, 3)
      .select($"probe_id", $"n_hit", $"recall")
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((1L, 1.0 / 3)))
    assert(r(2L) == ((0L, 0.0)))
  }

  test("mmrRerank: pick 1 equals brute rank 1; picks are distinct candidates") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter($"vec_id" < 5)
    val mmr = Similarity.mmrRerank(probes, emb, "vec_id", "embedding",
      k = 3, candidates = 8)
    val first = mmr.filter($"pick" === 1)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val brute1 = Similarity.knnBrute(probes, emb, "vec_id", "embedding", k = 1)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(first == brute1)
    val perProbe = mmr.groupBy($"probe_id")
      .agg(count(lit(1)).as("n"), countDistinct($"neighbor_id").as("nd"))
      .as[(Long, Long, Long)].collect()
    assert(perProbe.forall(r => r._2 == 3 && r._3 == 3))
  }
}
