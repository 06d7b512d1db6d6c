package graft.operators

import graft.SparkTestSession
import graft.cdc.ErrorPolicy
import graft.functions.SimHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def corpus() = {
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    docs
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          expr("substring(text, 1, length(text)-10)").as("text")))
  }

  test("exact dedup finds every planted duplicate and nothing else") {
    import spark.implicits._
    val groups = Dedup.exactGroups(corpus(), "doc_id", "text")
    val keeps = groups.select("keep_id").as[Long].collect().toSet
    assert(groups.count() == 50)                       // 500 docs / 10
    assert(keeps.forall(_ % 10 == 0))                  // kept id is the original
    val deduped = Dedup.exactDedup(corpus(), "doc_id", "text")
    assert(deduped.count() == corpus().count() - 50)
  }

  test("clusterDedup keeps exactly the min-id representative per cluster") {
    import spark.implicits._
    val kept = Dedup.clusterDedup(corpus(), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // planted exact copies (+100000) can never be representatives — their
    // original (a strictly smaller id) shares the cluster, so they die.
    // (The original itself may still fall to an even smaller NATURAL
    // near-dup in its cluster, so no blanket originals-kept claim.)
    val copies = (0L until 500L by 10).toSet
    assert(copies.forall(i => !kept(i + 100000)), "exact copies dropped")
    // membership is exactly: all docs minus non-representative members
    val reps = Dedup.clustersDistributed(
      Dedup.minhashCandidatePairs(corpus(), "doc_id", "text"))
      .as[(Long, Long)].collect()
    val dropped = reps.filter(r => r._1 != r._2).map(_._1).toSet
    val all = corpus().select("doc_id").as[Long].collect().toSet
    assert(kept == all -- dropped)
  }

  test("similarDocs: the clipped original ranks first; k bound; cross-only") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val queries = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 400000).as("doc_id"),
        expr("substring(text, 1, length(text)-10)").as("text"))
    val got = Dedup.similarDocs(docs, queries, "doc_id", "text", k = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (q, n, j, r) =>
      q >= 400000 && n < 400000 && r >= 1 && r <= 3 && j >= 0 && j <= 1 })
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length <= 3 &&
        rows.map(_._4).sorted.toSeq == (1 to rows.length).toSeq)
      // within a query's result, rank follows (jaccard desc, id)
      val sorted = rows.sortBy(_._4).toSeq
      assert(sorted.sliding(2).forall {
        case Seq(x, y) => x._3 > y._3 || (x._3 == y._3 && x._2 < y._2)
        case _ => true
      }, s"rank order broken for $q")
    }
    // a query whose rank-1 is its own clipped original (jaccard near 1)
    val rank1 = got.filter(_._4 == 1).map(r => r._1 -> (r._2, r._3)).toMap
    val selfHits = rank1.count { case (q, (n, _)) => n == q - 400000 }
    assert(selfHits >= rank1.size * 8 / 10,
      s"most queries must retrieve their own original first: $selfHits/${rank1.size}")
  }

  test("cross-corpus decontamination flags planted eval contamination, never train-train pairs") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val eval = docs.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + 200000).as("doc_id"),
        expr("substring(text, 1, length(text)-10)").as("text"))
    val got = Dedup.crossCorpusNearDups(docs, eval, "doc_id", "text", minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (a, b, j) => a < 200000 && b >= 200000 && j >= 0.5 },
      "every pair must be train-side × eval-side above the threshold")
    val planted = docs.filter(col("doc_id") % 17 === 0).select("doc_id").as[Long]
      .collect().map(i => (i, i + 200000)).toSet
    val gotPairs = got.map(p => (p._1, p._2)).toSet
    val recall = planted.count(gotPairs.contains).toDouble / planted.size
    assert(recall >= 0.8, s"decontamination recall $recall")
    // verbatim leakage: an identical doc placed in eval shares all bands, so
    // it is ALWAYS flagged (LSH guarantee, not probabilistic at jaccard 1.0)
    val evalExact = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 300000).as("doc_id"), col("text"))
    val gotExact = Dedup.crossCorpusNearDups(docs, evalExact, "doc_id", "text",
        minJaccard = 0.99)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val plantedExact = docs.filter(col("doc_id") % 10 === 0).select("doc_id").as[Long]
      .collect().map(i => (i, i + 300000)).toSet
    assert(plantedExact.subsetOf(gotExact), "identical eval docs must always be flagged")
  }

  test("passage dedup: hand fixture covers first-keep, cross-doc, and tail rules") {
    import spark.implicits._
    val block = "w1 w2 w3 w4"             // blockTokens = 4
    val other = "x1 x2 x3 x4"
    val docs = Seq(
      (1L, s"$block $other tail1 tail2"), // 2 passages, both first ⇒ 0 dups
      (2L, s"$other $block"),             // same passages, later doc ⇒ 2 dups
      (3L, s"$block $block"),             // both slots repeat doc 1's content
      (4L, "short doc"),                  // < blockTokens ⇒ 0 passages
      (5L, s"y1 y2 y3 y4 $block")         // fresh first slot, dup second
    ).toDF("doc_id", "text")
    val out = Dedup.passageStats(docs, "doc_id", "text", blockTokens = 4)
      .select("doc_id", "n_tokens", "n_passages", "n_dup_passages", "kept_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 10L, 2L, 0L, 10L)))
    assert(out(2L) == ((2L, 8L, 2L, 2L, 0L)))
    assert(out(3L) == ((3L, 8L, 2L, 2L, 0L)))
    assert(out(4L) == ((4L, 2L, 0L, 0L, 2L)))
    assert(out(5L) == ((5L, 8L, 2L, 1L, 4L)))
  }

  test("CMS: never underestimates, collisions only inflate, partitioning-invariant") {
    import spark.implicits._
    // width 8 << 40 distinct terms forces real collisions
    val (depth, width) = (4, 8)
    val items = (0 until 400).map(i => s"t${i % 40}").toDF("term")
    val sketch = Sketches.cmsBuild(items, "term", depth, width)
    val exact = items.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val est = exact.crossJoin(broadcast(sketch))
      .withColumn("est", Sketches.cmsEstimate(col("_cms"), col("term"), depth, width))
    assert(est.filter(col("est") < col("cnt")).isEmpty, "CMS underestimated")
    assert(est.filter(col("est") > col("cnt")).count() > 0,
      "fixture should force collisions (width 8, 40 terms)")
    // determinism: the sketch is identical under a different partitioning
    val repart = Sketches.cmsBuild(items.repartition(7), "term", depth, width)
    assert(sketch.first().getSeq[Long](0) == repart.first().getSeq[Long](0))
  }

  test("native MinHashSigExpr is bit-identical to the composed pipeline") {
    val cp = corpus()
    val native = Dedup.minhashSignatures(cp, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val composed = Dedup.composedMinhashSignatures(cp, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(native == composed)
  }

  test("minhash LSH recalls 100% of exact dups and most near dups") {
    import spark.implicits._
    val pairs = Dedup.minhashCandidatePairs(corpus(), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val exactDups = (0L until 500L by 10).map(i => (i, i + 100000)).toSet
    assert(exactDups.subsetOf(pairs), "identical docs must share all bands")
    val nearDups = (0L until 500L by 17).map(i => (i, i + 200000)).toSet
    val recall = nearDups.count(pairs.contains).toDouble / nearDups.size
    assert(recall >= 0.8, s"near-dup recall $recall")
  }

  test("jaccard verification: exact dups score 1.0, near dups score high") {
    import spark.implicits._
    val cp = corpus()
    val verified = Dedup.jaccardOnPairs(
      Dedup.minhashCandidatePairs(cp, "doc_id", "text"), cp, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    val exact = verified.filter { case (a, b, _) => a < 500 && b == a + 100000 }
    assert(exact.nonEmpty && exact.forall(_._3 == 1.0))
    val near = verified.filter { case (a, b, _) => a < 500 && b == a + 200000 }
    assert(near.isEmpty || near.forall(_._3 > 0.8))
    // near-dups found via their duplicated twin also score high
    val nearViaTwin = verified.filter { case (a, b, _) =>
      a >= 100000 && a < 200000 && b == a + 100000 }
    assert(nearViaTwin.forall(_._3 > 0.8))
  }

  test("distributed connected components == driver union-find") {
    import spark.implicits._
    // chain (descending ids), a star, a triangle, disjoint pairs, dup edges
    val edges = Seq(
      (9L, 8L), (8L, 7L), (7L, 6L), (6L, 5L),          // chain → rep 5
      (20L, 21L), (20L, 22L), (20L, 23L),               // star → rep 20
      (30L, 31L), (31L, 32L), (32L, 30L),               // triangle → rep 30
      (40L, 41L), (41L, 40L), (40L, 41L),               // dups both ways
      (50L, 60L))
    val df = edges.toDF("a", "b")
    val expected = Dedup.clusters(df)                    // driver union-find
    val got = Dedup.clustersDistributed(df)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got(5L) == 5L && got(9L) == 5L && got(23L) == 20L &&
      got(32L) == 30L && got(41L) == 40L && got(60L) == 50L)

    // and on the real LSH candidate set from the planted-dup corpus
    val pairs = Dedup.minhashCandidatePairs(corpus(), "doc_id", "text")
    val distMap = Dedup.clustersDistributed(pairs).as[(Long, Long)].collect().toMap
    assert(distMap == Dedup.clusters(pairs))
  }

  test("BPE-ish tokenizer: digit and punctuation branches (dead on gate corpus)") {
    import spark.implicits._
    // the sf corpora are [a-z ]-only, so exercise the other branches here
    val df = Seq(
      ("abc de 12 x.y!", 0L),
      ("", 1L),
      ("12345 999", 2L)).toDF("text", "id")
    val out = df.select(col("id") +: TextOps.bpeCounts(col("text")): _*)
      .orderBy("id")
      .select("n_words", "n_subwords", "n_numbers")
      .as[(Int, Int, Int)].collect().toSeq
    // "abc de 12 x.y!": words = abc,de,12,x,.,y,! = 7; subwords = abc,de,x,y = 4; numbers = 12
    assert(out(0) == ((7, 4, 1)), s"got ${out(0)}")
    assert(out(1) == ((0, 0, 0)))
    // "12345 999": words = 12345,999 = 2; no letters; numbers = 2
    assert(out(2) == ((2, 0, 2)))
  }

  test("simhash: near dups within small hamming distance, random pairs far") {
    val texts = graft.Tables.documents(spark, dir)
      .select("text").limit(10).collect().map(_.getString(0))
    val clipped = texts.map(t => t.substring(0, t.length - 10))
    val nearD = texts.zip(clipped).map { case (a, b) =>
      SimHash.hamming(simOf(a), simOf(b)) }
    assert(nearD.forall(_ <= 6), s"near-dup hamming: ${nearD.toSeq}")
    val farD = texts.combinations(2).map { case Array(a, b) =>
      SimHash.hamming(simOf(a), simOf(b)) }.toSeq
    // docs share one small vocabulary, so absolute distances are compressed;
    // the signal is that edits move the hash much less than re-drawing a doc.
    val meanNear = nearD.sum.toDouble / nearD.size
    val meanFar = farD.sum.toDouble / farD.size
    assert(meanNear < meanFar, s"mean near=$meanNear vs far=$meanFar")
  }
  private def simOf(s: String) =
    SimHash.simhash(org.apache.spark.unsafe.types.UTF8String.fromString(s))
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("ANN neighbors agree with brute-force sims; recall is reasonable") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 10)
    val brute = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 3)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val ann = Similarity.annLsh(probes, emb, "vec_id", "embedding", 3)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    // every (probe, neighbor) sim ANN reports must equal the exact sim
    val bruteAll = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 1000)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(ann.forall { case (p, nb, s) => bruteAll((p, nb)) == s })
    val recall = brute.keySet.count { case (p, nb) =>
      ann.exists(a => a._1 == p && a._2 == nb) }.toDouble / brute.size
    assert(recall > 0.2, s"ANN recall@3 = $recall") // single-table LSH, 8 bits
  }

  test("radiusSearch: exact boundary membership; ≡ threshold filter over all pairs") {
    import spark.implicits._
    // handcrafted 2-dim floats whose quantized values are exactly the named
    // integers (k/1024 is a binary fraction — floor(k/1024·1024) = k)
    def v(x: Int, y: Int) = Array(x / 1024f, y / 1024f)
    val probes = Seq((100L, v(3, 4))).toDF("vec_id", "embedding")
    val corpus = Seq((100L, v(3, 4)), (1L, v(1, 0)), (2L, v(1, 1)),
      (3L, v(4, -3)), (4L, v(-1, 0))).toDF("vec_id", "embedding")
    val got = Similarity.radiusSearch(probes, corpus, "vec_id", "embedding",
        minCosNum = 3, minCosDen = 5)
      .select("neighbor_id").as[Long].collect().toSet
    // cos((3,4),(1,0)) = 3/5 EXACTLY — ≥ keeps the boundary pair;
    // (1,1) → 7/√50 > 3/5 kept; (4,−3) → 0 dropped; (−1,0) negative dot
    // dropped; the probe's own id excluded
    assert(got == Set(1L, 2L))
    // real corpus: the radius set is exactly the threshold filter over all
    // pairs (no boundary pair exists in this data, so the double compare
    // against knnBrute's sims is decisive)
    val emb = graft.Tables.embeddings(spark, dir)
    val p10 = emb.filter(col("vec_id") < 10)
    val rs = Similarity.radiusSearch(p10, emb, "vec_id", "embedding", 3, 10)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    val all = Similarity.knnBrute(p10, emb, "vec_id", "embedding", 1000000)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    assert(rs == all.filter(_._3 >= 0.3).toSet)
    assert(rs.nonEmpty)
    // indexed radius: subset of the exact set with identical sims; probing
    // EVERY cell recovers the exact result (completeness at nProbe=nLists)
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nLists = 16, iters = 2)
    val pruned = IvfIndex.radiusSearchIndex(p10, idx, "vec_id", "embedding",
        3, 10, nProbe = 4)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(pruned.subsetOf(rs), "pruned radius results must be exact pairs")
    val full = IvfIndex.radiusSearchIndex(p10, idx, "vec_id", "embedding",
        3, 10, nProbe = 16)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(full == rs, "probing all cells must recover the exact radius set")
  }

  test("embedding near-dup pairs: planted copies found at threshold 0.999") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val planted = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val pairs = Similarity.nearDupPairs(emb.unionByName(planted),
        "vec_id", "embedding", 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val expected = (0L until 500L by 10).map(i => (i, i + 10000)).toSet
    assert(expected.subsetOf(pairs),
      s"identical vectors share every LSH bucket; missing: ${expected -- pairs}")
    // and clustering resolves them to min-id representatives
    val reps = Dedup.clusters(Similarity.nearDupPairs(emb.unionByName(planted),
      "vec_id", "embedding", 0.999))
    assert(reps(10010L) == 10L && reps(10000L) == 0L)
  }

  test("IVF-Flat: deterministic index, sims exact, recall beats cell fraction") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 10)
    val ivf = IvfIndex.search(probes, emb, "vec_id", "embedding",
        k = 3, nLists = 16, nProbe = 4)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    // determinism: second run bit-identical
    val again = IvfIndex.search(probes, emb, "vec_id", "embedding",
        k = 3, nLists = 16, nProbe = 4)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    assert(ivf.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
    // sims are the exact quantized cosines
    val bruteAll = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 1000)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(ivf.forall { case (p, nb, s) => bruteAll((p, nb)) == s })
    // recall@3 must beat the random-cells baseline (nProbe/nLists)
    val top3 = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = top3.count { case (p, nb) =>
      ivf.exists(r => r._1 == p && r._2 == nb) }.toDouble / top3.size
    assert(recall > 4.0 / 16, s"IVF recall@3 = $recall")
  }

  test("IVF train keeps a centroid for cells emptied by a Lloyd iteration") {
    import spark.implicits._
    // adversarial seed: two identical seed vectors — distance ties assign to
    // the LOWER cell, so the higher cell loses all members in iteration 1 and
    // produces no mean row; train must keep the stale centroid rather than
    // silently shrink the centroid set (which would distort nProbe coverage).
    val data = Seq(
      (0L, Array(0.0f)), (1L, Array(5.0f)), (2L, Array(5.0f)), (3L, Array(9.0f)),
      (4L, Array(0.1f)), (5L, Array(8.9f)))
    val df = spark.createDataFrame(data).toDF("vec_id", "embedding")
    val cents = IvfIndex.train(df, "vec_id", "embedding", nLists = 4)
    assert(cents.count() == 4)
    val byCell = cents.as[(Int, Seq[Long])].collect().toMap
    assert(byCell(2) == Seq(5120L)) // emptied cell retains its seed centroid
  }

  test("IVF with a corpus smaller than nLists trains a valid smaller index") {
    import spark.implicits._
    val data = Seq((0L, Array(0.0f, 1.0f)), (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)))
    val df = spark.createDataFrame(data).toDF("vec_id", "embedding")
    // 3 vectors, nLists=16: one cell per row, no invariant failure
    assert(IvfIndex.train(df, "vec_id", "embedding", nLists = 16).count() == 3)
    val out = IvfIndex.search(df.filter(col("vec_id") === 0), df,
      "vec_id", "embedding", k = 2, nLists = 16, nProbe = 16)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))   // self excluded; both remaining vectors
  }

  test("IVF search over load(save(build(…))) is bit-identical to search()") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 10)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "sim", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val direct = canon(IvfIndex.search(probes, emb, "vec_id", "embedding",
      k = 3, nLists = 16, nProbe = 4))
    val idxDir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    IvfIndex.build(emb, "vec_id", "embedding", nLists = 16).save(idxDir)
    val loaded = IvfIndex.load(spark, idxDir)
    // persisted schemas survive the round-trip (incl. cell stays int)
    assert(loaded.centroids.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq("cell" -> "int", "cv" -> "array<bigint>"))
    assert(loaded.assigned.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq("neighbor_id" -> "bigint", "cq" -> "array<bigint>",
        "n2c" -> "bigint", "cell" -> "int"))
    val roundTrip = canon(IvfIndex.searchIndex(probes, loaded, "vec_id", "embedding",
      k = 3, nProbe = 4))
    assert(roundTrip == direct)
    // and a second search against the same loaded index is train-free reuse
    val second = canon(IvfIndex.searchIndex(probes, loaded, "vec_id", "embedding",
      k = 3, nProbe = 4))
    assert(second == direct)
  }

  test("IVF append assigns new vectors to frozen centroids; saved append touches only their cells") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val (evens, odds) = (emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1))
    val base = IvfIndex.build(evens, "vec_id", "embedding", nLists = 16)
    val appended = IvfIndex.append(base, odds, "vec_id", "embedding")

    // append ≡ assigning the FULL corpus to the same frozen centroids
    def rows(idx: IvfIndex.Index) = idx.assigned
      .select("neighbor_id", "cell").as[(Long, Int)].collect().toSet
    val fullAssign = IvfIndex.assign(
      emb.select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("qv")),
      base.centroids)
    assert(rows(appended) ==
      fullAssign.select(col("id"), col("cell")).as[(Long, Int)].collect().toSet)

    // appendSaved: same search results as the in-memory append, and cells
    // receiving no new vectors keep their exact file sets
    val idxDir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    base.save(idxDir)
    def cellFiles() = new java.io.File(s"$idxDir/assigned").listFiles()
      .filter(_.getName.startsWith("cell=")).map(f =>
        f.getName -> f.listFiles().map(_.getName).toSet).toMap
    val before = cellFiles()
    val newCells = IvfIndex.assign(
      odds.select(col("vec_id").as("id"), Similarity.quantize(col("embedding")).as("qv")),
      base.centroids).select("cell").distinct().as[Int].collect().toSet
    val loaded = IvfIndex.appendSaved(spark, idxDir, odds, "vec_id", "embedding")
    val after = cellFiles()
    for ((cell, files) <- before if !newCells.contains(cell.stripPrefix("cell=").toInt))
      assert(after(cell) == files, s"untouched $cell must keep its files")
    val probes = emb.filter(col("vec_id") < 10)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "sim", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(canon(IvfIndex.searchIndex(probes, loaded, "vec_id", "embedding", k = 3, nProbe = 4)) ==
      canon(IvfIndex.searchIndex(probes, appended, "vec_id", "embedding", k = 3, nProbe = 4)))
  }

  test("IVF remove: survivors exact, append restores, removeSaved per-cell") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val base = IvfIndex.build(emb, "vec_id", "embedding", nLists = 8, iters = 2)
    def rowsOf(a: org.apache.spark.sql.DataFrame) =
      a.select($"neighbor_id", $"cell".cast("int")).as[(Long, Int)].collect().toSet
    val baseSet = rowsOf(base.assigned)
    val dropIds = emb.filter($"vec_id" % 3 === 0).select("vec_id")
    val pruned = IvfIndex.remove(base, dropIds, "vec_id")
    // exactly the survivors, in their original cells — nothing reassigned
    assert(rowsOf(pruned.assigned) == baseSet.filterNot(_._1 % 3 == 0))
    // search never surfaces a removed neighbor
    val res = IvfIndex.searchIndex(emb.filter($"vec_id" < 10), pruned,
      "vec_id", "embedding", k = 3, nProbe = 4)
    assert(res.filter($"neighbor_id" % 3 === 0).count() == 0)
    // delete → re-append the same vectors restores the assignment exactly
    // (centroids frozen throughout, so assignment is reproducible)
    val restored = IvfIndex.append(pruned,
      emb.filter($"vec_id" % 3 === 0), "vec_id", "embedding")
    assert(rowsOf(restored.assigned) == baseSet)

    // removeSaved ≡ in-memory remove; cells holding no dropped id keep
    // their exact file sets (the per-cell rewrite claim)
    val idxDir = java.nio.file.Files.createTempDirectory("graft_ivf_rm").toString
    base.save(idxDir)
    def cellFiles() = new java.io.File(s"$idxDir/assigned").listFiles()
      .filter(_.getName.startsWith("cell=")).map(f =>
        f.getName -> f.listFiles().map(_.getName).toSet).toMap
    val before = cellFiles()
    val touched = base.assigned
      .join(dropIds.select($"vec_id".as("neighbor_id")), Seq("neighbor_id"), "left_semi")
      .select($"cell".cast("int")).distinct().as[Int].collect().toSet
    val loaded = IvfIndex.removeSaved(spark, idxDir, dropIds, "vec_id")
    val after = cellFiles()
    for ((cell, files) <- before if !touched.contains(cell.stripPrefix("cell=").toInt))
      assert(after(cell) == files, s"untouched $cell must keep its files")
    assert(rowsOf(loaded.assigned) == rowsOf(pruned.assigned))

    // a cell emptied by the delete loses its partition directory outright
    // (dynamic overwrite alone would keep the stale files)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ivf_rm2").toString
    base.save(dir2)
    val someCell = base.assigned.select($"cell".cast("int")).as[Int].head()
    val cellIds = base.assigned.filter($"cell" === someCell)
      .select($"neighbor_id".as("vec_id"))
    val l2 = IvfIndex.removeSaved(spark, dir2, cellIds, "vec_id")
    assert(!new java.io.File(s"$dir2/assigned/cell=$someCell").exists(),
      "emptied cell partition must be deleted")
    assert(l2.assigned.filter($"cell" === someCell).count() == 0)
  }

  test("buildScaled degenerates to build exactly; two-level assign sane at scale knobs") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // degenerate knobs = bit-identical to the exact build
    val exact = IvfIndex.build(emb, "vec_id", "embedding", nLists = 16, iters = 2)
    val scaled = IvfIndex.buildScaled(emb, "vec_id", "embedding", nLists = 16,
      iters = 2, maxTrainRows = 1000000, superCount = 1)
    def canonC(df: org.apache.spark.sql.DataFrame) =
      df.select("cell", "cv").collect().map(_.toString).sorted.toSeq
    def canonA(df: org.apache.spark.sql.DataFrame) =
      df.select("neighbor_id", "cell").collect().map(_.toString).sorted.toSeq
    assert(canonC(scaled.centroids) == canonC(exact.centroids))
    assert(canonA(scaled.assigned) == canonA(exact.assigned))

    // engaged knobs: deterministic across runs, same centroid count, and
    // two-level agreement with exact assignment stays high (everything is
    // deterministic, so this is a fixed number — floor pinned loosely)
    val s1 = IvfIndex.buildScaled(emb, "vec_id", "embedding", nLists = 16,
      iters = 2, maxTrainRows = 200, superCount = 4)
    val s2 = IvfIndex.buildScaled(emb, "vec_id", "embedding", nLists = 16,
      iters = 2, maxTrainRows = 200, superCount = 4)
    assert(canonA(s1.assigned) == canonA(s2.assigned), "must be deterministic")
    assert(s1.centroids.count() == 16)
    val twoLevel = IvfIndex.assignTwoLevel(
      emb.select(col("vec_id").as("id"),
        Similarity.quantize(col("embedding")).as("qv")),
      exact.centroids, superCount = 4)
      .select(col("id"), col("cell").as("c2"))
    val agree = exact.assigned
      .select(col("neighbor_id").as("id"), col("cell"))
      .join(twoLevel, Seq("id"))
      .agg(avg((col("cell") === col("c2")).cast("double"))).head().getDouble(0)
    assert(agree >= 0.6, s"two-level agreement vs exact collapsed: $agree")
    // identical vectors assign identically through the two-level path
    // (pure function of the vector — verbatim-duplicate detection holds)
    val one = emb.limit(1).select(col("vec_id"), col("embedding"))
    val dup = one.select(lit(999999L).as("vec_id"), col("embedding"))
    val both = IvfIndex.assignTwoLevel(
      one.unionByName(dup)
        .select(col("vec_id").as("id"),
          Similarity.quantize(col("embedding")).as("qv")),
      exact.centroids, superCount = 4)
      .select("cell").distinct()
    assert(both.count() == 1)
  }

  test("hard-negative mining: twins and same-label excluded; indexed path ≡ brute at full probe") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // planted anchors: verbatim twins under a rotated label — the twin
    // (sim 1.0, different label) must be removed by the dup ceiling, and
    // the anchor's own (rotated) label class must be pruned by the rule
    val anchors = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 90000).as("vec_id"), col("embedding"),
        ((col("label") + 1) % 10).as("label"))
    val brute = Similarity.hardNegatives(anchors, emb, "vec_id", "embedding",
      "label", k = 4)
    val rows = brute.collect()
    assert(rows.length == 8 * 4)
    // no mined negative is a near-duplicate of its anchor...
    assert(rows.forall(_.getAs[Double]("sim") < 0.999),
      "a near-duplicate leaked into the negatives")
    // ...and none shares the anchor's label (anchor label = twin's + 1)
    val anchorLabel = anchors.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    assert(rows.forall(r => anchorLabel(r.getAs[Long]("probe_id")) !=
      r.getAs[Int]("neighbor_label")), "a same-label candidate leaked")
    // the twin WOULD have won without the ceiling — prove it was there
    val unceilinged = Similarity.hardNegatives(anchors, emb, "vec_id",
      "embedding", "label", k = 1, dupCeiling = 2.0)
    assert(unceilinged.filter(col("sim") >= 0.999).count() == 8,
      "every anchor's verbatim twin must top the unceilinged ranking")
    // indexed path at FULL probe + generous overfetch ≡ the exact baseline
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nLists = 8, iters = 2)
    val labels = emb.select(col("vec_id"), col("label"))
      .unionByName(anchors.select(col("vec_id"), col("label")))
    val indexed = Similarity.hardNegativesIndexed(idx, anchors, labels,
      "vec_id", "embedding", "label", k = 4, nProbe = 8, overfetch = 16)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "rank")
        .collect().map(_.toString).sorted.toSeq
    assert(canon(indexed) == canon(brute),
      "indexed hard negatives diverged from brute at full probe")
  }

  test("hard-negative shortfall: starved anchors surface; zero-negative anchors keep their row") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // exclusion-heavy plant: EVERY corpus vector shares the anchor's label,
    // so all candidates are excluded — the report must still carry the
    // anchor's row (n_returned 0, shortfall k), which a groupBy over the
    // mined rows alone would drop
    val mono = emb.filter(col("vec_id") < 12)
      .select(col("vec_id"), col("embedding"), lit(7).as("label"))
    val idx = IvfIndex.build(mono, "vec_id", "embedding", nLists = 4, iters = 2)
    val anchor = mono.filter(col("vec_id") === 0)
      .select((col("vec_id") + 90000).as("vec_id"), col("embedding"),
        col("label"))
    val labels = mono.select("vec_id", "label")
      .unionByName(anchor.select("vec_id", "label"))
    val starved = Similarity.hardNegativeShortfall(idx, anchor, labels,
      "vec_id", "embedding", "label", k = 5, nProbe = 4, overfetch = 8)
      .collect()
    assert(starved.length == 1, "zero-negative anchor lost its report row")
    assert(starved.head.getAs[Long]("n_returned") == 0L)
    assert(starved.head.getAs[Long]("shortfall") == 5L)
    // partial starvation: binary labels over 12 vectors with k = 12 —
    // every anchor falls short, and at full probe + covering overfetch the
    // per-anchor n_returned equals the brute pipeline's count exactly
    val mixed = emb.filter(col("vec_id") < 12)
      .select(col("vec_id"), col("embedding"),
        (col("label") % 2).cast("int").as("label"))
    val idx2 = IvfIndex.build(mixed, "vec_id", "embedding", nLists = 4,
      iters = 2)
    val anchors2 = mixed.filter(col("vec_id") < 3)
      .select((col("vec_id") + 90000).as("vec_id"), col("embedding"),
        col("label"))
    val labels2 = mixed.select("vec_id", "label")
      .unionByName(anchors2.select("vec_id", "label"))
    val rep = Similarity.hardNegativeShortfall(idx2, anchors2, labels2,
      "vec_id", "embedding", "label", k = 12, nProbe = 4, overfetch = 4)
      .collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("n_returned"))
      .toMap
    val brute = Similarity.hardNegatives(anchors2, mixed, "vec_id",
      "embedding", "label", k = 12)
      .groupBy(col("probe_id")).count().collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("count")).toMap
    assert(rep.size == 3)
    for ((p, n) <- rep) {
      assert(n == brute.getOrElse(p, 0L),
        s"anchor $p: indexed n_returned $n != brute ${brute.getOrElse(p, 0L)}")
      assert(n < 12, s"anchor $p should fall short under binary labels")
    }
  }

  test("distributed two-level assign/probe ≡ collected bit-exact; guard auto-routes and refuses the exact probe at scale") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.select(col("vec_id").as("id"),
      Similarity.quantize(col("embedding")).as("qv"))
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nLists = 64,
      iters = 2)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // bit-exact across a square-ish and a non-divisor super count — the
    // distributed twin differs ONLY in join strategy (equi-join on _super
    // instead of collect+broadcast of the full centroid set)
    for (sc <- Seq(3, 8)) {
      assert(canon(IvfIndex.assignTwoLevelDistributed(q, centroids, sc)) ==
        canon(IvfIndex.assignTwoLevel(q, centroids, sc)),
        s"distributed assignment diverged at superCount=$sc")
      assert(canon(IvfIndex.probeCellsTwoLevelDistributed(q, centroids,
          nProbe = 3, superCount = sc)) ==
        canon(IvfIndex.probeCellsTwoLevel(q, centroids, nProbe = 3,
          superCount = sc)),
        s"distributed probing diverged at superCount=$sc")
    }
    // baselines for the forced-guard routing checks below
    val assignBase = canon(IvfIndex.assignTwoLevel(q, centroids, 8))
    val buildBase = IvfIndex.buildScaled(emb, "vec_id", "embedding",
      nLists = 64, iters = 2, maxTrainRows = 200, superCount = 8)
    // force the guard below nLists: every O(nLists) collect path must now
    // route to its distributed twin (same rows — routing, not behavior
    // change), INCLUDING training end-to-end (GlobalRank seeding +
    // localCheckpoint finalize instead of limit-collect)
    spark.conf.set("spark.graft.ivf.maxCentroidCollectRows", "32")
    try {
      assert(canon(IvfIndex.assignTwoLevel(q, centroids, 8)) == assignBase,
        "guard routing changed assignment rows")
      val routed = IvfIndex.buildScaled(emb, "vec_id", "embedding",
        nLists = 64, iters = 2, maxTrainRows = 200, superCount = 8)
      assert(canon(routed.centroids.select("cell", "cv")) ==
        canon(buildBase.centroids.select("cell", "cv")),
        "distributed training produced different centroids")
      assert(canon(routed.assigned.select("neighbor_id", "cell")) ==
        canon(buildBase.assigned.select("neighbor_id", "cell")),
        "distributed build produced a different assignment")
      // the EXACT probe (superCount = 1) cannot be silently coarsened —
      // past the guard it refuses with the sizing guidance
      val e = intercept[IllegalArgumentException] {
        IvfIndex.probeCellsTwoLevel(q, centroids, nProbe = 3, superCount = 1)
          .count()
      }
      assert(e.getMessage.contains("maxCentroidCollectRows"), e.getMessage)
    } finally spark.conf.unset("spark.graft.ivf.maxCentroidCollectRows")
  }

  test("centroid collect guard covers every broadcast/collect site engine-wide") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(col("vec_id") < 4)
    // build both index shapes BEFORE forcing the guard (their builds refuse
    // under it — pinned below); searches against them must then refuse too
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nLists = 64, iters = 2)
    val ivfpq = PqIndex.buildIvf(emb, "vec_id", "embedding", nLists = 64)
    spark.conf.set("spark.graft.ivf.maxCentroidCollectRows", "32")
    try {
      def refuses(what: String)(body: => Any): Unit = {
        val e = intercept[IllegalArgumentException](body)
        assert(e.getMessage.contains("maxCentroidCollectRows"),
          s"$what refused with the wrong message: ${e.getMessage}")
      }
      // every exact-broadcast face refuses loudly instead of OOMing
      refuses("searchIndex (default exact probe)")(
        IvfIndex.searchIndex(probes, idx, "vec_id", "embedding", k = 3).count())
      refuses("radiusSearchIndex")(
        IvfIndex.radiusSearchIndex(probes, idx, "vec_id", "embedding",
          minCosNum = 1, minCosDen = 2).count())
      refuses("assignTwoLevel(superCount=1)")(
        IvfIndex.assignTwoLevel(
          emb.select(col("vec_id").as("id"),
            Similarity.quantize(col("embedding")).as("qv")),
          idx.centroids, superCount = 1).count())
      refuses("trainQ exact Lloyd")(
        IvfIndex.train(emb, "vec_id", "embedding", nLists = 64, iters = 1))
      refuses("append / assignNew")(
        IvfIndex.append(idx, probes, "vec_id", "embedding"))
      refuses("inertiaReport")(IvfIndex.inertiaReport(idx).count())
      refuses("separationReport")(IvfIndex.separationReport(idx).count())
      refuses("PqIndex.searchIvfIndex")(
        PqIndex.searchIvfIndex(probes, ivfpq, emb, "vec_id", "embedding",
          k = 3).count())
      refuses("PqIndex.buildIvf")(
        PqIndex.buildIvf(emb, "vec_id", "embedding", nLists = 64))
      refuses("PqIndex.searchIvf")(
        PqIndex.searchIvf(probes, emb, "vec_id", "embedding", k = 3,
          nLists = 64).count())
      // the guarded scale path still works past the budget: the two-level
      // probe auto-routes distributed instead of refusing
      assert(IvfIndex.searchIndex(probes, idx, "vec_id", "embedding", k = 3,
        probeSuperCount = 8).count() > 0)
    } finally spark.conf.unset("spark.graft.ivf.maxCentroidCollectRows")
  }

  test("searchIndex brute auto-route: opt-in, exact below the threshold, off by default") {
    // below ~10k rows ANN is coverage-bound (RecallSoak: 0.49@3 at
    // N=2,000 on a structure-free corpus) while brute is cheap and
    // corpus-parallel — the route returns the EXACT top-k, so it is
    // opt-in (a hash-pinned caller must not silently change answers).
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nLists = 8, iters = 2)
    val probes = emb.filter(col("vec_id") < 5)
    def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.select("probe_id", "neighbor_id", "rank").collect()
        .map(_.toString).toSet
    val probed = canon(
      IvfIndex.searchIndex(probes, idx, "vec_id", "embedding", k = 3))
    spark.conf.set("spark.graft.ivf.bruteRouteMaxRows", "1000000")
    try {
      val routed = IvfIndex.searchIndex(probes, idx, "vec_id", "embedding",
        k = 3)
      val exact = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 3)
      assert(canon(routed) == canon(exact),
        "routed search must equal the exact brute answer")
      // the routed plan is the pair loop — no cell equi-join anywhere
      val joins = routed.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(!joins.exists(_.condition.exists(
          _.references.exists(_.name == "cell"))),
        "auto-routed search must not probe cells")
      // above the threshold the probed path is untouched
      spark.conf.set("spark.graft.ivf.bruteRouteMaxRows", "1")
      assert(canon(IvfIndex.searchIndex(probes, idx, "vec_id", "embedding",
        k = 3)) == probed, "threshold must gate the route")
    } finally spark.conf.unset("spark.graft.ivf.bruteRouteMaxRows")
  }

  test("brute-face probe broadcast refuses loudly past the budget (all six faces)") {
    // the brute contract is "probes small, corpus streamed"; past the
    // budget a probe broadcast would hit Spark's 8 GB cap or driver OOM
    // with an opaque executor error — same refuse-loudly discipline as the
    // centroid guard, naming the index faces as the scalable alternative.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val labeled = emb.withColumn("lbl", col("vec_id") % 3)
    val probes = emb.filter(col("vec_id") < 10)
    spark.conf.set("spark.graft.brute.maxProbeBroadcastRows", "5")
    try {
      def refuses(face: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
        val e = intercept[IllegalArgumentException](body)
        assert(e.getMessage.contains("maxProbeBroadcastRows"),
          s"$face refused with the wrong message: ${e.getMessage}")
        assert(e.getMessage.contains(face),
          s"$face refusal must name the face: ${e.getMessage}")
      }
      refuses("knnBrute")(
        Similarity.knnBrute(probes, emb, "vec_id", "embedding", 3))
      refuses("hardNegatives")(Similarity.hardNegatives(
        labeled.filter(col("vec_id") < 10), labeled, "vec_id", "embedding",
        "lbl", 3))
      refuses("radiusSearch")(
        Similarity.radiusSearch(probes, emb, "vec_id", "embedding", 1, 2))
      refuses("annSq8")(
        Similarity.annSq8(probes, emb, "vec_id", "embedding", 3))
      refuses("annRandomProject")(
        Similarity.annRandomProject(probes, emb, "vec_id", "embedding", 3))
      refuses("binarySearch")(
        Similarity.binarySearch(probes, emb, "vec_id", "embedding", 3, 8))
      // within budget the face still runs — the guard's bounded count job
      // must not change results
      spark.conf.set("spark.graft.brute.maxProbeBroadcastRows", "10")
      assert(Similarity.knnBrute(probes, emb, "vec_id", "embedding", 3)
        .count() == 30)
    } finally spark.conf.unset("spark.graft.brute.maxProbeBroadcastRows")
  }

  test("candidate joins attach probe vectors BEFORE the cell explosion (the 1000× pair-rekey cliff, plan-pinned)") {
    // the 1000× soak's disk-death shape: exploding probe-cells against the
    // corpus first and re-keying the exploded, vector-carrying pair
    // relation by probe/eval id is a |probes|·nProbe·|cell|-row exchange.
    // Pin the fixed order structurally: the join that explodes on `cell`
    // must already have the probe vector (pq/n2p) in a child's output —
    // i.e. the id-join happened BELOW it, so nothing above the explosion
    // re-keys pair rows.
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nLists = 8, iters = 2)
    val eval = emb.filter(col("vec_id") < 20)
    def cellJoinHasProbeVectorBelow(
        df: org.apache.spark.sql.DataFrame): Boolean = {
      val joins = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      val cellJoins = joins.filter(_.condition.exists(
        _.references.exists(_.name == "cell")))
      assert(cellJoins.nonEmpty, "expected a cell-equi-join in the plan")
      cellJoins.forall(_.children.exists(_.output.exists(a =>
        a.name == "pq" || a.name == "n2p")))
    }
    assert(cellJoinHasProbeVectorBelow(
      Similarity.semanticDecontaminateIndexed(idx, eval, "vec_id",
        "embedding", threshold = 0.9)),
      "decontamination re-keys exploded pairs (probe vectors above the cell join)")
    assert(cellJoinHasProbeVectorBelow(
      IvfIndex.searchIndex(eval, idx, "vec_id", "embedding", k = 3)),
      "searchIndex re-keys exploded pairs")
    assert(cellJoinHasProbeVectorBelow(
      IvfIndex.radiusSearchIndex(eval, idx, "vec_id", "embedding",
        minCosNum = 1, minCosDen = 2)),
      "radiusSearchIndex re-keys exploded pairs")
  }

  test("two-level probe: superCount=1 ≡ exact probe; duplicates descend to their twin's cell; probed-super recall holds") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = IvfIndex.build(emb, "vec_id", "embedding", nLists = 16, iters = 2)
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("id"),
        Similarity.quantize(col("embedding")).as("qv"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "cell").collect().map(_.toString).sorted.toSeq
    // superCount = 1: every cell is a member of the one super — identical
    // rows to the exact crossJoin probe
    val exactProbe = q.crossJoin(broadcast(exact.centroids))
      .select(col("id"), col("cell"),
        IvfIndex.l2Q(col("qv"), col("cv")).as("d2"))
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("d2"), col("cell"))))
      .filter(col("_rn") <= 3).select("id", "cell")
    val degenerate = IvfIndex.probeCellsTwoLevel(q, exact.centroids,
      nProbe = 3, superCount = 1)
    assert(canon(degenerate) == canon(exactProbe),
      "superCount=1 must reproduce the exact probe bit-for-bit")
    // a probe IDENTICAL to an indexed vector descends to that vector's own
    // cell (same deterministic hierarchy) — verbatim-duplicate recall
    val probed = IvfIndex.probeCellsTwoLevel(q, exact.centroids,
      nProbe = 3, superCount = 4)
    val own = exact.assigned.select(col("neighbor_id").as("id"),
      col("cell").as("own_cell"))
    val hit = probed.join(own, Seq("id"))
      .groupBy("id")
      .agg(max((col("cell") === col("own_cell")).cast("int")).as("h"))
      .agg(avg(col("h"))).head().getDouble(0)
    assert(hit == 1.0, s"every probe must reach its own assigned cell: $hit")
    // output shape: ≤ nProbe cells per id
    val counts = probed.groupBy("id").count().select("count")
      .as[Long].collect()
    assert(counts.forall(_ <= 3) && counts.nonEmpty)
  }

  test("IVF with nProbe == nLists reproduces brute-force top-k exactly") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "sim", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val ivf = canon(IvfIndex.search(probes, emb, "vec_id", "embedding",
      k = 3, nLists = 8, nProbe = 8))
    val brute = canon(Similarity.knnBrute(probes, emb, "vec_id", "embedding", 3))
    assert(ivf == brute)
  }

  test("IVF filtered view: only allowed ids surface; pruning-off ≡ filtered brute") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 5)
    val allowed = emb.filter(col("label") === 1).select("vec_id")
    val allowedSet = allowed.as[Long].collect().toSet
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nLists = 8, iters = 2)
    val view = IvfIndex.filtered(idx, allowed, "vec_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "sim", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val got = canon(IvfIndex.searchIndex(probes, view, "vec_id", "embedding",
      k = 3, nProbe = 8))
    // pre-filter contract: every hit is allowed, and with pruning off the
    // result IS brute-force top-k over the filtered corpus — probes whose
    // unfiltered near neighbors are disallowed still get k hits
    assert(got.nonEmpty && got.forall(r => allowedSet(r._2)))
    val brute = canon(Similarity.knnBrute(probes,
      emb.filter(col("label") === 1), "vec_id", "embedding", 3))
    assert(got == brute)
  }

  test("knnClassify: majority wins, ties break to the smallest label") {
    import spark.implicits._
    val corpus = Seq(
      (10L, Array(1.0f, 0.01f), 1), (11L, Array(1.0f, -0.01f), 2),
      (12L, Array(0.9f, 0.0f), 2), (13L, Array(-1.0f, 0.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val probes = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    // k=3: labels {1, 2, 2} → majority 2
    val maj = Similarity.knnClassify(probes, corpus,
        corpus.select("vec_id", "label"), "vec_id", "embedding", "label", k = 3)
      .as[(Long, Int, Long)].collect().toSeq
    assert(maj == Seq((1L, 2, 2L)), s"majority: $maj")
    // k=2: labels {1, 2} tie → smallest label wins
    val tie = Similarity.knnClassify(probes, corpus,
        corpus.select("vec_id", "label"), "vec_id", "embedding", "label", k = 2)
      .as[(Long, Int, Long)].collect().toSeq
    assert(tie == Seq((1L, 1, 1L)), s"tie: $tie")
    // real table: one row per probe, bounded votes, partitioning-invariant
    // (labels in the testdata are NOT cluster-correlated — ~chance 1-NN
    // match measured — so no accuracy claim is possible here)
    val emb = graft.Tables.embeddings(spark, dir)
    val probes50 = emb.filter(col("vec_id") < 50)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.knnClassify(probes50, c, c.select("vec_id", "label"),
          "vec_id", "embedding", "label", k = 5)
        .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val a = run(emb)
    assert(a.map(_._1).distinct.size == a.size && a.size == 50)
    assert(a.forall(r => r._3 >= 1 && r._3 <= 5))
    assert(a == run(emb.repartition(7)), "vote must be partitioning-invariant")
  }

  test("cellStats: counts tile the corpus, empties kept, overloaded = n > 2·mean") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nLists = 16, iters = 2)
    val stats = IvfIndex.cellStats(idx)
      .as[(Int, Long, Boolean)].collect().sortBy(_._1)
    assert(stats.length == 16, "one row per cell, empty cells included")
    val total = emb.count()
    assert(stats.map(_._2).sum == total, "cell counts must tile the corpus")
    stats.foreach { case (_, n, over) =>
      assert(over == (n * 16 > 2 * total), s"flag math wrong for n=$n") }
    // stats compose with the filtered view: counts reflect the view, so
    // the monitor also works on a tenant's slice of a shared index
    val skewed = IvfIndex.cellStats(IvfIndex.filtered(
      idx, emb.filter(col("label") === 0).select("vec_id"), "vec_id"))
      .as[(Int, Long, Boolean)].collect()
    assert(skewed.map(_._2).sum ==
      emb.filter(col("label") === 0).count(),
      "stats over a filtered view count only the view")
  }

  test("SQ8 ANN: high recall vs brute force, exact sims, partitioning-invariant") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 10)
    val k = 3
    val got = Similarity.annSq8(probes, emb, "vec_id", "embedding", k,
        candidates = 16)
      .select("probe_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect()
    val brute = Similarity.knnBrute(probes, emb, "vec_id", "embedding", k)
      .select("probe_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    // rerank sims are the EXACT quantized cosine — spot-check one against
    // knnBrute's value for the same pair
    val bruteSims = Similarity.knnBrute(probes, emb, "vec_id", "embedding", k)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (p, n, s, _) =>
      bruteSims.get((p, n)).foreach(bs => assert(bs == s, s"sim mismatch for ($p,$n)"))
    }
    // recall: 16 int8-scored candidates out of ~2000 should recover most of
    // the true top-3 (exact rerank makes hits exactly ordered)
    val hits = got.count { case (p, n, _, _) => brute((p, n)) }
    assert(hits >= (brute.size * 0.7).toInt, s"recall too low: $hits/${brute.size}")
    // determinism under a different partitioning
    val re = Similarity.annSq8(probes, emb.repartition(13), "vec_id", "embedding",
        k, candidates = 16)
      .select("probe_id", "neighbor_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(got.sortBy(r => (r._1, r._4)).toSeq == re.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("quantized cosine of a vector with itself is 1.0") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir).limit(5)
    val sims = emb.select(Similarity.cosineQ(
      Similarity.quantize(col("embedding")),
      Similarity.quantize(col("embedding"))).as("s")).as[Double].collect()
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("semanticDedup: copies flagged against smallest-id rep; threshold strict") {
    import spark.implicits._
    // 3 well-separated directions; ids 10/11 duplicate id 1's vector, id 20
    // is a near-but-below-threshold neighbor of id 2
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(1.0f, 0.0f, 0.0f)),
      (20L, Array(0.6f, 0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val dups = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.999, nLists = 3, iters = 2)
      .select("vec_id", "dup_of").as[(Long, Long)].collect().toMap
    // both copies report the SMALLEST matching id (1), not each other
    assert(dups == Map(10L -> 1L, 11L -> 1L))

    // partitioning invariance: same output from a scrambled layout
    val scrambled = Similarity.semanticDedup(corpus.repartition(7), "vec_id",
      "embedding", threshold = 0.999, nLists = 3, iters = 2)
      .select("vec_id", "dup_of").as[(Long, Long)].collect().toMap
    assert(scrambled == dups)

    // id 20 (cos = 0.8 vs id 2) joins once the threshold admits it
    val loose = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.75, nLists = 3, iters = 2)
      .select("vec_id", "dup_of").as[(Long, Long)].collect().toMap
    assert(loose.get(20L).contains(2L))

    // the prebuilt-index path (train-once) gives bit-identical output,
    // including through a save/load round trip
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    IvfIndex.build(corpus, "vec_id", "embedding", nLists = 3, iters = 2).save(dir)
    val viaIndex = Similarity.semanticDedupIndexed(
        IvfIndex.load(spark, dir), "vec_id", threshold = 0.999)
      .select("vec_id", "dup_of").as[(Long, Long)].collect().toMap
    assert(viaIndex == dups)
  }

  test("semanticDecontaminate: finds every brute-force leak via probed cells") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // eval = verbatim leaks (identical vectors) + clean decoys (reversed)
    val eval = emb.filter($"vec_id" % 7 === 0)
      .select(($"vec_id" + 30000).as("vec_id"), $"embedding")
      .unionByName(emb.filter($"vec_id" % 5 === 0)
        .select(($"vec_id" + 40000).as("vec_id"),
          reverse($"embedding").as("embedding")))
    val got = Similarity.semanticDecontaminate(emb, eval, "vec_id",
        "embedding", threshold = 0.999, nLists = 8, nProbe = 3, iters = 2)
      .select($"eval_id", $"train_id").as[(Long, Long)].collect().toSet
    // ground truth: exact quantized cosine over the full cross product
    val q = emb.select($"vec_id",
      Similarity.quantize($"embedding").as("qv"))
    val e = eval.select($"vec_id".as("eid"),
      Similarity.quantize($"embedding").as("qe"))
    val truth = e.crossJoin(q)
      .filter(Similarity.cosineQ($"qe", $"qv") >= 0.999)
      .select($"eid", $"vec_id").as[(Long, Long)].collect().toSet
    assert(got == truth, s"missed ${truth -- got}, extra ${got -- truth}")
    // every verbatim leak is caught, every reversed decoy stays clean
    assert(truth.nonEmpty)
    assert(got.forall(_._1 < 40000), "reversed decoys must not match")
    val planted = emb.filter($"vec_id" % 7 === 0)
      .select(($"vec_id" + 30000)).as[Long].collect().toSet
    assert(planted.subsetOf(got.map(_._1)),
      "every verbatim leak must be flagged")
    // pairs are strictly cross-corpus by construction: eval ids ≥ 30000,
    // train ids below
    assert(got.forall(p => p._1 >= 30000 && p._2 < 30000))
  }

  test("multi-probe LSH: superset of single-probe candidates, recall never worse") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 10)
    def recallOf(ann: Array[(Long, Long)]): Double = {
      val brute = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 3)
        .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
      brute.count(ann.toSet.contains).toDouble / brute.size
    }
    val sp = Similarity.annLsh(probes, emb, "vec_id", "embedding", 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
    val mp = Similarity.annLshMultiProbe(probes, emb, "vec_id", "embedding", 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
    // multi-probe candidates are a strict superset (flip 0 = home bucket),
    // so its exact-rerank recall can never be worse
    assert(recallOf(mp) >= recallOf(sp),
      s"multi-probe ${recallOf(mp)} < single ${recallOf(sp)}")
    // and every reported sim is still an exact quantized cosine
    val bruteAll = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 1000)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val mpSims = Similarity.annLshMultiProbe(probes, emb, "vec_id",
        "embedding", 3)
      .select("probe_id", "neighbor_id", "sim").as[(Long, Long, Double)].collect()
    assert(mpSims.forall { case (p, nb, s) => bruteAll((p, nb)) == s })
  }

  test("binary ANN: signatures pack sign bits exactly; sims exact; recall floor") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, dir)
    // straight-line signature check: lo/hi reproduce a driver-side pack of
    // the quantized signs for a few vectors
    val sigs = Similarity.binarySignatures(emb.filter($"vec_id" < 5),
        "vec_id", "embedding")
      .select($"id", $"lo", $"hi").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val raw = emb.filter($"vec_id" < 5)
      .select($"vec_id", Similarity.quantize($"embedding"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((id, qv) <- raw) {
      val lo = (0 until 32).map(i => if (qv(i) >= 0) 1L << i else 0L).sum
      val hi = (0 until 32).map(i => if (qv(32 + i) >= 0) 1L << i else 0L).sum
      assert(sigs(id) == (lo, hi), s"signature mismatch for $id")
    }
    val probes = emb.filter($"vec_id" < 10)
    val got = Similarity.binarySearch(probes, emb, "vec_id", "embedding",
        k = 3, rerankN = 64)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect()
    // reported sims are the exact quantized cosines
    val bruteAll = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 1000)
      .select("probe_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.forall { case (p, nb, s) => bruteAll((p, nb)) == s })
    // recall@3 of the Hamming-prefiltered search vs exact
    val brute = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 3)
      .select("probe_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = brute.count(p =>
      got.exists(g => g._1 == p._1 && g._2 == p._2)).toDouble / brute.size
    assert(recall >= 0.5, s"binary+rerank recall@3 = $recall")
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("batched decode plumbing: one row per blob, deterministic features") {
    val metas = Multimodal.decodeBatched(
      Multimodal.withBlob(graft.Tables.documents(spark, dir), "text", "source"),
      batchSize = 7).collect() // odd batch size: exercises last partial batch
    assert(metas.length == 500)
    assert(metas.forall(m => m.n_bytes > 0 && m.width >= 1 && m.width <= 64))
    val again = Multimodal.decodeBatched(
      Multimodal.withBlob(graft.Tables.documents(spark, dir), "text", "source"),
      batchSize = 64).collect()
    assert(metas.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq,
      "batch size must not affect results")
  }

  test("frame sampling: one row per sampled frame, boundary arithmetic exact") {
    import spark.implicits._
    // 1000-byte blob, 256-byte frames: 4 frames (last = 232 bytes); every=2
    // samples frames 0 and 2; empty blob yields no frames at all
    val blobs = Seq(
      (1L, "v", Array.fill[Byte](1000)(7)),
      (2L, "v", Array.emptyByteArray),
      (3L, "v", Array.fill[Byte](256)(1))) // exactly one full frame
      .toDF("doc_id", "format", "blob")
    val frames = Multimodal.frameSample(blobs, frameBytes = 256, every = 2,
      batchSize = 2).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(1L).map(_.frame_idx).sorted.toSeq == Seq(0, 2))
    assert(byDoc(1L).forall(_.total_frames == 4))
    assert(byDoc(1L).forall(_.frame.length == 256)) // idx 2 is still full
    assert(!byDoc.contains(2L))
    assert(byDoc(3L).map(f => (f.frame_idx, f.total_frames, f.frame.length)).toSeq ==
      Seq((0, 1, 256)))
    // last partial frame length when the last frame IS sampled (every=3 → idx 3)
    val withLast = Multimodal.frameSample(blobs, frameBytes = 256, every = 3)
      .filter(col("doc_id") === 1 && col("frame_idx") === 3).collect()
    assert(withLast.map(_.frame.length).toSeq == Seq(1000 - 3 * 256))
  }

  test("perceptual hash: exact copy at Hamming 0; banded pairs ≡ brute force") {
    import spark.implicits._
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).limit(100)
    val blobs = Multimodal.withBlob(
      base.unionByName(base.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 1000L).as("doc_id"), col("text")))
        .withColumn("fmt", lit("img")), "text", "fmt")
    val hashes = Multimodal.perceptualHash(blobs, batchSize = 7).toDF()
    val got = Multimodal.phashDupPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    // every planted copy pairs with its original at distance 0
    val copies = base.filter(col("doc_id") % 9 === 0)
      .select("doc_id").as[Long].collect()
    copies.foreach(id => assert(got.contains((id, id + 1000L, 0L)),
      s"missing exact-copy pair for $id"))
    // completeness: the banded join finds exactly the brute-force ≤3 pairs
    val hs = hashes.as[(Long, Long, Long)].collect()
    val brute = (for {
      (a, ha, la) <- hs; (b, hb, lb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == brute)
    // 4 bands can only guarantee completeness through Hamming 3
    intercept[IllegalArgumentException] {
      Multimodal.phashDupPairs(hashes, maxHamming = 4)
    }
  }

  test("phash256: banded pairs ≡ brute force; exact copies at Hamming 0; cap honored") {
    import spark.implicits._
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).limit(100)
    val blobs = Multimodal.withBlob(
      base.unionByName(base.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 1000L).as("doc_id"), col("text")))
        .withColumn("fmt", lit("img")), "text", "fmt")
    val hashes = Multimodal.perceptualHash256(blobs, batchSize = 7).toDF()
    val got = Multimodal.phash256DupPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val copies = base.filter(col("doc_id") % 9 === 0)
      .select("doc_id").as[Long].collect()
    copies.foreach(id => assert(got.contains((id, id + 1000L, 0L)),
      s"missing exact-copy pair for $id"))
    // completeness: banded ≡ brute over the full 256 bits
    val hs = hashes.as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    def words(h: (Long, Long, Long, Long, Long, Long, Long, Long, Long)) =
      Seq(h._2, h._3, h._4, h._5, h._6, h._7, h._8, h._9)
    val brute = (for {
      a <- hs; b <- hs if a._1 < b._1
      d = words(a).zip(words(b)).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      if d <= 3
    } yield (a._1, b._1, d.toLong)).toSet
    assert(got == brute)
    // every 32-bit word stays in [0, 2^31) — the oracle-parity contract
    hs.foreach(h => words(h).foreach(w => assert(w >= 0L && w < (1L << 32))))
    // the hot-band cap conf is honored on the wide path too
    spark.conf.set("spark.graft.phash.maxBandFreq", "1")
    try {
      val capped = Multimodal.phash256DupPairs(hashes).as[(Long, Long, Long)]
        .collect().toSet
      // planted exact copies occupy their buckets in pairs (freq 2 > 1):
      // all shed; nothing else at Hamming ≤ 3 among distinct docs survives
      assert(!capped.exists(p => copies.contains(p._1) && p._2 == p._1 + 1000L))
    } finally spark.conf.unset("spark.graft.phash.maxBandFreq")
    intercept[IllegalArgumentException] {
      Multimodal.phash256DupPairs(hashes, maxHamming = 4)
    }
  }

  test("phash hot-band cap: opt-in sheds hot-bucket pairs, keeps cold, default exact") {
    import spark.implicits._
    // 40 identical hashes (a degenerate blank-frame mass: every band
    // bucket holds 40 rows → 780 true pairs of pure quadratic churn) plus
    // one cold near-dup pair at Hamming 1 whose band values are disjoint
    // from the hot mass
    val hot = (1L to 40L).map(i => (i, 0x1111222233334444L, 0x5555666677778888L))
    val cold = Seq(
      (100L, 0x0a0a0b0b0c0c0d0dL, 0x0e0e0f0f01010202L),
      (101L, 0x0a0a0b0b0c0c0d0dL, 0x0e0e0f0f01010203L))
    val hashes = (hot ++ cold).toDF("doc_id", "ph_hi", "ph_lo")
    val all = Multimodal.phashDupPairs(hashes).as[(Long, Long, Long)]
      .collect().toSet
    assert(all.count(p => p._1 <= 40 && p._2 <= 40) == 40 * 39 / 2)
    assert(all.contains((100L, 101L, 1L)))
    spark.conf.set("spark.graft.phash.maxBandFreq", "10")
    try {
      val capped = Multimodal.phashDupPairs(hashes).as[(Long, Long, Long)]
        .collect().toSet
      // the hot mass is shed entirely (all four of its bands exceed the
      // cap); the cold pair's buckets have frequency 2 and survive
      assert(capped == Set((100L, 101L, 1L)))
    } finally spark.conf.unset("spark.graft.phash.maxBandFreq")
    // unset again ⇒ exact results return
    assert(Multimodal.phashDupPairs(hashes).as[(Long, Long, Long)]
      .collect().toSet == all)
  }

  test("voiceSegments ≡ straight-line islands over a crafted silence/tone blob") {
    import spark.implicits._
    // silence (pcm 128 ⇒ energy 0) — tone (228 ⇒ 10000/sample) — silence —
    // a second short tone: two separate segments expected
    val blob = (Array.fill[Byte](96)(128.toByte)
      ++ Array.fill[Byte](160)(228.toByte)
      ++ Array.fill[Byte](96)(128.toByte)
      ++ Array.fill[Byte](64)(228.toByte))
    val blobs = Seq((1L, "aud", blob)).toDF("doc_id", "format", "blob")
    val got = Multimodal.voiceSegments(blobs, win = 64, hop = 32,
        energyThreshold = 100000L)
      .as[(Long, Int, Int, Int, Long, Long)].collect().sortBy(_._2)
    // straight-line reference over the same framing
    val s = blob.map(b => b & 0xff)
    def energy(st: Int) = s.slice(st, math.min(st + 64, s.length))
      .map(x => { val c = x - 128; c.toLong * c }).sum
    val active = (s.indices by 32).zipWithIndex
      .collect { case (st, j) if energy(st) > 100000L => (j, energy(st)) }
    val islands = active.foldLeft(Vector.empty[Vector[(Int, Long)]]) {
      case (acc, (j, e)) if acc.nonEmpty && acc.last.last._1 == j - 1 =>
        acc.init :+ (acc.last :+ (j, e))
      case (acc, w) => acc :+ Vector(w)
    }
    assert(islands.size == 2, s"fixture should give two segments: $islands")
    val want = islands.zipWithIndex.map { case (isl, i) =>
      (1L, i, isl.head._1, isl.last._1, isl.size.toLong, isl.map(_._2).sum) }
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
  }

  test("videoDupPairs: re-upload shares all frames; edit loses one; threshold") {
    import spark.implicits._
    // 64-byte "frames" of per-(video, frame) seeded random bytes: frames of
    // DIFFERENT videos must threshold to well-separated bit patterns (a
    // structured generator like base + j² mod 26 leaves all videos within
    // a few bits of each other — observed)
    def vid(seed: Int, frames: Int): String =
      (0 until frames).flatMap { i =>
        val r = new scala.util.Random(seed * 1000 + i)
        (0 until 64).map(_ => ('a' + r.nextInt(26)).toChar)
      }.mkString
    val v1 = vid(1, 5)
    val v1edit = v1.updated(70, 'Z').mkString          // touches frame 1 only
    val blobs = Seq(
      (1L, "vid", v1),
      (2L, "vid", v1),              // exact re-upload of 1
      (3L, "vid", v1edit),          // near re-upload of 1
      (4L, "vid", vid(9, 5)),       // unrelated
      (5L, "vid", vid(17, 2)))      // short: < minShared frames
      .toDF("doc_id", "format", "text")
      .select(col("doc_id"), col("format"),
        encode(col("text"), "UTF-8").as("blob"))
    val got = Multimodal.videoDupPairs(blobs, frameBytes = 64,
        maxHamming = 3, minShared = 3)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) >= 5L,
      s"exact re-upload must share every frame: $got")
    assert(got.contains((1L, 3L)) && got((1L, 3L)) >= 4L,
      s"one-frame edit keeps the other frames: $got")
    assert(got.contains((2L, 3L)), "near-dup is transitive through the copy")
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated video must not pair: $got")
    assert(!got.keys.exists(p => p._1 == 5L || p._2 == 5L),
      "a 2-frame video cannot reach minShared = 3")
  }

  test("resize: fixed w*h output, nearest-neighbor sampling, deterministic") {
    import spark.implicits._
    val blobs = Seq(
      (1L, "img", Array.tabulate[Byte](100)(_.toByte)),
      (2L, "img", Array.emptyByteArray))
      .toDF("doc_id", "format", "blob")
    val out = Multimodal.resizeBatched(blobs, w = 8, h = 4, batchSize = 1)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.values.forall(r => r.pixels.length == 8 * 4 && r.width == 8 && r.height == 4))
    // nearest-neighbor: pixel i samples byte floor(i*len/n)
    assert(out(1L).pixels.zipWithIndex.forall { case (p, i) => p == (i * 100 / 32).toByte })
    assert(out(2L).pixels.forall(_ == 0))               // empty blob → zeros
    val again = Multimodal.resizeBatched(blobs, 8, 4, batchSize = 64).collect()
      .map(r => r.doc_id -> r.pixels.toSeq).toMap
    assert(out.view.mapValues(_.pixels.toSeq).toMap == again)
  }

  test("MediaCodec is a pluggable seam: a custom codec drives all four paths") {
    import spark.implicits._
    // a fake "real" codec: constant 2-frame segmentation, fixed features,
    // all-42 resize, constant PCM — wrong for bytes, RIGHT for proving the
    // plumbing calls the trait and nothing else
    object TestCodec extends Multimodal.MediaCodec {
      def decode(id: Long, fmt: String, blob: Array[Byte]) =
        Multimodal.MediaMeta(id, s"custom-$fmt", blob.length, 99L, 1, 1)
      def frameCount(blob: Array[Byte], frameBytes: Int): Int =
        if (blob.isEmpty) 0 else 2
      def frame(blob: Array[Byte], frameBytes: Int, i: Int): Array[Byte] =
        Array(i.toByte)
      def resize(blob: Array[Byte], w: Int, h: Int): Array[Byte] =
        Array.fill(w * h)(42.toByte)
      // a real decoder would resample: 3 constant samples per blob byte
      override def pcm(blob: Array[Byte]): Array[Int] =
        Array.fill(blob.length * 3)(200)
    }
    val blobs = Seq((1L, "img", Array.fill[Byte](10)(5)))
      .toDF("doc_id", "format", "blob")
    val meta = Multimodal.decodeBatched(blobs, codec = TestCodec).collect().head
    assert(meta.format == "custom-img" && meta.checksum == 99L)
    val frames = Multimodal.frameSample(blobs, frameBytes = 256, every = 1,
      codec = TestCodec).collect()
    assert(frames.map(f => (f.frame_idx, f.frame.toSeq)).sortBy(_._1).toSeq ==
      Seq((0, Seq(0.toByte)), (1, Seq(1.toByte))))
    val rs = Multimodal.resizeBatched(blobs, 2, 2, codec = TestCodec).collect().head
    assert(rs.pixels.toSeq == Seq.fill(4)(42.toByte))
    // 30 codec samples at hop 32 → ONE window of all-200 (centered 72):
    // the window count proves audioWindows frames the CODEC's samples,
    // not the raw bytes
    val aw = Multimodal.audioWindows(blobs, win = 64, hop = 32,
      codec = TestCodec).collect()
    assert(aw.toSeq == Seq(
      Multimodal.AudioWindow(1L, 0, 30, 30L * 72 * 72, 0)))
  }

  test("audioWindows: framing arithmetic, features exact, batch-invariant") {
    import spark.implicits._
    // 100 samples alternating 100/156 (centered −28/+28): every adjacent
    // pair crosses zero, so a full 64-window has 63 crossings and energy
    // 64·28² — closed-form ground truth for every feature
    val wave = Array.tabulate[Byte](100)(i => if (i % 2 == 0) 100.toByte else 156.toByte)
    val blobs = Seq((1L, "wav", wave), (2L, "wav", Array.empty[Byte]),
      (3L, "wav", Array.fill[Byte](5)(128.toByte)))
      .toDF("doc_id", "format", "blob")
    val got = Multimodal.audioWindows(blobs, win = 64, hop = 32).collect()
      .groupBy(_.doc_id)
    // starts 0, 32, 64, 96 → windows of 64, 64, 36, 4 samples
    val w1 = got(1L).sortBy(_.win_idx)
    assert(w1.map(w => (w.win_idx, w.n_samples)).toSeq ==
      Seq((0, 64), (1, 64), (2, 36), (3, 4)))
    assert(w1.take(2).forall(w => w.energy == 64L * 28 * 28 &&
      w.zero_crossings == 63))
    assert(w1(2).energy == 36L * 28 * 28 && w1(2).zero_crossings == 35)
    // empty blob: no windows; constant-128 blob: one silent window
    assert(!got.contains(2L))
    assert(got(3L).toSeq == Seq(Multimodal.AudioWindow(3L, 0, 5, 0L, 0)))
    // batch size must not affect results
    val again = Multimodal.audioWindows(blobs, win = 64, hop = 32,
      batchSize = 1).collect().sortBy(w => (w.doc_id, w.win_idx)).toSeq
    assert(again == Multimodal.audioWindows(blobs, win = 64, hop = 32,
      batchSize = 7).collect().sortBy(w => (w.doc_id, w.win_idx)).toSeq)
  }

  test("oversize blobs follow the error policy: log drops, exit fails") {
    import spark.implicits._
    val blobs = Seq(
      (1L, "img", Array.fill[Byte](10)(1)),
      (2L, "img", Array.fill[Byte](1000)(2))) // poison: over the 100-byte cap
      .toDF("doc_id", "format", "blob")
    val kept = Multimodal.decodeBatched(
      Multimodal.guardOversize(blobs, ErrorPolicy.Log, maxBytes = 100)).collect()
    assert(kept.map(_.doc_id).toSeq == Seq(1L))
    val e = intercept[Exception] {
      Multimodal.decodeBatched(
        Multimodal.guardOversize(blobs, ErrorPolicy.Exit, maxBytes = 100)).collect()
    }
    assert(e.getMessage.contains("error policy exit") ||
      Option(e.getCause).exists(_.getMessage.contains("error policy exit")))
  }

  test("vitPatchGrid: ceil grid, padding, truncation boundary") {
    import spark.implicits._
    // stub decode: width = n_bytes % 64 + 1, height = checksum % 64 + 1;
    // craft blobs hitting exact-multiple and ragged dims
    val blobs = Seq(
      (1L, "img", Array.fill[Byte](31)(64)),  // w=32: exact 2 cols
      (2L, "img", Array.fill[Byte](33)(64)),  // w=34: ragged 3rd col
      (3L, "img", Array.fill[Byte](63)(1)))   // w=64: 4 cols
      .toDF("doc_id", "format", "blob")
    val g = Multimodal.vitPatchGrid(blobs, patch = 16, maxPatches = 6)
      .select($"doc_id", $"grid_w", $"n_patches", $"seq_len", $"truncated", $"pad_w")
      .as[(Long, Long, Long, Long, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(g(1L)._2 == 2 && g(1L)._6 == 0)          // 32/16 exact, no pad
    assert(g(2L)._2 == 3 && g(2L)._6 == 14)         // ceil(34/16)=3, pad 48-34
    assert(g(3L)._2 == 4)
    // truncation: n_patches > maxPatches caps seq_len at maxPatches+1
    for ((_, (_, gw, np, seq, trunc, _)) <- g) {
      if (np > 6) assert(trunc && seq == 7)
      else assert(!trunc && seq == np + 1)
    }
  }

  test("driftReport: share doubling/halving flags; balanced halves stay calm") {
    import spark.implicits._
    def vecs(rows: Seq[(Long, Array[Float])]) = rows.toDF("vec_id", "embedding")
    val a = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val b = Array(0.0f, 1.0f, 0.0f, 0.0f)
    // base: 2 in cluster A, 8 in cluster B; ids 0/1 seed one of each
    val base = vecs(Seq(0L -> a, 1L -> b, 2L -> a) ++
      (3L to 9L).map(_ -> b))
    val idx = IvfIndex.build(base, "vec_id", "embedding", nLists = 2, iters = 1)
    // skewed incoming: everything lands in A's cell
    val skew = vecs((100L to 109L).map(_ -> a))
    val r = IvfIndex.driftReport(idx, skew, "vec_id", "embedding")
      .select($"n_base", $"n_new", $"drifted")
      .as[(Long, Long, Boolean)].collect().toSet
    // A: 2→10 of a 10-total (share 0.2→1.0, >2×) — drifted;
    // B: 8→0 — drifted (emptied)
    assert(r == Set((2L, 10L, true), (8L, 0L, true)))
    // the base re-presented as "incoming" drifts nothing
    val calm = IvfIndex.driftReport(idx, base, "vec_id", "embedding")
    assert(calm.filter($"drifted").count() == 0)
  }

  test("balancedSample: quota per cell, deterministic, complete under small cells") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nLists = 8, iters = 1)
    val m = 5
    val sample = IvfIndex.balancedSample(idx, "vec_id", m)
    val perCell = sample.groupBy($"cell".cast("long").as("c")).count()
      .as[(Long, Long)].collect().toMap
    val cellSizes = idx.assigned.groupBy($"cell".cast("long").as("c")).count()
      .as[(Long, Long)].collect().toMap
    for ((cell, n) <- perCell) assert(n == math.min(m.toLong, cellSizes(cell)))
    // no cell exceeds quota; every nonempty cell is represented
    assert(perCell.keySet == cellSizes.keySet)
    // deterministic under repartitioning
    val again = IvfIndex.balancedSample(
      IvfIndex.Index(idx.centroids, idx.assigned.repartition(13)), "vec_id", m)
    assert(sample.select($"vec_id", $"cell", $"pos").collect().toSet ==
      again.select($"vec_id", $"cell", $"pos").collect().toSet)
  }
}

class TableDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("diff: change types exact, changed columns named, identical rows silent") {
    import spark.implicits._
    val oldT = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (5L, null.asInstanceOf[String], 50.0))
      .toDF("k", "s", "v")
    val newT = Seq(
      (1L, "a", 10.0),                       // untouched → absent from diff
      (2L, "B", 20.0),                       // one col changed
      (3L, "c", 31.0),                       // other col changed
      (6L, "new", 60.0),                     // added (4 removed)
      (5L, "now-set", 50.0))                 // null → value IS a change
      .toDF("k", "s", "v")
    val got = TableDiff.diff(oldT, newT, "k")
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      2L -> ("changed", "s"), 3L -> ("changed", "v"),
      4L -> ("removed", ""), 6L -> ("added", ""),
      5L -> ("changed", "s")))
    // identical snapshots diff to nothing
    assert(TableDiff.diff(oldT, oldT, "k").isEmpty)
    // both columns changed → both named, schema order
    val both = Seq((2L, "x", 99.0)).toDF("k", "s", "v")
    val g2 = TableDiff.diff(oldT.filter($"k" === 2), both, "k")
      .as[(Long, String, String)].head()
    assert(g2 == ((2L, "changed", "s,v")))
    intercept[IllegalArgumentException] {
      TableDiff.diff(oldT, newT.select("k", "v", "s"), "k")
    }
  }
}

class SceneChangeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("planted shot structure: held frames never split, cuts detected") {
    import spark.implicits._
    // frames A,A,A,B,B,C — 64-char blocks, A/B/C pairwise very different
    val a = "x" * 64
    val b = ("qz" * 32)
    val c = ("m n o p " * 8)
    val docs = Seq((1L, a * 3 + b * 2 + c), (2L, a * 4), (3L, a))
      .toDF("doc_id", "text").withColumn("fmt", lit("vid"))
    val got = Multimodal.sceneChanges(
        Multimodal.withBlob(docs, "text", "fmt"), frameBytes = 64,
        threshold = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // identical frames hash identically → distance 0 → never a boundary;
    // the two cuts (A→B at frame 3, B→C at frame 5) must both register
    assert(got(1L) == ((6L, 3L, "3,5")), s"got ${got(1L)}")
    assert(got(2L) == ((4L, 1L, "")))   // one held shot
    assert(got(3L) == ((1L, 1L, "")))   // single frame = one scene
  }
}

class SketchStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("sketch fold: within HLL error, deterministic, batch retry is a no-op") {
    import spark.implicits._
    import graft.streaming.SketchStream
    val all = (1 to 2000).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v")
    val parts = (0 until 4).map(k => all.filter($"v" % 4 === k))
    def estimatesOf(dir: String) =
      SketchStream.estimates(spark, dir, "g")
        .as[(String, Double)].collect().toMap

    val incDir = java.nio.file.Files.createTempDirectory("skinc").toString + "/t"
    parts.foreach(p => SketchStream.foldOnce(p, "g", "v", incDir))
    val oneDir = java.nio.file.Files.createTempDirectory("skone").toString + "/t"
    SketchStream.foldOnce(all, "g", "v", oneDir)
    val inc = estimatesOf(incDir)
    val one = estimatesOf(oneDir)
    // NOTE: incremental and one-shot estimates are NOT bit-identical —
    // DataSketches invalidates the HIP estimator on union — but both must
    // sit well within HLL error of the true count (n≈667/group, lgK=12)
    for ((_, e) <- inc ++ one)
      assert(math.abs(e - 2000.0 / 3) < 0.05 * 2000 / 3, s"estimate $e")
    // incremental folding is deterministic: a second identical run of the
    // whole fold sequence reproduces the estimates exactly
    val inc2Dir = java.nio.file.Files.createTempDirectory("skinc2").toString + "/t"
    parts.foreach(p => SketchStream.foldOnce(p, "g", "v", inc2Dir))
    assert(estimatesOf(inc2Dir) == inc)
    // retry: folding an already-folded batch again must not move a single
    // estimate — HLL union is a set union, re-inserting is a no-op (the
    // property that makes this sink retry-safe WITHOUT batch-id markers)
    SketchStream.foldOnce(parts(2), "g", "v", incDir)
    assert(estimatesOf(incDir) == inc)
  }
}

class AudioFingerprintSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("clip matches its source track at the planted window offset") {
    import spark.implicits._
    val ascii = graft.Tables.documents(spark, dir)
      .filter(octet_length(col("text")) === length(col("text")) &&
        octet_length(col("text")) >= 256)
    val tracks = Multimodal.audioFingerprints(
      Multimodal.withBlob(ascii, "text", "source"))
    // hop-aligned excerpt: samples [64, 256) → clip window j ≡ track j+2
    val clips = Multimodal.audioFingerprints(
      Multimodal.withBlob(ascii.filter($"doc_id" % 20 === 0)
        .select(($"doc_id" + 500000L).as("doc_id"),
          expr("substring(text, 65, 192)").as("text"), $"source"),
        "text", "source"))
    val got = Multimodal.audioMatch(clips, tracks)
      .as[(Long, Long, Int, Long)].collect()
    assert(got.nonEmpty)
    // the corpus contains NEAR-DUPLICATE documents (e.g. one doc literally
    // containing another's excerpt), so a clip may legitimately tie between
    // its own track and a content-identical one — the correctness contract
    // is: the OWN track at the planted offset 2 scores the per-clip MAXIMUM
    // vote count (it can never be beaten, only tied by identical content)
    val cands = clips.select($"doc_id".as("clip_id"), $"win_idx".as("cj"), $"fp")
      .join(tracks.select($"doc_id".as("track_id"), $"win_idx".as("tj"), $"fp"),
        Seq("fp"))
      .groupBy($"clip_id", $"track_id", ($"tj" - $"cj").as("off"))
      .count()
      .as[(Long, Long, Int, Long)].collect()
    val maxVotes = cands.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val own = cands.filter(c => c._2 == c._1 - 500000L && c._3 == 2)
      .map(c => c._1 -> c._4).toMap
    for ((clip, _, off, n) <- got) {
      assert(own(clip) == maxVotes(clip),
        s"clip $clip: own track at offset 2 has ${own(clip)} votes, max ${maxVotes(clip)}")
      assert(n == maxVotes(clip) && n >= 3, s"clip $clip winner votes $n")
      assert(off >= 0, s"clip $clip negative offset $off")
    }
    // every clip produced a match row
    assert(got.map(_._1).toSet == own.keySet)
  }
}
