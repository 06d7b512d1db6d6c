package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ-ADC ANN (vec10's operator): codebook structure, partitioning
  * invariance, a straight-line cross-check of the ADC scan, the recall
  * floor against exact brute force, and the plan shape (all joins hashed,
  * nothing cartesian over vectors).
  */
class PqIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  def emb = graft.Tables.embeddings(spark, dir)

  test("train: m×k codebooks of subspace-width integer codewords") {
    val books = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 16).cache()
    assert(books.count() == 64)
    import spark.implicits._
    val widths = books.select(size(col("cv"))).as[Int].collect().toSet
    assert(widths == Set(16), s"every codeword spans its 16-dim subspace: $widths")
    val cells = books.groupBy("s").agg(countDistinct("cell").as("k"))
      .select("k").as[Long].collect().toSet
    assert(cells == Set(16L), "each subspace keeps exactly k codewords (empty cells held)")
  }

  test("encode: codes are invariant under repartitioning") {
    import spark.implicits._
    val books = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 16)
    def codes(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] =
      PqIndex.encode(df, "vec_id", "embedding", books, m = 4)
        .as[(Long, Seq[Int])].collect().toMap
    val a = codes(emb)
    val b = codes(emb.repartition(7))
    assert(a == b, "deterministic ties (lowest cell) must survive re-partitioning")
    assert(a.values.flatten.forall(c => c >= 0 && c < 16))
  }

  test("adcDistances equals a straight-line recompute over collected codes") {
    import spark.implicits._
    val books = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 16)
    val probes = emb.filter(col("vec_id") < 5)
    // local model: dtable[probe][s][code] from collected books + probe slices
    val bk = books.as[(Int, Int, Seq[Long])].collect()
      .map { case (s, cell, cv) => (s, cell) -> cv }.toMap
    val pv = probes.select(col("vec_id"),
      Similarity.quantize(col("embedding")).as("qv")).as[(Long, Seq[Long])].collect()
      .map { case (id, qv) => // the spherical renorm of PqIndex.subVectors
        val n2 = qv.map(x => x * x).sum
        (id, if (n2 == 0) qv.map(_ => 0L)
             else qv.map(v => math.floor(v * 1024d / math.sqrt(n2.toDouble)).toLong))
      }
    val codes = PqIndex.encode(emb, "vec_id", "embedding", books, m = 4)
      .as[(Long, Seq[Int])].collect()
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = (for {
      (pid, qn) <- pv
      (nid, cs) <- codes if nid != pid
    } yield (pid, nid) -> cs.zipWithIndex.map { case (c, s) =>
      l2(qn.slice(s * 16, s * 16 + 16), bk((s, c))) }.sum).toMap
    val got = PqIndex.adcDistances(probes, emb, "vec_id", "embedding", books, m = 4)
      .as[(Long, Long, Long)].collect()
      .map { case (p, n, d) => (p, n) -> d }.toMap
    assert(got == expected, "the codes×dtable join-agg must equal the local ADC model")
  }

  test("searchAdc: recall@3 against exact brute force stays above its floor") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("probe_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
    val probes = emb.filter(col("vec_id") < 10)
    val exact = pairs(Similarity.knnBrute(probes, emb, "vec_id", "embedding", k = 3))
    val pq = pairs(PqIndex.searchAdc(probes, emb, "vec_id", "embedding",
      k = 3, m = 16, nCodes = 32, iters = 2, rerankN = 32))
    val recall = (exact intersect pq).size.toDouble / exact.size
    // deterministic pipeline ⇒ a fixed number (measured 0.93), not a flaky
    // sample; the floor sits under it so only a real regression trips this
    assert(recall >= 0.85, s"PQ recall@3 collapsed: $recall (${exact.size} exact pairs)")
  }

  test("index: save/load round-trip searches bit-identically to inline train") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
      df.select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSet
    val probes = emb.filter(col("vec_id") < 10)
    val inline = rows(PqIndex.searchAdc(probes, emb, "vec_id", "embedding", k = 3))
    val dir = java.nio.file.Files.createTempDirectory("pq_idx").toString
    PqIndex.build(emb, "vec_id", "embedding").save(dir)
    val loaded = PqIndex.load(spark, dir)
    assert(loaded.m == 16, "m must be recoverable from the stored codebooks")
    val viaIndex = rows(PqIndex.searchIndex(probes, loaded, emb,
      "vec_id", "embedding", k = 3))
    assert(viaIndex == inline,
      "stored integer codes/codebooks must reproduce the inline search exactly")
  }

  test("append: frozen-codebook encode of a new batch ≡ encoding everything") {
    import spark.implicits._
    val base = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val idx = PqIndex.build(base, "vec_id", "embedding")
    val appended = PqIndex.append(idx, batch, "vec_id", "embedding")
    def codeMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] =
      df.as[(Long, Seq[Int])].collect().toMap
    val all = codeMap(PqIndex.encode(emb, "vec_id", "embedding",
      idx.codebooks, idx.m))
    assert(codeMap(appended.codes) == all,
      "append must equal encode-all under the SAME (frozen) codebooks")
    assert(codeMap(idx.codes).keySet.forall(_ % 2 == 0),
      "the base index must not be mutated by append")
  }

  test("searchIvf with nProbe = nLists (pruning off) ≡ searchAdc exactly") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
      df.select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSet
    val probes = emb.filter(col("vec_id") < 10)
    // probing every cell keeps every candidate pair — the composed path must
    // then collapse to plain PQ-ADC bit-for-bit (same codebooks, same ranks)
    val full = rows(PqIndex.searchIvf(probes, emb, "vec_id", "embedding",
      k = 3, nLists = 8, nProbe = 8))
    val flat = rows(PqIndex.searchAdc(probes, emb, "vec_id", "embedding", k = 3))
    assert(full == flat, "un-pruned IVF-PQ must equal the flat ADC search")
  }

  test("searchIvf: pruned candidates are a subset; recall holds its floor") {
    import spark.implicits._
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("probe_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
    val probes = emb.filter(col("vec_id") < 10)
    val exact = pairs(Similarity.knnBrute(probes, emb, "vec_id", "embedding", k = 3))
    val got = pairs(PqIndex.searchIvf(probes, emb, "vec_id", "embedding", k = 3))
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF-PQ recall@3 collapsed: $recall")
  }

  test("ivf-pq index: save/load round-trip ≡ inline searchIvf bit-for-bit") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
      df.select(col("probe_id"), col("neighbor_id"), col("sim"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSet
    val probes = emb.filter(col("vec_id") < 10)
    val inline = rows(PqIndex.searchIvf(probes, emb, "vec_id", "embedding",
      k = 3, nLists = 8, nProbe = 3))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    PqIndex.buildIvf(emb, "vec_id", "embedding", nLists = 8).save(dir)
    val loaded = PqIndex.loadIvf(spark, dir)
    assert(loaded.m == 16, "m must be recoverable from the stored codebooks")
    val viaIndex = rows(PqIndex.searchIvfIndex(probes, loaded, emb,
      "vec_id", "embedding", k = 3, nProbe = 3))
    assert(viaIndex == inline,
      "stored coarse/codebooks/codes must reproduce inline searchIvf exactly")
    // nProbe = nLists turns pruning off: the persisted path must collapse
    // to the flat ADC search, same as inline searchIvf does
    val unpruned = rows(PqIndex.searchIvfIndex(probes, loaded, emb,
      "vec_id", "embedding", k = 3, nProbe = 8))
    val flat = rows(PqIndex.searchAdc(probes, emb, "vec_id", "embedding", k = 3))
    assert(unpruned == flat, "un-pruned persisted IVF-PQ must equal flat ADC")
  }

  test("ivf-pq index: loaded search scans only the probed cell partitions") {
    val probes = emb.filter(col("vec_id") < 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_prune").toString
    PqIndex.buildIvf(emb, "vec_id", "embedding", nLists = 8).save(dir)
    val loaded = PqIndex.loadIvf(spark, dir)
    val plan = PqIndex.searchIvfIndex(probes, loaded, emb,
      "vec_id", "embedding", k = 3, nProbe = 2)
      .queryExecution.executedPlan
    // the literal isin over the partition column must reach the codes scan
    // as a partition filter — the stored index's pruning contract.
    // (AdaptiveSparkPlanExec hides scan details from toString — unwrap.)
    val inner = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val codesScans = inner.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("codes")) => f
    }
    assert(codesScans.nonEmpty, "the stored codes must be read by a file scan")
    assert(codesScans.forall(_.partitionFilters.exists(_.toString.contains("cell"))),
      "probed-cell filter must prune parquet partitions of the stored codes")
    // (no BNLJ assert here: the probe-side centroid scan is a DELIBERATE
    // broadcast cross join, bounded at probes × nLists rows)
    assert(!plan.toString.contains("CartesianProduct"))
  }

  test("ivf-pq append/remove on the saved index: frozen-quantizer lifecycle") {
    import spark.implicits._
    val base = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_life").toString
    PqIndex.buildIvf(base, "vec_id", "embedding", nLists = 8).save(dir)
    def codeMap(idx: PqIndex.IvfPq): Map[Long, (Int, Seq[Int])] =
      idx.codes.select(col("neighbor_id"), col("cell"), col("codes"))
        .as[(Long, Int, Seq[Int])].collect()
        .map { case (id, c, cs) => id -> (c, cs) }.toMap
    // append odds under the FROZEN codebooks + coarse cells: must equal
    // encoding + assigning EVERYTHING under the base-trained quantizers
    val appended = PqIndex.appendSavedIvf(spark, dir, rest, "vec_id", "embedding")
    val baseIdx = PqIndex.loadIvf(spark, dir)
    val cells = IvfIndex.assign(
      PqIndex.normalized(emb, "vec_id", "embedding")
        .select(col("id"), col("qn").as("qv")),
      baseIdx.coarse).select(col("id"), col("cell"))
    val expectAll = PqIndex.encode(emb, "vec_id", "embedding",
        baseIdx.codebooks, baseIdx.m)
      .join(cells, Seq("id"))
      .select(col("id").as("neighbor_id"), col("cell"), col("codes"))
    assert(codeMap(appended) ==
      expectAll.as[(Long, Int, Seq[Int])].collect()
        .map { case (id, c, cs) => id -> (c, cs) }.toMap,
      "append must equal encode+assign-all under the frozen quantizers")
    // remove the odds again: back to exactly the base codes
    val removed = PqIndex.removeSavedIvf(spark, dir,
      rest.select(col("vec_id")), "vec_id")
    val rebuilt = PqIndex.buildIvf(base, "vec_id", "embedding", nLists = 8)
    assert(codeMap(removed) == codeMap(rebuilt),
      "remove must restore the base corpus codes exactly")
  }

  test("memoKey: memoized codebooks are bit-identical to a fresh training; distinct keys never share") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("s"), col("cell"), col("cv"))
        .as[(Int, Int, Seq[Long])].collect().sortBy(r => (r._1, r._2)).toSeq
    val key = "pqmemo-spec-" + java.util.UUID.randomUUID().toString
    val fresh = rows(PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8))
    val first = rows(PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8,
      memoKey = Some(key)))
    val hit = rows(PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8,
      memoKey = Some(key)))
    assert(first == fresh, "a memo MISS must train exactly as the unkeyed path")
    assert(hit == fresh, "a memo HIT must reproduce the training bit-for-bit")
    // a different corpus under a different key must not collide
    val other = rows(PqIndex.train(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", m = 4, k = 8, memoKey = Some(key + ":even")))
    assert(other != fresh, "distinct keys memoize distinct trainings")
    // params are part of the key: same memoKey, different k, no collision
    val k16 = rows(PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 16,
      memoKey = Some(key)))
    assert(k16.map(_._2).max > 8 - 1, "k=16 under the same memoKey retrains")
  }

  test("maxTrainRows: a cap at/above the corpus is a no-op; an engaged cap samples deterministically and search recall holds") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("s"), col("cell"), col("cv"))
        .as[(Int, Int, Seq[Long])].collect().sortBy(r => (r._1, r._2)).toSeq
    val exact = rows(PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8))
    val uncapped = rows(PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8,
      maxTrainRows = 1000000L))
    assert(uncapped == exact, "a cap above the corpus must not change training")
    // engaged: deterministic, full codebook shape, and the sampled-codebook
    // search still clears a recall floor vs exact brute force
    val s1 = rows(PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8,
      maxTrainRows = 64L))
    val s2 = rows(PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 8,
      maxTrainRows = 64L))
    assert(s1 == s2, "sampled training must be deterministic")
    assert(s1.size == 4 * 8 && s1 != exact)
    val probes = emb.filter(col("vec_id") < 10)
    val exactTop = Similarity.knnBrute(probes, emb, "vec_id", "embedding", 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sampled = PqIndex.searchAdc(probes, emb, "vec_id", "embedding",
        k = 3, m = 16, nCodes = 32, iters = 2, rerankN = 32,
        maxTrainRows = 64L)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exactTop & sampled).size.toDouble / exactTop.size
    assert(recall >= 0.7, s"sample-trained recall collapsed: $recall")
  }

  test("plan: ADC search joins are hashed — no cartesian over vectors") {
    val plan = PqIndex.searchAdc(emb.filter(col("vec_id") < 10), emb,
      "vec_id", "embedding", k = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "PQ search must never do an all-pairs vector scan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "codebook/dtable joins are equi-joins — a nested loop means a lost key")
  }
}
