package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * All similarity math runs on **fixed-point quantized** vectors:
  * q_i = floor(x_i · 1024) as long. Rationale:
  *   - float sums are order-dependent → not reproducible across engines or
  *     across partitionings of the same cluster; integer dot products are
  *     exact, so results are stable under AQE re-planning and retries (and
  *     verifiable against the DuckDB oracle);
  *   - int16-range quantization is the standard memory/bandwidth trade in
  *     large-scale ANN systems anyway (4× smaller than float32 at 100 TB).
  *
  * Brute-force top-k is the exactness baseline (O(probes·corpus));
  * [[annLsh]] is the scale path: random-hyperplane LSH buckets + rerank,
  * turning all-pairs into per-bucket work.
  */
object Similarity {

  /** floor(x·1024) per element — float→double is exact, ·2^10 is exact, so
    * quantization is deterministic on every engine.
    */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1024).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native fused
    * loop ([[graft.functions.DotQExpr]]); same null/overflow semantics as
    * the `aggregate(zip_with(·))` HOF form it replaced, ~order-of-magnitude
    * faster per pair (the rerank/assign hot path evaluates it
    * O(pairs · dims) times).
    */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_q(a, b)

  /** Quantized cosine similarity (double; deterministic). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Cosine from a precomputed squared-norm pair — reranking N candidate
    * pairs needs N dot products, not 3N (norms are per-vector, compute once).
    */
  def cosineQWithNorms(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** PROBE-SIDE broadcast budget for the brute faces. The brute contract
    * is "probes are small, corpus is streamed" — but as a bare comment a
    * self-join-sized probe set (legal input via the public knnBrute /
    * radiusSearch / hardNegatives API) would hard-fail at Spark's 8 GB
    * broadcast cap or driver OOM with an opaque executor error. Same
    * refuse-loudly discipline as the centroid collect guard
    * ([[IvfIndex.requireCentroidsCollectable]]): count the probe side once
    * — a job bounded by `limit(budget+1)`, so it stops scanning at the cap
    * rather than counting an arbitrarily large relation — and refuse past
    * `spark.graft.brute.maxProbeBroadcastRows` naming the scalable
    * alternative. The extra bounded job is noise next to the
    * O(|probes|·|corpus|) pair loop these faces exist to run.
    */
  private def probeBroadcastBudget(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("spark.graft.brute.maxProbeBroadcastRows", "1000000").toLong

  private def broadcastProbes(p: DataFrame, face: String): DataFrame = {
    val budget = probeBroadcastBudget(p.sparkSession)
    val lim = math.min(budget, (Int.MaxValue - 2).toLong).toInt
    val n = p.limit(lim + 1).count()
    require(n <= budget,
      s"$face would broadcast >$budget probe rows (counted ≥$n) — above " +
        s"spark.graft.brute.maxProbeBroadcastRows=$budget. The brute faces " +
        "broadcast the PROBE side by contract (the corpus is streamed); " +
        "for probe sets this large use the index faces (searchIndex / " +
        "radiusSearchIndex / hardNegativesIndexed / semanticDecontaminate) " +
        "or chunk the probe set.")
    broadcast(p)
  }

  /** Brute-force top-k neighbors for each probe (probe ≠ neighbor).
    * probes/corpus: (id, vec) DataFrames with the given column names.
    */
  /** kNN LABEL PREDICTION — majority vote over the top-`k` neighbors, the
    * weak-supervision / label-propagation step a labeling pipeline runs
    * over embeddings (predict a new item's class from its labeled
    * neighbors). Vote ties break to the SMALLEST label (deterministic, so
    * the gate hash-matches); the neighbor set itself is [[knnBrute]]'s
    * exact quantized-cosine top-k — swap in an index search for the 100 TB
    * path, the vote is the same one aggregation per probe.
    *
    * `labeled` provides (idCol, labelCol). Returns (probe_id, predicted,
    * n_votes).
    */
  def knnClassify(probes: DataFrame, corpus: DataFrame, labeled: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val nn = knnBrute(probes, corpus, idCol, vecCol, k)
    nn.join(labeled.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("_lbl")), Seq("neighbor_id"))
      .groupBy(col("probe_id"), col("_lbl"))
      .agg(count(lit(1)).as("n_votes"))
      .groupBy(col("probe_id"))
      .agg(min_by(struct(col("_lbl"), col("n_votes")),
        struct(negate(col("n_votes")), col("_lbl"))).as("_w"))
      .select(col("probe_id"), col("_w._lbl").as("predicted"),
        col("_w.n_votes").as("n_votes"))
  }

  def knnBrute(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pq"))
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cq"))
    // CORPUS streamed, PROBES broadcast (probe sets are small by the brute
    // contract): left unhinted, the planner built the nested loop on the
    // CORPUS side — at the 1000× soak that meant a multi-GB broadcast AND
    // the whole pair loop running on the probe side's near-empty partition
    // layout, serializing 20M pair evaluations onto one task (vec39 read
    // 10× over its linear work growth). The hint pins parallelism to the
    // corpus partitioning at every scale.
    val scored = c.crossJoin(broadcastProbes(p, "knnBrute"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosineQ(col("pq"), col("cq")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** HARD-NEGATIVE MINING — the contrastive-training curation step: per
    * anchor, the k MOST similar corpus vectors that are (a) NOT the anchor
    * itself, (b) NOT near-duplicates (`sim < dupCeiling` — a paraphrase or
    * verbatim leak mined as a "negative" is a FALSE negative that actively
    * corrupts the loss; the ceiling is the same 0.999 quantized-cosine rule
    * vec13's decontamination uses), and (c) from a DIFFERENT label/source
    * group (same-group pairs are presumed positives). Harder negatives
    * (higher sim, after the exclusions) rank first — exactly the "closest
    * non-matching" recipe of contrastive retrieval training.
    *
    * This is the exactness baseline (one fused-loop dot per pair, norms
    * precomputed per side); at corpus scale compose the SAME filter/re-rank
    * through the IVF index via [[hardNegativesIndexed]] — candidates come
    * from the probed cells with an overfetch margin, so cost is
    * Σ|probed cell| per anchor, never |corpus|.
    */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int,
      dupCeiling: Double = 0.999): DataFrame = {
    val p = anchors.select(col(idCol).as("probe_id"),
      quantize(col(vecCol)).as("pq"), col(labelCol).as("_plabel"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("cq"), col(labelCol).as("_nlabel"))
    // corpus streamed / anchors broadcast — the knnBrute parallelism rule
    val scored = c.crossJoin(broadcastProbes(p, "hardNegatives"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .filter(col("_plabel") =!= col("_nlabel"))
      .select(col("probe_id"), col("neighbor_id"), col("_nlabel"),
        cosineQ(col("pq"), col("cq")).as("sim"))
      .filter(col("sim") < dupCeiling)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"),
        col("_nlabel").as("neighbor_label"), col("sim"), col("rank"))
  }

  /** [[hardNegatives]] through a prebuilt [[IvfIndex.Index]] — the 100-TB
    * path: candidates are the index search's top `k·overfetch` (probed
    * cells only, partition-pruned on a loaded index), then the SAME
    * exclusions and re-rank. The overfetch margin absorbs candidates the
    * exclusions remove; with `nProbe = nLists` and a sufficient margin the
    * result EQUALS the exact [[hardNegatives]] (spec-pinned) — below, the
    * standard IVF recall trade. `labels(idCol, labelCol)` supplies both
    * sides' groups (the index stores ids and codes, never payloads).
    */
  def hardNegativesIndexed(index: IvfIndex.Index, anchors: DataFrame,
      labels: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, nProbe: Int = 3, overfetch: Int = 4,
      dupCeiling: Double = 0.999): DataFrame = {
    require(overfetch >= 1, s"overfetch must be ≥ 1: $overfetch")
    val lab = labels.select(col(idCol), col(labelCol))
    val cand = IvfIndex.searchIndex(anchors, index, idCol, vecCol,
      k = k * overfetch, nProbe = nProbe)
      .select(col("probe_id"), col("neighbor_id"), col("sim"))
    val withLabels = cand
      .join(lab.select(col(idCol).as("probe_id"),
        col(labelCol).as("_plabel")), Seq("probe_id"))
      .join(lab.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("_nlabel")), Seq("neighbor_id"))
      .filter(col("_plabel") =!= col("_nlabel"))
      .filter(col("sim") < dupCeiling)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    withLabels.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"),
        col("_nlabel").as("neighbor_label"), col("sim"), col("rank"))
  }

  /** Per-anchor SHORTFALL report for [[hardNegativesIndexed]] — the silent
    * failure mode of overfetch-based mining made loud: when the dup-ceiling
    * + same-label exclusions eat more than `(overfetch−1)·k` of an anchor's
    * `k·overfetch` candidates (or the probed cells simply hold too few
    * eligible vectors), the anchor gets FEWER than k negatives with no
    * signal — in a contrastive-training pipeline that quietly skews the
    * loss toward the starved anchors. One row per ANCHOR, zero-negative
    * anchors included (the left join is the point — a groupBy over the
    * mined rows alone would drop exactly the worst cases):
    * `(probe_id, n_returned, shortfall)` with `shortfall = k − n_returned`.
    * Remedy for flagged anchors: raise `nProbe` and/or `overfetch` and
    * re-mine them (a deterministic re-run, not a silent in-line escalation
    * — auto-widening would make the mined set depend on candidate-pool
    * accidents and break run-to-run reproducibility).
    *
    * Scale shape: the mining pass itself plus one partial-agg count per
    * anchor and a broadcast-size left join on the anchor ids — nothing
    * beyond [[hardNegativesIndexed]]'s own cost.
    */
  def hardNegativeShortfall(index: IvfIndex.Index, anchors: DataFrame,
      labels: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int, nProbe: Int = 3, overfetch: Int = 4,
      dupCeiling: Double = 0.999): DataFrame = {
    val mined = hardNegativesIndexed(index, anchors, labels, idCol, vecCol,
      labelCol, k, nProbe, overfetch, dupCeiling)
      .groupBy(col("probe_id")).agg(count(lit(1)).as("_n"))
    anchors.select(col(idCol).as("probe_id"))
      .join(mined, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("_n"), lit(0L)).as("n_returned"))
      .withColumn("shortfall", lit(k.toLong) - col("n_returned"))
  }

  /** RANGE (radius) search: every corpus vector whose quantized cosine with
    * the probe is ≥ minCosNum/minCosDen — the other half of the ANN API
    * surface: top-k answers "the closest k", radius answers "everything at
    * least this similar", the dedup/recall-sweep shape where the NUMBER of
    * qualifying neighbors is the unknown being measured.
    *
    * The threshold is evaluated in EXACT integer arithmetic by
    * cross-multiplication — cos ≥ n/d ⇔ dot ≥ 0 ∧ d²·dot² ≥ n²·n2p·n2c —
    * so result-set membership never depends on float rounding; the reported
    * `sim` double is one IEEE division, identical on every engine.
    * Overflow bound: |q_i| ≤ 2^10 for unit-ish inputs, so at ≤128 dims
    * dot² < 2^54 and n2p·n2c < 2^54; keep n, d ≤ 10 and every term stays
    * under 2^61.
    *
    * Scale shape: the brute pair join is the exactness baseline (norms are
    * precomputed per SIDE, so each pair pays exactly one fused-loop dot
    * product — [[graft.functions.DotQExpr]]). At corpus scale the same
    * integer predicate composes unchanged with the IVF cell join
    * ([[semanticDedupIndexed]]'s layout): radius search inside probed cells,
    * trading the completeness guarantee for cell-pruned IO exactly as
    * indexed top-k does.
    */
  def radiusSearch(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, minCosNum: Long, minCosDen: Long): DataFrame = {
    require(minCosNum >= 0 && minCosDen > 0 && minCosNum <= 10 && minCosDen <= 10,
      "threshold must be a small non-negative rational (overflow bound)")
    val p = probes
      .select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pq"))
      .withColumn("n2p", dotQ(col("pq"), col("pq")))
    val c = corpus
      .select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cq"))
      .withColumn("n2c", dotQ(col("cq"), col("cq")))
    // corpus streamed / probes broadcast — the knnBrute parallelism rule
    c.crossJoin(broadcastProbes(p, "radiusSearch"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("dot", dotQ(col("pq"), col("cq")))
      .filter(col("dot") >= 0 &&
        col("dot") * col("dot") * lit(minCosDen * minCosDen) >=
          lit(minCosNum * minCosNum) * col("n2p") * col("n2c"))
      .select(col("probe_id"), col("neighbor_id"),
        (col("dot").cast("double") /
          (sqrt(col("n2p").cast("double")) * sqrt(col("n2c").cast("double"))))
          .as("sim"))
  }

  /** Default hyperplane count. Buckets ≈ 2^planes: pick ~log2(corpus /
    * desired-candidates) — 4 bits ⇒ ~corpus/16 candidates per probe. More
    * planes = finer buckets = faster but lower recall (multi-probe or
    * multiple tables recover it; single-table kept here for clarity).
    */
  val NumPlanes = 4

  /** Deterministic ±1 hyperplane weight for (plane, dim): parity of the first
    * hex digit of md5("p_i") — the same portable md5 hash family as TextOps.
    * Computed ONCE driver-side and embedded as literal arrays: these are
    * constants, and evaluating md5 per (row × dim × plane) costs 2M hashes
    * per 2k vectors for no reason.
    */
  def planeWeightValue(plane: Int, dim: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"${plane}_$dim".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 0) 1L else -1L
  }

  /** LSH bucket id from plane ids [first, first+count): local bit j =
    * [Σ_i w(first+j, i)·q_i ≥ 0]. Weights are literal arrays (constant-folded
    * into the plan); maxDims bounds the embedded table (128 covers typical
    * embedding widths; raise for wider vectors).
    */
  def lshBucket(vecQ: Column, firstPlane: Int, count: Int,
      maxDims: Int = 128): Column = {
    val bits = (0 until count).map { j =>
      val weights = typedLit((0 until maxDims)
        .map(i => planeWeightValue(firstPlane + j, i)).toArray)
      val dot = aggregate(
        zip_with(vecQ, slice(weights, lit(1), size(vecQ)), (x, w) => x * w),
        lit(0L), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    // vectors wider than the embedded weight table would zip against NULL
    // weights, null the dot, and silently funnel EVERYTHING into bucket 0
    // (all-pairs join). Fail loudly instead.
    when(size(vecQ) > maxDims,
      raise_error(concat(lit(s"lsh_bucket: vector wider than maxDims=$maxDims: "),
        size(vecQ).cast("string"))).cast("long"))
      .otherwise(bits.reduce(_ + _))
  }

  /** Default multi-table layout: 4 tables × 4 planes. Recall that a single
    * hash table misses (a similar pair split by one plane) is recovered by
    * the union over independent tables — the standard LSH recall/cost dial.
    */
  val NumTables = 4

  /** Plane count for dedup: finer than ANN's — identical/near-identical
    * vectors collide in ANY bucket granularity, so 8 planes (256 buckets)
    * shrink candidate sets ~16× with no recall cost at high thresholds.
    */
  val DedupPlanes = 8

  /** Embedding-cosine near-duplicate pairs (the vector-space dedup mode):
    * candidate pairs from the multi-table LSH buckets, exact quantized-cosine
    * rerank, keep pairs ≥ threshold with a < b. Same scale shape as [[annLsh]]
    * — the all-pairs O(n²) never materializes.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = DedupPlanes,
      numTables: Int = NumTables): DataFrame = {
    val q = corpus.select(col(idCol).as("a"), quantize(col(vecCol)).as("qa"))
      .withColumn("n2a", dotQ(col("qa"), col("qa")))
    val buckets = array((0 until numTables).map(t =>
      lshBucket(col("qa"), t * numPlanes, numPlanes)): _*)
    // bucket tuples carry ids only: the candidate-dedup DISTINCT and the
    // bucket join must never shuffle the vectors themselves
    val banded = q.select(col("a"), posexplode(buckets))
      .withColumnRenamed("pos", "htable").withColumnRenamed("col", "bucket")
    val pairs = banded
      .join(banded.select(col("htable"), col("bucket"), col("a").as("b")),
        Seq("htable", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    pairs
      .join(q, Seq("a"))
      .join(q.select(col("a").as("b"), col("qa").as("qb"), col("n2a").as("n2b")),
        Seq("b"))
      .select(col("a"), col("b"),
        cosineQWithNorms(col("qa"), col("qb"), col("n2a"), col("n2b")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Scalar-quantized (SQ8) ANN: the memory-compression path, complementing
    * LSH/IVF's candidate-pruning paths.
    *
    * The corpus is re-quantized to int8-range codes with ONE global scale
    * (max |component|, a one-row broadcast): code_i = ⌊q_i·127 / maxabs⌋.
    * Candidate generation scores CODES (cheap integer dots over data 8×
    * narrower than the fixed-point vectors), keeps the top `candidates` per
    * probe, and only those fetch their full-precision vectors for the exact
    * quantized-cosine rerank. At 100 TB the code table is the only thing the
    * scan touches — full vectors live in a side table read O(probes·C) times.
    *
    * Determinism: every step is integer math or a division whose floor is
    * exact in double (|numerator| ≤ 2^21 ⇒ quotient error ≪ distance to the
    * next integer unless exact), and both orderings tie-break on the id —
    * so the result is reproducible across engines/partitionings, and the
    * DuckDB oracle replays it verbatim (vec08).
    */
  def annSq8(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, candidates: Int = 16): DataFrame = {
    val cq = corpus.select(col(idCol).as("neighbor_id"),
        quantize(col(vecCol)).as("cq"))
      .withColumn("n2c", dotQ(col("cq"), col("cq")))
    val pq = probes.select(col(idCol).as("probe_id"),
        quantize(col(vecCol)).as("pq"))
      .withColumn("n2p", dotQ(col("pq"), col("pq")))
    // global scale from the CORPUS (the side whose stats you train on)
    val scale = cq.agg(max(array_max(transform(col("cq"), x => abs(x)))).as("m"))
    def codes(df: DataFrame, vq: String, out: String) =
      df.crossJoin(broadcast(scale))
        .select(df.columns.map(col) :+
          transform(col(vq), x => floor((x * 127).cast("double") / col("m"))
            .cast("long")).as(out): _*)
    val cCodes = codes(cq, "cq", "cc").select("neighbor_id", "cc")
    val pCodes = codes(pq, "pq", "pc").select("probe_id", "pc")
    // corpus streamed / probes broadcast — the knnBrute parallelism rule
    val approx = cCodes.crossJoin(broadcastProbes(pCodes, "annSq8"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        dotQ(col("pc"), col("cc")).as("ad"))
    val wc = Window.partitionBy(col("probe_id"))
      .orderBy(col("ad").desc, col("neighbor_id"))
    val cand = approx.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= candidates)
      .select("probe_id", "neighbor_id")
    val scored = cand
      .join(pq, Seq("probe_id"))
      .join(cq, Seq("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosineQWithNorms(col("pq"), col("cq"), col("n2p"), col("n2c")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** SQ8 QUANTIZATION-ERROR REPORT — per vector, the exact integer
    * reconstruction error of [[annSq8]]'s byte quantization: scaling both
    * sides by 127 keeps everything integral (qv·127 vs code·m), so
    * err = Σ(qv_i·127 − c_i·m)² is a BIGINT and the relative error one
    * final IEEE divide by 127²·‖qv‖². The decide-the-compression-level
    * artifact: if rel_err is tiny, ship SQ8 (4× smaller scans); if not,
    * spend PQ's training. One broadcast scale + one projection pass.
    */
  def sq8ErrorReport(corpus: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    val cq = corpus.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
    val scale = cq.agg(max(array_max(transform(col("qv"), x => abs(x)))).as("m"))
    cq.crossJoin(broadcast(scale))
      .select(col("id"),
        transform(col("qv"), x => floor((x * 127).cast("double") / col("m"))
          .cast("long")).as("c"), col("qv"), col("m"))
      .select(col("id"),
        aggregate(zip_with(col("qv"), col("c"),
            (x, cc) => (x * 127 - cc * col("m")) * (x * 127 - cc * col("m"))),
          lit(0L), (acc, x) => acc + x).as("err"),
        dotQ(col("qv"), col("qv")).as("_n2"))
      .select(col("id"), col("err"),
        (col("err").cast("double") /
          (lit(127.0 * 127.0) * col("_n2").cast("double"))).as("rel_err"))
  }

  /** ANN: candidates share the probe's bucket in ANY of the hash tables;
    * rerank by exact quantized cosine over the candidate union, keep top-k.
    *
    * Scale shape: signatures are a narrow projection (no shuffle); the only
    * shuffle is the (table, bucket) equi-join — O(corpus·tables) rows of
    * (id, bucket) — and each probe then scores ~tables·corpus/2^planes
    * candidates instead of the whole corpus.
    */
  def annLsh(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int = NumPlanes,
      numTables: Int = NumTables): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vq: String): DataFrame = {
      val buckets = array((0 until numTables).map(t =>
        lshBucket(col(vq), t * numPlanes, numPlanes)): _*)
      df.select(col(id), col(vq), posexplode(buckets))
        .withColumnRenamed("pos", "htable").withColumnRenamed("col", "bucket")
    }
    val cq = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("cq"))
      .withColumn("n2c", dotQ(col("cq"), col("cq")))
    val pq = probes.select(col(idCol).as("probe_id"),
      quantize(col(vecCol)).as("pq"))
      .withColumn("n2p", dotQ(col("pq"), col("pq")))
    val c = withBuckets(cq.select("neighbor_id", "cq"), "neighbor_id", "cq").drop("cq")
    val p = withBuckets(pq.select("probe_id", "pq"), "probe_id", "pq").drop("pq")
    val scored = p.join(c, Seq("htable", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))
      .distinct() // candidate may collide in several tables — score once
      .join(pq, Seq("probe_id"))
      .join(cq, Seq("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosineQWithNorms(col("pq"), col("cq"), col("n2p"), col("n2c")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** MULTI-PROBE LSH — recall recovery WITHOUT more hash tables: each
    * probe additionally checks the buckets at Hamming distance 1 from its
    * own (one hyperplane bit flipped — the neighboring buckets a
    * borderline vector most likely fell into, Lv et al.'s multi-probe
    * idea). Candidates ≈ (1 + planes)× the single-probe set from the SAME
    * index — the memory/recall trade runs on the query side instead of
    * multiplying stored tables. Corpus side is untouched; only probe rows
    * fan out (probes ≪ corpus). Exact-cosine rerank as always.
    */
  def annLshMultiProbe(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int = NumPlanes,
      numTables: Int = NumTables): DataFrame = {
    val cq = corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("cq"))
      .withColumn("n2c", dotQ(col("cq"), col("cq")))
    val pq = probes.select(col(idCol).as("probe_id"),
      quantize(col(vecCol)).as("pq"))
      .withColumn("n2p", dotQ(col("pq"), col("pq")))
    val cBuckets = cq.select(col("neighbor_id"), posexplode(
        array((0 until numTables).map(t =>
          lshBucket(col("cq"), t * numPlanes, numPlanes)): _*)))
      .withColumnRenamed("pos", "htable").withColumnRenamed("col", "bucket")
    // probe side: home bucket + each one-bit flip
    val pHome = pq.select(col("probe_id"), posexplode(
        array((0 until numTables).map(t =>
          lshBucket(col("pq"), t * numPlanes, numPlanes)): _*)))
      .withColumnRenamed("pos", "htable").withColumnRenamed("col", "_home")
    val pProbes = pHome.select(col("probe_id"), col("htable"),
        explode(array(lit(0L) +: (0 until numPlanes)
          .map(j => lit(1L << j)): _*)).as("_flip"))
      .join(pHome, Seq("probe_id", "htable"))
      .select(col("probe_id"), col("htable"),
        col("_home").bitwiseXOR(col("_flip")).as("bucket"))
      .distinct()
    val scored = pProbes.join(cBuckets, Seq("htable", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"))
      .distinct()
      .join(pq, Seq("probe_id"))
      .join(cq, Seq("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosineQWithNorms(col("pq"), col("cq"), col("n2p"), col("n2c")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    * method): coarse k-means clustering — [[IvfIndex]]'s deterministic
    * quantized Lloyd, reused as-is — then within-cluster pairwise cosine.
    * A vector is a semantic duplicate iff a LOWER-id member of its cluster
    * matches at ≥ threshold; its reported representative is the smallest
    * such id. Both rules are total-order tie-free, so the output is
    * identical on any engine and any partitioning.
    *
    * Returns (idCol, dup_of, cell) — one row per duplicate.
    *
    * Scale shape: the clustering IS the pruning structure. Pair generation
    * is ONE equi-join on cell (vectors ship once, into their own cell
    * bucket; no cross-cell pair ever materializes), cost Σ|cell|². The
    * lever is nLists ∝ corpus / target-cell-size — exactly SemDeDup's own
    * knob; the embedding-LSH alternative for unclustered corpora is
    * [[nearDupPairs]].
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nLists: Int = 16, iters: Int = 2): DataFrame =
    semanticDedupIndexed(IvfIndex.build(corpus, idCol, vecCol, nLists, iters),
      idCol, threshold)

  /** [[semanticDedup]] over a PREBUILT (possibly loaded/appended) index —
    * the train-once path: at scale the clustering already exists on disk
    * (IvfIndex.save), and dedup is one join over its assignment.
    */
  def semanticDedupIndexed(index: IvfIndex.Index, idCol: String,
      threshold: Double): DataFrame = {
    val assigned = index.assigned
    val a = assigned.select(col("cell"), col("neighbor_id").as("a"),
      col("cq").as("qa"), col("n2c").as("n2a"))
    val b = assigned.select(col("cell"), col("neighbor_id").as("b"),
      col("cq").as("qb"), col("n2c").as("n2b"))
    a.join(b, Seq("cell")).filter(col("a") < col("b"))
      .filter(cosineQWithNorms(col("qa"), col("qb"),
        col("n2a"), col("n2b")) >= threshold)
      .groupBy(col("b"), col("cell"))
      .agg(min(col("a")).as("dup_of"))
      .select(col("b").as(idCol), col("dup_of"),
        col("cell").cast("bigint").as("cell"))
  }

  /** Cross-corpus SEMANTIC decontamination: eval/benchmark vectors whose
    * cosine against some training vector reaches `threshold` — the
    * embedding-space analog of [[Dedup.crossCorpusNearDups]]'s LSH text path,
    * catching paraphrased leaks that share no n-gram.
    *
    * Convenience form that trains the coarse quantizer on the training
    * corpus; prefer [[semanticDecontaminateIndexed]] with a persisted
    * [[IvfIndex]] — the SAME index built once for ANN search powers
    * decontamination, and at 100 TB the clustering already exists on disk.
    */
  def semanticDecontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      vecCol: String, threshold: Double, nLists: Int = 16, nProbe: Int = 3,
      iters: Int = 2): DataFrame =
    semanticDecontaminateIndexed(
      IvfIndex.build(train, idCol, vecCol, nLists, iters),
      eval, idCol, vecCol, threshold, nProbe)

  /** [[semanticDecontaminate]] over a prebuilt index. Returns one row per
    * contaminated `(eval_id, train_id)` pair with its cell and exact
    * quantized cosine.
    *
    * Scale shape: the train side is already cell-partitioned by the index;
    * each eval vector probes only its `nProbe` nearest cells (the
    * [[IvfIndex.searchIndex]] probe rule — centroids broadcast, never a
    * corpus-wide join), so the candidate set is Σ|probed cell| per eval
    * vector instead of |train|. Eval sets are tiny next to a 100 TB train
    * corpus, so the probe-cell frame broadcasts; a verbatim leak always
    * lands in its twin's cell (identical vectors assign identically), and
    * near-threshold leaks are caught within the probed cells — the same
    * nProbe recall trade the ANN search path documents.
    */
  def semanticDecontaminateIndexed(index: IvfIndex.Index, eval: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nProbe: Int = 3, probeSuperCount: Int = 1): DataFrame = {
    val eq = eval.select(col(idCol).as("eval_id"),
        quantize(col(vecCol)).as("pq"))
      .withColumn("n2p", dotQ(col("pq"), col("pq")))
    // probeSuperCount = 1: exact probe, O(|eval|·nLists) — right while
    // nLists is small (every oracle-checked scale). > 1: two-level probe
    // through the assignment hierarchy, O(|eval|·(1+superProbe)·√nLists) —
    // the scale path once nLists grows with the corpus; at the 100× soak
    // the exact probe was vec13's dominant term (~10⁹ l2 ops), not the
    // assign. Exact-duplicate recall is preserved by construction (an
    // identical probe descends to its twin's own cell).
    val probeCells =
      if (probeSuperCount > 1)
        IvfIndex.probeCellsTwoLevel(
          eq.select(col("eval_id").as("id"), col("pq").as("qv")),
          index.centroids, nProbe, probeSuperCount,
          knownCentroidCount = index.nCentroids)
          .select(col("id").as("eval_id"), col("cell"))
      else {
        // exact probe broadcasts the full centroid set — same budget
        // refusal as IvfIndex.probeCells (memoized count, no extra job)
        IvfIndex.requireCentroidsCollectable(eq.sparkSession,
          index.nCentroids, "semanticDecontaminateIndexed exact probe")
        eq.crossJoin(broadcast(index.centroids))
        .select(col("eval_id"), col("cell"),
          IvfIndex.l2Q(col("pq"), col("cv")).as("d2"))
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("eval_id")).orderBy(col("d2"), col("cell"))))
        .filter(col("_rn") <= nProbe)
        .select("eval_id", "cell")
      }
    // JOIN ORDER IS THE SCALE DESIGN HERE: attach the eval vectors to the
    // probe-cell frame FIRST (equi-join on eval_id over O(|eval|·nProbe)
    // rows), THEN explode against the probed cells' corpus rows — the pair
    // relation streams straight into the threshold filter with no further
    // exchange. The reversed order (cells⋈assigned, then ⋈eq) re-keys the
    // EXPLODED pair relation by eval_id, shuffling |eval|·nProbe·|cell|
    // rows that each carry a full quantized vector — measured at the 1000×
    // soak (2M evals × ~1,000 candidates × ~0.5 KB) as a multi-hundred-GB
    // shuffle that exhausted local scratch; after the reorder the heaviest
    // exchange is the probe frame itself, linear in |eval|.
    probeCells.join(eq, Seq("eval_id"))
      .join(index.assigned, Seq("cell"))
      .select(col("eval_id"), col("neighbor_id").as("train_id"),
        col("cell").cast("bigint").as("cell"),
        cosineQWithNorms(col("pq"), col("cq"), col("n2p"), col("n2c"))
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  // ---- random-projection (Johnson–Lindenstrauss) dimensionality reduction --

  /** Deterministic ±1 projection weight for (output dim, input dim) — the
    * [[planeWeightValue]] md5-parity family under an `rp` namespace, so
    * projection matrices and LSH hyperplanes never alias. A ±1 (Achlioptas)
    * JL matrix preserves pairwise inner products/distances in expectation
    * with variance O(1/kOut); it is the database-JL construction precisely
    * because the "matrix" is a pure function — nothing is stored or
    * shipped, every engine regenerates it bit-identically.
    */
  def rpWeightValue(outDim: Int, dim: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"rp${outDim}_$dim".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 0) 1L else -1L
  }

  /** Project a quantized vector to `kOut` dims: r_k = Σ_i q_i · w(k,i),
    * exact integer arithmetic throughout. Weights are literal arrays
    * (constant-folded into codegen — no lookup join, no stored matrix).
    * Same too-wide guard as [[lshBucket]]: silence would zero the tail.
    */
  def randomProject(vecQ: Column, kOut: Int, maxDims: Int = 128): Column = {
    val outs = (0 until kOut).map { k =>
      val weights = typedLit((0 until maxDims).map(i => rpWeightValue(k, i)).toArray)
      aggregate(
        zip_with(vecQ, slice(weights, lit(1), size(vecQ)), (x, w) => x * w),
        lit(0L), (acc, x) => acc + x)
    }
    when(size(vecQ) > maxDims,
      raise_error(concat(lit(s"random_project: vector wider than maxDims=$maxDims: "),
        size(vecQ).cast("string"))).cast("array<bigint>"))
      .otherwise(array(outs: _*))
  }

  /** ANN in REDUCED space with exact full-dimension rerank — [[annSq8]]'s
    * two-stage shape with JL projection as the compressor: candidates are
    * ranked by the exact integer dot product of the kOut-dim projections
    * (64→16 dims ⇒ 4× less arithmetic and scan bandwidth in the O(probes ×
    * corpus) stage), then the top `candidates` are re-scored with the
    * full-dimension quantized cosine. At 100 TB the reduced vectors are
    * what an IVF/LSH index would store and scan — compose with
    * [[IvfIndex]] pruning exactly as vec12 composes PQ; this operator pins
    * the projection + rerank algebra.
    */
  def annRandomProject(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, kOut: Int = 16, candidates: Int = 16): DataFrame = {
    val cq = corpus.select(col(idCol).as("neighbor_id"),
        quantize(col(vecCol)).as("cq"))
      .withColumn("n2c", dotQ(col("cq"), col("cq")))
    val pq = probes.select(col(idCol).as("probe_id"),
        quantize(col(vecCol)).as("pq"))
      .withColumn("n2p", dotQ(col("pq"), col("pq")))
    val cr = cq.select(col("neighbor_id"), randomProject(col("cq"), kOut).as("cr"))
    val pr = pq.select(col("probe_id"), randomProject(col("pq"), kOut).as("pr"))
    // corpus streamed / probes broadcast — the knnBrute parallelism rule
    val approx = cr.crossJoin(broadcastProbes(pr, "annRandomProject"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        dotQ(col("pr"), col("cr")).as("ad"))
    val wc = Window.partitionBy(col("probe_id"))
      .orderBy(col("ad").desc, col("neighbor_id"))
    val cand = approx.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= candidates)
      .select("probe_id", "neighbor_id")
    val scored = cand
      .join(pq, Seq("probe_id"))
      .join(cq, Seq("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosineQWithNorms(col("pq"), col("cq"), col("n2p"), col("n2c")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** RECALL@K EVALUATION — the index-quality harness every ANN deployment
    * runs before trusting an approximate search path: per probe, the
    * fraction of the EXACT top-k the approximate search recovered. Both
    * inputs are (probe_id, neighbor_id) top-k frames (rank columns
    * ignored); the exact side anchors, so probes the approximate path
    * missed entirely still report recall 0. Deterministic because both
    * search paths here are (quantized integer math + id tie-breaks), which
    * is what makes recall itself hash-exact and oracle-able — most systems
    * can only eyeball this number.
    *
    * Scale shape: one equi-join on (probe, neighbor) over two k·probes
    * frames + one grouped count — evaluation cost is independent of corpus
    * size once the two searches have run.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be ≥ 1: $k")
    val hit = approx.select(col("probe_id"), col("neighbor_id"), lit(1L).as("_hit"))
    exact.select(col("probe_id"), col("neighbor_id"))
      .join(hit, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("probe_id"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
      .select(col("probe_id"), col("n_hit"),
        (col("n_hit").cast("double") / k).as("recall"))
  }

  /** MAXIMAL MARGINAL RELEVANCE rerank — the diversity-aware top-k a
    * retrieval pipeline puts between ANN candidates and the consumer, so k
    * near-duplicate neighbors don't crowd out distinct relevant results:
    * greedily pick argmax of `λ·sim(q,c) − (1−λ)·max_{s∈picked} sim(c,s)`
    * with λ = 1/2 (halving is EXACT in binary floating point, so scores are
    * engine-identical; ties break on the id).
    *
    * Scale shape: the expensive part is candidate generation (swap
    * [[knnBrute]] for any index search at 100 TB); the greedy loop runs
    * over `candidates`-sized per-probe sets — the candidate pair-sim frame
    * is O(probes·candidates²) narrow rows and each of the k rounds is one
    * window argmax + one equi-join, all partitioned by probe. The
    * running max-sim-to-picked is maintained incrementally (`greatest`),
    * never rescanning the picked set.
    */
  def mmrRerank(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int = 3, candidates: Int = 8): DataFrame = {
    require(k >= 1 && candidates >= k, s"need candidates ≥ k ≥ 1: $candidates/$k")
    val cand = knnBrute(probes, corpus, idCol, vecCol, candidates)
    val qs = corpus.select(col(idCol).as("_nid"), quantize(col(vecCol)).as("_q"))
    val withQ = cand.join(qs, col("neighbor_id") === col("_nid"))
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("_q"))
    val pairs = withQ.select(col("probe_id"), col("neighbor_id").as("na"),
        col("_q").as("qa"))
      .join(withQ.select(col("probe_id").as("_pp"), col("neighbor_id").as("nb"),
        col("_q").as("qb")), col("probe_id") === col("_pp") && col("na") =!= col("nb"))
      .select(col("probe_id"), col("na"), col("nb"),
        cosineQ(col("qa"), col("qb")).as("psim"))
    var remaining = withQ.select(col("probe_id"), col("neighbor_id"), col("sim"))
      .withColumn("mx", lit(null).cast("double"))
    var picks: DataFrame = null
    for (i <- 1 to k) {
      val score = when(col("mx").isNull, col("sim"))
        .otherwise(lit(0.5) * col("sim") - lit(0.5) * col("mx"))
      val ranked = remaining.withColumn("_score", score)
        .withColumn("_rn", row_number().over(Window.partitionBy(col("probe_id"))
          .orderBy(col("_score").desc, col("neighbor_id"))))
      val pick = ranked.filter(col("_rn") === 1)
        .select(col("probe_id"), lit(i).as("pick"), col("neighbor_id"), col("sim"))
      picks = if (picks == null) pick else picks.unionByName(pick)
      if (i < k) {
        // alias the self-derived key: pickN's probe_id carries the SAME
        // attribute id as remaining's (both descend from withQ), and a
        // usingColumns join on identical ids logs Spark's trivially-true-
        // predicate warning — which would mask a real accidental cross join
        // if it ever became routine in the bench tail
        val pickN = pick.select(col("probe_id").as("_pick_pid"),
          col("neighbor_id").as("_picked"))
        remaining = remaining
          .join(pickN, col("probe_id") === col("_pick_pid"))
          .drop("_pick_pid")
          .filter(col("neighbor_id") =!= col("_picked"))
          .join(pairs.withColumnRenamed("probe_id", "_pp"),
            col("_pp") === col("probe_id") && col("na") === col("neighbor_id") &&
              col("nb") === col("_picked"))
          .select(col("probe_id"), col("neighbor_id"), col("sim"),
            greatest(col("mx"), col("psim")).as("mx"))
      }
    }
    picks
  }

  /** CROSS-MODAL ALIGNMENT SCORING (the CLIP-score filter shape): each
    * (caption, image-embedding) pair gets a cosine alignment score, and the
    * curation keep-flag is a threshold on it — the step that drops
    * mis-captioned pairs from a multimodal training set. The real system
    * embeds the caption with a text tower; this engine-portable stand-in
    * projects the caption to the embedding space as a hashed bag-of-words:
    * token t contributes ±1 (md5-parity sign) to dimension hex32(t) mod
    * dims — deterministic, integer, and restatable in SQL, so the whole
    * path hash-matches while keeping the exact production dataflow (project
    * text → join embedding on the pair id → cosine → band). Pairs whose
    * text vector cancels to zero norm score NULL (no direction to compare).
    *
    * Scale shape: token explode + two partial-agg'd hash aggregations build
    * the text vectors (O(token occurrences) shuffle, 64-long rows out);
    * ONE id equi-join against the embedding side; score is per-row math.
    */
  /** The hashed-BoW text projection behind [[crossModalAlign]], exposed so
    * retrieval-style consumers (mm16's recall eval) can score one text
    * vector against MANY images. Returns (idCol, tv ARRAY<LONG>).
    */
  def crossModalTextVectors(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 64, salt: Int = 21): DataFrame = {
    val h = TextOps.hex32(col("_tok"), salt)
    val contrib = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("_tok"))
      .select(col(idCol), (h % dims).cast("int").as("_dim"),
        // integer h div dims: h < 2^32 so the double division is exact far
        // beyond the 52-bit mantissa; cast truncates = floor for h ≥ 0
        when(((h / dims).cast("long") % 2) === 0, 1L).otherwise(-1L).as("_w"))
    contrib.groupBy(col(idCol), col("_dim"))
      .agg(sum(col("_w")).as("_v"))
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("_dim"), col("_v"))))
        .as("_m"))
      .select(col(idCol),
        transform(sequence(lit(0), lit(dims - 1)),
          i => coalesce(element_at(col("_m"), i), lit(0L))).as("tv"))
  }

  def crossModalAlign(docs: DataFrame, idCol: String, textCol: String,
      emb: DataFrame, embIdCol: String, vecCol: String,
      dims: Int = 64, salt: Int = 21): DataFrame = {
    val tv = crossModalTextVectors(docs, idCol, textCol, dims, salt)
    val iv = emb.select(col(embIdCol).as(idCol), quantize(col(vecCol)).as("qv"))
    val n2t = dotQ(col("tv"), col("tv"))
    val n2v = dotQ(col("qv"), col("qv"))
    tv.join(iv, Seq(idCol))
      .select(col(idCol).as("pair_id"),
        when(n2t === 0 || n2v === 0, lit(null).cast("double"))
          .otherwise(dotQ(col("tv"), col("qv")).cast("double") /
            (sqrt(n2t.cast("double")) * sqrt(n2v.cast("double"))))
          .as("score"))
      .withColumn("aligned", col("score") >= 0)
  }

  /** BINARY (sign-bit) QUANTIZATION — 1 bit per dimension, packed into two
    * 32-bit halves (lo = dims 1..32, hi = dims 33..64) carried as longs so
    * no sign-bit shift arithmetic differs across engines (mm06's packing
    * discipline). A 64-dim float vector becomes 8 bytes: a 32× scan-set
    * reduction, and Hamming distance — `bit_count(lo⊕lo) + bit_count(hi⊕hi)`
    * — is a handful of SIMD-able integer ops per comparison. This is the
    * coarsest rung of the quantization ladder (float → SQ8 (vec08) → PQ
    * (vec10) → binary), the one production systems use for the *first*
    * filter pass over billions of vectors; exact-cosine rerank of the
    * Hamming top-`rerankN` restores ranking quality, and sign bits of the
    * quantized vector are deterministic, so the whole path hash-matches.
    * Bit convention: dimension `from+i` sets bit `i` iff q_{from+i} ≥ 0.
    */
  def signBits(vecQ: Column, from: Int): Column =
    (0 until 32).map(i =>
      when(element_at(vecQ, from + i + 1) >= 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)

  /** (id, lo, hi, qv, n2) binary signature table for a (idCol, vecCol)
    * corpus — the persisted artifact a binary-ANN deployment scans.
    */
  def binarySignatures(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = quantize(col(vecCol))
    df.select(col(idCol).as("id"), q.as("qv"))
      .select(col("id"), col("qv"),
        signBits(col("qv"), 0).as("lo"), signBits(col("qv"), 32).as("hi"),
        dotQ(col("qv"), col("qv")).as("n2"))
  }

  /** Hamming-prefiltered top-k: scan the 8-byte signatures for each probe's
    * `rerankN` nearest by Hamming (ties → id), exact-cosine rerank those to
    * the final `k`. The signature scan replaces the full-vector scan of
    * [[knnBrute]]; full vectors are touched only for the rerankN candidate
    * rows — at 100 TB the float corpus stays on disk (or composes with IVF
    * cell pruning) while signatures fit in memory.
    */
  def binarySearch(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, rerankN: Int): DataFrame = {
    val sig = binarySignatures(corpus, idCol, vecCol)
    val p = binarySignatures(probes, idCol, vecCol)
      .select(col("id").as("probe_id"), col("lo").as("plo"),
        col("hi").as("phi"), col("qv").as("pq"), col("n2").as("pn2"))
    val hamming =
      expr("bit_count(plo ^ lo) + bit_count(phi ^ hi)")
    // corpus signatures streamed / probe signatures broadcast — the
    // knnBrute parallelism rule
    val cand = sig.crossJoin(broadcastProbes(p, "binarySearch"))
      .filter(col("probe_id") =!= col("id"))
      .select(col("probe_id"), col("id").as("neighbor_id"),
        hamming.as("hamming"), col("pq"), col("pn2"),
        col("qv"), col("n2"))
      .withColumn("_crank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("hamming"), col("neighbor_id"))))
      .filter(col("_crank") <= rerankN)
    cand
      .select(col("probe_id"), col("neighbor_id"), col("hamming"),
        cosineQWithNorms(col("pq"), col("qv"), col("pn2"), col("n2")).as("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** MMR diversified top-k, SINGLE-EXCHANGE variant — same greedy
    * semantics as [[mmrRerank]] (λ = 1/2 exact halving, lowest-id
    * tie-break; equivalence spec-pinned), different execution contract:
    * [[mmrRerank]] composes k dataflow rounds (one window argmax + one
    * equi-join per pick — fine for the k≈3 "top of the page" shape, but
    * the plan grows linearly in k), while this variant re-ranks each
    * probe's candidate set INSIDE one flatMapGroups pass — ONE shuffle
    * total for ANY k, the right shape for the training-data sampling /
    * RAG-context k of 10–50.
    *
    * The per-probe working set is O(candidates²) integer arithmetic BY
    * CONTRACT (candidates is a re-rank budget, typically ≤ 100), fully
    * parallel across probes, no driver round-trip. Candidate generation
    * stays the DISTRIBUTED top-N cosine search — brute here for
    * exactness; IVF/PQ searches honor the same (probe_id, cand_id, sim)
    * contract and swap in unchanged at corpus scale.
    *
    * Determinism: scores are functions of quantized integer dot products
    * through correctly-rounded sqrt/divide and exact 0.5· halvings —
    * bit-identical across engines, so the gate hash-compares the doubles
    * (first pick's score is λ·rel over the empty selected set; ties break
    * on the lower candidate id, matching
    * `ROW_NUMBER() OVER (ORDER BY score DESC, cand_id)`).
    */
  def mmrTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, candidates: Int, k: Int): DataFrame = {
    val spark = probes.sparkSession
    import spark.implicits._
    val cand = knnBrute(probes, corpus, idCol, vecCol, candidates)
      .select(col("probe_id").cast("long"),
        col("neighbor_id").cast("long").as("cand_id"), col("sim").as("rel"))
    val qc = corpus.select(col(idCol).cast("long").as("cand_id"),
      quantize(col(vecCol)).as("qv"))
    cand.join(qc, "cand_id")
      .select(col("probe_id"), col("cand_id"), col("rel"), col("qv"))
      .as[(Long, Long, Double, Array[Long])]
      .groupByKey(_._1)
      .flatMapGroups { (pid, it) =>
        // ascending id order + strict > comparisons = lowest-id tie-break
        val cs = it.map { case (_, id, rel, qv) => (id, rel, qv) }
          .toArray.sortBy(_._1)
        val n2 = cs.map(c => c._3.map(x => x * x).sum)
        def cos(i: Int, j: Int): Double = {
          val a = cs(i)._3; val b = cs(j)._3
          var d = 0L; var t = 0
          while (t < a.length) { d += a(t) * b(t); t += 1 }
          d.toDouble / (math.sqrt(n2(i).toDouble) * math.sqrt(n2(j).toDouble))
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, Long, Double)]
        while (selected.length < math.min(k, cs.length)) {
          var bestIdx = -1; var bestScore = Double.NegativeInfinity
          for (i <- cs.indices if !selected.contains(i)) {
            val score =
              if (selected.isEmpty) 0.5 * cs(i)._2
              else {
                var maxS = Double.NegativeInfinity
                for (j <- selected) { val s = cos(i, j); if (s > maxS) maxS = s }
                0.5 * cs(i)._2 - 0.5 * maxS
              }
            if (score > bestScore) { bestScore = score; bestIdx = i }
          }
          selected += bestIdx
          out += ((pid, selected.length, cs(bestIdx)._1, bestScore))
        }
        out.iterator
      }
      .toDF("probe_id", "rank", "cand_id", "score")
  }
}
