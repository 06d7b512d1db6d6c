package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-Flat ANN — the inverted-file alternative to [[Similarity.annLsh]]:
  * a coarse quantizer (k-means over quantized vectors) partitions the corpus
  * into `nLists` cells; a probe searches only its `nProbe` nearest cells.
  *
  * Scale shape: training is `iters` passes of (broadcast centroids → assign →
  * partial-agg mean); the index is one extra int column on the corpus;
  * search is a broadcast of nLists centroids + a cell-pruned rerank —
  * candidates ≈ corpus · nProbe / nLists instead of all-pairs.
  *
  * Determinism: centroids seed from evenly-spaced corpus ids (no RNG),
  * assignment distance is EXACT integer L2 over quantized vectors, centroid
  * updates are floor-divided integer means — so the index is reproducible
  * across runs/partitionings (same property as the rest of the similarity
  * stack; rationale in Similarity's scaladoc).
  */
object IvfIndex {

  /** Exact integer squared-L2 between two quantized vectors — native fused
    * loop ([[graft.functions.L2QExpr]]); the Lloyd assign evaluates it
    * |corpus| × nLists times per pass, where the per-element HOF lambda
    * overhead used to dominate the whole index build.
    */
  def l2Q(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.l2_q(a, b)

  /** Train `nLists` centroids (quantized, integer components).
    *
    * Empty-cell handling: a centroid whose cell loses all members in a Lloyd
    * iteration produces no mean row; the previous centroid is KEPT (left-join
    * + coalesce), so the output always has exactly `nLists` rows — a shrunken
    * centroid set would silently distort nProbe coverage at search time.
    *
    * The trained set is collected to the driver and re-created as a local
    * DataFrame: it is `nLists` rows by construction (bounded, small), and the
    * two downstream consumers (corpus assignment + probe-cell selection)
    * would otherwise each re-execute the whole iterative training lineage.
    * At cluster scale this is also the natural point to persist the index.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String, nLists: Int,
      iters: Int = 2): DataFrame =
    trainQ(corpus.select(col(idCol).as("id"),
      Similarity.quantize(col(vecCol)).as("qv")), nLists, iters)

  /** [[train]] over an ALREADY-quantized `(id, qv)` relation — the entry
    * point for callers whose quantization is not the plain elementwise one
    * (PqIndex trains on unit-sphere-renormalized subspace slices).
    */
  def trainQ(qIn: DataFrame, nLists: Int, iters: Int = 2): DataFrame =
    trainQWith(qIn, nLists, iters) { (q, c, nCent) =>
      // the exact Lloyd assignment broadcasts the full centroid set every
      // iteration — past the collect budget that must refuse (the guard
      // discipline), not OOM: huge-nLists corpora train via buildScaled,
      // whose two-level seam stays distributed past the guard
      requireCentroidsCollectable(q.sparkSession, nCent,
        "trainQ exact Lloyd assignment")
      assign(q, c)
    }

  /** [[trainQ]] with a pluggable per-iteration assignment — the seam that
    * lets [[buildScaled]] run Lloyd itself through [[assignTwoLevel]]
    * (approximate k-means, the standard large-nLists move: each iteration
    * is O(corpus · 2√nLists) instead of O(corpus · nLists); centroids are
    * a coarse quantizer, so a coarser assignment during training perturbs
    * boundaries it was already free to draw differently).
    */
  private def trainQWith(qIn: DataFrame, nLists: Int, iters: Int)(
      assignFn: (DataFrame, DataFrame, Long) => DataFrame): DataFrame = {
    val spark0 = qIn.sparkSession
    import spark0.implicits._
    val distributed = nLists > centroidCollectGuard(spark0)
    // cache the quantized training set across Lloyd passes (the k-means
    // discipline — every iteration re-reads it; MEMORY_AND_DISK spills
    // rather than OOMs when the corpus outgrows executor memory). Released
    // before returning: train materializes its result below.
    val q = qIn.select(col("id"), col("qv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic seeding: the nLists lowest ids (Lloyd iterations wash
    // out seed placement). A corpus smaller than nLists seeds one cell per
    // row (a valid, smaller index) instead of failing the invariant below.
    // Below the guard the ≤nLists seeds are materialized locally once — the
    // Lloyd lineage then starts from a local relation instead of re-running
    // the TakeOrdered inside every downstream action. ABOVE the guard the
    // seed set itself is O(corpus) under a constant-cell-size sizing
    // policy, so it never touches the driver: GlobalRank's two-level
    // decomposition ranks by id distributedly (same nLists-lowest-ids set,
    // same cell numbering — rank i+1 ⇔ i-th lowest id) and the seed
    // relation is pinned with localCheckpoint instead of a collect.
    var centroids =
      if (!distributed) {
        val seedLocal = q.orderBy("id").limit(nLists)
          .select(col("qv")).as[Seq[Long]].collect()  // sorted by id
        spark0.createDataset(
          seedLocal.zipWithIndex.map { case (v, i) => (i, v) }.toSeq)
          .toDF("cell", "cv")
      } else {
        GlobalRank.rowNumber(q.toDF(), Seq(col("id")), "_rn")
          .filter(col("_rn") <= nLists)
          .select((col("_rn") - 1).cast("int").as("cell"), col("qv").as("cv"))
          .localCheckpoint()
      }
    val effLists = centroids.count() // ≤ nLists rows (min(corpus, nLists))
    for (_ <- 1 to iters) {
      // the row count is invariant across iterations (the left-join +
      // coalesce below keeps every cell), so effLists threads into the
      // assignment seam as the known centroid count — the seam's guard
      // check never re-counts (and so never re-executes) the growing
      // per-iteration centroid lineage on the collected path
      val assigned = assignFn(q, centroids, effLists)
      val means = assigned
        .select(col("cell"), posexplode(col("qv")))
        .groupBy(col("cell"), col("pos"))
        .agg(expr("sum(col) div count(*)").as("m")) // integral mean: deterministic
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
        .select(col("cell"), expr("transform(pairs, p -> p.m)").as("mv"))
      centroids = centroids.join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("mv"), col("cv")).as("cv"))
      // distributed mode: cut the per-iteration lineage — without this,
      // iteration k's plan re-executes every earlier assign (the collected
      // path pays that via its single final collect; here there is none)
      if (distributed) centroids = centroids.localCheckpoint()
    }
    val out =
      if (!distributed) {
        val local = centroids.select(col("cell").cast("int"), col("cv"))
          .as[(Int, Seq[Long])].collect().toSeq
        require(local.size == effLists,
          s"IVF train invariant broken: ${local.size} centroids != $effLists " +
            s"(nLists=$nLists, corpus may be smaller)")
        spark0.createDataset(local).toDF("cell", "cv")
      } else {
        val c = centroids.select(col("cell").cast("int"), col("cv"))
          .localCheckpoint()
        val n = c.count()
        require(n == effLists,
          s"IVF train invariant broken: $n centroids != $effLists " +
            s"(nLists=$nLists, corpus may be smaller)")
        c
      }
    q.unpersist(blocking = false)
    out
  }

  /** Centroid rows the driver will collect/broadcast before the O(nLists)
    * paths refuse and route to (or demand) the distributed twins —
    * `spark.graft.ivf.maxCentroidCollectRows`. The driver-side centroid
    * footprint is nLists · dims · 8 B: at the 1M default and 16–128 dims
    * that is 128 MB–1 GB of broadcast, the practical ceiling. Under the
    * √N sizing discipline (FAISS practice, [[buildScaled]] scaladoc) nLists
    * stays ~10⁵ even at 10¹⁰ vectors and the guard never engages; a
    * constant-cell-size policy (nLists ∝ N) crosses it and silently
    * collecting O(corpus) centroids to the driver is THE scale cliff —
    * hence a routing guard, not advice. Reference analog: the schema
    * cache's whole point is bounded driver-side metadata
    * (ext/schema_cache.c:46–80).
    */
  private[operators] def centroidCollectGuard(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("spark.graft.ivf.maxCentroidCollectRows", "1000000").toLong

  private[operators] def requireCentroidsCollectable(
      spark: org.apache.spark.sql.SparkSession, n: Long, what: String): Unit =
    require(n <= centroidCollectGuard(spark),
      s"$what would collect/broadcast $n centroid rows — above " +
        s"spark.graft.ivf.maxCentroidCollectRows=${centroidCollectGuard(spark)}. " +
        "Use the two-level distributed paths (assignTwoLevelDistributed / " +
        "probeCellsTwoLevelDistributed, auto-routed by assignTwoLevel / " +
        "probeCellsTwoLevel / buildScaled) or size nLists ~ sqrt(N) " +
        "(the FAISS discipline) so the centroid set stays bounded.")

  /** Nearest cell per vector (exact integer L2 to each broadcast centroid).
    * One hash aggregation (`min_by`, partial-agg) — not a window sort.
    */
  def assign(q: DataFrame, centroids: DataFrame): DataFrame = {
    q.crossJoin(broadcast(centroids))
      .select(col("id"), col("qv"), col("cell"), l2Q(col("qv"), col("cv")).as("d2"))
      .groupBy(col("id"))
      .agg(min_by(struct(col("cell"), col("qv")), struct(col("d2"), col("cell"))).as("s"))
      .select(col("id"), col("s.qv").as("qv"), col("s.cell").as("cell"))
  }

  /** TWO-LEVEL assignment — the FAISS-style coarse-within-coarse shape
    * that removes [[assign]]'s O(corpus · nLists) cost when nLists itself
    * scales with the corpus (the constant-cell-size policy): the nLists
    * centroids are grouped into `superCount` SUPER-centroids (a tiny
    * deterministic driver-side Lloyd over the nLists rows — bounded, no
    * job), each vector first picks its nearest super-group
    * (O(superCount) comparisons) and then the exact nearest centroid
    * WITHIN that group (O(nLists/superCount) expected) — O(corpus ·
    * 2·√nLists) total at superCount ≈ √nLists.
    *
    * APPROXIMATE by design: a vector whose true nearest centroid sits in
    * a different super-group assigns to its best in-group centroid
    * instead — the standard IVF trade (assignment was already a coarse
    * quantization; this coarsens the boundary cases), deterministic and
    * partition-invariant like everything else in the stack. Identical
    * vectors still assign identically (it is a pure function of the
    * vector), so verbatim-duplicate detection through the index is
    * unaffected. `superCount = 1` degenerates to EXACT [[assign]]
    * (spec-pinned bit-equality).
    */
  /** Deterministic driver-side grouping of the nLists centroid rows into
    * ≤ `superCount` super-groups: Lloyd in miniature (seed from the k
    * lowest cells, 2 rounds, floor-div integer means, empty super keeps
    * its previous position — the trainQ rules), O(nLists · superCount) on
    * the driver, no Spark job. Shared by [[assignTwoLevel]] (corpus
    * assignment) and [[probeCellsTwoLevel]] (query-side probing), so a
    * vector and an identical probe descend the SAME hierarchy.
    */
  private def superGrouping(local: Seq[(Int, Seq[Long])], superCount: Int)
      : (Vector[Seq[Long]], Map[Int, Int]) = {
    val k = math.min(superCount, local.size)
    def l2(a: Seq[Long], b: Seq[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var supers: Vector[Seq[Long]] = local.take(k).map(_._2).toVector
    var grouping: Map[Int, Int] = Map.empty
    for (_ <- 1 to 2) {
      grouping = local.map { case (cell, cv) =>
        cell -> supers.zipWithIndex.minBy { case (sv, si) => (l2(cv, sv), si) }._2
      }.toMap
      supers = supers.zipWithIndex.map { case (prev, si) =>
        val members = local.filter { case (cell, _) => grouping(cell) == si }
        if (members.isEmpty) prev
        else members.head._2.indices
          .map(d => Math.floorDiv(members.map(_._2(d)).sum, members.size.toLong))
      }
    }
    (supers, grouping)
  }

  /** @param knownCentroidCount the centroid-set size when the caller
    *   already holds it (trainQWith's Lloyd loop, Index.nCentroids) — skips
    *   the guard's count job, which on an uncheckpointed training lineage
    *   re-executed the whole centroid plan once per iteration; -1 counts.
    */
  def assignTwoLevel(q: DataFrame, centroids: DataFrame,
      superCount: Int, knownCentroidCount: Long = -1L): DataFrame = {
    require(superCount >= 1, s"superCount must be ≥ 1: $superCount")
    val spark0 = q.sparkSession
    import spark0.implicits._
    // routing guard: beyond the collect budget the centroid level STAYS
    // distributed (bit-exact twin below) — under a constant-cell-size
    // sizing policy nLists is O(corpus) and collecting it here was the
    // verified next scale cliff (≈150 GB of driver centroids at 10¹⁰
    // vectors). The count is one tiny job against a ≤nLists-row relation,
    // skipped entirely when the caller passes the size down.
    val nCent =
      if (knownCentroidCount >= 0L) knownCentroidCount else centroids.count()
    if (superCount == 1) {
      // the exact-assignment degenerate case broadcasts the FULL centroid
      // set — enforce the same budget the exact probe does (refuse, never
      // silently coarsen: superCount = 1 is a bit-exactness contract)
      requireCentroidsCollectable(spark0, nCent,
        "assignTwoLevel(superCount=1) exact assignment")
      return assign(q, centroids)
    }
    if (nCent > centroidCollectGuard(spark0))
      return assignTwoLevelDistributed(q, centroids, superCount)
    val local = centroids.select(col("cell").cast("int"), col("cv"))
      .as[(Int, Seq[Long])].collect().sortBy(_._1).toSeq
    val (supers, grouping) = superGrouping(local, superCount)
    val superDf = spark0.createDataset(
      supers.zipWithIndex.map { case (sv, si) => (si, sv) })
      .toDF("_super", "scv")
    val centWithSuper = spark0.createDataset(
      local.map { case (cell, cv) => (cell, cv, grouping(cell)) })
      .toDF("cell", "cv", "_super")
    val stage1 = q.crossJoin(broadcast(superDf))
      .select(col("id"), col("qv"), col("_super"),
        l2Q(col("qv"), col("scv")).as("d2"))
      .groupBy(col("id"))
      .agg(min_by(struct(col("_super"), col("qv")),
        struct(col("d2"), col("_super"))).as("s"))
      .select(col("id"), col("s.qv").as("qv"), col("s._super").as("_super"))
    stage1.join(broadcast(centWithSuper), Seq("_super"))
      .select(col("id"), col("qv"), col("cell"),
        l2Q(col("qv"), col("cv")).as("d2"))
      .groupBy(col("id"))
      .agg(min_by(struct(col("cell"), col("qv")),
        struct(col("d2"), col("cell"))).as("s"))
      .select(col("id"), col("s.qv").as("qv"), col("s.cell").as("cell"))
  }

  /** QUERY-SIDE two-level probing: the approximate nearest-`nProbe` CELLS
    * per probe row, found by descending the same centroid hierarchy
    * [[assignTwoLevel]] assigns through — rank the ≤`superCount`
    * super-groups, keep the best `superProbe`, rank ONLY their member
    * cells. This is the scaled twin of the exact
    * `crossJoin(broadcast(centroids))` probe, which is O(|probes|·nLists)
    * and becomes THE dominant term once nLists grows with the corpus
    * (constant-cell-size policy): at the 100× soak vec13's exact probe was
    * ~10⁹ fused l2 ops while its two-level corpus assign was ~6·10⁷. Cost
    * here: O(|probes| · (superCount + superProbe·nLists/superCount)) —
    * with superCount ≈ √nLists, ~(1+superProbe)·√nLists per row.
    *
    * Approximation contract: a probe IDENTICAL to an indexed vector
    * descends to that vector's own cell (same deterministic hierarchy), so
    * exact-duplicate recall is preserved; near-boundary probes can rank
    * cells from an unprobed super, the usual IVF recall trade — widen
    * `superProbe` to buy recall. `superCount = 1` degenerates to the exact
    * probe (every cell is a member of the one super) — spec-pinned.
    *
    * Input `q(id, qv)`; output `(id, cell)`, ≤ nProbe rows per id.
    */
  def probeCellsTwoLevel(q: DataFrame, centroids: DataFrame, nProbe: Int,
      superCount: Int, superProbe: Int = 6,
      knownCentroidCount: Long = -1L): DataFrame = {
    require(superCount >= 1, s"superCount must be ≥ 1: $superCount")
    val spark0 = q.sparkSession
    import spark0.implicits._
    // same routing guard as assignTwoLevel: the query side descends the
    // same hierarchy and must not collect an O(corpus) centroid set either.
    // superCount = 1 is the EXACT probe by contract — silently coarsening
    // it would change results, so past the guard it refuses instead. The
    // count is skipped when the caller passes the size down (searchIndex
    // threads Index.nCentroids — no extra job per indexed search).
    val nCent =
      if (knownCentroidCount >= 0L) knownCentroidCount else centroids.count()
    if (superCount > 1 && nCent > centroidCollectGuard(spark0))
      return probeCellsTwoLevelDistributed(q, centroids, nProbe, superCount,
        superProbe)
    requireCentroidsCollectable(spark0, nCent, "probeCellsTwoLevel(superCount=1)")
    val local = centroids.select(col("cell").cast("int"), col("cv"))
      .as[(Int, Seq[Long])].collect().sortBy(_._1).toSeq
    val (supers, grouping) = superGrouping(local, superCount)
    val superDf = spark0.createDataset(
      supers.zipWithIndex.map { case (sv, si) => (si, sv) })
      .toDF("_super", "scv")
    val centWithSuper = spark0.createDataset(
      local.map { case (cell, cv) => (cell, cv, grouping(cell)) })
      .toDF("cell", "cv", "_super")
    val topSupers = q.crossJoin(broadcast(superDf))
      .select(col("id"), col("qv"), col("_super"),
        l2Q(col("qv"), col("scv")).as("sd2"))
      .withColumn("_srn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("sd2"), col("_super"))))
      .filter(col("_srn") <= superProbe)
      .select(col("id"), col("qv"), col("_super"))
    topSupers.join(broadcast(centWithSuper), Seq("_super"))
      .select(col("id"), col("cell"), l2Q(col("qv"), col("cv")).as("d2"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("d2"), col("cell"))))
      .filter(col("_rn") <= nProbe)
      .select(col("id"), col("cell"))
  }

  /** [[superGrouping]] WITHOUT collecting the centroid set: the ≤superCount
    * super-centroids stay driver-local (bounded — superCount ≈ √nLists by
    * the callers' sizing), but the nLists-row cell→super grouping remains a
    * DataFrame. Bit-exact with the driver version by construction: same
    * k-lowest-cell seeding, same (l2, super-index) tie order via min_by,
    * same 2 rounds, and per-dim means with Math.floorDiv semantics —
    * `sum − pmod(sum, n)` is the largest multiple of n ≤ sum, so the `div`
    * is exact and floors toward −∞ where Spark's div truncates toward zero
    * (they differ exactly on negative sums, which quantized vectors hit).
    * Empty supers keep their previous position (means collect is
    * ≤superCount rows). Cost: 2 × O(nLists · superCount) distributed.
    */
  private def superGroupingDistributed(centroids: DataFrame, superCount: Int)
      : (Vector[Seq[Long]], DataFrame) = {
    val spark0 = centroids.sparkSession
    import spark0.implicits._
    var supers: Vector[Seq[Long]] = centroids.orderBy("cell").limit(superCount)
      .select(col("cell").cast("int"), col("cv")).as[(Int, Seq[Long])]
      .collect().sortBy(_._1).map(_._2).toVector
    var grouping: DataFrame = null
    for (_ <- 1 to 2) {
      val superDf = spark0.createDataset(
        supers.zipWithIndex.map { case (sv, si) => (si, sv) })
        .toDF("_super", "scv")
      grouping = centroids.crossJoin(broadcast(superDf))
        .select(col("cell"), col("cv"), col("_super"),
          l2Q(col("cv"), col("scv")).as("d2"))
        .groupBy(col("cell"))
        .agg(min_by(struct(col("_super"), col("cv")),
          struct(col("d2"), col("_super"))).as("s"))
        .select(col("cell"), col("s.cv").as("cv"), col("s._super").as("_super"))
        .localCheckpoint() // consumed twice (means below + the caller's join)
      val means = grouping
        .select(col("_super"), posexplode(col("cv")))
        .groupBy(col("_super"), col("pos"))
        .agg(expr("(sum(col) - pmod(sum(col), count(*))) div count(*)").as("m"))
        .groupBy(col("_super"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
        .select(col("_super").cast("int"), expr("transform(pairs, p -> p.m)"))
        .as[(Int, Seq[Long])].collect().toMap // ≤ superCount rows
      supers = supers.zipWithIndex.map { case (prev, si) =>
        means.getOrElse(si, prev)
      }
    }
    (supers, grouping)
  }

  /** [[assignTwoLevel]] with the centroid level kept DISTRIBUTED — the
    * 100-TB path for constant-cell-size policies where nLists is O(corpus)
    * and collecting (or broadcasting) the centroid set is a guaranteed
    * driver/executor OOM (~150 GB of centroids at 10¹⁰ vectors). Only the
    * ≤superCount super-level is driver-local and broadcast; the
    * within-group nearest centroid resolves as a shuffle equi-join on
    * `_super` (each vector meets its group's ~nLists/superCount centroids —
    * the same O(corpus · 2√nLists) arithmetic as the collected twin, as an
    * exchange instead of a broadcast). BIT-EXACT with [[assignTwoLevel]]
    * (spec-pinned): identical hierarchy, distances, and tie order — the
    * join strategy is the only difference. [[assignTwoLevel]] routes here
    * automatically past `spark.graft.ivf.maxCentroidCollectRows`.
    */
  def assignTwoLevelDistributed(q: DataFrame, centroids: DataFrame,
      superCount: Int): DataFrame = {
    require(superCount > 1,
      s"distributed assignment needs a super level (superCount=$superCount); " +
        "superCount = 1 is the exact collected path")
    val spark0 = q.sparkSession
    import spark0.implicits._
    val (supers, grouping) = superGroupingDistributed(centroids, superCount)
    val superDf = spark0.createDataset(
      supers.zipWithIndex.map { case (sv, si) => (si, sv) })
      .toDF("_super", "scv")
    val stage1 = q.crossJoin(broadcast(superDf))
      .select(col("id"), col("qv"), col("_super"),
        l2Q(col("qv"), col("scv")).as("d2"))
      .groupBy(col("id"))
      .agg(min_by(struct(col("_super"), col("qv")),
        struct(col("d2"), col("_super"))).as("s"))
      .select(col("id"), col("s.qv").as("qv"), col("s._super").as("_super"))
    stage1.join(grouping, Seq("_super"))
      .select(col("id"), col("qv"), col("cell"),
        l2Q(col("qv"), col("cv")).as("d2"))
      .groupBy(col("id"))
      .agg(min_by(struct(col("cell"), col("qv")),
        struct(col("d2"), col("cell"))).as("s"))
      .select(col("id"), col("s.qv").as("qv"), col("s.cell").as("cell"))
  }

  /** [[probeCellsTwoLevel]] with the centroid level kept DISTRIBUTED — the
    * query-side twin of [[assignTwoLevelDistributed]], same super-broadcast
    * + `_super` equi-join shape, same bit-exactness contract (spec-pinned).
    * [[probeCellsTwoLevel]] routes here automatically past the guard.
    */
  def probeCellsTwoLevelDistributed(q: DataFrame, centroids: DataFrame,
      nProbe: Int, superCount: Int, superProbe: Int = 6): DataFrame = {
    require(superCount > 1,
      s"distributed probing needs a super level (superCount=$superCount); " +
        "superCount = 1 is the exact collected path")
    val spark0 = q.sparkSession
    import spark0.implicits._
    val (supers, grouping) = superGroupingDistributed(centroids, superCount)
    val superDf = spark0.createDataset(
      supers.zipWithIndex.map { case (sv, si) => (si, sv) })
      .toDF("_super", "scv")
    val topSupers = q.crossJoin(broadcast(superDf))
      .select(col("id"), col("qv"), col("_super"),
        l2Q(col("qv"), col("scv")).as("sd2"))
      .withColumn("_srn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("sd2"), col("_super"))))
      .filter(col("_srn") <= superProbe)
      .select(col("id"), col("qv"), col("_super"))
    topSupers.join(grouping, Seq("_super"))
      .select(col("id"), col("cell"), l2Q(col("qv"), col("cv")).as("d2"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("d2"), col("cell"))))
      .filter(col("_rn") <= nProbe)
      .select(col("id"), col("cell"))
  }

  /** The SCALED build path — [[build]] for corpora where nLists grows with
    * the data (constant-cell-size policy) and both full-corpus Lloyd and
    * exact assignment would be O(corpus · nLists):
    *   - centroids train on a bounded DETERMINISTIC sample
    *     (`pmod(hash(id), stride) = 0`, stride = ⌈N / maxTrainRows⌉ — the
    *     FAISS practice of training the coarse quantizer on a fraction),
    *     so Lloyd is O(maxTrainRows · nLists) regardless of corpus size;
    *   - the whole corpus then assigns through [[assignTwoLevel]]
    *     (O(corpus · 2√nLists)).
    * With `maxTrainRows ≥ N` and `superCount = 1` this is bit-identical
    * to [[build]] (spec-pinned); the defaults engage the approximations
    * only as the corpus outgrows them.
    */
  def buildScaled(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iters: Int = 2, maxTrainRows: Long = 100000,
      superCount: Int = 0): Index = {
    require(maxTrainRows >= nLists,
      s"maxTrainRows=$maxTrainRows must be ≥ nLists=$nLists")
    val q = corpus.select(col(idCol).as("id"),
      Similarity.quantize(col(vecCol)).as("qv"))
    val n = q.count() // one bounded scalar: the sampling stride needs N
    val stride = math.max(1L, (n + maxTrainRows - 1) / maxTrainRows)
    val trainSet =
      if (stride <= 1L) q else q.filter(pmod(hash(col("id")), lit(stride)) === 0)
    val sc =
      if (superCount >= 1) superCount
      else math.max(1, math.round(math.sqrt(nLists.toDouble)).toInt)
    // Lloyd iterations themselves assign two-level — with nLists ∝ corpus
    // the per-iteration exact assign would be the remaining quadratic term
    val centroids = trainQWith(trainSet, nLists, iters)(
      if (sc <= 1) { (tq, tc, nCent) =>
        requireCentroidsCollectable(tq.sparkSession, nCent,
          "buildScaled(superCount=1) exact Lloyd assignment")
        assign(tq, tc)
      } else assignTwoLevel(_, _, sc, _))
    // trainQWith returns a local or localCheckpointed relation — this count
    // is trivial, and threading it down keeps the corpus assignment's guard
    // job-free too
    val nCent = centroids.count()
    val assigned = assignTwoLevel(q, centroids, sc, nCent)
      .select(col("id").as("neighbor_id"), col("qv").as("cq"), col("cell"))
      .withColumn("n2c", Similarity.dotQ(col("cq"), col("cq")))
    Index(centroids, assigned)
  }

  /** A trained IVF index: the `nLists` centroids plus the corpus assigned to
    * cells with precomputed self-norms — everything a search needs, nothing
    * that retrains. Train-once-search-many is the operator's whole scale
    * story: at 100 TB the two Lloyd passes over the corpus are the expensive
    * part, and every search that re-runs them pays them again.
    *
    * Schemas: `centroids(cell INT, cv ARRAY<LONG>)`,
    * `assigned(neighbor_id LONG, cq ARRAY<LONG>, n2c LONG, cell INT)`.
    */
  final case class Index(centroids: DataFrame, assigned: DataFrame) {

    /** Memoized corpus size — evaluated ONLY when the brute auto-route is
      * enabled (`spark.graft.ivf.bruteRouteMaxRows` > 0), so the default
      * path never pays a corpus-count job. One count per Index instance.
      */
    lazy val nRows: Long = assigned.count()

    /** Memoized centroid-set size — the quantity every collect/broadcast
      * guard check needs ([[requireCentroidsCollectable]]). Computed at
      * most once per Index instance (one tiny job against a ≤nLists-row
      * relation — local, checkpointed, or a parquet metadata count) so the
      * guard never adds a per-search job, and search paths can thread it
      * down as `knownCentroidCount` instead of re-counting.
      */
    lazy val nCentroids: Long = centroids.count()

    /** Persist to `dir` as parquet. `assigned` is partitioned by `cell`, so a
      * search's `cell IN (probed…)` filter becomes parquet partition pruning —
      * a loaded index reads only nProbe/nLists of the corpus bytes.
      *
      * The shuffle-by-cell before the write aligns tasks with partition dirs:
      * without it every upstream task writes a sliver of every cell —
      * O(tasks·nLists) small files, slow to write locally and metadata-toxic
      * at 100 TB. With it each task owns whole cells.
      */
    def save(dir: String): Unit = {
      centroids.write.mode("overwrite").parquet(s"$dir/centroids")
      assigned.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/assigned")
    }
  }

  /** Train the index: Lloyd centroids + one cell-assignment pass over the
    * corpus, with quantized vectors and self-norms precomputed so search does
    * no per-row arithmetic beyond the rerank itself.
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nLists: Int = 16, iters: Int = 2): Index = {
    val centroids = train(corpus, idCol, vecCol, nLists, iters)
    Index(centroids, assignNew(centroids, corpus, idCol, vecCol))
  }

  /** Incrementally extend a trained index with new vectors WITHOUT
    * retraining: the coarse quantizer (centroids) is frozen and the new
    * batch is assigned to its nearest existing cells — one broadcast-assign
    * over the BATCH only, O(batch·nLists), while the existing corpus is not
    * touched. This is the ingest path at 100 TB: the two Lloyd passes run
    * once, ever; each arriving batch pays only its own assignment.
    *
    * The price of never retraining is drift: if the new data's distribution
    * shifts, cells imbalance and recall degrades — monitor cell sizes and
    * retrain when they skew. (Same trade every production IVF store makes.)
    */
  def append(index: Index, newDocs: DataFrame, idCol: String, vecCol: String): Index =
    Index(index.centroids,
      index.assigned.unionByName(
        assignNew(index.centroids, newDocs, idCol, vecCol, index.nCentroids)))

  /** The ONE definition of the `assigned` schema (neighbor_id, cq, cell,
    * n2c): quantize → nearest-cell assign → precompute self-norms. Shared by
    * [[build]], [[append]], and [[appendSaved]] so the on-disk and in-memory
    * index rows can never diverge.
    */
  private def assignNew(centroids: DataFrame, docs: DataFrame,
      idCol: String, vecCol: String, knownCentroidCount: Long = -1L): DataFrame = {
    // frozen-quantizer assignment broadcasts the full centroid set (build /
    // append / appendSaved / driftReport) — same budget, same refusal as
    // every other exact-broadcast site; Index-holding callers thread
    // nCentroids down so no extra count job runs
    val nCent =
      if (knownCentroidCount >= 0L) knownCentroidCount else centroids.count()
    requireCentroidsCollectable(docs.sparkSession, nCent,
      "assignNew (frozen-quantizer broadcast assignment)")
    assign(
      docs.select(col(idCol).as("id"), Similarity.quantize(col(vecCol)).as("qv")),
      centroids)
      .select(col("id").as("neighbor_id"), col("qv").as("cq"), col("cell"))
      .withColumn("n2c", Similarity.dotQ(col("cq"), col("cq")))
  }

  /** Remove vectors by id WITHOUT retraining — the delete mirror of
    * [[append]]: centroids stay frozen, the dropped ids anti-join out of
    * the assignment (ids and codes travel, never full vectors). Same drift
    * caveat as append: heavy deletion skews cells; monitor and retrain.
    */
  def remove(index: Index, ids: DataFrame, idCol: String): Index =
    Index(index.centroids, index.assigned.join(
      ids.select(col(idCol).as("neighbor_id")), Seq("neighbor_id"), "left_anti"))

  /** [[remove]] against a SAVED index: only the cells that actually held a
    * dropped id are rewritten (dynamic partition overwrite over the
    * touched-cell filter); untouched cells are neither read nor written and
    * the centroids file never changes — the deletion analog of
    * [[appendSaved]]'s touched-partition write. The touched-cell collect is
    * bounded by nLists.
    *
    * A cell EMPTIED by the delete writes zero rows, and dynamic overwrite
    * only replaces partitions present in the output — its stale files would
    * silently survive, so emptied partitions are deleted explicitly (the
    * same rule MaterializedTable applies to fully-tombstoned buckets).
    * Deleting EVERY vector leaves a directory no parquet reader can infer a
    * schema from; an index over nothing is meaningless, so that terminal
    * state is unsupported — drop the directory instead.
    */
  def removeSaved(spark: org.apache.spark.sql.SparkSession, dir: String,
      ids: DataFrame, idCol: String): Index = {
    removeFromCellPartitioned(spark, s"$dir/assigned",
      ids.select(col(idCol).as("neighbor_id")))
    load(spark, dir)
  }

  /** The shared touched-cells-only delete over ANY `cell=`-partitioned
    * relation keyed by `neighbor_id` (IVF-Flat `assigned`, IVF-PQ `codes`):
    * dynamic partition overwrite of cells holding a dropped id, explicit
    * deletion of emptied partitions, untouched cells never read or written.
    */
  private[operators] def removeFromCellPartitioned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      drop: DataFrame): Unit = {
    val rows = spark.read.parquet(path)
    val touchedDf = rows.join(drop, Seq("neighbor_id"), "left_semi")
      .select(col("cell").cast("int")).distinct()
    // the touched-cell list drives driver-side partition-dir deletes and an
    // isin pushdown — bounded by nLists, but a mass delete on a huge-nLists
    // index would materialize O(nLists) cells here: refuse loudly (same
    // guard as the assignment paths) instead of a silent driver OOM
    requireCentroidsCollectable(spark, touchedDf.count(),
      "removeFromCellPartitioned touched-cell enumeration")
    val touched = touchedDf.collect().map(_.getInt(0)).sorted
    if (touched.nonEmpty) {
      val remaining = rows
        .filter(col("cell").isin(touched.map(Integer.valueOf).toSeq: _*))
        .join(drop, Seq("neighbor_id"), "left_anti")
        // materialize BEFORE the write: the plan reads the same path the
        // write overwrites (and it is consumed again for the written-cell
        // list below)
        .localCheckpoint()
      remaining.repartition(col("cell"))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(path)
      val written = remaining.select(col("cell").cast("int")).distinct()
        .collect().map(_.getInt(0)).toSet
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      for (c <- touched if !written.contains(c)) {
        val p = new org.apache.hadoop.fs.Path(s"$path/cell=$c")
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
  }

  /** [[append]] against a SAVED index: the new batch's assigned rows are
    * appended as new parquet files in the touched `cell=` partitions only —
    * cells receiving no new vectors are neither read nor written, and the
    * centroids file is untouched. Returns the loaded, extended index.
    */
  def appendSaved(spark: org.apache.spark.sql.SparkSession, dir: String,
      newDocs: DataFrame, idCol: String, vecCol: String): Index = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    assignNew(centroids, newDocs, idCol, vecCol).repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$dir/assigned")
    load(spark, dir)
  }

  /** Load a persisted index. Quantization is integral end-to-end (see class
    * scaladoc), so a save/load round-trip is bit-exact: `searchIndex` over
    * `load(save(build(…)))` returns the same rows as over the in-memory index.
    */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Index = {
    // partition-column inference can widen `cell`; pin the written schema
    val assigned = spark.read.parquet(s"$dir/assigned")
      .select(col("neighbor_id"), col("cq"), col("n2c"), col("cell").cast("int"))
    Index(spark.read.parquet(s"$dir/centroids"), assigned)
  }

  /** ANN search against a prebuilt [[Index]]: probe → its nProbe nearest
    * cells (broadcast centroid scan) → rerank candidates in those cells by
    * quantized cosine → top-k. Touches ≈ corpus·nProbe/nLists candidate rows;
    * with a [[load]]ed index the cell filter prunes parquet partitions, so
    * untouched cells are never read at all.
    */
  /** @param probeSuperCount > 1 routes probe→cell selection through the
    *   two-level hierarchy ([[probeCellsTwoLevel]], auto-distributed past
    *   the collect guard) — the scale path when nLists grows with the
    *   corpus; 1 (default) keeps the exact broadcast probe.
    * @param probeSuperProbe super-groups kept per probe on the two-level
    *   path — the recall lever of the hierarchy. Default 6 (raised from 3
    *   by the r14 RecallSoak grid): at 100× soak scale the two-level path
    *   reads 0.843 recall@3 at (nProbe=10, superProbe=6) vs 0.693 at the
    *   old (3,3) — the DECLARED scale-path floor is 0.80@3 at those
    *   recommended knobs (BASELINE.md), re-measured per round. Probe-stage
    *   cost stays O((1+superProbe)·√nLists) per row — at superProbe=6 and
    *   nLists≈1800 that is ~300 fused l2 ops vs the exact probe's 1800.
    */
  def searchIndex(probes: DataFrame, index: Index, idCol: String, vecCol: String,
      k: Int, nProbe: Int = 3, probeSuperCount: Int = 1,
      probeSuperProbe: Int = 6): DataFrame = {
    val pq = quantizedProbes(probes, idCol, vecCol)
    // SMALL-CORPUS AUTO-ROUTE (opt-in): below ~10k rows ANN only loses —
    // the RecallSoak base-scale measurement read recall 0.49@3 at N=2,000
    // at the recommended knobs (coverage-bound: probed cells simply don't
    // hold k true neighbors of a structure-free corpus), while the brute
    // pair loop at that size is a few thousand fused-loop cosines per
    // probe, corpus-parallel since the r14 build-side fix. Off by default
    // (0) because the routed answer is EXACT where the probed answer is
    // approximate — a hash-pinned caller must opt in knowingly via
    // `spark.graft.ivf.bruteRouteMaxRows`. The corpus count is memoized
    // and only evaluated when the conf is set (short-circuit).
    val bruteMax = pq.sparkSession.conf
      .get("spark.graft.ivf.bruteRouteMaxRows", "0").toLong
    if (bruteMax > 0 && index.nRows <= bruteMax) {
      val scored = index.assigned.crossJoin(broadcast(pq))
        .filter(col("probe_id") =!= col("neighbor_id"))
        .select(col("probe_id"), col("neighbor_id"),
          Similarity.cosineQWithNorms(col("pq"), col("cq"),
            col("n2p"), col("n2c")).as("sim"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("sim").desc, col("neighbor_id"))
      return scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }
    val cells =
      if (probeSuperCount > 1)
        probeCellsTwoLevel(
          pq.select(col("probe_id").as("id"), col("pq").as("qv")),
          index.centroids, nProbe, probeSuperCount,
          superProbe = probeSuperProbe,
          knownCentroidCount = index.nCentroids)
          .select(col("id").as("probe_id"), col("cell"))
      else probeCells(pq, index, nProbe)
    // probe vectors attach BEFORE the cell explosion (the
    // semanticDecontaminateIndexed join-order rule): the exploded
    // candidate relation projects to 3 narrow columns and flows into the
    // rank's exchange — the reversed order re-keys fat vector-carrying
    // pair rows by probe_id first, the 1000×-soak disk-exhaustion shape
    val scored = cells
      .join(pq, Seq("probe_id"))
      .join(index.assigned, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        Similarity.cosineQWithNorms(col("pq"), col("cq"), col("n2p"), col("n2c")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def quantizedProbes(probes: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    probes.select(col(idCol).as("probe_id"),
      Similarity.quantize(col(vecCol)).as("pq"))
      .withColumn("n2p", Similarity.dotQ(col("pq"), col("pq")))

  /** The probe→nProbe-nearest-cells assignment shared by every indexed
    * search path: one broadcast of the (≤nLists)-row centroid set, exact
    * integer L2, ties → lowest cell.
    */
  private def probeCells(pq: DataFrame, index: Index, nProbe: Int): DataFrame = {
    // the exact probe broadcasts the FULL centroid set — past the collect
    // budget that is the r13 cliff class (O(corpus) centroids under a
    // constant-cell-size policy), so it refuses loudly instead of OOMing;
    // searchIndex(probeSuperCount > 1) is the guarded scale path. The count
    // is memoized on the Index, never a per-search job.
    requireCentroidsCollectable(pq.sparkSession, index.nCentroids,
      "probeCells (exact broadcast probe; searchIndex/radiusSearchIndex)")
    pq.crossJoin(broadcast(index.centroids))
      .select(col("probe_id"), col("cell"), l2Q(col("pq"), col("cv")).as("d2"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("d2"), col("cell"))))
      .filter(col("_rn") <= nProbe)
      .select("probe_id", "cell")
  }

  /** RADIUS search through the index — [[Similarity.radiusSearch]]'s
    * exact-integer threshold restricted to each probe's `nProbe` nearest
    * cells: the scale path for "everything at least this similar", paying
    * Σ|probed cell| per probe instead of the corpus. Every neighbor lives
    * in exactly ONE cell, so no dedup stage is needed; at `nProbe =
    * nLists` the result EQUALS the exact radius search (spec-pinned), and
    * below it the result is a deterministic subset — the standard IVF
    * recall-for-IO trade, here with set membership still decided by the
    * same integer cross-multiplication (never float rounding).
    */
  def radiusSearchIndex(probes: DataFrame, index: Index, idCol: String,
      vecCol: String, minCosNum: Long, minCosDen: Long,
      nProbe: Int = 3): DataFrame = {
    require(minCosNum >= 0 && minCosDen > 0 && minCosNum <= 10 && minCosDen <= 10,
      "threshold must be a small non-negative rational (overflow bound)")
    val pq = quantizedProbes(probes, idCol, vecCol)
    // same join-order rule as searchIndex: vectors attach pre-explosion,
    // the radius filter consumes the pair stream with no further exchange
    probeCells(pq, index, nProbe)
      .join(pq, Seq("probe_id"))
      .join(index.assigned, Seq("cell"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("dot", Similarity.dotQ(col("pq"), col("cq")))
      .filter(col("dot") >= 0 &&
        col("dot") * col("dot") * lit(minCosDen * minCosDen) >=
          lit(minCosNum * minCosNum) * col("n2p") * col("n2c"))
      .select(col("probe_id"), col("neighbor_id"),
        (col("dot").cast("double") /
          (sqrt(col("n2p").cast("double")) * sqrt(col("n2c").cast("double"))))
          .as("sim"))
  }

  /** Index health stats — the monitoring half of the frozen-quantizer
    * trade [[append]] documents ("monitor cell sizes and retrain when they
    * skew"): one row per CELL (empty cells included — a cell whose
    * centroid attracts nothing is itself a drift signal) with its vector
    * count and an `overloaded` flag, exact-integer (n·nCells > 2·total ⇔
    * n > 2·mean, no division) so the verdict is engine-portable. Search
    * cost in a cell is linear in its size, so overloaded cells are exactly
    * where recall-vs-latency degrades first; the production loop reads
    * this after each append wave and retrains when flags accumulate.
    * Scale shape: one partial-agg'd count per cell + two single-row
    * aggregates broadcast back — never touches vectors.
    */
  def cellStats(index: Index): DataFrame = {
    val counts = index.centroids.select(col("cell"))
      .join(index.assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vectors")), Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_vectors"), lit(0L)).as("n_vectors"))
    val totals = counts.agg(sum(col("n_vectors")).as("_total"),
      count(lit(1)).as("_ncells"))
    counts.crossJoin(broadcast(totals))
      .select(col("cell"), col("n_vectors"),
        (col("n_vectors") * col("_ncells") > lit(2) * col("_total"))
          .as("overloaded"))
  }

  /** CLUSTER-QUALITY (INERTIA) REPORT — per cell, the exact-integer sum of
    * squared quantized L2 distances of its members to the centroid (the
    * k-means objective broken out per cell) plus the member count. Rising
    * per-cell SSE after append waves under frozen centroids is the retrain
    * trigger that [[cellStats]] (counts) and [[driftReport]] (shares) can't
    * see: a cell can keep its share while its members scatter. Empty cells
    * stay in the report with sse = 0. Exact integers end-to-end, so the
    * report is engine-portable and hash-exact.
    *
    * Scale shape: one pass over the stored assignment against broadcast
    * centroids, both aggregates partial-agg'd map-side; output O(nLists).
    */
  def inertiaReport(index: Index): DataFrame = {
    // broadcasts the full centroid set — same budget discipline as the
    // search/assign faces (memoized count, no extra job)
    requireCentroidsCollectable(index.centroids.sparkSession,
      index.nCentroids, "inertiaReport centroid broadcast")
    val sse = index.assigned
      .join(broadcast(index.centroids), Seq("cell"))
      .select(col("cell"), l2Q(col("cq"), col("cv")).as("_d2"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("_d2")).as("sse"))
    index.centroids.select(col("cell"))
      .join(sse, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_vectors"), lit(0L)).as("n_vectors"),
        coalesce(col("sse"), lit(0L)).as("sse"))
  }

  /** CLUSTER-SEPARATION REPORT — each centroid's nearest OTHER centroid
    * and the exact integer squared distance to it: the "these two cells
    * are the same cluster" merge signal that completes the quantizer-
    * health triad (counts [[cellStats]], shares [[driftReport]], spread
    * [[inertiaReport]]) — two cells can be individually tight yet sit on
    * top of each other, wasting a probe. O(nLists²) pair work over the
    * tiny broadcast centroid relation; ties break to the lower cell id.
    */
  def separationReport(index: Index): DataFrame = {
    // broadcasts the centroid set (and is O(nLists²) pair work besides) —
    // refuse past the collect budget like every other broadcast site
    requireCentroidsCollectable(index.centroids.sparkSession,
      index.nCentroids, "separationReport centroid self-join broadcast")
    val x = index.centroids.select(col("cell"), col("cv"))
    val y = index.centroids.select(col("cell").as("_oc"), col("cv").as("_ov"))
    x.crossJoin(broadcast(y))
      .filter(col("cell") =!= col("_oc"))
      .select(col("cell"), col("_oc"), l2Q(col("cv"), col("_ov")).as("_d2"))
      .groupBy(col("cell"))
      .agg(min_by(struct(col("_oc"), col("_d2")),
        struct(col("_d2"), col("_oc"))).as("_m"))
      .select(col("cell"), col("_m._oc").as("nearest_cell"),
        col("_m._d2").as("d2_nearest"))
  }

  /** DISTRIBUTION-DRIFT REPORT — the monitoring step that decides when the
    * frozen-quantizer trade ([[append]]'s documented price) has gone bad:
    * assign an incoming batch to the SAME frozen centroids and compare each
    * cell's share of the new data against its share of the indexed base.
    * A cell whose share more than doubled or halved is `drifted` — the
    * exact-integer cross-multiplication
    * `n_new·total_base > 2·n_base·total_new` (and its mirror) avoids any
    * division, so the verdict is engine-portable ([[cellStats]]
    * discipline); growth from an empty cell always flags. Empty cells stay
    * in the report — mass appearing where the quantizer attracted nothing
    * is precisely the retrain signal.
    *
    * Returns (cell, n_base, n_new, drifted). Scale shape: one broadcast
    * assignment pass over the BATCH, two tiny per-cell counts, totals as a
    * broadcast scalar row — the base corpus is never re-scanned beyond its
    * stored assignment.
    */
  def driftReport(index: Index, newDocs: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val newAsg = assignNew(index.centroids, newDocs, idCol, vecCol,
      index.nCentroids)
    val base = index.assigned.groupBy(col("cell")).agg(count(lit(1)).as("_nb"))
    val nw = newAsg.groupBy(col("cell")).agg(count(lit(1)).as("_nn"))
    val counts = index.centroids.select(col("cell"))
      .join(base, Seq("cell"), "left")
      .join(nw, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("_nb"), lit(0L)).as("n_base"),
        coalesce(col("_nn"), lit(0L)).as("n_new"))
    val totals = counts.agg(sum(col("n_base")).as("_tb"),
      sum(col("n_new")).as("_tn"))
    counts.crossJoin(broadcast(totals))
      .select(col("cell"), col("n_base"), col("n_new"),
        (col("n_new") * col("_tb") > lit(2) * col("n_base") * col("_tn") ||
          col("n_base") * col("_tn") > lit(2) * col("n_new") * col("_tb"))
          .as("drifted"))
  }

  /** CLUSTER-BALANCED SAMPLING — the diversity-sampling curation step: draw
    * an equal quota of `mPerCell` vectors from every IVF cell, so dominant
    * modes of the embedding distribution (boilerplate clusters, one
    * over-crawled domain) cannot flood the sample the way uniform sampling
    * lets them. Within a cell the quota is taken by a SALTED deterministic
    * rank — `(id·2654435761) mod 1000003` (Knuth multiplicative scatter,
    * exact in 64-bit on every engine), ties to the id — so the sample is
    * reproducible across engines, reruns, and partitionings, never a
    * `rand()` draw.
    *
    * Returns (idCol, cell, pos ∈ [1, mPerCell]). Cells with fewer than
    * `mPerCell` members contribute all of them.
    *
    * Scale shape: one window rank per cell over the (id, cell) assignment —
    * a single exchange keyed by cell, which a PERSISTED index
    * ([[Index.save]]) already stores partitioned by, making the rank
    * exchange-free there; full vectors never travel.
    */
  def balancedSample(index: Index, idCol: String, mPerCell: Int): DataFrame = {
    require(mPerCell >= 1, s"mPerCell must be ≥ 1: $mPerCell")
    // id reduced mod 1000003 BEFORE the Knuth multiply: identical to
    // (id*2654435761) mod 1000003 in unbounded arithmetic (mod-multiply
    // compatibility) but overflow-free for ids beyond ~3.4e9, where the
    // raw product exceeds Long range (found by the 10x key-shifted soak
    // under ANSI overflow checking)
    val salted =
      ((col(idCol) % lit(1000003L)) * lit(2654435761L)) % lit(1000003L)
    index.assigned.select(col("neighbor_id").as(idCol), col("cell"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("cell")).orderBy(salted, col(idCol))))
      .filter(col("pos") <= mPerCell)
  }

  /** PRE-FILTERED view of an index: only `allowedIds` remain searchable —
    * the FAISS `IDSelector` / vector-store metadata-filter shape, as an
    * index view rather than a search variant so every search path
    * ([[searchIndex]], and PqIndex's ADC scans over an IVF assignment)
    * composes with it unchanged. Semantics are PRE-filter: the top-k is
    * taken among allowed vectors in the probed cells, so a probe never
    * starves because its k nearest UNfiltered neighbors were disallowed —
    * the failure mode of post-filtering a fixed top-k.
    *
    * Derive `allowedIds` from a payload predicate:
    * `filtered(idx, meta.filter(pred).select(id), id)`. Scale shape: the
    * semi-join sits beneath the search's cell filter, so a loaded index
    * still prunes cell partitions first and the selector joins only the
    * probed cells' rows; a selective predicate broadcasts under AQE, a
    * non-selective one degrades to one hash semi-join on id. Per-vector
    * cell assignment is filter-independent, so filtering the assignment
    * ≡ filtering the corpus before indexing, bit-for-bit.
    */
  def filtered(index: Index, allowedIds: DataFrame, idCol: String): Index =
    Index(index.centroids,
      index.assigned.join(
        allowedIds.select(col(idCol).as("neighbor_id")),
        Seq("neighbor_id"), "left_semi"))

  /** Convenience: train + search in one call. Prefer [[build]] (+ [[Index.save]])
    * and [[searchIndex]] when issuing more than one search — this trains anew
    * on every call.
    */
  def search(probes: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nLists: Int = 16, nProbe: Int = 3, iters: Int = 2): DataFrame =
    searchIndex(probes, build(corpus, idCol, vecCol, nLists, iters), idCol, vecCol,
      k, nProbe)
}
