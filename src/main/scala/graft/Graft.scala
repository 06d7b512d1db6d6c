package graft

import graft.cdc._
import graft.operators._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One-stop user facade — the surface a user of the reference pipeline
  * switches to. Each entry delegates to the tested operator module; see
  * COVERAGE.md for the full inventory and README.md for design rules.
  *
  * {{{
  * val spark = SparkSession.builder().withExtensions(new GraftExtensions)...
  * import graft.Graft
  * val state   = Graft.latestState(changelog, keyCols = Seq("table","key"))
  * val deduped = Graft.dedupExact(docs, "doc_id", "text")
  * val nn      = Graft.ann(probes, corpus, "vec_id", "embedding", k = 10)
  * }}}
  */
object Graft {

  // --- CDC -------------------------------------------------------------------

  /** Current state of a keyed changelog (tombstones drop keys). */
  def latestState(changelog: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String] = Seq("lsn", "seq")): DataFrame =
    LatestState.batch(changelog, keyCols, orderCols)

  /** Streaming variant: per-micro-batch updated latest states. */
  def latestStateStream(envelopes: Dataset[CdcEvent]): Dataset[CdcEvent] =
    LatestState.streaming(envelopes)

  /** Consistent snapshot of a batch table as CDC insert envelopes. */
  def snapshot(table: DataFrame, tableName: String, keyCols: Seq[String])
      : Dataset[CdcEvent] =
    graft.streaming.CdcPipeline.snapshotEnvelopes(table, tableName, keyCols)

  /** Split key-changing updates into delete+insert. The envelope's `before`
    * holds the old ROW, not the old key, so the caller must supply the
    * extractor for its source's key encoding (passing `_.before` would split
    * every update carrying a before image and tombstone phantom keys).
    */
  def splitUpdates(envelopes: Dataset[CdcEvent],
      oldKeyOf: CdcEvent => String): Dataset[CdcEvent] =
    UpdateSplit(envelopes, oldKeyOf)

  /** Merge a changelog batch into bucketed parquet state (incremental:
    * only touched buckets are read/rewritten). Returns buckets rewritten.
    */
  def mergeInto(spark: SparkSession, stateDir: String, updates: DataFrame,
      keyCols: Seq[String]): Int =
    MaterializedTable.merge(spark, stateDir, updates, keyCols, Seq("lsn", "seq"))

  /** Read back materialized state. */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    MaterializedTable.read(spark, stateDir)

  /** Kafka-compatible topic name for a table. */
  def topicFor(prefix: String, schema: String, table: String): String =
    TopicRouter.topicName(prefix, schema, table)

  // --- dedup -----------------------------------------------------------------

  /** Keep one document per distinct content (min id). */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.exactDedup(docs, idCol, textCol)

  /** MinHash-LSH near-duplicate candidate pairs (verify with [[jaccard]]). */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.minhashCandidatePairs(docs, idCol, textCol)

  /** Exact shingle-Jaccard scores for candidate pairs. */
  def jaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Dedup.jaccardOnPairs(pairs, docs, idCol, textCol)

  /** Embedding-space near-duplicates at a cosine threshold. */
  def embeddingDups(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    Similarity.nearDupPairs(corpus, idCol, vecCol, threshold)

  /** Resolve verified duplicate pairs into member→representative clusters. */
  def dupClusters(pairs: DataFrame): Map[Long, Long] = Dedup.clusters(pairs)

  /** SemDeDup-style semantic dedup: k-means cells prune the pair space,
    * within-cell cosine flags dups against their smallest-id rep.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nLists: Int = 16): DataFrame =
    Similarity.semanticDedup(corpus, idCol, vecCol, threshold, nLists)

  // --- training-data pipeline ------------------------------------------------

  /** Per-eval-doc verbatim n-gram overlap against a training corpus (the
    * GPT-3-style decontamination check).
    */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame =
    Dedup.ngramOverlap(train, eval, idCol, textCol, n)

  /** [[decontaminate]] with the train-side shuffle Bloom-pruned to
    * eval-adjacent grams — identical output, the 100 TB-train path.
    */
  def decontaminatePruned(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 13): DataFrame =
    Dedup.ngramOverlapPruned(train, eval, idCol, textCol, n)

  /** Cross-corpus NEAR-duplicate leaks (LSH + exact-Jaccard verify). */
  def decontaminateNear(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, minJaccard: Double = 0.8): DataFrame =
    Dedup.crossCorpusNearDups(train, eval, idCol, textCol, minJaccard = minJaccard)

  /** Concat-and-chunk sequence packing: each doc's global token offset and
    * first/last training sequence (distributed prefix sum — no global sort).
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int): DataFrame =
    TextOps.packSequences(docs, idCol, textCol, seqLen)

  /** Deterministic token-budget mixture sampling across sources. */
  def sampleMixture(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, weights: Map[String, Double], tokenBudget: Long): DataFrame =
    TextOps.sampleMixture(docs, idCol, srcCol, textCol, weights, tokenBudget)

  /** Stable train/val/test split label (hash-bucketed, never `rand()`). */
  def trainSplit(docs: DataFrame, idCol: String, salt: Int = 42): DataFrame =
    docs.withColumn("split",
      TextOps.splitLabel(TextOps.splitBucket(org.apache.spark.sql.functions.col(idCol),
        salt, nBuckets = 10)))

  /** Shift-tolerant substring-overlap pairs via winnowing fingerprints
    * (MOSS) — catches copies that fixed blocks miss.
    */
  def winnowDups(docs: DataFrame, idCol: String, textCol: String,
      minShared: Long = 2): DataFrame =
    Dedup.winnowMatches(docs, idCol, textCol, minShared = minShared)

  /** Per-source calibrated quality filtering: keep each source's top share
    * by its OWN score distribution (histogram quantile, never a sort).
    */
  def calibrateQuality(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, cutFrac: Double = 0.5): DataFrame =
    TextOps.calibratedQualityKeep(docs, idCol, srcCol, textCol,
      cutFrac = cutFrac)

  /** Per-doc corpus n-gram novelty (the memorization-pressure signal). */
  def novelty(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4): DataFrame =
    Dedup.noveltyStats(docs, idCol, textCol, n)

  /** Cross-corpus SEMANTIC decontamination over embeddings — paraphrased
    * leaks that share no n-gram; reuses the ANN path's IVF index.
    */
  def decontaminateSemantic(train: DataFrame, eval: DataFrame, idCol: String,
      vecCol: String, threshold: Double = 0.99): DataFrame =
    Similarity.semanticDecontaminate(train, eval, idCol, vecCol, threshold)

  /** Overlapping audio feature windows (integer energy + zero crossings)
    * over codec-decoded PCM.
    */
  def audioWindows(blobs: DataFrame, win: Int = 64,
      hop: Int = 32): Dataset[Multimodal.AudioWindow] =
    Multimodal.audioWindows(blobs, win, hop)

  // --- similarity search -----------------------------------------------------

  /** Exact quantized-cosine top-k (baseline; O(probes·corpus)). */
  def knn(probes: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame =
    Similarity.knnBrute(probes, corpus, idCol, vecCol, k)

  /** Approximate top-k via multi-table LSH buckets (the scale path). */
  def ann(probes: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame =
    Similarity.annLsh(probes, corpus, idCol, vecCol, k)

  /** Approximate top-k via an IVF-Flat inverted-file index (cell-pruned). */
  def annIvf(probes: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame =
    IvfIndex.search(probes, corpus, idCol, vecCol, k)

  /** Metadata-filtered ANN: a pre-filter ID-selector view over a built
    * index — top-k among `allowedIds` only (vec16).
    */
  def annFiltered(probes: DataFrame, index: IvfIndex.Index,
      allowedIds: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    IvfIndex.searchIndex(probes, IvfIndex.filtered(index, allowedIds, idCol),
      idCol, vecCol, k)

  /** Per-source boilerplate line removal — the CCNet/RefinedWeb line-wise
    * dedup stage (txt38).
    */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, lineTokens: Int = 10, minDf: Int = 3): DataFrame =
    Dedup.boilerplateRemove(docs, idCol, textCol, sourceCol, lineTokens, minDf)

  /** Perceptual-hash image near-dup pairs (blockhash + banded Hamming join,
    * mm06).
    */
  def imageDupPairs(blobs: DataFrame, maxHamming: Int = 3): DataFrame =
    Multimodal.phashDupPairs(Multimodal.perceptualHash(blobs).toDF(), maxHamming)

  /** One-row-per-eval-doc contamination verdict: exact n-gram overlap OR
    * LSH near-duplication (txt41).
    */
  def contaminationReport(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String): DataFrame =
    Dedup.contaminationReport(train, eval, idCol, textCol)

  /** Keep one representative per near-dup LSH cluster (txt42). */
  def dedupByCluster(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.clusterDedup(docs, idCol, textCol)

  /** Top-k Jaccard-similar corpus docs per query doc via LSH buckets
    * (txt43).
    */
  def similarDocs(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame =
    Dedup.similarDocs(corpus, queries, idCol, textCol, k)

  /** Ordered funnel stages per user — view→click→purchase style (q54). */
  def funnelStages(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame =
    Funnel.stages(events, userCol, typeCol, tsCol, steps)

  /** Deterministic shard export for data loaders — salted-hash shard +
    * reproducible in-shard order (txt39).
    */
  def shardExport(docs: DataFrame, idCol: String, nShards: Int): DataFrame =
    TextOps.shardAssign(docs, idCol, nShards)

  /** Ancestor closure + per-node subtree rollup of a forest — the
    * WITH RECURSIVE surface, in ⌈log2 depth⌉ joins (q51).
    */
  def hierarchyRollup(nodes: DataFrame, edges: DataFrame, idCol: String,
      valCol: String, childCol: String, parentCol: String): DataFrame =
    operators.Hierarchy.rollup(nodes, edges, idCol, valCol, childCol, parentCol)
}
