package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for 100 TB-scale corpus curation.
  *
  * Scale design:
  *   - exact: one hash aggregation on md5(text) — partial agg compacts
  *     map-side, shuffle is O(distinct contents).
  *   - MinHash LSH: the signature is computed with array intrinsics in a
  *     single projection (no explode ⇒ no |docs|·|shingles| intermediate),
  *     then only (doc, band, signature) tuples — 4 rows/doc — shuffle for the
  *     bucket join. Candidate verification (exact Jaccard) runs only inside
  *     buckets, never all-pairs.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct content that appears >1
    * time, with the kept (minimum) id and the duplicate count.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull) // null ≠ null: unknown content is not a dup
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Keep exactly one doc (min id) per distinct content. Null-text docs all
    * pass through — unknown content cannot be asserted equal to anything.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = docs.filter(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    docs.filter(col(textCol).isNull)
      .unionByName(docs.join(keep, Seq(idCol), "left_semi"))
  }

  /** MinHash signatures: (id, h0..h15) — two narrow projections, no shuffle.
    *
    * The shingle array is materialized in its own projection first: inlining
    * the shingle expression into all 16 signature columns would re-tokenize
    * and re-shingle every document 16 times (measured 16× slowdown).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    // one-pass native expression; bit-identical to composedMinhashSignatures
    val sig = docs.select(col(idCol),
      graft.functions.GraftFunctions.minhash_signature(col(textCol), k).as("_sig"))
    sig.select(col(idCol) +: (0 until TextOps.NumPerms).map(p =>
      element_at(col("_sig"), p + 1).as(s"h$p")): _*)
  }

  /** Declarative reference implementation of [[minhashSignatures]] (kept for
    * the equivalence spec + as documentation of the signature definition).
    */
  def composedMinhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
      array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), k)).as("_sh"))
    val hb = sh.select(col(idCol), TextOps.baseHashes(col("_sh")).as("_hb"))
    hb.select(col(idCol) +: TextOps.minhashCols(col("_hb")): _*)
  }

  /** LSH candidate near-duplicate pairs: docs sharing at least one band
    * signature, a < b. The self-join is per-(band, signature) bucket.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val banded = bandedSigs(docs, idCol, textCol, k)
    val a = banded.select(col("band"), col("sig"), col(idCol).as("a"))
    val b = banded.select(col("band"), col("sig"), col(idCol).as("b"))
    a.join(b, Seq("band", "sig")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Duplicate clusters from verified near-dup pairs: connected components
    * via driver-side union-find, returning (member → representative=min id).
    *
    * Scale note: the PAIR LIST is the small output of LSH+verification
    * (near-dup edges), not the corpus — collecting it is O(duplicates), the
    * standard shape for dedup-group resolution. For pathological duplicate
    * volumes use [[clustersDistributed]] (large-star/small-star, fully
    * distributed, equivalence-tested against this); the contract (min-id
    * representative) is identical.
    */
  def clusters(pairs: DataFrame, aCol: String = "a", bCol: String = "b")
      : Map[Long, Long] = {
    val edges = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    // iterative find + path compression: recursion would overflow the stack
    // on long parent chains (edges arriving in descending-id order)
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElseUpdate(root, root) != root) root = parent(root)
      var cur = x
      while (parent(cur) != root) { val next = parent(cur); parent(cur) = root; cur = next }
      root
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  /** Distributed connected components over the near-dup edge list — the
    * large-star/small-star alternation (a public MapReduce-era algorithm:
    * alternate (1) pointing every larger neighbor at the neighborhood
    * minimum and (2) contracting each node's smaller neighbors onto that
    * minimum, until the edge set is a fixed star forest). Both steps are
    * plain groupBy + join rounds, shuffle O(edges), converging in O(log)
    * alternations — so pathological duplicate volumes never touch the
    * driver. This is the scale swap-path documented on [[clusters]]; the
    * contract is identical: (member, rep = component min id), one row per
    * node incl. the representative itself.
    */
  def clustersDistributed(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
      maxRounds: Int = 20): DataFrame = {
    def largeStar(e: DataFrame): DataFrame = {
      val s = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = s.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      s.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val o = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val mins = o.groupBy("u").agg(min("v").as("m"))
      o.join(mins, "u")
        .select(explode(array(
          struct(col("u").as("n"), col("m")),
          struct(col("v").as("n"), col("m")))).as("x"))
        .select(col("x.n").as("u"), col("x.m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    var cur = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint() // iterative algorithm: cut lineage every round
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(cur)).localCheckpoint()
      converged = next.count() == cur.count() && next.exceptAll(cur).isEmpty
      cur = next
      round += 1
    }
    require(converged, s"connected components did not converge in $maxRounds rounds")
    cur.select(col("u").as("member"), col("v").as("rep"))
      .unionByName(cur.select(col("v").as("member"), col("v").as("rep")))
      .distinct()
  }

  /** Exact k-shingle Jaccard for given candidate pairs (columns a, b). */
  def jaccardOnPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
      array_distinct(TextOps.shingles(TextOps.tokens(col(textCol)), k)).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("a"), col("sh").as("sha")), Seq("a"))
      .join(sh.select(col(idCol).as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("jaccard"))
  }

  /** LSH CALIBRATION REPORT — for every banded candidate pair, the
    * MinHash-ESTIMATED Jaccard (the fraction of equal signature
    * components — what the sketch believes) next to the EXACT shingle
    * Jaccard, with the absolute error. This is the table an engineer
    * reads to pick permutation/band/row counts: if the estimator is
    * biased or the error spread is wide at the dedup threshold, the
    * banding misroutes pairs. Everything is deterministic (signatures
    * are exact integers, both fractions are single IEEE divisions), so
    * the whole report hash-matches. Cost rides the already-bucketed
    * candidate set — never all pairs.
    */
  def lshCalibration(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val pairs = minhashCandidatePairs(docs, idCol, textCol, k)
    val sig = docs.select(col(idCol),
      graft.functions.GraftFunctions.minhash_signature(col(textCol), k)
        .as("_sig"))
    val est = pairs
      .join(sig.select(col(idCol).as("a"), col("_sig").as("_sa")), Seq("a"))
      .join(sig.select(col(idCol).as("b"), col("_sig").as("_sb")), Seq("b"))
      .select(col("a"), col("b"),
        (aggregate(
          zip_with(col("_sa"), col("_sb"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).cast("double") /
          TextOps.NumPerms).as("est_jaccard"))
    jaccardOnPairs(pairs, docs, idCol, textCol, k)
      .join(est, Seq("a", "b"))
      .select(col("a"), col("b"), col("est_jaccard"), col("jaccard"),
        abs(col("est_jaccard") - col("jaccard")).as("abs_err"))
  }

  /** CONTRASTIVE TRIPLET MINING — (anchor, positive, hard_negative)
    * training rows for an embedding model, both mates drawn from the LSH
    * candidate machinery: positives are bucket-mates whose exact Jaccard
    * clears `threshold`; HARD negatives are bucket-mates that FAILED the
    * verify — lexically close enough to collide in a band, provably not
    * duplicates: exactly the near-miss examples contrastive training
    * wants (random negatives are trivially easy). Per anchor the min-id
    * mate of each class; anchors lacking either class are dropped. All
    * selection is (id)-ordered — deterministic, hash-exact.
    *
    * Scale shape: everything rides the banded candidate set; the per-
    * anchor picks are two partial-agg'd min_by aggregations + one join.
    */
  def contrastiveTriplets(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val scored = jaccardOnPairs(
      minhashCandidatePairs(docs, idCol, textCol, k), docs, idCol, textCol, k)
    val sym = scored.select(col("a").as("anchor"), col("b").as("mate"),
        col("jaccard"))
      .unionByName(scored.select(col("b").as("anchor"), col("a").as("mate"),
        col("jaccard")))
    def pick(df: DataFrame, mateName: String, jName: String) =
      df.groupBy(col("anchor"))
        .agg(min_by(struct(col("mate"), col("jaccard")), col("mate")).as("_m"))
        .select(col("anchor"), col("_m.mate").as(mateName),
          col("_m.jaccard").as(jName))
    pick(sym.filter(col("jaccard") >= threshold), "positive", "pos_jaccard")
      .join(pick(sym.filter(col("jaccard") < threshold),
        "hard_negative", "neg_jaccard"), Seq("anchor"))
  }

  /** The banded-signature relation behind [[minhashCandidatePairs]]:
    * (id, band, sig), one row per non-null band signature.
    */
  private def bandedSigs(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, k)
    sigs.select(col(idCol) +: TextOps.bandCols(): _*)
      .select(col(idCol),
        posexplode(array((0 until TextOps.NumBands).map(b => col(s"band$b")): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")
      .filter(col("sig").isNotNull) // shorter-than-k docs have no signature
  }

  /** Passage-level (sub-document) exact dedup: each document is chunked into
    * fixed `blockTokens`-token passages (complete blocks only; the tail
    * fragment is not a passage), every passage is content-hashed, and a
    * passage occurrence is a DUPLICATE unless it is the globally FIRST
    * occurrence of that content — "first" by (doc id, slot), a total order,
    * so the flag is deterministic on every engine and partitioning.
    *
    * This is the boilerplate-removal stage between whole-document dedup and
    * near-dup detection: headers, license blocks, and templated paragraphs
    * repeat across millions of documents that are NOT duplicates of each
    * other (Lee et al. 2022 establish the training-loss case for sub-document
    * dedup; the suffix-array construction there is replaced by fixed-block
    * hashing — the shuffle-friendly approximation).
    *
    * Returns one row per input doc: (id, n_tokens, n_passages,
    * n_dup_passages, kept_tokens = n_tokens − blockTokens·n_dup_passages).
    *
    * Scale shape: one narrow explode to (id, slot, hash) — never the passage
    * TEXT (hashes travel, 16 bytes vs block text); one hash-keyed
    * aggregation for the first-occurrence winner (min over a (id, slot)
    * struct — partial-aggregated, no per-hash sort, no window); one
    * hash-equi-join back; one per-doc aggregation. Shuffles are O(blocks),
    * all partial-agg'd map-side.
    */
  def passageStats(docs: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 20): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be positive: $blockTokens")
    val base = docs.select(col(idCol),
        TextOps.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), size(col("_toks")).cast("long").as("n_tokens"),
        col("_toks"))
    val blocks = base
      .select(col(idCol), posexplode(
        when(size(col("_toks")) < blockTokens, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0L),
              floor(size(col("_toks")) / lit(blockTokens)).cast("long") - 1),
            i => array_join(slice(col("_toks"),
              (i * blockTokens + 1).cast("int"), lit(blockTokens)), " ")))))
      .select(col(idCol), col("pos").as("slot"), md5(col("col")).as("h"))
    val winners = blocks
      .groupBy(col("h"))
      .agg(min(struct(col(idCol), col("slot"))).as("w"))
    val flagged = blocks.join(winners, Seq("h"))
      .select(col(idCol),
        (col(s"w.$idCol") =!= col(idCol) || col("w.slot") =!= col("slot"))
          .cast("long").as("dup"))
    val perDoc = flagged.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_passages"), sum(col("dup")).as("n_dup_passages"))
    base.select(col(idCol), col("n_tokens"))
      .join(perDoc, Seq(idCol.toString), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_passages"), lit(0L)).as("n_passages"),
        coalesce(col("n_dup_passages"), lit(0L)).as("n_dup_passages"),
        (col("n_tokens") -
          lit(blockTokens.toLong) * coalesce(col("n_dup_passages"), lit(0L)))
          .as("kept_tokens"))
  }

  /** Cross-corpus decontamination: training docs that near-duplicate an
    * EVAL/benchmark doc — the pair every training pipeline must find before
    * the eval score means anything. Returns (a = train id, b = eval id,
    * jaccard) for verified pairs with jaccard ≥ `minJaccard`.
    *
    * Same LSH dataflow as [[minhashCandidatePairs]], but the bucket join is
    * strictly ACROSS the two corpora: a bucket holding t train docs and e
    * eval docs yields t·e candidates instead of (t+e)², and train–train /
    * eval–eval pairs are never generated at all. Exact Jaccard verification
    * then runs only on the surviving cross pairs. At 100 TB train × 1 GB
    * eval, the eval side's banded signatures are tiny — the join
    * broadcast-sides them automatically under AQE.
    *
    * Requires disjoint id spaces: the verify join resolves both sides'
    * texts from the tagged union by id, so a shared id would be ambiguous.
    */
  def crossCorpusNearDups(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, k: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val a = bandedSigs(train, idCol, textCol, k)
      .select(col("band"), col("sig"), col(idCol).as("a"))
    val b = bandedSigs(eval, idCol, textCol, k)
      .select(col("band"), col("sig"), col(idCol).as("b"))
    val pairs = a.join(b, Seq("band", "sig")).select("a", "b").distinct()
    jaccardOnPairs(pairs, train.unionByName(eval), idCol, textCol, k)
      .filter(col("jaccard") >= minJaccard)
  }

  /** Exact n-gram overlap decontamination — the membership complement of
    * [[crossCorpusNearDups]]'s similarity approach (the GPT-3-style "does
    * any training n-gram appear verbatim in the eval set" check; public
    * method, Brown et al. 2020 appendix C use 13-grams). For every eval
    * document: how many of its n-grams exist ANYWHERE in the training
    * corpus, as a count and a fraction.
    *
    * Returns one row per eval doc: (id, n_grams, n_overlap, overlap_frac
    * — null when the doc is shorter than n tokens).
    *
    * Scale shape: both sides reduce to 32-char md5 keys BEFORE any join —
    * gram text never shuffles; the train side collapses to its DISTINCT
    * gram set (partial-agg'd), the membership probe is one hash equi-join,
    * and the per-doc rollup is a second partial-agg'd count. Shuffle
    * O(distinct train grams + eval gram occurrences). The fraction is one
    * bigint/bigint IEEE divide, identical on every engine.
    */
  def ngramOverlap(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    ngramOverlapFrom(gramKeys(train, idCol, textCol, n).select("g"),
      eval, idCol, textCol, n)

  /** [[ngramOverlap]] with a Bloom runtime filter ([[RuntimeFilter.prune]])
    * over the EVAL gram set applied to the train side BEFORE its distinct.
    *
    * Why: plain [[ngramOverlap]]'s dominant exchange is the train-side
    * `distinct()` — it shuffles O(train gram occurrences), i.e. it scales
    * with the TRAINING corpus, the one side that is 100 TB. The eval set is
    * tiny by construction (a benchmark suite), so its gram set fits a
    * kilobytes-sized Bloom bitset; probing it map-side BEFORE the distinct's
    * exchange means only eval-adjacent train grams (+ ε false positives)
    * ever shuffle — O(eval-adjacent), not O(train).
    *
    * Bit-identical to [[ngramOverlap]] on every input: a pruned-away train
    * gram cannot match any eval gram (Bloom has no false negatives), and a
    * false positive merely survives to the exact equi-join, which discards
    * it — pinned in DedupSpec alongside the shrink itself.
    *
    * Size `numBits` for the expected DISTINCT eval grams (~10 bits/gram
    * ⇒ <1% false positives at the default 5 hashes).
    */
  def ngramOverlapPruned(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int, numBits: Int = 1 << 20,
      numHashes: Int = 5): DataFrame = {
    val evalGrams = gramKeys(eval, idCol, textCol, n).select("g")
    val trainGrams = gramKeys(train, idCol, textCol, n).select("g")
    ngramOverlapFrom(
      RuntimeFilter.prune(trainGrams, evalGrams, "g", "g", numBits, numHashes),
      eval, idCol, textCol, n)
  }

  /** (id, g = md5(n-gram)) pairs of a corpus — the pre-shuffle projection
    * both overlap variants (and their specs) share.
    */
  private[operators] def gramKeys(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    df.select(col(idCol),
      explode(TextOps.shingles(TextOps.tokens(col(textCol)), n)).as("_g"))
      .select(col(idCol), md5(col("_g")).as("g"))
  }

  /** Shared tail of the overlap variants: distinct the (possibly pruned)
    * train gram keys, probe eval grams with one hash equi-join, roll up
    * per eval doc.
    */
  private def ngramOverlapFrom(trainGramKeys: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val trainGrams = trainGramKeys.distinct().withColumn("_hit", lit(1L))
    val perDoc = gramKeys(eval, idCol, textCol, n)
      .join(trainGrams, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_overlap"))
    eval.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (col("n_overlap").cast("double") / col("n_grams").cast("double"))
          .as("overlap_frac"))
  }

  /** Corpus n-gram novelty: per document, how many of its DISTINCT n-grams
    * first appear in THIS document, scanning the corpus in ascending id
    * order — the memorization-pressure signal curation pipelines threshold
    * on (a document whose grams are mostly old adds repetition, not
    * information; Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", measure exactly this overlap class).
    *
    * Returns one row per input doc: (id, n_grams, n_novel, novelty_frac),
    * `novelty_frac` null for docs below `n` tokens (no grams — same
    * convention as [[ngramOverlap]]).
    *
    * Scale shape: [[passageStats]]'s dataflow over gram keys — one explode
    * to md5 keys (gram TEXT never shuffles), a partial-agg'd min-id winner
    * per gram, one hash equi-join back, one per-doc rollup. Shuffles are
    * O(distinct (doc, gram)) 16-byte keys.
    */
  def noveltyStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 4): DataFrame = {
    val grams = gramKeys(docs, idCol, textCol, n)
      .select(col(idCol), col("g")).distinct()
    val first = grams.groupBy(col("g")).agg(min(col(idCol)).as("_first"))
    val perDoc = grams.join(first, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum((col("_first") === col(idCol)).cast("long")).as("n_novel"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol.toString), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty_frac"))
  }

  /** Hash-family salt for winnowing gram hashes (shared with the oracle). */
  private val WinnowSalt = 7

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, "Winnowing: Local
    * Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
    * algorithm): the substring-level dedup layer between fixed-block
    * passage dedup ([[passageStats]], which misses shifted copies) and full
    * n-gram membership ([[ngramOverlap]], which keeps every gram).
    *
    * Per document: hash every `k`-token gram, slide a window of `w`
    * consecutive gram hashes, keep each window's minimum hash (rightmost
    * position on ties — the paper's rule, which makes the selection a
    * deterministic function of content). Returns one row per distinct
    * selected `(pos, fp)`: the document's fingerprint sketch.
    *
    * The guarantee (the paper's Theorem): any shared token run of length
    * ≥ `w + k − 1` yields at least one shared fingerprint, while only
    * ~`2/(w+1)` of all gram hashes are kept. That is what block hashing
    * cannot promise — a one-token shift breaks every block boundary but
    * shifts winnowing's windows WITH the content.
    *
    * Scale shape: the whole selection is ONE projection of array
    * intrinsics — tokens → gram-hash structs → per-window fold —
    * zero shuffles, document-length-bounded memory, O(n·w) work per doc
    * (the paper's O(n) deque does not fit an expression tree; w is a
    * small constant). Only the selected `(id, pos, fp)` rows — ~2n/(w+1)
    * longs, never text — leave the projection.
    *
    * Each intermediate array is LET-BOUND via [[bind]]: the window fold
    * reads the gram-hash array ~3·nW times, and as plain chained selects
    * Catalyst's projection collapse would inline the tokenize+shingle
    * expression at every one of those reads — O(n²·w) re-tokenization per
    * doc (observed: a single sf0.01 partition pinned a core for 10+ min).
    * A lambda variable is evaluated once per row no matter how often the
    * body reads it.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4): DataFrame = {
    docs.select(col(idCol), explode(winnowedCol(textCol, k, w)).as("_f"))
      .select(col(idCol), col("_f.pos").as("pos"), col("_f.fp").as("fp"))
  }

  /** The winnowing selection as a single projection column:
    * array<struct<fp,pos>> of the per-window minima (see
    * [[winnowFingerprints]] for the guarantee and the let-binding note).
    */
  private def winnowedCol(textCol: String, k: Int, w: Int): Column = {
    require(k > 0, s"k must be positive: $k")
    require(w > 1, s"w must be at least 2: $w")
    bind(TextOps.tokens(col(textCol)), toks =>
      bind(TextOps.shingles(toks, k), g =>
        bind(transform(g, (gram, i) => struct(
            TextOps.hex32(gram, WinnowSalt).as("fp"),
            i.cast("int").as("pos"))), hp =>
          // window j (0-based) covers hp[j+1 .. j+w] (1-based): fold with
          // the window's FIRST element as init — the same left fold the
          // oracle's list_reduce performs — taking the strictly-smaller
          // hash, or the larger position on equal hashes (rightmost min)
          when(size(hp) === 0, array().cast("array<struct<fp:bigint,pos:int>>"))
            .otherwise(array_distinct(transform(
              sequence(lit(0), greatest(size(hp) - (w - 1), lit(1)) - 1),
              j => aggregate(
                slice(hp, (j + 2).cast("int"), lit(w - 1)),
                element_at(hp, (j + 1).cast("int")),
                (a, x) => when(
                  x("fp") < a("fp") ||
                    (x("fp") === a("fp") && x("pos") > a("pos")),
                  x).otherwise(a))))))))
  }

  private def bind(value: Column, body: Column => Column): Column =
    TextOps.bind(value, body)

  /** Document pairs sharing ≥ `minShared` winnowing fingerprints — the
    * shift-tolerant overlap detector ([[winnowFingerprints]] for the
    * selection and its guarantee).
    *
    * Fingerprints held by more than `maxDf` documents are dropped before
    * pairing (the paper's shared-boilerplate filter); at scale this is also
    * the join's skew guard — the pair count within one fingerprint bucket
    * is capped at `maxDf²` instead of growing with the corpus. Pairing is
    * strictly bucket-local (one hash equi-join on `fp`), never all-pairs,
    * and carries only `(id, fp)` longs.
    */
  def winnowMatches(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, w: Int = 4, minShared: Long = 2,
      maxDf: Long = 50): DataFrame = {
    // per-document fingerprint SET computed MAP-SIDE (array_distinct over
    // the fp projection before the explode): the former global
    // `.distinct()` over (id, fp) was pure within-document dedup — id is
    // constant per exploded row — yet cost a full-volume shuffle keyed by
    // (id, fp), after which the join re-keyed the same volume by fp AGAIN.
    // The r14 1000× soak read ~30 GB of spill on exactly these exchanges.
    // Now the one full-volume exchange is keyed by fp up front and REUSED
    // by the hot-fp aggregate and both self-join sides (AQE stage reuse —
    // plan-pinned), so the corpus is tokenized once and shuffled once.
    val fps = docs.select(col(idCol), explode(array_distinct(
        transform(winnowedCol(textCol, k, w), x => x("fp")))).as("fp"))
      .repartition(col("fp"))
    val hot = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") > maxDf)
      .select(col("fp"))
    val cool = fps.join(hot, Seq("fp"), "left_anti")
    cool.as("x").join(cool.as("y"),
        col("x.fp") === col("y.fp") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Hash-family salt for repeat-interval gram hashes (shared with oracle). */
  val RepeatSalt = "35:"

  /** Exact repeated-substring detection (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * modality): per document, the maximal token intervals lying inside some
    * exact repeat of at least `minTokens` tokens occurring ANYWHERE else in
    * the corpus (another document, or another position of the same one).
    * This sits between [[passageStats]] (fixed non-overlapping blocks — a
    * repeat straddling a block boundary is invisible) and
    * [[winnowFingerprints]] (approximate, shift-tolerant): arbitrary-
    * length, arbitrary-alignment, and EXACT.
    *
    * Lee et al. build a suffix array — inherently sequential over the
    * corpus. The distributed restatement is duplicated-k-gram COVERAGE,
    * which is exact for this contract, not an approximation: a position p
    * lies inside a repeat of ≥ k tokens iff some k-gram containing p is
    * duplicated corpus-wide (⇐ the duplicated k-gram IS such a repeat;
    * ⇒ any ≥ k repeat containing p has a duplicated k-gram over p). So
    * coverage = positions of duplicated k-grams widened by k−1, and the
    * emitted intervals are maximal runs of covered positions — two seed
    * positions chain iff they are ≤ k apart.
    *
    * Returns one row per repeat interval:
    * `(idCol, start_tok, end_tok, n_toks)`, token positions 0-based
    * inclusive, `n_toks ≥ minTokens`.
    *
    * Scale shape: one narrow explode to (id, pos, h) — 16-byte gram hashes
    * travel, never gram text; the duplicate filter is one hash-keyed
    * partial-agg'd count (shuffle O(tokens) hash rows — the same cost
    * class as the txt23/txt30 gram pipelines); one equi-join back on the
    * hash; then a PER-DOCUMENT window (keyed by id, never global) for the
    * island merge and one final per-(id, island) aggregation. Nothing is
    * quadratic and no suffix structure ever materializes.
    */
  def repeatIntervals(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 8): DataFrame = {
    require(minTokens > 0, s"minTokens must be positive: $minTokens")
    val k = minTokens
    val grams = gramPositions(docs, idCol, textCol, k)
    val dup = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
      .select(col("h"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    grams.join(dup, Seq("h"))
      .select(col(idCol), col("pos"))
      .withColumn("_brk",
        when(col("pos") - lag(col("pos"), 1).over(w) > k, 1L).otherwise(0L))
      .withColumn("_island", sum(col("_brk")).over(w))
      .groupBy(col(idCol), col("_island"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + (k - 1)).as("end_tok"))
      .select(col(idCol), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("n_toks"))
  }

  /** The corpus-REWRITING half of exact repeated-substring dedup
    * ([[repeatIntervals]] is the detection half): drop every token covered
    * by a repeat occurrence that is not the repeat's globally FIRST
    * occurrence — Lee et al.'s policy of keeping one copy of each repeated
    * span. "First" per duplicated k-gram is the minimum (doc, pos) pair (a
    * total order — deterministic on every engine and partitioning, the
    * txt30 min-id-winner discipline): the earliest document keeps its
    * text; later copies lose exactly the covered positions. Where
    * different repeats overlap, a position is dropped if ANY covering
    * duplicated gram is a non-first occurrence — deterministic, and
    * conservative in the right direction for training data (never keeps
    * two copies).
    *
    * Returns one row per input doc:
    * `(idCol, n_tokens, n_kept, n_dropped, kept_text)` — kept tokens
    * re-joined by single spaces in original order (empty string when
    * everything was dropped, e.g. a verbatim copy).
    *
    * Scale shape: [[repeatIntervals]]'s gram-hash dataflow plus a min-
    * struct winner per gram (partial-agg'd); the drop set explodes k rows
    * per NON-FIRST duplicated occurrence (bounded by k·dup-occurrences,
    * not corpus size) and anti-joins the token stream; reassembly is one
    * per-doc aggregation of (pos, token) structs. Token text travels only
    * in the final reassembly — the dedup decision path carries hashes and
    * positions.
    */
  def dropRepeats(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 8): DataFrame = {
    require(minTokens > 0, s"minTokens must be positive: $minTokens")
    val k = minTokens
    val base = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("_t"))
    val grams = gramPositions(docs, idCol, textCol, k)
    val winners = grams.groupBy(col("h"))
      .agg(min(struct(col(idCol).as("wid"), col("pos").as("wpos"))).as("w"),
        count(lit(1)).as("_n"))
      .filter(col("_n") > 1)
      .select(col("h"), col("w.wid").as("wid"), col("w.wpos").as("wpos"))
    val dropped = grams.join(winners, Seq("h"))
      .filter(!(col(idCol) === col("wid") && col("pos") === col("wpos")))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .distinct()
    val toks = base
      .select(col(idCol), posexplode(col("_t")))
      .select(col(idCol), col("pos").cast("long").as("p"), col("col").as("tok"))
    val kept = toks.join(dropped, Seq(idCol, "p"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(p, tok))), x -> x.tok)"),
          " ").as("kept_text"))
    base.select(col(idCol), size(col("_t")).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Text SIMILARITY SEARCH — the query-time counterpart of the dedup
    * machinery: for each QUERY doc, the top-`k` most Jaccard-similar
    * corpus docs, found through the same LSH band buckets (so the search
    * only ever scores candidates that share a bucket with the query —
    * never the corpus). The retrieval analog of [[Similarity.knnBrute]]
    * for token space: near-dup lookup, citation finding,
    * retrieve-similar-training-examples.
    *
    * Recall caveat inherited from LSH: documents sharing NO band with the
    * query are invisible regardless of true similarity — band/row counts
    * tune the recall/cost point exactly as in [[minhashCandidatePairs]].
    * Requires disjoint id spaces (the [[crossCorpusNearDups]] contract).
    * Returns (query_id, neighbor_id, jaccard, rank), rank 1..k by
    * (jaccard desc, neighbor id).
    */
  def similarDocs(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val pairs = crossCorpusNearDups(corpus, queries, idCol, textCol,
      minJaccard = 0.0)
    val w = Window.partitionBy(col("b"))
      .orderBy(col("jaccard").desc, col("a"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("b").as("query_id"), col("a").as("neighbor_id"),
        col("jaccard"), col("rank"))
  }

  /** Near-dup cluster REWRITE — the actionable end of the near-dup
    * lifecycle: [[minhashCandidatePairs]] finds pairs,
    * [[clustersDistributed]] closes them into clusters, and this keeps
    * exactly ONE doc (the min-id representative) per cluster, dropping
    * every other member — turning the analysis into the deduplicated
    * corpus a pipeline actually trains on. Docs in no cluster pass
    * through untouched.
    *
    * Scale: the cluster map is O(docs-in-clusters) rows of two longs; the
    * final keep is one left-anti equi-join on the id — the corpus is
    * never compared pairwise (that already happened inside the banded
    * candidate machinery).
    */
  def clusterDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val reps = clustersDistributed(
      minhashCandidatePairs(docs, idCol, textCol))
    docs.join(
      reps.filter(col("member") =!= col("rep"))
        .select(col("member").as(idCol)),
      Seq(idCol), "left_anti")
  }

  /** FUZZY PAIR JOIN at edit distance ≤ 1 (FastSS deletion neighborhoods) —
    * typo-level entity matching, EXACT and complete: two strings are
    * within Levenshtein distance 1 iff their deletion neighborhoods
    * (`{s} ∪ {s minus character i}`) intersect — a substitution at `i`
    * makes both `minus-i` variants equal, an insertion/deletion makes one
    * string a member of the other's neighborhood, and `s` itself catches
    * duplicates. So the candidate set is ONE equi-join on neighborhood
    * strings (never all-pairs, never a similarity scan), and the built-in
    * `levenshtein` verify keeps no false positives.
    *
    * Returns (a, b, dist ∈ {0,1}) with a < b.
    *
    * Scale shape: |s|+1 variant rows per string, each a near-full-length
    * key — collisions happen only between near-identical strings, so
    * bucket occupancy follows real duplication, not corpus size. The
    * distance-k generalization (all k-deletion subsets) trades k-th-power
    * fan-out for the same completeness; k = 1 is the typo sweet spot.
    */
  def fuzzyPairsEd1(strs: DataFrame, idCol: String, strCol: String): DataFrame = {
    val s = col(strCol)
    val variants = strs.select(col(idCol).as("_id"), s.as("_s"),
        explode(concat(
          array(s),
          transform(sequence(lit(1), length(s)),
            i => concat(s.substr(lit(1), i - 1),
              s.substr(i + 1, length(s)))))).as("_v"))
    val a = variants.select(col("_id").as("a"), col("_s").as("_sa"), col("_v"))
    val b = variants.select(col("_id").as("b"), col("_s").as("_sb"), col("_v"))
    a.join(b, Seq("_v"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("_sa"), col("_sb")).distinct()
      .select(col("a"), col("b"), levenshtein(col("_sa"), col("_sb")).as("dist"))
      .filter(col("dist") <= 1)
  }

  /** QUALITY-AWARE cluster dedup — [[clusterDedup]] keeps the MIN-ID member
    * per near-dup cluster, which is arbitrary; production curation keeps
    * the BEST member (longest, highest quality score, freshest crawl).
    * The keeper per cluster is argmax(`qualityCol`), ties to the smallest
    * id (deterministic ⇒ hash-exact); docs in no cluster pass untouched.
    *
    * Same scale shape as [[clusterDedup]] — the pairwise work lives in the
    * banded LSH machinery; choosing keepers is one max_by per cluster
    * (clusters are two-column narrow rows) plus one anti-join back.
    */
  def clusterDedupByQuality(docs: DataFrame, idCol: String, textCol: String,
      qualityCol: String): DataFrame = {
    val clusters = clustersDistributed(
      minhashCandidatePairs(docs, idCol, textCol))
    val withQ = clusters.join(
      docs.select(col(idCol).as("member"), col(qualityCol).as("_q")),
      Seq("member"))
    val keepers = withQ.groupBy(col("rep"))
      .agg(max_by(col("member"), struct(col("_q"), -col("member"))).as("_keep"))
    val dropped = withQ.join(keepers, Seq("rep"))
      .filter(col("member") =!= col("_keep"))
      .select(col("member").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }

  /** Contamination REPORT — the decision table a decontamination run
    * actually ships: one row per EVAL doc combining the two independent
    * leak signals ([[ngramOverlapPruned]] exact n-gram membership and
    * [[crossCorpusNearDups]] LSH near-duplication) into a `contaminated`
    * verdict — either signal alone misses real leaks (verbatim quotes
    * shorter than a near-dup, paraphrases with few exact grams), which is
    * why production pipelines OR them. Columns: (id, n_grams, n_overlap,
    * overlap_frac, n_neardup, max_jaccard, contaminated).
    *
    * Scale: both signals already scale eval-shaped (the Bloom-pruned
    * overlap never shuffles O(train); the LSH bucket join generates only
    * cross pairs) and the final assembly is two left joins on the TINY
    * eval side.
    */
  def contaminationReport(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 4, overlapTau: Double = 0.5,
      minJaccard: Double = 0.5): DataFrame = {
    val ov = ngramOverlapPruned(train, eval, idCol, textCol, n)
    val hits = crossCorpusNearDups(train, eval, idCol, textCol,
        minJaccard = minJaccard)
      .groupBy(col("b").as(idCol))
      .agg(count(lit(1)).as("n_neardup"), max(col("jaccard")).as("max_jaccard"))
    ov.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"), col("n_overlap"), col("overlap_frac"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        col("max_jaccard"),
        (coalesce(col("overlap_frac"), lit(0.0)) >= overlapTau ||
          coalesce(col("n_neardup"), lit(0L)) > 0).as("contaminated"))
  }

  /** Per-source line-level boilerplate removal (the CCNet/RefinedWeb
    * "line-wise dedup" stage): within each source/domain, any LINE whose
    * content recurs in ≥ `minDf` distinct documents OF THAT SOURCE is
    * boilerplate (nav bars, cookie banners, footers — template text the
    * crawler stamped on every page) and EVERY occurrence is removed —
    * unlike [[passageStats]]' global keep-first, which would preserve one
    * copy of the banner. Lines here are fixed `lineTokens`-token blocks
    * including the ragged tail (boilerplate is as often a footer as a
    * header, so the tail block must participate).
    *
    * Returns one row per input doc:
    * (id, source, n_lines, n_dropped, kept_tokens, kept_text).
    *
    * Scale shape: the exploded stream is (source, id, slot, h) — 16-byte
    * hashes travel, never line text. Document frequency is a two-level
    * aggregation (distinct (source,h,id) partial-agg'd map-side, then a
    * count per (source,h)); the surviving hot set is bounded by the
    * volume of ACTUAL boilerplate (tiny next to the corpus) so the join
    * back broadcast-sides under AQE, degrading to a hash equi-join on
    * (source,h) if a domain's template set is ever huge. Reassembly is
    * per-doc LOCAL: each doc rebuilds its kept text from its own token
    * array, so the dedup decision stream shuffles only (id, slot) pairs;
    * the drop-sets usually broadcast onto the corpus (AQE), and when every
    * doc carries boilerplate they degrade to one id-equi-join — the single
    * unavoidable reassembly exchange.
    */
  def boilerplateRemove(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, lineTokens: Int = 10, minDf: Int = 3): DataFrame = {
    require(lineTokens > 0, s"lineTokens must be positive: $lineTokens")
    require(minDf > 1, s"minDf must exceed 1: $minDf")
    val L = lineTokens
    // one let-bound line array per doc (TextOps.bind: projection collapse
    // would otherwise re-tokenize per consumer — the txt28 O(n²) hazard)
    val linesOf: Column => Column = toks =>
      when(size(toks) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), ceil(size(toks) / lit(L.toDouble)).cast("int") - 1),
          i => array_join(slice(toks, i * L + 1, lit(L)), " ")))
    val base = docs.select(col(idCol), col(sourceCol),
      TextOps.bind(TextOps.tokens(col(textCol)), t => t).as("_toks"))
    val lines = base.select(col(idCol), col(sourceCol),
        posexplode(linesOf(col("_toks"))))
      .select(col(sourceCol), col(idCol), col("pos").as("slot"),
        md5(col("col")).as("h"))
    val hot = lines.select(col(sourceCol), col("h"), col(idCol)).distinct()
      .groupBy(col(sourceCol), col("h"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDf)
      .select(col(sourceCol), col("h"))
    val dropSets = lines.join(hot, Seq(sourceCol, "h"))
      .groupBy(col(idCol))
      .agg(collect_set(col("slot")).as("_drop"))
    base.join(dropSets, Seq(idCol), "left")
      .select(col(idCol), col(sourceCol), col("_toks"),
        coalesce(col("_drop"), array().cast("array<int>")).as("_drop"))
      .select(col(idCol), col(sourceCol),
        size(linesOf(col("_toks"))).cast("long").as("n_lines"),
        size(col("_drop")).cast("long").as("n_dropped"),
        TextOps.bind(
          array_join(filter(linesOf(col("_toks")),
            (_, i) => !array_contains(col("_drop"), i)), " "),
          kt => struct(
            size(TextOps.tokens(kt)).cast("long").as("kept_tokens"),
            kt.as("kept_text"))).as("_k"))
      .select(col(idCol), col(sourceCol), col("n_lines"), col("n_dropped"),
        col("_k.kept_tokens").as("kept_tokens"),
        col("_k.kept_text").as("kept_text"))
  }

  /** Shared (id, pos, h) gram projection of [[repeatIntervals]] /
    * [[dropRepeats]]: salted md5 of each k-token gram, 0-based start
    * position; docs shorter than k contribute nothing.
    */
  private def gramPositions(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_t"))
      .filter(size(col("_t")) >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), size(col("_t")) - k),
        i => md5(concat(lit(RepeatSalt),
          concat_ws(" ", slice(col("_t"), i + 1, lit(k))))))))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("col").as("h"))

  /** EXACT set-similarity join with PREFIX FILTERING (the PPJoin/AllPairs
    * family) — all document pairs whose token-set Jaccard ≥ `threshold`,
    * found WITHOUT all-pairs comparison and WITHOUT the recall loss of LSH
    * ([[minhashCandidatePairs]] trades recall for speed; this operator is
    * exact-complete at higher cost, the right tool when a dedup decision
    * must be provably exhaustive).
    *
    * The filter: order every document's tokens by GLOBAL rarity (ascending
    * document frequency, ties lexicographic — one canonical order for the
    * whole corpus), and take each document's first
    * `p = n − ⌈t·n⌉ + 1` tokens as its prefix. Any pair with
    * `J(A,B) ≥ t` must share at least one PREFIX token (the classic
    * AllPairs lemma: `J ≥ t` forces `|A∩B| ≥ ⌈t·n⌉`, and a shared set that
    * large cannot avoid both prefixes under a common total order) — so
    * the prefix-token equi-join generates a complete candidate set, and
    * the exact intersection verify keeps no false positives.
    *
    * Scale shape: candidates meet on RARE tokens by construction (the
    * prefix is the low-df end of the order), so bucket occupancy — hence
    * pair volume — is bounded by rare-token df, not corpus size; the df
    * table and sorted projections are two partial-agg'd aggregations; the
    * verify joins token arrays only for surviving candidates. Returns
    * (a, b, n_shared, jaccard) with a < b.
    */
  def setSimilarityJoin(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold in (0,1]: $threshold")
    val toks = docs
      .select(col(idCol).as("id"),
        array_distinct(TextOps.tokens(col(textCol))).as("tk"))
      .filter(size(col("tk")) > 0)
    val ex = toks.select(col("id"), explode(col("tk")).as("tok"))
    val df = ex.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sorted = ex.join(df, Seq("tok"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("st"))
      .select(col("id"),
        transform(col("st"), s => s.getField("tok")).as("ts"),
        size(col("st")).as("n"))
    val p = (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int")
    val pref = sorted.select(col("id"), col("n"),
      explode(slice(col("ts"), lit(1), p)).as("ptok"))
    val cand = pref.select(col("id").as("a"), col("n").as("na"), col("ptok"))
      .join(pref.select(col("id").as("b"), col("n").as("nb"), col("ptok")),
        Seq("ptok"))
      .filter(col("a") < col("b"))
      // PPJoin's LENGTH filter, applied where pairs are born: J ≥ t forces
      // |A∩B| ≥ t·|A∪B| ≥ t·max(n), and |A∩B| ≤ min(n), so any qualifying
      // pair has min(n) ≥ t·max(n). Cross-length candidates never reach
      // the distinct or the token-array-carrying verify joins — the verify
      // shuffle (fat ta/tb rows re-keyed by b) is this operator's dominant
      // spill term at the 1000× soak, and its volume is the lever. The
      // 1e-9 slack keeps one-ulp borderline pairs for the EXACT final
      // jaccard filter to decide (this filter may only ever prune).
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")).cast("double") - 1e-9)
      .select(col("a"), col("b")).distinct()
    val byId = sorted.select(col("id"), col("ts"), col("n"))
    cand
      .join(byId.select(col("id").as("a"), col("ts").as("ta"), col("n").as("na")),
        Seq("a"))
      .join(byId.select(col("id").as("b"), col("ts").as("tb"), col("n").as("nb")),
        Seq("b"))
      .withColumn("n_shared", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("jaccard", col("n_shared").cast("double") /
        (col("na") + col("nb") - col("n_shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("n_shared"), col("jaccard"))
  }
}
