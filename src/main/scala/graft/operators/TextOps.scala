package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines: tokenization,
  * shingling, deterministic 32-bit hashing — all composed from codegen'd
  * built-in functions (no UDFs), so they run inside whole-stage codegen and
  * their semantics are restatable in the DuckDB oracle.
  *
  * Hashing is md5-based (not Spark's murmur `hash()`) deliberately: md5 is
  * identical everywhere, which makes MinHash/SimHash signatures portable
  * across engines — the same property the reference gets from Avro-encoded
  * keys hashed by Kafka's fixed murmur2 partitioner (README.md:384–398).
  */
object TextOps {

  /** Let-binding for expression trees: evaluates `value` ONCE per row and
    * hands the body a lambda variable — however many times the body reads
    * it, the producer never re-evaluates. Spark has no `let`, but a
    * single-element `transform` is one: the higher-order function evaluates
    * its argument array once, then the lambda over its (single) element.
    * This is the projection-collapse-proof alternative to chained selects
    * when the consumer references the producer many times (Catalyst inlines
    * across Projects it collapses, duplicating the producer expression —
    * [[Dedup.winnowFingerprints]] went O(n²) per document that way).
    * Works for any value type: `array(value)` wraps scalars and structs
    * alike, and the element type is preserved.
    */
  def bind(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** k-word shingles (k consecutive tokens joined by one space); empty array
    * for docs shorter than k tokens (sequence(0,-1) would count DOWN).
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))

  /** BPE-ish regex tokenization counts (word/letter-chunk/number tokens).
    * Patterns are plain character classes so Java regex (Spark) and RE2
    * (DuckDB oracle) agree.
    */
  val WordPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  val SubwordPattern = "[a-z]{1,4}"
  val NumberPattern = "[0-9]+"

  def bpeCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(WordPattern), lit(0))).as("n_words"),
    size(regexp_extract_all(text, lit(SubwordPattern), lit(0))).as("n_subwords"),
    size(regexp_extract_all(text, lit(NumberPattern), lit(0))).as("n_numbers"))

  /** First 32 bits of md5(salt:s) as a long — the portable hash family
    * H_salt(s) used for MinHash permutations and SimHash.
    */
  def hex32(s: Column, salt: Int): Column =
    conv(substring(md5(concat(lit(s"$salt:"), s)), 1, 8), 16, 10).cast("long")

  /** One learned BPE merge. */
  final case class BpeMerge(rank: Int, left: String, right: String,
      merged: String, pair_count: Long)

  /** Persist a learned merge table — the tokenizer ARTIFACT: training runs
    * once over the corpus, the merges ship to every downstream job
    * (encode, token budgeting, packing) as a tiny parquet. One file: the
    * table is `merges` rows by construction.
    */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[BpeMerge], dir: String): Unit = {
    import spark.implicits._
    merges.toDS().coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a merge table saved by [[saveVocab]], re-validating the BPE
    * contract (ranks dense from 0, merged = left+right) so a corrupt or
    * truncated vocab fails at LOAD — not as mis-segmented text three jobs
    * downstream.
    */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[BpeMerge] = {
    import spark.implicits._
    val merges = spark.read.parquet(dir).as[BpeMerge].collect()
      .sortBy(_.rank).toSeq
    merges.zipWithIndex.foreach { case (m, i) =>
      require(m.rank == i && m.merged == m.left + m.right,
        s"corrupt vocab at $dir: rank ${m.rank} at position $i " +
          s"('${m.left}'+'${m.right}' vs '${m.merged}')")
    }
    merges
  }

  /** Deterministic shard assignment — the data-loader EXPORT step after
    * sampling (txt26) and packing (txt25): shard = salted hash of the id,
    * in-shard position = rank by (hash, id). The hash order IS the
    * training shuffle — deterministic across reruns, engines, and cluster
    * sizes, so shard files are reproducible artifacts and a resumed run
    * reads byte-identical order. One exchange keyed by shard; the
    * position window runs inside that same partitioning (no second
    * exchange, and a shard's rows sort in one task — shards are sized for
    * a data-loader worker, far below a partition's capacity).
    */
  def shardAssign(docs: org.apache.spark.sql.DataFrame, idCol: String,
      nShards: Int, salt: Int = 13): org.apache.spark.sql.DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("hv"), col(idCol))
    docs.select(col(idCol), hex32(col(idCol).cast("string"), salt).as("hv"))
      .withColumn("shard", pmod(col("hv"), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("shard"), col("pos"), col(idCol))
  }

  /** Apply a learned merge table to the corpus — the ENCODE half of the
    * tokenizer ([[bpeTrain]] is the train half): each word starts as
    * characters and repeatedly applies the LOWEST-RANK applicable merge
    * (leftmost occurrence first) until none applies — the standard BPE
    * encode order, which makes segmentation independent of corpus order
    * and identical for identical words.
    *
    * Returns per-doc `(idCol, n_words, n_chars, n_symbols)` — the token
    * count under the learned vocabulary, the number an LLM pipeline
    * budgets with. Invariants (the gate's self-validation): symbol
    * concatenation restores every word (checked here — a violation throws,
    * poisoning the gate to zero rows), and n_symbols decreases from
    * n_chars by exactly the number of merge applications.
    *
    * Scale shape: the merge table is driver-side and tiny (its whole
    * point); it broadcasts in the closure and encoding is one narrow map —
    * no shuffle until the per-doc count aggregation.
    */
  def bpeEncode(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[BpeMerge])
      : org.apache.spark.sql.DataFrame = {
    val rank = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        var nSyms = 0L
        var nChars = 0L
        words.foreach { w =>
          var s = w.map(_.toString).toVector
          nChars += s.length
          var done = false
          while (!done && s.length > 1) {
            // lowest-rank applicable merge, leftmost occurrence
            val best = s.indices.dropRight(1)
              .flatMap(i => rank.get((s(i), s(i + 1))).map(r => (r, i)))
              .sortBy(identity).headOption
            best match {
              case Some((_, i)) =>
                s = (s.take(i) :+ (s(i) + s(i + 1))) ++ s.drop(i + 2)
              case None => done = true
            }
          }
          require(s.mkString == w, s"encode must restore '$w'")
          nSyms += s.length
        }
        (id, words.length.toLong, nChars, nSyms)
      }
      .toDF(idCol, "n_words", "n_chars", "n_symbols")
  }

  /** Distributed BPE tokenizer training (Sennrich et al. 2016): learn
    * `merges` byte-pair merges from the corpus — the tokenizer-training
    * pass every LLM pipeline runs over its own data before token counting
    * means anything. Words start as character sequences (word-internal
    * merges only, the standard formulation); each round counts ADJACENT
    * symbol pairs corpus-wide, picks the most frequent (ties broken
    * lexicographically — deterministic across engines and partitionings),
    * and rewrites every word. Returns the merge table in rank order.
    *
    * Scale shape: the corpus collapses ONCE to the weighted vocabulary
    * (distinct word, occurrence count) — the classic BPE-trainer move, and
    * the 100 TB lever: every later pass is O(|vocab|), not O(corpus), and
    * vocabulary grows sublinearly in corpus size. Each round is then one
    * weight-summed adjacent-pair count over the vocab (shuffle O(distinct
    * pairs), partial-agg'd) → a bounded sort-take-1 to the driver (one
    * row) → a map over vocab entries with the chosen pair broadcast in the
    * closure; localCheckpoint between rounds keeps the lineage from
    * growing by one map per round. Counts are identical to the unweighted
    * formulation by construction.
    */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
      merges: Int): Seq[BpeMerge] = {
    require(merges > 0, s"merges must be positive: $merges")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].map { case (w, n) => (w.map(_.toString).toArray, n) }
      .localCheckpoint()
    val out = Seq.newBuilder[BpeMerge]
    for (rank <- 0 until merges) {
      val top = vocab.flatMap { case (s, wgt) =>
          s.indices.dropRight(1).map(i => ((s(i), s(i + 1)), wgt)) }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _).toDF("pair", "n")
        .orderBy(col("n").desc, col("pair._1"), col("pair._2"))
        .as[((String, String), Long)].take(1)
      top.headOption match {
        case Some(((a, b), n)) if n > 0 =>
          out += BpeMerge(rank, a, b, a + b, n)
          vocab = vocab.map { case (s, wgt) =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                buf += a + b; i += 2
              } else { buf += s(i); i += 1 }
            }
            (buf.toArray, wgt)
          }.localCheckpoint()
        case _ => return out.result()
      }
    }
    out.result()
  }

  /** Deterministic hash bucket for train/val/test splitting: hex32 of the
    * salted id, mod nBuckets. Hash-based (not random) on purpose — the split
    * is STABLE across runs, engines and cluster sizes, so a document never
    * migrates between train and eval sets when the corpus is re-processed
    * (the property `sample()`/`rand()` cannot give you at 100 TB).
    */
  def splitBucket(id: Column, salt: Int, nBuckets: Int): Column =
    hex32(id.cast("string"), salt) % nBuckets

  /** Standard 80/10/10 label over a 10-bucket split. */
  def splitLabel(bucket: Column): Column =
    when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")

  /** Normalization for training-text cleanup, composed from codegen'd
    * built-ins: drop every char outside [a-z0-9 ], collapse runs of spaces,
    * trim. Character-class regexes only, so Java regex (Spark) and RE2
    * (DuckDB oracle) agree.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "[^a-z0-9 ]", ""), " +", " "))

  /** PORTER-LITE SUFFIX STEMMING — the first-rules subset of Porter's
    * step 1 (sses→ss, ies→i, ss kept, trailing s dropped, -ing / -ed
    * stripped when a long-enough stem remains), as ONE deterministic CASE
    * chain over string primitives both engines share (LIKE, substring,
    * length) — no stemmer library, no UDF, bit-identical across engines.
    * Collapses inflection so counting/dedup/retrieval see one type where
    * raw text has five; rule order is the contract (first match wins).
    * Uses [[bind]] so the token expression is evaluated once, not once
    * per rule.
    */
  def stemLite(tok: Column): Column = bind(tok, { t =>
    def drop(n: Int) = t.substr(lit(1), length(t) - n)
    when(t.like("%sses"), drop(2))
      .when(t.like("%ies"), drop(2))
      .when(t.like("%ss"), t)
      .when(t.like("%s") && length(t) > 3, drop(1))
      .when(t.like("%ing") && length(t) > 5, drop(3))
      .when(t.like("%ed") && length(t) > 4, drop(2))
      .otherwise(t)
  })

  /** PII patterns for redaction scrubbing. Character classes + bounded
    * quantifiers + \b only, so Java regex (Spark) and RE2 (DuckDB oracle)
    * agree. Order matters and is part of the contract: emails first (their
    * local part may contain digits a later pass would misread), then IPs
    * (dotted — disjoint from dashed phones), then phones.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Pattern  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** Redact emails → `<email>`, IPv4s → `<ip>`, phone numbers → `<phone>`,
    * in that order. One projection, three codegen'd regexp_replace passes —
    * no UDF, no shuffle; the standard pre-training scrub.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<email>"),
        Ipv4Pattern, "<ip>"),
      PhonePattern, "<phone>")

  /** Number of MinHash permutations / band layout (4 bands × 4 rows). */
  val NumPerms = 16
  val NumBands = 4
  val RowsPerBand: Int = NumPerms / NumBands

  /** Mersenne-31 modulus for the affine permutation family. */
  val MinhashMod = 2147483647L

  /** Affine permutation p of a base hash: (a_p·h + b_p) mod M with
    * a_p = 2p+1 (odd), b_p = 12345p+678. One md5 per shingle + 16 cheap
    * integer transforms, instead of 16 md5s per shingle (16× less hashing —
    * the standard universal-hash-family MinHash construction).
    */
  def permute(h: Column, p: Int): Column =
    (lit(2L * p + 1) * (h % MinhashMod) + lit(12345L * p + 678)) % MinhashMod

  /** Base-hash array for a shingle array (one md5 each, salt 0). */
  def baseHashes(shingleArr: Column): Column =
    transform(shingleArr, s => hex32(s, 0))

  /** MinHash signature columns h0..h15 from a *materialized* base-hash array
    * column: signature_p = min over shingles of permute_p(base hash).
    */
  def minhashCols(baseHashArr: Column): Seq[Column] =
    (0 until NumPerms).map { p =>
      array_min(transform(baseHashArr, h => permute(h, p))).as(s"h$p")
    }

  /** Band signature strings from the h0..h15 columns (LSH: docs sharing any
    * band signature become candidate pairs).
    *
    * `concat` (not concat_ws) on purpose: docs shorter than k tokens have
    * all-NULL signature mins, and concat propagates the NULL — concat_ws
    * would silently collapse every short doc to the same "" signature,
    * making them all-pairs candidates of each other. NULL bands are dropped
    * before the bucket join.
    */
  def bandCols(): Seq[Column] =
    (0 until NumBands).map { b =>
      concat((0 until RowsPerBand).flatMap(r =>
        Seq(col(s"h${b * RowsPerBand + r}").cast("string"), lit("_"))): _*).as(s"band$b")
    }

  /** Token-budget mixture sampling — the data-mixing step of a pretraining
    * pipeline: given target WEIGHTS per source and a total token budget,
    * sample each source down to its share. Per-source acceptance fraction
    * `f_s = min(1, budget·w_s / tokens_s)`; a document is kept iff its
    * salted 32-bit hash falls below `floor(f_s · 2^32)` — the [[splitBucket]]
    * discipline, so the SAME documents are selected on every run, engine,
    * and cluster size (`sample()`/`rand()` cannot give you that), and the
    * threshold comparison is integer, so the only cross-engine surface is
    * one IEEE multiply/divide chain both engines compute identically.
    *
    * Scale shape: per-source token totals are ONE partial-agg'd aggregate
    * over a tiny source dimension; thresholds broadcast back and acceptance
    * is a map-side filter — the corpus is never shuffled. Sources without a
    * weight are dropped (inner join against the weight table).
    */
  def sampleMixture(docs: org.apache.spark.sql.DataFrame, idCol: String,
      srcCol: String, textCol: String, weights: Map[String, Double],
      tokenBudget: Long, salt: Int = 77): org.apache.spark.sql.DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be positive: $tokenBudget")
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol), col(srcCol).as("source"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
    val wDf = weights.toSeq.toDF("source", "_w")
    val thr = base.groupBy($"source").agg(sum($"n_tokens").as("_tok"))
      .join(wDf, Seq("source"))
      .select($"source",
        floor(least(lit(1.0),
            lit(tokenBudget.toDouble) * $"_w" / $"_tok".cast("double"))
          * lit(4294967296.0)).cast("long").as("_thr"))
    base.join(broadcast(thr), Seq("source"))
      .filter(hex32(col(idCol).cast("string"), salt) < $"_thr")
      .select(col(idCol), $"source", $"n_tokens")
  }

  /** Sequence packing — the pretraining "concat and chunk" layout: documents
    * are concatenated in deterministic `idCol` order and the token stream is
    * cut every `seqLen` tokens; each document gets its global token offset
    * and the first/last training sequence it lands in (documents may
    * straddle a cut — that is the point of the layout; zero-token documents
    * get null sequence ids).
    *
    * Scale shape: the naive formulation is ONE global-order running sum —
    * `sum(tokens) OVER (ORDER BY id)` — which Spark executes as a
    * single-partition window: the whole corpus through one task. Here the
    * prefix sum is two-level: range-partition by id (order-aligned buckets),
    * per-bucket running sums stay partition-local under a bucket-keyed
    * window, and the bucket BASE offsets — one number per bucket — are the
    * only thing that leaves the executors (a bounded `nBuckets`-row
    * collect), prefix-summed on the driver and broadcast-joined back. The
    * result is independent of `nBuckets` and of where the range partitioner
    * draws its boundaries (order-alignment is all that matters) — pinned in
    * spec by varying nBuckets.
    *
    * Returns (idCol, n_tokens, start_tok, seq_first, seq_last).
    */
  def packSequences(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, seqLen: Int, nBuckets: Int = 256)
      : org.apache.spark.sql.DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    import org.apache.spark.sql.functions.{col, expr, when}
    globalTokenOffsets(docs, idCol, textCol, nBuckets)
      .select(col(idCol), col("n_tokens"), col("start_tok"),
        when(col("n_tokens") > 0, expr(s"start_tok div $seqLen")).as("seq_first"),
        when(col("n_tokens") > 0,
          expr(s"(start_tok + n_tokens - 1) div $seqLen")).as("seq_last"))
  }

  /** Global token offset per document in `idCol` order — the two-level
    * prefix sum shared by [[packSequences]] and [[systematicSample]]:
    * order-aligned range buckets, per-bucket windows, O(nBuckets) driver
    * prefix broadcast back — never a single-partition global window.
    */
  def globalTokenOffsets(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 256): org.apache.spark.sql.DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    // order-aligned buckets; localCheckpoint pins partition ids so the two
    // passes below see the SAME bucketing (the computed-twice discipline of
    // MaterializedTable.mergeBuckets)
    val parts = docs
      .select(col(idCol), size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .repartitionByRange(nBuckets, col(idCol))
      .withColumn("_b", spark_partition_id())
      .localCheckpoint()
    // pass 1: one row per bucket leaves the executors; driver prefix-sum is
    // O(nBuckets), never O(rows)
    val totals = parts.groupBy($"_b").agg(sum($"n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init) // exclusive prefix
    val baseDf = bases.toSeq.toDF("_b", "_base")
    // pass 2: partition-local running sum + broadcast base offset; integer
    // `div` (not floor of a double divide — exact past 2^53 tokens)
    val w = Window.partitionBy($"_b").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .join(broadcast(baseDf), Seq("_b"))
      .select(col(idCol), $"n_tokens",
        ($"_base" + coalesce(sum($"n_tokens").over(w), lit(0L))).as("start_tok"))
  }

  /** SYSTEMATIC PPS (probability-proportional-to-size) document sampling
    * by token weight — the deterministic answer to "sample documents
    * proportional to their token count" that needs NO randomness and NO
    * libm (weighted reservoir/A-ES sampling needs u^(1/w) — a pow whose
    * rounding differs across engines): lay every document's tokens on the
    * global [0, total) axis in id order, drop a boundary every `step`
    * tokens, and pick each document that contains a boundary —
    * `n_picks = (start+w) div step − start div step`, all exact integer
    * arithmetic. Selection probability is exactly w/step for w < step;
    * heavier documents collect proportionally many picks (use n_picks as
    * the epoch repeat factor). Expected sample size = total/step.
    *
    * Determinism/ordering: the axis order is `idCol` — reproducible on any
    * cluster; for a pseudo-random systematic order, feed a salted-hash id
    * (the [[splitBucket]] discipline) as `idCol`. Scale shape: the only
    * non-projection work is [[globalTokenOffsets]]'s two-level prefix sum
    * (no single-partition window, no global sort).
    */
  def systematicSample(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, step: Long, nBuckets: Int = 256)
      : org.apache.spark.sql.DataFrame = {
    require(step > 0, s"step must be positive: $step")
    import org.apache.spark.sql.functions.{col, expr}
    globalTokenOffsets(docs, idCol, textCol, nBuckets)
      .withColumn("n_picks",
        expr(s"(start_tok + n_tokens) div $step") -
          expr(s"start_tok div $step"))
      .filter(col("n_picks") > 0)
      .select(col(idCol), col("n_tokens"), col("start_tok"), col("n_picks"))
  }

  /** Hash-feature salt for the trained quality classifier (shared with the
    * oracle SQL). */
  val ClassifierSalt = 36

  /** Train a bag-of-hashed-tokens linear quality classifier — the
    * fastText/CCNet-final-stage analog: labeled documents → one weight per
    * hash bucket. The weight of bucket `h` is the Laplace-smoothed
    * class-conditional probability difference
    * `(n_pos(h)+1)/(N_pos+dims) − (n_neg(h)+1)/(N_neg+dims)` — i.e. the
    * multinomial-Naive-Bayes evidence of `h` for the positive class,
    * linearized (probability difference, not log-likelihood ratio: no
    * libm, the txt11 idf discipline — each weight is ONE IEEE divide of
    * exact integers per side, identical on every engine).
    *
    * Returns `(h INT, w DOUBLE)` for every bucket in [0, dims) — including
    * never-seen buckets, whose weight is the smoothing floor difference,
    * so scoring needs no null-handling and the table is exactly `dims`
    * rows (broadcast-sized by construction; that is the point of feature
    * hashing).
    *
    * Training is ONE distributed counting pass: explode to (h, label),
    * partial-agg'd conditional sums into `dims` rows — no gradient
    * rounds, no driver-side loop; the 100 TB cost is a token-count
    * shuffle bounded by `dims` distinct keys.
    */
  def classifierTrain(docs: org.apache.spark.sql.DataFrame, labelCol: String,
      textCol: String, dims: Int = 256): org.apache.spark.sql.DataFrame = {
    require(dims > 1, s"dims must be at least 2: $dims")
    val spark = docs.sparkSession
    val counts = docs
      .select(col(labelCol).as("_pos"), explode(tokens(col(textCol))).as("_tok"))
      .select(col("_pos"), (hex32(col("_tok"), ClassifierSalt) % dims).cast("int").as("h"))
      .groupBy(col("h"))
      .agg(sum(when(col("_pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("_pos"), 1L).otherwise(0L)).as("n_neg"))
    // dims is small by construction — densify driver-side so unseen buckets
    // carry the smoothing-floor weight (bounded collect, |dims| rows)
    val seen = counts.collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nPos = seen.valuesIterator.map(_._1).sum
    val nNeg = seen.valuesIterator.map(_._2).sum
    import spark.implicits._
    (0 until dims).map { h =>
      val (np, nn) = seen.getOrElse(h, (0L, 0L))
      (h, (np + 1).toDouble / (nPos + dims) - (nn + 1).toDouble / (nNeg + dims))
    }.toDF("h", "w")
  }

  /** Score documents under a trained classifier: the mean weight of a
    * document's hashed tokens — the dot product of its hashed-count vector
    * with the weight vector, over its token count. Positive ⇒ the document
    * looks like the positive training class. Returns
    * `(idCol, n_toks, score)`; token-less docs score null.
    *
    * Exactness: per-token weights are engine-exact doubles
    * ([[classifierTrain]]), the sum is the decimal-cast exact sum at
    * DECIMAL(18,12) — the proven Qutil.dsum envelope (int64-backed decimals
    * convert to double identically on both engines; wider decimals would
    * not provably do so), the mean one IEEE divide — the whole score
    * hash-matches cross-engine.
    * Scale shape: weights broadcast (`dims` rows); one narrow explode; one
    * per-doc partial-agg'd rollup. No shuffle wider than (id, h).
    */
  def classifierScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, weights: org.apache.spark.sql.DataFrame,
      dims: Int): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol),
        explode(tokens(col(textCol))).as("_tok"))
      .select(col(idCol), (hex32(col("_tok"), ClassifierSalt) % dims).cast("int").as("h"))
    val scored = toks.join(broadcast(weights), Seq("h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        (sum(col("w").cast(org.apache.spark.sql.types.DecimalType(18, 12)))
          .cast("double") / count(lit(1))).as("score"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        col("score"))
  }

  /** Lexical-diversity quality bin in `[0, bins)`: `floor(|distinct toks| /
    * |toks| · bins)` clamped to the top bin; null for token-less docs. An
    * integer bin (not the raw double) on purpose — the calibration below
    * aggregates bins exactly, so the result is engine-portable where a
    * floating quantile would not be.
    */
  def qualityBin(text: Column, bins: Int): Column = {
    require(bins > 1, s"bins must be at least 2: $bins")
    bind(tokens(text), toks =>
      when(size(toks) === 0, lit(null).cast("int"))
        .otherwise(least(
          floor(size(array_distinct(toks)).cast("double") / size(toks) * bins),
          lit(bins - 1)).cast("int")))
  }

  /** Per-source quality-threshold calibration: keep each source's top
    * documents by quality score, where the threshold is CALIBRATED from
    * that source's own score distribution — a fixed global cutoff keeps
    * everything from clean sources and nothing from noisy ones, so real
    * curation pipelines (CCNet's per-language perplexity terciles, quality
    * pruning per domain) cut per-source quantiles instead.
    *
    * The quantile is computed from a per-source HISTOGRAM of integer
    * quality bins, not a sort: per source with `n` docs, the threshold bin
    * is the smallest `b` with `cum(b) ≥ ceil(cutFrac·n)`, and a doc is
    * kept iff its bin is strictly above the threshold (so slightly fewer
    * than `1−cutFrac` of docs survive, bin granularity deciding the
    * boundary deterministically — never a tie-broken sort).
    *
    * Returns kept `(id, source, bin)` rows.
    *
    * Scale shape: no global or per-source sort anywhere. Pass 1 reduces
    * the corpus to a `|sources|·bins`-row histogram (partial-agg'd
    * map-side); the cumulative window runs over that tiny frame; the
    * per-source thresholds broadcast back onto pass 2's re-scan of the
    * corpus. Exact-quantile alternatives buffer a source's every score
    * (percentile) — the histogram is O(bins) per source regardless of
    * corpus size, the same trade the GK sketch (q39) makes but exact over
    * the binned domain and therefore oracle-restatable.
    */
  def calibratedQualityKeep(docs: org.apache.spark.sql.DataFrame,
      idCol: String, srcCol: String, textCol: String,
      bins: Int = 50, cutFrac: Double = 0.5)
      : org.apache.spark.sql.DataFrame = {
    require(cutFrac >= 0.0 && cutFrac < 1.0, s"cutFrac in [0,1): $cutFrac")
    import org.apache.spark.sql.expressions.Window
    val scored = docs.select(col(idCol), col(srcCol),
        qualityBin(col(textCol), bins).as("bin"))
      .filter(col("bin").isNotNull)
    val hist = scored.groupBy(col(srcCol), col("bin"))
      .agg(count(lit(1)).as("c"))
    val perSrc = Window.partitionBy(srcCol)
    val cum = hist.select(col(srcCol), col("bin"),
      sum(col("c")).over(perSrc.orderBy(col("bin"))).as("cum"),
      sum(col("c")).over(perSrc).as("n"))
    val thr = cum.filter(col("cum") >= ceil(lit(cutFrac) * col("n")))
      .groupBy(col(srcCol)).agg(min(col("bin")).as("thr"))
    scored.join(broadcast(thr), Seq(srcCol))
      .filter(col("bin") > col("thr"))
      .select(col(idCol), col(srcCol), col("bin"))
  }

  /** SLIDING-WINDOW CHUNKING — split each document into token windows of
    * `size` every `stride` tokens (stride < size ⇒ overlapping context
    * windows, the retrieval/embedding-prep shape; stride = size ⇒ disjoint
    * blocks). Chunk `c` covers tokens `[c·stride, c·stride+size)`; starts
    * run while `start < n_tokens`, so tail chunks may be short (kept — a
    * truncated tail is still trainable/retrievable context) and an
    * empty-token document yields no chunks.
    *
    * Returns (idCol, chunk_idx, tok_start, n_toks, chunk_text).
    *
    * Scale shape: entirely per-document — a projection + one
    * posexplode-style expansion, ZERO exchanges; output fan-out is
    * n/stride rows per doc, each carrying only its own window of text.
    * The expansion happens inside whole-stage codegen (sequence/transform
    * over the already-split token array), never a UDF.
    */
  def chunk(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive: $size/$stride")
    require(stride <= size, s"stride > size would drop tokens: $stride > $size")
    val toks = tokens(col(textCol))
    docs.select(col(idCol), toks.as("_toks"))
      .filter(size_(col("_toks")) > 0)
      .select(col(idCol), col("_toks"),
        // (n-1) div stride, as exact integer arithmetic (Column `/` is
        // double division; floor of it is exact for any 32-bit size)
        explode(sequence(lit(0),
          floor((size_(col("_toks")) - 1) / lit(stride)).cast("int"))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * stride).as("tok_start"),
        least(lit(size), size_(col("_toks")) - col("chunk_idx") * stride).as("n_toks"),
        array_join(slice(col("_toks"), col("chunk_idx") * stride + 1, lit(size)), " ")
          .as("chunk_text"))
  }

  /** `org.apache.spark.sql.functions.size` shadow-safe alias (this object
    * takes Int `size` parameters in several signatures).
    */
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** RAKE KEYWORD EXTRACTION (Rose et al.) — candidate phrases are maximal
    * runs of non-stopword tokens (gaps-and-islands on token position);
    * word score = deg/freq over all candidate-phrase occurrences
    * corpus-wide (deg(w) = Σ phrase-length over w's occurrences — the
    * within-phrase co-occurrence degree including self; freq(w) = its
    * occurrence count), phrase score = sum of member word scores. Words
    * that only appear alone score 1.0; words that ride in long phrases
    * score higher — RAKE's preference for multi-word technical terms.
    *
    * Determinism: word scores are one IEEE division of exact integers;
    * the phrase sum follows the decimal-cast discipline
    * ([[graft.queries.Qutil.dsum]] rationale) so member order cannot
    * change it. Returns distinct (idCol, phrase, n_words, score) with
    * `n_words ≥ minWords`.
    *
    * Scale shape: islands are one doc-keyed window; word stats are two
    * partial-agg'd hash aggregations over phrase members (vocabulary-
    * bounded); the score join back is vocabulary-sized.
    */
  def rakeKeywords(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, stopwords: Seq[String],
      minWords: Int = 2): org.apache.spark.sql.DataFrame = {
    require(stopwords.nonEmpty, "need a stopword list (phrase delimiters)")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val px = docs.select(col(idCol), posexplode(tokens(col(textCol))))
      .toDF(idCol, "pos", "tok")
    val ns = px.filter(!col("tok").isin(stopwords: _*))
      .withColumn("isl", col("pos") - row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("pos"))))
    val ph = ns.groupBy(col(idCol), col("isl"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("phrase"),
        count(lit(1)).as("plen"))
    val ws = ns.join(ph, Seq(idCol, "isl"))
      .groupBy(col("tok"))
      .agg((sum(col("plen")).cast("double") / count(lit(1))).as("wscore"))
    val psc = ns.join(ws, Seq("tok"))
      .groupBy(col(idCol), col("isl"))
      .agg(sum(col("wscore").cast(DecimalType(18, 6))).cast("double").as("score"))
    psc.join(ph, Seq(idCol, "isl"))
      .filter(col("plen") >= minWords)
      .select(col(idCol), col("phrase"), col("plen").as("n_words"), col("score"))
      .distinct()
  }

  /** LENGTH-BUCKETED BATCH ASSEMBLY — the dynamic-batching step a training
    * or inference loader runs when sequences are padded to the batch max:
    * batching docs of similar length together bounds padding waste, where
    * random batching pays for every batch's longest member. Docs are
    * bucketed by token-count band (`bandWidth` tokens per band), ordered
    * within a band by the salted deterministic scatter (the
    * [[graft.operators.IvfIndex.balancedSample]] discipline — reproducible
    * across engines/reruns, never `rand()`), and cut into batches of
    * `batchSize`; ragged final batches per band are kept.
    *
    * Returns (idCol, n_tokens, band, batch_id, pos) — `batch_id` unique
    * within a band, `pos ∈ [0, batchSize)`.
    *
    * Scale shape: one projection for counts, ONE exchange keyed by band
    * for the rank window; batch assembly is arithmetic on the rank. The
    * per-band rank is the same shape as [[shardAssign]] and inherits its
    * layout-invariance.
    */
  def lengthBucketBatches(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, bandWidth: Int, batchSize: Int)
      : org.apache.spark.sql.DataFrame = {
    require(bandWidth >= 1 && batchSize >= 1,
      s"bad bandWidth/batchSize: $bandWidth/$batchSize")
    import org.apache.spark.sql.expressions.Window
    val n = size_(tokens(col(textCol)))
    // id reduced mod 1000003 BEFORE the Knuth multiply: identical to
    // (id*2654435761) mod 1000003 in unbounded arithmetic (mod-multiply
    // compatibility) but overflow-free for ids beyond ~3.4e9, where the
    // raw product exceeds Long range (found by the 10x key-shifted soak
    // under ANSI overflow checking)
    val salted =
      ((col(idCol) % lit(1000003L)) * lit(2654435761L)) % lit(1000003L)
    val banded = docs.select(col(idCol), n.as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("band", expr(s"n_tokens div $bandWidth"))
    banded
      .withColumn("_rk", row_number().over(
        Window.partitionBy(col("band")).orderBy(salted, col(idCol))) - 1)
      .select(col(idCol), col("n_tokens"), col("band"),
        expr(s"_rk div $batchSize").as("batch_id"),
        (col("_rk") % batchSize).as("pos"))
  }

  /** BLOCKLIST PHRASE FILTERING — per document, which of a set of banned
    * token phrases occur verbatim (token-boundary match), as a
    * (id, n_matched, blocked) report. The compliance / unsafe-content
    * screen every corpus ships through before training.
    *
    * Scale shape (the Aho-Corasick analog in dataflow): real blocklists run
    * 10⁵–10⁶ phrases, where `N_phrases × contains()` per document is the
    * O(corpus·blocklist) scan that doesn't survive 100 TB. Instead each
    * phrase is ANCHORED on its first token: documents explode to their
    * distinct token set once, one hash equi-join against the anchor column
    * yields candidate (doc, phrase) pairs — complete, since a verbatim
    * phrase occurrence implies its anchor token occurs — and only those
    * candidates pay the exact boundary-padded `contains` verify. Candidate
    * volume is bounded by anchor-token document frequency (pick the RAREST
    * phrase token as anchor when df stats exist; first token here).
    * Phrases travel as a DataFrame so a 10⁶-row blocklist shuffles instead
    * of broadcasting.
    */
  def blocklistFilter(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, blocklist: org.apache.spark.sql.DataFrame,
      phraseCol: String): org.apache.spark.sql.DataFrame = {
    val bl = blocklist.select(col(phraseCol).as("_phrase"),
      element_at(split(col(phraseCol), " "), 1).as("_anchor"))
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
      .distinct()
    val cand = toks.join(bl, col("_tok") === col("_anchor"))
      .select(col(idCol), col("_phrase")).distinct()
    val matched = cand
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .filter(concat(lit(" "), col(textCol), lit(" "))
        .contains(concat(lit(" "), col("_phrase"), lit(" "))))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_matched"))
    docs.select(col(idCol))
      .join(matched, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        (coalesce(col("n_matched"), lit(0L)) > 0).as("blocked"))
  }
}
