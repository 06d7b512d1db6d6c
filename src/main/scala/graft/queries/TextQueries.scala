package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import graft.operators.{Dedup, GlobalRank, TextOps}
import graft.queries.Qutil.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication surface over the `documents` table:
  * token/quality stats, language scoring, fingerprinting, exact dedup,
  * MinHash-LSH near-dup candidates, exact Jaccard verification, SimHash.
  * Every query has a full DuckDB oracle (the md5-based hash family is
  * portable across engines by construction — TextOps scaladoc).
  */
object TextQueries {

  private def q(name: String, sql: String)(f: (SparkSession, String) => DataFrame) =
    Q(name, f, Some(sql))

  /** DuckDB twin of TextOps.tokens. */
  private val toksSql = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** DuckDB twin of TextOps.hex32: first 32 bits of md5 as BIGINT. */
  private def hex32Sql(arg: String): String =
    s"list_reduce(list_transform(regexp_split_to_array(substr(md5($arg),1,8),''), " +
      "c -> CAST(strpos('0123456789abcdef', c)-1 AS BIGINT)), (a,b) -> a*16+b)"

  /** DuckDB twin of Dedup.winnowFingerprints + the hot-fp drop (txt28's CTE
    * chain, parameterized on the source relation — `src` must provide
    * (doc_id, text)). Ends at CTE `c`: the (doc_id, fp) pairs surviving the
    * >maxDf boilerplate filter.
    */
  private def winnowSql(src: String): String =
    s"""toks AS (SELECT doc_id, $toksSql AS t FROM $src),
       |g AS (SELECT doc_id, CASE WHEN len(t) < 4 THEN [] ELSE
       |  [array_to_string(t[i:i+3], ' ') for i in generate_series(1, len(t)-3)] END AS grams
       |  FROM toks),
       |hp AS (SELECT doc_id, [{'fp': ${hex32Sql("'7:'||grams[i]")},
       |    'pos': CAST(i-1 AS INT)} for i in generate_series(1, len(grams))] AS hp
       |  FROM g),
       |sel AS (SELECT doc_id, [
       |    list_reduce(hp[j : j+3], (a,x) -> CASE WHEN x.fp < a.fp
       |      OR (x.fp = a.fp AND x.pos > a.pos) THEN x ELSE a END)
       |    for j in generate_series(1, greatest(len(hp)-3, 1))] AS fps
       |  FROM hp WHERE len(hp) > 0),
       |f AS (SELECT DISTINCT doc_id, u.fp AS fp
       |  FROM (SELECT doc_id, unnest(fps) AS u FROM sel)),
       |hot AS (SELECT fp FROM f GROUP BY 1 HAVING COUNT(*) > 50),
       |c AS (SELECT f.doc_id, f.fp FROM f
       |  WHERE fp NOT IN (SELECT fp FROM hot))""".stripMargin

  /** DuckDB twin of TextOps.calibratedQualityKeep (txt29's CTE chain,
    * parameterized on the source relation — `src` must provide (doc_id,
    * source, text)). Ends at CTEs `s` (binned docs) and `thr` (per-source
    * threshold bins); kept docs are `s JOIN thr ON same source AND s.bin >
    * thr.thr`.
    */
  private def calibSql(src: String): String =
    s"""t AS (SELECT doc_id, source, $toksSql AS toks FROM $src),
       |s AS (SELECT doc_id, source,
       |    CAST(least(floor(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) * 50),
       |      49) AS INT) AS bin
       |  FROM t WHERE len(toks) > 0),
       |h AS (SELECT source, bin, COUNT(*) AS c FROM s GROUP BY 1, 2),
       |cum AS (SELECT source, bin,
       |    SUM(c) OVER (PARTITION BY source ORDER BY bin) AS cum,
       |    SUM(c) OVER (PARTITION BY source) AS n FROM h),
       |thr AS (SELECT source, MIN(bin) AS thr FROM cum
       |  WHERE cum >= ceil(0.5 * n) GROUP BY 1)""".stripMargin

  /** DuckDB twin of TextOps.bpeTrain: `rounds` fully-unrolled merge rounds
    * (the vec05/vec10 unrolled-Lloyd discipline, applied to BPE). Round r:
    *   p{r}: weighted adjacent-pair counts over vocab v{r-1} (overlapping
    *         positions, exactly bpeTrain's `indices.dropRight(1)` scan);
    *   m{r}: the argmax with bpeTrain's tie order (n DESC, lhs, rhs) —
    *         byte order ≡ Spark's char order on this ASCII corpus;
    *   eb/e/g/h{r}: greedy LEFT-TO-RIGHT rewrite flags, positionally. The
    *         greedy skip-2 loop is restated as: a position merges iff it
    *         matches (lhs,rhs) AND its offset inside its consecutive run of
    *         matches is even (runs via gaps-and-islands i − ROW_NUMBER();
    *         for lhs ≠ rhs runs have length 1, for lhs = rhs this takes
    *         every other match — exactly the skip-2 semantics);
    *   v{r}: the rewritten vocab (merged symbol absorbs its right
    *         neighbor; a position is dropped iff its LEFT neighbor merged).
    * Ends with vocab CTE `v{rounds}` and merge CTEs `m1..m{rounds}`.
    * Starts from `documents`-shaped relation `src` (needs `text`).
    */
  private def bpeSql(rounds: Int, src: String): String = {
    val v0 =
      s"""v0 AS (
         |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    regexp_split_to_array(word, '') AS syms
         |  FROM (SELECT unnest($toksSql) AS word FROM $src)
         |  GROUP BY word
         |)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT a AS lhs, b AS rhs, CAST(SUM(cnt) AS BIGINT) AS n FROM (
         |    SELECT cnt, unnest([{'a': syms[i], 'b': syms[i+1]}
         |        for i in generate_series(1, len(syms)-1)], recursive := true)
         |    FROM v${r - 1} WHERE len(syms) > 1
         |  ) GROUP BY 1, 2
         |),
         |m$r AS (SELECT lhs, rhs, n FROM p$r ORDER BY n DESC, lhs, rhs LIMIT 1),
         |eb$r AS (
         |  SELECT word, cnt, syms, unnest(generate_series(1, len(syms))) AS i
         |  FROM v${r - 1}
         |),
         |e$r AS (
         |  SELECT word, cnt, i, syms[i] AS s,
         |    (i < len(syms) AND syms[i] = m.lhs AND syms[i+1] = m.rhs) AS mat
         |  FROM eb$r CROSS JOIN m$r m
         |),
         |g$r AS (
         |  SELECT word, cnt, i, s, mat,
         |    CASE WHEN mat THEN i - ROW_NUMBER()
         |      OVER (PARTITION BY word, mat ORDER BY i) END AS grp
         |  FROM e$r
         |),
         |h$r AS (
         |  SELECT word, cnt, i, s,
         |    mat AND ((i - MIN(i) OVER (PARTITION BY word, grp)) % 2 = 0)
         |      AS do_merge
         |  FROM g$r
         |),
         |v$r AS (
         |  SELECT word, cnt,
         |    list(CASE WHEN do_merge THEN s || next_s ELSE s END ORDER BY i) AS syms
         |  FROM (
         |    SELECT word, cnt, i, s, do_merge,
         |      LEAD(s) OVER (PARTITION BY word ORDER BY i) AS next_s,
         |      COALESCE(LAG(do_merge) OVER (PARTITION BY word ORDER BY i), FALSE)
         |        AS consumed
         |    FROM h$r
         |  ) WHERE NOT consumed
         |  GROUP BY word, cnt
         |)""".stripMargin
    }
    (v0 +: roundCtes).mkString(",\n")
  }

  /** Corpus with planted exact (x%10) and near (x%17, 10 chars clipped) dups. */
  private val corpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id+100000, text FROM documents WHERE doc_id%10=0
      |  UNION ALL SELECT doc_id+200000,
      |    substr(text, 1, greatest(CAST(length(text) AS INT)-10, 0))
      |    FROM documents WHERE doc_id%17=0)""".stripMargin

  private def corpus(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          expr("substring(text, 1, length(text)-10)").as("text")))
  }

  /** DuckDB twin of the MinHash signature + banding CTEs over `corpus`. */
  private val minhashSql =
    s"""toks AS (SELECT doc_id, $toksSql AS t FROM corpus),
       |sh AS (SELECT doc_id,
       |  [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)] AS shingles
       |  FROM toks),
       |hb AS (SELECT doc_id, [ ${hex32Sql("'0:'||s")} for s in shingles ] AS bh FROM sh),
       |sig AS (SELECT doc_id,
       |  [ list_min([ ((2*p+1)*(h % 2147483647) + 12345*p + 678) % 2147483647 for h in bh ])
       |    for p in generate_series(0,15) ] AS hs FROM hb),
       |banded AS (SELECT doc_id, b, array_to_string(hs[4*b+1 : 4*b+4], '_') AS sig
       |  FROM sig, generate_series(0,3) g(b)),
       |pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM banded x JOIN banded y ON x.b = y.b AND x.sig = y.sig
       |  WHERE x.doc_id < y.doc_id)""".stripMargin

  val defs: Seq[Q] = Seq(
    // --- token counting (whitespace tokenizer) --------------------------------
    q("txt01_token_count",
      s"""SELECT doc_id, CAST(len($toksSql) AS INT) AS n_tokens,
         |  CAST(strlen(text) AS INT) AS n_bytes,
         |  CAST(length(text) AS INT) AS n_chars
         |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("n_tokens"),
        octet_length(col("text")).as("n_bytes"),
        length(col("text")).as("n_chars"))
    },

    // --- BPE-ish regex tokenization (subword chunking alongside whitespace) ---
    q("txt09_bpe_tokens",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS INT) AS n_subwords,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id") +: TextOps.bpeCounts(col("text")): _*)
    },

    // --- quality scoring: stopword ratio, lexical diversity, mean token len ---
    q("txt02_quality_score",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(len(list_filter(toks, x -> x = 'a' OR x = 'the')) AS DOUBLE)/len(toks) AS stop_ratio,
         |  CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) AS lex_diversity,
         |  CAST(CAST(list_sum(list_transform(toks, x -> CAST(strlen(x) AS BIGINT))) AS BIGINT) AS DOUBLE)/len(toks) AS mean_tok_len
         |FROM t""".stripMargin) { (s, d) =>
      val toks = TextOps.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"),
          (size(filter(col("toks"), x => x === "a" || x === "the")).cast("double") /
            size(col("toks"))).as("stop_ratio"),
          (size(array_distinct(col("toks"))).cast("double") /
            size(col("toks"))).as("lex_diversity"),
          (aggregate(transform(col("toks"), x => length(x).cast("long")),
            lit(0L), (acc, x) => acc + x).cast("double") /
            size(col("toks"))).as("mean_tok_len"))
    },

    // --- language-ID-style marker scoring (n-gram/token heuristic) ------------
    q("txt03_lang_score",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS BIGINT) AS n_art,
         |  CAST(len(list_filter(toks, x -> x = 'join' OR x = 'table' OR x = 'scan')) AS BIGINT) AS n_query,
         |  CAST(len(list_filter(toks, x -> x = 'stream' OR x = 'window' OR x = 'batch')) AS BIGINT) AS n_stream
         |  FROM t)
         |SELECT doc_id, n_art, n_query, n_stream,
         |  CASE WHEN n_art >= n_query AND n_art >= n_stream THEN 'article'
         |       WHEN n_query >= n_stream THEN 'query' ELSE 'stream' END AS label
         |FROM m""".stripMargin) { (s, d) =>
      def marker(words: String*) =
        size(filter(col("toks"), x => words.map(x === _).reduce(_ || _))).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          marker("the", "a").as("n_art"),
          marker("join", "table", "scan").as("n_query"),
          marker("stream", "window", "batch").as("n_stream"))
        .withColumn("label",
          when(col("n_art") >= col("n_query") && col("n_art") >= col("n_stream"), "article")
            .when(col("n_query") >= col("n_stream"), "query")
            .otherwise("stream"))
    },

    // --- document fingerprint (rolling hash, native expression) ---------------
    q("txt04_fingerprint",
      """SELECT doc_id,
        |  list_reduce(list_transform(regexp_split_to_array(text,''),
        |    x -> CAST(unicode(x) AS BIGINT)), (a,b) -> (a*131+b)%2147483647) AS fp
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), GraftFunctions.doc_fingerprint(col("text")).as("fp"))
    },

    // --- exact dedup over the planted-duplicate corpus ------------------------
    q("txt05_dedup_exact",
      s"""WITH $corpusSql
         |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM corpus GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin) { (s, d) =>
      Dedup.exactGroups(corpus(s, d), "doc_id", "text")
    },

    // --- MinHash LSH near-duplicate candidate pairs ---------------------------
    q("txt06_minhash_pairs",
      s"""WITH $corpusSql,
         |$minhashSql
         |SELECT a, b FROM pairs""".stripMargin) { (s, d) =>
      Dedup.minhashCandidatePairs(corpus(s, d), "doc_id", "text")
    },

    // --- exact n-gram Jaccard verification of the LSH candidates --------------
    q("txt07_jaccard_verify",
      s"""WITH $corpusSql,
         |$minhashSql,
         |shd AS (SELECT doc_id, list_distinct(
         |  [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)]) AS sh
         |  FROM toks)
         |SELECT p.a, p.b,
         |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)/len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
         |FROM pairs p JOIN shd x ON p.a = x.doc_id JOIN shd y ON p.b = y.doc_id""".stripMargin) { (s, d) =>
      val cp = corpus(s, d)
      Dedup.jaccardOnPairs(
        Dedup.minhashCandidatePairs(cp, "doc_id", "text"), cp, "doc_id", "text")
    },

    // --- LSH calibration report (txt59): per candidate pair, the MinHash-
    // --- estimated Jaccard (fraction of equal signature components)
    // --- against the exact shingle Jaccard with the absolute error — the
    // --- table that justifies permutation/band/row choices before a
    // --- corpus-wide dedup run commits to them. Signatures are exact
    // --- integers and both fractions single IEEE divisions, so the whole
    // --- calibration hash-matches; cost rides the banded candidates. -----
    q("txt59_lsh_calibration",
      s"""WITH $corpusSql,
         |$minhashSql,
         |shd AS (SELECT doc_id, list_distinct(
         |  [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)]) AS sh
         |  FROM toks),
         |cal AS (SELECT p.a, p.b,
         |  CAST(len([i for i in generate_series(1, 16)
         |    if sa.hs[i] = sb.hs[i]]) AS DOUBLE)/16 AS est_jaccard
         |  FROM pairs p JOIN sig sa ON p.a = sa.doc_id
         |  JOIN sig sb ON p.b = sb.doc_id),
         |ex AS (SELECT p.a, p.b,
         |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
         |  FROM pairs p JOIN shd x ON p.a = x.doc_id
         |  JOIN shd y ON p.b = y.doc_id)
         |SELECT cal.a, cal.b, cal.est_jaccard, ex.jaccard,
         |  abs(cal.est_jaccard - ex.jaccard) AS abs_err
         |FROM cal JOIN ex ON cal.a = ex.a AND cal.b = ex.b""".stripMargin) { (s, d) =>
      Dedup.lshCalibration(corpus(s, d), "doc_id", "text")
    },

    // --- cross-corpus decontamination (Dedup.crossCorpusNearDups): training
    // --- docs that near-duplicate an EVAL doc — LSH buckets joined strictly
    // --- ACROSS the corpora (train–train pairs never generated), exact
    // --- Jaccard verify on the survivors. Eval = the clipped variants;
    // --- oracle = the full-corpus LSH pair set restricted to cross pairs
    // --- (band signatures are per-doc, so the restriction is exact). ----------
    q("txt16_decontaminate",
      s"""WITH $corpusSql,
         |$minhashSql,
         |shd AS (SELECT doc_id, list_distinct(
         |  [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)]) AS sh
         |  FROM toks)
         |SELECT * FROM (
         |  SELECT p.a, p.b,
         |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
         |  FROM pairs p JOIN shd x ON p.a = x.doc_id JOIN shd y ON p.b = y.doc_id
         |  WHERE p.a < 100000 AND p.b >= 200000) v
         |WHERE jaccard >= 0.5""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val eval = docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          expr("substring(text, 1, length(text)-10)").as("text"))
      Dedup.crossCorpusNearDups(docs, eval, "doc_id", "text", minJaccard = 0.5)
    },

    // --- duplicate clusters: distributed large-star/small-star connected
    // --- components over the LSH pairs; the oracle reaches the same partition
    // --- by recursive transitive closure + min-label (tiny edge set in SQL) ---
    q("txt10_dup_clusters",
      s"""WITH RECURSIVE $corpusSql,
         |$minhashSql,
         |sym AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM sym
         |  UNION
         |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
         |)
         |SELECT u AS member, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u""".stripMargin) { (s, d) =>
      Dedup.clustersDistributed(
        Dedup.minhashCandidatePairs(corpus(s, d), "doc_id", "text"))
    },

    // --- TF-IDF term scoring (BM25-flavor idf: rational in counts, so both
    // --- engines compute bit-identical doubles — no transcendental log whose
    // --- libm rounding could differ). Three shapes: token explode, two hash
    // --- aggs (tf, df), equi-join back + 1-row broadcast of N. ---------------
    q("txt11_tfidf",
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |tf AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents)
         |SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |  (CAST(tf.tf AS DOUBLE) * (n.n_docs - df.df + 0.5)) / (df.df + 0.5) AS tfidf
         |FROM tf JOIN df USING (term) CROSS JOIN n""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val tf = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      tf.join(dft, "term")
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          ((col("tf").cast("double") * (col("n_docs") - col("df") + lit(0.5))) /
            (col("df") + lit(0.5))).as("tfidf"))
    },

    // --- deterministic train/val/test split (hash bucket, not rand(): stable
    // --- across runs/engines/cluster sizes — a doc never migrates splits) -----
    q("txt12_train_split",
      s"""WITH h AS (SELECT doc_id,
         |  ${hex32Sql("'42:'||CAST(doc_id AS VARCHAR)")} % 10 AS bucket
         |  FROM documents)
         |SELECT doc_id, bucket,
         |  CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h""".stripMargin) { (s, d) =>
      val bucket = TextOps.splitBucket(col("doc_id"), salt = 42, nBuckets = 10)
      Tables.documents(s, d)
        .select(col("doc_id"), bucket.as("bucket"))
        .withColumn("split", TextOps.splitLabel(col("bucket")))
    },

    // --- text normalization / scrubbing over a NOISY corpus (markup planted
    // --- identically on both sides so the scrub does real work) ---------------
    q("txt13_normalize",
      """WITH noisy AS (SELECT doc_id,
        |  text || '  <<' || source || '-' || CAST(doc_id AS VARCHAR) || '>>' AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(raw, '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS clean_text,
        |  CAST(length(raw) - length(regexp_replace(raw, '[^a-z0-9 ]', '', 'g')) AS INT) AS n_scrubbed
        |FROM noisy""".stripMargin) { (s, d) =>
      val raw = concat(col("text"), lit("  <<"), col("source"), lit("-"),
        col("doc_id").cast("string"), lit(">>"))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          TextOps.normalize(col("raw")).as("clean_text"),
          (length(col("raw")) -
            length(regexp_replace(col("raw"), "[^a-z0-9 ]", ""))).cast("int")
            .as("n_scrubbed"))
    },

    // --- exact distributed heavy hitters (HeavyHitters.heavyHitters): tokens
    // --- occurring in >2% of all token occurrences (k=50). The oracle is the
    // --- naive full-vocabulary GROUP BY ... HAVING — the Spark side must
    // --- reach the SAME exact answer through per-partition Misra-Gries
    // --- candidates + a candidate-restricted exact count, shuffling
    // --- O(k·partitions) instead of O(vocabulary). ----------------------------
    q("txt14_heavy_tokens",
      s"""WITH toks AS (SELECT unnest($toksSql) AS term FROM documents),
         |f AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1)
         |SELECT term, cnt FROM f
         |WHERE cnt * 50 > (SELECT SUM(cnt) FROM f)""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
      graft.operators.HeavyHitters.heavyHitters(toks, "term", k = 50)
    },

    // --- the END-TO-END curation pipeline, composed from the individual
    // --- operators the other txt gates pin one by one: tokenize → quality
    // --- filter (length + stopword ratio) → language filter → exact dedup
    // --- (planted dups removed, Dedup.exactDedup) → deterministic split →
    // --- per-(split, label) corpus stats. One query = the "could a user run
    // --- their whole pipeline on this engine" check; every stage's exchange
    // --- shape is already audited by its own gate. ----------------------------
    q("txt15_e2e_pipeline",
      s"""WITH $corpusSql,
         |t AS (SELECT doc_id, text, $toksSql AS toks FROM corpus),
         |m AS (SELECT doc_id, text, len(toks) AS n_tokens,
         |  CAST(len(list_filter(toks, x -> x = 'a' OR x = 'the')) AS DOUBLE)/len(toks) AS stop_ratio,
         |  CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS BIGINT) AS n_art,
         |  CAST(len(list_filter(toks, x -> x = 'join' OR x = 'table' OR x = 'scan')) AS BIGINT) AS n_query,
         |  CAST(len(list_filter(toks, x -> x = 'stream' OR x = 'window' OR x = 'batch')) AS BIGINT) AS n_stream
         |  FROM t),
         |f AS (SELECT *, CASE WHEN n_art >= n_query AND n_art >= n_stream THEN 'article'
         |    WHEN n_query >= n_stream THEN 'query' ELSE 'stream' END AS label
         |  FROM m WHERE n_tokens >= 25 AND stop_ratio < 0.15),
         |g AS (SELECT * FROM f WHERE label <> 'article'),
         |d AS (SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens,
         |    MIN(label) AS label, MIN(CAST(length(text) AS BIGINT)) AS n_chars
         |  FROM g GROUP BY md5(text)),
         |s AS (SELECT *, ${hex32Sql("'7:'||CAST(doc_id AS VARCHAR)")} % 10 AS bucket FROM d)
         |SELECT CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
         |    ELSE 'test' END AS split, label,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |FROM s GROUP BY 1, 2""".stripMargin) { (s, d) =>
      def marker(words: String*) =
        size(filter(col("toks"), x => words.map(x === _).reduce(_ || _))).cast("long")
      val staged = corpus(s, d)
        .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("toks"))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("stop_ratio",
          size(filter(col("toks"), x => x === "a" || x === "the")).cast("double") /
            col("n_tokens"))
        .filter(col("n_tokens") >= 25 && col("stop_ratio") < 0.15)
        .withColumn("n_art", marker("the", "a"))
        .withColumn("n_query", marker("join", "table", "scan"))
        .withColumn("n_stream", marker("stream", "window", "batch"))
        .withColumn("label",
          when(col("n_art") >= col("n_query") && col("n_art") >= col("n_stream"), "article")
            .when(col("n_query") >= col("n_stream"), "query")
            .otherwise("stream"))
        .filter(col("label") =!= "article")
      graft.operators.Dedup.exactDedup(staged, "doc_id", "text")
        .withColumn("split",
          TextOps.splitLabel(TextOps.splitBucket(col("doc_id"), salt = 7, nBuckets = 10)))
        .groupBy(col("split"), col("label"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"))
    },

    // --- PII redaction scrub (TextOps.redactPii): emails → <email>, IPv4s →
    // --- <ip>, phones → <phone>, planted identically on both sides so the
    // --- scrub does real work. Patterns are character classes + \b only —
    // --- Java regex and RE2 agree; replacement order is part of the
    // --- operator contract. One projection, zero shuffles. -------------------
    q("txt17_pii_redact",
      """WITH noisy AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |    || '.7 or call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    AS raw FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<email>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<ip>', 'g'),
        |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<phone>', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(raw, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(raw, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS INT) AS n_phones
        |FROM noisy""".stripMargin) { (s, d) =>
      val raw = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com from 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".7 or call 415-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      Tables.documents(s, d)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          TextOps.redactPii(col("raw")).as("clean_text"),
          size(regexp_extract_all(col("raw"), lit(TextOps.EmailPattern), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("raw"), lit(TextOps.Ipv4Pattern), lit(0))).as("n_ips"),
          size(regexp_extract_all(col("raw"), lit(TextOps.PhonePattern), lit(0))).as("n_phones"))
    },

    // --- repetition metrics + composite quality-rule flag (the Gopher-style
    // --- document filter): duplicate-3-shingle fraction, single-token
    // --- dominance, token-count band → one boolean keep. Ratios are exact
    // --- integer divisions (IEEE-identical across engines), so the flag
    // --- hash-matches. Shapes: one projection for the shingle metric, one
    // --- explode + two hash-aggs for token dominance — the distributed
    // --- shape (the per-row array alternative is O(n·distinct) per doc). ------
    q("txt18_repetition",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |base AS (SELECT doc_id, len(toks) AS n_tokens,
         |  [array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks)-2)] AS sh3
         |  FROM t),
         |rep AS (SELECT doc_id, n_tokens,
         |  CASE WHEN len(sh3) = 0 THEN 0.0
         |    ELSE 1.0 - CAST(len(list_distinct(sh3)) AS DOUBLE)/len(sh3) END AS dup_shingle_frac
         |  FROM base),
         |top AS (SELECT doc_id, MAX(c) AS topc FROM (
         |  SELECT doc_id, tok, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2) GROUP BY 1)
         |SELECT r.doc_id, r.n_tokens, r.dup_shingle_frac,
         |  CAST(top.topc AS DOUBLE)/r.n_tokens AS top_token_frac,
         |  (r.n_tokens >= 25 AND r.dup_shingle_frac < 0.05
         |    AND CAST(top.topc AS DOUBLE)/r.n_tokens < 0.15) AS keep
         |FROM rep r JOIN top USING (doc_id)""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val rep = toks.select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          TextOps.shingles(col("toks"), 3).as("sh3"))
        .select(col("doc_id"), col("n_tokens"),
          when(size(col("sh3")) === 0, 0.0)
            .otherwise(lit(1.0) - size(array_distinct(col("sh3"))).cast("double") /
              size(col("sh3"))).as("dup_shingle_frac"))
      val top = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("topc"))
      rep.join(top, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("dup_shingle_frac"),
          (col("topc").cast("double") / col("n_tokens")).as("top_token_frac"))
        .withColumn("keep", col("n_tokens") >= 25 &&
          col("dup_shingle_frac") < 0.05 && col("top_token_frac") < 0.15)
    },

    // --- balanced per-source deterministic sampling: exactly k docs per
    // --- source, chosen by salted md5 rank — the "equal representation per
    // --- domain" sampling step of corpus curation, stable across runs/
    // --- engines/cluster sizes (TopK.topKPerGroup over the hash, so the
    // --- selection is the skew-safe bounded-buffer aggregation, not a
    // --- window sort; hex32 values are 32-bit → exact in DOUBLE). -----------
    q("txt19_stratified_sample",
      s"""WITH h AS (SELECT doc_id, source,
         |  ${hex32Sql("'9:'||CAST(doc_id AS VARCHAR)")} AS hv FROM documents)
         |SELECT source, rank, doc_id, CAST(hv AS DOUBLE) AS hv FROM (
         |  SELECT source, doc_id, hv,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv DESC, doc_id) AS rank
         |  FROM h) t WHERE rank <= 3""".stripMargin) { (s, d) =>
      val hv = TextOps.hex32(col("doc_id").cast("string"), salt = 9)
      graft.operators.TopK.topKPerGroup(
        Tables.documents(s, d).select(col("source"), col("doc_id"), hv.as("hv")),
        "source", "hv", "doc_id", k = 3)
        .select(col("source"), col("rank"), col("doc_id"), col("hv"))
    },

    // --- passage-level (sub-document) exact dedup (Dedup.passageStats):
    // --- 20-token blocks content-hashed; an occurrence is a dup unless it is
    // --- the globally FIRST (by doc_id, slot) occurrence of that content —
    // --- boilerplate removal between whole-doc dedup and near-dup. Run over
    // --- the planted-duplicate corpus so real cross-doc passage dups exist;
    // --- the oracle restates first-occurrence as a ROW_NUMBER over the same
    // --- blocks (hashes shuffle, never passage text). ------------------------
    q("txt20_passage_dedup",
      s"""WITH $corpusSql,
         |t AS (SELECT doc_id, $toksSql AS toks FROM corpus),
         |b AS (SELECT doc_id, len(toks) AS n_tokens,
         |  CASE WHEN len(toks) < 20 THEN [] ELSE
         |    [md5(array_to_string(toks[20*i+1:20*i+20], ' '))
         |     for i in generate_series(0, len(toks)//20 - 1)] END AS hs
         |  FROM t),
         |e AS (SELECT doc_id, unnest([{'slot': i-1, 'h': hs[i]}
         |    for i in generate_series(1, len(hs))], recursive := true) FROM b),
         |r AS (SELECT doc_id, slot, h,
         |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, slot) AS rn FROM e),
         |p AS (SELECT doc_id, COUNT(*) AS n_passages,
         |    SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS n_dup FROM r GROUP BY 1)
         |SELECT b.doc_id, b.n_tokens,
         |  CAST(COALESCE(p.n_passages, 0) AS BIGINT) AS n_passages,
         |  CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_passages,
         |  b.n_tokens - 20 * CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS kept_tokens
         |FROM b LEFT JOIN p USING (doc_id)""".stripMargin) { (s, d) =>
      Dedup.passageStats(corpus(s, d), "doc_id", "text", blockTokens = 20)
    },

    // --- Count-Min sketch (Sketches): KB-sized frequency summary, merged by
    // --- commutative addition — the fixed-size alternative when exact
    // --- per-term counts (shuffle O(vocabulary)) are too big. q27-style
    // --- self-validation IN the plan: every term's estimate must satisfy
    // --- the one-sided CMS contract (est ≥ exact, est ≤ exact + ε·N with
    // --- ε = 2/width over the min of 4 hash rows); the verdict is emitted
    // --- as data (q27 discipline) next to the exact, oracle-able corpus
    // --- stats — sketch internals are engine-specific, the estimate
    // --- contract is not, so the contract verdict is what hash-matches. ------
    // --- distributed BPE tokenizer training (txt33, hash-green): learn 8
    // --- byte-pair merges from the corpus (Sennrich'16) — per round one
    // --- adjacent-pair count (shuffle O(distinct pairs)), a bounded
    // --- take(1) argmax with lexicographic ties, one word rewrite.
    // --- Twice-validated: the gate emits rows only if the merge table
    // --- satisfies the BPE contract (ranks dense from 0, merged =
    // --- left+right, selected counts non-increasing), AND the DuckDB
    // --- oracle independently re-derives the full merge table by 8
    // --- unrolled CTE rounds ([[bpeSql]]) — value-exact, not rows-only. --
    Q("txt33_bpe_train", (s, d) => {
      import s.implicits._
      val merges = TextOps.bpeTrain(
        Tables.documents(s, d).select("text"), "text", merges = 8)
      val ok = merges.nonEmpty &&
        merges.sliding(2).forall {
          case Seq(a, b) => a.pair_count >= b.pair_count
          case _ => true
        } &&
        merges.zipWithIndex.forall { case (m, i) =>
          m.rank == i && m.merged == m.left + m.right && m.pair_count > 0 }
      // `left`/`right`/`rank` are SQL reserved words — rename for the
      // driver's DuckDB-side projection of the dumped parquet
      (if (ok) merges else Seq.empty[TextOps.BpeMerge]).toDF()
        .select(col("rank").as("merge_rank"), col("left").as("lhs"),
          col("right").as("rhs"), col("merged"), col("pair_count"))
    }, Some(
      s"""WITH ${bpeSql(8, "documents")}
         |SELECT * FROM (
         |${(1 to 8).map(r =>
             s"SELECT ${r - 1} AS merge_rank, lhs, rhs, lhs || rhs AS merged, " +
               s"n AS pair_count FROM m$r").mkString("\nUNION ALL\n")}
         |)""".stripMargin)),

    // --- BPE encode (txt34, hash-green): apply txt33's learned merge table
    // --- to the corpus — the token count under the learned vocabulary, the
    // --- number a pipeline budgets with. The operator itself throws unless
    // --- symbol concatenation restores every word; the DuckDB oracle
    // --- re-derives per-doc symbol counts from [[bpeSql]]'s final vocab
    // --- state v8: the 8 training rewrites ARE the sequential greedy
    // --- encode of every corpus word, and bpeEncode's lowest-rank-first
    // --- fixpoint agrees with that sweep (spec-pinned; they can differ
    // --- only when a later merge resurrects an earlier pair, which the
    // --- learned ASCII merge table cannot do). --------------------------
    Q("txt34_bpe_encode", (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = TextOps.bpeTrain(docs.select("text"), "text", merges = 8)
      TextOps.bpeEncode(docs, "doc_id", "text", merges)
    }, Some(
      s"""WITH ${bpeSql(8, "documents")},
         |w0 AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
         |ag AS (
         |  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(len(w.word)) AS BIGINT) AS n_chars,
         |    CAST(SUM(len(v.syms)) AS BIGINT) AS n_symbols
         |  FROM w0 w JOIN v8 v USING (word) GROUP BY w.doc_id
         |)
         |SELECT d.doc_id, COALESCE(ag.n_words, 0) AS n_words,
         |  COALESCE(ag.n_chars, 0) AS n_chars,
         |  COALESCE(ag.n_symbols, 0) AS n_symbols
         |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin)),

    Q("txt21_cms_frequencies", (s, d) => {
      val width = graft.operators.Sketches.DefaultWidth
      val toks = graft.Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("term"))
      val sketch = graft.operators.Sketches.cmsBuild(toks, "term")
      val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      // verdict-as-data (q27 discipline, hash-green): n_terms/n_tokens are
      // exact and oracle-able; the one-sided CMS contract (est ≥ exact,
      // est ≤ exact + ε·N, ε = 2/width over the min of 4 hash rows) folds
      // into `ok`, matched against the oracle's literal TRUE.
      exact.crossJoin(broadcast(sketch))
        .withColumn("est", graft.operators.Sketches.cmsEstimate(col("_cms"), col("term")))
        .agg(count(lit(1)).as("n_terms"),
          sum(col("cnt")).as("n_tokens"),
          sum(when(col("est") < col("cnt"), 1L).otherwise(0L)).as("n_underestimates"),
          max(col("est") - col("cnt")).as("max_overestimate"))
        .select(col("n_terms"), col("n_tokens"),
          (col("n_underestimates") === 0 &&
            col("max_overestimate") <= ceil(lit(2.0 / width) * col("n_tokens")))
            .as("ok"))
    }, Some(
      s"""SELECT COUNT(DISTINCT t) AS n_terms, COUNT(*) AS n_tokens, TRUE AS ok
         |FROM (SELECT unnest($toksSql) AS t FROM documents)""".stripMargin)),

    // --- corpus-trained bigram-LM predictability (the KenLM-style quality
    // --- signal without logs): score(doc) = mean over its bigram
    // --- occurrences of P(w2|w1) = c(w1,w2)/c(w1·), counts trained on the
    // --- corpus itself. High score ⇒ templated/boilerplate text; low ⇒
    // --- unusual token transitions. Per-occurrence p is ONE double divide
    // --- of two BIGINTs (IEEE-identical on every engine); the mean is the
    // --- decimal-cast exact sum (Qutil.dsum discipline), so the gate
    // --- hash-matches. Scale shape: bigrams shuffle O(occurrences) through
    // --- two hash aggs (both partial-agg) and two equi-joins; no vocab
    // --- ever sits on one node. Docs under 2 tokens keep a row (n=0,
    // --- score NULL) via the left join. --------------------------------------
    q("txt22_bigram_lm",
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |bi AS (SELECT doc_id, unnest(
         |  [{'w1': t[i], 'w2': t[i+1]} for i in generate_series(1, len(t)-1)],
         |  recursive := true) FROM toks),
         |bg AS (SELECT w1, w2, COUNT(*) AS c_bg FROM bi GROUP BY 1, 2),
         |hd AS (SELECT w1, COUNT(*) AS c_head FROM bi GROUP BY 1),
         |ps AS (SELECT doc_id, CAST(c_bg AS DOUBLE)/CAST(c_head AS DOUBLE) AS p
         |  FROM bi JOIN bg USING (w1, w2) JOIN hd USING (w1)),
         |ag AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(CAST(p AS DECIMAL(18,12))) AS DOUBLE)/COUNT(*) AS predictability
         |  FROM ps GROUP BY 1)
         |SELECT d.doc_id, COALESCE(ag.n_bigrams, 0) AS n_bigrams, ag.predictability
         |FROM documents d LEFT JOIN ag ON d.doc_id = ag.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val t = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      val nbg = greatest(size(col("t")) - 1, lit(0))
      val bi = t.select(col("doc_id"), explode(zip_with(
          slice(col("t"), lit(1), nbg), slice(col("t"), lit(2), nbg),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val bg = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bg"))
      val hd = bi.groupBy(col("w1")).agg(count(lit(1)).as("c_head"))
      val ps = bi.join(bg, Seq("w1", "w2")).join(hd, Seq("w1"))
        .select(col("doc_id"),
          (col("c_bg").cast("double") / col("c_head").cast("double")).as("p"))
      val ag = ps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_bigrams"),
        (dsum(col("p"), 12) / count(lit(1))).as("predictability"))
      docs.select(col("doc_id")).join(ag, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          col("predictability"))
    },

    // --- exact n-gram overlap decontamination (the membership complement of
    // --- txt16's LSH similarity check): for each clipped eval doc, the
    // --- count and fraction of its 4-grams that appear verbatim ANYWHERE in
    // --- the training corpus. Both sides reduce to md5 keys before the
    // --- join — gram text never shuffles; the fraction is one bigint/bigint
    // --- IEEE divide ⇒ hash-exact. -------------------------------------------
    q("txt23_ngram_overlap",
      s"""WITH ev AS (SELECT doc_id+200000 AS doc_id,
         |    substr(text, 1, greatest(CAST(length(text) AS INT)-10, 0)) AS text
         |  FROM documents WHERE doc_id%17=0),
         |ttok AS (SELECT $toksSql AS t FROM documents),
         |tg AS (SELECT DISTINCT unnest(
         |  [md5(array_to_string(t[i:i+3], ' ')) for i in generate_series(1, len(t)-3)]) AS g
         |  FROM ttok),
         |etok AS (SELECT doc_id, $toksSql AS t FROM ev),
         |eg AS (SELECT doc_id, unnest(
         |  [md5(array_to_string(t[i:i+3], ' ')) for i in generate_series(1, len(t)-3)]) AS g
         |  FROM etok),
         |ov AS (SELECT eg.doc_id, COUNT(*) AS n_grams,
         |  CAST(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
         |  FROM eg LEFT JOIN tg ON eg.g = tg.g GROUP BY 1)
         |SELECT ev.doc_id, COALESCE(ov.n_grams, 0) AS n_grams,
         |  COALESCE(ov.n_overlap, 0) AS n_overlap,
         |  CAST(ov.n_overlap AS DOUBLE)/CAST(ov.n_grams AS DOUBLE) AS overlap_frac
         |FROM ev LEFT JOIN ov ON ev.doc_id = ov.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val eval = docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          expr("substring(text, 1, length(text)-10)").as("text"))
      Dedup.ngramOverlap(docs, eval, "doc_id", "text", n = 4)
    },

    // --- Bloom-prefiltered decontamination (RuntimeFilter composed into
    // --- txt23): identical semantics and oracle, but the train-side gram
    // --- distinct — the ONE LLM-pipeline exchange that scales with the
    // --- TRAIN corpus — is preceded by a map-side Bloom probe against the
    // --- (tiny) eval gram set, so only eval-adjacent train grams shuffle.
    // --- The gate pins that the pruned plan stays oracle-exact; the row-
    // --- count shrink itself is pinned in DedupSpec. ---------------------------
    q("txt24_ngram_overlap_pruned",
      s"""WITH ev AS (SELECT doc_id+200000 AS doc_id,
         |    substr(text, 1, greatest(CAST(length(text) AS INT)-10, 0)) AS text
         |  FROM documents WHERE doc_id%17=0),
         |ttok AS (SELECT $toksSql AS t FROM documents),
         |tg AS (SELECT DISTINCT unnest(
         |  [md5(array_to_string(t[i:i+3], ' ')) for i in generate_series(1, len(t)-3)]) AS g
         |  FROM ttok),
         |etok AS (SELECT doc_id, $toksSql AS t FROM ev),
         |eg AS (SELECT doc_id, unnest(
         |  [md5(array_to_string(t[i:i+3], ' ')) for i in generate_series(1, len(t)-3)]) AS g
         |  FROM etok),
         |ov AS (SELECT eg.doc_id, COUNT(*) AS n_grams,
         |  CAST(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
         |  FROM eg LEFT JOIN tg ON eg.g = tg.g GROUP BY 1)
         |SELECT ev.doc_id, COALESCE(ov.n_grams, 0) AS n_grams,
         |  COALESCE(ov.n_overlap, 0) AS n_overlap,
         |  CAST(ov.n_overlap AS DOUBLE)/CAST(ov.n_grams AS DOUBLE) AS overlap_frac
         |FROM ev LEFT JOIN ov ON ev.doc_id = ov.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val eval = docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          expr("substring(text, 1, length(text)-10)").as("text"))
      Dedup.ngramOverlapPruned(docs, eval, "doc_id", "text", n = 4)
    },

    // --- sequence packing (TextOps.packSequences): the pretraining concat-
    // --- and-chunk layout — every doc's global token offset and the
    // --- first/last 512-token training sequence it lands in, in doc_id
    // --- order. The oracle is the naive single-window running sum; the
    // --- operator computes the SAME numbers with a two-level prefix sum
    // --- (per-bucket windows + an nBuckets-row driver prefix) so no task
    // --- ever sees the whole corpus. All-integer ⇒ hash-exact. ----------------
    q("txt25_pack_sequences",
      s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM t)
         |SELECT doc_id, n_tokens, start_tok,
         |  CAST(CASE WHEN n_tokens > 0 THEN start_tok // 512 END AS BIGINT) AS seq_first,
         |  CAST(CASE WHEN n_tokens > 0 THEN (start_tok + n_tokens - 1) // 512 END AS BIGINT) AS seq_last
         |FROM c""".stripMargin) { (s, d) =>
      TextOps.packSequences(Tables.documents(s, d), "doc_id", "text",
        seqLen = 512, nBuckets = 16)
    },

    // --- token-budget mixture sampling (TextOps.sampleMixture): per-source
    // --- acceptance fraction min(1, budget·w/tokens) applied via the salted
    // --- 32-bit hash threshold — deterministic doc selection, replayed
    // --- doc-for-doc by the oracle. src4's weight oversubscribes its corpus
    // --- (fraction clamps to 1); unweighted sources drop via the inner
    // --- join; the threshold floor(f·2^32) makes acceptance an integer
    // --- compare so the only IEEE surface is the fraction itself. -------------
    q("txt26_mixture_sample",
      s"""WITH t AS (SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |w(source, w) AS (VALUES ('src0', CAST(0.5 AS DOUBLE)),
         |  ('src1', CAST(0.2 AS DOUBLE)), ('src2', CAST(0.25 AS DOUBLE)),
         |  ('src3', CAST(0.05 AS DOUBLE)), ('src4', CAST(1.0 AS DOUBLE))),
         |tot AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tok
         |  FROM t GROUP BY 1),
         |thr AS (SELECT w.source,
         |  CAST(floor(least(CAST(1.0 AS DOUBLE), 2000.0 * w / CAST(tok AS DOUBLE))
         |    * 4294967296.0) AS BIGINT) AS thr
         |  FROM w JOIN tot USING (source))
         |SELECT t.doc_id, t.source, t.n_tokens
         |FROM t JOIN thr ON t.source = thr.source
         |WHERE ${hex32Sql("'77:'||CAST(doc_id AS VARCHAR)")} < thr""".stripMargin) { (s, d) =>
      TextOps.sampleMixture(Tables.documents(s, d), "doc_id", "source", "text",
        weights = Map("src0" -> 0.5, "src1" -> 0.2, "src2" -> 0.25,
          "src3" -> 0.05, "src4" -> 1.0),
        tokenBudget = 2000L, salt = 77)
    },

    // --- Spearman rank correlation (txt75): does doc LENGTH predict the
    // --- stopword-quality signal? Pearson over exact integer RANKS (ties
    // --- broken by doc id — total order, deterministic; bias vs averaged
    // --- ranks documented) — q64's sufficient-statistics discipline with
    // --- rank sums exact integers, two sqrt + one divide at the end. The
    // --- corpus-diagnostic that tells whether a length filter double-
    // --- counts a quality filter. ----------------------------------------
    q("txt75_spearman",
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS len,
         |  CAST(len(list_filter($toksSql, x -> x = 'a' OR x = 'the')) AS DOUBLE)
         |    / len($toksSql) AS ratio
         |  FROM documents),
         |r AS (SELECT
         |  ROW_NUMBER() OVER (ORDER BY len, doc_id) AS rx,
         |  ROW_NUMBER() OVER (ORDER BY ratio, doc_id) AS ry
         |  FROM t),
         |st AS (SELECT COUNT(*) AS n,
         |  CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
         |  CAST(SUM(rx*ry) AS BIGINT) AS sxy,
         |  CAST(SUM(rx*rx) AS BIGINT) AS sxx, CAST(SUM(ry*ry) AS BIGINT) AS syy
         |  FROM r)
         |SELECT n,
         |  CAST(n*sxy - sx*sy AS DOUBLE)
         |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
         |       * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS spearman
         |FROM st""".stripMargin) { (s, d) =>
      val toks = TextOps.tokens(col("text"))
      val t = Tables.documents(s, d).select(col("doc_id"),
        size(toks).cast("long").as("len"),
        (size(filter(toks, x => x === "a" || x === "the")).cast("double") /
          size(toks)).as("ratio"))
      // both ranks via the two-level global row_number (GlobalRank) — the
      // naive form is TWO single-partition windows over all documents
      val r = GlobalRank.rowNumber(
          GlobalRank.rowNumber(t, Seq(col("len"), col("doc_id")), "rx"),
          Seq(col("ratio"), col("doc_id")), "ry")
        .select(col("rx"), col("ry"))
      val st = r.agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      st.select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("spearman"))
    },

    // --- stopword-profile drift (txt74): per source, percentiles of the
    // --- per-doc stopword ratio — a source whose profile sits far from
    // --- the corpus band is template-heavy or mis-languaged (the drift
    // --- txt29's calibration then corrects per source). txt02's ratio as
    // --- one projection; portable percentiles per source. -----------------
    q("txt74_stopword_profile",
      s"""WITH t AS (SELECT source,
         |  CAST(len(list_filter($toksSql, x -> x = 'a' OR x = 'the')) AS DOUBLE)
         |    / len($toksSql) AS ratio
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  quantile_cont(ratio, 0.1) AS p10, quantile_cont(ratio, 0.5) AS p50,
         |  quantile_cont(ratio, 0.9) AS p90
         |FROM t GROUP BY 1""".stripMargin) { (s, d) =>
      val toks = TextOps.tokens(col("text"))
      Tables.documents(s, d)
        .select(col("source"),
          (size(filter(toks, x => x === "a" || x === "the")).cast("double") /
            size(toks)).as("ratio"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(ratio, 0.1)").as("p10"),
          expr("percentile(ratio, 0.5)").as("p50"),
          expr("percentile(ratio, 0.9)").as("p90"))
    },

    // --- token-length percentile table (txt73): p10/p50/p90 token lengths
    // --- per source — the stats that size txt47's batching bands and
    // --- txt25's packing sequence length before a run commits to them.
    // --- One projection + one portable-percentile aggregation per source.
    q("txt73_length_percentiles",
      s"""WITH t AS (SELECT source, CAST(len($toksSql) AS BIGINT) AS n
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |  quantile_cont(n, 0.1) AS p10, quantile_cont(n, 0.5) AS p50,
         |  quantile_cont(n, 0.9) AS p90, CAST(MAX(n) AS BIGINT) AS max_len
         |FROM t GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          size(TextOps.tokens(col("text"))).cast("long").as("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          expr("percentile(n, 0.1)").as("p10"),
          expr("percentile(n, 0.5)").as("p50"),
          expr("percentile(n, 0.9)").as("p90"),
          max(col("n")).as("max_len"))
    },

    // --- classifier AUC (txt72): the Mann–Whitney rank-sum form
    // --- AUC = (Σ ranks(pos) − n₊(n₊+1)/2) / (n₊·n₋) — threshold-free
    // --- discrimination in ONE ranked pass, exact integers until the
    // --- final divide (score ties broken by doc id: deterministic both
    // --- engines, bias documented vs tie-averaged ranks; planted twins
    // --- separate cleanly so ties are rare). Completes the eval set:
    // --- txt60 one threshold, txt67 all deciles, txt72 the integral. -----
    q("txt72_classifier_auc",
      s"""WITH lab AS (
         |  SELECT doc_id, text, TRUE AS pos FROM documents
         |  UNION ALL SELECT doc_id + 500000, replace(text, ' ', ' zz '), FALSE
         |  FROM documents),
         |tok AS (SELECT pos, unnest($toksSql) AS tok FROM lab),
         |hh AS (SELECT pos, CAST(${hex32Sql("'36:'||tok")} % 256 AS INT) AS h FROM tok),
         |cnt AS (SELECT h, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
         |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg FROM hh GROUP BY h),
         |tot AS (SELECT SUM(n_pos) AS np, SUM(n_neg) AS nn FROM cnt),
         |w AS (SELECT gs.h,
         |    CAST(COALESCE(c.n_pos, 0) + 1 AS DOUBLE) / CAST(np + 256 AS DOUBLE)
         |    - CAST(COALESCE(c.n_neg, 0) + 1 AS DOUBLE) / CAST(nn + 256 AS DOUBLE) AS w
         |  FROM generate_series(0, 255) gs(h) LEFT JOIN cnt c ON gs.h = c.h
         |  CROSS JOIN tot),
         |dt AS (SELECT doc_id, unnest($toksSql) AS tok FROM lab),
         |sc AS (SELECT dt.doc_id,
         |    CAST(SUM(CAST(w.w AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS score
         |  FROM dt JOIN w ON CAST(${hex32Sql("'36:'||dt.tok")} % 256 AS INT) = w.h
         |  GROUP BY dt.doc_id),
         |rk AS (SELECT lab.pos,
         |  ROW_NUMBER() OVER (ORDER BY sc.score, lab.doc_id) AS r
         |  FROM lab JOIN sc ON lab.doc_id = sc.doc_id)
         |SELECT CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         |  CAST(SUM(CASE WHEN pos THEN r ELSE 0 END)
         |      - SUM(CASE WHEN pos THEN 1 ELSE 0 END)
         |        * (SUM(CASE WHEN pos THEN 1 ELSE 0 END) + 1) // 2 AS DOUBLE)
         |    / (SUM(CASE WHEN pos THEN 1 ELSE 0 END)
         |       * SUM(CASE WHEN NOT pos THEN 1 ELSE 0 END)) AS auc
         |FROM rk""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val lab = docs.withColumn("pos", lit(true)).unionByName(
        docs.select((col("doc_id") + 500000).as("doc_id"),
          expr("replace(text, ' ', ' zz ')").as("text"))
          .withColumn("pos", lit(false)))
      val weights = TextOps.classifierTrain(lab, "pos", "text", dims = 256)
      // rank-sum over ALL scored docs via the two-level global row_number
      // (never a single-partition window over the corpus)
      val rk = GlobalRank.rowNumber(
          TextOps.classifierScore(lab, "doc_id", "text", weights, dims = 256)
            .join(lab.select(col("doc_id"), col("pos")), Seq("doc_id")),
          Seq(col("score"), col("doc_id")), "r")
        .select(col("pos"), col("r"))
      def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
      rk.agg(cnt(col("pos")).as("n_pos"), cnt(!col("pos")).as("n_neg"),
          sum(when(col("pos"), col("r")).otherwise(0L)).as("_rs"))
        .select(col("n_pos"), col("n_neg"),
          (expr("_rs - n_pos * (n_pos + 1) div 2").cast("double")
            / (col("n_pos") * col("n_neg"))).as("auc"))
    },

    // --- tokenizer fertility report (txt71): chars-per-symbol under the
    // --- learned BPE vocabulary, per source — the tokenizer-efficiency
    // --- metric (a source compressing poorly pays more context budget per
    // --- character; domain-mismatched vocabularies show up here first).
    // --- Rides txt34's encode counts rolled up per source; the oracle
    // --- re-derives symbol counts from the unrolled-Lloyd... unrolled-BPE
    // --- v8 vocab state. --------------------------------------------------
    Q("txt71_fertility", (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = TextOps.bpeTrain(docs.select("text"), "text", merges = 8)
      TextOps.bpeEncode(docs, "doc_id", "text", merges)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).as("n_chars"),
          sum(col("n_symbols")).as("n_symbols"))
        .withColumn("chars_per_symbol",
          col("n_chars").cast("double") / col("n_symbols"))
    }, Some(
      s"""WITH ${bpeSql(8, "documents")},
         |w0 AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
         |j AS (SELECT w.doc_id, CAST(len(w.word) AS BIGINT) AS nc,
         |  CAST(len(v.syms) AS BIGINT) AS ns
         |  FROM w0 w JOIN v8 v USING (word)),
         |d2 AS (SELECT documents.source, j.nc, j.ns
         |  FROM j JOIN documents USING (doc_id))
         |SELECT source, CAST(SUM(nc) AS BIGINT) AS n_chars,
         |  CAST(SUM(ns) AS BIGINT) AS n_symbols,
         |  CAST(SUM(nc) AS DOUBLE)/SUM(ns) AS chars_per_symbol
         |FROM d2 GROUP BY 1""".stripMargin)),

    // --- per-source duplication rate (txt70): what fraction of each
    // --- source's docs sit in ANY near-dup pair — the per-feed dirtiness
    // --- scoreboard that decides where dedup effort goes (txt63 profiles
    // --- degrees; this localizes them). Dup membership from the banded
    // --- pairs; one distinct + one source rollup. -------------------------
    q("txt70_source_dup_rate",
      s"""WITH $corpusSql,
         |$minhashSql,
         |src AS (SELECT doc_id, source FROM documents
         |  UNION ALL SELECT doc_id + 100000, source FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + 200000, source FROM documents WHERE doc_id % 17 = 0),
         |dup AS (SELECT DISTINCT d FROM (
         |  SELECT a AS d FROM pairs UNION ALL SELECT b FROM pairs) z),
         |pe AS (SELECT src.source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN dup.d IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM src LEFT JOIN dup ON src.doc_id = dup.d GROUP BY 1)
         |SELECT source, n_docs, n_dup,
         |  CAST(n_dup AS DOUBLE)/n_docs AS dup_rate
         |FROM pe""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val srcMap = docs.select(col("doc_id"), col("source"))
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("source")))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("source")))
      val pairs = Dedup.minhashCandidatePairs(corpus(s, d), "doc_id", "text")
      val dup = pairs.select(col("a").as("d"))
        .unionAll(pairs.select(col("b").as("d"))).distinct()
      srcMap.join(dup, col("doc_id") === col("d"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("d").isNotNull, 1L).otherwise(0L)).as("n_dup"))
        .withColumn("dup_rate", col("n_dup").cast("double") / col("n_docs"))
    },

    // --- mixture-achievement audit (txt69): did the sampled corpus HIT
    // --- its target mixture? Per source: target tokens (budget·w capped
    // --- at availability), achieved tokens from the txt26 sampler, and
    // --- the achieved/target ratio — the validation report a mixture run
    // --- ships (hash sampling only approximates fractions; this is where
    // --- you see by how much). All counts exact; one ratio per source. ---
    q("txt69_mixture_audit",
      s"""WITH t AS (SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |w(source, w) AS (VALUES ('src0', CAST(0.5 AS DOUBLE)),
         |  ('src1', CAST(0.2 AS DOUBLE)), ('src2', CAST(0.25 AS DOUBLE)),
         |  ('src3', CAST(0.05 AS DOUBLE)), ('src4', CAST(1.0 AS DOUBLE))),
         |tot AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tok
         |  FROM t GROUP BY 1),
         |thr AS (SELECT w.source, w.w, tot.tok,
         |  CAST(floor(least(CAST(1.0 AS DOUBLE), 2000.0 * w / CAST(tok AS DOUBLE))
         |    * 4294967296.0) AS BIGINT) AS thr
         |  FROM w JOIN tot USING (source)),
         |got AS (SELECT t.source, CAST(SUM(t.n_tokens) AS BIGINT) AS achieved
         |  FROM t JOIN thr ON t.source = thr.source
         |  WHERE ${hex32Sql("'77:'||CAST(doc_id AS VARCHAR)")} < thr.thr
         |  GROUP BY 1)
         |SELECT thr.source,
         |  CAST(LEAST(CAST(2000.0 * thr.w AS DOUBLE), CAST(thr.tok AS DOUBLE)) AS DOUBLE)
         |    AS target_tokens,
         |  COALESCE(got.achieved, 0) AS achieved_tokens,
         |  CAST(COALESCE(got.achieved, 0) AS DOUBLE)
         |    / LEAST(CAST(2000.0 * thr.w AS DOUBLE), CAST(thr.tok AS DOUBLE))
         |    AS achievement
         |FROM thr LEFT JOIN got ON thr.source = got.source""".stripMargin) { (s, d) =>
      val weights = Map("src0" -> 0.5, "src1" -> 0.2, "src2" -> 0.25,
        "src3" -> 0.05, "src4" -> 1.0)
      import s.implicits._
      val docs = Tables.documents(s, d)
      val t = docs.select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      val tot = t.groupBy(col("source")).agg(sum(col("n_tokens")).as("tok"))
      val w = weights.toSeq.toDF("source", "w")
      val sampled = TextOps.sampleMixture(docs, "doc_id", "source", "text",
          weights = weights, tokenBudget = 2000L, salt = 77)
        .groupBy(col("source")).agg(sum(col("n_tokens")).as("achieved"))
      val target = least(lit(2000.0) * col("w"), col("tok").cast("double"))
      w.join(tot, Seq("source"))
        .join(sampled, Seq("source"), "left")
        .select(col("source"), target.as("target_tokens"),
          coalesce(col("achieved"), lit(0L)).as("achieved_tokens"),
          (coalesce(col("achieved"), lit(0L)).cast("double") / target)
            .as("achievement"))
    },

    // --- composed layout pipeline (the txt15/cdc18 pattern for the new
    // --- operators): mixture-sample the corpus to a token budget, then
    // --- sequence-pack the SURVIVORS — the last two stages a pretraining
    // --- data pipeline runs before tokenized shards ship. Pins that the
    // --- deterministic acceptance set feeds the prefix sum unchanged (any
    // --- acceptance flip or offset drift breaks the all-integer hash). -------
    q("txt27_sample_pack_pipeline",
      s"""WITH t AS (SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents),
         |w(source, w) AS (VALUES ('src0', CAST(0.6 AS DOUBLE)),
         |  ('src1', CAST(0.3 AS DOUBLE)), ('src2', CAST(0.4 AS DOUBLE)),
         |  ('src5', CAST(2.0 AS DOUBLE))),
         |tot AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tok
         |  FROM t GROUP BY 1),
         |thr AS (SELECT w.source,
         |  CAST(floor(least(CAST(1.0 AS DOUBLE), 1500.0 * w / CAST(tok AS DOUBLE))
         |    * 4294967296.0) AS BIGINT) AS thr
         |  FROM w JOIN tot USING (source)),
         |acc AS (SELECT t.doc_id, t.source, t.n_tokens
         |  FROM t JOIN thr ON t.source = thr.source
         |  WHERE ${hex32Sql("'19:'||CAST(doc_id AS VARCHAR)")} < thr),
         |c AS (SELECT doc_id, source, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM acc)
         |SELECT doc_id, source, n_tokens, start_tok,
         |  CAST(CASE WHEN n_tokens > 0 THEN start_tok // 128 END AS BIGINT) AS seq_first,
         |  CAST(CASE WHEN n_tokens > 0 THEN (start_tok + n_tokens - 1) // 128 END AS BIGINT) AS seq_last
         |FROM c""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val sampled = TextOps.sampleMixture(docs, "doc_id", "source", "text",
        weights = Map("src0" -> 0.6, "src1" -> 0.3, "src2" -> 0.4, "src5" -> 2.0),
        tokenBudget = 1500L, salt = 19)
      val survivors = docs.join(sampled.select("doc_id"), Seq("doc_id"), "semi")
      TextOps.packSequences(survivors, "doc_id", "text", seqLen = 128, nBuckets = 8)
        .join(sampled.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("start_tok"),
          col("seq_first"), col("seq_last"))
    },

    // --- winnowing fingerprint dedup (MOSS, SIGMOD'03): the substring-level
    // --- layer between fixed blocks (txt20, breaks on a one-token shift) and
    // --- full n-gram membership (txt23, keeps every gram). Each window of
    // --- w=4 consecutive 4-gram hashes keeps its min (rightmost on ties);
    // --- any shared run of ≥ w+k−1 = 7 tokens is GUARANTEED a shared
    // --- fingerprint while only ~2/(w+1) of hashes survive. Selection is one
    // --- shuffle-free projection; pairing is bucket-local on fp with hot
    // --- fingerprints (>maxDf docs — boilerplate AND the skew guard) dropped.
    q("txt28_winnow_matches",
      s"""WITH $corpusSql,
         |${winnowSql("corpus")}
         |SELECT x.doc_id AS a, y.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM c x JOIN c y ON x.fp = y.fp AND x.doc_id < y.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin) { (s, d) =>
      Dedup.winnowMatches(corpus(s, d), "doc_id", "text",
        k = 4, w = 4, minShared = 2, maxDf = 50)
    },

    // --- per-source quality calibration (CCNet-style): keep each source's
    // --- top docs by lexical diversity, threshold CALIBRATED from that
    // --- source's own histogram of integer quality bins — never a sort.
    // --- Pass 1: corpus → |sources|·bins histogram (partial-agg'd);
    // --- cumulative window over the tiny histogram picks the threshold
    // --- bin (smallest b with cum ≥ ceil(cutFrac·n)); thresholds
    // --- broadcast back onto pass 2's corpus re-scan; keep bin > thr.
    q("txt29_quality_calibrate",
      s"""WITH ${calibSql("documents")}
         |SELECT s.source AS source, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |  CAST(MIN(s.bin) AS INT) AS min_bin
         |FROM s JOIN thr ON s.source = thr.source AND s.bin > thr.thr
         |GROUP BY 1""".stripMargin) { (s, d) =>
      TextOps.calibratedQualityKeep(Tables.documents(s, d),
          "doc_id", "source", "text", bins = 50, cutFrac = 0.5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), min(col("bin")).as("min_bin"))
    },

    // --- composed curation pipeline v2 (txt31): the late-round stages as ONE
    // --- oracle-exact dataflow over a corpus with planted exact dups that
    // --- KEEP their original's source — per-source quality calibration
    // --- (txt29) keeps each source's top half; winnowing (txt28) then drops
    // --- the higher id of every matched pair (planted copies die here,
    // --- their originals survive); the curated corpus packs into 128-token
    // --- training sequences (txt25's layout). Every stage is individually
    // --- gated; this pins that they COMPOSE — schema, order and boundary
    // --- conventions line up end-to-end. ---------------------------------
    q("txt31_curation_pipeline_v2",
      s"""WITH c2 AS (SELECT doc_id, source, text FROM documents
         |  UNION ALL SELECT doc_id+100000, source, text FROM documents WHERE doc_id%10=0),
         |${calibSql("c2")},
         |keep AS (SELECT s.doc_id FROM s JOIN thr
         |  ON s.source = thr.source AND s.bin > thr.thr),
         |kd AS (SELECT c2.doc_id, c2.text FROM c2 JOIN keep USING (doc_id)),
         |${winnowSql("kd")},
         |dupb AS (SELECT DISTINCT b FROM (
         |  SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM c x JOIN c y ON x.fp = y.fp AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)),
         |cur AS (SELECT kd.doc_id, kd.text FROM kd
         |  WHERE doc_id NOT IN (SELECT b FROM dupb)),
         |tp AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM cur),
         |cc AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
         |  FROM tp)
         |SELECT doc_id, n_tokens, start_tok,
         |  CAST(CASE WHEN n_tokens > 0 THEN start_tok // 128 END AS BIGINT) AS seq_first,
         |  CAST(CASE WHEN n_tokens > 0 THEN (start_tok + n_tokens - 1) // 128 END AS BIGINT) AS seq_last
         |FROM cc""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "source", "text")
      val corpus2 = docs.unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("source"), col("text")))
      val kept = TextOps.calibratedQualityKeep(corpus2, "doc_id", "source",
        "text", bins = 50, cutFrac = 0.5).select("doc_id")
      val keptDocs = corpus2.join(kept, Seq("doc_id")).select("doc_id", "text")
      val dupB = Dedup.winnowMatches(keptDocs, "doc_id", "text",
          k = 4, w = 4, minShared = 2, maxDf = 50)
        .select(col("b").as("doc_id")).distinct()
      val curated = keptDocs.join(dupB, Seq("doc_id"), "left_anti")
      TextOps.packSequences(curated, "doc_id", "text", seqLen = 128, nBuckets = 16)
    },

    // --- STREAMING curation (txt32): the quality gate running as a
    // --- Structured Streaming ingest — file-stream source doubled (an
    // --- at-least-once re-delivery sim), the stateless quality-bin
    // --- projection + threshold filter per micro-batch, replayed rows
    // --- collapsed by streaming dropDuplicates (state = one row per doc
    // --- id; at a real 100 TB ingest the id would be paired with
    // --- dropDuplicatesWithinWatermark on ingest time to bound state —
    // --- cdc16's machinery). Oracle = the same curation as ONE batch SQL:
    // --- streaming execution must change nothing. -------------------------
    q("txt32_streaming_curation",
      s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, source,
         |    CAST(least(floor(CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) * 50),
         |      49) AS INT) AS bin
         |  FROM t WHERE len(toks) > 0)
         |SELECT doc_id, source, bin FROM s WHERE bin >= 30""".stripMargin) { (s, d) =>
      import graft.streaming.StreamStreamJoin
      def src() = StreamStreamJoin.tableStream(s, s"$d/documents.parquet")
      val curated = src().unionByName(src())
        .select(col("doc_id"), col("source"),
          TextOps.qualityBin(col("text"), 50).as("bin"))
        .filter(col("bin") >= 30)
        .dropDuplicates("doc_id")
      StreamStreamJoin.runToMemory(s, curated,
        s"txt32_${java.util.UUID.randomUUID().toString.take(8)}")
    },

    // --- corpus n-gram novelty (txt30): per doc, the fraction of its
    // --- distinct 4-grams that FIRST appear in this doc by ascending id —
    // --- the memorization-pressure signal (planted copies score 0: all
    // --- their grams were seen at the original's lower id). passageStats
    // --- dataflow over md5 gram keys: explode → min-id winner → join →
    // --- rollup; gram text never shuffles. -------------------------------
    q("txt30_gram_novelty",
      s"""WITH $corpusSql,
         |t AS (SELECT doc_id, $toksSql AS t FROM corpus),
         |g0 AS (SELECT doc_id, unnest(
         |  [md5(array_to_string(t[i:i+3], ' ')) for i in generate_series(1, len(t)-3)]) AS g
         |  FROM t),
         |g AS (SELECT DISTINCT doc_id, g FROM g0),
         |f AS (SELECT g, MIN(doc_id) AS first_doc FROM g GROUP BY 1),
         |p AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |    CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
         |  FROM g JOIN f USING (g) GROUP BY 1)
         |SELECT c.doc_id, COALESCE(p.n_grams, CAST(0 AS BIGINT)) AS n_grams,
         |  COALESCE(p.n_novel, CAST(0 AS BIGINT)) AS n_novel,
         |  CAST(p.n_novel AS DOUBLE)/p.n_grams AS novelty_frac
         |FROM corpus c LEFT JOIN p USING (doc_id)""".stripMargin) { (s, d) =>
      Dedup.noveltyStats(corpus(s, d), "doc_id", "text", n = 4)
    },

    // --- exact repeated-substring intervals (txt35, Lee et al.'s ExactSubstr
    // --- modality distributed): per doc, the maximal token intervals inside
    // --- some exact ≥8-token repeat occurring anywhere else in the planted
    // --- corpus. Duplicated-k-gram coverage is EXACT for this contract
    // --- (Dedup.repeatIntervals scaladoc); the oracle restates it with the
    // --- same salted gram hashes, a HAVING>1 duplicate filter, and the
    // --- gaps-and-islands run merge. Planted copies (%10 whole docs, %17
    // --- clipped prefixes) surface as full-document / prefix intervals. ---
    q("txt35_repeat_intervals",
      s"""WITH $corpusSql,
         |t AS (SELECT doc_id, $toksSql AS t FROM corpus),
         |g AS (SELECT doc_id, unnest(
         |  [{'pos': CAST(i-1 AS BIGINT),
         |    'h': md5('${Dedup.RepeatSalt}' || array_to_string(t[i:i+7], ' '))}
         |   for i in generate_series(1, len(t)-7)], recursive := true)
         |  FROM t WHERE len(t) >= 8),
         |d AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) > 1),
         |p AS (SELECT doc_id, pos FROM g JOIN d USING (h)),
         |b AS (SELECT doc_id, pos,
         |  CASE WHEN pos - LAG(pos) OVER w > 8 THEN 1 ELSE 0 END AS brk
         |  FROM p WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         |r AS (SELECT doc_id, pos,
         |  SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM b)
         |SELECT doc_id, MIN(pos) AS start_tok, MAX(pos) + 7 AS end_tok,
         |  MAX(pos) + 8 - MIN(pos) AS n_toks
         |FROM r GROUP BY doc_id, island""".stripMargin) { (s, d) =>
      Dedup.repeatIntervals(corpus(s, d), "doc_id", "text", minTokens = 8)
    },

    // --- exact repeated-substring REMOVAL (txt37, the rewrite half of
    // --- txt35): drop every token covered by a non-first occurrence of a
    // --- duplicated ≥8-token span (first = global min (doc, pos) per
    // --- gram, the txt30 winner discipline) — Lee et al.'s keep-one-copy
    // --- policy as an actual corpus rewrite. Planted %10 copies empty out
    // --- (their originals keep every token); the oracle restates winners,
    // --- the k-wide drop set, the anti-join, and the ordered reassembly,
    // --- so kept_text hash-matches STRING-FOR-STRING. --------------------
    q("txt37_drop_repeats",
      s"""WITH $corpusSql,
         |t AS (SELECT doc_id, $toksSql AS t FROM corpus),
         |g AS (SELECT doc_id, unnest(
         |  [{'pos': CAST(i-1 AS BIGINT),
         |    'h': md5('${Dedup.RepeatSalt}' || array_to_string(t[i:i+7], ' '))}
         |   for i in generate_series(1, len(t)-7)], recursive := true)
         |  FROM t WHERE len(t) >= 8),
         |w AS (SELECT h, doc_id AS wid, pos AS wpos FROM (
         |  SELECT h, doc_id, pos,
         |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         |    COUNT(*) OVER (PARTITION BY h) AS n FROM g)
         |  WHERE rn = 1 AND n > 1),
         |dr AS (SELECT DISTINCT doc_id, p FROM (
         |  SELECT g.doc_id, unnest(generate_series(g.pos, g.pos + 7)) AS p
         |  FROM g JOIN w USING (h)
         |  WHERE NOT (g.doc_id = w.wid AND g.pos = w.wpos))),
         |tk AS (SELECT doc_id, unnest(
         |  [{'p': CAST(i-1 AS BIGINT), 'tok': t[i]}
         |   for i in generate_series(1, len(t))], recursive := true) FROM t),
         |kp AS (SELECT tk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |    array_to_string(list(tok ORDER BY p), ' ') AS kept_text
         |  FROM tk ANTI JOIN dr ON tk.doc_id = dr.doc_id AND tk.p = dr.p
         |  GROUP BY tk.doc_id)
         |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |  COALESCE(kp.n_kept, 0) AS n_kept,
         |  CAST(len(t.t) AS BIGINT) - COALESCE(kp.n_kept, 0) AS n_dropped,
         |  COALESCE(kp.kept_text, '') AS kept_text
         |FROM t LEFT JOIN kp USING (doc_id)""".stripMargin) { (s, d) =>
      Dedup.dropRepeats(corpus(s, d), "doc_id", "text", minTokens = 8)
    },

    // --- trained quality classifier (txt36): the fastText/CCNet-final-stage
    // --- analog — a bag-of-hashed-tokens linear model whose weights are
    // --- Laplace-smoothed Naive-Bayes probability differences, trained in
    // --- ONE distributed counting pass (no gradient rounds, no libm:
    // --- every weight is an IEEE divide of exact integers, TextOps
    // --- .classifierTrain). Labels are planted: the documents themselves
    // --- are positive; each doc's 'zz'-interleaved twin (boilerplate
    // --- marker between every token) is negative. Scoring is the mean
    // --- hashed-bucket weight (a dot product), decimal-exact — the oracle
    // --- restates training AND scoring, so the gate hash-matches every
    // --- score, not just the separation. -------------------------------
    q("txt36_quality_classifier",
      s"""WITH lab AS (
         |  SELECT doc_id, text, TRUE AS pos FROM documents
         |  UNION ALL SELECT doc_id + 500000, replace(text, ' ', ' zz '), FALSE
         |  FROM documents),
         |tok AS (SELECT pos, unnest($toksSql) AS tok FROM lab),
         |hh AS (SELECT pos, CAST(${hex32Sql("'36:'||tok")} % 256 AS INT) AS h FROM tok),
         |cnt AS (SELECT h, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
         |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg FROM hh GROUP BY h),
         |tot AS (SELECT SUM(n_pos) AS np, SUM(n_neg) AS nn FROM cnt),
         |w AS (SELECT gs.h,
         |    CAST(COALESCE(c.n_pos, 0) + 1 AS DOUBLE) / CAST(np + 256 AS DOUBLE)
         |    - CAST(COALESCE(c.n_neg, 0) + 1 AS DOUBLE) / CAST(nn + 256 AS DOUBLE) AS w
         |  FROM generate_series(0, 255) gs(h) LEFT JOIN cnt c ON gs.h = c.h
         |  CROSS JOIN tot),
         |dt AS (SELECT doc_id, unnest($toksSql) AS tok FROM lab),
         |sc AS (SELECT dt.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
         |    CAST(SUM(CAST(w.w AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS score
         |  FROM dt JOIN w ON CAST(${hex32Sql("'36:'||dt.tok")} % 256 AS INT) = w.h
         |  GROUP BY dt.doc_id)
         |SELECT lab.doc_id, lab.pos, COALESCE(sc.n_toks, 0) AS n_toks, sc.score
         |FROM lab LEFT JOIN sc USING (doc_id)""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val lab = docs.withColumn("pos", lit(true)).unionByName(
        docs.select((col("doc_id") + 500000).as("doc_id"),
          expr("replace(text, ' ', ' zz ')").as("text"))
          .withColumn("pos", lit(false)))
      val weights = TextOps.classifierTrain(lab, "pos", "text", dims = 256)
      TextOps.classifierScore(lab, "doc_id", "text", weights, dims = 256)
        .join(lab.select(col("doc_id"), col("pos")), Seq("doc_id"))
        .select(col("doc_id"), col("pos"), col("n_toks"), col("score"))
    },

    // --- encoding-anomaly audit (txt68): per source, how much text is
    // --- multi-byte (bytes ≠ chars) and the worst per-doc density — the
    // --- mojibake / mis-declared-encoding detector an ingest runs before
    // --- tokenization silently mangles a feed. Pure projection + one
    // --- partial-agg'd rollup; density an IEEE divide of exact counts. ---
    q("txt68_encoding_audit",
      """WITH x AS (SELECT source,
        |  CAST(strlen(text) AS BIGINT) AS nb, CAST(length(text) AS BIGINT) AS nc
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN nb <> nc THEN 1 ELSE 0 END) AS BIGINT) AS n_multibyte_docs,
        |  CAST(SUM(nb - nc) AS BIGINT) AS extra_bytes,
        |  CAST(MAX(CAST(nb - nc AS DOUBLE) / nb) AS DOUBLE) AS max_density
        |FROM x GROUP BY 1""".stripMargin) { (s, d) =>
      val x = Tables.documents(s, d).select(col("source"),
        octet_length(col("text")).cast("long").as("nb"),
        length(col("text")).cast("long").as("nc"))
      x.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("nb") =!= col("nc"), 1L).otherwise(0L))
            .as("n_multibyte_docs"),
          sum(col("nb") - col("nc")).as("extra_bytes"),
          max((col("nb") - col("nc")).cast("double") / col("nb"))
            .as("max_density"))
    },

    // --- classifier lift table (txt67): documents ranked by the trained
    // --- quality score, cut into deciles (integer cross-multiplied — no
    // --- ntile percent math), per-decile positive rate — the lift chart
    // --- that shows WHERE the classifier's discrimination lives (txt60's
    // --- confusion matrix is one threshold; this is all of them at once).
    // --- Rank over the scored frame under a total (score DESC, id) order.
    q("txt67_classifier_lift",
      s"""WITH lab AS (
         |  SELECT doc_id, text, TRUE AS pos FROM documents
         |  UNION ALL SELECT doc_id + 500000, replace(text, ' ', ' zz '), FALSE
         |  FROM documents),
         |tok AS (SELECT pos, unnest($toksSql) AS tok FROM lab),
         |hh AS (SELECT pos, CAST(${hex32Sql("'36:'||tok")} % 256 AS INT) AS h FROM tok),
         |cnt AS (SELECT h, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
         |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg FROM hh GROUP BY h),
         |tot AS (SELECT SUM(n_pos) AS np, SUM(n_neg) AS nn FROM cnt),
         |w AS (SELECT gs.h,
         |    CAST(COALESCE(c.n_pos, 0) + 1 AS DOUBLE) / CAST(np + 256 AS DOUBLE)
         |    - CAST(COALESCE(c.n_neg, 0) + 1 AS DOUBLE) / CAST(nn + 256 AS DOUBLE) AS w
         |  FROM generate_series(0, 255) gs(h) LEFT JOIN cnt c ON gs.h = c.h
         |  CROSS JOIN tot),
         |dt AS (SELECT doc_id, unnest($toksSql) AS tok FROM lab),
         |sc AS (SELECT dt.doc_id,
         |    CAST(SUM(CAST(w.w AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS score
         |  FROM dt JOIN w ON CAST(${hex32Sql("'36:'||dt.tok")} % 256 AS INT) = w.h
         |  GROUP BY dt.doc_id),
         |rk AS (SELECT lab.pos, sc.score,
         |  ROW_NUMBER() OVER (ORDER BY sc.score DESC, lab.doc_id) AS r,
         |  COUNT(*) OVER () AS n
         |  FROM lab JOIN sc ON lab.doc_id = sc.doc_id)
         |SELECT CAST((r - 1) * 10 // n AS BIGINT) AS decile,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         |  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)/COUNT(*) AS pos_rate
         |FROM rk GROUP BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val lab = docs.withColumn("pos", lit(true)).unionByName(
        docs.select((col("doc_id") + 500000).as("doc_id"),
          expr("replace(text, ' ', ' zz ')").as("text"))
          .withColumn("pos", lit(false)))
      val weights = TextOps.classifierTrain(lab, "pos", "text", dims = 256)
      // descending global rank + total count via GlobalRank — the count
      // literal comes free from the same bucket-totals pass, replacing the
      // count(*) OVER () global window
      val rk = GlobalRank.rowNumber(
          TextOps.classifierScore(lab, "doc_id", "text", weights, dims = 256)
            .join(lab.select(col("doc_id"), col("pos")), Seq("doc_id")),
          Seq(col("score").desc, col("doc_id")), "r", countCol = Some("n"))
        .select(col("pos"), col("score"), col("r"), col("n"))
      rk.groupBy(expr("(r - 1) * 10 div n").cast("long").as("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"))
        .withColumn("pos_rate", col("n_pos").cast("double") / col("n_docs"))
    },

    // --- curation funnel report (txt66): corpus volume surviving each
    // --- stage — raw → exact-dedup (min-id per content hash) → blocklist-
    // --- clean — as (stage, n_docs, n_tokens) rows: the shrinkage
    // --- accounting every corpus build publishes (where did the tokens
    // --- go?). Each stage is one CTE over the previous; all counts
    // --- partial-agg'd. --------------------------------------------------
    q("txt66_curation_funnel",
      s"""WITH raw AS (SELECT doc_id, text, len($toksSql) AS nt FROM documents),
         |keep1 AS (SELECT MIN(doc_id) AS doc_id FROM raw GROUP BY md5(text)),
         |s1 AS (SELECT raw.* FROM raw JOIN keep1 USING (doc_id)),
         |bl(phrase) AS (VALUES ('slow fast'), ('hash value table')),
         |s2 AS (SELECT s1.* FROM s1 WHERE NOT EXISTS (
         |  SELECT 1 FROM bl WHERE contains(' ' || s1.text || ' ',
         |    ' ' || bl.phrase || ' ')))
         |SELECT 'raw' AS stage, COUNT(*) AS n_docs,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens FROM raw
         |UNION ALL SELECT 'exact_dedup', COUNT(*), CAST(SUM(nt) AS BIGINT) FROM s1
         |UNION ALL SELECT 'blocklist_clean', COUNT(*), CAST(SUM(nt) AS BIGINT) FROM s2""".stripMargin) { (s, d) =>
      import s.implicits._
      val raw = Tables.documents(s, d).select(col("doc_id"), col("text"),
        size(TextOps.tokens(col("text"))).cast("long").as("nt"))
      val s1 = raw.groupBy(md5(col("text"))).agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id").join(raw, Seq("doc_id"))
      val bl = Seq("slow fast", "hash value table").toDF("phrase")
      val s2 = TextOps.blocklistFilter(s1, "doc_id", "text", bl, "phrase")
        .filter(!col("blocked")).select("doc_id").join(s1, Seq("doc_id"))
      def stage(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
      stage("raw", raw).unionByName(stage("exact_dedup", s1))
        .unionByName(stage("blocklist_clean", s2))
    },

    // --- boilerplate n-gram top list (txt65): the most document-frequent
    // --- 4-grams with df and occurrence counts — the discovery step that
    // --- FEEDS txt38's line removal and txt28's maxDf guard (you have to
    // --- find the template text before you can strip it). Grams reduce to
    // --- md5 keys for the distinct-df count; the top-20 rank runs on the
    // --- (already partial-agg'd) gram-count frame; ties (df DESC, gram). -
    q("txt65_boilerplate_grams",
      s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
         |g AS (SELECT doc_id, unnest(
         |  [array_to_string(t[i:i+3], ' ') for i in generate_series(1, len(t)-3)]) AS gram
         |  FROM t),
         |c AS (SELECT gram, COUNT(*) AS n_occ,
         |  COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1)
         |SELECT gram, df, n_occ, CAST(rk AS BIGINT) AS rank FROM (
         |  SELECT gram, df, n_occ,
         |    ROW_NUMBER() OVER (ORDER BY df DESC, gram) AS rk FROM c) z
         |WHERE rk <= 20""".stripMargin) { (s, d) =>
      val g = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.shingles(TextOps.tokens(col("text")), 4)).as("gram"))
      // top-20 via TakeOrderedAndProject over the O(distinct grams) frame,
      // then rank the 20 survivors bucket-partitioned (GlobalRank)
      GlobalRank.rowNumber(
          g.groupBy(col("gram"))
            .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("df"))
            .orderBy(col("df").desc, col("gram")).limit(20),
          Seq(col("df").desc, col("gram")), "rank", nBuckets = 4)
        .select(col("gram"), col("df"), col("n_occ"), col("rank"))
    },

    // --- cross-source syndication report (txt64): near-duplicate pairs
    // --- that SPAN sources, counted per (source_a, source_b) — the
    // --- syndication/mirror detector (same content republished across
    // --- feeds inflates a corpus invisibly to per-source stats). Pairs
    // --- from the banded machinery; one join to the doc→source map;
    // --- source pair ordered lexicographically so each pair counts once.
    q("txt64_syndication",
      s"""WITH $corpusSql,
         |$minhashSql,
         |src AS (SELECT doc_id, source FROM documents
         |  UNION ALL SELECT doc_id + 100000, source FROM documents WHERE doc_id % 10 = 0
         |  UNION ALL SELECT doc_id + 200000, source FROM documents WHERE doc_id % 17 = 0),
         |sp AS (SELECT LEAST(sa.source, sb.source) AS source_a,
         |  GREATEST(sa.source, sb.source) AS source_b
         |  FROM pairs p JOIN src sa ON p.a = sa.doc_id
         |  JOIN src sb ON p.b = sb.doc_id)
         |SELECT source_a, source_b, COUNT(*) AS n_pairs
         |FROM sp GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val srcMap = docs.select(col("doc_id"), col("source"))
        .unionByName(docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("source")))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 200000).as("doc_id"), col("source")))
      Dedup.minhashCandidatePairs(corpus(s, d), "doc_id", "text")
        .join(srcMap.select(col("doc_id").as("a"), col("source").as("_sa")),
          Seq("a"))
        .join(srcMap.select(col("doc_id").as("b"), col("source").as("_sb")),
          Seq("b"))
        .groupBy(least(col("_sa"), col("_sb")).as("source_a"),
          greatest(col("_sa"), col("_sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
    },

    // --- dup-graph degree report (txt63): how many near-duplicate
    // --- partners each duplicated doc has, rolled into a (degree,
    // --- n_docs) histogram — the dedup QA artifact that tells template
    // --- farms (hub docs with huge degree) from honest pairwise copies
    // --- (degree 1). Pairs symmetrize, one count per doc, one count per
    // --- degree; all on the banded pair set. ------------------------------
    q("txt63_dup_degree",
      s"""WITH $corpusSql,
         |$minhashSql,
         |sym AS (SELECT a AS d, b AS o FROM pairs UNION ALL SELECT b, a FROM pairs),
         |deg AS (SELECT d, COUNT(*) AS degree FROM sym GROUP BY 1)
         |SELECT degree, COUNT(*) AS n_docs FROM deg GROUP BY 1""".stripMargin) { (s, d) =>
      val pairs = Dedup.minhashCandidatePairs(corpus(s, d), "doc_id", "text")
      pairs.select(col("a").as("d")).unionAll(pairs.select(col("b").as("d")))
        .groupBy(col("d")).agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
    },

    // --- composed curation v3 (txt62): the NEW stages composed under one
    // --- oracle — blocklist screen (txt51's anchor join) → trained-
    // --- classifier keep (txt36's NB model at the zero threshold) →
    // --- deterministic shard export (txt39's salted hash). Pins that the
    // --- round's compliance, quality, and layout stages COMPOSE: schema /
    // --- id / threshold conventions line up end to end. The classifier
    // --- trains on the planted pos/neg corpus but SCORES only surviving
    // --- real docs; shards see only the doubly-surviving set. ------------
    q("txt62_curation_v3",
      s"""WITH bl(phrase) AS (VALUES ('slow fast'), ('hash value table'),
         |  ('batch window spark')),
         |blocked AS (SELECT DISTINCT d.doc_id FROM documents d JOIN bl b
         |  ON contains(' ' || d.text || ' ', ' ' || b.phrase || ' ')),
         |lab AS (
         |  SELECT doc_id, text, TRUE AS pos FROM documents
         |  UNION ALL SELECT doc_id + 500000, replace(text, ' ', ' zz '), FALSE
         |  FROM documents),
         |tok AS (SELECT pos, unnest($toksSql) AS tok FROM lab),
         |hh AS (SELECT pos, CAST(${hex32Sql("'36:'||tok")} % 256 AS INT) AS h FROM tok),
         |cnt AS (SELECT h, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
         |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg FROM hh GROUP BY h),
         |tot AS (SELECT SUM(n_pos) AS np, SUM(n_neg) AS nn FROM cnt),
         |w AS (SELECT gs.h,
         |    CAST(COALESCE(c.n_pos, 0) + 1 AS DOUBLE) / CAST(np + 256 AS DOUBLE)
         |    - CAST(COALESCE(c.n_neg, 0) + 1 AS DOUBLE) / CAST(nn + 256 AS DOUBLE) AS w
         |  FROM generate_series(0, 255) gs(h) LEFT JOIN cnt c ON gs.h = c.h
         |  CROSS JOIN tot),
         |clean AS (SELECT d.doc_id, d.text FROM documents d
         |  WHERE d.doc_id NOT IN (SELECT doc_id FROM blocked)),
         |dt AS (SELECT doc_id, unnest($toksSql) AS tok FROM clean),
         |sc AS (SELECT dt.doc_id,
         |    CAST(SUM(CAST(w.w AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS score
         |  FROM dt JOIN w ON CAST(${hex32Sql("'36:'||dt.tok")} % 256 AS INT) = w.h
         |  GROUP BY dt.doc_id),
         |kept AS (SELECT doc_id FROM sc WHERE score >= 0),
         |h AS (SELECT doc_id,
         |  ${hex32Sql("'13:'||CAST(doc_id AS VARCHAR)")} AS hv FROM kept)
         |SELECT CAST(hv % 4 AS INT) AS shard,
         |  ROW_NUMBER() OVER (PARTITION BY hv % 4 ORDER BY hv, doc_id) AS pos,
         |  doc_id
         |FROM h""".stripMargin) { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val bl = Seq("slow fast", "hash value table", "batch window spark")
        .toDF("phrase")
      val clean = TextOps.blocklistFilter(docs, "doc_id", "text", bl, "phrase")
        .filter(!col("blocked")).select("doc_id")
        .join(docs, Seq("doc_id"))
      val lab = docs.withColumn("pos", lit(true)).unionByName(
        docs.select((col("doc_id") + 500000).as("doc_id"),
          expr("replace(text, ' ', ' zz ')").as("text"))
          .withColumn("pos", lit(false)))
      val weights = TextOps.classifierTrain(lab, "pos", "text", dims = 256)
      val kept = TextOps.classifierScore(clean, "doc_id", "text", weights,
          dims = 256)
        .filter(col("score") >= 0).select("doc_id")
      TextOps.shardAssign(kept, "doc_id", nShards = 4)
    },

    // --- contrastive triplet mining (txt61): (anchor, positive, hard
    // --- negative) embedding-training rows — positives are LSH bucket-
    // --- mates passing the exact-Jaccard verify, HARD negatives are
    // --- bucket-mates that FAILED it (lexically close, provably not
    // --- duplicates — the near-misses contrastive training wants; random
    // --- negatives are trivially easy). Min-id picks per anchor;
    // --- everything rides the banded candidates. -------------------------
    q("txt61_contrastive_triplets",
      s"""WITH $corpusSql,
         |$minhashSql,
         |shd AS (SELECT doc_id, list_distinct(
         |  [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)]) AS sh
         |  FROM toks),
         |v AS (SELECT p.a, p.b,
         |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |    / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
         |  FROM pairs p JOIN shd x ON p.a = x.doc_id JOIN shd y ON p.b = y.doc_id),
         |sym AS (SELECT a AS anchor, b AS mate, jaccard FROM v
         |  UNION ALL SELECT b, a, jaccard FROM v),
         |pos AS (SELECT anchor, mate AS positive, jaccard AS pos_jaccard FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY mate) AS rn
         |  FROM sym WHERE jaccard >= 0.95) t WHERE rn = 1),
         |neg AS (SELECT anchor, mate AS hard_negative, jaccard AS neg_jaccard FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY mate) AS rn
         |  FROM sym WHERE jaccard < 0.95) t WHERE rn = 1)
         |SELECT pos.anchor, pos.positive, pos.pos_jaccard,
         |  neg.hard_negative, neg.neg_jaccard
         |FROM pos JOIN neg ON pos.anchor = neg.anchor""".stripMargin) { (s, d) =>
      Dedup.contrastiveTriplets(corpus(s, d), "doc_id", "text",
        threshold = 0.95)
    },

    // --- classifier evaluation report (txt60): the confusion matrix +
    // --- precision/recall for txt36's trained quality classifier at the
    // --- zero threshold, on the planted corpus where ground truth is
    // --- known — the eval artifact that justifies shipping a filter
    // --- threshold. Counts are exact integers; the two ratios are single
    // --- IEEE divides. Oracle restates training, scoring, AND the
    // --- confusion rollup. ----------------------------------------------
    q("txt60_classifier_eval",
      s"""WITH lab AS (
         |  SELECT doc_id, text, TRUE AS pos FROM documents
         |  UNION ALL SELECT doc_id + 500000, replace(text, ' ', ' zz '), FALSE
         |  FROM documents),
         |tok AS (SELECT pos, unnest($toksSql) AS tok FROM lab),
         |hh AS (SELECT pos, CAST(${hex32Sql("'36:'||tok")} % 256 AS INT) AS h FROM tok),
         |cnt AS (SELECT h, SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
         |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS n_neg FROM hh GROUP BY h),
         |tot AS (SELECT SUM(n_pos) AS np, SUM(n_neg) AS nn FROM cnt),
         |w AS (SELECT gs.h,
         |    CAST(COALESCE(c.n_pos, 0) + 1 AS DOUBLE) / CAST(np + 256 AS DOUBLE)
         |    - CAST(COALESCE(c.n_neg, 0) + 1 AS DOUBLE) / CAST(nn + 256 AS DOUBLE) AS w
         |  FROM generate_series(0, 255) gs(h) LEFT JOIN cnt c ON gs.h = c.h
         |  CROSS JOIN tot),
         |dt AS (SELECT doc_id, unnest($toksSql) AS tok FROM lab),
         |sc AS (SELECT dt.doc_id,
         |    CAST(SUM(CAST(w.w AS DECIMAL(18,12))) AS DOUBLE) / COUNT(*) AS score
         |  FROM dt JOIN w ON CAST(${hex32Sql("'36:'||dt.tok")} % 256 AS INT) = w.h
         |  GROUP BY dt.doc_id),
         |pred AS (SELECT lab.pos, sc.score >= 0 AS p
         |  FROM lab JOIN sc ON lab.doc_id = sc.doc_id),
         |cm AS (SELECT
         |  CAST(SUM(CASE WHEN pos AND p THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(SUM(CASE WHEN NOT pos AND p THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(SUM(CASE WHEN pos AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(SUM(CASE WHEN NOT pos AND NOT p THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM pred)
         |SELECT tp, fp, fn, tn,
         |  CAST(tp AS DOUBLE)/(tp + fp) AS precision_,
         |  CAST(tp AS DOUBLE)/(tp + fn) AS recall_
         |FROM cm""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val lab = docs.withColumn("pos", lit(true)).unionByName(
        docs.select((col("doc_id") + 500000).as("doc_id"),
          expr("replace(text, ' ', ' zz ')").as("text"))
          .withColumn("pos", lit(false)))
      val weights = TextOps.classifierTrain(lab, "pos", "text", dims = 256)
      val pred = TextOps.classifierScore(lab, "doc_id", "text", weights,
          dims = 256)
        .join(lab.select(col("doc_id"), col("pos")), Seq("doc_id"))
        .select(col("pos"), (col("score") >= 0).as("p"))
      def cnt(c: org.apache.spark.sql.Column) = sum(when(c, 1L).otherwise(0L))
      pred.agg(
          cnt(col("pos") && col("p")).as("tp"),
          cnt(!col("pos") && col("p")).as("fp"),
          cnt(col("pos") && !col("p")).as("fn"),
          cnt(!col("pos") && !col("p")).as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          (col("tp").cast("double") / (col("tp") + col("fp")))
            .as("precision_"),
          (col("tp").cast("double") / (col("tp") + col("fn")))
            .as("recall_"))
    },

    // --- LSH text similarity search (txt43): the query-time counterpart
    // --- of dedup — top-3 Jaccard neighbors per query doc, scored only
    // --- inside shared band buckets, never against the corpus. Queries =
    // --- %13 docs clipped by 10 chars (+400000), so each query's own
    // --- original is its guaranteed bucket-mate. Oracle restates banding,
    // --- cross-pair Jaccard, and the (jaccard DESC, id) rank. ------------
    q("txt43_similar_docs",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id+400000,
         |    substr(text, 1, greatest(CAST(length(text) AS INT)-10, 0))
         |  FROM documents WHERE doc_id%13=0),
         |$minhashSql,
         |shd AS (SELECT doc_id, list_distinct(
         |  [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)]) AS sh
         |  FROM toks),
         |v AS (SELECT p.a, p.b,
         |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
         |  FROM pairs p JOIN shd x ON p.a = x.doc_id JOIN shd y ON p.b = y.doc_id
         |  WHERE p.a < 400000 AND p.b >= 400000)
         |SELECT b AS query_id, a AS neighbor_id, jaccard, rank FROM (
         |  SELECT a, b, jaccard, ROW_NUMBER() OVER (
         |    PARTITION BY b ORDER BY jaccard DESC, a) AS rank FROM v) t
         |WHERE rank <= 3""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val queries = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 400000).as("doc_id"),
          expr("substring(text, 1, length(text)-10)").as("text"))
      Dedup.similarDocs(docs, queries, "doc_id", "text", k = 3)
    },

    // --- near-dup cluster rewrite (txt42): the actionable end of txt06/
    // --- txt10 — keep exactly the min-id representative per LSH cluster,
    // --- drop every other member; docs in no cluster pass untouched. The
    // --- output IS the training corpus after near-dedup. Oracle = txt10's
    // --- recursive closure, dropped = members whose rep ≠ self. ----------
    q("txt42_cluster_dedup",
      s"""WITH RECURSIVE $corpusSql,
         |$minhashSql,
         |sym AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM sym
         |  UNION
         |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
         |),
         |dropped AS (SELECT u AS doc_id FROM reach
         |  GROUP BY u HAVING LEAST(u, MIN(v)) <> u)
         |SELECT doc_id, text FROM corpus
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin) { (s, d) =>
      Dedup.clusterDedup(corpus(s, d), "doc_id", "text")
    },

    // --- contamination report (txt41): the decision table a decontamination
    // --- run ships — per EVAL doc, the exact-n-gram membership signal
    // --- (txt23/24) OR'd with the LSH near-dup signal (txt16) into one
    // --- contaminated verdict; either alone misses real leaks (short
    // --- verbatim quotes vs paraphrases). Oracle composes both existing
    // --- CTE chains over the same planted eval set and restates the OR. --
    q("txt41_contamination_report",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id+200000,
         |    substr(text, 1, greatest(CAST(length(text) AS INT)-10, 0))
         |  FROM documents WHERE doc_id%17=0),
         |$minhashSql,
         |shd AS (SELECT doc_id, list_distinct(
         |  [array_to_string(t[i:i+2], ' ') for i in generate_series(1, len(t)-2)]) AS sh
         |  FROM toks),
         |v AS (SELECT p.a, p.b,
         |    CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         |      / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
         |  FROM pairs p JOIN shd x ON p.a = x.doc_id JOIN shd y ON p.b = y.doc_id
         |  WHERE p.a < 200000 AND p.b >= 200000),
         |nh AS (SELECT b AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_neardup,
         |    MAX(jaccard) AS max_jaccard FROM v WHERE jaccard >= 0.5 GROUP BY 1),
         |ev AS (SELECT doc_id, text FROM corpus WHERE doc_id >= 200000),
         |ttok AS (SELECT $toksSql AS t FROM documents),
         |tg AS (SELECT DISTINCT unnest(
         |  [md5(array_to_string(t[i:i+3], ' ')) for i in generate_series(1, len(t)-3)]) AS g
         |  FROM ttok),
         |etok AS (SELECT doc_id, $toksSql AS t FROM ev),
         |eg AS (SELECT doc_id, unnest(
         |  [md5(array_to_string(t[i:i+3], ' ')) for i in generate_series(1, len(t)-3)]) AS g
         |  FROM etok),
         |ov AS (SELECT eg.doc_id, COUNT(*) AS n_grams,
         |  CAST(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
         |  FROM eg LEFT JOIN tg ON eg.g = tg.g GROUP BY 1)
         |SELECT ev.doc_id, COALESCE(ov.n_grams, 0) AS n_grams,
         |  COALESCE(ov.n_overlap, 0) AS n_overlap,
         |  CAST(ov.n_overlap AS DOUBLE)/CAST(ov.n_grams AS DOUBLE) AS overlap_frac,
         |  COALESCE(nh.n_neardup, 0) AS n_neardup, nh.max_jaccard,
         |  (COALESCE(CAST(ov.n_overlap AS DOUBLE)/CAST(ov.n_grams AS DOUBLE), 0) >= 0.5
         |    OR COALESCE(nh.n_neardup, 0) > 0) AS contaminated
         |FROM ev LEFT JOIN ov USING (doc_id) LEFT JOIN nh USING (doc_id)""".stripMargin) {
      (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val eval = docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          expr("substring(text, 1, length(text)-10)").as("text"))
      Dedup.contaminationReport(docs, eval, "doc_id", "text", n = 4)
    },

    // --- deterministic shard export (txt39): the data-loader handoff after
    // --- sampling/packing — shard by salted id-hash, in-shard position by
    // --- (hash, id) rank; the hash order IS the training shuffle,
    // --- reproducible across reruns/engines/cluster sizes. One exchange
    // --- keyed by shard, the position window inside it. ------------------
    q("txt39_shard_export",
      s"""WITH h AS (SELECT doc_id,
         |  ${hex32Sql("'13:'||CAST(doc_id AS VARCHAR)")} AS hv FROM documents)
         |SELECT CAST(hv % 8 AS INT) AS shard,
         |  ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS pos,
         |  doc_id
         |FROM h""".stripMargin) { (s, d) =>
      TextOps.shardAssign(Tables.documents(s, d), "doc_id", nShards = 8)
    },

    // --- persisted tokenizer vocabulary (txt40): the artifact lifecycle —
    // --- train once, save the merge table, a LATER job loads it (contract
    // --- re-validated at load: dense ranks, merged = left+right) and
    // --- encodes; must reproduce txt34's inline-trained counts exactly,
    // --- which the same unrolled-CTE oracle pins value-for-value. --------
    q("txt40_bpe_persisted",
      s"""WITH ${bpeSql(8, "documents")},
         |w0 AS (SELECT doc_id, unnest($toksSql) AS word FROM documents),
         |ag AS (
         |  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(len(w.word)) AS BIGINT) AS n_chars,
         |    CAST(SUM(len(v.syms)) AS BIGINT) AS n_symbols
         |  FROM w0 w JOIN v8 v USING (word) GROUP BY w.doc_id
         |)
         |SELECT d.doc_id, COALESCE(ag.n_words, 0) AS n_words,
         |  COALESCE(ag.n_chars, 0) AS n_chars,
         |  COALESCE(ag.n_symbols, 0) AS n_symbols
         |FROM documents d LEFT JOIN ag USING (doc_id)""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val trained = TextOps.bpeTrain(docs.select("text"), "text", merges = 8)
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_bpe_vocab_" + Integer.toHexString(d.hashCode)).getPath
      TextOps.saveVocab(s, trained, dir)
      TextOps.bpeEncode(docs, "doc_id", "text", TextOps.loadVocab(s, dir))
    },

    // --- per-source line-level boilerplate removal (txt38, the CCNet/
    // --- RefinedWeb line-wise dedup stage): a 10-token LINE recurring in
    // --- ≥3 distinct docs of the SAME source is template text (nav bar,
    // --- cookie banner) and every occurrence is removed — no keep-first.
    // --- Planted: even docs of each source get the same 10-token header
    // --- line, so per-source df ≈ |source|/2 ≥ 3 and exactly that line
    // --- vanishes from every even doc; odd docs and the shifted body
    // --- lines pass untouched. The oracle restates the line split
    // --- (ragged tail included), per-source doc frequency, and the
    // --- ordered reassembly — kept_text hash-matches string-for-string. --
    q("txt38_boilerplate_lines",
      s"""WITH bcorp AS (SELECT doc_id, source,
         |  CASE WHEN doc_id % 2 = 0 THEN 'www ' || source ||
         |    ' home about contact subscribe follow share login copyright ' || text
         |  ELSE text END AS text FROM documents),
         |t AS (SELECT doc_id, source, $toksSql AS toks FROM bcorp),
         |b AS (SELECT doc_id, source, toks, CASE WHEN len(toks) = 0 THEN []
         |  ELSE [array_to_string(toks[10*i+1 : 10*i+10], ' ')
         |    for i in generate_series(0, CAST(ceil(len(toks)/10.0) AS BIGINT)-1)]
         |  END AS ls FROM t),
         |e AS (SELECT doc_id, source, u.slot AS slot, u.line AS line,
         |    md5(u.line) AS h
         |  FROM (SELECT doc_id, source, unnest([{'slot': i-1, 'line': ls[i]}
         |    for i in generate_series(1, len(ls))]) AS u FROM b)),
         |hot AS (SELECT source, h FROM
         |  (SELECT DISTINCT source, h, doc_id FROM e)
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |k AS (SELECT e.doc_id,
         |    CAST(COUNT(*) FILTER (WHERE hot.h IS NOT NULL) AS BIGINT) AS n_dropped,
         |    COALESCE(string_agg(CASE WHEN hot.h IS NULL THEN e.line END,
         |      ' ' ORDER BY e.slot), '') AS kept_text
         |  FROM e LEFT JOIN hot ON e.source = hot.source AND e.h = hot.h
         |  GROUP BY 1)
         |SELECT b.doc_id, b.source, CAST(len(b.ls) AS BIGINT) AS n_lines,
         |  COALESCE(k.n_dropped, 0) AS n_dropped,
         |  CAST(len(list_filter(string_split(COALESCE(k.kept_text, ''), ' '),
         |    x -> x <> '')) AS BIGINT) AS kept_tokens,
         |  COALESCE(k.kept_text, '') AS kept_text
         |FROM b LEFT JOIN k USING (doc_id)""".stripMargin) { (s, d) =>
      val bdocs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        when(col("doc_id") % 2 === 0, concat(lit("www "), col("source"),
          lit(" home about contact subscribe follow share login copyright "),
          col("text"))).otherwise(col("text")).as("text"))
      Dedup.boilerplateRemove(bdocs, "doc_id", "text", "source",
        lineTokens = 10, minDf = 3)
    },

    // --- SimHash (native expression vs 32-way SQL vote) -----------------------
    q("txt08_simhash",
      s"""WITH toks AS (SELECT doc_id, list_distinct($toksSql) AS t FROM documents),
         |th AS (SELECT doc_id, unnest(t) AS tok FROM toks),
         |h AS (SELECT doc_id, ${hex32Sql("'7:'||tok")} AS hv FROM th),
         |bits AS (SELECT doc_id, j,
         |  CASE WHEN SUM(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) >= 0
         |       THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END AS bit
         |  FROM h, generate_series(0,31) g(j) GROUP BY doc_id, j)
         |SELECT d.doc_id, CAST(SUM(bit) AS BIGINT) AS simhash
         |FROM documents d LEFT JOIN bits ON d.doc_id = bits.doc_id
         |GROUP BY d.doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), GraftFunctions.simhash(col("text")).as("simhash"))
    },

    // --- sliding-window chunking (txt44): the retrieval/embedding-prep
    // --- step — size-32 windows every 24 tokens (8-token overlap), short
    // --- tails kept, empty docs dropped. Per-document projection +
    // --- explode, zero exchanges; the oracle restates window starts with
    // --- generate_series and 1-based inclusive list slices. ----------------
    q("txt44_chunk_overlap",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, toks,
         |        unnest(generate_series(0, (len(toks)-1)//24)) AS c
         |      FROM t WHERE len(toks) > 0)
         |SELECT doc_id, c AS chunk_idx, c*24 AS tok_start,
         |  LEAST(32, len(toks) - c*24) AS n_toks,
         |  array_to_string(toks[c*24+1:c*24+32], ' ') AS chunk_text
         |FROM s""".stripMargin) { (s, d) =>
      TextOps.chunk(Tables.documents(s, d), "doc_id", "text",
        size = 32, stride = 24)
    },

    // --- per-source vocabulary statistics (txt45): the corpus-health report
    // --- curation runs before training — token volume, type (distinct
    // --- token) count, hapax-legomena count, type/token ratio per source
    // --- (low TTR or collapsed hapax mass flags templated/duplicated
    // --- sources). Two hash aggregations, both partial-agg'd map-side; the
    // --- ratio is one IEEE division of exact counts. The CASTs pin
    // --- DuckDB's HUGEINT sum widening back to BIGINT. --------------------
    q("txt45_vocab_stats",
      s"""WITH t AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |cnt AS (SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2)
         |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |  COUNT(*) AS n_types,
         |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS type_token_ratio
         |FROM cnt GROUP BY 1""".stripMargin) { (s, d) =>
      val cnt = Tables.documents(s, d)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      cnt.groupBy(col("source")).agg(
          sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .withColumn("type_token_ratio",
          col("n_types").cast("double") / col("n_tokens").cast("double"))
    },

    // --- exact set-similarity join via prefix filtering (txt46, the
    // --- PPJoin/AllPairs family): provably ALL pairs with token-set
    // --- Jaccard ≥ 0.7 — candidates meet only on shared RARE-end prefix
    // --- tokens under one global (df, token) order, then exact
    // --- intersection verify; complete where LSH (txt06) is probabilistic.
    // --- The gate runs a 1-in-7 corpus slice + planted exact copies: this
    // --- synthetic corpus is pathologically self-similar (11M true pairs
    // --- at J≥0.9 over full sf0.1 — output volume, not filter weakness),
    // --- and the completeness contract is slice-independent. Oracle
    // --- replays the order, the prefix bound, and the verify. -------------
    q("txt46_set_similarity_join",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL SELECT doc_id+100000, text FROM documents
         |    WHERE doc_id % 7 = 0 AND doc_id % 10 = 0),
         |tk AS (SELECT doc_id, list_distinct($toksSql) AS tk FROM corpus),
         |tk2 AS (SELECT doc_id, tk FROM tk WHERE len(tk) > 0),
         |ex AS (SELECT doc_id, unnest(tk) AS tok FROM tk2),
         |df AS (SELECT tok, COUNT(*) AS df FROM ex GROUP BY 1),
         |srt AS (SELECT e.doc_id, array_agg(e.tok ORDER BY d.df, e.tok) AS ts
         |  FROM ex e JOIN df d ON e.tok = d.tok GROUP BY 1),
         |pre AS (SELECT doc_id,
         |  unnest(ts[1:CAST(len(ts) - ceil(0.7*len(ts)) + 1 AS INT)]) AS ptok
         |  FROM srt),
         |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM pre a JOIN pre b ON a.ptok = b.ptok AND a.doc_id < b.doc_id),
         |v AS (SELECT cand.a, cand.b,
         |    CAST(len(list_intersect(x.ts, y.ts)) AS BIGINT) AS n_shared,
         |    len(x.ts) AS na, len(y.ts) AS nb
         |  FROM cand JOIN srt x ON cand.a = x.doc_id
         |            JOIN srt y ON cand.b = y.doc_id)
         |SELECT a, b, n_shared,
         |  CAST(n_shared AS DOUBLE)/(na + nb - n_shared) AS jaccard
         |FROM v WHERE CAST(n_shared AS DOUBLE)/(na + nb - n_shared) >= 0.7""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val sliced = docs.filter(col("doc_id") % 7 === 0)
      val planted = sliced.unionByName(
        sliced.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      Dedup.setSimilarityJoin(planted, "doc_id", "text", threshold = 0.7)
    },

    // --- length-bucketed batch assembly (txt47): dynamic batching for
    // --- padded training/inference — 16-token length bands, batches of 8
    // --- cut by the salted deterministic rank within each band, so
    // --- per-batch padding waste is bounded by the band width instead of
    // --- the corpus length spread. One band-keyed exchange total. ---------
    q("txt47_length_batches",
      s"""WITH t AS (SELECT doc_id, len($toksSql) AS n_tokens FROM documents),
         |t2 AS (SELECT * FROM t WHERE n_tokens > 0),
         |r AS (SELECT doc_id, n_tokens, n_tokens // 16 AS band,
         |  ROW_NUMBER() OVER (PARTITION BY n_tokens // 16
         |    ORDER BY (doc_id * 2654435761) % 1000003, doc_id) - 1 AS rk
         |  FROM t2)
         |SELECT doc_id, n_tokens, band, rk // 8 AS batch_id, rk % 8 AS pos
         |FROM r""".stripMargin) { (s, d) =>
      TextOps.lengthBucketBatches(Tables.documents(s, d), "doc_id", "text",
        bandWidth = 16, batchSize = 8)
    },

    // --- leakage-safe train/val/test split (txt48): near-duplicates MUST
    // --- land in the same split — hashing the doc id (txt12) leaks a
    // --- training doc's near-copy into eval. Split by the dup-CLUSTER
    // --- representative instead: members share the rep by construction,
    // --- so co-location is structural, not probabilistic. Composes txt10's
    // --- distributed connected components with txt12's salted-md5 bucket;
    // --- unclustered docs fall back to their own id. ----------------------
    q("txt48_leakage_safe_split",
      s"""WITH RECURSIVE $corpusSql,
         |$minhashSql,
         |sym AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM sym
         |  UNION
         |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
         |),
         |cl AS (SELECT u AS member, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
         |wr AS (SELECT c.doc_id, COALESCE(cl.rep, c.doc_id) AS rep
         |  FROM corpus c LEFT JOIN cl ON c.doc_id = cl.member),
         |h AS (SELECT doc_id, rep,
         |  ${hex32Sql("'42:'||CAST(rep AS VARCHAR)")} % 10 AS bucket FROM wr)
         |SELECT doc_id, rep, bucket,
         |  CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h""".stripMargin) { (s, d) =>
      val docs = corpus(s, d)
      val cl = Dedup.clustersDistributed(
        Dedup.minhashCandidatePairs(docs, "doc_id", "text"))
      val wr = docs.join(cl, docs("doc_id") === cl("member"), "left")
        .select(docs("doc_id"), coalesce(col("rep"), docs("doc_id")).as("rep"))
      wr.select(col("doc_id"), col("rep"),
          TextOps.splitBucket(col("rep"), salt = 42, nBuckets = 10).as("bucket"))
        .withColumn("split", TextOps.splitLabel(col("bucket")))
    },

    // --- RAKE keyword extraction (txt49): multi-word technical terms by
    // --- degree/frequency scoring over stopword-delimited candidate
    // --- phrases; word scores are exact-integer divisions, phrase sums
    // --- decimal-cast (order-proof) — the whole pipeline hash-matches.
    // --- Oracle mirrors the islands, both aggregations, and the decimal
    // --- phrase sum. ------------------------------------------------------
    q("txt49_rake_keywords",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |px AS (SELECT doc_id, unnest(toks) AS tok,
         |  unnest(generate_series(1, len(toks))) AS pos FROM t),
         |ns AS (SELECT doc_id, tok, pos,
         |  pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
         |  FROM px WHERE tok NOT IN ('a','the','of','to','and','in','is')),
         |ph AS (SELECT doc_id, isl,
         |  array_to_string(array_agg(tok ORDER BY pos), ' ') AS phrase,
         |  COUNT(*) AS plen FROM ns GROUP BY 1, 2),
         |ws AS (SELECT ns.tok,
         |  CAST(SUM(ph.plen) AS DOUBLE)/COUNT(*) AS wscore
         |  FROM ns JOIN ph ON ns.doc_id = ph.doc_id AND ns.isl = ph.isl
         |  GROUP BY 1),
         |psc AS (SELECT ns.doc_id, ns.isl,
         |  CAST(SUM(CAST(ws.wscore AS DECIMAL(18,6))) AS DOUBLE) AS score
         |  FROM ns JOIN ws ON ns.tok = ws.tok GROUP BY 1, 2)
         |SELECT DISTINCT p.doc_id, p.phrase, CAST(p.plen AS BIGINT) AS n_words,
         |  psc.score
         |FROM ph p JOIN psc ON p.doc_id = psc.doc_id AND p.isl = psc.isl
         |WHERE p.plen >= 2""".stripMargin) { (s, d) =>
      TextOps.rakeKeywords(Tables.documents(s, d), "doc_id", "text",
        stopwords = Seq("a", "the", "of", "to", "and", "in", "is"),
        minWords = 2)
    },

    // --- quality-aware cluster dedup (txt50): keep the BEST member per
    // --- near-dup cluster (longest here; ties to smallest id) instead of
    // --- txt42's arbitrary min-id — clipped copies lose to their fuller
    // --- originals, exact copies tie-break to the original id. Oracle =
    // --- the recursive closure + per-cluster argmax window. ---------------
    q("txt50_quality_dedup",
      s"""WITH RECURSIVE $corpusSql,
         |$minhashSql,
         |sym AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
         |reach(u, v) AS (
         |  SELECT u, v FROM sym
         |  UNION
         |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
         |),
         |cl AS (SELECT u AS member, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u),
         |qv AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS q FROM corpus),
         |wq AS (SELECT cl.member, cl.rep, qv.q FROM cl JOIN qv ON cl.member = qv.doc_id),
         |keep AS (SELECT rep, member AS keeper FROM (
         |  SELECT rep, member,
         |    ROW_NUMBER() OVER (PARTITION BY rep ORDER BY q DESC, member) AS rn
         |  FROM wq) t WHERE rn = 1),
         |dropped AS (SELECT wq.member AS doc_id FROM wq
         |  JOIN keep ON wq.rep = keep.rep WHERE wq.member <> keep.keeper)
         |SELECT doc_id, text FROM corpus
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin) { (s, d) =>
      val docs = corpus(s, d)
        .withColumn("q_len", octet_length(col("text")).cast("long"))
      Dedup.clusterDedupByQuality(docs, "doc_id", "text", "q_len")
        .select(col("doc_id"), col("text"))
    },

    // --- collocation mining (txt52): statistically-bound word pairs by
    // --- LIFT = P(w1w2)/(P(w1)·P(w2)) = n_ab·N/(n_a·n_b) — the PMI family
    // --- without the log (exact integer numerator/denominator, ONE IEEE
    // --- division ⇒ engine-identical, the txt11 idf discipline). Pairs
    // --- with count ≥ 3 and lift ≥ 1.4 are reported (this corpus's lift
    // --- ceiling is ~4.8 — templated text keeps co-occurrence flat). Two vocabulary-bounded
    // --- hash aggs + one pair-keyed join; N broadcasts as one row. --------
    q("txt52_collocations",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |uni AS (SELECT unnest(toks) AS w FROM t),
         |n AS (SELECT COUNT(*) AS nt FROM uni),
         |uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
         |bi AS (SELECT unnest([ [toks[i], toks[i+1]]
         |    for i in generate_series(1, len(toks)-1) ]) AS pr FROM t),
         |bc AS (SELECT pr[1] AS w1, pr[2] AS w2, COUNT(*) AS n_pair
         |  FROM bi GROUP BY 1, 2)
         |SELECT bc.w1, bc.w2, bc.n_pair,
         |  CAST(bc.n_pair * n.nt AS DOUBLE) / CAST(a.c * b.c AS DOUBLE) AS lift
         |FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w, n
         |WHERE bc.n_pair >= 3
         |  AND CAST(bc.n_pair * n.nt AS DOUBLE) / CAST(a.c * b.c AS DOUBLE) >= 1.4""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val uni = t.select(explode(col("toks")).as("w"))
      val n = uni.agg(count(lit(1)).as("nt"))
      val uc = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
      // Spark's sequence(0, -1) counts DOWN (the shingles() hazard) — a
      // one-token doc must contribute no pairs, not a reversed range
      val bc = t.filter(size(col("toks")) >= 2)
        .select(explode(transform(
          sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2")))).as("pr"))
        .select(col("pr.w1"), col("pr.w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      bc.join(uc.select(col("w").as("w1"), col("c").as("_ca")), Seq("w1"))
        .join(uc.select(col("w").as("w2"), col("c").as("_cb")), Seq("w2"))
        .crossJoin(broadcast(n))
        .withColumn("lift", (col("n_pair") * col("nt")).cast("double") /
          (col("_ca") * col("_cb")).cast("double"))
        .filter(col("n_pair") >= 3 && col("lift") >= 1.4)
        .select(col("w1"), col("w2"), col("n_pair"), col("lift"))
    },

    // --- fuzzy entity matching at edit distance ≤ 1 (txt53, FastSS
    // --- deletion neighborhoods): candidates meet on shared neighborhood
    // --- strings — COMPLETE for ed ≤ 1 by construction, one equi-join,
    // --- never an all-pairs distance scan; levenshtein verifies. Runs at
    // --- the CANONICAL level — distinct values with their min-id
    // --- representative (64 name strings carry up to 347 copies each
    // --- here; id-level pairing would square that for nothing — the
    // --- production shape canonicalizes values, then maps ids back
    // --- through the value table). Planted one-character mutations must
    // --- pair with their originals. ---------------------------------------
    q("txt53_fuzzy_join",
      """WITH raw AS (
        |  SELECT p_partkey AS id, p_name AS s FROM part
        |  UNION ALL SELECT p_partkey + 100000, 'z' || substr(p_name, 2)
        |    FROM part WHERE p_partkey % 50 = 0),
        |names AS (SELECT MIN(id) AS id, s FROM raw GROUP BY s),
        |vars AS (SELECT id, s, unnest(list_append(
        |    [substr(s, 1, i-1) || substr(s, i+1, strlen(s))
        |     for i in generate_series(1, strlen(s))], s)) AS v FROM names),
        |cand AS (SELECT DISTINCT a.id AS a, b.id AS b, a.s AS sa, b.s AS sb
        |  FROM vars a JOIN vars b ON a.v = b.v AND a.id < b.id)
        |SELECT a, b, CAST(levenshtein(sa, sb) AS INT) AS dist
        |FROM cand WHERE levenshtein(sa, sb) <= 1""".stripMargin) { (s, d) =>
      val part = Tables.part(s, d)
      val raw = part.select(col("p_partkey").as("id"), col("p_name").as("s"))
        .unionByName(part.filter(col("p_partkey") % 50 === 0)
          .select((col("p_partkey") + 100000).as("id"),
            concat(lit("z"), expr("substring(p_name, 2)")).as("s")))
      val canonical = raw.groupBy(col("s")).agg(min(col("id")).as("id"))
      Dedup.fuzzyPairsEd1(canonical, "id", "s")
    },

    // --- blocklist phrase filtering (txt51): the compliance screen — which
    // --- banned token phrases occur verbatim in each doc. Scale shape is
    // --- the Aho-Corasick analog: phrases ANCHOR on their first token, the
    // --- corpus explodes to distinct tokens ONCE, one hash equi-join
    // --- yields candidate (doc, phrase) pairs (complete: a phrase occurring
    // --- implies its anchor occurring), and only candidates pay the exact
    // --- boundary-padded contains verify — a 10⁶-phrase blocklist never
    // --- scans the corpus 10⁶ times. Oracle = the brute contains join. ----
    q("txt51_blocklist_filter",
      """WITH bl(phrase) AS (VALUES ('slow fast'), ('hash value table'),
        |  ('batch window spark'), ('data stream filter'), ('no such phrase ever')),
        |m AS (SELECT d.doc_id, b.phrase FROM documents d JOIN bl b
        |  ON contains(' ' || d.text || ' ', ' ' || b.phrase || ' '))
        |SELECT d.doc_id, COUNT(m.phrase) AS n_matched,
        |  COUNT(m.phrase) > 0 AS blocked
        |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
        |GROUP BY d.doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val bl = Seq("slow fast", "hash value table", "batch window spark",
        "data stream filter", "no such phrase ever").toDF("phrase")
      TextOps.blocklistFilter(Tables.documents(s, d), "doc_id", "text",
        bl, "phrase")
    },

    // --- vocabulary coverage curve (txt54): how many word types cover each
    // --- decile of corpus token mass — the Zipf summary a tokenizer budget
    // --- decision reads (steep curve ⇒ small vocab suffices). The corpus
    // --- scan is ONE partial-agg'd count; the rank/cumsum windows run over
    // --- the VOCABULARY-bounded count frame (the txt29/q63 tiny-frame
    // --- discipline — never the corpus); the decile probe is an exact
    // --- integer cross-multiplication, no division. Ties rank (count DESC,
    // --- token) — total order, engine-identical. --------------------------
    q("txt54_vocab_coverage",
      """WITH t AS (SELECT unnest(list_filter(string_split(text, ' '),
        |  x -> x <> '')) AS tok FROM documents),
        |c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY 1),
        |r AS (SELECT tok, n,
        |  ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk,
        |  SUM(n) OVER (ORDER BY n DESC, tok ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM c),
        |tot AS (SELECT SUM(n) AS tot FROM c)
        |SELECT CAST(d.decile AS BIGINT) AS decile, MIN(rk) AS n_types
        |FROM r, tot, generate_series(1, 9) d(decile)
        |WHERE cum * 10 >= d.decile * tot.tot
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val counts = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      // global rank + cumulative mass over the O(token types) frame via two
      // GlobalRank two-level passes — never a single-partition window
      val ranked = GlobalRank.cumSum(
        GlobalRank.rowNumber(counts, Seq(col("n").desc, col("tok")), "rk"),
        Seq(col("n").desc, col("tok")), col("n"), "cum")
      val tot = counts.agg(sum(col("n")).as("tot"))
      ranked.crossJoin(broadcast(tot))
        .select(explode(sequence(lit(1), lit(9))).as("decile"),
          col("rk"), col("cum"), col("tot"))
        .filter(col("cum") * 10 >= col("decile") * col("tot"))
        .groupBy(col("decile").cast("long").as("decile"))
        .agg(min(col("rk")).as("n_types"))
    },

    // --- suffix stemming report (txt55): Porter-lite step-1 rules as ONE
    // --- deterministic CASE chain over shared string primitives (no
    // --- stemmer lib, no UDF — bit-identical across engines); the report
    // --- shows the vocabulary compaction stemming buys per source. Pure
    // --- projection on the token stream + two partial-agg'd distincts. ----
    q("txt55_stemming_report",
      """WITH t AS (SELECT source, unnest(list_filter(string_split(text, ' '),
        |  x -> x <> '')) AS tok FROM documents),
        |s AS (SELECT source, tok, CASE
        |  WHEN tok LIKE '%sses' THEN substr(tok, 1, length(tok)-2)
        |  WHEN tok LIKE '%ies' THEN substr(tok, 1, length(tok)-2)
        |  WHEN tok LIKE '%ss' THEN tok
        |  WHEN tok LIKE '%s' AND length(tok) > 3 THEN substr(tok, 1, length(tok)-1)
        |  WHEN tok LIKE '%ing' AND length(tok) > 5 THEN substr(tok, 1, length(tok)-3)
        |  WHEN tok LIKE '%ed' AND length(tok) > 4 THEN substr(tok, 1, length(tok)-2)
        |  ELSE tok END AS stem FROM t)
        |SELECT source, COUNT(*) AS n_tokens,
        |  COUNT(DISTINCT tok) AS n_types_raw,
        |  COUNT(DISTINCT stem) AS n_types_stemmed
        |FROM s GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
        .select(col("source"), col("tok"), TextOps.stemLite(col("tok")).as("stem"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_types_raw"),
          countDistinct(col("stem")).as("n_types_stemmed"))
    },

    // --- dialog flattening + loss-mask spans (txt56): the SFT data-prep
    // --- step — per-user event sequences rendered as alternating
    // --- user/assistant turns, flattened to one training string, with the
    // --- CHARACTER SPANS of the assistant turns emitted alongside (the
    // --- loss mask: train only on assistant tokens). Offsets are exact
    // --- integer prefix sums of line lengths over one user-keyed window;
    // --- assembly is array_sort over collected (idx, line) structs —
    // --- collect order never matters. First 6 events per user bound the
    // --- dialog. --------------------------------------------------------
    q("txt56_dialog_masks",
      """WITH e AS (SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS idx
        |  FROM events),
        |t AS (SELECT user_id, idx,
        |  (CASE WHEN idx % 2 = 0 THEN 'user' ELSE 'assistant' END)
        |    || ': ' || event_type AS line
        |  FROM e WHERE idx < 6),
        |o AS (SELECT user_id, idx, line,
        |  COALESCE(SUM(length(line) + 1) OVER (PARTITION BY user_id ORDER BY idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
        |  FROM t)
        |SELECT user_id,
        |  string_agg(line, chr(10) ORDER BY idx) AS dialog,
        |  COUNT(*) AS n_turns,
        |  array_to_string(list_filter(
        |    list(CASE WHEN idx % 2 = 1
        |      THEN CAST(st AS VARCHAR) || '-' || CAST(st + length(line) AS VARCHAR)
        |      END ORDER BY idx), x -> x IS NOT NULL), ',') AS mask_spans
        |FROM o GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      val t = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          (row_number().over(byUser) - 1).as("idx"))
        .filter(col("idx") < 6)
        .select(col("user_id"), col("idx"),
          concat(when(col("idx") % 2 === 0, lit("user"))
              .otherwise(lit("assistant")),
            lit(": "), col("event_type")).as("line"))
      val o = t.withColumn("st", coalesce(
        sum(length(col("line")) + 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("idx"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      o.groupBy(col("user_id"))
        .agg(
          concat_ws("\n", expr(
            "transform(array_sort(collect_list(struct(idx, line))), p -> p.line)"))
            .as("dialog"),
          count(lit(1)).as("n_turns"),
          array_join(expr(
            """filter(transform(array_sort(collect_list(struct(idx,
              |  CASE WHEN idx % 2 = 1
              |    THEN concat(cast(st AS STRING), '-',
              |      cast(st + length(line) AS STRING)) END AS span))),
              |  p -> p.span), x -> x IS NOT NULL)""".stripMargin), ",")
            .as("mask_spans"))
    },

    // --- golden-record survivorship (txt57): the MERGE step of entity
    // --- resolution — duplicate customer records (planted clipped-name,
    // --- drained-balance copies) collapse to one record per entity under
    // --- declared per-attribute rules: name = longest (ties lexicographic
    // --- min), balance = max, source id = min. One aggregation with
    // --- max_by/min over the cluster key (clusters come from the matching
    // --- stage — txt53/txt10 — in a full pipeline; the gate pins the
    // --- SURVIVORSHIP semantics). ----------------------------------------
    q("txt57_golden_record",
      """WITH corp AS (
        |  SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal FROM customer
        |  UNION ALL SELECT c_custkey + 500000,
        |    substr(c_name, 1, length(c_name) - 3), c_acctbal - 50
        |  FROM customer WHERE c_custkey % 9 = 0),
        |e AS (SELECT id, id % 500000 AS entity, name, bal FROM corp),
        |named AS (SELECT entity, name FROM (SELECT entity, name,
        |  ROW_NUMBER() OVER (PARTITION BY entity
        |    ORDER BY length(name) DESC, name, entity) AS rn FROM e) t
        |  WHERE rn = 1)
        |SELECT e.entity, MIN(named.name) AS golden_name,
        |  MAX(e.bal) AS golden_bal, MIN(e.id) AS src_id
        |FROM e JOIN named ON e.entity = named.entity
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val corp = c.select(col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_acctbal").as("bal"))
        .unionByName(c.filter(col("c_custkey") % 9 === 0)
          .select((col("c_custkey") + 500000L).as("id"),
            expr("substring(c_name, 1, length(c_name) - 3)").as("name"),
            (col("c_acctbal") - 50).as("bal")))
      corp.select(col("id"), (col("id") % 500000L).as("entity"),
          col("name"), col("bal"))
        .groupBy(col("entity"))
        .agg(
          min_by(col("name"),
            struct(negate(length(col("name"))), col("name"))).as("golden_name"),
          max(col("bal")).as("golden_bal"),
          min(col("id")).as("src_id"))
    },

    // --- bigram LM with unigram BACKOFF (txt58): txt22 trained on the
    // --- whole corpus, so every bigram was seen and the score NULLed
    // --- nothing; real LMs score HELD-OUT text, where unseen transitions
    // --- are the norm. Counts train on the EVEN half only; every doc is
    // --- scored with P(w2|w1) = c(w1w2)/c(w1·) when seen, else the Katz-
    // --- style 0.4·c(w2)/N unigram fallback (0 for OOV w2) — each branch
    // --- a couple of IEEE ops over exact integers, mean via the decimal-
    // --- cast exact sum. The backoff count per doc is reported (odd docs
    // --- exercise it by construction). Same two-hash-agg + equi-join
    // --- shuffle shape as txt22; N broadcasts as a one-row scalar. --------
    q("txt58_backoff_lm",
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |bi AS (SELECT doc_id, unnest(
         |  [{'w1': t[i], 'w2': t[i+1]} for i in generate_series(1, len(t)-1)],
         |  recursive := true) FROM toks),
         |tbi AS (SELECT * FROM bi WHERE doc_id % 2 = 0),
         |bg AS (SELECT w1, w2, COUNT(*) AS c_bg FROM tbi GROUP BY 1, 2),
         |hd AS (SELECT w1, COUNT(*) AS c_head FROM tbi GROUP BY 1),
         |uni AS (SELECT u AS w, COUNT(*) AS c_u FROM (
         |  SELECT unnest(t) AS u FROM toks WHERE doc_id % 2 = 0) GROUP BY 1),
         |nn AS (SELECT CAST(SUM(c_u) AS BIGINT) AS n_train FROM uni),
         |ps AS (SELECT bi.doc_id,
         |  CASE WHEN bg.c_bg IS NOT NULL
         |    THEN CAST(bg.c_bg AS DOUBLE)/CAST(hd.c_head AS DOUBLE)
         |    ELSE 0.4 * (CAST(COALESCE(uni.c_u, 0) AS DOUBLE)/CAST(nn.n_train AS DOUBLE))
         |  END AS p,
         |  CASE WHEN bg.c_bg IS NULL THEN 1 ELSE 0 END AS backed
         |  FROM bi
         |  LEFT JOIN bg ON bi.w1 = bg.w1 AND bi.w2 = bg.w2
         |  LEFT JOIN hd ON bi.w1 = hd.w1
         |  LEFT JOIN uni ON bi.w2 = uni.w
         |  CROSS JOIN nn),
         |ag AS (SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(backed) AS BIGINT) AS n_backoff,
         |  CAST(SUM(CAST(p AS DECIMAL(18,12))) AS DOUBLE)/COUNT(*) AS score
         |  FROM ps GROUP BY 1)
         |SELECT d.doc_id, COALESCE(ag.n_bigrams, 0) AS n_bigrams,
         |  COALESCE(ag.n_backoff, 0) AS n_backoff, ag.score
         |FROM documents d LEFT JOIN ag ON d.doc_id = ag.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val t = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      val nbg = greatest(size(col("t")) - 1, lit(0))
      val bi = t.select(col("doc_id"), explode(zip_with(
          slice(col("t"), lit(1), nbg), slice(col("t"), lit(2), nbg),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val tbi = bi.filter(col("doc_id") % 2 === 0)
      val bg = tbi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_bg"))
      val hd = tbi.groupBy(col("w1")).agg(count(lit(1)).as("c_head"))
      val uni = t.filter(col("doc_id") % 2 === 0)
        .select(explode(col("t")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c_u"))
      val nn = uni.agg(sum(col("c_u")).as("n_train"))
      val ps = bi
        .join(bg, Seq("w1", "w2"), "left")
        .join(hd, Seq("w1"), "left")
        .join(uni.withColumnRenamed("w", "w2"), Seq("w2"), "left")
        .crossJoin(broadcast(nn))
        .select(col("doc_id"),
          when(col("c_bg").isNotNull,
            col("c_bg").cast("double") / col("c_head").cast("double"))
            .otherwise(lit(0.4) *
              (coalesce(col("c_u"), lit(0L)).cast("double")
                / col("n_train").cast("double"))).as("p"),
          when(col("c_bg").isNull, 1L).otherwise(0L).as("backed"))
      val ag = ps.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("backed")).as("n_backoff"),
        (dsum(col("p"), 12) / count(lit(1))).as("score"))
      docs.select(col("doc_id")).join(ag, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_backoff"), lit(0L)).as("n_backoff"), col("score"))
    },

    // --- persisted inverted index + phrase search (txt76): the retrieval
    // --- artifact of a curation stack — build-once positional postings
    // --- partitioned by token bucket, query-time reads pruned to the
    // --- query tokens' buckets (literal isin → static partition pruning;
    // --- bucket ids computed through Catalyst's own murmur3 so index and
    // --- query can never disagree). An occurrence = consecutive
    // --- positions; search = rarest-list-bounded equi-joins on
    // --- (doc, base), never a text scan. Three phrases incl. the
    // --- repeated-token edge ('a a' — each slot filters the same list
    // --- under its own shift). Oracle replays tokenize + adjacency. ------
    q("txt76_inverted_index",
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(t) AS token,
        |    unnest(generate_series(1, len(t))) AS pos FROM toks),
        |m AS (
        |  SELECT 'table hash' AS phrase, a.doc_id, a.pos FROM p a
        |    JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |    WHERE a.token = 'table' AND b.token = 'hash'
        |  UNION ALL
        |  SELECT 'slow hash batch', a.doc_id, a.pos FROM p a
        |    JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |    JOIN p c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
        |    WHERE a.token = 'slow' AND b.token = 'hash' AND c.token = 'batch'
        |  UNION ALL
        |  SELECT 'a a', a.doc_id, a.pos FROM p a
        |    JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |    WHERE a.token = 'a' AND b.token = 'a')
        |SELECT phrase, doc_id, COUNT(*) AS n_matches
        |FROM m GROUP BY 1, 2""".stripMargin) { (s, d) =>
      import graft.operators.InvertedIndex
      val dir = java.nio.file.Files.createTempDirectory("txt76").toString + "/ix"
      InvertedIndex.save(Tables.documents(s, d), "doc_id", "text", dir)
      val idx = InvertedIndex.load(s, dir)
      Seq("table hash", "slow hash batch", "a a")
        .map(p => idx.searchPhrase(p).withColumn("phrase", lit(p)))
        .reduce(_.unionByName(_))
        .select(col("phrase"), col("doc_id"), col("n_matches"))
    },

    // --- BM25 ranked retrieval over the inverted index (txt77): top-10
    // --- docs for a 3-term query. Determinism discipline (txt11's ln-free
    // --- idf extended to BM25): each per-term score is ONE IEEE division
    // --- of exactly computed integers (k1=1.2/b=0.75 cleared to integers
    // --- by x20·total), and the per-doc sum left-folds term scores in
    // --- TOKEN ORDER — the oracle restates the same fold as alphabetical
    // --- chained adds (absent terms +0.0, an IEEE identity), so the
    // --- ranking doubles are bit-identical across engines. --------------
    q("txt77_bm25_search",
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(t) AS token,
        |    unnest(generate_series(1, len(t))) AS pos FROM toks),
        |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dlen FROM toks),
        |st AS (SELECT COUNT(*) AS n, CAST(SUM(dlen) AS BIGINT) AS total FROM dl),
        |tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM p
        |  WHERE token IN ('hash', 'scan', 'table') GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |term AS (SELECT tf.doc_id, tf.token,
        |    CAST((2*n - 2*df + 1)*44*tf*total AS DOUBLE) /
        |    CAST((2*df + 1)*(20*tf*total + 6*total + 18*dlen*n) AS DOUBLE) AS s
        |  FROM tf JOIN df USING (token)
        |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |sc AS (SELECT doc_id,
        |    COALESCE(MAX(CASE WHEN token = 'hash' THEN s END), 0)
        |  + COALESCE(MAX(CASE WHEN token = 'scan' THEN s END), 0)
        |  + COALESCE(MAX(CASE WHEN token = 'table' THEN s END), 0) AS score
        |  FROM term GROUP BY 1)
        |SELECT doc_id, score, rank FROM (
        |  SELECT doc_id, score,
        |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc) r
        |WHERE rank <= 10""".stripMargin) { (s, d) =>
      import graft.operators.InvertedIndex
      val dir = java.nio.file.Files.createTempDirectory("txt77").toString + "/ix"
      InvertedIndex.save(Tables.documents(s, d), "doc_id", "text", dir)
      InvertedIndex.load(s, dir).searchRanked("table hash scan", k = 10)
        .select(col("doc_id"), col("score"), col("rank"))
    },

    // --- inverted-index incremental maintenance (txt78): the artifact
    // --- lifecycle — build on the even half, APPEND the odd half (new
    // --- postings land in the same bucket layout, nothing existing
    // --- rewritten), tombstone-DELETE the doc_id % 7 = 0 slice (the
    // --- Lucene deleted-docs shape: a doc's tokens hash into nearly
    // --- every bucket, so physical per-delete rewrites are a
    // --- non-starter; reads anti-join the tiny id set), then
    // --- compactDeletes() physically reclaims and the same search must
    // --- read back identically (compact_ok verdict). Oracle = the
    // --- phrase adjacency over the equivalent final corpus. -------------
    q("txt78_index_maintenance",
      """WITH src AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM src),
        |p AS (SELECT doc_id, unnest(t) AS token,
        |    unnest(generate_series(1, len(t))) AS pos FROM toks),
        |m AS (SELECT a.doc_id, a.pos FROM p a
        |  JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  WHERE a.token = 'table' AND b.token = 'hash')
        |SELECT doc_id, COUNT(*) AS n_matches, TRUE AS compact_ok
        |FROM m GROUP BY 1""".stripMargin) { (s, d) =>
      import graft.operators.InvertedIndex
      val docs = Tables.documents(s, d)
      val dir = java.nio.file.Files.createTempDirectory("txt78").toString + "/ix"
      InvertedIndex.save(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dir)
      val idx = InvertedIndex.load(s, dir)
      idx.appendDocs(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      idx.removeDocs(docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id")), "doc_id")
      val tombstoned = idx.searchPhrase("table hash").localCheckpoint()
      idx.compactDeletes()
      val compacted = idx.searchPhrase("table hash").localCheckpoint()
      val compactOk = Qutil.multisetEq(compacted, tombstoned)
      compacted.withColumn("compact_ok", lit(compactOk))
    },

    // --- streaming index maintenance from a document changelog (txt79):
    // --- the text twin of the vector index's CDC loop, on the LUCENE
    // --- SEGMENT MODEL — each micro-batch writes its alive docs' postings
    // --- as segment seg=<batchId> (sub-partitioned by token bucket) plus
    // --- segment-scoped tombstones for every touched doc; a posting is
    // --- live iff no NEWER tombstone for its doc exists, so updates kill
    // --- old versions, deletes leave only the tombstone, and replays are
    // --- idempotent BY LAYOUT (dynamic overwrite of the batch's own
    // --- partitions). Drive: 3 commit-ordered changelog files (insert
    // --- all → update %3 with reversed text → delete %5) through a real
    // --- file stream; both an original-text phrase and a reversed-text
    // --- phrase must resolve against the FINAL corpus only. -------------
    q("txt79_streaming_index",
      """WITH src AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN reverse(text) ELSE text END AS text
        |  FROM documents WHERE doc_id % 5 <> 0),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t FROM src),
        |p AS (SELECT doc_id, unnest(t) AS token,
        |    unnest(generate_series(1, len(t))) AS pos FROM toks),
        |m AS (
        |  SELECT 'table hash' AS phrase, a.doc_id, a.pos FROM p a
        |    JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |    WHERE a.token = 'table' AND b.token = 'hash'
        |  UNION ALL
        |  SELECT 'hsah elbat', a.doc_id, a.pos FROM p a
        |    JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |    WHERE a.token = 'hsah' AND b.token = 'elbat')
        |SELECT phrase, doc_id, COUNT(*) AS n_matches
        |FROM m GROUP BY 1, 2""".stripMargin) { (s, d) =>
      import graft.streaming.InvertedIndexStream
      val docs = Tables.documents(s, d)
      val src = java.nio.file.Files.createTempDirectory("txt79src").toString
      def writeBatch(df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory(s"txt79b$i").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"b$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        // commit order = file mtime order (what the file source sorts on
        // under maxFilesPerTrigger) — staggered explicitly
        dst.setLastModified(1000000000000L + i * 600000L); ()
      }
      writeBatch(docs.select(lit("insert").as("op"), col("doc_id"),
        col("doc_id").as("lsn"), col("text")), 0)
      writeBatch(docs.filter(col("doc_id") % 3 === 0)
        .select(lit("update").as("op"), col("doc_id"),
          (col("doc_id") + 1000000000L).as("lsn"),
          reverse(col("text")).as("text")), 1)
      writeBatch(docs.filter(col("doc_id") % 5 === 0)
        .select(lit("delete").as("op"), col("doc_id"),
          (col("doc_id") + 2000000000L).as("lsn"),
          lit(null).cast("string").as("text")), 2)
      val dir = java.nio.file.Files.createTempDirectory("txt79ix").toString + "/ix"
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "op STRING, doc_id BIGINT, lsn BIGINT, text STRING"))
        .option("maxFilesPerTrigger", 1).parquet(src)
      InvertedIndexStream.maintain(stream, dir)
      Seq("table hash", "hsah elbat")
        .map(p => InvertedIndexStream.searchPhrase(s, dir, p)
          .withColumn("phrase", lit(p)))
        .reduce(_.unionByName(_))
        .select(col("phrase"), col("doc_id"), col("n_matches"))
    },

    // --- BM25 over the STREAMING-maintained index (txt82): txt79's
    // --- segment/tombstone lifecycle under the RANKED query face — the
    // --- search-index consumer the reference names as CDC's first use
    // --- case must answer relevance queries, not just phrase lookups,
    // --- and must answer them from the CHURNED state (inserts → updates
    // --- reverse %3 → deletes %5). Same drive as txt79; the ranked
    // --- search resolves tf/df AND doc-length normalization through the
    // --- segment-scoped tombstone anti-join (doclens ride the same
    // --- seg= lifecycle as postings — O(live docs) read, never an
    // --- O(postings) re-derivation). Oracle = txt77's integer-exact BM25
    // --- formula over the equivalent final corpus. -----------------------
    q("txt82_bm25_stream",
      """WITH src AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN reverse(text) ELSE text END AS text
        |  FROM documents WHERE doc_id % 5 <> 0),
        |toks AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t FROM src),
        |p AS (SELECT doc_id, unnest(t) AS token,
        |    unnest(generate_series(1, len(t))) AS pos FROM toks),
        |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dlen FROM toks),
        |st AS (SELECT COUNT(*) AS n, CAST(SUM(dlen) AS BIGINT) AS total FROM dl),
        |tf AS (SELECT token, doc_id, COUNT(*) AS tf FROM p
        |  WHERE token IN ('hash', 'scan', 'table') GROUP BY 1, 2),
        |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |term AS (SELECT tf.doc_id, tf.token,
        |    CAST((2*n - 2*df + 1)*44*tf*total AS DOUBLE) /
        |    CAST((2*df + 1)*(20*tf*total + 6*total + 18*dlen*n) AS DOUBLE) AS s
        |  FROM tf JOIN df USING (token)
        |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |sc AS (SELECT doc_id,
        |    COALESCE(MAX(CASE WHEN token = 'hash' THEN s END), 0)
        |  + COALESCE(MAX(CASE WHEN token = 'scan' THEN s END), 0)
        |  + COALESCE(MAX(CASE WHEN token = 'table' THEN s END), 0) AS score
        |  FROM term GROUP BY 1)
        |SELECT doc_id, score, rank FROM (
        |  SELECT doc_id, score,
        |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc) r
        |WHERE rank <= 10""".stripMargin) { (s, d) =>
      import graft.streaming.InvertedIndexStream
      val docs = Tables.documents(s, d)
      val src = java.nio.file.Files.createTempDirectory("txt82src").toString
      def writeBatch(df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory(s"txt82b$i").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"b$i.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        dst.setLastModified(1000000000000L + i * 600000L); ()
      }
      writeBatch(docs.select(lit("insert").as("op"), col("doc_id"),
        col("doc_id").as("lsn"), col("text")), 0)
      writeBatch(docs.filter(col("doc_id") % 3 === 0)
        .select(lit("update").as("op"), col("doc_id"),
          (col("doc_id") + 1000000000L).as("lsn"),
          reverse(col("text")).as("text")), 1)
      writeBatch(docs.filter(col("doc_id") % 5 === 0)
        .select(lit("delete").as("op"), col("doc_id"),
          (col("doc_id") + 2000000000L).as("lsn"),
          lit(null).cast("string").as("text")), 2)
      val dir = java.nio.file.Files.createTempDirectory("txt82ix").toString + "/ix"
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "op STRING, doc_id BIGINT, lsn BIGINT, text STRING"))
        .option("maxFilesPerTrigger", 1).parquet(src)
      InvertedIndexStream.maintain(stream, dir)
      InvertedIndexStream.searchRanked(s, dir, "table hash scan", k = 10)
        .select(col("doc_id"), col("score"), col("rank"))
    },

    // --- systematic PPS sampling (txt80): documents sampled with
    // --- probability exactly proportional to token weight, with NO
    // --- randomness and NO libm — weighted reservoir/A-ES needs u^(1/w),
    // --- a pow whose rounding drifts across engines; instead tokens lie
    // --- on the global axis in id order (the txt25 two-level prefix sum —
    // --- no single-partition window), a boundary falls every `step`
    // --- tokens, and a doc is picked per boundary it contains
    // --- (n_picks = (start+w) div step − start div step, exact integers;
    // --- heavy docs collect proportionally many picks — the epoch repeat
    // --- factor). Oracle = the global-cumsum restatement. ----------------
    q("txt80_systematic_sample",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w,
        |    COALESCE(CAST(SUM(w) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS start
        |  FROM t)
        |SELECT doc_id, w AS n_tokens, start AS start_tok,
        |  (start + w) // 1000 - start // 1000 AS n_picks
        |FROM c WHERE (start + w) // 1000 - start // 1000 > 0""".stripMargin) { (s, d) =>
      graft.operators.TextOps.systematicSample(
        Tables.documents(s, d), "doc_id", "text", step = 1000L)
    },

    // --- cross-source token-distribution drift (txt81): the training-mix
    // --- drift detector — L1 distance between two sources' unigram
    // --- distributions plus the top-20 divergence-driving tokens. All in
    // --- EXACT INTEGERS by cross-multiplication: per-token contribution
    // --- |ca·Nb − cb·Na| needs no division (Σ ≤ 2·Na·Nb — far inside
    // --- BIGINT at any realistic corpus), and the single L1 scalar is one
    // --- IEEE divide at the end — engine-identical. Corpus scan is one
    // --- partial-agg'd token count; everything after runs on the
    // --- VOCABULARY-bounded frame (the txt29/q63 tiny-frame discipline);
    // --- top-20 via global TakeOrdered (contrib DESC, token — total
    // --- order), never a corpus sort. DuckDB HUGEINT sums pinned back to
    // --- BIGINT per the txt45 rule. --------------------------------------
    q("txt81_source_drift",
      """WITH t AS (SELECT source, unnest(list_filter(string_split(text, ' '),
        |    x -> x <> '')) AS tok
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |c AS (SELECT tok,
        |    CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM t GROUP BY 1),
        |n AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM c),
        |d AS (SELECT tok, ca, cb,
        |    CAST(abs(ca*nb - cb*na) AS BIGINT) AS contrib FROM c, n),
        |l AS (SELECT CAST(CAST(SUM(contrib) AS BIGINT) AS DOUBLE) /
        |    (CAST(n.na AS DOUBLE) * CAST(n.nb AS DOUBLE)) AS drift_l1
        |  FROM d, n GROUP BY n.na, n.nb)
        |SELECT tok, ca, cb, contrib, (SELECT drift_l1 FROM l) AS drift_l1
        |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY contrib DESC, tok) AS rk
        |  FROM d) WHERE rk <= 20""".stripMargin) { (s, d) =>
      import graft.operators.TextOps
      val toks = Tables.documents(s, d)
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      val c = toks.groupBy("tok").agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ca"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("cb"))
      val withN = c.crossJoin(broadcast(
        c.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))))
      val d0 = withN.withColumn("contrib",
        abs(col("ca") * col("nb") - col("cb") * col("na")))
      val tot = d0.agg((sum(col("contrib")).cast("double") /
        (max(col("na")).cast("double") * max(col("nb")).cast("double")))
        .as("drift_l1"))
      d0.orderBy(col("contrib").desc, col("tok")).limit(20)
        .select("tok", "ca", "cb", "contrib")
        .crossJoin(broadcast(tot))
    }
  )
}
