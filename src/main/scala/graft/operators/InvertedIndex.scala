package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED POSITIONAL INVERTED INDEX + exact phrase search — the
  * retrieval artifact of a curation stack: find every document containing
  * a verbatim phrase without ever scanning document text at query time
  * (audit "which docs say X", blocklist forensics, eval-set provenance).
  * The persisted-artifact lifecycle mirrors the IVF index (build once,
  * query many): where IvfIndex answers geometric neighborhood, this
  * answers exact lexical occurrence.
  *
  * Layout: postings rows (token, doc_id, pos — 0-based over the
  * whitespace-token contract shared with TextOps) written as parquet
  * PARTITIONED by `tbucket = pmod(hash(token), nBuckets)`. A query's
  * tokens resolve driver-side to a LITERAL bucket set (computed through
  * the same Catalyst murmur3 via a LocalTableScan, so index and query can
  * never disagree on the hash), making the read static partition pruning
  * — the PqIndex literal-isin discipline: buckets no query token hashes
  * into are never even listed. Postings shuffle by token at build
  * (one exchange, paid once at write).
  *
  * Phrase semantics: an occurrence is the query tokens at CONSECUTIVE
  * positions. Search = one posting-list filter per query token, slot i
  * shifted to its occurrence BASE (`pos − i`), then n−1 hash equi-joins
  * on (doc_id, base) — candidate volume is bounded by the rarest query
  * token's posting list, never the corpus; repeated query tokens work
  * because each slot filters the same list under its own shift. At
  * 100 TB the posting joins hash on (doc, base) — O(Σ df(token_i))
  * shuffled rows per query, and the text column is never read.
  */
object InvertedIndex {

  /** (token, doc_id, pos) postings over the whitespace-token contract. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        filter(split(col(textCol), " "), t => t =!= "").as("_toks"))
      .select(col("doc_id"), posexplode(col("_toks")))
      .select(col("col").as("token"), col("doc_id"), col("pos"))

  /** Build + persist: postings partitioned by token bucket, plus a 1-row
    * meta parquet carrying nBuckets (the artifact must be self-describing
    * — a loader guessing the bucket count would silently prune wrong).
    */
  def save(docs: DataFrame, idCol: String, textCol: String, dir: String,
      nBuckets: Int = 16): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    postings(docs, idCol, textCol)
      .withColumn("tbucket", pmod(hash(col("token")), lit(nBuckets)))
      .repartition(col("tbucket"))
      .write.mode("overwrite").partitionBy("tbucket").parquet(s"$dir/postings")
    // per-doc token lengths (BM25's length normalization): O(docs) rows,
    // zero-token docs kept — they are part of N and the average
    docs.select(col(idCol).as("doc_id"),
        size(filter(split(col(textCol), " "), t => t =!= "")).cast("long")
          .as("dlen"))
      .write.mode("overwrite").parquet(s"$dir/doclen")
    Seq(nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  final case class Index(spark: SparkSession, dir: String, nBuckets: Int) {

    /** The pruned posting read for a token set: bucket ids computed
      * through Catalyst's own murmur3 (a LocalTableScan job — no file
      * read), then a literal `tbucket IN (...)` partition filter.
      */
    private def deletedPath = s"$dir/deleted"

    private def deletedIds: Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(deletedPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(spark.read.parquet(deletedPath)) else None
    }

    /** Anti-join a relation carrying `doc_id` against the tombstone set —
      * the deleted-docs filter every read path applies (Lucene's
      * deleted-bitmap shape: the set is tiny relative to the index, so
      * the anti-join broadcasts; physical removal is [[compactDeletes]]).
      */
    private def minusDeleted(df: DataFrame): DataFrame = deletedIds match {
      case None => df
      case Some(ids) => df.join(broadcast(ids), Seq("doc_id"), "left_anti")
    }

    private[operators] def postingsFor(tokens: Seq[String]): DataFrame = {
      import spark.implicits._
      val buckets = tokens.distinct.toDF("token")
        .select(pmod(hash(col("token")), lit(nBuckets)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      minusDeleted(spark.read.parquet(s"$dir/postings")
        .filter(col("tbucket").isin(buckets: _*))
        .filter(col("token").isin(tokens.distinct: _*)))
    }

    /** Incrementally index new documents — postings and lengths APPEND
      * into the existing bucket layout (same murmur3/bucket count, so
      * query-time pruning sees old and new postings uniformly); nothing
      * existing is read or rewritten, the IVF-append discipline. Contract:
      * appended doc ids must be fresh (not present, not tombstoned) — an
      * inverted index has no per-doc version, so "update" is
      * remove + compact + append.
      */
    def appendDocs(docs: DataFrame, idCol: String, textCol: String): Unit = {
      InvertedIndex.postings(docs, idCol, textCol)
        .withColumn("tbucket", pmod(hash(col("token")), lit(nBuckets)))
        .repartition(col("tbucket"))
        .write.mode("append").partitionBy("tbucket").parquet(s"$dir/postings")
      docs.select(col(idCol).as("doc_id"),
          size(filter(split(col(textCol), " "), t => t =!= "")).cast("long")
            .as("dlen"))
        .write.mode("append").parquet(s"$dir/doclen")
    }

    /** Delete documents by TOMBSTONE (the Lucene deleted-docs shape): a
      * doc's tokens hash into nearly every bucket, so physical removal
      * would rewrite the whole index per delete — instead the id set
      * appends to a side table that every read anti-joins (broadcast;
      * O(deleted) rows). BM25's N/total shrink immediately because the
      * doc-length read applies the same filter. Reclaim space with
      * [[compactDeletes]] once the set has grown.
      */
    def removeDocs(ids: DataFrame, idCol: String): Unit =
      ids.select(col(idCol).cast("long").as("doc_id")).distinct()
        .write.mode("append").parquet(deletedPath)

    /** Physically drop tombstoned postings: one full rewrite (the honest
      * cost — same as any log-structured compaction), staged to a fresh
      * directory and swapped in, then the tombstone set cleared. Returns
      * the number of deleted doc ids reclaimed.
      */
    def compactDeletes(): Long = {
      val ids = deletedIds.getOrElse(return 0L)
      val n = ids.count()
      if (n == 0) return 0L
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def rewrite(sub: String, part: Option[String]): Unit = {
        // no lineage cut needed: the rewrite targets `$sub.tmp` and the
        // source directory is only deleted AFTER the write action completes,
        // so the scan never races its own overwrite — a localCheckpoint here
        // would materialize the whole index twice per compaction
        val clean = minusDeleted(spark.read.parquet(s"$dir/$sub"))
        val w = clean.write.mode("overwrite")
        part.fold(w)(p => w.partitionBy(p)).parquet(s"$dir/$sub.tmp")
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$sub"), true)
        fs.rename(new org.apache.hadoop.fs.Path(s"$dir/$sub.tmp"),
          new org.apache.hadoop.fs.Path(s"$dir/$sub"))
      }
      rewrite("postings", Some("tbucket"))
      rewrite("doclen", None)
      fs.delete(new org.apache.hadoop.fs.Path(deletedPath), true)
      n
    }

    /** Documents containing `phrase` verbatim, with occurrence counts. */
    def searchPhrase(phrase: String): DataFrame = {
      val qtoks = phrase.split(" ").filter(_.nonEmpty).toSeq
      require(qtoks.nonEmpty, "empty phrase")
      InvertedIndex.phraseMatches(postingsFor(qtoks), qtoks)
    }

    private[operators] def docLens: DataFrame =
      minusDeleted(spark.read.parquet(s"$dir/doclen"))

    /** BM25-ranked bag-of-words retrieval (k1 = 1.2, b = 0.75) — top-`k`
      * docs by (score DESC, doc_id). Engine-portable determinism, the
      * txt11 discipline extended to BM25's length normalization:
      *
      *   - idf is the ln-free rational (N − df + ½)/(df + ½), and the
      *     whole per-term score is ONE IEEE division of two EXACTLY
      *     computed integers —
      *     num = (2N − 2df + 1) · 44 · tf · total,
      *     den = (2df + 1) · (20·tf·total + 6·total + 18·dlen·N)
      *     (the k1/b constants cleared to integers: ×20·total) — so the
      *     per-term double is bit-identical on every engine. Magnitude
      *     bound: num < 2^63 up to ~10^8 corpus tokens × 10^5 docs;
      *     beyond that lift num/den to DECIMAL(38,0) (still exact).
      *   - the per-doc sum left-folds the term scores in TOKEN ORDER
      *     (`aggregate(array_sort(collect_list(…)))`), because a plain
      *     double SUM is order-dependent; adding absent terms as +0.0 is
      *     an IEEE identity, so any engine summing the same ordered terms
      *     gets the same double.
      *
      * Scale shape: per-term work is bounded by the query tokens' posting
      * lists (the same pruned read as phrase search); the corpus-level
      * (N, total) pair is one broadcast row; the final top-k is a
      * TakeOrderedAndProject over candidate docs only (≤ Σ df(token)),
      * never the corpus, and never a single-partition window.
      */
    def searchRanked(query: String, k: Int): DataFrame = {
      val qtoks = query.split(" ").filter(_.nonEmpty).distinct.toSeq
      require(qtoks.nonEmpty, "empty query")
      bm25TopK(postingsFor(qtoks), docLens, k)
    }
  }

  /** Shared BM25 core over ANY live posting slice + doc-length relation —
    * the batch index and the streaming segment index (which derives both
    * inputs through its tombstone anti-join) rank through the SAME plan.
    * `queryPostings` must already be restricted to the query's tokens and
    * to live docs; `docLens` is the full live (doc_id, dlen) relation.
    * Output: top-`k` (doc_id, score, rank) by (score DESC, doc_id).
    */
  private[graft] def bm25TopK(queryPostings: DataFrame, docLens: DataFrame,
      k: Int): DataFrame = {
    val tf = queryPostings
      .groupBy(col("token"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = docLens.agg(count(lit(1)).as("n"),
      sum(col("dlen")).as("total"))
    val term = tf.join(df, Seq("token")).join(docLens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("s",
        ((lit(2L) * col("n") - lit(2L) * col("df") + lit(1L)) *
          lit(44L) * col("tf") * col("total")).cast("double") /
        ((lit(2L) * col("df") + lit(1L)) *
          (lit(20L) * col("tf") * col("total") + lit(6L) * col("total") +
            lit(18L) * col("dlen") * col("n"))).cast("double"))
    // top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    // driver merge of k·partitions rows), THEN rank the ≤k survivors with
    // GlobalRank's bucket-partitioned window — the candidate frame
    // (≤ Σ df(token)) never moves to a single partition
    val scored = term.groupBy(col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("token"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
    GlobalRank.rowNumber(scored,
        Seq(col("score").desc, col("doc_id")), "rank", nBuckets = 4)
      .withColumn("rank", col("rank").cast("int"))
  }

  def load(spark: SparkSession, dir: String): Index = {
    val n = spark.read.parquet(s"$dir/meta").head().getInt(0)
    Index(spark, dir, n)
  }

  /** The adjacency core over any postings relation (in-memory or loaded):
    * slot i's list shifted to base = pos − i, n−1 equi-joins, one count
    * per doc.
    */
  def phraseMatches(postings: DataFrame, qtoks: Seq[String]): DataFrame = {
    val slots = qtoks.zipWithIndex.map { case (t, i) =>
      postings.filter(col("token") === t)
        .select(col("doc_id"), (col("pos") - i).as("base"))
    }
    slots.reduce(_.join(_, Seq("doc_id", "base")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_matches"))
  }
}
