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
    Seq(nBuckets).toDF("n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  final case class Index(spark: SparkSession, dir: String, nBuckets: Int) {

    /** The pruned posting read for a token set: bucket ids computed
      * through Catalyst's own murmur3 (a LocalTableScan job — no file
      * read), then a literal `tbucket IN (...)` partition filter.
      */
    private[operators] def postingsFor(tokens: Seq[String]): DataFrame = {
      import spark.implicits._
      val buckets = tokens.distinct.toDF("token")
        .select(pmod(hash(col("token")), lit(nBuckets)).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      spark.read.parquet(s"$dir/postings")
        .filter(col("tbucket").isin(buckets: _*))
        .filter(col("token").isin(tokens.distinct: _*))
    }

    /** Documents containing `phrase` verbatim, with occurrence counts. */
    def searchPhrase(phrase: String): DataFrame = {
      val qtoks = phrase.split(" ").filter(_.nonEmpty).toSeq
      require(qtoks.nonEmpty, "empty phrase")
      InvertedIndex.phraseMatches(postingsFor(qtoks), qtoks)
    }
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
