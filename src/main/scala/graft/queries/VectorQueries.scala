package graft.queries

import graft.Tables
import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity + multimodal plumbing surface. All similarity math is
  * fixed-point quantized (Similarity scaladoc) so results are exact,
  * engine-portable, and stable under re-partitioning — which is what makes a
  * full DuckDB oracle possible even for ANN.
  */
object VectorQueries {

  private def q(name: String, sql: String)(f: (SparkSession, String) => DataFrame) =
    Q(name, f, Some(sql))

  /** DuckDB twins of Similarity.quantize / norms over a source relation. */
  private def quantSqlFrom(src: String) =
    s"""q AS (SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1024) AS BIGINT) for x in embedding] AS qv
       |  FROM $src),
       |n AS (SELECT vec_id, qv, CAST(list_sum([x*x for x in qv]) AS BIGINT) AS n2 FROM q)""".stripMargin
  private val quantSql = quantSqlFrom("embeddings")

  /** DuckDB twin of the multi-table LSH banding over the `n` CTE. */
  private def bandedSql(planes: Int) =
    s"""banded AS (SELECT vec_id, t,
       |  CAST(list_sum([ CASE WHEN CAST(list_sum([ qv[i+1] *
       |      (CASE WHEN (strpos('0123456789abcdef',
       |         substr(md5(CAST($planes*t+j AS VARCHAR)||'_'||CAST(i AS VARCHAR)),1,1))-1) % 2 = 0
       |        THEN 1 ELSE -1 END)
       |      for i in generate_series(0, len(qv)-1) ]) AS BIGINT) >= 0
       |    THEN CAST(1 AS BIGINT) << j ELSE CAST(0 AS BIGINT) END
       |    for j in generate_series(0, ${planes - 1}) ]) AS BIGINT) AS bucket
       |  FROM n, generate_series(0, 3) g(t))""".stripMargin

  val defs: Seq[Q] = Seq(
    // --- brute-force quantized-cosine top-k (exactness baseline) --------------
    q("vec01_knn_brute",
      s"""WITH $quantSql,
         |scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id)
         |SELECT * FROM (SELECT probe_id, neighbor_id, sim,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored) t WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.knnBrute(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5)
    },

    // --- per-label centroids (vector aggregation via quantized sums) ----------
    q("vec02_label_centroids",
      """WITH ex AS (SELECT label, unnest(embedding) AS x,
        |  unnest(generate_series(1, len(embedding))) AS i FROM embeddings)
        |SELECT label, CAST(i - 1 AS INT) AS dim,
        |  CAST(SUM(CAST(floor(CAST(x AS DOUBLE)*1024) AS BIGINT)) AS DOUBLE)/COUNT(*) AS mean_q,
        |  COUNT(*) AS n
        |FROM ex GROUP BY label, i""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(Similarity.quantize(col("embedding"))))
        .groupBy(col("label"), col("pos").as("dim"))
        .agg((sum(col("col")).cast("double") / count(lit(1))).as("mean_q"),
          count(lit(1)).as("n"))
        .select(col("label"), col("dim"), col("mean_q"), col("n"))
    },

    // --- LSH-bucketed ANN (the scale path: bucket join + in-bucket rerank) ----
    q("vec03_ann_lsh",
      s"""WITH $quantSql,
         |${bandedSql(4)},
         |cand AS (SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id
         |  FROM banded p JOIN banded c ON p.t = c.t AND p.bucket = c.bucket
         |  WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         |scored AS (SELECT probe_id, neighbor_id,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM cand JOIN n p ON cand.probe_id = p.vec_id
         |            JOIN n c ON cand.neighbor_id = c.vec_id)
         |SELECT * FROM (SELECT probe_id, neighbor_id, sim,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored) t WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.annLsh(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3)
    },

    // --- embedding-cosine near-duplicate pairs (vector-space dedup mode) ------
    q("vec04_embedding_dedup",
      s"""WITH vcorpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id % 10 = 0),
         |${quantSqlFrom("vcorpus")},
         |${bandedSql(8)},
         |pairs AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         |  FROM banded x JOIN banded y ON x.t = y.t AND x.bucket = y.bucket
         |  WHERE x.vec_id < y.vec_id)
         |SELECT a, b,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |FROM pairs JOIN n p ON pairs.a = p.vec_id JOIN n c ON pairs.b = c.vec_id
         |WHERE CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) >= 0.999""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val vcorpus = emb.unionByName(
        emb.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      Similarity.nearDupPairs(vcorpus, "vec_id", "embedding", threshold = 0.999)
    },

    // --- IVF-Flat ANN (inverted-file alternative to LSH; k-means coarse
    // --- quantizer is iterative → not SQL-expressible, rows-only check) -------
    Q("vec05_ann_ivf", (s, d) => {
      val emb = Tables.embeddings(s, d)
      graft.operators.IvfIndex.search(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3, nLists = 16, nProbe = 4)
    }, None),

    // --- multimodal: opaque binary column + batched executor-side decode ------
    q("mm01_media_meta",
      """WITH raw AS (SELECT doc_id, source AS format, CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(list_sum(list_transform(regexp_split_to_array(text,''),
        |    x -> CAST(unicode(x) AS BIGINT))) AS BIGINT) % 2147483647 AS checksum
        |  FROM documents)
        |SELECT doc_id, format, n_bytes, checksum,
        |  CAST(n_bytes % 64 + 1 AS INT) AS width,
        |  CAST(checksum % 64 + 1 AS INT) AS height
        |FROM raw""".stripMargin) { (s, d) =>
      Multimodal.decodeBatched(
        Multimodal.withBlob(Tables.documents(s, d), "text", "source")).toDF()
    }
  )
}
