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

  /** DuckDB twin of Similarity.mmrTopK: brute top-`nCand` candidates per
    * probe, pairwise candidate similarities, then the greedy MMR loop as
    * k−1 unrolled CTE stages over an accumulating selected set.
    */
  private def mmrSql(nProbes: Int, nCand: Int, k: Int): String = {
    def dotSql(a: String, b: String) =
      s"CAST(list_sum([$a[i]*$b[i] for i in generate_series(1, len($a))]) AS BIGINT)"
    def cosSql(a: String, b: String, n2a: String, n2b: String) =
      s"CAST(${dotSql(a, b)} AS DOUBLE)/(sqrt(CAST($n2a AS DOUBLE))*sqrt(CAST($n2b AS DOUBLE)))"
    val stages = (2 to k).map { t =>
      s"""pick$t AS (SELECT r.probe_id, r.cand_id,
         |  0.5*r.rel - 0.5*MAX(p.s) AS score
         |  FROM cand r JOIN acc${t - 1} sl ON sl.probe_id = r.probe_id
         |  JOIN pair p ON p.probe_id = r.probe_id AND p.i = r.cand_id
         |    AND p.j = sl.cand_id
         |  WHERE NOT EXISTS (SELECT 1 FROM acc${t - 1} x
         |    WHERE x.probe_id = r.probe_id AND x.cand_id = r.cand_id)
         |  GROUP BY r.probe_id, r.cand_id, r.rel),
         |sel$t AS (SELECT probe_id, $t AS rank, cand_id, score FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |    ORDER BY score DESC, cand_id) AS rn FROM pick$t) WHERE rn = 1),
         |acc$t AS (SELECT * FROM acc${t - 1} UNION ALL SELECT * FROM sel$t)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $quantSql,
       |scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
       |  ${cosSql("p.qv", "c.qv", "p.n2", "c.n2")} AS rel
       |  FROM n p, n c WHERE p.vec_id < $nProbes AND c.vec_id <> p.vec_id),
       |cand AS (SELECT probe_id, cand_id, rel FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
       |    ORDER BY rel DESC, cand_id) AS rnk FROM scored) WHERE rnk <= $nCand),
       |pair AS (SELECT a.probe_id, a.cand_id AS i, b.cand_id AS j,
       |  ${cosSql("na.qv", "nb.qv", "na.n2", "nb.n2")} AS s
       |  FROM cand a JOIN cand b
       |    ON a.probe_id = b.probe_id AND a.cand_id <> b.cand_id
       |  JOIN n na ON na.vec_id = a.cand_id
       |  JOIN n nb ON nb.vec_id = b.cand_id),
       |sel1 AS (SELECT probe_id, 1 AS rank, cand_id, 0.5*rel AS score FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
       |    ORDER BY rel DESC, cand_id) AS rn FROM cand) WHERE rn = 1),
       |acc1 AS (SELECT * FROM sel1),
       |$stages
       |SELECT probe_id, rank, cand_id, score FROM acc$k""".stripMargin
  }

  /** DuckDB twin of IvfIndex.l2Q: exact integer squared-L2 of two lists. */
  private def l2Sql(v: String, c: String) =
    s"CAST(list_sum([($v[i]-$c[i])*($v[i]-$c[i]) for i in generate_series(1, len($v))]) AS BIGINT)"

  /** One unrolled Lloyd iteration (DuckDB twin of IvfIndex.train's loop body):
    * assign every corpus vector to its nearest `prev` centroid (ties → lowest
    * cell), integral per-dimension means (`//` ≡ Spark `div`: both truncate
    * toward zero), and empty cells keep the previous centroid.
    */
  private def lloydSql(k: Int, prev: String, src: String = "q",
      sfx: String = ""): String =
    s"""a$k$sfx AS (SELECT vec_id, qv, cell FROM (
       |  SELECT $src.vec_id, $src.qv, $prev.cell,
       |    ROW_NUMBER() OVER (PARTITION BY $src.vec_id
       |      ORDER BY ${l2Sql(s"$src.qv", s"$prev.cv")}, $prev.cell) AS rn
       |  FROM $src, $prev) t WHERE rn = 1),
       |m$k$sfx AS (SELECT cell, i, CAST(SUM(x) // COUNT(*) AS BIGINT) AS m FROM (
       |  SELECT cell, unnest(qv) AS x, unnest(generate_series(1, len(qv))) AS i
       |  FROM a$k$sfx) e GROUP BY cell, i),
       |v$k$sfx AS (SELECT cell, list(m ORDER BY i) AS mv FROM m$k$sfx GROUP BY cell),
       |c$k$sfx AS (SELECT p.cell, COALESCE(v.mv, p.cv) AS cv
       |  FROM $prev p LEFT JOIN v$k$sfx v ON p.cell = v.cell)""".stripMargin

  /** DuckDB twin of IvfIndex.assign — nearest `c2` centroid per `src`
    * vector via ROW_NUMBER over exact integer L2, ties → lowest cell (the
    * subtle determinism contract, defined ONCE for the idx/pc CTEs of the
    * ANN oracles and vec09's asg).
    */
  private def assignSql(cte: String, outId: String, src: String,
      where: String = "", rnBound: String = "rn = 1"): String =
    s"""$cte AS (SELECT vec_id AS $outId, cell FROM (
       |  SELECT $src.vec_id, c2.cell,
       |    ROW_NUMBER() OVER (PARTITION BY $src.vec_id
       |      ORDER BY ${l2Sql(s"$src.qv", "c2.cv")}, c2.cell) AS rn
       |  FROM $src, c2$where) t WHERE $rnBound)""".stripMargin

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

  /** Oracle for IVF-Flat ANN (vec05/vec06): seeds → two unrolled Lloyd
    * iterations → assignment → probe-cell pruning → in-cell rerank. Shared
    * verbatim by the train-inline path and the save/load round-trip path —
    * the quantization is integral end-to-end, so a persisted index must
    * reproduce the in-memory results bit-for-bit.
    */
  private lazy val ivfSql: String = ivfSqlOn(trainSrc = "q")

  /** The same oracle with training restricted to `trainSrc` while the FULL
    * corpus is assigned and searched — the incremental-append path (vec07):
    * centroids frozen from the base build, appended vectors assigned to
    * their nearest existing cell.
    */
  private def ivfSqlOn(trainSrc: String, idxWhere: String = ""): String =
    s"""WITH $quantSql,
       |qe AS (SELECT vec_id, qv FROM q WHERE vec_id % 2 = 0),
       |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
       |  FROM (SELECT vec_id, qv FROM $trainSrc ORDER BY vec_id LIMIT 16) s),
       |${lloydSql(1, "c0", trainSrc)},
       |${lloydSql(2, "c1", trainSrc)},
       |${assignSql("idx", "neighbor_id", "q", idxWhere)},
       |${assignSql("pc", "probe_id", "n", " WHERE n.vec_id < 10", "rn <= 4")},
       |scored AS (SELECT pc.probe_id, idx.neighbor_id,
       |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
       |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
       |  FROM pc JOIN idx ON pc.cell = idx.cell
       |  JOIN n p ON p.vec_id = pc.probe_id
       |  JOIN n c ON c.vec_id = idx.neighbor_id
       |  WHERE idx.neighbor_id <> pc.probe_id)
       |SELECT * FROM (SELECT probe_id, neighbor_id, sim,
       |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored) t WHERE rank <= 3""".stripMargin

  /** Oracle for PQ-ADC ANN (vec10): per-subspace slices → one unrolled Lloyd
    * codebook PER SUBSPACE (the same two iterations as vec05, suffixed CTE
    * names) → per-subspace code assignment → probe ADC distance tables →
    * code-join ADC scan → exact-cosine rerank of the top candidates. Every
    * intermediate is exact integer math, so the whole compressed-search
    * pipeline hash-matches.
    */
  /** With `nLists > 0` the oracle adds vec12's coarse IVF stage: one more
    * unrolled Lloyd chain (suffix `_cg`) over the FULL unit-sphere vectors,
    * per-vector cell assignment, the probe's `nProbe` nearest cells, and the
    * ADC scan restricted to (probe, neighbor) pairs sharing a probed cell.
    */
  private def pqSql(m: Int, dsub: Int, kCode: Int, rerankN: Int,
      kOut: Int, nLists: Int = 0, nProbe: Int = 0): String = {
    // spherical PQ: renormalize to radius 1024 before slicing (PqIndex
    // .subVectors) — n2 is exact-integer, sqrt/divide are exactly-rounded
    // IEEE on integer inputs, floor re-integrizes ⇒ engine-portable
    val qn =
      s"""qn AS (SELECT vec_id, [CASE WHEN n2 = 0 THEN CAST(0 AS BIGINT)
         |  ELSE CAST(floor(CAST(x*1024 AS DOUBLE)/sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) END
         |  for x in qv] AS qv FROM n)""".stripMargin
    val subs = (0 until m).map { s =>
      s"sub$s AS (SELECT vec_id, qv[${s * dsub + 1}:${(s + 1) * dsub}] AS qv FROM qn)"
    }
    val books = (0 until m).map { s =>
      s"""c0_$s AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM sub$s ORDER BY vec_id LIMIT $kCode) t),
         |${lloydSql(1, s"c0_$s", s"sub$s", s"_$s")},
         |${lloydSql(2, s"c1_$s", s"sub$s", s"_$s")}""".stripMargin
    }
    val codes = (0 until m).map { s =>
      s"""code$s AS (SELECT vec_id, cell AS code FROM (
         |  SELECT sub$s.vec_id, c2_$s.cell,
         |    ROW_NUMBER() OVER (PARTITION BY sub$s.vec_id
         |      ORDER BY ${l2Sql(s"sub$s.qv", s"c2_$s.cv")}, c2_$s.cell) AS rn
         |  FROM sub$s, c2_$s) t WHERE rn = 1)""".stripMargin
    }
    val dts = (0 until m).map { s =>
      s"""dt$s AS (SELECT p.vec_id AS probe_id, c.cell, ${l2Sql("p.qv", "c.cv")} AS d2
         |  FROM sub$s p, c2_$s c WHERE p.vec_id < 10)""".stripMargin
    }
    val codeU = (0 until m).map(s => s"SELECT vec_id, $s AS s, code FROM code$s")
      .mkString("\n  UNION ALL ")
    val dtU = (0 until m).map(s => s"SELECT probe_id, $s AS s, cell, d2 FROM dt$s")
      .mkString("\n  UNION ALL ")
    val coarse = if (nLists == 0) "" else
      s"""cg0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM qn ORDER BY vec_id LIMIT $nLists) t),
         |${lloydSql(1, "cg0", "qn", "_cg")},
         |${lloydSql(2, "c1_cg", "qn", "_cg")},
         |cellasg AS (SELECT vec_id, cell FROM (
         |  SELECT qn.vec_id, c2_cg.cell,
         |    ROW_NUMBER() OVER (PARTITION BY qn.vec_id
         |      ORDER BY ${l2Sql("qn.qv", "c2_cg.cv")}, c2_cg.cell) AS rn
         |  FROM qn, c2_cg) t WHERE rn = 1),
         |pcells AS (SELECT probe_id, cell FROM (
         |  SELECT qn.vec_id AS probe_id, c2_cg.cell,
         |    ROW_NUMBER() OVER (PARTITION BY qn.vec_id
         |      ORDER BY ${l2Sql("qn.qv", "c2_cg.cv")}, c2_cg.cell) AS rn
         |  FROM qn, c2_cg WHERE qn.vec_id < 10) t WHERE rn <= $nProbe),
         |cand0 AS (SELECT p.probe_id, a.vec_id AS neighbor_id
         |  FROM pcells p JOIN cellasg a ON p.cell = a.cell
         |  WHERE a.vec_id <> p.probe_id),
         |""".stripMargin
    val adcTail = if (nLists == 0)
      "WHERE d.probe_id <> e.vec_id GROUP BY 1, 2"
    else
      """JOIN cand0 ON cand0.probe_id = d.probe_id AND cand0.neighbor_id = e.vec_id
        |  GROUP BY 1, 2""".stripMargin
    s"""WITH $quantSql,
       |$qn,
       |${subs.mkString(",\n")},
       |${books.mkString(",\n")},
       |${codes.mkString(",\n")},
       |${dts.mkString(",\n")},
       |${coarse}adc AS (SELECT d.probe_id, e.vec_id AS neighbor_id, SUM(d.d2) AS adc_d2
       |  FROM ($codeU) e JOIN ($dtU) d ON e.s = d.s AND e.code = d.cell
       |  $adcTail),
       |cand AS (SELECT probe_id, neighbor_id FROM (
       |  SELECT probe_id, neighbor_id,
       |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adc_d2, neighbor_id) AS crn
       |  FROM adc) t WHERE crn <= $rerankN),
       |scored AS (SELECT cand.probe_id, cand.neighbor_id,
       |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
       |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
       |  FROM cand JOIN n p ON cand.probe_id = p.vec_id
       |            JOIN n c ON cand.neighbor_id = c.vec_id)
       |SELECT * FROM (SELECT probe_id, neighbor_id, sim,
       |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM scored) t WHERE rank <= $kOut""".stripMargin
  }

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

    // --- probe-workload cell coverage (vec35): which IVF cells a probe
    // --- workload actually touches (nProbe=4 per probe) and how hot each
    // --- is — the cache/tiering planner's input (cold cells can live on
    // --- object storage; hot ones pin in memory). Probes = the vec05
    // --- workload; one broadcast assignment + one count per cell, empty
    // --- cells kept at zero. ----------------------------------------------
    q("vec35_probe_coverage",
      s"""WITH $quantSql,
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |${assignSql("pc", "probe_id", "n", " WHERE n.vec_id < 10", "rn <= 4")},
         |pcnt AS (SELECT cell, COUNT(*) AS n_probes FROM pc GROUP BY 1)
         |SELECT c2.cell, COALESCE(pcnt.n_probes, CAST(0 AS BIGINT)) AS n_probes,
         |  COALESCE(pcnt.n_probes, 0) > 0 AS touched
         |FROM c2 LEFT JOIN pcnt ON c2.cell = pcnt.cell""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val idx = graft.operators.IvfIndex.build(emb, "vec_id", "embedding",
        nLists = 16, iters = 2)
      val probes = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("id"),
          graft.operators.Similarity.quantize(col("embedding")).as("qv"))
      // nearest-4 cells per probe against the broadcast centroids — the
      // same probe-assignment shape the search path uses
      import org.apache.spark.sql.expressions.Window
      val pc = probes.crossJoin(broadcast(idx.centroids))
        .select(col("id"), col("cell"),
          graft.operators.IvfIndex.l2Q(col("qv"), col("cv")).as("d2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("d2"), col("cell"))))
        .filter(col("rn") <= 4)
      val pcnt = pc.groupBy(col("cell")).agg(count(lit(1)).as("n_probes"))
      idx.centroids.select(col("cell"))
        .join(pcnt, Seq("cell"), "left")
        .select(col("cell"),
          coalesce(col("n_probes"), lit(0L)).as("n_probes"),
          (coalesce(col("n_probes"), lit(0L)) > 0).as("touched"))
    },

    // --- embedding outlier audit (vec34): vectors whose distance to their
    // --- own centroid exceeds 4× the cell's median distance — the
    // --- anomalous-embedding detector (corrupt rows, wrong-model vectors)
    // --- that per-dimension stats (vec26) and norms (vec32) both miss.
    // --- Rides the stored IVF assignment; per-cell medians via the
    // --- portable interpolated percentile; output per cell. --------------
    q("vec34_outlier_audit",
      s"""WITH $quantSql,
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |${assignSql("idx", "neighbor_id", "q")},
         |dd AS (SELECT idx.cell, ${l2Sql("q.qv", "c2.cv")} AS d2
         |  FROM idx JOIN q ON q.vec_id = idx.neighbor_id
         |  JOIN c2 ON c2.cell = idx.cell),
         |md AS (SELECT cell, quantile_cont(d2, 0.5) AS med FROM dd GROUP BY 1)
         |SELECT dd.cell, COUNT(*) AS n_vectors,
         |  CAST(SUM(CASE WHEN dd.d2 > 4*md.med THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_outliers
         |FROM dd JOIN md ON dd.cell = md.cell GROUP BY 1""".stripMargin) { (s, d) =>
      val idx = graft.operators.IvfIndex.build(
        Tables.embeddings(s, d), "vec_id", "embedding", nLists = 16, iters = 2)
      val dd = idx.assigned.join(broadcast(idx.centroids), Seq("cell"))
        .select(col("cell"),
          graft.operators.IvfIndex.l2Q(col("cq"), col("cv")).as("d2"))
      val md = dd.groupBy(col("cell"))
        .agg(expr("percentile(d2, 0.5)").as("med"))
      dd.join(broadcast(md), Seq("cell"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("d2") > lit(4) * col("med"), 1L).otherwise(0L))
            .as("n_outliers"))
    },

    // --- metric-agreement diagnostic (vec33): per probe, how many of the
    // --- exact cosine top-3 survive under squared-L2 ranking — the
    // --- metric-choice sanity check (for normalized embeddings the two
    // --- agree; a low overlap means magnitude carries signal and cosine
    // --- silently discards it). Both rankings exact integers / integer
    // --- ratios; overlap via one pair join. -------------------------------
    q("vec33_metric_agreement",
      s"""WITH $quantSql,
         |cos AS (SELECT probe_id, neighbor_id FROM (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |      CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) DESC,
         |      c.vec_id) AS rk
         |  FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id) t
         |  WHERE rk <= 3),
         |l2 AS (SELECT probe_id, neighbor_id FROM (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
         |      CAST(list_sum([(p.qv[i]-c.qv[i])*(p.qv[i]-c.qv[i])
         |        for i in generate_series(1, 64)]) AS BIGINT), c.vec_id) AS rk
         |  FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id) t
         |  WHERE rk <= 3)
         |SELECT cos.probe_id, CAST(COUNT(l2.neighbor_id) AS BIGINT) AS n_shared
         |FROM cos LEFT JOIN l2 ON cos.probe_id = l2.probe_id
         |  AND cos.neighbor_id = l2.neighbor_id
         |GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val q = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qv"))
      val probes = q.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("qv").as("pq"))
      // corpus streamed / probes broadcast — the knnBrute build-side rule:
      // unhinted, the planner may broadcast the data-proportional CORPUS
      // and serialize the pair loop onto the 10-row probe side's layout
      // (the vec39 1000× inversion). Pin parallelism to the corpus.
      val pairs = q.select(col("vec_id").as("neighbor_id"), col("qv"))
        .crossJoin(broadcast(probes))
        .filter(col("neighbor_id") =!= col("probe_id"))
      val cosTop = pairs
        .select(col("probe_id"), col("neighbor_id"),
          Similarity.cosineQ(col("pq"), col("qv")).as("sim"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("probe_id"))
          .orderBy(col("sim").desc, col("neighbor_id"))))
        .filter(col("rk") <= 3).select("probe_id", "neighbor_id")
      val l2Top = pairs
        .select(col("probe_id"), col("neighbor_id"),
          aggregate(zip_with(col("pq"), col("qv"), (x, y) => (x - y) * (x - y)),
            lit(0L), (a, x) => a + x).as("d2"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("probe_id"))
          .orderBy(col("d2"), col("neighbor_id"))))
        .filter(col("rk") <= 3)
        // alias BOTH join columns: l2Top descends from the same `pairs`
        // plan as cosTop, so an unaliased probe_id carries the identical
        // attribute id and the join condition logs the trivially-true
        // warning (bench-linted to stay at zero)
        .select(col("probe_id").as("_p2"), col("neighbor_id").as("_n2"))
      cosTop.join(l2Top,
          col("probe_id") === col("_p2") && col("neighbor_id") === col("_n2"),
          "left")
        .groupBy(col("probe_id"))
        .agg(count(col("_n2")).as("n_shared"))
    },

    // --- norm-distribution report (vec32): deciles of the exact quantized
    // --- squared norm + zero/extreme counts — the embedding-QA gate that
    // --- catches all-zero vectors (cosine-undefined) and magnitude
    // --- outliers (an unnormalized batch slipped in) before they poison
    // --- similarity math. One projection + one percentile aggregation
    // --- (q30's portable interpolated quantile). --------------------------
    q("vec32_norm_report",
      """WITH n2 AS (SELECT CAST(list_sum([
        |    CAST(floor(CAST(x AS DOUBLE)*1024) AS BIGINT)
        |    * CAST(floor(CAST(x AS DOUBLE)*1024) AS BIGINT)
        |    for x in embedding]) AS BIGINT) AS n2 FROM embeddings)
        |SELECT COUNT(*) AS n_vectors,
        |  CAST(SUM(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(MIN(n2) AS BIGINT) AS min_n2, CAST(MAX(n2) AS BIGINT) AS max_n2,
        |  quantile_cont(n2, 0.1) AS p10, quantile_cont(n2, 0.5) AS p50,
        |  quantile_cont(n2, 0.9) AS p90
        |FROM n2""".stripMargin) { (s, d) =>
      val n2 = Tables.embeddings(s, d)
        .select(Similarity.dotQ(Similarity.quantize(col("embedding")),
          Similarity.quantize(col("embedding"))).as("n2"))
      n2.agg(count(lit(1)).as("n_vectors"),
        sum(when(col("n2") === 0, 1L).otherwise(0L)).as("n_zero"),
        min(col("n2")).as("min_n2"), max(col("n2")).as("max_n2"),
        expr("percentile(n2, 0.1)").as("p10"),
        expr("percentile(n2, 0.5)").as("p50"),
        expr("percentile(n2, 0.9)").as("p90"))
    },

    // --- inter-class separation (vec31): pairwise cosine between LABEL
    // --- centroids (integral per-dim means — the IvfIndex `div` mean
    // --- discipline, engine-exact) — how separable the labeled embedding
    // --- space is before anyone trains a classifier on it; near-parallel
    // --- class centroids predict confusion. O(labels²) pairs over a tiny
    // --- centroid relation. ----------------------------------------------
    q("vec31_class_separation",
      """WITH ex AS (SELECT label,
        |  CAST(floor(CAST(x AS DOUBLE)*1024) AS BIGINT) AS qx, i
        |  FROM (SELECT label, unnest(embedding) AS x,
        |    unnest(generate_series(1, len(embedding))) AS i FROM embeddings) z),
        |m AS (SELECT label, i, CAST(SUM(qx) // COUNT(*) AS BIGINT) AS m
        |  FROM ex GROUP BY 1, 2),
        |cv AS (SELECT label, list(m ORDER BY i) AS cv FROM m GROUP BY 1)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  CAST(CAST(list_sum([a.cv[i]*b.cv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE)
        |  / (sqrt(CAST(CAST(list_sum([a.cv[i]*a.cv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE))
        |     * sqrt(CAST(CAST(list_sum([b.cv[i]*b.cv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE)))
        |    AS centroid_cosine
        |FROM cv a JOIN cv b ON a.label < b.label""".stripMargin) { (s, d) =>
      val cent = Tables.embeddings(s, d)
        .select(col("label"), posexplode(Similarity.quantize(col("embedding"))))
        .groupBy(col("label"), col("pos"))
        .agg(expr("sum(col) div count(*)").as("m"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("_p"))
        .select(col("label"), expr("transform(_p, x -> x.m)").as("cv"))
      cent.alias("a").join(cent.alias("b"), col("a.label") < col("b.label"))
        .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
          Similarity.cosineQ(col("a.cv"), col("b.cv")).as("centroid_cosine"))
    },

    // --- vector-arithmetic analogy retrieval (vec30): the word2vec query
    // --- shape — probe = v_a + v_b − v_c (exact integer arithmetic on the
    // --- quantized vectors), nearest neighbors by cosine excluding the
    // --- triple's own members. Composition point: the combined probe
    // --- feeds ANY of the index searches at scale; the gate pins the
    // --- arithmetic + exclusion + rank semantics against brute force. ----
    q("vec30_analogy",
      s"""WITH $quantSql,
         |tr(a, b, c) AS (VALUES (0, 1, 2), (3, 4, 5), (6, 7, 8)),
         |combo AS (SELECT tr.a, tr.b, tr.c,
         |  [qa.qv[i] + qb.qv[i] - qc.qv[i] for i in generate_series(1, 64)] AS cv
         |  FROM tr JOIN q qa ON qa.vec_id = tr.a
         |  JOIN q qb ON qb.vec_id = tr.b JOIN q qc ON qc.vec_id = tr.c),
         |scored AS (SELECT combo.a AS probe_a, n.vec_id AS neighbor_id,
         |  CAST(CAST(list_sum([cv[i]*n.qv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(CAST(list_sum([cv[i]*cv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE))
         |       * sqrt(CAST(n.n2 AS DOUBLE))) AS sim
         |  FROM combo CROSS JOIN n
         |  WHERE n.vec_id NOT IN (combo.a, combo.b, combo.c))
         |SELECT probe_a, neighbor_id, sim, rank FROM (
         |  SELECT probe_a, neighbor_id, sim, ROW_NUMBER() OVER (
         |    PARTITION BY probe_a ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored) t WHERE rank <= 3""".stripMargin) { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val q = Tables.embeddings(s, d)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      val tr = Seq((0L, 1L, 2L), (3L, 4L, 5L), (6L, 7L, 8L)).toDF("a", "b", "c")
      val combo = tr
        .join(q.select(col("vec_id").as("a"), col("qv").as("_qa")), Seq("a"))
        .join(q.select(col("vec_id").as("b"), col("qv").as("_qb")), Seq("b"))
        .join(q.select(col("vec_id").as("c"), col("qv").as("_qc")), Seq("c"))
        .select(col("a"), col("b"), col("c"),
          zip_with(zip_with(col("_qa"), col("_qb"), (x, y) => x + y),
            col("_qc"), (x, y) => x - y).as("cv"))
      // corpus streamed / 3-row combo broadcast (the vec39 build-side rule)
      val scored = q.select(col("vec_id").as("neighbor_id"), col("qv"))
        .crossJoin(broadcast(combo))
        .filter(col("neighbor_id") =!= col("a") &&
          col("neighbor_id") =!= col("b") && col("neighbor_id") =!= col("c"))
        .select(col("a").as("probe_a"), col("neighbor_id"),
          Similarity.cosineQ(col("cv"), col("qv")).as("sim"))
      scored.withColumn("rank", row_number().over(
          Window.partitionBy(col("probe_a"))
            .orderBy(col("sim").desc, col("neighbor_id"))))
        .filter(col("rank") <= 3)
    },

    // --- multi-probe LSH (vec29): recall recovery WITHOUT more tables —
    // --- each probe also checks the buckets one hyperplane-bit away from
    // --- its own (the neighbors a borderline vector most likely fell
    // --- into); candidates ≈ (1+planes)× single-probe from the SAME
    // --- index, the trade running query-side instead of multiplying the
    // --- stored corpus rows. Exact-cosine rerank; deterministic. ---------
    q("vec29_ann_multiprobe",
      s"""WITH $quantSql,
         |${bandedSql(4)},
         |pp AS (SELECT DISTINCT vec_id, t, xor(bucket, f.f) AS bucket
         |  FROM banded, (SELECT unnest([0, 1, 2, 4, 8]) AS f) f
         |  WHERE vec_id < 10),
         |cand AS (SELECT DISTINCT pp.vec_id AS probe_id, c.vec_id AS neighbor_id
         |  FROM pp JOIN banded c ON pp.t = c.t AND pp.bucket = c.bucket
         |  WHERE c.vec_id <> pp.vec_id),
         |scored AS (SELECT probe_id, neighbor_id,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM cand JOIN n p ON cand.probe_id = p.vec_id
         |            JOIN n c ON cand.neighbor_id = c.vec_id)
         |SELECT * FROM (SELECT probe_id, neighbor_id, sim,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored) t WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.annLshMultiProbe(emb.filter(col("vec_id") < 10), emb,
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

    // --- IVF-Flat ANN (inverted-file alternative to LSH). The k-means coarse
    // --- quantizer is deterministic integer math with iters=2, so the two
    // --- Lloyd iterations unroll as SQL CTEs → full hash-match oracle ---------
    q("vec05_ann_ivf", ivfSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.IvfIndex.search(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3, nLists = 16, nProbe = 4)
    },

    // --- IVF with a PERSISTED index: build → save (parquet, cell-partitioned)
    // --- → load → search, against the SAME oracle as vec05 — train-once-
    // --- search-many is the operator's 100 TB story, and the integral
    // --- quantization makes the round-trip bit-exact, so the persisted path
    // --- must hash-match the in-memory one -----------------------------------
    q("vec06_ann_ivf_index", ivfSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      // deterministic per-sfDir location, overwritten on each run — a fresh
      // temp dir per invocation would leak a corpus-sized copy every time
      // the gate/bench re-runs this query
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_ivf_idx_" + Integer.toHexString(d.hashCode)).getPath
      graft.operators.IvfIndex.build(emb, "vec_id", "embedding",
        nLists = 16, iters = 2).save(dir)
      val loaded = graft.operators.IvfIndex.load(s, dir)
      graft.operators.IvfIndex.searchIndex(emb.filter(col("vec_id") < 10), loaded,
        "vec_id", "embedding", k = 3, nProbe = 4)
    },

    // --- IVF incremental append: build on HALF the corpus (even vec_ids),
    // --- append the other half WITHOUT retraining — centroids frozen, the
    // --- new batch pays one broadcast-assign, existing cells untouched.
    // --- Oracle: same unrolled-Lloyd SQL trained on the even half only,
    // --- full corpus assigned to the frozen centroids. The 100 TB ingest
    // --- path: Lloyd runs once ever; each arriving batch O(batch·nLists). ----
    q("vec07_ann_ivf_append", ivfSqlOn(trainSrc = "qe")) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val base = graft.operators.IvfIndex.build(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nLists = 16, iters = 2)
      val appended = graft.operators.IvfIndex.append(
        base, emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
      graft.operators.IvfIndex.searchIndex(emb.filter(col("vec_id") < 10), appended,
        "vec_id", "embedding", k = 3, nProbe = 4)
    },

    // --- IVF index DELETE (vec14): the maintenance mirror of vec07's append —
    // --- centroids frozen, dropped ids anti-joined out of the assignment
    // --- (never the full vectors), search then sees only survivors. The
    // --- oracle trains on the FULL corpus but restricts the assignment to
    // --- the remaining ids — per-vector assignment is independent, so
    // --- remove ≡ assign-only-survivors exactly. --------------------------
    q("vec14_ann_ivf_remove",
      ivfSqlOn(trainSrc = "q", idxWhere = " WHERE q.vec_id % 3 <> 0")) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val base = graft.operators.IvfIndex.build(
        emb, "vec_id", "embedding", nLists = 16, iters = 2)
      val pruned = graft.operators.IvfIndex.remove(
        base, emb.filter(col("vec_id") % 3 === 0).select("vec_id"), "vec_id")
      graft.operators.IvfIndex.searchIndex(emb.filter(col("vec_id") < 10), pruned,
        "vec_id", "embedding", k = 3, nProbe = 4)
    },

    // --- metadata-FILTERED ANN (vec16): the vector-store "search where
    // --- label = 1" shape — a pre-filter ID selector restricts the index
    // --- view, so top-k is taken among allowed vectors in the probed
    // --- cells (post-filtering a fixed top-k would starve probes whose
    // --- near neighbors are disallowed). Oracle: the same unrolled-Lloyd
    // --- chain with the assignment restricted to label-1 ids — per-vector
    // --- assignment is filter-independent, so index-view filtering ≡
    // --- filtering the corpus before indexing, exactly. -------------------
    q("vec16_ann_filtered",
      ivfSqlOn(trainSrc = "q", idxWhere =
        " WHERE q.vec_id IN (SELECT vec_id FROM embeddings WHERE label = 1)")) {
      (s, d) =>
      val emb = Tables.embeddings(s, d)
      val base = graft.operators.IvfIndex.build(
        emb, "vec_id", "embedding", nLists = 16, iters = 2)
      val view = graft.operators.IvfIndex.filtered(
        base, emb.filter(col("label") === 1).select("vec_id"), "vec_id")
      graft.operators.IvfIndex.searchIndex(emb.filter(col("vec_id") < 10), view,
        "vec_id", "embedding", k = 3, nProbe = 4)
    },

    // --- kNN label prediction (vec18): the weak-supervision step — each
    // --- probe's class predicted by majority vote over its exact top-5
    // --- quantized-cosine neighbors, ties to the smallest label
    // --- (deterministic ⇒ hash-exact). Swap an index search in for the
    // --- 100 TB neighbor set; the vote stays one aggregation per probe. --
    q("vec18_knn_classify",
      s"""WITH $quantSql,
         |scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         |nn AS (SELECT probe_id, neighbor_id FROM (
         |  SELECT probe_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored) t WHERE rank <= 5),
         |votes AS (SELECT nn.probe_id, e.label,
         |    CAST(COUNT(*) AS BIGINT) AS n_votes
         |  FROM nn JOIN embeddings e ON nn.neighbor_id = e.vec_id
         |  GROUP BY 1, 2)
         |SELECT probe_id, label AS predicted, n_votes FROM (
         |  SELECT probe_id, label, n_votes, ROW_NUMBER() OVER (
         |    PARTITION BY probe_id ORDER BY n_votes DESC, label) AS rn
         |  FROM votes) t WHERE rn = 1""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.knnClassify(emb.filter(col("vec_id") < 10), emb,
        emb.select("vec_id", "label"), "vec_id", "embedding", "label", k = 5)
    },

    // --- IVF index health stats (vec17): the monitoring loop of the
    // --- frozen-quantizer trade — per-cell vector counts (empty cells
    // --- included: a centroid attracting nothing is drift too) plus an
    // --- exact-integer overloaded flag (n·nCells > 2·total, no division),
    // --- read after each append wave to decide retraining. Oracle: the
    // --- same unrolled-Lloyd chain, assignment grouped per cell off a
    // --- LEFT join so empties stay. --------------------------------------
    q("vec17_index_stats",
      s"""WITH $quantSql,
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |${assignSql("idx", "neighbor_id", "q")},
         |cnt AS (SELECT c2.cell, CAST(COUNT(idx.neighbor_id) AS BIGINT) AS n_vectors
         |  FROM c2 LEFT JOIN idx ON c2.cell = idx.cell GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS total,
         |  COUNT(*) AS ncells FROM cnt)
         |SELECT cell, n_vectors,
         |  (n_vectors * ncells > 2 * total) AS overloaded
         |FROM cnt, tot""".stripMargin) { (s, d) =>
      graft.operators.IvfIndex.cellStats(graft.operators.IvfIndex.build(
        Tables.embeddings(s, d), "vec_id", "embedding", nLists = 16, iters = 2))
    },

    // --- cluster-quality / inertia report (vec25): per-cell exact-integer
    // --- SSE to the centroid + member count — the k-means objective the
    // --- frozen-quantizer lifecycle watches that counts (vec17) and shares
    // --- (vec22) can't see: a cell keeps its share while its members
    // --- scatter. One pass over the stored assignment against broadcast
    // --- centroids, partial-agg'd; empty cells kept at sse = 0. ------------
    q("vec25_inertia_report",
      s"""WITH $quantSql,
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |${assignSql("idx", "neighbor_id", "q")},
         |sse AS (SELECT idx.cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         |  CAST(SUM(${l2Sql("q.qv", "c2.cv")}) AS BIGINT) AS sse
         |  FROM idx JOIN q ON q.vec_id = idx.neighbor_id
         |  JOIN c2 ON c2.cell = idx.cell GROUP BY 1)
         |SELECT c2.cell, COALESCE(sse.n_vectors, CAST(0 AS BIGINT)) AS n_vectors,
         |  COALESCE(sse.sse, CAST(0 AS BIGINT)) AS sse
         |FROM c2 LEFT JOIN sse ON c2.cell = sse.cell""".stripMargin) { (s, d) =>
      graft.operators.IvfIndex.inertiaReport(graft.operators.IvfIndex.build(
        Tables.embeddings(s, d), "vec_id", "embedding", nLists = 16, iters = 2))
    },

    // --- SemDeDup semantic dedup: coarse k-means cells (the SAME unrolled
    // --- Lloyd as vec05, trained on the PLANTED-COPY union corpus) prune
    // --- the pair space, then within-cell pairwise quantized cosine flags
    // --- duplicates against their smallest-id representative. Planted
    // --- copies share their original's exact vector, so they always share
    // --- its cell and score sim=1 — the gate's guaranteed positives; output
    // --- is all-integer (ids + cell), so the hash compare is exact. ----------
    q("vec09_semantic_dedup",
      s"""WITH vcorpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL SELECT vec_id + 20000, embedding FROM embeddings WHERE vec_id % 7 = 0),
         |${quantSqlFrom("vcorpus")},
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |${assignSql("asg", "vec_id", "q")}
         |SELECT b.vec_id, MIN(a.vec_id) AS dup_of, b.cell
         |FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |JOIN n p ON p.vec_id = a.vec_id JOIN n c ON c.vec_id = b.vec_id
         |WHERE CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) >= 0.999
         |GROUP BY b.vec_id, b.cell""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val vcorpus = emb.unionByName(
        emb.filter(col("vec_id") % 7 === 0)
          .select((col("vec_id") + 20000).as("vec_id"), col("embedding")))
      Similarity.semanticDedup(vcorpus, "vec_id", "embedding",
        threshold = 0.999, nLists = 16, iters = 2)
    },

    // --- scalar-quantized (SQ8) ANN: the memory-compression path — int8-range
    // --- codes (one global corpus scale) score candidates with cheap integer
    // --- dots over data 8× narrower, then ONLY the top-16 candidates fetch
    // --- full-precision vectors for the exact rerank. Integer math + an
    // --- exact-floor division throughout ⇒ the oracle replays it verbatim. ---
    q("vec08_ann_sq8",
      s"""WITH $quantSql,
         |mx AS (SELECT MAX(list_max([abs(x) for x in qv])) AS m FROM q),
         |cc AS (SELECT vec_id,
         |  [CAST(floor(CAST(x*127 AS DOUBLE)/mx.m) AS BIGINT) for x in qv] AS c
         |  FROM q, mx),
         |ad AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |  CAST(list_sum([p.c[i]*c.c[i] for i in generate_series(1, len(p.c))]) AS BIGINT) AS ad
         |  FROM cc p, cc c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         |cand AS (SELECT probe_id, neighbor_id FROM (
         |  SELECT probe_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY ad DESC, neighbor_id) AS rn
         |  FROM ad) t WHERE rn <= 16),
         |scored AS (SELECT cand.probe_id, cand.neighbor_id,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM cand JOIN n p ON cand.probe_id = p.vec_id
         |            JOIN n c ON cand.neighbor_id = c.vec_id)
         |SELECT * FROM (SELECT probe_id, neighbor_id, sim,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored) t WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.annSq8(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3, candidates = 16)
    },

    // --- product-quantized (PQ-ADC) ANN: the compression end-state — 16
    // --- per-subspace Lloyd codebooks (same determinism contract as vec05,
    // --- one unrolled CTE chain per subspace), 16 one-byte codes per vector,
    // --- a broadcast ADC distance-table scan over codes only, exact-cosine
    // --- rerank of the top-32 (recall@3 = 0.93 vs brute force). 16×-smaller
    // --- scan set at 100 TB; everything integer until the final sim ⇒ full
    // --- hash-match oracle. --------------------------------------------------
    q("vec10_ann_pq", pqSql(m = 16, dsub = 4, kCode = 32, rerankN = 32,
      kOut = 3)) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.PqIndex.searchAdc(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3, m = 16, nCodes = 32, iters = 2,
        rerankN = 32, memoKey = Some(d), maxTrainRows = 100000L)
    },

    // --- PQ persisted-index path: build → save (codebooks + codes parquet)
    // --- → load → search via the STORED codes (the corpus's vectors are
    // --- touched only for the rerank rows). Same oracle as vec10 — all
    // --- stored values are exact integers, so the round-trip must reproduce
    // --- the inline-train results bit-for-bit. ------------------------------
    q("vec11_ann_pq_index", pqSql(m = 16, dsub = 4, kCode = 32, rerankN = 32,
      kOut = 3)) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_pq_idx_" + Integer.toHexString(d.hashCode)).getPath
      graft.operators.PqIndex.build(emb, "vec_id", "embedding",
        m = 16, k = 32, iters = 2, memoKey = Some(d),
        maxTrainRows = 100000L).save(dir)
      val loaded = graft.operators.PqIndex.load(s, dir)
      graft.operators.PqIndex.searchIndex(emb.filter(col("vec_id") < 10),
        loaded, emb, "vec_id", "embedding", k = 3, rerankN = 32)
    },

    // --- IVF-PQ composed ANN: the two pruning levers multiplied — a coarse
    // --- 16-cell IVF quantizer (one more unrolled Lloyd chain over the
    // --- unit-sphere vectors) restricts each probe to its 4 nearest cells,
    // --- and within them distances come from PQ codes only. Scan ≈ 25% of
    // --- the codes, recall@3 = 0.90 (0.93 unpruned). FAISS-IVFPQ shape
    // --- without residual encoding ⇒ still exact-integer ⇒ hash-match. -----
    q("vec12_ann_ivf_pq", pqSql(m = 16, dsub = 4, kCode = 32, rerankN = 32,
      kOut = 3, nLists = 16, nProbe = 4)) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.PqIndex.searchIvf(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3, nLists = 16, nProbe = 4,
        m = 16, nCodes = 32, iters = 2, rerankN = 32, memoKey = Some(d),
        maxTrainRows = 100000L)
    },

    // --- IVF-PQ persisted-index path (the FAISS production shape): build
    // --- the full artifact ONCE (coarse quantizer + PQ codebooks + cell-
    // --- partitioned codes), save, load, search — nothing retrains per
    // --- call, the probed-cell filter prunes parquet partitions of the
    // --- stored codes, and ADC reads codes only. Same oracle as vec12:
    // --- every stored value is an exact integer, so the round-trip must
    // --- reproduce the inline-train results bit-for-bit. -------------------
    q("vec15_ann_ivf_pq_index", pqSql(m = 16, dsub = 4, kCode = 32,
      rerankN = 32, kOut = 3, nLists = 16, nProbe = 4)) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val dir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_ivfpq_idx_" + Integer.toHexString(d.hashCode)).getPath
      graft.operators.PqIndex.buildIvf(emb, "vec_id", "embedding",
        nLists = 16, m = 16, nCodes = 32, iters = 2,
        memoKey = Some(d), maxTrainRows = 100000L).save(dir)
      val loaded = graft.operators.PqIndex.loadIvf(s, dir)
      graft.operators.PqIndex.searchIvfIndex(emb.filter(col("vec_id") < 10),
        loaded, emb, "vec_id", "embedding", k = 3, nProbe = 4, rerankN = 32)
    },

    // --- cross-corpus SEMANTIC decontamination: eval vectors whose cosine
    // --- against some training vector reaches τ — the embedding-space analog
    // --- of txt16's LSH text path, catching paraphrased leaks with no shared
    // --- n-gram. The train side is cell-partitioned by the SAME IVF index the
    // --- ANN path persists; each eval vector probes its 3 nearest cells
    // --- (centroids broadcast), so candidates are Σ|probed cell|, never
    // --- |train|·|eval|. Planted: identical copies (sim 1.0, caught) and
    // --- reversed vectors (max sim 0.516 — below τ, clean). ----------------
    q("vec13_semantic_decontaminate",
      s"""WITH $quantSql,
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |${assignSql("asg", "train_id", "q")},
         |ev AS (SELECT vec_id + 30000 AS vec_id, embedding FROM embeddings WHERE vec_id % 7 = 0
         |  UNION ALL SELECT vec_id + 40000, list_reverse(embedding) FROM embeddings WHERE vec_id % 5 = 0),
         |eq AS (SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1024) AS BIGINT) for x in embedding] AS qv
         |  FROM ev),
         |en AS (SELECT vec_id, qv, CAST(list_sum([x*x for x in qv]) AS BIGINT) AS n2 FROM eq),
         |${assignSql("pc", "eval_id", "eq", rnBound = "rn <= 3")}
         |SELECT * FROM (
         |  SELECT pc.eval_id, asg.train_id, CAST(asg.cell AS BIGINT) AS cell,
         |    CAST(CAST(list_sum([t.qv[i]*e.qv[i] for i in generate_series(1, len(t.qv))]) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(t.n2 AS DOUBLE))*sqrt(CAST(e.n2 AS DOUBLE))) AS sim
         |  FROM pc JOIN asg ON pc.cell = asg.cell
         |  JOIN n t ON t.vec_id = asg.train_id
         |  JOIN en e ON e.vec_id = pc.eval_id) z
         |WHERE sim >= 0.999""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      val eval = emb.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 30000).as("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 40000).as("vec_id"),
            reverse(col("embedding")).as("embedding")))
      // Sizing policy (one bounded scalar): small corpora use the
      // constant-cell-size ⌊N/32⌋ (floors to the oracle's 16 cells at the
      // sf0.01 gate scale — a fixed cell COUNT would make every probe grow
      // linearly with the corpus, measured 18× at a 10× soak), but capped
      // at 4·√N — the FAISS sizing discipline. Uncapped N/32 makes the
      // centroid set O(corpus): ~3·10⁸ centroids ≈ 150 GB of driver/
      // broadcast metadata at a genuine 10¹⁰ vectors, the next verified
      // scale cliff. Under the cap the centroid set is provably O(√N)
      // (~10⁵ rows ≈ 50 MB at 10¹⁰), cells are O(√N) rows, and probe cost
      // is O(|eval|·nProbe·√N) — the standard IVF balance point. The
      // IvfIndex collect guard (spark.graft.ivf.maxCentroidCollectRows)
      // backstops this: past it, assignment/probing auto-route to the
      // distributed twins rather than collecting.
      // Above the gate scales the EXACT build's O(N·nLists) Lloyd+assign
      // becomes the next quadratic term, so the index switches to
      // buildScaled (sample-trained centroids + two-level assignment,
      // O(N·2√nLists)); the oracle-checked scales stay on the exact path.
      val nTrain = emb.count()
      val nLists = math.max(16, math.min(nTrain / 32,
        4 * math.round(math.sqrt(nTrain.toDouble))).toInt)
      val idx =
        if (nTrain <= 4000)
          graft.operators.IvfIndex.build(emb, "vec_id", "embedding",
            nLists, iters = 2)
        else graft.operators.IvfIndex.buildScaled(emb, "vec_id", "embedding",
          nLists, iters = 2)
      // beyond the oracle-checked scale, the eval probe ALSO goes two-level
      // (O(|eval|·nLists) exact probing was the dominant 100×-soak term)
      val probeSc =
        if (nTrain <= 4000) 1
        else math.max(1, math.round(math.sqrt(nLists.toDouble)).toInt)
      Similarity.semanticDecontaminateIndexed(idx, eval, "vec_id",
        "embedding", threshold = 0.999, nProbe = 3,
        probeSuperCount = probeSc)
    },

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
    },

    // --- multimodal: frame sampling (one row per sampled 256-byte "frame",
    // --- every 4th) — the oracle restates the sampling arithmetic ------------
    q("mm02_frame_sample",
      """SELECT doc_id,
        |  CAST((strlen(text) + 255) // 256 AS INT) AS total_frames,
        |  CAST(((strlen(text) + 255) // 256 + 3) // 4 AS BIGINT) AS n_sampled,
        |  CASE WHEN ((strlen(text) + 255) // 256 - 1) % 4 = 0
        |       THEN CAST(strlen(text) - ((strlen(text) + 255) // 256 - 1) * 256 AS INT)
        |  END AS last_frame_bytes
        |FROM documents WHERE strlen(text) > 0""".stripMargin) { (s, d) =>
      Multimodal.frameSample(
          Multimodal.withBlob(Tables.documents(s, d), "text", "source"),
          frameBytes = 256, every = 4)
        .groupBy(col("doc_id"))
        .agg(max(col("total_frames")).as("total_frames"),
          count(lit(1)).as("n_sampled"),
          // the final frame is short unless the blob divides evenly — its
          // length checks the copyOfRange boundary arithmetic end-to-end
          max(when(col("frame_idx") === col("total_frames") - 1,
            octet_length(col("frame")))).as("last_frame_bytes"))
    },

    // --- multimodal: fixed-grid resize (mm03) — the stub scaler's nearest-
    // --- neighbor arithmetic (pixel i = blob[(i·len)/n]) restated in SQL.
    // --- Byte indexing in DuckDB needs chars≡bytes, so BOTH sides filter to
    // --- ASCII docs (octet_length = char length) — exact by construction,
    // --- not by dataset luck. pix_sum folds every sampled byte (so one
    // --- off-by-one anywhere in the grid walk fails the hash); last_pix
    // --- pins the i = n−1 boundary specifically. --------------------------------
    q("mm03_resize_grid",
      """SELECT doc_id, 8 AS width, 4 AS height,
        |  CAST(list_sum([CAST(unicode(substr(text, CAST((i*strlen(text))//32 AS INT)+1, 1)) AS BIGINT)
        |    for i in generate_series(0, 31)]) AS BIGINT) AS pix_sum,
        |  CAST(unicode(substr(text, CAST((31*strlen(text))//32 AS INT)+1, 1)) AS BIGINT) AS last_pix
        |FROM documents
        |WHERE strlen(text) = length(text) AND strlen(text) > 0""".stripMargin) { (s, d) =>
      import s.implicits._
      val ascii = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
      Multimodal.resizeBatched(
          Multimodal.withBlob(ascii, "text", "source"), w = 8, h = 4)
        .map(r => (r.doc_id, r.width, r.height,
          r.pixels.map(b => (b & 0xff).toLong).sum,
          (r.pixels.last & 0xff).toLong))
        .toDF("doc_id", "width", "height", "pix_sum", "last_pix")
    },

    // --- multimodal: per-frame feature extraction (mm04) — frameSample's
    // --- explode composed with the codec's decode, frame identity kept.
    // --- Frames of an ASCII blob are substr slices, so the oracle replays
    // --- the stub's checksum/dimension arithmetic per frame; the lateral
    // --- generate_series mirrors the sampling stride. -------------------------
    q("mm04_frame_features",
      """WITH d AS (SELECT doc_id, text,
        |    CAST((strlen(text)+255)//256 AS INT) AS nf FROM documents
        |  WHERE strlen(text) = length(text) AND strlen(text) > 0),
        |i AS (SELECT doc_id, text,
        |    unnest([i for i in generate_series(0, nf-1) if i % 4 = 0]) AS idx
        |  FROM d),
        |f AS (SELECT doc_id, CAST(idx AS INT) AS frame_idx,
        |    substr(text, CAST(idx*256 AS INT)+1, 256) AS frame FROM i)
        |SELECT doc_id, frame_idx, CAST(strlen(frame) AS INT) AS n_bytes,
        |  CAST(list_sum(list_transform(regexp_split_to_array(frame,''),
        |    x -> CAST(unicode(x) AS BIGINT))) AS BIGINT) % 2147483647 AS checksum,
        |  CAST((strlen(frame) % 64) + 1 AS INT) AS width,
        |  CAST((CAST(list_sum(list_transform(regexp_split_to_array(frame,''),
        |    x -> CAST(unicode(x) AS BIGINT))) AS BIGINT) % 2147483647) % 64 + 1 AS INT) AS height
        |FROM f""".stripMargin) { (s, d) =>
      val ascii = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
      Multimodal.featurizeFrames(
          Multimodal.frameSample(
            Multimodal.withBlob(ascii, "text", "source"),
            frameBytes = 256, every = 4))
        .toDF().select("doc_id", "frame_idx", "n_bytes", "checksum",
          "width", "height")
    },

    // --- multimodal audio path (mm05): overlapping STFT-style windows
    // --- (len 64, hop 32) over stub-decoded 8-bit PCM; per window the
    // --- integer energy Σ(s−128)² and the zero-crossing count — the
    // --- silence/voicing features an audio pipeline filters on. The oracle
    // --- restates the framing (window j = samples [j·32+1, j·32+64], every
    // --- start below the sample count) and both integer features; per-doc
    // --- sums fold every window so one wrong boundary fails the hash.
    // --- ASCII docs only: chars ≡ bytes makes unicode(substr) the sample. --
    q("mm05_audio_windows",
      """WITH s AS (SELECT doc_id,
        |    [CAST(unicode(substr(text, i, 1)) AS BIGINT) - 128
        |     for i in generate_series(1, strlen(text))] AS c
        |  FROM documents WHERE strlen(text) = length(text) AND strlen(text) > 0),
        |j0 AS (SELECT doc_id, c,
        |    unnest(generate_series(0, (len(c)-1)//32)) AS j FROM s),
        |w AS (SELECT doc_id, j, c[CAST(j*32+1 AS INT) : CAST(j*32+64 AS INT)] AS win
        |  FROM j0),
        |f AS (SELECT doc_id, j,
        |    CAST(list_sum([x*x for x in win]) AS BIGINT) AS energy,
        |    CAST(len([i for i in generate_series(1, len(win)-1)
        |      if (win[i] < 0) <> (win[i+1] < 0)]) AS BIGINT) AS zc
        |  FROM w)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |  CAST(SUM(energy) AS BIGINT) AS sum_energy,
        |  CAST(SUM(zc) AS BIGINT) AS sum_zc,
        |  CAST(MAX(energy) AS BIGINT) AS max_energy
        |FROM f GROUP BY 1""".stripMargin) { (s, d) =>
      val ascii = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
      Multimodal.audioWindows(
          Multimodal.withBlob(ascii, "text", "source"), win = 64, hop = 32)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(col("energy")).as("sum_energy"),
          sum(col("zero_crossings")).as("sum_zc"),
          max(col("energy")).as("max_energy"))
    },

    // --- perceptual-hash image near-dup (mm06): blockhash over the codec's
    // --- 8×8 resize (mean-thresholded bits, packed as two 32-bit halves so
    // --- no engine ever shifts into a sign bit), then Hamming-≤3 pairs via
    // --- the 4×16-bit banded join — complete by pigeonhole, never
    // --- all-pairs. Planted: %7 exact blob copies (Hamming 0 guaranteed)
    // --- and %5 one-char edits (tiny or zero pixel drift — in iff ≤3,
    // --- identically on both engines). The oracle restates the pixel walk,
    // --- mean threshold, bit packing, and a brute-force Hamming join. ------
    q("mm06_phash_dedup",
      """WITH pcorp AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id+400000, text FROM documents WHERE doc_id%7=0
        |  UNION ALL SELECT doc_id+500000,
        |    substr(text,1,3) || 'Q' || substr(text,5)
        |    FROM documents WHERE doc_id%5=0),
        |a AS (SELECT doc_id, text FROM pcorp
        |  WHERE strlen(text) = length(text) AND strlen(text) > 0),
        |px AS (SELECT doc_id,
        |  [CAST(unicode(substr(text, CAST((i*strlen(text))//64 AS INT)+1, 1)) AS BIGINT)
        |    for i in generate_series(0, 63)] AS px FROM a),
        |mn AS (SELECT doc_id, px, CAST(list_sum(px)//64 AS BIGINT) AS mean FROM px),
        |ph AS (SELECT doc_id,
        |  CAST(list_sum([CASE WHEN px[i+33] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_hi,
        |  CAST(list_sum([CASE WHEN px[i+1] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_lo
        |  FROM mn)
        |SELECT p.doc_id AS a, q.doc_id AS b,
        |  CAST(bit_count(xor(p.ph_hi, q.ph_hi)) +
        |       bit_count(xor(p.ph_lo, q.ph_lo)) AS BIGINT) AS hamming
        |FROM ph p JOIN ph q ON p.doc_id < q.doc_id
        |WHERE bit_count(xor(p.ph_hi, q.ph_hi)) +
        |      bit_count(xor(p.ph_lo, q.ph_lo)) <= 3""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val planted = docs
        .unionByName(docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 400000).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 500000).as("doc_id"),
            concat(substring(col("text"), 1, 3), lit("Q"),
              expr("substring(text, 5)")).as("text")))
      val ascii = planted
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
        .withColumn("fmt", lit("img"))
      val hashes = Multimodal.perceptualHash(
        Multimodal.withBlob(ascii, "text", "fmt")).toDF()
      Multimodal.phashDupPairs(hashes, maxHamming = 3)
    },

    // --- image dedup end-to-end (mm12): mm06's perceptual-hash pairs fed
    // --- through the distributed connected components and a keep-one
    // --- rewrite — the surviving image set after visual dedup (the txt42
    // --- shape on the visual modality). Oracle = the mm06 chain + the
    // --- recursive closure + min-id keepers. ------------------------------
    q("mm12_phash_cluster_keep",
      """WITH RECURSIVE pcorp AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id+400000, text FROM documents WHERE doc_id%7=0
        |  UNION ALL SELECT doc_id+500000,
        |    substr(text,1,3) || 'Q' || substr(text,5)
        |    FROM documents WHERE doc_id%5=0),
        |a AS (SELECT doc_id, text FROM pcorp
        |  WHERE strlen(text) = length(text) AND strlen(text) > 0),
        |px AS (SELECT doc_id,
        |  [CAST(unicode(substr(text, CAST((i*strlen(text))//64 AS INT)+1, 1)) AS BIGINT)
        |    for i in generate_series(0, 63)] AS px FROM a),
        |mn AS (SELECT doc_id, px, CAST(list_sum(px)//64 AS BIGINT) AS mean FROM px),
        |ph AS (SELECT doc_id,
        |  CAST(list_sum([CASE WHEN px[i+33] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_hi,
        |  CAST(list_sum([CASE WHEN px[i+1] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_lo
        |  FROM mn),
        |prs AS (SELECT p.doc_id AS u, q.doc_id AS v
        |  FROM ph p JOIN ph q ON p.doc_id < q.doc_id
        |  WHERE bit_count(xor(p.ph_hi, q.ph_hi)) +
        |        bit_count(xor(p.ph_lo, q.ph_lo)) <= 3),
        |sym AS (SELECT u, v FROM prs UNION SELECT v, u FROM prs),
        |reach(u, v) AS (
        |  SELECT u, v FROM sym
        |  UNION
        |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
        |),
        |dropped AS (SELECT u AS doc_id FROM reach
        |  GROUP BY u HAVING LEAST(u, MIN(v)) <> u)
        |SELECT doc_id FROM a
        |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val planted = docs
        .unionByName(docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 400000).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 500000).as("doc_id"),
            concat(substring(col("text"), 1, 3), lit("Q"),
              expr("substring(text, 5)")).as("text")))
      val ascii = planted
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
        .withColumn("fmt", lit("img"))
      val pairs = Multimodal.phashDupPairs(
          Multimodal.perceptualHash(
            Multimodal.withBlob(ascii, "text", "fmt")).toDF(),
          maxHamming = 3)
        .select(col("a"), col("b"))
      val cl = graft.operators.Dedup.clustersDistributed(pairs)
      ascii.join(cl.filter(col("member") =!= col("rep"))
          .select(col("member").as("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
    },

    // --- video near-dup by shared frame hashes (mm07): re-encoded or
    // --- lightly-edited re-uploads share almost every FRAME perceptual
    // --- hash while whole-blob hashing sees nothing — frameSample(every
    // --- frame) → per-frame phash → banded Hamming pairs → one rollup per
    // --- video pair, ≥3 shared frames. Planted on the even half of the
    // --- corpus: %6 exact re-uploads (every frame collides) and %4
    // --- one-char edits (all but the touched frame collide). Oracle
    // --- restates the frame slicing, per-frame pixel walk/packing, and a
    // --- brute-force frame-pair Hamming join rolled up per video. --------
    q("mm07_video_dedup",
      """WITH pcorp AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id+600000, text FROM documents
        |    WHERE doc_id % 2 = 0 AND doc_id % 6 = 0
        |  UNION ALL SELECT doc_id+700000,
        |    substr(text,1,80) || 'Q' || substr(text,82)
        |    FROM documents WHERE doc_id % 2 = 0 AND doc_id % 4 = 0),
        |a AS (SELECT doc_id, text FROM pcorp
        |  WHERE strlen(text) = length(text) AND strlen(text) > 0),
        |f AS (SELECT doc_id,
        |    unnest(generate_series(0, CAST((strlen(text)+63)//64 AS BIGINT)-1)) AS idx,
        |    text FROM a),
        |fr AS (SELECT doc_id, idx,
        |    substr(text, CAST(idx*64 AS INT)+1, 64) AS fr FROM f),
        |px AS (SELECT doc_id, idx,
        |  [CAST(unicode(substr(fr, CAST((i*strlen(fr))//64 AS INT)+1, 1)) AS BIGINT)
        |    for i in generate_series(0, 63)] AS px FROM fr),
        |mn AS (SELECT doc_id, idx, px, CAST(list_sum(px)//64 AS BIGINT) AS mean FROM px),
        |ph AS (SELECT doc_id, idx,
        |  CAST(list_sum([CASE WHEN px[i+33] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_hi,
        |  CAST(list_sum([CASE WHEN px[i+1] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_lo
        |  FROM mn)
        |SELECT p.doc_id AS a, q.doc_id AS b,
        |  CAST(COUNT(*) AS BIGINT) AS n_frame_matches
        |FROM ph p JOIN ph q ON p.doc_id < q.doc_id
        |WHERE bit_count(xor(p.ph_hi, q.ph_hi)) +
        |      bit_count(xor(p.ph_lo, q.ph_lo)) <= 3
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text")
      val planted = docs
        .unionByName(docs.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 600000).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 700000).as("doc_id"),
            concat(substring(col("text"), 1, 80), lit("Q"),
              expr("substring(text, 82)")).as("text")))
      val ascii = planted
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
        .withColumn("fmt", lit("vid"))
      Multimodal.videoDupPairs(Multimodal.withBlob(ascii, "text", "fmt"),
        frameBytes = 64, maxHamming = 3, minShared = 3)
    },

    // --- WIDE-HASH video near-dup (mm21): mm07's pipeline over the
    // --- 256-bit perceptual hash — the path that survives web scale. The
    // --- mm07 1000× soak proved the 64-bit ceiling is arithmetic: exact
    // --- Hamming ≤ 3 forces four 16-bit bands, 2¹⁶ bucket values, and
    // --- candidate pairs ~ corpus²/2¹⁶ however well-spread the hashes
    // --- (857 s at 100×, a projected day at 1000×). Four 64-BIT bands
    // --- (word pairs, keyed as two 32-bit columns for oracle parity)
    // --- keep occupancy ~1 to ~10¹⁹ frames. Same planted corpus as
    // --- mm07; 256-byte frames (the 16×16 resize reads each byte once);
    // --- minShared = 1 since most docs hold 1–2 wide frames. Oracle
    // --- restates the slicing, the two frame-QA exclusions (< 64 source
    // --- bytes; constant all-zero code), 256-pixel walk, 8×32-bit word
    // --- packing, and brute frame-pair Hamming join. --------------------
    q("mm21_video_dedup_wide",
      """WITH pcorp AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL SELECT doc_id+600000, text FROM documents
        |    WHERE doc_id % 2 = 0 AND doc_id % 6 = 0
        |  UNION ALL SELECT doc_id+700000,
        |    substr(text,1,80) || 'Q' || substr(text,82)
        |    FROM documents WHERE doc_id % 2 = 0 AND doc_id % 4 = 0),
        |a AS (SELECT doc_id, text FROM pcorp
        |  WHERE strlen(text) = length(text) AND strlen(text) > 0),
        |f AS (SELECT doc_id,
        |    unnest(generate_series(0, CAST((strlen(text)+255)//256 AS BIGINT)-1)) AS idx,
        |    text FROM a),
        |fr0 AS (SELECT doc_id, idx,
        |    substr(text, CAST(idx*256 AS INT)+1, 256) AS fr FROM f),
        |fr AS (SELECT * FROM fr0 WHERE strlen(fr) >= 64),
        |px AS (SELECT doc_id, idx,
        |  [CAST(unicode(substr(fr, CAST((i*strlen(fr))//256 AS INT)+1, 1)) AS BIGINT)
        |    for i in generate_series(0, 255)] AS px FROM fr),
        |mn AS (SELECT doc_id, idx, px, CAST(list_sum(px)//256 AS BIGINT) AS mean FROM px),
        |ph0 AS (SELECT doc_id, idx,
        |  [CAST(list_sum([CASE WHEN px[w*32+i+1] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT)
        |    for w in generate_series(0, 7)] AS w FROM mn),
        |ph AS (SELECT * FROM ph0 WHERE list_sum(w) > 0)
        |SELECT p.doc_id AS a, q.doc_id AS b,
        |  CAST(COUNT(*) AS BIGINT) AS n_frame_matches
        |FROM ph p JOIN ph q ON p.doc_id < q.doc_id
        |WHERE CAST(list_sum([bit_count(xor(p.w[k+1], q.w[k+1]))
        |    for k in generate_series(0, 7)]) AS BIGINT) <= 3
        |GROUP BY 1, 2 HAVING COUNT(*) >= 1""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text")
      val planted = docs
        .unionByName(docs.filter(col("doc_id") % 6 === 0)
          .select((col("doc_id") + 600000).as("doc_id"), col("text")))
        .unionByName(docs.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + 700000).as("doc_id"),
            concat(substring(col("text"), 1, 80), lit("Q"),
              expr("substring(text, 82)")).as("text")))
      val ascii = planted
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
        .withColumn("fmt", lit("vid"))
      Multimodal.videoDupPairs256(Multimodal.withBlob(ascii, "text", "fmt"),
        frameBytes = 256, maxHamming = 3, minShared = 1)
    },

    // --- energy-gated VAD segmentation (mm09): maximal runs of
    // --- above-threshold audio windows become segments — the step that
    // --- keeps transcription off the silence, composed from mm05's
    // --- windows by the gaps-and-islands trick on the window index (one
    // --- doc-keyed exchange). Oracle = mm05's window chain + the same
    // --- idx − ROW_NUMBER island grouping. -------------------------------
    q("mm09_voice_segments",
      """WITH s AS (SELECT doc_id,
        |    [CAST(unicode(substr(text, i, 1)) AS BIGINT) - 128
        |     for i in generate_series(1, strlen(text))] AS c
        |  FROM documents WHERE strlen(text) = length(text) AND strlen(text) > 0),
        |j0 AS (SELECT doc_id, c,
        |    unnest(generate_series(0, (len(c)-1)//32)) AS j FROM s),
        |w AS (SELECT doc_id, j, c[CAST(j*32+1 AS INT) : CAST(j*32+64 AS INT)] AS win
        |  FROM j0),
        |f AS (SELECT doc_id, j,
        |    CAST(list_sum([x*x for x in win]) AS BIGINT) AS energy FROM w),
        |a AS (SELECT doc_id, j, energy,
        |    j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j) AS grp
        |  FROM f WHERE energy > 120000),
        |seg AS (SELECT doc_id, MIN(j) AS start_win, MAX(j) AS end_win,
        |    CAST(COUNT(*) AS BIGINT) AS n_windows,
        |    CAST(SUM(energy) AS BIGINT) AS total_energy
        |  FROM a GROUP BY doc_id, grp)
        |SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start_win) - 1 AS INT) AS seg_idx,
        |  CAST(start_win AS INT) AS start_win, CAST(end_win AS INT) AS end_win,
        |  n_windows, total_energy
        |FROM seg""".stripMargin) { (s, d) =>
      val ascii = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
      Multimodal.voiceSegments(
        Multimodal.withBlob(ascii, "text", "source"),
        win = 64, hop = 32, energyThreshold = 120000L)
    },

    // --- STREAMING media ingest (mm08): the multimodal path as a
    // --- Structured Streaming pipeline — blobs arrive on a file stream
    // --- (doubled source = at-least-once redelivery), the batched decode
    // --- runs per micro-batch (mapPartitions is stateless, so the same
    // --- executor code serves batch and stream), and dropDuplicates
    // --- collapses the replays; result ≡ mm01's batch decode, which the
    // --- same oracle pins. ------------------------------------------------
    q("mm08_streaming_media",
      """WITH raw AS (SELECT doc_id, source AS format, CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(list_sum(list_transform(regexp_split_to_array(text,''),
        |    x -> CAST(unicode(x) AS BIGINT))) AS BIGINT) % 2147483647 AS checksum
        |  FROM documents)
        |SELECT doc_id, format, n_bytes, checksum,
        |  CAST(n_bytes % 64 + 1 AS INT) AS width,
        |  CAST(checksum % 64 + 1 AS INT) AS height
        |FROM raw""".stripMargin) { (s, d) =>
      import graft.streaming.StreamStreamJoin
      def src() = StreamStreamJoin.tableStream(s, s"$d/documents.parquet")
      val metas = Multimodal.decodeBatched(
        Multimodal.withBlob(src().unionByName(src()), "text", "source"))
      StreamStreamJoin.runToMemory(s,
        metas.toDF().dropDuplicates("doc_id"),
        s"mm08_${java.util.UUID.randomUUID().toString.take(8)}")
    },

    // --- random-projection (JL) dimensionality reduction + reduced-space ANN
    // --- with exact rerank (vec19): 64 dims → 16 via a ±1 md5-parity
    // --- projection matrix that is a pure FUNCTION (regenerated, never
    // --- stored/shipped), exact integer math end-to-end until the final
    // --- rerank cosine — so the full pipeline hash-matches the oracle's
    // --- restatement. The reduced vectors are what an index would store at
    // --- 100 TB (4× scan-bandwidth cut); rerank restores exactness. --------
    q("vec19_ann_random_projection",
      s"""WITH $quantSql,
         |rp AS (SELECT vec_id,
         |  [CAST(list_sum([ qv[i+1] * (CASE WHEN (strpos('0123456789abcdef',
         |       substr(md5('rp'||CAST(kk AS VARCHAR)||'_'||CAST(i AS VARCHAR)),1,1))-1) % 2 = 0
         |     THEN 1 ELSE -1 END) for i in generate_series(0, len(qv)-1)]) AS BIGINT)
         |   for kk in generate_series(0, 15)] AS rv
         |  FROM q),
         |ad AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |  CAST(list_sum([p.rv[i]*c.rv[i] for i in generate_series(1, len(p.rv))]) AS BIGINT) AS ad
         |  FROM rp p, rp c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         |cand AS (SELECT probe_id, neighbor_id FROM (
         |  SELECT probe_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY ad DESC, neighbor_id) AS rn
         |  FROM ad) t WHERE rn <= 16),
         |scored AS (SELECT cand.probe_id, cand.neighbor_id,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM cand JOIN n p ON cand.probe_id = p.vec_id
         |            JOIN n c ON cand.neighbor_id = c.vec_id)
         |SELECT * FROM (SELECT probe_id, neighbor_id, sim,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored) t WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.annRandomProject(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3, kOut = 16, candidates = 16)
    },

    // --- maximal marginal relevance rerank (vec20): diversity-aware top-3
    // --- from brute top-8 candidates — greedy argmax of
    // --- 0.5·sim(q,c) − 0.5·max_sim(c, picked), halving exact in binary FP
    // --- so every score is engine-identical; the oracle unrolls all three
    // --- greedy rounds with the running-max maintained exactly as the
    // --- operator maintains it. -------------------------------------------
    q("vec20_mmr_rerank",
      s"""WITH $quantSql,
         |scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         |cand AS (SELECT probe_id, neighbor_id, sim FROM (
         |  SELECT probe_id, neighbor_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn
         |  FROM scored) t WHERE rn <= 8),
         |pairs AS (SELECT a.probe_id, a.neighbor_id AS na, b.neighbor_id AS nb,
         |  CAST(CAST(list_sum([x.qv[i]*y.qv[i] for i in generate_series(1, len(x.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(x.n2 AS DOUBLE))*sqrt(CAST(y.n2 AS DOUBLE))) AS psim
         |  FROM cand a JOIN cand b
         |    ON a.probe_id = b.probe_id AND a.neighbor_id <> b.neighbor_id
         |  JOIN n x ON x.vec_id = a.neighbor_id
         |  JOIN n y ON y.vec_id = b.neighbor_id),
         |p1 AS (SELECT probe_id, neighbor_id, sim FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |    ORDER BY sim DESC, neighbor_id) AS rn FROM cand) t WHERE rn = 1),
         |rem1 AS (SELECT c.probe_id, c.neighbor_id, c.sim, pr.psim AS mx
         |  FROM cand c
         |  JOIN p1 ON c.probe_id = p1.probe_id AND c.neighbor_id <> p1.neighbor_id
         |  JOIN pairs pr ON pr.probe_id = c.probe_id
         |    AND pr.na = c.neighbor_id AND pr.nb = p1.neighbor_id),
         |p2 AS (SELECT probe_id, neighbor_id, sim FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |    ORDER BY (0.5*sim - 0.5*mx) DESC, neighbor_id) AS rn FROM rem1) t
         |  WHERE rn = 1),
         |rem2 AS (SELECT r.probe_id, r.neighbor_id, r.sim,
         |    GREATEST(r.mx, pr.psim) AS mx
         |  FROM rem1 r
         |  JOIN p2 ON r.probe_id = p2.probe_id AND r.neighbor_id <> p2.neighbor_id
         |  JOIN pairs pr ON pr.probe_id = r.probe_id
         |    AND pr.na = r.neighbor_id AND pr.nb = p2.neighbor_id),
         |p3 AS (SELECT probe_id, neighbor_id, sim FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
         |    ORDER BY (0.5*sim - 0.5*mx) DESC, neighbor_id) AS rn FROM rem2) t
         |  WHERE rn = 1)
         |SELECT probe_id, 1 AS pick, neighbor_id, sim FROM p1
         |UNION ALL SELECT probe_id, 2 AS pick, neighbor_id, sim FROM p2
         |UNION ALL SELECT probe_id, 3 AS pick, neighbor_id, sim FROM p3""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.mmrRerank(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3, candidates = 8)
    },

    // --- cluster-balanced diversity sampling (vec21): equal per-cell quota
    // --- from the trained IVF assignment, ranked by a salted deterministic
    // --- scatter (never rand()) — dominant embedding modes can't flood the
    // --- sample. Oracle = the vec05 unrolled-Lloyd chain + the same
    // --- windowed quota. --------------------------------------------------
    q("vec21_balanced_sample",
      s"""WITH $quantSql,
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |${assignSql("asg", "vec_id", "q")}
         |SELECT vec_id, cell, pos FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY cell
         |    ORDER BY (vec_id * 2654435761) % 1000003, vec_id) AS pos
         |  FROM asg) t WHERE pos <= 8""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val idx = graft.operators.IvfIndex.build(emb, "vec_id", "embedding",
        nLists = 16, iters = 2)
      graft.operators.IvfIndex.balancedSample(idx, "vec_id", mPerCell = 8)
    },

    // --- embedding distribution-drift report (vec22): the monitoring half
    // --- of the frozen-quantizer trade — assign the incoming half to the
    // --- centroids trained on the base half, flag cells whose data share
    // --- more than doubled/halved via exact-integer cross-multiplication
    // --- (no division ⇒ engine-portable verdicts; empty cells kept).
    // --- Oracle = the vec07 unrolled-Lloyd chain over the base half + both
    // --- assignments + the same integer inequality. -----------------------
    q("vec22_drift_report",
      s"""WITH $quantSql,
         |qe AS (SELECT vec_id, qv FROM q WHERE vec_id % 2 = 0),
         |qn AS (SELECT vec_id, qv FROM q WHERE vec_id % 2 = 1),
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM qe ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "qe")},
         |${lloydSql(2, "c1", "qe")},
         |${assignSql("ab", "vec_id", "qe")},
         |${assignSql("an", "vec_id", "qn")},
         |bc AS (SELECT cell, COUNT(*) AS c FROM ab GROUP BY 1),
         |nc AS (SELECT cell, COUNT(*) AS c FROM an GROUP BY 1),
         |tot AS (SELECT (SELECT COUNT(*) FROM ab) AS tb,
         |               (SELECT COUNT(*) FROM an) AS tn)
         |SELECT c2.cell, CAST(COALESCE(bc.c, 0) AS BIGINT) AS n_base,
         |  CAST(COALESCE(nc.c, 0) AS BIGINT) AS n_new,
         |  (COALESCE(nc.c, 0)*tb > 2*COALESCE(bc.c, 0)*tn
         |   OR COALESCE(bc.c, 0)*tn > 2*COALESCE(nc.c, 0)*tb) AS drifted
         |FROM c2 LEFT JOIN bc ON c2.cell = bc.cell
         |        LEFT JOIN nc ON c2.cell = nc.cell, tot""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val idx = graft.operators.IvfIndex.build(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
        nLists = 16, iters = 2)
      graft.operators.IvfIndex.driftReport(idx,
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
    },

    // --- ViT patch-grid prep (mm10): the vision-transformer input shaping
    // --- after decode — ceil-divided 16×16 patch grid, padding amounts,
    // --- token budget capped at 9 patches (+1 CLS) with a truncation flag.
    // --- Pure per-row math after the batched decode; the oracle restates
    // --- the stub-decode dims and the grid arithmetic. --------------------
    q("mm10_vit_patch_grid",
      """WITH raw AS (SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(list_sum(list_transform(regexp_split_to_array(text,''),
        |    x -> CAST(unicode(x) AS BIGINT))) AS BIGINT) % 2147483647 AS checksum
        |  FROM documents),
        |d AS (SELECT doc_id, CAST(n_bytes % 64 + 1 AS INT) AS w,
        |  CAST(checksum % 64 + 1 AS INT) AS h FROM raw),
        |g AS (SELECT doc_id, (w+15)//16 AS grid_w, (h+15)//16 AS grid_h, w, h FROM d)
        |SELECT doc_id, grid_w, grid_h, grid_w*grid_h AS n_patches,
        |  LEAST(grid_w*grid_h, 9) + 1 AS seq_len,
        |  grid_w*grid_h > 9 AS truncated,
        |  grid_w*16 - w AS pad_w, grid_h*16 - h AS pad_h
        |FROM g""".stripMargin) { (s, d) =>
      Multimodal.vitPatchGrid(
        Multimodal.withBlob(Tables.documents(s, d), "text", "source"),
        patch = 16, maxPatches = 9)
    },

    // --- ANN recall@k evaluation (vec23): the index-quality harness — per
    // --- probe, how much of the EXACT top-3 the IVF search (nProbe=4 of 16
    // --- cells) recovered. Both paths are integer-quantized + id
    // --- tie-broken, so recall itself is deterministic and fully
    // --- value-oracled — the rare case where an ANN quality number is
    // --- hash-exact rather than eyeballed. --------------------------------
    q("vec23_recall_eval",
      s"""WITH $quantSql,
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |${assignSql("idx", "neighbor_id", "q")},
         |${assignSql("pc", "probe_id", "n", " WHERE n.vec_id < 10", "rn <= 4")},
         |iscored AS (SELECT pc.probe_id, idx.neighbor_id,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM pc JOIN idx ON pc.cell = idx.cell
         |  JOIN n p ON p.vec_id = pc.probe_id
         |  JOIN n c ON c.vec_id = idx.neighbor_id
         |  WHERE idx.neighbor_id <> pc.probe_id),
         |ivf AS (SELECT probe_id, neighbor_id FROM (SELECT probe_id, neighbor_id,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM iscored) t WHERE rank <= 3),
         |bscored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |  CAST(CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(p.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
         |bf AS (SELECT probe_id, neighbor_id FROM (SELECT probe_id, neighbor_id,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM bscored) t WHERE rank <= 3)
         |SELECT bf.probe_id, CAST(COUNT(ivf.neighbor_id) AS BIGINT) AS n_hit,
         |  CAST(COUNT(ivf.neighbor_id) AS DOUBLE)/3 AS recall
         |FROM bf LEFT JOIN ivf ON bf.probe_id = ivf.probe_id
         |  AND bf.neighbor_id = ivf.neighbor_id
         |GROUP BY bf.probe_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val probes = emb.filter(col("vec_id") < 10)
      val exact = Similarity.knnBrute(probes, emb, "vec_id", "embedding", k = 3)
      val approx = graft.operators.IvfIndex.search(probes, emb,
        "vec_id", "embedding", k = 3, nLists = 16, nProbe = 4)
      Similarity.recallAtK(exact, approx, k = 3)
    },

    // --- text-image pair assembly (mm11): the CLIP-style training-pair
    // --- step — captions (token-counted, quality-banded) joined 1:1 with
    // --- their decoded image dims, a keep flag for the trainable band
    // --- (5–64 caption tokens, ≥256 px). One equi-join on the id after
    // --- the batched decode; the quality predicate is pure projection. ----
    q("mm11_pair_table",
      s"""WITH raw AS (SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
         |  CAST(list_sum(list_transform(regexp_split_to_array(text,''),
         |    x -> CAST(unicode(x) AS BIGINT))) AS BIGINT) % 2147483647 AS checksum
         |  FROM documents),
         |dims AS (SELECT doc_id, CAST(n_bytes % 64 + 1 AS INT) AS width,
         |  CAST(checksum % 64 + 1 AS INT) AS height FROM raw),
         |cap AS (SELECT doc_id,
         |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_caption_tokens
         |  FROM documents)
         |SELECT d.doc_id AS pair_id, c.n_caption_tokens, d.width, d.height,
         |  (c.n_caption_tokens BETWEEN 5 AND 64 AND d.width*d.height >= 256) AS keep
         |FROM dims d JOIN cap c ON d.doc_id = c.doc_id""".stripMargin) { (s, d) =>
      val metas = Multimodal.decodeBatched(
        Multimodal.withBlob(Tables.documents(s, d), "text", "source")).toDF()
      val caps = Tables.documents(s, d).select(col("doc_id"),
        size(graft.operators.TextOps.tokens(col("text"))).as("n_caption_tokens"))
      metas.join(caps, Seq("doc_id"))
        .select(col("doc_id").as("pair_id"), col("n_caption_tokens"),
          col("width"), col("height"),
          (col("n_caption_tokens").between(5, 64) &&
            col("width") * col("height") >= 256).as("keep"))
    },

    // --- binary-quantized ANN (vec24): sign-bit signatures (64 dims → two
    // --- 32-bit halves = 8 bytes, a 32× scan-set cut — the coarsest rung of
    // --- the float→SQ8→PQ→binary quantization ladder and the first-pass
    // --- filter production systems run over billions of vectors), Hamming
    // --- top-64 candidates via bit_count(xor), exact-cosine rerank to
    // --- top-3. Sign bits of the quantized vectors are deterministic, so
    // --- signatures, Hamming ranks, and rerank all hash-match. Full
    // --- vectors are touched only for the 64 candidate rows per probe. ----
    q("vec24_ann_binary",
      s"""WITH $quantSql,
         |sig AS (SELECT vec_id, qv, n2,
         |  CAST(list_sum([CASE WHEN qv[i+1] >= 0 THEN CAST(1 AS BIGINT) << i
         |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS lo,
         |  CAST(list_sum([CASE WHEN qv[i+33] >= 0 THEN CAST(1 AS BIGINT) << i
         |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS hi
         |  FROM n),
         |cand AS (SELECT probe_id, neighbor_id, hamming, pqv, pn2, qv, n2 FROM (
         |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    bit_count(xor(p.lo, c.lo)) + bit_count(xor(p.hi, c.hi)) AS hamming,
         |    p.qv AS pqv, p.n2 AS pn2, c.qv AS qv, c.n2 AS n2,
         |    ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |      ORDER BY bit_count(xor(p.lo, c.lo)) + bit_count(xor(p.hi, c.hi)),
         |        c.vec_id) AS crank
         |  FROM sig p JOIN sig c ON c.vec_id <> p.vec_id
         |  WHERE p.vec_id < 10) t WHERE crank <= 64),
         |scored AS (SELECT probe_id, neighbor_id, hamming,
         |  CAST(CAST(list_sum([pqv[i]*qv[i] for i in generate_series(1, len(pqv))]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(pn2 AS DOUBLE))*sqrt(CAST(n2 AS DOUBLE))) AS sim
         |  FROM cand)
         |SELECT probe_id, neighbor_id, hamming, sim, rank FROM (
         |  SELECT probe_id, neighbor_id, hamming, sim,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored) t WHERE rank <= 3""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.binarySearch(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 3, rerankN = 64)
    },

    // --- cross-modal alignment scoring (mm13, the CLIP-score filter): each
    // --- (caption, image-embedding) pair scored by cosine and banded into
    // --- the keep flag that drops mis-captioned pairs. The caption tower is
    // --- an engine-portable hashed bag-of-words ±1 projection (md5 dim +
    // --- parity sign — deterministic, SQL-restatable), the dataflow is the
    // --- production one: project text → ONE id equi-join to the embedding →
    // --- per-row cosine → threshold. Zero-norm text vectors score NULL. ---
    // --- streaming visual dedup (mm17): exact-phash keep-one pumped by a
    // --- stream — each micro-batch decodes its own blobs (the stateless
    // --- batched mm06 path serves batch and stream unchanged) and folds
    // --- hash → min doc_id into a standing keeper table; re-uploads
    // --- landing in ANY later batch resolve against every hash seen so
    // --- far without re-reading history. Min-fold is idempotent, so
    // --- replays are free. Planted exact copies (%6, +600000) must lose
    // --- to their originals across batch boundaries. Oracle = the batch
    // --- pixel-walk phash + min per hash. --------------------------------
    q("mm17_streaming_visual_dedup",
      """WITH pcorp AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE strlen(text) = length(text) AND strlen(text) > 0
        |  UNION ALL SELECT doc_id+600000, text FROM documents
        |  WHERE strlen(text) = length(text) AND strlen(text) > 0
        |    AND doc_id % 6 = 0),
        |px AS (SELECT doc_id,
        |  [CAST(unicode(substr(text, CAST((i*strlen(text))//64 AS INT)+1, 1)) AS BIGINT)
        |    for i in generate_series(0, 63)] AS px FROM pcorp),
        |mn AS (SELECT doc_id, px, CAST(list_sum(px)//64 AS BIGINT) AS mean FROM px),
        |ph AS (SELECT doc_id,
        |  CAST(list_sum([CASE WHEN px[i+33] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_hi,
        |  CAST(list_sum([CASE WHEN px[i+1] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_lo
        |  FROM mn)
        |SELECT ph_hi, ph_lo, MIN(doc_id) AS keep_id
        |FROM ph GROUP BY 1, 2""".stripMargin) { (s, d) =>
      import graft.streaming.StreamStreamJoin
      val docs = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
        .select(col("doc_id"), col("text"))
      val planted = docs.unionByName(docs.filter(col("doc_id") % 6 === 0)
        .select((col("doc_id") + 600000).as("doc_id"), col("text")))
      val src = java.nio.file.Files.createTempDirectory("mm17src").toString
      Multimodal.withBlob(planted.withColumn("fmt", lit("img")), "text", "fmt")
        .repartition(4).write.mode("overwrite").parquet(src)
      val tableDir =
        java.nio.file.Files.createTempDirectory("mm17tbl").toString + "/t"
      Multimodal.streamingVisualDedup(
        StreamStreamJoin.tableStream(s, src, maxFilesPerTrigger = 2), tableDir)
      s.read.parquet(tableDir).select("ph_hi", "ph_lo", "keep_id")
    },

    // --- SQ8 quantization-error report (vec28): per-vector exact integer
    // --- reconstruction error of the byte quantization (both sides scaled
    // --- by 127 to stay integral) + relative error — the decide-the-
    // --- compression-level artifact before committing to SQ8's 4× scan
    // --- cut vs PQ's training spend. One broadcast scale, one pass. ------
    q("vec28_sq8_error",
      s"""WITH $quantSql,
         |mx AS (SELECT MAX(list_max([abs(x) for x in qv])) AS m FROM q),
         |cc AS (SELECT vec_id, qv, m,
         |  [CAST(floor(CAST(x*127 AS DOUBLE)/m) AS BIGINT) for x in qv] AS c
         |  FROM q, mx)
         |SELECT vec_id AS id,
         |  CAST(list_sum([(qv[i]*127 - c[i]*m)*(qv[i]*127 - c[i]*m)
         |    for i in generate_series(1, len(qv))]) AS BIGINT) AS err,
         |  CAST(list_sum([(qv[i]*127 - c[i]*m)*(qv[i]*127 - c[i]*m)
         |    for i in generate_series(1, len(qv))]) AS DOUBLE)
         |  / (127.0*127.0 * CAST(list_sum([x*x for x in qv]) AS DOUBLE)) AS rel_err
         |FROM cc""".stripMargin) { (s, d) =>
      Similarity.sq8ErrorReport(Tables.embeddings(s, d), "vec_id", "embedding")
    },

    // --- cluster-separation report (vec27): each centroid's nearest other
    // --- centroid + exact integer d² — the "merge these cells" signal
    // --- completing the quantizer-health triad (counts vec17, shares
    // --- vec22, spread vec25): two cells can be individually tight yet
    // --- overlap, wasting a probe. O(nLists²) pairs over the broadcast
    // --- centroid relation; ties to the lower cell. ----------------------
    q("vec27_separation_report",
      s"""WITH $quantSql,
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |p AS (SELECT x.cell, y.cell AS oc,
         |  ${l2Sql("x.cv", "y.cv")} AS d2,
         |  ROW_NUMBER() OVER (PARTITION BY x.cell
         |    ORDER BY ${l2Sql("x.cv", "y.cv")}, y.cell) AS rn
         |  FROM c2 x JOIN c2 y ON x.cell <> y.cell)
         |SELECT cell, oc AS nearest_cell, d2 AS d2_nearest
         |FROM p WHERE rn = 1""".stripMargin) { (s, d) =>
      graft.operators.IvfIndex.separationReport(graft.operators.IvfIndex.build(
        Tables.embeddings(s, d), "vec_id", "embedding", nLists = 16, iters = 2))
    },

    // --- per-dimension embedding statistics (vec26): the normalization /
    // --- feature-scaling artifact — per dimension n, mean, variance (via
    // --- E[x²]−mean², exact decimal sums with unscaled < 2^53 so the few
    // --- final IEEE ops hash-match), min, max. ONE posexplode + one
    // --- partial-agg'd aggregation; output O(dims). A whitening or
    // --- scalar-quantizer training step reads exactly this table. --------
    q("vec26_dimension_stats",
      """WITH x0 AS (SELECT unnest(embedding) AS xf,
        |  unnest(generate_series(0, len(embedding)-1)) AS dim FROM embeddings),
        |c AS (SELECT dim, CAST(xf AS DOUBLE) AS x FROM x0),
        |a AS (SELECT dim, COUNT(*) AS n,
        |  CAST(SUM(CAST(x AS DECIMAL(12,5))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(x AS DECIMAL(12,5)) * CAST(x AS DECIMAL(12,5))) AS DOUBLE) AS sxx,
        |  MIN(x) AS vmin, MAX(x) AS vmax FROM c GROUP BY 1)
        |SELECT CAST(dim AS BIGINT) AS dim, n, sx/n AS mean,
        |  sxx/n - (sx/n)*(sx/n) AS variance, vmin, vmax
        |FROM a""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(12, 5)
      val c = Tables.embeddings(s, d)
        .select(posexplode(col("embedding")))
        .select(col("pos").cast("long").as("dim"),
          col("col").cast("double").as("x"))
      c.groupBy(col("dim")).agg(
          count(lit(1)).as("n"),
          sum(col("x").cast(dec)).cast("double").as("sx"),
          sum(col("x").cast(dec) * col("x").cast(dec)).cast("double").as("sxx"),
          min(col("x")).as("vmin"), max(col("x")).as("vmax"))
        .select(col("dim"), col("n"),
          (col("sx") / col("n")).as("mean"),
          (col("sxx") / col("n")
            - (col("sx") / col("n")) * (col("sx") / col("n"))).as("variance"),
          col("vmin"), col("vmax"))
    },

    // --- video scene-change detection (mm15): per-frame perceptual hashes,
    // --- frame-to-frame Hamming via one video-keyed lead() window, a cut
    // --- wherever the distance jumps past the threshold — the shot-
    // --- boundary step before per-scene sampling/captioning. Videos are
    // --- PLANTED with scene structure (frame pattern A,A,A,B,B,C via
    // --- repeat()): held shots hash identically (distance 0), cuts jump.
    // --- Pixels die inside the batched decode; the lead and the rollup
    // --- ride one video-keyed exchange. ----------------------------------
    q("mm15_scene_changes",
      """WITH base AS (SELECT doc_id, text FROM documents
        |  WHERE strlen(text) = length(text) AND strlen(text) >= 192
        |    AND doc_id % 5 = 0),
        |a AS (SELECT doc_id, repeat(substr(text, 1, 64), 3)
        |    || repeat(substr(text, 65, 64), 2)
        |    || substr(text, 129, 64) AS text FROM base),
        |f AS (SELECT doc_id,
        |    unnest(generate_series(0, CAST((strlen(text)+63)//64 AS BIGINT)-1)) AS idx,
        |    text FROM a),
        |fr AS (SELECT doc_id, idx,
        |    substr(text, CAST(idx*64 AS INT)+1, 64) AS fr FROM f),
        |px AS (SELECT doc_id, idx,
        |  [CAST(unicode(substr(fr, CAST((i*strlen(fr))//64 AS INT)+1, 1)) AS BIGINT)
        |    for i in generate_series(0, 63)] AS px FROM fr),
        |mn AS (SELECT doc_id, idx, px, CAST(list_sum(px)//64 AS BIGINT) AS mean FROM px),
        |ph AS (SELECT doc_id, idx,
        |  CAST(list_sum([CASE WHEN px[i+33] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_hi,
        |  CAST(list_sum([CASE WHEN px[i+1] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_lo
        |  FROM mn),
        |dd AS (SELECT doc_id, idx,
        |  bit_count(xor(ph_hi, lead(ph_hi) OVER w)) +
        |  bit_count(xor(ph_lo, lead(ph_lo) OVER w)) AS d
        |  FROM ph WINDOW w AS (PARTITION BY doc_id ORDER BY idx))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(CASE WHEN d > 3 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_scenes,
        |  array_to_string(list_sort(list_filter(list(CASE WHEN d > 3 THEN idx+1 END),
        |    x -> x IS NOT NULL)), ',') AS boundaries
        |FROM dd GROUP BY 1""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) >= 192 && col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          concat(repeat(expr("substring(text, 1, 64)"), 3),
            repeat(expr("substring(text, 65, 64)"), 2),
            expr("substring(text, 129, 64)")).as("text"),
          lit("vid").as("fmt"))
      Multimodal.sceneChanges(Multimodal.withBlob(base, "text", "fmt"),
        frameBytes = 64, threshold = 3)
    },

    // --- silence-ratio report (mm20): per clip, the share of audio
    // --- windows below the energy gate — the "how much of this corpus is
    // --- dead air" QA that decides whether VAD segmentation (mm09) pays
    // --- for itself before transcription. mm05's window chain + one
    // --- per-doc rollup; ratio an IEEE divide of exact counts. -----------
    q("mm20_silence_ratio",
      """WITH s AS (SELECT doc_id,
        |    [CAST(unicode(substr(text, i, 1)) AS BIGINT) - 128
        |     for i in generate_series(1, strlen(text))] AS c
        |  FROM documents WHERE strlen(text) = length(text) AND strlen(text) > 0),
        |j0 AS (SELECT doc_id, c,
        |    unnest(generate_series(0, (len(c)-1)//32)) AS j FROM s),
        |w AS (SELECT doc_id, j, c[CAST(j*32+1 AS INT) : CAST(j*32+64 AS INT)] AS win
        |  FROM j0),
        |f AS (SELECT doc_id, j,
        |    CAST(list_sum([x*x for x in win]) AS BIGINT) AS energy FROM w)
        |SELECT doc_id, COUNT(*) AS n_windows,
        |  CAST(SUM(CASE WHEN energy < 40000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_silent,
        |  CAST(SUM(CASE WHEN energy < 40000 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS silence_ratio
        |FROM f GROUP BY 1""".stripMargin) { (s, d) =>
      val ascii = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
      Multimodal.audioWindows(
          Multimodal.withBlob(ascii, "text", "source"), win = 64, hop = 32)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("energy") < 40000L, 1L).otherwise(0L)).as("n_silent"))
        .withColumn("silence_ratio",
          col("n_silent").cast("double") / col("n_windows"))
    },

    // --- decoded-dimension distribution (mm19): width/height/aspect
    // --- buckets over the batched decode — the media-inventory QA that
    // --- sizes resize targets and flags degenerate dimensions before a
    // --- vision pipeline commits to a patch grid. Aspect bucketed by
    // --- integer cross-multiplication (no float division of dims); one
    // --- rollup after the decode. ----------------------------------------
    q("mm19_dims_report",
      """WITH raw AS (SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes,
        |  CAST(list_sum(list_transform(regexp_split_to_array(text,''),
        |    x -> CAST(unicode(x) AS BIGINT))) AS BIGINT) % 2147483647 AS checksum
        |  FROM documents),
        |dims AS (SELECT doc_id, CAST(n_bytes % 64 + 1 AS INT) AS w,
        |  CAST(checksum % 64 + 1 AS INT) AS h FROM raw),
        |b AS (SELECT CASE WHEN w * 10 > h * 15 THEN 'wide'
        |    WHEN h * 10 > w * 15 THEN 'tall' ELSE 'square-ish' END AS aspect,
        |  w, h FROM dims)
        |SELECT aspect, COUNT(*) AS n,
        |  CAST(MIN(w) AS INT) AS min_w, CAST(MAX(w) AS INT) AS max_w,
        |  CAST(MIN(h) AS INT) AS min_h, CAST(MAX(h) AS INT) AS max_h
        |FROM b GROUP BY 1""".stripMargin) { (s, d) =>
      val metas = Multimodal.decodeBatched(
        Multimodal.withBlob(Tables.documents(s, d), "text", "source")).toDF()
      metas.select(col("width").as("w"), col("height").as("h"))
        .groupBy(
          when(col("w") * 10 > col("h") * 15, "wide")
            .when(col("h") * 10 > col("w") * 15, "tall")
            .otherwise("square-ish").as("aspect"))
        .agg(count(lit(1)).as("n"),
          min(col("w")).as("min_w"), max(col("w")).as("max_w"),
          min(col("h")).as("min_h"), max(col("h")).as("max_h"))
    },

    // --- keyframe selection (mm18): one representative frame per mm15
    // --- scene (its FIRST frame) — the sampling step between shot
    // --- detection and captioning/embedding that cuts downstream cost
    // --- from frames to scenes. Scene numbering = cumulative boundary
    // --- count before each frame (lag + running sum on the same
    // --- video-keyed exchange). Same planted A,A,A,B,B,C structure. ------
    q("mm18_keyframes",
      """WITH base AS (SELECT doc_id, text FROM documents
        |  WHERE strlen(text) = length(text) AND strlen(text) >= 192
        |    AND doc_id % 5 = 0),
        |a AS (SELECT doc_id, repeat(substr(text, 1, 64), 3)
        |    || repeat(substr(text, 65, 64), 2)
        |    || substr(text, 129, 64) AS text FROM base),
        |f AS (SELECT doc_id,
        |    unnest(generate_series(0, CAST((strlen(text)+63)//64 AS BIGINT)-1)) AS idx,
        |    text FROM a),
        |fr AS (SELECT doc_id, idx,
        |    substr(text, CAST(idx*64 AS INT)+1, 64) AS fr FROM f),
        |px AS (SELECT doc_id, idx,
        |  [CAST(unicode(substr(fr, CAST((i*strlen(fr))//64 AS INT)+1, 1)) AS BIGINT)
        |    for i in generate_series(0, 63)] AS px FROM fr),
        |mn AS (SELECT doc_id, idx, px, CAST(list_sum(px)//64 AS BIGINT) AS mean FROM px),
        |ph AS (SELECT doc_id, idx,
        |  CAST(list_sum([CASE WHEN px[i+33] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_hi,
        |  CAST(list_sum([CASE WHEN px[i+1] > mean THEN CAST(1 AS BIGINT) << i
        |    ELSE CAST(0 AS BIGINT) END for i in generate_series(0, 31)]) AS BIGINT) AS ph_lo
        |  FROM mn),
        |dd AS (SELECT doc_id, idx,
        |  bit_count(xor(ph_hi, lead(ph_hi) OVER w)) +
        |  bit_count(xor(ph_lo, lead(ph_lo) OVER w)) AS d
        |  FROM ph WINDOW w AS (PARTITION BY doc_id ORDER BY idx)),
        |sc AS (SELECT doc_id, idx,
        |  1 + CAST(SUM(CASE WHEN pd > 3 THEN 1 ELSE 0 END) OVER (
        |    PARTITION BY doc_id ORDER BY idx ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS scene
        |  FROM (SELECT doc_id, idx, lag(d) OVER (
        |    PARTITION BY doc_id ORDER BY idx) AS pd FROM dd) z)
        |SELECT doc_id, scene, MIN(idx) AS keyframe_idx,
        |  COUNT(*) AS n_frames
        |FROM sc GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) >= 192 && col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          concat(repeat(expr("substring(text, 1, 64)"), 3),
            repeat(expr("substring(text, 65, 64)"), 2),
            expr("substring(text, 129, 64)")).as("text"),
          lit("vid").as("fmt"))
      Multimodal.keyframes(Multimodal.withBlob(base, "text", "fmt"),
        frameBytes = 64, threshold = 3)
    },

    // --- audio fingerprint matching (mm14, the Shazam landmark shape):
    // --- consecutive-window zero-crossing pairs hash to compact landmarks;
    // --- a clip (hop-aligned excerpt of a track, planted at sample offset
    // --- 64 = window offset 2) matches the track whose landmarks agree at
    // --- ONE consistent window offset — the offset-histogram vote. The fp
    // --- equi-join is the inverted index (candidates bounded by fp df,
    // --- never clips × tracks); the vote is one partial-agg'd count. -------
    q("mm14_audio_fingerprint",
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE strlen(text) = length(text) AND strlen(text) > 0
        |  UNION ALL
        |  SELECT doc_id + 500000, substr(text, 65, 192) FROM documents
        |  WHERE strlen(text) = length(text) AND strlen(text) >= 256
        |    AND doc_id % 20 = 0),
        |s AS (SELECT doc_id, [CAST(unicode(substr(text, i, 1)) AS BIGINT) - 128
        |    for i in generate_series(1, strlen(text))] AS c FROM corpus),
        |j0 AS (SELECT doc_id, c,
        |    unnest(generate_series(0, (len(c)-1)//32)) AS j FROM s),
        |w AS (SELECT doc_id, j, c[CAST(j*32+1 AS INT) : CAST(j*32+64 AS INT)] AS win
        |  FROM j0),
        |f AS (SELECT doc_id, j,
        |    CAST(len([i for i in generate_series(1, len(win)-1)
        |      if (win[i] < 0) <> (win[i+1] < 0)]) AS BIGINT) * 64
        |    + (CAST(list_sum([x*x for x in win]) AS BIGINT) // 16) % 64 AS feat
        |  FROM w),
        |fp0 AS (SELECT doc_id, j, feat * 4096 + lead(feat) OVER (
        |    PARTITION BY doc_id ORDER BY j) AS fp FROM f),
        |fpx AS (SELECT doc_id, j, fp FROM fp0 WHERE fp IS NOT NULL),
        |cand AS (SELECT c.doc_id AS clip_id, t.doc_id AS track_id,
        |    t.j - c.j AS o, COUNT(*) AS n_matched
        |  FROM fpx c JOIN fpx t ON c.fp = t.fp
        |  WHERE c.doc_id >= 500000 AND t.doc_id < 500000
        |  GROUP BY 1, 2, 3)
        |SELECT clip_id, track_id, CAST(o AS BIGINT) AS win_offset, n_matched
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY clip_id
        |    ORDER BY n_matched DESC, track_id, o) AS rnk FROM cand) t
        |WHERE rnk = 1""".stripMargin) { (s, d) =>
      val ascii = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) > 0)
      val clips = Tables.documents(s, d)
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) >= 256 && col("doc_id") % 20 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          expr("substring(text, 65, 192)").as("text"), col("source"))
      val trackFps = Multimodal.audioFingerprints(
        Multimodal.withBlob(ascii, "text", "source"))
      val clipFps = Multimodal.audioFingerprints(
        Multimodal.withBlob(clips, "text", "source"))
      Multimodal.audioMatch(clipFps, trackFps)
        .select(col("clip_id"), col("track_id"),
          col("offset").cast("long").as("win_offset"), col("n_matched"))
    },

    q("mm13_cross_modal_align",
      s"""WITH $quantSql,
         |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |  x -> x <> '')) AS tok FROM documents),
         |c AS (SELECT doc_id, hv % 64 AS dim,
         |  CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END AS w
         |  FROM (SELECT doc_id,
         |    list_reduce(list_transform(regexp_split_to_array(
         |      substr(md5('21:' || tok), 1, 8), ''),
         |      ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
         |      (a, b) -> a*16 + b) AS hv FROM toks) t),
         |sv AS (SELECT doc_id, dim, CAST(SUM(w) AS BIGINT) AS v FROM c GROUP BY 1, 2),
         |dense AS (SELECT dd.doc_id, g.i AS dim,
         |  COALESCE(sv.v, CAST(0 AS BIGINT)) AS v
         |  FROM (SELECT DISTINCT doc_id FROM documents) dd
         |  CROSS JOIN generate_series(0, 63) g(i)
         |  LEFT JOIN sv ON sv.doc_id = dd.doc_id AND sv.dim = g.i),
         |tvec AS (SELECT doc_id, list(v ORDER BY dim) AS tv FROM dense GROUP BY 1),
         |scored AS (SELECT tvec.doc_id AS pair_id,
         |  CASE WHEN CAST(list_sum([tv[i]*tv[i] for i in generate_series(1, 64)]) AS BIGINT) = 0
         |        OR n.n2 = 0 THEN NULL
         |    ELSE CAST(CAST(list_sum([tv[i]*n.qv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(CAST(list_sum([tv[i]*tv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE))
         |         * sqrt(CAST(n.n2 AS DOUBLE))) END AS score
         |  FROM tvec JOIN n ON n.vec_id = tvec.doc_id)
         |SELECT pair_id, score, score >= 0 AS aligned FROM scored""".stripMargin) { (s, d) =>
      Similarity.crossModalAlign(Tables.documents(s, d), "doc_id", "text",
        Tables.embeddings(s, d), "vec_id", "embedding")
    },

    // --- cross-modal retrieval evaluation (mm16): the recall metric a
    // --- CLIP-style pairing ships with — for each probe caption, rank ALL
    // --- images by the alignment score and report where the caption's OWN
    // --- paired image landed (rank + hit@10 flag). Ties rank (score DESC,
    // --- image id) — total order, hash-exact. Probes bounded to 10
    // --- captions; the corpus-side scan composes with any ANN index at
    // --- 100 TB, the rank stays one window per probe. ---------------------
    q("mm16_cross_modal_recall",
      s"""WITH $quantSql,
         |toks AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
         |  x -> x <> '')) AS tok FROM documents WHERE doc_id < 10),
         |c AS (SELECT doc_id, hv % 64 AS dim,
         |  CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END AS w
         |  FROM (SELECT doc_id,
         |    list_reduce(list_transform(regexp_split_to_array(
         |      substr(md5('21:' || tok), 1, 8), ''),
         |      ch -> CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)),
         |      (a, b) -> a*16 + b) AS hv FROM toks) t),
         |sv AS (SELECT doc_id, dim, CAST(SUM(w) AS BIGINT) AS v FROM c GROUP BY 1, 2),
         |dense AS (SELECT dd.doc_id, g.i AS dim,
         |  COALESCE(sv.v, CAST(0 AS BIGINT)) AS v
         |  FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 10) dd
         |  CROSS JOIN generate_series(0, 63) g(i)
         |  LEFT JOIN sv ON sv.doc_id = dd.doc_id AND sv.dim = g.i),
         |tvec AS (SELECT doc_id, list(v ORDER BY dim) AS tv FROM dense GROUP BY 1),
         |scored AS (SELECT tvec.doc_id AS probe_id, n.vec_id AS image_id,
         |  CAST(CAST(list_sum([tv[i]*n.qv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE)
         |    / (sqrt(CAST(CAST(list_sum([tv[i]*tv[i] for i in generate_series(1, 64)]) AS BIGINT) AS DOUBLE))
         |       * sqrt(CAST(n.n2 AS DOUBLE))) AS score
         |  FROM tvec CROSS JOIN n),
         |ranked AS (SELECT probe_id, image_id,
         |  ROW_NUMBER() OVER (PARTITION BY probe_id
         |    ORDER BY score DESC, image_id) AS rnk FROM scored)
         |SELECT probe_id, CAST(rnk AS BIGINT) AS own_rank,
         |  rnk <= 10 AS hit_at_10
         |FROM ranked WHERE image_id = probe_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val probes = Tables.documents(s, d).filter(col("doc_id") < 10)
      val tv = Similarity.crossModalTextVectors(probes, "doc_id", "text")
      val iv = Tables.embeddings(s, d)
        .select(col("vec_id").as("image_id"),
          Similarity.quantize(col("embedding")).as("qv"))
      val n2t = Similarity.dotQ(col("tv"), col("tv"))
      val n2v = Similarity.dotQ(col("qv"), col("qv"))
      // image corpus streamed / ≤10 text probes broadcast (vec39 rule)
      iv.crossJoin(broadcast(tv))
        .select(col("doc_id").as("probe_id"), col("image_id"),
          (Similarity.dotQ(col("tv"), col("qv")).cast("double") /
            (sqrt(n2t.cast("double")) * sqrt(n2v.cast("double"))))
            .as("score"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("probe_id"))
            .orderBy(col("score").desc, col("image_id"))))
        .filter(col("image_id") === col("probe_id"))
        .select(col("probe_id"), col("rnk").cast("long").as("own_rank"),
          (col("rnk") <= 10).as("hit_at_10"))
    },

    // --- RANGE (radius) search (vec36): every neighbor with quantized
    // --- cosine ≥ 0.3 — the "everything at least this similar" half of the
    // --- ANN surface, where the number of qualifying neighbors is the
    // --- unknown (dedup sweeps, recall calibration). The threshold is
    // --- exact-integer by cross-multiplication (dot ≥ 0 ∧ 100·dot² ≥
    // --- 9·n2p·n2c), so set membership can never flake on float rounding;
    // --- the reported sim is one IEEE division. Norms precomputed per side
    // --- — each pair pays exactly one fused-loop dot product. -------------
    q("vec36_radius_search",
      s"""WITH $quantSql,
         |pairs AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |  CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS dot,
         |  p.n2 AS n2p, c.n2 AS n2c
         |  FROM n p, n c WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id)
         |SELECT probe_id, neighbor_id,
         |  CAST(dot AS DOUBLE)/(sqrt(CAST(n2p AS DOUBLE))*sqrt(CAST(n2c AS DOUBLE))) AS sim
         |FROM pairs WHERE dot >= 0 AND 100*dot*dot >= 9*n2p*n2c""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.radiusSearch(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", minCosNum = 3, minCosDen = 10)
    },

    // --- IVF-pruned radius search (vec37): vec36's threshold restricted to
    // --- each probe's 4 nearest cells — the scale path, paying
    // --- Σ|probed cell| per probe instead of the corpus. Neighbors live in
    // --- exactly one cell (no dedup stage); membership still decided by
    // --- the exact integer cross-multiplication. The oracle replays the
    // --- full deterministic pipeline: seeded Lloyd training, assignment,
    // --- probe-cell selection, in-cell radius filter. ---------------------
    q("vec37_radius_indexed",
      s"""WITH $quantSql,
         |c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, qv AS cv
         |  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 16) s),
         |${lloydSql(1, "c0", "q")},
         |${lloydSql(2, "c1", "q")},
         |${assignSql("idx", "neighbor_id", "q")},
         |${assignSql("pc", "probe_id", "n", " WHERE n.vec_id < 10", "rn <= 4")},
         |scored AS (SELECT pc.probe_id, idx.neighbor_id,
         |  CAST(list_sum([p.qv[i]*c.qv[i] for i in generate_series(1, len(p.qv))]) AS BIGINT) AS dot,
         |  p.n2 AS n2p, c.n2 AS n2c
         |  FROM pc JOIN idx ON pc.cell = idx.cell
         |  JOIN n p ON p.vec_id = pc.probe_id
         |  JOIN n c ON c.vec_id = idx.neighbor_id
         |  WHERE idx.neighbor_id <> pc.probe_id)
         |SELECT probe_id, neighbor_id,
         |  CAST(dot AS DOUBLE)/(sqrt(CAST(n2p AS DOUBLE))*sqrt(CAST(n2c AS DOUBLE))) AS sim
         |FROM scored WHERE dot >= 0 AND 100*dot*dot >= 9*n2p*n2c""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val idx = graft.operators.IvfIndex.build(emb, "vec_id", "embedding",
        nLists = 16, iters = 2)
      graft.operators.IvfIndex.radiusSearchIndex(
        emb.filter(col("vec_id") < 10), idx, "vec_id", "embedding",
        minCosNum = 3, minCosDen = 10, nProbe = 4)
    },

    // --- MMR diversified retrieval, single-exchange variant (vec38):
    // --- vec20's greedy semantics at the LARGE-k execution shape — one
    // --- flatMapGroups re-rank per probe (ONE shuffle for any k) instead
    // --- of vec20's k chained window+join rounds; k=5 over 16 candidates
    // --- here vs vec20's 3-of-8 (equivalence spec-pinned). Scores are
    // --- hash-compared as DOUBLES (λ = 1/2 is an exact IEEE halving over
    // --- quantized integer dots). The oracle re-derives the greedy loop
    // --- as k−1 UNROLLED CTE stages (the txt33/vec05 discipline): each
    // --- stage excludes the selected set, scores every remaining
    // --- candidate 0.5·rel − 0.5·MAX(sim to selected), and picks by
    // --- (score DESC, cand_id) — the operator's strict-> tie-break. ------
    q("vec38_mmr_rerank", mmrSql(nProbes = 8, nCand = 16, k = 5)) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.Similarity.mmrTopK(emb.filter(col("vec_id") < 8), emb,
        "vec_id", "embedding", candidates = 16, k = 5)
    },

    // --- HARD-NEGATIVE MINING (vec39): the contrastive-training curation
    // --- step — per anchor, the k most-similar corpus vectors that are
    // --- neither near-duplicates (sim < 0.999, vec13's leak rule: a
    // --- paraphrase mined as a "negative" is a FALSE negative that
    // --- corrupts the loss) nor from the anchor's own label group (same
    // --- group = presumed positive). Both exclusions are PLANTED
    // --- load-bearing: each anchor is a verbatim copy of a corpus vector
    // --- under a ROTATED label, so its twin (sim 1.0, different label)
    // --- tops the ranking unless the dup ceiling removes it, and the
    // --- anchor's own label class is populated so the label rule prunes
    // --- real candidates. Brute scoring here is the gate-scale exactness
    // --- baseline; hardNegativesIndexed is the probed-cells scale path
    // --- (equality at full probe spec-pinned). -----------------------------
    q("vec39_hard_negatives",
      s"""WITH $quantSql,
         |lab AS (SELECT vec_id, label FROM embeddings),
         |anch AS (SELECT n.vec_id + 50000 AS vec_id, n.qv, n.n2,
         |    CAST((l.label + 1) % 10 AS INT) AS label
         |  FROM n JOIN lab l ON l.vec_id = n.vec_id WHERE n.vec_id < 10),
         |scored AS (SELECT a.vec_id AS probe_id, c.vec_id AS neighbor_id,
         |    l.label AS neighbor_label,
         |    CAST(CAST(list_sum([a.qv[i]*c.qv[i] for i in generate_series(1, len(a.qv))]) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(a.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) AS sim
         |  FROM anch a, n c JOIN lab l ON l.vec_id = c.vec_id
         |  WHERE a.label <> l.label)
         |SELECT probe_id, neighbor_id, neighbor_label, sim, rank FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored WHERE sim < 0.999) t WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val anchors = emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + 50000).as("vec_id"), col("embedding"),
          ((col("label") + 1) % 10).as("label"))
      graft.operators.Similarity.hardNegatives(anchors, emb,
        "vec_id", "embedding", "label", k = 5)
    },

    // --- HARD-NEGATIVE SHORTFALL (vec40): the report that makes vec39's
    // --- silent failure mode loud — when the dup-ceiling + same-label
    // --- exclusions (or a thin candidate pool) leave an anchor with fewer
    // --- than k negatives, a training pipeline skews quietly. PLANTED
    // --- starvation: a 12-vector corpus under BINARY labels with k = 12
    // --- guarantees every anchor falls short (eligible ≤ 11 — the
    // --- anchor's own class is never empty, its verbatim twin lives
    // --- there), and the report must still carry one row per anchor. At
    // --- full probe + covering overfetch the indexed candidate set is the
    // --- whole corpus, so DuckDB reproduces n_returned as the exact
    // --- eligible count. ---------------------------------------------------
    q("vec40_hard_negative_shortfall",
      s"""WITH $quantSql,
         |c AS (SELECT n.vec_id, n.qv, n.n2, CAST(e.label % 2 AS INT) AS label
         |  FROM n JOIN embeddings e ON e.vec_id = n.vec_id
         |  WHERE n.vec_id < 12),
         |anch AS (SELECT vec_id + 90000 AS probe_id, qv, n2, label
         |  FROM c WHERE vec_id < 3),
         |elig AS (SELECT a.probe_id, COUNT(*) AS cnt
         |  FROM anch a JOIN c ON c.label <> a.label
         |  WHERE CAST(CAST(list_sum([a.qv[i]*c.qv[i] for i in generate_series(1, len(a.qv))]) AS BIGINT) AS DOUBLE)
         |      / (sqrt(CAST(a.n2 AS DOUBLE))*sqrt(CAST(c.n2 AS DOUBLE))) < 0.999
         |  GROUP BY a.probe_id)
         |SELECT a.probe_id,
         |  CAST(COALESCE(LEAST(12, e.cnt), 0) AS BIGINT) AS n_returned,
         |  CAST(12 - COALESCE(LEAST(12, e.cnt), 0) AS BIGINT) AS shortfall
         |FROM anch a LEFT JOIN elig e ON e.probe_id = a.probe_id""".stripMargin) { (s, d) =>
      val corpus = Tables.embeddings(s, d).filter(col("vec_id") < 12)
        .select(col("vec_id"), col("embedding"),
          (col("label") % 2).cast("int").as("label"))
      val anchors = corpus.filter(col("vec_id") < 3)
        .select((col("vec_id") + 90000).as("vec_id"), col("embedding"),
          col("label"))
      val idx = graft.operators.IvfIndex.build(corpus, "vec_id", "embedding",
        nLists = 4, iters = 2)
      val labels = corpus.select(col("vec_id"), col("label"))
        .unionByName(anchors.select(col("vec_id"), col("label")))
      graft.operators.Similarity.hardNegativeShortfall(idx, anchors, labels,
        "vec_id", "embedding", "label", k = 12, nProbe = 4, overfetch = 4)
    }
  )
}
