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

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Quantized cosine similarity (double; deterministic). */
  def cosineQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Brute-force top-k neighbors for each probe (probe ≠ neighbor).
    * probes/corpus: (id, vec) DataFrames with the given column names.
    */
  def knnBrute(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pq"))
    val c = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("cq"))
    val scored = p.crossJoin(c)
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosineQ(col("pq"), col("cq")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Default hyperplane count. Buckets ≈ 2^planes: pick ~log2(corpus /
    * desired-candidates) — 4 bits ⇒ ~corpus/16 candidates per probe. More
    * planes = finer buckets = faster but lower recall (multi-probe or
    * multiple tables recover it; single-table kept here for clarity).
    */
  val NumPlanes = 4

  /** Deterministic ±1 hyperplane weight for (plane, dim): parity of the first
    * hex digit of md5("p_i") — the same portable md5 hash family as TextOps.
    */
  def planeWeight(plane: Column, dim: Column): Column =
    when(conv(substring(md5(concat(plane.cast("string"), lit("_"),
      dim.cast("string"))), 1, 1), 16, 10)
      .cast("long") % 2 === 0, 1L).otherwise(-1L)

  /** LSH bucket id from plane ids [first, first+count): local bit j =
    * [Σ_i w(first+j, i)·q_i ≥ 0].
    */
  def lshBucket(vecQ: Column, firstPlane: Int, count: Int): Column = {
    val bits = (0 until count).map { j =>
      val dot = aggregate(
        zip_with(vecQ, sequence(lit(0), size(vecQ) - 1),
          (x, i) => x * planeWeight(lit(firstPlane + j), i)),
        lit(0L), (acc, x) => acc + x)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Default multi-table layout: 4 tables × 4 planes. Recall that a single
    * hash table misses (a similar pair split by one plane) is recovered by
    * the union over independent tables — the standard LSH recall/cost dial.
    */
  val NumTables = 4

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
    val c = withBuckets(corpus.select(col(idCol).as("neighbor_id"),
      quantize(col(vecCol)).as("cq")), "neighbor_id", "cq")
    val p = withBuckets(probes.select(col(idCol).as("probe_id"),
      quantize(col(vecCol)).as("pq")), "probe_id", "pq")
    val scored = p.join(c, Seq("htable", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"), col("pq"), col("cq"))
      .distinct() // candidate may collide in several tables — score once
      .select(col("probe_id"), col("neighbor_id"),
        cosineQ(col("pq"), col("cq")).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
