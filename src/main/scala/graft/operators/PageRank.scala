package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative link-analysis ranking (PageRank) as pure declarative dataframe
  * iterations — the Pregel-style message pass written so Catalyst sees one
  * join + one partial-aggregated shuffle per round.
  *
  * All arithmetic is INTEGER: ranks live in fixed-point units (`initRank`
  * per node), per-edge contributions are floor divisions `r div outdeg`,
  * and damping is the rational `dampNum/dampDen` applied as
  * `(dampNum·Σcontrib) div dampDen`. Floor-division PageRank converges to
  * the same ordering as the float version while being bit-identical on
  * every engine and under every partitioning — the property that makes a
  * full value oracle possible (the vec05 unrolled-Lloyd discipline, applied
  * to graphs). Mass lost to flooring and to out-degree-zero sinks is NOT
  * redistributed (documented drift from textbook PageRank; irrelevant to
  * ranking and to the fixed-iteration contract).
  *
  * Scale shape per iteration: edges ⋈ (ranks ⋈ outdeg) on `src` — two hash
  * joins that share one key, so one exchange of the (small) rank table and
  * one of edges; contributions partial-aggregate map-side before the `dst`
  * shuffle. Nothing driver-side, no collects; at 100 TB pre-partition
  * edges by `src` once (bucketed write) and every iteration consumes the
  * layout.
  */
object PageRank {

  /** `iters` rounds over directed `edges(srcCol, dstCol)`. Returns
    * (node, r BIGINT) for every node appearing as src or dst.
    */
  def integerPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, initRank: Long = 1000000L,
      dampNum: Long = 850L, dampDen: Long = 1000L): DataFrame = {
    require(iters >= 0, s"iters must be ≥ 0: $iters")
    require(dampNum >= 0 && dampNum <= dampDen, s"damping not in [0,1]")
    val src = col(srcCol)
    val nodes = edges.select(src.as("node"))
      .unionByName(edges.select(col(dstCol).as("node")))
      .distinct()
    val outdeg = edges.groupBy(src.as("node")).agg(count(lit(1)).as("od"))
    val teleport = initRank - initRank * dampNum / dampDen
    var ranks = nodes.withColumn("r", lit(initRank))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.join(outdeg, Seq("node")), edges(srcCol) === col("node"))
        .select(col(dstCol).as("node"), expr("r div od").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen"))
            .as("r"))
    }
    ranks
  }
}
