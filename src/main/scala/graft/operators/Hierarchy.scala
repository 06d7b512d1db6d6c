package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive-hierarchy operators — the `WITH RECURSIVE` surface Spark SQL
  * lacks, rebuilt as PATH DOUBLING rather than the oracle's one-step
  * recursion: after round r every node knows its ancestors up to distance
  * 2^r, so a depth-d hierarchy closes in ⌈log2 d⌉ self-joins instead of d
  * dependent steps. At 100 TB that is the difference between ~40 shuffles
  * and ~a million: recursion depth costs log rounds, each a hash equi-join
  * partitioned the same way (txt10's large-star/small-star discipline,
  * specialized to forests where the closure is exactly the ancestor
  * relation).
  */
object Hierarchy {

  /** Ancestor closure of a forest: edges are (child, parent) rows — each
    * child has at most ONE parent (a tree/forest, the org-chart / category
    * / filesystem shape); roots simply don't appear as children. Returns
    * every (node, anc, dist) with dist ≥ 1, i.e. the full transitive
    * closure of the parent relation.
    *
    * Each doubling round joins the frontier (longest-known jump per node)
    * with the closure so far and stops when no longer path exists — the
    * loop is driver-side but runs O(log depth) rounds, each one
    * partitioned join; the closure itself (O(nodes·depth) rows) never
    * collects. Cycles would loop forever in the oracle's recursion too —
    * guarded here by `maxDepth` (default 2^20) so corrupt data fails
    * loudly instead of hanging the cluster.
    */
  def ancestorClosure(edges: DataFrame, childCol: String, parentCol: String,
      maxDepth: Long = 1L << 20): DataFrame = {
    val e = edges.select(col(childCol).as("node"), col(parentCol).as("anc"))
      .withColumn("dist", lit(1L))
    var closure = e           // all paths with dist ≤ 2^r
    var frontier = e          // the dist = 2^r paths only
    var depth = 1L
    var done = false
    // each round persists its frontier; checkpointing the closure truncates
    // the union's lineage so the PREVIOUS round's cache can be released —
    // without this the loop pins O(log depth) cached frontiers and an
    // ever-deepening plan (the Dedup CC-loop discipline)
    var prevCached: Option[DataFrame] = None
    while (!done) {
      // frontier ∘ closure: extend each longest jump by every known path
      // of its endpoint — yields all dists in (2^r, 2^(r+1)]
      val ext = frontier
        .select(col("node"), col("anc").as("mid"), col("dist").as("d1"))
        .join(closure.select(col("node").as("mid"), col("anc"),
          col("dist").as("d2")), Seq("mid"))
        .select(col("node"), col("anc"), (col("d1") + col("d2")).as("dist"))
      val extC = ext.persist()
      if (extC.isEmpty) { extC.unpersist(); done = true }
      else {
        closure = closure.unionByName(extC).localCheckpoint()
        prevCached.foreach(_.unpersist())
        prevCached = Some(extC)
        frontier = extC.filter(col("dist") === depth * 2)
        depth *= 2
        require(depth <= maxDepth,
          s"hierarchy deeper than $maxDepth — cycle in the parent relation?")
      }
    }
    prevCached.foreach(_.unpersist()) // closure is checkpointed — safe
    closure
  }

  /** Per-node rollup over the closure: depth (distance to its root), the
    * root itself, and subtree aggregates over all DESCENDANTS including the
    * node (count + a summed value column, decimal-cast for exactness).
    * `nodes` must provide (idCol, valCol); `edges` as in
    * [[ancestorClosure]]. The reflexive closure is added here so every
    * node — including leaves and isolated roots — rolls up at least
    * itself.
    */
  def rollup(nodes: DataFrame, edges: DataFrame, idCol: String,
      valCol: String, childCol: String, parentCol: String): DataFrame = {
    val closure = ancestorClosure(edges, childCol, parentCol)
    val reflexive = nodes.select(col(idCol).as("node"),
        col(idCol).as("anc"), lit(0L).as("dist"))
      .unionByName(closure)
    val vals = nodes.select(col(idCol).as("node"),
      Qlocal.dec(col(valCol)).as("_v"))
    // depth/root: the node's longest upward path (roots: dist 0 to self)
    val up = reflexive.groupBy(col("node"))
      .agg(max(struct(col("dist"), col("anc"))).as("_t"))
      .select(col("node"), col("_t.dist").as("depth"),
        col("_t.anc").as("root"))
    // subtree: group the closure by ancestor over descendant values
    val down = reflexive.join(vals, Seq("node"))
      .groupBy(col("anc"))
      .agg(count(lit(1)).as("n_subtree"),
        sum(col("_v")).cast("double").as("subtree_val"))
    up.join(down, up("node") === down("anc"))
      .select(col("node"), col("depth"), col("root"),
        col("n_subtree"), col("subtree_val"))
  }

  /** QUANTITY-WEIGHTED rollup — the BOM explosion: edge (child, parent,
    * qty) means the parent assembly uses `qty` units of the child; the
    * effective units of a descendant in an ancestor is the PRODUCT of
    * quantities along the path. Per node (assembly) this returns the
    * descendant count and total effective units (descendants including
    * itself at weight 1) — the "how many screws in the airplane" query.
    *
    * FOREST contract (each child one parent ⇒ one path per (node, anc)),
    * which is what lets path doubling carry the product without a
    * same-pair sum; integer quantities keep everything exact. Same
    * O(log depth) loop shape as [[ancestorClosure]].
    */
  def weightedRollup(nodes: DataFrame, edges: DataFrame, idCol: String,
      childCol: String, parentCol: String, qtyCol: String,
      maxDepth: Long = 1L << 20): DataFrame = {
    val e = edges.select(col(childCol).as("node"), col(parentCol).as("anc"),
      col(qtyCol).cast("long").as("w")).withColumn("dist", lit(1L))
    var closure = e
    var frontier = e
    var depth = 1L
    var done = false
    // same cache/lineage discipline as [[ancestorClosure]]
    var prevCached: Option[DataFrame] = None
    while (!done) {
      val ext = frontier
        .select(col("node"), col("anc").as("mid"), col("w").as("w1"),
          col("dist").as("d1"))
        .join(closure.select(col("node").as("mid"), col("anc"),
          col("w").as("w2"), col("dist").as("d2")), Seq("mid"))
        .select(col("node"), col("anc"), (col("w1") * col("w2")).as("w"),
          (col("d1") + col("d2")).as("dist"))
      val extC = ext.persist()
      if (extC.isEmpty) { extC.unpersist(); done = true }
      else {
        closure = closure.unionByName(extC).localCheckpoint()
        prevCached.foreach(_.unpersist())
        prevCached = Some(extC)
        frontier = extC.filter(col("dist") === depth * 2)
        depth *= 2
        require(depth <= maxDepth,
          s"hierarchy deeper than $maxDepth — cycle in the parent relation?")
      }
    }
    prevCached.foreach(_.unpersist())
    val reflexive = nodes.select(col(idCol).as("node"),
        col(idCol).as("anc"), lit(1L).as("w"), lit(0L).as("dist"))
      .unionByName(closure)
    reflexive.groupBy(col("anc"))
      .agg(count(lit(1)).as("n_desc"), sum(col("w")).as("total_units"))
      .select(col("anc").as("node"), col("n_desc"), col("total_units"))
  }

  private object Qlocal {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.types.DecimalType
    def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  }
}
