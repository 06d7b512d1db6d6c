package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hierarchy (recursive closure via path doubling): the operator must equal
  * the straight-line ancestor walk on any forest — including chains far
  * deeper than one doubling round — and the rollup must aggregate exactly
  * the subtree.
  */
class HierarchySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def naiveClosure(parent: Map[Long, Long]): Set[(Long, Long, Long)] =
    parent.keys.flatMap { n =>
      Iterator.iterate(Option(n))(_.flatMap(parent.get))
        .drop(1).takeWhile(_.isDefined).zipWithIndex
        .map { case (anc, i) => (n, anc.get, i + 1L) }.toSeq
    }.toSet

  test("ancestorClosure ≡ straight-line walk on a 70-deep chain (log rounds)") {
    import spark.implicits._
    val parent = (1L until 70L).map(i => i -> (i - 1)).toMap
    val edges = parent.toSeq.toDF("child", "parent")
    val got = Hierarchy.ancestorClosure(edges, "child", "parent")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naiveClosure(parent))
    assert(got.size == (69 * 70) / 2)
  }

  test("ancestorClosure ≡ straight-line walk on a random forest") {
    import spark.implicits._
    val rnd = new scala.util.Random(51)
    // node i's parent is a random earlier node — acyclic by construction;
    // a fifth of the nodes are roots (no parent edge at all)
    val parent = (1L until 200L).flatMap { i =>
      if (rnd.nextInt(5) == 0) None else Some(i -> rnd.nextLong(i))
    }.toMap
    val edges = parent.toSeq.toDF("child", "parent")
    val got = Hierarchy.ancestorClosure(edges, "child", "parent")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == naiveClosure(parent))
  }

  test("rollup: depth, root, and subtree aggregates on a known tree") {
    import spark.implicits._
    //        0(10.0)
    //       /       \
    //    1(1.5)    2(2.25)
    //    /    \
    // 3(4.0) 4(8.0)
    val nodes = Seq((0L, 10.0), (1L, 1.5), (2L, 2.25), (3L, 4.0), (4L, 8.0))
      .toDF("id", "bal")
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("child", "parent")
    val got = Hierarchy.rollup(nodes, edges, "id", "bal", "child", "parent")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, 0L, 0L, 5L, 25.75)))
    assert(got(1L) == ((1L, 1L, 0L, 3L, 13.5)))
    assert(got(2L) == ((2L, 1L, 0L, 1L, 2.25)))
    assert(got(3L) == ((3L, 2L, 0L, 1L, 4.0)))
    assert(got(4L) == ((4L, 2L, 0L, 1L, 8.0)))
  }

  test("native WITH RECURSIVE (UnionLoop) ≡ the path-doubling operator") {
    import spark.implicits._
    val s2 = spark.newSession()
    val sup = graft.Tables.supplier(s2, "/root/testdata/sf0.001")
    sup.createOrReplaceTempView("supplier")
    val df = s2.sql(
      """WITH RECURSIVE walk(node, anc, dist) AS (
        |  SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT) FROM supplier
        |  UNION ALL
        |  SELECT w.node, CAST((w.anc - 1 - ((w.anc - 1) % 2)) / 2 AS BIGINT),
        |    w.dist + 1
        |  FROM walk w WHERE w.anc >= 1)
        |SELECT node, depth, root FROM (
        |  SELECT node, dist AS depth, anc AS root,
        |    ROW_NUMBER() OVER (PARTITION BY node ORDER BY dist DESC) AS rn
        |  FROM walk) t WHERE rn = 1""".stripMargin)
    // the engine's own recursion must actually be in the plan
    assert(df.queryExecution.executedPlan.toString.contains("UnionLoop"),
      "WITH RECURSIVE must plan as the native UnionLoop execution")
    val native = df.as[(Long, Long, Long)].collect().toSet
    val edges = sup.filter(col("s_suppkey") >= 1)
      .select(col("s_suppkey").as("child"),
        expr("(s_suppkey - 1) div 2").cast("long").as("parent"))
    val doubling = Hierarchy.rollup(sup, edges, "s_suppkey", "s_acctbal",
        "child", "parent")
      .select("node", "depth", "root").as[(Long, Long, Long)].collect().toSet
    assert(native == doubling,
      "native recursion and path doubling must agree on depth/root")
  }

  test("rollup: an isolated root (no edges at all) rolls up itself") {
    import spark.implicits._
    val nodes = Seq((7L, 3.0)).toDF("id", "bal")
    val edges = Seq.empty[(Long, Long)].toDF("child", "parent")
    val got = Hierarchy.rollup(nodes, edges, "id", "bal", "child", "parent")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((7L, 0L, 7L, 1L, 3.0)))
  }

  test("weightedRollup: hand-computed BOM; deep chain multiplies through doubling") {
    import spark.implicits._
    // 0 uses 2× node1 and 3× node2; node1 uses 4× node3
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 0L, 2L), (2L, 0L, 3L), (3L, 1L, 4L))
      .toDF("child", "parent", "qty")
    val got = Hierarchy.weightedRollup(nodes, edges, "id",
        "child", "parent", "qty")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // in 0: self 1 + 1×2 + 2×3 + 3×(4·2)=8 → 14 units over 4 nodes
    assert(got(0L) == ((4L, 14L)))
    assert(got(1L) == ((2L, 5L)))   // self + 4× node3
    assert(got(2L) == ((1L, 1L)))
    assert(got(3L) == ((1L, 1L)))
    // 10-deep chain, qty 2 per hop: root units = Σ 2^i = 2^10 − 1 — paths
    // longer than one doubling round must still multiply correctly
    val n = 10
    val chainNodes = (0 until n).map(_.toLong).toDF("id")
    val chainEdges = (1 until n).map(i => (i.toLong, i.toLong - 1, 2L))
      .toDF("child", "parent", "qty")
    val chain = Hierarchy.weightedRollup(chainNodes, chainEdges, "id",
        "child", "parent", "qty")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(chain(0L) == (1L << n) - 1)
  }
}
