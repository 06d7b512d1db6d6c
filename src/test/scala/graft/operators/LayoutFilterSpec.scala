package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RuntimeFilter (Bloom semi-join reduction) + Layout (Z-order clustering):
  * the two layout/pruning scale patterns, pinned at the property level here
  * (their result-level gates are q40/q41).
  */
class LayoutFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed co-located join: no exchange on either side at read time") {
    val dir = "/root/testdata/sf0.001"
    val wh = java.nio.file.Files.createTempDirectory("buck").toString
    spark.sql("DROP TABLE IF EXISTS bjs_li")
    spark.sql("DROP TABLE IF EXISTS bjs_ord")
    graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .write.option("path", s"$wh/li")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("bjs_li")
    graft.Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
      .write.option("path", s"$wh/ord")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("bjs_ord")
    // broadcast off so the plan must choose sort-merge — the property under
    // test is that the bucketed layout makes that join exchange-free
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bjs_li")
        .join(spark.table("bjs_ord"), col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must read the layout, not shuffle:\n$p")
      // and the rows are the same as the plain (shuffling) path
      val plain = graft.Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_quantity")
        .join(graft.Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
      assert(j.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bloom prune never drops a present key (no false negatives)") {
    val dim = (0L until 1000L).toDF("dk")
    val fact = (0L until 1000L).toDF("fk")
    // every fact key IS a dim key ⇒ prune must keep all 1000
    val kept = RuntimeFilter.prune(fact, dim, "fk", "dk").count()
    assert(kept == 1000L)
  }

  test("bloom prune sheds the non-matching bulk") {
    val dim = (0L until 100L).toDF("dk")
    val fact = (0L until 50000L).toDF("fk")
    val kept = RuntimeFilter.prune(fact, dim, "fk", "dk").count()
    // 100 true matches + Bloom false positives; at 1<<17 bits / 100 keys the
    // fp rate is ~0 — anything under 1% of the fact proves real pruning
    assert(kept >= 100L, s"dropped true matches: $kept")
    assert(kept < 500L, s"pruned too little: $kept of 50000")
  }

  test("bloom-pruned join is bit-identical to the plain join") {
    val dir = "/root/testdata/sf0.001"
    val dim = graft.Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
    val fact = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"))
    val pruned = RuntimeFilter.prunedJoin(fact, dim, "l_orderkey", "o_orderkey")
      .select("l_orderkey", "o_orderkey", "l_quantity", "o_totalprice")
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "o_orderkey", "l_quantity", "o_totalprice")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("morton2 interleaves bits (known values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 0L), (0L, 3L),
      (65535L, 65535L), (0xAAAAL, 0x5555L)).toDF("x", "y")
      .select(Layout.morton2(col("x"), col("y")).as("z"))
    val zs = df.as[Long].collect().toSeq
    assert(zs == Seq(0L, 1L, 2L, 3L, 5L, 10L, 0xFFFFFFFFL,
      // x=1010…  in even bits, y=0101… in odd bits
      (0 until 16).map { i =>
        val xb = (0xAAAA >> i) & 1; val yb = (0x5555 >> i) & 1
        (xb.toLong << (2 * i)) | (yb.toLong << (2 * i + 1))
      }.sum))
  }

  test("hilbert2: bijection + unit-step locality on the full 16×16 grid") {
    // the defining property Z-order lacks: walking the curve in d-order
    // moves exactly ONE cell (Manhattan) per step. Checking every cell of
    // a 4-bit grid validates all rotation/reflection branches.
    val cells = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .select($"x", $"y", Layout.hilbert2($"x", $"y", bits = 4).as("d"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(got.map(_._3).toSeq == (0L until 256L), "d must be a bijection")
    got.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1)→($x2,$y2)")
    }
    // full-width agreement with the straight-line reference walk
    def ref(bits: Int, x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L); var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(64)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val wide = pts.toDF("x", "y")
      .select($"x", $"y", Layout.hilbert2($"x", $"y").as("d"))
      .as[(Long, Long, Long)].collect()
    wide.foreach { case (x, y, d) => assert(d == ref(16, x, y), s"($x,$y)") }
  }

  test("z-ordered layout clusters a 2-D box into few files") {
    val path = java.nio.file.Files.createTempDirectory("zorder").toString
    // 64×64 grid, 16 files ⇒ 256 rows/file; a Z-ordered 8×8 box at the
    // origin is the first 64 Morton keys — one file's worth of key range
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val reloaded = Layout.writeZOrdered(grid, "x", "y", path, numFiles = 16)
    assert(reloaded.count() == 4096L)
    val boxFiles = reloaded.filter(col("x") < 8 && col("y") < 8)
      .select(input_file_name()).distinct().count()
    val allFiles = reloaded.select(input_file_name()).distinct().count()
    assert(allFiles >= 8L, s"expected many files, got $allFiles")
    assert(boxFiles <= 2L, s"box touched $boxFiles of $allFiles files")

    // control: the single-column sort layout scatters the SAME box across
    // ~every file (x-sorted files each span all y values), which is exactly
    // the stats-pruning failure Z-ordering removes
    val xPath = java.nio.file.Files.createTempDirectory("xorder").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xPath)
    val xOrdered = spark.read.parquet(xPath)
    val xBoxFiles = xOrdered.filter(col("y") < 8)
      .select(input_file_name()).distinct().count()
    val xAllFiles = xOrdered.select(input_file_name()).distinct().count()
    assert(xBoxFiles == xAllFiles,
      s"x-sorted control should scatter: $xBoxFiles of $xAllFiles")

    // Hilbert layout achieves the same box locality — and because the curve
    // enters an aligned 2^k-subsquare once and finishes it before leaving
    // (Z-order re-enters), the origin box is ONE contiguous key range
    val hPath = java.nio.file.Files.createTempDirectory("hilbert").toString
    val hReloaded = Layout.writeHilbertOrdered(grid, "x", "y", hPath, numFiles = 16)
    assert(hReloaded.count() == 4096L)
    val hBoxFiles = hReloaded.filter(col("x") < 8 && col("y") < 8)
      .select(input_file_name()).distinct().count()
    val hAllFiles = hReloaded.select(input_file_name()).distinct().count()
    assert(hAllFiles >= 8L, s"expected many files, got $hAllFiles")
    assert(hBoxFiles <= 2L, s"box touched $hBoxFiles of $hAllFiles files")
  }
}
