package graft

import graft.operators.{Dedup, HeavyHitters, Sessionize, TopK}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based falsification of the operators whose correctness rests on
  * an ALGEBRAIC argument (partial-aggregation laws, union-find ≡ transitive
  * closure, order-insensitivity) rather than on one fixture: each property
  * pits the operator against an independent straight-line reference
  * implementation over randomized inputs, split orders, and partitionings.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def check(name: String, trials: Int)(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials).withWorkers(1), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  // ---------------------------------------------------------------- TopKAgg

  test("TopKAgg: any split into partitions + any merge order equals sort-take(k)") {
    // ids made unique by index so the tie-break order is total
    val entriesGen = Gen.listOf(Gen.chooseNum(-5.0, 5.0))
      .map(_.zipWithIndex.map { case (v, i) => TopK.Entry(v, i.toLong) })
    val prop = Prop.forAll(entriesGen, Gen.chooseNum(1, 7), Gen.long) {
      (entries, k, seed) =>
        val agg = new TopK.TopKAgg(k)
        // random partitioning + random merge order, driven by the seed
        val rnd = new scala.util.Random(seed)
        val parts = entries.groupBy(_ => rnd.nextInt(4)).values.toList
        val bufs = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
        val got = agg.finish(bufs.foldLeft(agg.zero)(agg.merge)).items
        val want = entries.sortBy(e => (-e.v, e.id)).take(k)
        got == want
    }
    check("TopKAgg", 200)(prop)
  }

  // ----------------------------------------------------- union-find clusters

  test("clusters: union-find partition equals brute-force transitive closure") {
    import spark.implicits._
    val edgesGen = Gen.listOf(Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) })
      .suchThat(_.nonEmpty)
    val prop = Prop.forAll(edgesGen) { edges =>
      val got = Dedup.clusters(edges.toDF("a", "b"))
      // reference: grow components to a fixed point, label by component min
      var comp = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> n).toMap
      var changed = true
      while (changed) {
        changed = false
        for ((a, b) <- edges) {
          val m = math.min(comp(a), comp(b))
          if (comp(a) != m) { comp += a -> m; changed = true }
          if (comp(b) != m) { comp += b -> m; changed = true }
        }
      }
      val gotRoots = got.map { case (n, r) => n -> r }
      gotRoots == comp
    }
    check("clusters", 25)(prop)
  }

  // -------------------------------------------------- latest-state compaction

  test("LatestState.batch is input-order-insensitive and equals max-by compaction") {
    import spark.implicits._
    val evGen = for {
      n <- Gen.chooseNum(1, 30)
      ops <- Gen.listOfN(n, Gen.oneOf("insert", "update", "delete"))
      keys <- Gen.listOfN(n, Gen.chooseNum(0, 5).map(k => s"k$k"))
    } yield ops.zip(keys).zipWithIndex.map { case ((op, key), i) =>
      graft.cdc.CdcEvent(op, "t", i.toLong + 1, 0, 0, key, null,
        if (op == "delete") null else s"v$i")
    }
    val prop = Prop.forAll(evGen, Gen.long) { (events, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(events)
      val got = graft.cdc.LatestState.batch(shuffled.toDF(), Seq("key"), Seq("lsn", "seq"))
        .select("key", "after").as[(String, String)].collect().toMap
      val want = events.groupBy(_.key).view.mapValues(_.maxBy(e => (e.lsn, e.seq)))
        .filter(_._2.op != "delete").map { case (k, e) => k -> e.after }.toMap
      got == want
    }
    check("LatestState", 15)(prop)
  }

  // ---------------------------------------------------------------- sessions

  test("Sessionize.assign equals a straight-line per-entity scan") {
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.chooseNum(1, 40)
      users <- Gen.listOfN(n, Gen.chooseNum(0, 3).map(u => s"u$u"))
      times <- Gen.listOfN(n, Gen.chooseNum(0L, 300L))
    } yield users.zip(times).zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
    val prop = Prop.forAll(rowsGen, Gen.chooseNum(0L, 60L)) { (rows, gap) =>
      val got = Sessionize.assign(rows.toDF("user", "t", "id"),
          Seq("user"), col("t"), Seq(col("id")), gap)
        .select("user", "id", "session_no").as[(String, Long, Long)]
        .collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        var (s, prev) = (0L, Long.MinValue)
        sorted.map { case (_, t, id) =>
          if (prev == Long.MinValue || t - prev > gap) s += 1
          prev = t
          (u, id, s)
        }
      }.toSet
      got == want
    }
    check("Sessionize", 12)(prop)
  }

  // ------------------------------------------------------------- as-of join

  test("AsOfJoin equals the straight-line per-row scan, strict and non-strict") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    val leftGen = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.chooseNum(0, 3)
      ts <- Gen.chooseNum(0L, 50L)
    } yield (k.toLong, ts)))
    // right timestamps unique per key (duplicate (key, ts) right rows would
    // make "the most recent right row" ill-defined for any formulation)
    val rightGen = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.chooseNum(0, 3)
      ts <- Gen.chooseNum(0L, 50L)
    } yield (k.toLong, ts)).map(_.distinct
      .groupBy(identity).keys.toList.zipWithIndex
      .map { case ((k, ts), i) => (k, ts, i.toDouble) }))
    val prop = Prop.forAll(leftGen, rightGen, Gen.oneOf(false, true)) {
      (ls, rs, strict) =>
        val left = ls.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
          .toDF("k", "ts", "lid")
        val right = rs.toDF("k", "rts", "v")
        val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
            Map("v" -> "asof_v"), strict)
          .select($"lid", $"asof_v").as[(Long, Option[Double])].collect().toMap
        val want = ls.zipWithIndex.map { case ((k, ts), i) =>
          val visible = rs.filter(r => r._1 == k &&
            (if (strict) r._2 < ts else r._2 <= ts))
          i.toLong -> (if (visible.isEmpty) None
                       else Some(visible.maxBy(_._2)._3))
        }.toMap
        got == want
    }
    check("AsOfJoin", 12)(prop)
  }

  test("AsOfJoin forward/tolerance modes equal the straight-line scan") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.lit
    val leftGen = Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.chooseNum(0, 3)
      ts <- Gen.chooseNum(0L, 50L)
    } yield (k.toLong, ts)))
    val rightGen = Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.chooseNum(0, 3)
      ts <- Gen.chooseNum(0L, 50L)
    } yield (k.toLong, ts)).map(_.distinct
      .groupBy(identity).keys.toList.zipWithIndex
      .map { case ((k, ts), i) => (k, ts, i.toDouble) }))
    val prop = Prop.forAll(leftGen, rightGen, Gen.oneOf(false, true),
      Gen.option(Gen.chooseNum(0L, 30L))) { (ls, rs, fwd, tol) =>
      val left = ls.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }
        .toDF("k", "ts", "lid")
      val right = rs.toDF("k", "rts", "v")
      val fresh = tol.map(t => (l: Column, r: Column) =>
        (if (fwd) r - l else l - r) <= lit(t))
      val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts",
          Map("v" -> "asof_v"), strict = false, forward = fwd, fresh = fresh)
        .select($"lid", $"asof_v").as[(Long, Option[Double])].collect().toMap
      val want = ls.zipWithIndex.map { case ((k, ts), i) =>
        val visible = rs.filter(r => r._1 == k &&
          (if (fwd) r._2 >= ts else r._2 <= ts))
        val best = if (visible.isEmpty) None
          else Some(if (fwd) visible.minBy(_._2) else visible.maxBy(_._2))
        val kept = best.filter(b =>
          tol.forall(t => (if (fwd) b._2 - ts else ts - b._2) <= t))
        i.toLong -> kept.map(_._3)
      }.toMap
      got == want
    }
    check("AsOfJoinModes", 12)(prop)
  }

  // ------------------------------------------------------- interval overlap

  test("intervalOverlap equals the naive theta join for random intervals and widths") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val sideGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.chooseNum(0, 2).map(k => s"k$k")
      lo <- Gen.chooseNum(-40.0, 40.0)
      len <- Gen.chooseNum(0.0, 25.0)
    } yield (k, lo, lo + len)))
    val prop = Prop.forAll(sideGen, sideGen, Gen.oneOf(0.9, 7.0, 50.0)) {
      (as, bs, w) =>
        val a = as.zipWithIndex.map { case ((k, lo, hi), i) => (i.toLong, k, lo, hi) }
          .toDF("aid", "k", "a_lo", "a_hi")
        val b = bs.zipWithIndex.map { case ((k, lo, hi), i) => (i.toLong, k, lo, hi) }
          .toDF("bid", "k", "b_lo", "b_hi")
        val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", w, Seq("k"))
          .select("aid", "bid").as[(Long, Long)].collect()
        val want = RangeJoin.naiveOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", Seq("k"))
          .select("aid", "bid").as[(Long, Long)].collect().toSet
        got.length == got.toSet.size && got.toSet == want
    }
    check("intervalOverlap", 10)(prop)
  }

  test("pointInInterval equals the naive theta join for random points and widths") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val pointsGen = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50.0, 50.0)))
    val intervalsGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, for {
      lo <- Gen.chooseNum(-50.0, 50.0); len <- Gen.chooseNum(0.0, 30.0)
    } yield (lo, lo + len)))
    val prop = Prop.forAll(pointsGen, intervalsGen, Gen.oneOf(0.8, 6.0, 77.0)) {
      (ps, is, w) =>
        val points = ps.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
        val ivs = is.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
          .toDF("iid", "lo", "hi")
        val got = RangeJoin.pointInInterval(points, "x", ivs, "lo", "hi", w)
          .select("pid", "iid").as[(Long, Long)].collect()
        val want = RangeJoin.naive(points, "x", ivs, "lo", "hi")
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        got.length == got.toSet.size && got.toSet == want
    }
    check("pointInInterval", 10)(prop)
  }

  // --------------------------------------------------------- incremental merge

  test("incremental merges over ANY batch split equal one-shot compaction") {
    import spark.implicits._
    import graft.cdc.{LatestState, MaterializedTable}
    val evGen = for {
      n <- Gen.chooseNum(2, 24)
      ops <- Gen.listOfN(n, Gen.frequency(3 -> Gen.const("insert"),
        3 -> Gen.const("update"), 2 -> Gen.const("delete")))
      keys <- Gen.listOfN(n, Gen.chooseNum(0, 4).map(k => s"k$k"))
    } yield ops.zip(keys).zipWithIndex.map { case ((op, key), i) =>
      graft.cdc.CdcEvent(op, "t", i.toLong + 1, 0, 0, key, null,
        if (op == "delete") null else s"v$i")
    }
    // random cut points partition the changelog into 1–4 sequential batches
    val prop = Prop.forAll(evGen, Gen.listOfN(3, Gen.chooseNum(0.0, 1.0))) {
      (events, cuts) =>
        val dir = java.nio.file.Files.createTempDirectory("graft_prop_merge")
          .toString + "/state"
        val idx = cuts.map(c => (c * events.size).toInt).sorted.distinct
        val batches = (0 +: idx :+ events.size).distinct.sorted
          .sliding(2).map { case Seq(a, b) => events.slice(a, b) }
          .filter(_.nonEmpty).toList
        batches.foreach(b => MaterializedTable.merge(spark, dir, b.toDF(),
          Seq("key"), Seq("lsn", "seq"), numBuckets = 4))
        val got = if (batches.isEmpty) Map.empty[String, String]
          else MaterializedTable.read(spark, dir)
            .select("key", "after").as[(String, String)].collect().toMap
        val want = LatestState.batch(events.toDF(), Seq("key"), Seq("lsn", "seq"))
          .select("key", "after").as[(String, String)].collect().toMap
        got == want
    }
    check("incremental merge", 8)(prop)
  }

  // ------------------------------------------------------------ heavy hitters

  test("HeavyHitters equals the naive count under random data and partitioning") {
    import spark.implicits._
    val itemsGen = for {
      n <- Gen.chooseNum(1, 200)
      // zipf-ish: small alphabet with geometric skew
      items <- Gen.listOfN(n, Gen.frequency(
        8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
        2 -> Gen.chooseNum(0, 5).map(i => s"mid$i"),
        1 -> Gen.chooseNum(0, 50).map(i => s"cold$i")))
    } yield items
    val prop = Prop.forAll(itemsGen, Gen.chooseNum(2, 8), Gen.chooseNum(1, 6)) {
      (items, k, nParts) =>
        val df = items.toDF("item").repartition(nParts)
        val got = HeavyHitters.heavyHitters(df, "item", k)
          .as[(String, Long)].collect().toSet
        val counts = items.groupBy(identity).view.mapValues(_.size.toLong)
        val want = counts.filter(_._2 * k > items.size)
          .map { case (s, c) => (s, c) }.toSet
        got == want
    }
    check("HeavyHitters", 12)(prop)
  }

  // ------------------------------------------------------------ RuntimeFilter

  test("bloom-pruned join equals the plain join for random key sets") {
    import spark.implicits._
    val gen = for {
      dimKeys <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 300L)).map(_.distinct)
      factKeys <- Gen.listOfN(80, Gen.chooseNum(0L, 300L))
      nParts <- Gen.chooseNum(1, 5)
    } yield (dimKeys, factKeys, nParts)
    val prop = Prop.forAll(gen) { case (dimKeys, factKeys, nParts) =>
      val dim = dimKeys.toDF("dk")
      val fact = factKeys.toDF("fk").repartition(nParts)
      // tiny bitset (256 bits for up to ~300 keys) to force real false
      // positives through the exact-join cleanup path
      val got = graft.operators.RuntimeFilter
        .prunedJoin(fact, dim, "fk", "dk", numBits = 256, numHashes = 3)
        .select("fk").as[Long].collect().sorted.toSeq
      val dimSet = dimKeys.toSet
      val want = factKeys.filter(dimSet).sorted
      got == want
    }
    check("RuntimeFilter", 10)(prop)
  }

  // -------------------------------------------------------------- passageStats

  test("passageStats equals the straight-line first-occurrence scan") {
    import spark.implicits._
    val block = 3
    val docsGen = Gen.nonEmptyListOf(
      Gen.listOf(Gen.oneOf("a", "b", "c"))) // tiny vocab ⇒ real collisions
      .map(_.zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) })
    val prop = Prop.forAll(docsGen, Gen.chooseNum(1, 4)) { (docs, nParts) =>
      val df = docs.toDF("doc_id", "text").repartition(nParts)
      val got = Dedup.passageStats(df, "doc_id", "text", block)
        .select("doc_id", "n_tokens", "n_passages", "n_dup_passages", "kept_tokens")
        .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      // reference: one linear pass in doc-id order over whole blocks
      val seen = scala.collection.mutable.Set[String]()
      docs.sortBy(_._1).forall { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val blocks = toks.grouped(block).filter(_.length == block)
          .map(_.mkString(" ")).toSeq
        val dups = blocks.count { b => val dup = seen(b); seen += b; dup }
        got(id) == ((id, toks.length.toLong, blocks.length.toLong, dups.toLong,
          toks.length.toLong - block * dups.toLong))
      }
    }
    check("passageStats", 10)(prop)
  }

  test("repeatIntervals equals the straight-line covered-position scan") {
    import spark.implicits._
    val k = 3
    val docsGen = Gen.nonEmptyListOf(
      Gen.listOf(Gen.oneOf("a", "b", "c"))) // tiny vocab ⇒ real repeats
      .map(_.zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) })
    val prop = Prop.forAll(docsGen, Gen.chooseNum(1, 4)) { (docs, nParts) =>
      val df = docs.toDF("doc_id", "text").repartition(nParts)
      val got = Dedup.repeatIntervals(df, "doc_id", "text", minTokens = k)
        .select("doc_id", "start_tok", "end_tok", "n_toks")
        .as[(Long, Long, Long, Long)].collect().toSet
      // reference: mark every position inside ANY ≥k substring occurring at
      // ≥2 (doc, pos) sites, then merge maximal covered runs per doc —
      // computed from first principles (all k-gram occurrence counts)
      val occ = scala.collection.mutable.Map[Seq[String], Int]()
      val toksOf = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
      for ((_, toks) <- toksOf; i <- 0 to toks.length - k)
        occ(toks.slice(i, i + k)) = occ.getOrElse(toks.slice(i, i + k), 0) + 1
      val want = (for ((id, toks) <- toksOf.toSeq) yield {
        val covered = Array.fill(toks.length)(false)
        for (i <- 0 to toks.length - k if occ(toks.slice(i, i + k)) > 1;
             p <- i until i + k) covered(p) = true
        // maximal runs of covered positions
        val runs = Seq.newBuilder[(Long, Long, Long, Long)]
        var s = -1
        for (p <- 0 to toks.length) {
          val c = p < toks.length && covered(p)
          if (c && s < 0) s = p
          if (!c && s >= 0) {
            runs += ((id, s.toLong, (p - 1).toLong, (p - s).toLong)); s = -1
          }
        }
        runs.result()
      }).flatten.toSet
      got == want
    }
    check("repeatIntervals", 15)(prop)
  }

  test("winnowFingerprints equals the straight-line walk; shared runs intersect") {
    import spark.implicits._
    val (k, w) = (3, 3)
    def hex32(s: String, salt: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$salt:$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    def ref(text: String): Set[(Int, Long)] = {
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val grams = if (toks.length < k) Seq.empty[String]
        else toks.sliding(k).map(_.mkString(" ")).toSeq
      val hp = grams.zipWithIndex.map { case (g, i) => (hex32(g, 7), i) }
      if (hp.isEmpty) Set.empty
      else (0 until math.max(hp.length - (w - 1), 1)).map { j =>
        hp.slice(j, math.min(j + w, hp.length))
          .reduceLeft((a, x) =>
            if (x._1 < a._1 || (x._1 == a._1 && x._2 > a._2)) x else a)
      }.toSet.map((p: (Long, Int)) => (p._2, p._1))
    }
    // tiny vocab ⇒ repeated grams ⇒ equal hashes ⇒ the tie branch runs
    val tok = Gen.oneOf("a", "b", "c")
    val docGen = Gen.listOf(tok).map(_.mkString(" "))
    val runGen = Gen.listOfN(w + k - 1, tok).map(_.mkString(" "))
    val prop = Prop.forAll(docGen, docGen, docGen, runGen, Gen.chooseNum(1, 4)) {
      (pad1, pad2, tail2, run, nParts) =>
        // docs 0 and 1 share a guaranteed w+k−1-token run at random offsets
        val docs = Seq(
          (0L, s"$pad1 $run".trim),
          (1L, s"$pad2 $run $tail2".trim),
          (2L, pad1.trim))
        val got = Dedup.winnowFingerprints(
            docs.toDF("doc_id", "text").repartition(nParts),
            "doc_id", "text", k, w)
          .as[(Long, Int, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
        docs.forall { case (id, text) =>
          got.getOrElse(id, Set.empty) == ref(text)
        } && {
          val shared = got.getOrElse(0L, Set.empty).map(_._2)
            .intersect(got.getOrElse(1L, Set.empty).map(_._2))
          shared.nonEmpty // the SIGMOD'03 theorem
        }
    }
    check("winnowFingerprints", 10)(prop)
  }

  // --------------------------------------------------------- RangeJoinRewrite

  test("RangeJoinRewrite: on ≡ off for random inputs incl. NaN/±Inf/null/inverted") {
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
    // integral magnitudes force exact bin-boundary ties; the special pool
    // exercises every residual-branch class the rule claims to handle
    val normal = Gen.chooseNum(-100, 100).map(_.toDouble)
    val special = Gen.oneOf(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.0e308, -1.0e308, 1.0e12)
    val bound: Gen[Option[Double]] = Gen.frequency(
      7 -> normal.map(Some(_)), 2 -> special.map(Some(_)), 1 -> Gen.const(None))
    val pGen = Gen.listOfN(16, Gen.frequency(9 -> normal, 1 -> special))
    val ivGen = Gen.listOfN(10, Gen.zip(bound, bound)) // unordered ⇒ inverted too
    val wGen = Gen.oneOf(1.0, 8.0, 512.0)

    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq

    val prop = Prop.forAll(pGen, ivGen, wGen) { (ps, ivs, w) =>
      val pdf = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("pid", "p")
      val idf = ivs.zipWithIndex.map { case ((lo, hi), i) => (100L + i, lo, hi) }
        .toDF("iid", "lo", "hi")
      val point = col("p") >= col("lo") && col("p") <= col("hi")
      val overlap = col("lo") <= col("p2") && col("lo2") <= col("hi")
      val idf2 = ivs.zipWithIndex.map { case ((lo, hi), i) => (200L + i, lo, hi) }
        .toDF("iid2", "lo2", "p2") // second interval relation for overlap
      spark.conf.set("spark.graft.rangeJoin.enabled", "false")
      val offP = rowsOf(pdf.join(idf, point))
      val offO = rowsOf(idf.join(idf2, overlap))
      spark.conf.set("spark.graft.rangeJoin.enabled", "true")
      spark.conf.set("spark.graft.rangeJoin.binWidth", w.toString)
      try {
        val onPdf = pdf.join(idf, point)
        val onOdf = idf.join(idf2, overlap)
        val fired = onPdf.queryExecution.optimizedPlan.toString.contains("_graft") &&
          onOdf.queryExecution.optimizedPlan.toString.contains("_graft")
        fired && rowsOf(onPdf) == offP && rowsOf(onOdf) == offO
      } finally spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    }
    check("RangeJoinRewrite", 10)(prop)
  }

  // ------------------------------------------------------------ packSequences

  test("packSequences: any bucket count tiles the token stream like the naive window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.TextOps
    // random corpora with non-dense ids (negatives included), empty docs,
    // and random seqLen/nBuckets — the two-level prefix sum must equal the
    // naive single-window formulation on every draw
    val corpusGen = for {
      n <- Gen.chooseNum(1, 40)
      ids <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L)).map(_.distinct)
      lens <- Gen.listOfN(ids.size, Gen.chooseNum(0, 12))
    } yield ids.zip(lens).map { case (id, l) => (id, Seq.fill(l)("w").mkString(" ")) }
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(1, 9), Gen.oneOf(1, 3, 17)) {
      (corpus, seqLen, nBuckets) =>
        val docs = corpus.toDF("doc_id", "text")
        val naive = docs
          .select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
          .withColumn("start_tok", coalesce(sum($"n_tokens").over(
            Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
          .select($"doc_id", $"n_tokens", $"start_tok",
            when($"n_tokens" > 0, expr(s"start_tok div $seqLen")).as("seq_first"),
            when($"n_tokens" > 0,
              expr(s"(start_tok + n_tokens - 1) div $seqLen")).as("seq_last"))
          .collect().map(_.toString).sorted.toSeq
        val got = TextOps.packSequences(docs, "doc_id", "text", seqLen, nBuckets)
          .collect().map(_.toString).sorted.toSeq
        got == naive
    }
    check("packSequences", 30)(prop)
  }

  // ------------------------------------------------------------ sampleMixture

  test("sampleMixture: budget-monotone — a bigger budget only ADDS documents") {
    import spark.implicits._
    import graft.operators.TextOps
    // the fixed salted hash means raising the budget can only raise each
    // source's threshold: the sampled set must GROW monotonically, never
    // reshuffle (the property that makes incremental re-mixes cheap — docs
    // already shipped stay shipped)
    val corpusGen = for {
      n <- Gen.chooseNum(4, 30)
      srcs <- Gen.listOfN(n, Gen.chooseNum(0, 3).map(s => s"s$s"))
      lens <- Gen.listOfN(n, Gen.chooseNum(1, 10))
    } yield srcs.zip(lens).zipWithIndex.map { case ((src, l), i) =>
      (i.toLong, src, Seq.fill(l)("w").mkString(" ")) }
    val prop = Prop.forAll(corpusGen, Gen.chooseNum(1L, 40L), Gen.chooseNum(1L, 60L)) {
      (corpus, b1, extra) =>
        val docs = corpus.toDF("doc_id", "source", "text")
        val weights = Map("s0" -> 0.7, "s1" -> 0.3, "s2" -> 1.5)
        def ids(budget: Long): Set[Long] =
          TextOps.sampleMixture(docs, "doc_id", "source", "text", weights, budget)
            .select("doc_id").as[Long].collect().toSet
        ids(b1).subsetOf(ids(b1 + extra))
    }
    check("sampleMixture-monotone", 25)(prop)
  }

  // ------------------------------------------------------------------ funnel

  test("funnel: step-join formulation equals the naive per-user ordered scan") {
    import spark.implicits._
    import graft.operators.Funnel
    val steps = Seq("A", "B", "C")
    val evGen = Gen.listOf(Gen.zip(
      Gen.chooseNum(0L, 4L),                         // user
      Gen.oneOf("A", "B", "C", "X"),                 // type (X = noise)
      Gen.chooseNum(0, 20))).suchThat(_.nonEmpty)    // ts (ties likely)
    val prop = Prop.forAll(evGen) { evs =>
      val df = evs.toDF("user_id", "event_type", "ts")
      val got = Funnel.stages(df, "user_id", "event_type", "ts", steps)
        .as[(Long, Int)].collect().toMap
      val want = evs.map(_._1).distinct.map { u =>
        var t = Int.MinValue; var stage = 0; var stuck = false
        steps.foreach { st =>
          if (!stuck) {
            val c = evs.filter(e => e._1 == u && e._2 == st && e._3 > t)
            if (c.isEmpty) stuck = true
            else { t = c.map(_._3).min; stage += 1 }
          }
        }
        u -> stage
      }.toMap
      got == want
    }
    check("funnel", 150)(prop)
  }

  // ------------------------------------------------------- boilerplateRemove

  test("boilerplateRemove equals the straight-line per-source df scan") {
    import spark.implicits._
    // 2-token lines over a 3-word vocabulary on two sources: repeated lines
    // are common, ragged tails guaranteed by odd token counts
    val docGen = Gen.listOf(Gen.zip(
      Gen.oneOf("s1", "s2"),
      Gen.chooseNum(1, 7).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc")).map(_.mkString(" ")))))
      .suchThat(_.nonEmpty)
      .map(_.zipWithIndex.map { case ((src, t), i) => (i.toLong, src, t) })
    val prop = Prop.forAll(docGen, Gen.chooseNum(1, 5)) { (docs, nPart) =>
      val got = Dedup.boilerplateRemove(
          docs.toDF("doc_id", "source", "text").repartition(nPart),
          "doc_id", "text", "source", lineTokens = 2, minDf = 2)
        .as[(Long, String, Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      // straight-line reference
      def lines(t: String): Seq[String] =
        t.split(" ").filter(_.nonEmpty).grouped(2).map(_.mkString(" ")).toSeq
      val df = docs.flatMap { case (id, src, t) =>
        lines(t).distinct.map(l => (src, l) -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      docs.forall { case (id, src, t) =>
        val ls = lines(t)
        val keptLs = ls.filter(l => df((src, l)) < 2)
        val want = (id, src, ls.size.toLong,
          (ls.size - keptLs.size).toLong,
          keptLs.map(_.split(" ").length.toLong).sum,
          keptLs.mkString(" "))
        got(id) == want
      }
    }
    check("boilerplateRemove", 60)(prop)
  }

  // ------------------------------------------------------- interval coverage

  test("interval union coverage ≡ brute-force covered-point count") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // the q82 running-max-end island dataflow, over random small intervals
    val ivGen = for {
      n <- Gen.chooseNum(1, 25)
      ks <- Gen.listOfN(n, Gen.chooseNum(0L, 2L))
      ss <- Gen.listOfN(n, Gen.chooseNum(0L, 60L))
      ws <- Gen.listOfN(n, Gen.chooseNum(1L, 15L))
    } yield ks.lazyZip(ss).lazyZip(ws).map((k, s, w) => (k, s, s + w)).toList
    val prop = Prop.forAll(ivGen) { ivs =>
      val df = ivs.toDF("k", "s", "e")
      val w = Window.partitionBy($"k").orderBy($"s", $"e")
      val m = df.withColumn("pm",
        max($"e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      val isl = m.withColumn("island",
        sum(when($"pm".isNull || $"s" > $"pm", 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val got = isl.groupBy($"k", $"island")
        .agg(min($"s").as("is_"), max($"e").as("ie"))
        .groupBy($"k").agg(sum($"ie" - $"is_").as("cov"))
        .as[(Long, Long)].collect().toMap
      // brute force: count the distinct integer points covered per key
      val want = ivs.groupBy(_._1).map { case (k, list) =>
        k -> list.flatMap { case (_, s, e) => s until e }.toSet.size.toLong
      }
      got == want
    }
    check("intervalCoverage", 120)(prop)
  }

  // -------------------------------------------------------------- TableDiff

  test("TableDiff: applyPatch(old, diffRows(old, new)) reconstructs new") {
    import spark.implicits._
    // random keyed tables over a tiny key/value space so all three change
    // classes (added / removed / changed, incl. null transitions) occur
    val tableGen = for {
      n <- Gen.chooseNum(0, 12)
      ks <- Gen.listOfN(n, Gen.chooseNum(0L, 9L))
      vs <- Gen.listOfN(n, Gen.option(Gen.chooseNum(0, 3).map(v => s"v$v")))
      ws <- Gen.listOfN(n, Gen.chooseNum(0.0, 3.0))
    } yield ks.distinct.zip(vs.zip(ws)).map { case (k, (v, w)) =>
      (k, v.orNull, w) }
    val prop = Prop.forAll(tableGen, tableGen) { (oldRows, newRows) =>
      val oldT = oldRows.toDF("k", "s", "x")
      val newT = newRows.toDF("k", "s", "x")
      val patch = graft.operators.TableDiff.diffRows(oldT, newT, "k")
      val rebuilt = graft.operators.TableDiff.applyPatch(oldT, patch, "k")
        .as[(Long, String, Double)].collect().sortBy(_._1).toList
      val want = newRows.map(r => (r._1, r._2, r._3)).sortBy(_._1)
      rebuilt == want
    }
    check("TableDiff.applyPatch", 80)(prop)
  }

  // ------------------------------------------------- stats-pruned reads

  test("readPruned ≡ read().filter for arbitrary comparison predicates (skipping never drops rows)") {
    import spark.implicits._
    import graft.cdc.MaterializedTable
    // one fixture table: long/double/string payloads incl. nulls and
    // boundary-hostile values; stats on every payload column
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_stats")
      .toString + "/t"
    val rows = (1 to 40).map { i =>
      ("insert", s"k$i", i.toLong, 0L,
        if (i % 7 == 0) None else Some(i * 10L),
        if (i % 5 == 0) None else Some(i * 1.5 - 20.0),
        s"s${(i * 13) % 40}")
    }
    MaterializedTable.merge(spark, dir,
      rows.toDF("op", "key", "lsn", "seq", "v", "w", "s"),
      Seq("key"), Seq("lsn", "seq"), numBuckets = 8,
      statsCols = Seq("v", "w", "s"))
    val full = MaterializedTable.read(spark, dir).cache()
    full.count()

    type Cmp = (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column
    val colGen = Gen.oneOf("v", "w", "s")
    val opGen = Gen.oneOf[Cmp](
      (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a === b,
      (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a < b,
      (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a <= b,
      (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a > b,
      (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) => a >= b)
    // literals cross-typed WITHIN the column's comparable family (a string
    // literal against a numeric column makes the predicate itself throw
    // under ANSI casts — on both the pruned and the reference path alike)
    def litFor(c: String): Gen[Any] = c match {
      case "s" => Gen.oneOf((0 to 45).map(i => s"s$i"))
      case _ => Gen.oneOf(
        Gen.chooseNum(-50L, 450L), Gen.chooseNum(-45.5, 61.7),
        Gen.const(100L), Gen.const(0.5))
    }
    val predGen: Gen[org.apache.spark.sql.Column] = for {
      c1 <- colGen; o1 <- opGen; l1 <- litFor(c1)
      conj <- Gen.oneOf(0, 1, 2)
      c2 <- colGen; o2 <- opGen; l2 <- litFor(c2)
    } yield {
      def one(c: String, o: Cmp, l: Any) = o(col(c), lit(l))
      conj match {
        case 0 => one(c1, o1, l1)
        case 1 => one(c1, o1, l1) && one(c2, o2, l2)
        case 2 => one(c1, o1, l1) || one(c2, o2, l2)
      }
    }
    val prop = Prop.forAll(predGen) { p =>
      val pruned = graft.cdc.MaterializedTable.readPruned(spark, dir, p)
        .select("key").as[String].collect().sorted.toList
      val want = full.filter(p).select("key").as[String]
        .collect().sorted.toList
      pruned == want
    }
    check("readPruned", 60)(prop)
  }

  // ------------------------------------------------ change-feed convergence

  test("changeFeed is self-healing: applying diff(from→to) onto snapshot(from) rebuilds snapshot(to)") {
    import spark.implicits._
    import graft.cdc.MaterializedTable
    spark.conf.set("spark.graft.materialized.retainVersions", "20")
    try {
      // randomized changelog split into randomized commit batches — ONE
      // table build per trial keeps Spark-job count sane at 40 trials
      val evGen = for {
        n <- Gen.chooseNum(4, 24)
        ops <- Gen.listOfN(n, Gen.oneOf("insert", "update", "delete"))
        keys <- Gen.listOfN(n, Gen.chooseNum(0, 6))
        vals <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
        cut1 <- Gen.chooseNum(1, n - 1)
        cut2 <- Gen.chooseNum(1, n - 1)
      } yield (ops.lazyZip(keys).lazyZip(vals).toList.zipWithIndex.map {
        case ((op, k, v), i) => (op, s"k$k", (i + 1).toLong, 0L, v)
      }, math.min(cut1, cut2), math.max(cut1, cut2))
      val prop = Prop.forAll(evGen) { case (rows, cut1, cut2) =>
        val dir = java.nio.file.Files
          .createTempDirectory("graft_prop_cdf").toString + "/t"
        val slices = Seq(rows.take(cut1), rows.slice(cut1, cut2),
          rows.drop(cut2)).filter(_.nonEmpty)
        slices.zipWithIndex.foreach { case (sl, i) =>
          MaterializedTable.merge(spark,
            dir, sl.toDF("op", "key", "lsn", "seq", "v"),
            Seq("key"), Seq("lsn", "seq"), numBuckets = 2,
            batchId = Some(i + 1L))
        }
        val versions = MaterializedTable.listVersions(spark, dir)
        versions.combinations(2).forall { case Seq(from, to) =>
          val feed = MaterializedTable
            .changeFeed(spark, dir, from, to, Seq("key"))
            .select("key", "op", "after_op", "after_lsn", "after_seq", "after_v")
            .as[(String, String, Option[String], Option[Long], Option[Long], Option[Long])]
            .collect()
          val base = MaterializedTable.readVersion(spark, dir, from)
            .select("key", "op", "lsn", "seq", "v")
            .as[(String, String, Long, Long, Long)].collect()
            .map(r => r._1 -> r).toMap
          // apply: delete removes, insert/update replace with the after row
          val rebuilt = feed.foldLeft(base) {
            case (st, (k, "delete", _, _, _, _)) => st - k
            case (st, (k, _, Some(op), Some(lsn), Some(seq), Some(v))) =>
              st + (k -> ((k, op, lsn, seq, v)))
            case (st, _) => st
          }
          val want = MaterializedTable.readVersion(spark, dir, to)
            .select("key", "op", "lsn", "seq", "v")
            .as[(String, String, Long, Long, Long)].collect()
            .map(r => r._1 -> r).toMap
          rebuilt == want
        }
      }
      check("changeFeed convergence", 15)(prop)
    } finally spark.conf.unset("spark.graft.materialized.retainVersions")
  }

  // ------------------------------------------- group change-feed convergence

  test("group CDF converges: folding per-root-window envelopes rebuilds every member's pinned state") {
    import spark.implicits._
    import graft.cdc.TableGroup
    spark.conf.set("spark.graft.materialized.retainVersions", "20")
    try {
      val evGen = for {
        n <- Gen.chooseNum(4, 20)
        ops <- Gen.listOfN(n, Gen.oneOf("insert", "update", "delete"))
        keys <- Gen.listOfN(n, Gen.chooseNum(0, 6))
        vals <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
        cut1 <- Gen.chooseNum(1, n - 1)
        cut2 <- Gen.chooseNum(1, n - 1)
      } yield (ops.lazyZip(keys).lazyZip(vals).toList.zipWithIndex.map {
        case ((op, k, v), i) => (op, s"k$k", (i + 1).toLong, 0L, v)
      }, math.min(cut1, cut2), math.max(cut1, cut2))
      def rootJson(g: TableGroup.GroupManifest): String =
        s"""{"lastBatchId":${g.lastBatchId},"tables":{""" +
          g.tables.toSeq.sortBy(_._1)
            .map { case (t, v) => s""""$t":$v""" }.mkString(",") + "}}"
      val prop = Prop.forAll(evGen) { case (rows, cut1, cut2) =>
        val root = java.nio.file.Files
          .createTempDirectory("graft_prop_gcdf").toString + "/g"
        val slices = Seq(rows.take(cut1), rows.slice(cut1, cut2),
          rows.drop(cut2)).filter(_.nonEmpty)
        // member ta = the whole changelog; tb = upsert-only even keys —
        // routed slices with different live sets, one shared clock
        val manifests = slices.zipWithIndex.map { case (sl, i) =>
          val df = sl.toDF("op", "key", "lsn", "seq", "v")
          TableGroup.commit(spark, root, Seq(
            TableGroup.TableBatch("ta", df, Seq("key")),
            TableGroup.TableBatch("tb",
              df.filter(col("op") =!= "delete" &&
                expr("cast(substring(key, 2) as int) % 2 = 0")),
              Seq("key"))),
            Seq("lsn", "seq"), batchId = i + 1L, numBuckets = 2)
          TableGroup.readRoot(spark, root).get
        }
        val src = new graft.sources.GraftGroupCdfSource(
          spark.sqlContext, root)
        def offset(g: TableGroup.GroupManifest) =
          org.apache.spark.sql.execution.streaming.runtime
            .SerializedOffset(rootJson(g))
        // getBatch returns streaming-tagged frames (the engine contract);
        // rebind for direct inspection
        def batchOf(a: TableGroup.GroupManifest, b: TableGroup.GroupManifest) =
          org.apache.spark.sql.GraftShims.asBatchDataFrame(
            src.getBatch(Some(offset(a)), offset(b)))
        // bootstrap-at-start: diffing the start root against itself is empty
        assert(batchOf(manifests.head, manifests.head).isEmpty)
        def stateOf(table: String): Map[String, String] =
          TableGroup.read(spark, root, table)
            .select(col("key"),
              to_json(struct(col("op"), col("lsn"), col("seq"), col("v"))))
            .as[(String, String)].collect().toMap
        // subscriber: bootstrap = member state at the FIRST root (the
        // documented read-once-then-follow contract), then fold windows
        var replicas: Map[String, Map[String, String]] = {
          // reconstruct the first-root state via a diff from nothing is
          // not offered (no backfill) — read the pinned snapshots directly
          val firstPins = manifests.head.tables
          firstPins.keys.map { t =>
            t -> graft.cdc.MaterializedTable
              .readVersion(spark, s"$root/$t", firstPins(t))
              .select(col("key"),
                to_json(struct(col("op"), col("lsn"), col("seq"), col("v"))))
              .as[(String, String)].collect().toMap
          }.toMap
        }
        manifests.sliding(2).foreach {
          case Seq(a, b) =>
            val batch = batchOf(a, b)
              .select("table", "op", "key", "after")
              .as[(String, String, String, String)].collect()
            batch.foreach { case (t, op, keyJson, after) =>
              val k = keyJson.replaceAll(""".*"key":"([^"]+)".*""", "$1")
              val m = replicas(t)
              replicas += (t -> (op match {
                case "delete" => m - k
                case _ => m + (k -> after)
              }))
            }
          case _ => ()
        }
        replicas.forall { case (t, replica) => replica == stateOf(t) }
      }
      check("group CDF convergence", 10)(prop)
    } finally spark.conf.unset("spark.graft.materialized.retainVersions")
  }
}
