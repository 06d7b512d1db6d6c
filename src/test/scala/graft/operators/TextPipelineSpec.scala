package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Train/val/test splitting and normalization (the round-6 text-pipeline
  * additions; TF-IDF is gate-covered by txt11's full DuckDB oracle).
  */
class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  val dir = "/root/testdata/sf0.001"

  test("hash split is stable, complete, and roughly 80/10/10") {
    val docs = graft.Tables.documents(spark, dir)
    val n = docs.count()
    val split = docs.select($"doc_id",
      TextOps.splitBucket($"doc_id", salt = 42, nBuckets = 10).as("bucket"))
      .withColumn("split", TextOps.splitLabel($"bucket"))
    val byLabel = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.values.sum == n)                       // complete partition
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    // md5 buckets ≈ uniform: train share within a loose band of 0.8
    val trainShare = byLabel("train").toDouble / n
    assert(trainShare > 0.6 && trainShare < 0.95, s"train share $trainShare")
    // determinism: recomputing yields the identical assignment (no rand())
    val again = docs.select($"doc_id",
      TextOps.splitBucket($"doc_id", salt = 42, nBuckets = 10).as("bucket"))
    assert(split.select("doc_id", "bucket").exceptAll(again).count() == 0)
    // a different salt produces a DIFFERENT (but equally stable) assignment
    val other = docs.select($"doc_id",
      TextOps.splitBucket($"doc_id", salt = 7, nBuckets = 10).as("bucket"))
    assert(split.select("doc_id", "bucket").exceptAll(other).count() > 0)
  }

  test("normalize scrubs markup, collapses spaces, and is idempotent") {
    val rows = Seq(
      ("a  b!!c", "a bc"),                 // punct dropped, run collapsed
      ("  <<src-1>>  ", "src1"),           // planted-markup shape
      ("already clean", "already clean"),
      ("", "")
    ).toDF("raw", "expected")
    val got = rows.select(TextOps.normalize($"raw").as("clean"), $"expected")
      .as[(String, String)].collect()
    got.foreach { case (clean, expected) => assert(clean == expected) }
    // idempotence over real corpus text
    val docs = graft.Tables.documents(spark, dir)
      .select(TextOps.normalize($"text").as("c1"))
      .select($"c1", TextOps.normalize($"c1").as("c2"))
    assert(docs.filter($"c1" =!= $"c2").count() == 0)
  }

  test("PII redaction: each class redacted, boundaries respected, idempotent") {
    val rows = Seq(
      ("mail bob.smith+x@corp.example.org now", "mail <email> now"),
      ("mail John.Doe@Example.COM too", "mail <email> too"), // mixed case redacts
      ("host 10.0.255.7 up", "host <ip> up"),
      ("call 415-555-0123 today", "call <phone> today"),
      // all three in one string, redaction order: email, ip, phone
      ("a@b.co 1.2.3.4 415-555-0123", "<email> <ip> <phone>"),
      // \b guards: digit-adjacent candidates are NOT a phone/ip
      ("id 1234-567-8901 raw", "id 1234-567-8901 raw"),
      ("ver 1.2.3.4.5 tag", "ver <ip>.5 tag"), // leftmost 4 octets match; \b holds before '.'
      ("no pii here", "no pii here"),
      ("", "")
    ).toDF("raw", "expected")
    val got = rows.select(TextOps.redactPii($"raw").as("clean"), $"expected")
      .as[(String, String)].collect()
    got.foreach { case (clean, expected) => assert(clean == expected, s"got '$clean'") }
    // idempotence: placeholders never re-match any pattern
    val once = rows.select(TextOps.redactPii($"raw").as("c1"))
    assert(once.select($"c1", TextOps.redactPii($"c1").as("c2"))
      .filter($"c1" =!= $"c2").count() == 0)
  }

  test("ngramOverlap: verbatim copy scores 1.0, novel text 0, short doc null") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // verbatim leak
      (11L, "jabberwocky gyre gimble wabe mimsy borogoves outgrabe"), // novel
      (12L, "five dozen liquor jugs were heavy"), // partial: 1 of 4 grams
      (13L, "too short")).toDF("doc_id", "text") // < n tokens
    val got = Dedup.ngramOverlap(train, eval, "doc_id", "text", n = 4)
      .select($"doc_id", $"n_grams", $"n_overlap", $"overlap_frac")
      .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got(10L) == ((10L, 6L, 6L, Some(1.0))), s"verbatim: ${got(10L)}")
    assert(got(11L)._3 == 0L && got(11L)._4.contains(0.0))
    assert(got(12L) == ((12L, 3L, 1L, Some(1.0 / 3.0))), s"partial: ${got(12L)}")
    assert(got(13L) == ((13L, 0L, 0L, None)))
    // the guarantee decontamination rests on: a verbatim training document
    // can NEVER score below 1.0
    assert(got.values.filter(_._2 > 0).forall(r => r._4.exists(_ <= 1.0)))
  }

  test("ngramOverlapPruned ≡ ngramOverlap; Bloom shrinks the train-side input") {
    import spark.implicits._
    // real corpus so the shrink is meaningful: eval = a handful of docs,
    // train = all documents — most train grams are NOT eval-adjacent
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text")
    val eval = docs.filter($"doc_id" % 17 === 0)
      .select(($"doc_id" + 200000).as("doc_id"),
        expr("substring(text, 1, length(text)-10)").as("text"))

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val plain = Dedup.ngramOverlap(docs, eval, "doc_id", "text", n = 4)
    val pruned = Dedup.ngramOverlapPruned(docs, eval, "doc_id", "text", n = 4)
    assert(canon(pruned) == canon(plain), "prune must be result-transparent")

    // the scale claim itself: the train-gram rows entering the distinct's
    // exchange shrink (plain feeds ALL train grams; pruned only
    // eval-adjacent + Bloom false positives)
    val trainGrams = Dedup.gramKeys(docs, "doc_id", "text", n = 4).select("g")
    val evalGrams = Dedup.gramKeys(eval, "doc_id", "text", n = 4).select("g")
    val before = trainGrams.count()
    val after = RuntimeFilter.prune(trainGrams, evalGrams, "g", "g").count()
    assert(after < before / 2,
      s"Bloom should shed most non-eval-adjacent train grams: $after vs $before")
    // no false negatives: every gram that actually matches eval survives
    val matching = trainGrams.join(evalGrams.distinct(), Seq("g"), "semi").count()
    assert(after >= matching)
  }

  test("sampleMixture: deterministic, clamps to 1, drops unweighted sources") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"source", $"text")
    val weights = Map("src0" -> 0.4, "src1" -> 5.0, "src2" -> 0.1)
    def run(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      TextOps.sampleMixture(df, "doc_id", "source", "text", weights, 500L)
        .as[(Long, String, Long)].collect().toSet
    val got = run(docs)
    // deterministic under any partitioning — the 100 TB re-run guarantee
    assert(run(docs.repartition(13, $"doc_id")) == got)
    assert(run(docs.repartition(1)) == got)
    // only weighted sources survive the inner join
    assert(got.map(_._2).subsetOf(weights.keySet))
    // src1's weight oversubscribes its corpus: fraction clamps to 1 and
    // EVERY src1 doc is kept
    val allSrc1 = docs.filter($"source" === "src1").count()
    assert(allSrc1 > 0 && got.count(_._2 == "src1").toLong == allSrc1)
    // a strictly-sub-1 fraction samples a strict, non-empty subset
    val allSrc0 = docs.filter($"source" === "src0").count()
    val gotSrc0 = got.count(_._2 == "src0").toLong
    assert(gotSrc0 > 0 && gotSrc0 < allSrc0,
      s"src0 should sample strictly partially: $gotSrc0 of $allSrc0")
  }

  test("systematicSample: every boundary assigned exactly once; PPS invariants") {
    import spark.implicits._
    // exact-boundary starts, a heavy doc (w > step), zero-weight docs
    val docs = Seq(
      (1L, "a b c d e"),                        // [0,5)  — boundary 5 ∈ (0,5]
      (2L, ""),                                 // zero weight: never picked
      (3L, "f g h"),                            // [5,8)
      (4L, "i j k l m n o p q r s t"),          // [8,20) — heavy: 2 boundaries
      (5L, "u v")).toDF("doc_id", "text")       // [20,22)
    val got = TextOps.systematicSample(docs, "doc_id", "text", step = 5L,
        nBuckets = 3)
      .select("doc_id", "n_picks").as[(Long, Long)].collect().toMap
    // boundaries at 5,10,15,20 land in (start, start+w] of docs 1,4,4,4
    assert(got == Map(1L -> 1L, 4L -> 3L))
    // invariant on the real corpus: Σ n_picks == total div step (each
    // boundary in (0, total] picked exactly once), zero-weight docs absent,
    // and ≡ the straight-line cumulative scan
    val real = graft.Tables.documents(spark, dir)
    val total = real.select(size(TextOps.tokens($"text")).cast("long"))
      .as[Long].collect().sum
    val sample = TextOps.systematicSample(real, "doc_id", "text", 1000L)
      .select("doc_id", "n_tokens", "start_tok", "n_picks")
      .as[(Long, Long, Long, Long)].collect()
    assert(sample.map(_._4).sum == total / 1000L)
    assert(sample.forall(_._2 > 0))
    val straight = real.select($"doc_id", size(TextOps.tokens($"text"))
        .cast("long").as("w")).as[(Long, Long)].collect().sortBy(_._1)
      .foldLeft((0L, List.empty[(Long, Long, Long, Long)])) {
        case ((start, acc), (id, w)) =>
          val picks = (start + w) / 1000L - start / 1000L
          (start + w,
            if (picks > 0) (id, w, start, picks) :: acc else acc)
      }._2.toSet
    assert(sample.toSet == straight)
  }

  test("packSequences ≡ naive global window; invariant under bucket count") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // empty doc, exact-boundary doc, straddling docs, non-dense ids
    val docs = Seq(
      (3L, "a b c d"), (10L, ""), (11L, "e f g"), (20L, "h i j k l m n"),
      (21L, "o"), (35L, "p q r s t u v w x y z aa bb cc")).toDF("doc_id", "text")
    val naive = docs
      .select($"doc_id", size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
      .withColumn("start_tok", coalesce(sum($"n_tokens").over(
        Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select($"doc_id", $"n_tokens", $"start_tok",
        when($"n_tokens" > 0, expr("start_tok div 5")).as("seq_first"),
        when($"n_tokens" > 0,
          expr("(start_tok + n_tokens - 1) div 5")).as("seq_last"))
      .collect().map(_.toString).sorted.toSeq
    for (nBuckets <- Seq(1, 3, 7, 64)) {
      val got = TextOps.packSequences(docs, "doc_id", "text",
          seqLen = 5, nBuckets = nBuckets)
        .collect().map(_.toString).sorted.toSeq
      assert(got == naive, s"nBuckets=$nBuckets")
    }
    // the layout's defining properties on a bigger random corpus: offsets
    // are a gapless tiling (each doc starts where the previous ended) and
    // straddling is detected exactly when a cut falls inside the doc
    val rnd = new scala.util.Random(7)
    val big = (0 until 500)
      .map(i => (i.toLong * 3, Seq.fill(rnd.nextInt(9))("w").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextOps.packSequences(big, "doc_id", "text", seqLen = 7, nBuckets = 11)
      .orderBy("doc_id")
      .select("n_tokens", "start_tok", "seq_first", "seq_last")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    rows.foldLeft(0L) { case (expectedStart, (n, start, f, l)) =>
      assert(start == expectedStart, "offsets must tile the token stream")
      for ((a, b) <- f.zip(l)) {
        assert(a <= b && a == start / 7 && b == (start + n - 1) / 7)
      }
      start + n
    }
  }

  test("bpeTrain equals the straight-line BPE reference; ties lexicographic") {
    import spark.implicits._
    def ref(words0: Seq[Array[String]], k: Int): Seq[TextOps.BpeMerge] = {
      var words = words0
      val acc = Seq.newBuilder[TextOps.BpeMerge]
      for (rank <- 0 until k) {
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long].withDefaultValue(0L)
        for (w <- words; i <- 0 until w.length - 1)
          counts((w(i), w(i + 1))) += 1
        if (counts.nonEmpty) {
          val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, x, y) }
          acc += TextOps.BpeMerge(rank, a, b, a + b, n)
          words = words.map { s =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                buf += a + b; i += 2
              } else { buf += s(i); i += 1 }
            }
            buf.toArray
          }
        }
      }
      acc.result()
    }
    // the classic fixture: "low"-family vocabulary learns "lo" then "low"
    val fix = Seq.fill(3)("low lower lowest") :+ "newer newest wider"
    val fixDf = fix.toDF("text")
    val gotFix = TextOps.bpeTrain(fixDf, "text", merges = 6)
    val wantFix = ref(fix.flatMap(_.split(" ").filter(_.nonEmpty))
      .map(_.map(_.toString).toArray), 6)
    assert(gotFix == wantFix, s"fixture:\n$gotFix\nvs\n$wantFix")
    assert(gotFix.take(2).map(_.merged) == Seq("lo", "low"))
    // real corpus, and invariance under partitioning (the distributed
    // count + deterministic argmax must not depend on layout)
    val docs = graft.Tables.documents(spark, dir).select("text")
    val corpus = docs.as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty)).toSeq
      .map(_.map(_.toString).toArray)
    val want = ref(corpus, 5)
    assert(TextOps.bpeTrain(docs, "text", merges = 5) == want)
    assert(TextOps.bpeTrain(docs.repartition(7), "text", merges = 5) == want)
    // merge-count monotonicity (the gate's self-validation contract)
    assert(want.sliding(2).forall {
      case Seq(a, b) => a.pair_count >= b.pair_count; case _ => true })
  }

  test("bpeEncode: rank-order application, exact counts, trained-vocab fit") {
    import spark.implicits._
    // hand merge table: ranks force "lo"+"w" before any other pairing
    val merges = Seq(
      TextOps.BpeMerge(0, "l", "o", "lo", 99),
      TextOps.BpeMerge(1, "lo", "w", "low", 98),
      TextOps.BpeMerge(2, "e", "r", "er", 97))
    val docs = Seq((1L, "low lower"), (2L, "zzz"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.bpeEncode(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // "low" → [low] (1 symbol of 3 chars); "lower" → [low, er] (2 of 5)
    assert(got(1L) == ((1L, 2L, 8L, 3L)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 3L, 3L)))   // no merge applies
    assert(got(3L) == ((3L, 0L, 0L, 0L)))   // empty doc: zero everything
    // end-to-end with a TRAINED table on the real corpus: encoding under
    // the corpus's own merges must compress (that is what training is for)
    val real = graft.Tables.documents(spark, dir)
    val trained = TextOps.bpeTrain(real.select("text"), "text", merges = 6)
    val enc = TextOps.bpeEncode(real, "doc_id", "text", trained)
    val (chars, syms) = enc.agg(sum($"n_chars"), sum($"n_symbols"))
      .as[(Long, Long)].head()
    assert(syms < chars, s"trained merges must compress: $syms vs $chars")
    assert(enc.filter($"n_symbols" > $"n_chars").count() == 0)
  }

  test("curation v2 composition: planted copies die, their originals live") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("txt31_curation_pipeline_v2")(spark, dir)
      .select($"doc_id", $"n_tokens", $"start_tok").as[(Long, Long, Long)]
      .collect().sortBy(_._3)
    assert(out.nonEmpty)
    // a planted copy shares its original's text AND source: quality keeps
    // or drops both together, and winnowing then always kills the copy
    // (higher id of the pair) — so no copy id can ever survive
    assert(!out.exists(_._1 >= 100000), "planted copies must be deduped")
    assert(out.exists(_._1 % 10 == 0), "some originals must survive")
    // the packed layout over the curated corpus still tiles gaplessly
    out.foldLeft(0L) { case (expected, (_, n, start)) =>
      assert(start == expected, "curated packing must tile the token stream")
      start + n
    }
  }

  test("noveltyStats: lowest id owns its grams; verbatim copies score zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // copy → 0.0
      (3L, "pack my box with five dozen liquor jugs"),     // disjoint → 1.0
      (4L, "jumps over the lazy dog and sleeps all day"),  // 2 old, 4 new
      (5L, "too short")).toDF("doc_id", "text")
    val got = Dedup.noveltyStats(docs, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6L, 6L, Some(1.0))))
    assert(got(2L) == ((2L, 6L, 0L, Some(0.0))), s"copy: ${got(2L)}")
    assert(got(3L) == ((3L, 5L, 5L, Some(1.0))))
    assert(got(4L) == ((4L, 6L, 4L, Some(4.0 / 6.0))), s"partial: ${got(4L)}")
    assert(got(5L) == ((5L, 0L, 0L, None)))
    // novelty is an id-order notion: swapping ids swaps who scores 0
    val swapped = Dedup.noveltyStats(
        docs.withColumn("doc_id",
          when($"doc_id" === 1, 2L).when($"doc_id" === 2, 1L)
            .otherwise($"doc_id")),
        "doc_id", "text", n = 4)
      .as[(Long, Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(swapped(1L)._4.contains(1.0) && swapped(2L)._4.contains(0.0))
  }

  test("classifier: planted degradation separates; weights dense and bounded") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val lab = docs.withColumn("pos", lit(true)).unionByName(
      docs.select((col("doc_id") + 500000).as("doc_id"),
        expr("replace(text, ' ', ' zz ')").as("text"))
        .withColumn("pos", lit(false)))
    val w = TextOps.classifierTrain(lab, "pos", "text", dims = 256)
    assert(w.count() == 256, "one weight per hash bucket, unseen included")
    val scored = TextOps.classifierScore(lab, "doc_id", "text", w, dims = 256)
      .join(lab.select(col("doc_id"), col("pos")), Seq("doc_id"))
      .filter(col("score").isNotNull)
      .select(col("pos"), col("score")).as[(Boolean, Double)].collect()
    val (pos, neg) = scored.partition(_._1)
    assert(pos.nonEmpty && neg.nonEmpty)
    // deterministic pipeline ⇒ fixed numbers, not a flaky sample: at the
    // zero threshold the planted degradation must separate cleanly
    val acc = (pos.count(_._2 > 0) + neg.count(_._2 <= 0)).toDouble / scored.length
    assert(acc >= 0.95, s"classifier accuracy collapsed: $acc")
    val meanP = pos.map(_._2).sum / pos.length
    val meanN = neg.map(_._2).sum / neg.length
    assert(meanP > meanN, s"mean separation inverted: $meanP vs $meanN")
  }

  test("repeatIntervals: cross-doc repeat found at any alignment; short misses") {
    import spark.implicits._
    val run = "r1 r2 r3 r4 r5 r6 r7 r8" // exactly minTokens = 8
    val docs = Seq(
      (1L, s"a1 a2 $run a3 a4"),
      // same 8-token run at a DIFFERENT alignment (passageStats would miss)
      (2L, s"b1 $run"),
      // 7-token repeat of the run's prefix: below minTokens, invisible
      (3L, "c1 r1 r2 r3 r4 r5 r6 r7 c2"),
      (4L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10")).toDF("doc_id", "text")
    val got = Dedup.repeatIntervals(docs, "doc_id", "text", minTokens = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 9L, 8L), (2L, 1L, 8L, 8L)),
      s"exactly the two aligned copies of the 8-token run: $got")
  }

  test("dropRepeats: first occurrence keeps its text, later copies lose it") {
    import spark.implicits._
    val run = "r1 r2 r3 r4 r5 r6 r7 r8"
    val run2 = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"a1 a2 $run a3"),            // first occurrence — keeps everything
      (2L, s"b1 $run b2 b3"),            // later copy — loses exactly the run
      (3L, s"$run2 x1 x2 $run2"),        // within-doc repeat: 2nd copy dropped
      (4L, "d1 d2 d3 d4 d5 d6 d7 d8 d9")).toDF("doc_id", "text")
    val got = Dedup.dropRepeats(docs, "doc_id", "text", minTokens = 8)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 11L, 11L, 0L, s"a1 a2 $run a3")))
    assert(got(2L) == ((2L, 11L, 3L, 8L, "b1 b2 b3")), s"copy: ${got(2L)}")
    assert(got(3L) == ((3L, 18L, 10L, 8L, s"$run2 x1 x2")), s"self: ${got(3L)}")
    assert(got(4L) == ((4L, 9L, 9L, 0L, "d1 d2 d3 d4 d5 d6 d7 d8 d9")))
    // invariant: total kept+dropped tiles every doc
    assert(got.values.forall(r => r._3 + r._4 == r._2))
  }

  test("contaminationReport: OR of the two signals, per-signal evidence kept") {
    import spark.implicits._
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val filler2 = (1 to 40).map(i => s"v$i").mkString(" ")
    val train = Seq((1L, filler), (2L, filler2)).toDF("doc_id", "text")
    val eval = Seq(
      (101L, filler),                                   // verbatim leak
      (102L, filler.split(" ").drop(5).mkString(" ")),  // clipped near-dup
      (103L, (1 to 40).map(i => s"z$i").mkString(" "))) // clean
      .toDF("doc_id", "text")
    val got = Dedup.contaminationReport(train, eval, "doc_id", "text", n = 4)
      .select("doc_id", "overlap_frac", "n_neardup", "contaminated")
      .as[(Long, Option[Double], Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(101L)._2.contains(1.0) && got(101L)._4,
      s"verbatim leak must flag: ${got(101L)}")
    assert(got(102L)._4 && (got(102L)._2.exists(_ >= 0.5) || got(102L)._3 > 0),
      s"clipped leak must flag via at least one signal: ${got(102L)}")
    assert(!got(103L)._4 && got(103L)._2.contains(0.0) && got(103L)._3 == 0L,
      s"clean doc must pass: ${got(103L)}")
    assert(got.keySet == Set(101L, 102L, 103L), "one row per eval doc")
  }

  test("shardAssign: complete, deterministic shuffle order, dense positions") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val got = TextOps.shardAssign(docs, "doc_id", nShards = 8)
      .as[(Int, Int, Long)].collect()
    assert(got.length == 500 && got.map(_._3).distinct.length == 500,
      "every doc lands in exactly one shard slot")
    assert(got.map(_._1).toSet.subsetOf((0 until 8).toSet))
    // positions are dense 1..n within each shard
    got.groupBy(_._1).foreach { case (sh, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length).toSeq,
        s"shard $sh positions not dense") }
    // the order is a property of the DATA, not the physical layout
    val again = TextOps.shardAssign(docs.repartition(13), "doc_id", 8)
      .as[(Int, Int, Long)].collect()
    assert(got.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("vocab save/load round-trips; corrupt tables rejected at load") {
    import spark.implicits._
    val trained = TextOps.bpeTrain(
      graft.Tables.documents(spark, dir).select("text"), "text", merges = 6)
    val vdir = java.nio.file.Files.createTempDirectory("vocab").toString
    TextOps.saveVocab(spark, trained, s"$vdir/good")
    assert(TextOps.loadVocab(spark, s"$vdir/good") == trained)
    // a truncated table (rank gap) must fail at load, not mis-encode later
    TextOps.saveVocab(spark, trained.filterNot(_.rank == 2), s"$vdir/gap")
    intercept[IllegalArgumentException] {
      TextOps.loadVocab(spark, s"$vdir/gap") }
    // a tampered merged symbol must fail the left+right contract
    TextOps.saveVocab(spark,
      trained.updated(1, trained(1).copy(merged = "zz")), s"$vdir/bad")
    intercept[IllegalArgumentException] {
      TextOps.loadVocab(spark, s"$vdir/bad") }
  }

  test("boilerplateRemove: per-source threshold, all copies drop, tail lines") {
    import spark.implicits._
    val hdr = "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10" // exactly one 10-token line
    val docs = Seq(
      (1L, "a", s"$hdr u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
      (2L, "a", s"$hdr v1 v2 v3 v4 v5"),  // ragged 5-token tail line
      (3L, "a", s"$hdr $hdr w1"),         // header TWICE — both must die
      (4L, "a", hdr),                     // pure boilerplate — empties out
      (5L, "b", s"$hdr x1 x2"),           // source b: df=2 < minDf → kept
      (6L, "b", s"$hdr y1"),
      (7L, "b", "z1 z2 z3")).toDF("doc_id", "source", "text")
    val got = Dedup.boilerplateRemove(docs, "doc_id", "text", "source",
        lineTokens = 10, minDf = 3)
      .as[(Long, String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // source a: header in 4 distinct docs ≥ 3 → every occurrence removed,
    // including BOTH copies inside doc 3 (no keep-first for boilerplate)
    assert(got(1L) == ((1L, "a", 2L, 1L, 10L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")))
    assert(got(2L) == ((2L, "a", 2L, 1L, 5L, "v1 v2 v3 v4 v5")))
    assert(got(3L) == ((3L, "a", 3L, 2L, 1L, "w1")), s"both copies: ${got(3L)}")
    assert(got(4L) == ((4L, "a", 1L, 1L, 0L, "")))
    // source b: same header but df=2 < 3 — threshold is PER SOURCE
    assert(got(5L) == ((5L, "b", 2L, 0L, 12L, s"$hdr x1 x2")))
    assert(got(6L) == ((6L, "b", 2L, 0L, 11L, s"$hdr y1")))
    assert(got(7L) == ((7L, "b", 1L, 0L, 3L, "z1 z2 z3")))
  }

  test("winnowing: shift-tolerant (the guarantee block hashing lacks)") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, shared),
      // same content shifted by a 3-token prefix: every fixed block boundary
      // breaks, but winnowing's windows move WITH the content
      (2L, "zz yy xx " + shared),
      (3L, "kilo lima mike november oscar papa quebec romeo sierra tango")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowMatches(docs, "doc_id", "text",
        k = 4, w = 4, minShared = 2, maxDf = 50)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // contrast: fixed-block passage hashing misses the shifted copy entirely
    val blocks = Dedup.passageStats(docs, "doc_id", "text", blockTokens = 4)
      .filter($"n_dup_passages" > 0).count()
    assert(blocks == 0, "fixed blocks must NOT see the shifted duplicate")
  }

  test("winnowing theorem: any shared run of ≥ w+k−1 tokens shares a fp") {
    import spark.implicits._
    // the minimal guaranteed run: w+k−1 = 7 tokens, planted at DIFFERENT
    // offsets inside otherwise-disjoint documents, every offset combination
    val run = "one two three four five six seven"
    val pads = Seq("", "aa ", "aa bb ", "aa bb cc dd ee ff gg hh ")
    val docs = pads.zipWithIndex.map { case (p, i) =>
      (i.toLong, p + run + " tail" + i)
    }.toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .as[(Long, Int, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._3).toSet).toMap
    for (i <- pads.indices; j <- pads.indices if i < j)
      assert(fps(i.toLong).intersect(fps(j.toLong)).nonEmpty,
        s"docs $i and $j share a 7-token run but no fingerprint")
  }

  test("winnowing density ≈ 2/(w+1) on the real corpus; short docs empty") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir).select($"doc_id", $"text")
    val nFps = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 4)
      .count().toDouble
    val nGrams = docs
      .select(size(TextOps.shingles(TextOps.tokens($"text"), 4)).as("n"))
      .agg(sum($"n")).as[Long].head.toDouble
    // expected density 2/(w+1) = 0.4; distinct-collapse pulls it a bit lower
    val density = nFps / nGrams
    assert(density > 0.2 && density < 0.55, s"density $density")
    // a doc below k tokens has no grams, hence no fingerprints — and the
    // selection is a pure function of content: same text ⇒ same (pos, fp)
    val twin = Seq((100L, "tiny doc"), (101L, "alpha bravo charlie delta echo"),
      (102L, "alpha bravo charlie delta echo")).toDF("doc_id", "text")
    val sel = Dedup.winnowFingerprints(twin, "doc_id", "text", k = 4, w = 4)
      .as[(Long, Int, Long)].collect()
    assert(!sel.exists(_._1 == 100L))
    assert(sel.filter(_._1 == 101L).map(r => (r._2, r._3)).toSet ==
      sel.filter(_._1 == 102L).map(r => (r._2, r._3)).toSet)
  }

  test("calibratedQualityKeep: per-source thresholds, kept ≥ dropped, bound") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val kept = TextOps.calibratedQualityKeep(docs, "doc_id", "source", "text",
      bins = 50, cutFrac = 0.5)
    val scored = docs.select($"doc_id", $"source",
        TextOps.qualityBin($"text", 50).as("bin"))
      .filter($"bin".isNotNull)
    val joined = scored.join(kept.select($"doc_id", lit(1).as("k")),
      Seq("doc_id"), "left")
    // per source: every kept doc outscores every dropped doc (threshold
    // semantics), and the kept count respects the cut bound
    val per = joined.groupBy($"source").agg(
        min(when($"k" === 1, $"bin")).as("minKept"),
        max(when($"k".isNull, $"bin")).as("maxDrop"),
        sum(when($"k" === 1, 1L).otherwise(0L)).as("nKept"),
        count(lit(1)).as("n"))
      .as[(String, Option[Int], Option[Int], Long, Long)].collect()
    assert(per.nonEmpty)
    per.foreach { case (src, minKept, maxDrop, nKept, n) =>
      for (a <- minKept; b <- maxDrop)
        assert(a > b, s"$src: dropped bin $b outscores kept bin $a")
      assert(nKept <= n - math.ceil(0.5 * n).toLong, s"$src kept $nKept of $n")
    }
    // the point of CALIBRATED thresholds: a clean and a noisy source each
    // keep their own top half — a global cutoff would keep all of one and
    // none of the other (diversity ranges are made disjoint: repeated
    // tokens pull diversity low, unique tokens hold it at 1.0)
    // clean docs spread over several high bins (a source whose entire mass
    // sits in ONE bin keeps nothing — the documented granularity edge)
    val synth = ((0 until 20).map(i =>
        (i.toLong, "clean", ((0 until 12).map(j => s"u${i}w$j") ++
          Seq.fill(i % 3)(s"u${i}w0")).mkString(" "))) ++
      (0 until 20).map(i =>
        (100L + i, "noisy", ("dup " * (8 + i) + s"tail$i").trim))
      ).toDF("doc_id", "source", "text")
    val keptSynth = TextOps.calibratedQualityKeep(synth, "doc_id", "source",
        "text", bins = 50, cutFrac = 0.5)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(keptSynth.keySet == Set("clean", "noisy"),
      s"both sources must survive calibration: $keptSynth")
  }

  test("winnowMatches: maxDf drops boilerplate fps; minShared thresholds") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq((1L, shared), (2L, "pre fix " + shared)).toDF("doc_id", "text")
    // with maxDf = 1 every shared fingerprint is "boilerplate" — no pairs
    assert(Dedup.winnowMatches(docs, "doc_id", "text", maxDf = 1).count() == 0)
    // raising minShared above the actual overlap also empties the result
    val n = Dedup.winnowMatches(docs, "doc_id", "text", minShared = 2)
      .select($"n_shared").as[Long].head
    assert(Dedup.winnowMatches(docs, "doc_id", "text",
      minShared = n + 1).count() == 0)
  }

  test("setSimilarityJoin ≡ brute-force Jaccard over all pairs (prefix filter complete)") {
    val rnd = new scala.util.Random(17)
    val vocab = (1 to 30).map(i => s"w$i")
    for (t <- Seq(0.5, 0.7, 0.9); trial <- 1 to 3) {
      val docs = (1L to 25L).map { id =>
        val n = 3 + rnd.nextInt(10)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // plant one exact duplicate and one near-duplicate
      val planted = docs ++ Seq((100L, docs.head._2),
        (101L, docs(1)._2 + " " + docs(1)._2.split(" ").head))
      val got = Dedup.setSimilarityJoin(planted.toDF("doc_id", "text"),
          "doc_id", "text", t)
        .select($"a", $"b").as[(Long, Long)].collect().toSet
      val sets = planted.map { case (id, s) =>
        id -> s.split(" ").filter(_.nonEmpty).toSet }.toMap
      val expect = (for {
        (i, si) <- sets.toSeq; (j, sj) <- sets.toSeq if i < j
        inter = (si & sj).size
        if si.nonEmpty && sj.nonEmpty &&
          inter.toDouble / (si.size + sj.size - inter) >= t
      } yield (i, j)).toSet
      assert(got == expect, s"t=$t trial=$trial")
      assert(expect.contains((1L, 100L))) // the planted duplicate is found
    }
  }

  test("fuzzyPairsEd1 ≡ brute-force levenshtein over all pairs (FastSS completeness)") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val strs = (1L to 40L).map { id =>
        val n = 2 + rnd.nextInt(6)
        (id, Seq.fill(n)(('a' + rnd.nextInt(3)).toChar).mkString) // tiny alphabet → many near-misses
      }
      val got = Dedup.fuzzyPairsEd1(strs.toDF("id", "s"), "id", "s")
        .select($"a", $"b", $"dist").as[(Long, Long, Int)].collect().toSet
      val expect = (for {
        (i, si) <- strs; (j, sj) <- strs if i < j
        dd = lev(si, sj) if dd <= 1
      } yield (i, j, dd)).toSet
      assert(got == expect, s"trial=$trial")
      assert(expect.nonEmpty) // the tiny alphabet guarantees real work
    }
  }

  test("clusterDedupByQuality: fuller member beats clipped copy; ties keep min id") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val other = (100 to 130).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),                          // cluster A: fullest
      (2L, base.split(" ").dropRight(6).mkString(" ")), // clipped — must drop
      (3L, other),                         // cluster B: tie on length
      (4L, other),                         //   → min id 3 kept
      (5L, "completely different isolated content here")) // unclustered
      .toDF("doc_id", "text")
      .withColumn("q_len", octet_length($"text").cast("long"))
    val kept = Dedup.clusterDedupByQuality(docs, "doc_id", "text", "q_len")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
    // contrast: min-id dedup would also keep 1/3/5 here, so flip cluster A —
    // give the HIGHER id the fuller text and assert quality wins over id
    val flipped = Seq((1L, base.split(" ").dropRight(6).mkString(" ")),
      (2L, base)).toDF("doc_id", "text")
      .withColumn("q_len", octet_length($"text").cast("long"))
    val kept2 = Dedup.clusterDedupByQuality(flipped, "doc_id", "text", "q_len")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept2 == Set(2L), "quality must beat the min-id default")
  }

  test("rakeKeywords: hand-computed deg/freq scores; solo phrases filtered") {
    val docs = Seq(
      (1L, "deep learning of deep networks"),
      (2L, "training of models of data")).toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(docs, "doc_id", "text",
      stopwords = Seq("of"), minWords = 2)
      .select($"doc_id", $"phrase", $"n_words", $"score")
      .as[(Long, String, Long, Double)].collect().toSet
    // deep: freq 2, deg 2+2=4 → 2.0; learning/networks: freq 1, deg 2 → 2.0
    // ⇒ both phrases score 4.0; doc 2's singleton phrases fall below minWords
    assert(got == Set(
      (1L, "deep learning", 2L, 4.0),
      (1L, "deep networks", 2L, 4.0)))
  }

  test("leakage-safe split: every dup-cluster lands whole in ONE split") {
    val docs = graft.Tables.documents(spark, dir).select($"doc_id", $"text")
    // plant copies whose id-hash split WOULD differ from the original's
    val planted = docs.unionByName(docs.filter($"doc_id" % 4 === 0)
      .select(($"doc_id" + 50000).as("doc_id"), $"text"))
    val cl = Dedup.clustersDistributed(
      Dedup.minhashCandidatePairs(planted, "doc_id", "text"))
    val wr = planted.join(cl, planted("doc_id") === cl("member"), "left")
      .select(planted("doc_id"), coalesce($"rep", planted("doc_id")).as("rep"))
    val split = wr.withColumn("split",
      TextOps.splitLabel(TextOps.splitBucket($"rep", 42, 10)))
    // a cluster never straddles splits
    val straddlers = split.groupBy($"rep")
      .agg(countDistinct($"split").as("ns")).filter($"ns" > 1).count()
    assert(straddlers == 0)
    // and the planted copies demonstrably clustered with their originals
    val copyReps = split.filter($"doc_id" >= 50000).select($"doc_id", $"rep")
      .as[(Long, Long)].collect()
    assert(copyReps.nonEmpty && copyReps.forall { case (id, rep) => rep <= id - 50000 })
  }

  test("lengthBucketBatches: complete, band-homogeneous batches, layout-invariant") {
    val docs = graft.Tables.documents(spark, dir)
    val out = TextOps.lengthBucketBatches(docs, "doc_id", "text",
      bandWidth = 16, batchSize = 8)
    val n = docs.filter(length(trim($"text")) > 0).count()
    assert(out.count() == n)                               // every doc once
    assert(out.select($"doc_id").distinct().count() == n)
    // positions dense in [0, batchSize); batch homogeneity bounded by band
    val bad = out.filter($"pos" < 0 || $"pos" >= 8).count()
    assert(bad == 0)
    val spread = out.groupBy($"band", $"batch_id")
      .agg((max($"n_tokens") - min($"n_tokens")).as("spread"),
        countDistinct($"pos").as("np"), count(lit(1)).as("cnt"))
    assert(spread.filter($"spread" >= 16).count() == 0)    // padding bound
    assert(spread.filter($"np" =!= $"cnt").count() == 0)   // pos dense per batch
    // deterministic under physical layout
    val again = TextOps.lengthBucketBatches(docs.repartition(11), "doc_id",
      "text", bandWidth = 16, batchSize = 8)
    assert(out.collect().toSet == again.collect().toSet)
  }

  test("chunk: overlap windows cover every token; tails short; empty docs dropped") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: 3 chunks @4/3
      (2L, "a b c"),                                  // 3 toks: 1 chunk
      (3L, "  "),                                     // empty after tokenize
      (4L, "solo")).toDF("doc_id", "text")
    val got = TextOps.chunk(docs, "doc_id", "text", size = 4, stride = 3)
      .select($"doc_id", $"chunk_idx", $"tok_start", $"n_toks", $"chunk_text")
      .as[(Long, Int, Int, Int, String)].collect().toSet
    assert(got == Set(
      (1L, 0, 0, 4, "t1 t2 t3 t4"),
      (1L, 1, 3, 4, "t4 t5 t6 t7"),
      (1L, 2, 6, 4, "t7 t8 t9 t10"),
      (1L, 3, 9, 1, "t10"),
      (2L, 0, 0, 3, "a b c"),
      (4L, 0, 0, 1, "solo")))
    // disjoint blocks when stride = size: every token in exactly one chunk
    val blocks = TextOps.chunk(docs, "doc_id", "text", size = 5, stride = 5)
      .agg(sum($"n_toks")).head().getLong(0)
    assert(blocks == 10 + 3 + 1)
    intercept[IllegalArgumentException] { // stride > size drops tokens
      TextOps.chunk(docs, "doc_id", "text", size = 3, stride = 4)
    }
  }

  test("blocklist filter: anchor-join ≡ brute contains, token boundaries hold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),      // matches "brown fox"
      (2L, "a slow fast table scan"),          // matches "slow fast"
      (3L, "nobrown foxhole here"),            // substring, NOT a token match
      (4L, "brown fox brown fox twice"),       // still ONE phrase match row
      (5L, "clean document entirely"),
      (6L, "slow fast brown fox both")         // two distinct phrases
    ).toDF("doc_id", "text")
    val bl = Seq("brown fox", "slow fast", "never present").toDF("phrase")
    val got = TextOps.blocklistFilter(docs, "doc_id", "text", bl, "phrase")
      .select("doc_id", "n_matched", "blocked")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(
      1L -> (1L, true), 2L -> (1L, true), 3L -> (0L, false),
      4L -> (1L, true), 5L -> (0L, false), 6L -> (2L, true)))
    // brute-force cross-check: every doc × phrase boundary-padded contains
    val brute = docs.crossJoin(bl)
      .filter(concat(lit(" "), $"text", lit(" "))
        .contains(concat(lit(" "), $"phrase", lit(" "))))
      .groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(got.forall { case (id, (n, _)) => brute.getOrElse(id, 0L) == n })
  }

  test("stemLite: rule order, length guards, and inflection collapse") {
    import spark.implicits._
    val cases = Seq(
      "caresses" -> "caress",   // sses → ss
      "ponies"   -> "poni",     // ies → i
      "caress"   -> "caress",   // ss kept (rule 3 blocks rule 4)
      "cats"     -> "cat",      // trailing s
      "its"      -> "its",      // len guard: 3-char word keeps its s
      "running"  -> "runn",     // ing stripped (len > 5)
      "sing"     -> "sing",     // len guard: 4-char keeps ing
      "wanted"   -> "want",     // ed stripped (len > 4)
      "red"      -> "red",      // len guard
      "table"    -> "table")    // no rule
    val got = cases.map(_._1).toDF("tok")
      .select($"tok", TextOps.stemLite($"tok").as("stem"))
      .as[(String, String)].collect().toMap
    for ((tok, want) <- cases)
      assert(got(tok) == want, s"stem($tok) = ${got(tok)}, want $want")
    // stemming only ever merges types, never splits them
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val toks = docs.select(explode(TextOps.tokens($"text")).as("tok"))
    val raw = toks.select($"tok").distinct().count()
    val stemmed = toks.select(TextOps.stemLite($"tok")).distinct().count()
    assert(stemmed <= raw && stemmed > 0)
  }
}
