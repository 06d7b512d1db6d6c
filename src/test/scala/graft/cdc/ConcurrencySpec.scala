package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Optimistic concurrency on the commit path: two writers racing one
  * MaterializedTable (merge×merge, compact×merge) and one TableGroup root
  * must each land exactly once or throw ConcurrentCommitException — never
  * a silent lost commit, an orphaned version, or a root regression. Plus
  * the crashed-writer recovery paths (stale claim break, stale root lock
  * break).
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def withRetain[A](n: Int)(f: => A): A = {
    spark.conf.set("spark.graft.materialized.retainVersions", n.toString)
    try f finally spark.conf.unset("spark.graft.materialized.retainVersions")
  }

  private def rows(rs: (String, String, Long, Long)*): DataFrame =
    rs.toSeq.toDF("op", "key", "lsn", "v")
      .withColumn("seq", lit(0L))

  /** Retry `op` through lost optimistic commits — the documented caller
    * policy. Returns the number of conflicts absorbed.
    */
  private def withOccRetry[A](op: => A): (A, Int) = {
    var conflicts = 0
    while (true) {
      try return (op, conflicts)
      catch {
        case _: MaterializedTable.ConcurrentCommitException => conflicts += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  test("two writers merging one table: every batch lands exactly once or throws; no silent loss") {
    withRetain(2) {
      val dir = tmp("occ_mm")
      val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val perWriter = 12
      def writer(w: Int): Thread = new Thread(() => {
        try {
          for (k <- 1 to perWriter) {
            // unique key per (writer, batch): a double-landed commit shows
            // as a duplicate key, a lost one as a missing key
            val (_, c) = withOccRetry {
              MaterializedTable.merge(spark, dir,
                rows(("insert", s"w$w-$k", k.toLong, w * 1000L + k)),
                Seq("key"), Seq("lsn", "seq"), numBuckets = 4)
            }
            conflicts.addAndGet(c)
          }
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      })
      val ws = Seq(writer(1), writer(2))
      ws.foreach(_.start()); ws.foreach(_.join(300000))
      assert(failure.get() == null,
        s"writer failed with a non-OCC error: ${Option(failure.get())}")
      val keys = MaterializedTable.read(spark, dir)
        .select("key").as[String].collect().toSeq
      assert(keys.size == keys.distinct.size, "a commit landed twice")
      assert(keys.toSet ==
        (for (w <- 1 to 2; k <- 1 to perWriter) yield s"w$w-$k").toSet,
        "a commit was silently lost")
      // the manifest is a consistent serial history: every version claimed
      // exactly once, head = number of landed commits
      val versions = MaterializedTable.listVersions(spark, dir)
      assert(versions == (1L to (2L * perWriter)),
        s"expected ${2 * perWriter} serialized commits, got $versions")
      // sanity: this machine actually raced them at least once most runs —
      // but scheduling can serialize; only log, never flake
      info(s"conflicts absorbed: ${conflicts.get()}")
    }
  }

  test("maintenance races a writer: compact vs merge both land-or-throw; state never corrupts") {
    withRetain(2) {
      val dir = tmp("occ_cm")
      // seed state with several files per bucket so compaction has work
      for (b <- 1 to 3)
        MaterializedTable.merge(spark, dir,
          rows((1 to 8).map(i => ("insert", s"seed-$b-$i", b.toLong, i.toLong)): _*),
          Seq("key"), Seq("lsn", "seq"), numBuckets = 2)
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
      val nMaint = 5
      val nMerge = 6
      // BOUNDED on both sides — an open-ended maintenance loop against a
      // retrying writer on one tiny shared table churns for minutes (each
      // lost race re-stages a full Spark job); the race is just as real
      // with each side committing a fixed count concurrently.
      val compactor = new Thread(() => {
        try {
          for (_ <- 1 to nMaint) {
            // clustered compact: rewrites every bucket, so the drill always
            // has real maintenance work to race against the writer (plain
            // bin-packing finds nothing here — AQE coalesces these tiny
            // merges to one file per bucket already)
            val (n, c) = withOccRetry {
              MaterializedTable.compact(spark, dir, maxFilesPerBucket = 1,
                sortCols = Seq("key"))
            }
            assert(n > 0, "clustered compact must always have work")
            conflicts.addAndGet(c)
          }
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      })
      compactor.start()
      try {
        for (k <- 1 to nMerge) {
          val (_, c) = withOccRetry {
            MaterializedTable.merge(spark, dir,
              rows(("insert", s"m-$k", 100L + k, k.toLong),
                ("update", s"seed-1-1", 200L + k, 9000L + k)),
              Seq("key"), Seq("lsn", "seq"), numBuckets = 2)
          }
          conflicts.addAndGet(c)
        }
      } finally compactor.join(300000)
      assert(failure.get() == null,
        s"compactor failed with a non-OCC error: ${Option(failure.get())}")
      val state = MaterializedTable.read(spark, dir)
      assert(state.count() == 3 * 8 + nMerge)
      // the contended key holds the LAST writer update — compaction moved
      // bytes but never resurrected an older row
      assert(state.filter($"key" === "seed-1-1").select("v")
        .as[Long].head() == 9000L + nMerge)
      assert(state.select("key").distinct().count() == 3 * 8 + nMerge)
      // every commit landed exactly once: 3 seeds + merges + compactions,
      // each as its own serialized version
      assert(MaterializedTable.listVersions(spark, dir) ==
        (1L to (3L + nMerge + nMaint)), "a commit was lost or double-landed")
      info(s"conflicts absorbed: ${conflicts.get()}")
    }
  }

  test("a crashed writer's claim surfaces as StaleCommitClaim (never silently stolen); recover() clears it") {
    withRetain(2) {
      spark.conf.set("spark.graft.occ.claimGraceMs", "300")
      try {
        val dir = tmp("occ_stale")
        MaterializedTable.merge(spark, dir, rows(("insert", "a", 1L, 1L)),
          Seq("key"), Seq("lsn", "seq"), numBuckets = 2)
        // simulate a writer that died between claim and publish: plant a
        // versioned manifest ABOVE the head with no data and no primary swap
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val claim = new org.apache.hadoop.fs.Path(dir, "_graft_manifest.v2.json")
        val os = fs.create(claim, false)
        try os.write("{}".getBytes("UTF-8")) finally os.close()
        // the head never moves: after the grace window this is diagnosed as
        // a CRASHED writer — a distinct, non-retryable error (an in-line
        // break would be an unfenced lease steal against a slow live writer)
        val t0 = System.nanoTime()
        val e = intercept[MaterializedTable.StaleCommitClaimException] {
          MaterializedTable.merge(spark, dir, rows(("insert", "b", 2L, 2L)),
            Seq("key"), Seq("lsn", "seq"), numBuckets = 2)
        }
        val waited = (System.nanoTime() - t0) / 1e6
        assert(waited >= 250.0, f"must wait out the grace window ($waited%.0f ms)")
        assert(e.getMessage.contains("recover"), e.getMessage)
        // the documented recovery: stop writers, recover, retry
        assert(MaterializedTable.recover(spark, dir) >= 1)
        MaterializedTable.merge(spark, dir, rows(("insert", "b", 2L, 2L)),
          Seq("key"), Seq("lsn", "seq"), numBuckets = 2)
        assert(MaterializedTable.read(spark, dir).count() == 2)
        assert(MaterializedTable.listVersions(spark, dir) == Seq(1L, 2L))
      } finally spark.conf.unset("spark.graft.occ.claimGraceMs")
    }
  }

  test("duplicate group producers: every batch folds exactly once; the root never regresses") {
    withRetain(3) {
      val root = tmp("occ_grp")
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val nBatches = 8
      // failover shape: BOTH producers submit EVERY batch id — the
      // watermark CAS inside the root lock makes the second a no-op
      def producer(): Thread = new Thread(() => {
        try {
          for (id <- 1 to nBatches) {
            withOccRetry {
              TableGroup.commit(spark, root,
                Seq(TableGroup.TableBatch("t",
                  rows(("insert", s"k$id", id.toLong, id.toLong)), Seq("key"))),
                Seq("lsn", "seq"), batchId = id.toLong, numBuckets = 2)
            }
            ()
          }
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      })
      val ps = Seq(producer(), producer())
      ps.foreach(_.start()); ps.foreach(_.join(300000))
      assert(failure.get() == null,
        s"producer failed with a non-OCC error: ${Option(failure.get())}")
      val g = TableGroup.readRoot(spark, root).get
      assert(g.lastBatchId == nBatches.toLong, "root watermark regressed or stalled")
      val st = TableGroup.read(spark, root, "t")
      assert(st.count() == nBatches.toLong, "a duplicate fold doubled a batch")
      assert(st.select("key").as[String].collect().toSet ==
        (1 to nBatches).map(i => s"k$i").toSet, "a batch was lost")
    }
  }

  test("a crashed root-lock holder surfaces as StaleCommitClaim; recover() clears it") {
    withRetain(3) {
      spark.conf.set("spark.graft.occ.claimGraceMs", "100")
      try {
        val root = tmp("occ_lock")
        TableGroup.commit(spark, root,
          Seq(TableGroup.TableBatch("t", rows(("insert", "a", 1L, 1L)),
            Seq("key"))), Seq("lsn", "seq"), batchId = 1L, numBuckets = 2)
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val lock = new org.apache.hadoop.fs.Path(root, "_graft_group.lock")
        val os = fs.create(lock, false)
        try os.write("dead".getBytes("UTF-8")) finally os.close()
        val e = intercept[MaterializedTable.StaleCommitClaimException] {
          TableGroup.commit(spark, root,
            Seq(TableGroup.TableBatch("t", rows(("insert", "b", 2L, 2L)),
              Seq("key"))), Seq("lsn", "seq"), batchId = 2L, numBuckets = 2)
        }
        assert(e.getMessage.contains("recover"), e.getMessage)
        assert(TableGroup.recover(spark, root) == 1)
        TableGroup.commit(spark, root,
          Seq(TableGroup.TableBatch("t", rows(("insert", "b", 2L, 2L)),
            Seq("key"))), Seq("lsn", "seq"), batchId = 2L, numBuckets = 2)
        assert(TableGroup.readRoot(spark, root).get.lastBatchId == 2L)
        assert(!fs.exists(lock), "the lock must be released after the commit")
      } finally spark.conf.unset("spark.graft.occ.claimGraceMs")
    }
  }

  test("withCommitRetry: bounded, retries only the retryable class, stale claims propagate immediately") {
    // deterministic unit drill of the policy the streaming folds wrap their
    // commits in — conflicts absorbed up to the bound, result returned
    var calls = 0
    val before = MaterializedTable.commitRetryCount.get()
    val out = MaterializedTable.withCommitRetry(spark) {
      calls += 1
      if (calls <= 2)
        throw new MaterializedTable.ConcurrentCommitException("race")
      42
    }
    assert(out == 42 && calls == 3)
    assert(MaterializedTable.commitRetryCount.get() - before == 2,
      "absorbed conflicts must be observable")
    // a crashed writer's claim is NOT retryable: spinning would mask the
    // crash — it must propagate on the FIRST throw
    var staleCalls = 0
    intercept[MaterializedTable.StaleCommitClaimException] {
      MaterializedTable.withCommitRetry(spark) {
        staleCalls += 1
        throw new MaterializedTable.StaleCommitClaimException("dead claim")
      }
    }
    assert(staleCalls == 1, "stale claims must never be retried")
    // endless conflict surfaces after the bound (default 5 retries)
    var always = 0
    intercept[MaterializedTable.ConcurrentCommitException] {
      MaterializedTable.withCommitRetry(spark) {
        always += 1
        throw new MaterializedTable.ConcurrentCommitException("always")
      }
    }
    assert(always == 6, s"expected 1 + 5 bounded retries, saw $always")
  }

  test("maintenance racing a LIVE streaming fold: the query survives via bounded retry; state stays exact") {
    withRetain(2) {
      // a zero-sleep compaction loop on a tiny table out-commits the fold's
      // re-stage cycle — raise the drill's retry budget (the conf exists for
      // exactly this contention tuning); the DEFAULT bound is pinned by the
      // unit drill above
      spark.conf.set("spark.graft.occ.commitRetries", "200")
      spark.conf.set("spark.graft.occ.commitRetryBackoffMs", "25")
      try {
      val dir0 = java.nio.file.Files.createTempDirectory("occ_live").toString
      val dir = s"$dir0/t"; val src = s"$dir0/src"
      val nBatches = 10
      for (k <- 1 to nBatches)
        Seq(("g", 1L, k.toDouble)).toDF("grp", "dn", "dv")
          .coalesce(1).write.parquet(f"$src/f$k%02d")
      // seed so the clustered compact always has real work to race
      IncrementalAgg.foldStanding(spark, dir,
        (1 to 8).map(i => (s"seed$i", 1L, 1.0)).toDF("grp", "dn", "dv"),
        numBuckets = 2)
      val schema = spark.read.parquet(f"$src/f01").schema
      val maintFail = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val maintConflicts = new java.util.concurrent.atomic.AtomicInteger(0)
      // the maintenance side: a BOUNDED number of clustered compactions
      // starting once the stream's first fold has landed (so the race
      // overlaps the live query, not its startup). A maintenance job is
      // ALLOWED to lose races (it retries); the STREAM must never die to
      // one. Bounded on both sides — an open-ended compaction loop against
      // a re-staging fold on one tiny table churns past any timeout (each
      // lost race re-stages a full Spark job), same rationale as the
      // bounded compact×merge drill above.
      val nMaint = 5
      val maint = new Thread(() => {
        try {
          val deadline = System.nanoTime() + 120L * 1000000000L
          while (MaterializedTable.read(spark, dir)
              .filter($"grp" === "g").isEmpty && System.nanoTime() < deadline)
            Thread.sleep(100L)
          for (_ <- 1 to nMaint) {
            val (_, c) = withOccRetry {
              MaterializedTable.compact(spark, dir, maxFilesPerBucket = 1,
                sortCols = Seq("grp"))
            }
            maintConflicts.addAndGet(c)
          }
        } catch { case t: Throwable => maintFail.compareAndSet(null, t) }
      })
      val retriesBefore = MaterializedTable.commitRetryCount.get()
      maint.start()
      try {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$src/f*")
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            IncrementalAgg.foldStandingBatch(spark, dir, b, id, numBuckets = 2)
            ()
          }
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("occ_live_ck").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        // the assertion: the query DRAINS — before this round a single lost
        // commit killed it with ConcurrentCommitException through
        // foreachBatch (only the cdc67 gate retried by hand)
        assert(q.awaitTermination(300000), "streaming fold did not drain")
      } finally maint.join(300000)
      assert(maintFail.get() == null,
        s"maintenance failed non-optimistically: ${Option(maintFail.get())}")
      // final state exact: every delta folded exactly once despite the races
      val g = MaterializedTable.read(spark, dir)
        .filter($"grp" === "g").select("n_live", "sum_value")
        .as[(Long, java.math.BigDecimal)].head()
      assert(g._1 == nBatches.toLong, s"fold count off: $g")
      assert(g._2.doubleValue == (1 to nBatches).map(_.toDouble).sum, s"fold sum off: $g")
      val absorbed = MaterializedTable.commitRetryCount.get() - retriesBefore
      info(s"stream retries absorbed: $absorbed; " +
        s"maintenance conflicts: ${maintConflicts.get()}")
      } finally {
        spark.conf.unset("spark.graft.occ.commitRetries")
        spark.conf.unset("spark.graft.occ.commitRetryBackoffMs")
      }
    }
  }

  test("a stale (crashed-writer) claim still KILLS a streaming fold — bounded retry must not spin on it") {
    withRetain(2) {
      spark.conf.set("spark.graft.occ.claimGraceMs", "300")
      try {
        val dir0 = java.nio.file.Files.createTempDirectory("occ_stale_s").toString
        val dir = s"$dir0/t"; val src = s"$dir0/src"
        Seq(("g", 1L, 1.0)).toDF("grp", "dn", "dv")
          .coalesce(1).write.parquet(s"$src/f1")
        IncrementalAgg.foldStanding(spark, dir,
          Seq(("seed", 1L, 1.0)).toDF("grp", "dn", "dv"), numBuckets = 2)
        // a writer crashed between claim and publish: dead claim above head
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val os = fs.create(
          new org.apache.hadoop.fs.Path(dir, "_graft_manifest.v2.json"), false)
        try os.write("{}".getBytes("UTF-8")) finally os.close()
        val schema = spark.read.parquet(s"$src/f1").schema
        val q = spark.readStream.schema(schema).parquet(s"$src/f*")
          .writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            IncrementalAgg.foldStandingBatch(spark, dir, b, id, numBuckets = 2)
            ()
          }
          .option("checkpointLocation",
            java.nio.file.Files.createTempDirectory("occ_stale_ck").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.awaitTermination()
        }
        def chain(t: Throwable): Seq[Throwable] =
          if (t == null) Nil else t +: chain(t.getCause)
        assert(chain(e).exists(
          _.isInstanceOf[MaterializedTable.StaleCommitClaimException]),
          s"expected StaleCommitClaimException to kill the query, got: $e")
      } finally spark.conf.unset("spark.graft.occ.claimGraceMs")
    }
  }

  test("vacuum never sweeps a FRESH in-flight claim or its above-head version dir; hour-old crash debris still goes") {
    // under OCC, an above-head versioned manifest IS a live writer's claim
    // and an above-head v{N} dir is its just-renamed staged data (the window
    // between claim and primary swap). A maintenance vacuum racing that
    // writer must leave both alone — sweeping them re-opens the claimed
    // version, the recover()-against-live-writers corruption path.
    withRetain(0) {
      val dir = tmp("occ_vac")
      MaterializedTable.merge(spark, dir, rows(("insert", "a", 1L, 1L)),
        Seq("key"), Seq("lsn", "seq"), numBuckets = 2)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // simulate the in-flight writer: fresh claim + fresh staged v2 data
      val claim = new org.apache.hadoop.fs.Path(dir, "_graft_manifest.v2.json")
      val os = fs.create(claim, false)
      try os.write("{}".getBytes("UTF-8")) finally os.close()
      val v2b = new org.apache.hadoop.fs.Path(dir, "v2/_bucket=0")
      fs.mkdirs(v2b)
      val dos = fs.create(new org.apache.hadoop.fs.Path(v2b, "part-0.parquet"), false)
      try dos.write("x".getBytes("UTF-8")) finally dos.close()
      MaterializedTable.vacuum(spark, dir)
      assert(fs.exists(claim), "vacuum swept a live writer's fresh claim")
      assert(fs.exists(v2b), "vacuum swept a live writer's staged version dir")
      // rename preserves the STAGE dir's mtime, so a live commit's v{N} can
      // look arbitrarily old while its claim is seconds fresh (staging
      // finished long before the claim — stalled writer, slow upstream):
      // the fresh claim alone must spare the dir
      val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
      fs.setTimes(new org.apache.hadoop.fs.Path(dir, "v2"), old, old)
      MaterializedTable.vacuum(spark, dir)
      assert(fs.exists(v2b),
        "vacuum swept an old-looking version dir whose claim is still fresh")
      // age the claim too: now it is definitively a crash
      fs.setTimes(claim, old, old)
      fs.setTimes(new org.apache.hadoop.fs.Path(dir, "v2"), old, old)
      assert(MaterializedTable.vacuum(spark, dir) >= 2)
      assert(!fs.exists(claim), "hour-old crashed claim must be swept")
      assert(!fs.exists(v2b), "hour-old crashed version dir must be swept")
      // the committed snapshot is untouched throughout
      assert(MaterializedTable.read(spark, dir).count() == 1)
    }
  }

  private val jvASide = JoinView.Side(Seq("user_id"), Seq("lsn"),
    Seq("user_id", "user_value", "seg"), joinCol = "seg")
  private val jvBSide = JoinView.Side(Seq("segment_id"), Seq("lsn"),
    Seq("segment_id", "segment_value"), joinCol = "segment_id")
  private def jvA(k: Int): DataFrame =
    Seq(("insert", k.toLong, k.toLong, k.toDouble, 100L))
      .toDF("op", "lsn", "user_id", "user_value", "seg")
  private def jvB(k: Int): DataFrame =
    Seq(("update", k.toLong, 100L, k.toDouble))
      .toDF("op", "lsn", "segment_id", "segment_value")
  private def jvView(dir: String): Set[(Long, Double, Double)] =
    JoinView.readPersistedView(spark, dir)
      .select($"user_id", $"user_value", $"segment_value")
      .as[(Long, Double, Double)].collect().toSet

  test("foldPersisted survives conflicts landing MID-SEQUENCE: phase-interrupted folds with interleaved foreign commits, and a live compaction race, both converge exactly") {
    withRetain(2) {
      // deterministic half: the fold dies between its latest merges and the
      // view merge; foreign commits then advance ALL THREE member tables
      // (the state a mid-sequence ConcurrentCommitException leaves after
      // withCommitRetry's backoff — some phases landed, the table versions
      // moved under the fold); the retry must replay from the staged deltas
      // and land the batch exactly once on the moved state
      val dir = java.nio.file.Files.createTempDirectory("occ_jv_seq").toString
      JoinView.foldPersisted(spark, dir, jvA(1), jvB(1), jvASide, jvBSide,
        batchId = 0, numBuckets = 2)
      intercept[JoinView.InjectedCrash] {
        JoinView.foldPersistedInjected(spark, dir, jvA(2), jvB(2), jvASide,
          jvBSide, batchId = 1, numBuckets = 2, "after_latest_merge")
      }
      for ((t, sc) <- Seq("latest_a" -> "user_id", "latest_b" -> "segment_id",
          "view" -> "user_id"))
        // clustered compaction rewrites every bucket → always commits, so
        // each table's version genuinely moves under the interrupted fold
        MaterializedTable.compact(spark, s"$dir/$t", maxFilesPerBucket = 1,
          sortCols = Seq(sc))
      JoinView.foldPersisted(spark, dir, jvA(2), jvB(2), jvASide, jvBSide,
        batchId = 1, numBuckets = 2)
      assert(jvView(dir) == Set((1L, 1.0, 2.0), (2L, 2.0, 2.0)),
        "phase-interrupted retry over moved tables diverged")
      // live half: a clustered-compaction loop races the folds for real —
      // conflicts can land between ANY of the fold's phases; foldPersisted's
      // own withCommitRetry (not a caller loop) must absorb them
      spark.conf.set("spark.graft.occ.commitRetries", "200")
      spark.conf.set("spark.graft.occ.commitRetryBackoffMs", "25")
      try {
        val nBatches = 6
        val maintFail = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val folding = new java.util.concurrent.atomic.AtomicBoolean(true)
        val maint = new Thread(() => {
          try {
            while (folding.get()) {
              for (t <- Seq("view", "latest_a"))
                withOccRetry { MaterializedTable.compact(spark, s"$dir/$t",
                  maxFilesPerBucket = 1, sortCols = Seq("user_id")) }
            }
          } catch { case t: Throwable => maintFail.compareAndSet(null, t) }
        })
        val retriesBefore = MaterializedTable.commitRetryCount.get()
        maint.start()
        try {
          for (k <- 2 to nBatches)
            JoinView.foldPersisted(spark, dir, jvA(k + 1), jvB(k + 1),
              jvASide, jvBSide, batchId = k.toLong, numBuckets = 2)
        } finally { folding.set(false); maint.join(300000) }
        assert(maintFail.get() == null,
          s"maintenance failed non-optimistically: ${Option(maintFail.get())}")
        val lastV = (nBatches + 1).toDouble
        assert(jvView(dir) ==
          (1 to nBatches + 1).map(u => (u.toLong, u.toDouble, lastV)).toSet,
          "live-raced folds diverged")
        info(s"fold retries absorbed: " +
          s"${MaterializedTable.commitRetryCount.get() - retriesBefore}")
      } finally {
        spark.conf.unset("spark.graft.occ.commitRetries")
        spark.conf.unset("spark.graft.occ.commitRetryBackoffMs")
      }
    }
  }

  test("TableGroup.commit survives conflicts between MEMBER commits: partial-member replay and a live member-compaction race both converge exactly") {
    withRetain(2) {
      val root = java.nio.file.Files.createTempDirectory("occ_grp_seq").toString
      def batches(k: Int) = Seq(
        TableGroup.TableBatch("t_a",
          rows(("insert", s"a$k", k.toLong, k.toLong)), Seq("key")),
        TableGroup.TableBatch("t_b",
          rows(("insert", s"b$k", k.toLong, k.toLong)), Seq("key")))
      TableGroup.commit(spark, root, batches(1), Seq("lsn", "seq"),
        batchId = 1, numBuckets = 2)
      // deterministic half: member t_a's merge for batch 2 already landed
      // when the sequence was cut short (the exact state a conflict on t_b
      // leaves mid-commit) — the group retry must no-op t_a by its batch-id
      // watermark, land t_b, and swap the root once
      MaterializedTable.merge(spark, s"$root/t_a",
        rows(("insert", "a2", 2L, 2L)), Seq("key"), Seq("lsn", "seq"),
        numBuckets = 2, batchId = Some(2L))
      TableGroup.commit(spark, root, batches(2), Seq("lsn", "seq"),
        batchId = 2, numBuckets = 2)
      def groupKeys(t: String): Seq[String] =
        TableGroup.read(spark, root, t).select("key").as[String].collect()
          .toSeq.sorted
      assert(groupKeys("t_a") == Seq("a1", "a2"),
        "partial-member replay double-landed or dropped t_a's batch")
      assert(groupKeys("t_b") == Seq("b1", "b2"))
      // live half: compaction races the member-merge sequence — a conflict
      // after t_a landed but before t_b must be absorbed by the caller's
      // withCommitRetry (the GroupCommitStream discipline) with every
      // member landing exactly once and the root never regressing
      spark.conf.set("spark.graft.occ.commitRetries", "200")
      spark.conf.set("spark.graft.occ.commitRetryBackoffMs", "25")
      try {
        val nBatches = 6
        val maintFail = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val committing = new java.util.concurrent.atomic.AtomicBoolean(true)
        val maint = new Thread(() => {
          try {
            while (committing.get()) {
              for (t <- Seq("t_a", "t_b"))
                withOccRetry { MaterializedTable.compact(spark, s"$root/$t",
                  maxFilesPerBucket = 1, sortCols = Seq("key")) }
            }
          } catch { case t: Throwable => maintFail.compareAndSet(null, t) }
        })
        val retriesBefore = MaterializedTable.commitRetryCount.get()
        maint.start()
        try {
          for (k <- 3 to nBatches)
            MaterializedTable.withCommitRetry(spark) {
              TableGroup.commit(spark, root, batches(k), Seq("lsn", "seq"),
                batchId = k.toLong, numBuckets = 2)
            }
        } finally { committing.set(false); maint.join(300000) }
        assert(maintFail.get() == null,
          s"maintenance failed non-optimistically: ${Option(maintFail.get())}")
        assert(groupKeys("t_a") == (1 to nBatches).map(k => s"a$k"),
          "a member batch landed twice or was lost under the race")
        assert(groupKeys("t_b") == (1 to nBatches).map(k => s"b$k"))
        assert(TableGroup.readRoot(spark, root).get.lastBatchId ==
          nBatches.toLong, "root regressed or failed to advance")
        info(s"group-commit retries absorbed: " +
          s"${MaterializedTable.commitRetryCount.get() - retriesBefore}")
      } finally {
        spark.conf.unset("spark.graft.occ.commitRetries")
        spark.conf.unset("spark.graft.occ.commitRetryBackoffMs")
      }
    }
  }

  test("standing folds surface a too-small retention window AT START: warn-once by default, refuse under the enforce policy") {
    // default retention (0) + warn policy: first call warns, repeat is silent
    val dir = tmp("occ_retwarn")
    assert(MaterializedTable.checkStandingFoldRetention(spark, dir, "spec"),
      "first standing fold at retainVersions=0 must warn")
    assert(!MaterializedTable.checkStandingFoldRetention(spark, dir, "spec"),
      "warning must be once per table dir")
    // a safe window never warns
    withRetain(2) {
      assert(!MaterializedTable.checkStandingFoldRetention(spark,
        tmp("occ_retok"), "spec"))
    }
    // enforce policy: the fold face refuses at start instead of dying to a
    // FileNotFoundException hours later when maintenance races it
    spark.conf.set("spark.graft.occ.standingFoldRetentionPolicy", "enforce")
    try {
      val e = intercept[IllegalStateException] {
        IncrementalAgg.foldStandingBatch(spark, tmp("occ_retenf"),
          Seq(("g", 1L, 1.0)).toDF("grp", "dn", "dv"), batchId = 0L,
          numBuckets = 2)
      }
      assert(e.getMessage.contains("retainVersions"), e.getMessage)
      val e2 = intercept[IllegalStateException] {
        JoinView.foldPersisted(spark, tmp("occ_retenf2"), jvA(1), jvB(1),
          jvASide, jvBSide, batchId = 0L, numBuckets = 2)
      }
      assert(e2.getMessage.contains("retainVersions"), e2.getMessage)
    } finally
      spark.conf.unset("spark.graft.occ.standingFoldRetentionPolicy")
  }

  test("two writers folding a standing aggregate: every contribution sums exactly once") {
    // foldStanding is ADDITIVE — a lost-then-retried fold re-reads state
    // that now includes the winner's contribution, so OCC retries must
    // neither drop nor double-count a delta. Two writers, disjoint groups
    // plus one CONTENDED group both add to.
    withRetain(2) {
      val dir = tmp("occ_fold")
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val perWriter = 8
      def delta(grp: String, dn: Long, dv: Double) =
        Seq((grp, dn, dv)).toDF("grp", "dn", "dv")
          .unionByName(Seq(("shared", 1L, 0.5)).toDF("grp", "dn", "dv"))
      def writer(w: Int): Thread = new Thread(() => {
        try {
          for (k <- 1 to perWriter) {
            val (_, _) = withOccRetry {
              IncrementalAgg.foldStanding(spark, dir,
                delta(s"w$w", 1L, k.toDouble), numBuckets = 2)
            }
          }
        } catch { case t: Throwable => failure.compareAndSet(null, t) }
      })
      val ws = Seq(writer(1), writer(2))
      ws.foreach(_.start()); ws.foreach(_.join(300000))
      assert(failure.get() == null,
        s"fold writer failed non-optimistically: ${Option(failure.get())}")
      val st = MaterializedTable.read(spark, dir)
        .select("grp", "n_live", "sum_value")
        .as[(String, Long, java.math.BigDecimal)].collect()
        .map { case (g, n, v) => g -> ((n, v.doubleValue)) }.toMap
      val perSum = (1 to perWriter).map(_.toDouble).sum
      assert(st("w1") == ((perWriter.toLong, perSum)), st.toString)
      assert(st("w2") == ((perWriter.toLong, perSum)), st.toString)
      // the contended group: BOTH writers' every fold added exactly once
      assert(st("shared") == ((2L * perWriter, 0.5 * 2 * perWriter)), st.toString)
    }
  }
}
