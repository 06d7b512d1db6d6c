package graft

import org.apache.spark.sql.SparkSession

/** Formatted-plan dump for named queries (PLANS.md evidence):
  * `runMain graft.PlanAudit <sfDir> <query...>`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args.tail) {
      if (name == "--merge-write") dumpMergeWritePlan(spark, sfDir)
      else if (name == "--multiset-eq") dumpMultisetEqPlans(spark, sfDir)
      else {
        println(s"\n===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }

  /** The MaterializedTable.merge write job's EXECUTED plan (the gate
    * functions run merges eagerly, so the returned-DataFrame explain cannot
    * show it): stage two merges into a temp table — the second one exercises
    * the read-existing-state ∪ incoming path — and print every parquet-write
    * plan a QueryExecutionListener observes.
    */
  private def dumpMergeWritePlan(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (qe.analyzed.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.Command] &&
            qe.toString.contains("InsertIntoHadoopFsRelation"))
          plans.add(qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val env = graft.cdc.ChangelogGen.fromEvents(spark, sfDir).toDF()
    val mx = env.agg(max(col("lsn"))).head().getLong(0)
    val dir = java.nio.file.Files.createTempDirectory("planaudit").toString + "/t"
    graft.cdc.MaterializedTable.merge(spark, dir,
      env.filter(col("lsn") < mx / 2), Seq("key"), Seq("lsn", "seq"))
    plans.clear() // keep only the second merge: existing ∪ incoming
    graft.cdc.MaterializedTable.merge(spark, dir,
      env.filter(col("lsn") >= mx / 2), Seq("key"), Seq("lsn", "seq"))
    Thread.sleep(2000) // QueryExecutionListener fires async on the bus
    spark.listenerManager.unregister(listener)
    println(s"\n===== merge write (second merge: existing state ∪ incoming) =====")
    plans.forEach(p => println(p))
  }

  /** The protocol drills' multiset-equality check, before/after shapes on a
    * representative pair (two independent latest-state restatements of the
    * events changelog): BEFORE = the two-directional exceptAll (each
    * direction its own job), AFTER = Qutil.multisetEq's one signed-union
    * grouped count.
    */
  private def dumpMultisetEqPlans(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    val env = graft.cdc.ChangelogGen.fromEvents(spark, sfDir).toDF()
      .select(col("op"), col("key"), col("lsn"), col("seq"),
        get_json_object(col("after"), "$.value").cast("double").as("value"))
    val a = graft.cdc.LatestState.batch(env, Seq("key"), Seq("lsn", "seq"))
      .select(col("key"), col("lsn"), col("value"))
    val b = graft.cdc.LatestState.batch(env, Seq("key"), Seq("lsn", "seq"),
        keepDeleted = true)
      .filter(col("op") =!= graft.cdc.Op.Delete)
      .select(col("key"), col("lsn"), col("value"))
    println("\n===== multiset equality BEFORE: a.exceptAll(b) (x2 directions, one job each) =====")
    a.exceptAll(b).explain("formatted")
    println("\n===== multiset equality AFTER: one signed-union grouped count (Qutil.multisetEq) =====")
    a.withColumn("_ms", lit(1L))
      .unionByName(b.withColumn("_ms", lit(-1L)))
      .groupBy(col("key"), col("lsn"), col("value"))
      .agg(sum(col("_ms")).as("_net"))
      .filter(col("_net") =!= 0L)
      .explain("formatted")
  }
}
