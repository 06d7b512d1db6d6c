package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the MATCH_RECOGNIZE-shaped question every
  * event warehouse asks ("viewed, then clicked, then purchased — in that
  * order"), which Spark SQL has no operator for. Step k is reached when a
  * step-k event exists STRICTLY AFTER the user's step-(k−1) reach time,
  * taking the earliest such event as the new reach time (first-touch
  * funnel semantics; strictness makes ties deterministic).
  *
  * Built as one aggregation + one join PER STEP rather than a per-user
  * ordered scan: each frontier is (user, reach-ts) — partial-agg'd min,
  * never a collected event list — so a user with 10⁸ events costs the
  * same as one with 10 (no collect_list skew bomb), and the step count
  * (3–5 in practice) bounds the plan depth, not the data.
  */
object Funnel {

  /** One row per user: `stage` = number of funnel steps completed in
    * order (0 = never did `steps.head`).
    */
  def stages(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var frontier: DataFrame = null
    val reached = Seq.newBuilder[DataFrame]
    steps.zipWithIndex.foreach { case (st, i) =>
      frontier =
        if (i == 0)
          events.filter(col(typeCol) === st)
            .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
        else
          events.filter(col(typeCol) === st)
            .join(frontier.select(col(userCol), col("_t").as("_prev")),
              Seq(userCol))
            .filter(col(tsCol) > col("_prev"))
            .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      reached += frontier.select(col(userCol), lit(i + 1).as("_stage"))
    }
    val stages = reached.result().reduce(_ unionByName _)
      .groupBy(col(userCol)).agg(max(col("_stage")).as("stage"))
    events.select(col(userCol)).distinct()
      .join(stages, Seq(userCol), "left")
      .select(col(userCol), coalesce(col("stage"), lit(0)).as("stage"))
  }
}
