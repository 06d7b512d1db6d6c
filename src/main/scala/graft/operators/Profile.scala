package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max, min}

/** Column profiling for pipeline data-quality gates: one pass per table,
  * per-column (rows, non-null, distinct, min, max) — the "what did I just
  * ingest" primitive every large-scale curation run starts with.
  *
  * Shape: ONE aggregation over the table computing all columns' stats
  * simultaneously (2 + 3·cols aggregate expressions), then a narrow unpivot —
  * not a per-column scan loop, which would read the table `cols` times.
  */
object Profile {

  def describe(df: DataFrame, cols: Seq[String]): DataFrame = {
    // internal aliases are POSITIONAL (__nn_0, …): embedding user column
    // names into aliases/selectExpr breaks on spaces/dots/quotes
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__nn_$i"),
        countDistinct(col(c)).as(s"__nd_$i"),
        min(col(c)).cast("string").as(s"__mn_$i"),
        max(col(c)).cast("string").as(s"__mx_$i"))
    }
    val total = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      F.struct(lit(c).as("column_name"), col("__rows").as("n_rows"),
        col(s"__nn_$i").as("non_null"), col(s"__nd_$i").as("n_distinct"),
        col(s"__mn_$i").as("min_s"), col(s"__mx_$i").as("max_s"))
    }
    total.select(F.explode(F.array(rows: _*)).as("r")).select(col("r.*"))
  }
}
