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
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val total = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    // unpivot via stack: (column, n_rows, non_null, n_distinct, min_s, max_s)
    val stackArgs = cols.map { c =>
      s"'$c', __rows, __nn_$c, __nd_$c, __mn_$c, __mx_$c"
    }.mkString(", ")
    total.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, non_null, n_distinct, min_s, max_s)")
  }
}
