package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters — the
  * standard pattern for libraries registering native Catalyst expressions
  * (Spark 4 hides Column's Expression constructor behind ColumnNode).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def sessionState(s: SparkSession): internal.SessionState =
    s.asInstanceOf[classic.SparkSession].sessionState

  /** A batch result re-tagged as a STREAMING DataFrame — what a V1
    * streaming `Source.getBatch` must return (MicroBatchExecution asserts
    * isStreaming; every built-in V1 source uses the same private
    * `internalCreateDataFrame(…, isStreaming = true)` this bridges to).
    * The input plan is evaluated eagerly to an InternalRow RDD first.
    */
  def asStreamingDataFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd,
      df.schema, isStreaming = true)
  }

  /** The inverse: a streaming-tagged micro-batch frame (what a V1
    * `Sink.addBatch` receives) re-bound as a BATCH DataFrame, so batch
    * writers can consume it. Rows are copied out of the unsafe buffers the
    * streaming plan reuses.
    */
  def asBatchDataFrame(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[Row]].queryExecution.toRdd
        .map(_.copy()),
      df.schema, isStreaming = false)
  }
}
