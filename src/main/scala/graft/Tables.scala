package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Analog of the reference's catalog table scan
  * (`get_table_list`, ext/snapshot.c:199–298): the set of known relations the
  * engine operates over. Here the "catalog" is a directory of parquet files;
  * schema is discovered at read time (schema-on-read, SURVEY §1.2).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One DataFrame per table; Catalyst pushes filters/pruning into the scan. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet has shipped with two physical `ts` encodings across
    * driver testdata generations: TIMESTAMP(NANOS) (which Spark's parquet
    * reader rejects outright — read nanos as long, truncate to µs; events
    * are seconds apart so truncation cannot reorder them) and plain
    * timestamp[us] (read as TIMESTAMP_NTZ — cast to the session-local
    * TimestampType; session tz is pinned UTC so wall values are identical).
    * Handle both so the loader survives testdata regeneration.
    */
  def events(s: SparkSession, d: String): DataFrame =
    withNanosProbe(s)(load(s, d, "events")) { df =>
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          (true, df.withColumn("ts", timestamp_micros(expr("ts div 1000"))))
        case _ =>
          (false, df.withColumn("ts", col("ts").cast("timestamp")))
      }
    }

  /** Probe a possibly-TIMESTAMP(NANOS) parquet source under
    * `nanosAsLong=true`, then fix the session conf: if the data really IS
    * nanos-encoded the conf must STAY set (every later job re-resolves it
    * at read time, not just at schema inference), but for any other
    * encoding the caller's prior value is restored — a loader must not
    * permanently change how unrelated nanos parquet reads behave on a
    * shared session. `decide` returns (isNanos, fixed frame).
    */
  private[graft] def withNanosProbe(s: SparkSession)(read: => DataFrame)(
      decide: DataFrame => (Boolean, DataFrame)): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    val (isNanos, fixed) =
      try decide(read)
      catch { case e: Throwable =>
        prev.fold(s.conf.unset(key))(s.conf.set(key, _)); throw e
      }
    if (!isNanos) prev.fold(s.conf.unset(key))(s.conf.set(key, _))
    fixed
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Catalog-style dispatch (≙ get_table_list, ext/snapshot.c:199–298):
    * resolves any known table through its (possibly type-fixing) loader.
    */
  def byName(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "events" => events(s, d)
    case other    => load(s, d, other)
  }
}
