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
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
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
