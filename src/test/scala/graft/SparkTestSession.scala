package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (cheap, avoids per-suite JVM spin). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        new java.io.File(sys.props("java.io.tmpdir"), "graft-warehouse").getPath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
