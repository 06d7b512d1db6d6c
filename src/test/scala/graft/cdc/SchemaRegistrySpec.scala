package graft.cdc

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaCacheSpec extends AnyFunSuite {
  import SchemaCache._
  private val s1 = StructType(Seq(StructField("id", LongType), StructField("u", StringType)))
  private val s2 = StructType(Seq(StructField("id", LongType), StructField("u", StringType),
    StructField("email", StringType)))

  test("new / unchanged / changed contract (ext/schema_cache.c:46–80)") {
    val c = new SchemaCache
    assert(c.lookup(1, "public.users", s1) == New)
    assert(c.lookup(1, "public.users", s1) == Unchanged)
    assert(c.lookup(1, "public.users", s2) == Changed)     // ALTER TABLE ADD
    assert(c.lookup(1, "public.users", s2) == Unchanged)
    assert(c.lookup(1, "public.members", s2) == Changed)   // rename
    assert(c.lookup(2, "public.other", s1) == New)
  }

  test("schema message carries the schema JSON") {
    val c = new SchemaCache
    val m = c.schemaMessage(1, "public.users", s1)
    assert(m.op == Op.Schema && m.after.contains("\"id\""))
    assert(m.key == "1") // relid rides in key for relid->schema resolution
    assert(!Op.rowOps.contains(m.op)) // control message: compaction ignores it
  }
}

class MockSchemaRegistrySpec extends AnyFunSuite {
  test("subject naming + identical-schema id reuse (kafka/registry.c, table_mapper.c:277)") {
    val r = new MockSchemaRegistry
    val id1 = r.register("bw.users", isKey = false, """{"a":1}""")
    val id2 = r.register("bw.users", isKey = true, """{"k":1}""")
    assert(id1 != id2)
    assert(r.register("bw.users", isKey = false, """{"a":1}""") == id1) // identity reuse
    // Confluent ids are global per schema: same schema, other subject, same id
    assert(r.register("bw.orders", isKey = false, """{"a":1}""") == id1)
    assert(r.subjects == Set("bw.users-value", "bw.users-key", "bw.orders-value"))
    // schema evolution appends a new version to the subject
    r.register("bw.users", isKey = false, """{"a":1,"b":2}""")
    assert(r.versions("bw.users-value").size == 2)
  }
}

class UnkeyedSemanticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("unkeyed deletes dropped, unkeyed inserts pass (message_spec.rb:99–163)") {
    import spark.implicits._
    val evs = Seq(
      CdcEvent("insert", "t", 1, 0, 0, null, null, """{"v":1}"""),   // unkeyed insert: keep
      CdcEvent("delete", "t", 2, 0, 0, null, null, null),            // unkeyed delete: drop
      CdcEvent("delete", "t", 3, 0, 0, "k1", null, null))            // keyed delete: keep
    val out = graft.streaming.CdcPipeline.dropUnkeyedDeletes(evs.toDS()).collect()
    assert(out.map(_.lsn).toSet == Set(1L, 3L))
  }
}
