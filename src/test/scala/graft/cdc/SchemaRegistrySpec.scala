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

  // ---- schema-evolution compatibility --------------------------------------

  private def st(fs: (String, DataType)*): StructType =
    StructType(fs.map { case (n, t) => StructField(n, t, nullable = true) })

  test("compat rules: nullable add/drop pass FULL; promotions one-way; type change breaks") {
    import SchemaCompat._
    val v1 = st("id" -> LongType, "v" -> DoubleType)
    val v2 = st("id" -> LongType, "v" -> DoubleType, "email" -> StringType)
    // all-nullable add: compatible in BOTH directions (the PG DDL contract)
    assert(check(Full, v2, v1).isEmpty)
    assert(check(Full, v1, v2).isEmpty) // drop-column view of the same pair
    // promotion int→long readable backward, not forward
    val narrow = st("id" -> IntegerType, "v" -> DoubleType)
    assert(check(Backward, v1, narrow).isEmpty)       // new long reads old int
    assert(check(Forward, v1, narrow).nonEmpty)       // old int cannot read long
    // incompatible type change caught with a per-field reason
    val broken = st("id" -> StringType, "v" -> DoubleType)
    val reasons = check(Backward, broken, v1)
    assert(reasons.exists(_.contains("field id")))
    // non-nullable addition is the one structural break
    val hard = StructType(v1.fields :+ StructField("req", LongType, nullable = false))
    assert(check(Backward, hard, v1).exists(_.contains("without default")))
  }

  test("registerChecked refuses incompatible evolution and registers nothing") {
    import SchemaCompat._
    val reg = new MockSchemaRegistry
    val v1 = st("id" -> LongType, "v" -> DoubleType)
    val Right(id1) = reg.registerChecked("t.users", isKey = false, v1, Full)
    // compatible evolution versioned normally
    val v2 = st("id" -> LongType, "v" -> DoubleType, "email" -> StringType)
    val Right(id2) = reg.registerChecked("t.users", isKey = false, v2, Full)
    assert(id2 != id1 && reg.versions("t.users-value") == Vector(id1, id2))
    // breaking change refused; subject versions untouched
    val broken = st("id" -> StringType, "v" -> DoubleType)
    assert(reg.registerChecked("t.users", isKey = false, broken, Full).isLeft)
    assert(reg.versions("t.users-value") == Vector(id1, id2))
    // first registration under a NEW subject always passes, even "broken"
    assert(reg.registerChecked("t.other", isKey = false, broken, Full).isRight)
  }

  test("PgTypes-generated schemas evolve FULL-compatibly under add/drop DDL") {
    val before = PgTypes.schemaFor(Seq("id" -> 20, "name" -> 25))         // int8, text
    val after  = PgTypes.schemaFor(Seq("id" -> 20, "name" -> 25,
      "created" -> 1114))                                                 // + timestamp
    assert(SchemaCompat.check(SchemaCompat.Full, after, before).isEmpty)
    assert(SchemaCompat.check(SchemaCompat.Full, before, after).isEmpty)
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
