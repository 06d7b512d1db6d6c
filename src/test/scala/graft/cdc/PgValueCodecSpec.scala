package graft.cdc

import java.time.{LocalDate, LocalDateTime}

import graft.cdc.PgTypes.Oid._
import graft.cdc.PgValueCodec._
import org.scalatest.funsuite.AnyFunSuite

/** Type roundtrips — the engine's analog of the reference's generated type
  * suite (spec/functional/type_specs.rb; µs fidelity per
  * spec/functional/schema_spec.rb:146–230).
  */
class PgValueCodecSpec extends AnyFunSuite {

  test("dropped columns are skipped with survivors' order kept (oid2avro.c:167,197)") {
    import PgTypes.PgAttribute
    val s = PgTypes.schemaForAttrs(Seq(
      PgAttribute("id", Int8),
      PgAttribute("legacy", Text, isDropped = true),   // attisdropped slot
      PgAttribute("name", Text),
      PgAttribute("gone_too", Int4, isDropped = true),
      PgAttribute("score", Float8)))
    assert(s.fieldNames.toSeq == Seq("id", "name", "score"))  // attnums remapped
    assert(s.fields.forall(_.nullable))
  }

  test("zero live columns yields the dummy boolean (oid2avro.c:153–163)") {
    import PgTypes.PgAttribute
    import org.apache.spark.sql.types.BooleanType
    for (cols <- Seq(Seq.empty[PgAttribute],                        // CREATE TABLE t ()
        Seq(PgAttribute("a", Int4, isDropped = true),
          PgAttribute("b", Text, isDropped = true)))) {             // all dropped
      val s = PgTypes.schemaForAttrs(cols)
      assert(s.fieldNames.toSeq == Seq("dummy"))
      assert(s.fields.head.dataType == BooleanType && s.fields.head.nullable)
    }
  }

  test("scalar parses") {
    assert(parse(Bool, "t") == true && parse(Bool, "f") == false)
    assert(parse(Int2, "42") == 42.toShort)
    assert(parse(Int4, "-7") == -7)
    assert(parse(Int8, "9007199254740993") == 9007199254740993L)
    assert(parse(Float8, "1.5") == 1.5)
    assert(parse(Numeric, "12345.6789") == BigDecimal("12345.6789"))
    assert(parse(Text, "héllo") == "héllo")
    assert(parse(Uuid, "550e8400-e29b-41d4-a716-446655440000") ==
      "550e8400-e29b-41d4-a716-446655440000") // string fallback
  }

  test("numeric is exact, not the reference's double (its known bug)") {
    val v = parse(Numeric, "0.30000000000000004")
    assert(v == BigDecimal("0.30000000000000004"))
    assert(parse(Numeric, "99999999999999999999.99") ==
      BigDecimal("99999999999999999999.99")) // > double precision
  }

  test("money converts to exact cents (reference multiplies by 100 wrongly)") {
    assert(parse(Money, "$12.34") == 1234L)
    assert(parse(Money, "$1,234.56") == 123456L)
    assert(parse(Money, "-$0.05") == -5L)
    assert(render(Money, 1234L) == "$12.34")
    assert(render(Money, -5L) == "-$0.05")
  }

  test("date incl. ±infinity sentinels (ext/oid2avro.c:459–482)") {
    assert(parse(Date, "2024-02-29") == LocalDate.of(2024, 2, 29))
    assert(parse(Date, "infinity") == DateInfinity)
    assert(parse(Date, "-infinity") == DateNegInfinity)
    assert(render(Date, DateInfinity) == "infinity")
  }

  test("time µs fidelity") {
    assert(parse(Time, "00:00:00") == 0L)
    assert(parse(Time, "12:34:56.789012") == (((12L*3600+34*60+56) * 1000000L) + 789012L))
    assert(render(Time, parse(Time, "23:59:59.999999")) == "23:59:59.999999")
  }

  test("timetz: zone offset in ISO sign (flip per ext/oid2avro.c:584–585)") {
    val v = parse(TimeTz, "12:00:00+02:00").asInstanceOf[PgTimeTz]
    assert(v.micro == 12L * 3600 * 1000000)
    assert(v.zoneOffset == 7200)        // east-positive, ISO8601
    val w = parse(TimeTz, "01:02:03-05:00").asInstanceOf[PgTimeTz]
    assert(w.zoneOffset == -18000)
    // PG emits hour-only offsets and half-hour zones
    assert(parse(TimeTz, "12:00:00+02").asInstanceOf[PgTimeTz].zoneOffset == 7200)
    assert(parse(TimeTz, "12:00:00.5-08").asInstanceOf[PgTimeTz].micro ==
      12L * 3600 * 1000000 + 500000)
    assert(parse(TimeTz, "12:00:00+05:30").asInstanceOf[PgTimeTz].zoneOffset == 19800)
    assert(render(TimeTz, PgTimeTz(0, 7200)) == "00:00:00+02")
  }

  test("timestamp µs fidelity + ±infinity + PG-trimmed fractions") {
    assert(parse(Timestamp, "2024-01-02 03:04:05.123456") ==
      LocalDateTime.of(2024, 1, 2, 3, 4, 5, 123456000))
    assert(parse(Timestamp, "infinity") == TsInfinity)
    val rt = render(Timestamp, parse(Timestamp, "2024-01-02 03:04:05.000001"))
    assert(rt == "2024-01-02 03:04:05.000001")
    // PG trims trailing fraction zeros: ".5" means 500000 µs
    assert(parse(Timestamp, "2024-01-02 03:04:05.5") ==
      LocalDateTime.of(2024, 1, 2, 3, 4, 5, 500000000))
    assert(render(Timestamp, parse(Timestamp, "2024-01-02 03:04:05.500000")) ==
      "2024-01-02 03:04:05.5")
    assert(render(Timestamp, parse(Timestamp, "2024-01-02 03:04:05")) ==
      "2024-01-02 03:04:05")
  }

  test("timestamptz: hour-only offsets parse; render is PG text at +00") {
    val i = parse(TimestampTz, "2024-08-07 12:34:56+00")
    assert(i == java.time.Instant.parse("2024-08-07T12:34:56Z"))
    assert(parse(TimestampTz, "2024-08-07 12:34:56.25-08") ==
      java.time.Instant.parse("2024-08-07T20:34:56.250Z"))
    assert(render(TimestampTz, i) == "2024-08-07 12:34:56+00")
    val rt = render(TimestampTz, parse(TimestampTz, "2024-08-07 04:34:56.5+05:30"))
    assert(parse(TimestampTz, rt) == parse(TimestampTz, "2024-08-07 04:34:56.5+05:30"))
  }

  test("interval decomposition (ext/oid2avro.c:703–737)") {
    assert(parseInterval("1 year 2 mons 3 days 04:05:06.000007") ==
      PgInterval(14, 3, (4L*3600+5*60+6) * 1000000L + 7))
    assert(parseInterval("00:00:00.5") == PgInterval(0, 0, 500000L))
    assert(parseInterval("5 days") == PgInterval(0, 5, 0))
    assert(parseInterval("00:00:01") == PgInterval(0, 0, 1000000L))
    assert(parseInterval("-00:00:01") == PgInterval(0, 0, -1000000L))
  }

  test("bytea hex roundtrip (spec/functional/schema_spec.rb:307–343)") {
    val bytes = Array[Byte](0, 1, -1, 127, -128)
    assert(parse(Bytea, "\\x0001ff7f80").asInstanceOf[Array[Byte]].toSeq == bytes.toSeq)
    assert(render(Bytea, bytes) == "\\x0001ff7f80")
  }

  test("pg arrays roundtrip as strings + typed split (schema_spec.rb:349–356)") {
    assert(parseArray("{1,2,3,4}") == Seq("1", "2", "3", "4"))
    assert(parseArray("{}") == Seq.empty)
    assert(parseArray("""{a,"b c","d,e",NULL}""") == Seq("a", "b c", "d,e", null))
    assert(parseArray("""{"quo\"te"}""") == Seq("quo\"te"))
    // quoted "NULL" is the literal string, only bare NULL is a null
    assert(parseArray("""{"NULL",NULL}""") == Seq("NULL", null))
  }

  test("null maps to null for every oid (union branch 0)") {
    for (oid <- Seq(Bool, Int4, Numeric, Date, Time, TimeTz, Timestamp,
        Interval, Bytea, Text, Money))
      assert(parse(oid, null) == null && render(oid, null) == null)
  }

  test("generated randomized roundtrips (analog of spec/bin/generate_type_specs.rb)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val cases: Seq[(Int, String)] = Seq(
        Int2 -> rnd.nextInt(Short.MaxValue).toString,
        Int4 -> rnd.nextInt().toString,
        Int8 -> rnd.nextLong().toString,
        Numeric -> (BigDecimal(rnd.nextLong()) / 100).toString,
        Money -> f"$$${rnd.nextInt(1000000)}%d.${rnd.nextInt(100)}%02d",
        Date -> java.time.LocalDate.ofEpochDay(rnd.between(-20000L, 40000L)).toString,
        Time -> render(Time, rnd.between(0L, 86400L * 1000000)),
        Bytea -> ("\\x" + Array.fill(rnd.nextInt(16))(f"${rnd.nextInt(256)}%02x").mkString),
        Text -> rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
      for ((oid, txt) <- cases)
        assert(render(oid, parse(oid, txt)) == txt, s"oid=$oid txt=$txt")
    }
  }

  test("parse/render roundtrip across the type table (PG canonical forms)") {
    val cases: Seq[(Int, String)] = Seq(
      Bool -> "t", Int2 -> "7", Int4 -> "1234", Int8 -> "99999999999",
      Float8 -> "2.5", Numeric -> "10.01", Date -> "2020-06-15",
      Time -> "10:20:30.4", Timestamp -> "2020-06-15 10:20:30.4",
      TimestampTz -> "2020-06-15 10:20:30.4+00",
      Bytea -> "\\xdeadbeef", Text -> "plain", Money -> "$7.77")
    for ((oid, txt) <- cases)
      assert(render(oid, parse(oid, txt)) == txt, s"oid=$oid txt=$txt")
  }
}
