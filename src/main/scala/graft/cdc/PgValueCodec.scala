package graft.cdc

import java.time.{LocalDate, LocalDateTime, LocalTime, OffsetDateTime, ZoneOffset}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField

/** PostgreSQL text-output ⇄ typed value conversion — behavioral twin of the
  * reference's per-OID encode functions (ext/oid2avro.c:366–453 and the
  * temporal decompositions at :526–737), against PG's public text output
  * formats. The reference converts HeapTuple datums; our ingest path converts
  * the text representations that ride in CDC payloads.
  *
  * Deliberate divergences (documented in PgTypes):
  *   - numeric → BigDecimal (reference: lossy double, its acknowledged bug)
  *   - money   → exact cents (reference: ×100 bug pinned by
  *     spec/functional/type_specs.rb:147–153 — we keep cents-as-long
  *     semantics but convert correctly)
  *
  * ±infinity dates/timestamps (3-branch unions in the reference,
  * ext/oid2avro.c:459–482) map to sentinel LocalDate/LocalDateTime MIN/MAX —
  * SURVEY §7.4's documented plan.
  */
object PgValueCodec {
  import PgTypes.Oid._

  val DateInfinity: LocalDate = LocalDate.MAX
  val DateNegInfinity: LocalDate = LocalDate.MIN
  val TsInfinity: LocalDateTime = LocalDateTime.MAX
  val TsNegInfinity: LocalDateTime = LocalDateTime.MIN

  /** timetz carries (µs since midnight, zone offset in seconds, sign flipped
    * to ISO8601 — PG stores west-positive, the reference flips it,
    * ext/oid2avro.c:584–585).
    */
  final case class PgTimeTz(micro: Long, zoneOffset: Int)

  /** interval decomposed calendar-aware (ext/oid2avro.c:703–737). */
  final case class PgInterval(months: Int, days: Int, micros: Long)

  // PG text output trims trailing fraction zeros (".5", ".789") and emits
  // hour-only zone offsets ("+00"); fixed-width SSSSSS / XXX patterns reject
  // real PG output, so build tolerant formatters: 0–6 fraction digits,
  // offset with optional minutes/seconds.
  private def fractional(b: DateTimeFormatterBuilder): DateTimeFormatterBuilder =
    b.optionalStart().appendFraction(ChronoField.MICRO_OF_SECOND, 0, 6, true).optionalEnd()

  private val timeFmt: DateTimeFormatter =
    fractional(new DateTimeFormatterBuilder().appendPattern("H:mm:ss")).toFormatter

  private val tsFmt: DateTimeFormatter =
    fractional(new DateTimeFormatterBuilder().appendPattern("yyyy-MM-dd HH:mm:ss"))
      .toFormatter

  private val tsTzFmt: DateTimeFormatter =
    fractional(new DateTimeFormatterBuilder().appendPattern("yyyy-MM-dd HH:mm:ss"))
      .appendOffset("+HH:mm:ss", "+00").toFormatter

  private val timeTzFmt: DateTimeFormatter =
    fractional(new DateTimeFormatterBuilder().appendPattern("H:mm:ss"))
      .appendOffset("+HH:mm:ss", "+00").toFormatter

  /** PG-style fraction rendering: trailing zeros trimmed, dot dropped at 0. */
  private def fracSuffix(micros: Long): String =
    if (micros == 0) ""
    else "." + f"$micros%06d".reverse.dropWhile(_ == '0').reverse

  /** PG-style zone offset: "+00", "-08", "+05:30". */
  private def renderOffset(totalSeconds: Int): String = {
    val sign = if (totalSeconds < 0) "-" else "+"
    val abs = math.abs(totalSeconds)
    val h = abs / 3600; val m = (abs % 3600) / 60
    f"$sign$h%02d" + (if (m != 0) f":$m%02d" else "")
  }

  /** Parse a PG text-format value to the JVM value backing the Spark type in
    * PgTypes.sparkType. null in → null out (union branch 0).
    */
  def parse(oid: Int, text: String): Any = {
    if (text == null) return null
    oid match {
      case Bool => text == "t" || text == "true"
      case Int2 => text.toShort
      case Int4 => text.toInt
      case Int8 | OidT | RegProc | Xid | Cid => text.toLong
      case Float4 => text.toFloat
      case Float8 => text.toDouble
      case Numeric => BigDecimal(text)
      case Money =>
        // "$1,234.56" / "-$12.34" → exact cents
        val neg = text.contains("-")
        val digits = text.filter(c => c.isDigit || c == '.')
        val cents = (BigDecimal(digits) * 100).toLongExact
        if (neg) -cents else cents
      case Date => text match {
        case "infinity"  => DateInfinity
        case "-infinity" => DateNegInfinity
        case t           => LocalDate.parse(t)
      }
      case Time =>
        // µs since midnight (ext/oid2avro.c:418–420)
        LocalTime.parse(text, timeFmt).toNanoOfDay / 1000L
      case TimeTz =>
        val parsed = timeTzFmt.parse(text)
        PgTimeTz(LocalTime.from(parsed).toNanoOfDay / 1000L,
          ZoneOffset.from(parsed).getTotalSeconds)
      case Timestamp => text match {
        case "infinity"  => TsInfinity
        case "-infinity" => TsNegInfinity
        case t           => LocalDateTime.parse(t, tsFmt)
      }
      case TimestampTz => text match {
        case "infinity"  => TsInfinity
        case "-infinity" => TsNegInfinity
        case t => OffsetDateTime.parse(t, tsTzFmt).toInstant
      }
      case Interval => parseInterval(text)
      case Bytea =>
        // "\x6162" hex form (PG ≥ 9.0 default output)
        require(text.startsWith("\\x"), s"unsupported bytea format: $text")
        text.drop(2).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      case _ => text // string fallback — identical to the reference's catch-all
    }
  }

  /** "1 year 2 mons 3 days 04:05:06.789" and variants → (months, days, µs). */
  private[cdc] def parseInterval(s: String): PgInterval = {
    var months = 0; var days = 0; var micros = 0L
    val tokens = s.trim.split("\\s+")
    var i = 0
    while (i < tokens.length) {
      tokens(i) match {
        case t if t.contains(":") =>
          val timeNeg = t.startsWith("-")
          val lt = LocalTime.parse(if (timeNeg) t.drop(1) else t, timeFmt)
          val us = lt.toNanoOfDay / 1000L
          micros += (if (timeNeg) -us else us)
          i += 1
        case n =>
          val v = n.toInt
          tokens(i + 1).stripSuffix("s") match {
            case "year"         => months += v * 12
            case "mon"          => months += v
            case "day"          => days += v
            case other => throw new IllegalArgumentException(s"interval unit $other")
          }
          i += 2
      }
    }
    PgInterval(months, days, micros)
  }

  /** Render a typed value back to PG text format (inverse of [[parse]] for
    * roundtrip testing; also the engine's output formatter).
    */
  def render(oid: Int, v: Any): String = {
    if (v == null) return null
    oid match {
      case Bool => if (v.asInstanceOf[Boolean]) "t" else "f"
      case Money =>
        val cents = v.asInstanceOf[Long]
        val sign = if (cents < 0) "-" else ""
        val abs = math.abs(cents)
        f"$sign$$${abs / 100}%d.${abs % 100}%02d"
      case Date => v match {
        case DateInfinity    => "infinity"
        case DateNegInfinity => "-infinity"
        case d: LocalDate    => d.toString
      }
      case Time =>
        val us = v.asInstanceOf[Long]
        LocalTime.ofNanoOfDay(us * 1000L)
          .format(DateTimeFormatter.ofPattern("HH:mm:ss")) + fracSuffix(us % 1000000L)
      case TimeTz =>
        val t = v.asInstanceOf[PgTimeTz]
        LocalTime.ofNanoOfDay(t.micro * 1000L)
          .format(DateTimeFormatter.ofPattern("HH:mm:ss")) +
          fracSuffix(t.micro % 1000000L) + renderOffset(t.zoneOffset)
      case Timestamp => v match {
        case TsInfinity    => "infinity"
        case TsNegInfinity => "-infinity"
        case t: LocalDateTime =>
          t.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")) +
            fracSuffix(t.getNano / 1000L)
      }
      case TimestampTz => v match {
        case TsInfinity    => "infinity"
        case TsNegInfinity => "-infinity"
        case i: java.time.Instant =>
          val odt = i.atOffset(ZoneOffset.UTC)
          odt.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")) +
            fracSuffix(odt.getNano / 1000L) + "+00"
      }
      case Bytea =>
        "\\x" + v.asInstanceOf[Array[Byte]].map(b => f"${b & 0xff}%02x").mkString
      case Interval =>
        val iv = v.asInstanceOf[PgInterval]
        val absUs = math.abs(iv.micros)
        val t = LocalTime.ofNanoOfDay(absUs * 1000L)
        val sign = if (iv.micros < 0) "-" else ""
        s"${iv.months / 12} years ${iv.months % 12} mons ${iv.days} days " +
          sign + t.format(DateTimeFormatter.ofPattern("HH:mm:ss")) +
          fracSuffix(absUs % 1000000L)
      case _ => v.toString
    }
  }

  /** PG array text form "{1,2,3}" / "{a,\"b c\"}" → element strings (the
    * reference roundtrips arrays as strings, spec/functional/schema_spec.rb:
    * 349–356; we additionally offer the typed split).
    */
  def parseArray(text: String): Seq[String] = {
    if (text == null) return null
    require(text.startsWith("{") && text.endsWith("}"), s"not a PG array: $text")
    val body = text.substring(1, text.length - 1)
    if (body.isEmpty) return Seq.empty
    val out = Seq.newBuilder[(String, Boolean)] // (element, wasQuoted)
    val cur = new StringBuilder
    var inQuote = false; var sawQuote = false; var i = 0
    while (i < body.length) {
      body(i) match {
        case '"' if !inQuote => inQuote = true; sawQuote = true
        case '"' if inQuote  => inQuote = false
        case '\\' if inQuote => cur.append(body(i + 1)); i += 1
        case ',' if !inQuote =>
          out += ((cur.toString, sawQuote)); cur.clear(); sawQuote = false
        case c               => cur.append(c)
      }
      i += 1
    }
    out += ((cur.toString, sawQuote))
    // only an UNQUOTED NULL is a null; {"NULL"} is the literal string "NULL"
    out.result().map { case (s, quoted) => if (!quoted && s == "NULL") null else s }
  }
}
