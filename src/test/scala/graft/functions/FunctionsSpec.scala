package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class AvroSafeNameSpec extends AnyFunSuite {
  test("reference cases (spec/functional/schema_spec.rb:383–400)") {
    assert(AvroSafeName.sanitize("users") == "users")
    assert(AvroSafeName.sanitize("person/name") == "person_2f_name")
    assert(AvroSafeName.sanitize("crêpes") == "cr_c3__aa_pes")
  }
  test("leading digit is escaped, inner digits are not") {
    assert(AvroSafeName.sanitize("1table") == "_31_table")
    assert(AvroSafeName.sanitize("t1") == "t1")
    assert(AvroSafeName.sanitize("_1") == "_1")
  }
  test("spaces and punctuation hex-escape per byte") {
    assert(AvroSafeName.sanitize("small ring") == "small_20_ring")
    assert(AvroSafeName.sanitize("a.b-c") == "a_2e_b_2d_c")
  }
  test("null passes through") {
    assert(AvroSafeName.sanitize(null) == null)
  }
  test("sanitized output is always a valid avro name") {
    val re = "^[A-Za-z_][A-Za-z0-9_]*$".r
    for (s <- Seq("ünïcödé", "33", "тест", "a b c", "!@#$%", "ok_name"))
      assert(re.matches(AvroSafeName.sanitize(s)), s"for input $s")
  }

  test("63-byte identifiers pass through whole (schema_spec.rb:359–377)") {
    // the reference's max-identifier cases: 'z' * 63 survives column/table
    // handling verbatim — sanitize must neither escape nor shorten it
    val long63 = "z" * 63
    assert(AvroSafeName.sanitize(long63) == long63)
    assert(AvroSafeName.pgTruncateIdentifier(long63) eq long63)
    // the router preserves the max-length name end-to-end (topic_spec.rb:72–80)
    assert(graft.cdc.TopicRouter.topicName(null, "public", long63) == long63)
    assert(graft.cdc.TopicRouter.topicName(null, "myapp", long63) ==
      "myapp." + long63)
  }

  test("pgTruncateIdentifier clips at 63 bytes like NAMEDATALEN") {
    val z64 = "z" * 64
    assert(AvroSafeName.pgTruncateIdentifier(z64) == "z" * 63)
    assert(AvroSafeName.pgTruncateIdentifier("") == "")
    assert(AvroSafeName.pgTruncateIdentifier(null) == null)
    for (n <- Seq(1, 62, 63)) {
      val s = "a" * n
      assert(AvroSafeName.pgTruncateIdentifier(s) eq s, s"<=63 bytes untouched: $n")
    }
  }

  test("pgTruncateIdentifier never splits a multibyte character (mbcliplen)") {
    // 'é' is 2 UTF-8 bytes: 62 ASCII + 'é' = 64 bytes, and byte 63 falls
    // mid-character — PG drops the whole character, not half of it
    val straddling = "z" * 62 + "é"
    val clipped = AvroSafeName.pgTruncateIdentifier(straddling)
    assert(clipped == "z" * 62)
    // 31 z's + 16×'é' = 63 bytes exactly: fits, untouched
    val exact = "z" * 31 + "é" * 16
    assert(exact.getBytes("UTF-8").length == 63)
    assert(AvroSafeName.pgTruncateIdentifier(exact) eq exact)
    // clipped output is always valid UTF-8 at or under the limit, and
    // round-trips through bytes unchanged (no replacement characters)
    for (s <- Seq("é" * 40, "тест" * 12, "z" * 100, "日本語データベース" * 4)) {
      val t = AvroSafeName.pgTruncateIdentifier(s)
      val bytes = t.getBytes("UTF-8")
      assert(bytes.length <= 63, s"for $s")
      assert(new String(bytes, "UTF-8") == t, s"valid UTF-8 for $s")
      assert(s.startsWith(t), s"truncation is a prefix for $s")
    }
  }
}

class TextHashSpec extends AnyFunSuite {
  import org.apache.spark.unsafe.types.UTF8String.{fromString => u}

  test("fingerprint folds CODEPOINTS (oracle parity for non-ASCII)") {
    // 'é' is one codepoint 233 (two UTF-8 bytes): h = 233, not (195*131+169)
    assert(DocFingerprint.fingerprint(u("é")) == 233L)
    assert(DocFingerprint.fingerprint(u("abc")) ==
      (('a' * 131 + 'b') * 131 + 'c') % 2147483647L)
    assert(DocFingerprint.fingerprint(u("")) == 0L)
  }

  test("simhash of a token-less document is null, not all-bits-set") {
    assert(SimHash.simhash(u("")) == null)
    assert(SimHash.simhash(u("   ")) == null)
    assert(SimHash.simhash(u("x")) != null)
  }
}

class RegistryFrameSpec extends AnyFunSuite {
  test("frame layout: magic 0x00 + 4-byte BE id + payload (registry.h:9)") {
    val framed = RegistryFrame.frame(0x01020304, Array[Byte](9, 8))
    assert(framed.toSeq == Seq[Byte](0, 1, 2, 3, 4, 9, 8))
  }
  test("roundtrip id + payload for arbitrary inputs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val id = rnd.nextInt()
      val payload = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      val framed = RegistryFrame.frame(id, payload)
      assert(RegistryFrame.schemaId(framed) == id)
      assert(RegistryFrame.strip(framed).toSeq == payload.toSeq)
    }
  }
  test("null payload (tombstone) frames to null") {
    assert(RegistryFrame.frame(7, null) == null)
  }
  test("bad magic byte rejected (strict, like parse_frame trailing check)") {
    intercept[IllegalArgumentException] {
      RegistryFrame.schemaId(Array[Byte](1, 0, 0, 0, 1, 42))
    }
    intercept[IllegalArgumentException] { RegistryFrame.strip(Array[Byte](0, 0)) }
  }
}
