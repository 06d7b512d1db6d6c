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
