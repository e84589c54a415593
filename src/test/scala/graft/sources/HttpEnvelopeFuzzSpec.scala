package graft.sources

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Totality battery for the envelope parser — payloads arrive from
  * the open web, so parse must return a typed row for ANY bytes:
  * random blobs, point mutations of a valid envelope, and truncation
  * at every prefix (the off-by-one class). Invariants: never throws,
  * status typed, ok-rows carry a 3-digit code and a body that is a
  * SUFFIX of the input, malformed/none keep EVERY input byte. */
class HttpEnvelopeFuzzSpec extends AnyFunSuite {

  private val valid = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
    "charset=utf-8\r\nServer: graft\r\n\r\nthe quick brown body")
    .getBytes("UTF-8")

  private def check(bytes: Array[Byte]): Unit = {
    val r = HttpEnvelope.parse("z", bytes)
    assert(Set("ok", "malformed", "none")(r.env_status))
    r.env_status match {
      case "ok" =>
        assert(r.http_status.exists(c => c >= 0 && c <= 999))
        // the body is the exact tail of the input
        assert(r.body.length <= bytes.length)
        assert(java.util.Arrays.equals(r.body,
          java.util.Arrays.copyOfRange(bytes,
            bytes.length - r.body.length, bytes.length)))
      case _ =>
        // quarantine keeps every byte
        assert(r.http_status.isEmpty &&
          java.util.Arrays.equals(r.body, bytes))
    }
  }

  test("random byte blobs never crash the parser") {
    val gen = for {
      n <- Gen.choose(0, 300)
      bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bs.toArray
    (1 to 300).foreach { i =>
      check(gen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(7000L + i)).get)
    }
  }

  test("point mutations of a valid envelope stay total") {
    val rnd = new scala.util.Random(99)
    (1 to 400).foreach { _ =>
      val m = valid.clone()
      val k = 1 + rnd.nextInt(3)
      (0 until k).foreach(_ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte)
      check(m)
    }
  }

  test("truncation at every prefix stays total") {
    (0 to valid.length).foreach { n =>
      check(java.util.Arrays.copyOf(valid, n))
    }
    val r = HttpEnvelope.parse("z", valid)
    assert(r.env_status == "ok" && r.body_text == "the quick brown body")
  }
}
