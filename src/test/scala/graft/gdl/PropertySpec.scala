package graft.gdl

import java.time.Instant
import graft.gdl.expr.StrictJson
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** ScalaCheck generators ≙ the reference's hand-rolled randomized
  * fixtures (/root/reference/tests/general_generators.py:12-68,
  * tests/stac_generators.py:12-36 — FIXTURES.md §4), upgraded to real
  * property-style testing (SURVEY §5).
  */
object Gens {
  private val titleChars =
    ('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('_', '-')

  /** ≙ any_dataset_title: 20 chars of [A-Za-z0-9_-]. */
  val datasetTitle: Gen[String] =
    Gen.listOfN(20, Gen.oneOf(titleChars)).map(_.mkString)

  /** ≙ any_file_contents: 20 random bytes. */
  val fileContents: Gen[Array[Byte]] =
    Gen.listOfN(20, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  /** ≙ any_hex_multihash: "12" + "20" + sha256 hex. */
  val hexMultihash: Gen[String] =
    fileContents.map(TestFixtures.multihash256)

  /** ≙ any_s3_url: s3://<20 lowercase+digits>/<1-4 safe segments>. */
  val s3Url: Gen[String] = for {
    bucket <- Gen.listOfN(20, Gen.oneOf(('a' to 'z') ++ ('0' to '9'))).map(_.mkString)
    nSegs <- Gen.chooseNum(1, 4)
    segs <- Gen.listOfN(nSegs,
      Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString))
  } yield s"s3://$bucket/${segs.mkString("/")}"

  /** ≙ random_string: ASCII printable + sampled unicode blocks. */
  val unicodeString: Gen[String] = for {
    n <- Gen.chooseNum(1, 30)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.asciiPrintableChar,
      2 -> Gen.oneOf('¡', 'Ā', 'ƀ', 'Ḃ', 'ə', '✁', 'ㄅ', 'ﬀ')))
  } yield cs.mkString

  /** ≙ any_past_datetime: uniform back ~950 years from 2000-01-01. */
  val pastDatetime: Gen[Instant] =
    Gen.chooseNum(-29000000000000L, 946684800000L).map(Instant.ofEpochMilli)

  def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq
}

class PropertySpec extends AnyFunSuite {
  import Gens._

  test("every generated title passes the charset rule; mutations fail") {
    samples(datasetTitle).foreach { t =>
      assert(Ulid.validTitle(t), t)
      assert(!Ulid.validTitle(t + " "), s"'$t ' should fail")
      assert(!Ulid.validTitle(t + "!"), s"'$t!' should fail")
      assert(!Ulid.validTitle(""), "empty should fail")
    }
  }

  test("checksum passes for the true multihash and fails for a mutated digest") {
    samples(fileContents, 50).foreach { bytes =>
      val reader = new InMemoryUrlReader(Map("s3://b/f" -> bytes))
      val good = TestFixtures.multihash256(bytes)
      assert(ChecksumValidator.validateOne(reader, "d", "v", "s3://b/f", good)
        .result == Result.Passed)
      val flipped = good.substring(0, 4) +
        good.substring(4).updated(0, if (good(4) == '0') '1' else '0')
      assert(ChecksumValidator.validateOne(reader, "d", "v", "s3://b/f", flipped)
        .result == Result.Failed)
      val sha512 = TestFixtures.multihash512(bytes)
      assert(ChecksumValidator.validateOne(reader, "d", "v", "s3://b/f", sha512)
        .result == Result.Passed)
    }
  }

  test("strict parse of any serialized unicode object: no dups, values survive") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    samples(Gen.mapOf(Gen.zip(unicodeString, unicodeString)), 50).foreach { m =>
      val json = mapper.writeValueAsString(
        m.foldLeft(mapper.createObjectNode()) { case (o, (k, v)) => o.put(k, v) })
      val out = StrictJson.parse(json)
      assert(out.parseError.isEmpty, json)
      assert(out.duplicateKeys.isEmpty)
      m.foreach { case (k, v) =>
        assert(out.node.get.get(k) != null && out.node.get.get(k).asText == v)
      }
    }
  }

  test("dataset pk compose/decompose round-trips for generated ids") {
    samples(Gen.zip(pastDatetime, Gen.long), 50).foreach { case (t, seed) =>
      val id = Ulid.generate(t.plusMillis(math.abs(seed % 1000)), new Random(seed))
      assert(Keys.datasetIdFromPk(Keys.datasetPk(id)) == id)
    }
  }

  test("ULIDs sort lexicographically in time order (the format's contract)") {
    val times = samples(Gen.chooseNum(0L, 4102444800000L), 50)
      .distinct.map(Instant.ofEpochMilli)
    val ids = times.map(t => Ulid.generate(t, new Random(1)))
    assert(ids.sorted == times.sorted.map(t => Ulid.generate(t, new Random(1))))
  }

  test("s3 urls pass the crawler's scheme gate; http urls fail it") {
    samples(s3Url).foreach { url =>
      assert(url.startsWith("s3://"))
      assert(url.matches("^s3://[a-z0-9]{20}/.+$"), url)
    }
  }
}
