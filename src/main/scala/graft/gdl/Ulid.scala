package graft.gdl

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.util.Random

/** Human-readable ULID ≙ /root/reference/backend/datasets_model.py:13-23:
  * `YYYY-MM-DDThh-mm-ss-mmmZ_<16 chars Crockford base32 randomness>`.
  * The clock and RNG are injectable so ids are deterministic under test,
  * mirroring the reference's injectable `now`
  * (backend/dataset_versions/create.py:58-59).
  */
object Ulid {
  private val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ" // Crockford
  private val TsFormat =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH-mm-ss-SSS'Z'")
      .withZone(ZoneOffset.UTC)

  def generate(now: Instant, rng: Random = new Random()): String = {
    val rand = Seq.fill(16)(Alphabet(rng.nextInt(32))).mkString
    s"${TsFormat.format(now)}_$rand"
  }

  /** Title charset rule ≙ backend/datasets/create.py:11-21 (O-38). */
  val TitlePattern = "^[A-Za-z0-9_-]+$"
  def validTitle(title: String): Boolean = title.matches(TitlePattern)
}
