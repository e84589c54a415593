package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-fixture pins for chat rendering + context truncation: the
  * exact-boundary suffix, oldest-turns-dropped order, role
  * alternation opening with `user:` AFTER truncation, the oversized
  * single turn (kept 0, rendered empty), and session splitting. */
class ChatRenderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, Long)*) =
    rows.toDF("user_id", "event_id", "ts_us", "event_type", "turn_tokens")

  test("trailing whole turns kept; boundary inclusive; roles re-alternate") {
    // 3 turns x 10 tokens, budget 20: keep the NEWEST two exactly
    val out = ChatRender.render(
      ev((1L, 1L, 0L, "a", 10L), (1L, 2L, 10L, "b", 10L),
         (1L, 3L, 20L, "c", 10L)),
      gapUs = 1000L, budgetTokens = 20L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_turns_total") == 3)
    assert(r.getAs[Long]("n_turns_kept") == 2)
    assert(r.getAs[Long]("tokens_kept") == 20)
    // kept suffix is (b, c); alternation restarts on the KEPT turns
    assert(r.getAs[String]("rendered") == "user: b\nassistant: c")
  }

  test("budget below the two-turn suffix keeps only the newest turn") {
    val out = ChatRender.render(
      ev((1L, 1L, 0L, "a", 10L), (1L, 2L, 10L, "b", 10L),
         (1L, 3L, 20L, "c", 10L)),
      gapUs = 1000L, budgetTokens = 19L).collect().head
    assert(out.getAs[Long]("n_turns_kept") == 1)
    assert(out.getAs[String]("rendered") == "user: c")
  }

  test("oversized newest turn: whole-turn contract renders empty") {
    val out = ChatRender.render(ev((2L, 1L, 0L, "big", 50L)),
      gapUs = 1000L, budgetTokens = 24L).collect().head
    assert(out.getAs[Long]("n_turns_total") == 1)
    assert(out.getAs[Long]("n_turns_kept") == 0)
    assert(out.getAs[Long]("tokens_kept") == 0)
    assert(out.getAs[String]("rendered") == "")
  }

  test("gap splits sessions; each truncates independently") {
    val out = ChatRender.render(
      ev((3L, 1L, 0L, "a", 3L), (3L, 2L, 10L, "b", 3L),
         (3L, 3L, 5000L, "c", 3L)),
      gapUs = 1000L, budgetTokens = 4L)
      .orderBy("session_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("rendered") == "user: b") // a dropped
    assert(out(1).getAs[String]("rendered") == "user: c")
    assert(out(0).getAs[Long]("session_id") == 1)
    assert(out(1).getAs[Long]("session_id") == 2)
  }
}
