package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the q180 frontier-scheduling capstone over the
  * sf0.001 fixture (the oracle pins exact values; this spec pins the
  * POLICY shape): per-host budget respected, robots-blocked host
  * class absent, discovery-before-staleness priority, contiguous
  * fetch order. */
class FrontierScheduleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows = SparkEntry
    .queries("q180_frontier_schedule")(spark, "/root/testdata/sf0.001")
    .collect()
    .map(r => (r.getAs[String]("host"), r.getAs[String]("url"),
      r.getAs[String]("status"), r.getAs[Long]("fetch_order")))

  test("per-host politeness budget holds and fetch order is contiguous") {
    rows.groupBy(_._1).foreach { case (_, hs) =>
      val orders = hs.map(_._4).sorted.toSeq
      assert(orders.size <= 4)
      assert(orders == (1L to orders.size).toSeq)
    }
    assert(rows.nonEmpty)
  }

  test("robots star-only hosts (class sn%4==1) schedule nothing") {
    val blocked = rows.map(_._1).distinct
      .filter(h => h.stripPrefix("src").takeWhile(_.isDigit).toInt % 4 == 1)
    assert(blocked.isEmpty)
  }

  test("new discoveries always outrank stale refetches within a host") {
    rows.groupBy(_._1).foreach { case (_, hs) =>
      val byOrder = hs.sortBy(_._4).map(_._3)
      // once 'stale' appears, no later 'new' may follow
      val firstStale = byOrder.indexOf("stale")
      if (firstStale >= 0)
        assert(byOrder.drop(firstStale).forall(_ == "stale"))
    }
  }

  test("scheduled urls parse back to their host and page") {
    rows.foreach { case (host, url, _, _) =>
      assert(url.startsWith(s"https://$host/p"))
    }
  }
}
