package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r14 VERDICT #8 carry-over (closed in r16): the distributed CC loop's
  * >maxIter convergence guard — silent truncation would be WRONG
  * RESULTS (one component reported as several clusters) flowing into
  * persisted indexes, so [[Dedup.ccLoop]] must throw loudly. The guard
  * is untestable through [[Dedup.connectedComponents]] (small graphs
  * always take the driver union-find path, which cannot fail to
  * converge), so the spec drives the package-private loop directly —
  * exactly the hook its doc promises. */
class CcConvergenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Mirror connectedComponents' loop init exactly: both-orientation
    * checkpointed edges + identity labels. */
  private def loopInputs(pairs: Seq[(Long, Long)])
      : (DataFrame, DataFrame, Long) = {
    val p = pairs.toDF("id_a", "id_b")
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(eager = true)
    val labels0 = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .withColumn("old", col("id"))
      .localCheckpoint(eager = true)
    (edges, labels0, labels0.count())
  }

  private val chain: Seq[(Long, Long)] = (1L until 12L).map(i => (i, i + 1))

  test("maxIter exceeded throws IllegalStateException, never truncates") {
    val (edges, labels0, n) = loopInputs(chain)
    val e = intercept[IllegalStateException] {
      Dedup.ccLoop(edges, labels0, n, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("a diameter-11 chain converges within the default 10 rounds") {
    val (edges, labels0, n) = loopInputs(chain)
    val got = Dedup.ccLoop(edges, labels0, n, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 12L).map(_ -> 1L).toMap)
  }

  test("distributed loop == driver union-find on a multi-component graph") {
    val pairs = chain ++ Seq((100L, 101L), (101L, 102L), (200L, 201L))
    val (edges, labels0, n) = loopInputs(pairs)
    val loop = Dedup.ccLoop(edges, labels0, n, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    // the public API on the same pairs takes the driver fast path here
    val driver = Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(loop == driver)
  }
}
