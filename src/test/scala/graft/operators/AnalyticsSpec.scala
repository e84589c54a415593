package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-4 analytics additions: sparse tf-idf
  * all-pairs cosine, exact Misra-Gries heavy hitters, and synchronous
  * label propagation. Fixtures are hand-checkable.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sparse cosine: identical docs hit 1.0, hub terms are pruned") {
    // "a b c" appears in docs 1,2 (df=2, survives); the "x y z" 3-gram
    // appears in ALL four docs (df=4 > maxDf=3 → pruned), so docs 3,4
    // share nothing after pruning
    val docs = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c x y z"),
      (3L, "x y z"),
      (4L, "x y z")).toDF("doc_id", "text")
    val pairs = SparseSim.allPairsCosine(docs, "doc_id", "text",
        n = 3, minDf = 2L, maxDf = 3L, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // docs 1,2 share every surviving term with equal weights → cosine 1
    assert(pairs.keySet == Set((1L, 2L)))
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-6)
  }

  test("sparse cosine: partial overlap lands strictly between 0 and 1") {
    val docs = Seq(
      (1L, "a b c d e"),   // terms: "a b c", "b c d", "c d e"
      (2L, "a b c q q"),   // shares "a b c" only
      (3L, "a b c d e"),
      (4L, "z z z z z")    // keeps df("a b c")=3 < N so idf > 0
    ).toDF("doc_id", "text")
    val pairs = SparseSim.allPairsCosine(docs, "doc_id", "text",
        n = 3, minDf = 2L, maxDf = 3L, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(pairs((1L, 3L)) - 1.0) < 1e-6)
    assert(pairs((1L, 2L)) > 0.0 && pairs((1L, 2L)) < 0.9)
    assert(pairs((1L, 2L)) == pairs((2L, 3L))) // symmetric by value
  }

  test("heavy hitters: exactly the keys above n/k, with exact counts") {
    // 60 rows: a×30, b×15, c×10, d×5 — above n/6=10: a, b
    val rows = Seq.fill(30)("a") ++ Seq.fill(15)("b") ++
      Seq.fill(10)("c") ++ Seq.fill(5)("d")
    val df = rows.toDF("k").repartition(7) // force multi-partition MG
    val out = HeavyHitters.exact(df, "k", k = 6)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("a" -> (30L, 60L), "b" -> (15L, 60L)))
  }

  test("heavy hitters: a null key above the line is reported, not dropped") {
    // null is 40% of traffic — it must appear in the report (it counts
    // toward n either way; an equi-join would silently lose it)
    val rows: Seq[String] = Seq.fill(40)(null.asInstanceOf[String]) ++
      Seq.fill(35)("a") ++ (1 to 25).map(i => s"t$i")
    val out = HeavyHitters.exact(rows.toDF("k").repartition(5), "k", k = 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(out == Map(None -> 40L, Some("a") -> 35L))
  }

  test("heavy hitters: adversarial tail does not evict a true heavy key") {
    // 100 distinct tail keys + one key at 40% — k=3 summaries must keep it
    val rows = Seq.fill(80)("hot") ++ (1 to 120).map(i => s"t$i")
    val out = HeavyHitters.exact(rows.toDF("k").repartition(5), "k", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("hot", 80L))) // 80 > 200/3
  }

  test("label prop: two cliques joined by a bridge resolve to two communities") {
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10. Hand-traced sync
    // rounds: the low clique settles on 1; the bridge label 3 reaches
    // node 10 in round 1 and wins the high clique by round 3 — both
    // cliques internally agree, with distinct labels across the bridge.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = LabelProp.run(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    assert(Set(1L, 2L, 3L).map(labels) == Set(1L))
    assert(Set(10L, 11L, 12L).map(labels) == Set(3L))
  }

  test("heavy hitters: property — output equals exact groupBy filter on random data") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 50 + rnd.nextInt(200)
      val alpha = 1 + rnd.nextInt(12)
      val k = 2 + rnd.nextInt(8)
      // zipf-ish skew: key id = floor(sqrt(uniform)) over a small alphabet
      val rows = Seq.fill(n)(s"k${math.sqrt(rnd.nextInt(alpha * alpha)).toInt}")
      val df = rows.toDF("x").repartition(1 + rnd.nextInt(6))
      val got = HeavyHitters.exact(df, "x", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > n }.toMap
      assert(got == expected, s"trial $trial (n=$n k=$k alpha=$alpha)")
    }
  }

  test("dup-span strip removes exactly the covered tokens, keeps order") {
    // "a b c d e f" vs "a b c z d e f": doc1 is fully covered
    // ([1,6] span); doc2 keeps only the bridging "z" at position 4
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c z d e f"),
      (3L, "p q r s")).toDF("doc_id", "text")
    val out = Boilerplate.stripDupSpans(docs, "doc_id", "text", n = 3, minDf = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ("", 6L, 6L))
    assert(out(2L) == ("z", 7L, 6L))
    assert(out(3L) == ("p q r s", 4L, 0L)) // untouched doc passes through
  }

  test("spatial join: pair spanning many shared cells reports once, exact area") {
    // both boxes cover cells (0,0)..(2,0) at cell=16 → 3 shared cells,
    // but the pair must emit exactly once; overlap [5,40]×[3,8] closed
    // lattice = 36 × 6
    val a = Seq((1L, 0L, 40L, 0L, 8L)).toDF("a_id", "ax0", "ax1", "ay0", "ay1")
    val b = Seq((9L, 5L, 45L, 3L, 10L)).toDF("b_id", "bx0", "bx1", "by0", "by1")
    val out = SpatialJoin.bboxIntersect(a, b, cell = 16L).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 36L * 6L)
  }

  test("spatial join: property — grid join equals the direct theta join") {
    val rnd = new scala.util.Random(7)
    def boxes(n: Int, p: String) = (1 to n).map { i =>
      val x0 = rnd.nextInt(200).toLong; val y0 = rnd.nextInt(200).toLong
      (i.toLong, x0, x0 + rnd.nextInt(30).toLong, y0, y0 + rnd.nextInt(30).toLong)
    }.toDF(s"${p}_id", s"${p}x0", s"${p}x1", s"${p}y0", s"${p}y1")
    val a = boxes(60, "a"); val b = boxes(40, "b")
    for (cell <- Seq(8L, 16L, 64L)) {
      val grid = SpatialJoin.bboxIntersect(a, b, cell)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val direct = a.join(b,
          col("ax0") <= col("bx1") && col("bx0") <= col("ax1") &&
          col("ay0") <= col("by1") && col("by0") <= col("ay1"))
        .select(col("a_id"), col("b_id"),
          ((least(col("ax1"), col("bx1")) - greatest(col("ax0"), col("bx0")) + 1L) *
            (least(col("ay1"), col("by1")) - greatest(col("ay0"), col("by0")) + 1L)))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(grid.sorted == direct.sorted, s"cell=$cell")
      assert(grid.size == grid.distinct.size, s"duplicates at cell=$cell")
    }
  }

  test("label prop: deterministic tie-break adopts the smallest label") {
    // node 5 sees labels 1 and 2 once each → adopts 1
    val edges = Seq((5L, 1L), (5L, 2L), (1L, 5L), (2L, 5L)).toDF("src", "dst")
    val l1 = LabelProp.run(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1(5L) == 1L)
  }
}
