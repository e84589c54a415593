package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for Dedup.simhashNearDup: the Hamming-1 multiprobe
  * join must reproduce the brute-force all-pairs answer exactly, and
  * each qualifying pair must surface exactly once (the "collides on
  * exactly one probe key" argument).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "alpha beta gamma delta epsilon"),      // exact copy of 1
    (3L, "alpha beta gamma delta zeta"),         // near copy of 1
    (4L, "one two three four five six"),
    (5L, "one two three four five seven"),       // near copy of 4
    (6L, "completely different words here now"),
    (7L, "unrelated content again entirely else")
  ).toDF("doc_id", "text")

  test("embeddingDupClusters (identity collapse) equals the naive pairs->CC plan") {
    // the real embeddings table plus EXACT copies of a slice under
    // shifted ids — the corpus shape the collapse exists for
    val base = graft.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val copies = base.filter(col("id") % 3 === 0)
      .select((col("id") + 100000L).as("id"), col("embedding"))
    val copies2 = base.filter(col("id") % 5 === 0)
      .select((col("id") + 200000L).as("id"), col("embedding"))
    val vecs = base.union(copies).union(copies2)
    val collapsed = Dedup.embeddingDupClusters(vecs,
        threshold = 0.3, nPlanes = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = Dedup.connectedComponents(
        Dedup.embeddingNearDupProbed(Dedup.centerEmbeddings(vecs, 64),
            threshold = 0.3, nPlanes = 8, dim = 64)
          .select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collapsed == naive)
    assert(collapsed.nonEmpty)
    // the copies really exercised the collapse: every copied id labels
    // with (at least) its original
    assert(collapsed.exists(_._1 >= 100000L))
  }

  test("zero-norm identity group: collapse matches the naive plan's silence") {
    // an ALL-identical corpus centers to the zero vector (values on
    // the exact 1e-9 grid so mean subtraction is exact): the probed
    // join forces sim = 0.0 for zero-norm pairs, so the naive plan
    // emits NO cluster — the collapsed plan's grp_n >= 2 branch must
    // not emit one either (ADVICE r6)
    val vecs = Seq(
      (1L, Array(0.5f, 0.25f, 0.125f, 0.75f)),
      (2L, Array(0.5f, 0.25f, 0.125f, 0.75f)),
      (3L, Array(0.5f, 0.25f, 0.125f, 0.75f))
    ).toDF("id", "embedding")
    val naive = Dedup.connectedComponents(
        Dedup.embeddingNearDupProbed(Dedup.centerEmbeddings(vecs, 4),
            threshold = 0.3, nPlanes = 2, dim = 4)
          .select(col("id_a"), col("id_b")))
      .collect()
    val collapsed = Dedup.embeddingDupClusters(vecs,
        threshold = 0.3, nPlanes = 2, dim = 4)
      .collect()
    assert(naive.isEmpty)
    assert(collapsed.isEmpty)
  }

  test("centerEmbeddings negative-sum mean matches DuckDB's truncating //") {
    // a NEGATIVE per-dimension quantized sum, not divisible by n — the
    // case ADVICE r6 flagged as a floor-vs-truncate engine split.
    // Empirically BOTH engines truncate toward zero (DuckDB 1.0:
    // −7 // 2 = −3), so the contract is truncation, pinned here:
    // s = floor(double(−0.3f)·1e9) + 2·floor(double(0.1f)·1e9)
    //   = −300000012 + 2·100000001 = −100000010, n = 3 →
    // mean_q = −33333336 (floor division would give −33333337).
    val xs = Seq((1L, Array(-0.3f)), (2L, Array(0.1f)), (3L, Array(0.1f)))
    val centered = Dedup.centerEmbeddings(xs.toDF("id", "embedding"), 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).head)).toMap
    val qs = xs.map { case (_, a) => math.floor(a(0).toDouble * 1e9).toLong }
    val mean = qs.sum / xs.size // JVM / truncates — the shared semantics
    assert(mean * xs.size.toLong != qs.sum) // the inexact-division case
    assert(mean == -33333336L)
    xs.foreach { case (id, a) =>
      assert(centered(id) == a(0).toDouble - mean.toDouble / 1e9)
    }
  }

  test("auto-sized plane count holds occupancy AND recall across corpus sizes") {
    import graft.functions.VectorFunctions._
    val base = graft.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    // three corpus sizes: 1×, 4×, 16× — copies direction-perturbed by a
    // small per-copy additive shift so they are near- (not exact-) dups
    def grow(times: Int) = (0 until times).map { c =>
      base.select((col("id") + lit(c * 1000000L)).as("id"),
        transform(col("embedding"),
          x => x.cast("double") + lit(c * 0.01)).as("embedding"))
    }.reduce(_ union _)
    val target = 64L
    for (times <- Seq(1, 4, 16)) {
      val vecs = graft.operators.Dedup
        .centerEmbeddings(grow(times), 64).localCheckpoint(eager = true)
      val n = vecs.count()
      val k = Dedup.autoPlanes(n, target, 2)
      // occupancy: mean bucket size tracks the target within small
      // constant factors (random planes split real data unevenly)
      val occ = vecs.select(hyperplaneBucket(col("embedding"), k, 64).as("c"))
        .groupBy(col("c")).count()
        .agg(avg(col("count"))).collect().head.getDouble(0)
      assert(occ <= 4.0 * target && occ >= target / 8.0,
        s"n=$n k=$k mean occupancy $occ vs target $target")
      // recall vs exact pairs touching a fixed sample — the auto-k
      // probed family must hold the fixed-k=8 family's recall
      val sample = vecs.filter(col("id") < 100L)
        .select(col("id").as("s_id"), col("embedding").as("s_emb"))
      val truth = vecs.crossJoin(broadcast(sample))
        .filter(col("id") =!= col("s_id"))
        .filter(cosine(col("embedding"), col("s_emb")) >= 0.3)
        .select(least(col("id"), col("s_id")).as("id_a"),
          greatest(col("id"), col("s_id")).as("id_b"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(pairs: org.apache.spark.sql.DataFrame) = {
        val got = pairs.filter(col("id_a") < 100L || col("id_b") < 100L)
          .select(col("id_a"), col("id_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        got.intersect(truth).size.toDouble / truth.size.max(1)
      }
      val auto = recallOf(graft.operators.Dedup
        .embeddingNearDupAuto(vecs, 0.3, 64, targetBucket = target))
      val fixed8 = recallOf(graft.operators.Dedup
        .embeddingNearDupProbed(vecs, 0.3, 8, 64))
      assert(auto + 0.05 >= fixed8,
        s"n=$n k=$k auto recall $auto vs fixed-8 $fixed8")
    }
  }

  test("semanticDedup drops within-cell near-identicals, keep-first") {
    // two tight groups around orthogonal axes + one isolate; centroids
    // on the axes so the groups land in separate cells
    def v(x: Double, y: Double, z: Double) = Array(x.toFloat, y.toFloat, z.toFloat)
    val vecs = Seq(
      (10L, v(1.0, 0.01, 0.0)), (11L, v(1.0, 0.02, 0.0)),  // cell A dups
      (12L, v(0.9, 0.05, 0.0)),                            // cell A, near 10
      (20L, v(0.0, 1.0, 0.01)), (21L, v(0.01, 1.0, 0.0)),  // cell B dups
      (30L, v(0.0, 0.0, 1.0))                              // isolate, cell C
    ).toDF("id", "embedding")
    val cents = Seq(
      (0L, v(1.0, 0.0, 0.0)), (1L, v(0.0, 1.0, 0.0)), (2L, v(0.0, 0.0, 1.0))
    ).toDF("cid", "embedding")
    val out = Dedup.semanticDedup(vecs, cents, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // smallest id per similar group survives; everything ≥0.99-similar
    // to a smaller same-cell id is dropped
    assert(out == Map(10L -> false, 11L -> true, 12L -> true,
                      20L -> false, 21L -> true, 30L -> false))
    // a vector's fate never depends on OTHER cells: removing cell B
    // leaves cell A's verdicts unchanged
    val partial = Dedup.semanticDedup(
      vecs.filter(col("id") < 20L), cents, tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(partial == Map(10L -> false, 11L -> true, 12L -> true))
  }

  test("containment catches the embedded short doc that Jaccard misses") {
    val short = (1 to 14).map(i => s"tok$i").mkString(" ") // 12 shingles
    val host = short + " " + (1 to 70).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, short),                       // fully contained in 2
      (2L, host),                        // the (much longer) host
      (3L, "entirely different words with no overlap at all whatsoever ok")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9)
    val got = cont.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // every shingle of doc 1 appears in doc 2 → containment exactly 1.0
    assert(got.keySet == Set(1L -> 2L) && got(1L -> 2L) == 1.0)
    // symmetric Jaccard is ~12/83 — the pair is invisible to the
    // Jaccard-threshold path even at its default 0.5 cut
    assert(Dedup.minhashLsh(docs, "doc_id", "text").count() == 0L)
  }

  test("rare-shingle blocking ignores boilerplate-only overlap") {
    // five docs sharing ONLY a common 3-gram (df=5 > maxDf=4): no
    // candidate forms, so no pair is scored at all
    val docs = (1L to 5L).map(i =>
      (i, s"common three gram uniq${i}a uniq${i}b uniq${i}c"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairs(docs, "doc_id", "text",
      maxDf = 4, threshold = 0.1).count() == 0L)
  }

  test("multiprobe pairs equal the brute-force Hamming<=1 cross join") {
    val docs = fixture
    val got = Dedup.simhashNearDup(docs, "doc_id", "text")
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet

    val fp = Dedup.simhash16(docs, "doc_id", "text")
    val a = fp.select(col("doc_id").as("id_a"), col("simhash").as("h_a"))
    val b = fp.select(col("doc_id").as("id_b"), col("simhash").as("h_b"))
    val expected = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 1)
      .as[(Long, Long, Long)].collect().toSet

    assert(got == expected)
    // the fixture must actually exercise the operator: at least the
    // exact-copy pair (1,2) at distance 0 has to be present
    assert(got.exists { case (x, y, h) => x == 1L && y == 2L && h == 0L })
  }

  test("each pair is emitted exactly once (one colliding probe key)") {
    val rows = Dedup.simhashNearDup(fixture, "doc_id", "text")
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(rows == 0L)
  }

  test("textDupClusters (identity collapse) equals the naive pairs->CC plan") {
    val near1 = "the quick brown fox jumps over the lazy dog tonight"
    val near2 = "the quick brown fox jumps over the lazy dog today ok"
    val clique = "identical copies of this exact document text appear many times"
    val bridge = "identical copies of this exact document text appear many here"
    val docs = (Seq(
      (1L, near1), (2L, near2), // near-dup pair, not identical
      (30L, clique), (31L, clique), (32L, clique), (33L, clique),
      (34L, clique), // 5-clique of bit-identical texts
      (40L, bridge), // near-dups the clique through shared shingles
      (50L, "completely different text about mountains and rivers flowing"),
      // identical SHORT texts (< 3 tokens -> zero shingles): the
      // direct plan can never band them, so the collapse must not
      // invent a cluster for them either
      (60L, "hi there"), (61L, "hi there"),
      (70L, "")) // empty
      ).toDF("doc_id", "text")
    val naive = Dedup.connectedComponents(
        Dedup.minhashLsh(docs, "doc_id", "text")
          .select(col("id_a"), col("id_b")))
      .as[(Long, Long)].collect().toSet
    val collapsed = Dedup.textDupClusters(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(collapsed == naive,
      s"collapse diverged:\n naive=$naive\n collapsed=$collapsed")
    // sanity on the fixture itself: the clique IS clustered, the
    // shingle-less identical pair is NOT
    assert(naive.exists(_._1 == 30L) && naive.exists(_._1 == 34L))
    assert(!collapsed.exists(r => r._1 == 60L || r._1 == 61L || r._1 == 70L))
    // and the clique members all share one cluster label
    val lbl = collapsed.filter(r => r._1 >= 30L && r._1 <= 34L).map(_._2)
    assert(lbl.size == 1)
  }

  test("distributed CC loop: non-convergence throws loudly, never truncates") {
    // r14 VERDICT #7: the maxIter guard at Dedup's distributed loop is
    // the wrong-results firewall (silent truncation = one component
    // reported as several clusters), but no spec drove a chain past it.
    // Below the driver-solve gates connectedComponents always takes the
    // union-find path (which cannot fail to converge), so the guard is
    // pinned on ccLoop directly with a path graph: diameter 100 needs
    // ~log2(100) ≈ 7 pointer-jump rounds — 3 must throw, 10 must land
    // one component identical to the driver path's answer.
    val n = 100
    val pairs = (0 until n).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(eager = true)
    val labels0 = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).withColumn("old", col("id"))
      .localCheckpoint(eager = true)
    val ex = intercept[IllegalStateException] {
      Dedup.ccLoop(edges, labels0, n + 1L, maxIter = 3).collect()
    }
    assert(ex.getMessage.contains("did not converge") &&
      ex.getMessage.contains("raise maxIter"))
    val got = Dedup.ccLoop(edges, labels0, n + 1L, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n + 1 && got.values.toSet == Set(0L))
    val fast = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == fast)
  }
}
