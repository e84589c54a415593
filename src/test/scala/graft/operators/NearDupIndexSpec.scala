package graft.operators

import graft.{Tables, TestSpark}
import graft.gdl.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persistent MinHash-LSH document index: querying stored
  * signatures must equal the directly-computed cross-corpus pairs, and
  * refresh must equal a full rebuild — the contracts that make it an
  * index over the corpus rather than a cache of one query. */
class NearDupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs: DataFrame =
    Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))

  private def batch: DataFrame = docs.filter(col("doc_id") < 100L)
  private def corpus: DataFrame = docs.filter(col("doc_id") >= 100L)

  private def freshIndex() = {
    val root = java.nio.file.Files.createTempDirectory("dupidx").toString
    new NearDupIndex(new TableStore(spark, root), "dup")
  }

  private def asSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("query from the stored index equals the computed cross-corpus pairs") {
    val idx = freshIndex()
    idx.build(corpus, "doc_id", "text")
    val stored = idx.query(batch, "doc_id", "text")
    val computed = Dedup.minhashLshAcross(batch, corpus, "doc_id", "text")
    val pairs = asSet(stored)
    assert(pairs == asSet(computed))
    assert(pairs.nonEmpty) // the split must actually exercise the join
  }

  test("incremental refresh equals a full rebuild over the grown corpus") {
    val half = corpus.filter(col("doc_id") % 2 === 0)
    val rest = corpus.filter(col("doc_id") % 2 =!= 0)
    val grown = freshIndex()
    grown.build(half, "doc_id", "text")
    grown.refresh(rest, "doc_id", "text")
    val rebuilt = freshIndex()
    rebuilt.build(corpus, "doc_id", "text")
    assert(asSet(grown.query(batch, "doc_id", "text")) ==
           asSet(rebuilt.query(batch, "doc_id", "text")))
  }

  test("a re-ingested id with CHANGED text cannot corrupt the index") {
    val idx = freshIndex()
    idx.build(corpus, "doc_id", "text")
    val clean = asSet(idx.query(batch, "doc_id", "text"))
    // same ids, different text — refresh must DROP them: a second
    // signature row per id would generate ambiguous candidates
    val changed = corpus.select(col("doc_id"), reverse(col("text")).as("text"))
    idx.refresh(changed, "doc_id", "text")
    assert(asSet(idx.query(batch, "doc_id", "text")) == clean)
  }

  test("a partial build (missing completion marker) fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("dupidx-part").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    // simulate a FIRST build crash after the data tables, before the
    // pointer commit
    val sig = Dedup.minhashSignatures(
      Dedup.shingleRows(corpus, "doc_id", "text", 3), 8)
    store.overwrite("dup_e0_sig", sig)
    store.overwrite("dup_e0_bands", Dedup.lshBands(sig, 2, 4))
    intercept[IllegalStateException](idx.query(batch, "doc_id", "text"))
    intercept[IllegalStateException](idx.refresh(corpus, "doc_id", "text"))
    // a completed build over the same store heals it
    idx.build(corpus, "doc_id", "text")
    assert(idx.query(batch, "doc_id", "text").count() > 0)
  }

  test("change-feed polling indexes each appended batch exactly once") {
    val root = java.nio.file.Files.createTempDirectory("dupidx-feed").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    val half = corpus.filter(col("doc_id") % 2 === 0)
    val rest = corpus.filter(col("doc_id") % 2 =!= 0)
    idx.build(half, "doc_id", "text")

    store.append("docs_src", rest.filter(col("doc_id") % 4 === 1))
    var ckpt = idx.refreshFrom("docs_src", -1L, "doc_id", "text")
    store.append("docs_src", rest.filter(col("doc_id") % 4 === 3))
    ckpt = idx.refreshFrom("docs_src", ckpt, "doc_id", "text")
    // an idle poll moves nothing and appends nothing
    val gensBefore = store.history("dup_e0_sig").size
    ckpt = idx.refreshFrom("docs_src", ckpt, "doc_id", "text")
    assert(store.history("dup_e0_sig").size == gensBefore)

    // every corpus doc with ≥1 shingle is signed exactly once
    val sig = store.read("dup_e0_sig").get
    assert(sig.select("doc_id").distinct().count() == sig.count())
    val rebuilt = freshIndex()
    rebuilt.build(corpus, "doc_id", "text")
    assert(asSet(idx.query(batch, "doc_id", "text")) ==
           asSet(rebuilt.query(batch, "doc_id", "text")))
  }

  test("streamed document feed grows the index to equal one-shot indexing") {
    val idx = freshIndex()
    val half = corpus.filter(col("doc_id") % 2 === 0)
    val rest = corpus.filter(col("doc_id") % 2 =!= 0)
    idx.build(half, "doc_id", "text")

    val dir = java.nio.file.Files.createTempDirectory("dupidx-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dupidx-ckpt").toString
    rest.filter(col("doc_id") % 4 === 1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(rest.schema).parquet(dir)
    val q = idx.refreshStream(stream, "doc_id", "text")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      rest.filter(col("doc_id") % 4 === 3).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val oneShot = freshIndex()
    oneShot.build(half, "doc_id", "text")
    oneShot.refresh(rest, "doc_id", "text")
    assert(asSet(idx.query(batch, "doc_id", "text")) ==
           asSet(oneShot.query(batch, "doc_id", "text")))
  }

  test("a crash between refresh's two appends heals on replay") {
    val root = java.nio.file.Files.createTempDirectory("dupidx-crash").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    val half = corpus.filter(col("doc_id") % 2 === 0)
    val rest = corpus.filter(col("doc_id") % 2 =!= 0)
    idx.build(half, "doc_id", "text")
    // simulate refresh crashing AFTER the sig append, BEFORE bands:
    // the batch is signed but generates no candidates
    store.append("dup_e0_sig", Dedup.minhashSignatures(
      Dedup.shingleRows(rest, "doc_id", "text", 3), 8))
    // the replay must re-ingest (an anti-join on sig would drop the
    // batch and leave its docs permanently without band keys)
    idx.refresh(rest, "doc_id", "text")
    val oneShot = freshIndex()
    oneShot.build(half, "doc_id", "text")
    oneShot.refresh(rest, "doc_id", "text")
    assert(asSet(idx.query(batch, "doc_id", "text")) ==
           asSet(oneShot.query(batch, "doc_id", "text")))
  }

  test("a crash mid-REBUILD leaves the old signing serving; a completed one flips") {
    val root = java.nio.file.Files.createTempDirectory("dupidx-rebuild").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    idx.build(corpus, "doc_id", "text")
    val before = asSet(idx.query(batch, "doc_id", "text"))
    assert(before.nonEmpty)
    // simulate a rebuild (epoch 1) crashing after ONE table — pointer
    // never flipped, so queries keep serving epoch 0, never a mix of
    // the new partial signing with the old bands
    store.overwrite("dup_e1_sig", Dedup.minhashSignatures(
      Dedup.shingleRows(corpus.limit(10), "doc_id", "text", 3), 8))
    assert(asSet(idx.query(batch, "doc_id", "text")) == before)
    // a completed rebuild over a SMALLER corpus atomically switches
    idx.build(corpus.filter(col("doc_id") >= 300L), "doc_id", "text")
    val after = asSet(idx.query(batch, "doc_id", "text"))
    assert(after.subsetOf(before), "same hash family → same shared pairs")
    assert(after.forall(_._2 >= 300L),
      "post-flip queries see only the rebuilt (smaller) corpus")
    assert(after != before || before.forall(_._2 >= 300L))
  }

  test("vacuumEpochs reclaims superseded epochs; the live one survives") {
    val root = java.nio.file.Files.createTempDirectory("dupidx-vac").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    idx.build(corpus, "doc_id", "text")
    idx.buildClusters(corpus, "doc_id", "text")
    idx.build(corpus.filter(col("doc_id") >= 300L), "doc_id", "text")
    idx.vacuumEpochs()
    assert(store.read("dup_e0_sig").exists(_.isEmpty), "old epoch emptied")
    assert(store.read("dup_e0_clusters").exists(_.isEmpty))
    assert(idx.query(batch, "doc_id", "text").count() > 0)
  }

  test("a batch doc with an already-indexed id is not its own near-dup") {
    val idx = freshIndex()
    idx.build(corpus, "doc_id", "text")
    // replaying indexed docs as the query batch: every self-pair must
    // be suppressed (est would be 1.0), cross pairs still surface
    val self = idx.query(corpus.limit(50), "doc_id", "text")
    assert(self.filter(col("new_id") === col("corpus_id")).count() == 0L)
  }

  test("slot-agreement estimate tracks exact Jaccard on cross candidates") {
    // the estimate is an unbiased k=8 estimator of Jaccard (per-slot
    // match probability = J), so assert a generous tolerance rather
    // than threshold agreement — a pair near the 0.5 line can land on
    // either side of the cut without being a bug, but a mismatched
    // hash family or mixed signing would blow way past ±0.45
    val allCand = Dedup.minhashLshAcross(batch, corpus, "doc_id", "text",
      minEst = 0.0)
    val estPairs = allCand.select(col("new_id").as("id_a"),
      col("corpus_id").as("id_b"), col("est_jaccard"))
    assert(estPairs.count() > 0L)
    val sh = Dedup.shingleRows(docs, "doc_id", "text", 3)
    val exact = Dedup.verifyJaccard(
      estPairs.select(col("id_a"), col("id_b")), sh, threshold = 0.0)
    val joined = estPairs.join(exact, Seq("id_a", "id_b")).collect()
    assert(joined.length > 0)
    joined.foreach { r =>
      val (est, j) = (r.getDouble(2), r.getDouble(3))
      assert(math.abs(est - j) <= 0.45,
        s"pair (${r.getLong(0)},${r.getLong(1)}): est=$est exact=$j")
    }
  }
}
