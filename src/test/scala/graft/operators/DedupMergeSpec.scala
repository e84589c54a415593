package graft.operators

import graft.{Tables, TestSpark}
import graft.gdl.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental cluster maintenance: folding a batch of near-dup pairs
  * into stored labels must be value-equal to clustering the union pair
  * graph from scratch, while touching only the affected clusters — the
  * contract that makes per-batch dedup O(batch), not O(corpus). */
class DedupMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairsDf(ps: (Long, Long)*): DataFrame = {
    import spark.implicits._
    ps.toDF("id_a", "id_b")
  }

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id"), col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def ccSet(pairs: DataFrame): Set[(Long, Long)] =
    labelSet(Dedup.connectedComponents(pairs))

  test("merge equals from-scratch clustering across pair-batch shapes") {
    // stored graph: {1,2,3} (cluster 1), {10,11} (cluster 10), {20,21}
    val old = pairsDf(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L)
    val stored = Dedup.connectedComponents(old)
    // one batch exercising every shape at once: a bridge between two
    // stored clusters (3-10), a new node onto a stored cluster (21-22),
    // a fully disjoint new cluster (30-31), and a redundant pair inside
    // a stored cluster (1-3)
    val batch = pairsDf(3L -> 10L, 21L -> 22L, 30L -> 31L, 1L -> 3L)
    val merged = labelSet(Dedup.mergeClusters(stored, batch))
    assert(merged == ccSet(old.union(batch)))
    // spot-check the semantics, not just the equivalence: the bridge
    // collapses {1,2,3}+{10,11} under min id 1; 22 joins 20's cluster
    assert(merged.contains(10L -> 1L) && merged.contains(11L -> 1L))
    assert(merged.contains(22L -> 20L) && merged.contains(30L -> 30L))
  }

  test("delta covers exactly the affected slice") {
    val old = pairsDf(1L -> 2L, 10L -> 11L, 20L -> 21L)
    val stored = Dedup.connectedComponents(old)
    val delta = labelSet(
      Dedup.mergeClustersDelta(stored, pairsDf(2L -> 5L)))
    // cluster {1,2} is touched: every member relabeled (same labels —
    // min is still 1) plus the new node; {10,11} and {20,21} absent
    assert(delta == Set(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }

  test("sequential batch merges equal one-shot clustering") {
    val b1 = pairsDf(1L -> 2L, 5L -> 6L)
    val b2 = pairsDf(2L -> 3L, 8L -> 9L)
    val b3 = pairsDf(6L -> 8L, 3L -> 5L) // chains everything into one
    var labels = Dedup.connectedComponents(b1)
    labels = Dedup.mergeClusters(labels, b2)
    labels = Dedup.mergeClusters(labels, b3)
    assert(labelSet(labels) == ccSet(b1.union(b2).union(b3)))
    // the three chained batches collapse to a single cluster under 1
    assert(labelSet(labels).map(_._2) == Set(1L))
  }

  test("merging an already-absorbed batch changes nothing") {
    val old = pairsDf(1L -> 2L, 2L -> 3L)
    val stored = Dedup.connectedComponents(old)
    val again = Dedup.mergeClusters(stored, old)
    assert(labelSet(again) == labelSet(stored))
  }

  // ---- persistent index maintenance over real documents -------------

  private def docs: DataFrame =
    Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))

  test("index cluster table tracks the reported pair graph across ingests") {
    val root = java.nio.file.Files.createTempDirectory("dupclu").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    val seed = docs.filter(col("doc_id") >= 200L)
    val b1 = docs.filter(col("doc_id") >= 100L && col("doc_id") < 200L)
    val b2 = docs.filter(col("doc_id") < 100L)
    idx.build(seed, "doc_id", "text")
    idx.buildClusters(seed, "doc_id", "text")
    // accumulate the exact pair sets each ingest folds in, then check
    // the maintained table against clustering them all at once — the
    // strongest equivalence available (a scratch rebuild would verify
    // cross pairs exactly instead of by slot agreement)
    val p0 = Dedup.minhashLsh(seed, "doc_id", "text")
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val c1 = idx.query(b1, "doc_id", "text")
      .select(col("new_id").as("id_a"), col("corpus_id").as("id_b"))
      .localCheckpoint(true)
    val i1 = Dedup.minhashLsh(b1, "doc_id", "text")
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    idx.ingest(b1, "doc_id", "text")
    val c2 = idx.query(b2, "doc_id", "text")
      .select(col("new_id").as("id_a"), col("corpus_id").as("id_b"))
      .localCheckpoint(true)
    val i2 = Dedup.minhashLsh(b2, "doc_id", "text")
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    idx.ingest(b2, "doc_id", "text")
    val allPairs = p0.union(c1).union(i1).union(c2).union(i2)
    assert(labelSet(idx.clusters()) == ccSet(allPairs))
    assert(labelSet(idx.clusters()).nonEmpty)
  }

  test("replaying a cluster refresh is a last-wins no-op") {
    val root = java.nio.file.Files.createTempDirectory("dupclu-replay").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    val seed = docs.filter(col("doc_id") >= 100L)
    val b = docs.filter(col("doc_id") < 100L)
    idx.build(seed, "doc_id", "text")
    idx.buildClusters(seed, "doc_id", "text")
    // crash-retry shape: refreshClusters runs, the index append never
    // happens, the whole ingest replays from the top
    idx.refreshClusters(b, "doc_id", "text")
    val afterFirst = labelSet(idx.clusters())
    idx.ingest(b, "doc_id", "text")
    assert(labelSet(idx.clusters()) == afterFirst)
  }

  test("embedding cross pairs are the full pair graph restricted to the split") {
    val e = graft.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val batch = e.filter(col("id") < 200L)
    val corpus = e.filter(col("id") >= 200L)
    val across = Dedup.embeddingNearDupAcross(batch, corpus,
        threshold = 0.3, nPlanes = 2, dim = 64)
      .select(least(col("new_id"), col("corpus_id")).as("a"),
              greatest(col("new_id"), col("corpus_id")).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.embeddingNearDup(e, threshold = 0.3,
        nPlanes = 2, dim = 64)
      .filter((col("id_a") < 200L) =!= (col("id_b") < 200L))
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(across == full)
    assert(across.nonEmpty) // the split must actually cross the join
  }

  test("a FULLY replayed ingest contributes nothing") {
    val root = java.nio.file.Files.createTempDirectory("dupclu-full").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    val seed = docs.filter(col("doc_id") >= 100L)
    val b = docs.filter(col("doc_id") < 100L)
    idx.build(seed, "doc_id", "text")
    idx.buildClusters(seed, "doc_id", "text")
    idx.ingest(b, "doc_id", "text")
    val labels = labelSet(idx.clusters())
    val gens = store.history("dup_e0_clusters").size
    assert(gens > 0, "the cluster table must actually have history")
    // restart-before-checkpoint replay: the batch is already fully in
    // (clusters AND index). Re-deriving its pairs now would verify
    // batch-internal pairs by slot agreement instead of exact Jaccard —
    // the replayed ingest must instead drop the indexed ids and append
    // nothing at all
    idx.ingest(b, "doc_id", "text")
    assert(labelSet(idx.clusters()) == labels)
    assert(store.history("dup_e0_clusters").size == gens)
  }

  test("clusterOf point read equals the full resolution, opening few files") {
    val root = java.nio.file.Files.createTempDirectory("dupclu-point").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    val seed = docs.filter(col("doc_id") >= 200L)
    idx.build(seed, "doc_id", "text")
    idx.buildClusters(seed, "doc_id", "text")
    // two ingests → a seed generation plus delta appends whose doc ids
    // interleave with the seed's: the zone-map-useless shape
    idx.ingest(docs.filter(col("doc_id") >= 100L && col("doc_id") < 200L),
      "doc_id", "text")
    idx.ingest(docs.filter(col("doc_id") < 100L), "doc_id", "text")
    val all = labelSet(idx.clusters())
    assert(all.nonEmpty)
    val some = all.take(3).map(_._1).toSeq
    val got = idx.clusterOf(some)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == all.filter(p => some.contains(p._1)))
    // an id no ingest ever labeled: the Bloom sidecars must prove every
    // file absent — the probe touches zero data files
    val absent = -1L
    assert(idx.clusterOf(Seq(absent)).isEmpty)
    val (read, total) =
      store.scanFileCounts("dup_e0_clusters", col("doc_id") === lit(absent))
    assert(total > 0)
    assert(read == 0,
      s"absent-key probe read $read of $total files — sidecars not pruning")
  }

  test("clusterOf empty fallback mirrors a string-id index's schema") {
    // an index over STRING doc ids: the no-match path must return the
    // stored (string, string) schema, not a hardcoded (long, long) —
    // callers union the point read with the populated path (ADVICE r6)
    val root = java.nio.file.Files.createTempDirectory("dupclu-str").toString
    val store = new TableStore(spark, root)
    val idx = new NearDupIndex(store, "dup")
    val sdocs = docs.select(concat(lit("d-"), col("doc_id")).as("doc_id"),
      col("text"))
    idx.build(sdocs, "doc_id", "text")
    idx.buildClusters(sdocs, "doc_id", "text")
    val populated = idx.clusterOf(Seq("d-1"))
    val empty = idx.clusterOf(Seq.empty) // the fallback path
    assert(empty.isEmpty)
    assert(empty.schema.map(f => (f.name, f.dataType)) ==
           populated.schema.map(f => (f.name, f.dataType)))
    // unioning the two paths — the caller shape that used to break
    assert(populated.unionByName(empty).count() == populated.count())
  }

  test("streamed ingest equals one-shot ingest") {
    val root = java.nio.file.Files.createTempDirectory("dupclu-stream").toString
    val idx = new NearDupIndex(new TableStore(spark, root), "dup")
    val half = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 =!= 0)
    idx.build(half, "doc_id", "text")
    idx.buildClusters(half, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("dupclu-sdir").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dupclu-sckpt").toString
    rest.filter(col("doc_id") % 4 === 1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(rest.schema).parquet(dir)
    val q = idx.ingestStream(stream, "doc_id", "text")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      rest.filter(col("doc_id") % 4 === 3).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val oneShot = new NearDupIndex(new TableStore(spark,
      java.nio.file.Files.createTempDirectory("dupclu-1shot").toString), "dup")
    oneShot.build(half, "doc_id", "text")
    oneShot.buildClusters(half, "doc_id", "text")
    oneShot.ingest(rest.filter(col("doc_id") % 4 === 1), "doc_id", "text")
    oneShot.ingest(rest.filter(col("doc_id") % 4 === 3), "doc_id", "text")
    assert(labelSet(idx.clusters()) == labelSet(oneShot.clusters()))
    assert(labelSet(idx.clusters()).nonEmpty)
  }

  test("clusters before any buildClusters is empty, not an error") {
    val root = java.nio.file.Files.createTempDirectory("dupclu-empty").toString
    val idx = new NearDupIndex(new TableStore(spark, root), "dup")
    idx.build(docs.filter(col("doc_id") >= 100L), "doc_id", "text")
    assert(idx.clusters().isEmpty)
    // bootstrap path: the first refresh seeds clusters from batch pairs
    val delta = idx.refreshClusters(docs.filter(col("doc_id") < 100L),
      "doc_id", "text")
    assert(labelSet(idx.clusters()) == labelSet(delta))
  }
}
