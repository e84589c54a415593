package graft

import graft.operators.{Decontaminate, Dedup}
import graft.sinks.ShardedExport
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Capstone: the full training-data curation pipeline composed from the
  * engine's operators — quality filter → exact dedup → near-dup cluster
  * drop → benchmark decontamination → sharded export — with the
  * invariants a data team would assert at each stage, and determinism
  * across re-runs (the property that makes a 100 TB curation run
  * auditable and resumable).
  */
class TrainingPipelineE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs: DataFrame =
    Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))

  /** The composed pipeline; returns the curated corpus. */
  private def curate(in: DataFrame, bench: DataFrame): DataFrame = {
    // 1. quality floor: droppable junk never reaches the expensive stages
    val quality = in
      .withColumn("_n", size(split(col("text"), "\\s+")))
      .filter(col("_n") >= 10L).drop("_n")

    // 2. exact dedup: keep the canonical (min-id) copy per content hash
    val canon = Dedup.exact(quality, "doc_id", "text")
      .select(col("canonical_id").as("doc_id"))
    val exactKept = quality.join(canon, Seq("doc_id"), "left_semi")

    // 3. near-dup clusters: keep each cluster's min-id member
    val pairs = Dedup.minhashLsh(exactKept, "doc_id", "text",
      shingleN = 3, k = 8, bands = 2, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val clusters = Dedup.connectedComponents(pairs)
    val nearDrop = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    val nearKept = exactKept.join(nearDrop, Seq("doc_id"), "left_anti")

    // 4. decontamination: drop any train doc overlapping a benchmark doc
    val contaminated = Decontaminate.overlapPairs(nearKept, bench,
      "doc_id", "text", shingleN = 3, minOverlap = 0.8)
      .select(col("train_id").as("doc_id")).distinct()
    nearKept.join(contaminated, Seq("doc_id"), "left_anti")
  }

  test("curated corpus satisfies every stage invariant and exports losslessly") {
    // benchmark set = a few real docs (guaranteed overlap = themselves)
    val bench = docs.filter(col("doc_id") % 97L === 0L)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val curated = curate(docs, bench).localCheckpoint(true)

    // invariant: no exact duplicates survive
    val dupGroups = curated.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1L).count()
    assert(dupGroups == 0L, s"$dupGroups exact-dup groups survived")

    // invariant: re-running near-dup detection on the output finds nothing
    val residualPairs = Dedup.minhashLsh(curated, "doc_id", "text",
      shingleN = 3, k = 8, bands = 2, threshold = 0.5).count()
    assert(residualPairs == 0L, s"$residualPairs near-dup pairs survived")

    // invariant: nothing overlapping the benchmark set survives
    val residualContam = Decontaminate.overlapPairs(curated, bench,
      "doc_id", "text", shingleN = 3, minOverlap = 0.8).count()
    assert(residualContam == 0L, s"$residualContam contaminated docs survived")

    // the pipeline kept a real corpus, not an empty one
    val kept = curated.count()
    assert(kept > 100L, s"only $kept docs survived — pipeline too aggressive")

    // 5. sharded export: lossless, and every shard directory exists
    val out = java.nio.file.Files.createTempDirectory("curated").toString
    ShardedExport.write(curated, "doc_id", nShards = 8, out)
    val back = spark.read.parquet(out) // shard= resolves as a partition column
    assert(back.count() == kept)
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
      curated.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("the pipeline is deterministic across re-runs") {
    val bench = docs.filter(col("doc_id") % 97L === 0L)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val a = curate(docs, bench).select("doc_id").as[Long].collect().sorted.toSeq
    val b = curate(docs, bench).select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("incremental batch arrival: index-driven dedup accepts only novel docs") {
    import graft.gdl.TableStore
    import graft.operators.NearDupIndex
    // day 0: the ingested corpus is indexed once
    val corpus = docs.filter(col("doc_id") % 2 === 0L)
    val batch = docs.filter(col("doc_id") % 2 =!= 0L)
    val idx = new NearDupIndex(new TableStore(spark,
      java.nio.file.Files.createTempDirectory("pipe-idx").toString), "crawl")
    idx.build(corpus, "doc_id", "text")

    // day 1: a crawl batch arrives — near-dups of indexed docs drop
    // WITHOUT re-reading any corpus text
    val dupIds = idx.query(batch, "doc_id", "text")
      .select(col("new_id").as("doc_id")).distinct()
    assert(dupIds.count() > 0L, "fixture split must produce cross dups")
    val accepted = batch.join(dupIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    // invariant: accepted docs are genuinely novel — the computed
    // (text-reading) cross check agrees with the index's verdict
    assert(Dedup.minhashLshAcross(accepted, corpus, "doc_id", "text")
      .count() == 0L)

    // day 1 close: the index absorbs the accepted docs, and the grown
    // index answers exactly like one built from scratch on the union
    idx.refresh(accepted, "doc_id", "text")
    val scratch = new NearDupIndex(new TableStore(spark,
      java.nio.file.Files.createTempDirectory("pipe-idx2").toString), "crawl")
    scratch.build(corpus.unionByName(accepted.select(col("doc_id"),
      col("source"), col("text"))), "doc_id", "text")
    val probe = docs.filter(col("doc_id") % 7L === 0L)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    def pairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(idx.query(probe, "doc_id", "text")) ==
           pairs(scratch.query(probe, "doc_id", "text")))
  }

  test("incremental arrival with quarantine and live cluster maintenance") {
    import graft.gdl.TableStore
    import graft.operators.NearDupIndex
    import graft.sinks.DeadLetter
    val store = new TableStore(spark,
      java.nio.file.Files.createTempDirectory("pipe-clu").toString)
    val idx = new NearDupIndex(store, "crawl")
    val corpus = docs.filter(col("doc_id") % 2 === 0L)
    idx.build(corpus, "doc_id", "text")
    idx.buildClusters(corpus, "doc_id", "text")

    // a crawl batch arrives polluted: a lost download (null text) and an
    // unkeyable row (null id) ride along with real documents
    val batch = docs.filter(col("doc_id") % 2 =!= 0L)
    val polluted = batch.unionByName(Seq[
        (java.lang.Long, String, String)](
        (9000001L, "crawl", null), (null, "crawl", "orphan payload"))
      .toDF("doc_id", "source", "text"))
    val rules = Seq("null_id" -> col("doc_id").isNull,
                    "null_text" -> col("text").isNull)

    // quarantine feeds the ingest — nothing vanishes, nothing poisons
    val clean = DeadLetter.quarantine(store, "crawl_dlq", "ingest",
      polluted, rules).localCheckpoint(true)
    assert(clean.count() == batch.count())
    val dlq = store.read("crawl_dlq").get
    assert(dlq.count() == 2L)
    assert(dlq.select("reason").collect().map(_.getString(0)).toSet ==
      Set("null_id", "null_text"))

    idx.ingest(clean.select(col("doc_id"), col("text")), "doc_id", "text")

    // cluster-table invariants a curation run relies on:
    val clusters = idx.clusters().localCheckpoint(true)
    assert(clusters.count() > 0L)
    // every label is the min id of its cluster (canonical member)
    assert(clusters.groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("mn"))
      .filter(col("mn") =!= col("cluster_id")).count() == 0L)
    // labels only cover ingested ids (never a quarantined row)
    val ingested = corpus.select(col("doc_id"))
      .unionByName(clean.select(col("doc_id")))
    assert(clusters.join(ingested, Seq("doc_id"), "left_anti").count() == 0L)

    // dedup-by-cluster: drop non-canonical members. Same-side near-dups
    // (corpus-corpus, batch-batch) CANNOT survive — both were exact-
    // verified when their side was clustered. A surviving CROSS pair is
    // possible by design: the incremental path verifies cross pairs by
    // slot agreement against stored signatures (never re-reading corpus
    // text), and the estimator can under-score a true pair — the recall
    // trade the estimate-tolerance spec in NearDupIndexSpec measures.
    val canonical = ingested.join(
      clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id")), Seq("doc_id"), "left_anti")
    val all = corpus.unionByName(
      clean.select(col("doc_id"), col("source"), col("text")))
    val curatedDocs = all.join(canonical, Seq("doc_id"), "left_semi")
    val sameSideSurvivors = Dedup.minhashLsh(curatedDocs, "doc_id", "text")
      .filter((col("id_a") % 2) === (col("id_b") % 2))
    assert(sameSideSurvivors.count() == 0L,
      "same-side near-dup pairs survived cluster-canonical dedup")
  }
}
