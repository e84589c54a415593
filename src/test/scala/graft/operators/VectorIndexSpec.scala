package graft.operators

import graft.{Tables, TestSpark}
import graft.gdl.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persistent IVF+PQ index: search from storage must equal the
  * computed composed plan, and incremental refresh must equal a full
  * rebuild — the contracts that make it an index, not a cache. */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus: DataFrame =
    Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))

  private def coarse: DataFrame =
    Tables.load(spark, TestSpark.sfDir, "embeddings")
      .filter(col("vec_id") < 8L)
      .select(col("vec_id").as("cid"), col("embedding"))

  private def freshIndex() = {
    val root = java.nio.file.Files.createTempDirectory("vecidx").toString
    new VectorIndex(new TableStore(spark, root), "ann",
      m = 4, subDim = 16, codebookK = 4, trainIters = 1)
  }

  private def asSet(df: DataFrame) =
    df.select("query_id", "vec_id", "cell", "adc_q", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4))).toSet

  test("search from the stored index equals the computed composed plan") {
    val idx = freshIndex()
    idx.build(corpus, coarse)
    val q = corpus.filter(col("id") < 5L)
    val stored = idx.search(q, nprobe = 2, k = 5)
    val computed = Pq.ivfPqTopK(q, corpus, coarse,
      Pq.train(corpus, 4, 16, 4, 1), nprobe = 2, m = 4, subDim = 16, k = 5)
    assert(asSet(stored) == asSet(computed))
  }

  test("incremental refresh equals a full rebuild over the grown corpus") {
    // build on the first half, refresh with the second; quantizers are
    // frozen at build time, so rebuild must use the SAME training corpus
    val half = corpus.filter(col("id") % 2 === 0)
    val rest = corpus.filter(col("id") % 2 =!= 0)
    val q = corpus.filter(col("id") < 5L)

    val grown = freshIndex()
    grown.build(half, coarse)
    grown.refresh(rest)

    val cbHalf = Pq.train(half, 4, 16, 4, 1)
    // rebuild = same frozen quantizers, full corpus encoded at once
    val all = corpus
    val expected = {
      val assignment = Similarity.ivfAssign(all, coarse)
        .select(col("id").as("vec_id"), col("cid").as("cell"))
      val codes = Pq.encode(all, cbHalf, 4, 16).withColumnRenamed("id", "vec_id")
      (assignment, codes)
    }
    val got = grown.search(q, nprobe = 2, k = 5)
    // independent expectation: score the expected assignment/codes inline
    val lut = Pq.lut(q, cbHalf, 4, 16)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("adc_q").desc, col("vec_id"))
    val probes = {
      import graft.functions.VectorFunctions.{dot, norm}
      val c = coarse.select(col("cid").as("cell"),
        col("embedding").as("cent_emb"), norm(col("embedding")).as("cent_norm"))
      val qq = q.select(col("id").as("query_id"),
        col("embedding").as("q_emb"), norm(col("embedding")).as("q_norm"))
      val pw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("cent_sim").desc, col("cell"))
      qq.crossJoin(broadcast(c))
        .select(col("query_id"), col("cell"),
          (dot(col("q_emb"), col("cent_emb")) / (col("q_norm") * col("cent_norm")))
            .as("cent_sim"))
        .withColumn("rn", row_number().over(pw))
        .filter(col("rn") <= 2)
        .select(col("query_id"), col("cell"))
    }
    val want = expected._1.join(broadcast(probes), Seq("cell"))
      .join(expected._2, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "m", "cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"), col("cell"))
      .agg(sum(col("qd")).as("adc_q"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
    assert(asSet(got) ==
      want.select("query_id", "vec_id", "cell", "adc_q", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                             r.getLong(3), r.getLong(4))).toSet)
  }

  test("streamed embedding feed grows the index to equal one-shot indexing") {
    val idx = freshIndex()
    val half = corpus.filter(col("id") % 2 === 0)
    val rest = corpus.filter(col("id") % 2 =!= 0)
    idx.build(half, coarse)

    val dir = java.nio.file.Files.createTempDirectory("vecidx-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vecidx-ckpt").toString
    rest.filter(col("id") % 4 === 1).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(rest.schema).parquet(dir)
    val q = idx.refreshStream(stream)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      rest.filter(col("id") % 4 === 3).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    val oneShot = freshIndex()
    oneShot.build(half, coarse)
    oneShot.refresh(rest)
    val queries = corpus.filter(col("id") < 5L)
    assert(asSet(idx.search(queries, nprobe = 2, k = 5)) ==
           asSet(oneShot.search(queries, nprobe = 2, k = 5)))
  }

  test("an at-least-once replayed batch does not corrupt ADC scores") {
    val idx = freshIndex()
    val half = corpus.filter(col("id") % 2 === 0)
    val rest = corpus.filter(col("id") % 2 =!= 0)
    idx.build(half, coarse)
    val queries = corpus.filter(col("id") < 5L)
    idx.refresh(rest)
    val clean = asSet(idx.search(queries, nprobe = 2, k = 5))
    idx.refresh(rest) // duplicate append ≙ foreachBatch replay
    assert(asSet(idx.search(queries, nprobe = 2, k = 5)) == clean)
  }

  test("refresh before build fails loudly") {
    val idx = freshIndex()
    intercept[IllegalStateException](idx.refresh(corpus))
  }

  test("a re-ingested id with a CHANGED embedding cannot corrupt scores") {
    val idx = freshIndex()
    val half = corpus.filter(col("id") % 2 === 0)
    val rest = corpus.filter(col("id") % 2 =!= 0)
    idx.build(half, coarse)
    idx.refresh(rest)
    val queries = corpus.filter(col("id") < 5L)
    val clean = asSet(idx.search(queries, nprobe = 2, k = 5))
    // same ids, different vectors (e.g. a corrected embedding feed):
    // refresh must DROP them — re-encoding under frozen quantizers
    // would leave two code rows with different cids that both join the
    // ADC sum. The index answer stays byte-identical.
    val changed = rest.select(col("id"),
      reverse(col("embedding")).as("embedding"))
    idx.refresh(changed)
    assert(asSet(idx.search(queries, nprobe = 2, k = 5)) == clean)
  }

  test("mixed-generation codes table (pre-layout epoch + refresh) loses no vectors") {
    // an index built BEFORE the inverted-list layout stored codes
    // without the `cell` column; a refresh with the current code then
    // appends a generation WITH it. unionByName null-fills the old
    // rows, and a `cell IN (probed)` scan predicate would silently
    // drop every pre-layout vector from search (ADVICE r6) — pruning
    // must disable itself unless EVERY generation carries the column.
    val root = java.nio.file.Files.createTempDirectory("vecidx-mixed").toString
    val store = new TableStore(spark, root)
    val idx = new VectorIndex(store, "ann",
      m = 4, subDim = 16, codebookK = 4, trainIters = 1)
    val half = corpus.filter(col("id") % 2 === 0)
    val rest = corpus.filter(col("id") % 2 =!= 0)
    idx.build(half, coarse)
    // strip `cell` from the built epoch's codes = the pre-layout shape
    store.overwrite("ann_e0_codes",
      store.read("ann_e0_codes").get.drop("cell")
        .localCheckpoint(eager = true))
    idx.refresh(rest) // appends a generation WITH cell → mixed table
    val oneShot = freshIndex()
    oneShot.build(half, coarse)
    oneShot.refresh(rest)
    val q = corpus.filter(col("id") < 5L)
    assert(asSet(idx.search(q, nprobe = 2, k = 5)) ==
           asSet(oneShot.search(q, nprobe = 2, k = 5)))
  }

  test("a crash between refresh's two appends heals on replay") {
    val root = java.nio.file.Files.createTempDirectory("vecidx-crash").toString
    val store = new TableStore(spark, root)
    val idx = new VectorIndex(store, "ann",
      m = 4, subDim = 16, codebookK = 4, trainIters = 1)
    val half = corpus.filter(col("id") % 2 === 0)
    val rest = corpus.filter(col("id") % 2 =!= 0)
    idx.build(half, coarse)
    // simulate refresh crashing AFTER the assign append, BEFORE codes:
    // the batch has assignment rows but no code rows (epoch 0 tables —
    // the first build's)
    store.append("ann_e0_assign", Similarity.ivfAssign(rest, coarse)
      .select(col("id").as("vec_id"), col("cid").as("cell")))
    // the at-least-once replay must re-ingest the batch (an anti-join
    // on assign would drop it and lose the codes forever)
    idx.refresh(rest)
    val oneShot = freshIndex()
    oneShot.build(half, coarse)
    oneShot.refresh(rest)
    val q = corpus.filter(col("id") < 5L)
    assert(asSet(idx.search(q, nprobe = 2, k = 5)) ==
           asSet(oneShot.search(q, nprobe = 2, k = 5)))
  }

  test("a crash mid-REBUILD leaves the OLD epoch serving, consistently") {
    // the epoch-pointer contract: a rebuild writes the NEXT epoch's
    // tables and flips the pointer last, so a crash mid-rebuild changes
    // NOTHING for readers — no invalidation window, no mixed generations
    val root = java.nio.file.Files.createTempDirectory("vecidx-rebuild").toString
    val store = new TableStore(spark, root)
    val idx = new VectorIndex(store, "ann",
      m = 4, subDim = 16, codebookK = 4, trainIters = 1)
    idx.build(corpus, coarse)
    val q = corpus.filter(col("id") < 5L)
    val before = asSet(idx.search(q, nprobe = 2, k = 5))
    assert(before.nonEmpty)
    // simulate a rebuild (epoch 1) crashing after ONE data table, the
    // pointer never flipped — searches keep serving epoch 0 untouched
    store.overwrite("ann_e1_coarse", coarse.limit(4)
      .select(col("cid"), col("embedding")))
    assert(asSet(idx.search(q, nprobe = 2, k = 5)) == before)
    idx.refresh(corpus) // refresh also still lands in the live epoch
    assert(asSet(idx.search(q, nprobe = 2, k = 5)) == before)
    // a completed rebuild (epoch 1, overwriting the partial tables)
    // atomically switches readers
    idx.build(corpus, coarse.limit(4)
      .select(col("cid"), col("embedding")))
    val after = asSet(idx.search(q, nprobe = 2, k = 5))
    assert(after.nonEmpty && after != before)
  }

  test("a search resolved BEFORE a rebuild completes never sees mixed generations") {
    // the race VectorIndex.scala documented as open pre-epoch: resolve
    // a search plan, complete a rebuild (different quantizers), THEN
    // evaluate the old plan — it must equal the pure pre-rebuild
    // answer (old epoch intact), never a mix of new coarse + old codes
    val root = java.nio.file.Files.createTempDirectory("vecidx-race").toString
    val store = new TableStore(spark, root)
    val idx = new VectorIndex(store, "ann",
      m = 4, subDim = 16, codebookK = 4, trainIters = 1)
    idx.build(corpus, coarse)
    val q = corpus.filter(col("id") < 5L)
    val expectedOld = asSet(idx.search(q, nprobe = 2, k = 5))
    val inFlight = idx.search(q, nprobe = 2, k = 5) // resolved, unevaluated
    idx.build(corpus, coarse.limit(4)
      .select(col("cid"), col("embedding")))       // rebuild completes
    assert(asSet(inFlight) == expectedOld,
      "in-flight search must keep its resolved epoch")
    val fresh = asSet(idx.search(q, nprobe = 2, k = 5))
    assert(fresh.nonEmpty && fresh != expectedOld,
      "a search resolved after the flip serves the new epoch")
  }

  test("vacuumEpochs reclaims superseded epochs; the live one survives") {
    val root = java.nio.file.Files.createTempDirectory("vecidx-vac").toString
    val store = new TableStore(spark, root)
    val idx = new VectorIndex(store, "ann",
      m = 4, subDim = 16, codebookK = 4, trainIters = 1)
    idx.build(corpus, coarse)
    idx.build(corpus, coarse.limit(4).select(col("cid"), col("embedding")))
    idx.vacuumEpochs()
    assert(store.read("ann_e0_codes").exists(_.isEmpty), "old epoch emptied")
    val q = corpus.filter(col("id") < 5L)
    assert(idx.search(q, nprobe = 2, k = 5).count() > 0)
  }

  test("probed-cell search opens only the probed cells' files") {
    val root = java.nio.file.Files.createTempDirectory("vecidx-prune").toString
    val store = new TableStore(spark, root)
    val idx = new VectorIndex(store, "ann",
      m = 4, subDim = 16, codebookK = 4, trainIters = 1)
    idx.build(corpus, coarse)
    // one cell's worth of the inverted-list layout: the clustered
    // write + per-file cell stats must turn a single-cell probe into
    // a strict subset of each table's files
    val oneCell = col("cell") === lit(0L)
    for (table <- Seq("ann_e0_assign", "ann_e0_codes")) {
      val (read, total) = store.scanFileCounts(table, oneCell)
      assert(total > 1, s"$table should span multiple files, got $total")
      assert(read < total,
        s"$table: single-cell probe read $read of $total files — no pruning")
    }
    // and the pruned read is still the exact filter semantics
    val viaScan = store.scan("ann_e0_assign", oneCell).get
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val viaRead = store.read("ann_e0_assign").get.filter(oneCell)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(viaScan == viaRead)
  }

  test("a partial build (missing completion marker) fails loudly, not garbage") {
    val root = java.nio.file.Files.createTempDirectory("vecidx-part").toString
    val store = new TableStore(spark, root)
    val idx = new VectorIndex(store, "ann",
      m = 4, subDim = 16, codebookK = 4, trainIters = 1)
    // simulate a FIRST build that crashed before the pointer commit:
    // stage the four epoch-0 tables by hand, no meta
    val cb = Pq.train(corpus, 4, 16, 4, 1)
    store.overwrite("ann_e0_coarse", coarse.select(col("cid"), col("embedding")))
    store.overwrite("ann_e0_codebooks", cb)
    store.overwrite("ann_e0_assign", Similarity.ivfAssign(corpus, coarse)
      .select(col("id").as("vec_id"), col("cid").as("cell")))
    store.overwrite("ann_e0_codes", Pq.encode(corpus, cb, 4, 16)
      .withColumnRenamed("id", "vec_id"))
    val q = corpus.filter(col("id") < 5L)
    intercept[IllegalStateException](idx.search(q, nprobe = 2, k = 5))
    intercept[IllegalStateException](idx.refresh(corpus))
    // a completed build over the same store heals it
    idx.build(corpus, coarse)
    assert(idx.search(q, nprobe = 2, k = 5).count() > 0)
  }

  test("change-feed polling indexes each appended batch exactly once") {
    val root = java.nio.file.Files.createTempDirectory("vecidx-feed").toString
    val store = new TableStore(spark, root)
    val idx = new VectorIndex(store, "ann",
      m = 4, subDim = 16, codebookK = 4, trainIters = 1)
    val half = corpus.filter(col("id") % 2 === 0)
    val rest = corpus.filter(col("id") % 2 =!= 0)
    idx.build(half, coarse)

    // the source table receives the remaining vectors in two appends
    val (restA, restB) = (rest.filter(col("id") % 4 === 1),
                          rest.filter(col("id") % 4 === 3))
    store.append("embeddings_src", restA)
    var ckpt = idx.refreshFrom("embeddings_src", -1L)
    store.append("embeddings_src", restB)
    ckpt = idx.refreshFrom("embeddings_src", ckpt)
    // an idle poll moves nothing and appends nothing
    val gensBefore = store.history("ann_e0_assign").size
    ckpt = idx.refreshFrom("embeddings_src", ckpt)
    assert(store.history("ann_e0_assign").size == gensBefore)

    // every corpus vector is indexed exactly once
    val assigned = store.read("ann_e0_assign").get
    assert(assigned.count() == corpus.count())
    assert(assigned.select("vec_id").distinct().count() == corpus.count())

    // and the grown index searches identically to one-shot indexing
    val oneShot = freshIndex()
    oneShot.build(half, coarse)
    oneShot.refresh(rest)
    val q = corpus.filter(col("id") < 5L)
    assert(asSet(idx.search(q, nprobe = 2, k = 5)) ==
           asSet(oneShot.search(q, nprobe = 2, k = 5)))
  }
}
