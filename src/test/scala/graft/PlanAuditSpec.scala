package graft

import org.scalatest.funsuite.AnyFunSuite

/** The audit tool must agree with a hand-read plan — it reports the
  * properties (pushdown, pruning, codegen, broadcast) the 100 TB design
  * arguments rest on, so a wrong audit is worse than none. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Audits run with AQE off: pre-execution adaptive plans carry no
    * codegen nodes yet, which is exactly the false negative the audit
    * is built to avoid. */
  private def audited(name: String): PlanReport = {
    val key = "spark.sql.adaptive.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try PlanAudit.audit(SparkEntry.queries(name)(spark, TestSpark.sfDir))
    finally spark.conf.set(key, old)
  }

  test("q01 prefix filter reaches the parquet reader, scan is column-pruned") {
    val r = audited("q01_scan_prefix")
    assert(r.scans.nonEmpty)
    val scan = r.scans.head
    assert(scan.source.contains("documents"))
    assert(scan.pushedFilters.contains("StringStartsWith(source,src1)"),
      s"prefix filter not pushed: ${scan.pushedFilters}")
    // 4 projected columns — not the whole documents schema
    assert(scan.readColumns.toSet == Set("doc_id", "source", "lang", "n_chars"))
  }

  test("q17 aggregation is whole-stage codegen'd over a pruned scan") {
    val r = audited("q17_revenue_agg")
    assert(r.wholeStageCodegen, "expected WholeStageCodegen spans in q17")
    val scan = r.scans.find(_.source.contains("lineitem")).get
    assert(scan.readColumns.toSet ==
      Set("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"),
      s"scan not pruned to the 5 needed columns: ${scan.readColumns}")
  }

  test("q41 dimension join broadcasts") {
    val r = audited("q41_topk_per_group")
    assert(r.broadcastJoins >= 1, "expected a broadcast hash join in q41")
  }

  test("audit descends through the AQE wrapper") {
    // with AQE ON the executed plan is AdaptiveSparkPlanExec; scans must
    // still be found underneath it
    val r = PlanAudit.audit(SparkEntry.queries("q01_scan_prefix")(spark, TestSpark.sfDir))
    assert(r.scans.exists(_.source.contains("documents")))
  }

  // Round-4 scale shapes, pinned so they can't silently rot: the
  // broadcast structure IS the 100 TB design argument for these ops.

  test("q63 decontamination broadcasts the benchmark side, prunes scans") {
    val r = audited("q63_decontaminate")
    assert(r.broadcastJoins >= 2,
      s"bench shingles + counts should broadcast: ${r.broadcastJoins}")
    assert(r.scans.forall(_.readColumns.toSet == Set("doc_id", "text")),
      s"scans must prune to (doc_id, text): ${r.scans.map(_.readColumns)}")
  }

  test("q64 bm25 broadcasts the one-row stats and stays codegen'd") {
    val r = audited("q64_bm25")
    assert(r.broadcastJoins >= 1, "corpus stats row should broadcast")
    assert(r.wholeStageCodegen)
  }

  test("q65 sq8 pushes the query-side filter and broadcasts scale + queries") {
    val r = audited("q65_sq8_topk")
    assert(r.broadcastJoins >= 2, "scale row and query set should broadcast")
    assert(r.scans.exists(_.pushedFilters.contains("LessThan(vec_id,5)")),
      s"query-side vec_id<5 not pushed: ${r.scans.map(_.pushedFilters)}")
  }

  test("q68 token-budget mix broadcasts the per-source budgets") {
    val r = audited("q68_token_budget_mix")
    assert(r.broadcastJoins >= 2,
      "totals row and per-source budget table should broadcast")
  }

  // Late round-4 shapes: the near-dup multiprobe and the PQ re-rank
  // live or die on "equi-join candidates, never a pair space".

  test("q75 simhash near-dup pairs via equi-join — zero cartesian products") {
    val r = audited("q75_simhash_neardup")
    assert(r.cartesianProducts == 0,
      "probe pairing must be an equi-join, not a cross product")
    assert(r.shuffleJoins + r.broadcastJoins >= 1,
      "expected the probe<->identity join in the plan")
    assert(r.scans.forall(_.readColumns.toSet == Set("doc_id", "text")),
      s"fingerprint scans must prune to (doc_id, text): ${r.scans.map(_.readColumns)}")
  }

  test("q76 PQ re-rank: page joins corpus by key, queries broadcast, no cartesian") {
    val r = audited("q76_pq_rerank")
    assert(r.cartesianProducts == 0,
      "re-rank must touch only the page rows via equi-join")
    assert(r.broadcastJoins >= 2,
      s"codebooks/LUT and the query side should broadcast: ${r.broadcastJoins}")
  }

  test("q78 held-out bigram-LM broadcasts the model tables over one corpus scan") {
    val r = audited("q78_bigram_heldout")
    assert(r.broadcastJoins >= 3,
      s"c12, c1 and vocab-size tables should broadcast: ${r.broadcastJoins}")
    assert(r.cartesianProducts == 0)
  }

  // Round-10 amortization pin: the stored-closure policy query must
  // READ the maintained label table, not re-derive it — its plan is
  // structurally smaller than the from-scratch twin's (no shingle
  // explode, no LSH band self-join, no CC iteration leaves), and the
  // label scan itself is visible by its column shape.

  // Round-11 pin: shared-literal-rule robots matching is a pure
  // projection — the r10 wildcardProbe shape paid 2^(maxSegs+1) probe
  // rows per deep path (q174 regressed 4.4× when the fixture gained
  // 12-segment paths). No join, no explode, no window may reappear.

  test("q174 robots wildcard match is a no-explode projection") {
    val r = audited("q174_robots_wildcards")
    assert(r.generates == 0,
      s"shared-rule match must not key-expand: ${r.generates} Generate nodes")
    assert(r.broadcastJoins + r.shuffleJoins + r.cartesianProducts == 0,
      "shared-rule match must not join at all")
    assert(r.wholeStageCodegen)
    assert(r.scans.forall(_.readColumns.toSet == Set("doc_id")),
      s"scan must prune to doc_id only: ${r.scans.map(_.readColumns)}")
  }

  test("q207 full-RFC robots match keeps the same no-explode shape") {
    val r = audited("q207_robots_rfc_wildcards")
    assert(r.generates == 0 &&
      r.broadcastJoins + r.shuffleJoins + r.cartesianProducts == 0,
      "per-rule LIKE evaluation must stay a pure projection")
    assert(r.wholeStageCodegen)
  }

  test("q196 reads the maintained cluster table; q183 re-derives it") {
    val stored = audited("q196_cluster_canonical_stored")
    assert(stored.cartesianProducts == 0)
    assert(stored.scans.exists(_.readColumns.toSet ==
      Set("doc_id", "cluster_id", "upd_seq")),
      s"expected the (doc_id, cluster_id, upd_seq) label scan: " +
        s"${stored.scans.map(_.readColumns)}")
    // exactly two file sources: the label table and the docs relation
    // (the from-scratch twin's LSH+CC subtree hides behind checkpoint
    // leaves at audit time, so a scan-count comparison against it is
    // meaningless — the shape pin is the label scan + nothing else)
    assert(stored.scans.size == 2,
      s"stored path must scan labels + docs only: " +
        s"${stored.scans.map(_.source)}")
  }

  test("q219 WARC read: partition-wise demux, no cartesian, pruned scan") {
    val r = audited("q219_warc_read")
    assert(r.cartesianProducts == 0)
    // the fixture + demux chain reads exactly (source, doc_id, text)
    assert(r.scans.exists(_.readColumns.toSet ==
      Set("source", "doc_id", "text")),
      s"documents scan not pruned: ${r.scans.map(_.readColumns)}")
  }

  test("q224 token-id export: piece table and vocab ride broadcasts") {
    val r = audited("q224_bpe_token_ids")
    assert(r.cartesianProducts == 0)
    assert(r.broadcastJoins >= 2,
      s"piece table + id map must broadcast: ${r.broadcastJoins}")
  }

  test("q227/q228 geometry joins: grid equi-joins, zero cartesians") {
    val pip = audited("q227_point_in_polygon")
    assert(pip.cartesianProducts == 0)
    assert(pip.scans.exists(_.source.contains("part")) &&
      pip.scans.exists(_.source.contains("customer")))
    // the part scan reads only the key the fixture derives from
    assert(pip.scans.filter(_.source.contains("part"))
      .forall(_.readColumns.toSet == Set("p_partkey")),
      s"part scan not pruned: ${pip.scans.map(s => s.source -> s.readColumns)}")
    val ix = audited("q228_polygon_intersects")
    assert(ix.cartesianProducts == 0)
  }

  test("q237-q240 ring geometry + zstd chains: grid equi-joins, pruned scans") {
    // the multi-ring and distance joins must keep q227's plan shape:
    // cell equi-join candidates, never a cartesian, fixture scans
    // pruned to the single key column they derive from
    for ((q, keyTbl, keyCol) <- Seq(
        ("q238_point_in_holed_polygon", "part", "p_partkey"),
        ("q239_point_near_polygon", "supplier", "s_suppkey"),
        ("q240_point_in_multipolygon", "supplier", "s_suppkey"))) {
      val r = audited(q)
      assert(r.cartesianProducts == 0, s"$q has a cartesian")
      assert(r.scans.filter(_.source.contains(keyTbl))
        .forall(_.readColumns.toSet == Set(keyCol)),
        s"$q $keyTbl scan not pruned: " +
          s"${r.scans.map(s => s.source -> s.readColumns)}")
    }
    // the zstd chain is map-only over the documents fixture columns
    val z = audited("q237_zstd_chain")
    assert(z.cartesianProducts == 0 && z.shuffleJoins == 0,
      s"q237 must be join-free map work: cart=${z.cartesianProducts} " +
        s"shuffleJoins=${z.shuffleJoins}")
  }

  test("q225 packed id tape: no cartesian, keeps q224's broadcasts") {
    val r = audited("q225_token_id_tape")
    assert(r.cartesianProducts == 0)
    // the encode chain's piece table + id map still broadcast; the
    // tape join (id stream x doc offsets) is a keyed shuffle join
    assert(r.broadcastJoins >= 2,
      s"piece table + id map must broadcast: ${r.broadcastJoins}")
  }
}
