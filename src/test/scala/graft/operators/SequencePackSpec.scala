package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concatenate-and-chunk packing contract: hand-checked tape layout,
  * the zero-token rule, boundary crossings, and the algebraic
  * invariants every packed stream must satisfy (full sequences are
  * exactly full, segments tile the tape with no gap or overlap). */
class SequencePackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pack(rows: Seq[(String, Long, Long)], L: Long) =
    SequencePack.chunk(rows.toDF("src", "id", "n"), "src", "id", "n", L)

  test("hand-checked layout: spans, crossing, zero-token skip") {
    // tape s: |5|3|10| over L=4 → doc 1 [0,5) crosses seq 0→1,
    // doc 2 [5,8) inside seq 1, doc 4 [8,18) spans seqs 2,3,4
    val got = pack(Seq(("s", 1L, 5L), ("s", 2L, 3L), ("s", 3L, 0L),
      ("s", 4L, 10L)), 4L)
      .orderBy("id", "seq_idx")
      .select("id", "seq_idx", "seg_begin", "seg_end", "tok_begin", "tok_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 4L, 0L, 5L), (1L, 1L, 0L, 1L, 0L, 5L),
      (2L, 1L, 1L, 4L, 5L, 8L),
      (4L, 2L, 0L, 4L, 8L, 18L), (4L, 3L, 0L, 4L, 8L, 18L),
      (4L, 4L, 0L, 2L, 8L, 18L)))
  }

  test("streams are independent tapes") {
    val got = pack(Seq(("a", 1L, 3L), ("b", 1L, 3L)), 4L).collect()
    assert(got.length == 2 && got.forall(r => // both at seq 0, [0, 3)
      r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 3L))
  }

  test("property: full sequences exactly full, segments tile the tape") {
    val rnd = new scala.util.Random(1312)
    for (trial <- 1 to 4) {
      val L = 8L + rnd.nextInt(56)
      val rows = (1L to (20L + rnd.nextInt(60))).map(i =>
        ("s" + (i % 3), i, rnd.nextInt(3 * L.toInt + 1).toLong))
      val seg = pack(rows, L)
      // per (stream, seq): sum of segment widths == L for every seq
      // except possibly the stream's last
      val bySeq = seg.groupBy(col("src"), col("seq_idx"))
        .agg(sum(col("seg_end") - col("seg_begin")).as("w"),
          max(col("seq_idx")).as("q"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val lastSeq = bySeq.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      for ((s, q, w) <- bySeq)
        if (q < lastSeq(s)) assert(w == L, s"trial $trial: $s/$q width $w")
        else assert(w >= 1 && w <= L, s"trial $trial last: $s/$q width $w")
      // every doc's segments cover exactly its token count
      val perDoc = seg.groupBy(col("src"), col("id"))
        .agg(sum(col("seg_end") - col("seg_begin")).as("w"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val expected = rows.filter(_._3 > 0).map(t => (t._1, t._2) -> t._3).toMap
      assert(perDoc == expected, s"trial $trial")
      // stats agree with first principles
      val st = SequencePack.stats(seg, "src", "id", L)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      for ((s, (nd, ns, nq, tt)) <- st) {
        val docs = rows.filter(r => r._1 == s && r._3 > 0)
        assert(nd == docs.length && tt == docs.map(_._3).sum)
        assert(nq == (tt + L - 1) / L, s"$s seqs")
        assert(ns >= nd) // crossings are never negative
      }
    }
  }

  test("appendChunk ≡ from-scratch on every split point, fresh streams at 0") {
    val rnd = new scala.util.Random(907)
    val rows = (1L to 60L).map(i =>
      ("s" + (i % 4), i, rnd.nextInt(25).toLong))
    val L = 16L
    val full = pack(rows, L).collect().map(_.toSeq).toSet
    for (split <- Seq(0L, 17L, 30L, 59L)) {
      val stored = rows.filter(_._2 <= split)
      val batch = rows.filter(_._2 > split)
      val offsets = SequencePack.tapeOffsets(pack(stored, L), "src")
      val inc = SequencePack.appendChunk(
          batch.toDF("src", "id", "n"), offsets, "src", "id", "n", L)
        .collect().map(_.toSeq).toSet
      val expected = full.filter(_(1).asInstanceOf[Long] > split)
      assert(inc == expected, s"split=$split")
    }
  }

  test("shard manifest partitions the sequence range") {
    val seg = pack((1L to 40L).map(i => ("s", i, 10L)), 16L)
    val m = SequencePack.shardManifest(seg, "src", "id", 4L)
      .orderBy("shard_idx").collect()
    // 400 tokens / L=16 → 25 seqs → shards of 4 → 7 shards (last short)
    assert(m.length == 7)
    assert(m.map(_.getLong(2)).sum == 25L) // n_seqs partitions 25
    assert(m.map(_.getLong(5)).sum == 400L) // token-exact
    val bounds = m.map(r => (r.getLong(1), r.getLong(6), r.getLong(7)))
    for ((shard, first, last) <- bounds)
      assert(first >= shard * 4 && last < (shard + 1) * 4)
  }

  test("packIdTape: hand-checked cells, pad tail, independent streams") {
    // stream a: doc 1 ids [10,11,12], doc 3 ids [20,21] → tape
    // 10 11 12 20 21 over L=4 → seq0 = 10 11 12 20, seq1 = 21 P P P;
    // stream b: doc 2 ids [30..33] → exactly one full seq, NO pads;
    // doc 4 maps to stream a but has no ids → occupies no tape
    val ids = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (3L, 1L, 20L), (3L, 2L, 21L),
      (2L, 1L, 30L), (2L, 2L, 31L), (2L, 3L, 32L), (2L, 4L, 33L))
      .toDF("doc", "pos", "tid")
    val streams = Seq((1L, "a"), (3L, "a"), (2L, "b"), (4L, "a"))
      .toDF("doc", "st")
    val tape = SequencePack.packIdTape(ids, "doc", "pos", "tid",
        streams, "st", seqLen = 4L, padId = -9L)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._2, r._3)).toSeq
    assert(tape == Seq(
      ("a", 0L, 0L, 10L, Some(1L)), ("a", 0L, 1L, 11L, Some(1L)),
      ("a", 0L, 2L, 12L, Some(1L)), ("a", 0L, 3L, 20L, Some(3L)),
      ("a", 1L, 0L, 21L, Some(3L)), ("a", 1L, 1L, -9L, None),
      ("a", 1L, 2L, -9L, None), ("a", 1L, 3L, -9L, None),
      ("b", 0L, 0L, 30L, Some(2L)), ("b", 0L, 1L, 31L, Some(2L)),
      ("b", 0L, 2L, 32L, Some(2L)), ("b", 0L, 3L, 33L, Some(2L))))
  }

  test("packIdTape with an EOS separator: one cell per doc, doc-attributed") {
    // doc 1 ids [10,11,12], doc 3 ids [20,21], EOS=99, L=4:
    // tape = 10 11 12 E | 20 21 E P  (EOS carries its doc, pad NULL)
    val ids = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (3L, 1L, 20L), (3L, 2L, 21L)).toDF("doc", "pos", "tid")
    val streams = Seq((1L, "a"), (3L, "a")).toDF("doc", "st")
    val tape = SequencePack.packIdTape(ids, "doc", "pos", "tid",
        streams, "st", seqLen = 4L, padId = -1L, eosId = Some(99L))
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .sortBy(r => (r._2, r._3)).toSeq
    assert(tape == Seq(
      ("a", 0L, 0L, 10L, Some(1L)), ("a", 0L, 1L, 11L, Some(1L)),
      ("a", 0L, 2L, 12L, Some(1L)), ("a", 0L, 3L, 99L, Some(1L)),
      ("a", 1L, 0L, 20L, Some(3L)), ("a", 1L, 1L, 21L, Some(3L)),
      ("a", 1L, 2L, 99L, Some(3L)), ("a", 1L, 3L, -1L, None)))
  }

  test("idShardManifest pins tape content, not just counts") {
    val ids = (1L to 24L).map(i => (i % 3 + 1, (i - 1) / 3 + 1, i * 7))
      .toDF("doc", "pos", "tid")
    val streams = Seq((1L, "s"), (2L, "s"), (3L, "s")).toDF("doc", "st")
    val tape = SequencePack.packIdTape(ids, "doc", "pos", "tid",
      streams, "st", seqLen = 4L, padId = -1L)
    val m = SequencePack.idShardManifest(tape, "st", seqsPerShard = 2L)
      .orderBy("shard_idx").collect()
    // 24 ids over L=4 → 6 full seqs → 3 shards of 2, zero pads
    assert(m.length == 3)
    assert(m.map(_.getLong(2)).sum == 6L) // n_seqs
    assert(m.map(_.getLong(3)).sum == 24L) // n_cells
    assert(m.forall(_.getLong(4) == 0L)) // n_pad
    // a swapped pair of SAME-length docs passes the counts but must
    // break the checksum: exchange two token ids on the tape
    val swapped = tape.withColumn("token_id",
      when(col("token_id") === 7L, lit(14L))
        .when(col("token_id") === 14L, lit(7L))
        .otherwise(col("token_id")))
    val m2 = SequencePack.idShardManifest(swapped, "st", 2L)
      .orderBy("shard_idx").collect()
    assert(m2.map(_.getLong(2)).sum == 6L && m2.map(_.getLong(3)).sum == 24L)
    assert(m.map(_.getLong(8)).toSeq != m2.map(_.getLong(8)).toSeq)
  }
}
