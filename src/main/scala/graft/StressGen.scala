package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 stress-data generator (VERDICT r4 #7): scales the driver's sf0.1
  * tables 10× into an output dir, preserving referential structure so
  * every query runs unchanged.
  *
  * Design — 10 id-shifted copies, NOT row duplication:
  *  - fact/dim keys shift per copy (orderkey, custkey, partkey,
  *    suppkey, event_id, user_id, doc_id, vec_id), so joins fan out
  *    exactly as a 10×-bigger dataset would: 10× rows per join key
  *    range, same per-key cardinality;
  *  - region/nation stay fixed (real dims don't grow with corpus size),
  *    which ALSO stresses the skew path: 10× rows per nation key;
  *  - document text is word-salted per copy (every word suffixed _i),
  *    so each copy keeps the original's INTERNAL near-dup structure but
  *    shares no shingles across copies — near-dup pair count grows 10×
  *    like a real corpus, not 100× like naive duplication would;
  *  - EXCEPT a shared fraction (doc_id % 7 == 0, ~14%): those documents
  *    keep the ORIGINAL text in every copy — identical bytes, identical
  *    dedup keys (minhash / simhash / fingerprint), so dup closures SPAN
  *    copies and grow superlinearly with corpus size the way mirrored /
  *    syndicated pages do in real crawl data (VERDICT r11 #4 — the
  *    all-salted shape left the dedup family's sf1 gate artificially
  *    flat because no closure ever crossed a copy boundary);
  *  - embeddings get a copy-dependent ±offset on alternating dims so
  *    copies are not colinear (cosine structure preserved within a
  *    copy, decorrelated across copies) — except the same shared
  *    fraction (vec_id % 7 == 0), which stays bitwise identical across
  *    copies so embedding-cosine / SemDeDup closures grow organically
  *    in step with the text side.
  *
  * Usage: runMain graft.StressGen [srcDir] [outDir] [copies]
  * (defaults /root/testdata/sf0.1 → /tmp/sf1 at 10 copies; pass a
  * copies count for slope measurements, e.g. 40 → /tmp/sf4)
  */
object StressGen {
  val Copies = 10

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.drop(1).headOption.getOrElse("/tmp/sf1")
    val nCopies = args.drop(2).headOption.map(_.toInt).getOrElse(Copies)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stressgen")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // a 10× corpus has ~10× FILES, not 10×-fatter files: the broadcast
    // cross-join expansion keeps the SOURCE partition count, which left
    // sf1 documents as 2-3 fat files — scans (and every explode-heavy
    // partial aggregation above them) then run 2-3 tasks no matter how
    // many cores the cluster has. Repartitioning on write restores the
    // file-count/parallelism shape real ingest produces.
    def write(t: String, df: DataFrame): Unit = {
      df.repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"$t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    // one row per copy index; cross-joined to replicate a table N×
    // (broadcast: the N-row side is the build side, map-only expansion)
    val copies = spark.range(nCopies).toDF("copy_i")
    def replicate(df: DataFrame): DataFrame = df.crossJoin(broadcast(copies))

    // key-space strides: beyond any sf0.1 max key, so shifted copies
    // never collide (keys stay dense within each copy's window)
    val C = 1000000L // customer/supplier/part/doc/vec stride
    val O = 10000000L // orderkey/event stride
    def shift(c: String, stride: Long) =
      (col(c) + col("copy_i") * stride).as(c)

    write("region", read("region"))
    write("nation", read("nation"))

    write("customer", replicate(read("customer")).select(
      shift("c_custkey", C), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")))

    write("supplier", replicate(read("supplier")).select(
      shift("s_suppkey", C), col("s_name"), col("s_nationkey"),
      col("s_acctbal")))

    write("part", replicate(read("part")).select(
      shift("p_partkey", C), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice")))

    write("orders", replicate(read("orders")).select(
      shift("o_orderkey", O), shift("o_custkey", C), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")))

    write("lineitem", replicate(read("lineitem")).select(
      shift("l_orderkey", O), shift("l_partkey", C), shift("l_suppkey", C),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")))

    write("events", replicate(read("events")).select(
      shift("event_id", O), col("ts"), shift("user_id", C),
      col("event_type"), col("value"), col("props")))

    // word-salt per copy: copy 0 is the original corpus byte-for-byte;
    // copies 1..N-1 suffix every whitespace token with _i — EXCEPT the
    // shared fraction (doc_id % 7 == 0), which keeps the original text
    // in every copy so dup closures span copies (object doc, r11 #4)
    val sharedDoc = pmod(col("doc_id"), lit(7L)) === 0L
    write("documents", replicate(read("documents")).select(
      shift("doc_id", C),
      when(col("copy_i") === 0 || sharedDoc, col("text")).otherwise(
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit("_"), col("copy_i"))))).as("text"),
      col("lang"), col("source"),
      // n_chars tracks the salted text, as the generator would have
      when(col("copy_i") === 0 || sharedDoc, col("n_chars")).otherwise(
        length(concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit("_"), col("copy_i")))))).as("n_chars")))

    // decorrelate copies: ±(0.1 * copy) on alternating dims — except
    // the shared fraction (vec_id % 7 == 0), bitwise identical across
    // copies so embedding-space dup closures grow with the text side
    write("embeddings", replicate(read("embeddings")).select(
      shift("vec_id", C),
      when(pmod(col("vec_id"), lit(7L)) === 0L, col("embedding")).otherwise(
        transform(col("embedding"), (x, j) =>
          (x + col("copy_i").cast("float") * lit(0.1f) *
            when(j % 2 === 0, lit(1.0f)).otherwise(lit(-1.0f))).cast("float")))
        .as("embedding"),
      col("label")))

    spark.stop()
  }
}
