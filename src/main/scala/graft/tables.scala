package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided TPC-H-ish testdata
  * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per table.
  *
  * All engine queries take `(SparkSession, sfDir)` and resolve tables
  * through here so the same query text runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has varied across driver testdata drops: parquet
    * TIMESTAMP(NANOS) (Spark's vectorized reader rejects it — read as
    * raw nanos and truncate to microseconds, exactly what DuckDB's
    * `CAST(ts AS TIMESTAMP)` does; integer `DIV` keeps full precision
    * where a double division would lose bits above 2^53) and plain
    * TIMESTAMP(MICROS) (reads natively as TIMESTAMP_NTZ). Branch on the
    * schema actually read; the sessions all run UTC, so the NTZ→LTZ
    * cast is value-identity and oracle comparisons stay exact. */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Register all tables as temp views (used by tests and Bench). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  // ---- edge-case corpora ---------------------------------------------
  //
  // Real web corpora are full of rows the synthetic generator never
  // emits: empty documents, 1–2-token documents, whitespace-only text,
  // zero-norm / negative / bit-identical embeddings. Three rounds of
  // advice findings lived exactly in those blind spots, and one fix
  // (the short-doc sequence(1,0) guard) initially missed four call
  // sites BECAUSE no oracle row exercised it. These loaders union a
  // fixed, engine-mirrored set of edge rows into the driver corpus so
  // every edge guard is pinned by a green oracle hash instead of a
  // comment. IDs live in the 9,000,000+ range — the generator's are
  // dense from 0 — so no collision at any sf.

  /** (doc_id, text) for the edge documents; lang/source/n_chars are
    * derived identically on both engines. */
  private[graft] val edgeDocTexts: Seq[(Long, String)] = Seq(
    9000001L -> "",                                        // empty
    9000002L -> "solitary",                                // 1 token (< any n-gram n)
    9000003L -> "two tokens",                              // 2 tokens
    9000004L -> " \t  ",                                   // whitespace-only → 0 tokens
    9000005L -> "the same tri gram the same tri gram",     // short, self-repetition
    9000006L -> "alpha beta gamma delta",                  // bit-identical pair →
    9000007L -> "alpha beta gamma delta")                  //   cross-doc dup 3-grams

  /** `documents` plus the edge rows (union is map-only; the edge side
    * is 7 literal rows — free at any scale). */
  def documentsWithEdges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val edges = edgeDocTexts.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("und").as("lang"),
        lit("edge").as("source"), length(col("text")).cast("long").as("n_chars"))
    load(spark, sfDir, "documents").unionByName(edges)
  }

  /** The DuckDB mirror of [[documentsWithEdges]] — splice as a CTE:
    * `WITH docs_e AS ($documentsWithEdgesSql), ...` and read
    * `FROM docs_e` wherever the Spark side reads the edge corpus. */
  val documentsWithEdgesSql: String = {
    val vals = edgeDocTexts.map { case (id, t) =>
      val lit = t.replace("'", "''")
      s"(CAST($id AS BIGINT), '$lit', 'und', 'edge', CAST(${t.length} AS BIGINT))"
    }.mkString(",\n             ")
    s"""SELECT * FROM documents UNION ALL
        SELECT * FROM (VALUES
             $vals) ed(doc_id, text, lang, source, n_chars)"""
  }

  /** (vec_id, embedding, label) edge rows: a bit-identical zero-norm
    * GROUP (the grp_zero path), an all-negative vector, and a
    * bit-identical mixed-sign pair (identity collapse). All component
    * values are exactly representable in float32 AND in DuckDB's
    * decimal literals, so both engines hold identical bits. */
  private[graft] val edgeEmbRows: Seq[(Long, Seq[Float], Int)] = {
    val dim = 64
    val zero = Seq.fill(dim)(0.0f)
    val neg = Seq.fill(dim)(-0.5f)
    val mixed = Seq.tabulate(dim)(i => if (i % 2 == 0) 0.25f else -0.5f)
    Seq((9000001L, zero, 999), (9000002L, zero, 999),
        (9000003L, neg, 999),
        (9000004L, mixed, 999), (9000005L, mixed, 999))
  }

  /** `embeddings` plus the edge rows. */
  def embeddingsWithEdges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val edges = edgeEmbRows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label").cast("int"))
    load(spark, sfDir, "embeddings").unionByName(edges)
  }

  /** A 12-row literal vector corpus whose quantized mean is EXACTLY
    * zero in every dimension (every value is a multiple of 0.25 — so
    * floor(x·1e9) is exact — and rows come in ±v pairs), which is the
    * only way to drive centered-zero vectors through the centering
    * embedding-dedup family: after `centerEmbeddings` subtracts the
    * all-zero mean, rows 1–2 REMAIN bit-zero and exercise the
    * grp_zero exclusion (a zero-norm identity group must not be
    * emitted as a cluster under threshold > 0, because its forced
    * sim-0.0 pairs are not edges), rows 5–6/7–8 are bit-identical
    * mixed-sign groups (identity collapse), and 9–12 carry a genuine
    * near-dup pair in both sign orientations. All dots against the
    * md5-derived hyperplanes are exact dyadic rationals, so both
    * engines compute identical bits, sims, and clusters. */
  private[graft] val meanZeroVecRows: Seq[(Long, Seq[Float])] = {
    val dim = 64
    val zero = Seq.fill(dim)(0.0f)
    val a = Seq.tabulate(dim)(i => if (i % 2 == 0) 0.25f else -0.25f)
    val b = Seq.tabulate(dim)(i => if (i % 2 == 0) 0.25f else -0.5f)
    val c = Seq.fill(dim)(0.5f)
    val c2 = Seq.tabulate(dim)(i => if (i == 0) -0.5f else 0.5f)
    def neg(v: Seq[Float]) = v.map(x => 0.0f - x)
    Seq(1L -> zero, 2L -> zero,
        3L -> a, 4L -> neg(a),
        5L -> b, 6L -> b, 7L -> neg(b), 8L -> neg(b),
        9L -> c, 10L -> c2, 11L -> neg(c), 12L -> neg(c2))
  }

  /** The mean-zero corpus as (id, embedding) — edge-case input for the
    * centered dedup family. */
  def meanZeroVecs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    meanZeroVecRows.toDF("id", "embedding")
      .select(col("id"), col("embedding").cast("array<float>"))
  }

  /** The DuckDB mirror of [[meanZeroVecs]] — a VALUES list named
    * `(id, embedding)`. */
  val meanZeroVecsSql: String = {
    val vals = meanZeroVecRows.map { case (id, v) =>
      val arr = v.map(_.toString).mkString("[", ", ", "]")
      s"(CAST($id AS BIGINT), CAST($arr AS REAL[]))"
    }.mkString(",\n             ")
    s"""SELECT * FROM (VALUES
             $vals) mz(id, embedding)"""
  }

  /** The DuckDB mirror of [[embeddingsWithEdges]] — splice as
    * `WITH emb_e AS ($embeddingsWithEdgesSql), ...`. */
  val embeddingsWithEdgesSql: String = {
    val vals = edgeEmbRows.map { case (id, v, lbl) =>
      val arr = v.map(f => f.toString).mkString("[", ", ", "]")
      s"(CAST($id AS BIGINT), CAST($arr AS REAL[]), CAST($lbl AS INTEGER))"
    }.mkString(",\n             ")
    s"""SELECT * FROM embeddings UNION ALL
        SELECT * FROM (VALUES
             $vals) ee(vec_id, embedding, label)"""
  }
}
