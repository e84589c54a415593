package graft.operators

import graft.gdl.TableStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted model artifacts over a [[TableStore]] — the
  * VectorIndex/NearDupIndex stored-state discipline applied to
  * TRAINED MODELS: a tokenizer's merge table and a langid classifier's
  * weights are corpus-derived artifacts that downstream queries must
  * be able to read back and reproduce EXACTLY, instead of re-training
  * per consumer (three from-scratch trainings of the same model was
  * the r12 langid-family bench floor).
  *
  * Reference scope note: the reference's catalog stores dataset
  * versions, not models (`backend/dataset_versions_model/`); this is
  * beyond-reference pipeline capability.
  *
  * Every artifact writes two tables:
  *  - `<name>_rows`: the model content, schema per kind;
  *  - `<name>_manifest`: one row — row count, shape parameters and a
  *    CONTENT FINGERPRINT (md5 over the canonically-ordered row
  *    strings). `load` re-derives the fingerprint from what it read
  *    and REFUSES a mismatch — a half-written or stale artifact
  *    surfaces as an error, never as silently-wrong downstream
  *    results. Models are driver-sized by design (a vocabulary /
  *    weight vector, not data), so the fingerprint pass is O(model).
  *
  * Exactness: BPE merges are strings+longs (exact in parquet);
  * langid weights are IEEE doubles, which parquet round-trips
  * bit-exactly — stored-model scoring is therefore hash-identical to
  * fresh-model scoring (q220/q221 pin both against the from-scratch
  * DuckDB oracles).
  */
object ModelStore {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  // ---- byte-level BPE (the q170 artifact) ---------------------------

  /** A loaded tokenizer: merges in round order, ready for
    * [[Bpe.applyByteMerges]]. */
  final case class BpeModel(merges: Seq[(String, String)],
                            nMerges: Long, fingerprint: String)

  private def bpeFingerprint(rows: Seq[(Long, String, String, Long)]): String =
    md5hex(rows.sortBy(_._1)
      .map { case (r, a, b, c) => s"$r|$a|$b|$c" }.mkString("\n"))

  /** Persist a trained merge table (the [[Bpe.trainByteMerges]]
    * output: round, sym_a, sym_b, pair_count) as `<name>_rows` +
    * `<name>_manifest`. */
  def exportBpe(store: TableStore, name: String, merges: DataFrame): Unit = {
    val spark = merges.sparkSession
    import spark.implicits._
    val rows = merges
      .select(col("round").cast("long"), col("sym_a"), col("sym_b"),
        col("pair_count").cast("long"))
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    store.overwrite(s"${name}_rows",
      rows.toDF("round", "sym_a", "sym_b", "pair_count"))
    store.overwrite(s"${name}_manifest",
      Seq((rows.size.toLong, bpeFingerprint(rows)))
        .toDF("n_merges", "fingerprint"))
  }

  /** Read a BPE artifact back, validating row count, round
    * contiguity (1..n) and the content fingerprint against the
    * manifest. */
  def loadBpe(store: TableStore, name: String,
              spark: SparkSession): BpeModel = {
    import spark.implicits._
    val m = store.read(s"${name}_manifest")
      .getOrElse(sys.error(s"bpe model $name: no manifest"))
      .select(col("n_merges"), col("fingerprint"))
      .as[(Long, String)].head()
    val rows = store.read(s"${name}_rows")
      .getOrElse(sys.error(s"bpe model $name: no rows table"))
      .select(col("round"), col("sym_a"), col("sym_b"), col("pair_count"))
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    require(rows.size.toLong == m._1,
      s"bpe model $name: ${rows.size} rows, manifest says ${m._1}")
    require(rows.map(_._1) == (1L to m._1),
      s"bpe model $name: rounds not contiguous 1..${m._1}")
    val fp = bpeFingerprint(rows)
    require(fp == m._2,
      s"bpe model $name: fingerprint $fp != manifest ${m._2}")
    BpeModel(rows.map(r => (r._2, r._3)), m._1, fp)
  }

  // ---- langid one-vs-rest weights (the q167 artifact) ---------------

  /** A loaded classifier: per-language weight vectors in the stored
    * language order, ready for [[LangId.scoreWith]]. */
  final case class LangIdModel(langs: Seq[String],
                               weights: Seq[Seq[Double]], buckets: Int,
                               fingerprint: String)

  /** Canonical row strings carry the EXACT bit pattern of each weight
    * (doubleToLongBits hex) — a fingerprint over decimal renderings
    * could collide across distinct doubles. */
  private def langIdFingerprint(
      rows: Seq[(String, Long, Double)]): String =
    md5hex(rows.sortBy(r => (r._1, r._2))
      .map { case (l, j, w) =>
        s"$l|$j|${java.lang.Double.doubleToLongBits(w).toHexString}" }
      .mkString("\n"))

  /** Persist trained one-vs-rest weights as `<name>_rows`
    * (lang, j, w) + `<name>_manifest` (language order kept as a
    * comma-joined list — scoring argmax tie-breaks depend on it). */
  def exportLangId(store: TableStore, name: String, langs: Seq[String],
                   weights: Seq[Seq[Double]], buckets: Int,
                   spark: SparkSession): Unit = {
    import spark.implicits._
    require(langs.size == weights.size)
    // the order round-trips through a comma-joined manifest string: a
    // comma inside a code (or an empty token) would silently corrupt
    // the list on load's split and mis-order argmax tie-breaks later
    require(langs.forall(l => l.nonEmpty && !l.contains(",")),
      s"langid export $name: language codes must be non-empty and " +
        s"comma-free, got ${langs.mkString("[", ", ", "]")}")
    val rows = langs.zip(weights).flatMap { case (l, w) =>
      w.zipWithIndex.map { case (wj, j) => (l, j.toLong, wj) } }
    store.overwrite(s"${name}_rows", rows.toDF("lang", "j", "w"))
    store.overwrite(s"${name}_manifest",
      Seq((langs.mkString(","), buckets.toLong, rows.size.toLong,
        langIdFingerprint(rows)))
        .toDF("langs", "buckets", "n_rows", "fingerprint"))
  }

  /** Read a langid artifact back, validating shape + fingerprint. */
  def loadLangId(store: TableStore, name: String,
                 spark: SparkSession): LangIdModel = {
    import spark.implicits._
    val m = store.read(s"${name}_manifest")
      .getOrElse(sys.error(s"langid model $name: no manifest"))
      .select(col("langs"), col("buckets"), col("n_rows"),
        col("fingerprint"))
      .as[(String, Long, Long, String)].head()
    val langs = m._1.split(",").toSeq
    val rows = store.read(s"${name}_rows")
      .getOrElse(sys.error(s"langid model $name: no rows table"))
      .select(col("lang"), col("j"), col("w"))
      .as[(String, Long, Double)].collect().toSeq
    require(rows.size.toLong == m._3,
      s"langid model $name: ${rows.size} rows, manifest says ${m._3}")
    val fp = langIdFingerprint(rows)
    require(fp == m._4,
      s"langid model $name: fingerprint $fp != manifest ${m._4}")
    val dim = (m._2 + 1).toInt
    val byLang = rows.groupBy(_._1)
    val weights = langs.map { l =>
      val ws = byLang.getOrElse(l,
        sys.error(s"langid model $name: language $l missing"))
        .sortBy(_._2)
      require(ws.map(_._2) == (0L until dim),
        s"langid model $name: $l weight indices not contiguous 0..${dim - 1}")
      ws.map(_._3)
    }
    LangIdModel(langs, weights, m._2.toInt, fp)
  }
}
