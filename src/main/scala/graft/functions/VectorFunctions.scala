package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * All reductions are LEFT-TO-RIGHT sequential folds (`aggregate` over
  * `zip_with`/`transform`), which makes the IEEE double results
  * bit-identical to the DuckDB oracle's `list_reduce` folds — order of
  * accumulation is part of the contract, not an accident.
  *
  * Everything is builtin higher-order functions: codegen-friendly, no
  * UDF serialization, and the expressions push through whole-stage
  * codegen on the scan of a 100 TB embedding table.
  */
object VectorFunctions {

  /** Sequential-fold dot product, elements promoted float→double.
    * Backed by the native codegen'd [[DotProductFold]] expression —
    * value-identical to the `aggregate(zip_with(...))` fold but without
    * per-row lambda/array overhead. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(DotProductFold(expression(a), expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (‖a‖·‖b‖), same evaluation shape as the
    * oracle so results match bitwise. A zero-norm (all-zero) vector
    * yields 0.0 — under Spark's default ANSI mode the unguarded
    * division raises DIVIDE_BY_ZERO, so one null-imputed embedding row
    * would otherwise kill a whole similarity scan. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Deterministic pseudo-random hyperplane `j` for `dim` dimensions:
    * weight_i = (hex16(md5("<j>_<i>")) − 32768) / 32768 ∈ [−1, 1).
    * Reproducible in any engine with md5 — no RNG state to ship. The
    * weights are constants, so they're computed once driver-side and
    * shipped as an array literal instead of re-deriving dim×rows md5s
    * per scan (the values are identical either way). */
  def hyperplane(j: Int, dim: Int): Column =
    typedLit(hyperplaneWeights(j, dim))

  private[graft] def hyperplaneWeights(j: Int, dim: Int): Seq[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (1 to dim).map { i =>
      val hex = digest.digest(s"${j}_$i".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16).toDouble - 32768.0) / 32768.0
    }
  }

  /** All `nPlanes` hyperplane sign bits as ONE long — the native
    * codegen'd [[HyperplaneCode]] expression: a tight generated loop
    * over the constant plane matrix. Bit j equals
    * `dot(v, hyperplane(j, dim)) >= 0.0` exactly (same ascending fold),
    * so composed forms can be swapped for this without value drift.
    * One expression regardless of plane count: nPlanes inlined [[dot]]
    * literals grow generated code linearly (Janino OOMs near 64 in one
    * projection) and the higher-order-function fold interprets at
    * ~19 ms/row at 64×64 — this runs in microseconds. */
  def hyperplaneCode(v: Column, nPlanes: Int, dim: Int): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    val mat = (0 until nPlanes).map(j => hyperplaneWeights(j, dim).toArray).toArray
    column(HyperplaneCode(expression(v), mat))
  }

  /** Random-hyperplane LSH bucket id from `nPlanes` sign bits
    * (= [[hyperplaneCode]]; kept as the historical name). */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int): Column =
    hyperplaneCode(v, nPlanes, dim)

  /** OR-of-bands LSH keys: `bands` keys per vector, band l's key =
    * l·2^planesPerBand + its sign code over planes l·k..l·k+k−1 (bit t
    * = plane l·k+t) — globally unique per (band, code), so one
    * equi-join covers all bands at once. One [[hyperplaneCode]] eval
    * (shared by codegen subexpression elimination — the band
    * extraction is static shift-and-mask per band). */
  def bandKeys(v: Column, bands: Int, planesPerBand: Int, dim: Int): Column = {
    require(bands * planesPerBand <= 64,
      s"bands*planesPerBand must fit a long, got ${bands * planesPerBand}")
    val code = hyperplaneCode(v, bands * planesPerBand, dim)
    val mask = (1L << planesPerBand) - 1
    array((0 until bands).map { l =>
      shiftright(code, l * planesPerBand).bitwiseAND(lit(mask)) +
        lit(l.toLong * (1L << planesPerBand))
    }: _*)
  }
}
