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

  /** Random-hyperplane LSH bucket id from `nPlanes` sign bits. Small
    * counts inline one codegen'd [[dot]] per plane (the hot oracle
    * paths are 2-8 planes); larger counts switch to the loop-shaped
    * [[hyperplaneSigns]] — bit-identical values — because inlined dot
    * literals grow generated code linearly and ~64 of them in one
    * projection OOM Janino. */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int): Column =
    if (nPlanes <= 16)
      (0 until nPlanes).map { j =>
        when(dot(v, hyperplane(j, dim)) >= 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    else {
      val signs = hyperplaneSigns(v, nPlanes, dim)
      val pow2 = typedLit((0 until nPlanes).map(j => 1L << j))
      aggregate(sequence(lit(0), lit(nPlanes - 1)), lit(0L),
        (acc, j) => acc + when(element_at(signs, j + 1),
          element_at(pow2, j + 1)).otherwise(lit(0L)))
    }

  /** All `nPlanes` hyperplane dot-product signs in ONE pass: the plane
    * matrix rides as a single array<array<double>> literal and the
    * fold runs as loop-shaped higher-order-function code, so generated
    * code size is O(1) in the plane count — inlining 64 separate
    * [[dot]] expressions in one projection blows Janino's heap during
    * compilation (observed as a spurious "Not enough memory to build
    * and broadcast"). The per-plane fold is the same left-to-right
    * aggregate-over-zip_with shape as [[dot]], so each sign is
    * bit-identical to `dot(v, hyperplane(j, dim)) >= 0.0`. */
  def hyperplaneSigns(v: Column, nPlanes: Int, dim: Int): Column = {
    val planes = typedLit((0 until nPlanes).map(j => hyperplaneWeights(j, dim)))
    transform(planes, p =>
      aggregate(zip_with(v, p, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x) >= 0.0)
  }

  /** OR-of-bands LSH keys: `bands` keys per vector, band l's key =
    * l·2^planesPerBand + its sign code over planes l·k..l·k+k−1 (bit t
    * = plane l·k+t) — globally unique per (band, code), so one
    * equi-join covers all bands at once. Loop-shaped like
    * [[hyperplaneSigns]] for the same codegen-size reason. */
  def bandKeys(v: Column, bands: Int, planesPerBand: Int, dim: Int): Column = {
    val signs = hyperplaneSigns(v, bands * planesPerBand, dim)
    val pow2 = typedLit((0 until planesPerBand).map(t => 1L << t))
    transform(sequence(lit(0), lit(bands - 1)), l =>
      aggregate(sequence(lit(0), lit(planesPerBand - 1)), lit(0L),
        (acc, t) => acc + when(
          element_at(signs, l * planesPerBand + t + 1),
          element_at(pow2, t + 1)).otherwise(lit(0L)))
        + l.cast("long") * lit(1L << planesPerBand))
  }
}
