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

  /** Sequential-fold dot product, elements promoted float→double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot / (‖a‖·‖b‖), same evaluation shape as the
    * oracle so results match bitwise. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane `j` for `dim` dimensions:
    * weight_i = (hex16(md5("<j>_<i>")) − 32768) / 32768 ∈ [−1, 1).
    * Reproducible in any engine with md5 — no RNG state to ship. */
  def hyperplane(j: Int, dim: Int): Column =
    transform(sequence(lit(1), lit(dim)),
      i => (conv(substring(md5(concat(lit(s"${j}_"), i.cast("string"))), 1, 4), 16, 10)
              .cast("double") - 32768.0) / 32768.0)

  /** Random-hyperplane LSH bucket id from `nPlanes` sign bits. */
  def hyperplaneBucket(v: Column, nPlanes: Int, dim: Int): Column =
    (0 until nPlanes).map { j =>
      when(dot(v, hyperplane(j, dim)) >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
