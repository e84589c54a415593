package graft.gdl.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file Bloom sketches for the TableStore's point-lookup sidecar.
  *
  * Zone maps answer RANGE probes; on an append-mostly table whose key
  * values interleave across files (ULIDs, doc ids, URLs), every file's
  * [min,max] spans the whole key space and a zone map prunes nothing
  * for `id = X`. The Bloom sidecar holds one fixed-width bitset per
  * (file, column); a point probe opens only the files whose sketch
  * might contain the value — the same membership-sidecar idea as
  * Parquet's column-level bloom filters, kept outside the files so the
  * store controls width and build cost.
  *
  * Hashing contract (build and probe MUST agree): the value's CANONICAL
  * STRING form (`cast(col as string)`) is hashed — identity for
  * strings, `Long.toString` for integrals; fractional types are
  * EXCLUDED (their string form is representation-, not value-,
  * canonical). Double hashing: two murmur3 seeds, bit `i` at
  * `(h1 + i·h2) mod bits` — the standard Kirsch-Mitzenmacher
  * construction, k probes from two hash evaluations.
  */
object BloomSidecar {
  /** Seeds are arbitrary but FROZEN: stored sidecars outlive code. */
  private val Seed1 = 0x5f3759df
  private val Seed2 = 0x9e3779b1

  /** `h2` forced odd so successive probe positions cycle through the
    * bit space even when `bits` is a power of two. */
  def setBits(bs: java.util.BitSet, value: String, bits: Int, hashes: Int): Unit = {
    val bytes = value.getBytes("UTF-8")
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed1)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed2) | 1
    var i = 0
    while (i < hashes) {
      bs.set(java.lang.Math.floorMod(h1 + i * h2, bits))
      i += 1
    }
  }

  /** False positives possible (must read), false negatives not (skip is
    * exact). A truncated bitset (trailing zero words dropped by
    * `toByteArray`) reads absent bits as 0 — correct. */
  def mightContain(bs: java.util.BitSet, value: String, bits: Int, hashes: Int): Boolean = {
    val bytes = value.getBytes("UTF-8")
    val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed1)
    val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed2) | 1
    var i = 0
    while (i < hashes) {
      if (!bs.get(java.lang.Math.floorMod(h1 + i * h2, bits))) return false
      i += 1
    }
    true
  }

  /** Column types whose cast-to-string is value-canonical — the only
    * ones a sidecar may be built on or probed for. */
  def eligibleType(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
}

/** Builds one Bloom bitset per group (the TableStore groups by
  * `input_file_name()`): update sets k bits from the row's value, merge
  * ORs bitsets, eval emits `BitSet.toByteArray`.
  *
  * A TypedImperativeAggregate (object buffer, ObjectHashAggregate) is
  * the right shape here — the buffer is a 32 KiB bitset, far past what
  * flat UnsafeRow slots can hold, and the aggregate runs ONCE per
  * commit over just-written data (O(new data), never the table), so
  * codegen throughput is not the binding cost. Input must already be
  * `cast(col as string)` — the canonical form [[BloomSidecar]] hashes.
  */
case class BloomBuildAgg(child: Expression, bits: Int, hashes: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.BitSet] with UnaryLike[Expression] {
  require(bits > 0 && hashes > 0)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName hashes the canonical string form; cast the input, got " +
        child.dataType.catalogString)

  override def createAggregationBuffer(): java.util.BitSet =
    new java.util.BitSet(bits)

  override def update(buf: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null)
      BloomSidecar.setBits(buf, v.asInstanceOf[UTF8String].toString, bits, hashes)
    buf
  }

  override def merge(b1: java.util.BitSet, b2: java.util.BitSet): java.util.BitSet = {
    b1.or(b2); b1
  }

  override def eval(buf: java.util.BitSet): Any = buf.toByteArray

  override def serialize(buf: java.util.BitSet): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}
