package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog cardinality sketch as a native Catalyst
  * TypedImperativeAggregate — the distributed-sketch primitive of the
  * curation pipeline ("how many distinct documents/urls/speakers per
  * shard" at 10^12 rows, where exact count-distinct shuffles every key).
  *
  * Scale shape: the aggregation state is a FIXED 2^p-byte register file
  * per group regardless of input size, and `merge` is a register-wise
  * max — so partial aggregation (map-side combine) applies and the
  * shuffle carries kilobytes per group, never keys. This is the whole
  * point of a sketch on a cluster; Spark's own approx_count_distinct has
  * the same shape but an engine-specific hash, which is why this one
  * exists: the hash is [[TextOps.portableHash64]] (= DuckDB's
  * md5_number_lower), making the REGISTER FILE itself reproducible in
  * SQL — the oracle (t14) verifies every register byte-for-byte, which
  * pins exactly the part a wrong distributed merge would corrupt.
  *
  * Register math (Flajolet et al. 2007, standard HLL): h = 64-bit hash;
  * index = top p bits; rho = leading-zero count of the remaining 64-p
  * bits + 1; register = max(rho) per index.
  */
case class HllRegistersAgg(child: Expression, p: Int = 12,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
  private val m = 1 << p

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_registers expects string, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = TextOps.portableHash64(v.asInstanceOf[UTF8String].toString)
      val idx = (h >>> (64 - p)).toInt
      val w = h & ((1L << (64 - p)) - 1)
      val rho = java.lang.Long.numberOfLeadingZeros(w) - p + 1 // w==0 -> 64-p+1
      if (rho > (buf(idx) & 0xFF)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if ((b2(i) & 0xFF) > (b1(i) & 0xFF)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i) & 0xFF; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllRegistersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegistersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
}

object HllSketch {
  /** Standard HLL estimate from a register array (Flajolet et al. 2007:
    * alpha_m * m^2 / sum 2^-M_j, with the small-range linear-counting
    * correction). Driver/spec-side helper — the oracled surface is the
    * register file itself. */
  def estimate(registers: Array[Int]): Double = {
    val m = registers.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.scalb(1.0, -registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }
}
