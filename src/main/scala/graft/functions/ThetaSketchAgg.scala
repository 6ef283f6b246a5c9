package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch build as a real Catalyst aggregate — the idiomatic
  * Spark shape for a mergeable summary (the same
  * `TypedImperativeAggregate` machinery Spark's own `hll_sketch_agg`
  * uses): the planner gives it a PARTIAL phase per input partition and
  * a FINAL merge across the shuffle for free, it composes with any
  * `groupBy`, and the per-group state is bounded by `nominalEntries`
  * whatever the input size. Returns the compact-sketch bytes
  * (`BinaryType`), ready for the driver-side union/intersect/a-not-b
  * algebra (q215) or storage as a per-shard summary column.
  *
  * Serialization between phases is the COMPACT ordered form — exactly
  * what a distributed sketch pipeline ships between nodes; the merge
  * result is therefore partitioning-independent (ThetaSpec proves
  * this), though not bit-identical to a single-pass update sketch
  * (theta trajectories differ — also pinned there).
  */
case class ThetaSketchAgg(
    child: Expression,
    nominalEntries: Int = 4096,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_theta_sketch_agg takes LONG/INT/STRING/BINARY input, got " +
        dt.catalogString)
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      // hash the exact UTF-8 bytes, so parity with byte-level twins
      // holds at any encoding (the q48 convention)
      case StringType => buffer.update(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => buffer.update(v.asInstanceOf[Array[Byte]])
      case dt => throw new IllegalStateException(
        s"unreachable: checkInputDataTypes admitted $dt")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
  override def prettyName: String = "graft_theta_sketch_agg"
}

object ThetaSketchAgg {
  /** Estimate from compact-sketch bytes (driver-side helper). */
  def estimate(bytes: Array[Byte]): Double =
    Sketches.wrapSketch(Memory.wrap(bytes)).getEstimate
}
