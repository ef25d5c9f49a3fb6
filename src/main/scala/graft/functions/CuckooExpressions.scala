package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}

/**
 * Catalyst surface of the cuckoo seen-set (SURVEY.md §2.11: "cuckoo =
 * custom TypedImperativeAggregate"):
 *  - [[CuckooFilterAgg]] builds a serialized filter over a LongType hash
 *    column (partial aggregation merges per-partition filters);
 *  - [[CuckooMightContain]] probes a (foldable) serialized filter per row,
 *    deserializing once per task, with codegen.
 */
case class CuckooFilterAgg(
    child: Expression,
    expectedItems: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CuckooFilter] with UnaryLike[Expression] {

  override def createAggregationBuffer(): CuckooFilter = new CuckooFilter(expectedItems)

  override def update(buffer: CuckooFilter, input: InternalRow): CuckooFilter = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CuckooFilter, other: CuckooFilter): CuckooFilter =
    buffer.mergeInPlace(other)

  override def eval(buffer: CuckooFilter): Any = buffer.serialize()

  override def serialize(buffer: CuckooFilter): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): CuckooFilter = CuckooFilter.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cuckoo_filter_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): CuckooFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CuckooFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CuckooFilterAgg =
    copy(child = newChild)
}

case class CuckooMightContain(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "cuckoo_might_contain"

  @transient private lazy val filter: CuckooFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null else CuckooFilter.deserialize(bytes)
  }

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    if (v == null || filter == null) null
    else filter.mightContain(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    if (filter == null) {
      ev.copy(code =
        code"""
          boolean ${ev.isNull} = true;
          boolean ${ev.value} = false;""")
    } else {
      val filterRef = ctx.addReferenceObj("cuckooFilter", filter, classOf[CuckooFilter].getName)
      val rightGen = right.genCode(ctx)
      ev.copy(code =
        code"""
          ${rightGen.code}
          boolean ${ev.isNull} = ${rightGen.isNull};
          boolean ${ev.value} = false;
          if (!${ev.isNull}) { ${ev.value} = $filterRef.mightContain(${rightGen.value}); }""")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CuckooMightContain =
    copy(left = newLeft, right = newRight)
}

object CuckooFunctions {
  /** Aggregate a LongType hash column into a serialized cuckoo filter. */
  def cuckoo_filter_agg(hashes: Column, expectedItems: Long): Column =
    ColumnBridge.column(
      CuckooFilterAgg(ColumnBridge.expression(hashes), expectedItems)
        .toAggregateExpression())

  /** Probe a serialized filter (foldable/literal) with a hash column. */
  def cuckoo_might_contain(filter: Column, hash: Column): Column =
    ColumnBridge.column(
      CuckooMightContain(ColumnBridge.expression(filter), ColumnBridge.expression(hash)))
}
