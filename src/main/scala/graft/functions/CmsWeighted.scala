package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** WEIGHTED Count–Min aggregate: `graft_cms_weighted(item, cnt)` folds
  * a PRE-COUNTED `(item, count)` relation into the same sketch
  * `count_min_sketch(item, …)` builds from the expanded multiset —
  * counter updates commute (`addBinary(item, c)` adds `c` to the same
  * cells `c` single adds would), so the resulting tables, totalCount,
  * and every `estimateCount` are identical by construction
  * (CmsWeightedSpec pins sketch-for-sketch equality against the
  * builtin).
  *
  * WHY: building a sketch from raw occurrences pays one hash-set
  * probe per OCCURRENCE; real corpora are aggregated once anyway
  * (x04's exact gate needs the counts regardless), after which the
  * sketch should cost one update per DISTINCT item. At the 100×
  * replica this turns x04 from two full corpus tokenization passes
  * (one for the builtin sketch, one for the exact counts) into one
  * pass plus a vocabulary-sized sketch fold. Mergeable partial+final
  * like every sketch here; item bytes match the builtin's
  * `UTF8String.getBytes` discipline so the hashes agree.
  */
case class CmsWeightedAgg(
    left: Expression, right: Expression,
    eps: Double, confidence: Double, seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_weighted expects (string, bigint), got $l / $r")
  }

  override def prettyName: String = "graft_cms_weighted"

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val item = left.eval(input)
    val cnt = right.eval(input)
    if (item != null && cnt != null) {
      val c = cnt.asInstanceOf[Long]
      require(c >= 0, s"graft_cms_weighted: negative count $c")
      // same byte view as the builtin's StringType path, so the two
      // sketches hash identically
      if (c > 0) buffer.addBinary(item.asInstanceOf[UTF8String].getBytes, c)
    }
    buffer
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: CountMinSketch): Any = serialize(buffer)

  override def serialize(buffer: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buffer.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsWeightedAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CmsWeightedAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsWeightedAgg =
    copy(left = newLeft, right = newRight)
}

object CmsWeighted {

  /** Column form: serialized CMS bytes (read back with
    * `CountMinSketch.readFrom`), aggregating `(item, cnt)` pairs.
    */
  def apply(item: Column, cnt: Column,
      eps: Double, confidence: Double, seed: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      CmsWeightedAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(item),
        org.apache.spark.sql.GraftSqlBridge.expression(cnt),
        eps, confidence, seed).toAggregateExpression())
}
