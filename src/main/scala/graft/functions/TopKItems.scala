package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters aggregate: Metwally et al.'s SPACE-SAVING sketch as
  * a native Catalyst TypedImperativeAggregate — bounded memory
  * (`capacity` counters) per partition, mergeable partials, one
  * shuffle of O(capacity) state per group. The canonical streaming
  * top-k when exact per-key counting would blow the aggregation
  * hash map at corpus scale.
  *
  * When `capacity` ≥ the true number of distinct keys the result is
  * EXACT (spec-checked against groupBy counts); under capacity
  * pressure counts are overestimates bounded by N/capacity, and the
  * sketch keeps every key whose true count exceeds that bound.
  *
  * Returns array<struct<item string, cnt long>> — top `k` by
  * (count desc, item asc), deterministic for the exact regime.
  */
case class TopKItemsAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def bump(buf: mutable.HashMap[String, Long], key: String, by: Long): Unit = {
    buf.get(key) match {
      case Some(c) => buf.update(key, c + by)
      case None if buf.size < capacity => buf.update(key, by)
      case None =>
        // space-saving: evict the minimum, new key inherits min + by
        val (minK, minV) = buf.minBy { case (kk, vv) => (vv, kk) }
        buf.remove(minK)
        buf.update(key, minV + by)
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow):
      mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) bump(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.toSeq.sortBy { case (kk, vv) => (-vv, kk) }
      .foreach { case (kk, vv) => bump(buf, kk, vv) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (kk, vv) => (-vv, kk) }.take(k)
    new GenericArrayData(top.map { case (kk, vv) =>
      InternalRow(UTF8String.fromString(kk), vv)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, vv) =>
      // length-prefixed bytes, not writeUTF: items beyond 64 KiB of
      // UTF-8 (arbitrary string columns) must not crash the shuffle
      val bs = kk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bs.length); out.write(bs); out.writeLong(vv)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val bs = new Array[Byte](len); in.readFully(bs)
      buf.update(new String(bs, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKItemsAgg =
    copy(child = c.head)
}

object TopKItems {
  /** Register `top_k_items(col, k, capacity)` in the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_items", { exprs =>
        require(exprs.length == 3,
          s"top_k_items(col, k, capacity) takes 3 arguments, got ${exprs.length}")
        TopKItemsAgg(
          exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue,
          exprs(2).eval().asInstanceOf[Number].intValue)
          .toAggregateExpression()
      }, "built-in")

  def top_k_items(c: Column, k: Int, capacity: Int): Column =
    call_function("top_k_items", c,
      org.apache.spark.sql.functions.lit(k),
      org.apache.spark.sql.functions.lit(capacity))
}
