package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Misra-Gries frequent-items sketch as a custom Catalyst aggregate —
  * the bounded-memory answer to "top keys over 100 TB": the buffer
  * holds at most `m` counters regardless of input size or cardinality,
  * reduces map-side like CollectTopK, and the exchange carries one
  * m-entry sketch per partition instead of the full key histogram an
  * exact groupBy needs.
  *
  * Guarantee (any merge order): every item with true frequency
  * > N/(m+1) is IN the final sketch, with estimate within N/(m+1) of
  * truth. Below that threshold membership is input-order-dependent —
  * so oracle-checked queries must only assert membership for items
  * ABOVE the guarantee line (q76 does exactly that; the bound itself
  * is property-tested across partitionings in FrequentItemsSpec).
  *
  * Update is classic MG (decrement-all on a full miss, dropping zeros);
  * merge is combine-then-trim: sum counters, then subtract the
  * (m+1)-largest combined count from every counter and drop ≤0 — the
  * standard mergeable-summaries formulation.
  */
case class FrequentItems(
    item: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(m > 0, "frequent_items requires m > 0")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = FrequentItems.ResultType

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < m => buf.update(key, 1L)
        case None => // decrement-all, drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf.update(k, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > m) {
      // Subtract the (m+1)-th largest count from everyone; drop <= 0.
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(m)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else buf.update(k, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.toSeq
      .sortBy { case (k, c) => (-c, k) } // est desc, item asc
      .map { case (k, c) => InternalRow(UTF8String.fromString(k), c) })

  // Length-prefixed raw UTF-8, not writeUTF: modified-UTF-8 caps an entry
  // at 65535 bytes, so sketching a long-string column (full document
  // text) would throw UTFDataFormatException at partial-aggregate
  // shuffle time. An int length + raw bytes has no such cliff.
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FrequentItems =
    copy(item = newChildren(0))

  override def prettyName: String = "frequent_items"
}

object FrequentItems {
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))),
    containsNull = false)

  /** Column API: `frequent_items(item, m)` → array<struct<item,est>>
    * sorted est-desc, item-asc. */
  def sketch(item: Column, m: Int): Column =
    GraftSql.column(
      FrequentItems(GraftSql.expression(item), m).toAggregateExpression())
}
