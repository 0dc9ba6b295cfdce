package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ExprBridge.{toColumn => toCol, toExpression => toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded heap of the k best (score, id) entries seen so far.
  *
  * "Best" = highest score, ties broken by SMALLEST id — i.e. the exact
  * ordering of `row_number() OVER (ORDER BY score DESC, id ASC)`. The
  * heap is a worst-first priority queue so an incoming entry only pays
  * an O(log k) insert when it beats the current worst.
  */
final class TopKBuffer(val k: Int) {
  val heap = new java.util.PriorityQueue[(Double, Any)](
    math.max(k, 1), TopKBuffer.worstFirst)

  def offer(score: Double, id: Any): Unit = {
    if (heap.size < k) { heap.offer((score, id)); () }
    else if (TopKBuffer.worstFirst.compare(heap.peek(), (score, id)) < 0) {
      heap.poll(); heap.offer((score, id)); ()
    }
  }
}

object TopKBuffer {
  /** Worst-first: lower score sorts first; equal scores put the LARGER
    * id first (ties rank id ASC, so the larger id is the worse entry).
    */
  val worstFirst: java.util.Comparator[(Double, Any)] =
    new java.util.Comparator[(Double, Any)] {
      override def compare(a: (Double, Any), b: (Double, Any)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c
        else b._2.asInstanceOf[Comparable[Any]].compareTo(a._2)
      }
    }
}

/** Exact per-group top-k as a `TypedImperativeAggregate` — the scalable
  * half of a two-stage top-k.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC)` ranks every
  * scored row of a group in ONE task; with few groups (ANN queries) that
  * task sees |corpus| rows. This aggregate instead keeps a k-entry heap
  * per group per input partition (map-side partial aggregation), so the
  * shuffle moves at most k rows × groups × partitions — independent of
  * corpus size — and the final merge is k·partitions per group.
  *
  * Emits `array<struct<id, score, rank>>` sorted best-first with
  * `rank` = 1..n, identical to the window formulation (including the
  * deterministic id-ASC tiebreak). Null scores/ids are ignored: a null
  * cosine can never outrank k real neighbors.
  */
case class TopKByScore(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", id.dataType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("rank", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk score must be DOUBLE, got ${score.dataType.sql}")
    else id.dataType match {
      case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"topk id must be BIGINT, INT or STRING, got ${t.sql}")
    }
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) {
        // UTF8String from eval may alias a reused unsafe buffer — copy.
        val owned = i match {
          case u: UTF8String => u.clone()
          case other => other
        }
        b.offer(s.asInstanceOf[Double], owned)
      }
    }
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    val it = o.heap.iterator()
    while (it.hasNext) { val e = it.next(); b.offer(e._1, e._2) }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    if (b.heap.isEmpty) null
    else {
      val entries = b.heap.toArray(new Array[(Double, Any)](b.heap.size))
      // best-first = reverse of the heap's worst-first order
      java.util.Arrays.sort(entries, TopKBuffer.worstFirst.reversed())
      val rows = new Array[Any](entries.length)
      var r = 0
      while (r < entries.length) {
        rows(r) = InternalRow(entries(r)._2, entries(r)._1, r + 1)
        r += 1
      }
      new GenericArrayData(rows)
    }
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.heap.size)
    val it = b.heap.iterator()
    while (it.hasNext) {
      val (s, i) = it.next()
      out.writeDouble(s)
      id.dataType match {
        case LongType => out.writeLong(i.asInstanceOf[Long])
        case IntegerType => out.writeInt(i.asInstanceOf[Int])
        case StringType =>
          val bytes = i.asInstanceOf[UTF8String].getBytes
          out.writeInt(bytes.length); out.write(bytes)
        case t => throw new IllegalStateException(s"unsupported id type $t")
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new TopKBuffer(k)
    var r = 0
    while (r < n) {
      val s = in.readDouble()
      val i: Any = id.dataType match {
        case LongType => in.readLong()
        case IntegerType => in.readInt()
        case StringType =>
          val len = in.readInt()
          val buf = new Array[Byte](len)
          in.readFully(buf)
          UTF8String.fromBytes(buf)
        case t => throw new IllegalStateException(s"unsupported id type $t")
      }
      b.offer(s, i)
      r += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Column API: `array<struct<id,score,rank>>` of the k entries with
    * the highest score (ties id ASC), rank 1-based best-first.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    toCol(TopKByScore(toExpr(score.cast("double")), toExpr(id), k)
      .toAggregateExpression())
}
