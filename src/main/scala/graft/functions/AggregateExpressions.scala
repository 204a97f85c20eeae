package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Bounded-state EXACT top-k per group — a [[TypedImperativeAggregate]]
 * keeping a k-capped heap of `(score, id)` pairs per group (SURVEY.md
 * §7.5's custom-aggregate seam; the brief's preference (b): a Catalyst
 * aggregate over a whole-operator plan).
 *
 * Why an aggregate and not a rank window: `row_number() OVER
 * (PARTITION BY g ORDER BY s DESC) <= k` SORTS every group's full row
 * set (WindowExec buffers each partition); this aggregate holds k
 * pairs per group, updates in O(log k), and — crucially — MERGES, so
 * map-side partial aggregation applies: each input partition sends at
 * most k pairs per group across the shuffle instead of every row. At
 * 100 TB with heavy groups that is the difference between shuffling
 * the table and shuffling k·|groups| rows.
 *
 * Ordering contract (deterministic, engine-portable): higher score
 * first, ties broken by SMALLER id — a total order, so the result is
 * oracle-hashable (`ORDER BY score DESC, id` in SQL). NULL scores and
 * NULL ids are ignored (SQL aggregate convention). NaN scores rank
 * above +Infinity (java.lang.Double.compare semantics) — filter them
 * upstream if the column can produce NaN. Output: `array<struct<
 * score: double, id: bigint>>`, best first, length ≤ k.
 */
case class TopKByAgg(scoreExpr: Expression, idExpr: Expression, k: Int,
                     override val mutableAggBufferOffset: Int = 0,
                     override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k >= 1 && k <= 1000000, s"graft_top_k_by: k must be in [1, 1e6], got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByAgg.resultType

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach(buffer.offer)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = buffer.toArray.sortWith { case ((s1, i1), (s2, i2)) =>
      val c = java.lang.Double.compare(s2, s1) // score desc
      if (c != 0) c < 0 else i1 < i2           // then id asc
    }
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val entries = buffer.toArray
    val bb = java.nio.ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    (0 until n).foreach(_ => buf.offer(bb.getDouble, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "graft_top_k_by"
}

object TopKByAgg {
  val resultType: DataType = ArrayType(
    new StructType().add("score", DoubleType, nullable = false)
      .add("id", LongType, nullable = false),
    containsNull = false)
}

/** k-capped keeper of the best `(score, id)` pairs: a min-heap whose
  * head is the WORST kept pair (lowest score, then largest id), so an
  * incoming pair either beats the head in O(log k) or is discarded in
  * O(1). State is exactly ≤ k pairs regardless of input size. */
final class TopKBuffer(k: Int) {
  // head = worst kept: "a ranks before b" here means a is WORSE
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // lower score = worse
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // larger id = worse
    }
  }
  private val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def offer(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (worstFirst.compare((score, id), heap.head) < 0) {
      // strictly better than the worst kept — replace it
      heap.dequeue()
      heap.enqueue((score, id))
      ()
    }
  }
  def offer(e: (Double, Long)): Unit = offer(e._1, e._2)
  def foreach(f: ((Double, Long)) => Unit): Unit = heap.foreach(f)
  def toArray: Array[(Double, Long)] = heap.toArray
}
