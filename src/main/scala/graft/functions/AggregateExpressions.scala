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

/**
 * Misra-Gries heavy-hitter SKETCH — a mergeable
 * [[TypedImperativeAggregate]] holding at most `k` (item, counter)
 * pairs whatever the item domain's cardinality (the "top URLs in
 * 100 TB" problem, where an exact groupBy's state is the domain size).
 *
 * Guarantee (survives merging, the textbook bound): after summarizing
 * n rows, every item with true frequency > n/(k+1) is PRESENT in the
 * sketch, and each kept counter underestimates its item's true count
 * by at most n/(k+1). Counters are partitioning-dependent (merge order
 * moves the shared decrement), so the sketch is a CANDIDATE GENERATOR,
 * not an answer — [[graft.ops.Ranking.heavyHitters]] verifies the ≤ k
 * candidates exactly in a second pass, which is what makes the
 * end-to-end operator deterministic and oracle-hashable.
 *
 * Output: `array<struct<item: string, lb: bigint>>`, counter desc then
 * item asc. NULL items are ignored (SQL aggregate convention).
 */
case class MisraGriesAgg(itemExpr: Expression, k: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  require(k >= 1 && k <= 1000000, s"graft_misra_gries: k must be in [1, 1e6], got $k")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesAgg.resultType

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buffer: MGBuffer, input: InternalRow): MGBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) buffer.add(v.toString, 1L)
    buffer
  }

  override def merge(buffer: MGBuffer, other: MGBuffer): MGBuffer = {
    other.foreach((item, c) => buffer.add(item, c))
    buffer.shrink()
    buffer
  }

  override def eval(buffer: MGBuffer): Any = {
    val sorted = buffer.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else i1 < i2
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(item), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MGBuffer): Array[Byte] = {
    val entries = buffer.toArray
    val bytes = entries.map { case (s, _) => s.getBytes("UTF-8") }
    val bb = java.nio.ByteBuffer.allocate(
      4 + bytes.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(k)
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.add(new String(b, "UTF-8"), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(itemExpr = newChildren(0))
  override def prettyName: String = "graft_misra_gries"
}

object MisraGriesAgg {
  val resultType: DataType = ArrayType(
    new StructType().add("item", StringType, nullable = false)
      .add("lb", LongType, nullable = false),
    containsNull = false)
}

/** Misra-Gries state: ≤ k counters. `add` is the classic algorithm
  * generalized to weighted adds (so `merge` = add counters then ONE
  * [[shrink]]): an absent item beyond capacity pays its weight into a
  * shared decrement; [[shrink]] subtracts the (k+1)-th largest counter
  * from everyone and drops the non-positive. */
final class MGBuffer(k: Int) {
  private val m = scala.collection.mutable.HashMap.empty[String, Long]

  def add(item: String, w: Long): Unit = {
    m.get(item) match {
      case Some(c) => m.update(item, c + w); ()
      case None =>
        m.update(item, w)
        if (m.size > k) shrink()
    }
  }

  /** Enforce ≤ k counters: subtract the (k+1)-th largest value from
    * every counter, drop those that hit zero or below. */
  def shrink(): Unit = {
    if (m.size <= k) return
    val vals = m.values.toArray
    java.util.Arrays.sort(vals)
    val dec = vals(vals.length - k - 1) // (k+1)-th largest
    if (dec > 0) {
      // iterate a SNAPSHOT: updating a mutable.HashMap inside its own
      // foreach is undefined behavior — entries could be revisited and
      // double-decremented, silently breaking the n/(k+1) error bound
      // (caught by MisraGriesProps' lower-bound property on a full run)
      m.toArray.foreach { case (i, c) =>
        if (c - dec <= 0) { m.remove(i); () } else { m.update(i, c - dec); () }
      }
    }
    // at most k values strictly exceed the (k+1)-th largest, so the
    // subtraction always leaves <= k counters; defensive only
    if (m.size > k) {
      m.toSeq.sortBy { case (i, c) => (-c, i) }.drop(k)
        .foreach { case (i, _) => m.remove(i) }
    }
  }

  def foreach(f: (String, Long) => Unit): Unit = m.foreach { case (i, c) => f(i, c) }
  def toArray: Array[(String, Long)] = m.toArray
}
