package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: `graft_topk(sort_key, payload, k)` keeps the k
  * largest `(sort_key DESC, payload ASC)` pairs per group and returns them
  * ordered, as `array<struct<sk:bigint, pl:bigint>>`.
  *
  * This is the scale-out replacement for the `row_number() OVER (PARTITION
  * BY g ORDER BY v DESC) <= k` idiom (`q_topk_group`): the window plan must
  * shuffle EVERY row of the group and sort whole partitions before it can
  * drop all but k rows; this aggregate participates in partial aggregation
  * (`ObjectHashAggregateExec`), so each map task pre-reduces its slice to at
  * most k entries per group and the shuffle carries O(groups × k) rows no
  * matter how large the input is. At 100 TB that is the difference between
  * shuffling the table and shuffling the answer.
  *
  * Determinism: the comparator is a total order (sort_key DESC, payload ASC
  * — payload is expected unique per group, e.g. a primary key), so the kept
  * set and its order are independent of partitioning, merge order, and
  * retries. Buffers compact by sort+truncate once they exceed `4k+64`
  * entries, keeping per-group state O(k).
  *
  * Null handling: rows where either child is null are skipped (the window
  * idiom's ORDER BY would sort them deterministically, but a top-k over a
  * key/value pair with nulls is better declared away); group output is
  * never null (empty array for all-null groups).
  */
case class TopK(
    sortKey: Expression,
    payload: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val compactAt: Int = 4 * k + 64

  override def children: Seq[Expression] = Seq(sortKey, payload, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sk", LongType, nullable = false),
      StructField("pl", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    (sortKey.dataType, payload.dataType, kExpr.dataType) match {
      case (LongType, LongType, IntegerType) =>
        if (!kExpr.foldable)
          TypeCheckResult.TypeCheckFailure("graft_topk: k must be a literal")
        else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
          TypeCheckResult.TypeCheckFailure("graft_topk: k must be > 0")
        else TypeCheckResult.TypeCheckSuccess
      case (s, p, kk) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (bigint, bigint, int) arguments, got ($s, $p, $kk)")
    }

  // (sort_key DESC, payload ASC) — a total order when payload is unique.
  private object Ord extends Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  private def compact(buf: ArrayBuffer[(Long, Long)]): Unit = {
    buf.sortInPlace()(Ord)
    if (buf.length > k) buf.takeInPlace(k)
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    new ArrayBuffer[(Long, Long)](math.min(compactAt, 256))

  override def update(
      buf: ArrayBuffer[(Long, Long)], input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val s = sortKey.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      buf += ((s.asInstanceOf[Long], p.asInstanceOf[Long]))
      if (buf.length >= compactAt) compact(buf)
    }
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Long, Long)], other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    buf ++= other
    if (buf.length >= compactAt) compact(buf)
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any = {
    compact(buf)
    new GenericArrayData(buf.map { case (s, p) => InternalRow(s, p) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    compact(buf) // never ship more than k entries between stages
    val bytes = new ByteArrayOutputStream(16 * buf.length + 4)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.length)
    buf.foreach { case (s, p) => out.writeLong(s); out.writeLong(p) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { buf += ((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopK =
    copy(sortKey = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
}

object TopK {
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 3, "graft_topk takes exactly 3 arguments")
    TopK(exprs(0), exprs(1), exprs(2))
  }

  /** Register `graft_topk` in the session's function registry. Idempotent;
    * [[graft.GraftExtensions]] is the declarative equivalent. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", builder, "built-in")
}
