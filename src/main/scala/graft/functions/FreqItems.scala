package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitters sketch: `graft_freq_items(item, k)` maintains at
  * most `k` counters over a bigint item stream and returns
  * `array<struct<item:bigint, est:bigint>>` (est DESC, item ASC).
  *
  * The third mergeable sketch beside [[TopK]] (exact bounded top-k) and
  * [[TDigest]] (quantiles): heavy-hitter detection whose state is O(k) no
  * matter how many distinct items flow through — the fixed-size answer to
  * "which items exceed a frequency share" that at 100 TB replaces a full
  * `groupBy(item)` shuffle with O(groups × k) partial-aggregate rows
  * (`ObjectHashAggregateExec`, same plan shape as graft_topk/graft_tdigest).
  *
  * Algorithm (Misra–Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012):
  *   - update: increment the item's counter; if the item is untracked and all
  *     k slots are full, decrement EVERY counter by 1 and drop zeros.
  *   - merge: sum counters pairwise; if more than k survive, subtract the
  *     (k+1)-th largest counter value from all and drop the non-positive —
  *     at most k counters can exceed that value, so the bound holds.
  *
  * Guarantees (both survive arbitrary partitioning/merge trees, which is what
  * makes an oracle contract possible even though the raw tracked SET is
  * order-dependent at the margin):
  *   - no overestimate: est(i) ≤ f(i);
  *   - bounded underestimate: est(i) ≥ f(i) − N/(k+1) where N = stream size;
  *   - completeness: every item with f(i) > N/(k+1) is tracked (its estimate
  *     is positive), because fewer than k+1 items can each lose more than
  *     N/(k+1) decrements.
  * Declared queries therefore pin flags derived from these theorems (the
  * `q_agg_approx_distinct` / `q_agg_countmin` oracle pattern), never the raw
  * counter set.
  *
  * Null items are skipped; group output is never null (empty array).
  */
case class FreqItems(
    item: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(item, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_freq_items"

  override def checkInputDataTypes(): TypeCheckResult =
    (item.dataType, kExpr.dataType) match {
      case (LongType, IntegerType) =>
        if (!kExpr.foldable)
          TypeCheckResult.TypeCheckFailure("graft_freq_items: k must be a literal")
        else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() <= 0)
          TypeCheckResult.TypeCheckFailure("graft_freq_items: k must be > 0")
        else TypeCheckResult.TypeCheckSuccess
      case (i, kk) => TypeCheckResult.TypeCheckFailure(
        s"graft_freq_items requires (bigint, int) arguments, got ($i, $kk)")
    }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    new mutable.LongMap[Long](math.min(2 * k, 256))

  override def update(
      buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = item.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val cur = buf.getOrElse(x, 0L) // counters are ≥ 1, so 0 means absent
      if (cur > 0L) buf.update(x, cur + 1L)
      else if (buf.size < k) buf.update(x, 1L)
      else {
        // Decrement-all: O(k), amortized O(1) per input (each decrement pass
        // burns k+1 prior increments).
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (key, c) =>
          if (c <= 1L) dead += key else buf.update(key, c - 1L)
        }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreachEntry { (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      // Subtract the (k+1)-th largest counter value; at most k counters
      // remain strictly positive.
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[Long]
      buf.foreachEntry { (key, c) =>
        if (c <= t) dead += key else buf.update(key, c - t)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val entries = buf.toArray
    // (est DESC, item ASC) — deterministic rendering of whatever is tracked.
    java.util.Arrays.sort(entries, new java.util.Comparator[(Long, Long)] {
      def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    })
    new GenericArrayData(entries.map { case (i, c) => InternalRow(i, c) }.toArray[Any])
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream(16 * buf.size + 4)
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreachEntry { (key, c) => out.writeLong(key); out.writeLong(c) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.LongMap[Long](math.max(n, 16))
    var i = 0
    while (i < n) { buf.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItems =
    copy(item = newChildren(0), kExpr = newChildren(1))
}

object FreqItems {
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, "graft_freq_items takes exactly 2 arguments")
    FreqItems(exprs.head, exprs(1))
  }

  /** Register `graft_freq_items`; idempotent ([[graft.GraftExtensions]] is
    * the declarative equivalent). */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_freq_items", builder, "built-in")
}
