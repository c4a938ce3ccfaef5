package graft.ops

import graft.SparkSpec
import graft.functions.HilbertKey
import org.apache.spark.sql.functions._

/** graft_hilbert (native codegen Expression) — the order-8 Hilbert curve
  * index. The DuckDB oracle (generated CTE unroll) pins the sf0.01 answer;
  * these tests prove the curve itself: a space-filling curve is correct iff
  * it is a BIJECTION onto [0, 4^k) whose consecutive cells are edge-adjacent
  * — both checked exhaustively over the full 256×256 grid.
  */
class HilbertKeySpec extends SparkSpec {

  private lazy val walk: Array[(Long, Long, Long)] = {
    HilbertKey.register(spark)
    spark.range(65536)
      .select((col("id") % 256).as("x"), expr("id div 256").as("y"))
      .withColumn("d", expr("graft_hilbert(x, y)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("bijection: all 65536 cells map to distinct d in [0, 65536)") {
    val ds = walk.map(_._3)
    assert(ds.length == 65536)
    assert(ds.min == 0L && ds.max == 65535L)
    assert(ds.distinct.length == 65536)
  }

  test("unit-step: consecutive d land on edge-adjacent cells (true Hilbert, not Morton)") {
    val byD = walk.map { case (x, y, d) => d -> ((x, y)) }.toMap
    (1 until 65536).foreach { d =>
      val (x0, y0) = byD(d - 1L)
      val (x1, y1) = byD(d.toLong)
      val dist = math.abs(x1 - x0) + math.abs(y1 - y0)
      assert(dist == 1, s"jump of $dist at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
  }

  test("agrees with an independent xy2d reference implementation") {
    // Transcribed independently from the curve definition (state variables
    // named differently, d accumulated at the end) — a drifted kernel or a
    // codegen/interpreted mismatch fails here.
    def ref(px: Long, py: Long): Long = {
      var (cx, cy) = (px & 255L, py & 255L)
      val quads = (0 until 8).map { lvl =>
        val s = 1L << (7 - lvl)
        val rx = if ((cx & s) != 0) 1L else 0L
        val ry = if ((cy & s) != 0) 1L else 0L
        if (ry == 0) {
          if (rx == 1) { cx = 255L - cx; cy = 255L - cy }
          val t = cx; cx = cy; cy = t
        }
        s * s * ((3 * rx) ^ ry)
      }
      quads.sum
    }
    walk.foreach { case (x, y, d) => assert(d == ref(x, y), s"($x,$y)") }
  }

  test("null in, null out; masks high bits") {
    HilbertKey.register(spark)
    val r = spark.sql(
      "SELECT graft_hilbert(CAST(NULL AS BIGINT), 3L) AS a, " +
      "graft_hilbert(259L, 1L) AS b, graft_hilbert(3L, 1L) AS c").head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == r.getLong(2)) // 259 & 255 == 3
  }
}
