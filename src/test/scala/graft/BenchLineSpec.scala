package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only a ~4 KB stdout TAIL of the bench run and parses
  * the single JSON line out of it; round 1 lost its whole bench to a 4.6 KB
  * line (BENCH_r01 "parsed": null). This guard rebuilds the line exactly as
  * Bench.main prints it, with worst-case widths everywhere, so adding a
  * headline query without trimming another fails HERE instead of silently
  * truncating a future round's bench artifact. */
class BenchLineSpec extends AnyFunSuite {

  test("worst-case headline JSON line stays under 2 KB") {
    val qs = Bench.headline.map(n => "\"" + n + "\":" + f"${9999.999}%.3f")
      .mkString("{", ",", "}")
    val nProbes = Bench.headline.size / 8 + 2 // one per 8 queries + final
    val calibs = Seq.fill(nProbes)(f"${999.99}%.2f").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":${99999.999}%.3f,"unit":"sec","queries":$qs,"n_failed":0,"failed":[],"calib":[${99.999}%.3f,${99.999}%.3f],"calibs":$calibs,"n_retry":${Bench.headline.size},"sf":"/root/testdata/sf0.1"}"""
    assert(line.length < 2048,
      s"headline line is ${line.length} B (${Bench.headline.size} queries) — " +
        "the driver tail is ~4 KB; remove a query or shrink the format")
  }
}
