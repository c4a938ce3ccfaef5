package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory integrity: every registered query carries a DuckDB oracle.
  * Round 5 closed the last rows-only entry (q_sim_lsh, via plane-literal
  * SQL) — from here, a query without an oracle is a silent weakening of
  * the correctness gate and must fail CI, not slip through as a driver
  * "rows-only" row. */
class InventorySpec extends AnyFunSuite {

  test("every query has an oracle (no rows-only entries)") {
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(missing.isEmpty,
      s"queries without oracle SQL: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every oracle references a registered query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"orphan oracles: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("headline bench set is a subset of the registered inventory") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not registered: $missing")
  }
}
