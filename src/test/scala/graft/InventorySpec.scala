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

  test("no query name is defined twice WITHIN a module's Map literal") {
    // SparkEntry already refuses cross-module collisions, but a duplicate
    // key inside ONE Map literal is swallowed by the Map itself — the
    // round-17 q_curriculum incident: a new op compiled, "verified"
    // (against the shadowing twin), and never actually ran. Scan the
    // source: each `"name" ->` may appear at most twice per file (query +
    // oracle entry).
    val entry = """"((?:q|s|src|sink)_[a-z0-9_]+)"\s*->""".r
    val offenders = for {
      f <- new java.io.File("src/main/scala/graft").listFiles().toSeq
        .flatMap(d => if (d.isDirectory) d.listFiles().toSeq else Seq(d))
      if f.getName.endsWith(".scala")
      text = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      names = entry.findAllMatchIn(text).map(_.group(1)).toSeq
      (n, g) <- names.groupBy(identity)
      if g.size > 2
    } yield s"${f.getName}: $n (${g.size} arrow-entries)"
    assert(offenders.isEmpty,
      s"shadowed Map keys (definitions beyond query+oracle): " +
        offenders.sorted.mkString("; "))
  }
}
