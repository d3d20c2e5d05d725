package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the driver contract itself: every registered query must carry
  * a DuckDB oracle (the all-oracle-checked property COVERAGE.md claims
  * — a silent `None` would downgrade a query to rows-only checking),
  * oracle keys must name real queries, names must be unique, and the
  * flagship entry() returns rows on the smoke dataset. */
class ContractSpec extends AnyFunSuite {

  test("every registered query has an oracle; every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across modules") {
    val names = SparkEntry.modules.flatMap(_.queries).map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("entry() smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }
}
