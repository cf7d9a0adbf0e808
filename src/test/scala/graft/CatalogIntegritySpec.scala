package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog integrity: `SparkEntry.queries` is a Map built from
  * `catalog`, so a DUPLICATE query name silently shadows the earlier
  * row — the later `Q` wins, the earlier one vanishes from Verify,
  * Bench, and the oracle gate with no error anywhere (r14: a second
  * `x_hybrid_rrf` compiled and went green while masking the r8 row;
  * caught only because the rolling bench ref still carried the old
  * floor). Pin uniqueness and the name convention here so the failure
  * class is a test failure, not an archaeology exercise. */
class CatalogIntegritySpec extends AnyFunSuite {

  test("catalog query names are unique — no silent Map shadowing") {
    val names = SparkEntry.catalog.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate catalog names (later silently wins): $dups")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle key is a catalog query; names are non-empty and shaped") {
    val names = SparkEntry.catalog.map(_.name).toSet
    val orphans = SparkEntry.oracleSql.keySet -- names
    assert(orphans.isEmpty, s"oracle SQL for non-existent queries: $orphans")
    names.foreach { n =>
      assert(n.nonEmpty && n.matches("[a-z][a-z0-9_]*"), s"malformed query name: '$n'")
    }
  }
}
