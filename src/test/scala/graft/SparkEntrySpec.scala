package graft

import org.scalatest.funsuite.AnyFunSuite

/** Coherence of the driver contract: the gate is only as strong as the
  * query↔oracle mapping staying total.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("query/oracle mapping is total in both directions") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).mkString(", ")}")
    // zero rows-only queries since round 14: the two approximate ANN paths
    // (the last no_oracle residue) now run complete-candidate configs whose
    // output equals the exhaustive ranking, so every query is hash-compared
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).mkString(", ")}")
  }

  test("gate size only grows (ratchet)") {
    // round-14 closing size; bump intentionally when adding queries
    assert(SparkEntry.queries.size >= 253, s"gate shrank: ${SparkEntry.queries.size}")
  }
}
