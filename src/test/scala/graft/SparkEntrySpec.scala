package graft

import org.scalatest.funsuite.AnyFunSuite

/** Coherence of the driver contract: the gate is only as strong as the
  * query↔oracle mapping staying total.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key has a query; rows-only residue is the documented trio") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).mkString(", ")}")
    // queries without an oracle are rows-only: exactly the three approximate/
    // seeded paths, each of which has an exact companion gate
    assert((q -- o) == Set("jitter", "similarity_ivf_topk", "similarity_lsh_topk"),
      s"undocumented rows-only queries: ${(q -- o).mkString(", ")}")
  }

  test("gate size only grows (ratchet)") {
    // round-8 closing size; bump intentionally when adding queries
    assert(SparkEntry.queries.size >= 171, s"gate shrank: ${SparkEntry.queries.size}")
  }
}
