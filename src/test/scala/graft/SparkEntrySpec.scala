package graft

import org.scalatest.funsuite.AnyFunSuite

/** Coherence of the driver contract: the gate is only as strong as the
  * query↔oracle mapping staying total.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key has a query; rows-only residue is the documented duo") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"orphan oracles: ${(o -- q).mkString(", ")}")
    // queries without an oracle are rows-only: exactly the two approximate
    // ANN paths, each held by an exact recall companion gate (jitter joined
    // the hash-compared set in round 12 via per-row invariant projections)
    assert((q -- o) == Set("similarity_ivf_topk", "similarity_lsh_topk"),
      s"undocumented rows-only queries: ${(q -- o).mkString(", ")}")
  }

  test("gate size only grows (ratchet)") {
    // round-12 closing size; bump intentionally when adding queries
    assert(SparkEntry.queries.size >= 242, s"gate shrank: ${SparkEntry.queries.size}")
  }
}
