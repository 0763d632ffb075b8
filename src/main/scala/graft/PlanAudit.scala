package graft

import org.apache.spark.sql.SparkSession

/** Sweep EVERY batch gate's physical plan for quadratic-shape markers
  * (BroadcastNestedLoopJoin / CartesianProduct) — the systematic form of
  * the per-operator explain reviews recorded in PLANS.md. Report-only:
  * prints one line per flagged gate plus a summary; the expected set
  * documents the gates that are nested-loop BY DESIGN (tiny broadcast
  * universes or intentional exact/quadratic anchors) so a regression —
  * a NEW gate going nested-loop — stands out as `UNEXPECTED`.
  *
  * Streaming gates are skipped: building them runs real micro-batches.
  *
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  /** Gates whose nested-loop is deliberate and documented. */
  private val expected: Set[String] = Set(
    // quadratic / exhaustive validation anchors (VERDICT weak-by-design);
    // each has a banded/bucketed scale twin holding to the same oracle
    "dedup_ngram_jaccard", "knn_graph", "pq_recall", "opq_recall",
    "knn_graph_lsh_recall", "similarity_topk", "hamming_topk",
    "similarity_q8_recall", "similarity_lsh_recall", "similarity_ivf_recall",
    "semdedup_trained_gate", "pca_trained_gate", "semantic_decontaminate",
    "similarity_dup_pairs", // exact all-pairs anchor; twin similarity_lsh_dup_pairs
    // tiny broadcast-universe crosses (expand/complete/expand_grid family):
    // one side is a ≤-distinct-values frame, NLJ over a broadcast single
    "expand", "expand_by", "expand_mixed", "expand_grid", "expand_grid_frames",
    "complete", "complete_literals", "complete_nesting", "complete_range_by",
    "cartesian_product",
    // one-row/driver-literal reference objects joined by range or constant
    "convert_units", "inflate_currency", "inflate_currency_name",
    "corpus_drift", "corpus_report", "corpus_overlap",
    "collocations",  // two single-row totals crossed in via broadcast
    // single-row normalizer/total crossed in via broadcast (Catalyst
    // constant-folds any constant equi-key back to a cross): Z = Σ count^α
    // for the temperature mixes, the corpus total for domain_stats — all
    // O(n)·1 scalar joins
    "mix_domains_temperature", "mix_domains_by_domain", "mix_domains_wide",
    "domain_stats",
    "pq_adc_topk",   // ≤10-row pinned query side crossed against the corpus
    // the BANDED range-join path always carries a nested-loop node for the
    // wide-interval overflow branch (span > maxBands rows only — bounded by
    // construction, usually empty); the MATCH path is the band equi-join
    "range_join", "get_join_indices",
    "conditional_join_keep_first", "conditional_join_keep_last",
    "conditional_join_left", "conditional_join_indicator",
    "conditional_join_outer", "conditional_join_right_keep",
    "conditional_join_cols",
    // != joins: the numpy-parity output is inherently ~n×m; nested-loop is
    // the only join shape (tiny dimension side in both gates)
    "conditional_join_ne", "conditional_join_ne_nulls")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val streaming = QueriesStreaming.entries.keySet
    val names = SparkEntry.queries.keys.toSeq.filterNot(streaming).sorted
    var unexpected = 0
    names.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, dir).queryExecution
          .executedPlan.toString
        val hits = Seq(
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "CartesianProduct" -> plan.contains("CartesianProduct"))
          .collect { case (m, true) => m }
        if (hits.nonEmpty) {
          val tag = if (expected(name)) "expected" else "UNEXPECTED"
          if (tag == "UNEXPECTED") unexpected += 1
          println(s"[planaudit] $tag\t$name\t${hits.mkString(",")}")
        }
      } catch {
        case e: Throwable =>
          println(s"[planaudit] ERROR\t$name\t${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    println(s"[planaudit] done: ${names.size} batch gates scanned, " +
      s"$unexpected unexpected nested-loop plans")
    spark.stop()
    // hard gate (VERDICT r18 #6): a NEW nested-loop plan fails the run
    // instead of depending on someone reading the printed line
    if (unexpected > 0) sys.exit(1)
  }
}
