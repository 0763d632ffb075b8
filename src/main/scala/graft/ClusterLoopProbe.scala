package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the [[graft.llm.Dedup.dupClusters]] DISTRIBUTED branch
  * (VERDICT r20 #7, r21 next-round #3): compares, on the same edge sets,
  *
  *   old     — the r20 corpus-wide label loop (labels carried for EVERY id,
  *             two full-corpus shuffles per iteration) — supplies the
  *             at-scale evidence the r21 §10 member-restriction still owed;
  *   current — the shipped member-restricted min-label loop
  *             (Dedup.dupClusters with the driver path disabled);
  *   jump    — member-restricted min-label PLUS path halving: after each
  *             neighbor-min update, label(x) ← min(label(x), label(label(x)))
  *             via one extra members-sized self-join per iteration. Same
  *             fixpoint (min reachable id — labels always point at member
  *             ids, monotonically non-increasing along reachability);
  *             iterations drop from O(diameter) to O(log diameter), which
  *             also makes convergence within maxIters exponentially more
  *             robust for chain-shaped clusters.
  *
  * Two graph shapes: the REALISTIC one (minhash pairs over a ScaleGen'd
  * corpus — near-dup clusters are shallow clique families, diameter ~1-2)
  * and a deep-chain stress (diameter 500), where iteration count is the
  * whole cost. Outputs are asserted identical across variants.
  *
  * Usage: runMain graft.ClusterLoopProbe [sf1Dir]
  */
object ClusterLoopProbe {

  /** r20-era loop: corpus-wide labels, two full-width shuffles/iteration. */
  private def clustersOld(ids: DataFrame, edges: DataFrame,
      maxIters: Int): DataFrame = {
    var labels = ids.select(col("id"), col("id").as("cluster"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("cluster", "nc"), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("nc")).as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"),
          (col("nmin").isNotNull && col("nmin") < col("cluster")).as("__changed"))
        .localCheckpoint(eager = true)
      val changed = updated.filter(col("__changed")).limit(1).count()
      labels = updated.drop("__changed")
      converged = changed == 0
      iter += 1
    }
    System.err.println(s"[clusterloop]   old iters=$iter")
    labels
  }

  /** Candidate: member-restricted loop + path halving. */
  private def clustersJump(ids: DataFrame, edges: DataFrame,
      maxIters: Int): DataFrame = {
    val members = edges.select(col("a").as("id")).distinct()
      .localCheckpoint(eager = false)
    var labels = members.select(col("id"), col("id").as("cluster"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("cluster", "nc"), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("nc")).as("nmin"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"),
          (col("nmin").isNotNull && col("nmin") < col("cluster")).as("__c1"))
      // path halving: follow the label one hop (labels point at member ids)
      val jumped = stepped.join(
          stepped.select(col("id").as("__lk"), col("cluster").as("__gp")),
          stepped("cluster") === col("__lk"), "left")
        .select(stepped("id"),
          least(stepped("cluster"), coalesce(col("__gp"), stepped("cluster"))).as("cluster"),
          (stepped("__c1") ||
            (col("__gp").isNotNull && col("__gp") < stepped("cluster"))).as("__changed"))
        .localCheckpoint(eager = true)
      val changed = jumped.filter(col("__changed")).limit(1).count()
      labels = jumped.drop("__changed")
      converged = changed == 0
      iter += 1
    }
    System.err.println(s"[clusterloop]   jump iters=$iter")
    ids.select(col("id"))
      .join(labels.withColumnRenamed("cluster", "__c"), Seq("id"), "left")
      .select(col("id"), coalesce(col("__c"), col("id")).as("cluster"))
  }

  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[clusterloop] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def run(shape: String, ids: DataFrame, edgesSym: DataFrame, maxIters: Int): Unit = {
      val e = edgesSym.localCheckpoint(eager = true)
      val i = ids.localCheckpoint(eager = true)
      System.err.println(s"[clusterloop] shape=$shape ids=${i.count()} symEdges=${e.count()}")
      val old = time(s"$shape old(corpus-labels)") {
        clustersOld(i, e, maxIters).localCheckpoint(eager = true) }
      // current shipped branch, via the public operator with the driver
      // path forced off (pairs = one direction; dupClusters symmetrizes)
      val pairs = e.filter(col("a") < col("b"))
        .select(col("a").as("id1"), col("b").as("id2"))
      val cur = time(s"$shape current(member loop)") {
        graft.llm.Dedup.dupClusters(i, "id", pairs, maxIters,
          smallEdgeThreshold = 0L).localCheckpoint(eager = true) }
      val jmp = time(s"$shape jump(path halving)") {
        clustersJump(i, e, maxIters).localCheckpoint(eager = true) }
      val d1 = old.except(cur).count() + cur.except(old).count()
      val d2 = cur.except(jmp).count() + jmp.except(cur).count()
      assert(d1 == 0, s"$shape: old vs current diverged ($d1 rows)")
      assert(d2 == 0, s"$shape: current vs jump diverged ($d2 rows)")
      System.err.println(s"[clusterloop] $shape: all three variants label-identical")
      Seq(old, cur, jmp, e, i).foreach(df =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false)))
    }

    val chainOnly = args.contains("--chain-only")
    val realOnly = args.contains("--real-only")
    if (!chainOnly) {
    // shape 1: REALISTIC — minhash near-dup pairs over the ScaleGen corpus
    // (clique families, shallow). Falls back to sf0.1 documents if sf1 is
    // not generated.
    val docsPath = if (new java.io.File(s"$sf1/documents.parquet").exists()) s"$sf1/documents.parquet"
      else "/root/testdata/sf0.1/documents.parquet"
    val docs = spark.read.parquet(docsPath).select(col("doc_id"), col("text"))
    val realPairs = time("sf1 minhash pair generation") {
      graft.llm.Dedup.minhashDupPairs(docs, "doc_id", "text", threshold = 0.8)
        .select(col("id1").as("a"), col("id2").as("b"))
        .localCheckpoint(eager = true)
    }
    val realSym = realPairs.select(col("a"), col("b"))
      .unionAll(realPairs.select(col("b").as("a"), col("a").as("b")))
    run("sf1-neardup", docs.select(col("doc_id").as("id")), realSym, maxIters = 10)
    }
    if (!realOnly) {
    // shape 2: deep chains — 200 chains x 500 nodes (diameter 500), plus
    // 100k isolated ids so the old loop pays its corpus carry
    val chain = spark.range(100000L)
      .select(col("id"), (col("id") % 500).as("pos"))
      .filter(col("pos") > 0)
      .select(col("id").as("a"), (col("id") - 1).as("b"))
    val chainSym = chain.unionAll(chain.select(col("b").as("a"), col("a").as("b")))
    val chainIds = spark.range(200000L).select(col("id"))
    if (chainOnly) {
      // jump only, asserted against the analytic truth (chain k owns ids
      // [500k, 500k+499], cluster = 500k; isolated ids cluster = self) —
      // old/current were measured by the full run already (~254/256 s)
      val e = chainSym.localCheckpoint(eager = true)
      val i = chainIds.localCheckpoint(eager = true)
      val jmp = time("chain-500 jump(path halving)") {
        clustersJump(i, e, 600).localCheckpoint(eager = true) }
      val expected = spark.range(200000L).select(col("id"),
        when(col("id") < 100000L, col("id") - (col("id") % 500))
          .otherwise(col("id")).as("cluster"))
      val d = jmp.except(expected).count() + expected.except(jmp).count()
      assert(d == 0, s"chain-500: jump diverged from analytic truth ($d rows)")
      System.err.println("[clusterloop] chain-500: jump matches analytic truth")
    } else run("chain-500", chainIds, chainSym, maxIters = 600)
    }
    spark.stop()
  }
}
