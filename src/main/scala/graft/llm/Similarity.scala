package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan the
  * corpus once — at 100 TB this is one pass, embarrassingly parallel).
  * Scale path: random-hyperplane LSH bucketing so each query only scans
  * its bucket.
  */
object Similarity {

  /** Ascending-index dot product in double via the codegen'd
    * [[graft.functions.vector.DotProduct]] kernel — same summation order as
    * the sequential fold it replaced and as the oracle's list_sum, so
    * results are bit-identical; ~10× less per-pair overhead than the
    * interpreted higher-order `aggregate(zip_with(...))`.
    */
  def dot(a: Column, b: Column): Column = graft.functions.vector.dot_product(a, b)

  def norm(a: Column): Column = graft.functions.vector.l2_norm(a)

  /** cosine = dot / (|a| * |b|), computed as dot / (sqrt(na) * sqrt(nb)). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Symmetric per-vector int8 quantization — the standard 4× storage cut
    * for embedding corpora at scale: q_i = round(127 · v_i / max|v|), with
    * the per-vector scale kept alongside for dequantization
    * (v ≈ q · scale / 127). Pure narrow projection, streaming-safe. All
    * float math in DOUBLE so the oracle reproduces values bit-for-bit
    * (float32 lanes would diverge between engines); the rounding rule is
    * spelled out as floor(|x|·127/s + 0.5)·sign(x) — half away from zero —
    * rather than engine-native round(), because Spark's and DuckDB's
    * round() may disagree on half-way doubles while floor/abs/sign are
    * plain IEEE ops both engines evaluate identically. All-zero vectors
    * keep scale 0 and an all-zero code array. Adds `<vecCol>_q8`
    * (array<tinyint>) and `<vecCol>_scale` (double, the max|v|).
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = transform(col(s"`$vecCol`"), x => x.cast("double"))
    val scale = array_max(transform(v, x => abs(x)))
    df.withColumn(s"${vecCol}_scale", scale)
      .withColumn(s"${vecCol}_q8",
        when(col(s"${vecCol}_scale") > 0,
          transform(v, x =>
            (floor(abs(x) * 127.0d / col(s"${vecCol}_scale") + 0.5d) *
              signum(x)).cast("tinyint")))
          .otherwise(transform(v, x => lit(0).cast("tinyint"))))
  }

  /** Dequantize [[quantizeInt8]] output back to doubles. */
  def dequantizeInt8(qCol: Column, scaleCol: Column): Column =
    transform(qCol, q => q.cast("double") * scaleCol / 127.0d)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded). Deterministic: rank on (rounded sim desc, id).
    * The query side is broadcast; the corpus is never collected.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    // norms precomputed once per vector, not once per pair — the pair loop
    // then costs one 64-wide fold instead of three
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qnorm"))
    val c = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), norm(col(vecCol)).as("nnorm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", round(
        dot(col("qvec"), col("nvec")) / (col("qnorm") * col("nnorm")), roundTo))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("qid", "nid", "sim")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * fuse N per-query rankings into one — score(q, d) = Σ over the
    * rankings containing d of 1 / (rrfK + rank). The standard hybrid-
    * retrieval combiner (BM25 lexical + dense cosine); a document missing
    * from a ranking simply contributes nothing. Each input carries
    * (queryCol, docCol, scoreCol); ranks derive per query as row_number
    * over (score desc, doc asc), so tied scores fuse deterministically.
    *
    * Scale shape: one KEYED window per ranking (partitionBy query — ranks
    * never leave the group), a union, ONE shuffle on (query, doc) for the
    * fuse sum, and a keyed top-k window. Nothing global, nothing
    * quadratic; skew is bounded by per-query candidate counts, which the
    * upstream top-k rankers already cap.
    */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, docCol: String,
      scoreCol: String, k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf_fuse: at least one ranking required")
    require(k > 0, s"rrf_fuse: k must be positive, got $k")
    require(rrfK >= 0, s"rrf_fuse: rrfK must be >= 0, got $rrfK")
    val wRank = Window.partitionBy(col("__q"))
      .orderBy(col("__s").desc, col("__d").asc)
    // rank on the NATIVE score type — a cast to double would collapse
    // distinct long scores above 2^53 into ties
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(s"`$queryCol`").as("__q"), col(s"`$docCol`").as("__d"),
          col(s"`$scoreCol`").as("__s"))
        .withColumn("__i", lit(i))
        .withColumn("__c",
          lit(1.0d) / (lit(rrfK.toDouble) + row_number().over(wRank)))
        .drop("__s")
    }
    val wTop = Window.partitionBy(col("__q"))
      .orderBy(col("rrf").desc, col("__d").asc)
    // the fuse sum folds in FIXED ranking order (__i), not partition
    // arrival order — FP addition is non-associative, so with 3+ rankings
    // a plain sum() would be layout-dependent in the last ulp and the
    // rounded rrf could flip across runs
    contribs.reduce(_ unionByName _)
      .groupBy(col("__q"), col("__d"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__i"), col("__c")))),
          x => x.getField("__c")),
        lit(0.0d), (a, x) => a + x).as("rrf"))
      .withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") <= k)
      .select(col("__q").as(queryCol), col("__d").as(docCol), col("rrf"))
  }

  /** Embedding-cosine near-duplicate pairs: all (id1 < id2) with rounded
    * cosine ≥ threshold. Quadratic baseline; block with [[lshBuckets]] at
    * scale.
    */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, roundTo: Int = 6): DataFrame = {
    val a = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id1"), col(vecCol).as("v1"), norm(col(vecCol)).as("n1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("v2"), norm(col(vecCol)).as("n2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("sim", round(dot(col("v1"), col("v2")) / (col("n1") * col("n2")), roundTo))
      .filter(col("sim") >= threshold)
      .select("id1", "id2", "sim")
  }

  /** LSH-bucketed near-duplicate PAIRS over embeddings — the scale path
    * [[cosineDupPairs]] baselines (that form is quadratic in the corpus;
    * this one only compares pairs sharing a (table, bucket) key). Exact
    * cosine verifies every candidate, so precision is exact; recall at
    * high thresholds is effectively exact too: P(miss) = (1-(1-θ/π)^p)^t —
    * for sim ≥ 0.99 (θ ≈ 8°), p = 8 planes, t = 16 tables that is ~7e-9,
    * which is why the gate can hold this against the same exhaustive
    * oracle as the quadratic form. Lower thresholds widen the miss
    * probability — pair with a recall gate there.
    */
  /** Vector dimension probe: one 1-row job; None when the frame is empty
    * (so callers can return an empty result instead of throwing).
    */
  private[graft] def probeDim(df: DataFrame, vecCol: String): Option[Int] =
    df.select(size(col(vecCol)).as("d")).head(1).headOption.map(_.getInt(0))

  /** Shared LSH staging: (id_<side>, v_<side>, n_<side>, tbl, bucket) rows,
    * one per (vector, table) — the single place the bucketing contract
    * (plane seeding, explode shape, vectors outside `dim` dropped) lives
    * for the self-pair, cross-corpus, and streaming-flag operators.
    */
  private[graft] def lshStaged(df: DataFrame, idCol: String, vecCol: String,
      side: String, numPlanes: Int, numTables: Int, dim: Int): DataFrame =
    df.filter(size(col(s"`$vecCol`")) === dim)
      .select(col(s"`$idCol`").as(s"id_$side"), col(s"`$vecCol`").as(s"v_$side"),
        norm(col(s"`$vecCol`")).as(s"n_$side"),
        posexplode(lshTableBuckets(col(s"`$vecCol`"), numPlanes, numTables, dim))
          .as(Seq("tbl", "bucket")))

  def lshCosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 8, numTables: Int = 16,
      roundTo: Int = 6, shuffleVectors: Boolean = true): DataFrame = {
    val dim = probeDim(df, vecCol).getOrElse(
      return df.limit(0).select(col(idCol).as("id1"), col(idCol).as("id2"),
        lit(0.0d).as("sim")))
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (!shuffleVectors) {
      // signature-only staging: only (id, tbl, bucket) — ~16 bytes/row —
      // rides the ×numTables (tbl,bucket) exchange; candidate pairs are
      // deduped FIRST and the two vector fetches shuffle the corpus ONCE
      // per side keyed by id. At wide dims / many tables this cuts exchange
      // bytes by ~numTables×; at gate scale the two extra joins dominate —
      // measured in SF1_SMOKE.md (round 12), default stays full-vector.
      // no size filter: the full-vector self path stages every vector, so
      // the opt-in path must see the same rows to return the same pairs
      val base = df.repartition(par)
        .select(col(s"`$idCol`").as("id"), col(s"`$vecCol`").as("v"),
          norm(col(s"`$vecCol`")).as("n"))
      val sig = base.select(col("id"),
        posexplode(lshTableBuckets(col("v"), numPlanes, numTables, dim))
          .as(Seq("tbl", "bucket")))
      val cand = sig.as("a").join(sig.as("b"), Seq("tbl", "bucket"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"))
        .dropDuplicates("id1", "id2")
      return cand
        .join(base.select(col("id").as("id1"), col("v").as("v1"),
          col("n").as("n1")), Seq("id1"))
        .join(base.select(col("id").as("id2"), col("v").as("v2"),
          col("n").as("n2")), Seq("id2"))
        .withColumn("sim", round(
          dot(col("v1"), col("v2")) / (col("n1") * col("n2")), roundTo))
        .filter(col("sim") >= threshold)
        .select(col("id1"), col("id2"), col("sim"))
        // duplicated ids fan candidate pairs back out through the fetch
        // joins — re-dedup so both modes return the same row set
        .dropDuplicates("id1", "id2")
    }
    val e = df.repartition(par).select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("n"),
      posexplode(lshTableBuckets(col(vecCol), numPlanes, numTables, dim))
        .as(Seq("tbl", "bucket")))
    // score before deduping (same trade as lshCosineTopK: shuffle scalars,
    // recompute the codegen dot per extra collision)
    e.as("a").join(e.as("b"), Seq("tbl", "bucket"))
      .filter(col("a.id") < col("b.id"))
      .withColumn("sim", round(
        dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")), roundTo))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("sim"))
      .dropDuplicates("id1", "id2")
  }

  /** Cross-corpus embedding near-dup: which PROBE vectors (a new crawl
    * shard, a candidate eval set) already live in the REFERENCE corpus at
    * cosine ≥ threshold — the embedding twin of
    * [[Dedup.crossCorpusDupPairs]], completing the dedup matrix
    * (text self / text cross / embedding self / embedding cross). Both
    * sides bucket through the SAME deterministic hyperplane tables, so
    * candidates come from an equi-join on (table, bucket) — probe × ref is
    * never materialized — and every candidate is verified with the exact
    * codegen dot. At near-dup thresholds the per-pair LSH miss probability
    * is the same vanishing bound as [[lshCosineDupPairs]]; the gate holds
    * this path to an exhaustive DuckDB oracle. Emits (id1 = probe,
    * id2 = ref, sim), deduped per pair.
    */
  def crossCorpusCosineDupPairs(probe: DataFrame, ref: DataFrame,
      idCol: String, vecCol: String, threshold: Double, numPlanes: Int = 8,
      numTables: Int = 16, roundTo: Int = 6,
      shuffleVectors: Boolean = true): DataFrame = {
    val empty = probe.limit(0).select(col(idCol).as("id1"),
      col(idCol).as("id2"), lit(0.0d).as("sim"))
    // an empty side is a legal no-op, but a dimension MISMATCH means the two
    // corpora came from different embedding models — "no duplicates found"
    // on that input would silently keep every near-dup, so fail loudly
    val dim = probeDim(probe, vecCol).getOrElse(return empty)
    probeDim(ref, vecCol) match {
      case None => return empty
      case Some(refDim) => require(refDim == dim,
        s"cross_corpus_dup_pairs: ref dim $refDim != probe dim $dim — " +
          "the two sides must come from the same embedding model")
    }
    val par = probe.sparkSession.sparkContext.defaultParallelism
    if (!shuffleVectors) {
      // signature-only staging (see lshCosineDupPairs): dedup candidate
      // (probe, ref) id pairs first, then fetch each side's vectors with
      // one id-keyed join per side instead of riding them ×numTables
      // through the (tbl,bucket) exchange
      def side(d: DataFrame, tag: String): (DataFrame, DataFrame) = {
        val base = d.repartition(par).filter(size(col(s"`$vecCol`")) === dim)
          .select(col(s"`$idCol`").as(s"id_$tag"), col(s"`$vecCol`").as(s"v_$tag"),
            norm(col(s"`$vecCol`")).as(s"n_$tag"))
        val sig = base.select(col(s"id_$tag"),
          posexplode(lshTableBuckets(col(s"v_$tag"), numPlanes, numTables, dim))
            .as(Seq("tbl", "bucket")))
        (base, sig)
      }
      val (pBase, pSig) = side(probe, "p")
      val (rBase, rSig) = side(ref, "r")
      return pSig.join(rSig, Seq("tbl", "bucket"))
        .select(col("id_p"), col("id_r")).dropDuplicates("id_p", "id_r")
        .join(pBase, Seq("id_p")).join(rBase, Seq("id_r"))
        .withColumn("sim", round(
          dot(col("v_p"), col("v_r")) / (col("n_p") * col("n_r")), roundTo))
        .filter(col("sim") >= threshold)
        .select(col("id_p").as("id1"), col("id_r").as("id2"), col("sim"))
        // duplicated ids fan candidate pairs back out through the fetch
        // joins — re-dedup so both modes return the same row set
        .dropDuplicates("id1", "id2")
    }
    lshStaged(probe.repartition(par), idCol, vecCol, "p", numPlanes, numTables, dim)
      .join(lshStaged(ref.repartition(par), idCol, vecCol, "r",
        numPlanes, numTables, dim), Seq("tbl", "bucket"))
      .withColumn("sim", round(
        dot(col("v_p"), col("v_r")) / (col("n_p") * col("n_r")), roundTo))
      .filter(col("sim") >= threshold)
      .select(col("id_p").as("id1"), col("id_r").as("id2"), col("sim"))
      .dropDuplicates("id1", "id2")
  }

  /** Semantic decontamination: drop training rows whose embedding sits at
    * cosine ≥ `threshold` to ANY benchmark embedding — the embedding twin
    * of [[Dedup.decontaminate]] (winnow n-gram overlap), for the
    * paraphrased-contamination case exact substrings miss. Candidates via
    * [[crossCorpusCosineDupPairs]] (shared hyperplane buckets, exact-dot
    * verify), then one left_anti join; train × benchmark is never
    * materialized and the benchmark side is the small one by construction.
    */
  def semDecontaminate(train: DataFrame, idCol: String, vecCol: String,
      benchmark: DataFrame, threshold: Double, numPlanes: Int = 8,
      numTables: Int = 16): DataFrame = {
    // a silent keep-everything on misconfiguration would ship contaminated
    // training data: an empty benchmark is a legal no-op, but a DIMENSION
    // mismatch (wrong embedding model on one side) must fail loudly
    (probeDim(benchmark, vecCol), probeDim(train, vecCol)) match {
      case (None, _) | (_, None) => return train
      case (Some(b), Some(t)) => require(b == t,
        s"semantic_decontaminate: benchmark dim $b != train dim $t — " +
          "the two sides must come from the same embedding model")
    }
    val flagged = crossCorpusCosineDupPairs(train, benchmark, idCol, vecCol,
      threshold, numPlanes, numTables)
      .select(col("id1").as(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** splitmix64 — deterministic driver-side PRNG for plane components. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hyperplane for (table, plane): deterministic pseudo-random components
    * in [-1, 1]. Computed ONCE on the driver — the planes are constants, so
    * they are baked in as float literals feeding the codegen
    * [[graft.functions.vector.DotProduct]] kernel. The earlier form derived
    * each component per row with interpreted zip_with/aggregate lambdas
    * (numTables × numPlanes × dim hash evaluations per row) — the dominant
    * cost of the whole LSH pipeline.
    */
  private def planeOf(table: Int, p: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      (math.floorMod(mix64(((table.toLong * 64L + p) << 24) | i.toLong),
        2000001L) - 1000000L) / 1000000.0d
    }

  /** Random-hyperplane LSH bucket id (sign bits of numPlanes projections)
    * for one hash table. Vectors in the same bucket are likely-similar;
    * search within buckets only.
    */
  def lshBuckets(vec: Column, numPlanes: Int, table: Int, dim: Int): Column = {
    val planes = Array(Array.tabulate(numPlanes)(p => planeOf(table, p, dim).map(_.toFloat)))
    element_at(graft.functions.vector.lsh_buckets(vec, planes), 1)
  }

  /** Bucket-per-table array for all hash tables (element t = table t's
    * bucket id) — posexplode to (tbl, bucket). OR-amplification: a candidate
    * only needs to collide in ONE table, so recall grows with numTables
    * while each table's numPlanes keeps bucket sizes (and thus the
    * per-bucket scan cost) small. The plane tensor rides as one codegen
    * reference object ([[graft.functions.vector.LshBuckets]]) — the earlier
    * unrolled form put numTables × numPlanes × dim float literals in the
    * plan, the same plan-size wall the IVF centroids hit; bucket ids are
    * bit-identical.
    */
  private[graft] def lshTableBuckets(vec: Column, numPlanes: Int, numTables: Int,
      dim: Int): Column = {
    val planes = Array.tabulate(numTables, numPlanes)((t, p) =>
      planeOf(t, p, dim).map(_.toFloat))
    graft.functions.vector.lsh_buckets(vec, planes)
  }

  /** Per-cell similarity scores for argmax/ordering: element i is
    * dot(vec, centroid_i) / |centroid_i| — cosine scaled by the row's own
    * |vec|, a positive per-row constant, so argmax and top-nProbe order are
    * identical to cosine while skipping the per-row norm entirely. The
    * centroid table is embedded as one codegen reference object
    * ([[graft.functions.vector.CentroidSims]]) — the earlier unrolled
    * `array(dot(vec, literals) / lit(cn), ...)` form generated O(nCells ×
    * dim) code and capped cell counts at O(100s); the kernel keeps the plan
    * O(1) in nCells with bit-identical arithmetic, so 100 TB-scale cell
    * counts (thousands) are plan-safe.
    */
  private def cellSims(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.vector.centroid_sims(vec, centroids)

  /** Nearest-cell id (1-based, first index among ties — same contract as
    * `array_position(sims, array_max(sims))`). `sims` must be a bound
    * attribute, not the producing expression: referencing an expensive alias
    * twice keeps CollapseProject from inlining it, so the sims array is
    * computed once per row.
    */
  private def argmaxCell(sims: Column): Column =
    array_position(sims, array_max(sims)).cast("int")

  /** K-means (Lloyd) refinement of an initial centroid table, run as
    * DataFrame jobs: assign every training vector to its nearest centroid,
    * recompute per-cell component means via posexplode + groupBy(cell, pos)
    * (a map-side-combinable agg — the collect is bounded at nCells × dim
    * rows), repeat. Components are rounded to 6 dp so float summation order
    * can't leak into the result. Empty cells keep their previous centroid.
    * Callers pass a bounded, checkpointed sample as `train` so each Lloyd
    * step is one scan of a small cached frame, not the full corpus.
    */
  private def kmeansRefine(train: DataFrame, vecCol: String,
      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    var centroids = init
    val dim = init.head.length
    for (_ <- 0 until iters) {
      val assigned = train
        .withColumn("__sims", cellSims(col(vecCol), centroids))
        .withColumn("cell", argmaxCell(col("__sims")))
      val means = assigned.select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0) - 1)(r.getInt(1)) =
          math.rint(r.getDouble(2) * 1e6) / 1e6
      }
      require(next.forall(_.length == dim))
      centroids = next
    }
    centroids
  }

  /** IVF-style approximate top-k: k-means-quantize every corpus vector to
    * its nearest of `nCells` centroids (seeded by a deterministic stride
    * sample, refined by `kmeansIters` Lloyd steps), then rank only within
    * the `nProbe` cells nearest to each query. One bounded collect per
    * Lloyd step for the centroid table (broadcast as literals), one shuffle
    * on the cell id — the standard inverted-file layout. Raising nProbe
    * trades candidate-scan cost for recall.
    */
  /** Deterministic IVF centroid training: stride-sampled seeds refined by
    * Lloyd steps over a bounded, checkpointed hash-sample of the corpus.
    * Public so batch [[ivfCosineTopK]] and the streaming IVF path
    * (StreamingOps.ivfTopKStream) share one centroid table.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 16, kmeansIters: Int = 5,
      trainTarget: Int = 4096): Array[Array[Double]] = {
    val n = corpus.count()
    val stride = math.max(1L, n / nCells)
    val seed = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .limit(nCells)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .collect()
      // float corpora and double corpora (rotated/OPQ vectors) both train
      .map(r => r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray)
    require(seed.nonEmpty, "trainCentroids: empty centroid sample")
    // Lloyd steps run on a deterministic hash-sampled projection of ≈
    // trainTarget rows, checkpointed once — each iteration scans a small
    // cached frame instead of re-reading the full corpus. Sampling only
    // moves centroids, never candidates; recall is gated downstream.
    val trainMod = math.max(1L, n / math.max(trainTarget, nCells).toLong)
    val train = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(trainMod)) === 0)
      .select(col(vecCol))
      .localCheckpoint()
    kmeansRefine(train, vecCol, seed, kmeansIters)
  }

  /** Explode each row into its `nProbe` nearest cells (1-based cell ids) —
    * the query-side half of the IVF probe, reusable on streaming frames
    * (pure per-row expressions, no state). Sort struct(-sim, idx) ascending
    * and slice the head; the sequence length is the driver-known centroid
    * count, NOT the requested nCells: the stride seed can yield fewer
    * centroids, and a longer sequence would null-pad the zip — ghost
    * struct(null, idx) entries sort first and silently eat probe slots.
    */
  def withProbeCells(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val nActual = centroids.length
    val probes = math.min(nProbe, nActual)
    val sims = cellSims(col(vecCol), centroids)
    val zipped = zip_with(col("__sims"), sequence(lit(1), lit(nActual)),
      (s, i) => struct((-s).as("neg"), i.as("idx")))
    df.withColumn("__sims", sims)
      .withColumn("cell", explode(
        transform(slice(array_sort(zipped), 1, probes),
          s => s.getField("idx").cast("int"))))
      .drop("__sims")
  }

  /** Assign each row its nearest cell id (1-based) — the corpus-side half. */
  def withCell(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("__sims", cellSims(col(vecCol), centroids))
      .withColumn("cell", argmaxCell(col("__sims")))
      .drop("__sims")

  def ivfCosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 8,
      kmeansIters: Int = 5, roundTo: Int = 6, trainTarget: Int = 4096): DataFrame = {
    val centroids = trainCentroids(corpus, idCol, vecCol, nCells, kmeansIters, trainTarget)
    val q = withProbeCells(queries, vecCol, centroids, nProbe)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        norm(col(vecCol)).as("qnorm"), col("cell"))
    val c = withCell(corpus, vecCol, centroids)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"),
        norm(col(vecCol)).as("nnorm"), col("cell"))
    val scored = c.join(q, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", round(
        dot(col("qvec"), col("nvec")) / (col("qnorm") * col("nnorm")), roundTo))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("qid", "nid", "sim")
  }

  /** Bucketed approximate top-k: exact cosine rank, but only among corpus
    * vectors sharing one of the query's LSH buckets across `numTables`
    * independent hash tables. Each side explodes ×numTables and joins on
    * (table, bucket) — the standard multi-table LSH cost; candidates are
    * deduped on (qid, nid) before ranking.
    */
  def lshCosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int = 4, numTables: Int = 16,
      roundTo: Int = 6): DataFrame = {
    // one 1-row job: the plane literals need the (uniform) vector dimension
    val dim = probeDim(corpus, vecCol).getOrElse(
      return queries.limit(0).select(col(idCol).as("qid"), col(idCol).as("nid"),
        lit(0.0d).as("sim")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qnorm"),
      posexplode(lshTableBuckets(col(vecCol), numPlanes, numTables, dim))
        .as(Seq("tbl", "bucket")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      norm(col(vecCol)).as("nnorm"),
      posexplode(lshTableBuckets(col(vecCol), numPlanes, numTables, dim))
        .as(Seq("tbl", "bucket")))
    // score BEFORE deduping: sim is identical for every table a pair
    // collides in, so the dedup shuffle carries (qid, nid, sim) scalars
    // instead of two vectors per candidate — recomputing a codegen dot per
    // extra collision is far cheaper than shuffling the vectors at scale
    val scored = c.join(q, Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", round(
        dot(col("qvec"), col("nvec")) / (col("qnorm") * col("nnorm")), roundTo))
      .select("qid", "nid", "sim")
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("qid", "nid", "sim")
  }

  /** Whole-corpus kNN graph (every row's k nearest neighbors by cosine) —
    * the substrate for SemDeDup-style pruning, dataset cartography, and
    * graph-based quality propagation. `method`:
    *   - "lsh" (default): the scale path — both sides bucket through
    *     [[lshCosineTopK]]'s (table, bucket) equi-join; candidate count is
    *     Σ|bucket|² per table, never N². Approximate (recall-gated).
    *   - "ivf": cell-pruned variant via [[ivfCosineTopK]] with the corpus
    *     itself as the query side.
    *   - "brute": exact O(N²) baseline — the oracle anchor; it broadcasts
    *     the query side, so only use it on corpora that fit a broadcast
    *     (gates, samples, rerank shortlists).
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int,
      method: String = "lsh"): DataFrame = {
    val self = df.select(col(s"`$idCol`"), col(s"`$vecCol`"))
    method match {
      case "lsh"   => lshCosineTopK(self, self, idCol, vecCol, k)
      case "ivf"   => ivfCosineTopK(self, self, idCol, vecCol, k)
      case "brute" => cosineTopK(self, self, idCol, vecCol, k)
      case other => throw new IllegalArgumentException(
        s"knn_graph: method must be lsh|ivf|brute, got $other")
    }
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540 — public method; the reference repo has no
    * equivalent): cluster the embedding space into cells, then within each
    * cell drop every document whose cosine similarity (rounded to
    * `roundTo`, same convention as [[cosineDupPairs]]) to a LOWER-id
    * document in the same cell reaches `threshold`. Candidate generation
    * is the within-cell self-join — the paper's core trick: cross-cell
    * pairs are never materialized, so the pair space is Σ|cell|² instead
    * of N², and the join is an equi-join on the cell id
    * (shuffle-partitionable; a skewed giant cell is AQE-splittable because
    * the exact-cosine filter runs after the join, not inside a custom
    * comparator). Keep rule: lowest id survives (the paper keeps the point
    * nearest the centroid; min-id is deterministic under re-clustering,
    * re-partitioning, and re-runs — the property a reproducible corpus
    * build needs). Returns the kept rows with their `cell` id.
    */
  def semDedupWithCentroids(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], threshold: Double,
      roundTo: Int = 6): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val cells = withCell(df.repartition(par), vecCol, centroids)
    val a = cells.select(col(idCol).as("__id1"), col(vecCol).as("__v1"),
      norm(col(vecCol)).as("__n1"), col("cell"))
    val b = cells.select(col(idCol).as("__id2"), col(vecCol).as("__v2"),
      norm(col(vecCol)).as("__n2"), col("cell"))
    // a doc is dropped when ANY smaller-id same-cell doc is near it — the
    // witness itself need not survive (one anti-join, no iteration; same
    // greedy rule NVIDIA NeMo-Curator ships for semantic dedup)
    val dropped = a.join(b, Seq("cell"))
      .filter(col("__id1") < col("__id2"))
      .filter(round(dot(col("__v1"), col("__v2")) / (col("__n1") * col("__n2")),
        roundTo) >= threshold)
      .select(col("__id2").as(idCol)).distinct()
    cells.join(dropped, Seq(idCol), "left_anti")
  }

  /** [[semDedupWithCentroids]] with centroids trained by the IVF k-means
    * path ([[trainCentroids]]: deterministic stride seeds + Lloyd steps
    * over a bounded sample). `nCells` governs the pair-space compression:
    * E[Σ|cell|²] ≈ N²/nCells for balanced cells, so at corpus scale pick
    * nCells ∝ N / (target cell size).
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCells: Int = 16, kmeansIters: Int = 5): DataFrame = {
    val cents = trainCentroids(df.select(col(idCol), col(vecCol)), idCol,
      vecCol, nCells, kmeansIters)
    semDedupWithCentroids(df, idCol, vecCol, cents, threshold)
  }

  /** One-row invariant gate for [[semDedup]]: after dedup, no two KEPT
    * documents in the same cell may still be near-duplicates, and every
    * input row is either kept or dropped (no loss, no invention). Pinning
    * the booleans (not the kept count) keeps the gate robust to centroid
    * evolution while still tripping on a broken keep rule.
    */
  def semDedupGate(input: DataFrame, kept: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    // the gate fires two actions over `kept` (pair scan + count); pin the
    // dedup pipeline's result so it runs once, not per action
    val keptPinned = kept.localCheckpoint(eager = false)
    val survivors = keptPinned.select(col(idCol).as("__id1"), col(vecCol).as("__v1"),
      norm(col(vecCol)).as("__n1"), col("cell"))
    val pairsLeft = survivors
      .join(survivors.select(col("__id1").as("__id2"), col("__v1").as("__v2"),
        col("__n1").as("__n2"), col("cell")), Seq("cell"))
      .filter(col("__id1") < col("__id2"))
      .filter(round(dot(col("__v1"), col("__v2")) / (col("__n1") * col("__n2")), 6)
        >= threshold)
      .count()
    val nIn = input.count()
    val nKept = keptPinned.count()
    input.sparkSession.range(1).select(
      lit(nIn).as("n_input"),
      lit(pairsLeft == 0).as("no_kept_dups"),
      lit(nKept > 0 && nKept <= nIn).as("kept_in_bounds"))
  }

  // ---------------------------------------------------------------- PQ ---

  /** Product-quantization codebooks (Jégou et al., TPAMI 2011 — public
    * method): the vector is cut into `m` contiguous subvectors of dim/m
    * components and each subspace gets its own `k`-centroid k-means
    * codebook, so a d-dim float vector stores as m small codes (m bytes at
    * k ≤ 256 — a 32× storage cut at d=64/m=8 over float32) while distances
    * are approximated per-subspace from the codebooks. Training reuses the
    * deterministic IVF machinery ([[trainCentroids]]: stride seeds + Lloyd
    * over a bounded checkpointed sample) once per subspace on the SLICED
    * corpus — m bounded driver collects of k × dim/m doubles, never the
    * corpus. Returns codebooks(s)(j) = centroid j of subspace s.
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, kmeansIters: Int = 4,
      trainTarget: Int = 4096): Array[Array[Array[Double]]] = {
    val dim = probeDim(corpus, vecCol).getOrElse(
      throw new IllegalArgumentException("pqTrain: empty corpus"))
    require(dim % m == 0, s"pqTrain: dim $dim not divisible by m $m")
    val dsub = dim / m
    // ONE count + ONE hash-sampled checkpoint of the full vectors; each
    // subspace then trains on a narrow slice of the cached sample (the
    // naive per-subspace trainCentroids calls re-counted and re-sampled
    // the corpus m times — m extra full scans for identical samples)
    val n = corpus.count()
    val trainMod = math.max(1L, n / math.max(trainTarget, k).toLong)
    val sample = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(trainMod)) === 0)
      .select(col(idCol), col(vecCol))
      .localCheckpoint()
    pqTrainOnSample(sample, idCol, vecCol, m, dsub, k, kmeansIters)
  }

  /** Train all `m` subspace codebooks JOINTLY over one checkpointed sample:
    * one seed collect (full vectors, sliced on the driver) plus ONE
    * assignment+means job per Lloyd iteration covering every subspace,
    * instead of m independent trainCentroids calls (m × (count + seed
    * collect + re-checkpoint + iters collects) sequential driver-blocking
    * jobs — at bench scale the job latency, not the arithmetic, was the
    * entire cost). Per-subspace math is unchanged: same stride seed rows
    * (the pmod/limit predicate is slice-independent, so every subspace
    * always drew the same ids), same CentroidSims assignment kernel on the
    * same slice, same per-(cell,component) avg with the same 6-dp rint,
    * empty cells keep their previous centroid.
    */
  private def pqTrainOnSample(sample: DataFrame, idCol: String,
      vecCol: String, m: Int, dsub: Int, k: Int,
      kmeansIters: Int): Array[Array[Array[Double]]] = {
    val n = sample.count()
    val stride = math.max(1L, n / k)
    val seedFull = sample.filter(pmod(col(s"`$idCol`"), lit(stride)) === 0)
      .limit(k)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray)
    require(seedFull.nonEmpty, "pqTrain: empty centroid sample")
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(s => seedFull.map(v => v.slice(s * dsub, (s + 1) * dsub)))
    for (_ <- 0 until kmeansIters) {
      // bind each subspace's sims array once (CollapseProject would inline
      // the kernel into both argmax operands), then assign all m cells in
      // one narrow projection
      val withSims = codebooks.zipWithIndex.foldLeft(sample) { case (acc, (cb, s)) =>
        acc.withColumn(s"__sims$s",
          cellSims(slice(col(s"`$vecCol`"), s * dsub + 1, dsub), cb))
      }
      val assigned = withSims.withColumn("__cells",
        array((0 until m).map(s => argmaxCell(col(s"__sims$s"))): _*))
      val means = assigned
        .select(col("__cells"), posexplode(col(s"`$vecCol`")).as(Seq("pos", "x")))
        .select((col("pos") / dsub).cast("int").as("s"),
          pmod(col("pos"), lit(dsub)).as("sp"),
          element_at(col("__cells"), (col("pos") / dsub).cast("int") + 1).as("cell"),
          col("x"))
        .groupBy("s", "cell", "sp").agg(avg(col("x").cast("double")).as("m"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1) - 1)(r.getInt(2).toInt) =
          math.rint(r.getDouble(3) * 1e6) / 1e6
      }
      codebooks = next
    }
    codebooks
  }

  /** Driver-side L2 norms of one codebook, in the same ascending-index
    * summation order as the CentroidSims kernel and the DuckDB oracle.
    */
  private def cbNorms(cb: Array[Array[Double]]): Array[Double] =
    cb.map { c => var s = 0.0d; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }; math.sqrt(s) }

  /** 1-based code of one subvector: the L2-nearest codebook centroid,
    * first index among ties. argmin ‖v−c‖² = argmax (v·c − ‖c‖²/2) since
    * ‖v‖² is constant per row — which lets the assignment ride the same
    * codegen [[graft.functions.vector.CentroidSims]] kernel as IVF
    * (sims_j = v·c_j/‖c_j‖, so the score is sims_j·‖c_j‖ − ‖c_j‖²/2 via a
    * k-element zip_with over literal norms — k elements, not dim).
    */
  private def pqSubCode(sub: Column, cb: Array[Array[Double]]): Column = {
    val cn = cbNorms(cb)
    val scores = zip_with(cellSims(sub, cb),
      array(cn.map(n => lit(n)): _*),
      (s, n) => s * n - n * n / 2.0d)
    array_position(scores, array_max(scores)).cast("int")
  }

  /** Encode every row's vector to its m-byte PQ code array (1-based
    * centroid ids, subspace order). Pure narrow projection — the codebooks
    * ride as codegen reference objects; streaming-safe.
    */
  def pqEncode(df: DataFrame, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dsub = codebooks.head.head.length
    // each subspace's sims must be bound once (CollapseProject would
    // otherwise inline the kernel into both argmax operands)
    val withSubs = codebooks.zipWithIndex.foldLeft(df) { case (acc, (cb, s)) =>
      acc.withColumn(s"__pq$s",
        pqSubCode(slice(col(vecCol), s * dsub + 1, dsub), cb))
    }
    withSubs
      .withColumn(s"${vecCol}_pq",
        array((0 until m).map(s => col(s"__pq$s")): _*))
      .drop((0 until m).map(s => s"__pq$s"): _*)
  }

  /** Per-query flat ADC lookup table: element s·k + j (1-based) =
    * q_s · c_{s,j}, built from the same CentroidSims kernel as encoding so
    * the arithmetic ((dot/‖c‖)·‖c‖) is bit-stable against the oracle.
    * Pure narrow expression — shared by the batch ADC scans and the
    * streaming IVF-PQ probe.
    */
  def pqAdcTable(vec: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val dsub = codebooks.head.head.length
    flatten(array(codebooks.zipWithIndex.map { case (cb, s) =>
      val cn = cbNorms(cb)
      zip_with(cellSims(slice(vec, s * dsub + 1, dsub), cb),
        array(cn.map(n => lit(n)): _*), (sim, n) => sim * n)
    }: _*))
  }

  /** Asymmetric-distance (ADC) top-k by inner product: corpus rows are
    * scanned as their m-code arrays; each query precomputes ONCE its m×k
    * lookup table T[s·k+j] = q_s·c_{s,j} (a k·m-double column built from
    * the same CentroidSims kernel), so the per-pair cost is m table adds
    * instead of a d-wide dot — the compressed-domain scan that makes a
    * 100 TB corpus pass affordable. Approximate score = Σ_s T[code_s];
    * `refine` × k ADC survivors per query are exactly re-ranked on the
    * true dot (the standard shortlist+rerank recipe), output is the exact-
    * scored top k. Compose with [[withCell]]/[[withProbeCells]] for
    * IVF-PQ ([[ivfPqTopK]]) so the scan also skips cells.
    */
  def pqAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, codebooks: Array[Array[Array[Double]]],
      refine: Int = 4, roundTo: Int = 6): DataFrame = {
    val m = codebooks.length
    val kCents = codebooks.head.length
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
      .withColumn("__t", pqAdcTable(col("qvec"), codebooks))
    val c = pqEncode(
      corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism),
      vecCol, codebooks)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"),
        col(s"${vecCol}_pq").as("__code"))
    val adc = aggregate(
      zip_with(col("__code"), sequence(lit(0), lit(m - 1)),
        (code, s) => element_at(col("__t"), s * kCents + code)),
      lit(0.0d), (acc, x) => acc + x)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("__adc", adc)
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("__adc").desc, col("nid").asc)
    val shortlist = scored.withColumn("__rn", row_number().over(wAdc))
      .filter(col("__rn") <= k * refine)
      .withColumn("score", round(dot(col("qvec"), col("nvec")), roundTo))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    shortlist.withColumn("__rn2", row_number().over(w))
      .filter(col("__rn2") <= k)
      .select("qid", "nid", "score")
  }

  /** Sign-bit binary quantization: each vector becomes ceil(d/32) BIGINT
    * words of 32 sign bits (bit i of word w = 1 iff v[32w+i] > 0) — 32 bits
    * per word keeps every value in [0, 2^32), overflow-safe in any engine's
    * signed 64-bit arithmetic, so the codes (and the Hamming scan below)
    * are exactly replicable in the DuckDB oracle. 32× smaller than float32;
    * the coarse pre-filter tier under int8/PQ in a 100 TB retrieval stack.
    * Pure narrow projection of static-literal terms; streams and stays
    * codegen'd.
    */
  def binarize(df: DataFrame, vecCol: String, dest: String): DataFrame = {
    val dim = probeDim(df, vecCol).getOrElse(
      throw new IllegalArgumentException("binarize: empty input"))
    val nWords = (dim + 31) / 32
    val words = (0 until nWords).map { w =>
      (0 until 32).filter(i => w * 32 + i < dim).map { i =>
        when(element_at(col(s"`$vecCol`"), w * 32 + i + 1) > 0.0d,
          lit(1L << i)).otherwise(0L)
      }.reduce(_ + _)
    }
    df.withColumn(dest, array(words: _*))
  }

  /** Hamming distance between two binary codes (arrays of words). */
  def hammingDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0L), (acc, v) => acc + v.cast("long"))

  /** Exact top-k under Hamming distance over the binarized codes
    * (ascending distance, ties → ascending neighbor id). The compressed-
    * domain scan costs ceil(d/32) xor+popcounts per pair instead of a
    * d-wide float dot — the cheapest whole-corpus pass; integer distances
    * make the ranking engine-exact, so the gate is hash-exact rather than
    * recall-floored. Queries broadcast like the other top-k scans.
    */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = binarize(queries, vecCol, "__code")
      .select(col(idCol).as("qid"), col("__code").as("__qc"))
    val c = binarize(corpus, vecCol, "__code")
      .select(col(idCol).as("nid"), col("__code").as("__nc"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("hamming", hammingDist(col("__qc"), col("__nc")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("hamming").asc, col("nid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("qid", "nid", "hamming")
  }

  /** An OPQ model: a d×d orthonormal rotation (rows = permuted PCA basis)
    * plus the PQ codebooks trained in the rotated space.
    */
  case class OpqModel(rotation: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]])

  /** Rotate vectors by an orthonormal row matrix — one CentroidSims kernel
    * call (rows are unit-norm, so sims = R·v exactly), a pure narrow
    * projection that streams and stays codegen'd.
    */
  def opqRotate(df: DataFrame, vecCol: String,
      rotation: Array[Array[Double]]): DataFrame =
    df.withColumn(vecCol, cellSims(col(s"`$vecCol`"), rotation))

  /** Optimized Product Quantization, parametric recipe (Ge et al.,
    * CVPR 2013 "Optimized Product Quantization", §4 OPQ-P): plain PQ slices
    * the raw coordinates, so correlated/unbalanced dimensions waste
    * codebook capacity; OPQ first rotates into the PCA basis and then
    * permutes the principal directions across subspaces by EIGENVALUE
    * ALLOCATION — each next-largest eigenvalue goes to the subspace with
    * the smallest running log-product, balancing per-subspace variance —
    * before training the same per-subspace codebooks as [[pqTrain]].
    * Training cost is one bounded-sample PCA (the d×d Jacobi path shared
    * with [[Pca.fit]]) plus the usual m codebook trainings; rotation is
    * orthonormal, so inner products (and therefore ADC top-k semantics)
    * are preserved. Deterministic: stride seeds, sign-fixed eigenvectors,
    * index-ordered tie-breaks.
    */
  def opqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, kmeansIters: Int = 4,
      trainTarget: Int = 4096): OpqModel = {
    val dim = probeDim(corpus, vecCol).getOrElse(
      throw new IllegalArgumentException("opqTrain: empty corpus"))
    require(dim % m == 0, s"opqTrain: dim $dim not divisible by m $m")
    val dsub = dim / m
    val n = corpus.count()
    val trainMod = math.max(1L, n / math.max(trainTarget, k).toLong)
    val sample = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(trainMod)) === 0)
      .select(col(idCol), col(vecCol))
      .localCheckpoint()
    val pca = Pca.fit(sample, vecCol, dim)
    // greedy eigenvalue allocation: components arrive in descending-λ
    // order; log-sums avoid product overflow/underflow, index tie-break
    val logs = Array.fill(m)(0.0d)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer[Int]())
    pca.components.indices.foreach { i =>
      val s = (0 until m).filter(buckets(_).length < dsub)
        .minBy(s => (logs(s), s))
      buckets(s) += i
      logs(s) += math.log(math.max(pca.eigenvalues(i), 1e-12d))
    }
    val rotation = buckets.flatMap(_.iterator).map(pca.components).toArray
    // pin the rotated sample once: the joint trainer scans it per Lloyd
    // iteration (and the seed collect), so the d×d rotation kernel runs
    // one pass instead of once per subspace per action
    val rotated = opqRotate(sample, vecCol, rotation).localCheckpoint()
    OpqModel(rotation,
      pqTrainOnSample(rotated, idCol, vecCol, m, dsub, k, kmeansIters))
  }

  /** ADC top-k in the rotated space: rotate both sides (dot products are
    * rotation-invariant) and run the standard [[pqAdcTopK]]
    * shortlist+exact-rerank. At 100 TB the corpus rotation is a one-time
    * narrow projection fused into the encode write, not a per-query cost.
    */
  def opqAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, model: OpqModel, refine: Int = 4,
      roundTo: Int = 6): DataFrame =
    pqAdcTopK(opqRotate(queries, vecCol, model.rotation),
      opqRotate(corpus, vecCol, model.rotation),
      idCol, vecCol, k, model.codebooks, refine, roundTo)

  /** IVF-PQ: the inverted-file probe prunes cells (each query scans only
    * its nProbe nearest cells) and ADC compresses the in-cell scan — the
    * composition production ANN engines (FAISS IVFPQ) run at corpus scale.
    * Same shortlist+exact-rerank contract as [[pqAdcTopK]].
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], nProbe: Int = 8,
      refine: Int = 4, roundTo: Int = 6): DataFrame = {
    val m = codebooks.length
    val kCents = codebooks.head.length
    val q = withProbeCells(queries, vecCol, centroids, nProbe)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"), col("cell"))
      .withColumn("__t", pqAdcTable(col("qvec"), codebooks))
    val c = pqEncode(withCell(corpus, vecCol, centroids), vecCol, codebooks)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"), col("cell"),
        col(s"${vecCol}_pq").as("__code"))
    val adc = aggregate(
      zip_with(col("__code"), sequence(lit(0), lit(m - 1)),
        (code, s) => element_at(col("__t"), s * kCents + code)),
      lit(0.0d), (acc, x) => acc + x)
    val scored = c.join(q, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("__adc", adc)
      // a vector probed via several cells keeps one candidate row
      .dropDuplicates("qid", "nid")
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(col("__adc").desc, col("nid").asc)
    val shortlist = scored.withColumn("__rn", row_number().over(wAdc))
      .filter(col("__rn") <= k * refine)
      .withColumn("score", round(dot(col("qvec"), col("nvec")), roundTo))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    shortlist.withColumn("__rn2", row_number().over(w))
      .filter(col("__rn2") <= k)
      .select("qid", "nid", "score")
  }

  /** Exact inner-product top-k — the brute baseline ADC/IVF-PQ recall is
    * measured against (dot ranking, not cosine: PQ approximates the dot).
    */
  def dotTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("score", round(dot(col("qvec"), col("nvec")), roundTo))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("nid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("qid", "nid", "score")
  }

  /** Mean per-query recall of an approximate top-k result against the
    * exact one. Both inputs carry (qid, nid); recall for a query is the
    * fraction of its exact neighbors the approximate path recovered.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("qid"), col("nid")).withColumn("__hit", lit(1))
    exact.select("qid", "nid").join(a, Seq("qid", "nid"), "left")
      .groupBy("qid")
      .agg((sum(coalesce(col("__hit"), lit(0))) / count(lit(1))).as("recall"))
  }

  /** One-row recall gate: n_queries + whether mean recall clears `floor`.
    * The boolean (rather than the raw recall) is what the oracle pins, so
    * knife-edge float effects can't flake the gate while a real recall
    * regression still trips it.
    */
  def recallGate(approx: DataFrame, exact: DataFrame, floor: Double): DataFrame =
    recallAtK(approx, exact).agg(
      count(lit(1)).as("n_queries"),
      lit(floor).as("recall_floor"),
      (avg(col("recall")) >= floor).as("meets_floor"))
}
