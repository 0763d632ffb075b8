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

  /** Random-hyperplane LSH bucket id (sign bits of numPlanes pseudo-random
    * projections). Plane components are deterministic hash-derived values in
    * [-1, 1]: component(p, i) = xxhash64(p, i) scaled. Vectors in the same
    * bucket are likely-similar; search within buckets only.
    */
  def lshBuckets(vec: Column, numPlanes: Int): Column = {
    def planeComponent(p: Int, i: Column): Column =
      (pmod(xxhash64(lit(p), i), lit(2000001)).cast("double") - 1000000d) / 1000000d
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** IVF-style approximate top-k: quantize every vector to its nearest of
    * `nCells` centroids (deterministically sampled from the corpus itself:
    * ids ≡ 0 mod ⌈n/nCells⌉), then rank only within the query's cell. One
    * small collect for the centroid table (broadcast), one shuffle on the
    * cell id — the standard inverted-file layout, minus the training loop
    * (k-means refinement would slot in where the sample is taken).
    */
  def ivfCosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 16, roundTo: Int = 6): DataFrame = {
    val n = corpus.count()
    val stride = math.max(1L, n / nCells)
    val centroids = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .limit(nCells)
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(centroids.nonEmpty, "ivfCosineTopK: empty centroid sample")
    val centroidArr = array(centroids.map { case (_, v) =>
      array(v.map(x => lit(x)).toIndexedSeq: _*)
    }.toIndexedSeq: _*)
    def cellOf(vec: Column): Column = {
      // argmax cosine over the centroid table (count is small; the transform
      // stays narrow). aggregate carries (bestIdx, bestSim, curIdx).
      val sims = transform(centroidArr, c =>
        dot(vec, c) / (norm(vec) * norm(c)))
      array_position(sims, array_max(sims)).cast("int")
    }
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qnorm"), cellOf(col(vecCol)).as("cell"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      norm(col(vecCol)).as("nnorm"), cellOf(col(vecCol)).as("cell"))
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
    * vectors sharing the query's LSH bucket. One shuffle on the bucket id.
    */
  def lshCosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int = 8, roundTo: Int = 6): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qnorm"), lshBuckets(col(vecCol), numPlanes).as("bucket"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"),
      norm(col(vecCol)).as("nnorm"), lshBuckets(col(vecCol), numPlanes).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", round(
        dot(col("qvec"), col("nvec")) / (col("qnorm") * col("nnorm")), roundTo))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("qid", "nid", "sim")
  }
}
