package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the logistic-regression filter
  * CCNet-family pipelines put in front of pretraining (e.g. a classifier
  * scoring "does this look like reference text"), built entirely on
  * DataFrame primitives (the reference repo has no model surface; public
  * recipe: Wenzek et al. 1911.00359 §4.4, LLaMA's quality classifier).
  *
  * Scale design: feature extraction + standardization stats are Spark
  * aggregations; the GD loop then runs driver-side over the collected
  * ≤ sampleTarget-row standardized sample (bounded by construction — the
  * k-means/PCA/BPE bounded-collect pattern; 60 sequential Spark jobs
  * would pay ~150 ms scheduling each for sub-ms of arithmetic). For
  * corpus-scale training sets `distributedGradient = true` keeps every
  * step ONE map-side-combinable aggregation — grad_j = avg((σ(w·x)−y)·x_j),
  * (d+1) doubles to the driver per step — over an unbounded frame.
  * Scoring is a pure narrow sigmoid projection with the weights folded in
  * as literals — streaming-safe, plan size O(d).
  */
object QualityClassifier {

  /** Fixed 5-feature text representation, every op DuckDB-replicable:
    * [ln(1+tokens), mean word length, symbol ratio, stopword fraction,
    * digit ratio].
    */
  val numFeatures = 5

  private val stopList = Seq("the", "and", "of", "to", "in", "is")

  def features(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val n = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val noSpace = length(regexp_replace(text, "\\s", "")).cast("double")
    val symbols = length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val stops = size(filter(toks, t => t.isin(stopList.map(lit): _*))).cast("double")
    array(
      log(lit(1.0) + n),
      noSpace / greatest(n, lit(1.0)),
      symbols / greatest(nChars, lit(1.0)),
      stops / greatest(n, lit(1.0)),
      digits / greatest(nChars, lit(1.0)))
  }

  /** σ(w0 + w·f(text)) with driver-held weights (length numFeatures+1,
    * bias first). The dot is unrolled over the bound feature array — d is
    * tiny and fixed, no kernel needed.
    */
  def score(text: Column, weights: Array[Double]): Column = {
    require(weights.length == numFeatures + 1,
      s"score: need ${numFeatures + 1} weights (bias first)")
    val f = features(text)
    val margin = (1 to numFeatures).foldLeft(lit(weights(0)): Column)(
      (acc, j) => acc + lit(weights(j)) * element_at(f, j))
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Batch-gradient-descent training against a 0/1 `labelCol`. Sampling is
    * the deterministic content hash (engine-invariant); the feature frame
    * is computed once and checkpointed. Returns weights (bias first).
    *
    * The GD loop runs on the DRIVER over the collected standardized sample
    * by default: the sample is ≤ sampleTarget rows of (d+1) doubles BY
    * CONSTRUCTION (≤ ~400 KB — the bounded-collect pattern of the
    * BPE/k-means/PCA trained paths), and 60 sequential sub-second Spark
    * jobs cost ~150 ms scheduling overhead EACH, so the driver loop is
    * ~20× faster end-to-end with identical arithmetic per step. Set
    * `distributedGradient = true` to keep every step a map-side-combinable
    * aggregation instead — the form that trains on an UNBOUNDED feature
    * frame (no sampling cap) when the training set itself is corpus-scale.
    */
  def train(df: DataFrame, idCol: String, textCol: String, labelCol: String,
      iters: Int = 60, learningRate: Double = 1.0,
      sampleTarget: Int = 8192,
      distributedGradient: Boolean = false): Array[Double] = {
    val n = df.count()
    val mod = math.max(1L, n / math.max(sampleTarget, 1).toLong)
    val raw = df
      .filter(pmod(xxhash64(col(s"`$idCol`")), lit(mod)) === 0)
      .select(features(col(s"`$textCol`")).as("__f"),
        col(s"`$labelCol`").cast("double").as("__y"))
      .localCheckpoint()
    // standardize features (one agg for mu/sigma) so one fixed learning
    // rate converges regardless of feature scale; the returned weights are
    // folded BACK to raw-feature space so `score` needs no scaler
    val statCols =
      (1 to numFeatures).map(j => avg(element_at(col("__f"), j)).as(s"m$j")) ++
        (1 to numFeatures).map(j =>
          stddev_pop(element_at(col("__f"), j)).as(s"s$j"))
    val st = raw.agg(statCols.head, statCols.tail: _*).head()
    val mu = Array.tabulate(numFeatures)(j => st.getDouble(j))
    val sig = Array.tabulate(numFeatures) { j =>
      val s = st.getDouble(numFeatures + j); if (s > 1e-12) s else 1.0
    }
    val sample = raw.select(
      array((1 to numFeatures).map(j =>
        (element_at(col("__f"), j) - lit(mu(j - 1))) / lit(sig(j - 1))): _*).as("__f"),
      col("__y"))
      .localCheckpoint()
    var w = new Array[Double](numFeatures + 1)
    var it = 0
    if (distributedGradient) {
      while (it < iters) {
        val margin = (1 to numFeatures).foldLeft(lit(w(0)): Column)(
          (acc, j) => acc + lit(w(j)) * element_at(col("__f"), j))
        val err = lit(1.0) / (lit(1.0) + exp(-margin)) - col("__y")
        val grads = sample.agg(
          avg(err).as("g0"),
          (1 to numFeatures).map(j =>
            avg(err * element_at(col("__f"), j)).as(s"g$j")): _*).head()
        var j = 0
        while (j <= numFeatures) {
          w = w.updated(j, w(j) - learningRate * grads.getDouble(j))
          j += 1
        }
        it += 1
      }
    } else {
      // ONE collect of the bounded sample, then the same per-step math
      val rows = sample.collect().map { r =>
        (r.getSeq[Double](0).toArray, r.getDouble(1))
      }
      val m = math.max(rows.length, 1)
      while (it < iters) {
        val g = new Array[Double](numFeatures + 1)
        rows.foreach { case (f, y) =>
          var margin = w(0)
          var j = 1
          while (j <= numFeatures) { margin += w(j) * f(j - 1); j += 1 }
          val err = 1.0 / (1.0 + math.exp(-margin)) - y
          g(0) += err
          j = 1
          while (j <= numFeatures) { g(j) += err * f(j - 1); j += 1 }
        }
        var j = 0
        while (j <= numFeatures) {
          w = w.updated(j, w(j) - learningRate * g(j) / m)
          j += 1
        }
        it += 1
      }
    }
    // fold the standardization into the weights: w_raw_j = w_j/sigma_j,
    // bias_raw = b − Σ w_j·mu_j/sigma_j
    val out = new Array[Double](numFeatures + 1)
    out(0) = w(0) - (1 to numFeatures).map(j => w(j) * mu(j - 1) / sig(j - 1)).sum
    var j = 1
    while (j <= numFeatures) { out(j) = w(j) / sig(j - 1); j += 1 }
    out
  }

  /** Trained-path invariant gate (semdedup/pca/bpe pattern): training on a
    * feature-separable label must reach `accFloor` accuracy at the 0.5
    * threshold, weights must be finite, and the score must stay in (0, 1).
    */
  def trainedGate(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, accFloor: Double = 0.9): DataFrame = {
    val w = train(df, idCol, textCol, labelCol)
    val scored = df.select(col(s"`$labelCol`").cast("double").as("__y"),
      score(col(s"`$textCol`"), w).as("__p"))
    scored.agg(
      count(lit(1)).as("n_docs"),
      (avg(((col("__p") > 0.5).cast("double") === col("__y")).cast("double"))
        >= accFloor).as("acc_ok"),
      lit(w.forall(x => !x.isNaN && !x.isInfinite)).as("weights_finite"),
      (min(col("__p")) > 0.0 && max(col("__p")) < 1.0).as("score_in_bounds"))
  }
}
