package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.vector.CentroidSims

/** Distributed PCA / whitening over an embedding column — the standard
  * pre-step for semantic dedup and ANN at corpus scale (SemDeDup,
  * arXiv:2303.09540 §3 operates on normalized/centered embeddings; IVF
  * recall improves markedly on whitened vectors).
  *
  * Engine extension (SURVEY §2.15) — the reference has no linear-algebra
  * verbs; this follows the same Spark-first recipe as the IVF/SemDeDup
  * family: one declarative aggregation pass for the sufficient statistics,
  * a driver-side solve on a d×d matrix (d = embedding dim, constant and
  * small — 64 here, ≤ ~2k in practice), and a narrow codegen projection.
  *
  * Scale notes (100 TB):
  *  - fit() is ONE pass: posexplode² emits the upper triangle of x·xᵀ per
  *    row (d(d+1)/2 terms) which the partial hash aggregate combines
  *    map-side — the shuffle carries only d(d+1)/2 keys per partition,
  *    never row data. The per-row d²/2 multiply-adds are inherent to
  *    covariance. The d×d collect is bounded by the dimension, not n.
  *  - project() is a pure narrow map: the component matrix rides along as
  *    ONE broadcast-referenced object inside the CentroidSims kernel
  *    (O(1) in k for plan/codegen size), so the projection streams and
  *    pushes through scans untouched.
  */
object Pca {

  /** k×d row-orthonormal components, descending eigenvalue order. */
  case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** Fit a PCA model: one distributed aggregation for (n, Σx, Σxxᵀ), then
    * a driver-side Jacobi eigensolve of the d×d covariance. Deterministic
    * up to float summation order across partitions (the oracle gate for
    * the trained path is therefore invariant-based, like SemDeDup's).
    */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val vd = transform(col(s"`$vecCol`"), x => x.cast("double"))
    // Only one generator is allowed per SELECT, so the two posexplodes
    // chain across projections; j >= i keeps the upper triangle only.
    val stats = df.select(vd.as("v"))
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy("i", "j")
      .agg(sum(col("xi") * col("xj")).as("sxx"),
        sum(when(col("j") === col("i"), col("xi"))).as("sxi"),
        count(lit(1)).as("cnt"))
      .collect()
    require(stats.nonEmpty, "Pca.fit: empty input")
    val d = stats.iterator.map(_.getInt(0)).max + 1
    val n = stats.iterator
      .find(r => r.getInt(0) == 0 && r.getInt(1) == 0).get.getLong(4).toDouble
    val sxx = Array.ofDim[Double](d, d)
    val mean = new Array[Double](d)
    stats.foreach { r => // ordinals: i=0, j=1, sxx=2, sxi=3, cnt=4
      val (i, j) = (r.getInt(0), r.getInt(1))
      sxx(i)(j) = r.getDouble(2); sxx(j)(i) = r.getDouble(2)
      if (i == j && !r.isNullAt(3)) mean(i) = r.getDouble(3) / n
    }
    val cov = Array.tabulate(d, d)((i, j) => sxx(i)(j) / n - mean(i) * mean(j))
    val (eig, vecs) = jacobiEig(cov) // vecs columns = eigenvectors
    val order = eig.indices.sortBy(i => -eig(i)).take(math.min(k, d))
    val comps = order.map { c =>
      val w = Array.tabulate(d)(r => vecs(r)(c))
      // sign fix: largest-|entry| coordinate positive → deterministic basis
      val m = w.indices.maxBy(i => math.abs(w(i)))
      if (w(m) < 0) w.map(-_) else w
    }.toArray
    PcaModel(mean, order.map(eig).toArray, comps)
  }

  /** Project (and optionally whiten) onto the model's components. Centered
    * dot products against a constant matrix: dot(x, Wᵣ) − dot(μ, Wᵣ), the
    * offset precomputed on the driver with the same ascending-index
    * summation the kernel uses. Adds `outCol` (array<double>, length k).
    */
  def project(df: DataFrame, vecCol: String, model: PcaModel,
      whiten: Boolean = false, outCol: String = "pca"): DataFrame = {
    val scale = Array.tabulate(model.k) { r =>
      if (whiten) 1.0 / math.sqrt(model.eigenvalues(r) max 1e-12) else 1.0
    }
    df.withColumn(outCol,
      projectExpr(col(s"`$vecCol`"), model.mean, model.components, scale))
  }

  /** The projection as a Column over an arbitrary vector expression:
    * element r = (dot(v, Wᵣ) − offsetᵣ) · scaleᵣ. Reuses the CentroidSims
    * codegen kernel (unit norms = plain dots); offset/scale fold into the
    * generated zip_with, still whole-stage codegen.
    */
  def projectExpr(v: Column, mean: Array[Double],
      components: Array[Array[Double]], scale: Array[Double]): Column = {
    val k = components.length
    val wFloat = components.map(_.map(_.toFloat))
    // exact ascending-index dot, mirroring centroidSimsKernel's loop; the
    // kernel sees float components, so the offset must use the same
    // float-rounded values or centering drifts from the kernel's dots
    val offsets = Array.tabulate(k) { r =>
      var s = 0.0d; var i = 0
      while (i < mean.length) { s += mean(i) * wFloat(r)(i).toDouble; i += 1 }
      s
    }
    val dots = org.apache.spark.sql.graftx.Bridge.column(CentroidSims(
      org.apache.spark.sql.graftx.Bridge.expression(
        transform(v, x => x.cast("float"))),
      wFloat, Array.fill(k)(1.0)))
    zip_with(dots,
      zip_with(
        typedLit(offsets.toSeq).cast("array<double>"),
        typedLit(scale.toSeq).cast("array<double>"),
        (o, sc) => struct(o.as("o"), sc.as("s"))),
      (dot, os) => (dot - os.getField("o")) * os.getField("s"))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix. Returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * O(d³) per sweep on the driver — d is the embedding dimension, so this
    * is microseconds at d=64 and still fine at d=2048.
    */
  private[graft] def jacobiEig(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until d; q <- p + 1 until d) s += a(p)(q) * a(p)(q)
      s
    }
    var sweep = 0
    while (off() > 1e-22 && sweep < 64) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t =
          if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        // rows/cols p,q of a
        val apq = a(p)(q)
        val app = a(p)(p); val aqq = a(q)(q)
        a(p)(p) = app - t * apq
        a(q)(q) = aqq + t * apq
        a(p)(q) = 0.0; a(q)(p) = 0.0
        for (i <- 0 until d if i != p && i != q) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
          a(i)(q) = c * aiq + s * aip; a(q)(i) = a(i)(q)
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = c * viq + s * vip
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Invariant gate for the trained path (same pattern as
    * semdedup_trained_gate): orthonormality of W, descending non-negative
    * eigenvalues, and a distributed check that per-component projected
    * variance matches the eigenvalue and total variance matches the
    * covariance trace — which jointly pin fit() AND project().
    */
  def trainedGate(df: DataFrame, vecCol: String, k: Int): DataFrame = {
    val model = fit(df, vecCol, k)
    val d = model.dim
    val orthoErr = (for (r1 <- 0 until model.k; r2 <- r1 until model.k) yield {
      var s = 0.0; var i = 0
      while (i < d) { s += model.components(r1)(i) * model.components(r2)(i); i += 1 }
      math.abs(s - (if (r1 == r2) 1.0 else 0.0))
    }).max
    val eigSorted = model.eigenvalues.sliding(2).forall {
      case Array(a, b) => a >= b - 1e-12; case _ => true
    } && model.eigenvalues.forall(_ >= -1e-9)
    val spark = df.sparkSession
    import spark.implicits._
    val projVar = project(df, vecCol, model, whiten = false, outCol = "__p")
      .select(posexplode(col("__p")).as(Seq("r", "x")))
      .groupBy("r").agg(avg(col("x") * col("x")).as("pv"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val varMatch = (0 until model.k).forall { r =>
      val lam = model.eigenvalues(r)
      math.abs(projVar(r) - lam) <= 1e-6 + 1e-3 * math.abs(lam)
    }
    Seq((df.count(), orthoErr < 1e-8, eigSorted, varMatch))
      .toDF("n_input", "orthonormal", "eig_sorted", "var_match")
  }
}
