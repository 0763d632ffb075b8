package graft

import graft.llm.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEig recovers the spectrum of a known symmetric matrix") {
    // [[2,1],[1,2]] -> eigenvalues {3,1}, eigenvectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (eig, v) = Pca.jacobiEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = eig.indices.sortBy(i => -eig(i))
    assert(math.abs(eig(order(0)) - 3.0) < 1e-12)
    assert(math.abs(eig(order(1)) - 1.0) < 1e-12)
    val top = Array(v(0)(order(0)), v(1)(order(0)))
    assert(math.abs(math.abs(top(0)) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(top(0) - top(1)) < 1e-12) // (1,1) direction
  }

  test("fit recovers planted principal directions and variances") {
    // points a*u + b*w with u,w orthonormal, var(a) >> var(b): the model
    // must rank u first and report eigenvalues ~= the planted variances
    val u = Array(0.6, 0.8, 0.0)
    val w = Array(-0.8, 0.6, 0.0)
    val n = 400
    val rows = (0 until n).map { i =>
      val a = 4.0 * math.sin(i * 0.37)      // large-variance coefficient
      val b = 0.5 * math.cos(i * 1.13)      // small-variance coefficient
      (i.toLong, (0 until 3).map(d => (a * u(d) + b * w(d)).toFloat).toArray)
    }
    val df = rows.toDF("id", "v")
    val m = Pca.fit(df, "v", 2)
    assert(m.k == 2 && m.dim == 3)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    // component 0 parallel to u (sign-fixed): |dot| ~= 1
    val d0 = math.abs(m.components(0).zip(u).map { case (x, y) => x * y }.sum)
    val d1 = math.abs(m.components(1).zip(w).map { case (x, y) => x * y }.sum)
    assert(d0 > 0.999, s"top component not aligned with u: $d0")
    assert(d1 > 0.999, s"second component not aligned with w: $d1")
    // planted variances: E[a^2]-E[a]^2 etc. computed from the same series
    val as = (0 until n).map(i => 4.0 * math.sin(i * 0.37))
    val varA = as.map(x => x * x).sum / n - math.pow(as.sum / n, 2)
    assert(math.abs(m.eigenvalues(0) - varA) < 1e-6 * math.max(1, varA))
  }

  test("projection variance matches eigenvalues; whitening normalizes it") {
    val n = 300
    val rows = (0 until n).map { i =>
      // distinct per-dim frequencies -> full-rank covariance (a shared
      // frequency with phase shifts is rank 2 and the trailing
      // eigenvalues collapse to numerical zero)
      (i.toLong, Array.tabulate(8)(d =>
        (math.sin(i * 0.29 * (d + 1) + d) * (d + 1) * 0.3).toFloat))
    }
    val df = rows.toDF("id", "v")
    val m = Pca.fit(df, "v", 4)
    val pv = Pca.project(df, "v", m, whiten = false, outCol = "p")
      .select(posexplode(col("p")).as(Seq("r", "x")))
      .groupBy("r").agg(avg(col("x") * col("x")).as("pv"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (0 until 4).foreach { r =>
      val lam = m.eigenvalues(r)
      assert(math.abs(pv(r) - lam) <= 1e-6 + 1e-3 * lam,
        s"component $r: projected var ${pv(r)} vs eigenvalue $lam")
    }
    val wv = Pca.project(df, "v", m, whiten = true, outCol = "p")
      .select(posexplode(col("p")).as(Seq("r", "x")))
      .groupBy("r").agg(avg(col("x") * col("x")).as("pv"))
      .collect().map(_.getDouble(1))
    wv.foreach(x => assert(math.abs(x - 1.0) < 1e-2, s"whitened var $x != 1"))
  }

  test("trainedGate booleans all hold on real-shaped data") {
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(16)(d => (math.cos(i * 0.17 * (d + 1))).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Pca.trainedGate(df, "embedding", 6).collect()(0)
    assert(out.getLong(0) == 200)
    assert(out.getBoolean(1), "orthonormal")
    assert(out.getBoolean(2), "eig_sorted")
    assert(out.getBoolean(3), "var_match")
  }
}
