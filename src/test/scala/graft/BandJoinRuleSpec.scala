package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must change the PLAN (BNLJ → hash join on bands)
  * without changing RESULTS.
  */
class BandJoinRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // withExtensions+getOrCreate silently returns an ACTIVE session
    // (extensions ignored) when another suite ran first in this JVM —
    // clear both pointers so the extension session really gets built
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bandrule-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("pure range join rewrites to banded equi join and keeps results") {
    import spark.implicits._
    val l = (1 to 100).map(i => (i, i.toDouble)).toDF("id", "x")
    val r = Seq((1, 3.0, 9.0), (2, 8.0, 42.0), (3, 90.0, 95.0)).toDF("rid", "lo", "hi")
    val joined = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))

    spark.conf.set("spark.graft.bandJoin.enabled", "false")
    val naive = joined.select("id", "rid").collect().map(x => (x.getInt(0), x.getInt(1))).sorted
    val planOff = joined.queryExecution.executedPlan.toString
    assert(planOff.contains("BroadcastNestedLoopJoin"),
      s"expected BNLJ with rule disabled, got:\n$planOff")

    spark.conf.set("spark.graft.bandJoin.enabled", "true")
    spark.conf.set("spark.graft.bandJoin.width", "10.0")
    val joined2 = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
    val planOn = joined2.queryExecution.executedPlan.toString
    assert(!planOn.contains("BroadcastNestedLoopJoin"),
      s"expected banded hash join with rule enabled, got:\n$planOn")
    assert(planOn.contains("Generate"), s"expected band explode, got:\n$planOn")
    val banded = joined2.select("id", "rid").collect().map(x => (x.getInt(0), x.getInt(1))).sorted
    assert(banded.toSeq == naive.toSeq)
    spark.conf.set("spark.graft.bandJoin.enabled", "false")
  }

  test("joins with an equi key are left untouched") {
    import spark.implicits._
    spark.conf.set("spark.graft.bandJoin.enabled", "true")
    val l = Seq((1, 5.0)).toDF("k", "x")
    val r = Seq((1, 1.0, 9.0)).toDF("k2", "lo", "hi")
    val j = l.join(r, col("k") === col("k2") && col("x") >= col("lo") && col("x") <= col("hi"))
    assert(!j.queryExecution.executedPlan.toString.contains("__graft_band"))
    assert(j.count() == 1)
    spark.conf.set("spark.graft.bandJoin.enabled", "false")
  }

  test("over-wide intervals are routed through the capped union branch losslessly") {
    import spark.implicits._
    spark.conf.set("spark.graft.bandJoin.enabled", "false")
    val l = (1 to 80).map(i => (i, i.toDouble)).toDF("id", "x")
    // interval 2 spans ~70 bands at W=1 — over maxBands=4
    val r = Seq((1, 3.0, 6.0), (2, 2.0, 72.0), (3, 78.0, 79.0)).toDF("rid", "lo", "hi")
    def run() = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("id", "rid").collect().map(x => (x.getInt(0), x.getInt(1))).sorted.toSeq
    val naive = run()
    spark.conf.set("spark.graft.bandJoin.enabled", "true")
    spark.conf.set("spark.graft.bandJoin.width", "1.0")
    spark.conf.set("spark.graft.bandJoin.maxBands", "4")
    val joined = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"expected band explode branch, got:\n$plan")
    assert(plan.contains("Union"), s"expected wide-interval union branch, got:\n$plan")
    assert(run() == naive)
    spark.conf.set("spark.graft.bandJoin.enabled", "false")
    spark.conf.unset("spark.graft.bandJoin.maxBands")
  }

  test("strict bounds and empty intervals keep exact semantics") {
    import spark.implicits._
    spark.conf.set("spark.graft.bandJoin.enabled", "true")
    val l = Seq((1, 3.0), (2, 9.0)).toDF("id", "x")
    // interval (3, 9) exclusive both ends; plus an empty interval hi<lo
    val r = Seq((1, 3.0, 9.0), (2, 50.0, 40.0)).toDF("rid", "lo", "hi")
    val j = l.join(r, col("x") > col("lo") && col("x") < col("hi"))
    assert(j.count() == 0) // 3.0 and 9.0 are both excluded by strict bounds
    spark.conf.set("spark.graft.bandJoin.enabled", "false")
  }

  test("graft kernels are callable from SQL via the injected registry") {
    val r = spark.sql(
      """SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw,
        |  normal_cdf(0.0d) AS nc, probit(0.5d) AS pr,
        |  natural_sort_key('a2') < natural_sort_key('a10') AS nat,
        |  strip_accents('café') AS sa,
        |  unicode_normalize('café', 'NFD') AS un,
        |  dot_product(array(cast(1 as float), cast(2 as float)),
        |              array(cast(3 as float), cast(4 as float))) AS dp,
        |  l2_norm(array(cast(3 as float), cast(4 as float))) AS nrm,
        |  sorted_intersect_count(array('a','b','e'), array('b','e','z')) AS ic,
        |  size(gram_hash48(array('a','b','c'), 2)) AS ng,
        |  size(minhash_sig(array('a','b','c','d'), 16, 2)) AS nm,
        |  simhash_sig(array('a','b'), 16) AS sh,
        |  size(window_min(array(9L,1L,4L,7L), 2)) AS wm,
        |  size(deletion_hashes('ab', 1)) AS dh""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - 0.9611111111111111) < 1e-12)
    // polynomial approximations (Abramowitz-Stegun / Acklam): ~1e-8 accurate
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-7 && math.abs(r.getDouble(2)) < 1e-7)
    assert(r.getBoolean(3))
    assert(r.getString(4) == "cafe")
    assert(r.getString(5).length == 5) // NFD: e + combining acute
    assert(r.getDouble(6) == 11.0 && r.getDouble(7) == 5.0)
    assert(r.getInt(8) == 2)
    assert(r.getInt(9) == 2 && r.getInt(10) == 16)
    assert(r.getLong(11) >= 0L && r.getLong(11) < (1L << 16))
    assert(r.getInt(12) >= 1)
    assert(r.getInt(13) == 3) // 'ab', 'b', 'a'
    // literal-ness enforced at resolution: a column-valued shingle size fails
    val err = intercept[Exception] {
      spark.sql("SELECT gram_hash48(array('a','b'), id + 1) FROM range(3)").collect()
    }
    assert(err.getMessage.contains("literal"))
  }
}
