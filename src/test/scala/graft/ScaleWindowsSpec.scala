package graft

import graft.operators.{GroupedOps, ScaleWindows, TypeOps}
import graft.functions.MathFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec

class ScaleWindowsSpec extends SparkSpec {
  import spark.implicits._

  /** True if a no-partition WindowExec is anywhere in the physical plan —
    * including inside AdaptiveSparkPlanExec, which plain `exists` does not
    * descend into (that blind spot made the negative asserts trivially true).
    */
  private def hasGlobalWindow(df: org.apache.spark.sql.DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scan(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case w: WindowExec if w.partitionSpec.isEmpty => true
      case other => other.children.exists(scan)
    }
    scan(df.queryExecution.executedPlan)
  }

  /** Force the bucketed path: the adaptive cutover would otherwise route
    * these spec-sized inputs to the plain global window. */
  private def withBucketedPath[T](f: => T): T = {
    spark.conf.set("graft.scaleWindows.smallBytes", "0")
    try f finally spark.conf.unset("graft.scaleWindows.smallBytes")
  }

  test("runningSum equals the single-partition global window") { withBucketedPath {
    val rng = new scala.util.Random(11)
    val d = (1 to 2000).map(i => (i, rng.nextInt(50).toLong)).toDF("ord", "v")
      .repartition(8)
    val global = d.withColumn("cum", sum("v").over(
      Window.orderBy("ord").rowsBetween(Window.unboundedPreceding, 0)))
    val twoPhase = ScaleWindows.runningSum(d, "ord", "v", "cum")
    assert(sorted(twoPhase) == sorted(global))
  }}

  test("runningLast matches the global window both directions, structs carried across buckets") { withBucketedPath {
    val rng = new scala.util.Random(7)
    // sparse non-null values so several buckets are all-null and must carry
    // a struct boundary from buckets further back
    val d = (1 to 2000).map { i =>
      val v = if (rng.nextInt(40) == 0) Some((i.toLong, s"p$i")) else None
      (i, 0, v)
    }.toDF("t", "side", "pay").repartition(8)
    for (desc <- Seq(false, true)) {
      val base = if (desc) Window.orderBy(col("t").desc, col("side").asc)
        else Window.orderBy(col("t").asc, col("side").asc)
      val w = base.rowsBetween(Window.unboundedPreceding, 0)
      val global = d.withColumn("m", last(col("pay"), ignoreNulls = true).over(w))
      val bucketed = ScaleWindows.runningLast(d, "t", "side", "pay", "m", descending = desc)
      assert(sorted(bucketed) == sorted(global), s"desc=$desc")
      assert(!hasGlobalWindow(bucketed), s"desc=$desc should not plan a global window")
    }
  }}

  test("runningLast/Keyed with DUPLICATE order values: descending bucket carry picks the tie-max") { withBucketedPath {
    // many rows share each ord value, so every bucket boundary has ties and
    // the exported carry must be the LAST-VISITED row (tie-max at the
    // minimal ord under descending) — the round-9 tie-inversion fix
    val rng = new scala.util.Random(97)
    val d = (1 to 3000).map { i =>
      val v = if (rng.nextInt(3) == 0) None else Some(s"p$i")
      (rng.nextInt(40), i, rng.nextInt(3), v)
    }.toDF("t", "tie", "k", "pay").repartition(8)
    for (desc <- Seq(false, true)) {
      val base = if (desc) Window.orderBy(col("t").desc, col("tie").asc)
        else Window.orderBy(col("t").asc, col("tie").asc)
      val w = base.rowsBetween(Window.unboundedPreceding, 0)
      val global = d.withColumn("m", last(col("pay"), ignoreNulls = true).over(w))
      val bucketed = ScaleWindows.runningLast(d, "t", "tie", "pay", "m", descending = desc)
      assert(sorted(bucketed) == sorted(global), s"runningLast desc=$desc dup-ord")
      val kBase = if (desc) Window.partitionBy("k").orderBy(col("t").desc, col("tie").asc)
        else Window.partitionBy("k").orderBy(col("t").asc, col("tie").asc)
      val kw = kBase.rowsBetween(Window.unboundedPreceding, 0)
      val kGlobal = d.withColumn("m", last(col("pay"), ignoreNulls = true).over(kw))
      val kBucketed = ScaleWindows.runningLastKeyed(d, Seq("k"), "t", "tie", "pay", "m",
        descending = desc, nBuckets = 16)
      assert(sorted(kBucketed) == sorted(kGlobal), s"runningLastKeyed desc=$desc dup-ord")
    }
  }}

  test("groupbyAggSkewSafe == window groupbyAgg, both dropna modes, null keys") {
    import graft.syntax._
    val rng = new scala.util.Random(41)
    val d = (1 to 500).map { i =>
      val k: Integer = if (rng.nextInt(10) == 0) null else Integer.valueOf(rng.nextInt(5))
      // integral-valued doubles: float sums must not depend on summation
      // order, which legitimately differs between the two physical shapes
      (i, k, rng.nextInt(100).toDouble)
    }.toDF("id", "k", "x").repartition(8)
    for (dropna <- Seq(true, false); agg <- Seq("sum", "nunique", "size")) {
      val win = d.groupbyAgg(Seq("k"), "x", agg, "v", dropna = dropna)
      val skew = d.groupbyAggSkewSafe(Seq("k"), "x", agg, "v", dropna = dropna)
      assert(sorted(skew) == sorted(win), s"dropna=$dropna agg=$agg")
    }
  }

  test("runningLastKeyed matches the plain keyed window (distributed carry)") {
    val rng = new scala.util.Random(23)
    val d = (1 to 3000).map { i =>
      val v = if (rng.nextInt(25) == 0) Some(s"v$i") else None
      (rng.nextInt(3), i, 0, v)
    }.toDF("k", "t", "side", "pay").repartition(8)
    for (desc <- Seq(false, true)) {
      val base = if (desc) Window.partitionBy("k").orderBy(col("t").desc, col("side").asc)
        else Window.partitionBy("k").orderBy(col("t").asc, col("side").asc)
      val w = base.rowsBetween(Window.unboundedPreceding, 0)
      val plain = d.withColumn("m", last(col("pay"), ignoreNulls = true).over(w))
      val keyed = ScaleWindows.runningLastKeyed(d, Seq("k"), "t", "side", "pay", "m",
        descending = desc, nBuckets = 16)
      assert(sorted(keyed) == sorted(plain), s"desc=$desc")
    }
  }

  test("small inputs cut over to the plain global window (no bucketing jobs)") {
    val d = (1 to 100).map(i => (i, i.toLong)).toDF("ord", "v").repartition(4)
    val out = ScaleWindows.runningSum(d, "ord", "v", "cum")
    assert(hasGlobalWindow(out),
      "below the size threshold the single-task window is the cheaper plan")
    val got = out.collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got(100) == (1 to 100).map(_.toLong).sum)
  }

  test("runningSum falls back gracefully for non-numeric order columns") {
    val d = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
    val out = ScaleWindows.runningSum(d, "k", "v", "cum")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out == Map("a" -> 1L, "b" -> 3L, "c" -> 6L))
  }

  test("countCumulativeUnique: correct and no single-partition window in the plan") { withBucketedPath {
    val d = Seq((1, "x"), (2, "y"), (3, "x"), (4, "z"), (5, "y"), (6, "w"))
      .toDF("t", "v").repartition(4)
    val out = GroupedOps.countCumulativeUnique(d, "v", "t", "cum")
    val got = out.collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 1L, 2 -> 2L, 3 -> 2L, 4 -> 3L, 5 -> 3L, 6 -> 4L))
    assert(!hasGlobalWindow(out), "batch countCumulativeUnique must not funnel rows through one task")
  }}

  test("ecdf matches cume_dist semantics incl. ties and nulls; no global window") { withBucketedPath {
    val d = Seq[java.lang.Double](3.0, 1.0, 4.0, 1.0, 5.0, null, 2.0).toDF("x")
      .repartition(3)
    val out = MathFunctions.ecdf(d, "x", "e")
    val expected = d.withColumn("e", cume_dist().over(Window.orderBy(col("x"))))
    assert(sorted(out) == sorted(expected))
    assert(!hasGlobalWindow(out))
  }}

  test("factorizeColumns assigns first-seen codes without a global window or forced broadcast") { withBucketedPath {
    val d = Seq((1, "b"), (2, "a"), (3, "b"), (4, "c"), (5, "a"))
      .toDF("ord", "k").repartition(3)
    val out = TypeOps.factorizeColumns(d, "k", "ord")
    val got = out.collect().map(r => (r.getString(1), r.getInt(2))).toSet
    assert(got == Set(("b", 0), ("a", 1), ("c", 2)))
    assert(!hasGlobalWindow(out))
  }}
}
