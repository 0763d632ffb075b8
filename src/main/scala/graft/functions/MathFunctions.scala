package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Series math module (SURVEY §2.10; reference: janitor/math.py).
  * Scalar transforms are `Column => Column`; aggregate-normalized transforms
  * (softmax, z_score, ecdf) are DataFrame-level since they need a global
  * aggregate — computed as one tiny agg + projection, not a global window.
  */
object MathFunctions {

  /** (reference: janitor/math.py:14) */
  def log_(c: Column): Column = log(c)
  /** (reference: janitor/math.py:62) */
  def exp_(c: Column): Column = exp(c)
  /** (reference: janitor/math.py:87) 1/(1+e^-x) */
  def sigmoid(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))
  /** (reference: janitor/math.py:154) log(p/(1-p)) */
  def logit(c: Column): Column = log(c / (lit(1.0) - c))
  /** (reference: janitor/math.py:207) */
  def normalCdf(c: Column): Column = expressions.normal_cdf(c)
  /** (reference: janitor/math.py:233) */
  def probit(c: Column): Column = expressions.probit(c)

  /** The reference's `error` parameter for domain-restricted transforms
    * (janitor/math.py log/logit/probit: "raise" | "warn" | "ignore";
    * tests/math/test_log.py / test_logit.py): "raise" throws the
    * RuntimeError analog when any value is outside the domain, "warn"
    * prints the RuntimeWarning analog and proceeds, "ignore" proceeds
    * silently. Out-of-domain rows become null (pandas spells them NaN —
    * same missing semantics). The raise/warn check is one bounded count
    * aggregate over the domain predicate.
    */
  private def withDomain(df: DataFrame, column: String, dest: String,
      error: String, outOfDomain: Column, what: String,
      result: Column): DataFrame = {
    require(Set("raise", "warn", "ignore")(error),
      s"$what: error must be raise|warn|ignore, got $error")
    if (error != "ignore") {
      val bad = df.filter(coalesce(outOfDomain, lit(false))).count()
      if (bad > 0) {
        val msg = s"$what: $bad value(s) outside the domain"
        if (error == "raise") throw new RuntimeException(msg)
        else System.err.println(s"[graft] WARNING $msg")
      }
    }
    df.withColumn(dest, when(coalesce(outOfDomain, lit(false)), lit(null))
      .otherwise(result))
  }

  /** log with the reference's error contract (math.py:14-60); the
    * default matches the reference's `error="warn"` (one bounded count
    * aggregate — pass "ignore" to skip it on hot paths). */
  def logOf(df: DataFrame, column: String, dest: String,
      error: String = "warn"): DataFrame = {
    val c = col(s"`$column`").cast("double")
    withDomain(df, column, dest, error, c <= 0.0,
      "log (non-positive input)", log(c))
  }

  /** logit with the reference's error contract (math.py:154-205);
    * default "warn" matches the reference. */
  def logitOf(df: DataFrame, column: String, dest: String,
      error: String = "warn"): DataFrame = {
    val c = col(s"`$column`").cast("double")
    withDomain(df, column, dest, error, c <= 0.0 || c >= 1.0,
      "logit (input outside (0, 1))", log(c / (lit(1.0) - c)))
  }

  /** Softmax over the whole column (reference: janitor/math.py:118).
    * Numerically-stabilized with max subtraction; two scalar aggregates.
    */
  def softmax(df: DataFrame, column: String, dest: String): DataFrame = {
    val c = col(s"`$column`").cast("double")
    // null aggregates (empty frame / all-null column) must not crash the
    // driver read — identity fallbacks keep the projection well-typed and
    // the affected rows are null/absent anyway
    val mxRow = df.agg(max(c)).collect()(0)
    val mx = if (mxRow.isNullAt(0)) 0.0 else mxRow.getDouble(0)
    val dRow = df.agg(sum(exp(c - mx))).collect()(0)
    val denom = if (dRow.isNullAt(0)) 1.0 else dRow.getDouble(0)
    df.withColumn(dest, exp(c - mx) / denom)
  }

  /** (reference: janitor/math.py:284) (x - mean) / std */
  def zScore(df: DataFrame, column: String, dest: String): DataFrame = {
    val c = col(s"`$column`").cast("double")
    val row = df.agg(avg(c).as("m"), stddev(c).as("s")).collect()(0)
    // single-row / empty input: sample stddev is null — pandas emits NaN
    // for the z-score there, so propagate NaN rather than crash
    val m = if (row.isNullAt(0)) Double.NaN else row.getDouble(0)
    val s = if (row.isNullAt(1)) Double.NaN else row.getDouble(1)
    df.withColumn(dest, (c - m) / s)
  }

  /** Empirical CDF (reference: janitor/math.py:330) — cume_dist semantics
    * (fraction of rows with value ≤ v, ties included) computed scale-safe:
    * count per distinct value, two-phase prefix sum over the value order
    * ([[graft.operators.ScaleWindows.runningSum]]), null-safe join back.
    * Every shuffle is keyed on the value; no single-partition window.
    */
  def ecdf(df: DataFrame, column: String, dest: String): DataFrame = {
    val n = df.count()
    val counts = df.groupBy(col(s"`$column`").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val cum = graft.operators.ScaleWindows.runningSum(counts, "__v", "__cnt", "__cum")
      .select(col("__v"), col("__cum"))
    df.join(cum, df(column) <=> cum("__v"), "left")
      .withColumn(dest, col("__cum").cast("double") / n)
      .drop("__v", "__cum")
  }
}
