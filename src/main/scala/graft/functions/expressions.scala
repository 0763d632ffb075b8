package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom scalar Catalyst expressions (codegen-capable) for semantics Spark's
  * built-in function library lacks. Kept deliberately small per SURVEY §7.2:
  * accent stripping, natural-sort key, normal CDF / probit.
  */
object expressions {

  /** Strip diacritics: NFD normalize + drop combining marks.
    * (reference: janitor/functions/clean_names.py:239-255)
    */
  case class StripAccents(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(Norm.stripAccents(input.toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.Norm.stripAccents($c.toString()))")
    override protected def withNewChildInternal(newChild: Expression): StripAccents =
      copy(child = newChild)
  }

  /** Natural-sort key: split digit runs and zero-pad them to width 20 so that
    * lexicographic order == natural (human) order.
    * (reference: janitor/functions/sort_naturally.py:11 — natsort semantics)
    */
  def naturalKeyJava(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    val m = java.util.regex.Pattern.compile("\\d+").matcher(s)
    var last = 0
    while (m.find()) {
      sb.append(s.substring(last, m.start()).toLowerCase)
      val digits = m.group()
      val trimmed = digits.dropWhile(_ == '0')
      val core = if (trimmed.isEmpty) "0" else trimmed
      sb.append("0" * (20 - math.min(20, core.length))).append(core)
      last = m.end()
    }
    sb.append(s.substring(last).toLowerCase)
    sb.toString
  }

  case class NaturalSortKey(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(naturalKeyJava(input.toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.expressions.naturalKeyJava($c.toString()))")
    override protected def withNewChildInternal(newChild: Expression): NaturalSortKey =
      copy(child = newChild)
  }

  /** Error function via Abramowitz & Stegun 7.1.26-style rational approximation
    * refined with the standard continued-fraction-free formula (max abs error
    * ~1.5e-7; sufficient for normal_cdf parity tests which assert 1e-6 tol).
    */
  def erf(x: Double): Double = {
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
    if (x >= 0) y else -y
  }

  /** Standard normal CDF (reference: janitor/math.py:207 — scipy norm.cdf). */
  def normCdf(x: Double): Double = 0.5 * (1.0 + erf(x / math.sqrt(2.0)))

  /** Inverse standard normal CDF — Acklam's algorithm (public domain,
    * widely-published constants; |rel err| < 1.15e-9).
    * (reference: janitor/math.py:233 — scipy norm.ppf)
    */
  def normPpf(p: Double): Double = {
    if (p.isNaN || p <= 0.0 || p >= 1.0) {
      if (p == 0.0) Double.NegativeInfinity
      else if (p == 1.0) Double.PositiveInfinity
      else Double.NaN
    } else {
      val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
        -2.759285104469687e+02, 1.383577518672690e+02,
        -3.066479806614716e+01, 2.506628277459239e+00)
      val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
        -1.556989798598866e+02, 6.680131188771972e+01,
        -1.328068155288572e+01)
      val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
        -2.400758277161838e+00, -2.549732539343734e+00,
        4.374664141464968e+00, 2.938163982698783e+00)
      val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
        2.445134137142996e+00, 3.754408661907416e+00)
      val plow = 0.02425
      val phigh = 1 - plow
      if (p < plow) {
        val q = math.sqrt(-2 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      } else if (p <= phigh) {
        val q = p - 0.5
        val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
      } else {
        val q = math.sqrt(-2 * math.log(1 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
      }
    }
  }

  case class NormalCdf(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      normCdf(input.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expressions.normCdf($c)")
    override protected def withNewChildInternal(newChild: Expression): NormalCdf =
      copy(child = newChild)
  }

  case class Probit(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(input: Any): Any =
      normPpf(input.asInstanceOf[Double])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.expressions.normPpf($c)")
    override protected def withNewChildInternal(newChild: Expression): Probit =
      copy(child = newChild)
  }

  /** Unicode normalization form application — the pandas `.str.normalize`
    * surface (reference: janitor/functions/process_text.py:98-107). The form
    * is a plan-time constant, not a child expression, so codegen can inline
    * it as a literal.
    */
  def unicodeNormalizeJava(s: String, form: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form))

  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {
    require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"normalize: bad unicode form $form")
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(unicodeNormalizeJava(input.toString, form))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"""graft.functions.expressions.unicodeNormalizeJava($c.toString(), "$form"))""")
    override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
      copy(child = newChild)
  }

  // Column wrappers ----------------------------------------------------------
  private def col(e: Expression): Column = org.apache.spark.sql.graftx.Bridge.column(e)
  private def expr(c: Column): Expression = org.apache.spark.sql.graftx.Bridge.expression(c)

  def strip_accents(c: Column): Column = col(StripAccents(expr(c)))
  def natural_sort_key(c: Column): Column = col(NaturalSortKey(expr(c)))
  def normal_cdf(c: Column): Column = col(NormalCdf(expr(c)))
  def probit(c: Column): Column = col(Probit(expr(c)))
  def unicode_normalize(c: Column, form: String): Column =
    col(UnicodeNormalize(expr(c), form))
}
