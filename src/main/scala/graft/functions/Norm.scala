package graft.functions

import java.text.Normalizer

/** String normalization helpers shared by driver-side name cleaning and the
  * executor-side [[StripAccents]] expression. Semantics follow the reference
  * pipeline (reference: janitor/functions/clean_names.py:172-274).
  */
object Norm {

  /** NFD-normalize and drop combining marks (clean_names.py:239-255). */
  def stripAccents(s: String): String = {
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val c = decomposed.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    sb.toString
  }

  private val camel1 = "(.)([A-Z][a-z]+)".r
  private val camel2 = "([a-z0-9])([A-Z])".r

  /** camelCase -> snake_case, then lowercase (clean_names.py:224-229). */
  def toSnake(s: String): String = {
    val a = camel1.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(m.group(1) + "_" + m.group(2)))
    val b = camel2.replaceAllIn(a, m => java.util.regex.Matcher.quoteReplacement(m.group(1) + "_" + m.group(2)))
    b.toLowerCase
  }

  /** Full clean_names label pipeline (clean_names.py:172-201). The
    * reference default is NO underscore stripping (utils.py:757-774:
    * strip_underscores=None returns the label unchanged) and an invalid
    * value raises — both mirrored here since round 14. strip_accents
    * defaults TRUE like the reference (clean_names.py:26) since round 15.
    */
  def cleanName(
      name: String,
      caseType: String = "lower",
      removeSpecial: Boolean = false,
      stripAccentsFlag: Boolean = true,
      stripUnderscores: Option[String] = None,
      truncateLimit: Int = 0): String = {
    var s = caseType.toLowerCase match {
      case "preserve" => name
      case "upper"    => name.toUpperCase
      case "lower"    => name.toLowerCase
      case "snake"    => toSnake(name)
      case other => throw new IllegalArgumentException(
        s"case_type must be one of preserve|upper|lower|snake, got $other")
    }
    // _normalize_1 FIXES (clean_names.py:232-237)
    s = s.replaceAll("[ /:,?()\\.-]", "_")
    s = s.replaceAll("['’]", "")
    s = s.replaceAll("[ ]", "_")
    if (removeSpecial) s = s.replaceAll("[^A-Za-z_\\d]", "").trim
    if (stripAccentsFlag) s = stripAccents(s)
    s = s.replaceAll("_+", "_")
    s = stripUnderscores match {
      case Some("left") | Some("l")  => s.replaceAll("^_+", "")
      case Some("right") | Some("r") => s.replaceAll("_+$", "")
      case Some("both") | Some("true") => s.replaceAll("^_+", "").replaceAll("_+$", "")
      case None => s
      case Some(other) => throw new IllegalArgumentException(
        "strip_underscores must be one of: None, left, right, both, l, r, " +
          s"true — got $other (utils.py:762-766 JanitorError)")
    }
    if (truncateLimit > 0) s.take(truncateLimit) else s
  }
}
