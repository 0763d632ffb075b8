package graft

import org.apache.spark.sql.types.{DataType, StructField, StructType}
import scala.util.matching.Regex

/** The select mini-language used across verbs (reference:
  * janitor/functions/select.py:332-865 — exact labels, globs, regex,
  * label slices, dtype predicates, complements, combinations). Resolution is
  * pure driver-side name matching against the schema; the result feeds one
  * `df.select(...)`, so Catalyst sees a plain projection.
  */
sealed trait ColumnSelector

object ColumnSelector {
  /** Exact label; errors if absent (select.py:556-566). */
  final case class Exact(name: String) extends ColumnSelector
  /** Shell glob, fnmatch-style `*`/`?` (select.py:569-602). */
  final case class Glob(pattern: String) extends ColumnSelector
  /** Regular expression, matched via `search` semantics (select.py:605-617). */
  final case class Rx(pattern: Regex) extends ColumnSelector
  /** Inclusive label slice in schema order (select.py:620-642). */
  final case class Slice(from: String, to: String) extends ColumnSelector
  /** Predicate over the StructField (dtype callables, select.py:645-665). */
  final case class Pred(f: StructField => Boolean) extends ColumnSelector
  /** Complement (DropLabel, select.py:538-552). */
  final case class Not(sel: ColumnSelector) extends ColumnSelector
  /** Union preserving first-mention order (list form, select.py:770-820). */
  final case class Any(sels: Seq[ColumnSelector]) extends ColumnSelector

  def glob(p: String): ColumnSelector = Glob(p)
  def rx(p: String): ColumnSelector = Rx(p.r)
  def ofType(dt: DataType): ColumnSelector = Pred(_.dataType == dt)
  def numeric: ColumnSelector = Pred(f => f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])

  private def globToRegex(p: String): Regex = {
    val sb = new StringBuilder("^")
    p.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append(".")
      case c if "\\.[]{}()+-^$|".contains(c) => sb.append("\\").append(c)
      case c => sb.append(c)
    }
    sb.append("$").toString.r
  }

  /** Names matched by one selector, in schema order (Exact keeps its own). */
  private def matchOne(fields: Seq[StructField], sel: ColumnSelector): Seq[String] = sel match {
    // one exception type for every no-match condition, like the
    // reference's single KeyError (select.py:510,566)
    case Exact(n) =>
      if (fields.exists(_.name == n)) Seq(n)
      else throw new NoSuchElementException(s"Column '$n' not found. Columns: ${fields.map(_.name).mkString(", ")}")
    // an unmatched glob/regex RAISES like the reference's KeyError
    // (select.py:500-513 "No match was returned") — a silent empty
    // selection hides typos in exactly the place users make them
    case Glob(p) =>
      val r = globToRegex(p)
      val hit = fields.map(_.name).filter(n => r.pattern.matcher(n).matches)
      if (hit.isEmpty) throw new NoSuchElementException(
        s"No match was returned for '$p'. Columns: ${fields.map(_.name).mkString(", ")}")
      hit
    case Rx(r) =>
      val hit = fields.map(_.name).filter(n => r.findFirstIn(n).isDefined)
      if (hit.isEmpty) throw new NoSuchElementException(
        s"No match was returned for '$r'. Columns: ${fields.map(_.name).mkString(", ")}")
      hit
    case Slice(from, to) =>
      val names = fields.map(_.name)
      val i = names.indexOf(from); val j = names.indexOf(to)
      if (i < 0 || j < 0) throw new NoSuchElementException(s"Slice bounds $from..$to not in schema")
      if (i <= j) names.slice(i, j + 1) else names.slice(j, i + 1).reverse
    case Pred(f) => fields.filter(f).map(_.name)
    case Not(s) =>
      val excluded = matchOne(fields, s).toSet
      fields.map(_.name).filterNot(excluded)
    case Any(sels) => dedupe(mergeNots(sels).flatMap(s => matchOne(fields, s)))
  }

  /** Multiple complements in one list act as a SINGLE unit — the reference
    * folds every DropLabel entry into one DropLabel of the combined labels
    * appended last (select.py:800-807), so [Not(a), Not(b)] means
    * "everything except a and b", NOT the union of the two complements
    * (which would be every column).
    */
  private def mergeNots(sels: Seq[ColumnSelector]): Seq[ColumnSelector] = {
    val nots = sels.collect { case Not(inner) => inner }
    if (nots.length > 1) sels.filterNot(_.isInstanceOf[Not]) :+ Not(Any(nots))
    else sels
  }

  private def dedupe(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    names.foreach(seen.add)
    seen.toSeq
  }

  /** Resolve a selector list to concrete column names. `invert` complements
    * the final set, preserving schema order (select.py:410-447 invert flag).
    */
  def resolve(schema: StructType, sels: Seq[ColumnSelector], invert: Boolean = false): Seq[String] = {
    val fields = schema.fields.toSeq
    val hit = dedupe(mergeNots(sels).flatMap(s => matchOne(fields, s)))
    if (invert) fields.map(_.name).filterNot(hit.toSet) else hit
  }
}
