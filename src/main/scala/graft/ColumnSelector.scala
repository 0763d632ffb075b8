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
  /** Inclusive label slice in schema order with pandas .loc semantics:
    * open ends select from the schema edge, a positive step from a later
    * to an earlier label is empty, step=-1 walks backwards
    * (select.py:620-642; tests/functions/test_select_columns.py slicers).
    */
  final case class Slice(from: Option[String], to: Option[String],
      step: Int = 1) extends ColumnSelector
  object Slice {
    def apply(from: String, to: String): Slice = Slice(Some(from), Some(to))
  }
  /** Positional boolean mask over the schema, pandas loc[:, booleans]
    * (test_list_boolean); length must equal the column count.
    */
  final case class Mask(bools: Seq[Boolean]) extends ColumnSelector
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
    case Slice(from, to, step) =>
      val names = fields.map(_.name)
      // pandas refuses label slices over duplicate labels
      // (test_slice_unique: "Non-unique Index labels should be monotonic
      // increasing.")
      require(names.distinct.length == names.length,
        "Non-unique Index labels should be monotonic increasing.")
      require(step != 0, "slice step cannot be zero")
      def at(bound: Option[String], dflt: Int): Int = bound match {
        case None => dflt
        case Some(b) =>
          val i = names.indexOf(b)
          if (i < 0) throw new NoSuchElementException(
            s"Slice bound '$b' not in schema")
          i
      }
      if (step > 0) {
        val i = at(from, 0); val j = at(to, names.length - 1)
        // a later-to-earlier slice with a positive step is empty, like .loc
        if (i > j) Nil else names.slice(i, j + 1).grouped(step).map(_.head).toSeq
      } else {
        val i = at(from, names.length - 1); val j = at(to, 0)
        if (i < j) Nil
        else (i to j by step).map(names)
      }
    case Mask(bools) =>
      require(bools.length == fields.length,
        s"The length of the list of booleans (${bools.length}) does not " +
          s"match the number of columns (${fields.length}) in the dataframe.")
      fields.zip(bools).collect { case (f, true) => f.name }
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
