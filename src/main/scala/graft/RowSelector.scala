package graft

import org.apache.spark.sql.{Column, DataFrame}
import scala.util.matching.Regex

/** The row-axis select mini-language (reference:
  * janitor/functions/select.py:500-753 `_select_index` row dispatch and
  * tests/functions/test_select_rows.py). Pandas selects rows against the
  * frame's INDEX; a distributed frame has no implicit index, so every form
  * here names an explicit index column (SURVEY §1.1) and compiles to one
  * `filter` — a plain predicate Catalyst can push to the scan. Positional
  * forms (slice step, boolean masks) derive position from the index
  * ordering via a scale-safe prefix count, never a single-partition window.
  */
sealed trait RowSelector

object RowSelector {
  /** One exact label; raises the reference's KeyError analog when absent
    * (select.py:561-566 get_loc failure).
    */
  final case class Label(value: Any) extends RowSelector

  /** A list/set/array of exact labels. EVERY label must match at least one
    * row — pandas .loc list form raises on any missing label
    * (test_select_rows.py:291-295 test_missing_some_array), with the
    * all-missing vs some-missing messages of select.py:741-749.
    */
  final case class Labels(values: Seq[Any]) extends RowSelector

  /** Regex over the string form of the index (select.py:500-513
    * `_select_regex`: `contains` semantics, raise when nothing matches).
    */
  final case class Rx(pattern: Regex) extends RowSelector

  /** Partial ISO date string on a date/timestamp index — pandas' partial
    * string indexing: "2011" is all of 2011, "2011-01" all of January,
    * "2011-01-31" that day (test_date_partial_output). Raises when the
    * period contains no rows (test_date_not_found).
    */
  final case class DateStr(prefix: String) extends RowSelector

  /** Label slice, both bounds INCLUSIVE like pandas .loc (select.py:620-642).
    * String bounds on a date/timestamp index resolve as periods — start to
    * the period's first instant, stop to its last (test_slice_dates_inexact:
    * slice("2011-01","2011-03") keeps all of March). `step` is positional
    * within the sliced region in index order (test_slice2: slice(None,None,2)
    * = every 2nd row). Pandas' monotonicity ValueErrors (select.py:630-639)
    * guard the FRAME order, which does not exist here: the index column
    * itself defines the order, so the precondition holds by construction.
    */
  final case class LabelSlice(start: Option[Any] = None, stop: Option[Any] = None,
      step: Int = 1) extends RowSelector

  /** Positional boolean mask, driver-sized by definition (a Python list of
    * booleans). Length must equal the row count or the reference's
    * ValueError fires (test_boolean_list_uneven_length); position is the
    * index ordering.
    */
  final case class BoolMask(mask: Seq[Boolean]) extends RowSelector

  /** Callable form: a boolean Column built from the frame
    * (test_callable — `lambda df: df.index.month == 4`).
    */
  final case class Where(f: DataFrame => Column) extends RowSelector

  /** Dict form over a multi-column index: level name -> allowed labels,
    * conjunctive across levels (test_dict — `{"first": ["bar","qux"],
    * "second": "two"}` = loc(axis=0)[["bar","qux"], "two"]). Each level's
    * labels must all be present.
    */
  final case class Levels(levels: Map[String, Seq[Any]]) extends RowSelector
}
