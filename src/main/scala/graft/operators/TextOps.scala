package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** process_text: pandas `.str` method surface mapped to codegen'd Spark
  * functions (reference: janitor/functions/process_text.py:25,98-107 —
  * introspects pd.Series.str; here the finite dispatch table is explicit).
  */
object TextOps {

  def processText(df: DataFrame, column: String, method: String,
      args: Seq[Any] = Nil): DataFrame =
    df.withColumn(column, strMethod(col(s"`$column`"), method, args))

  def strMethod(c: Column, method: String, args: Seq[Any] = Nil): Column = {
    def s(i: Int): String = args(i).toString
    def i(idx: Int): Int = args(idx).toString.toInt
    method match {
      case "lower" => lower(c)
      case "upper" => upper(c)
      case "title" => initcap(c)
      case "capitalize" => concat(upper(substring(c, 1, 1)), lower(expr_substr(c, 2)))
      case "strip" => trim(c)
      case "lstrip" => ltrim(c)
      case "rstrip" => rtrim(c)
      case "len" => length(c)
      case "contains" => c.contains(s(0))
      case "startswith" => c.startsWith(s(0))
      case "endswith" => c.endsWith(s(0))
      case "find" => instr(c, s(0)) - 1
      case "slice" =>
        // full python slice semantics (empirically verified against the
        // reference): negative indices count from the end and clamp to
        // [0, len]; a missing stop means len
        val len = length(c)
        def bound(raw: Int): Column = {
          val b = lit(raw)
          if (raw >= 0) least(b, len) else greatest(len + b, lit(0))
        }
        val st = bound(i(0))
        val en = if (args.length > 1) bound(i(1)) else len
        c.substr(st + 1, greatest(en - st, lit(0)))
      case "get" =>
        // .str.get: negative = from the end; out of range either way -> null
        val len = length(c)
        val pos = if (i(0) >= 0) lit(i(0) + 1) else len + i(0) + 1
        when(pos >= 1 && pos <= len, c.substr(pos, lit(1))).otherwise(lit(null))
      case "replace" => regexp_replace(c, s(0), s(1))
      case "extract" => regexp_extract(c, s(0), if (args.length > 1) i(1) else 1)
      case "split" => split(c, s(0))
      // python pad family NEVER truncates (lpad/rpad do) — strings already
      // at/over width pass through unchanged
      case "pad_left" | "rjust" | "zfill" =>
        val fill = if (args.length > 1) s(1) else if (method == "zfill") "0" else " "
        when(length(c) >= i(0), c).otherwise(lpad(c, i(0), fill))
      case "pad_right" | "ljust" =>
        val fill = if (args.length > 1) s(1) else " "
        when(length(c) >= i(0), c).otherwise(rpad(c, i(0), fill))
      case "count" => size(split(c, s(0))) - 1
      case "repeat" => repeat(c, i(0))
      case "reverse" => reverse(c)
      case "casefold" => lower(c)
      case "removeprefix" =>
        when(c.startsWith(s(0)), c.substr(lit(s(0).length + 1), length(c))).otherwise(c)
      case "removesuffix" =>
        when(c.endsWith(s(0)), c.substr(lit(1), length(c) - s(0).length)).otherwise(c)
      case "isdigit" => c.rlike("^[0-9]+$")
      case "isalpha" => c.rlike("^\\p{L}+$")
      case "isalnum" => c.rlike("^[\\p{L}0-9]+$")
      case "isspace" => c.rlike("^\\s+$")
      case "islower" => (c === lower(c)) && (c =!= upper(c))
      case "isupper" => (c === upper(c)) && (c =!= lower(c))
      // element-wise concat with literal others: args = sep +: others
      // (pandas .str.cat's no-others form is a whole-column aggregation —
      // out of scope for a per-row dispatch; pass others explicitly)
      case "cat" => concat_ws(s(0), c +: args.drop(1).map(a => lit(a.toString)): _*)
      // greedy wrap at word boundaries: break lines at <= width chars on a
      // space (or end of string); words longer than width are not broken —
      // the common case of pandas .str.wrap(break_long_words) semantics on
      // space-separated text
      case "wrap" =>
        rtrim(regexp_replace(c, s"(.{1,${i(0)}})( +|$$)", "$1\n"), "\n")
      case "normalize" =>
        graft.functions.expressions.unicode_normalize(c, s(0).toUpperCase)
      // first-occurrence split into a (head, sep, tail) struct; sep absent
      // -> (whole, "", "") like pandas .str.partition
      case "partition" =>
        val sep = s(0)
        val idx = instr(c, sep)
        struct(
          when(idx > 0, c.substr(lit(1), idx - 1)).otherwise(c).as("head"),
          when(idx > 0, lit(sep)).otherwise(lit("")).as("sep"),
          when(idx > 0, c.substr(idx + sep.length, length(c)))
            .otherwise(lit("")).as("tail"))
      // char-for-char mapping: args = (matching chars, replacement chars);
      // a matching char with no replacement counterpart is deleted —
      // Spark's translate builtin is exactly python str.translate for
      // 1:1/1:0 char tables
      case "translate" => translate(c, s(0), s(1))
      case "swapcase" =>
        // no builtin: flip case per character (letters only — a char equal
        // to its lower form but not its upper form is lowercase, and vice
        // versa; caseless chars fall through unchanged)
        concat_ws("", transform(split(c, ""),
          ch => when(ch =!= lower(ch), lower(ch))
            .when(ch =!= upper(ch), upper(ch))
            .otherwise(ch)))
      case "slice_replace" => // [start, stop) replaced; non-negative bounds
        concat(substring(c, 1, i(0)), lit(s(2)), c.substr(lit(i(1) + 1), length(c)))
      case "center" =>
        val width = i(0)
        val fill = lit(if (args.length > 1) s(1) else " ")
        // CPython str.center: marg = width - len; left = marg//2 +
        // (marg & width & 1) — the extra pad goes LEFT when both the
        // margin and the width are odd ('ab'.center(5) == '..ab.'),
        // not plain floor division
        val marg = lit(width) - length(c)
        val left = floor(marg.cast("double") / 2).cast("int") +
          marg.bitwiseAND(lit(width)).bitwiseAND(lit(1))
        val mid = call_function("lpad", c, length(c) + left, fill)
        when(length(c) >= width, c)
          .otherwise(call_function("rpad", mid, lit(width), fill))
      case "pad" => // kwargs order (width, side, fillchar), side default left
        val side = if (args.length > 1) s(1) else "left"
        val fill = if (args.length > 2) s(2) else " "
        side match {
          case "left" => strMethod(c, "rjust", Seq(args.head, fill))
          case "right" => strMethod(c, "ljust", Seq(args.head, fill))
          case "both" => strMethod(c, "center", Seq(args.head, fill))
          case o => throw new IllegalArgumentException(s"pad: bad side $o")
        }
      case "encode" => encode(c, s(0))
      case "decode" => decode(c.cast("binary"), s(0))
      case "findall" =>
        // Python re.findall rule: 0 capture groups -> whole match; exactly
        // 1 -> that group's text; >=2 returns TUPLES, which a flat
        // array<string> cannot carry — require an explicit group index
        // there rather than silently diverging
        val groups = java.util.regex.Pattern.compile(s(0)).matcher("").groupCount()
        val idx =
          if (args.length > 1) i(1)
          else if (groups == 1) 1
          else if (groups >= 2) throw new IllegalArgumentException(
            s"findall: pattern '${s(0)}' has $groups capture groups; Python " +
              "returns tuples there — pass an explicit group index as the " +
              "second argument")
          else 0
        regexp_extract_all(c, lit(s(0)), lit(idx))
      case "match" => c.rlike(s"^(?:${s(0)})")
      case "fullmatch" => c.rlike(s"^(?:${s(0)})$$")
      case "index" => strMethod(c, "find", args) // row-wise: -1, not raise
      case "rfind" | "rindex" =>
        val sep = s(0)
        val pos = instr(reverse(c), sep.reverse) // 1-based in the reversal
        when(pos > 0, length(c) - (pos - 1) - sep.length).otherwise(lit(-1))
      case "rpartition" =>
        val sep = s(0)
        val pos = instr(reverse(c), sep.reverse)
        val start0 = length(c) - (pos - 1) - sep.length // 0-based sep start
        struct(
          when(pos > 0, c.substr(lit(1), start0)).otherwise(lit("")).as("head"),
          when(pos > 0, lit(sep)).otherwise(lit("")).as("sep"),
          when(pos > 0, c.substr(start0 + sep.length + 1, length(c)))
            .otherwise(c).as("tail"))
      case "rsplit" => split(c, s(0)) // full split == split; no maxsplit
      case "join" => // element-wise over the string's chars
        array_join(filter(split(c, ""), ch => ch =!= ""), s(0))
      case "isdecimal" => c.rlike("^\\p{Nd}+$")
      case "isnumeric" => c.rlike("^\\p{N}+$")
      // space-delimited titlecase (initcap's word model); python's istitle
      // also breaks words at punctuation — document, don't pretend
      case "istitle" => c.rlike("\\p{L}") && (c === initcap(c))
      // the reference's own contract: pd.Series.str methods whose outcome
      // is a DataFrame are rejected (process_text.py:110-115 ValueError)
      case "extractall" | "get_dummies" =>
        throw new IllegalArgumentException(
          s"process_text: $method produces a DataFrame — rejected by the " +
            "reference contract (use extract / encode_categorical instead)")
      case other => throw new IllegalArgumentException(s"process_text: unknown str method $other")
    }
  }

  private def expr_substr(c: Column, from: Int): Column =
    c.substr(lit(from), length(c))

  /** String-concat columns with separator (reference:
    * janitor/functions/concatenate_columns.py:12-75; default
    * ignore_empty=true like the reference). With ignore_empty=false a null
    * contributes an EMPTY segment (the separator stays), with true both
    * null and empty segments are stripped — the reference's
    * remove_empty_string over the astype(str) join. Divergence (documented):
    * pandas astype(str) spells a float NaN as the literal "nan" so its
    * segment survives ignore_empty; Spark nulls have no string spelling, so
    * missing values never inject "nan"/"None" text. At least two columns,
    * like the reference's JanitorError.
    */
  def concatenateColumns(df: DataFrame, columns: Seq[String], newColumnName: String,
      sep: String = "-", ignoreEmpty: Boolean = true): DataFrame = {
    require(columns.length >= 2, "At least two columns must be specified")
    val cs = columns.map(n => coalesce(col(s"`$n`").cast("string"), lit("")))
    val combined = if (ignoreEmpty)
      concat_ws(sep, cs.map(c => when(c === "", null).otherwise(c)): _*)
    else concat_ws(sep, cs: _*)
    df.withColumn(newColumnName, combined)
  }

  /** Split one column into N by separator (reference:
    * janitor/functions/deconcatenate_column.py:14). `autoname` overrides
    * the new names with `{autoname}1..N`
    * (test_deconcatenate_column_autoname).
    */
  def deconcatenateColumn(df: DataFrame, column: String, sep: String,
      newColumnNames: Seq[String], preservePosition: Boolean = false,
      autoname: Option[String] = None, strict: Boolean = false): DataFrame = {
    val names = autoname
      .map(p => newColumnNames.indices.map(i => s"$p${i + 1}"))
      .getOrElse(newColumnNames)
    val parts = split(col(s"`$column`"), java.util.regex.Pattern.quote(sep))
    // strict=true restores the reference's BOTH-direction width check
    // (deconcatenate_column.py:132-137): one bounded max(size) aggregate
    // detects the under-width case the lazy branch below cannot (the whole
    // frame splitting narrower than names). Opt-in — the default keeps the
    // stamp free of an eager scan and pads short frames with nulls
    // (SURVEY §7.7 divergence ledger).
    if (strict) {
      val row = df.agg(max(when(col(s"`$column`").isNotNull, size(parts))),
        count(lit(1))).collect()(0)
      // pandas str.split(expand=True) width: an all-null column still
      // expands to ONE all-NaN column (shape (n, 1)); an empty frame
      // expands to zero columns (shape (0, 0)) — both raise on mismatch
      val width =
        if (row.getLong(1) == 0L) 0
        else if (row.isNullAt(0)) 1
        else math.max(row.getInt(0), 1)
      require(width == names.length,
        s"deconcatenate_column: expanded split width ($width) != number of " +
          s"new column names (${names.length})")
    }
    // the reference raises when new_column_names count differs from the
    // EXPANDED width — str.split(expand=True)'s max part count over all
    // rows (deconcatenate_column.py:132-137). Rows with FEWER parts are
    // padded with NaN by the expand, and null cells become all-NaN rows. A
    // lazy codegen raise_error branch keeps the over-width half of the
    // contract without an eager validation scan: any row with MORE parts
    // than names means the expanded width exceeds names, which the
    // reference raises on. The under-width half (max parts over the whole
    // frame < names) would need a global aggregate pass to detect, so it
    // pads instead of raising — documented divergence. Null cells pass
    // through as all-null (split(null) is null; guarding explicitly keeps
    // the raise branch from firing on the null size).
    val guarded = when(col(s"`$column`").isNull, lit(null).cast("array<string>"))
      .when(size(parts) <= names.length, parts)
      .otherwise(raise_error(concat(
        lit(s"deconcatenate_column: number of new column names (${names.length}) " +
          s"is fewer than the number of split parts ("),
        size(parts).cast("string"), lit(s") for value '"), col(s"`$column`"),
        lit("'"))))
    // get() (not getItem) so a short row's missing tail indexes yield null
    // (pandas' NaN padding) instead of ANSI INVALID_ARRAY_INDEX
    val withParts = names.zipWithIndex.foldLeft(df) { case (acc, (n, idx)) =>
      acc.withColumn(n, get(guarded, lit(idx)))
    }
    if (preservePosition) {
      // the reference splices the new columns in at the original column's
      // index (deconcatenate_column.py preserve_position=True)
      val out = df.columns.flatMap {
        case `column` => names
        case c => Seq(c)
      }
      withParts.select(out.map(n => col(s"`$n`")).toIndexedSeq: _*)
    } else withParts
  }

  /** One-hot expand a delimited categorical cell (reference:
    * janitor/functions/expand_column.py:13). The label universe is a bounded
    * distinct collect (data-dependent schema — SURVEY §7.7).
    */
  def expandColumn(df: DataFrame, column: String, sep: String = "|",
      concatDf: Boolean = true): DataFrame = {
    val labels = df.select(explode(split(col(s"`$column`"), java.util.regex.Pattern.quote(sep))).as("__l"))
      .distinct().collect().map(_.getString(0)).sorted
    val parts = split(col(s"`$column`"), java.util.regex.Pattern.quote(sep))
    val dummies = labels.map(l => array_contains(parts, l).cast("int").as(l))
    if (concatDf) df.select((df.columns.map(n => col(s"`$n`")) ++ dummies).toIndexedSeq: _*)
    else df.select(dummies.toIndexedSeq: _*)
  }
}
