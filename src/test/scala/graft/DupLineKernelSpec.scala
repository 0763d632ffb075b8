package graft

import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._

/** Focused equivalence spec for the round-21 dupLineStats kernel
  * (vector.dupLineCountsKernel): the compiled split/trim/count pass must be
  * value-identical to the sorted-adjacency higher-order-function
  * formulation it replaced, on exactly the edges where the two could
  * diverge — trim width (SQL trim is 0x20-only, NOT Java's ≤0x20),
  * trailing/consecutive newlines, blank-ish lines, multi-byte characters
  * (numChars vs numBytes), duplicate multiplicities, and null text.
  */
class DupLineKernelSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r21 HOF formulation, verbatim — the reference semantics. */
  private def hofDupLineStats(text: org.apache.spark.sql.Column) = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val s = array_sort(lines)
    val n = size(s)
    val m = greatest(n - 1, lit(0))
    val prev = slice(s, lit(1), m)
    val next = slice(s, lit(2), m)
    val dupLines = aggregate(
      zip_with(prev, next, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (a, x) => a + x)
    val dupChars = aggregate(
      zip_with(prev, next, (a, b) => when(a === b, length(b)).otherwise(0)),
      lit(0), (a, x) => a + x)
    val totChars = aggregate(transform(s, l => length(l)), lit(0), (a, x) => a + x)
    struct(
      n.as("n_lines"),
      dupLines.as("n_dup_lines"),
      when(n > 0, round(dupLines.cast("double") / n, 6)).otherwise(0.0d).as("dup_line_frac"),
      when(totChars > 0, round(dupChars.cast("double") / totChars, 6))
        .otherwise(0.0d).as("dup_char_frac"))
  }

  test("dupLineStats kernel ≡ HOF formulation on the divergence edges") {
    val cases = Seq(
      "a\nb\na\nb\na",                 // interleaved duplicates
      "",                              // empty text
      "\n\n\n",                        // only empty lines
      "   \n\t\n x \n x ",             // space-only line drops, tab line KEEPS (trim is 0x20-only)
      "line\n",                        // trailing newline
      "one single line",              // no newline at all
      "é¥\né¥\nascii",                // multi-byte duplicates (chars ≠ bytes)
      "dup\ndup\ndup\ndup",           // multiplicity 4 → 3 extra copies
      " pad \npad\n pad ",            // padded vs unpadded are DIFFERENT lines
      "a\na\nb\nb\nc\nc\nc",          // several groups
      null.asInstanceOf[String])      // null text → null counts, 0.0 fracs
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val both = df.select(col("id"),
      TextAnalysis.dupLineStats(col("t")).as("k"),
      hofDupLineStats(col("t")).as("h"))
    val rows = both.orderBy("id").collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"id=${r.getLong(0)}: kernel=${r.get(1)} hof=${r.get(2)}")
    }
  }
}
