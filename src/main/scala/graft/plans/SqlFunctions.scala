package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{NaturalSortKey, NormalCdf, Probit, StripAccents, UnicodeNormalize}
import graft.functions.vector.{DeletionHashes, DotProduct, GramHash48, JaroWinkler, L2Norm, MinhashSig, SimhashSig, SortedIntersectCount, WindowMin}

/** SQL registration of the graft codegen kernels: every custom Catalyst
  * expression that takes only column + literal arguments becomes callable
  * from `spark.sql(...)` / `selectExpr` — the same surface builtin
  * functions have, so SQL-first users (and BI tools emitting SQL) reach
  * the kernels without Scala imports.
  *
  * Registered by [[GraftExtensions]]; names are graft-specific (no builtin
  * collisions). Arity and literal-ness are validated at resolution time —
  * a non-foldable shingle size, say, is a clear AnalysisException instead
  * of a runtime class cast.
  */
object SqlFunctions {

  /** Literal-integer argument (shingle sizes, hash counts, windows): the
    * kernels specialize codegen on these, so they must fold at plan time.
    */
  private def intLit(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn: $arg must be a literal integer")
    e.eval() match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a literal integer, got $other")
    }
  }

  private def strLit(e: Expression, fn: String, arg: String): String = {
    require(e.foldable, s"$fn: $arg must be a literal string")
    String.valueOf(e.eval())
  }

  private def arity(fn: String, es: Seq[Expression], n: Int): Unit =
    require(es.length == n, s"$fn expects $n arguments, got ${es.length}")

  /** (name, usage, builder) for every SQL-exposed kernel. */
  val registry: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("jaro_winkler", "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]",
      es => { arity("jaro_winkler", es, 2); JaroWinkler(es(0), es(1)) }),
    ("natural_sort_key", "natural_sort_key(s) - sort key with numeric runs zero-padded",
      es => { arity("natural_sort_key", es, 1); NaturalSortKey(es(0)) }),
    ("normal_cdf", "normal_cdf(x) - standard normal CDF",
      es => { arity("normal_cdf", es, 1); NormalCdf(es(0)) }),
    ("probit", "probit(p) - inverse standard normal CDF",
      es => { arity("probit", es, 1); Probit(es(0)) }),
    ("strip_accents", "strip_accents(s) - remove combining marks (NFD fold)",
      es => { arity("strip_accents", es, 1); StripAccents(es(0)) }),
    ("unicode_normalize", "unicode_normalize(s, 'NFC'|'NFD'|'NFKC'|'NFKD')",
      es => { arity("unicode_normalize", es, 2)
        UnicodeNormalize(es(0), strLit(es(1), "unicode_normalize", "form")) }),
    ("dot_product", "dot_product(a, b) - float-vector dot product (double)",
      es => { arity("dot_product", es, 2); DotProduct(es(0), es(1)) }),
    ("l2_norm", "l2_norm(v) - Euclidean norm of a float vector (double)",
      es => { arity("l2_norm", es, 1); L2Norm(es(0)) }),
    ("sorted_intersect_count", "sorted_intersect_count(a, b) - |a ∩ b| of two sorted distinct string arrays",
      es => { arity("sorted_intersect_count", es, 2)
        SortedIntersectCount(es(0), es(1)) }),
    ("gram_hash48", "gram_hash48(tokens, n) - 48-bit md5 hashes of word n-grams",
      es => { arity("gram_hash48", es, 2)
        GramHash48(es(0), intLit(es(1), "gram_hash48", "n")) }),
    ("minhash_sig", "minhash_sig(tokens, num_hashes, shingle_n) - MinHash signature",
      es => { arity("minhash_sig", es, 3)
        MinhashSig(es(0), intLit(es(1), "minhash_sig", "num_hashes"),
          intLit(es(2), "minhash_sig", "shingle_n")) }),
    ("simhash_sig", "simhash_sig(tokens, bits) - SimHash signature (<= 63 bits)",
      es => { arity("simhash_sig", es, 2)
        SimhashSig(es(0), intLit(es(1), "simhash_sig", "bits")) }),
    ("window_min", "window_min(arr, w) - winnowing: min of each sliding window, rightmost-tie, distinct-adjacent",
      es => { arity("window_min", es, 2)
        WindowMin(es(0), intLit(es(1), "window_min", "w")) }),
    ("deletion_hashes", "deletion_hashes(s, k) - FastSS <=k-deletion neighborhood hashes",
      es => { arity("deletion_hashes", es, 2)
        DeletionHashes(es(0), intLit(es(1), "deletion_hashes", "k")) }))

  def inject(e: SparkSessionExtensions): Unit = registry.foreach {
    case (name, usage, builder) =>
      // ExpressionInfo(className, db, name, usage, extended)
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", null, name, usage, ""), builder))
  }
}
