package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector kernels as codegen'd Catalyst expressions. The higher-order
  * `aggregate(zip_with(...))` formulation is interpreted per element (one
  * lambda dispatch per component); these compile to a tight primitive loop.
  * Summation order is ascending-index — identical to the sequential fold
  * they replace and to the DuckDB oracle's list_sum, so results stay
  * bit-equal.
  */
object vector {

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Runtime kernels the generated code calls into (also the interpreted path). */
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    var s = 0.0d; var i = 0; val n = math.min(a.numElements(), b.numElements())
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }; s
  }
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    var s = 0.0d; var i = 0; val n = math.min(a.numElements(), b.numElements())
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }; s
  }
  def normD(a: ArrayData): Double = {
    var s = 0.0d; var i = 0; val n = a.numElements()
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }; math.sqrt(s)
  }
  def normF(a: ArrayData): Double = {
    var s = 0.0d; var i = 0; val n = a.numElements()
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }; math.sqrt(s)
  }

  case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private lazy val floats = isFloat(left.dataType)
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (floats) dotFF(x, y) else dotDD(x, y)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (floats) "dotFF" else "dotDD"
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.vector.$fn($a, $b)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
      copy(left = l, right = r)
  }

  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    private lazy val floats = isFloat(child.dataType)
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      if (floats) normF(x) else normD(x)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (floats) "normF" else "normD"
      defineCodeGen(ctx, ev, a => s"graft.functions.vector.$fn($a)")
    }
    override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
  }

  /** Count of common elements between two SORTED string arrays — a linear
    * merge with zero allocation, replacing array_intersect's per-row hash
    * set in the Jaccard verify loops. Inputs must be sorted ascending and
    * distinct (array_sort(array_distinct(...))).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    var i = 0; var j = 0; var n = 0
    val na = a.numElements(); val nb = b.numElements()
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.vector.sortedIntersectCount($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
      copy(left = l, right = r)
  }

  /** Per-centroid scaled dot products: element c = dot(v, centroids(c)) /
    * norms(c), ascending-index summation with each float widened to double —
    * bit-identical to the unrolled `array(dot(v, lit(...)) / lit(cn), ...)`
    * form it replaces, but the centroid table rides along as ONE reference
    * object instead of nCells × dim literals, so the expression (and its
    * generated code) stays O(1) in nCells. This is what lets IVF cell counts
    * reach the thousands a 100 TB corpus needs.
    */
  def centroidSimsKernel(v: ArrayData, cents: Array[Array[Float]],
      norms: Array[Double]): ArrayData = {
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var s = 0.0d; var i = 0
      val n = math.min(v.numElements(), cv.length)
      while (i < n) { s += v.getFloat(i).toDouble * cv(i).toDouble; i += 1 }
      out(c) = s / norms(c)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** array<double> input variant (rotated vectors — e.g. OPQ — carry
    * doubles); same ascending-index summation contract.
    */
  def centroidSimsKernelD(v: ArrayData, cents: Array[Array[Float]],
      norms: Array[Double]): ArrayData = {
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var s = 0.0d; var i = 0
      val n = math.min(v.numElements(), cv.length)
      while (i < n) { s += v.getDouble(i) * cv(i).toDouble; i += 1 }
      out(c) = s / norms(c)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class CentroidSims(child: Expression, centroids: Array[Array[Float]],
      norms: Array[Double]) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    private lazy val floats = isFloat(child.dataType)
    override def nullSafeEval(a: Any): Any =
      if (floats) centroidSimsKernel(a.asInstanceOf[ArrayData], centroids, norms)
      else centroidSimsKernelD(a.asInstanceOf[ArrayData], centroids, norms)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
      val nRef = ctx.addReferenceObj("norms", norms, "double[]")
      val kernel = if (floats) "centroidSimsKernel" else "centroidSimsKernelD"
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.vector.$kernel($a, $cRef, $nRef)")
    }
    override protected def withNewChildInternal(c: Expression): CentroidSims =
      copy(child = c)
  }

  /** Sliding-window minimum over a long array: out(j) = min(a(j..j+w-1)),
    * j in 0..n-w. Monotonic-deque algorithm — O(n) total, no per-window
    * allocation (the `transform(sequence, j -> array_min(slice(a, j, w)))`
    * formulation it replaces is O(n·w) and allocates a slice per window).
    * Elements must be non-null. n < w yields an empty array.
    */
  def windowMinKernel(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    if (n < w) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - w + 1)
    val dq = new Array[Int](n)
    var head = 0; var tail = 0; var i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = a.getLong(dq(head))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private val md5TL: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** 48-bit md5-prefix hashes of every word n-gram: out(i) = the first 6
    * digest bytes (big-endian unsigned) of md5(tok(i) + " " + ... +
    * tok(i+n-1)) — numerically identical to the SQL-replicable
    * `CAST('0x' || substr(md5(gram), 1, 12) AS BIGINT)`, but hashed straight
    * from the token bytes: no per-gram string build, hex encode, substring,
    * or base-16 parse, and no interpreted lambda dispatch per element.
    * Tokens must be non-null. Fewer than n tokens yields an empty array.
    */
  def gramHashKernel(toks: ArrayData, n: Int): ArrayData = {
    val k = toks.numElements()
    if (k < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val out = new Array[Long](k - n + 1)
    val md = md5TL.get()
    var i = 0
    while (i <= k - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class GramHash48(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "GramHash48: shingle size must be >= 1")
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullSafeEval(a: Any): Any =
      gramHashKernel(a.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.vector.gramHashKernel($a, $n)")
    override protected def withNewChildInternal(c: Expression): GramHash48 =
      copy(child = c)
  }

  /** Jaro-Winkler similarity (standard constants: half-max match window,
    * transpositions/2, Winkler prefix ≤ 4 at p = 0.1 above the 0.7 boost
    * threshold; two empty strings score 0.0) — the ranking companion to
    * the FastSS fuzzy join. Bit-compatible with DuckDB's
    * `jaro_winkler_similarity` on ASCII (DuckDB measures bytes, so
    * multi-byte codepoints diverge there — this kernel is char-based,
    * which is what you want; the oracle gate uses ASCII data).
    */
  def jaroWinklerKernel(ua: org.apache.spark.unsafe.types.UTF8String,
      ub: org.apache.spark.unsafe.types.UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val w = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la); val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb, i + w + 1)
      var j = math.max(0, i - w)
      var hit = false
      while (j < hi && !hit) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j0 = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (j0 > 0.7) {
      var p = 0
      val lim = math.min(4, math.min(la, lb))
      while (p < lim && a.charAt(p) == b.charAt(p)) p += 1
      j0 + p * 0.1 * (1.0 - j0)
    } else j0
  }

  /** Hashes of a string's FastSS ≤ maxDist deletion neighborhood, with no
    * variant string ever materialized: a positional polynomial hash
    * H(s) = Σ c[a]·B^a lets every deletion variant be one O(1) arithmetic
    * combination of a prefix table and once- and twice-B-shifted suffix
    * tables (deleting position i shifts every later exponent down one) —
    * O(len) precompute + O(1) per variant, O(len²) total at k=2, versus the
    * higher-order-function form's O(len³) substring concats and
    * allocations (the dominant cost of the whole fuzzy-join pipeline; see
    * PLANS.md HOF contract). Hash identity is internal to the join — both
    * sides use this kernel and candidates are verified with exact
    * levenshtein, so the hash function only needs to be consistent, never
    * externally replicable. Output is sorted-distinct.
    */
  def deletionHashKernel(s: org.apache.spark.unsafe.types.UTF8String,
      maxDist: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val B = 1099511628211L // FNV prime as the polynomial base
    // pow[a] = B^a; pre[i] = Σ_{a<i} c[a]B^a; s1[t] = Σ_{a>=t} c[a]B^(a-1);
    // s2[t] = Σ_{a>=t} c[a]B^(a-2) (natural 2^64 wraparound)
    val pow = new Array[Long](n + 1)
    pow(0) = 1L
    var a = 0
    while (a < n) { pow(a + 1) = pow(a) * B; a += 1 }
    val pre = new Array[Long](n + 1)
    a = 0
    while (a < n) { pre(a + 1) = pre(a) + str.charAt(a).toLong * pow(a); a += 1 }
    val s1 = new Array[Long](n + 2)
    val s2 = new Array[Long](n + 2)
    a = n - 1
    while (a >= 1) { s1(a) = s1(a + 1) + str.charAt(a).toLong * pow(a - 1); a -= 1 }
    a = n - 1
    while (a >= 2) { s2(a) = s2(a + 1) + str.charAt(a).toLong * pow(a - 2); a -= 1 }
    val out = new java.util.TreeSet[java.lang.Long]()
    // mix with the variant length so "ab" (from "aab" del 0) and an
    // original "ab" still collide (both hash (len=2, same poly)) while
    // different-length equal-poly accidents stay apart
    def fin(h: Long, len: Int): Long = {
      var x = h ^ (len.toLong * 0x9e3779b97f4a7c15L)
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x ^ (x >>> 27)
    }
    out.add(fin(pre(n), n))
    var i = 0
    while (i < n) { // delete position i
      out.add(fin(pre(i) + s1(i + 1), n - 1))
      if (maxDist >= 2) {
        var j = i + 1
        while (j < n) { // delete positions i < j
          out.add(fin(pre(i) + (s1(i + 1) - s1(j)) + s2(j + 1), n - 2))
          j += 1
        }
      }
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  case class DeletionHashes(child: Expression, maxDist: Int)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullSafeEval(a: Any): Any =
      deletionHashKernel(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], maxDist)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.vector.deletionHashKernel($a, $maxDist)")
    override protected def withNewChildInternal(c: Expression): DeletionHashes =
      copy(child = c)
  }

  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinklerKernel(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.vector.jaroWinklerKernel($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
      copy(left = l, right = r)
  }

  /** SimHash signature of a token array in one compiled pass: each DISTINCT
    * token hashed to its 48-bit md5 prefix (numerically identical to
    * `conv(substring(md5(tok), 1, bits/4), 16, 10)`), contributing ±1 at
    * every bit position; bit j of the result is set iff the signed count is
    * positive. Replaces the explode + groupBy(id) + `bits` conditional-sum
    * columns formulation — which shuffles one row per distinct token and
    * generates a 48-wide aggregation buffer — with a narrow per-row map:
    * no shuffle, no aggregate, same value. `bits` must be a multiple of 8
    * (hex-pair aligned), ≤ 63.
    */
  def simhashKernel(toks: ArrayData, bits: Int): Long = {
    val md = md5TL.get()
    val nBytes = bits / 8
    val counts = new Array[Int](bits)
    val seen = new java.util.HashSet[String]()
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val t = toks.getUTF8String(i).toString
      if (seen.add(t)) {
        md.reset()
        val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L; var b = 0
        while (b < nBytes) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L; var j = 0
    while (j < bits) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  case class SimhashSig(child: Expression, bits: Int) extends UnaryExpression {
    require(bits > 0 && bits < 64 && bits % 8 == 0,
      "SimhashSig: bits must be a positive multiple of 8, < 64")
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def nullSafeEval(a: Any): Any =
      simhashKernel(a.asInstanceOf[ArrayData], bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.vector.simhashKernel($a, $bits)")
    override protected def withNewChildInternal(c: Expression): SimhashSig =
      copy(child = c)
  }

  /** Whole MinHash signature for one document in a single compiled pass:
    * distinct word shingles from the token array, then per lane i the min
    * over shingles of Spark's own `xxhash64(shingle, i)` chain
    * (XxHash64Function.hash(i, IntegerType, hash(shingle, StringType, 42)))
    * — lane values bit-identical to the exploded `min(xxhash64(...))`
    * aggregation this replaces, at 1 string hash + numHashes int-hash
    * chains per shingle instead of numHashes string hashes, with no
    * explode, no 128-column aggregation buffer, and no shuffle. Returns
    * null when the document has fewer than `shingleN` tokens (the exploded
    * form dropped such docs — callers filter nulls).
    */
  def minhashSigKernel(toks: ArrayData, numHashes: Int, shingleN: Int): ArrayData = {
    val k = toks.numElements()
    if (k < shingleN) return null
    val seen = new java.util.HashSet[String]()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val strType = org.apache.spark.sql.types.StringType
    val intType = org.apache.spark.sql.types.IntegerType
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= k - shingleN) {
      sb.setLength(0)
      var j = 0
      while (j < shingleN) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        val h0 = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(u, strType, 42L)
        var lane = 0
        while (lane < numHashes) {
          val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
            .hash(java.lang.Integer.valueOf(lane), intType, h0)
          if (h < mins(lane)) mins(lane) = h
          lane += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  case class MinhashSig(child: Expression, numHashes: Int, shingleN: Int)
      extends UnaryExpression {
    require(numHashes >= 1 && shingleN >= 1)
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullable: Boolean = true // short docs yield null
    override def nullSafeEval(a: Any): Any =
      minhashSigKernel(a.asInstanceOf[ArrayData], numHashes, shingleN)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // kernel can return null for short docs — guard the generated access
      val code = nullSafeCodeGen(ctx, ev, a => s"""
        ${ev.value} = graft.functions.vector.minhashSigKernel($a, $numHashes, $shingleN);
        ${ev.isNull} = (${ev.value} == null);
      """)
      code
    }
    override protected def withNewChildInternal(c: Expression): MinhashSig =
      copy(child = c)
  }

  /** Per-table hyperplane-LSH buckets: out(t) = Σ_p (dot(v, planes(t)(p)) >= 0) << p,
    * the sign-bit bucket id for each hash table. `planes` rides as one
    * codegen reference object — the unrolled form put numTables × numPlanes
    * × dim float literals in the plan (the same plan-size wall the IVF
    * centroids hit). Dot arithmetic matches the DotProduct kernel (float
    * widened to double, ascending index), so bucket ids are bit-identical.
    */
  def lshBucketsKernel(v: ArrayData, planes: Array[Array[Array[Float]]]): ArrayData = {
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      var bucket = 0L
      var p = 0
      while (p < planes(t).length) {
        val plane = planes(t)(p)
        var s = 0.0d; var i = 0
        val n = math.min(v.numElements(), plane.length)
        while (i < n) { s += v.getFloat(i).toDouble * plane(i).toDouble; i += 1 }
        if (s >= 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  case class LshBuckets(child: Expression, planes: Array[Array[Array[Float]]])
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullSafeEval(a: Any): Any =
      lshBucketsKernel(a.asInstanceOf[ArrayData], planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pRef = ctx.addReferenceObj("planes", planes, "float[][][]")
      defineCodeGen(ctx, ev, a =>
        s"graft.functions.vector.lshBucketsKernel($a, $pRef)")
    }
    override protected def withNewChildInternal(c: Expression): LshBuckets =
      copy(child = c)
  }

  /** Duplicate-line counts for [[graft.llm.TextAnalysis.dupLineStats]] in
    * ONE compiled pass: split on '\n' (0x0A never occurs inside a UTF-8
    * multi-byte sequence, so the byte scan equals the regex split), keep
    * lines whose space-trimmed form is non-empty (UTF8String.trim — the
    * same 0x20-only trim as SQL `trim`), count occurrences per distinct
    * line with binary UTF8String equality (= SQL string equality), and
    * fold (count−1) / (count−1)·numChars per group — value-identical to
    * the sorted-adjacency HOF formulation it replaces (each extra copy of
    * a line counts once, with that line's char length), without the
    * per-row array_sort and the interpreted zip_with/aggregate lambdas.
    * Int arithmetic wraps exactly like the non-ANSI Catalyst `+` it
    * replaces. Returns (n_lines, n_dup_lines, dup_chars, tot_chars).
    */
  def dupLineCountsKernel(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = text.getBytes
    val map = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Int]]()
    var n = 0
    var tot = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == '\n') {
        val piece = org.apache.spark.unsafe.types.UTF8String
          .fromBytes(bytes, start, i - start)
        if (piece.trim().numChars() > 0) {
          n += 1
          tot += piece.numChars()
          val e = map.get(piece)
          if (e == null) map.put(piece, Array(1)) else e(0) += 1
        }
        start = i + 1
      }
      i += 1
    }
    var dups = 0
    var dupChars = 0
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      if (c > 1) { dups += c - 1; dupChars += (c - 1) * e.getKey.numChars() }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, dups, dupChars, tot))
  }

  case class DupLineCounts(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("dups", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("dupChars", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("tot", org.apache.spark.sql.types.IntegerType, nullable = false)))
    override def nullSafeEval(a: Any): Any =
      dupLineCountsKernel(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.vector.dupLineCountsKernel($a)")
    override protected def withNewChildInternal(c: Expression): DupLineCounts =
      copy(child = c)
  }

  case class WindowMin(child: Expression, w: Int) extends UnaryExpression {
    require(w >= 1, "WindowMin: window must be >= 1")
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
    override def nullSafeEval(a: Any): Any =
      windowMinKernel(a.asInstanceOf[ArrayData], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.vector.windowMinKernel($a, $w)")
    override protected def withNewChildInternal(c: Expression): WindowMin =
      copy(child = c)
  }

  import org.apache.spark.sql.graftx.Bridge
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def l2_norm(a: Column): Column = Bridge.column(L2Norm(Bridge.expression(a)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
  def window_min(a: Column, w: Int): Column =
    Bridge.column(WindowMin(Bridge.expression(a), w))
  def simhash_sig(toks: Column, bits: Int): Column =
    Bridge.column(SimhashSig(Bridge.expression(toks), bits))
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
  def gram_hash48(toks: Column, n: Int): Column =
    Bridge.column(GramHash48(Bridge.expression(toks), n))
  def minhash_sig(toks: Column, numHashes: Int, shingleN: Int): Column =
    Bridge.column(MinhashSig(Bridge.expression(toks), numHashes, shingleN))
  def lsh_buckets(vec: Column, planes: Array[Array[Array[Float]]]): Column =
    Bridge.column(LshBuckets(Bridge.expression(vec), planes))
  def deletion_hashes(s: Column, maxDist: Int): Column =
    Bridge.column(DeletionHashes(Bridge.expression(s), maxDist))
  def dup_line_counts(text: Column): Column =
    Bridge.column(DupLineCounts(Bridge.expression(text)))
  /** `centroids` in double (as refined by Lloyd); each row's norm is taken
    * in double BEFORE the float cast, matching the literal form's
    * `dot(vec, float literals) / lit(sqrt(sum of double squares))`.
    */
  def centroid_sims(vec: Column, centroids: Array[Array[Double]]): Column = {
    val floats = centroids.map(_.map(_.toFloat))
    val norms = centroids.map(cv => math.sqrt(cv.map(x => x * x).sum))
    Bridge.column(CentroidSims(Bridge.expression(vec), floats, norms))
  }
}
