package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** conditional_join and friends (SURVEY §2.4).
  *
  * The reference's 1.5k-line binary-search/numba machinery
  * (janitor/functions/conditional_join.py:450-1148) collapses into Spark's
  * own join planning: equi conjuncts → BroadcastHash/SortMerge, residual
  * non-equi conjuncts → join condition (exactly the reference's step-3
  * residual filtering, conditional_join.py:808-840, done by Catalyst).
  * Pure range joins additionally get the banding rewrite ([[rangeJoin]]) —
  * the same search-space pruning the reference's `_range_indices` does
  * (conditional_join.py:1004-1148), expressed as an equi-join Catalyst can
  * shuffle-parallelize instead of BNLJ.
  */
object JoinOps {

  /** One condition: (left column, right column, operator). Ops per
    * functions/utils.py:246-257: ==, !=, <, <=, >, >=.
    */
  type Cond = (String, String, String)

  private def opToColumn(l: Column, r: Column, op: String): Column = op match {
    // pandas-merge parity: NaN keys pair with NaN keys (merge.py
    // factorizes NaN as an ordinary key value) — Spark's null-safe
    // equality is the same contract and still plans as an equi-join
    case "==" => l <=> r
    // numpy parity (utils.py:_not_equal_indices): NaN != x is True for
    // EVERY x including NaN, so null on either side is a match
    case "!=" => coalesce(l =!= r, lit(true))
    case "<" => l < r
    case "<=" => l <= r
    case ">" => l > r
    case ">=" => l >= r
    case other => throw new IllegalArgumentException(s"conditional_join: bad op $other")
  }

  /** The reference restricts non-equi comparisons to numeric / datetime /
    * timedelta dtypes (conditional_join.py:414-447) — strings, categoricals
    * and intervals raise. We port the check by comparison FAMILY rather
    * than exact dtype: pandas' binary-search kernels need identical dtypes
    * (int8 vs int64 raises there), Spark's comparisons are exact across
    * numeric widths, so rejecting width mixes would be fidelity theater.
    */
  private def nonEquiFamily(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType | BooleanType => "numeric"
      case DateType | TimestampType | TimestampNTZType => "datetime"
      case _: DayTimeIntervalType | _: YearMonthIntervalType => "timedelta"
      case other => other.simpleString
    }
  }

  /** Non-equi / mixed join (reference: janitor/functions/conditional_join.py:30-283).
    * how ∈ inner|left|right|outer (an equality-only condition set is rejected,
    * conditional_join.py:363-369). keep ∈ all|first|last keeps one right match
    * per left row, ordered by the right join columns (SURVEY §7.7: tie order
    * is defined by explicit sort, not pandas positional order — the one
    * deliberate divergence; the reference's first/last is min/max right ROW
    * POSITION, utils.py:_keep_output, which has no distributed meaning).
    * Overlapping output names get a "right_" prefix (our flattened stand-in
    * for the reference's left/right MultiIndex, conditional_join.py:1151-1171).
    * indicator adds an `indicatorName` column (both|left_only|right_only);
    * a name colliding with an output column raises (conditional_join.py:1226).
    * dfColumns/rightColumns mirror df_columns/right_columns
    * (conditional_join.py:1186-1196): Seq("*") keeps the side whole, any
    * other list selects those columns (post-join, like the reference), and
    * Nil drops the side entirely (the reference's `None`); dropping both
    * raises. force=true is accepted for parity and is a no-op: in the
    * reference it only reorders which kernel runs first
    * (conditional_join.py:673-681, same output); Catalyst already picks the
    * equi-vs-residual execution order itself.
    *
    * Dtype relaxation (deliberate, r18 differential finding): the reference
    * requires EXACT dtype equality on non-equi columns
    * (conditional_join.py:439-446 is_dtype_equal — int32 vs float64
    * raises); we require only the same type FAMILY
    * (numeric/datetime/timedelta) and let Spark's numeric type coercion
    * widen, which is the idiomatic Catalyst contract. The differential gate
    * emulates this by pre-casting (scripts/ref_diff.py batch 8).
    */
  def conditionalJoin(left: DataFrame, right: DataFrame, conditions: Seq[Cond],
      how: String = "inner", keep: String = "all",
      indicator: Boolean = false, indicatorName: String = "_merge",
      force: Boolean = false,
      dfColumns: Seq[String] = Seq("*"),
      rightColumns: Seq[String] = Seq("*")): DataFrame = {
    require(conditions.exists(_._3 != "=="),
      "conditional_join: equality-only joins should use a regular merge (conditional_join.py:363-369)")
    conditionalJoinImpl(left, right, conditions, how, keep, indicator,
      indicatorName, force, dfColumns, rightColumns)
  }

  /** [[conditionalJoin]] WITHOUT the equality-only rejection — the check
    * belongs to the public verb only: get_join_indices runs the same
    * compute and accepts pure equi conditions
    * (conditional_join.py:1457-1512, test_conditional_join.py:3620).
    */
  private def conditionalJoinImpl(left: DataFrame, right: DataFrame,
      conditions: Seq[Cond], how: String, keep: String,
      indicator: Boolean, indicatorName: String, force: Boolean,
      dfColumns: Seq[String], rightColumns: Seq[String]): DataFrame = {
    require(conditions.nonEmpty, "conditional_join: no conditions")
    require(Set("inner", "left", "right", "outer")(how),
      s"'how' should be one of inner, left, right or outer; got $how")
    require(Set("all", "first", "last")(keep),
      s"'keep' should be one of 'all', 'first', 'last'; got $keep")
    require(dfColumns.nonEmpty || rightColumns.nonEmpty,
      "df_columns and right_columns cannot both be None (conditional_join.py:1186)")
    conditions.foreach { case (lc, rc, op) =>
      require(left.columns.contains(lc),
        s"conditional_join: $lc not found in the left DataFrame")
      require(right.columns.contains(rc),
        s"conditional_join: $rc not found in the right DataFrame")
      if (op != "==") {
        val lf = nonEquiFamily(left.schema(lc).dataType)
        val rf = nonEquiFamily(right.schema(rc).dataType)
        require(Set("numeric", "datetime", "timedelta")(lf),
          "Only numeric, timedelta and datetime types are supported in a " +
            s"non equi-join. $lc in condition ($lc, $rc, $op) has a " +
            s"dtype ${left.schema(lc).dataType.simpleString}.")
        require(lf == rf,
          s"Both columns should have the same type family - '$lc' is $lf; " +
            s"'$rc' is $rf.")
      }
    }
    val _ = force // parity knob; Catalyst owns kernel order (see Scaladoc)

    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    val r = overlap.foldLeft(right)((acc, c) => acc.withColumnRenamed(c, s"right_$c"))
    def rname(c: String): String = if (overlap.contains(c)) s"right_$c" else c

    val needLeftId = keep != "all"
    // a purely non-equi TWO-SIDED RANGE (x >= lo && x <= hi on one numeric
    // left column) would plan as an O(|l|·|r|) BroadcastNestedLoop — the
    // sf1 smoke lane measured the right+keep gate at 195 s (≈100× its
    // sf0.1 time, the quadratic signature). Detect the shape and route the
    // join itself through [[rangeJoin]]'s banded machinery (band equi-join
    // + exact residual + anti-join complements — results identical); the
    // keep/demote logic downstream only inspects the joined frame.
    def numeric(df: DataFrame, c: String) =
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    val bandPattern: Option[(String, String, String, Boolean, Boolean)] =
      if (conditions.length == 2 && conditions.map(_._1).distinct.length == 1 &&
          conditions.map(_._2).distinct.length == 2 &&
          numeric(left, conditions.head._1) &&
          conditions.forall(c => numeric(right, c._2))) {
        val x = conditions.head._1
        val loC = conditions.find(c => c._3 == ">=" || c._3 == ">")
        val hiC = conditions.find(c => c._3 == "<=" || c._3 == "<")
        (loC, hiC) match {
          case (Some(lo), Some(hi)) =>
            Some((x, rname(lo._2), rname(hi._2), lo._3 == ">=", hi._3 == "<="))
          case _ => None
        }
      } else None
    // a purely non-equi condition set plans as BroadcastNestedLoop whose
    // parallelism is the STREAMED side's partition count — single-partition
    // inputs (one small parquet file) would run on one thread. Which side
    // streams depends on `how` (right/outer stream the right side), so both
    // sides are widened; the broadcast side's repartition is dropped by the
    // exchange planning, costing nothing. The banded path shuffles on the
    // band key anyway and skips the widening.
    val hasEqui = conditions.exists(_._3 == "==")
    val widen = !hasEqui && bandPattern.isEmpty
    val par = left.sparkSession.sparkContext.defaultParallelism
    val l0 = if (widen) left.repartition(par) else left
    val r0 = if (widen) r.repartition(par) else r
    val l = if (needLeftId) l0.withColumn("__lid", monotonically_increasing_id()) else l0

    val cond = conditions.map { case (lc, rc, op) =>
      opToColumn(l(lc), r0(rname(rc)), op)
    }.reduce(_ && _)

    val lMark0 = if (indicator) l.withColumn("__lpresent", lit(1)) else l
    // banded keep + inner: rangeJoin consumes the LEFT frame through two
    // lineages too (banded join + wide-overflow join, unioned) and its own
    // needIds pin only fires for non-inner how — so the __lid added above
    // would be re-evaluated per lineage, and under AQE repartitioning or a
    // task retry the same left row could carry two different ids, letting
    // keep=first/last emit duplicates. Pin it here, mirroring the rMark pin
    // below (how=left/right/outer ride rangeJoin's internal localCheckpoint).
    val lMark = if (bandPattern.isDefined && keep != "all" && how == "inner")
      lMark0.localCheckpoint() else lMark0
    val rMark0 = if (indicator) r0.withColumn("__rpresent", lit(1)) else r0
    // keep + right/outer needs a right row id: a right row whose every match
    // loses the keep race is DEMOTED to an unmatched (right_only) row — the
    // reference recomputes the right indexer from the post-keep indices
    // (conditional_join.py:1333-1341,1384-1386), it does not drop the row
    val needRid = keep != "all" && (how == "right" || how == "outer")
    // the banded keep path consumes rMark through several lineages (rep
    // aggregate, join, non-rep anti-join); mono ids are only stable for a
    // fixed layout, so pin them (same hazard rangeJoin pins internally)
    val rMark = if (needRid) {
      val withId = rMark0.withColumn("__rid", monotonically_increasing_id())
      if (bandPattern.isDefined) withId.localCheckpoint() else withId
    } else rMark0

    var joined = bandPattern match {
      case Some((x, lo, hi, loInc, hiInc)) =>
        // lMark/rMark names are disjoint (overlap pre-renamed), so
        // rangeJoin's own rename is a no-op and its output equals
        // lMark.join(rMark, cond, how) column-for-column.
        //
        // keep != "all" additionally reduces the right side to ONE
        // representative row per DISTINCT interval before the join: the
        // keep order is (lo, hi, restCols...), so within an interval the
        // winner is always the interval's min (first) / max (last) row —
        // the kept match per left row can only ever be a representative.
        // This keeps the join output at |left|·(matching DISTINCT
        // intervals) instead of |left|·(matching right rows): the sf1
        // smoke lane measured the unreduced form at 124-300 s (≈100× the
        // sf0.1 time — the output itself is quadratic in scale when both
        // sides grow) vs linear after the reduction. Non-representative
        // rows can never win a keep race; under how=right/outer each
        // surfaces exactly once as a right_only row, which is precisely
        // the reference's demote outcome for them.
        val base =
          if (keep == "all") rMark
          else {
            val condC = Seq(lo, hi)
            val restR = r.columns.filterNot(condC.contains).toSeq
            val asc = keep == "first"
            // per-field (null-flag, value) pairs encode asc_nulls_last /
            // desc_nulls_last inside a lexicographic struct min/max
            val keyFields: Seq[Column] = restR.zipWithIndex.flatMap { case (c, i) =>
              val flag = if (asc) col(s"`$c`").isNull else col(s"`$c`").isNotNull
              Seq(flag.as(s"__kf$i"), col(s"`$c`").as(s"__kv$i"))
            }
            val payload = struct(rMark.columns.map(c => col(s"`$c`")).toIndexedSeq: _*).as("__row")
            val kstruct = struct((keyFields :+ payload): _*)
            rMark.groupBy(col(s"`$lo`"), col(s"`$hi`"))
              .agg((if (asc) min(kstruct) else max(kstruct)).as("__k"))
              .select(col("__k.__row.*"))
          }
        val j0 = rangeJoin(lMark, base, x, lo, hi, how = how,
          loInclusive = loInc, hiInclusive = hiInc)
        if (keep != "all" && needRid) {
          val nonRep = rMark.join(base.select(col("__rid")), Seq("__rid"), "left_anti")
          val nulledLeft = lMark.columns.map(c =>
            lit(null).cast(lMark.schema(c).dataType).as(c))
          j0.unionByName(nonRep.select(
            (nulledLeft ++ nonRep.columns.map(c => col(s"`$c`"))).toIndexedSeq: _*)
            .select(j0.columns.map(c => col(s"`$c`")).toIndexedSeq: _*))
        } else j0
      case None => lMark.join(rMark, cond, how)
    }

    if (keep != "all") {
      // order by the right join columns, then every remaining right column in
      // schema order — ties must break deterministically in a distributed
      // setting (SURVEY §7.7: pandas breaks them positionally; we can't)
      val condCols = conditions.map(c => rname(c._2)).distinct
      val restCols = r.columns.filterNot(condCols.contains(_)).toSeq
      val rightOrderCols = (condCols ++ restCols).map(n => col(s"`$n`"))
      val ordered = if (keep == "first") rightOrderCols.map(_.asc_nulls_last)
        else rightOrderCols.map(_.desc_nulls_last)
      // unmatched right rows under how=right/outer all carry a null __lid;
      // they are not "matches per left row", so the keep filter must pass
      // every one of them through untouched (reference keeps unmatched rows).
      // Salting the null-__lid class matters at scale: partitionBy(__lid)
      // alone puts EVERY unmatched right row on one task. The salt spreads
      // them across 1024 window partitions; their row numbers are ignored by
      // the filter, and matched rows (salt pinned to 0) keep exact semantics.
      val salted = joined.withColumn("__keep_salt",
        when(col("__lid").isNull, pmod(monotonically_increasing_id(), lit(1024)))
          .otherwise(lit(0L)))
      val w = Window.partitionBy(col("__lid"), col("__keep_salt")).orderBy(ordered: _*)
      if (!needRid) {
        joined = salted.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1 || col("__lid").isNull)
          .drop("__rn", "__keep_salt")
      } else {
        // right/outer: a matched row that loses the keep race still counts
        // toward its right row's presence; if NO match of a right row is
        // kept, exactly one of its rows is demoted to right_only (left side
        // and the indicator's left mark nulled) — reference parity, see
        // needRid above. One extra window over __rid; partition width is the
        // right row's match count, the same bound as the __lid window.
        val marked = salted.withColumn("__rn", row_number().over(w))
          .withColumn("__keep",
            col("__lid").isNotNull && col("__rid").isNotNull && col("__rn") === 1)
        // one Window exec: identical partition+order specs let Spark fuse
        // the full-partition max and the running row_number into a single
        // sort. Unmatched LEFT rows (how=outer ONLY) all carry a null
        // __rid — the same hot-partition class as the null-__lid rows
        // above, salted the same way: their window results are ignored by
        // the filter (`__rid.isNull` passes them through), and real right
        // rows pin to salt 0, keeping exact demote semantics. how=right
        // cannot produce a null __rid, so it skips the salt entirely — the
        // nondeterministic-id projection measurably taxes that path
        // (isolated 1.9 → 4.7 s at sf0.1 when salted unconditionally).
        val resalted =
          if (how == "outer") marked.withColumn("__rid_salt",
            when(col("__rid").isNull, pmod(monotonically_increasing_id(), lit(1024)))
              .otherwise(lit(0L)))
          else marked
        val w2 =
          (if (how == "outer") Window.partitionBy(col("__rid"), col("__rid_salt"))
           else Window.partitionBy(col("__rid")))
          .orderBy(col("__lid").asc_nulls_last)
        val flagged = resalted
          .withColumn("__rkept",
            max(when(col("__keep"), 1).otherwise(0)).over(
              w2.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("__rn2", row_number().over(w2))
        val demoted = col("__rid").isNotNull && col("__lid").isNotNull &&
          !col("__keep") && col("__rkept") === 0 && col("__rn2") === 1
        val toNull = left.columns.toSeq ++ (if (indicator) Seq("__lpresent") else Nil)
        var out = flagged.filter(
          col("__lid").isNull || col("__rid").isNull || col("__keep") || demoted)
        out = toNull.foldLeft(out)((acc, c) =>
          acc.withColumn(c, when(demoted, lit(null)).otherwise(col(s"`$c`"))))
        joined = out.drop("__rn", "__keep_salt", "__keep", "__rkept", "__rn2", "__rid_salt")
      }
    }
    // output assembly (conditional_join.py:1174-1196): select each side's
    // requested columns AFTER the join — the join itself always sees the
    // full frames, so condition columns need not be in the output
    val leftOut: Seq[String] = if (dfColumns == Seq("*")) left.columns.toSeq
      else {
        dfColumns.foreach(c => require(left.columns.contains(c),
          s"conditional_join: df_columns entry $c not found in the left DataFrame"))
        dfColumns
      }
    val rightSel: Seq[String] = if (rightColumns == Seq("*")) right.columns.toSeq
      else {
        rightColumns.foreach(c => require(right.columns.contains(c),
          s"conditional_join: right_columns entry $c not found in the right DataFrame"))
        rightColumns
      }
    // the right_ prefix applies only where the SELECTED outputs collide —
    // dropping the colliding left column un-prefixes the right one, like the
    // reference's MultiIndex header that only appears on a non-empty
    // intersection (conditional_join.py:1197-1199)
    val rightOut = rightSel.map { c =>
      (rname(c), if (leftOut.contains(c)) s"right_$c" else c)
    }
    if (indicator) {
      require(!(leftOut ++ rightOut.map(_._2)).contains(indicatorName),
        "Cannot use name of an existing column for indicator column")
      joined = joined.withColumn(indicatorName,
        when(col("__lpresent").isNotNull && col("__rpresent").isNotNull, "both")
          .when(col("__lpresent").isNotNull, "left_only")
          .otherwise("right_only"))
        .drop("__lpresent", "__rpresent")
    }
    joined.select(leftOut.map(n => col(s"`$n`")) ++
      rightOut.map { case (src, out) => col(s"`$src`").as(out) } ++
      (if (indicator) Seq(col(s"`$indicatorName`")) else Nil): _*)
  }

  /** Matching index pairs only (reference: conditional_join.py:1457-1512).
    * Caller supplies the id columns (the explicit stand-in for pandas row
    * positions).
    */
  def getJoinIndices(left: DataFrame, right: DataFrame, leftId: Seq[String],
      rightId: Seq[String], conditions: Seq[Cond], keep: String = "all",
      force: Boolean = false): DataFrame = {
    // unlike conditional_join, pure equi condition sets are allowed here
    // (test_conditional_join.py:3620 test_eq_indices); keep/force pass
    // through (conditional_join.py:1457-1512)
    val joined = conditionalJoinImpl(
      left.select(leftId.map(n => col(s"`$n`")) ++
        conditions.map(_._1).distinct.filterNot(leftId.contains(_)).map(n => col(s"`$n`")): _*),
      right.select(rightId.map(n => col(s"`$n`")) ++
        conditions.map(_._2).distinct.filterNot(rightId.contains(_)).map(n => col(s"`$n`")): _*),
      conditions, "inner", keep, false, "_merge", force, Seq("*"), Seq("*"))
    val rightOut = rightId.map(n =>
      if (left.columns.contains(n) || joined.columns.contains(s"right_$n")) s"right_$n" else n)
    joined.select((leftId ++ rightOut).map(n => col(s"`$n`")): _*)
  }

  /** As-of join (pandas `merge_asof`; DuckDB `ASOF JOIN`): for every left
    * row, attach the single right row with the greatest `on` ≤ left's `on`
    * (direction=backward, inclusive), the smallest `on` ≥ left's
    * (direction=forward), or whichever of the two is closer
    * (direction=nearest; equal distances resolve backward, the pandas
    * contract), within equal `by` keys; unmatched left rows keep
    * nulls (left-outer, like merge_asof). `tolerance` (in `on` units;
    * seconds for timestamps) nulls matches farther than the bound.
    *
    * NOT a join under the hood: the sort-merge shape Spark would pick for a
    * theta-join here is quadratic per key group. Instead both sides union
    * into one frame tagged left/right and a running `last(right_payload,
    * ignoreNulls)` over (on, side) order finds every match in ONE shuffle —
    * the standard distributed as-of technique. Right rows sort before left
    * rows on equal `on` (side 0 < 1), making the match inclusive. With `by`
    * keys the window partitions on them (parallelism = key cardinality); a
    * global as-of (no `by`) routes through [[ScaleWindows.runningLast]],
    * which buckets the order column instead of funnelling one task.
    *
    * Output: every left column, then each right non-key column (suffixed on
    * collision with a left name). Right `on`/`by` columns are not emitted
    * (merge_asof contract). Ties among right rows with identical
    * (`by`, `on`) break on the full right payload (deterministic in a
    * distributed setting — SURVEY §7.7).
    *
    * Skew: parallelism of the keyed form is bounded by `by` cardinality,
    * and one dominant key serializes on one task (the price of a running
    * scan). Pass `skewSafe = true` to sub-bucket every key on the order
    * column ([[ScaleWindows.runningLastKeyed]] — distributed carry, no
    * collect at any key cardinality) at the cost of one extra aggregation
    * and a carry join; leave it off for well-distributed keys.
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: String,
      by: Seq[String] = Nil, direction: String = "backward",
      tolerance: Option[Double] = None, suffix: String = "_right",
      skewSafe: Boolean = false): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"asof_join: bad direction '$direction' (backward|forward|nearest)")
    val rPayloadCols = right.columns.filterNot(c => by.contains(c) || c == on)
    def outName(c: String): String =
      if (left.columns.contains(c)) c + suffix else c
    // deterministic tie-break among right rows sharing (by, on): pick the
    // max payload struct, so the running last is order-insensitive
    val rStruct = struct(
      col(s"`$on`").cast("double").as("__rt") +:
        rPayloadCols.map(c => col(s"`$c`").as(outName(c))).toSeq: _*)
    val byCols = by.map(n => col(s"`$n`"))
    val rSel = right
      .groupBy((byCols :+ col(s"`$on`").as("__t")): _*)
      .agg(max(rStruct).as("__rpay"))
      .withColumn("__side", lit(0))
    val lSel = left.select((byCols :+ col(s"`$on`").as("__t") :+
      lit(1).as("__side") :+
      struct(left.columns.map(c => col(s"`$c`")).toSeq: _*).as("__lpay")): _*)
    val u = lSel
      .withColumn("__rpay", lit(null).cast(rSel.schema("__rpay").dataType))
      .unionByName(rSel.withColumn("__lpay",
        lit(null).cast(lSel.schema("__lpay").dataType)))
    // one pass per needed traversal direction: over the SAME union frame the
    // passes share the by-key exchange (two Sort+Window stages, one shuffle);
    // nearest combines both matches, ties resolving backward
    def addPass(d: DataFrame, descending: Boolean, dest: String): DataFrame =
      if (by.nonEmpty && skewSafe) {
        ScaleWindows.runningLastKeyed(d, by, "__t", "__side", "__rpay", dest,
          descending = descending)
      } else if (by.nonEmpty) {
        val ord = Seq(
          if (descending) col("__t").desc else col("__t").asc,
          col("__side").asc)
        val w = Window.partitionBy(byCols: _*).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        d.withColumn(dest, last(col("__rpay"), ignoreNulls = true).over(w))
      } else {
        ScaleWindows.runningLast(d, "__t", "__side", "__rpay", dest,
          descending = descending)
      }
    val passes = direction match {
      case "backward" => addPass(u, descending = false, "__mb")
      case "forward" => addPass(u, descending = true, "__mf")
      case "nearest" => addPass(addPass(u, descending = false, "__mb"),
        descending = true, "__mf")
    }
    val m = direction match {
      case "backward" => col("__mb")
      case "forward" => col("__mf")
      case "nearest" =>
        val distB = col("__t").cast("double") - col("__mb.__rt")
        val distF = col("__mf.__rt") - col("__t").cast("double")
        when(col("__mb").isNull, col("__mf"))
          .when(col("__mf").isNull, col("__mb"))
          .when(distB <= distF, col("__mb")).otherwise(col("__mf"))
    }
    // distance check is direction-agnostic as |Δ| (the chosen match has the
    // minimal distance, so exceeding tol means no in-tolerance match exists)
    val withinTol = tolerance match {
      case None => m.isNotNull
      case Some(tol) => m.isNotNull &&
        abs(m.getField("__rt") - col("__t").cast("double")) <= tol
    }
    // a null left `on` never matches (pandas merge_asof rejects null keys,
    // DuckDB ASOF yields no match) — without this gate nulls sort last in
    // the descending pass and would pick up the globally smallest right row
    val kept = when(col("__t").isNotNull && withinTol, m)
    passes.filter(col("__side") === 1)
      .select(col("__lpay.*") +:
        rPayloadCols.map(c => kept.getField(outName(c)).as(outName(c))).toSeq: _*)
  }

  /** Median interval width of the right side — the data-derived band width
    * for [[rangeJoin]] (SURVEY §7.5). One bounded approxQuantile action;
    * a skewed interval table no longer hot-spots a single band the way a
    * badly-guessed constant W would.
    */
  def autoBandWidth(right: DataFrame, loCol: String, hiCol: String): Double = {
    val widths = right
      .select((col(s"`$hiCol`").cast("double") - col(s"`$loCol`").cast("double")).as("w"))
      .filter(col("w") >= 0)
    val med = widths.stat.approxQuantile("w", Array(0.5), 0.01).headOption.getOrElse(0.0)
    if (med > 0) med else 1.0
  }

  /** Banded range join: `left.x BETWEEN right.lo AND right.hi` rewritten as an
    * equi-join on band = floor(x/W) with the right side exploded over its
    * interval's bands, plus the residual range filter (SURVEY §7.5 — the
    * standard banding trick; same pruning intent as the reference's
    * binary-search `_range_indices`, conditional_join.py:1004-1148).
    *
    * Each left row lands in exactly one band → no dedup needed. Chooses
    * shuffle-parallel hash join over BroadcastNestedLoop at scale.
    * bandWidth <= 0 derives W from the data ([[autoBandWidth]] median width).
    * Intervals spanning more than `maxBands` bands would blow the explode up
    * (or hit Spark's Sequence length limit), so they are routed through a
    * separate nested-loop branch instead — by construction few rows relative
    * to W, and unioned back losslessly.
    *
    * `dedupIntervals` — distinct-interval compression, the scale guard the
    * sf1 smoke lane demanded (scripts/SF1_SMOKE.md): when many right rows
    * share the same (lo, hi) — dimension-style interval tables — the banded
    * join degenerates twice over: the band key's cardinality collapses to
    * range(x)/W values (a handful of shuffle partitions do all the work) and
    * the range match is re-evaluated once per duplicate interval. Compression
    * runs the band match against DISTINCT (lo, hi) only — a frame small
    * enough to broadcast, so the match is a map-side hash join at full scan
    * parallelism — then restores right payloads with one codegen'd equi join
    * on the bounds. Output is identical (equi re-expansion is lossless;
    * null-bounded rows match nothing on either path). `"auto"` (default)
    * probes `count` vs `count_distinct(lo, hi)` with one bounded aggregate
    * action (eager, like the bandWidth<=0 probe; skipped — "off" — for
    * streaming frames) and compresses when intervals repeat ≥2× on average;
    * `"on"`/`"off"` force the choice.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, xCol: String, loCol: String,
      hiCol: String, bandWidth: Double = 0.0, how: String = "inner",
      loInclusive: Boolean = true, hiInclusive: Boolean = true,
      maxBands: Int = 256, dedupIntervals: String = "auto"): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    val r0 = overlap.foldLeft(right)((acc, c) => acc.withColumnRenamed(c, s"right_$c"))
    def rn(c: String): String = if (overlap.contains(c)) s"right_$c" else c
    val w = if (bandWidth > 0) bandWidth else autoBandWidth(r0, rn(loCol), rn(hiCol))

    val lid = "__graft_lid"
    val rid = "__graft_rid"
    val needIds = how != "inner"
    // the id-tagged frames are consumed twice (inner join + anti-join
    // complement); mono ids are only stable for a fixed partition layout, so
    // pin them with localCheckpoint before reuse — under AQE repartitioning
    // or an executor retry the two lineages could otherwise disagree and
    // silently drop or duplicate complement rows
    val l1 = if (needIds) left.withColumn(lid, monotonically_increasing_id()).localCheckpoint()
      else left
    val r1 = if (needIds) r0.withColumn(rid, monotonically_increasing_id()).localCheckpoint()
      else r0

    val loB = floor(col(s"`${rn(loCol)}`") / w)
    val hiB = floor(col(s"`${rn(hiCol)}`") / w)
    val span = hiB - loB
    // null-bound rows ride the narrow path (their band array is empty; they
    // can't satisfy the range condition anyway)
    val rNarrow = r1.filter(coalesce(span <= maxBands, lit(true)))
    val rWide = r1.filter(span > maxBands)

    def rangeCond(lSide: DataFrame, rSide: DataFrame): Column = {
      val loC = if (loInclusive) lSide(xCol) >= rSide(rn(loCol)) else lSide(xCol) > rSide(rn(loCol))
      val hiC = if (hiInclusive) lSide(xCol) <= rSide(rn(hiCol)) else lSide(xCol) < rSide(rn(hiCol))
      loC && hiC
    }

    val lb = l1.withColumn("__band", floor(col(s"`$xCol`") / w))
    // empty intervals (hi < lo) must contribute zero bands, not a Sequence error
    def withBands(f: DataFrame): DataFrame = f.withColumn("__band",
      explode(when(loB <= hiB, sequence(loB, hiB))
        .otherwise(array().cast("array<bigint>"))))

    val loN = rn(loCol)
    val hiN = rn(hiCol)
    // (compress?, distinct-interval count when the probe ran)
    val (compress, dKnown): (Boolean, Option[Long]) = dedupIntervals match {
      case "on" => (true, None)
      case "off" => (false, None)
      case "auto" =>
        if (right.isStreaming) (false, None)
        else {
          // one bounded probe (count + distinct-interval count, map-side
          // combinable); compress when intervals repeat >= 2x on average
          val row = r1.agg(count(lit(1)).as("n"),
            count_distinct(col(s"`$loN`"), col(s"`$hiN`")).as("d")).head()
          val n = row.getLong(0)
          val d = row.getLong(1)
          (n > 0 && d.toDouble / n <= 0.5, Some(d))
        }
      case other =>
        throw new IllegalArgumentException(s"range_join: bad dedupIntervals $other")
    }

    val banded =
      if (!compress) {
        val rb = withBands(rNarrow)
        lb.join(rb, lb("__band") === rb("__band") && rangeCond(lb, rb), "inner")
          .drop("__band")
      } else {
        // distinct intervals only through the band match, then one equi join
        // on the bounds to restore the full right payload. Broadcast the
        // distinct side explicitly when the probe certified it small (the
        // map-side join keeps the scan at full parallelism — no shuffle on
        // the low-cardinality band key); otherwise let AQE decide from the
        // runtime shuffle size.
        val dRaw = withBands(rNarrow.select(col(s"`$loN`"), col(s"`$hiN`")).distinct())
        val dInt = if (dKnown.exists(_ <= (1L << 16))) broadcast(dRaw) else dRaw
        val matched = lb
          .join(dInt, lb("__band") === dInt("__band") && rangeCond(lb, dInt), "inner")
          .drop("__band")
        matched.join(rNarrow, Seq(loN, hiN), "inner")
          .select((l1.columns.map(c => col(s"`$c`")) ++
            r1.columns.map(c => col(s"`$c`"))).toIndexedSeq: _*)
      }
    val wide = l1.join(rWide, rangeCond(l1, rWide), "inner")
    val inner = banded.unionByName(wide)

    if (how == "inner") inner
    else {
      // outer complements via cheap equi anti-joins on the generated row ids
      val lFields = l1.schema.fields
      val rFields = r1.schema.fields
      val unmatchedL = l1.join(inner.select(col(lid)).distinct(), Seq(lid), "left_anti")
        .select((lFields.map(f => col(s"`${f.name}`")) ++
          rFields.map(f => lit(null).cast(f.dataType).as(f.name))).toIndexedSeq: _*)
      val unmatchedR = r1.join(inner.select(col(rid)).distinct(), Seq(rid), "left_anti")
        .select((lFields.map(f => lit(null).cast(f.dataType).as(f.name)) ++
          rFields.map(f => col(s"`${f.name}`"))).toIndexedSeq: _*)
      val out = how match {
        case "left" => inner.unionByName(unmatchedL)
        case "right" => inner.unionByName(unmatchedR)
        case "outer" | "full" | "full_outer" =>
          inner.unionByName(unmatchedL).unionByName(unmatchedR)
        case other => throw new IllegalArgumentException(s"range_join: bad how $other")
      }
      out.drop(lid, rid)
    }
  }

  /** Edit-distance (fuzzy) join — the entity-resolution join the reference's
    * conditional_join family cannot express. Exact, never all-pairs:
    * candidate generation via k-deletion neighborhoods (FastSS, Bocek et
    * al. 2007: ed(u,v) ≤ k ⇒ the sets of strings reachable by ≤ k single-
    * character deletions intersect — delete the edited positions from both
    * sides), then exact `levenshtein` verification on the candidates.
    *
    * Scale shape: each side emits its ≤ O(len^k) deletion variants hashed
    * to 64-bit keys (one narrow explode), the only shuffle is the equi-join
    * on the variant hash, and bucket sizes are bounded by how many strings
    * actually collapse to the same variant — near-duplicate families, not
    * the corpus. Contrast: q-gram or prefix-segment candidate schemes
    * degenerate to block joins on shared-prefix data (ID-style keys), and a
    * theta-join `levenshtein(a,b) <= k` is an O(n²) BroadcastNestedLoop.
    * `maxDist` ≤ 2 (the variant count is len choose k — fine for the short
    * strings entity resolution runs on; document lengths belong in
    * [[graft.llm.Dedup]] MinHash, not here).
    *
    * Output: one row per matched pair — left columns + right columns
    * (collision-suffixed `_r`) + `dist`.
    *
    * Hot-bucket recall contract (same scheme as
    * [[graft.llm.Dedup.minhashDupPairs]]): a deletion-variant bucket holding
    * more than `maxBucket` distinct strings on EITHER side is dropped from
    * candidate generation — without the cap one pathological variant (a
    * shared stem across ID-style keys) makes the candidate join quadratic
    * in that bucket. Exact-EQUAL pairs can never be lost: an unconditional
    * string equi-join rescues them outside the variant path (a plain
    * dist-0 hash join, no explode). The residual trade: a dist ≥ 1 pair
    * whose every shared variant lives in a capped bucket is missed — for a
    * substitution pair at k=1 that is a single bucket, so the cap should
    * stay well above the expected near-duplicate family size.
    */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
      leftCol: String, rightCol: String, maxDist: Int = 1,
      maxBucket: Int = 100000): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"fuzzyJoin: maxDist must be in [1, 2], got $maxDist (use an equi join for 0)")
    require(maxBucket > 0, s"fuzzyJoin: maxBucket must be positive, got $maxBucket")
    val rightRenamed = right.toDF(right.columns.map(c =>
      if (left.columns.contains(c)) s"${c}_r" else c): _*)
    val rCol = if (left.columns.contains(rightCol)) s"${rightCol}_r" else rightCol
    val lkeys = left.select(col(s"`$leftCol`").as("__lkey")).distinct()
      .localCheckpoint(eager = false) // feeds variants + the equal rescue
    val rkeys = rightRenamed.select(col(s"`$rCol`").as("__rkey")).distinct()
      .localCheckpoint(eager = false)
    val lk0 = lkeys.select(col("__lkey"),
      explode(variantHashes(col("__lkey"), maxDist)).as("__vh"))
    // probe-vs-corpus prune (r20): only variant hashes present on BOTH
    // sides can produce candidates, so the right (corpus) explosion is
    // semi-joined against the left (probe) side's distinct hash set BEFORE
    // anything aggregates or shuffles at full width. Exactly semantics-
    // preserving: whole absent buckets only, so every surviving bucket's
    // per-side count — and hence the cap decision — is unchanged. When the
    // probe is small its hash set broadcasts and the corpus variant stream
    // is cut scan-side (measured at sf0.1: the unpruned cogroup aggregates
    // 1.59M corpus variant rows in 3.9 s; pruned, the aggregate sees only
    // the probe's ~16k buckets).
    val lkH = lk0.select("__vh").distinct()
    val rk0p = rkeys.select(col("__rkey"),
        explode(variantHashes(col("__rkey"), maxDist)).as("__vh"))
      .join(lkH, Seq("__vh"), "left_semi")
    // cogrouped candidate generation: ONE exchange over the tagged union of
    // the surviving variant rows (explicit repartition on the variant hash,
    // shared by both aggregations via ReusedExchange), with per-group state
    // bounded BEFORE the wide aggregate: constant-state conditional counts
    // find buckets over EITHER side's cap (tiny table), the variant rows
    // anti-join them away, and collect_list then holds at most 2·maxBucket
    // keys per bucket by construction — the former collect-then-cap shape
    // let one pathological shared variant build an unbounded non-spillable
    // aggregation buffer (guide §5). Same dropped buckets, same candidate
    // pairs; a bucket missing either side drops in the size filter.
    val tagged = lk0
      .select(col("__vh"), col("__lkey").as("__k"), lit(0).as("__side"))
      .unionAll(rk0p.select(col("__vh"), col("__rkey").as("__k"), lit(1).as("__side")))
      .repartition(col("__vh"))
    val hotVariants = tagged.groupBy("__vh")
      .agg(count(when(col("__side") === 0, lit(1))).as("__nl"),
        count(when(col("__side") === 1, lit(1))).as("__nr"))
      .filter(col("__nl") > maxBucket || col("__nr") > maxBucket)
      .select("__vh")
    val bucketPairs = tagged.join(hotVariants, Seq("__vh"), "left_anti")
      .groupBy("__vh")
      .agg(collect_list(when(col("__side") === 0, col("__k"))).as("__lks"),
        collect_list(when(col("__side") === 1, col("__k"))).as("__rks"))
      .filter(size(col("__lks")) >= 1 && size(col("__rks")) >= 1)
      .select(col("__rks"), explode(col("__lks")).as("__lkey"))
      .select(col("__lkey"), explode(col("__rks")).as("__rkey"))
    // candidate pairs over DISTINCT key strings (duplicates re-expand via
    // the final equi-joins), verified by exact edit distance; the equal
    // rescue runs outside the variant path so the cap cannot lose it
    val equalRescue = lkeys.join(rkeys, col("__lkey") === col("__rkey"))
      .select(col("__lkey"), col("__rkey"), lit(0).as("dist"))
    val cand = bucketPairs.distinct()
      .withColumn("dist", levenshtein(col("__lkey"), col("__rkey")))
      .filter(col("dist") <= maxDist)
      .unionByName(equalRescue)
      .select("__lkey", "__rkey", "dist").distinct()
    left.as("__fjL").join(cand.as("__fjC"),
        col(s"__fjL.`$leftCol`") === col("__fjC.__lkey"))
      .join(rightRenamed.as("__fjR"),
        col("__fjC.__rkey") === col(s"__fjR.`$rCol`"))
      .drop("__lkey", "__rkey")
  }

  /** Self fuzzy join: pairs (id1 < id2) of rows whose `strCol` values are
    * within `maxDist` edits. Same FastSS candidate scheme as [[fuzzyJoin]].
    *
    * Hot-bucket recall contract (mirrors [[fuzzyJoin]] and
    * [[graft.llm.Dedup.minhashDupPairs]]): variant buckets above `maxBucket`
    * ids are dropped from candidate generation — one pathological shared
    * variant otherwise turns the self-join quadratic in the bucket. The
    * unconditional equal-string equi-join rescues every EXACT-duplicate pair
    * regardless of the cap (equal strings share all their buckets, so a big
    * identical-string clique is precisely what makes buckets hot; its output
    * pairs are the contract and re-emerge from the dist-0 equi-join, a hash
    * join with no explode). Residual trade: a dist ≥ 1 pair whose every
    * shared variant bucket is over the cap is missed.
    */
  def fuzzySelfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucket: Int = 100000): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"fuzzySelfJoin: maxDist must be in [1, 2], got $maxDist")
    require(maxBucket > 0, s"fuzzySelfJoin: maxBucket must be positive, got $maxBucket")
    val base = df.select(col(s"`$idCol`").as("id"), col(s"`$strCol`").as("s"))
      .localCheckpoint(eager = false) // feeds the variant explode + 2 string joins
    val keyed0 = base.select(col("id"),
      explode(variantHashes(col("s"), maxDist)).as("__vh"))
    // Candidate generation shuffles the variant rows once (explicit
    // repartition shared by both aggregations via ReusedExchange) and
    // bounds per-group state BEFORE the wide aggregate: a constant-state
    // count finds over-cap buckets (tiny table), the rows anti-join them
    // away, and collect_list then holds at most maxBucket ids per bucket
    // by construction — the former collect-then-cap shape let one
    // pathological shared variant build an unbounded non-spillable
    // aggregation buffer (guide §5). Same dropped buckets, same pairs; the
    // i<j unnest via two chained Generates keeps per-row memory O(bucket),
    // never O(bucket²). The candidate ids stay deduped BEFORE the strings
    // join in: a k=2 pair shares many deletion variants, so the (id1, id2)
    // distinct runs over 16-byte rows instead of shuffling both strings
    // once per collision
    val keyedVh = keyed0.repartition(col("__vh"))
    val hotVariants = keyedVh.groupBy("__vh")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .select("__vh")
    val cand = keyedVh.join(hotVariants, Seq("__vh"), "left_anti")
      .groupBy("__vh")
      .agg(collect_list(col("id")).as("__ids"))
      .filter(size(col("__ids")) >= 2)
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "__x")))
      .select(col("__x").as("__a"),
        explode(slice(col("__ids"), col("__i") + lit(2),
          size(col("__ids")) - col("__i") - lit(1))).as("__b"))
      .select(least(col("__a"), col("__b")).as("id1"),
        greatest(col("__a"), col("__b")).as("id2"))
    // exact-equal rescue: a plain equi-join on the string itself — immune
    // to the cap, and the only candidates a capped identical clique needs
    val equalCand = base.as("a").join(base.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
    cand.unionByName(equalCand).distinct()
      .join(base.select(col("id").as("id1"), col("s").as("s1")), Seq("id1"))
      .join(base.select(col("id").as("id2"), col("s").as("s2")), Seq("id2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2")))
      .filter(col("dist") <= maxDist)
      .select("id1", "id2", "dist")
  }

  /** xxhash64 of the string and every ≤ maxDist single-character deletion
    * (distinct). The k=2 layer nests deletions of deletions: O(len²)
    * variants — short entity strings only. HOF note (PLANS.md contract):
    * each lambda element evaluates one substring concat — O(len) work per
    * element, no captured-array re-evaluation.
    */
  private[graft] def variantHashes(s: Column, maxDist: Int): Column =
    // codegen kernel: prefix/shifted-suffix polynomial hashes — O(1) per
    // deletion variant, no variant string materialized. The HOF form this
    // replaces (nested transform of substr concats) was O(len³) allocs at
    // k=2 and dominated the fuzzy-join pipelines.
    graft.functions.vector.deletion_hashes(s, maxDist)
}
