package graft

import graft.syntax._
import graft.operators.{JoinOps, ReshapeOps}
import org.apache.spark.sql.functions._

class ReshapeAndJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pivotLonger dropna and namesTransform") {
    val d = Seq((1, Some(2.0), Option.empty[Double])).toDF("id", "x_1", "x_2")
    val out = d.pivotLonger(index = Seq("id"), namesTo = Seq("var", "year"),
      namesSep = Some("_"), dropna = true, namesTransform = Map("year" -> "int"))
    assert(out.columns.toSeq == Seq("id", "var", "year", "value"))
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getInt(2) == 1 && rows(0).getDouble(3) == 2.0)
  }

  test("pivotLonger .value groups fill missing targets with null") {
    val d = Seq((1, 10.0, 20.0, 30.0)).toDF("id", "qty_a", "qty_b", "price_a")
    val out = d.pivotLonger(index = Seq("id"), namesTo = Seq(".value", "grp"),
      namesSep = Some("_"))
    val byGrp = out.collect().map(r => r.getString(1) ->
      (Option(r.get(2)), Option(r.get(3)))).toMap
    // columns sorted: price, qty
    assert(byGrp("a") == (Some(30.0), Some(10.0)))
    assert(byGrp("b") == (None, Some(20.0)))
  }

  test("pivotLonger with names_pattern regex groups") {
    val d = Seq((1, 5.0)).toDF("id", "metric2024")
    val out = d.pivotLonger(index = Seq("id"), namesTo = Seq("what", "year"),
      namesPattern = Some("([a-z]+)(\\d+)"))
    val r = out.collect()(0)
    assert(r.getString(1) == "metric" && r.getString(2) == "2024" && r.getDouble(3) == 5.0)
  }

  test("pivotWider namesPrefix and unseen known values") {
    val d = Seq((1, "x", 2.0)).toDF("id", "k", "v")
    val out = d.pivotWider(Seq("id"), "k", "v", agg = "sum",
      namesPrefix = "k_", knownValues = Seq("x", "y"))
    assert(out.columns.toSeq == Seq("id", "k_x", "k_y"))
    assert(out.collect()(0).isNullAt(2))
  }

  test("complete explicitOnlyNew leaves existing nulls alone") {
    val d = Seq(("a", 1, Option.empty[Double]), ("b", 2, Some(5.0)))
      .toDF("k1", "k2", "v")
    val out = ReshapeOps.complete(d, Seq("k1", "k2"),
      fillValue = Map("v" -> 0.0), explicitOnlyNew = true)
    val got = out.collect().map(r => (r.getString(0), r.getInt(1),
      if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == Set(("a", 1, null), ("a", 2, 0.0), ("b", 1, 0.0), ("b", 2, 5.0)))
  }

  test("expandGrid builds typed cartesian products") {
    val out = ReshapeOps.expandGrid(spark, Seq("i" -> Seq(1, 2), "s" -> Seq("a")))
    assert(out.count() == 2 && out.columns.toSeq == Seq("i", "s"))
  }

  test("conditionalJoin rejects equality-only and supports !=") {
    val l = Seq((1, 2)).toDF("a", "x")
    val r = Seq((1, 3)).toDF("b", "y")
    intercept[IllegalArgumentException](
      JoinOps.conditionalJoin(l, r, Seq(("a", "b", "=="))))
    assert(JoinOps.conditionalJoin(l, r, Seq(("a", "b", "!="))).count() == 0)
    assert(JoinOps.conditionalJoin(l, r, Seq(("x", "y", "<"))).count() == 1)
  }

  test("conditionalJoin left join and indicator") {
    val l = Seq((1, 10), (2, 99)).toDF("id", "x")
    val r = Seq((5, 20)).toDF("lo", "hi")
    val out = JoinOps.conditionalJoin(l, r,
      Seq(("x", "lo", ">="), ("x", "hi", "<=")), how = "left", indicator = true)
    val byId = out.collect().map(row => row.getInt(0) -> row.getString(4)).toMap
    assert(byId == Map(1 -> "both", 2 -> "left_only"))
  }

  test("conditionalJoin right and outer joins preserve unmatched sides") {
    val l = Seq((1, 10)).toDF("id", "x")
    val r = Seq((5, 20), (50, 60)).toDF("lo", "hi")
    val right = JoinOps.conditionalJoin(l, r,
      Seq(("x", "lo", ">="), ("x", "hi", "<=")), how = "right")
    assert(right.count() == 2 && right.filter(col("id").isNull).count() == 1)
    val outer = JoinOps.conditionalJoin(l, r,
      Seq(("x", "lo", ">="), ("x", "hi", "<=")), how = "full", indicator = true)
    val merges = outer.collect().map(_.getString(4)).sorted.toSeq
    assert(merges == Seq("both", "right_only"))
  }

  test("conditionalJoin keep=last picks highest right ordering") {
    val l = Seq((1, 10)).toDF("id", "x")
    val r = Seq((1, 1), (2, 5), (3, 8)).toDF("rid", "lo")
    val out = JoinOps.conditionalJoin(l, r, Seq(("x", "lo", ">")), keep = "last")
    assert(out.collect()(0).getInt(2) == 3) // rid of lo=8
  }

  test("conditionalJoin prefixes colliding right columns") {
    val l = Seq((1, 5)).toDF("id", "v")
    val r = Seq((1, 3)).toDF("id", "w")
    val out = JoinOps.conditionalJoin(l, r, Seq(("v", "w", ">")))
    assert(out.columns.toSeq == Seq("id", "v", "right_id", "w"))
  }

  test("rangeJoin matches the naive theta join") {
    val l = (1 to 40).map(i => (i, i.toDouble)).toDF("id", "x")
    val r = Seq((1, 3.0, 9.0), (2, 8.0, 12.0), (3, 30.0, 31.0)).toDF("rid", "lo", "hi")
    val banded = JoinOps.rangeJoin(l, r, "x", "lo", "hi", bandWidth = 4.0)
    val naive = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
    assert(sorted(banded.select("id", "rid")) == sorted(naive.select("id", "rid")))
  }

  test("rangeJoin routes over-wide intervals through the capped branch losslessly") {
    val l = (1 to 60).map(i => (i, i.toDouble)).toDF("id", "x")
    // interval 2 spans 50 bands at W=1 — far over maxBands=4
    val r = Seq((1, 3.0, 5.0), (2, 1.0, 51.0), (3, 58.0, 59.0)).toDF("rid", "lo", "hi")
    val capped = JoinOps.rangeJoin(l, r, "x", "lo", "hi", bandWidth = 1.0, maxBands = 4)
    val naive = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
    assert(sorted(capped.select("id", "rid")) == sorted(naive.select("id", "rid")))
  }

  test("rangeJoin derives band width from data when not given") {
    val l = (1 to 40).map(i => (i, i.toDouble)).toDF("id", "x")
    val r = Seq((1, 3.0, 9.0), (2, 8.0, 12.0), (3, 30.0, 31.0)).toDF("rid", "lo", "hi")
    val auto = JoinOps.rangeJoin(l, r, "x", "lo", "hi")
    val naive = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"))
    assert(sorted(auto.select("id", "rid")) == sorted(naive.select("id", "rid")))
  }

  test("rangeJoin outer forms keep unmatched rows from both sides") {
    val l = Seq((1, 5.0), (2, 99.0)).toDF("id", "x")
    val r = Seq((1, 3.0, 9.0), (2, 40.0, 41.0)).toDF("rid", "lo", "hi")
    def got(how: String) = JoinOps.rangeJoin(l, r, "x", "lo", "hi",
        bandWidth = 2.0, how = how)
      .select("id", "rid").collect()
      .map(row => (if (row.isNullAt(0)) -1 else row.getInt(0),
        if (row.isNullAt(1)) -1 else row.getInt(1))).sorted.toSeq
    assert(got("left") == Seq((1, 1), (2, -1)))
    assert(got("right") == Seq((-1, 2), (1, 1)))
    assert(got("outer") == Seq((-1, 2), (1, 1), (2, -1)))
  }

  test("rangeJoin how=outer round-trips under AQE: union of matches and complements is lossless") {
    // AQE is on session-wide (SparkSpec); enough rows that the id-tagged
    // frames span several partitions, exercising the localCheckpoint pin
    val l = (1 to 500).map(i => (i, (i % 97).toDouble)).toDF("id", "x")
      .repartition(7)
    val r = (1 to 60).map(j => (j, j * 1.5, j * 1.5 + 2.0)).toDF("rid", "lo", "hi")
      .repartition(5)
    val outer = JoinOps.rangeJoin(l, r, "x", "lo", "hi", bandWidth = 2.0, how = "outer")
    val naive = l.join(r, col("x") >= col("lo") && col("x") <= col("hi"), "full_outer")
    assert(sorted(outer.select("id", "rid")) == sorted(naive.select("id", "rid")))
    // every left id appears, every right id appears (no dropped complements)
    assert(outer.select("id").na.drop().distinct().count() == 500)
    assert(outer.select("rid").na.drop().distinct().count() == 60)
  }

  test("conditionalJoin keep=first with how=right/full keeps every unmatched right row") {
    val l = Seq((1, 10)).toDF("id", "x")
    // two matching right rows (keep=first picks lo=1) + two unmatched rows
    val r = Seq((1, 1), (2, 5), (3, 50), (4, 60)).toDF("rid", "lo")
    val right = JoinOps.conditionalJoin(l, r, Seq(("x", "lo", ">")),
      how = "right", keep = "first")
    val gotRight = right.select("id", "rid").collect()
      .map(row => (if (row.isNullAt(0)) -1 else row.getInt(0), row.getInt(1))).sorted.toSeq
    assert(gotRight == Seq((-1, 3), (-1, 4), (1, 1)))
    val full = JoinOps.conditionalJoin(l, r, Seq(("x", "lo", ">")),
      how = "full", keep = "last")
    val gotFull = full.select("id", "rid").collect()
      .map(row => (if (row.isNullAt(0)) -1 else row.getInt(0), row.getInt(1))).sorted.toSeq
    assert(gotFull == Seq((-1, 3), (-1, 4), (1, 2)))
  }
}
