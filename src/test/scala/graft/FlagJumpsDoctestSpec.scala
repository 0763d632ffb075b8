package graft

import graft.operators.TimeseriesOps
import graft.operators.TimeseriesOps.JumpCriteria

/** The reference's flag_jumps value tables ported verbatim (reference:
  * tests/timeseries/test_flag_jumps.py — fixture :15-27, absolute
  * large-jump :199-230, percentage direction tables :233-333, percentage
  * large-jump :338-372, the issue-711 use case :569-628). The percentage
  * tables include zero-crossing rows where pandas' pct_change yields ±inf
  * — IEEE double division reproduces that in Spark, and these cases pin
  * it.
  */
class FlagJumpsDoctestSpec extends SparkSpec {
  import spark.implicits._

  // ts_index 0..9; col1=0..9, col2=100..109, col3/col4 reversed,
  // col5 = [-2,-1,0,1,2,1,0,-1,-2,-7.5]
  private lazy val ts = {
    val c1 = (0 until 10).map(_.toDouble)
    val c2 = (100 until 110).map(_.toDouble)
    val c5 = Seq(-2.0, -1.0, 0.0, 1.0, 2.0, 1.0, 0.0, -1.0, -2.0, -7.5)
    (0 until 10).map(i =>
      (i, c1(i), c2(i), c1(9 - i), c2(9 - i), c5(i)))
      .toDF("ord", "col1", "col2", "col3", "col4", "col5")
  }

  private def flagsOf(col: String, crit: JumpCriteria): Seq[Int] =
    TimeseriesOps.flagJumps(ts.select("ord", col), "ord", default = crit)
      .orderBy("ord").collect().map(_.getAs[Int](s"${col}_jump_flag")).toSeq

  test("absolute scale, large threshold flags only the -2 -> -7.5 drop") {
    assert(flagsOf("col5", JumpCriteria("absolute", "increasing", 5)) ==
      Seq.fill(10)(0))
    assert(flagsOf("col5", JumpCriteria("absolute", "decreasing", 5)) ==
      Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 1))
    assert(flagsOf("col5", JumpCriteria("absolute", "any", 5)) ==
      Seq(0, 0, 0, 0, 0, 0, 0, 0, 0, 1))
  }

  test("percentage scale, correct direction (threshold 0.25)") {
    assert(flagsOf("col1", JumpCriteria("percentage", "increasing", 0.25)) ==
      Seq(0, 1, 1, 1, 1, 0, 0, 0, 0, 0))
    assert(flagsOf("col2", JumpCriteria("percentage", "increasing", 0.25)) ==
      Seq.fill(10)(0))
    assert(flagsOf("col3", JumpCriteria("percentage", "decreasing", 0.25)) ==
      Seq(0, 0, 0, 0, 0, 0, 0, 1, 1, 1))
    assert(flagsOf("col4", JumpCriteria("percentage", "decreasing", 0.25)) ==
      Seq.fill(10)(0))
    assert(flagsOf("col5", JumpCriteria("percentage", "increasing", 0.25)) ==
      Seq(0, 1, 1, 1, 1, 0, 0, 0, 0, 0))
    assert(flagsOf("col5", JumpCriteria("percentage", "decreasing", 0.25)) ==
      Seq(0, 0, 0, 0, 0, 1, 1, 1, 1, 1))
  }

  test("percentage scale, inverse direction flags nothing (except col5 both ways)") {
    assert(flagsOf("col1", JumpCriteria("percentage", "decreasing", 0.25)) ==
      Seq.fill(10)(0))
    assert(flagsOf("col2", JumpCriteria("percentage", "decreasing", 0.25)) ==
      Seq.fill(10)(0))
    assert(flagsOf("col3", JumpCriteria("percentage", "increasing", 0.25)) ==
      Seq.fill(10)(0))
    assert(flagsOf("col4", JumpCriteria("percentage", "increasing", 0.25)) ==
      Seq.fill(10)(0))
  }

  test("percentage scale, any direction (threshold 0.10)") {
    assert(flagsOf("col1", JumpCriteria("percentage", "any", 0.10)) ==
      Seq(0, 1, 1, 1, 1, 1, 1, 1, 1, 1))
    assert(flagsOf("col2", JumpCriteria("percentage", "any", 0.10)) ==
      Seq.fill(10)(0))
    assert(flagsOf("col3", JumpCriteria("percentage", "any", 0.10)) ==
      Seq(0, 1, 1, 1, 1, 1, 1, 1, 1, 1))
    assert(flagsOf("col4", JumpCriteria("percentage", "any", 0.10)) ==
      Seq.fill(10)(0))
    assert(flagsOf("col5", JumpCriteria("percentage", "any", 0.10)) ==
      Seq(0, 1, 1, 1, 1, 1, 1, 1, 1, 1))
  }

  test("percentage scale, large threshold: only inf/±>100% rows flag (zero crossings)") {
    assert(flagsOf("col5", JumpCriteria("percentage", "increasing", 1.0)) ==
      Seq(0, 0, 0, 1, 0, 0, 0, 0, 0, 0)) // 0 -> 1 is pct inf
    assert(flagsOf("col5", JumpCriteria("percentage", "decreasing", 1.0)) ==
      Seq(0, 0, 0, 0, 0, 0, 0, 1, 0, 1)) // 0 -> -1 is pct -inf; -2 -> -7.5 is 275%
    assert(flagsOf("col5", JumpCriteria("percentage", "any", 1.0)) ==
      Seq(0, 0, 0, 1, 0, 0, 0, 1, 0, 1))
  }

  test("NaN neighbors never flag (pandas NaN-comparison-is-false semantics)") {
    // Spark orders NaN above every number, so an unmasked abs(diff) >
    // threshold would flag both rows adjacent to a NaN; pandas flags none
    val d = Seq((0, 1.0), (1, Double.NaN), (2, 5.0), (3, 50.0))
      .toDF("ord", "v")
    def flags(crit: JumpCriteria) =
      TimeseriesOps.flagJumps(d, "ord", default = crit)
        .orderBy("ord").collect().map(_.getAs[Int]("v_jump_flag")).toSeq
    assert(flags(JumpCriteria("absolute", "any", 10)) == Seq(0, 0, 0, 1))
    assert(flags(JumpCriteria("absolute", "increasing", 10)) == Seq(0, 0, 0, 1))
    assert(flags(JumpCriteria("percentage", "any", 10)) == Seq(0, 0, 0, 0))
  }

  test("issue-711 use case: absolute increasing threshold 2 over four columns") {
    val rows = (0 until 25).map { i =>
      val j = i % 5
      (i, Seq(-0.76, -0.73, -0.71, -0.68, -0.65)(j), 2.0,
        Seq(2.0, 4.0, 4.0, 32.0, 2.0)(j), Seq(1.2, 1.1, 1.1, 1.1, 1.0)(j))
    }
    val df = rows.toDF("ord", "column1", "column2", "column3", "column4")
    val out = TimeseriesOps.flagJumps(df, "ord",
      default = JumpCriteria("absolute", "increasing", 2)).orderBy("ord")
    assert(out.columns.toSeq == Seq("ord", "column1", "column2", "column3",
      "column4", "column1_jump_flag", "column2_jump_flag",
      "column3_jump_flag", "column4_jump_flag"))
    val c3 = out.collect().map(_.getAs[Int]("column3_jump_flag")).toSeq
    assert(c3 == (0 until 25).map(i => if (i % 5 == 3) 1 else 0))
    for (c <- Seq("column1", "column2", "column4"))
      assert(out.collect().map(_.getAs[Int](s"${c}_jump_flag")).sum == 0, c)
  }
}
