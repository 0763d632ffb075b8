package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.syntax._
import graft.Tables._

/** Reshape verbs (SURVEY §2.6): pivot_longer (plain, names_sep, .value,
  * spec), pivot_wider, expand_grid, expand, complete, concat/deconcat,
  * expand_column.
  */
object QueriesReshape {
  private type Q = (SparkSession, String) => DataFrame

  val entries: Map[String, Q] = Map(
    "pivot_longer" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .pivotLonger(index = Seq("l_orderkey", "l_linenumber"),
        namesTo = Seq("name"), valuesTo = "value")),
    "pivot_longer_dropna" -> ((s, d) => events(s, d)
      .select(col("event_id"),
        when(col("event_type") === "click", col("value")).as("m_click"),
        when(col("event_type") === "view", col("value")).as("m_view"))
      .pivotLonger(index = Seq("event_id"),
        namesTo = Seq("name"), valuesTo = "value", dropna = true)),
    "pivot_longer_names_sep" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("m_qty"), col("l_discount").as("m_disc"))
      .pivotLonger(index = Seq("l_orderkey", "l_linenumber"),
        namesTo = Seq("prefix", "metric"), valuesTo = "value",
        namesSep = Some("_"))),
    "pivot_longer_dot_value" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty_a"), (col("l_quantity") * 2).as("qty_b"),
        col("l_extendedprice").as("price_a"), (col("l_extendedprice") * 2).as("price_b"))
      .pivotLonger(index = Seq("l_orderkey", "l_linenumber"),
        namesTo = Seq(".value", "grp"), namesSep = Some("_"))),
    "pivot_longer_multi" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty1"), (col("l_quantity") * 2).as("qty2"),
        col("l_discount").as("disc1"), (col("l_discount") * 2).as("disc2"))
      .pivotLongerMulti(index = Seq("l_orderkey", "l_linenumber"),
        namesTo = Seq("qty", "disc"), namesPatterns = Seq("^qty", "^disc"))),
    "pivot_longer_dot_value_multi" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("x_1_mean"), (col("l_quantity") * 2).as("x_2_mean"),
        col("l_discount").as("y_1_mean"), (col("l_discount") * 2).as("y_2_mean"))
      .pivotLonger(index = Seq("l_orderkey", "l_linenumber"),
        namesTo = Seq(".value", "time", ".value"),
        namesPattern = Some("(x|y)_([0-9])(_mean)"))),
    "pivot_longer_values_to_multi" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("mango"), col("l_discount").as("orange"),
        col("l_extendedprice").as("watermelon"),
        col("l_tax").as("gin"), (col("l_quantity") * 2).as("vodka"))
      .pivotLongerValuesTo(index = Seq("l_orderkey", "l_linenumber"),
        namesTo = Seq("fruit", "drink"), valuesTo = Seq("pounds", "ounces"),
        namesPatterns = Seq("^(m|o|w)", "^(g|v)"))),
    "pivot_longer_dict" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty1"), (col("l_quantity") * 2).as("qty2"),
        col("l_discount").as("disc1"), (col("l_discount") * 2).as("disc2"))
      .pivotLongerDict(index = Seq("l_orderkey", "l_linenumber"),
        pattern = Seq("qty" -> "^qty", "disc" -> "^disc"))),
    "pivot_longer_named_groups" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("x_1_mean"), (col("l_quantity") * 2).as("x_2_mean"),
        col("l_discount").as("y_1_mean"), (col("l_discount") * 2).as("y_2_mean"))
      .pivotLongerNamedGroups(index = Seq("l_orderkey", "l_linenumber"),
        namesPattern = "(?P<_>x|y)_(?P<time>[0-9])(?P<__>_mean)")),
    "pivot_longer_spec" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .pivotLongerSpec(index = Seq("l_orderkey", "l_linenumber"),
        spec = Seq(
          ("l_quantity", "val", Map("kind" -> "quantity")),
          ("l_discount", "val", Map("kind" -> "discount"))))),
    "pivot_wider" -> ((s, d) => orders(s, d)
      .pivotWider(index = Seq("o_custkey"), namesFrom = "o_orderstatus",
        valuesFrom = "o_totalprice", agg = "sum", knownValues = Seq("F", "O", "P"))
      .transformColumns(Seq("F", "O", "P"), c => round(c * 1e4).cast("long"))),
    "pivot_wider_glue" -> ((s, d) => orders(s, d)
      .pivotWider(index = Seq("o_custkey"), namesFrom = "o_orderstatus",
        valuesFrom = "o_totalprice", agg = "sum", knownValues = Seq("F", "O", "P"),
        namesGlue = "{_value}_{o_orderstatus}")
      .transformColumns(Seq("o_totalprice_F", "o_totalprice_O", "o_totalprice_P"),
        c => round(c * 1e4).cast("long"))),
    "pivot_wider_multi" -> ((s, d) => orders(s, d)
      .pivotWiderMulti(index = Seq("o_custkey"), namesFrom = "o_orderstatus",
        valuesFrom = Seq("o_totalprice", "o_orderkey"), agg = "max",
        knownValues = Seq("F", "O", "P"))),
    "expand_grid" -> ((s, d) =>
      operators.ReshapeOps.expandGrid(s, Seq(
        "k" -> Seq(1, 2, 3), "v" -> Seq("a", "b")))),
    "expand" -> ((s, d) => lineitem(s, d).expand("l_returnflag", "l_linestatus")),
    "expand_by" -> ((s, d) => lineitem(s, d)
      .expandBy(Seq("l_returnflag"), Seq("l_linestatus", "l_linenumber"))),
    // mixed expand (test_expand.py test_various): a data-derived nested
    // group crossed against an explicit literal value set
    "expand_mixed" -> ((s, d) => lineitem(s, d)
      .expandMixed(groups = Seq(Seq("l_returnflag", "l_linestatus")),
        literals = Seq("year" -> Seq(1, 2, 3)))),
    "complete" -> ((s, d) => events(s, d)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
      .complete(Seq("user_id", "event_type"), fillValue = Map("n" -> 0L))),
    // tidyr-nesting groups (reference test_complete.py:407 "multiple
    // groupings"): OBSERVED (returnflag, linestatus) combinations — fewer
    // than their full cross — crossed against the tax-bucket universe
    "complete_nesting" -> ((s, d) => lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_tax") * 100).cast("long").as("tax_cents"))
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("tax_cents"))
      .agg(count(lit(1)).as("n"))
      .completeNested(Seq(Seq("l_returnflag", "l_linestatus"), Seq("tax_cents")),
        fillValue = Map("n" -> 0L))),
    // per-group integral range completion (reference complete.py `by` +
    // callable universe, test_complete.py:514): one agg + explode, no
    // driver collect at any group cardinality
    "complete_range_by" -> ((s, d) => lineitem(s, d)
      .filter(col("l_quantity") > 25)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .completeRange("l_linenumber", by = Seq("l_orderkey"),
        fillValue = Map("l_quantity" -> 0.0))),
    // dict-form literal universe UNIONed with observed values
    // (complete.py:278,292 outer merge)
    "complete_literals" -> ((s, d) => region(s, d)
      .select("r_regionkey", "r_name")
      .completeNested(Seq.empty[Seq[String]],
        literals = Seq("r_regionkey" -> Seq(0, 1, 2, 3, 4, 5, 6)),
        fillValue = Map("r_name" -> "none"))),
    "concatenate_columns" -> ((s, d) => nation(s, d)
      .concatenateColumns(Seq("n_name", "n_regionkey"), "combined", sep = "-")),
    "deconcatenate_column" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_name")
      .deconcatenateColumn("p_name", " ", Seq("adjective", "noun"))),
    "deconcatenate_preserve" -> ((s, d) => part(s, d)
      .select("p_partkey", "p_name", "p_size")
      .deconcatenateColumn("p_name", " ", Seq("adjective", "noun"),
        preservePosition = true)),
    "take_first_desc" -> ((s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_shipdate")
      .takeFirst(Seq("l_partkey"), "l_shipdate", ascending = false,
        tiebreak = Seq("l_orderkey", "l_linenumber"))),
    "expand_column" -> ((s, d) => lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        concat_ws(",", col("l_returnflag"), col("l_linestatus")).as("labels"))
      .expandColumn("labels", ","))
  )

  val oracles: Map[String, String] = Map(
    "pivot_longer" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS name, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount' AS name, l_discount AS value FROM lineitem""".stripMargin,
    "pivot_longer_dropna" ->
      """SELECT event_id, 'm_click' AS name, value FROM events
        |  WHERE event_type = 'click' AND value IS NOT NULL
        |UNION ALL
        |SELECT event_id, 'm_view' AS name, value FROM events
        |  WHERE event_type = 'view' AND value IS NOT NULL""".stripMargin,
    "pivot_longer_names_sep" ->
      """SELECT l_orderkey, l_linenumber, 'm' AS prefix, 'qty' AS metric, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'm' AS prefix, 'disc' AS metric, l_discount AS value FROM lineitem""".stripMargin,
    "pivot_longer_dot_value" ->
      """SELECT l_orderkey, l_linenumber, 'a' AS grp, l_extendedprice AS price, l_quantity AS qty FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'b' AS grp, l_extendedprice * 2 AS price, l_quantity * 2 AS qty FROM lineitem""".stripMargin,
    "pivot_longer_multi" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_discount AS disc FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity * 2 AS qty, l_discount * 2 AS disc FROM lineitem""".stripMargin,
    "pivot_longer_dot_value_multi" ->
      """SELECT l_orderkey, l_linenumber, '1' AS time, l_quantity AS x_mean, l_discount AS y_mean FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, '2' AS time, l_quantity * 2 AS x_mean, l_discount * 2 AS y_mean FROM lineitem""".stripMargin,
    "pivot_longer_values_to_multi" ->
      """SELECT l_orderkey, l_linenumber, 'mango' AS fruit, 'gin' AS drink, l_quantity AS pounds, l_tax AS ounces FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'orange' AS fruit, 'vodka' AS drink, l_discount AS pounds, l_quantity * 2 AS ounces FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'watermelon' AS fruit, CAST(NULL AS VARCHAR) AS drink, l_extendedprice AS pounds, CAST(NULL AS DOUBLE) AS ounces FROM lineitem""".stripMargin,
    "pivot_longer_dict" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_discount AS disc FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity * 2 AS qty, l_discount * 2 AS disc FROM lineitem""".stripMargin,
    "pivot_longer_named_groups" ->
      """SELECT l_orderkey, l_linenumber, '1' AS time, l_quantity AS x_mean, l_discount AS y_mean FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, '2' AS time, l_quantity * 2 AS x_mean, l_discount * 2 AS y_mean FROM lineitem""".stripMargin,
    "pivot_longer_spec" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS kind, l_quantity AS val FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount' AS kind, l_discount AS val FROM lineitem""".stripMargin,
    "pivot_wider" ->
      """SELECT o_custkey,
        |CAST(round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) * 1e4) AS BIGINT) AS "F",
        |CAST(round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) * 1e4) AS BIGINT) AS "O",
        |CAST(round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) * 1e4) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "pivot_wider_glue" ->
      """SELECT o_custkey,
        |CAST(round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) * 1e4) AS BIGINT) AS o_totalprice_F,
        |CAST(round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) * 1e4) AS BIGINT) AS o_totalprice_O,
        |CAST(round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) * 1e4) AS BIGINT) AS o_totalprice_P
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "pivot_wider_multi" ->
      """SELECT o_custkey,
        |max(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS o_totalprice_F,
        |max(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS o_totalprice_O,
        |max(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) AS o_totalprice_P,
        |max(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) AS o_orderkey_F,
        |max(CASE WHEN o_orderstatus = 'O' THEN o_orderkey END) AS o_orderkey_O,
        |max(CASE WHEN o_orderstatus = 'P' THEN o_orderkey END) AS o_orderkey_P
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "expand_grid" ->
      """SELECT * FROM (VALUES (1),(2),(3)) t(k) CROSS JOIN (VALUES ('a'),('b')) s(v)""",
    "expand" ->
      """SELECT * FROM (SELECT DISTINCT l_returnflag FROM lineitem)
        |CROSS JOIN (SELECT DISTINCT l_linestatus FROM lineitem)""".stripMargin,
    "expand_mixed" ->
      """SELECT * FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
        |CROSS JOIN (SELECT CAST(y AS INTEGER) AS year FROM (VALUES (1),(2),(3)) t(y))""".stripMargin,
    "expand_by" ->
      """SELECT a.l_returnflag, a.l_linestatus, b.l_linenumber
        |FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem) a
        |JOIN (SELECT DISTINCT l_returnflag, l_linenumber FROM lineitem) b
        |USING (l_returnflag)""".stripMargin,
    "complete" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT u.user_id, t.event_type, coalesce(c.n, 0) AS n
        |FROM (SELECT DISTINCT user_id FROM c) u
        |CROSS JOIN (SELECT DISTINCT event_type FROM c) t
        |LEFT JOIN c USING (user_id, event_type)""".stripMargin,
    "complete_nesting" ->
      """WITH c AS (SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_tax * 100) AS BIGINT) AS tax_cents, count(*) AS n
        |  FROM lineitem GROUP BY 1, 2, 3)
        |SELECT g.l_returnflag, g.l_linestatus, m.tax_cents,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n
        |FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM c) g
        |CROSS JOIN (SELECT DISTINCT tax_cents FROM c) m
        |LEFT JOIN c USING (l_returnflag, l_linestatus, tax_cents)""".stripMargin,
    "complete_range_by" ->
      """WITH f AS (SELECT l_orderkey, l_linenumber, l_quantity
        |  FROM lineitem WHERE l_quantity > 25),
        |b AS (SELECT l_orderkey, min(l_linenumber) AS mn, max(l_linenumber) AS mx
        |  FROM f GROUP BY 1),
        |u AS (SELECT l_orderkey,
        |  CAST(unnest(generate_series(mn, mx)) AS INTEGER) AS l_linenumber FROM b)
        |SELECT u.l_orderkey, u.l_linenumber, coalesce(f.l_quantity, 0) AS l_quantity
        |FROM u LEFT JOIN f USING (l_orderkey, l_linenumber)""".stripMargin,
    "complete_literals" ->
      """WITH u AS (SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6)) t(k)),
        |m AS (SELECT CAST(r_regionkey AS INTEGER) AS k, r_name FROM region)
        |SELECT coalesce(u.k, m.k) AS r_regionkey, coalesce(m.r_name, 'none') AS r_name
        |FROM u FULL JOIN m ON u.k = m.k""".stripMargin,
    "concatenate_columns" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |n_name || '-' || CAST(n_regionkey AS VARCHAR) AS combined FROM nation""".stripMargin,
    "deconcatenate_column" ->
      """SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS adjective,
        |split_part(p_name, ' ', 2) AS noun FROM part""".stripMargin,
    "deconcatenate_preserve" ->
      """SELECT p_partkey, split_part(p_name, ' ', 1) AS adjective,
        |split_part(p_name, ' ', 2) AS noun, p_size FROM part""".stripMargin,
    "take_first_desc" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_partkey
        |  ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) = 1""".stripMargin,
    "expand_column" ->
      """SELECT l_orderkey, l_linenumber,
        |l_returnflag || ',' || l_linestatus AS labels,
        |CAST(l_returnflag = 'A' AS INTEGER) AS "A",
        |CAST(l_linestatus = 'F' AS INTEGER) AS "F",
        |CAST(l_returnflag = 'N' AS INTEGER) AS "N",
        |CAST(l_linestatus = 'O' AS INTEGER) AS "O",
        |CAST(l_returnflag = 'R' AS INTEGER) AS "R"
        |FROM lineitem""".stripMargin
  )
}
