package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.syntax._
import graft.Tables._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY §2 (or an LLM-pipeline
  * extension); [[oracleSql]] carries the equivalent DuckDB SQL over the same
  * parquet tables. Column names are aliased identically on both sides; float
  * aggregates whose summation order is engine-dependent are rounded on both
  * sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Chains name hygiene, date filter, conditional update, and a windowed
    * group-transform — four subsystems in one lazy plan (SURVEY §7.1 M0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    lineitem(spark, dir)
      .cleanNames()
      .filterDate("l_shipdate", years = Seq(1994, 1995, 1996))
      .updateWhere("l_discount > 0.05", "high_discount", 1)
      .groupbyAgg(Seq("l_orderkey"), "l_extendedprice", "sum", "order_total")
      .filterOn("order_total > 1000")
      .conditionalJoin(orders(spark, dir).select("o_orderkey", "o_orderdate"),
        Seq(("l_orderkey", "o_orderkey", "=="), ("l_shipdate", "o_orderdate", ">")))
      .groupbyTopk(Seq("l_returnflag"), "order_total", 100,
        tiebreak = Seq("l_orderkey", "l_linenumber"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.entries ++ QueriesReshape.entries ++ QueriesJoin.entries ++
      QueriesLlm.entries ++ QueriesDomain.entries ++ QueriesStreaming.entries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    QueriesCore.oracles ++ QueriesReshape.oracles ++ QueriesJoin.oracles ++
      QueriesLlm.oracles ++ QueriesDomain.oracles ++ QueriesStreaming.oracles
}
