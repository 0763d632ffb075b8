package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Join verbs (SURVEY §2.4) — filled in M5. */
object QueriesJoin {
  private type Q = (SparkSession, String) => DataFrame
  val entries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
