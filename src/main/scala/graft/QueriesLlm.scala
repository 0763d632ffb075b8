package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-pipeline extension operators — filled in M7. */
object QueriesLlm {
  private type Q = (SparkSession, String) => DataFrame
  val entries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
