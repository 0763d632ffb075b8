package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reshape verbs (SURVEY §2.6) — filled in M4. */
object QueriesReshape {
  private type Q = (SparkSession, String) => DataFrame
  val entries: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
