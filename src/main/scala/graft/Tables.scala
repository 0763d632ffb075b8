package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  /** events.parquet's `ts` physical type depends on the generator version:
    * TIMESTAMP(NANOS) (older driver testdata — Spark's reader rejects it,
    * so read nanos as long via the legacy conf and floor-truncate to
    * microseconds, the same conversion DuckDB applies) or TIMESTAMP(MICROS)
    * (current testdata — read as-is). Dispatch on the loaded schema so both
    * generations work; assuming nanos against a micros file resolved `ts`
    * as TIMESTAMP_NTZ and broke every events-table query (round-9 incident:
    * 38 gates failed on `ts div 1000`).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ =>
        // The nanos path produced TIMESTAMP_LTZ (timestamp_micros); the
        // micros file reads as TIMESTAMP_NTZ. Cast to LTZ — value-identical
        // under the UTC session zone — so downstream ops (epoch casts,
        // date_trunc) and the DuckDB oracles behave exactly as before.
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")
}
