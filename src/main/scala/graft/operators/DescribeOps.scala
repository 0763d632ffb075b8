package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** DataDescription accessor (reference: janitor/accessors/data_description.py:10-49):
  * per-column summary — one aggregate pass over the data, then a
  * schema-sized driver reshape to long form.
  */
object DescribeOps {

  /** Metadata key carrying a user column description — the Spark analog of
    * the reference's `df.data_description.set_description` dict
    * (data_description.py:49-77). Column metadata is part of the schema, so
    * it persists through parquet sinks (Spark stores the full schema JSON in
    * the file footer) — descriptions survive a write/read round-trip, which
    * the reference's in-memory `_desc` dict cannot (DescribeSpec proves it).
    */
  val DescriptionKey = "graft.description"

  def setDescriptions(df: DataFrame, descs: Map[String, String]): DataFrame = {
    descs.keys.foreach(c => require(df.columns.contains(c),
      s"set_description: column '$c' not found"))
    descs.foldLeft(df) { case (acc, (c, d)) =>
      val merged = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(acc.schema(c).metadata)
        .putString(DescriptionKey, d).build()
      acc.withMetadata(c, merged)
    }
  }

  def dataDescription(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val aggs = df.columns.flatMap(c => Seq(
      count(col(s"`$c`")).as(s"__cnt_$c"),
      count(lit(1)).as(s"__n_$c")))
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    val out = df.schema.fields.map { f =>
      val cnt = row.getAs[Long](s"__cnt_${f.name}")
      val n = row.getAs[Long](s"__n_${f.name}")
      val desc =
        if (f.metadata.contains(DescriptionKey)) f.metadata.getString(DescriptionKey)
        else f.metadata.toString match { case "{}" => null; case m => m }
      Row(f.name, f.dataType.simpleString, cnt, n - cnt, desc)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, 1),
      StructType(Seq(
        StructField("column_name", StringType),
        StructField("dtype", StringType),
        StructField("count", LongType),
        StructField("null_count", LongType),
        StructField("description", StringType))))
  }
}
