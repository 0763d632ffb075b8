package graft

import graft.sources.IoOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Partition pruning over Hive-style partitioned writes: a filter on the
  * partition column must become a PartitionFilter on the scan (directories
  * never read), not a data filter.
  */
class PartitionedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    def find(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case s: FileSourceScanExec => Some(s)
      case other => other.children.view.flatMap(find(_)).headOption
    }
    find(df.queryExecution.executedPlan).getOrElse(fail("no parquet scan in plan"))
  }

  test("filters on partition columns prune directories, not rows") {
    val dir = java.nio.file.Files.createTempDirectory("pwrite").toFile
    dir.deleteOnExit()
    val docs = (1 to 300).map(i =>
      (i.toLong, s"text $i", Seq("en", "de", "fr")(i % 3))).toDF("id", "text", "lang")
    IoOps.writePartitioned(docs, s"$dir/docs", Seq("lang"))
    val back = spark.read.parquet(s"$dir/docs")
    val filtered = back.filter(col("lang") === "en").select("id")
    assert(filtered.count() == 100)
    val scan = scanOf(filtered)
    // the lang predicate is a partition filter; no data filter mentions lang
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")))
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "lang")))
    // and the scan actually selected a third of the partitions
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.files.size).sum < scan.relation.location.listFiles(Nil, Nil)
      .map(_.files.size).sum)
  }
}
