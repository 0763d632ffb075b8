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

  test("writeZOrdered clusters both dimensions: per-file ranges shrink vs global") {
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i * 37 % 100).toDouble, ((i * 53) % 100) * 1000.0)
    }.toDF("id", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    IoOps.writeZOrdered(df, path, Seq("x", "y"), bits = 6, numFiles = 8)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 4, s"expected several output files, got ${files.length}")
    val back = spark.read.parquet(path)
    assert(back.count() == n)
    // locality: the average per-file span of EACH dimension must be well
    // under the global span — the property min/max row-group pruning needs
    def avgSpan(c: String): Double = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).collect()(0)
      r.getDouble(1) - r.getDouble(0)
    }.sum / files.length
    assert(avgSpan("x") < 60.0, s"x not clustered: avg span ${avgSpan("x")}")
    assert(avgSpan("y") < 60000.0, s"y not clustered: avg span ${avgSpan("y")}")
  }

  test("zBoundaries produces ascending split points of the right arity") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val bs = IoOps.zBoundaries(df, Seq("v"), bits = 4)
    assert(bs.head.length == 15)
    assert(bs.head.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
  }
}
