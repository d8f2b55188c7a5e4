package graft.sinks

import graft.SparkTestBase
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Partition pruning on the hive-style sink: a filter on the partition
  * column must appear as a PartitionFilter (directory skip), not a data
  * filter — at 100 TB that's the difference between reading one
  * language's directory and scanning the corpus. */
class PartitionedScanSpec extends SparkTestBase {

  test("lang filter prunes to the partition, not the data") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-part-spec").toString
    PartitionedSink.writePartitioned(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"),
      base, Seq("lang"))
    val q = PartitionedSink.readPartitioned(spark, base)
      .filter(col("lang") === "en")
    val plan = q.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), plan)
    val pf = plan.linesIterator
      .find(_.trim.startsWith("PartitionFilters")).get
    assert(pf.contains("lang"), pf)
    // and the pruned read matches the unpartitioned filter
    val expected = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(q.count() === expected && expected > 0)
  }
}
