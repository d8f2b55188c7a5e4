package graft.sinks

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Contract pins for `PartitionedSink.compactZOrdered`: the written
  * files must (1) be right-sized, (2) carry DISJOINT z-ranges, and
  * (3) have per-file bounding boxes tight on BOTH dimensions — the
  * property parquet footer stats need for 2-D file skipping. An
  * unclustered control write of the same data must span the full
  * domain per file, proving the layout (not the data) earns the
  * stats. */
class ZCompactSpec extends SparkTestBase {

  private def pts = Tables.orders(spark, "/root/testdata/sf0.01")
    .select(
      pmod(col("o_custkey"), lit(256)).cast("int").as("x"),
      floor(datediff(to_date(col("o_orderdate")),
        to_date(lit("1995-01-01"))) / 10).cast("int").as("y"))

  test("compacted files are right-sized, z-disjoint, and 2-D tight") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zcompact").toString
    val target = 1000L
    PartitionedSink.compactZOrdered(pts, s"$dir/z", "x", "y", target)

    val back = spark.read.parquet(s"$dir/z")
      .withColumn("file", input_file_name())
      .withColumn("z", graft.ops.IncrQueries.zvalue(col("x"), col("y")))
    val n = back.count()
    val perFile = back.groupBy("file")
      .agg(count(lit(1)).as("cnt"),
        min("z").as("zmin"), max("z").as("zmax"),
        (max("x") - min("x")).as("xspan"),
        (max("y") - min("y")).as("yspan"))
      .collect()

    // (1) file count ~ ceil(n/target). Range-boundary SAMPLING is
    // load-sensitive (observed under the parallel suite: most
    // partitions split once by maxRecordsPerFile when boundaries skew
    // ~2x) — real compactors treat file SIZING as approximate, so
    // bound the count in [expected−2, 2·expected]; the per-file cap
    // below is the hard contract.
    val expected = math.ceil(n.toDouble / target).toInt
    assert(perFile.length >= math.max(1, expected - 2) &&
      perFile.length <= expected * 2,
      s"files=${perFile.length} for n=$n target=$target")
    perFile.foreach(r => assert(r.getLong(1) <= target))

    // (2) z-ranges disjoint across files (each file owns a contiguous
    // slice of the curve — what makes min/max stats selective)
    val ranges = perFile.map(r => (r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping z-ranges: $hi > $lo2")
      case _ =>
    }

    // (3) bounded on BOTH dims, and strictly tighter than a control
    // write with no clustering
    def avgSpan(rows: Array[org.apache.spark.sql.Row], xi: Int, yi: Int) =
      rows.map(r => r.getInt(xi) + r.getInt(yi)).sum.toDouble / rows.length
    val zSpan = avgSpan(perFile, 4, 5)
    pts.repartition(perFile.length)
      .write.mode("overwrite").parquet(s"$dir/plain")
    val ctrl = spark.read.parquet(s"$dir/plain")
      .withColumn("file", input_file_name())
      .groupBy("file")
      .agg((max("x") - min("x")).as("xspan"),
        (max("y") - min("y")).as("yspan"))
      .collect()
    val ctrlSpan = avgSpan(ctrl, 1, 2)
    assert(zSpan < ctrlSpan / 2,
      s"z-compacted files not tighter: $zSpan vs control $ctrlSpan")
  }

  test("out-of-domain dimensions are refused by name") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-zguard").toString
    // o_orderkey un-bucketized: values far beyond the 8-bit z domain
    val raw = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").cast("int").as("x"),
        pmod(col("o_custkey"), lit(256)).cast("int").as("y"))
    val e = intercept[IllegalArgumentException] {
      PartitionedSink.compactZOrdered(raw, s"$dir/z", "x", "y", 1000L)
    }
    assert(e.getMessage.contains("'x'") &&
      e.getMessage.contains("z-curve domain"))
  }

  test("a pre-existing internal z column is refused, not clobbered") {
    val withClash = pts.withColumn("__graft_z", lit(0))
    val e = intercept[IllegalArgumentException] {
      PartitionedSink.compactZOrdered(withClash, "/tmp/never", "x", "y",
        1000L)
    }
    assert(e.getMessage.contains("__graft_z"))
  }
}
