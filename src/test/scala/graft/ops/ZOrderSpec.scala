package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for the z-order layout query: (1) the builtin-composed
  * interleave is bit-equal to a reference Scala implementation, (2) the
  * tile bounding boxes the driver hash-verifies really are tile-tight,
  * and (3) the PHYSICAL claim — range-partitioning by z yields
  * per-partition bounding boxes tight on BOTH dimensions, where a hash
  * layout spans the full domain on both. (3) is the file-skipping
  * property the query's scaladoc promises at 100 TB: parquet footer
  * min/max per file ≙ per-partition min/max here. */
class ZOrderSpec extends SparkTestBase {

  private def refZ(x: Int, y: Int): Int =
    (0 until 8).foldLeft(0) { (acc, b) =>
      acc | (((x >> b) & 1) << (2 * b + 1)) | (((y >> b) & 1) << (2 * b))
    }

  test("composed z-value is bit-equal to the reference interleave") {
    import spark.implicits._
    val pts = for (x <- 0 until 256 by 7; y <- 0 until 256 by 11)
      yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        IncrQueries.zvalue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getInt(0), r.getInt(1), r.getInt(2))
      assert(z === refZ(x, y), s"z($x,$y)")
    }
  }

  test("every 16x16 z-tile bounding box is tile-tight") {
    val tiles = graft.SparkEntry.queries("zorder_layout")(
      spark, "/root/testdata/sf0.01").collect()
    assert(tiles.nonEmpty)
    tiles.foreach { r =>
      val (ztile, minX, maxX, minY, maxY) =
        (r.getInt(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(maxX - minX <= 15 && maxY - minY <= 15, s"tile $ztile")
      // and the box sits where the de-interleaved tile coordinates say
      val tileX = (0 until 4).map(b => ((ztile >> (2 * b + 1)) & 1) << b)
        .sum << 4
      val tileY = (0 until 4).map(b => ((ztile >> (2 * b)) & 1) << b)
        .sum << 4
      assert(minX >= tileX && maxX < tileX + 16, s"tile $ztile x-box")
      assert(minY >= tileY && maxY < tileY + 16, s"tile $ztile y-box")
    }
  }

  test("range-partitioning by z bounds BOTH dims per partition; hash does not") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.01")
    val pts = orders.select(
      pmod(col("o_custkey"), lit(256)).cast("int").as("x"),
      floor(datediff(to_date(col("o_orderdate")),
        to_date(lit("1995-01-01"))) / 10).cast("int").as("y"))
    def spans(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int)] = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSeq
    val zed = pts.withColumn("z", IncrQueries.zvalue(col("x"), col("y")))
    val zSpans = spans(zed.repartitionByRange(16, col("z")))
    val hashSpans = spans(zed.repartition(16, col("z")))
    def avg(s: Seq[(Int, Int)]) =
      s.map { case (a, b) => a + b }.sum.toDouble / s.size
    // 16 contiguous ranges of a 16-bit z ≈ 64×64 blocks, but range
    // boundary SAMPLING shifts with the input partition layout, so a
    // boundary partition can straddle two blocks (x+y span up to ~256+)
    // — bound the average loosely in absolute terms (hash layout sits
    // at ≈ 495) and let the ÷2 relative assertion carry the claim.
    assert(avg(zSpans) < 280,
      s"z-range partitions not locality-bounded: $zSpans")
    assert(avg(hashSpans) > 350,
      s"hash layout unexpectedly local: $hashSpans")
    assert(avg(zSpans) < avg(hashSpans) / 2)
  }
}
