package graft.meta

import graft.SparkTestBase
import java.sql.Timestamp

class TrackingSpec extends SparkTestBase {

  test("run log appends versions and latestVersion picks the newest") {
    val log = java.nio.file.Files.createTempDirectory("runlog").toString + "/log"
    def v(ts: String, n: Long) = Tracking.RunVersion(
      Timestamp.valueOf(ts), 1000L,
      Timestamp.valueOf(ts), Timestamp.valueOf(ts), n, 0L)
    Tracking.appendRunLog(spark, log, v("2024-01-01 00:00:00", 10))
    Tracking.appendRunLog(spark, log, v("2024-03-01 00:00:00", 30))
    Tracking.appendRunLog(spark, log, v("2024-02-01 00:00:00", 20))
    val latest = Tracking.latestVersion(spark, log).collect()
    assert(latest.length === 1)
    assert(latest.head.getAs[Long]("loadRecords") === 30L)
    assert(spark.read.parquet(log).count() === 3)
  }

  test("metrics invariants reject inconsistent counts") {
    val bad = Tracking.FileMetrics("t", 10, 5, 4, 2)
    assert(!bad.consistent) // 5+2 != 10 and load != clean
    val good = Tracking.FileMetrics("t", 7, 5, 5, 2)
    assert(good.consistent)
  }
}
