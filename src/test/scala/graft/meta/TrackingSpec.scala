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

  test("version rollup totals per release and recomputes the invariant") {
    // one consistent release, one release poisoned by a single bad file:
    // the rollup must total per release and the release-grain invariant
    // must go false exactly where the file-grain one does
    import spark.implicits._
    val files = Seq(
      ("r1", "a", 10L, 9L, 9L, 1L), // consistent
      ("r1", "b", 5L, 5L, 5L, 0L), // consistent
      ("r2", "c", 10L, 5L, 4L, 2L)) // 5+2 != 10, load != clean
      .toDF("release", "tableName", "downloadRecords", "cleanRecords",
        "loadRecords", "errorRecords")
    val rolled = Tracking.versionRollup(files)
      .orderBy("release").collect()
    assert(rolled.map(_.getString(0)).toSeq === Seq("r1", "r2"))
    val r1 = rolled(0)
    assert(r1.getLong(r1.fieldIndex("n_files")) === 2L)
    assert(r1.getLong(r1.fieldIndex("download_total")) === 15L)
    assert(r1.getLong(r1.fieldIndex("clean_total")) === 14L)
    assert(r1.getBoolean(r1.fieldIndex("consistent")))
    val r2 = rolled(1)
    assert(!r2.getBoolean(r2.fieldIndex("consistent")))
  }
}
