package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev loop helper: time ONE registry query for N back-to-back reps in
  * a single JVM (same noop-sink discipline as `graft.Bench`) and print
  * every rep, min/median/max. Exists to make bench drift DECIDABLE from
  * an artifact: a query whose recorded cross-round ratio looks like a
  * regression either reproduces its slow time here (real) or scatters
  * its reps across the historical range (host oscillation).
  *
  * Usage: runMain graft.tools.TimeQuery <name> [reps=12] [sfDir]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 12
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus, s"graft-time-$name")
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect() // warm-up
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name rep $i%2d  $t%7.3f s")
      t
    }
    val sorted = times.sorted
    // true median: average the two middle reps on even counts (indexing
    // reps/2 alone would report the UPPER middle — at reps=2, the max)
    val med =
      if (reps % 2 == 1) sorted(reps / 2)
      else (sorted(reps / 2 - 1) + sorted(reps / 2)) / 2.0
    println(f"[time] $name  min=${sorted.head}%.3f  " +
      f"med=$med%.3f  max=${sorted.last}%.3f  reps=$reps")
    spark.stop()
  }
}
