package graft

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
  *
  * Robustness of the artifact (cross-round diffs kept crying wolf on
  * host contention): each query is timed SPARK_GRAFT_REPS times
  * (default 3) and the MEDIAN is reported, so one contended run can't
  * spike a query's number. Reps stop at the FIRST failing attempt — a
  * known-broken query shouldn't burn the remaining timed reps — and the
  * failure is reported as its NEGATED time-to-failure plus an `"errors"`
  * entry, so a broken query can never masquerade as a fast success.
  * `value` sums medians of successful queries only.
  *
  * The line is kept COMPACT (millisecond precision): the driver captures
  * a bounded tail of the process output, and a long-precision line over
  * a 120+-query registry overflowed that window in round 4 (the recorded
  * artifact had `parsed: null` with the JSON's head truncated away).
  * 3 decimals ≈ 1 KB saved — well inside the window, and sub-ms digits
  * were pure noise anyway.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.local(cpus, "graft-bench")
    // warm-up: exercise scan + shuffle + codegen machinery once
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect()
    // (secs — negative = time-to-failure, error message of that attempt)
    val results: Seq[(String, Double, Option[String])] =
      SparkEntry.registry.map { q =>
        var times = List.empty[Double]
        var failure: Option[(Double, String)] = None
        var i = 0
        while (i < reps && failure.isEmpty) {
          val t0 = System.nanoTime()
          try {
            q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            times ::= (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            failure = Some(((System.nanoTime() - t0) / 1e9,
              s"${e.getClass.getSimpleName}: ${e.getMessage}"))
          }
          i += 1
        }
        failure match {
          // clamp: a sub-ms failure must not format to "-0.000", which
          // parses equal to 0.0 and loses the negative-time convention
          case Some((t, err)) => (q.name, -math.max(t, 0.001), Some(err))
          case None =>
            val sorted = times.sorted
            (q.name, sorted(sorted.length / 2), None)
        }
      }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def jnum(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + jnum(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      jstr(k) + ":" + jstr(e.take(200))
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","reps":$reps,"queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
