package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler._
import graft.{GraftSession, SparkEntry}

/** Optimization-round profiler: run ONE registry query warm and print a
  * per-job / per-stage wall+metrics breakdown, so the 2-second serve
  * queries decompose into their actual jobs (eager actions inside the
  * query fn, shuffle stages, driver gaps) instead of one opaque number.
  *
  * The first (warm-up) rep pays BuildOnce index builds and codegen; the
  * profiled rep is the steady-state serve cost — the same thing
  * `graft.Bench` reports as the min over reps.
  *
  * Gaps between jobs are DRIVER time (planning, collect processing,
  * file listing): a query whose jobs sum to far less than its wall time
  * is driver-bound, not executor-bound.
  *
  * Usage: runMain graft.tools.ProfileQuery <name> [sfDir] [warmups=2]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val warmups = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, s"graft-profile-$name")
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect() // warm-up
    val fn = SparkEntry.queries(name)
    def rep(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 1 to warmups) println(f"[profile] warmup $i: ${rep()}%.3f s")

    case class JobRec(id: Int, var desc: String, start: Long,
      var end: Long, stages: mutable.Buffer[Int])
    case class StageRec(id: Int, var nameStr: String, var nTasks: Int,
      var start: Long, var end: Long, var taskTimeMs: Long,
      var shufReadB: Long, var shufWriteB: Long, var inputB: Long,
      var spillB: Long)
    val jobs = mutable.ArrayBuffer.empty[JobRec]
    val stages = mutable.Map.empty[Int, StageRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += JobRec(e.jobId,
            Option(e.properties)
              .flatMap(p => Option(p.getProperty(
                "spark.job.description"))).getOrElse(""),
            e.time, -1L, mutable.Buffer(e.stageIds: _*))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = e.time)
        }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages(si.stageId) = StageRec(si.stageId, si.name.take(80),
            si.numTasks,
            si.submissionTime.getOrElse(-1L),
            si.completionTime.getOrElse(-1L),
            m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.inputMetrics.bytesRead,
            m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val wall = rep()
    spark.sparkContext.removeSparkListener(listener)
    // listener bus is async; give it a beat to drain
    Thread.sleep(500)
    println(f"[profile] $name profiled rep: $wall%.3f s " +
      f"(${jobs.size} jobs, ${stages.size} stages)")
    var prevEnd = -1L
    val sorted = jobs.sortBy(_.start)
    val firstStart = sorted.headOption.map(_.start).getOrElse(0L)
    for (j <- sorted) {
      val gap = if (prevEnd >= 0) j.start - prevEnd else 0L
      prevEnd = math.max(prevEnd, j.end)
      val dur = (j.end - j.start) / 1e3
      println(f"[job] id=${j.id}%3d t+${(j.start - firstStart) / 1e3}%7.2f " +
        f"dur=$dur%6.2fs gap=${gap / 1e3}%5.2fs  ${j.desc.take(70)}")
      for (sid <- j.stages.sorted; st <- stages.get(sid)) {
        val sdur = if (st.start >= 0 && st.end >= 0)
          (st.end - st.start) / 1e3 else -1.0
        println(f"  [stage] $sid%4d dur=$sdur%6.2fs tasks=${st.nTasks}%4d " +
          f"taskTime=${st.taskTimeMs / 1e3}%7.2fs in=${st.inputB / 1e6}%8.2fMB " +
          f"sr=${st.shufReadB / 1e6}%7.2fMB sw=${st.shufWriteB / 1e6}%7.2fMB " +
          f"spill=${st.spillB / 1e6}%6.1fMB  ${st.nameStr.take(45)}")
      }
    }
    val jobSum = sorted.map(j => (j.end - j.start) / 1e3).sum
    println(f"[profile] jobs wall sum=$jobSum%.3f s of $wall%.3f s " +
      f"(driver/gaps=${wall - jobSum}%.3f s)")
    spark.stop()
  }
}
