package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Registry-wide mechanical plan audit: build EVERY registry query's
  * physical plan and flag the scale-killers a per-query eyeball audit
  * can miss once the registry is large. NOT free: entry BUILDERS run
  * — the per-process memoized index builds, delete/retrain layouts,
  * and bounded driver steps (`head()`/`collect()`) all execute while
  * the frame is constructed, so a lint pass costs roughly one cold
  * battery's build phase; run it at sf0.001 (the default), not at a
  * bench scale. Only the FINAL query job is never submitted. Flags:
  *
  *  - [[CartesianProductExec]] — an unbounded cross join is never
  *    acceptable in this registry (the bounded 1-row crosses compile
  *    to broadcast NL joins instead), so ANY occurrence fails the
  *    lint;
  *  - [[BroadcastNestedLoopJoinExec]] — legitimate ONLY for the
  *    1-row corpus-stats / bounded-literal-dim patterns, so every
  *    occurrence is INVENTORIED: a new unbounded one shows up as a
  *    diff against the recorded count, not silently;
  *  - global [[WindowExec]] (empty partitionSpec — the
  *    "Moving all data to a single partition" shape) — legitimate
  *    only over by-construction-bounded frames (topK lists, gate
  *    booleans, ≤batch fusion unions), inventoried for the same
  *    reason.
  *
  * Usage: runMain graft.tools.PlanLint [sfDir]
  * Exit 1 on any cartesian product or planning failure.
  */
object PlanLint {

  private def tree(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus, "graft-plan-lint")
    spark.sparkContext.setLogLevel("ERROR")
    var cartesian = List.empty[String]
    var bnlj = List.empty[String]
    var globalWin = List.empty[String]
    var failed = List.empty[(String, String)]
    for (q <- SparkEntry.registry) {
      try {
        val plan = tree(q.fn(spark, sfDir).queryExecution.executedPlan)
        if (plan.collect { case c: CartesianProductExec => c }.nonEmpty)
          cartesian ::= q.name
        if (plan.collect { case j: BroadcastNestedLoopJoinExec => j }
            .nonEmpty)
          bnlj ::= q.name
        if (plan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => w }.nonEmpty)
          globalWin ::= q.name
      } catch {
        case e: Throwable =>
          failed ::= (q.name, Option(e.getMessage).getOrElse("?").take(160))
      }
    }
    println(s"[lint] queries=${SparkEntry.registry.size} " +
      s"planned=${SparkEntry.registry.size - failed.size} " +
      s"cartesian=${cartesian.size} bnlj=${bnlj.size} " +
      s"globalWindow=${globalWin.size}")
    if (cartesian.nonEmpty)
      println(s"[lint] CARTESIAN (FAIL): ${cartesian.sorted.mkString(", ")}")
    println(s"[lint] bnlj inventory (${bnlj.size}): " +
      bnlj.sorted.mkString(", "))
    println(s"[lint] global-window inventory (${globalWin.size}): " +
      globalWin.sorted.mkString(", "))
    for ((n, m) <- failed) println(s"[lint] PLAN-FAIL $n: $m")
    spark.stop()
    if (cartesian.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
