package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Scratch A/B probe (r21): cost of a final global `orderBy` (range
  * exchange: sampling job + shuffle + sort) versus a single-partition
  * sort (`coalesce(1).sortWithinPartitions`) on a BOUNDED final result
  * — the §2.4 "orderBy used only to make output deterministic" case.
  * Times both shapes of the same bounded aggregate through the noop
  * sink. Not a registry entry; throwaway measurement aid.
  */
object SortShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-sortshape")
    spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().collect()

    def agg() = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("double")).as("qty"))

    def time(tag: String)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sortshape] $tag%-12s min=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f")
    }
    // warm both shapes once so codegen is out of the min
    time("orderBy")(() => agg().orderBy("l_returnflag", "l_linestatus"))
    time("coalesce1")(() => agg().coalesce(1)
      .sortWithinPartitions("l_returnflag", "l_linestatus"))
    time("orderBy2")(() => agg().orderBy("l_returnflag", "l_linestatus"))
    time("coalesce1b")(() => agg().coalesce(1)
      .sortWithinPartitions("l_returnflag", "l_linestatus"))
    spark.stop()
  }
}
