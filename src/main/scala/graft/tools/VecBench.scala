package graft.tools

import graft.Tables
import graft.functions.VecMath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Micro-benchmark: native fused VecDot/VecNormSq expressions vs the
  * aggregate(zip_with/transform) HOF compositions they replaced, over
  * all embeddings (repeated). The HOF form materializes the per-row
  * product array; the native form is one loop — same values
  * (VecMathSpec pins bit-equality). */
object VecBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = 20
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // replicate ×100 (→ ~500k vectors at sf0.1): at the native table
    // size per-job fixed overhead hides the per-row cost being measured
    val e = Tables.embeddings(spark, sfDir)
      .crossJoin(broadcast(spark.range(100).select(col("id").as("rep"))))
      .cache()
    e.count()
    val probe = e.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), _.cast(DoubleType)))
      .head().getSeq[Double](0).toSeq
    val litProbe = array(probe.map(lit): _*)
    def hofDot = aggregate(
      zip_with(col("embedding"), litProbe,
        (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    def hofNsq = aggregate(
      transform(col("embedding"),
        x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"[vec-bench] $label: ${(System.nanoTime() - t0) / 1e9 / reps}%.4f s/run")
    }
    time("native-fused-dot+norm") {
      e.select((VecMath.vecDot(col("embedding"), litProbe) /
        sqrt(VecMath.vecNormSq(col("embedding")))).as("s"))
        .agg(sum(col("s"))).collect()
    }
    time("hof-zip_with-dot+norm") {
      e.select((hofDot / sqrt(hofNsq)).as("s"))
        .agg(sum(col("s"))).collect()
    }
    spark.stop()
  }
}
