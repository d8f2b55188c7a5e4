package graft.tools

import graft.Tables
import graft.functions.SimHash64
import graft.ops.DedupQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: native one-pass SimHash64 expression vs the
  * 64-aggregate built-in composition, over all documents (repeated). */
object SimHashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = 20
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val toks = array_distinct(split(col("text"), " "))
    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"[simhash-bench] $label: ${(System.nanoTime() - t0) / 1e9 / reps}%.4f s/run")
    }
    time("native-one-pass") {
      docs.select(SimHash64.simhash64(toks).as("h"))
        .agg(sum(bit_count(col("h")))).collect()
    }
    time("hof-64-aggregates") {
      docs.select(DedupQueries.simhash(toks).as("h"))
        .agg(sum(bit_count(col("h")))).collect()
    }
    spark.stop()
  }
}
