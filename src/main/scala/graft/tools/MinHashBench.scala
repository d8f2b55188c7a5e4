package graft.tools

import graft.Tables
import graft.functions.MinHash64
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: native one-pass MinHash64 expression (k minima, one
  * traversal) vs the k-fold `array_min(transform(xxhash64))` built-in
  * composition, over all documents (repeated). */
object MinHashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
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
      println(f"[minhash-bench] $label: ${(System.nanoTime() - t0) / 1e9 / reps}%.4f s/run")
    }
    time("native-one-pass") {
      docs.select(MinHash64.minhash64(toks, k).as("sig"))
        .agg(max(element_at(col("sig"), 1))).collect()
    }
    time("hof-k-folds") {
      val composed = array((0 until k).map(i =>
        array_min(transform(toks, t => xxhash64(lit(i.toLong), t)))): _*)
      docs.select(composed.as("sig"))
        .agg(max(element_at(col("sig"), 1))).collect()
    }
    spark.stop()
  }
}
