package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity probe: replicates the sf0.1 FACT tables R× with
  * key-shifting and times headline queries at each scale. The point is to
  * catch super-linear operators (accidental cross products, candidate
  * blowups, driver collects) before they'd melt a real cluster — a query
  * whose time grows ~R× here has the partition-parallel shape that holds
  * at 100 TB; one that grows ~R²× does not.
  *
  * Replication model = how warehouses actually grow: facts (lineitem,
  * orders, events, documents, embeddings) multiply; dimensions (customer,
  * supplier, part, nation, region) stay fixed. Fact-fact join keys
  * (l_orderkey/o_orderkey) shift together per replica so join fan-out
  * stays 1:1 across replicas; fact-dim fan-out grows R× by design.
  *
  * Usage: runMain graft.tools.ScaleSweep [maxReplicas] [query ...]
  */
object ScaleSweep {

  private val KeyShift = 100000000L

  private def replicate(df: DataFrame, r: Int, shiftCols: Seq[String]): DataFrame =
    if (r <= 1) df
    else {
      val replicas = df.sparkSession.range(r)
        .select(col("id").as("replica_i"))
      val rep = df.crossJoin(broadcast(replicas))
      shiftCols.foldLeft(rep) { (d, c) =>
        d.withColumn(c, col(c) + col("replica_i") * KeyShift)
      }.drop("replica_i")
    }

  def main(args: Array[String]): Unit = {
    val maxR = args.headOption.map(_.toInt).getOrElse(10)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing", "filter_pred", "agg_group", "join_star",
        "topk_group", "win_latest", "dedup_exact", "text_bigrams",
        "dedup_minhash_lsh", "dedup_embed", "sim_topk", "stream_session",
        "join_asof", "subquery_corr", "agg_pivot", "dedup_minhash_verify",
        "split_hash", "line_dedup", "corpus_clean", "fuzzy_match",
        "funnel", "dedup_embed_cluster")
    val spark = graft.GraftSession.local(4, "graft-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    val src = "/root/testdata/sf0.1"
    val factShifts: Map[String, Seq[String]] = Map(
      "lineitem" -> Seq("l_orderkey"),
      "orders" -> Seq("o_orderkey"),
      "events" -> Seq("event_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    val dims = Seq("customer", "supplier", "part", "nation", "region")

    // warm-up: exercise scan + shuffle + codegen machinery once so the
    // first timed query isn't charged for JVM/Janino startup
    spark.read.parquet(s"$src/region.parquet")
      .groupBy("r_name").count().collect()

    val scales = Seq(1, 4, maxR).distinct.filter(_ <= maxR)
    for (r <- scales) {
      val dir = s"/tmp/graft_scale/r$r"
      val done = new java.io.File(s"$dir/_SWEEP_DONE")
      if (!done.exists()) {
        for ((t, shifts) <- factShifts) {
          val df = spark.read.parquet(s"$src/$t.parquet")
          replicate(df, r, shifts)
            .write.mode("overwrite").parquet(s"$dir/$t.parquet")
        }
        for (t <- dims) {
          spark.read.parquet(s"$src/$t.parquet")
            .write.mode("overwrite").parquet(s"$dir/$t.parquet")
        }
        done.createNewFile()
      }
      for (n <- names) {
        val t0 = System.nanoTime()
        val rows = try SparkEntry.queries(n)(spark, dir).count()
        catch { case e: Throwable => println(s"[sweep] $n r=$r FAILED: ${e.getMessage.take(120)}"); -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[sweep] $n%-18s r=$r%-3d rows=$rows%-9d ${sec}%.2f s")
      }
    }
    spark.stop()
  }
}
