package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental postings maintenance pins (round-13 ADVICE item 2):
  * growing a persisted BM25 index with [[TextQueries.postingsAppend]]
  * must (a) never rewrite existing posting-list segment files — append
  * is append, not rebuild; (b) merge the df/stats side tables to
  * EXACTLY what a full rebuild computes; (c) keep the pushed
  * `In(term, …)` parquet filter intact over the mixed built+appended
  * layout; and (d) serve scores row-identical to a full rebuild. */
class Bm25AppendSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val half1 = Seq(
    0L -> "spark merge filter spark",
    2L -> "merge merge window",
    4L -> "filter scan spark",
    6L -> "window scan scan")
  private val half2 = Seq(
    1L -> "spark filter",
    3L -> "merge filter filter spark",
    5L -> "scan window merge",
    7L -> "spark spark spark")

  private def listFiles(path: String): Map[String, Long] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$path/lists")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> st.getLen).toMap
  }

  test("append adds segment files without touching the built ones, " +
      "and df/stats merge equals a full rebuild exactly") {
    val base = java.nio.file.Files
      .createTempDirectory("bm25append").toString
    val appended = s"$base/appended"
    val rebuilt = s"$base/rebuilt"
    TextQueries.buildPostings(spark, docsDf(half1), appended)
    val before = listFiles(appended)
    TextQueries.postingsAppend(spark, docsDf(half2), appended)
    val after = listFiles(appended)
    // no-rebuild: every pre-append file survives byte-for-byte in
    // name+length, and the append strictly added files
    for ((name, len) <- before)
      assert(after.get(name).contains(len),
        s"append rewrote existing segment file $name")
    assert(after.size > before.size, "append added no segment files")

    TextQueries.buildPostings(spark, docsDf(half1 ++ half2), rebuilt)
    def sortedRows(p: String, cols: String*) =
      spark.read.parquet(p).select(cols.map(col): _*)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(sortedRows(s"$appended/df", "term", "df") ===
      sortedRows(s"$rebuilt/df", "term", "df"))
    assert(sortedRows(s"$appended/stats", "n_docs", "avgdl", "sum_dl",
      "n_docs_l") ===
      sortedRows(s"$rebuilt/stats", "n_docs", "avgdl", "sum_dl",
        "n_docs_l"))
    // the posting ROWS (files differ, content must not): same multiset
    assert(sortedRows(s"$appended/lists", "term", "doc_id", "dl", "tf") ===
      sortedRows(s"$rebuilt/lists", "term", "doc_id", "dl", "tf"))
  }

  test("postingsAppendOnce: a crash-replayed batch id is a mechanical " +
      "no-op (append twice ≡ once), a new id still applies") {
    val base = java.nio.file.Files
      .createTempDirectory("bm25once").toString
    val once = s"$base/once"
    val rebuilt = s"$base/rebuilt"
    TextQueries.buildPostings(spark, docsDf(half1), once)
    TextQueries.postingsAppendOnce(spark, docsDf(half2), once,
      batchId = 5L)
    def snap(p: String) = {
      def sortedRows(dir: String, cols: String*) =
        spark.read.parquet(dir).select(cols.map(col): _*)
          .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
      (sortedRows(s"$p/lists", "term", "doc_id", "dl", "tf"),
        sortedRows(s"$p/df", "term", "df"),
        sortedRows(s"$p/stats", "n_docs", "avgdl", "sum_dl", "n_docs_l"))
    }
    val after = snap(once)
    // ≡ full rebuild over the grown corpus
    TextQueries.buildPostings(spark, docsDf(half1 ++ half2), rebuilt)
    assert(after === snap(rebuilt))
    // crash-replay: SAME batch id re-delivered — lists must not double,
    // df/stats must not double-merge
    TextQueries.postingsAppendOnce(spark, docsDf(half2), once,
      batchId = 5L)
    assert(snap(once) === after)
    // the published batch files carry the deterministic batch prefix
    assert(listFiles(once).keys.exists(_.startsWith("batch5_part")))
    // a NEW batch id still applies
    TextQueries.postingsAppendOnce(spark,
      docsDf(Seq(8L -> "spark window")), once, batchId = 6L)
    assert(snap(once)._1.size === after._1.size + 2)
    // and the Once-grown layout equals a rebuild over the final corpus
    val rebuilt2 = s"$base/rebuilt2"
    TextQueries.buildPostings(spark,
      docsDf(half1 ++ half2 :+ (8L -> "spark window")), rebuilt2)
    assert(snap(once) === snap(rebuilt2))
  }

  test("streaming ingest: micro-batches grow the postings exactly-once, " +
      "final layout ≡ full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("bm25stream").toString
    val idx = s"$base/idx"
    val rebuilt = s"$base/rebuilt"
    TextQueries.buildPostings(spark, docsDf(half1), idx)
    val source = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamRunner.postingsIngestStream(idx,
      source.toDF().toDF("doc_id", "text"))
    source.addData(half2.take(2): _*)
    q.processAllAvailable()
    source.addData(half2.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    TextQueries.buildPostings(spark, docsDf(half1 ++ half2), rebuilt)
    def sortedRows(p: String, cols: String*) =
      spark.read.parquet(p).select(cols.map(col): _*)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(sortedRows(s"$idx/lists", "term", "doc_id", "dl", "tf") ===
      sortedRows(s"$rebuilt/lists", "term", "doc_id", "dl", "tf"))
    assert(sortedRows(s"$idx/df", "term", "df") ===
      sortedRows(s"$rebuilt/df", "term", "df"))
    assert(sortedRows(s"$idx/stats", "n_docs", "avgdl", "sum_dl",
      "n_docs_l") === sortedRows(s"$rebuilt/stats", "n_docs", "avgdl",
      "sum_dl", "n_docs_l"))
    // crash-replay of the stream's batch 0: a mechanical no-op
    TextQueries.postingsAppendOnce(spark, docsDf(half2.take(2)), idx,
      batchId = 0L)
    assert(sortedRows(s"$idx/lists", "term", "doc_id", "dl", "tf") ===
      sortedRows(s"$rebuilt/lists", "term", "doc_id", "dl", "tf"))
  }

  test("compaction folds appended segments into nFiles sorted runs " +
      "without changing a single posting row") {
    val base = java.nio.file.Files
      .createTempDirectory("bm25compact").toString
    val path = s"$base/idx"
    TextQueries.buildPostings(spark, docsDf(half1), path)
    TextQueries.postingsAppend(spark, docsDf(half2), path)
    val before = listFiles(path)
    def sortedRows(p: String) =
      spark.read.parquet(p).select(col("term"), col("doc_id"), col("dl"),
        col("tf")).collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val rowsBefore = sortedRows(s"$path/lists")
    TextQueries.postingsCompact(spark, path, nFiles = 4)
    val after = listFiles(path)
    assert(after.size <= 4,
      s"compaction left ${after.size} segment files")
    assert(after.size < before.size, "compaction did not fold segments")
    assert(sortedRows(s"$path/lists") === rowsBefore)
    // the compacted layout still serves the pushed-filter plan
    val plan = spark.read.parquet(s"$path/lists")
      .where(col("term").isin("spark", "merge"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      plan)
    // and each compacted file is term-sorted (min/max prunable): read
    // per-file and check local ordering
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$path/lists")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (st <- fs.listStatus(p)
        if st.getPath.getName.endsWith(".parquet")) {
      val terms = spark.read.parquet(st.getPath.toString)
        .select("term").collect().map(_.getString(0)).toSeq
      assert(terms === terms.sorted,
        s"file ${st.getPath.getName} not term-sorted after compaction")
    }
  }

  test("term restriction stays a pushed parquet filter on the " +
      "built+appended layout") {
    val path = TextQueries.savedPostingsAppendPath(spark,
      "/root/testdata/sf0.001")
    val plan = spark.read.parquet(s"$path/lists")
      .where(col("term").isin("spark", "merge", "filter"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      plan)
  }

  test("served BM25 over the appended index equals bm25_serve and " +
      "bm25_search row for row") {
    val sf = "/root/testdata/sf0.001"
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sf)
        .collect()
        .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_terms"), r.getAs[Double]("score")))
        .sortBy(_._1).toSeq
    assert(rows("bm25_serve_append") === rows("bm25_search"))
    assert(rows("bm25_serve_append") === rows("bm25_serve"))
  }
}
