package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DELETE-lifecycle pins for the persisted BM25 index: tombstoning a
  * batch of docs must (a) never touch the posting-list segment files at
  * delete time; (b) adjust the df/stats side tables to EXACTLY what a
  * full rebuild over the survivors computes; (c) serve scores
  * row-identical to that rebuild through the tombstone anti-join, with
  * the pushed `In(term, …)` scan filter intact; (d) be idempotent under
  * re-delivered and unknown-id batches; and (e) compact to a layout
  * whose posting rows ARE the rebuild's, with the tombstone segment
  * gone. */
class Bm25DeleteSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = Seq(
    0L -> "spark merge filter spark",
    1L -> "spark filter",
    2L -> "merge merge window",
    3L -> "merge filter filter spark",
    4L -> "filter scan spark",
    5L -> "scan window merge",
    6L -> "window scan scan",
    7L -> "spark spark spark")
  private val doomed = Set(2L, 5L)
  private val survivors = corpus.filterNot(r => doomed(r._1))

  private def idsDf(ids: Set[Long]) = {
    import spark.implicits._
    ids.toSeq.toDF("doc_id")
  }

  private def sortedRows(p: String, cols: String*) =
    spark.read.parquet(p).select(cols.map(col): _*)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  private def listFiles(path: String): Map[String, Long] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$path/lists")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> st.getLen).toMap
  }

  test("delete leaves lists untouched, side tables equal a rebuild, " +
      "and served scores match rebuild-over-survivors") {
    val base = java.nio.file.Files
      .createTempDirectory("bm25delete").toString
    val deleted = s"$base/deleted"
    val rebuilt = s"$base/rebuilt"
    TextQueries.buildPostings(spark, docsDf(corpus), deleted)
    val before = listFiles(deleted)
    TextQueries.postingsDelete(spark, idsDf(doomed), deleted)
    // (a) the corpus-scale segment files are untouched at delete time
    assert(listFiles(deleted) === before)
    TextQueries.buildPostings(spark, docsDf(survivors), rebuilt)
    // (b) side tables are EXACTLY the rebuild's
    assert(sortedRows(s"$deleted/df", "term", "df") ===
      sortedRows(s"$rebuilt/df", "term", "df"))
    assert(sortedRows(s"$deleted/stats", "n_docs", "avgdl", "sum_dl",
      "n_docs_l") ===
      sortedRows(s"$rebuilt/stats", "n_docs", "avgdl", "sum_dl",
        "n_docs_l"))
    // (c) the served posting rows — tombstones anti-joined — are the
    // rebuild's rows, for every term
    val allTerms = corpus.flatMap(_._2.split(" ")).distinct
    val servedRows = TextQueries.servedLists(spark, deleted, allTerms)
      .select("term", "doc_id", "dl", "tf")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(servedRows ===
      sortedRows(s"$rebuilt/lists", "term", "doc_id", "dl", "tf"))
    // and the scan under the anti-join still pushes the term filter
    val plan = TextQueries.servedLists(spark, deleted, Seq("spark", "merge"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"), plan)
  }

  test("re-delivered and unknown-id delete batches are no-ops") {
    val base = java.nio.file.Files
      .createTempDirectory("bm25delete2").toString
    val path = s"$base/idx"
    TextQueries.buildPostings(spark, docsDf(corpus), path)
    TextQueries.postingsDelete(spark, idsDf(doomed), path)
    val df1 = sortedRows(s"$path/df", "term", "df")
    val st1 = sortedRows(s"$path/stats", "sum_dl", "n_docs_l")
    val tomb1 = sortedRows(s"$path/tombstones", "doc_id")
    // re-deliver the same batch: the already-tombstoned ids are
    // excluded up front, so nothing moves — the subtraction can never
    // double-fire
    TextQueries.postingsDelete(spark, idsDf(doomed), path)
    assert(sortedRows(s"$path/df", "term", "df") === df1)
    assert(sortedRows(s"$path/stats", "sum_dl", "n_docs_l") === st1)
    assert(sortedRows(s"$path/tombstones", "doc_id") === tomb1)
    // unknown ids match nothing: complete no-op (no tombstone growth)
    TextQueries.postingsDelete(spark, idsDf(Set(999L, 1000L)), path)
    assert(sortedRows(s"$path/df", "term", "df") === df1)
    assert(sortedRows(s"$path/tombstones", "doc_id") === tomb1)
  }

  test("compaction drops tombstoned rows physically and clears the " +
      "segment — the layout becomes the rebuild's") {
    val base = java.nio.file.Files
      .createTempDirectory("bm25delete3").toString
    val path = s"$base/idx"
    val rebuilt = s"$base/rebuilt"
    TextQueries.buildPostings(spark, docsDf(corpus), path)
    TextQueries.postingsDelete(spark, idsDf(doomed), path)
    TextQueries.postingsCompact(spark, path, nFiles = 4)
    TextQueries.buildPostings(spark, docsDf(survivors), rebuilt)
    assert(sortedRows(s"$path/lists", "term", "doc_id", "dl", "tf") ===
      sortedRows(s"$rebuilt/lists", "term", "doc_id", "dl", "tf"))
    assert(!Layout.dirExists(spark, s"$path/tombstones"))
    // serving after compact needs no anti-join and still matches
    val allTerms = corpus.flatMap(_._2.split(" ")).distinct
    assert(TextQueries.servedLists(spark, path, allTerms)
      .select("term", "doc_id", "dl", "tf")
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq ===
      sortedRows(s"$rebuilt/lists", "term", "doc_id", "dl", "tf"))
  }

  test("append refuses a batch that re-adds a tombstoned doc id") {
    val base = java.nio.file.Files
      .createTempDirectory("bm25readd").toString
    val path = s"$base/idx"
    TextQueries.buildPostings(spark, docsDf(corpus), path)
    TextQueries.postingsDelete(spark, idsDf(Set(2L)), path)
    val e = intercept[IllegalArgumentException] {
      TextQueries.postingsAppend(spark,
        docsDf(Seq(2L -> "corrected text", 100L -> "fresh doc")), path)
    }
    assert(e.getMessage.contains("tombstoned"))
    // after compaction the re-add is legal and lands normally
    TextQueries.postingsCompact(spark, path)
    TextQueries.postingsAppend(spark,
      docsDf(Seq(2L -> "corrected text", 100L -> "fresh doc")), path)
    val served = TextQueries.servedLists(spark, path, Seq("corrected"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(served === Set(2L))
  }

  test("compaction heals side-table drift from a crash between the " +
      "tombstone commit and the df/stats swaps") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("bm25heal").toString
    val path = s"$base/idx"
    val rebuilt = s"$base/rebuilt"
    TextQueries.buildPostings(spark, docsDf(corpus), path)
    // simulate the crash window: the tombstones landed but the
    // algebraic df/stats subtraction never ran (stale statistics, and
    // a re-delivered delete of these ids is deliberately a no-op)
    doomed.toSeq.toDF("doc_id").coalesce(1)
      .write.mode("append").parquet(s"$path/tombstones")
    TextQueries.postingsDelete(spark, idsDf(doomed), path) // replay no-op
    assert(sortedRows(s"$path/stats", "n_docs_l").head.head ===
      corpus.size.toLong) // still stale — replay healed nothing
    // compaction recomputes from the surviving lists as ground truth
    TextQueries.postingsCompact(spark, path)
    TextQueries.buildPostings(spark, docsDf(survivors), rebuilt)
    assert(sortedRows(s"$path/df", "term", "df") ===
      sortedRows(s"$rebuilt/df", "term", "df"))
    assert(sortedRows(s"$path/stats", "n_docs", "avgdl", "sum_dl",
      "n_docs_l") ===
      sortedRows(s"$rebuilt/stats", "n_docs", "avgdl", "sum_dl",
        "n_docs_l"))
    assert(sortedRows(s"$path/lists", "term", "doc_id", "dl", "tf") ===
      sortedRows(s"$rebuilt/lists", "term", "doc_id", "dl", "tf"))
  }

  test("deleting every doc leaves a servable empty index: no posting " +
      "survives the anti-join, df is empty, stats read zero") {
    val base = java.nio.file.Files
      .createTempDirectory("bm25deleteall").toString
    val path = s"$base/idx"
    TextQueries.buildPostings(spark, docsDf(corpus), path)
    TextQueries.postingsDelete(spark, idsDf(corpus.map(_._1).toSet), path)
    val allTerms = corpus.flatMap(_._2.split(" ")).distinct
    assert(TextQueries.servedLists(spark, path, allTerms).count() === 0L)
    assert(spark.read.parquet(s"$path/df").count() === 0L)
    val st = spark.read.parquet(s"$path/stats")
      .select("n_docs_l", "sum_dl").head()
    assert(st.getLong(0) === 0L && st.getLong(1) === 0L)
    // serving the empty index is well-formed: zero rows, right schema
    val served = TextQueries.bm25TopK(
      TextQueries.servedLists(spark, path, Seq("spark")),
      spark.read.parquet(s"$path/df"),
      spark.read.parquet(s"$path/stats"))
    assert(served.columns.toSeq ===
      Seq("rnk", "doc_id", "n_terms", "score"))
    assert(served.count() === 0L)
    // and compaction of the fully-deleted layout is clean
    TextQueries.postingsCompact(spark, path)
    assert(spark.read.parquet(s"$path/lists").count() === 0L)
    assert(!Layout.dirExists(spark, s"$path/tombstones"))
  }

  test("served top-k over the tombstoned sf0.001 layout matches a " +
      "rebuild over the survivors") {
    val d = "/root/testdata/sf0.001"
    val path = TextQueries.savedPostingsDeletePath(spark, d)
    val rebuilt = s"${graft.GraftSession.scratchDir}/bm25_del_rebuild"
    TextQueries.buildPostings(spark,
      graft.Tables.documents(spark, d)
        .where(pmod(col("doc_id"), lit(7)) =!= 3), rebuilt)
    def serve(p: String) = {
      val lists = TextQueries.servedLists(spark, p,
        TextQueries.bm25Terms)
      val dfs = spark.read.parquet(s"$p/df")
        .where(col("term").isin(TextQueries.bm25Terms: _*))
      val stats = spark.read.parquet(s"$p/stats")
      TextQueries.bm25TopK(lists, dfs, stats)
        .collect().map(_.toSeq).toSeq
    }
    assert(serve(path) === serve(rebuilt))
  }
}
