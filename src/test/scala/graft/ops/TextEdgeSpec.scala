package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Edge cases for the text operators over degenerate documents the
  * synthetic corpus never produces (1-token and empty texts). */
class TextEdgeSpec extends SparkTestBase {

  private def docsOf(texts: (Long, String, String)*) = {
    import spark.implicits._
    texts.toSeq.toDF("doc_id", "lang", "text")
  }

  test("bigram shingling survives 1-token and empty documents") {
    docsOf((1L, "en", "solo"), (2L, "en", ""), (3L, "en", "two tokens here"))
      .createOrReplaceTempView("edge_docs")
    // run the same expression the query uses, against the edge frame
    val out = spark.table("edge_docs")
      .select(col("doc_id"),
        explode(TextQueries.bigramShingles(col("text"))).as("bigram"))
      .collect()
    // only doc 3 emits shingles: 2 bigrams
    assert(out.map(_.getLong(0)).toSet === Set(3L))
    assert(out.length === 2)
  }

  test("minhash fast signatures handle single-token docs") {
    val sigs = DedupQueries.minhashSignaturesFast(
      docsOf((1L, "en", "solo"), (2L, "en", "a b")))
      .collect()
    assert(sigs.length === 2)
    assert(sigs.forall(!_.isNullAt(1)))
  }
}
