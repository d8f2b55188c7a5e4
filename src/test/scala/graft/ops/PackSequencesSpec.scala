package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of training-sequence packing that the row-level
  * oracle can't express: every packed sequence fits the budget unless a
  * single document alone overflows it, sequences are contiguous per
  * language, and the assignment is invariant under input partitioning
  * (the determinism contract that makes re-runs reproducible). */
class PackSequencesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("sequences respect the 512-token budget up to one-doc overflow") {
    val packed = TextQueries.packSequences.fn(spark, sf)
    val seqs = packed.groupBy("lang", "seq_id")
      .agg(sum("n_tok").as("seq_tok"), count(lit(1)).as("n_docs"),
        max("n_tok").as("max_doc"))
      .collect()
    assert(seqs.nonEmpty)
    for (r <- seqs) {
      val tok = r.getLong(2); val nDocs = r.getLong(3)
      // exclusive-cumsum binning: a sequence only exceeds the budget by
      // at most its last document's tokens (the doc that crossed the
      // boundary); with single-doc sequences any size is permitted
      assert(tok < 512 + r.getLong(4) || nDocs == 1,
        s"sequence over budget: $r")
    }
    // contiguity: per language, seq_ids are 0..max with no holes
    val byLang = seqs.groupBy(_.getString(0))
    for ((lang, rs) <- byLang) {
      val ids = rs.map(_.getLong(1)).sorted.toSeq
      assert(ids.headOption.contains(0L) &&
        ids.sameElements(0L until ids.length.toLong),
        s"$lang has non-contiguous seq_ids: $ids")
    }
  }

  test("assignment is invariant under input repartitioning and order") {
    val docs = Tables.documents(spark, sf)
    val base = TextQueries.packSequencesOf(docs).collect().toSeq
    val shuffled = TextQueries.packSequencesOf(
      docs.repartition(7, col("source"))
        .sortWithinPartitions(col("n_chars"))).collect().toSeq
    assert(base.nonEmpty && base == shuffled)
  }
}
