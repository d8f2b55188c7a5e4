package graft.ops

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins for query-time filtered ANN search (`Ann.query`'s
  * `candidateFilter` / the `sim_filtered` registry entry):
  *
  *  - EXACTNESS under full probing: with nProbe = k the filtered search
  *    must equal the filtered brute-force ranking exactly (the same
  *    discipline AnnSkewSpec pins for the unfiltered path) — proving
  *    the filter composes with cell pruning without losing candidates;
  *  - CANDIDATE-set semantics: every returned id satisfies the
  *    predicate, and k results come back even when the unfiltered
  *    top-k contains almost no matching ids — the case post-filtering
  *    the unfiltered results would get wrong.
  */
class AnnFilteredSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"
  private lazy val index = Ann.build(Tables.embeddings(spark, sf), k = 8)

  private def cosineTo0(fil: org.apache.spark.sql.Column) = {
    val e = Tables.embeddings(spark, sf)
    val probe = e.filter(col("vec_id") === 0)
      .select(transform(col("embedding"), _.cast("double")))
      .head().getSeq[Double](0).toSeq
    val pnorm = math.sqrt(probe.map(x => x * x).sum)
    val litProbe = array(probe.map(lit): _*)
    e.filter(col("vec_id") =!= 0).filter(fil)
      .select(col("vec_id"),
        (aggregate(zip_with(col("embedding"), litProbe,
          (a, b) => a.cast("double") * b), lit(0.0), _ + _) /
          (sqrt(aggregate(transform(col("embedding"),
            x => x.cast("double") * x.cast("double")), lit(0.0), _ + _))
            * lit(pnorm))).as("sim"))
  }

  test("full-probe filtered search equals filtered brute force") {
    val pred = pmod(col("vec_id"), lit(3)) === 0
    val filtered = Ann.query(index, probeId = 0, topK = 10, nProbe = 8,
        candidateFilter = Some(pred))
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    val brute = cosineTo0(pred)
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(filtered === brute)
  }

  test("selective filters still return k matching results") {
    // a 1-in-50 predicate: the unfiltered top-10 almost surely contains
    // none of these ids, so post-filtering results would return ~0 rows
    val pred = pmod(col("vec_id"), lit(50)) === 7
    val out = Ann.query(index, probeId = 0, topK = 10, nProbe = 8,
        candidateFilter = Some(pred))
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(out.size === 10)
    out.foreach(id => assert(id % 50 === 7, s"non-matching id $id"))
  }
}
