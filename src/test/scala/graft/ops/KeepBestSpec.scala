package graft.ops

import graft.SparkTestBase

/** Pins for canonical-representative selection (`dedup_keep_best`):
  * the keeper must live in its own cluster, carry the cluster's max
  * quality key (n_chars, doc_id tie-break), appear exactly once per
  * cluster, and singleton docs must keep themselves. The hash gate
  * already proves equality with the recursive-SQL closure; these pins
  * make the selection CONTRACT mechanical against future edits. */
class KeepBestSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows =
    graft.SparkEntry.queries("dedup_keep_best")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("keeper"), r.getAs[Boolean]("is_keeper")))
      .toSeq

  private lazy val nChars =
    graft.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") < 100)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("every doc in the <100 scope is assigned, keepers are in-cluster") {
    assert(rows.map(_._1).sorted === (0L until 100L))
    val byCluster = rows.groupBy(_._2)
    rows.foreach { case (_, cluster, keeper, _) =>
      assert(byCluster(cluster).exists(_._1 == keeper),
        s"keeper $keeper not a member of cluster $cluster")
    }
  }

  test("the keeper is the cluster's (n_chars desc, doc_id) argmax") {
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      val expected = members.map(_._1)
        .sortBy(id => (-nChars(id), id)).head
      members.foreach { case (_, _, keeper, _) =>
        assert(keeper === expected,
          s"cluster $cluster keeper $keeper, expected $expected")
      }
    }
  }

  test("exactly one is_keeper per cluster; singletons keep themselves") {
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cluster, members) =>
      assert(members.count(_._4) === 1,
        s"cluster $cluster has ${members.count(_._4)} keepers")
      if (members.size == 1)
        assert(members.head._3 === members.head._1)
    }
    // the scope genuinely contains non-trivial clusters — otherwise the
    // argmax pin above is vacuous
    assert(byCluster.exists(_._2.size > 1))
  }
}
