package graft

/** Contract invariants for the driver registry. */
class RegistrySpec extends SparkTestBase {

  test("query names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key has a matching query") {
    val q = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(q))
  }

  test("oracle SQL is single-statement and non-empty") {
    for ((k, sql) <- SparkEntry.oracleSql) {
      assert(sql.trim.nonEmpty, s"$k empty oracle")
      assert(!sql.trim.stripSuffix(";").contains(";"), s"$k multi-statement")
    }
  }

  test("entry() smoke: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("representative queries return rows on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val picks = Seq("q1_pricing", "join_star", "win_latest", "stream_session",
      "text_tokens", "sim_topk", "dedup_jaccard")
    for (name <- picks) {
      val n = SparkEntry.queries(name)(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("EVERY registry query plans and executes at sf0.001") {
    // zero rows is legitimate (anti joins, except); errors are not —
    // this catches analysis/runtime breaks in entries no other spec
    // exercises, before the driver's verify pass would
    val sf = "/root/testdata/sf0.001"
    val failures = SparkEntry.registry.flatMap { q =>
      try { q.fn(spark, sf).count(); None }
      catch { case e: Throwable =>
        Some(s"${q.name}: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
