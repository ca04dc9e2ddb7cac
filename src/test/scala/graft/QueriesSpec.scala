package graft

/** Smoke every registered query at sf0.001: runs, has the declared
  * shape, and (where the operator guarantees it) returns rows. Value
  * correctness is the DuckDB oracle gate's job (tools/selfcheck.py). */
class QueriesSpec extends SparkSuite {

  // operators whose correct result CAN be empty at tiny scale
  private val mayBeEmpty = Set("q_except", "q_anti_join", "q_filter_null_like",
    "q_intersect", "q_union", "q_group_count_one")

  SparkEntry.defs.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df = q.fn(spark, Sf0001)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("query names are unique and every oracle key has a query") {
    val names = SparkEntry.defs.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
