package graft

/** Every registered query must run and return rows on sf0.001 — catches
  * empty-result and analysis regressions before the driver's oracle gate.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle (sketches get a tolerance oracle)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = SparkEntry.queries(name)(spark, sf0001)
      assert(df.count() > 0)
    }
  }
}
