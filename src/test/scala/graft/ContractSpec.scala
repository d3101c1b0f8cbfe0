package graft

/** Driver-contract invariants: every oracle has a query, every query
  * runs at the smoke scale factor, the flagship entry returns rows.
  */
class ContractSpec extends SparkSuite {

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is oracle-checked (no rows-only queries)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without an oracle: $rowsOnly")
  }

  test("entry() (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs non-empty on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, "/root/testdata/sf0.001").count()
        if (n == 0 && !Set("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
                            "dedup_embedding").contains(name))
          Some(s"$name: 0 rows")
        else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
