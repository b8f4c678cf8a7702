package graft

/** Driver-contract invariants: the keys the driver zips must line up. */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("entry() returns rows (driver smoke test shape)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL contains no tab/CR characters (Verify JSON escaping)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("\t") && !sql.contains("\r"), s"$k has tab/CR")
    }
  }

  test("every query orders its output (rule D1 spot check)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY"), s"$k lacks ORDER BY")
    }
  }
}
