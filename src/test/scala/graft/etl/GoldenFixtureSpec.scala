package graft.etl

import graft.SparkSpec

/** Parity against the reference repo's OWN golden input parquet
  * (tests/test_data/test_logs/ — 4 rows written by its fixture
  * generator). Skipped when the reference checkout isn't present. */
class GoldenFixtureSpec extends SparkSpec {

  private val fixturePath = "/root/reference/tests/test_data/test_logs"

  test("preJoin over the reference's golden parquet matches the in-memory fixture") {
    assume(new java.io.File(fixturePath).exists(), "reference fixture not present")
    val fromFile = Pipeline.preJoin(
      spark.read.schema(Schemas.logEvent).parquet(fixturePath), Fixtures.types)
    val fromMemory = Pipeline.preJoin(Fixtures.goldenLogs, Fixtures.types)
    assert(rowSet(fromFile) == rowSet(fromMemory))
    assert(fromFile.count() == 5) // 4 rows, one explodes into 2 products
  }
}
