package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration: cosine_similarity callable from spark.sql. */
class GraftExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("cosine_similarity registered and usable in SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                         array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
        |""".stripMargin).collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("portable_hash60 registered and matches the DuckDB golden value") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT portable_hash60('hello') AS h").collect().head.getLong(0)
    assert(r == 419982666956583591L) // ('0x'||substring(md5('hello'),1,15))::BIGINT in DuckDB
  }
}
