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
}
