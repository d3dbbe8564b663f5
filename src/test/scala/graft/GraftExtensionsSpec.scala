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

  test("kernel + aggregate functions registered: minhash_sig, simhash64, lsh_buckets, topk_by_score") {
    GraftExtensions.register(spark)
    // each SQL call must equal its DSL twin on the same input
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT minhash_sig(array(7L, 9L), 4) AS m, simhash64(array(7L, 9L)) AS s").collect().head
    val viaDsl = spark.range(1)
      .select(pipeline.Dedup.minhashSignaturePortable(typedlit(Seq(7L, 9L)), 4).as("m"),
        pipeline.Dedup.simhash(typedlit(Seq(7L, 9L))).as("s")).collect().head
    assert(viaSql.getSeq[Long](0) == viaDsl.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaDsl.getLong(1))

    val emb = "array(" + (1 to 64).map(i => s"CAST(${i % 5 - 2} AS FLOAT)").mkString(",") + ")"
    val bSql = spark.sql(s"SELECT lsh_buckets($emb, 4, 4, 64) AS b").collect().head.getSeq[Long](0)
    val bDsl = spark.range(1).select(pipeline.Similarity.lshBandBuckets(
        typedlit((1 to 64).map(i => (i % 5 - 2).toFloat)), 4, 4, 64).as("b"))
      .collect().head.getSeq[Long](0)
    assert(bSql == bDsl)

    spark.range(10).selectExpr("id % 2 AS g", "id", "CAST(id AS DOUBLE) AS sc")
      .createOrReplaceTempView("tk_in")
    val top = spark.sql(
      """SELECT g, topk_by_score(struct(sc, id), 2) AS tk FROM tk_in GROUP BY g""")
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    assert(top(0L) == Seq((8.0, 8L), (6.0, 6L)))
    assert(top(1L) == Seq((9.0, 9L), (7.0, 7L)))
  }
}
