package graft.lara

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Operator-level semantics of the Lara DSL, mirroring the reference's
  * construction-time validation (`api/TupleOp.kt` requires) and the
  * union/join value rules (`api/TupleOp.kt:374-400,465-516,611-658`).
  */
class LaraTableSpec extends AnyFunSuite {
  import TestSpark._

  private def table(rows: Seq[Row], keys: Seq[String], vals: Seq[ValSpec],
                    types: Seq[(String, DataType)]): LaraTable = {
    val st = types.foldLeft(new StructType()) { case (acc, (n, t)) => acc.add(n, t) }
    LaraTable(df(st, rows), LaraSchema(keys, vals))
  }

  private val kv = Seq("k" -> (StringType: DataType), "v" -> (IntegerType: DataType))

  test("union: common key prefix, identity padding, dropped keys aggregated") {
    // A keyed [k, j], B keyed [k] — result keyed [k]; A's j is aggregated
    // away by ⊕; A lacks w → padded with w's identity.
    val a = table(Seq(Row("x", 1, 1), Row("x", 2, 2), Row("y", 1, 5)),
      Seq("k", "j"), Seq(ValSpec("v", IntegerType, 0)),
      Seq("k" -> StringType, "j" -> IntegerType, "v" -> IntegerType))
    val b = LaraTable(
      df(new StructType().add("k", StringType).add("w", IntegerType),
        Seq(Row("x", 10), Row("z", 20))),
      LaraSchema(Seq("k"), Seq(ValSpec("w", IntegerType, 0))))
    val u = a.union(b, Map("v" -> PlusFn(0, c => sum(c).cast("int"), _ + _),
                           "w" -> PlusFn(0, c => sum(c).cast("int"), _ + _)))
    assert(u.schema.keys == Seq("k"))
    assert(u.schema.valNames == Seq("v", "w"))
    assert(rowSet(u.df) == Set(
      Seq[Any]("x", 3, 10), Seq[Any]("y", 5, 0), Seq[Any]("z", 0, 20)))
  }

  test("union: colliding non-prefix keys rejected (api/TupleOp.kt:374-387)") {
    val a = table(Seq(Row("x", 1, 1)), Seq("k", "j"), Seq(ValSpec("v", IntegerType, 0)),
      Seq("k" -> StringType, "j" -> IntegerType, "v" -> IntegerType))
    val b = table(Seq(Row(1, "x", 1)), Seq("j", "k"), Seq(ValSpec("v", IntegerType, 0)),
      Seq("j" -> IntegerType, "k" -> StringType, "v" -> IntegerType))
    assertThrows[IllegalArgumentException] {
      a.union(b, Map("v" -> PlusFn(0, c => sum(c).cast("int"), _ + _)))
    }
  }

  test("union: ⊕ identity must equal input default (api/TupleOp.kt:313-320)") {
    val a = table(Seq(Row("x", 1)), Seq("k"), Seq(ValSpec("v", IntegerType, 7)), kv)
    val b = table(Seq(Row("y", 2)), Seq("k"), Seq(ValSpec("v", IntegerType, 7)), kv)
    assertThrows[IllegalArgumentException] {
      a.union(b, Map("v" -> PlusFn(0, c => sum(c).cast("int"), _ + _)))
    }
  }

  test("agg = union with empty (api/TupleOp.kt:296): key subset, ⊕ over dropped") {
    val a = table(Seq(Row("x", 1, 1), Row("x", 2, 2), Row("y", 9, 4)),
      Seq("k", "j"), Seq(ValSpec("v", IntegerType, 0)),
      Seq("k" -> StringType, "j" -> IntegerType, "v" -> IntegerType))
    val g = a.agg(Seq("k"), Map("v" -> PlusFn(0, c => sum(c).cast("int"), _ + _)))
    assert(rowSet(g.df) == Set(Seq[Any]("x", 3), Seq[Any]("y", 4)))
    // agg to no keys → global aggregate
    val tot = a.agg(Seq(), Map("v" -> PlusFn(0, c => sum(c).cast("int"), _ + _)))
    assert(rowSet(tot.df) == Set(Seq[Any](7)))
  }

  test("join: shared key prefix, ⊗ per shared val, per-group cartesian") {
    // A keyed [k, i], B keyed [k, j]: join on k; result keys [k, i, j];
    // each (i, j) pair in a k-group gets v_a ⊗ v_b.
    val a = table(Seq(Row("x", 1, 2), Row("x", 2, 3), Row("y", 1, 5)),
      Seq("k", "i"), Seq(ValSpec("v", IntegerType, 0)),
      Seq("k" -> StringType, "i" -> IntegerType, "v" -> IntegerType))
    val b = table(Seq(Row("x", 7, 10), Row("x", 8, 100), Row("z", 7, 1)),
      Seq("k", "j"), Seq(ValSpec("v", IntegerType, 0)),
      Seq("k" -> StringType, "j" -> IntegerType, "v" -> IntegerType))
    val j = a.join(b, Map("v" -> TimesFn(0, 0, 0, _ * _)))
    assert(j.schema.keys == Seq("k", "i", "j"))
    assert(rowSet(j.df) == Set(
      Seq[Any]("x", 1, 7, 20), Seq[Any]("x", 1, 8, 200),
      Seq[Any]("x", 2, 7, 30), Seq[Any]("x", 2, 8, 300)))
  }

  test("join: annihilator must equal input default (api/TupleOp.kt:649-652)") {
    val a = table(Seq(Row("x", 1)), Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    val b = table(Seq(Row("x", 2)), Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    assertThrows[IllegalArgumentException] {
      a.join(b, Map("v" -> TimesFn(9, 0, 0, _ * _)))
    }
  }

  test("join: zeroDiscard drops result-zero rows (SensorOpt.Z)") {
    val a = table(Seq(Row("x", 0), Row("y", 2)), Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    val b = table(Seq(Row("x", 5), Row("y", 3)), Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    val times = Map("v" -> TimesFn(0, 0, 0, _ * _))
    assert(rowSet(a.join(b, times).df) == Set(Seq[Any]("x", 0), Seq[Any]("y", 6)))
    assert(rowSet(a.join(b, times, zeroDiscard = true).df) == Set(Seq[Any]("y", 6)))
  }

  test("rename keys and vals (api/TupleOp.kt:523-567)") {
    val a = table(Seq(Row("x", 1)), Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    val r = a.rename(Map("k" -> "key", "v" -> "value"))
    assert(r.schema == LaraSchema(Seq("key"), Seq(ValSpec("value", IntegerType, 0))))
    assert(rowSet(r.df) == Set(Seq[Any]("x", 1)))
  }

  test("sortKeys requires a permutation (api/TupleOp.kt:577-580)") {
    val a = table(Seq(Row("x", 1, 1)), Seq("k", "j"), Seq(ValSpec("v", IntegerType, 0)),
      Seq("k" -> StringType, "j" -> IntegerType, "v" -> IntegerType))
    assert(a.sortKeys(Seq("j", "k")).schema.keys == Seq("j", "k"))
    assertThrows[IllegalArgumentException](a.sortKeys(Seq("j")))
  }

  test("ext: generated keys must be disjoint from parent keys (api/TupleOp.kt:197-200)") {
    val a = table(Seq(Row("x", 1)), Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    assertThrows[IllegalArgumentException] {
      a.ext(Seq("k"), Seq(ValSpec("n", IntegerType, 0)),
        explode(array(struct(lit("y").as("k"), lit(1).as("n")))))
    }
  }

  test("union without ⊕ uses plusErrorFun: legal until values collide (api/Schema.kt:315-324)") {
    val a = table(Seq(Row("x", 1)), Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    val b = table(Seq(Row("y", 2)), Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    // disjoint keys: no collision → fine with no ⊕ declared
    assert(rowSet(a.union(b, Map()).df) == Set(Seq[Any]("x", 1), Seq[Any]("y", 2)))
    // colliding keys → runtime error on combine
    val c = table(Seq(Row("x", 9)), Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    val e = intercept[Exception](a.union(c, Map()).df.collect())
    assert(e.getMessage.contains("plusErrorFun") || e.getCause != null)
  }

  test("unionAll folds n-ary union; reduceScalar returns the Reducer tuple") {
    val plus = PlusFn(0, c => sum(c).cast("int"), _ + _)
    val ts = (1 to 3).map(i => table(Seq(Row("x", i), Row(s"y$i", 10 * i)),
      Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv))
    val u = ts.head.unionAll(ts.tail, Map("v" -> plus))
    assert(rowSet(u.df) == Set(Seq[Any]("x", 6),
      Seq[Any]("y1", 10), Seq[Any]("y2", 20), Seq[Any]("y3", 30)))
    assert(u.reduceScalar(Map("v" -> plus)).getInt(0) == 66)
  }

  test("store/load round-trip preserves rows and declared key order") {
    val a = table(Seq(Row("b", 2), Row("a", 1), Row("c", 3)),
      Seq("k"), Seq(ValSpec("v", IntegerType, 0)), kv)
    val dir = java.nio.file.Files.createTempDirectory("lara_store").toString + "/t"
    a.store(dir)
    val back = LaraTable.load(spark, dir, Seq("k"), Seq(ValSpec("v", IntegerType, 0)))
    assert(rowSet(back.df) == rowSet(a.df))
  }

  test("extF: arbitrary row function Ext (reference ExtFun generality)") {
    import org.apache.spark.sql.types.LongType
    // wordcount as an arbitrary lambda — the reference's canonical ExtFun
    // example (api/Schema.kt:229-250): emit (word, 1) per token
    val st = new org.apache.spark.sql.types.StructType()
      .add("doc", StringType).add("text", StringType)
    val t = LaraTable(df(st, Seq(Row("d1", "a b a"), Row("d2", "b"))),
      LaraSchema(Seq("doc"), Seq(ValSpec("text", StringType, ""))))
    val ext = t.extF(Seq("word" -> StringType), Seq(ValSpec("cnt", LongType, 0L))) { row =>
      row.getAs[String]("text").split(" ").iterator.map(w => Row(w, 1L))
    }
    assert(ext.schema.keys == Seq("doc", "word"))
    assert(ext.df.count() == 4) // "a b a" → 3 rows, "b" → 1
    assert(rowSet(ext.df) == Set(
      Seq[Any]("d1", "a", 1L), Seq[Any]("d1", "b", 1L), Seq[Any]("d2", "b", 1L)))
    // ⊕-aggregate over the expanded keys completes the wordcount
    val counts = ext.agg(Seq("word"), Map("cnt" -> PlusFn.sumLong))
    assert(rowSet(counts.df) == Set(Seq[Any]("a", 2L), Seq[Any]("b", 2L)))
    // misshapen generated rows fail loudly
    val bad = t.extF(Seq("w" -> StringType), Seq(ValSpec("c", LongType, 0L))) { _ =>
      Iterator(Row("only-one-field"))
    }
    intercept[org.apache.spark.SparkException](bad.df.collect())
    // new keys must stay disjoint from parent keys
    intercept[IllegalArgumentException](
      t.extF(Seq("doc" -> StringType), Seq(ValSpec("c", LongType, 0L)))(_ => Iterator()))
  }

  test("store parallelism survives a low-cardinality leading key") {
    // 2-value leading key, 1000 secondary keys: hash-partitioning on the
    // leading key alone would collapse the write into ≤2 tasks; range
    // partitioning on the full key list must keep all shuffle partitions
    // (4 in this session) busy, and load-back must preserve the rows.
    import org.apache.spark.sql.types.LongType
    val rows = (1 to 1000).map(i => Row(if (i % 2 == 0) "a" else "b", i.toLong, i.toLong))
    val st = new org.apache.spark.sql.types.StructType()
      .add("c", StringType).add("j", LongType).add("v", LongType)
    val t = LaraTable(df(st, rows),
      LaraSchema(Seq("c", "j"), Seq(ValSpec("v", LongType, 0L))))
    // AQE legitimately coalesces this tiny frame at runtime; disable its
    // coalescing here to observe the *structural* parallelism — the old
    // hash-on-leading-key plan was capped at 2 partitions no matter the
    // data volume, which AQE can never widen.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey, "true")
    val dir = java.nio.file.Files.createTempDirectory("lara_store_par").toString + "/t"
    try {
      spark.conf.set(coalesceKey, "false")
      assert(t.sortedDf.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism,
        "range repartition must not collapse parallelism")
      t.store(dir)
      val files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
      assert(files >= spark.sparkContext.defaultParallelism,
        s"expected ≥${spark.sparkContext.defaultParallelism} write tasks, got $files files")
    } finally spark.conf.set(coalesceKey, saved)
    val back = LaraTable.load(spark, dir, Seq("c", "j"), Seq(ValSpec("v", LongType, 0L)))
    assert(back.df.count() == 1000)
    // access path: within every file, rows are sorted by (c, j)
    val perFile = back.df.select(col("c"), col("j"),
        org.apache.spark.sql.functions.input_file_name().as("f"))
      .collect().groupBy(_.getString(2))
    perFile.values.foreach { rs =>
      val keys = rs.map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(keys == keys.sorted, "rows within a stored file must follow the access path")
    }
  }
}
