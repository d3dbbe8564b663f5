package graft.lara

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The reference repo's golden end-to-end examples, re-run through the Lara
  * DSL with the exact input and expected tuples:
  *  - WordCount (`examples/wordcount/WordCountQuery.kt:12-18` input,
  *    `:48-65` expected): Load → Ext(tokenize) → Sort → Agg(word, ⊕=+).
  *  - RainySunny (`examples/rainysunny/RainySunnyQuery.kt:8-36`): map-only
  *    replace "Rainy"→"Sunny".
  */
class GoldenExamplesSpec extends AnyFunSuite {
  import TestSpark._

  test("wordcount golden: reference 16-row expected list") {
    val docs = df(
      new StructType().add("docid", StringType).add("text", StringType),
      Seq(
        Row("doc1", "she sells sea shells by the sea shore"),
        Row("doc2", "the shells she sells are surely seashells"),
        Row("doc3", "so if she sells shells on the seashore"),
        Row("doc4", "i'm sure she sells seashore shells")))
    val t = LaraTable(docs, LaraSchema(Seq("docid"), Seq(ValSpec("text", StringType, ""))))
    val result = t
      .ext(Seq("word"), Seq(ValSpec("count", IntegerType, 0)),
        explode(transform(
          filter(split(col("text"), " "), w => w =!= ""),
          w => struct(w.as("word"), lit(1).as("count")))))
      .sortKeys(Seq("word", "docid")) // reference sorts before agg; logical no-op here
      .agg(Seq("word"), Map("count" -> PlusFn(0, c => sum(c).cast("int"), _ + _)))

    val expected = Set(
      ("are", 1), ("by", 1), ("i'm", 1), ("if", 1), ("on", 1), ("sea", 2),
      ("seashells", 1), ("seashore", 2), ("sells", 4), ("she", 4),
      ("shells", 4), ("shore", 1), ("so", 1), ("sure", 1), ("surely", 1),
      ("the", 3)).map { case (w, c) => Seq[Any](w, c) }
    assert(rowSet(result.df) == expected)
    assert(result.schema == LaraSchema(Seq("word"), Seq(ValSpec("count", IntegerType, 0))))
  }

  test("rainysunny golden: map-only replace") {
    val msgs = df(
      new StructType().add("k", StringType).add("v", StringType),
      Seq(Row("msg1", "Hello World!"), Row("msg2", "Hello Glorious World!"),
        Row("msg3", "Hello Rainy World!")))
    val t = LaraTable(msgs, LaraSchema(Seq("k"), Seq(ValSpec("v", StringType, ""))))
    val result = t.mapVals(Seq(ValSpec("v", StringType, "")),
      Map("v" -> regexp_replace(col("v"), "Rainy", "Sunny")))
    assert(rowSet(result.df) == Set(
      Seq[Any]("msg1", "Hello World!"),
      Seq[Any]("msg2", "Hello Glorious World!"),
      Seq[Any]("msg3", "Hello Sunny World!")))
  }

  test("wordcount re-run determinism: same result on second execution") {
    // Reference asserts re-runnability of the stream
    // (`Sensor_Lara_Standalone_Example.kt:38-52`); DataFrames re-execute the
    // plan — results must be identical.
    val docs = df(
      new StructType().add("docid", StringType).add("text", StringType),
      Seq(Row("d1", "a b a")))
    val t = LaraTable(docs, LaraSchema(Seq("docid"), Seq(ValSpec("text", StringType, ""))))
      .ext(Seq("word"), Seq(ValSpec("count", IntegerType, 0)),
        explode(transform(filter(split(col("text"), " "), w => w =!= ""),
          w => struct(w.as("word"), lit(1).as("count")))))
      .agg(Seq("word"), Map("count" -> PlusFn(0, c => sum(c).cast("int"), _ + _)))
    assert(rowSet(t.df) == rowSet(t.df))
    assert(rowSet(t.df) == Set(Seq[Any]("a", 2), Seq[Any]("b", 1)))
  }
}
