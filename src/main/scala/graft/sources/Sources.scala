package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File sources/sinks mirroring the reference's scan surface (SURVEY §2.2).
  *
  * Reference `CSVScan`/`OpCSVScan` (`opt/Operators.kt:26-155`): skip-N
  * header rows, delimiter/quote/escape options, bad-row drop with a count
  * and warning. `FileStoreIterator` (`opt/Operators.kt:372-477`): CSV sink
  * with optional header. Parallel ingest (`parfile/ParallelFileMapper.kt`)
  * is free — Spark parallelizes file splits natively.
  */
object Sources {

  /** CSV scan with malformed rows dropped — the reference's bad-row-drop
    * semantics. Schema is explicit (the reference requires a declared
    * schema too). Multi-file paths/globs parallelize automatically.
    *
    * Caveats (Spark CSV semantics, pinned by SourcesSpec/
    * RelationalFrontendSpec): malformed-row dropping engages only when the
    * scan reads the full declared schema — under column pruning conversion
    * errors null-fill instead, and a projection-free `count()` parses no
    * columns and drops nothing. Use `csvWithBadRows` when exact accounting
    * matters.
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          delimiter: String = ",", quote: String = "\"", escape: String = "\\",
          header: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "DROPMALFORMED")
      .option("delimiter", delimiter)
      .option("quote", quote)
      .option("escape", escape)
      .option("header", header)
      .csv(path)

  /** CSV scan that also reports the bad rows, mirroring the reference's
    * dropped-row count+warn (`opt/Operators.kt:118-131`): returns
    * (good rows, bad raw lines). Both are lazy DataFrames; counting the bad
    * side is the caller's choice — at 100 TB you sample it, not collect it.
    */
  def csvWithBadRows(spark: SparkSession, path: String, schema: StructType,
                     delimiter: String = ","): (DataFrame, DataFrame) = {
    val withCorrupt = spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("delimiter", delimiter)
      .csv(path)
      .cache() // corrupt-record column requires a single materialization pass
    val good = withCorrupt.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = withCorrupt.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record"))
    (good, bad)
  }

  /** CSV sink with optional header (reference `OpFileStoreIterator`). */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header).csv(path)

  /** JSONL (one JSON object per line) scan — the de-facto interchange
    * format for training corpora; same explicit-schema + bad-row
    * accounting stance as the CSV scan: returns (good rows, bad raw
    * lines). Multi-file globs parallelize natively; at 100 TB bad rows get
    * sampled, not collected.
    */
  def jsonl(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // corrupt-record column requires a single materialization pass
    val good = withCorrupt.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = withCorrupt.filter(col("_corrupt_record").isNotNull).select(col("_corrupt_record"))
    (good, bad)
  }

  /** JSONL sink (one object per line, schema carried in the data). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC scan — the other columnar interchange format (built into Spark;
    * predicate pushdown and column pruning work as with parquet).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
