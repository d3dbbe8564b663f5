package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout
  * (`/root/testdata/sfN/NAME.parquet`, see TESTDATA.md).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** Session config required before reading events.parquet: it carries
    * TIMESTAMP(NANOS), which Spark 4 refuses by default
    * (PARQUET_TYPE_ILLEGAL). Sessions must opt in to reading nanos as long.
    * Applied at session construction (Bench/Verify/tests) or at the
    * `SparkEntry.entry` boundary for externally built sessions — never as a
    * side effect of plan building, so concurrent plan builders can't race
    * the session conf.
    */
  val eventsConf: (String, String) = "spark.sql.legacy.parquet.nanosAsLong" -> "true"

  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get(eventsConf._1, "false") == "true",
      s"set ${eventsConf._1}=true at session construction before reading events")
    // integer `div`, not `/`: fractional division runs in double precision,
    // which at ~1.7e18 nanos is only accurate to ~hundreds of nanos
    t(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
