package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling / driver-environment simulation (not public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    // bare session, like the driver's own smoke-check environment
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[scratch] entry rows=$n")
    assert(n > 0)
    spark.stop()
  }
}
