package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (i <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      val q = graft.SparkEntry.queries("dedup_jaccard")(spark, d)
      time(s"dedup_jaccard noop#$i")(q.write.format("noop").mode("overwrite").save())
    }
    for (i <- 1 to 2) {
      spark.sharedState.cacheManager.clearCache()
      val q = graft.SparkEntry.queries("dedup_simhash")(spark, d)
      time(s"dedup_simhash noop#$i")(q.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
