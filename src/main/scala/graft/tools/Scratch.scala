package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q3_join", "lara_covariance", "lara_union_plus", "dedup_minhash")) {
      val df = graft.SparkEntry.queries(q)(spark, d)
      df.collect()
      val p = df.queryExecution.executedPlan.toString()
      println(s"[plan] $q exchanges=${"Exchange hashpartitioning".r.findAllIn(p).size}" +
        s" inMemScans=${"InMemoryTableScan".r.findAllIn(p).size}" +
        s" cachedRels=${"InMemoryRelation".r.findAllIn(p).size}" +
        s" broadcasts=${"BroadcastExchange".r.findAllIn(p).size}")
    }
    spark.stop()
  }
}
