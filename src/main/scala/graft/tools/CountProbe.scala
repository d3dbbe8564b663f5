package graft.tools

import org.apache.spark.sql.SparkSession

/** Output-cardinality probe: prints `name rows=N` for each named contract
  * query on a given SF dir. Used by the scale rehearsal to separate
  * output-bound growth (result rows grow superlinearly by construction —
  * replica near-dup clusters, densified overlap pairs) from plan waste.
  * Tool, not contract surface.
  *
  * Usage: runMain graft.tools.CountProbe <sfDir> <q1,q2,...>
  */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.eventsConf._1, graft.Tables.eventsConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      spark.sharedState.cacheManager.clearCache()
      graft.pipeline.InternalCaches.release()
      val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
      println(s"[countprobe] $n rows=$rows")
    }
    spark.stop()
  }
}
