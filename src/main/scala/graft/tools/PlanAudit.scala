package graft.tools

import org.apache.spark.sql.SparkSession

/** One-line plan-shape summary for EVERY contract query (not public
  * surface) — the optimization-round coverage instrument: exchange count,
  * join strategies, generator count, scan count, and whether any scan
  * carries PushedFilters. Lets a reviewer confirm "examined every
  * operator" without 242 full explain files (the queries actually touched
  * get full before/after dumps via [[PlanDump]]).
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] > plans/r12/plan_audit.txt
  * NOTE: building a query executes its eager internal stages, so run at a
  * small SF.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.Tables.eventsConf._1, graft.Tables.eventsConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def count(s: String, pat: String): Int = pat.r.findAllIn(s).length
    println(f"${"query"}%-34s exch  smj  bhj  shj  gen scan pushed")
    for (q <- graft.SparkEntry.queries.keys.toSeq.sorted) {
      spark.sharedState.cacheManager.clearCache()
      graft.pipeline.InternalCaches.release()
      val line = try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        f"$q%-34s ${count(p, "\\bExchange\\b")}%4d ${count(p, "SortMergeJoin")}%4d " +
          f"${count(p, "BroadcastHashJoin")}%4d ${count(p, "ShuffledHashJoin")}%4d " +
          f"${count(p, "\\bGenerate\\b")}%4d ${count(p, "Scan parquet")}%4d " +
          (if (p.contains("PushedFilters: [") && !p.contains("PushedFilters: []")) "yes" else "-")
      } catch { case e: Throwable => f"$q%-34s ERROR ${e.getMessage.take(60)}" }
      println(line)
    }
    spark.stop()
  }
}
