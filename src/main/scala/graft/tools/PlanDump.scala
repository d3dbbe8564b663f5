package graft.tools

import org.apache.spark.sql.SparkSession

/** Writes `explain("formatted")` for named contract queries to files (not
  * public surface) — the optimization-round evidence artifact
  * (`plans/r12/<query>_<tag>.txt`). Session config mirrors Bench exactly
  * (cores, shuffle partitions, 16m scan splits, AQE) so the captured plans
  * are the plans the bench actually runs.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> <query>[,<query>...]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
  *
  * NOTE: building a query's DataFrame EXECUTES any eager internal stages
  * (localCheckpoint rounds, InternalCaches persists), so the dump shows the
  * final composed plan over those materialized leaves — the same shape the
  * noop sink times. Iterative queries additionally get their per-round
  * machinery exercised, which is the honest cost surface.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <q1,q2,...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.Tables.eventsConf._1, graft.Tables.eventsConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    for (q <- names) {
      spark.sharedState.cacheManager.clearCache()
      graft.pipeline.InternalCaches.release()
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(outDir.resolve(s"${q}_$tag.txt"),
        text.getBytes("UTF-8"))
      println(s"[plandump] wrote ${q}_$tag.txt (${text.length} chars)")
    }
    spark.stop()
  }
}
