package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Prints, for every contract query, which testdata tables its analyzed
  * plan scans (tool, not public surface). Used to pick measurement
  * subsets objectively — e.g. the skew rehearsal mutates ONLY
  * events.user_id, so the affected surface is exactly the queries whose
  * plan reads events.parquet; running anything else twice measures noise.
  *
  * Usage: runMain graft.tools.TableUseProbe <sfDir> [table]
  * With a table argument, prints a comma-separated list of query names
  * that scan it (ready for SPARK_GRAFT_ONLY).
  */
object TableUseProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val wanted = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.eventsConf._1, graft.Tables.eventsConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hits = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      spark.sharedState.cacheManager.clearCache()
      graft.pipeline.InternalCaches.release()
      val tables = try {
        val plan = fn(spark, d).queryExecution.analyzed
        plan.collect { case r: LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.map(_.getName.replace(".parquet", "")).toSeq
            case _ => Seq.empty[String]
          }
        }.flatten.distinct.sorted
      } catch { case e: Throwable => Seq(s"ERROR:${e.getClass.getSimpleName}") }
      wanted match {
        case Some(t) => if (tables.contains(t)) Some(name) else None
        case None => println(s"$name\t${tables.mkString(",")}"); None
      }
    }
    wanted.foreach(t => println(s"[table-use] $t: ${hits.mkString(",")}"))
    spark.stop()
  }
}
