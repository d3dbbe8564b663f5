package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Prints, for every contract query, which testdata tables its analyzed
  * plan scans (tool, not public surface). Used to pick measurement
  * subsets objectively — e.g. the skew rehearsal mutates ONLY
  * events.user_id, so the affected surface is exactly the queries whose
  * plan reads events.parquet; running anything else twice measures noise.
  *
  * LIMITATION + fix (r9 advice): queries that eagerly materialize before
  * returning — the csv/jsonl roundtrips and lara_store_layout (their
  * result is a collected LocalRelation after `localizeAndClean`) and
  * every streaming *_replay (a memory-sink table) — surface ZERO
  * LogicalRelations from their analyzed plan, so the plan probe would
  * silently omit real consumers AND fully execute those heavy queries
  * just to read a plan. They are resolved from the static map below
  * instead (kept in sync with the query bodies) and never executed here.
  *
  * Usage: runMain graft.tools.TableUseProbe <sfDir> [table]
  * With a table argument, prints a comma-separated list of query names
  * that scan it (ready for SPARK_GRAFT_ONLY).
  */
object TableUseProbe {
  /** Materializing queries whose plan probe can't see their sources. */
  val staticTables: Map[String, Seq[String]] = Map(
    "csv_roundtrip" -> Seq("orders"),
    "jsonl_roundtrip" -> Seq("orders"),
    "lara_store_layout" -> Seq("lineitem"),
    "streaming_ohlc_replay" -> Seq("events"),
    "streaming_sessions_replay" -> Seq("events"),
    "streaming_bin_replay" -> Seq("events"),
    "streaming_dedup_replay" -> Seq("events"),
    "streaming_join_replay" -> Seq("events"),
    "streaming_counts_replay" -> Seq("events"),
    "streaming_enrich_replay" -> Seq("customer", "events"))

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
      val tables = staticTables.get(name).map(_.sorted).getOrElse(try {
        val plan = fn(spark, d).queryExecution.analyzed
        plan.collect { case r: LogicalRelation =>
          r.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              f.location.rootPaths.map(_.getName.replace(".parquet", "")).toSeq
            case _ => Seq.empty[String]
          }
        }.flatten.distinct.sorted
      } catch { case e: Throwable => Seq(s"ERROR:${e.getClass.getSimpleName}") })
      wanted match {
        case Some(t) => if (tables.contains(t)) Some(name) else None
        case None => println(s"$name\t${tables.mkString(",")}"); None
      }
    }
    wanted.foreach(t => println(s"[table-use] $t: ${hits.mkString(",")}"))
    spark.stop()
  }
}
