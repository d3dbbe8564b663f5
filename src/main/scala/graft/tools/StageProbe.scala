package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-stage wall/task breakdown for one or more contract queries (not
  * public surface): attaches a listener and prints, for every completed
  * stage, its task count, total task time, max single-task time, and
  * shuffle read/write bytes — the instrument that tells "one giant task"
  * from "many small tasks" and "shuffle-bound" from "CPU-bound".
  * Session config mirrors Bench.
  *
  * Usage: runMain graft.tools.StageProbe <q1,q2,...> [reps]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 2
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
    @volatile var collecting = false
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val ms = si.taskMetrics
          val wall = (for { s <- si.submissionTime; c <- si.completionTime }
            yield c - s).getOrElse(-1L)
          rows.add(f"[stage ${si.stageId}%4d] tasks=${si.numTasks}%4d " +
            f"wall=${wall / 1000.0}%7.2fs exec=${ms.executorRunTime / 1000.0}%8.2fs " +
            f"shufR=${ms.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            f"shufW=${ms.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  " +
            si.name.take(90))
        }
    })
    for (q <- names) {
      val fn = graft.SparkEntry.queries(q)
      // warm-up (JIT + codegen), untimed and unlogged
      spark.sharedState.cacheManager.clearCache()
      graft.pipeline.InternalCaches.release()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      var best = Double.MaxValue
      for (r <- 1 to reps) {
        spark.sharedState.cacheManager.clearCache()
        graft.pipeline.InternalCaches.release()
        System.gc()
        rows.clear()
        collecting = r == reps // log stages of the last rep only
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        best = math.min(best, dt)
        println(f"[probe] $q rep$r ${dt}%.2f s")
      }
      collecting = false
      Thread.sleep(200) // let listener drain
      import scala.jdk.CollectionConverters._
      rows.asScala.toSeq.sorted.foreach(println)
      println(f"[probe] $q BEST $best%.2f s over $reps reps")
    }
    spark.stop()
  }
}
