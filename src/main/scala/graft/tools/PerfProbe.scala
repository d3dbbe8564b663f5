package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-level wall-clock breakdown for the graph queries (not public
  * surface): forces each materialization boundary separately so the cost
  * lands on a named stage instead of wherever the first action happens to
  * fall.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.Tables.eventsConf._1, graft.Tables.eventsConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def edges: DataFrame = graft.pipeline.Dedup.rebalance(
      graft.Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey")))
      .select(
        pmod(graft.functions.PortableHash.hash60(concat(lit("tv_"), col("l_orderkey"))), lit(20011L)).as("src"),
        pmod(graft.functions.PortableHash.hash60(concat(lit("tw_"), col("l_partkey"))), lit(20011L)).as("dst"))

    def pagerank(): Unit = {
      val lvl = StorageLevel.MEMORY_AND_DISK
      val e = edges.select(col("src").as("s"), col("dst").as("t")).filter(col("s") =!= col("t"))
      val ed = e.repartition(col("s")).dropDuplicates(Seq("s", "t")).persist(lvl)
      t("pr: ed materialize")(ed.count())
      val nodes = t("pr: nodes ckpt")(
        ed.select(col("s").as("v")).union(ed.select(col("t").as("v"))).distinct().localCheckpoint(true))
      val od = t("pr: outdeg ckpt")(
        ed.groupBy(col("s")).agg(count(lit(1)).as("deg")).localCheckpoint(true))
      var mass = nodes.select(col("v"), lit(1000000L).as("m"))
      for (_ <- 1 to 3) {
        val contribs = ed.join(od, Seq("s"))
          .join(mass.withColumnRenamed("v", "s"), Seq("s"))
          .select(col("t").as("v"), expr("(m * 85L) div (100L * deg)").as("c"))
          .groupBy(col("v")).agg(sum(col("c")).as("c"))
        mass = nodes.join(contribs, Seq("v"), "left")
          .select(col("v"), (lit(150000L) + coalesce(col("c"), lit(0L))).as("m"))
      }
      t("pr: 3 rounds + sink")(mass.write.format("noop").mode("overwrite").save())
      spark.sharedState.cacheManager.clearCache()
    }

    def triangle(): Unit = {
      val lvl = StorageLevel.MEMORY_AND_DISK
      val und = edges
        .select(least(col("src"), col("dst")).cast("long").as("a"),
          greatest(col("src"), col("dst")).cast("long").as("b"))
        .distinct().filter(col("a") =!= col("b")).persist(lvl)
      t("tri: und materialize")(und.count())
      val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val oriented = und
        .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
        .select(when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("a")).otherwise(col("b")).as("u"),
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("b")).otherwise(col("a")).as("v"))
        .repartition(col("u"))
        .persist(lvl)
      t("tri: oriented matz")(oriented.count())
      val wedges = oriented.join(oriented.select(col("u"), col("v").as("w")), Seq("u"))
        .filter(col("v") < col("w"))
      t("tri: wedge count")(println(s"  wedges=${wedges.count()}"))
      val tri = wedges.join(und, wedges("v") === und("a") && wedges("w") === und("b"))
        .select(least(col("u"), col("v")).as("vertex"))
        .groupBy(col("vertex")).agg(count(lit(1)).as("n_triangles"))
      t("tri: close + agg")(tri.write.format("noop").mode("overwrite").save())
      spark.sharedState.cacheManager.clearCache()
    }

    pagerank(); triangle() // JIT warm
    println("=== timed ===")
    pagerank(); triangle()
    pagerank(); triangle()
    spark.stop()
  }
}
