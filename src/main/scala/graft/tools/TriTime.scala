package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object TriTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.Tables.eventsConf._1, graft.Tables.eventsConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tri] $name%-18s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    def variant(persistOriented: Boolean, persistUnd: Boolean): Unit = {
      val e = graft.pipeline.Dedup.rebalance(
        graft.Tables.lineitem(spark, d).select(col("l_orderkey"), col("l_partkey")))
        .select(
          pmod(graft.functions.PortableHash.hash60(concat(lit("tv_"), col("l_orderkey"))), lit(20011L)).as("src"),
          pmod(graft.functions.PortableHash.hash60(concat(lit("tw_"), col("l_partkey"))), lit(20011L)).as("dst"))
      var und = e.select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
        .distinct().filter(col("a") =!= col("b"))
      if (persistUnd) und = und.persist(StorageLevel.MEMORY_AND_DISK)
      val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      var oriented = und
        .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
        .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
        .select(when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("a")).otherwise(col("b")).as("u"),
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")), col("b")).otherwise(col("a")).as("v"))
      if (persistOriented) oriented = oriented.persist(StorageLevel.MEMORY_AND_DISK)
      val wedges = oriented.join(oriented.select(col("u"), col("v").as("w")), Seq("u"))
        .filter(col("v") < col("w"))
      val tri = wedges.join(und, wedges("v") === und("a") && wedges("w") === und("b"))
        .select(least(col("u"), col("v")).as("vertex"))
        .groupBy(col("vertex")).agg(count(lit(1)).as("n_triangles"))
      tri.write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
    }
    variant(true, true) // warm JIT
    t("persist both")(variant(true, true))
    t("persist und only")(variant(false, true))
    t("persist none")(variant(false, false))
    t("persist both b")(variant(true, true))
    t("persist und only b")(variant(false, true))
    t("persist none b")(variant(false, false))
    spark.stop()
  }
}
