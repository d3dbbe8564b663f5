package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing probe for the profile_stats plan variants (not public
  * surface): where does the multi-distinct Expand spend its time?
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      // median of 3
      val xs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name%-28s ${xs(1)}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")
    val li = graft.Tables.lineitem(spark, d)

    t("full profile (contract)")(noop(graft.RelationalQueries.profile(li, cols)))
    t("packed single-agg (rejected)")(noop {
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"), count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"), max(col(c)).cast("string").as(s"mx_$c")))
      li.agg(count(lit(1)).as("n_rows"), aggs: _*)
    })
    t("no distincts")(noop(li.agg(
      count(lit(1)), cols.map(c => count(col(c))).reduce(_ + _))))
    t("distincts only, one agg")(noop(li.agg(
      count_distinct(col(cols.head)),
      cols.tail.map(c => count_distinct(col(c))): _*)))
    for (c <- cols)
      t(s"single distinct: $c")(noop(li.agg(count_distinct(col(c)))))
    t("5 separate agg jobs")(cols.foreach(c =>
      noop(li.agg(count_distinct(col(c)), min(col(c)), max(col(c))))))
    spark.stop()
  }
}
