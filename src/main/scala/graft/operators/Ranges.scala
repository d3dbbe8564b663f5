package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — the second classic operator Spark's equi-join
  * machinery lacks: left rows whose `point` falls inside a right row's
  * [lo, hi) interval.
  *
  * Plan shape: bucketized prefilter. Right intervals explode into the
  * width-`bucketWidth` buckets they overlap; each left point lives in
  * exactly one bucket; an equi-join on the bucket followed by the exact
  * interval predicate verifies candidates. Each qualifying pair is found
  * exactly once (one bucket per point — no post-join dedup needed), and
  * the join stays an equi-join Catalyst can hash/sort-merge and AQE can
  * skew-split — never the per-key cartesian a theta-join `point >= lo AND
  * point < hi` degenerates to.
  *
  * Sizing `bucketWidth`: shuffle volume grows with the right side's
  * average interval length / bucketWidth (replication factor); candidate
  * verification cost grows with bucket occupancy. Pick roughly the median
  * interval length.
  */
object Ranges {

  def rangeJoin(left: DataFrame, right: DataFrame,
                point: String, lo: String, hi: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__bucket", floor(col(point) / bucketWidth).cast("long"))
    val r = right.withColumn("__bucket",
      explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long")))) // hi's bucket included; exact predicate prunes
    l.join(r, Seq("__bucket"))
      .filter(col(point) >= col(lo) && col(point) < col(hi))
      .drop("__bucket")
  }
}
