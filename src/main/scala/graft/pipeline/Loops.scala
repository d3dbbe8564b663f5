package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Shared discipline for iterative (fixed-point) operators. */
object Loops {

  /** Run `body` — an iterative operator's ROUND LOOP — with AQE disabled
    * on this session, restoring the previous setting afterwards (also on
    * exception).
    *
    * Why (guide §2.1, r12 verdict next-round #1): each round is a
    * sub-second job over frames whose partitioning and size the operator
    * already knows (vertex-bounded broadcasts, pre-partitioned cached
    * adjacency). Under AQE every exchange in a round becomes a separately
    * submitted and re-planned query stage — for an 8-round loop that
    * multiplies driver round-trips for zero planning benefit (there is
    * nothing adaptive to decide: join strategies are hinted, partition
    * counts are the session's). The operator's FINAL composed plan (what
    * the caller consumes) is built after `body` returns and still runs
    * under the session's normal AQE setting.
    *
    * Conf is restored on the same session object; the loops run
    * single-threaded within one query build (the Bench/Verify/driver
    * pattern), so no concurrent query on the same session observes the
    * flipped value mid-loop... except deliberately concurrent engines
    * (broadcast-future builds INSIDE a round inherit the conf at their
    * plan time, which is exactly the intent).
    */
  def withAqeOff[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }
}
