package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join by key salting.
  *
  * AQE's skew-join split (on by default) rebalances sort-merge partitions at
  * runtime and is the first line of defence. Explicit salting is for the
  * pathological case AQE can't fix: a power-law key so hot that *one key's*
  * rows exceed an executor (the 100 TB web-crawl reality — one domain with
  * a billion rows). The probe side spreads each key across `saltFactor`
  * sub-keys; the build side replicates each row `saltFactor` times. Shuffle
  * volume: |left| + saltFactor·|right| — choose the smaller side as right.
  */
object Skew {

  /** Inner equi-join on `keys`, with `left`'s heavy keys spread across
    * `saltFactor` sub-partitions and `right` replicated to match. Result
    * equals `left.join(right, keys)` exactly.
    *
    * The salt is a deterministic hash of the left row's non-key columns
    * (not a random number: retried tasks must salt identically or shuffle
    * retries duplicate/lose rows).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val nonKey = left.columns.filterNot(keys.contains)
    val saltSrc = if (nonKey.isEmpty) lit(0L) else xxhash64(struct(nonKey.toIndexedSeq.map(col): _*))
    val l = left.withColumn("__salt", pmod(saltSrc, lit(saltFactor.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
