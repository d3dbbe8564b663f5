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
    * The salt is the row's position id (partition id + offset): distinct for
    * every left row — fully duplicated rows and rows with no non-key columns
    * still spread across all `saltFactor` sub-keys (a content hash would
    * collapse them onto one). Not a random number: position ids are
    * reproduced when a task is recomputed from the same deterministic input
    * split, which is the property shuffle retries need. Spark conservatively
    * marks the id nondeterministic, which also stops the optimizer from
    * reordering anything across the salt — the safe direction.
    */
  /** Position-id salt in [0, saltFactor). */
  private[operators] def salt(saltFactor: Int) =
    pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int")

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = left.withColumn("__salt", salt(saltFactor))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
