package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Retry-stable salt in [0, saltFactor): a hash of the given columns.
    *
    * The salt MUST be a pure function of row content, never of row
    * *position*: a position id (`monotonically_increasing_id`) changes when
    * a retried map task re-fetches its shuffled input in a different order,
    * so the retry can assign different salts than the partial output already
    * consumed — duplicating or losing join rows. SQL-expression
    * nondeterminism does not propagate to the RDD's
    * `outputDeterministicLevel`, so the scheduler would NOT re-run the whole
    * stage to save us. Content hashes are reproduced bit-identically on any
    * replay of the same logical row.
    */
  private[operators] def salt(cols: Seq[Column], saltFactor: Int): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor.toLong)).cast("int")

  /** Inner equi-join on `keys`, with `left`'s heavy keys spread across
    * `saltFactor` sub-partitions and `right` replicated to match. Result
    * equals `left.join(right, keys)` exactly.
    *
    * The salt hashes `uniqueId` when given, else every left column.
    * Pass `uniqueId` (any column distinct per row — a primary key, an
    * ingest offset) whenever the left side can contain fully-duplicate
    * rows: without it, byte-identical rows hash to one sub-key and that
    * key's skew survives the salt. With it, the salt is both retry-stable
    * (content-derived) and uniformly spread.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, uniqueId: Option[String] = None): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    uniqueId.foreach(c => require(left.columns.contains(c),
      s"uniqueId column '$c' not in left columns ${left.columns.mkString(",")}"))
    val saltCols = uniqueId.map(c => Seq(col(c))).getOrElse(left.columns.toSeq.map(col))
    val l = left.withColumn("__salt", salt(saltCols, saltFactor))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
