package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data operators: snapshot reconciliation and changelog merge —
  * the table-maintenance primitives a store built from appends needs
  * (reference stores are Accumulo tables mutated by iterators; a
  * Spark-native store diffs and merges immutable snapshots instead).
  *
  * Scale notes: both operators shuffle once on the key. `snapshotDiff`
  * carries (key, digest) pairs only — payloads are digested at the scan,
  * so a 100 TB corpus diff moves ~32 bytes/row. `cdcMerge` must carry
  * payloads (the merge's output IS the payload), which is the intrinsic
  * cost of a rewrite; the changelog side is typically the small delta.
  */
object ChangeData {

  /** Which keys were added, removed, or changed between two snapshots.
    * Payload equality is by md5 digest, computed before the join so only
    * (key, digest) crosses the shuffle. Unchanged keys are dropped — the
    * output is the (usually tiny) reconciliation report.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   key: String, payload: String): DataFrame = {
    val o = oldSnap.select(col(key), md5(col(payload)).as("__h_old"))
    val n = newSnap.select(col(key), md5(col(payload)).as("__h_new"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("change",
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(col(key), col("change"))
  }

  /** MERGE INTO: apply a changelog of upserts (op "U"/"I") and deletes
    * (op "D") to a base snapshot, latest `seqCol` per key winning (ties
    * broken by op for determinism — callers should make (key, seq)
    * unique). Emits the merged state with a `status` column
    * (kept/inserted/updated); deleted keys vanish. An op "U" on an absent
    * key inserts (upsert semantics) but keeps status "updated" — status
    * reports the CHANGELOG's claim, not base membership.
    *
    * Plan: per-key latest change via a partitioned window over the
    * changelog (the delta — small relative to base), then ONE full-outer
    * join against the base. No base rewrite happens for "kept" rows
    * beyond the join itself — this is the compaction-style merge a lake
    * table runs, not a per-row mutate.
    */
  def cdcMerge(base: DataFrame, changes: DataFrame, key: String, payload: String,
               seqCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc, col(opCol))
    val latest = changes
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(key), col(opCol).as("__op"), col(payload).as("__chg_payload"))
    base.select(col(key), col(payload).as("__base_payload"))
      .join(latest, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key),
        coalesce(col("__chg_payload"), col("__base_payload")).as(payload),
        when(col("__op").isNull, lit("kept"))
          .when(col("__op") === "I", lit("inserted"))
          .otherwise(lit("updated")).as("status"))
  }
}
