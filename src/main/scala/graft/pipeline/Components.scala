package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an undirected edge list — the
  * missing last step of near-duplicate removal: candidate pairs from
  * MinHash/SimHash/Jaccard say "a ~ b", but dropping duplicates needs the
  * transitive closure (a~b, b~c ⇒ keep ONE of {a,b,c}), i.e. one canonical
  * document per connected component of the similarity graph.
  *
  * Algorithm: iterative min-label propagation with POINTER JUMPING —
  * each round every node takes the min label over itself and its
  * neighbors (one join + partial-agg'd groupBy), then replaces its label
  * with its label's label (one self-join). The jump halves label-chain
  * depth, so convergence is O(log diameter) rounds rather than
  * O(diameter): a 1M-long chain of chained near-dups — the adversarial
  * case for plain propagation — finishes in ~20 rounds. Every round is
  * shuffle-keyed on node/label ids only (three longs wide); signatures,
  * text and embeddings never enter the loop.
  *
  * The driver sees one scalar per round (the changed-label count — the
  * reference's Reducer side-channel pattern, `opt/Reducer.kt:25-59`).
  * Each round's label frame is EAGERLY `localCheckpoint`ed: the pointer
  * jump references the round's frame twice, so without truncation the
  * logical plan doubles every round (2^rounds nodes — the classic
  * iterative-DataFrame blow-up); the checkpoint materializes the round and
  * cuts lineage to a leaf, after which the previous round's storage is
  * released. `localCheckpoint` trades executor-loss tolerance for speed —
  * a long-running production job on a flaky cluster should switch to
  * reliable `checkpoint()` with a checkpoint dir, same structure.
  */
object Components {

  /** Connected components of the undirected graph given as a pair list.
    * Returns one row per participating node:
    * (`doc_id`, `cluster_id` = min node id in its component,
    *  `is_canonical` = doc_id == cluster_id — the row to KEEP when
    * deduplicating).
    *
    * `maxIter` bounds the rounds (diameter up to 2^maxIter thanks to the
    * pointer jump); the loop exits early as soon as a round changes no
    * label, so the bound only matters for adversarially deep graphs.
    */
  /** Thrown when the label-propagation loop exhausts `maxIter` with labels
    * still changing: the partial labels would silently mis-assign documents
    * to clusters (and the wrong documents would be kept/dropped downstream).
    */
  final class NonConvergenceException(iters: Int, lastChanged: Long)
    extends IllegalStateException(
      s"connectedComponents did not converge after $iters iterations " +
      s"($lastChanged labels still changing). The graph is deeper than " +
      s"2^$iters — raise maxIter (pointer jumping doubles reachable depth " +
      "per round, so +1 iteration doubles the supported diameter).")

  def connectedComponents(pairs: DataFrame, srcCol: String = "doc_a",
                          dstCol: String = "doc_b", maxIter: Int = 20): DataFrame = {
    // materialize the pair list BEFORE mirroring it: union branches get no
    // CSE, so an unpersisted `pairs` would run its whole candidate-
    // generation plan (an LSH bucket join upstream) once per direction
    val p = pairs.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // pre-partitioned on t, the key EVERY round's neighbor-min join probes:
    // the cached partitioning satisfies the join's required distribution, so
    // the big (edge) side of the per-round shuffle is paid once here, not
    // once per round — only the label side (which changes) moves each round
    val edges = p.union(p.select(col("t").as("s"), col("s").as("t")))
      .repartition(col("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // init = the first propagation round for free: one groupBy gives each
    // node its closed-neighborhood min (replaces a distinct() that would
    // have cost the same shuffle for labels == id)
    var labels = edges.groupBy(col("s").as("id")).agg(min(col("t")).as("m"))
      .select(col("id"), least(col("id"), col("m")).as("label"))
      .localCheckpoint(true)

    // one propagation round: (id, prev, label) → same, with
    // 1. neighbor-min: for each node, the smallest label in its closed
    //    neighborhood (partial aggregation makes this a map-side combine)
    // 2. pointer jump: label := label(label) — halves chain depth
    // `prev` (the BATCH-start label) rides through untouched, so the
    // convergence check after a batch costs no extra join.
    def round(cur: DataFrame): DataFrame = {
      val nbrMin = edges.join(cur.select(col("id"), col("label")),
          edges("t") === col("id"))
        .groupBy(col("s").as("nid")).agg(min(col("label")).as("nbr"))
      val prop = cur.join(nbrMin, cur("id") === col("nid"), "left")
        .select(cur("id"), cur("prev"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
      val byId = prop.select(col("id").as("jid"), col("label").as("jlabel"))
      prop.join(byId, prop("label") === col("jid"), "left")
        .select(prop("id"), prop("prev"), coalesce(col("jlabel"), col("label")).as("label"))
    }

    var iter = 0
    var converged = false
    var lastChanged = 0L
    // AQE off for the round loop only (sub-second stages over the cached
    // pre-partitioned edge list, nothing to adapt — guide §2.1); the
    // caller's final plan keeps the session setting
    Loops.withAqeOff(pairs.sparkSession) {
    while (!converged && iter < maxIter) {
      // ONE round per checkpoint + driver sync. Round batching (two rounds
      // per cut) was MEASURED SLOWER here both ways: uncheckpointed, round
      // 2's three references re-run round 1's two-join plan (no cross-
      // reference CSE — 6.6 s vs 3.9 s at sf0.1); with a mid-batch persist
      // the extra storage materialization still nets +0.2 s. On graphs
      // that converge in 2-3 pointer-jump rounds the loop's fixed cost is
      // dominated by candidate generation, not the cut.
      val start = labels.withColumn("prev", col("label"))
      // materialized + lineage cut HERE (see scaladoc): the round
      // references its input twice (neighbor-min + jump) — an
      // uncheckpointed plan would double every round. The changed-count
      // rides the SAME materialization pass (fused checkpoint+count, r13)
      // instead of a second driver-synchronized job per round; accumulator
      // counts can only over-count on task retry, never turn a nonzero
      // count zero, so the convergence test (changed == 0) is exact.
      // Output ordinals of round(): (id=0, prev=1, label=2), all longs.
      val (stepped, changed) = org.apache.spark.sql.graft.bridge.localCheckpointCounted(
        round(start), r => r.getLong(2) < r.getLong(1))
      labels.unpersist() // stepped is materialized — the old round can go
      labels = stepped.drop("prev")
      converged = changed == 0L
      lastChanged = changed
      iter += 1
    }
    }
    edges.unpersist()
    p.unpersist()
    // exhausting maxIter with labels still moving means the labels are
    // PARTIAL — fail loudly rather than hand wrong clusters downstream
    // (the changed-count is already on the driver; this check is free)
    if (!converged) { labels.unpersist(); throw new NonConvergenceException(maxIter, lastChanged) }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"),
      (col("id") === col("label")).as("is_canonical"))
  }

  /** Near-duplicate clusters of a document corpus: MinHash/LSH candidate
    * pairs (the oracle-checkable portable family) resolved into components.
    * One row per document that has at least one near-duplicate.
    */
  def duplicateClusters(docs: DataFrame, k: Int = 3, bands: Int = 8,
                        rowsPerBand: Int = 4): DataFrame =
    connectedComponents(Dedup.minhashPairs(docs, k, bands, rowsPerBand))

  /** Apply the keep/drop decision: the corpus with non-canonical members
    * of every near-dup cluster removed (singleton docs — never paired —
    * are kept untouched via the left-anti path).
    */
  def dropDuplicates(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val drop = clusters.filter(!col("is_canonical")).select(col("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }
}
