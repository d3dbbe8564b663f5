package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance self-join by grid-cell decomposition.
  *
  * The reference's range machinery filters one key dimension
  * (`/root/reference/src/main/kotlin/.../skvi/D4mRangeFilter.kt` — row/qualifier
  * ranges); a 2-D within-radius join is the natural extension a training-data
  * pipeline needs (near-duplicate coordinates, geo bucketing, UMAP-style
  * neighborhood audits). The Spark-first shape is the same trick the LSH /
  * shingle dedup operators use: decompose the quadratic predicate into an
  * EQUI-join on a bounded candidate key — here the grid cell of side
  * `radius` — so Catalyst runs a plain shuffled hash join and no all-pairs
  * path exists.
  *
  * Count-once discipline: the LEFT side keeps only its home cell; the RIGHT
  * side replicates to its 3×3 cell neighborhood (9 rows, a fixed constant —
  * not data-dependent fan-out). A qualifying pair (|Δx|, |Δy| ≤ radius ⇒
  * cell coords differ by ≤ 1) meets exactly once: the right point's nine
  * replica cells are distinct, and `a_id < b_id` kills the mirrored match.
  *
  * Scale: shuffle carries (id, x, y, cell) longs — 9× the point count on the
  * replicated side, never pair-shaped data. Per-cell density bounds the
  * local join work; points hashed into cells of side = radius keep the
  * expected occupancy uniform, and a skewed hot cell is AQE's skew-join
  * case (cell keys are plain longs — saltable by the caller if a real
  * dataset clusters). Distances are exact BIGINT squared-L2 — no floating
  * point anywhere.
  */
object SpatialJoin {

  /** `points`: (id, x, y) longs with x, y ≥ 0. Returns (a_id, b_id, dist2)
    * for every unordered pair with squared L2 distance ≤ radius², a_id <
    * b_id, each pair exactly once.
    */
  def gridDistanceJoin(points: DataFrame, radius: Long): DataFrame = {
    val r2 = radius * radius
    val home = points.selectExpr(
      "id", "x", "y", s"x div ${radius}L AS cx", s"y div ${radius}L AS cy")
    val a = home.select(
      col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
      col("cx"), col("cy"))
    val b = home
      .withColumn("ox", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("oy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(
        col("id").as("b_id"), col("x").as("bx"), col("y").as("by"),
        (col("cx") + col("ox")).as("cx"), (col("cy") + col("oy")).as("cy"))
    val dx = col("ax") - col("bx")
    val dy = col("ay") - col("by")
    a.join(b, Seq("cx", "cy"))
      .filter(col("a_id") < col("b_id") && dx * dx + dy * dy <= lit(r2))
      .select(col("a_id"), col("b_id"), (dx * dx + dy * dy).as("dist2"))
  }

  /** Grid-density clustering — DBSCAN's scalable grid approximation: a
    * cell of side `cellSize` is CORE when it holds ≥ `minPts` points, and
    * clusters are the connected components of 8-adjacent core cells.
    * Returns one row per cluster: (cluster_id = min member cell id,
    * n_cells, n_points). The reference clusters only by exact key
    * equality (its ⊕-aggregate groups); density clustering is the spatial
    * analog a curation pipeline needs (embedding-map hotspots, geo
    * burst detection) built from the same two primitives this file and
    * [[graft.pipeline.Components]] already own.
    *
    * Scale: the corpus-sized input is reduced to cell counts by ONE
    * map-side-combined aggregate; everything after (adjacency join,
    * component rounds) runs on |core cells| rows — bounded by the grid,
    * orders of magnitude below the point count. The adjacency is the same
    * count-once 3×3 replicate equi-join as [[gridDistanceJoin]] (no
    * quadratic cell pairing), and the (0,0) offset yields each core
    * cell's self-edge, so isolated core cells keep a label.
    *
    * Precondition: x, y ∈ [0, 2²⁰·cellSize) so cell_id = cx·2²⁰ + cy is
    * injective (both engines compute it with plain integer arithmetic).
    */
  def gridDensityClusters(points: DataFrame, cellSize: Long, minPts: Long): DataFrame = {
    val cells = points
      .selectExpr(s"x div ${cellSize}L AS cx", s"y div ${cellSize}L AS cy")
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n_points"))
    val core = cells.filter(col("n_points") >= minPts)
      .withColumn("cell_id", col("cx") * lit(1048576L) + col("cy"))
    val a = core.select(col("cell_id").as("ca"), col("cx"), col("cy"))
    val b = core
      .withColumn("ox", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("oy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("cell_id").as("cb"),
        (col("cx") + col("ox")).as("cx"), (col("cy") + col("oy")).as("cy"))
    val edges = a.join(b, Seq("cx", "cy")).select(col("ca"), col("cb"))
    val labels = graft.pipeline.Components
      .connectedComponents(edges, "ca", "cb")
      .select(col("doc_id").as("cell_id"), col("cluster_id"))
    labels.join(core.select(col("cell_id"), col("n_points")), Seq("cell_id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n_points")).as("n_points"))
  }
}
