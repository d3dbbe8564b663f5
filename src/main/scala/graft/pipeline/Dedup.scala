package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — exact and
  * near-duplicate. All operators are pure Catalyst plans (array HOFs +
  * hash-groupBy / bucket-join), no UDFs, no driver loops:
  *
  *  - exact:    hash text → groupBy hash. One shuffle keyed on a 128-bit
  *              digest; at 100 TB the shuffle carries (hash, doc_id), never
  *              the text.
  *  - MinHash:  shingle → minhash signature → LSH band buckets → candidate
  *              pairs within buckets. The band bucket-join is the scale
  *              path: candidate generation is linear in corpus size +
  *              quadratic only *within* a bucket (tiny by construction),
  *              never all-pairs.
  *  - SimHash:  64-bit signature per doc; near-dup pairs via 16-bit band
  *              buckets + Hamming-distance verify.
  *  - n-gram Jaccard: exact verify step for candidate pairs.
  */
object Dedup {

  /** Spread a DataFrame across the cluster when the source collapsed it into
    * fewer splits than cores (e.g. one small parquet file). Signature
    * computation is CPU-bound, so the one-pass reshuffle pays for itself —
    * without it a single task computes every hash (observed 83 s → 3 s at
    * sf0.1 locally).
    *
    * Gated on the *file count* (metadata-only — `inputFiles` lists the file
    * index without forcing physical planning, unlike `.rdd`, which would
    * eagerly plan the frame and bypass AQE). At 100 TB the source has
    * thousands of files and this is a no-op; in-memory frames report zero
    * files and pass through untouched — parallelism there is whatever the
    * caller created.
    */
  private[pipeline] def rebalance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files > 0 && files < target) df.repartition(target) else df
  }

  /** Whitespace tokens with empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Word k-shingles as strings ("w1 w2 w3"); docs shorter than k yield
    * their full token string as the single shingle so they still participate.
    *
    * Built by zipping the token array with its own shifted tails — O(n·k)
    * per document. (A per-index `slice` would be O(n²): slice copies.)
    */
  def shingles(toks: Column, k: Int): Column = {
    val n = size(toks)
    val joined = (2 to k).foldLeft(toks) { (acc, i) =>
      // zip_with pads the shorter side with null; concat_ws skips nulls, and
      // the final slice drops the incomplete tail shingles.
      zip_with(acc, slice(toks, lit(i), n), (a, b) => concat_ws(" ", a, b))
    }
    when(n <= k, array(concat_ws(" ", toks)))
      .otherwise(slice(joined, lit(1), n - (k - 1)))
  }

  /** k-shingle *hashes* without materializing shingle strings: hash each
    * token once, then combine k consecutive token hashes positionally
    * (zip with the array's own shifted tails). Equivalent to hashing the
    * string shingles up to 64-bit collisions, and much cheaper — no
    * per-shingle string allocation. Docs with ≤ k tokens yield one hash of
    * all tokens (mirroring `shingles`).
    */
  def shingleHashes(toks: Column, k: Int): Column = {
    val base = transform(toks, t => xxhash64(t))
    val n = size(base)
    val combined = (2 to k).foldLeft(base) { (acc, i) =>
      // tail entries mix in padding nulls; the final slice drops them
      zip_with(acc, slice(base, lit(i), n), (a, b) => xxhash64(a, b))
    }
    when(n <= k, array(aggregate(base, lit(42L), (acc, h) => xxhash64(acc, h))))
      .otherwise(slice(combined, lit(1), n - (k - 1)))
  }

  /** Exact dedup: group documents by a content digest, keep the smallest
    * doc_id as canonical, count the duplicates.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: `numHashes` minima over a column of *base hashes*
    * (one xxhash64 per shingle, computed once). The hash family is
    * h_i(x) = xxhash64(base(x), i) — each variable-length shingle string is
    * hashed exactly once; the 32 family members only re-mix the 8-byte base
    * hash, which is ~3× cheaper than re-hashing the strings per seed.
    */
  def minhashSignature(baseHashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(baseHashes, h => xxhash64(h, i))))

  /** MinHash+LSH near-duplicate candidate pairs.
    *
    * bands × rowsPerBand = numHashes. Two docs collide in a band iff that
    * band of the signature is identical; the per-band groupBy keys on
    * (band index, band hash) so the shuffle is by bucket — the classic
    * LSH plan that scales linearly with corpus size.
    *
    * Output: (doc_a, doc_b, est_jaccard) with doc_a < doc_b, est_jaccard =
    * fraction of agreeing minhashes (computed exactly once per pair after
    * bucket-dedup).
    */
  def minhashPairs(docs: DataFrame, k: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Materialize the shingle-hash array as a column before the minhash
    // pass: an inlined subexpression would be re-evaluated once per hash
    // function (numHashes×).
    val sigs = rebalance(docs)
      .select(col("doc_id"), shingleHashes(tokens(col("text")), k).as("bh"))
      .select(col("doc_id"), minhashSignature(col("bh"), numHashes).as("sig"))
      .cache() // reused: once for banding, once (positionally) for verify
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct() // a pair may collide in several bands
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")),
          v => v === 1)).cast("double") / lit(bands * rowsPerBand)).as("est_jaccard"))
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (doc_a, doc_b): |A∩B| / |A∪B| over word k-shingle sets. Used as the
    * verify stage after LSH candidate generation.
    */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, k: Int = 3): DataFrame = {
    // shingle-hash sets rather than string sets: same Jaccard up to 64-bit
    // collisions, no string materialization; cached — both join sides scan it
    val sh = rebalance(docs).select(col("doc_id"),
      array_distinct(shingleHashes(tokens(col("text")), k)).as("sh"))
      .cache()
    pairs
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_a", "sh" -> "sh_a")), Seq("doc_a"))
      .join(sh.withColumnsRenamed(Map("doc_id" -> "doc_b", "sh" -> "sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** 64-bit SimHash signature over a column of token hashes: bit i is set
    * iff more than half the token hashes have bit i set. Pure array HOFs —
    * stays in whole-stage codegen. Pass an *attribute* (materialized array),
    * not a nested expression — the body scans it 64 times.
    */
  def simhash(hashes: Column): Column = {
    val nTok = size(hashes)
    val bitsSet = transform(sequence(lit(0), lit(63)),
      i => size(filter(hashes, h => call_function("shiftright", h, i).bitwiseAND(1) === 1)))
    aggregate(
      zip_with(bitsSet, sequence(lit(0), lit(63)),
        (cnt, i) => when(cnt * 2 > nTok, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-duplicate pairs: bucket by each of the four 16-bit bands
    * (two signatures within Hamming distance 3 must agree on ≥1 band), then
    * verify Hamming distance ≤ maxHamming via popcount of XOR.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // Token hashes materialized as a column first — simhash scans them 64
    // times (once per bit); inlining the tokenizer would re-tokenize 64×.
    val sigs = rebalance(docs)
      .select(col("doc_id"), transform(tokens(col("text")), t => xxhash64(t)).as("th"))
      .select(col("doc_id"), simhash(col("th")).as("sig")).cache()
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFFL))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b")).distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
