package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINING — the tokenizer-construction step of
  * an LLM data pipeline (Sennrich et al., ACL'16): per round, count
  * adjacent symbol pairs across the (frequency-weighted) word vocabulary,
  * pick the most frequent pair, and greedily merge it left-to-right in
  * every word. The output is the merge table itself — (round, sym_a,
  * sym_b, pair_count) — the artifact a tokenizer ships.
  *
  * Determinism contract: the argmax is total-ordered by (count DESC,
  * sym_a ASC, sym_b ASC) and the merge is the standard greedy
  * left-to-right scan, so the DuckDB oracle ([[oracleCtes]], generated
  * from the same round count — the kCoreOracleCtes anti-drift pattern)
  * lands on the identical merge table. The two engines use DIFFERENT
  * formulations of the same greedy scan — a lookbehind fold here (one
  * partition-local HOF pass per word, no shuffle), a run-parity window
  * chain there (lookbehind folds need list-typed accumulators DuckDB's
  * list_reduce lacks) — equal because merges can only be adjacent when
  * sym_a = sym_b, where greedy keeps exactly the even offsets of each
  * maximal run ([[BpeSpec]] pins the equivalence, runs included).
  *
  * Scale shape: everything after the one word-count aggregation operates
  * on the VOCABULARY (distinct words), not the corpus; each round is one
  * map-side-combined pair count over that frame, a 1-row argmax
  * (TakeOrdered, no global sort), and one broadcast-join + fold map pass.
  * The vocabulary is re-localCheckpointed per round (the Components
  * lineage-cut discipline), so round plans never compound.
  */
object Bpe {

  def merges(docs: DataFrame, rounds: Int = 3): DataFrame = {
    val emptySyms = slice(col("syms"), 1, 0) // typed array<string> empty literal
    var vocab = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      // split-by-empty-regex keeps a trailing "" (Spark splits with limit
      // -1); drop it rather than slicing — defensive against both shapes
      .select(col("cnt"), filter(split(col("w"), ""), x => x =!= "").as("syms"))
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      vocab = vocab.localCheckpoint(true) // one materialization feeds pair count + merge
      val pairs = vocab.select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("sym_a"), col("p.b").as("sym_b"))
        .agg(sum(col("cnt")).as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("sym_a"), col("sym_b")).limit(1)
        .localCheckpoint(true) // 1 row; feeds the output AND the merge join
      val row = best.select(lit(r.toLong).as("round"),
        col("sym_a"), col("sym_b"), col("pair_count"))
      out = Some(out.fold(row)(_.union(row)))
      // greedy left-to-right merge as a lookbehind fold: a just-merged
      // element (sym_a||sym_b) can never equal sym_a again (sym_b is
      // non-empty), so "last element = sym_a" exactly marks mergeable
      // boundaries and runs resolve to even offsets — true greedy
      vocab = vocab.crossJoin(broadcast(best))
        .select(col("cnt"), aggregate(col("syms"), emptySyms,
          (acc, x) => when( // try_: NULL (not ANSI error) on the empty acc
              try_element_at(acc, lit(-1)) === col("sym_a") && x === col("sym_b"),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(col("sym_a"), col("sym_b")))))
            .otherwise(concat(acc, array(x)))).as("syms"))
    }
    out.get
  }

  /** DuckDB twin of [[merges]], generated from the same round count, over
    * a caller-supplied corpus view `documents(text)`. Greedy-merge
    * replay: mark matching positions, split them into maximal runs
    * (gaps-and-islands), merge the ODD 1-based offsets of each run
    * (= greedy's even 0-based), drop each merge's consumed partner via a
    * lag, and reassemble the symbol list in position order. The final
    * SELECT unions the per-round argmax rows.
    */
  def oracleCtes(rounds: Int): String = {
    val sb = new StringBuilder(
      """w0 AS MATERIALIZED (
           SELECT x AS w, count(*)::BIGINT AS cnt
           FROM documents,
                unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS u(x)
           GROUP BY 1),
         v0 AS MATERIALIZED (
           SELECT w, cnt, [w[i] for i in range(1, length(w) + 1)] AS syms FROM w0)""")
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
         p$r AS (
           SELECT syms[i] AS sym_a, syms[i + 1] AS sym_b, sum(cnt)::BIGINT AS pair_count
           FROM v$p, unnest(range(1, len(syms))) t(i) GROUP BY 1, 2),
         b$r AS MATERIALIZED (
           SELECT sym_a, sym_b, pair_count FROM p$r
           ORDER BY pair_count DESC, sym_a, sym_b LIMIT 1),
         pos$r AS (
           SELECT v.w, v.cnt, t.i, v.syms[t.i] AS s,
                  (v.syms[t.i] = b.sym_a AND t.i < len(v.syms)
                   AND v.syms[t.i + 1] = b.sym_b) AS mt
           FROM v$p v CROSS JOIN b$r b, unnest(range(1, len(v.syms) + 1)) t(i)),
         mg$r AS (
           SELECT *, mt AND (row_number() OVER (
                  PARTITION BY w, mt, i - rn ORDER BY i) % 2 = 1) AS do_merge
           FROM (SELECT *, row_number() OVER (PARTITION BY w, mt ORDER BY i) AS rn
                 FROM pos$r)),
         v$r AS MATERIALIZED (
           SELECT w, cnt, list(CASE WHEN do_merge THEN s || nxt ELSE s END ORDER BY i) AS syms
           FROM (SELECT *, coalesce(lag(do_merge) OVER (PARTITION BY w ORDER BY i), false)
                             AS prev_merge,
                        lead(s) OVER (PARTITION BY w ORDER BY i) AS nxt
                 FROM mg$r)
           WHERE NOT prev_merge GROUP BY w, cnt)""")
    }
    sb.append("\n         ")
    sb.append((1 to rounds).map(r =>
      s"SELECT $r::BIGINT AS round, sym_a, sym_b, pair_count FROM b$r")
      .mkString("\n         UNION ALL "))
    sb.toString
  }
}
