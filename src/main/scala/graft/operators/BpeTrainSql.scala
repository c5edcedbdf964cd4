package graft.operators

/** DuckDB oracle twins for [[BpeTrain]] — the merge count is a fixed
  * hyperparameter, so the iterative trainer unrolls into a chain of
  * `merges` MATERIALIZED CTE rounds (VERDICT r12 #1). Each round
  * mirrors the Spark side exactly:
  *
  *  - `pc{k}`   adjacent-pair counts weighted by word frequency;
  *  - `top{k}`  the argmax, deterministic by (n DESC, left, right) —
  *              the same total order [[BpeTrain.train]] collects;
  *  - `mt{k}`   match positions of the winning pair inside each word;
  *  - `tk{k}`   the GREEDY non-overlapping subset: within a maximal
  *              run of consecutive match positions (gaps-and-islands
  *              via `i - row_number()`), keep every other match
  *              starting from the run head — set-algebra for the
  *              left-to-right fold of [[BpeTrain.mergePair]]
  *              ("aaaa" + (a,a) -> "aa","aa");
  *  - `w{k+1}`  the rewrite: position j emits the merged token when j
  *              is a kept match, is dropped when j-1 is (the consumed
  *              right symbol), else passes through.
  *
  * `AS MATERIALIZED` is load-bearing: DuckDB inlines plain CTEs, and
  * each round references its predecessor ~4 times, so without it the
  * 12-round chain would re-expand the base scan 4^12 times.
  *
  * Exhaustion (no pair reaching `minCount`) is handled naturally: an
  * empty `top{k}` makes `mt{k}`/`tk{k}` empty, `w{k+1}` an identity
  * rewrite, and contributes no row to the final union — matching
  * train()'s early stop.
  */
object BpeTrainSql {

  /** One merge round: consumes `w{k}(wid, word, freq, syms)`, defines
    * `top{k}` and `w{k+1}`. */
  private def roundSql(k: Int, minCount: Long): String =
    s"""pc$k AS MATERIALIZED (SELECT syms[i] AS l, syms[i+1] AS r,
      CAST(sum(freq) AS BIGINT) AS n
    FROM w$k, UNNEST(range(1, len(syms))) AS u(i)
    GROUP BY 1, 2),
  top$k AS MATERIALIZED (SELECT l, r, n FROM pc$k WHERE n >= $minCount
    ORDER BY n DESC, l, r LIMIT 1),
  mt$k AS MATERIALIZED (SELECT w.wid, CAST(u.i AS BIGINT) AS i,
      t.l || t.r AS m
    FROM w$k w, top$k t, UNNEST(range(1, len(w.syms))) AS u(i)
    WHERE w.syms[CAST(u.i AS INT)] = t.l
      AND w.syms[CAST(u.i AS INT) + 1] = t.r),
  tk$k AS MATERIALIZED (SELECT wid, i, m FROM (
      SELECT wid, i, m, min(i) OVER (PARTITION BY wid, i - rn) AS i0
      FROM (SELECT wid, i, m,
          row_number() OVER (PARTITION BY wid ORDER BY i) AS rn
        FROM mt$k))
    WHERE (i - i0) % 2 = 0),
  w${k + 1} AS MATERIALIZED (
    SELECT p.wid, p.word, p.freq,
      list(coalesce(th.m, p.s) ORDER BY p.j) AS syms
    FROM (SELECT w.wid, w.word, w.freq, CAST(u.j AS BIGINT) AS j,
          w.syms[CAST(u.j AS INT)] AS s
        FROM w$k w, UNNEST(range(1, len(w.syms) + 1)) AS u(j)) p
    LEFT JOIN tk$k th ON p.wid = th.wid AND p.j = th.i
    LEFT JOIN tk$k tp ON p.wid = tp.wid AND p.j = tp.i + 1
    WHERE tp.wid IS NULL
    GROUP BY 1, 2, 3)"""

  /** Shared prefix: tokenize (same regex family as `graft_tokens`),
    * fold to the distinct-word frequency table, seed `w0` with the
    * char symbols + `</w>` terminal. */
  private def chain(merges: Int, minCount: Long): String = {
    val rounds = (0 until merges).map(roundSql(_, minCount)).mkString(",\n  ")
    s"""WITH dtk AS MATERIALIZED (SELECT doc_id,
      list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
        AS toks
    FROM documents),
  wf AS MATERIALIZED (SELECT word, count(*) AS freq
    FROM (SELECT unnest(toks) AS word FROM dtk) GROUP BY 1),
  w0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY word) AS wid,
      word, freq,
      list_append([word[i] for i in range(1, len(word) + 1)],
        '${BpeTrain.EndOfWord}') AS syms
    FROM wf),
  $rounds"""
  }

  /** Twin of [[BpeTrain.train]]: the learned merge table
    * `(rank, left, right, merged, n)` in learned order. */
  def trainSql(merges: Int = 12, minCount: Long = 2L): String = {
    val union = (0 until merges)
      .map(k => s"SELECT $k AS k, l, r, n FROM top$k")
      .mkString(" UNION ALL ")
    s"""${chain(merges, minCount)}
  SELECT CAST(k AS BIGINT) AS rank, l AS "left", r AS "right",
    l || r AS merged, n
  FROM ($union) ORDER BY rank"""
  }

  /** Twin of [[BpeTrain.encode]] over the merges [[BpeTrain.train]]
    * learns on the SAME corpus (exactly what the `llm_bpe_encode`
    * query does): the final word table `w{merges}` IS the encoded
    * piece sequence per word — train's per-round rewrite and encode's
    * rank-order rule application are the same fold — joined back to
    * every (doc, word position). */
  def encodeSql(merges: Int = 12, minCount: Long = 2L): String =
    s"""${chain(merges, minCount)},
  tokpos AS MATERIALIZED (SELECT doc_id, CAST(u.i AS BIGINT) AS word_pos,
      toks[CAST(u.i AS INT)] AS word
    FROM dtk, UNNEST(range(1, len(toks) + 1)) AS u(i))
  SELECT t.doc_id, t.word_pos, CAST(v.j AS BIGINT) AS piece_pos,
    e.syms[CAST(v.j AS INT)] AS piece
  FROM tokpos t JOIN w$merges e USING (word),
    UNNEST(range(1, len(e.syms) + 1)) AS v(j)"""
}
