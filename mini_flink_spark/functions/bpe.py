"""Distributed BPE merge learning — the tokenizer-training step of an
LLM data pipeline (Sennrich et al., ACL 2016), restated for Spark.

Shape (the part that matters at 100 TB): the corpus is touched ONCE — a
single shuffle aggregates it to the word-frequency vocabulary (millions of
rows for a trillion-token corpus, because Zipf). Every merge round then runs
on the *vocabulary table*, not the corpus: one pair-count aggregation
(map-side partials absorb the Zipf head) + one driver-side argmax of a
single row — the same bounded-driver-state iteration pattern as
`clustering.kmeans_fit` (k·d doubles there, one pair string here).

Merge application uses the sentinel-marker string form: a word's working
state is its units each prefixed with '_' and space-joined ('hello' →
'_h _e _l _l _o'), so replacing '_a _b' → '_ab' (plain, non-overlapping,
left-to-right — identical semantics in Spark `replace` and DuckDB
`replace`) applies the merge exactly like greedy BPE: it can never match a
unit *suffix* (markers only occur at unit starts) and chained occurrences
all merge ('_a _b _a _b' → '_ab _ab').

Determinism: round winner = max summed frequency, ties broken by pair
string ascending — integer counts and ASCII compare, no floats anywhere.

Reference parity: the reference engine has no tokenizer surface; this
extends its WordCount-style keyed aggregation
(flink-examples/.../wordcount/WordCount.java:12-35) into vocabulary
construction for the LLM-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mini_flink_spark.functions.text import tokens, tokens_sql


def _seed_state(word: F.Column) -> F.Column:
    """'hello' -> '_h _e _l _l _o' (sentinel-marked char units)."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.concat(F.lit("_"), F.substring(word, i, 1)),
        ),
        " ",
    )


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 3,
) -> DataFrame:
    """Learn `rounds` BPE merges over the corpus; returns one row per round:
    (round int, pair string, cnt bigint) — the merge table a tokenizer ships.

    Driver state per round is ONE (pair, count) row; the corpus-sized work
    (vocab build) happens exactly once up front.
    """
    spark = df.sparkSession
    parts = spark.sparkContext.defaultParallelism
    wc = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    state = wc.select(_seed_state(F.col("w")).alias("s"), "cnt")
    # rounds iterate on the vocab table: cache it once (tiny vs corpus)
    state = state.repartition(min(parts, 8)).localCheckpoint(eager=True)
    out = []
    for r in range(1, rounds + 1):
        u = F.split(F.col("s"), " ")
        pairs = F.transform(
            F.when(F.array_size(u) >= 2, F.sequence(F.lit(1), F.array_size(u) - 1))
            .otherwise(F.array().cast("array<int>")),
            lambda i: F.concat(
                F.element_at(u, i), F.lit(" "), F.element_at(u, i + 1)
            ),
        )
        best = (
            state.select(F.explode(pairs).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0].pair, int(best[0].c)
        out.append((r, pair, cnt))
        # merged unit = single marker + concatenated unit CONTENTS: '_h _e'
        # -> '_he', never '_h_e'. Keeping the second unit's marker inside the
        # merged unit would break the markers-only-at-unit-starts invariant
        # and let a later pattern ('_e _l') false-match a unit suffix.
        merged = "_" + pair.replace("_", "").replace(" ", "")
        state = state.select(
            F.replace(F.col("s"), F.lit(pair), F.lit(merged)).alias("s"), "cnt"
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(out, "round int, pair string, cnt bigint")


def _learn_ctes(text_col: str, table: str, rounds: int) -> list[str]:
    """The merge-learning CTE chain (wc, w0, p{r}/b{r}/w{r}) shared by the
    learn oracle and the encode oracle — one definition, so the two stay
    bit-identical on what the merges ARE."""
    toks = tokens_sql(text_col)
    parts = [
        f"""wc AS (
  SELECT w, count(*)::BIGINT AS cnt FROM (
    SELECT unnest({toks}) AS w FROM {table}) WHERE length(w) > 0 GROUP BY w
),
w0 AS (
  SELECT array_to_string(
           list_transform(range(1, length(w) + 1), i -> '_' || w[i]), ' ') AS s,
         cnt
  FROM wc
)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"""p{r} AS (
  SELECT pair, sum(cnt)::BIGINT AS c FROM (
    SELECT unnest(list_transform(range(1, len(u)), i -> u[i] || ' ' || u[i+1])) AS pair,
           cnt
    FROM (SELECT string_split(s, ' ') AS u, cnt FROM {prev})
  ) GROUP BY pair
),
b{r} AS (SELECT pair, c FROM p{r} ORDER BY c DESC, pair ASC LIMIT 1),
w{r} AS (
  SELECT replace(s, (SELECT pair FROM b{r}),
                 '_' || replace(replace((SELECT pair FROM b{r}), '_', ''), ' ', '')) AS s,
         cnt
  FROM {prev}
)"""
        )
    return parts


def bpe_learn_merges_sql(
    text_col: str = "text", table: str = "documents", rounds: int = 3
) -> str:
    """DuckDB twin: the same rounds unrolled as chained CTEs; each round's
    winner is a LIMIT-1 scalar CTE applied via scalar subqueries."""
    parts = _learn_ctes(text_col, table, rounds)
    sel = [
        f"SELECT {r}::INT AS round, pair, c::BIGINT AS cnt FROM b{r}"
        for r in range(1, rounds + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def bpe_encode_counts(
    df: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rounds: int = 3,
) -> DataFrame:
    """Apply BPE merges learned on `corpus` to every document of `df`:
    per doc, the whitespace word count and the total BPE unit count after
    the merges — the learn→apply tokenizer round trip (compression ratio =
    n_units / sum of word lengths).

    The merge table is driver state (`rounds` rows — the same bounded shape
    as the learning loop), and APPLYING it is a chain of `rounds` string
    replaces over the sentinel-marked word state: pure codegen projection,
    zero Python, zero extra shuffle beyond the per-doc count agg. At any
    corpus size the encode pass is a linear scan; the vocab-sized learning
    cost is paid once (or skipped entirely when the merge table is a
    persisted artifact)."""
    merges = sorted(
        (int(r.round), r.pair) for r in bpe_learn_merges(corpus, text_col, rounds).collect()
    )
    words = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("w")
    ).filter(F.length("w") > 0)
    # Encode per DISTINCT word, not per occurrence (r11): the seed-state
    # build is an interpreted per-char lambda and the replace chain runs
    # per row, but a word's unit count depends only on the word — so the
    # chain runs over the vocabulary (Zipf: millions of rows against a
    # trillion-occurrence corpus) and the occurrence stream just joins the
    # (word, units) table (unforced: broadcasts while the vocab fits,
    # falls back to a shuffle join of 8-byte-ish rows). Identical counts
    # by construction — the same vocabulary-not-corpus shape the learning
    # loop already uses.
    vocab = words.select("w").distinct()
    s = _seed_state(F.col("w"))
    for _, pair in merges:
        merged = "_" + pair.replace("_", "").replace(" ", "")
        s = F.replace(s, F.lit(pair), F.lit(merged))
    u_tbl = vocab.select("w", F.array_size(F.split(s, " ")).alias("u"))
    return (
        words.join(u_tbl, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("u").cast("bigint").alias("n_units"),
        )
    )


def bpe_encode_counts_sql(
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    rounds: int = 3,
) -> str:
    """DuckDB twin: the SAME learning CTE chain (shared `_learn_ctes`, so the
    merges are identical by construction), then the encode chain e1..e{rounds}
    applying each round's winner via a scalar-subquery replace."""
    toks = tokens_sql(text_col)
    parts = _learn_ctes(text_col, table, rounds)
    parts.append(
        f"""words AS (
  SELECT {id_col} AS id, w FROM (
    SELECT {id_col}, unnest({toks}) AS w FROM {table}) WHERE length(w) > 0
)"""
    )
    parts.append(
        """e0 AS (
  SELECT id, array_to_string(
           list_transform(range(1, length(w) + 1), i -> '_' || w[i]), ' ') AS s
  FROM words
)"""
    )
    for r in range(1, rounds + 1):
        parts.append(
            f"""e{r} AS (
  SELECT id, replace(s, (SELECT pair FROM b{r}),
                 '_' || replace(replace((SELECT pair FROM b{r}), '_', ''), ' ', '')) AS s
  FROM e{r - 1}
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT id AS {id_col}, count(*)::BIGINT AS n_words,
       sum(len(string_split(s, ' ')))::BIGINT AS n_units
FROM e{rounds} GROUP BY id"""
    )
