"""Behavior tests for the round-2 continuation operators: portable sketches
(Bloom, Count-Min), BPE merge learning vs a pure-Python reference, and
span-level dedup removal on planted duplicates."""

from pyspark.sql import functions as F

from mini_flink_spark.functions import bpe as B
from mini_flink_spark.functions import dedup as D
from mini_flink_spark.functions import sketches as K


# ------------------------------------------------------------------- Bloom


def test_bloom_never_false_negative(spark):
    # Bloom's contract: members ALWAYS hit; only non-members may false-hit
    members = [(i * 7 + 3,) for i in range(200)]
    build = spark.createDataFrame(members, "k bigint")
    bloom = K.bloom_build(build, "k")
    probe = spark.createDataFrame([(i,) for i in range(2000)], "k bigint")
    out = K.bloom_probe(probe, bloom, "k").collect()
    member_set = {m[0] for m in members}
    misses = [r.k for r in out if r.k in member_set and not r.bloom_hit]
    assert misses == []
    # and the filter is actually selective: FP rate bounded well under 10%
    fps = sum(1 for r in out if r.k not in member_set and r.bloom_hit)
    non_members = 2000 - len([r for r in out if r.k in member_set])
    assert fps / non_members < 0.10


# --------------------------------------------------------------- Count-Min


def test_cms_one_sided_and_tight_when_sparse(spark):
    rows = [("a",)] * 50 + [("b",)] * 20 + [(f"x{i}",) for i in range(30)]
    items = spark.createDataFrame(rows, "tok string")
    cms = K.cms_build(items, "tok")
    exact = items.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    est = K.cms_estimate(exact, cms, "tok").collect()
    for r in est:
        assert r.cms_est >= r.exact, r  # one-sided error, always
    # 80 distinct positions into 4x2048 counters: collisions ~0 — estimates exact
    assert all(r.cms_est == r.exact for r in est)


# --------------------------------------------------------------------- BPE


def _python_bpe(word_counts: dict[str, int], rounds: int):
    """Reference greedy BPE on a word-frequency table (Sennrich'16 semantics:
    count adjacent unit pairs weighted by word frequency, merge the argmax
    everywhere left-to-right, repeat)."""
    state = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for r in range(1, rounds + 1):
        pairs: dict[tuple[str, str], int] = {}
        for units, c in state.items():
            for i in range(len(units) - 1):
                pairs[(units[i], units[i + 1])] = pairs.get((units[i], units[i + 1]), 0) + c
        if not pairs:
            break
        # max count, tie -> pair ascending by the sentinel-marked string form
        best = min(pairs.items(), key=lambda kv: (-kv[1], "_" + kv[0][0] + " _" + kv[0][1]))
        (a, b), cnt = best
        out.append((r, f"_{a} _{b}", cnt))
        new_state: dict[tuple, int] = {}
        for units, c in state.items():
            merged, i = [], 0
            while i < len(units):
                if i + 1 < len(units) and units[i] == a and units[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(units[i])
                    i += 1
            t = tuple(merged)
            new_state[t] = new_state.get(t, 0) + c
        state = new_state
    return out


def test_bpe_matches_pure_python_reference(spark):
    texts = [
        ("the cat sat on the mat",),
        ("the cat ate the rat",),
        ("a cat and a rat sat",),
    ]
    df = spark.createDataFrame(texts, "text string")
    got = [(r.round, r.pair, r.cnt) for r in B.bpe_learn_merges(df, "text", rounds=4).collect()]
    wc: dict[str, int] = {}
    for (t,) in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    assert got == _python_bpe(wc, 4)


# ------------------------------------------------------------ span removal


def test_span_removal_cuts_planted_span_only(spark):
    boiler = " ".join(f"b{i}" for i in range(15))  # exactly w=15 tokens
    rows = [
        (1, f"alpha beta {boiler} gamma"),
        (2, f"delta {boiler} epsilon zeta"),
        (3, "unrelated text with no duplication at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in D.remove_duplicate_spans(df, "doc_id", "text", w=15).collect()}
    assert out[1].clean_text == "alpha beta gamma"
    assert out[1].n_removed == 15
    assert out[2].clean_text == "delta epsilon zeta"
    assert out[2].n_removed == 15
    assert out[3].n_removed == 0
    assert out[3].clean_text == rows[2][1]


def test_duplicate_span_inventory_counts(spark):
    boiler = " ".join(f"b{i}" for i in range(15))
    rows = [(1, boiler), (2, boiler), (3, f"{boiler} extra")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    inv = D.duplicate_spans(df, "doc_id", "text", w=15).collect()
    # the single 15-token span occurs once in docs 1,2 and once in doc 3
    exact = [r for r in inv if r.n_docs == 3]
    assert len(exact) == 1 and exact[0].n_occ == 3


def test_cms_sketches_merge_by_addition(spark):
    # THE CMS scale property: sketch(A ∪ B) == sketch(A) + sketch(B) —
    # counter tables from disjoint corpus shards add cell-wise
    a = spark.createDataFrame([("a",)] * 30 + [("b",)] * 7, "tok string")
    b = spark.createDataFrame([("a",)] * 12 + [("c",)] * 9, "tok string")
    both = a.union(b)
    merged = (
        K.cms_build(a, "tok")
        .union(K.cms_build(b, "tok"))
        .groupBy("row", "pos")
        .agg(F.sum("c").alias("c"))
    )
    direct = K.cms_build(both, "tok")
    assert (
        sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
    )


def test_span_inventory_and_removal_agree(spark, sf_dir):
    # relationship pin: a doc's clean_text must be its token stream minus
    # EXACTLY the positions covered by inventory spans; docs with no dup
    # spans pass through with n_removed == 0 and full token count
    from mini_flink_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = D.remove_duplicate_spans(docs, "doc_id", "text", w=15).collect()
    for r in out:
        assert 0 <= r.n_removed <= r.n_tokens
        kept = len(r.clean_text.split(" ")) if r.clean_text else 0
        assert kept == r.n_tokens - r.n_removed


def test_packed_sequences_invariants(spark, sf_dir):
    from mini_flink_spark.queries import QUERIES

    rows = QUERIES["packed_sequence_offsets"].fn(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        assert 0 <= r.start_pos < 2048
        assert r.seq_id >= 0
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        # global offsets (seq_id*2048 + start_pos) are the exact prefix sums
        # of n_tokens in SOME order: sorted offsets must tile contiguously
        offs = sorted((r.seq_id * 2048 + r.start_pos, r.n_tokens) for r in rs)
        cum = 0
        for off, n in offs:
            assert off == cum, (lang, off, cum)
            cum += n


# ------------------------------------------------- sharded source overlap
def test_source_overlap_shards_past_63_sources(spark):
    """80 sources (> one 63-bit mask word) with engineered overlap: source i
    shares shingles with source i+1. Overlap is verified against a Python
    set oracle computed from the same normalize/shingle semantics."""
    import re

    from mini_flink_spark.queries_ext import source_overlap

    n_src = 80
    rows = []
    # source i emits two 3-token phrases: one shared with i+1, one unique;
    # tokens are alnum so normalization is the identity
    for i in range(n_src):
        rows.append((f"s{i:03d}", f"shared{i} link{i} common{i}"))
        rows.append((f"s{i:03d}", f"only{i} unique{i} token{i}"))
        if i + 1 < n_src:
            rows.append((f"s{i + 1:03d}", f"shared{i} link{i} common{i}"))
    docs = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r.src_a, r.src_b): (r.n_common, r.jaccard)
        for r in source_overlap(docs).collect()
    }
    # python oracle
    def shingle_set(texts):
        out = set()
        for t in texts:
            toks = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip().split(" ")
            out |= {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return out

    by_src: dict[str, list[str]] = {}
    for s, t in rows:
        by_src.setdefault(s, []).append(t)
    sets = {s: shingle_set(ts) for s, ts in by_src.items()}
    srcs = sorted(sets)
    assert len(got) == n_src * (n_src - 1) // 2
    for ai, a in enumerate(srcs):
        for b in srcs[ai + 1 :]:
            common = len(sets[a] & sets[b])
            jac = round(common / len(sets[a] | sets[b]), 6)
            assert got[(a, b)] == (common, jac), (a, b, got[(a, b)], (common, jac))


def test_blank_docs_tokenize_empty_and_span_invariants_hold(spark):
    """Blank/whitespace-only docs: tokens() must yield [] (not ['']), span
    removal must report n_tokens=0, and incremental span dedup must still
    emit a row per new doc (0, 0) so 'no dup spans' is distinguishable from
    'doc absent' (ADVICE r2 items 1 and 3)."""
    from mini_flink_spark.functions import text as T

    docs = spark.createDataFrame(
        [(1, "real tokens here and more of them right"), (2, ""), (3, "   "),
         (4, "short doc")],
        "doc_id bigint, text string",
    )
    tok = {r.doc_id: r.n for r in docs.select(
        "doc_id", F.array_size(T.tokens("text")).alias("n")).collect()}
    assert tok[2] == 0 and tok[3] == 0 and tok[4] == 2
    rem = {r.doc_id: (r.n_tokens, r.n_removed)
           for r in D.remove_duplicate_spans(docs, w=3).collect()}
    assert rem[2] == (0, 0) and rem[3] == (0, 0)
    inc = {r.doc_id: (r.n_spans, r.n_dup_spans)
           for r in D.incremental_duplicate_spans(docs, new_pred="doc_id >= 2", w=3).collect()}
    # every new doc present, short/blank docs report (0, 0)
    assert set(inc) == {2, 3, 4}
    assert inc[2] == (0, 0) and inc[3] == (0, 0) and inc[4] == (0, 0)


def test_sketch_probes_survive_colliding_column_names(spark):
    """A probe frame that already carries the sketches' former internal
    column names (bits, pos0, c0, _est_acc) must not hit ambiguous-reference
    errors or wrong output (ADVICE r2 item 2)."""
    build = spark.createDataFrame([(f"k{i}",) for i in range(50)], "key string")
    bloom = K.bloom_build(build, "key")
    cms = K.cms_build(build, "key")
    probe = spark.createDataFrame(
        [("k1", [1], 7, 8, 9), ("nope", [2], 7, 8, 9)],
        "key string, bits array<bigint>, pos0 int, c0 int, _est_acc int",
    )
    b = {r.key: r.bloom_hit for r in K.bloom_probe(probe, bloom, "key").collect()}
    assert b["k1"] is True
    e = {r.key: r.cms_est for r in K.cms_estimate(probe, cms, "key").collect()}
    assert e["k1"] >= 1 and e["nope"] >= 0
    # caller columns pass through untouched
    cols = set(K.cms_estimate(probe, cms, "key").columns)
    assert {"key", "bits", "pos0", "c0", "_est_acc", "cms_est"} <= cols


def test_intradoc_block_dedup_removes_repeated_blocks(spark):
    """A doc built as [X Y X Z] in 10-token blocks keeps X once; a doc with
    unique blocks is untouched; a short doc (< one block) passes through."""
    X = " ".join(f"x{i}" for i in range(10))
    Y = " ".join(f"y{i}" for i in range(10))
    Z = " ".join(f"z{i}" for i in range(10))
    U = " ".join(f"u{i}" for i in range(25))  # 2.5 blocks, all unique
    docs = spark.createDataFrame(
        [(1, f"{X} {Y} {X} {Z}"), (2, U), (3, "tiny doc")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in D.intradoc_block_dedup(docs, w=10).collect()}
    assert out[1].n_blocks == 4 and out[1].n_dropped == 1
    assert out[1].clean_text == f"{X} {Y} {Z}"
    assert out[2].n_blocks == 3 and out[2].n_dropped == 0 and out[2].clean_text == U
    assert out[3].n_blocks == 1 and out[3].n_dropped == 0
    assert out[3].clean_text == "tiny doc"


def test_text_entropy_ordering_and_bounds(spark):
    """Degenerate text scores ~0, uniform-alphabet text scores ln(k), mixed
    natural-ish text in between; uppercase is folded before counting."""
    import math

    from mini_flink_spark.queries import QUERIES
    import tempfile, os
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(1, "aaaaaaaaaaaa"), (2, "abcdefgh"), (3, "The Quick Brown"), (4, "AaAa")],
        "doc_id bigint, text string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r.entropy for r in QUERIES["text_entropy"].fn(spark, d).collect()}
    assert out[1] == 0.0
    assert abs(out[2] - round(math.log(8), 6)) < 1e-9
    assert 0 < out[3] <= math.log(15) + 1e-9
    assert out[4] == 0.0  # case-folded: all 'a'


def test_global_rank_is_dense_total_permutation(spark):
    """The two-pass distributed rank must produce exactly 1..N with no gaps
    or dupes and agree with the single-partition window reference."""
    from mini_flink_spark.queries import QUERIES
    import os, tempfile

    d = tempfile.mkdtemp()
    docs = spark.range(0, 3000).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, cast(pmod(id * 37, 50) + 1 as int)), i -> 'w')) AS text",
    )
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = QUERIES["curriculum_global_rank"].fn(spark, d).collect()
    ranks = sorted(r.rank for r in out)
    assert ranks == list(range(1, 3001))
    by_key = sorted(out, key=lambda r: (-r.n_tokens, r.doc_id))
    assert [r.rank for r in by_key] == list(range(1, 3001))

    # round 9 (VERDICT r8 #7): the two-pass persist(DISK_ONLY) +
    # driver-collected offsets + mapInPandas stamp is gone — the rank is
    # the pure-Catalyst range-sliced construction. Pin the new contract:
    # no Python eval node and no driver-side offset collection in the plan
    # (the bounded-sort shape itself is pinned in test_plans).
    plan = (
        QUERIES["curriculum_global_rank"]
        .fn(spark, d)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan
    assert "InMemoryTableScan" not in plan  # no persist in the new shape


def test_histogram_quantiles_error_bounded_by_bin_width(spark):
    """Estimates must sit within one bin width of the exact quantiles."""
    from mini_flink_spark.functions.sketches import HIST_BINS, HIST_HI, HIST_LO, histogram_quantiles

    df = spark.range(0, 20000).selectExpr("cast(pmod(id * 97, 500) as double) + 0.25 AS v")
    got = {r.q: r.est for r in histogram_quantiles(df, "v").collect()}
    exact = df.selectExpr(
        "percentile(v, 0.5) p50", "percentile(v, 0.9) p90", "percentile(v, 0.99) p99"
    ).collect()[0]
    width = (HIST_HI - HIST_LO) / HIST_BINS
    assert abs(got[0.5] - exact.p50) <= width + 1e-9
    assert abs(got[0.9] - exact.p90) <= width + 1e-9
    assert abs(got[0.99] - exact.p99) <= width + 1e-9
