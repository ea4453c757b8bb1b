"""Curation, repetition, scrub, plot-sink, and timer operators —
semantics on crafted fixtures (the synthetic corpus exercises them at
scale via the oracle gate; these pin edge cases)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datatools_spark.operators.curation import (
    contamination_counts, deterministic_sample, source_balanced_sample,
    uniform_hash_col)
from datatools_spark.operators.plotsink import plot_envelope, to_plot_frame
from datatools_spark.operators.text import repetition_stats, scrub_cols
from datatools_spark.functions.timers import (
    action_timer, runtime, runtime_str, timer)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def test_repetition_stats_degenerate_vs_clean(spark):
    df = _docs(spark, [
        (1, "spam spam spam spam", "a"),          # 1 distinct word, 1 bigram
        (2, "one two three four", "a"),           # no repetition
        (3, "", "a"),                             # blank
        (4, "solo", "a"),                         # < gram_n words
    ])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["dup_word_frac"] == pytest.approx(0.75)
    assert out[1]["top_ngram_frac"] == pytest.approx(1.0)  # 'spam spam' x3
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["top_ngram_frac"] == pytest.approx(1.0 / 3.0)
    assert out[3]["n_words"] == 0 and out[3]["dup_word_frac"] == 0.0
    assert out[4]["top_ngram_frac"] == 0.0


def test_scrub_counts_and_replacement(spark):
    df = _docs(spark, [
        (1, "mail me@example.com or visit https://x.io/a?b=1 ref 123456789", "a"),
        (2, "clean text only", "a"),
    ])
    c = scrub_cols("text")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", c["n_urls"].alias("u"), c["n_emails"].alias("e"),
        c["n_longnums"].alias("n"), c["scrubbed"].alias("s")).collect()}
    assert (out[1]["u"], out[1]["e"], out[1]["n"]) == (1, 1, 1)
    assert out[1]["s"] == "mail <EMAIL> or visit <URL> ref <NUM>"
    assert out[2]["s"] == "clean text only"


def test_contamination_counts_broadcast_membership(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta", "b")])
    corpus = _docs(spark, [
        (1, "alpha beta gamma epsilon", "a"),   # shares 'alpha beta gamma'
        (2, "zeta eta theta iota", "a"),        # clean
    ])
    out = {r["doc_id"]: r for r in
           contamination_counts(corpus, bench).collect()}
    assert out[1]["n_contaminated"] == 1 and out[1]["contaminated"]
    assert out[2]["n_contaminated"] == 0 and not out[2]["contaminated"]


def test_deterministic_sample_reproducible_and_unbiased(spark):
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    a = deterministic_sample(df, 0.3).count()
    b = deterministic_sample(df, 0.3).count()
    assert a == b                      # exact replay
    assert abs(a / 20000 - 0.3) < 0.02  # unbiased
    # monotone: raising the rate only ADDS rows (hash is per-row fixed)
    low = {r["doc_id"] for r in deterministic_sample(df, 0.1).collect()}
    high = {r["doc_id"] for r in deterministic_sample(df, 0.3).collect()}
    assert low <= high


def test_uniform_hash_range(spark):
    df = spark.range(1000)
    mm = df.select(F.min(uniform_hash_col(F.col("id"))).alias("lo"),
                   F.max(uniform_hash_col(F.col("id"))).alias("hi")).first()
    assert 0.0 <= mm["lo"] and mm["hi"] < 1.0


def test_source_balanced_sample_equalizes_tokens(spark):
    rows = [(i, "w " * 10, "big") for i in range(3000)]
    rows += [(10000 + i, "w " * 10, "small") for i in range(300)]
    df = _docs(spark, rows)
    out = {r["source"]: r["t"] for r in
           source_balanced_sample(df)
           .groupBy("source").agg(F.sum("_tok").alias("t")).collect()}
    # both sources should land near the smallest source's budget
    assert out["small"] == 300 * 10  # rate 1.0: kept whole
    assert abs(out["big"] - 300 * 10) / (300 * 10) < 0.15


def test_plot_envelope_matches_brute_force(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", t0 + dt.timedelta(minutes=13 * i), float((i * 7) % 23))
            for i in range(500)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    env = {(r["event_type"], r["bucket"]): r
           for r in plot_envelope(df, partition_by=["event_type"],
                                  bucket="6 hours").collect()}
    import collections
    buckets = collections.defaultdict(list)
    for et, ts, v in rows:
        epoch = int((ts - dt.datetime(1970, 1, 1)).total_seconds())
        b = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=epoch // 21600 * 21600)
        buckets[(et, b)].append((v, ts))
    assert set(env) == set(buckets)
    for k, pts in buckets.items():
        vmin = min(p[0] for p in pts)
        vmax = max(p[0] for p in pts)
        assert env[k]["v_min"] == vmin
        assert env[k]["v_max"] == vmax
        # first-occurrence tie pin on both extremes
        assert env[k]["t_min"] == min(t for v, t in pts if v == vmin)
        assert env[k]["t_max"] == min(t for v, t in pts if v == vmax)
        assert env[k]["n"] == len(pts)


def test_to_plot_frame_guards_unbounded_collect(spark):
    df = spark.range(50).select(
        F.lit("a").alias("event_type"), F.col("id").alias("n"))
    pdf = to_plot_frame(df, max_rows=100)
    assert len(pdf) == 50
    with pytest.raises(ValueError, match="exceed"):
        to_plot_frame(df, max_rows=10)


def test_timers_reference_semantics(capsys):
    assert runtime_str(5.0) == "05 seconds"
    assert runtime_str(125.0) == "02:05"
    assert runtime(None) is None          # falsy no-op, as in reference
    import time
    s = runtime(time.time() - 3)
    assert "seconds" in s

    @timer
    def f(x):
        return x + 1

    assert f(1) == 2
    assert "Finished 'f'" in capsys.readouterr().out


def test_action_timer_forces_execution(spark):
    df = spark.range(1000)
    n, sec = action_timer(df, "count")
    assert n == 1000 and sec > 0


def test_connected_components_chains_and_isolates(spark):
    """Chain A-B-C collapses to one component; disjoint pair keeps its
    own; isolated nodes (no edges) are absent by contract."""
    from datatools_spark.operators.graph import connected_components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain -> component 1
         (10, 11),                    # pair  -> component 10
         (20, 21), (21, 20)],         # duplicate/reversed edges collapse
        "a_id bigint, b_id bigint")
    out = {r["id"]: r["component"]
           for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    from datatools_spark.operators.graph import connected_components
    n = 40
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                  "a_id bigint, b_id bigint")
    out = connected_components(edges, max_iter=60)
    assert out.select("component").distinct().count() == 1
    assert out.agg({"component": "min"}).first()[0] == 0
    assert out.count() == n + 1


def test_quantize_uint8_bounds_and_reconstruction(spark):
    from datatools_spark.operators.similarity import quantize_uint8
    rows = [(1, [0.0, -1.0, 5.0]), (2, [1.0, 1.0, 5.0]), (3, [0.5, 3.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {(r["vec_id"], r["i"]): r["q"] for r in quantize_uint8(df).collect()}
    assert out[(1, 1)] == 0 and out[(2, 1)] == 255 and out[(3, 1)] == 128
    assert out[(1, 2)] == 0 and out[(3, 2)] == 255
    # constant dimension -> q = 0 everywhere (no divide-by-zero)
    assert out[(1, 3)] == out[(2, 3)] == out[(3, 3)] == 0


def test_random_projection_is_linear(spark):
    """proj(a + b) == proj(a) + proj(b): the projection is the linear map
    it claims to be (catches any per-row plane drift)."""
    from datatools_spark.operators.similarity import random_projection
    import random
    rng = random.Random(7)
    a = [rng.uniform(-1, 1) for _ in range(64)]
    b = [rng.uniform(-1, 1) for _ in range(64)]
    ab = [x + y for x, y in zip(a, b)]
    df = spark.createDataFrame([(1, a), (2, b), (3, ab)],
                               "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: [r[f"p_{j}"] for j in range(4)]
           for r in random_projection(df, out_dim=4).collect()}
    for j in range(4):
        assert abs(out[1][j] + out[2][j] - out[3][j]) < 1e-9


def test_pack_sequences_reconstructs_stream(spark):
    """bin_id*ctx + bin_offset must equal the exclusive prefix sum of
    token counts in (source, doc_id) order — i.e. packing really lays the
    corpus out as one contiguous token stream per source."""
    from datatools_spark.operators.curation import pack_sequences
    rows = [(i, "s" + str(i % 2), " ".join(["w"] * (3 + 7 * i % 11)))
            for i in range(20)] + [(100, "s0", "")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, ctx_len=10).collect()}
    # python reference
    import collections
    stream = collections.defaultdict(int)
    for i, src, text in sorted(rows):
        tok = len(text.split()) if text.strip() else 0
        r = out[i]
        assert r["n_tokens"] == tok
        cb = stream[src]
        assert (r["bin_id"], r["bin_offset"]) == (cb // 10, cb % 10)
        if tok == 0:
            assert r["n_bins_spanned"] == 0
        else:
            assert r["n_bins_spanned"] == (cb % 10 + tok - 1) // 10 + 1
            # a doc never spans more bins than its tokens could touch
            assert r["n_bins_spanned"] <= tok // 10 + 2
        stream[src] += tok


def test_word_entropy_matches_python(spark):
    from datatools_spark.operators.text import word_entropy
    import math
    rows = [(1, "a a a a"),            # zero entropy
            (2, "a b c d"),            # uniform -> log2(4) = 2
            (3, "a a b"),              # 2/3,1/3 mix
            (4, "")]                   # empty doc
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in word_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["n_distinct"] == 1
    assert abs(out[2]["entropy"] - 2.0) < 1e-6
    h3 = -(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3)
    assert abs(out[3]["entropy"] - h3) < 1e-6
    assert out[4]["n_words"] == 0 and out[4]["entropy"] == 0.0


def test_span_dup_stats_flags_shared_tiles(spark):
    from datatools_spark.operators.dedup import span_dup_stats
    tile = " ".join(f"t{i}" for i in range(16))      # one full shared tile
    uniq = lambda d: " ".join(f"u{d}_{i}" for i in range(16))
    rows = [(1, tile + " " + uniq(1)),   # tile shared with doc 2 -> 1/2 dup
            (2, tile + " " + uniq(2)),
            (3, uniq(3))]                # fully unique -> 0 dup
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in span_dup_stats(df, span_tokens=16).collect()}
    assert out[1]["n_spans"] == 2 and out[1]["dup_spans"] == 1
    assert out[1]["dup_frac"] == 0.5
    assert out[2]["dup_spans"] == 1
    assert out[3]["dup_spans"] == 0 and out[3]["dup_frac"] == 0.0


def test_ewma_matches_python_reference(spark):
    from datatools_spark.operators.rolling import ewma_cols
    from pyspark.sql import functions as F
    vals = [1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0, 6.0, 0.0, 2.5, 1.5]
    rows = [(i, "g", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    col = ewma_cols("value", ["event_id"], ["event_type"], alpha=0.4, k=8)
    out = {r["event_id"]: r["e"] for r in
           df.select("event_id", col.alias("e")).collect()}
    for t in range(len(vals)):
        num = den = 0.0
        for j in range(8):
            if t - j < 0:
                break
            w = (1 - 0.4) ** j
            num += w * vals[t - j]
            den += w
        assert abs(out[t] - num / den) < 1e-9, t


def test_train_val_test_split_deterministic_and_stable(spark):
    """Same labels on re-run and under corpus growth: adding docs never
    moves an existing doc across splits."""
    from datatools_spark.operators.curation import train_val_test_split
    small = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"]
         for r in train_val_test_split(small).collect()}
    b = {r["doc_id"]: r["split"]
         for r in train_val_test_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())
    from collections import Counter
    c = Counter(b.values())
    assert c["train"] > c["valid"] and c["train"] > c["test"]
    assert set(c) == {"train", "valid", "test"}


def test_pq_codes_assign_nearest_codeword(spark):
    """A vector equal to a codeword (padded into its subspace) must get
    that code; codes must lie in [0, codewords)."""
    from datatools_spark.operators.similarity import pq_codebook, pq_codes
    book = pq_codebook(subspaces=2, codewords=4, dim=8)
    v1 = book[0][2] + book[1][0]          # exact codewords -> codes (2, 0)
    v2 = [x + 0.01 for x in book[0][3]] + [x - 0.01 for x in book[1][1]]
    df = spark.createDataFrame([(1, v1), (2, v2)],
                               "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: (r["c0"], r["c1"]) for r in
           pq_codes(df, subspaces=2, codewords=4, dim=8).collect()}
    assert out[1] == (2, 0)
    assert out[2] == (3, 1)


def test_pq_adc_finds_neighbors_on_clustered_data(spark):
    """On data with quantizable structure (well-separated clusters), a
    1-iteration trained codebook's ADC shortlist must contain the true
    neighbors. (The driver's synthetic embeddings are isotropic noise —
    same-label mean cosine ~0.009 — where NO 12-bit/vector compressor
    can rank neighbors; this test pins the mechanism where structure
    exists, the regime PQ is for.)"""
    import random
    from datatools_spark.operators.similarity import (
        pq_adc_knn, pq_train_codebook)
    rng = random.Random(11)
    centers = [[rng.uniform(-1, 1) for _ in range(32)] for _ in range(6)]
    rows = []
    for i in range(300):
        c = centers[i % 6]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in c]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    book = pq_train_codebook(df, subspaces=4, codewords=8, dim=32, iters=1)
    q = df.where("vec_id < 3").selectExpr("vec_id AS query_id", "embedding")
    out = pq_adc_knn(df, q, k=10, subspaces=4, codewords=8, dim=32,
                     book=book, round_dists=9)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    # true neighbors of query i are the same-cluster points i%6 + 6k
    for qid in (0, 1, 2):
        same = {v for v in range(300) if v % 6 == qid % 6}
        hits = len(got[qid] & same)
        assert hits >= 9, (qid, hits)


def test_group_quota_cap_exact_and_deterministic(spark):
    """The cap keeps exactly min(N, |group|) rows per group — the N
    smallest key-hashes — and the prefilter path (factor forced tiny)
    selects the identical set as the pure row_number path."""
    from datatools_spark.operators.curation import (
        group_quota_cap, uniform_hash_col)
    rows = [(i, "t", f"s{i % 3}") for i in range(90)] + \
        [(900 + i, "t", "rare") for i in range(2)]
    df = _docs(spark, rows)
    out = group_quota_cap(df, 5, group_col="source", key_col="doc_id")
    got = {}
    for r in out.collect():
        got.setdefault(r["source"], set()).add(r["doc_id"])
    assert {s: len(v) for s, v in got.items()} == \
        {"s0": 5, "s1": 5, "s2": 5, "rare": 2}
    # expected winners: 5 smallest hashes per group (brute force)
    hashes = {r["doc_id"]: r["u"] for r in df.select(
        "doc_id", uniform_hash_col(F.col("doc_id"), "cap").alias("u")).collect()}
    for s, members in got.items():
        all_in_group = [i for i, _, g in rows if g == s]
        want = set(sorted(all_in_group, key=lambda i: (hashes[i], i))[:5])
        assert members == want, s
    # prefilter engaged (factor 1 forces the thinning branch) == exact
    thin = group_quota_cap(df, 5, group_col="source", key_col="doc_id",
                           prefilter_factor=1)
    got_thin = {(r["source"], r["doc_id"]) for r in thin.collect()}
    assert got_thin <= {(s, i) for s, v in got.items() for i in v}


def test_epoch_shard_covers_and_reshuffles(spark):
    """Shards partition the corpus; pos is 1..|shard| dense; a different
    epoch yields a different permutation but the same shard sizes ±."""
    from datatools_spark.operators.curation import epoch_shard
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = epoch_shard(df, n_shards=4, epoch=0).collect()
    assert len(a) == 500
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == {0, 1, 2, 3}
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s
    b = epoch_shard(df, n_shards=4, epoch=1).collect()
    moved = sum(1 for x, y in zip(
        sorted(a, key=lambda r: r["doc_id"]),
        sorted(b, key=lambda r: r["doc_id"]))
        if (x["shard"], x["pos"]) != (y["shard"], y["pos"]))
    assert moved > 400  # new epoch reshuffles nearly everything
    again = epoch_shard(df, n_shards=4, epoch=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, again))


def test_bm25_matches_reference_formula(spark):
    """bm25_scores == a pure-Python BM25 on the same tokenization."""
    import math
    from datatools_spark.operators.text import bm25_scores
    corpus = [
        (0, "spark shuffle join window merge spark"),
        (1, "merge sort merge join"),
        (2, "window function over partition"),
        (3, "the quick brown fox"),
        (4, "spark spark spark spark spark"),
    ]
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    terms = ["spark", "merge", "window"]
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, terms).collect()}
    toks = {i: t.split() for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    want = {}
    for i, ws in toks.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += round(idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))), 10)
        if s:
            want[i] = round(s, 6)
    assert got == pytest.approx(want)
    assert 3 not in got  # no query term -> no row


def test_semantic_dedup_matches_brute_force(spark):
    """semantic_dedup == brute-force greedy rule computed in Python:
    drop x iff some same-cluster y with y<x has cos >= tau."""
    import math
    import random
    from datatools_spark.operators.similarity import semantic_dedup
    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    rows = []
    for i in range(60):
        v = list(base[i % 4])
        if i >= 40:  # near-dups of earlier rows
            v = [x + rng.uniform(-0.01, 0.01) for x in base[i % 4]]
        else:
            v = [x + rng.uniform(-0.4, 0.4) for x in v]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cent = df.where("vec_id < 4").selectExpr(
        "vec_id AS centroid_id", "embedding")
    out = {r["vec_id"]: (r["centroid_id"], r["kept"])
           for r in semantic_dedup(df, cent, threshold=0.95).collect()}
    vecs = dict(rows)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b)))

    clusters = {}
    for i, v in rows:
        best = max(range(4), key=lambda c: (cos(v, vecs[c]), -c))
        clusters[i] = best
    for i, v in rows:
        assert out[i][0] == clusters[i], i
        same = [j for j in clusters if clusters[j] == clusters[i] and j < i]
        want_kept = not any(cos(v, vecs[j]) >= 0.95 for j in same)
        assert out[i][1] == want_kept, i
    assert sum(1 for _, k in out.values() if not k) > 0  # dups exist


def test_gopher_rules_edge_cases(spark):
    from datatools_spark.operators.text import gopher_rules_cols
    rows = [
        (1, ""),                                        # empty
        (2, "the a " + "word " * 60),                   # passes everything
        (3, "- one\n- two\n- three"),                   # all bullet lines
        (4, ("the a " + "word " * 60).rstrip() + "..."),  # ellipsis line
        (5, "the a " + "#### " * 60),                   # symbol soup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = gopher_rules_cols("text", min_words=5)
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c[k].alias(k) for k in
                    ("n_words", "bullet_frac", "ellipsis_frac",
                     "r_symbol_ratio", "r_stopwords", "passed")]).collect()}
    assert out[1]["n_words"] == 0 and out[1]["passed"] == 0
    assert out[2]["passed"] == 1
    assert out[3]["bullet_frac"] == 1.0 and out[3]["passed"] == 0
    assert out[4]["ellipsis_frac"] == 1.0 and out[4]["passed"] == 0
    assert out[5]["r_symbol_ratio"] == 0 and out[5]["passed"] == 0


def test_gopher_rules_single_scan_no_shuffle(spark):
    from datatools_spark.operators.text import gopher_rules_cols
    df = spark.createDataFrame([(1, "the a x y z")], "doc_id long, text string")
    c = gopher_rules_cols("text")
    plan = (df.select("doc_id", c["passed"].alias("passed"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan


def test_priority_sample_keeps_all_when_k_large(spark):
    from datatools_spark.operators.curation import priority_sample_per_group
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3), 10 + i) for i in range(30)],
        "doc_id long, source string, w long")
    out = priority_sample_per_group(df, "source", "w", k=100)
    assert out.count() == 30


def test_priority_sample_prefers_heavy_rows(spark):
    from datatools_spark.operators.curation import priority_sample_per_group
    rows = [(i, "s", 1) for i in range(50)] + [(99, "s", 100000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    hits = sum(
        1 for salt in range(20)
        if 99 in {r["doc_id"] for r in priority_sample_per_group(
            df, "source", "w", k=5, salt=f"t{salt}").collect()})
    assert hits >= 18  # inclusion prob ~ w/(w+sum) -> heavy nearly always in


def test_priority_sample_rank_cut_is_pushed_map_side(spark):
    from datatools_spark.operators.curation import priority_sample_per_group
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3), 10 + i) for i in range(30)],
        "doc_id long, source string, w long")
    plan = priority_sample_per_group(df, "source", "w", k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_check_suite_verdicts_and_one_pass(spark):
    """Declarative quality contract: each rule's observed metric and
    verdict on a table with planted violations; the whole suite is ONE
    aggregation pass (a single scan in the plan)."""
    from datatools_spark.operators import checks as CK
    rows = [
        (1, 1, 10.0, "A", "ok"),
        (1, 1, 10.0, "A", "ok"),        # duplicate key
        (2, 1, None, "N", "ok"),        # null measure (not a violation)
        (3, None, 99.0, "X", "bad!"),   # null key part, oob, bad enum
        (4, 2, -5.0, "R", None),
    ]
    df = spark.createDataFrame(
        rows, "k1 int, k2 int, v double, flag string, s string")
    checks = [
        CK.not_null("k1"),
        CK.unique(["k1", "k2"]),
        CK.in_range("v", 0.0, 50.0),
        CK.accepted_values("flag", ["A", "N", "R"]),
        CK.matches_regex("s", "^[a-z]+$"),
        CK.row_count_between(1, 10),
    ]
    got = {r["check_name"]: (r["observed"], r["passed"])
           for r in CK.check_suite(df, checks).collect()}
    assert got["not_null(k1)"] == (0.0, 1)
    # 1 dup + 1 null-keyed row = 2 violations
    assert got["unique(k1,k2)"] == (2.0, 0)
    assert got["in_range(v,0.0,50.0)"] == (2.0, 0)      # 99 and -5
    assert got["accepted_values(flag)"] == (1.0, 0)     # X
    # exactly 1 of 4 non-null s violates ^[a-z]+$ ("bad!") -> count,
    # not a rounded fraction (a fraction hides violators at scale)
    assert got["matches_regex(s)"] == (1.0, 0)
    assert got["row_count_between(1,10)"] == (5.0, 1)
    # a tolerance is an explicit violation budget
    tol = {r["check_name"]: r["passed"] for r in CK.check_suite(
        df, [CK.matches_regex("s", "^[a-z]+$", max_violations=1)])
        .collect()}
    assert tol["matches_regex(s)"] == 1

    import pytest
    with pytest.raises(ValueError, match="unique"):
        CK.assert_checks(df, checks)
    # clean subset passes the gate
    clean = df.where("k1 = 4")
    CK.assert_checks(clean, [CK.not_null("k1"),
                             CK.in_range("v", -10.0, 0.0)])

    # one pass: the aggregation plan scans the input exactly once
    aggs = [obs.cast("double").alias(f"_c{i}")
            for i, (_, obs, _, _) in enumerate(checks)]
    plan = df.agg(*aggs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_grouped_gram_pairs_cap_and_string_ids(spark):
    """grouped_gram_pairs: string ids order like the SQL a<b predicate,
    and an over-cap group fails fast naming the fix."""
    from datatools_spark.operators.similarity import grouped_gram_pairs
    rows = [("g", "idB", [1.0, 0.0]), ("g", "idA", [1.0, 0.001]),
            ("g", "idC", [0.0, 1.0])]
    df = spark.createDataFrame(
        rows, "grp string, vec_id string, embedding array<double>")
    got = {(r.a_id, r.b_id) for r in grouped_gram_pairs(
        df, "grp", threshold=0.9).collect()}
    assert got == {("idA", "idB")}
    import pytest
    with pytest.raises(Exception, match="group_cap"):
        grouped_gram_pairs(df, "grp", threshold=0.9,
                           group_cap=2).collect()


def test_embedding_dup_pairs_md5_planes_stay_balanced(spark):
    """r11 (staked by bench/emb_xl.py): the sin plane family collapses
    random vectors into a handful of sign buckets (adjacent-plane
    correlation −0.46 — at 1e6 vectors / 11 planes it filled 22 of
    2048 buckets, max 64k vs avg 488), so ``embedding_dup_pairs``
    defaults to the INDEPENDENT md5 planes. Pin the collapse and the
    fix at test scale, and that the md5 default constructs where sin
    blows the gram cap."""
    from pyspark.sql import functions as F
    from datatools_spark.operators.dedup import embedding_dup_pairs
    from datatools_spark.operators.similarity import (
        hyperplane_bucket_col, md5_bucket_col)
    n, planes, d = 20_000, 8, 16
    vec = F.transform(F.sequence(F.lit(0), F.lit(d - 1)),
                      lambda j: F.sin(F.xxhash64(F.col("id"), j)
                                      .cast("double")))
    df = spark.range(n).select(F.col("id").alias("vec_id"),
                               vec.alias("embedding"))

    def max_bucket(col):
        return (df.select(col.alias("b")).groupBy("b").count()
                .agg(F.max("count")).collect()[0][0])

    avg = n / (1 << planes)
    sin_max = max_bucket(hyperplane_bucket_col("embedding", planes))
    md5_max = max_bucket(md5_bucket_col("embedding", planes, d))
    assert sin_max > 10 * avg          # the collapse (18.6x at d=16;
    #                                    131x at the 1e6/64-d probe)
    assert md5_max < 8 * avg           # independent planes stay flat
    assert 2 * md5_max < sin_max       # and beat sin by >= 2x here
    # md5 default constructs under a cap the sin family would blow
    # (sin's max bucket above is > n//4 here); dim inferred from row 1
    pairs = embedding_dup_pairs(df, threshold=0.999,
                                bucket_hyperplanes=planes,
                                gram_bucket_cap=n // 4)
    assert pairs.count() == 0          # random vectors: no near-dups


def test_grouped_gram_pairs_zero_norm_fails_fast(spark):
    """A zero-norm vector makes cosine 0/0: numpy drops the pair while
    Spark/DuckDB NaN-ordering keeps it — the engine refuses the corpus
    with a named error instead of silently picking a side."""
    import pytest
    from datatools_spark.operators.similarity import grouped_gram_pairs
    rows = [("g", 1, [1.0, 0.0]), ("g", 2, [0.0, 0.0]),
            ("g", 3, [1.0, 0.001])]
    df = spark.createDataFrame(
        rows, "grp string, vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="zero-norm"):
        grouped_gram_pairs(df, "grp", threshold=0.9).collect()


def test_knn_matmul_zero_norm_ranks_last(spark):
    """knn_brute_matmul's documented deviation: a zero-norm corpus
    vector gets cosine 0 (not the SQL form's rank-1 NaN) and can only
    appear after every positive-cosine row."""
    from datatools_spark.operators.similarity import knn_brute_matmul
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.9, 0.1]),
            (4, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])],
                              "query_id long, embedding array<double>")
    got = {r.vec_id: (r.rank, r.cosine)
           for r in knn_brute_matmul(df, q, k=4).collect()}
    assert got[2][1] == 0.0                     # defined cosine, not NaN
    assert got[2][0] > got[1][0] and got[2][0] > got[3][0]
    assert got[2][0] < got[4][0]                # beats negative cosine
