"""Property and planted-fixture tests for the curation operators
(corpus_mix_weighted, text_boilerplate_ngrams, dedup_resolve_best,
sim_eval_recall) beyond their DuckDB oracle parity."""

from __future__ import annotations

from task_mapreduce_spark.registry import QUERIES


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


# ---------------------------------------------------------------------------
# corpus_mix_weighted
# ---------------------------------------------------------------------------


def test_mix_scarcest_stratum_keeps_everything(spark, sf_dir):
    # the acceptance rate of the argmin(n/w) stratum is exactly 1 by
    # construction (h < 2^48 always), so at least one language must
    # keep its whole population; no language may exceed it
    rows = QUERIES["corpus_mix_weighted"](spark, sf_dir).collect()
    assert any(r["n_kept"] == r["n_docs"] for r in rows)
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
    # per-lang ppm is floor(w*1e6/W), so the sum may fall short of a
    # full million by at most one floor-loss per stratum — asserting
    # exact equality would break on any weight change where the
    # divisions stop coming out even
    from task_mapreduce_spark.operators.curation import _MIX_WEIGHTS

    total_ppm = sum(r["target_ppm"] for r in rows)
    assert 1_000_000 - len(_MIX_WEIGHTS) < total_ppm <= 1_000_000


def test_mix_rates_follow_weights_on_planted_counts(spark, tmp_path):
    # 40 'de' docs (weight 1) vs 10 'en' docs (weight 4): en is the
    # scarcest stratum (10/4 < 40/1), so en keeps all 10 and de thins
    # to rate w_de*n_en/(w_en*n_de) = 1/16 — far below full retention
    rows = [(i, f"d {i} x y", "de", "s", 10) for i in range(40)]
    rows += [(100 + i, f"e {i} x y", "en", "s", 10) for i in range(10)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["lang"]: r for r in QUERIES["corpus_mix_weighted"](spark, sf).collect()}
    assert out["en"]["n_kept"] == out["en"]["n_docs"] == 10
    assert out["de"]["n_docs"] == 40
    assert out["de"]["n_kept"] < 40  # rate 1/16 cannot keep the lot
    # deterministic: a second run selects the identical sets
    out2 = {r["lang"]: r["n_kept"]
            for r in QUERIES["corpus_mix_weighted"](spark, sf).collect()}
    assert out2 == {k: v["n_kept"] for k, v in out.items()}


def test_mix_unweighted_stratum_is_excluded(spark, tmp_path):
    # a language with no configured weight must vanish from the output
    # entirely (matching the oracle's inner join on the weight table),
    # never surface as a null-ppm row or bleed into the volume pin
    rows = [(i, f"d {i} x y", "de", "s", 10) for i in range(5)]
    rows += [(50 + i, f"q {i} x y", "xx", "s", 10) for i in range(5)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["lang"]: r for r in QUERIES["corpus_mix_weighted"](spark, sf).collect()}
    assert set(out) == {"de"}
    assert out["de"]["n_kept"] == out["de"]["n_docs"] == 5


# ---------------------------------------------------------------------------
# text_boilerplate_ngrams
# ---------------------------------------------------------------------------


def test_boilerplate_planted_span_flagged(spark, tmp_path):
    # one 4-token span planted into 3 docs (df = 3 >= threshold), each
    # doc padded with its own unique tail; a fourth doc shares nothing
    # NOTE the tail tokens must differ in (length, first char) across
    # docs — the repo's portable token code is length*131 + ascii(first
    # char), so "u0a"/"u1a" would collide and the tails would count as
    # shared windows too
    span = "this licensed content is"
    rows = [
        (
            i,
            f"{span} {c}1 {c}22 {c}333 {c}4444",
            "en",
            "s",
            0,
        )
        for i, c in enumerate("abc")
    ]
    rows.append((9, "totally different words here entirely now yes ok", "en", "s", 0))
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in
           QUERIES["text_boilerplate_ngrams"](spark, sf).collect()}
    assert len(out) == 4
    for i in range(3):
        # exactly the one shared window is boilerplate; the padded
        # tail windows are unique per doc
        assert out[i]["n_boiler"] == 1
        assert 0 < out[i]["boiler_frac"] <= 1
    assert out[9]["n_boiler"] == 0
    assert out[9]["boiler_frac"] == 0.0


def test_boilerplate_counts_are_bounded(spark, sf_dir):
    for r in QUERIES["text_boilerplate_ngrams"](spark, sf_dir).collect():
        assert 0 <= r["n_boiler"] <= r["n_shingles"]
        assert 0.0 <= r["boiler_frac"] <= 1.0


# ---------------------------------------------------------------------------
# dedup_resolve_best
# ---------------------------------------------------------------------------


def test_resolve_best_keeps_longest_member(spark, tmp_path):
    # the CC chain fixture (adjacent sliding windows are near-dups,
    # ends are not) with controlled n_chars: the middle doc is the
    # longest, so it must survive even though it is neither the
    # cluster root nor first-seen
    win = lambda k: " ".join(f"tok{i}" for i in range(k, k + 20))
    other = "stream window customer order group data column filter query big"
    rows = [
        (1, win(0), "en", "s", 100),
        (2, win(1), "en", "s", 300),
        (3, win(2), "en", "s", 200),
        (9, other, "en", "s", 999),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["dedup_resolve_best"](spark, sf).collect()
    assert len(out) == 1  # doc 9 is a singleton: no resolution row
    r = out[0]
    assert r["component_id"] == 1
    assert r["keep_id"] == 2
    assert r["n_members"] == 3
    assert r["n_chars_kept"] == 300


def test_resolve_best_ties_break_on_doc_id(spark, tmp_path):
    text = " ".join(f"w{i}" for i in range(20))
    rows = [(11, text, "en", "s", 50), (12, text, "en", "s", 50)]
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["dedup_resolve_best"](spark, sf).collect()
    assert len(out) == 1
    assert out[0]["keep_id"] == 11  # equal length -> smaller doc_id


def test_resolve_best_consistent_with_clusters(spark, sf_dir):
    cc = {r["doc_id"]: r["component_id"]
          for r in QUERIES["dedup_cluster_cc"](spark, sf_dir).collect()}
    from collections import Counter

    sizes = Counter(cc.values())
    out = QUERIES["dedup_resolve_best"](spark, sf_dir).collect()
    assert {r["component_id"] for r in out} == {
        c for c, n in sizes.items() if n >= 2
    }
    for r in out:
        assert cc[r["keep_id"]] == r["component_id"]
        assert r["n_members"] == sizes[r["component_id"]]


# ---------------------------------------------------------------------------
# sim_eval_recall
# ---------------------------------------------------------------------------


def test_recall_matches_arm_intersection(spark, sf_dir):
    exact = QUERIES["sim_search_topk"](spark, sf_dir).collect()
    ann = QUERIES["sim_search_ann"](spark, sf_dir).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    an = {(r["query_id"], r["vec_id"]) for r in ann}
    out = QUERIES["sim_eval_recall"](spark, sf_dir).collect()
    assert {r["query_id"] for r in out} == {q for q, _ in ex}
    for r in out:
        hits = len({p for p in ex & an if p[0] == r["query_id"]})
        n_ex = len({p for p in ex if p[0] == r["query_id"]})
        assert r["n_exact"] == n_ex
        assert r["n_hit"] == hits
        assert 0.0 <= r["recall_at_k"] <= 1.0


# ---------------------------------------------------------------------------
# dedup_eval_prf
# ---------------------------------------------------------------------------


def test_prf_planted_bands_show_the_s_curve(spark, tmp_path):
    # two disjoint-alphabet pairs: A~B share 14 of 26 bigrams
    # (J = 14/26 ≈ 0.538 → band 5), C~D share 20 of 21 (J ≈ 0.952 →
    # band 9).  With 4 bands × 4 rows the catch probabilities are
    # ≈ 0.30 and ≈ 0.999; the md5-derived hashes are deterministic, so
    # the observed outcome — band-5 pair MISSED, band-9 pair caught —
    # is a stable golden and is exactly the banding-loss signal the
    # eval exists to surface (recall lowest just above threshold)
    a = " ".join(f"a{i}" for i in range(21))
    b = " ".join(f"a{i}" for i in range(6, 27))
    c = " ".join(f"c{i}" for i in range(21))
    d = " ".join(f"c{i}" for i in range(22))
    rows = [
        (1, a, "en", "s", len(a)),
        (2, b, "en", "s", len(b)),
        (3, c, "en", "s", len(c)),
        (4, d, "en", "s", len(d)),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {
        r["j_band"]: r for r in QUERIES["dedup_eval_prf"](spark, sf).collect()
    }
    assert set(out) == {5, 9}
    assert out[5]["n_exact"] == 1 and out[5]["n_hit"] == 0
    assert out[5]["recall"] == 0.0
    assert out[9]["n_exact"] == 1 and out[9]["n_hit"] == 1
    assert out[9]["recall"] == 1.0
    # LSH ⊆ exact from two independent Jaccard implementations
    assert all(r["lsh_subset"] for r in out.values())


# ---------------------------------------------------------------------------
# dedup_incremental
# ---------------------------------------------------------------------------


def test_incremental_planted_decisions(spark, tmp_path):
    # doc_id hash slices (md5 % 10): 5/34/35 are BATCH, 1/2 are STORE.
    # Plant: batch 5 near-dups store 1; batch 34 and 35 near-dup each
    # other (no store partner) -> 35 defers to 34 (smaller id wins) and
    # 34 is new; a fresh batch doc with a disjoint alphabet is new.
    x = " ".join(f"x{i}" for i in range(21))        # store 1
    x2 = " ".join(f"x{i}" for i in range(22))       # batch 5: J=20/21 vs store
    y = " ".join(f"y{i}" for i in range(21))        # batch 34
    y2 = " ".join(f"y{i}" for i in range(22))       # batch 35: J=20/21 vs 34
    z = " ".join(f"z{i}" for i in range(21))        # batch 47: fresh
    rows = [
        (1, x, "en", "s", len(x)),
        (5, x2, "en", "s", len(x2)),
        (34, y, "en", "s", len(y)),
        (35, y2, "en", "s", len(y2)),
        (47, z, "en", "s", len(z)),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in QUERIES["dedup_incremental"](spark, sf).collect()}
    assert set(out) == {5, 34, 35, 47}  # store doc 1 never emits a row
    assert not out[5]["is_new"] and out[5]["dup_of"] == 1
    assert out[34]["is_new"] and out[34]["dup_of"] is None
    assert not out[35]["is_new"] and out[35]["dup_of"] == 34
    assert out[47]["is_new"] and out[47]["n_dup_partners"] == 0


def test_cluster_incremental_batch_doc_bridges_two_base_components(spark, tmp_path):
    # Token design: S (10 shared) + A (1) + B (1); T1 = S+A, T2 = S+B,
    # X = S+A+B.  J(X,T1) = J(X,T2) = 11/12 >= 0.9 but
    # J(T1,T2) = 10/12 < 0.9 — so the BASE graph has two disjoint
    # components {0,1} (text T1) and {2,3} (text T2), and only the
    # arriving batch doc 5 (md5(5) % 10 == 0 under the portable hash)
    # bridges them.  The contracted merge must relabel ALL FIVE docs to
    # the global min id, and the result must equal the from-scratch
    # operator on the same corpus.
    S = [f"s{i}" for i in range(10)]
    t1 = " ".join(S + ["aa"])
    t2 = " ".join(S + ["bb"])
    tx = " ".join(S + ["aa", "bb"])
    rows = [(0, t1), (1, t1), (2, t2), (3, t2), (5, tx)]
    # far-away filler docs (disjoint vocab) so the graph isn't trivial
    rows += [(i, f"z{i}a z{i}b z{i}c z{i}d") for i in (4, 6, 7)]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)

    inc = {r["doc_id"]: r["component_id"]
           for r in QUERIES["dedup_cluster_incremental"](spark, sf).collect()}
    assert {inc[i] for i in (0, 1, 2, 3, 5)} == {0}
    for i in (4, 6, 7):
        assert inc[i] == i
    full = {r["doc_id"]: r["component_id"]
            for r in QUERIES["dedup_cluster_cc"](spark, sf).collect()}
    assert inc == full


# ---------------------------------------------------------------------------
# dedup_index_persist
# ---------------------------------------------------------------------------


def test_index_persist_planted_decisions(spark, tmp_path):
    # same planted corpus as the incremental test, but index-probe
    # semantics: within-batch pairs (34, 35) do NOT count — only store
    # doc 1 is a partner, so 5 dups it and everyone else is new; the
    # audit columns see exactly 1 store doc with its 4 band keys
    x = " ".join(f"x{i}" for i in range(21))        # store 1
    x2 = " ".join(f"x{i}" for i in range(22))       # batch 5: J=20/21
    y = " ".join(f"y{i}" for i in range(21))        # batch 34
    y2 = " ".join(f"y{i}" for i in range(22))       # batch 35
    z = " ".join(f"z{i}" for i in range(21))        # batch 47: fresh
    rows = [
        (1, x, "en", "s", len(x)),
        (5, x2, "en", "s", len(x2)),
        (34, y, "en", "s", len(y)),
        (35, y2, "en", "s", len(y2)),
        (47, z, "en", "s", len(z)),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r
           for r in QUERIES["dedup_index_persist"](spark, sf).collect()}
    assert set(out) == {5, 34, 35, 47}
    assert not out[5]["is_new"] and out[5]["dup_of"] == 1
    assert out[34]["is_new"] and out[34]["dup_of"] is None
    assert out[35]["is_new"] and out[35]["dup_of"] is None
    assert out[47]["is_new"] and out[47]["n_dup_partners"] == 0
    for r in out.values():
        assert r["index_docs"] == 1
        assert r["index_band_keys"] == 4


def test_index_persist_store_round_trips_bit_exactly(spark, sf_dir):
    # the parquet round trip loses nothing: the reloaded band-key and
    # shingle stores equal the inline-recomputed index frames row for
    # row (the contract the audit columns summarize as counts)
    import os
    import tempfile

    from pyspark.sql import functions as F

    from task_mapreduce_spark.operators.curation import (
        _band_buckets,
        _is_batch_expr,
    )
    from task_mapreduce_spark.operators.llm_pipeline import _shingles
    from task_mapreduce_spark.tables import load

    QUERIES["dedup_index_persist"](spark, sf_dir).count()
    base = os.path.join(
        tempfile.gettempdir(), f"tmrs_dedup_index_{os.getpid()}"
    )
    idx_sh = _shingles(load(spark, sf_dir, "documents")).filter(
        ~_is_batch_expr(F.col("doc_id"))
    )
    got_bands = sorted(
        map(tuple, spark.read.parquet(f"{base}/bands").collect())
    )
    want_bands = sorted(map(tuple, _band_buckets(idx_sh).collect()))
    assert got_bands == want_bands
    got_sh = sorted(
        (r["doc_id"], tuple(sorted(r["shingles"])))
        for r in spark.read.parquet(f"{base}/shingles").collect()
    )
    want_sh = sorted(
        (r["doc_id"], tuple(sorted(r["shingles"])))
        for r in idx_sh.collect()
    )
    assert got_sh == want_sh


def test_index_persist_consistent_with_incremental(spark, sf_dir):
    # persist's partner set is the index-only subset of incremental's:
    # a doc that dups the store must also dup under incremental, and
    # its partner count can only grow when within-batch pairs join in
    inc = {r["doc_id"]: r
           for r in QUERIES["dedup_incremental"](spark, sf_dir).collect()}
    per = {r["doc_id"]: r
           for r in QUERIES["dedup_index_persist"](spark, sf_dir).collect()}
    assert set(inc) == set(per)
    for d, p in per.items():
        if not p["is_new"]:
            assert not inc[d]["is_new"]
            assert inc[d]["n_dup_partners"] >= p["n_dup_partners"]
        if inc[d]["is_new"]:
            assert p["is_new"]


# ---------------------------------------------------------------------------
# dedup_span_exact
# ---------------------------------------------------------------------------


def test_span_exact_planted_shared_span(spark, tmp_path):
    # two docs share an exact 6-token run; every other token is unique
    # corpus-wide (distinct lengths/first chars break the RK code too),
    # so the ONLY repeated windows are the shared run's 3 window starts
    # → ONE maximal span of exactly 6 tokens per doc, at the planted
    # positions (1-based token indices)
    shared = "alpha bravo charlie delta echo foxtrot"
    rows = [
        (1, f"unique1a unique2ab {shared} tail1xyz", "en", "s0", 40),
        (2, f"{shared} unique3abc unique4abcd unique5abcde", "en", "s1", 40),
        (3, "zz yyy xxxx wwwww vvvvvv uuuuuuu", "en", "s2", 30),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["dedup_span_exact"](spark, sf).collect()
    spans = {r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
             for r in out}
    assert spans == {1: (3, 8, 6), 2: (1, 6, 6)}


def test_span_exact_matches_python_reference(spark, tmp_path):
    # seeded random small-vocab corpora vs a pure-Python replay of the
    # exact semantics (RK token codes → 4-window poly hashes → count>=2
    # → island merge); small vocab forces dense cross-doc repeats
    import random

    rng = random.Random(42)
    vocab = ["aa", "bb", "cc", "dd", "ee", "longword", "x"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))),
         "en", "s", 0)
        for i in range(40)
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in QUERIES["dedup_span_exact"](spark, sf).collect()
    )

    K = 4
    from collections import Counter

    def win_hashes(text):
        cs = [len(t) * 131 + ord(t[0]) for t in text.split(" ")]
        return [
            ((cs[i] * 131 + cs[i + 1]) * 131 + cs[i + 2]) * 131 + cs[i + 3]
            for i in range(len(cs) - K + 1)
        ]

    counts = Counter(h for _, t, *_ in rows for h in win_hashes(t))
    want = []
    for doc_id, t, *_ in rows:
        flagged = [
            i + 1 for i, h in enumerate(win_hashes(t)) if counts[h] >= 2
        ]
        run = []
        for p in flagged:
            # merge while the windows' TOKEN ranges overlap or touch
            # (start gap <= K) — emitted spans are disjoint
            if run and p - run[-1] <= K:
                run.append(p)
            else:
                if run:
                    want.append((doc_id, run[0], run[-1] + K - 1,
                                 run[-1] - run[0] + K))
                run = [p]
        if run:
            want.append((doc_id, run[0], run[-1] + K - 1,
                         run[-1] - run[0] + K))
    assert got == sorted(want)


def test_span_exact_spans_are_maximal_and_disjoint(spark, sf_dir):
    # per doc: every span ≥ window size, and spans sorted by start are
    # pairwise DISJOINT with at least one uncovered token between them
    # (overlapping/touching token ranges merge into one island)
    from collections import defaultdict

    per_doc = defaultdict(list)
    for r in QUERIES["dedup_span_exact"](spark, sf_dir).collect():
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
        assert r["span_tokens"] >= 4
        per_doc[r["doc_id"]].append((r["span_start"], r["span_end"]))
    assert per_doc, "fixture corpus has near-duplicates by construction"
    for spans in per_doc.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1 + 2


# ---------------------------------------------------------------------------
# select_dsir
# ---------------------------------------------------------------------------


def test_dsir_selects_exactly_top_fifth_per_source(spark, sf_dir):
    from collections import defaultdict

    rows = QUERIES["select_dsir"](spark, sf_dir).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    for src, rs in by_src.items():
        n = len(rs)
        picked = [r for r in rs if r["selected"]]
        assert len(picked) == n // 5, src
        # the selected set IS the top slice under (score desc, doc_id)
        order = sorted(rs, key=lambda r: (-r["dsir_score"], r["doc_id"]))
        assert {r["doc_id"] for r in picked} == {
            r["doc_id"] for r in order[: n // 5]
        }
        # sel_rank is the dense 1..n enumeration of that order
        assert [r["doc_id"] for r in sorted(rs, key=lambda r: r["sel_rank"])] \
            == [r["doc_id"] for r in order]


def test_dsir_target_language_scores_higher(spark, sf_dir):
    # the whole point of importance resampling: documents FROM the
    # target domain (en) must average a higher log-ratio than the rest
    from task_mapreduce_spark.tables import load

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    out = QUERIES["select_dsir"](spark, sf_dir)
    joined = out.join(d, "doc_id").collect()
    en = [r["dsir_score"] for r in joined if r["lang"] == "en"]
    rest = [r["dsir_score"] for r in joined if r["lang"] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


# ---------------------------------------------------------------------------
# dedup_span_apply
# ---------------------------------------------------------------------------


def test_span_apply_planted_surgery(spark, tmp_path):
    # same planted corpus as the detect test: the shared 6-token run is
    # cut from both docs; the untouched doc passes through verbatim
    shared = "alpha bravo charlie delta echo foxtrot"
    rows = [
        (1, f"unique1a unique2ab {shared} tail1xyz", "en", "s0", 40),
        (2, f"{shared} unique3abc unique4abcd unique5abcde", "en", "s1", 40),
        (3, "zz yyy xxxx wwwww vvvvvv uuuuuuu", "en", "s2", 30),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in QUERIES["dedup_span_apply"](spark, sf).collect()}
    assert out[1]["text_clean"] == "unique1a unique2ab tail1xyz"
    assert (out[1]["n_tokens"], out[1]["n_removed"]) == (9, 6)
    assert out[2]["text_clean"] == "unique3abc unique4abcd unique5abcde"
    assert out[3]["text_clean"] == rows[2][1]
    assert out[3]["n_removed"] == 0


def test_span_apply_exact_duplicate_doc_is_fully_cut(spark, tmp_path):
    # two identical docs: EVERY window repeats, so ExactSubstr removes
    # the full text of both (the cut-all-occurrences semantics)
    dup = "one two three four five six"
    rows = [
        (1, dup, "en", "s0", 27),
        (2, dup, "en", "s1", 27),
        (3, "aa bbb cccc ddddd eeeeee", "en", "s2", 24),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in QUERIES["dedup_span_apply"](spark, sf).collect()}
    for i in (1, 2):
        assert out[i]["text_clean"] == ""
        assert out[i]["n_removed"] == out[i]["n_tokens"] == 6
    assert out[3]["n_removed"] == 0


def test_span_apply_consistent_with_detect(spark, sf_dir):
    # apply removes exactly the UNION of detect's token spans per doc —
    # spans are disjoint by construction, so that union's size is also
    # the per-doc sum of span_tokens; spanless docs pass through with
    # their original text
    from collections import defaultdict

    from task_mapreduce_spark.tables import load

    covered = defaultdict(set)
    tok_sum = defaultdict(int)
    for r in QUERIES["dedup_span_exact"](spark, sf_dir).collect():
        covered[r["doc_id"]].update(
            range(r["span_start"], r["span_end"] + 1)
        )
        tok_sum[r["doc_id"]] += r["span_tokens"]
    # disjointness makes span_tokens summable
    assert all(len(covered[d]) == tok_sum[d] for d in covered)
    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").collect()
    }
    out = QUERIES["dedup_span_apply"](spark, sf_dir).collect()
    assert {r["doc_id"] for r in out} == set(texts)
    for r in out:
        assert r["n_removed"] == len(covered.get(r["doc_id"], ())), r["doc_id"]
        if r["n_removed"] == 0:
            assert r["text_clean"] == texts[r["doc_id"]]
        else:
            toks = texts[r["doc_id"]].split(" ")
            keep = [t for p, t in enumerate(toks, 1)
                    if p not in covered[r["doc_id"]]]
            assert r["text_clean"] == " ".join(keep)


# ---------------------------------------------------------------------------
# quality_eval_report
# ---------------------------------------------------------------------------


def test_quality_report_counts_decompose(spark, sf_dir):
    # per lang: the reason breakdown partitions the population (ok +
    # the three drop reasons == n_docs), and matches corpus_filter
    from collections import Counter

    cf = QUERIES["corpus_filter"](spark, sf_dir).collect()
    n_docs = Counter(r["lang"] for r in cf)
    n_kept = Counter(r["lang"] for r in cf if r["keep"])
    rows = QUERIES["quality_eval_report"](spark, sf_dir).collect()
    assert {r["lang"] for r in rows} == set(n_docs)
    for r in rows:
        assert r["n_docs"] == n_docs[r["lang"]]
        assert r["n_kept"] == n_kept[r["lang"]]
        assert (
            r["n_kept"] + r["n_too_short"] + r["n_too_repetitive"]
            + r["n_no_stopwords"] == r["n_docs"]
        )


def test_quality_report_means_match_signal_ops(spark, sf_dir):
    # each mean must equal a Python replay of the round-6 → exact-sum →
    # divide → round-6 pipeline over the REGISTERED signal op's output
    from collections import defaultdict
    from decimal import Decimal

    from task_mapreduce_spark.tables import load

    langmap = {
        r["doc_id"]: r["lang"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }

    def mean6(pairs):
        by = defaultdict(list)
        for lang, v in pairs:
            by[lang].append(Decimal(str(round(v, 6))))
        return {
            lang: round(float(sum(vs)) / len(vs), 6) for lang, vs in by.items()
        }

    ent = mean6(
        (langmap[r["doc_id"]], r["entropy"])
        for r in QUERIES["text_entropy"](spark, sf_dir).collect()
    )
    rep = mean6(
        (langmap[r["doc_id"]], r["top_bigram_frac"])
        for r in QUERIES["quality_repetition"](spark, sf_dir).collect()
    )
    rows = QUERIES["quality_eval_report"](spark, sf_dir).collect()
    for r in rows:
        assert r["mean_entropy"] == ent.get(r["lang"]), r["lang"]
        assert r["mean_top_bigram"] == rep.get(r["lang"]), r["lang"]


# ---------------------------------------------------------------------------
# sample_weighted
# ---------------------------------------------------------------------------


def test_sample_weighted_matches_python_replay(spark, sf_dir):
    # the whole key is engine-portable integer math, so a pure-Python
    # replay must reproduce EVERY column bit-for-bit
    import hashlib
    from collections import defaultdict

    from task_mapreduce_spark.operators.curation import (
        _WS_CHARS_PER_W,
        _WS_MAX_W,
        _WS_PER_SOURCE,
    )
    from task_mapreduce_spark.tables import load

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    rows = defaultdict(list)
    for d in docs:
        w = min(1 + d["n_chars"] // _WS_CHARS_PER_W, _WS_MAX_W)
        key = max(
            int(hashlib.md5(f"{d['doc_id']}#{j}".encode()).hexdigest()[:12], 16)
            for j in range(w)
        )
        rows[d["source"]].append((d["doc_id"], w, key))
    want = {}
    for src, items in rows.items():
        ranked = sorted(items, key=lambda t: (-t[2], t[0]))
        for r, (doc_id, w, key) in enumerate(ranked, 1):
            want[doc_id] = (src, w, key, r, r <= _WS_PER_SOURCE)
    got = {
        r["doc_id"]: (r["source"], r["w"], r["es_key"], r["sample_rank"],
                      r["sampled"])
        for r in QUERIES["sample_weighted"](spark, sf_dir).collect()
    }
    assert got == want


def test_sample_weighted_bias_follows_weights(spark, tmp_path):
    # planted corpus: in one source, 5 heavy docs (w=16) among 95 light
    # ones (w=1); ES theory says each heavy doc enters the top-5 far
    # more often than 5% — with 16:1 odds per slot the heavy docs must
    # take a clear majority of the sample on virtually any hash draw
    rows = [(i, "x", "en", "s0", 4000) for i in range(5)]          # w=16
    rows += [(100 + i, "x", "en", "s0", 0) for i in range(95)]     # w=1
    sf = _write_docs(spark, tmp_path, rows)
    out = QUERIES["sample_weighted"](spark, sf).collect()
    assert len(out) == 100
    picked = {r["doc_id"] for r in out if r["sampled"]}
    assert len(picked) == 5
    heavy_picked = len([d for d in picked if d < 100])
    assert heavy_picked >= 2  # expected ≈ 2.3 of 5 slots; 0-1 would
    #                           indicate the weights are not applied
    # weights themselves must be exact
    ws = {r["doc_id"]: r["w"] for r in out}
    assert all(ws[d] == 16 for d in range(5))
    assert all(ws[100 + i] == 1 for i in range(95))


# ---------------------------------------------------------------------------
# dedup_eval_ari
# ---------------------------------------------------------------------------


def test_ari_matches_python_pair_counting(spark, sf_dir):
    # replay the whole ARI from the two registered clusterings with
    # pure-Python integer pair counting — every count column must be
    # bit-equal and the final index must match the same rounded
    # expression tree
    from collections import Counter

    lex = {r["doc_id"]: r["component_id"]
           for r in QUERIES["dedup_cluster_cc"](spark, sf_dir).collect()}
    # the semantic side: reuse dedup_semantic's output, which carries
    # the same registered cell assignment per vec_id
    sem = {r["vec_id"]: r["cell"]
           for r in QUERIES["dedup_semantic"](spark, sf_dir).collect()}
    both = {i: (lex[i], sem[i]) for i in lex if i in sem}
    cont = Counter(both.values())
    comb2 = lambda n: n * (n - 1) // 2
    pairs_both = sum(comb2(n) for n in cont.values())
    ca = Counter(l for l, _ in both.values())
    cb = Counter(c for _, c in both.values())
    pairs_lex = sum(comb2(n) for n in ca.values())
    pairs_sem = sum(comb2(n) for n in cb.values())
    n = len(both)
    exp = float(pairs_lex) * pairs_sem / comb2(n)
    den = float(pairs_lex + pairs_sem) / 2 - exp
    want_ari = 1.0 if den == 0.0 else round((pairs_both - exp) / den, 6)

    out = QUERIES["dedup_eval_ari"](spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_items"], r["n_components"], r["n_cells"]) == (
        n, len(ca), len(cb)
    )
    assert (r["pairs_both"], r["pairs_lex"], r["pairs_sem"]) == (
        pairs_both, pairs_lex, pairs_sem
    )
    assert r["ari"] == want_ari
    assert -0.5 <= r["ari"] <= 1.0  # ARI's theoretical range


def test_ari_identical_clusterings_score_one(spark, tmp_path):
    # a corpus of two exact-duplicate groups: lexical CC puts each
    # group in one component; pinning the semantic side is not
    # possible from documents alone, so check the DEGENERATE identity
    # through the python pair-counting formula instead: ARI of a
    # clustering with itself is exactly 1
    from collections import Counter

    lex = {1: 10, 2: 10, 3: 20, 4: 20, 5: 30}
    cont = Counter((v, v) for v in lex.values())
    comb2 = lambda n: n * (n - 1) // 2
    pb = sum(comb2(n) for n in cont.values())
    pa = sum(comb2(n) for n in Counter(lex.values()).values())
    n = len(lex)
    exp = float(pa) * pa / comb2(n)
    den = float(pa + pa) / 2 - exp
    assert round((pb - exp) / den, 6) == 1.0


# ---------------------------------------------------------------------------
# split_leakage_report
# ---------------------------------------------------------------------------


def _split_of_py(doc_id: int) -> str:
    import hashlib

    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16) % 10
    return "train" if h < 8 else ("valid" if h == 8 else "test")


def test_split_leakage_report_shape_and_bounds(spark, sf_dir):
    rows = QUERIES["split_leakage_report"](spark, sf_dir).collect()
    seen = set()
    for r in rows:
        assert r["split_a"] < r["split_b"]  # normalized, so unique
        assert (r["split_a"], r["split_b"]) not in seen
        seen.add((r["split_a"], r["split_b"]))
        assert {r["split_a"], r["split_b"]} <= {"train", "valid", "test"}
        # distinct docs per side can never exceed the pair count
        assert 1 <= r["n_docs_a"] <= r["n_pairs"]
        assert 1 <= r["n_docs_b"] <= r["n_pairs"]


def test_split_leakage_finds_planted_cross_split_dup(spark, tmp_path):
    # two identical docs whose ids hash to DIFFERENT splits must be
    # reported; two identical docs in the SAME split must not be
    ids = list(range(200))
    train = [i for i in ids if _split_of_py(i) == "train"]
    test = [i for i in ids if _split_of_py(i) == "test"]
    assert train and test, "hash rule drifted?"
    leak_a, leak_b = train[0], test[0]
    same_a, same_b = train[1], train[2]
    body = "alpha beta gamma delta epsilon zeta eta theta"
    filler = [
        (i, f"tok{i}a tok{i}b tok{i}c tok{i}d", "en", "s", 10)
        for i in train[3:8]
    ]
    rows = [
        (leak_a, body, "en", "s", len(body)),
        (leak_b, body, "en", "s", len(body)),
        (same_a, body + " iota", "en", "s", len(body)),
        (same_b, body + " iota", "en", "s", len(body)),
    ] + filler
    df = spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        (r["split_a"], r["split_b"]): r
        for r in QUERIES["split_leakage_report"](spark, str(tmp_path)).collect()
    }
    # the planted cross-split pair is reported under (test, train)
    assert ("test", "train") in out
    r = out[("test", "train")]
    assert r["n_pairs"] >= 1 and r["n_docs_a"] >= 1 and r["n_docs_b"] >= 1
    # the same-split dup contributes to NO cross-split row: every
    # reported row involves two different splits by construction, and
    # no (train, train) key can exist
    assert all(a != b for (a, b) in out)
