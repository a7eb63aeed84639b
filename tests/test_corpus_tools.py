"""Semantic-invariant tests for the corpus-tool and retrieval
additions (language ID, hash splitting, PII redaction, BM25, RAG
chunking) and the extended TPC-H set.  Oracle parity at sf0.001/sf0.01
runs in the global sweep; these pin the properties parity can't see
(split disjointness, chunk reconstruction, score monotonicity,
redaction idempotence)."""

from __future__ import annotations

import pyspark.sql.functions as F

from task_mapreduce_spark.registry import QUERIES
from task_mapreduce_spark.tables import load


def test_langid_predicts_a_known_language(spark, sf_dir):
    rows = QUERIES["text_langid"](spark, sf_dir).collect()
    assert rows
    langs = {"de", "en", "es", "fr", "zh"}
    for r in rows:
        assert r["pred_lang"] in langs
        assert r["true_lang"] in langs
        assert r["is_correct"] == (r["pred_lang"] == r["true_lang"])
    # every classified doc is from the holdout split
    assert all(r["doc_id"] % 5 == 0 for r in rows)


def test_langid_beats_chance_on_the_majority_class(spark, sf_dir):
    # the profile classifier needs no floor on per-language accuracy
    # (the synthetic corpus carries a weak signal), but predicting from
    # learned profiles must at least track the corpus's majority class
    # better than uniform-random 20% overall.
    rows = QUERIES["text_langid"](spark, sf_dir).collect()
    acc = sum(r["is_correct"] for r in rows) / len(rows)
    assert acc >= 0.2, f"profile classifier below chance: {acc:.2f}"


def test_split_is_exhaustive_and_disjoint(spark, sf_dir):
    out = QUERIES["split_train_test"](spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    assert total == d.count()  # every doc in exactly one split
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "valid", "test"}
    # the 80/10/10 target: train strictly dominates at any realistic sf
    by_split = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.sum("n_docs").alias("n")).collect()
    }
    assert by_split["train"] > by_split.get("valid", 0)
    assert by_split["train"] > by_split.get("test", 0)


def test_split_is_stable_across_runs(spark, sf_dir):
    a = {tuple(r) for r in QUERIES["split_train_test"](spark, sf_dir).collect()}
    b = {tuple(r) for r in QUERIES["split_train_test"](spark, sf_dir).collect()}
    assert a == b  # pure hash: no RNG, no run-to-run drift


def test_pii_redaction_counts_match_and_scrub(spark, sf_dir):
    rows = QUERIES["pii_redact"](spark, sf_dir).collect()
    assert rows
    import re

    for r in rows:
        # no 6+-digit run survives redaction
        assert re.search(r"[0-9]{6,}", r["name_redacted"]) is None
        # count equals the masked-marker count (shared pattern)
        assert r["name_redacted"].count("[ACCT]") == r["n_redacted"]
    # the fixture's Customer#NNNNNNNNN names guarantee real redactions
    assert any(r["n_redacted"] > 0 for r in rows)


def test_bm25_ranks_are_dense_and_scores_monotone(spark, sf_dir):
    rows = sorted(
        QUERIES["text_bm25"](spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert rows
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for prev, cur in zip(rows, rows[1:]):
        assert (prev["bm25"], -prev["doc_id"]) >= (cur["bm25"], -cur["doc_id"])
    assert all(r["bm25"] > 0 for r in rows)


def test_rag_chunks_reconstruct_documents(spark, sf_dir):
    # stitching chunk_id-ordered chunks (dropping each successor's
    # overlap) must reproduce the original token stream exactly
    out = QUERIES["rag_chunk"](spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    stride = 24
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        toks: list[str] = []
        for c in chunks:
            ctoks = c["chunk_text"].split(" ") if c["chunk_text"] else []
            assert len(ctoks) == c["n_tokens"]
            start = c["chunk_id"] * stride
            # overlap region must agree with what's already stitched
            assert toks[start:] == ctoks[: len(toks) - start]
            toks = toks[:start] + ctoks
        assert " ".join(toks) == docs[doc_id]


def test_q6_equals_unaggregated_recomputation(spark, sf_dir):
    row = QUERIES["tpch_q6"](spark, sf_dir).collect()[0]
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    assert row["n_items"] == li.count()


def test_q4_orders_counted_once(spark, sf_dir):
    # the semi join must never multiply an order by its line items:
    # total counted orders <= orders in the window
    out = QUERIES["tpch_q4"](spark, sf_dir)
    total = out.agg(F.sum("order_count")).collect()[0][0]
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    assert total <= o.count()


def test_q8_share_is_a_proportion(spark, sf_dir):
    for r in QUERIES["tpch_q8"](spark, sf_dir).collect():
        assert 0.0 <= r["mkt_share"] <= 1.0


def test_bfs_distances_are_frontier_consistent(spark, sf_dir):
    rows = QUERIES["graph_bfs"](spark, sf_dir).collect()
    dist = {r["node"]: r["dist"] for r in rows}
    assert dist.get(0) == 0
    # bipartite graph: customers (even node ids under the parity
    # encoding) sit at even hops, suppliers (odd ids) at odd
    for node, d in dist.items():
        assert 0 <= d <= 4
        assert (d % 2 == 0) == (node % 2 == 0)


def test_collocation_pmi_planted_collocation(spark, tmp_path):
    # "new york" always adjacent -> high positive PMI; "the"+"dog" occur
    # often but rarely adjacent -> their bigram (when present) scores lower
    import math

    from task_mapreduce_spark.registry import QUERIES

    body = ("new york " + "the cat sat . the dog ran . ") * 3 + "the dog"
    rows = [(i, body, "en", "s", len(body)) for i in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    sf = str(tmp_path)
    out = {
        (r["w1"], r["w2"]): r
        for r in QUERIES["text_collocation_pmi"](spark, sf).collect()
    }
    ny = out[("new", "york")]
    assert ny["pmi"] > 0
    # exact value check against the documented formula
    # counts per doc: tokens repeat 3x per doc over 3 docs
    n_ny = ny["n"]
    assert n_ny == 9
    # "the dog" occurs adjacently too, but with much higher unigram mass
    if ("the", "dog") in out:
        assert out[("the", "dog")]["pmi"] < ny["pmi"]


def test_sample_balanced_caps_each_language(spark, sf_dir):
    import collections

    from task_mapreduce_spark.operators.corpus_tools import _BALANCED_CAP
    from task_mapreduce_spark.registry import QUERIES
    from task_mapreduce_spark.tables import load

    full = collections.Counter(
        r["lang"] for r in load(spark, sf_dir, "documents").select("lang").collect()
    )
    rows = QUERIES["sample_balanced"](spark, sf_dir).collect()
    kept = collections.defaultdict(list)
    for r in rows:
        kept[r["lang"]].append(r["rank_in_lang"])
    assert set(kept) == set(full)
    for lang, ranks in kept.items():
        expect = min(_BALANCED_CAP, full[lang])
        assert sorted(ranks) == list(range(1, expect + 1))
    # determinism: the same rows come back on a re-run
    again = {(r["doc_id"], r["lang"]) for r in QUERIES["sample_balanced"](spark, sf_dir).collect()}
    assert again == {(r["doc_id"], r["lang"]) for r in rows}


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_tokenizer_train_bpe_learns_classic_merges(spark, tmp_path):
    # the textbook BPE corpus: low*5 lower*2 newest*6 widest*3.
    # Hand-derived merge table under (count DESC, pair ASC) tiebreak:
    # es(9) est(9) lo(7) low(7) ew(6) ewest(6) newest(6) dest(3)
    sf = _write_docs(
        spark,
        tmp_path,
        ["low " * 5 + "lower " * 2, "newest " * 6 + "widest " * 3],
    )
    rows = QUERIES["tokenizer_train_bpe"](spark, sf).collect()
    got = [(r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"]) for r in rows]
    assert sorted(got) == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
        (4, "lo", "w", "low", 7),
        (5, "e", "w", "ew", 6),
        (6, "ew", "est", "ewest", 6),
        (7, "n", "ewest", "newest", 6),
        (8, "d", "est", "dest", 3),
    ]


def test_tokenizer_train_bpe_same_symbol_run_two_pass_semantics(spark, tmp_path):
    # 'aaaaaa' x4: round 1 counts (a,a) = 5 occurrences x 4 words = 20.
    # Two-pass non-overlapping replace leaves [aa, a, aa, a] (the
    # documented variant vs canonical greedy's [aa, aa, aa]), so round 2
    # must see (aa, a) with count 2 x 4 = 8 — this test pins exactly the
    # defined merge-application semantics on the Spark side (the oracle
    # replays the same two passes in SQL, checked in the global sweep).
    sf = _write_docs(spark, tmp_path, ["aaaaaa " * 4])
    rows = {r["merge_rank"]: r for r in QUERIES["tokenizer_train_bpe"](spark, sf).collect()}
    r1, r2 = rows[1], rows[2]
    assert (r1["left_sym"], r1["right_sym"], r1["cnt"]) == ("a", "a", 20)
    assert (r2["left_sym"], r2["right_sym"], r2["cnt"]) == ("aa", "a", 8)


def test_tokenizer_apply_bpe_classic_corpus_token_budget(spark, tmp_path):
    # after the 8 hand-derived merges (see the trainer golden):
    # low -> [low] (1), lower -> [low, e, r] (3),
    # newest -> [newest] (1), widest -> [w, i, dest] (3)
    sf = _write_docs(
        spark,
        tmp_path,
        ["low " * 5 + "lower " * 2, "newest " * 6 + "widest " * 3],
    )
    out = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in QUERIES["tokenizer_apply_bpe"](spark, sf).collect()}
    assert out == {0: (7, 5 * 1 + 2 * 3), 1: (9, 6 * 1 + 3 * 3)}


def test_tokenizer_eval_vocab_classic_corpus_golden(spark, tmp_path):
    # hand-derived off the trainer golden's segmentations:
    # low->[low](x5), lower->[low,e,r](x2), newest->[newest](x6),
    # widest->[w,i,dest](x3): 16 words, 26 tokens, 79 chars; 11 word
    # occurrences hit a single token, none stay fully char-split.
    sf = _write_docs(
        spark,
        tmp_path,
        ["low " * 5 + "lower " * 2, "newest " * 6 + "widest " * 3],
    )
    r = QUERIES["tokenizer_eval_vocab"](spark, sf).collect()[0]
    assert (
        r["n_word_types"],
        r["n_words"],
        r["n_bpe_tokens"],
        r["n_chars"],
        r["n_words_single_token"],
        r["n_words_char_fallback"],
    ) == (4, 16, 26, 79, 11, 0)
    assert r["fertility"] == 1.625
    assert r["chars_per_token"] == 3.038462
    assert r["coverage_single"] == 0.6875
    assert r["fallback_rate"] == 0.0


def test_bpe_pair_exhausted_corpus(spark, tmp_path):
    # 'ab ab ab' supports exactly ONE merge (a,b) — rounds 2..8 have an
    # empty argmax.  The Spark loop breaks; the oracle's rounds must
    # pass the vocabulary through via the LEFT JOIN ON TRUE + NULL-pair
    # CASE (a cross join with the empty b{r} annihilated w{r} for every
    # later round, zeroing the APPLY oracle's vocabulary — the round-7
    # ADVICE finding).  Both keys checked against their DuckDB oracles.
    import duckdb

    from task_mapreduce_spark.registry import ORACLES

    sf = _write_docs(spark, tmp_path, ["ab ab ab"])

    got_train = sorted(
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"], r["cnt"])
        for r in QUERIES["tokenizer_train_bpe"](spark, sf).collect()
    )
    assert got_train == [(1, "a", "b", "ab", 3)]

    got_apply = sorted(
        (r["doc_id"], r["n_words"], r["n_bpe_tokens"])
        for r in QUERIES["tokenizer_apply_bpe"](spark, sf).collect()
    )
    assert got_apply == [(0, 3, 3)]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want_train = sorted(con.execute(ORACLES["tokenizer_train_bpe"]).fetchall())
    assert [tuple(r) for r in want_train] == got_train
    want_apply = sorted(con.execute(ORACLES["tokenizer_apply_bpe"]).fetchall())
    assert [tuple(r) for r in want_apply] == got_apply
    con.close()


def test_dedup_chunks_invariants(spark, sf_dir):
    rows = QUERIES["dedup_chunks"](spark, sf_dir).collect()
    assert rows
    by_h = {}
    for r in rows:
        by_h.setdefault(r["h"], []).append(r)
    for h, grp in by_h.items():
        keeps = [r for r in grp if r["keep"]]
        assert len(keeps) == 1, f"{h}: {len(keeps)} keeps"
        owner = min((r["doc_id"], r["chunk_id"]) for r in grp)
        k = keeps[0]
        assert (k["doc_id"], k["chunk_id"]) == owner
        assert k["dup_of_doc"] is None and k["dup_of_chunk"] is None
        for r in grp:
            if not r["keep"]:
                assert (r["dup_of_doc"], r["dup_of_chunk"]) == owner


def test_dedup_chunks_planted_duplicate_docs(spark, tmp_path):
    # doc 7 repeats doc 2's text verbatim: every one of doc 7's chunks
    # must resolve to doc 2's same-position chunk; doc 0's unique text
    # keeps everything.  48 tokens -> chunk starts at 1 and 25 (stride
    # 24), so 2 chunks per doc.
    base = " ".join(f"tok{i}" for i in range(48))
    uniq = " ".join(f"only{i}" for i in range(48))
    rows = [(0, uniq, "en", "s", len(uniq)),
            (2, base, "en", "s", len(base)),
            (7, base, "en", "s", len(base))]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        (r["doc_id"], r["chunk_id"]): r
        for r in QUERIES["dedup_chunks"](spark, str(tmp_path)).collect()
    }
    assert len(got) == 6
    for cid in (0, 1):
        assert got[(0, cid)]["keep"]
        assert got[(2, cid)]["keep"]
        r = got[(7, cid)]
        assert not r["keep"]
        assert (r["dup_of_doc"], r["dup_of_chunk"]) == (2, cid)


# ---------------------------------------------------------------------------
# retrieval_fuse_rrf
# ---------------------------------------------------------------------------


def test_rrf_score_decomposes_into_arm_ranks(spark, sf_dir):
    # rrf_score must be EXACTLY the two-term RRF formula over the arm
    # ranks carried in the row — no hidden third arm, no unrounded drift
    rows = QUERIES["retrieval_fuse_rrf"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["lex_rank"] is not None or r["sem_rank"] is not None
        expect = 0.0
        if r["lex_rank"] is not None:
            assert 1 <= r["lex_rank"] <= 20
            expect += 1.0 / (60 + r["lex_rank"])
        if r["sem_rank"] is not None:
            assert 1 <= r["sem_rank"] <= 20
            expect += 1.0 / (60 + r["sem_rank"])
        assert r["rrf_score"] == round(expect, 9)
        assert r["doc_id"] != r["query_id"]  # both arms exclude self


def test_rrf_fused_ranks_dense_and_ordered(spark, sf_dir):
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in QUERIES["retrieval_fuse_rrf"](spark, sf_dir).collect():
        per_q[r["query_id"]].append(r)
    assert set(per_q) == set(range(5))  # the standing 5-probe set
    for rows in per_q.values():
        rows.sort(key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in rows] == list(
            range(1, len(rows) + 1)
        )
        assert len(rows) <= 10
        for prev, cur in zip(rows, rows[1:]):
            # descending on rounded score, doc_id tiebreak
            assert (-prev["rrf_score"], prev["doc_id"]) < (
                -cur["rrf_score"], cur["doc_id"]
            )


def test_rrf_semantic_ranks_agree_with_sim_search_topk(spark, sf_dir):
    # the fused key's semantic arm is sim_search_topk's construction on
    # the SAME probe set: wherever a fused row carries a sem_rank inside
    # topk's depth, the standalone operator must assign the same rank
    topk = {
        (r["query_id"], r["vec_id"]): r["rank"]
        for r in QUERIES["sim_search_topk"](spark, sf_dir).collect()
    }
    fused = QUERIES["retrieval_fuse_rrf"](spark, sf_dir).collect()
    checked = 0
    for r in fused:
        if r["sem_rank"] is not None and r["sem_rank"] <= 10:
            # .get, not [·]: a rank disagreement that pushes the pair
            # past topk's depth must read as a rank mismatch, not a
            # KeyError (round-10 ADVICE)
            assert topk.get((r["query_id"], r["doc_id"])) == r["sem_rank"]
            checked += 1
    assert checked, "no fused row fell inside topk depth — fixture drift?"


# ---------------------------------------------------------------------------
# retrieval_eval_rank
# ---------------------------------------------------------------------------


def test_retrieval_eval_rank_matches_pure_python_replay(spark, sf_dir):
    # independent metric replay: collect both registered arms and
    # recompute MRR / DCG / IDCG / nDCG in plain python with the same
    # rounding discipline — no SQL shared with either engine
    import math
    from decimal import Decimal

    # the operator and oracle derive rel from llm_pipeline._TOP_K —
    # import it so a depth change can't silently grade against stale
    # relevance (round-11 ADVICE)
    from task_mapreduce_spark.operators.llm_pipeline import _TOP_K as K
    rel = {
        (r["query_id"], r["vec_id"]): K + 1 - r["rank"]
        for r in QUERIES["sim_search_topk"](spark, sf_dir).collect()
    }
    fused: dict[int, list] = {}
    for r in QUERIES["retrieval_fuse_rrf"](spark, sf_dir).collect():
        fused.setdefault(r["query_id"], []).append(
            (r["fused_rank"], rel.get((r["query_id"], r["doc_id"]), 0))
        )
    got = {
        r["query_id"]: r
        for r in QUERIES["retrieval_eval_rank"](spark, sf_dir).collect()
    }
    assert set(got) == set(fused)
    for q, pairs in fused.items():
        dcg = float(
            sum(
                Decimal(str(round(rl / math.log2(1 + rk), 9)))
                for rk, rl in pairs
            )
        )
        rels = sorted(
            (rl for (qq, _), rl in rel.items() if qq == q), reverse=True
        )
        idcg = float(
            sum(
                Decimal(str(round(rl / math.log2(1 + i), 9)))
                for i, rl in enumerate(rels, start=1)
            )
        )
        found = [rk for rk, rl in pairs if rl > 0]
        r = got[q]
        assert r["n_relevant_found"] == len(found)
        assert r["mrr"] == round(1.0 / min(found), 9) if found else r["mrr"] == 0.0
        assert abs(r["dcg_r"] - round(dcg, 9)) < 1e-9
        assert abs(r["ndcg"] - round(dcg / idcg, 6)) < 1e-6
        assert 0.0 <= r["ndcg"] <= 1.0
        assert 0.0 <= r["mrr"] <= 1.0


def test_retrieval_eval_rank_non_vacuous(spark, sf_dir):
    rows = QUERIES["retrieval_eval_rank"](spark, sf_dir).collect()
    assert len(rows) == 5  # one row per standing probe query
    # the semantic arm IS the exact construction at depth 20, so the
    # fused list must overlap the truth somewhere, or the eval graded
    # nothing
    assert any(r["n_relevant_found"] > 0 for r in rows)
