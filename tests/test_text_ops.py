"""Unit tests for text operators and engine-scoped caching added in
round 3: sliding-window chunking, tracked-persist release, one-job
hot-key detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from glamira_end_to_end_data_pipeline_spark.caching import (
    release_tracked,
    tracked_persist,
)
from glamira_end_to_end_data_pipeline_spark.operators import text
from glamira_end_to_end_data_pipeline_spark.operators.skew import detect_hot_keys
from glamira_end_to_end_data_pipeline_spark.operators.text import chunk_documents


def _chunks(spark, text, chunk_tokens=4, overlap=1):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (
        chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap)
        .orderBy("chunk_id")
        .collect()
    )
    return [(r.chunk_id, r.n_tokens, r.chunk_text) for r in rows]


def test_chunking_short_doc_single_chunk(spark):
    assert _chunks(spark, "a b c") == [(0, 3, "a b c")]


def test_chunking_exact_boundary_no_empty_tail(spark):
    # 4 tokens, chunk=4: exactly one window, no empty second chunk
    assert _chunks(spark, "a b c d") == [(0, 4, "a b c d")]


def test_chunking_overlap_carried(spark):
    # chunk=4, overlap=1 -> stride 3: windows [1..4], [4..7], [7..9]
    got = _chunks(spark, "t1 t2 t3 t4 t5 t6 t7 t8 t9")
    assert got == [
        (0, 4, "t1 t2 t3 t4"),
        (1, 4, "t4 t5 t6 t7"),
        (2, 3, "t7 t8 t9"),
    ]


def test_chunking_every_token_covered(spark):
    text = " ".join(f"w{i}" for i in range(100))
    got = _chunks(spark, text, chunk_tokens=32, overlap=8)
    covered = set()
    for _, _, chunk in got:
        covered.update(chunk.split(" "))
    assert covered == {f"w{i}" for i in range(100)}


def test_chunking_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    try:
        chunk_documents(df, chunk_tokens=4, overlap=4)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_tracked_persist_release_only_engine_blocks(spark):
    """release_tracked must unpersist engine-tracked frames and leave
    host-session caches alone."""
    host = spark.range(100).persist()
    host.count()
    engine = tracked_persist(spark.range(50))
    engine.count()
    assert engine.storageLevel.useMemory
    release_tracked()
    assert not engine.storageLevel.useMemory, "tracked block not released"
    assert host.storageLevel.useMemory, "host cache was wrongly nuked"
    host.unpersist()


def test_release_tracked_idempotent_and_empty_safe(spark):
    release_tracked()
    release_tracked()


def test_detect_hot_keys_single_action(spark, monkeypatch):
    """Hot-key detection finds exactly the >=min_frac keys — with ONE
    action over ONE pass of the input (the total folds into the same
    aggregation as a window sum; no separate count() scan). Job counts
    are an AQE artifact, so the single-pass contract is asserted by
    banning a second action outright."""
    rows = [(k,) for k in ["hot"] * 60 + ["warm"] * 25 + list("abcdefghij")]
    df = spark.createDataFrame(rows, "k string").repartition(8)

    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    def _no_count(self):
        raise AssertionError("detect_hot_keys must not run a count() action")

    monkeypatch.setattr(ClassicDF, "count", _no_count)
    got = set(detect_hot_keys(df, "k", min_frac=0.2))
    assert got == {"hot", "warm"}


def test_winnowing_guarantee_and_tie_rule(spark):
    """Any shared substring of length >= w+k-1 must yield a shared
    fingerprint (the winnowing guarantee); disjoint texts share none;
    identical texts share all."""
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    shared_run = "zq xv jw pk mt rb ld ng"  # 23 chars >= w+k-1 = 15
    rows = [
        (1, f"alpha beta {shared_run} gamma delta"),
        (2, f"one two three {shared_run} four five"),
        (3, "totally different words entirely here now"),
        (4, f"alpha beta {shared_run} gamma delta"),  # identical to 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        i: {r.fp for r in rows_}
        for i, rows_ in (
            (i, winnow_fingerprints(df.filter(f"doc_id = {i}"), k=8, w=8).collect())
            for i in (1, 2, 3, 4)
        )
    }
    assert fps[1] & fps[2], "winnowing guarantee violated for shared run"
    assert fps[1] == fps[4], "identical texts must fingerprint identically"
    assert not (fps[1] & fps[3]), "disjoint texts should share nothing"
    pairs = {
        (r.a, r.b) for r in winnow_pairs(df, k=8, w=8, min_shared=1).collect()
    }
    assert (1, 4) in pairs and (1, 2) in pairs and (1, 3) not in pairs


def test_winnow_pairs_hub_guard_bounds_boilerplate_fanout(spark):
    """A boilerplate substring shared by D documents selects hot
    fingerprints that would fan the self-join into D^2 pair rows on
    one key. With max_fp_df below D those fingerprints are dropped
    BEFORE the join: hub-only pairs vanish while pairs sharing
    genuinely rare runs survive (their n_shared counting non-hub
    fingerprints only)."""
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        winnow_pairs,
    )

    import hashlib

    boiler = "this footer text appears on every single page"
    # md5-hex filler: no two docs share a >=15-char run outside the boilerplate
    uniq = lambda i: hashlib.md5(str(i).encode()).hexdigest()  # noqa: E731
    docs = [(i, f"{uniq(i)} {uniq(i + 1000)} {boiler}") for i in range(1, 31)]
    # docs 100/101 share a rare run on top of the boilerplate
    rare = "xq zv wj kp tm br dl gn extra rare run"
    docs += [(100, f"{boiler} {rare} tail alpha"), (101, f"{boiler} {rare} tail beta")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    uncapped = {
        (r.a, r.b) for r in winnow_pairs(df, k=8, w=8, min_shared=1).collect()
    }
    assert len(uncapped) >= 32 * 31 / 2 - 40  # near all-pairs: the blowup

    capped = {
        (r.a, r.b)
        for r in winnow_pairs(df, k=8, w=8, min_shared=1, max_fp_df=10).collect()
    }
    assert (100, 101) in capped, "rare-run pair must survive the guard"
    # Selection is window-context-dependent, so a boilerplate gram
    # picked in <=cap docs legitimately survives — the guarantee is
    # bounded per-key fan-out (each surviving fingerprint contributes
    # <= cap^2/2 pairs), not zero boilerplate pairs. The clique must
    # collapse: near-all-pairs uncapped, a sparse remnant capped.
    assert len(capped) < len(uncapped) / 4, (len(capped), len(uncapped))


def test_sampling_and_mixing_deterministic_under_repartition(spark):
    """Membership/fan-out must be pure functions of the id: identical
    results across re-runs and partitionings, expected mixing rate
    close to the weight."""
    from glamira_end_to_end_data_pipeline_spark.operators.text import (
        mix_epochs,
        sample_stratified,
    )

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    kept1 = {r.doc_id for r in sample_stratified(df, {"en": 0.3, "de": 0.7}).collect()}
    kept2 = {
        r.doc_id
        for r in sample_stratified(df.repartition(13), {"en": 0.3, "de": 0.7}).collect()
    }
    assert kept1 == kept2, "sampling membership changed with partitioning"
    en_rate = len([d for d in kept1 if d % 2 == 0]) / 1000
    assert 0.25 < en_rate < 0.35, en_rate

    m1 = sorted((r.doc_id, r.epoch) for r in mix_epochs(df, {"en": 2.5, "de": 0.0}).collect())
    m2 = sorted(
        (r.doc_id, r.epoch) for r in mix_epochs(df.repartition(7), {"en": 2.5, "de": 0.0}).collect()
    )
    assert m1 == m2, "mixing fan-out changed with partitioning"
    assert all(d % 2 == 0 for d, _ in m1), "zero-weight stratum leaked"
    rate = len(m1) / 1000
    assert 2.4 < rate < 2.6, rate
    assert {e for _, e in m1} == {1, 2, 3}, "epoch indices must be 1-based"


def test_segment_boilerplate_flags_shared_windows(spark):
    """Segments (10-token windows) appearing in >=2 distinct docs are
    boilerplate; within-doc repetition alone is not."""
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        segment_boilerplate,
    )

    banner = "please accept all cookies to continue reading this site now"  # 10 toks
    uniq = [f"w{i}" for i in range(10)]
    rows = [
        (1, banner + " " + " ".join(uniq)),            # banner + unique tail
        (2, banner + " " + " ".join(f"x{i}" for i in range(10))),
        (3, " ".join(f"y{i}" for i in range(20))),      # all unique
        (4, banner + " " + banner),                     # banner twice, 1 doc... but shared with 1,2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_segments, r.n_boilerplate)
        for r in segment_boilerplate(df, seg_tokens=10, min_docs=2).collect()
    }
    assert got[1] == (2, 1)
    assert got[2] == (2, 1)
    assert got[3] == (2, 0)
    assert got[4] == (2, 2)  # both segments ARE the shared banner


def test_segment_boilerplate_within_doc_repeat_not_flagged(spark):
    """A segment repeated only inside ONE doc has doc-frequency 1."""
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        segment_boilerplate,
    )

    seg = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, seg + " " + seg), (2, " ".join(f"u{i}" for i in range(10)))],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_segments, r.n_boilerplate)
        for r in segment_boilerplate(df, seg_tokens=10, min_docs=2).collect()
    }
    assert got[1] == (2, 0)
    assert got[2] == (1, 0)


def test_bpe_merges_learns_and_fuses(spark):
    """Round 1 picks the most frequent adjacent pair (ties -> lexico
    smallest); the fuse is visible to round 2 (merged token becomes one
    unit, so the old pair is gone and a new pair involving the fused
    token can win)."""
    from glamira_end_to_end_data_pipeline_spark.operators.text import bpe_merges

    rows = [
        (1, "low low low lower lowest"),
        (2, "low low new"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.step, r.pair, r.n_occurrences) for r in bpe_merges(df, 2).collect()]
    # 'low low' occurs: doc1 'low low low' -> 2 bigrams, doc2 -> 1 = 3, top.
    assert got[0] == (1, "low low", 3)
    # after fusing left-to-right: doc1 'low_low low lower lowest',
    # doc2 'low_low new'. Bigrams now include ('low_low', 'low') etc.;
    # step 2's winner must involve a fused token or a fresh pair, never
    # the consumed 'low low'.
    assert got[1][1] != "low low"
    step2_pairs = {got[1][1]}
    assert any("low_low" in p or "low" in p for p in step2_pairs)


def test_bpe_merges_overlap_left_to_right(spark):
    """Delimiter-consuming left-to-right fuse on a run: in ' b b b b '
    the first ' b b ' match consumes the middle space, so the
    immediately following overlapping site has no leading delimiter and
    survives to the next round — 'b_b b b'. The point under test is
    that the engine-side replace semantics are deterministic and match
    the SQL twin (both resume scanning after the matched span), not
    classic array-BPE merge order."""
    from glamira_end_to_end_data_pipeline_spark.operators.text import bpe_merges

    df = spark.createDataFrame([(1, "b b b b")], "doc_id long, text string")
    got = [(r.step, r.pair, r.n_occurrences) for r in bpe_merges(df, 2).collect()]
    assert got[0] == (1, "b b", 3)
    # round 2 stream is 'b_b b b': pairs {'b_b b': 1, 'b b': 1};
    # lexicographic tiebreak picks 'b b' again.
    assert got[1] == (2, "b b", 1)


def test_hybrid_rrf_semantics(spark):
    """RRF fusion math on hand-built rank lists: a doc on BOTH lists
    beats a doc that is rank 1 on only one (1/61+1/70 > 1/61), and a
    missing side contributes exactly 0."""
    from pyspark.sql import functions as F

    lex = spark.createDataFrame(
        [(10, 1), (20, 2)], "doc_id long, r_lex int"
    )
    sem = spark.createDataFrame(
        [(10, 10), (30, 1)], "doc_id long, r_sem int"
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(F.lit(1.0) / (60 + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (60 + F.col("r_sem")), F.lit(0.0)),
            6,
        ).alias("s"),
    )
    got = {r.doc_id: r.s for r in fused.collect()}
    assert got[10] == round(1 / 61 + 1 / 70, 6)   # both lists
    assert got[30] == round(1 / 61, 6)            # sem only
    assert got[20] == round(1 / 62, 6)            # lex only
    assert got[10] > got[30] > got[20]


def test_dsir_weights_prefers_target_like_docs(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.text import dsir_weights

    # Target docs (is_tgt) speak "alpha beta"; off-target docs speak
    # "gamma delta"; the probe doc 99 mixes but leans target.
    rows = [
        (1, "alpha beta alpha beta", "en"),
        (2, "alpha beta beta alpha", "en"),
        (3, "gamma delta gamma delta", "zh"),
        (4, "delta gamma delta gamma", "zh"),
        (99, "alpha beta gamma", "zh"),
        (98, "gamma delta alpha", "zh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = dsir_weights(df, F.col("lang") == "en", n_buckets=64, k_top=6).collect()
    w = {r.doc_id: r.log_weight for r in got}
    # Pure-target docs outrank pure-off-target docs.
    assert w[1] > w[3] and w[2] > w[4]
    # The target-leaning mixed doc outranks the off-target-leaning one.
    assert w[99] > w[98]
    # Rank order is weight desc.
    weights = [r.log_weight for r in got]
    assert weights == sorted(weights, reverse=True)


def test_ann_recall_counts_overlap(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.similarity import (
        ann_recall,
    )

    gt = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12)],
        "query_id long, neighbor_id long",
    )
    ann = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 13), (2, 14)],
        "query_id long, neighbor_id long",
    )
    got = {r.query_id: (r.n_hit, r.recall) for r in ann_recall(gt, ann).collect()}
    assert got[1] == (1, 0.5)   # one of GT's two found
    assert got[2] == (0, 0.0)   # ANN missed entirely but query still reported


def test_bpe_encode_counts_fused_tokens(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.text import bpe_encode

    # "a b" dominates -> merge 1 fuses it. In doc 1 ("a b a b") the
    # first fuse consumes its trailing space, so the immediately-
    # adjacent second site survives the round (the documented
    # left-to-right stream-replace semantics): 4 tokens -> 3, 1 fused.
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d e"), (3, "a b c")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.n_fused, r.n_tokens_orig)
           for r in bpe_encode(df, n_merges=1).collect()}
    assert got[1] == (3, 1, 4)
    assert got[2] == (3, 0, 3)
    assert got[3] == (2, 1, 3)


def test_ppl_buckets_terciles(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.text import ppl_buckets

    # Nine two-token docs. Scores: "a a" -> ln(6/8) = -0.2877 (majority
    # transition), "a b" -> ln(2/8) = -1.3863 (unlikely under w1='a'),
    # "b c" -> ln(1/1) = 0.0 ('b' is rare but its only continuation).
    # Terciles land both thresholds on -0.2877, so >= puts the seven
    # docs at or above it in head and the two "a b" docs in tail.
    rows = [(i, "a a") for i in range(6)] + [(6, "a b"), (7, "a b"), (8, "b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.ppl_bucket for r in ppl_buckets(df).collect()}
    assert all(got[i] == "head" for i in range(6))
    assert got[8] == "head"
    assert got[6] == "tail" and got[7] == "tail"


def test_classifier_score_bounds_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lorem ipsum dolor"), (3, "")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text.classifier_score(docs).collect()}
    for r in rows.values():
        assert 0.0 <= r["clf_score"] <= 1.0
        assert r["clf_label"] in ("keep", "drop")
        assert r["clf_label"] == ("keep" if r["clf_score"] >= 0.5 else "drop")
    # Same text → identical score (pure function of content).
    again = {r["doc_id"]: r for r in text.classifier_score(docs).collect()}
    assert rows == again


def test_domain_cap_keeps_best_per_domain(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i % 2}", 100 - i) for i in range(10)],
        ["doc_id", "source", "n_chars"],
    )
    kept = text.domain_cap(docs, cap=3).collect()
    assert len(kept) == 6  # 3 per domain
    for r in kept:
        assert r["domain_total"] == 5
        assert 1 <= r["domain_rank"] <= 3
    # Highest n_chars survive: doc_ids 0..5 (n_chars 100..95).
    assert sorted(r["doc_id"] for r in kept) == [0, 1, 2, 3, 4, 5]


def test_domain_cap_tiebreak_is_id_asc(spark):
    docs = spark.createDataFrame(
        [(i, "d", 7) for i in range(5)], ["doc_id", "source", "n_chars"]
    )
    kept = sorted(r["doc_id"] for r in text.domain_cap(docs, cap=2).collect())
    assert kept == [0, 1]


def test_quality_score_passthrough_carries_columns(spark):
    # passthrough keeps the pipeline one map-only projection: the
    # carried column must arrive unchanged next to the score columns.
    from glamira_end_to_end_data_pipeline_spark.operators.text import quality_score

    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog", "web")],
        "doc_id long, text string, source string",
    )
    out = quality_score(df, passthrough=("text", "source"))
    assert out.columns[:3] == ["doc_id", "text", "source"]
    row = out.collect()[0]
    assert row["text"].startswith("the quick")
    assert row["source"] == "web"
    # default stays score-only (no silent schema change for callers)
    assert "text" not in quality_score(df).columns


def test_span_duplication_stats_catches_unaligned_repeats(spark):
    """Overlapping stride-1 spans must flag a verbatim repeat at ANY
    alignment; per-doc dup_frac is 1.0 for exact copies and 0 for
    unique text."""
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        span_duplication_stats,
    )

    shared = "one two three four five six"  # 6 tokens
    rows = [
        (1, f"{shared} tail1 tail2"),
        (2, f"head1 head2 head3 {shared}"),    # same run, shifted alignment
        (3, "u1 u2 u3 u4 u5 u6 u7 u8"),        # unique
        (4, f"{shared} tail1 tail2"),          # exact copy of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_frac)
        for r in span_duplication_stats(df, n=6).collect()
    }
    # docs 1 and 4 identical -> every span duplicated
    assert got[1][2] == 1.0 and got[4][2] == 1.0
    # doc 2 shares exactly the one 6-token run with 1/4 despite the
    # alignment shift (fixed segmentation would miss it)
    assert got[2][1] >= 1
    # unique doc shares nothing
    assert got[3][1] == 0


def test_cdc_chunks_shift_invariance_and_totals(spark):
    """The CDC property fixed windows lack: prepending tokens to a doc
    leaves the chunking of the shared suffix intact (after the first
    content-defined boundary), so the shared suffix's chunks still
    dedup across the original and the revised doc."""
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        cdc_chunk_stats,
    )

    base = " ".join(f"tok{i}" for i in range(120))
    revised = "inserted preamble " + base
    df = spark.createDataFrame(
        [(1, base), (2, revised), (3, "unrelated words entirely here")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in cdc_chunk_stats(df).collect()}
    # token totals are exact
    assert rows[1].n_tokens == 120
    assert rows[2].n_tokens == 122
    assert rows[3].dup_chunks == 0
    # the shared suffix dedups: most of doc 1's tokens are in chunks
    # whose exact content also appears in doc 2 (all but the prefix up
    # to the first boundary).
    assert rows[1].dup_token_frac > 0.8
    assert rows[2].dup_tokens == rows[1].dup_tokens


def test_cdc_chunks_single_token_and_empty_docs(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        cdc_chunk_stats,
    )

    df = spark.createDataFrame(
        [(1, "solo"), (2, "   "), (3, "")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in cdc_chunk_stats(df).collect()}
    assert set(rows) == {1}  # blank docs filtered, no sequence(1,0) trap
    assert rows[1].n_chunks == 1 and rows[1].n_tokens == 1


def test_cdc_chunks_cover_every_token_exactly_once(spark):
    from glamira_end_to_end_data_pipeline_spark.operators.dedup import (
        cdc_chunk_stats,
    )

    texts = [(i, " ".join(f"w{i}_{j}" for j in range(i * 7 % 50 + 1))) for i in range(1, 20)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    rows = cdc_chunk_stats(df).collect()
    for r in rows:
        expect = len(texts[r.doc_id - 1][1].split())
        assert r.n_tokens == expect, r


def test_seq_pack_split_window_invariants(spark):
    """text_seq_pack_split: every window except each shard's tail holds
    exactly _PACK_W tokens; per-shard window totals equal the shard's
    total token count (no token lost or double-counted across split
    boundaries); carryover counts docs that entered mid-window."""
    from __spark_entry__ import queries
    from glamira_end_to_end_data_pipeline_spark.plans.r8_queries import (
        _PACK_W,
    )

    rows = queries()["text_seq_pack_split"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    import duckdb

    tot = dict(
        duckdb.sql(
            """
        SELECT doc_id % 8 AS shard,
               sum(len(regexp_split_to_array(trim(lower(text)), '\\s+')))
        FROM '/root/testdata/sf0.001/documents.parquet' GROUP BY 1
        """
        ).fetchall()
    )
    for shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r.window_id)
        # contiguous window ids from 0
        assert [r.window_id for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert r.n_tokens == _PACK_W, r
        assert 0 < rs[-1].n_tokens <= _PACK_W
        assert sum(r.n_tokens for r in rs) == tot[shard]
        assert all(0 <= r.n_carryover <= r.n_docs for r in rs)


def test_kmv_estimate_within_theory_envelope(spark):
    """a_kmv_distinct_merge: the KMV estimator's relative standard
    error is ~1/sqrt(k-2) (~13% at k=64); assert a generous 4-sigma
    envelope on every graded week so a hash/merge regression (which
    produces order-of-magnitude drift) cannot hide."""
    from __spark_entry__ import queries

    rows = queries()["a_kmv_distinct_merge"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows
    for r in rows:
        if r.exact_distinct >= 64:
            assert (
                abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
                < 0.52
            ), r
