"""Unit tests for the corpus-assembly / analytics batch: funnel,
cohort retention, collocations, deterministic split, decontamination."""

import datetime as dt

import pytest


def _ts(day, h=0, m=0):
    return dt.datetime(2024, 1, day, h, m)


@pytest.fixture()
def events(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, _ts(1, 9), "view"), (1, _ts(1, 10), "click"),
        (1, _ts(2, 8), "purchase"),
        # u2 clicks BEFORE viewing: click must not count; then clicks
        # again after the view but never purchases
        (2, _ts(1, 8), "click"), (2, _ts(1, 9), "view"),
        (2, _ts(1, 10), "click"),
        # u3 purchases before clicking: stops at click
        (3, _ts(1, 9), "view"), (3, _ts(1, 10), "purchase"),
        (3, _ts(1, 11), "click"),
        # u4 views only
        (4, _ts(1, 9), "view"),
        # u5 never views: not in the funnel at all
        (5, _ts(1, 9), "click"), (5, _ts(1, 10), "purchase"),
        # u6 same-timestamp view+click: >= lets the tie count
        (6, _ts(1, 9), "view"), (6, _ts(1, 9), "click"),
    ]
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, "
                                       "event_type string")


def test_funnel_min_ts_cascade(spark, events):
    from schema_inference_spark.operators.sessions import funnel
    out = funnel(events, ["view", "click", "purchase"]).collect()
    assert [r.step for r in out] == ["view", "click", "purchase"]
    # step1 = {u1,u2,u3,u4,u6}; step2 = {u1,u2,u3,u6} (u2's pre-view
    # click ignored, u3's click at 11 is >= its view, u6's tie counts);
    # step3 = {u1} (u3 purchased BEFORE its qualifying click)
    assert [(r.step_idx, r.n_users) for r in out] == [(1, 5), (2, 4),
                                                      (3, 1)]
    by_step = {r.step_idx: r for r in out}
    assert by_step[1].conv_prev_bp == 10000
    assert by_step[2].conv_prev_bp == (10000 * 4) // 5
    assert by_step[3].conv_prev_bp == (10000 * 1) // 4
    assert by_step[3].conv_first_bp == (10000 * 1) // 5


def test_funnel_empty_first_step(spark, events):
    from schema_inference_spark.operators.sessions import funnel
    out = funnel(events, ["signup", "purchase"]).collect()
    assert [(r.n_users, r.conv_prev_bp, r.conv_first_bp)
            for r in out] == [(0, None, None), (0, None, None)]


def test_funnel_rejects_single_step(spark, events):
    from schema_inference_spark.operators.sessions import funnel
    with pytest.raises(ValueError):
        funnel(events, ["view"])


def test_cohort_retention(spark):
    from schema_inference_spark.operators.sessions import cohort_retention
    rows = [
        # cohort Jan 1: u1 active day 0,1,3; u2 day 0 only
        (1, _ts(1, 9)), (1, _ts(1, 23)), (1, _ts(2, 1)), (1, _ts(4, 5)),
        (2, _ts(1, 12)),
        # cohort Jan 2: u3 active day 0 and 40 (beyond max_offset=30)
        (3, _ts(2, 9)), (3, dt.datetime(2024, 2, 11, 9)),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = {(str(r.cohort_date), r.day_offset): (r.n_users, r.retained_bp)
           for r in cohort_retention(df, max_offset=30).collect()}
    assert out[("2024-01-01", 0)] == (2, 10000)
    assert out[("2024-01-01", 1)] == (1, 5000)
    assert out[("2024-01-01", 3)] == (1, 5000)
    assert out[("2024-01-02", 0)] == (1, 10000)
    # the day-40 activity is outside the window entirely
    assert all(off <= 30 for (_, off) in out)
    assert len(out) == 4


def test_collocations_dice(spark):
    from schema_inference_spark.operators.textstats import collocations
    # "new york" appears 3x; "new" 4x, "york" 3x -> dice = 2*10000*3 // 7
    docs = spark.createDataFrame(
        [(1, "new york new york is big"),
         (2, "new york and a new day"),
         (3, "day after day after day")],
        "doc_id bigint, text string")
    out = {r.gram: r for r in
           collocations(docs, k=10, min_count=2).collect()}
    ny = out["new york"]
    assert (ny.n_occurrences, ny.c_left, ny.c_right) == (3, 4, 3)
    assert ny.dice_bp == (2 * 10000 * 3) // (4 + 3)
    # min_count filters one-off bigrams
    assert "is big" not in out
    # "after day" occurs 2x: day=4, after=2 -> 2*10000*2 // 6
    assert out["after day"].dice_bp == (2 * 10000 * 2) // 6
    # ranks are 1..n and ordered by (dice desc, count desc, gram)
    ranked = sorted(out.values(), key=lambda r: r.rank)
    keys = [(-r.dice_bp, -r.n_occurrences, r.gram) for r in ranked]
    assert keys == sorted(keys)


def test_split_assign_deterministic_and_exhaustive(spark):
    from schema_inference_spark.operators.curation import split_assign
    docs = spark.createDataFrame(
        [(i, f"text {i}", f"s{i % 3}") for i in range(500)],
        "doc_id bigint, text string, source string")
    a = {r.doc_id: (r.bucket, r.split)
         for r in split_assign(docs).collect()}
    b = {r.doc_id: (r.bucket, r.split)
         for r in split_assign(docs).collect()}
    assert a == b                       # re-run stable
    assert len(a) == 500                # every doc assigned exactly once
    for doc_id, (bucket, split) in a.items():
        want = ("train" if bucket < "c0"
                else "val" if bucket < "e0" else "test")
        assert split == want
    # appending docs never moves existing assignments
    more = spark.createDataFrame(
        [(i, f"text {i}", f"s{i % 3}") for i in range(800)],
        "doc_id bigint, text string, source string")
    c = {r.doc_id: (r.bucket, r.split)
         for r in split_assign(more).collect()}
    assert all(c[k] == v for k, v in a.items())
    # a different salt is a different (but still total) assignment
    d = {r.doc_id: r.split
         for r in split_assign(docs, salt="v2").collect()}
    assert len(d) == 500
    assert any(d[k] != a[k][1] for k in d)


def test_split_balance_sums(spark):
    from schema_inference_spark.operators.curation import split_balance
    docs = spark.createDataFrame(
        [(i, "one two three", "s") for i in range(400)],
        "doc_id bigint, text string, source string")
    rows = split_balance(docs).collect()
    assert sum(r.n_docs for r in rows) == 400
    assert sum(r.ws_tokens for r in rows) == 1200
    for r in rows:
        assert r.share_bp == (10000 * r.n_docs) // 400
        assert r.token_share_bp == (10000 * r.ws_tokens) // 1200
    # ~75/12.5/12.5 within generous tolerance at n=400
    share = {r.split: r.share_bp for r in rows}
    assert 6500 <= share["train"] <= 8500
    assert 500 <= share["val"] <= 2200
    assert 500 <= share["test"] <= 2200


def test_decontaminate_summary_planted(spark):
    from schema_inference_spark.operators.contamination import (
        decontaminate_summary,
    )
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(1, "intro words then " + bench_text + " trailing words", "a"),
         (2, "totally unrelated content about other things here", "a"),
         (3, "more unrelated words that share no shingles at all", "b")],
        "doc_id bigint, text string, source string")
    bench = spark.createDataFrame([(100, bench_text)],
                                  "bench_id bigint, text string")
    out = {r.source: r for r in
           decontaminate_summary(corpus, bench, threshold=0.5).collect()}
    assert (out["a"].n_docs, out["a"].n_contaminated,
            out["a"].n_kept) == (2, 1, 1)
    assert (out["b"].n_docs, out["b"].n_contaminated,
            out["b"].n_kept) == (1, 0, 1)
    # kept token mass excludes the contaminated doc entirely
    assert out["a"].tokens_kept == 7  # doc 2 has 7 whitespace tokens
    assert out["b"].tokens_kept == 9


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_split_assign_plan_no_exchange(spark):
    """split_assign is one scan of pure column expressions — any
    Exchange would mean the split function grew global state."""
    from schema_inference_spark.operators.curation import split_assign
    docs = spark.createDataFrame([(1, "t", "s")],
                                 "doc_id bigint, text string, source string")
    assert "Exchange" not in _plan(split_assign(docs))


def test_collocations_plan_topk_not_global_sort(spark):
    """The top-k executes as TakeOrderedAndProject; a global Sort of
    the bigram vocabulary would be the 100-TB regression."""
    from schema_inference_spark.operators.textstats import collocations
    docs = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = _plan(collocations(docs, k=10, min_count=1))
    assert "TakeOrderedAndProject" in plan


def test_decontaminate_plan_broadcasts_bench(spark):
    """The bench side must broadcast — the corpus is the unbounded side
    and is never shuffled for the containment join."""
    from schema_inference_spark.operators.contamination import (
        decontaminate_summary,
    )
    corpus = spark.createDataFrame([(1, "a b c d", "s")],
                                   "doc_id bigint, text string, source string")
    bench = spark.createDataFrame([(9, "a b c")],
                                  "bench_id bigint, text string")
    assert "BroadcastHashJoin" in _plan(
        decontaminate_summary(corpus, bench))


def test_funnel_plan_pushes_step_filters(spark, tmp_path, events):
    """Each funnel stage scans with its event-type predicate pushed to
    the parquet source — the full event log is never re-read unfiltered
    per stage."""
    from schema_inference_spark.operators.sessions import funnel
    p = str(tmp_path / "ev.parquet")
    events.write.parquet(p)
    plan = _plan(funnel(spark.read.parquet(p),
                        ["view", "click", "purchase"]))
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,view)" \
        in plan
    assert "EqualTo(event_type,click)" in plan
    assert "EqualTo(event_type,purchase)" in plan


def test_hot_segments_planted_boilerplate(spark):
    from schema_inference_spark.operators.dedup import hot_segments
    footer = "w1 w2 w3 w4"          # 4-word segment width below
    rows = [
        (1, "unique alpha words here " + footer),        # seg2 = footer
        (2, "other beta content words " + footer),       # seg2 = footer
        (3, footer + " " + footer),                      # footer twice, ONE doc
        (4, "totally unrelated text body nothing shared"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = hot_segments(docs, seg_words=4, min_docs=2, k=10).collect()
    assert [(r.rank, r.seg, r.n_docs, r.n_occurrences) for r in out] == [
        (1, footer, 3, 4)]
    # with min_docs=1 the within-one-doc repeats surface too, ranked by
    # doc frequency first
    out1 = hot_segments(docs, seg_words=4, min_docs=1, k=3).collect()
    assert out1[0].seg == footer and out1[0].n_docs == 3


def test_mixture_plan_arithmetic(spark):
    from schema_inference_spark.operators.curation import mixture_plan
    docs = spark.createDataFrame(
        # source a: 2 docs x 5 tokens = 10 available
        [(1, "t1 t2 t3 t4 t5", "a"), (2, "u1 u2 u3 u4 u5", "a"),
         # source b: 1 doc x 4 tokens = 4 available
         (3, "v1 v2 v3 v4", "b")],
        "doc_id bigint, text string, source string")
    weights = spark.createDataFrame([("a", 5000), ("b", 5000)],
                                    "source string, weight_bp bigint")
    out = {r.source: r for r in
           mixture_plan(docs, weights, token_budget=20).collect()}
    a, b = out["a"], out["b"]
    # a: needs 10 of 10 available -> exactly 1.00 epochs, not oversampled
    assert (a.tokens_available, a.tokens_needed, a.epochs_x100,
            a.oversampled) == (10, 10, 100, False)
    # b: needs 10 of 4 available -> ceil(1000/4)=250 hundredths
    assert (b.tokens_available, b.tokens_needed, b.epochs_x100,
            b.oversampled) == (4, 10, 250, True)
    # ceil is exact on non-multiples: 7 needed of 4 -> 175
    w2 = spark.createDataFrame([("b", 3500)],
                               "source string, weight_bp bigint")
    r2 = mixture_plan(docs, w2, token_budget=20).collect()
    assert [(r.source, r.tokens_needed, r.epochs_x100)
            for r in r2] == [("b", 7, 175)]


# property: funnel and cohort_retention agree with pure-Python models
# on arbitrary small event logs (4 users, 6 timestamps — tight ranges
# force timestamp ties and out-of-order arrivals); bounded examples
# keep the per-example Spark job cost sane (same protocol as
# test_fd_violations_matches_model)
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_STEPS = ["view", "click", "purchase"]

_ev_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5),
              st.sampled_from(_STEPS)),
    min_size=1, max_size=15)


def _funnel_model(rows, steps):
    by_user = {}
    for u, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, ty))
    reach = {}
    for u, evs in by_user.items():
        c = [ts for ts, ty in evs if ty == steps[0]]
        if c:
            reach[u] = min(c)
    counts = [len(reach)]
    for s in steps[1:]:
        nxt = {}
        for u, pt in reach.items():
            c = [ts for ts, ty in by_user[u] if ty == s and ts >= pt]
            if c:
                nxt[u] = min(c)
        counts.append(len(nxt))
        reach = nxt
    return counts


@settings(max_examples=25, deadline=None)
@given(rows=_ev_rows)
def test_funnel_matches_pure_model(spark, rows):
    from schema_inference_spark.operators.sessions import funnel
    df = spark.createDataFrame(
        [(u, _ts(1, 0, m), ty) for u, m, ty in rows],
        "user_id bigint, ts timestamp, event_type string")
    got = funnel(df, _STEPS).collect()
    want = _funnel_model(rows, _STEPS)
    assert [r.n_users for r in got] == want
    for i, r in enumerate(got):
        prev = want[i - 1] if i > 0 else want[0]
        assert r.conv_prev_bp == (
            (10000 * want[i]) // prev if prev > 0 else None)
        assert r.conv_first_bp == (
            (10000 * want[i]) // want[0] if want[0] > 0 else None)


_ret_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(1, 8)),
    min_size=1, max_size=15)


@settings(max_examples=25, deadline=None)
@given(rows=_ret_rows)
def test_cohort_retention_matches_pure_model(spark, rows):
    from schema_inference_spark.operators.sessions import cohort_retention
    max_off = 3
    df = spark.createDataFrame(
        [(u, _ts(d)) for u, d in rows], "user_id bigint, ts timestamp")
    got = {(str(r.cohort_date), r.day_offset): (r.n_users, r.retained_bp)
           for r in cohort_retention(df, max_offset=max_off).collect()}

    first = {}
    for u, d in rows:
        first[u] = min(first.get(u, d), d)
    sizes = {}
    for u, c in first.items():
        sizes[c] = sizes.get(c, 0) + 1
    active = {(first[u], d - first[u], u)
              for u, d in rows if d - first[u] <= max_off}
    want = {}
    for (c, off, _u) in active:
        key = (f"2024-01-{c:02d}", off)
        want[key] = want.get(key, 0) + 1
    want = {k: (n, (10000 * n) // sizes[int(k[0][-2:])])
            for k, n in want.items()}
    assert got == want


def test_split_leakage_semantics(spark):
    from schema_inference_spark.operators.curation import (
        split_assign,
        split_leakage,
    )
    # pick ids whose splits are known from split_assign itself, then
    # verify the leak filter keeps exactly the cross-split pairs with
    # the SAME labels the assignment gives
    docs = spark.createDataFrame([(i, "t", "s") for i in range(60)],
                                 "doc_id bigint, text string, source string")
    split_of = {r.doc_id: r.split for r in split_assign(docs).collect()}
    ids = sorted(split_of)
    pairs = spark.createDataFrame(
        [(a, b, 0.9) for a in ids for b in ids if a < b],
        "d1 bigint, d2 bigint, jaccard double")
    out = {(r.d1, r.d2): (r.split1, r.split2)
           for r in split_leakage(pairs).collect()}
    want = {(a, b): (split_of[a], split_of[b])
            for a in ids for b in ids
            if a < b and split_of[a] != split_of[b]}
    assert out == want
    assert len(want) > 0          # non-vacuous at n=60
    # and no same-split pair survives
    assert all(s1 != s2 for s1, s2 in out.values())


def test_funnel_within_window_inclusive_boundary(spark, events):
    from schema_inference_spark.operators.sessions import funnel
    # u1's purchase is 22h after its click: inside a 1-day window,
    # outside a 1-hour window. The boundary is inclusive: u1's click is
    # exactly 3600s after its view, so a 3600s window still counts it.
    day = funnel(events, ["view", "click", "purchase"],
                 within_seconds=86400).collect()
    assert [r.n_users for r in day] == [5, 4, 1]
    # 1h drops u3 (its click is 2h after its view) but keeps the
    # exactly-1h clicks of u1 and u2 — the boundary is inclusive
    hour = funnel(events, ["view", "click", "purchase"],
                  within_seconds=3600).collect()
    assert [r.n_users for r in hour] == [5, 3, 0]
    # sub-boundary: 3599s drops the exactly-1h clicks of u1 and u2
    # too, leaving only u6's same-timestamp tie
    tight = funnel(events, ["view", "click", "purchase"],
                   within_seconds=3599).collect()
    assert [r.n_users for r in tight] == [5, 1, 0]


def test_decontaminate_empty_bench_keeps_everything(spark):
    from schema_inference_spark.operators.contamination import (
        decontaminate_summary,
    )
    corpus = spark.createDataFrame(
        [(1, "some words in a document", "a")],
        "doc_id bigint, text string, source string")
    bench = spark.createDataFrame([], "bench_id bigint, text string")
    out = decontaminate_summary(corpus, bench, threshold=0.3).collect()
    assert [(r.source, r.n_docs, r.n_contaminated, r.n_kept)
            for r in out] == [("a", 1, 0, 1)]


def test_split_leakage_empty_pairs(spark):
    from schema_inference_spark.operators.curation import split_leakage
    pairs = spark.createDataFrame([], "d1 bigint, d2 bigint, jaccard double")
    assert split_leakage(pairs).count() == 0


def test_collocations_short_and_empty_docs(spark):
    """Single-token and empty docs contribute unigrams (the normalized
    split of '' is ['']) but never bigrams — no crash, no phantom
    grams."""
    from schema_inference_spark.operators.textstats import collocations
    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "pair here"), (4, "pair here")],
        "doc_id bigint, text string")
    out = collocations(docs, k=5, min_count=2).collect()
    assert [(r.gram, r.n_occurrences) for r in out] == [("pair here", 2)]


def test_mixture_plan_weight_only_sources_absent(spark):
    """A weights row whose source has no documents simply doesn't plan
    (inner join): the caller's weight table may cover future sources."""
    from schema_inference_spark.operators.curation import mixture_plan
    docs = spark.createDataFrame([(1, "a b", "s1")],
                                 "doc_id bigint, text string, source string")
    weights = spark.createDataFrame([("s1", 5000), ("ghost", 5000)],
                                    "source string, weight_bp bigint")
    out = mixture_plan(docs, weights, 100).collect()
    assert [r.source for r in out] == ["s1"]


@settings(max_examples=20, deadline=None)
@given(rows=_ev_rows, win=st.integers(0, 3))
def test_funnel_windowed_matches_pure_model(spark, rows, win):
    """The attribution window against a pure model — minute-scale
    timestamps with a 0-3 minute window make the inclusive boundary
    and the window-excludes-late-conversion cases both common."""
    from schema_inference_spark.operators.sessions import funnel

    def model(rows, steps, win_s):
        by_user = {}
        for u, m, ty in rows:
            by_user.setdefault(u, []).append((m * 60, ty))
        reach = {}
        for u, evs in by_user.items():
            c = [s for s, ty in evs if ty == steps[0]]
            if c:
                reach[u] = min(c)
        counts = [len(reach)]
        for step in steps[1:]:
            nxt = {}
            for u, pt in reach.items():
                c = [s for s, ty in by_user[u]
                     if ty == step and pt <= s <= pt + win_s]
                if c:
                    nxt[u] = min(c)
            counts.append(len(nxt))
            reach = nxt
        return counts

    df = spark.createDataFrame(
        [(u, _ts(1, 0, m), ty) for u, m, ty in rows],
        "user_id bigint, ts timestamp, event_type string")
    got = [r.n_users for r in
           funnel(df, _STEPS, within_seconds=win * 60).collect()]
    assert got == model(rows, _STEPS, win * 60)


def test_hash_sample_fraction_and_stability(spark):
    from schema_inference_spark.operators.sessions import hash_sample
    docs = spark.createDataFrame([(i, "t") for i in range(4000)],
                                 "doc_id bigint, text string")
    kept = {r.doc_id for r in
            hash_sample(docs, 0.25, "doc_id").collect()}
    # Binomial(4000, 0.25): generous 5-sigma band
    assert 850 <= len(kept) <= 1150
    # append stability: the same ids stay kept in a larger frame
    more = spark.createDataFrame([(i, "t") for i in range(6000)],
                                 "doc_id bigint, text string")
    kept2 = {r.doc_id for r in
             hash_sample(more, 0.25, "doc_id").collect()}
    assert kept == {i for i in kept2 if i < 4000}
    # fraction 0 and 1 are the empty and identity samples
    assert hash_sample(docs, 0.0, "doc_id").count() == 0
    assert hash_sample(docs, 1.0, "doc_id").count() == 4000
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_sample(docs, 1.5, "doc_id")


def test_hash_sample_plan_no_exchange(spark):
    from schema_inference_spark.operators.sessions import hash_sample
    docs = spark.createDataFrame([(1, "t")], "doc_id bigint, text string")
    plan = hash_sample(docs, 0.5, "doc_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_token_budget_bucketed_identity(spark):
    """The bucketed scale path returns EXACTLY the windowed operator's
    rows — cum_tokens, mix_rank, everything — including when the budget
    cuts inside a bucket."""
    from schema_inference_spark.operators.curation import (
        token_budget_sample,
        token_budget_sample_bucketed,
    )
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + i % 7)), f"s{i % 3}")
         for i in range(300)],
        "doc_id bigint, text string, source string")
    for budget in (7, 50, 10**6):   # cuts early, mid, and never
        budgets = spark.createDataFrame(
            [(f"s{j}", budget) for j in range(3)],
            "source string, token_budget bigint")
        a = [(r.doc_id, r.source, r.ws_tokens, r.cum_tokens, r.mix_rank,
              r.token_budget) for r in
             token_budget_sample(docs, budgets).collect()]
        b = [(r.doc_id, r.source, r.ws_tokens, r.cum_tokens, r.mix_rank,
              r.token_budget) for r in
             token_budget_sample_bucketed(docs, budgets).collect()]
        assert a == b, f"budget={budget}"
        if budget == 10**6:
            assert len(a) == 300   # never cuts: everything kept
