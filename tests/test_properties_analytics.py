"""Property-based tests for the r6 analytics operators: each Spark
result is replayed against an independent pure-Python brute-force
model over hypothesis-generated inputs. The oracle gate proves
Spark == DuckDB on the fixed corpus; these prove the SEMANTICS on
adversarial shapes (ties, duplicates, out-of-order steps, degenerate
groups). One Spark job per example is slow, so example counts stay
small and inputs stay tiny."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.aggregations import (
    cohort_retention,
    grouped_correlation,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.text import (
    top_ngram_char_fraction,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.windows import (
    funnel_stages,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_token = st.sampled_from(["a", "b", "ab", "xyz", "q0"])
_docs = st.lists(
    st.lists(_token, min_size=0, max_size=12), min_size=1, max_size=8
)


def _brute_top_frac(tokens: list[str], n: int) -> float:
    if len(tokens) < n:
        return 0.0
    grams = [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    cnt = Counter(grams)
    # (count DESC, gram ASC) winner
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    denom = max(len(" ".join(tokens)), 1)
    return round(top[1] * len(top[0]) / denom, 6)


@settings(**_SETTINGS)
@given(docs=_docs)
def test_top_ngram_matches_bruteforce(spark, docs):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           top_ngram_char_fraction(df, "text", "doc_id").collect()}
    for i, toks in enumerate(docs):
        for n in (2, 3, 4):
            assert out[i][f"top{n}gram_char_frac"] == _brute_top_frac(toks, n), (
                toks, n)


_steps = ["view", "click", "purchase"]
_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),           # user
        st.integers(min_value=0, max_value=50),          # minute
        st.sampled_from(_steps + ["error"]),             # type
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda e: (e[0], e[1]),  # one event per (user, minute)
)


def _brute_funnel(events):
    """events: [(user, ts, type)] → {user: (t1, t2, t3, stages)}"""
    out = {}
    for u in {e[0] for e in events}:
        seq = sorted((ts, ty) for (uu, ts, ty) in events if uu == u)
        t = [None, None, None]
        for i, step in enumerate(_steps):
            prev = t[i - 1] if i else None
            if i and prev is None:
                break
            for ts, ty in seq:
                if ty == step and (i == 0 or ts > prev):
                    t[i] = ts
                    break
        stages = sum(1 for x in t if x is not None)
        out[u] = (*t, stages)
    return out


@settings(**_SETTINGS)
@given(events=_events)
def test_funnel_matches_bruteforce(spark, events):
    base = dt.datetime(2024, 6, 1, 10, 0, 0)
    rows = [
        (u, base + dt.timedelta(minutes=m), ty) for (u, m, ty) in events
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r["user_id"]: (r["t_view"], r["t_click"], r["t_purchase"],
                          r["stages_completed"])
           for r in funnel_stages(
               df, "ts", "user_id", "event_type", _steps).collect()}
    want = {
        u: tuple(
            (base + dt.timedelta(minutes=x)) if isinstance(x, int) else x
            for x in v[:3]
        ) + (v[3],)
        for u, v in _brute_funnel(events).items()
    }
    assert got == want


_xy = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.decimals(min_value=0, max_value=99, places=2),
        st.decimals(min_value=0, max_value=99, places=2),
    ),
    min_size=1,
    max_size=20,
)


@settings(**_SETTINGS)
@given(points=_xy)
def test_correlation_matches_bruteforce(spark, points):
    rows = [(g, float(x), float(y)) for g, x, y in points]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in grouped_correlation(df, "g", "x", "y").collect()}
    for g in {p[0] for p in points}:
        xs = [float(p[1]) for p in points if p[0] == g]
        ys = [float(p[2]) for p in points if p[0] == g]
        n = len(xs)
        # the same moment formula, from exact Fractions of the inputs
        from fractions import Fraction

        fx = [Fraction(str(v)) for v in xs]
        fy = [Fraction(str(v)) for v in ys]
        sx, sy = float(sum(fx)), float(sum(fy))
        sxx = float(sum(v * v for v in fx))
        syy = float(sum(v * v for v in fy))
        sxy = float(sum(a * b for a, b in zip(fx, fy)))
        assert out[g]["n_rows"] == n
        if n < 2:
            assert out[g]["sample_cov"] is None
            assert out[g]["pearson_r"] is None
            continue
        cov = round((sxy - sx * sy / n) / (n - 1), 6)
        assert out[g]["sample_cov"] == cov
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        if var_x > 0 and var_y > 0:
            r = round((n * sxy - sx * sy)
                      / (math.sqrt(var_x) * math.sqrt(var_y)), 6)
            assert out[g]["pearson_r"] == r
        else:
            assert out[g]["pearson_r"] is None


_visits = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),    # user
        st.integers(min_value=0, max_value=34),   # day offset
    ),
    min_size=1,
    max_size=25,
)


@settings(**_SETTINGS)
@given(visits=_visits)
def test_cohort_retention_matches_bruteforce(spark, visits):
    base = dt.date(2024, 1, 1)  # a Monday: week truncation is exact
    rows = [
        (u, dt.datetime.combine(base + dt.timedelta(days=d), dt.time(9)))
        for (u, d) in visits
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {(r["cohort_week"].date(), r["period_offset"]): r["n_active"]
           for r in cohort_retention(df, "ts", "user_id").collect()}

    def week_of(d):
        day = base + dt.timedelta(days=d)
        return day - dt.timedelta(days=day.weekday())

    first = {}
    for u, d in visits:
        w = week_of(d)
        if u not in first or w < first[u]:
            first[u] = w
    want = Counter()
    for (u, w) in {(u, week_of(d)) for (u, d) in visits}:
        want[(first[u], (w - first[u]).days // 7)] += 1
    assert got == dict(want)


# ---- r7 operators ----

_line_token = st.sampled_from(["foo", "bar", "baz qux", "nav home", "x"])
_line_docs = st.lists(
    st.lists(_line_token, min_size=1, max_size=5), min_size=1, max_size=7
)


@settings(**_SETTINGS)
@given(docs=_line_docs, max_df=st.integers(min_value=1, max_value=3))
def test_line_dedup_matches_bruteforce(spark, docs, max_df):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.dedup import (
        line_dedup,
    )

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in line_dedup(
        df, "text", "doc_id", max_line_df=max_df
    ).collect()}
    dfreq = Counter()
    for lines in docs:
        for ln in set(lines):
            dfreq[ln] += 1
    for i, lines in enumerate(docs):
        kept = [ln for ln in lines if dfreq[ln] <= max_df]
        assert out[i]["n_lines"] == len(lines)
        assert out[i]["kept_lines"] == len(kept)
        assert out[i]["text_clean"] == "\n".join(kept)


@settings(**_SETTINGS)
@given(
    hist=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # key
            st.integers(min_value=0, max_value=3),   # value variant
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    snap=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
)
def test_scd2_matches_bruteforce(spark, hist, snap):
    import datetime as _dt

    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.maintenance import (
        scd2_apply,
    )

    d0 = _dt.date(2024, 1, 1)
    hrows = [(k, float(v), d0, None, True) for k, v in hist]
    srows = [(k, float(v)) for k, v in snap]
    if not hrows and not srows:
        return
    history = spark.createDataFrame(
        hrows, "k long, v double, valid_from date, valid_to date, is_current boolean"
    )
    snapshot = spark.createDataFrame(srows, "k long, v double")
    got = {
        (r["k"], r["v"], r["is_current"], r["valid_from"], r["valid_to"])
        for r in scd2_apply(
            history, snapshot, ["k"], ["v"], "2024-02-01"
        ).collect()
    }
    d1 = _dt.date(2024, 2, 1)
    want = set()
    h = dict(hist)
    sm = dict(snap)
    for k, v in hist:
        if k in sm and sm[k] == v:
            want.add((k, float(v), True, d0, None))       # unchanged
        else:
            want.add((k, float(v), False, d0, d1))        # closed
    for k, v in snap:
        if k not in h or h[k] != v:
            want.add((k, float(v), True, d1, None))       # opened
    assert got == want


@settings(**_SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # user
            st.integers(min_value=0, max_value=50),   # minute offset
            st.sampled_from(["view", "click", "buy"]),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda t: (t[0], t[1]),  # total order per user
    )
)
def test_transitions_match_bruteforce(spark, events):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.windows import (
        event_transitions,
    )

    if not events:
        return
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=m), u, typ)
        for i, (u, m, typ) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in event_transitions(
            df, "ts", "user_id", "event_type", "event_id"
        ).collect()
    }
    want: Counter = Counter()
    byu: dict = {}
    for u, m, typ in events:
        byu.setdefault(u, []).append((m, typ))
    for u, seq in byu.items():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


@settings(**_SETTINGS)
@given(
    docs_a=st.lists(
        st.lists(_token, min_size=1, max_size=8), min_size=1, max_size=5
    ),
    docs_b=st.lists(
        st.lists(_token, min_size=1, max_size=8), min_size=1, max_size=5
    ),
)
def test_term_divergence_information_inequalities(spark, docs_a, docs_b):
    """KL is non-negative both ways; JSD is symmetric-by-construction
    and bounded by ln 2 — on arbitrary corpora, not just the fixture
    (smoothing keeps every term probability positive, so the
    inequalities must hold exactly up to the 12 dp contribution
    rounding)."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.corpus import (
        term_divergence,
    )

    a = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs_a)], ["doc_id", "text"]
    )
    b = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs_b)], ["doc_id", "text"]
    )
    r = term_divergence(a, b, "text").collect()[0]
    eps = 1e-9
    assert r["kl_ab"] >= -eps and r["kl_ba"] >= -eps
    assert -eps <= r["jsd"] <= math.log(2) + eps


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=27),  # age days
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=-5, max_value=50), # value
        ),
        min_size=1,
        max_size=10,
    )
)
def test_time_decayed_agg_matches_bruteforce(spark, rows):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.aggregations import (
        time_decayed_agg,
    )

    ref = dt.datetime(2024, 2, 1)
    data = [
        (ref - dt.timedelta(days=age), f"k{k}", float(v))
        for age, k, v in rows
    ]
    df = spark.createDataFrame(data, ["ts", "k", "value"])
    got = {r["k"]: r for r in time_decayed_agg(
        df, "ts", "k", "value", 7.0, "2024-02-01 00:00:00"
    ).collect()}
    want_count: dict = {}
    want_value: dict = {}
    for age, k, v in rows:
        w = round(2.0 ** (-(age * 86400 / 86400.0) / 7.0), 9)
        key = f"k{k}"
        want_count[key] = want_count.get(key, 0.0) + w
        # mirror the operator's per-row rounding before accumulation
        want_value[key] = want_value.get(key, 0.0) + round(w * float(v), 9)
    for k in want_count:
        assert abs(got[k]["decayed_count"] - want_count[k]) < 1e-8
        assert abs(got[k]["decayed_value"] - want_value[k]) < 1e-8


def test_association_rules_hand_computed(spark):
    from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.aggregations import (
        association_rules,
    )

    # 4 baskets; x,y co-occur in 2; z appears once (pruned by support)
    tx = [
        (1, "x"), (1, "y"), (1, "z"),
        (2, "x"), (2, "y"),
        (3, "x"),
        (4, "y"),
        (1, "x"),  # duplicate line: baskets are DISTINCT item sets
    ]
    df = spark.createDataFrame(tx, ["tx", "item"])
    out = association_rules(
        df, "tx", "item", min_support_count=2, min_confidence=0.0
    )
    rules = {(r.antecedent, r.consequent): r for r in out.collect()}
    # z never reaches pairing (support 1 < 2): no rule mentions it
    assert set(rules) == {("x", "y"), ("y", "x")}
    r = rules[("x", "y")]
    # supp(x)=3, supp(y)=3, supp(xy)=2, n_tx=4
    assert r.pair_support == 2
    assert abs(r.confidence - round(2 / 3, 6)) < 1e-9
    assert abs(r.lift - round(2 * 4 / (3 * 3), 6)) < 1e-9
