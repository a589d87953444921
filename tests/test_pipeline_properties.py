"""Property-based checks of the round-5 pipeline operators against
pure-Python reference implementations on hypothesis-random corpora —
the same discipline the distance expressions get in
test_functions_properties.py, applied to whole operators: the Spark
plan and a 20-line sequential reference must agree EXACTLY on any
input, not just on the synthetic testdata's shapes."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators.dedup import (
    segment_boilerplate_filter,
    winnow_fingerprints,
)
from vector_database_in_rust_spark.operators.curation import weighted_sample
from vector_database_in_rust_spark.operators.relational import events_scd2

WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]

doc_text = st.lists(
    st.sampled_from(WORDS), min_size=1, max_size=14
).map(" ".join)
corpus = st.dictionaries(
    st.integers(0, 20), doc_text, min_size=1, max_size=8
)


def _df_docs(spark, docs):
    return spark.createDataFrame(
        sorted(docs.items()), "doc_id long, text string"
    )


# --- segment_boilerplate_filter ------------------------------------------


def _ref_segment_filter(docs, seg_words=4, max_df=1):
    segs = {}
    for d, t in docs.items():
        toks = t.split(" ")
        segs[d] = [
            " ".join(toks[i : i + seg_words])
            for i in range(0, len(toks), seg_words)
        ]
    df = {}
    for d, ss in segs.items():
        for s in set(ss):
            df[s] = df.get(s, 0) + 1
    out = {}
    for d, ss in segs.items():
        kept = [s for s in ss if df[s] <= max_df]
        if kept:
            out[d] = (" ".join(kept), len(ss), len(ss) - len(kept))
    return out


@settings(max_examples=20, deadline=None)
@given(docs=corpus)
def test_segment_filter_matches_reference(spark, docs):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_dropped"])
        for r in segment_boilerplate_filter(_df_docs(spark, docs)).collect()
    }
    assert got == _ref_segment_filter(docs)


# --- winnow_fingerprints --------------------------------------------------


def _ref_winnow(docs, k=4, window=3):
    out = set()
    for d, t in docs.items():
        toks = t.split(" ")
        n_grams = len(toks) - k + 1
        if len(toks) < k + window - 1:
            continue
        keys = []
        for i in range(n_grams):
            h = hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:16]
            keys.append(f"{h}:{i:010d}")
        for s in range(n_grams - window + 1):
            sel = min(keys[s : s + window])
            h, pos = sel.split(":")
            out.add((d, int(pos), h))
    return out


@settings(max_examples=20, deadline=None)
@given(docs=corpus)
def test_winnow_matches_reference(spark, docs):
    got = {
        (r["doc_id"], r["fp_pos"], r["fp_hash"])
        for r in winnow_fingerprints(_df_docs(spark, docs)).collect()
    }
    assert got == _ref_winnow(docs)


# --- weighted_sample ------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    weights=st.dictionaries(
        st.integers(0, 50), st.integers(1, 10_000), min_size=1, max_size=20
    ),
    k=st.integers(1, 8),
)
def test_weighted_sample_matches_reference(spark, weights, k):
    df = spark.createDataFrame(
        sorted(weights.items()), "doc_id long, n_chars long"
    )
    got = [
        (r["doc_id"], r["weight"], r["es_key"])
        for r in weighted_sample(df, k).collect()
    ]
    ref = []
    for d, w in weights.items():
        h = hashlib.md5(f"42:{d}".encode()).hexdigest()[:6]
        u = (int(h, 16) + 0.5) / 16**6
        ref.append((d, w, round(math.log(u) / w, 6)))
    ref.sort(key=lambda t: (-t[2], t[0]))
    assert got == ref[: min(k, len(ref))]


# --- events_scd2 ----------------------------------------------------------


@settings(max_examples=15, deadline=None)
@given(
    log=st.lists(
        st.tuples(
            st.integers(0, 3),                # user
            st.integers(0, 30),               # minute offset (ts)
            st.sampled_from(["a", "b", "c"]),  # state
        ),
        min_size=1,
        max_size=24,
    )
)
def test_scd2_matches_reference(spark, log):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, s, 0.0)
        for i, (u, m, s) in enumerate(log)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"])
        for r in events_scd2(df).collect()
    }
    by_user = {}
    for eid, ts, u, s, _ in rows:
        by_user.setdefault(u, []).append((ts, eid, s))
    ref = set()
    for u, evs in by_user.items():
        evs.sort()
        changes = []
        prev = None
        for ts, eid, s in evs:
            if s != prev:
                changes.append((ts, s))
            prev = s
        for i, (ts, s) in enumerate(changes):
            vt = changes[i + 1][0] if i + 1 < len(changes) else None
            ref.add((u, s, ts, vt))
    assert got == ref
