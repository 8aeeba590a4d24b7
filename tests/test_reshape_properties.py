"""Property-based tests (SURVEY.md §5 item 3): reshape round-trips,
join-cardinality invariants on generated JHU-shaped frames, and the
order-independence invariant behind the oracle-stable sums."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# Small generated wide frames: location rows × date columns with int values.
locations = st.lists(
    st.tuples(
        st.sampled_from(["", "Prov A", "Prov B"]),
        st.sampled_from(["Xland", "Yland", "Zland"]),
    ),
    min_size=1,
    max_size=5,
    unique=True,
)
date_cols = st.lists(
    st.sampled_from(["1/22/20", "1/23/20", "2/1/20", "12/31/20", "3/5/21"]),
    min_size=1,
    max_size=4,
    unique=True,
)
values = st.integers(min_value=0, max_value=10**6)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(locs=locations, dates=date_cols, seed=st.integers(0, 10**6))
def test_unpivot_roundtrip(spark, locs, dates, seed):
    """wide → U1 long (unpivot) → pivot back == original values."""
    import random

    from jhu_data_parser_spark.operators.reshape import wide_to_long

    rng = random.Random(seed)
    header = ["Province/State", "Country/Region"] + dates
    rows = [(p, c, *[rng.randint(0, 10**6) for _ in dates]) for p, c in locs]
    schema = ", ".join(
        ["`Province/State` string", "`Country/Region` string"]
        + [f"`{d}` int" for d in dates]
    )
    df = spark.createDataFrame(rows, schema)

    long = wide_to_long(df, id_cols=["Province/State", "Country/Region"], value_cols=dates)
    back = (
        long.groupBy("Province/State", "Country/Region")
        .pivot("date", dates)
        .agg(F.first("value"))
    )
    orig = {tuple(r) for r in df.collect()}
    rt = {tuple(r) for r in back.collect()}
    assert orig == rt


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(locs=locations, dates=date_cols)
def test_nested_build_invariants(spark, locs, dates):
    """U1 nested build: |output| == |input| (no fan-out), array length ==
    #date columns, chronological order == column order."""
    from jhu_data_parser_spark.operators.reshape import wide_to_nested

    header_dates = dates
    rows = [(p, c, "1.5", "-2.5", *[str(i) for i in range(len(header_dates))]) for p, c in locs]
    schema = ", ".join(
        ["`Province/State` string", "`Country/Region` string", "Lat string", "Long string"]
        + [f"`{d}` string" for d in header_dates]
    )
    df = spark.createDataFrame(rows, schema)
    nested = wide_to_nested(df)
    out = nested.collect()
    assert len(out) == len(locs)
    for r in out:
        assert len(r["time_series"]) == len(header_dates)
        assert [e["value"] for e in r["time_series"]] == list(range(len(header_dates)))


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n_facts=st.integers(1, 20), n_dim_dupes=st.integers(1, 4))
def test_first_match_join_cardinality(spark, n_facts, n_dim_dupes):
    """J1 invariant: |first_match_join(fact, dim)| == |fact| no matter
    how many duplicate keys the dimension has (the reference's
    first-match-and-break, src/parser.py:70)."""
    from jhu_data_parser_spark.operators.joins import first_match_join

    fact = spark.createDataFrame(
        [(i, i % 3) for i in range(n_facts)], "fid int, k int"
    )
    dim = spark.createDataFrame(
        [(k, j, f"v{k}_{j}") for k in range(3) for j in range(n_dim_dupes)],
        "dk int, ord int, payload string",
    )
    out = first_match_join(fact, dim, left_key="k", right_key="dk", order_by="ord")
    assert out.count() == n_facts
    # and the payload is always the ord=0 row's
    assert all(r["payload"].endswith("_0") for r in out.collect() if r["payload"])


def test_scaled_long_sum_order_independent(spark):
    """The dec_sum discipline exists so aggregate doubles hash-match
    across engines; the invariant is bit-identical totals under ANY
    partitioning/ordering of the input — raw SUM(double) breaks this."""
    import random

    from jhu_data_parser_spark.functions.exprs import dec_sum

    rng = random.Random(7)
    vals = [round(rng.uniform(-1e6, 1e6), 2) for _ in range(5000)]
    results = set()
    for seed in (1, 2, 3):
        shuffled = vals[:]
        random.Random(seed).shuffle(shuffled)
        df = spark.createDataFrame(
            [(v,) for v in shuffled], "x double"
        ).repartition(seed * 3 + 2)
        results.add(df.agg(dec_sum("x").alias("s")).first()["s"])
    assert len(results) == 1
    # and the total is the exact cents sum
    import math

    exact = sum(math.floor(v * 100 + 0.5) for v in vals) / 100.0
    assert results.pop() == exact


# --- codec round-trip properties (no Spark needed) -------------------------
@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=200),
    h=st.integers(min_value=1, max_value=120),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bmp_ppm_roundtrip_property(w, h, seed):
    from jhu_data_parser_spark.functions.codecs import (
        bmp_row_size,
        decode_image_meta,
        encode_bmp,
        encode_ppm,
    )

    bmp = encode_bmp(w, h, seed)
    assert decode_image_meta(bmp) == ("bmp", w, h)
    assert len(bmp) == 54 + bmp_row_size(w) * h
    assert decode_image_meta(encode_ppm(w, h, seed)) == ("ppm", w, h)


@settings(max_examples=50, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_wav_roundtrip_property(n, rate, seed):
    import numpy as np

    from jhu_data_parser_spark.functions.codecs import decode_wav, encode_wav

    r, ch, bits, samples = decode_wav(encode_wav(n, rate, seed))
    assert (r, ch, bits, len(samples)) == (rate, 1, 16, n)
    expected = (seed * 7919 + np.arange(n, dtype=np.int64) * 104729) % 65536 - 32768
    assert (samples.astype(np.int64) == expected).all()


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=48),
    frames=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_gif_roundtrip_property(w, h, frames, seed):
    from jhu_data_parser_spark.functions.codecs import decode_gif, encode_gif

    assert decode_gif(encode_gif(w, h, frames, seed)) == (w, h, frames)


# --- shared-span dedup vs brute-force reference ---------------------------
# Tiny alphabet forces genuine k-gram collisions; doc lengths straddle
# the < k edge. The bucketed distributed plan must equal the quadratic
# per-pair reference on every generated corpus.
span_docs = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=12),
    min_size=2,
    max_size=7,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=span_docs)
def test_shared_span_pairs_matches_bruteforce(spark, docs):
    from itertools import combinations

    from jhu_data_parser_spark.operators.dedup import shared_span_pairs

    k = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_dup_grams"], r["max_span_tokens"])
        for r in shared_span_pairs(df, k=k).collect()
    }

    def grams(toks):
        return [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    want = {}
    for (ia, ta), (ib, tb) in combinations(rows, 2):
        ga, gb = grams(ta.split(" ")), set(grams(tb.split(" ")))
        hits = [i for i, g in enumerate(ga) if g in gb]
        if not hits:
            continue
        best = run = 1
        for prev, cur in zip(hits, hits[1:]):
            run = run + 1 if cur == prev + 1 else 1
            best = max(best, run)
        want[(ia, ib)] = (len(hits), best + k - 1)
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
            ),
            min_size=64,
            max_size=64,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_binary_signature_property(spark, vecs):
    """Property: the JVM-side packed sign words equal the driver-side
    python twin for ANY 64-float vector, including exact zeros and
    negatives (bit set iff strictly positive)."""
    from jhu_data_parser_spark.operators.similarity import (
        binary_query_words,
        binary_signature,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for r in binary_signature(df).collect():
        assert (r["sig_lo"], r["sig_hi"]) == binary_query_words(
            [float(x) for x in r["embedding"]]
        )


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    words=st.lists(
        st.text(alphabet="abcdefg", min_size=1, max_size=10),
        min_size=2,
        max_size=12,
    ),
    merges=st.integers(0, 4),
)
def test_wordpiece_encode_property(spark, words, merges):
    """Property: the greedy HOF encoder equals the pure-python
    reference for ANY corpus-trained vocab over random short words —
    including words that fall to [UNK] because every occurrence was
    below the frequency floor."""
    from pyspark.sql import functions as F

    from jhu_data_parser_spark.operators.text import (
        wordpiece_encode_expr,
        wordpiece_vocab,
    )
    from tests.test_operators import _wp_encode_py

    text = " ".join(words)
    d = spark.createDataFrame([(0, text)], "doc_id long, text string")
    vocab = wordpiece_vocab(d, num_merges=merges, min_word_count=2)
    if not vocab:  # every word unique -> empty floor vocab, nothing to encode with
        return
    vs = set(vocab)
    got = {
        r["w"]: list(r["ps"])
        for r in d.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
        .select("w", F.expr(wordpiece_encode_expr("w", vocab)).alias("ps"))
        .collect()
    }
    for w, ps in got.items():
        assert ps == _wp_encode_py(w, vs), (w, ps, vocab)
