"""Wave-15 operator tests: PNG metadata strip, SymSpell fuzzy pairs on
dense-duplicate corpora (the collapse branch the provided testdata never
fires), and the exact-rational EWMA fold vs a pure-python reference."""

from __future__ import annotations

from pyspark.sql import functions as F


# --------------------------------------------------------------------- PNG

def test_strip_png_ancillary_removes_planted_unknown_chunk():
    from jhu_data_parser_spark.functions.codecs import (
        _png_chunk,
        _png_chunks,
        encode_png,
        encode_png_tagged,
        strip_png_ancillary,
    )

    base = encode_png(20, 18, seed=7)
    # critical-only stream is a fixed point
    clean, n, b, kw = strip_png_ancillary(base)
    assert (clean, n, b, kw) == (base, 0, 0, "")

    tagged = encode_png_tagged(20, 18, seed=7, author_id=42)
    # plant an extra unknown ancillary chunk (eXIf) before IEND
    exif = _png_chunk(b"eXIf", b"\x01\x02\x03\x04")
    planted = tagged[:-12] + exif + tagged[-12:]
    clean, n, b, kw = strip_png_ancillary(planted)
    assert clean == base
    assert n == 3
    # Author: 12 framing + "Author\0user-42" (6+1+7); Software: 12 +
    # "Software\0jdps-engine" (8+1+11); eXIf: 12 + 4.
    assert b == (12 + 6 + 1 + 7) + (12 + 8 + 1 + 11) + (12 + 4)
    assert kw == "Author,Software"
    tags = [t for t, _ in _png_chunks(clean)]
    assert tags == [b"IHDR", b"IDAT", b"IEND"]


def test_strip_png_ancillary_keeps_unknown_critical_chunk():
    """Classification is the PNG ancillary bit (tag[0] & 0x20), not a
    whitelist: an unknown CRITICAL chunk (uppercase first letter, e.g.
    APNG's hypothetical successor) must be preserved byte-for-byte,
    while unknown ancillary chunks are stripped (r9 ADVICE)."""
    from jhu_data_parser_spark.functions.codecs import (
        _png_chunk,
        _png_chunks,
        encode_png,
        strip_png_ancillary,
    )

    base = encode_png(12, 10, seed=3)
    crit = _png_chunk(b"XTRA", b"\xaa\xbb")  # unknown critical
    anc = _png_chunk(b"xTRa", b"\xcc")  # unknown ancillary
    planted = base[:-12] + crit + anc + base[-12:]
    clean, n, b, kw = strip_png_ancillary(planted)
    assert n == 1 and b == 12 + 1 and kw == ""
    tags = [t for t, _ in _png_chunks(clean)]
    assert tags == [b"IHDR", b"IDAT", b"XTRA", b"IEND"]


# ----------------------------------------------------------------- SymSpell

def test_symspell_collapse_carries_multiplicity(spark, tmp_path):
    """Planted duplicate names: the exact-collapse branch must carry
    cnt_a x cnt_b as pair_weight, matching the uncollapsed quadratic
    reference pair count."""
    import itertools

    from jhu_data_parser_spark.plans.pipeline15 import (
        dedup_fuzzy_symspell_pairs,
    )

    names = (
        ["Customer#0001"] * 3          # trio of exact copies
        + ["Customer#0002"] * 2        # pair of copies, dist 1 from 0001
        + ["Customer#9999"]            # far away
    )
    rows = [(i, nm, 0, 0.0, "SEG") for i, nm in enumerate(names)]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/customer.parquet")
    out = {
        (r.a_key, r.b_key): r.pair_weight
        for r in dedup_fuzzy_symspell_pairs(spark, sf).collect()
    }
    # rep(0001)=0 cnt=3, rep(0002)=3 cnt=2 -> one rep pair, weight 6
    assert out == {(0, 3): 6}

    # brute-force reference over the UNcollapsed corpus
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    brute = [
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if a != b and lev(a, b) <= 1
    ]
    assert sum(out.values()) == len(brute)


# --------------------------------------------------------------------- EWMA

def test_ewma_matches_pure_python_reference(spark, tmp_path):
    import datetime
    import math

    from jhu_data_parser_spark.plans.pipeline15 import (
        _EWMA_WEIGHTS,
        events_ewma_anomaly,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: 12 events (tests the 8-predecessor cap), user 2: exactly 2,
    # user 3: singleton (must be excluded)
    vals = {1: [float(v) for v in (5, 7, 3, 8, 2, 9, 4, 6, 1, 8, 3, 100)],
            2: [4.5, 4.5], 3: [1.0]}
    eid = 0
    for u, vs in vals.items():
        for k, v in enumerate(vs):
            rows.append((eid, t0 + datetime.timedelta(hours=k), u, "click", v, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    got = {r.user_id: r for r in events_ewma_anomaly(spark, sf).collect()}
    assert set(got) == {1, 2}

    for u in (1, 2):
        vs = vals[u]
        ms = [math.floor(1e6 * v) for v in vs]
        priors = ms[:-1][::-1][:8]
        num = sum(p * w for p, w in zip(priors, _EWMA_WEIGHTS))
        den = sum(_EWMA_WEIGHTS[: len(priors)])
        ewma = num // den if num >= 0 else -((-num) // den)  # trunc == floor (num>=0 here)
        assert got[u].ewma_micro == int(num // den) or got[u].ewma_micro == ewma
        assert got[u].deviation_micro == ms[-1] - got[u].ewma_micro
        assert got[u].is_anomaly == (abs(got[u].deviation_micro) > 2_000_000)
    assert got[1].is_anomaly  # the planted 100.0 spike
    assert not got[2].is_anomaly
