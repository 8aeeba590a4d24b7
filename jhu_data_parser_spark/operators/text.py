"""Text-analysis operators for training-data pipelines (SURVEY.md §2.12):
tokenization, quality scoring, language-ID heuristic, fingerprinting.

Design rule: everything that CAN be a built-in column expression IS one
(JVM-side, whole-stage codegen, no Python in the row path at 100 TB).
Only the trigram language-ID model uses a vectorized pandas UDF, because
it needs per-language profile dictionaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from numpy.lib.stride_tricks import sliding_window_view
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "quality_features",
    "fingerprint",
    "rolling_fingerprints",
    "langid_heuristic",
    "langid_ngram",
    "shingles",
    "contamination_hits",
    "STOPWORDS_EN",
]

# Compact stopword list used by the quality score; a production pipeline
# would broadcast a larger set — the plan shape is identical.
STOPWORDS_EN = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

# Word / number / single-punctuation pieces — a BPE-ish pre-tokenizer
# shape (the GPT-2 pre-tokenizer splits on the same class boundaries).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str, sep: str = " ") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def quality_features(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> dict[str, Column]:
    """Per-document quality signals, all as native expressions.

    Returns a dict of named columns: char count, token count, mean token
    length, stopword ratio (higher ≈ more natural prose), punctuation
    density, uppercase ratio. The stopword filter uses a higher-order
    array function — no explode, no shuffle, no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_tok = F.size(toks)
    sw_array = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw_array, t)))
    n_chars = F.length(c)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": (
            F.length(F.replace(c, F.lit(" "), F.lit(""))).cast("double") / n_tok
        ),
        "stopword_ratio": n_stop.cast("double") / n_tok,
        "punct_ratio": (
            F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double") / n_chars
        ),
        "upper_ratio": (
            F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast("double") / n_chars
        ),
    }


def shingles(col: Column | str, k: int = 8) -> Column:
    """Distinct k-token shingles of lowercased space-split text, as an
    array column — all native higher-order functions, no UDF: a length-k
    string window at every token position (``sequence`` + ``slice`` +
    ``concat_ws``). The unit of benchmark-decontamination matching."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.filter(F.split(F.lower(c), " "), lambda x: x != "")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - (k - 1), F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(t, i, k)),
        )
    )


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    hash_shingles: bool = False,
) -> DataFrame:
    """Benchmark decontamination (the n-gram-overlap flagging step every
    LLM training pipeline runs before training): flag every corpus doc
    sharing at least one k-token shingle with the benchmark set →
    ``(doc_id, n_hits)``, n_hits = number of distinct overlapping
    shingles.

    Plan shape for 100 TB: the benchmark side (eval sets — thousands of
    docs, not billions) collapses to a distinct-shingle set and is
    **broadcast**, so the corpus is scanned once with a map-side hash
    probe — no shuffle of corpus shingles. If the benchmark ever
    outgrows broadcast, drop the hint and the same plan shuffle-joins
    on the shingle key; ``hash_shingles=True`` is that regime's key
    compression — xxhash64 the shingles so fixed 8-byte longs travel
    and broadcast instead of arbitrary-length strings (equivalence
    modulo 64-bit collisions, pinned in tests)."""
    sh = shingles(text_col, k)
    if hash_shingles:
        sh = F.transform(sh, lambda s: F.xxhash64(s))
    probe = benchmark.select(F.explode(sh).alias("shingle")).distinct()
    doc_shingles = docs.select(F.col(id_col), F.explode(sh).alias("shingle"))
    return (
        doc_shingles.join(F.broadcast(probe), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. Identical across engines and
    runs — the key for exact dedup at 100 TB (group on the 128-bit
    fingerprint instead of the full text: tiny shuffle keys)."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(normalized)


def rolling_fingerprints(
    col: Column | str, k: int = 8, window: int = 4, base: int = 131
) -> Column:
    """Winnowed rolling-hash fingerprints (the MOSS/winnowing scheme):
    polynomial rolling hash over every k-char gram, then the minimum
    hash of each sliding window of ``window`` consecutive grams, distinct.

    Near-identical documents share most selected hashes, so grouping on
    exploded (fingerprint → doc) pairs finds overlapping/contained text
    (the winnowing guarantee: any shared substring of length
    ``k + window - 1`` produces at least one shared fingerprint —
    stronger than whole-document hashing, cheaper than shingle Jaccard).

    Integer discipline: codepoints are capped mod 256 and the hash uses
    plain int64 arithmetic with no modulus — exact (no wraparound:
    255·131^7·Σ < 2^63), so the same formula runs as SQL on any engine
    (the DuckDB oracle twin replicates it with list comprehensions).
    Implemented as an Arrow-batched pandas UDF: the per-row work is two
    numpy sliding-window ops; per-char column expressions would be
    O(n·k) interpreted evals per row.
    """
    weights = np.array([base ** (k - 1 - j) for j in range(k)], dtype=np.int64)

    @pandas_udf("array<long>")
    def _fps(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = t or ""
            if len(t) < k:
                out.append([])
                continue
            codes = np.fromiter((ord(ch) % 256 for ch in t), np.int64, count=len(t))
            grams = sliding_window_view(codes, k) @ weights
            if len(grams) < window:
                out.append([])
                continue
            fps = np.unique(sliding_window_view(grams, window).min(axis=1))
            out.append(fps.tolist())
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    return _fps(c)


# --- language ID -----------------------------------------------------------

# Minimal per-language marker sets (function words / particles). A real
# deployment swaps in trigram log-frequency profiles; the *plan* is the
# interesting part: one pass, score arrays, argmax — all native.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to", "in", "that", "it"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con"),
    "fr": ("le", "la", "les", "et", "des", "une", "est", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "他", "这"),
}


# Tiny built-in char-trigram profiles (most-frequent trigrams per
# language, space-padded, derived from common function words). A real
# deployment loads profiles trained on corpora; the operator shape —
# Arrow-batched profile scoring, no shuffle — is identical.
_TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ",
           " to", "to ", " in", "in ", "ion", "ed ", " is", "is "),
    "de": ("er ", " de", "der", "ie ", " di", "die", "und", " un", "nd ", "ch ",
           "ein", " ei", "ich", "sch", "en ", " ge"),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", " qu", "que", "ue ",
           " en", "en ", "ción", "ar ", " lo", "los"),
    "fr": (" le", "le ", " de", "de ", "es ", "ent", " la", "la ", "et ", " et",
           "ait", "que", " qu", "eur", "ons", " pa"),
}


def langid_ngram(col: Column | str, default: str = "und") -> Column:
    """Char-trigram profile language ID (the classic Cavnar-Trenkle
    n-gram approach, profile-overlap scored): count hits of each
    language's top trigrams in the document's trigram set, argmax with
    deterministic tie-break. Arrow-batched pandas UDF — per-batch numpy
    scoring, no shuffle, embarrassingly parallel at any scale."""

    profiles = {k: frozenset(v) for k, v in _TRIGRAM_PROFILES.items()}
    langs = sorted(profiles)

    @pandas_udf("string")
    def _lid(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            s = " " + " ".join((t or "").lower().split()) + " "
            grams = {s[i : i + 3] for i in range(len(s) - 2)}
            best_lang, best_score = default, 0
            for lang in langs:
                score = len(grams & profiles[lang])
                if score > best_score:
                    best_lang, best_score = lang, score
            out.append(best_lang if best_score >= 3 else default)
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    return _lid(c)


def langid_heuristic(col: Column | str, default: str = "und") -> Column:
    """Marker-word voting language ID: per language, count marker hits in
    the token set; argmax with deterministic tie-break (language order),
    'und' when nothing matches. Pure column expressions — scores for K
    languages cost K higher-order filters over the token array, still
    one scan and zero shuffles."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), r"\s+")
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        marr = F.array(*[F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda t: F.array_contains(marr, t)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # array_max on struct(score, lang): max score, ties broken by lang
    # string order — deterministic.
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit(default))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    feats = quality_features(text_col)
    out = df
    for name, expr in feats.items():
        out = out.withColumn(name, expr)
    return out


# Vocabulary-size bound below which BPE merge learning runs on the
# driver over the collected word-frequency table instead of iterating
# Spark jobs. Classic BPE training is a |vocab|-sized problem after
# the one corpus-sized counting pass (the HuggingFace/SentencePiece
# trainers are single-node over exactly this table), but the
# distributed loop pays one argmax job chain PER MERGE — ~0.4-0.5 s of
# scheduler latency each for a 1-row answer (measured r7: 10 merges =
# ~3-5 s at sf0.01 for 10 output rows). Under the bound the table is
# collected once (Arrow) and the merges are learned locally —
# bit-identical results, same tie-break, one job instead of 10 chains.
# 200k words ≈ a few MB; above it the probe early-exits and the
# distributed loop runs (100 TB corpora: vocab is millions of rows —
# the loop's per-merge shuffle is the honest scale path).
LOCAL_BPE_VOCAB_BOUND = 200_000


def _utf16_units(w: str) -> list:
    """Split a string into UTF-16 code units — the unit Spark's
    ``split(w, '')`` and Java regexes operate on, so the local trainer
    sees exactly the symbol arrays the distributed fold sees (identical
    to ``list(w)`` for BMP-only text)."""
    b = w.encode("utf-16-be", "surrogatepass")
    return [
        b[i : i + 2].decode("utf-16-be", "surrogatepass")
        for i in range(0, len(b), 2)
    ]


def _bpe_train_local(word_counts, num_merges: int) -> list:
    """Driver-side exact BPE merge learning over the full word-frequency
    table: per round, weighted adjacent-pair counts (every occurrence,
    overlapping included), argmax by (count desc, a asc, b asc) — both
    string comparisons are code-point order, matching Spark/DuckDB
    UTF-8 binary ordering — then the greedy non-overlapping
    left-to-right merge fold, exactly the semantics of the distributed
    ``F.aggregate`` rewrite. Stops when the best pair count drops
    below 2."""
    from collections import Counter

    syms = [(_utf16_units(w), int(wc)) for w, wc in word_counts]
    merges = []
    for rank in range(num_merges):
        cnt: Counter = Counter()
        for s, wc in syms:
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += wc
        if not cnt:
            break
        (a, b), n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < 2:
            break
        merges.append((rank, a, b, a + b, n))
        merged = a + b
        nxt = []
        for s, wc in syms:
            acc = []
            for x in s:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = merged
                else:
                    acc.append(x)
            nxt.append((acc, wc))
        syms = nxt
    return merges


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_word_count: int = 1,
    local_vocab_bound: int = LOCAL_BPE_VOCAB_BOUND,
) -> DataFrame:
    """Train byte-pair-encoding merges over the corpus — the tokenizer-
    construction step (`text_token_count_bpe` *applies* a BPE-ish rule;
    this *learns* one).

    Distributed form of the classic algorithm:

    1. ONE pass over the corpus builds the word-frequency table (the
       only fact-table-sized job; everything after runs on |vocab| rows).
    2. Each word becomes its symbol array (characters).
    3. Per merge step: weighted adjacent-pair counts (explode → groupBy
       → deterministic top-1 by count desc / pair asc), then a greedy
       left-to-right in-row fold (`F.aggregate`) rewrites every word's
       symbol array. The top-1 `.first()` is a 1-row driver action per
       iteration — inherent to iterative BPE (same class as IVF centroid
       fits); the word table itself never leaves the executors.

    At 100 TB the word table is ~|distinct words| (millions, not
    trillions) — each of the K iterations is a small shuffle on pair
    keys. `localCheckpoint` every few rounds truncates the growing
    lineage exactly like `connected_components` does.

    Returns the ordered merge table: (merge_rank, left, right, merged,
    pair_count).
    """
    words = (
        df.select(F.explode(F.split(F.lower(text_col), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.col("wc") >= min_word_count)
    )
    spark = df.sparkSession
    if local_vocab_bound:
        probe = words.limit(local_vocab_bound + 1).toPandas()
        if len(probe) <= local_vocab_bound:
            return spark.createDataFrame(
                _bpe_train_local(
                    list(zip(probe["w"].tolist(), probe["wc"].tolist())),
                    num_merges,
                ),
                "merge_rank int, left string, right string, merged string, "
                "pair_count bigint",
            )
    syms = words.select(
        "wc", F.split("w", "").alias("s")
    )
    merges = []
    for rank in range(num_merges):
        pairs = (
            syms.select(
                "wc",
                F.expr(
                    "explode(transform(slice(s, 1, size(s) - 1), "
                    "(x, i) -> struct(x AS a, element_at(s, i + 2) AS b)))"
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("wc").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
        )
        best = pairs.first()
        if best is None or best["n"] < 2:
            break
        a, b, n = best["a"], best["b"], int(best["n"])
        merges.append((rank, a, b, a + b, n))
        # Greedy left-to-right merge of (a,b) in every symbol array.
        syms = syms.select(
            "wc",
            F.expr(
                "aggregate(s, CAST(array() AS array<string>), (acc, x) -> "
                f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {_sql_str(a)} "
                f"AND x = {_sql_str(b)} "
                f"THEN concat(slice(acc, 1, size(acc) - 1), array({_sql_str(a + b)})) "
                "ELSE concat(acc, array(x)) END)"
            ).alias("s"),
        )
        if (rank + 1) % 4 == 0:
            syms = syms.localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, merged string, pair_count bigint"
    )


def _sql_str(s: str) -> str:
    """SQL string literal (single-quote escaped)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
