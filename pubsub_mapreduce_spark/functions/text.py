"""Text-analysis column functions for the training-data pipeline surface.

Everything here is built-in-function compositions (JVM-side, codegen'd) —
no Python UDFs — so they vectorize over 100TB of documents. Each has an
exact DuckDB-SQL twin used by the correctness oracle.

Design note: tokenization is whitespace-split throughout, matching the
fixtures' space-separated text; a BPE-ish regex tokenizer variant is
provided for token counting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, n: int) -> Column:
    """Deterministic cross-engine rounding: ``floor(x*10^n + 0.5)/10^n``.

    SIGNED-INPUT CONTRACT: on negative inputs this rounds exact halves
    toward +inf (``floor(-0.5 + 0.5) = -0`` -> 0.0, not -1's "away from
    zero") — i.e. it is "half-up" on the number line, not "half away
    from zero". Operators that feed signed values (mann_kendall z,
    dunn_posthoc z, durbin_watson slope, stl_lite seasonal/residual,
    theil_index t_between_term, ...) rely on this being mirrored
    verbatim in the DuckDB oracle (same floor(x*1eN+0.5)/1eN), so the
    half-toward-+inf behavior IS part of the cross-engine contract,
    for negative values as much as positive ones.

    Spark's ``round`` (BigDecimal half-up on the shortest decimal repr)
    and DuckDB's (numeric) disagree on values whose shortest repr
    terminates in '5' at the target digit — which small-denominator
    rationals like stopword ratios and jaccards hit regularly (found
    empirically: quality=0.86875 rounded to .8687 vs .8688). This form
    uses only IEEE multiply/add/floor, so two engines that computed the
    same input double always agree. Oracle twin:
    ``floor(x * 1eN + 0.5) / 1eN``."""
    scale = float(10**n)
    return F.floor(col * scale + F.lit(0.5)) / scale

# Small deterministic English stopword list shared with the oracle SQL.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

# BPE-ish token pattern: runs of letters, runs of digits, or single
# non-space punctuation — a cheap stand-in for subword tokenization.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization -> array<string> (empty strings removed)."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count via regexp extraction."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def stopword_ratio(text: Column | str, toks: Column | None = None) -> Column:
    """Fraction of whitespace tokens that are English stopwords.

    ``toks``: pass a pre-tokenized array column to share one split across
    many derived features (codegen CSE does not always collapse repeated
    regex splits; sharing measured ~25% off the doc-stats projection)."""
    toks = tokens(text) if toks is None else toks
    sw = F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS))
    return F.when(F.size(toks) > 0, F.size(sw) / F.size(toks)).otherwise(F.lit(0.0))


def avg_token_len(text: Column | str, toks: Column | None = None) -> Column:
    """Mean token length over whitespace tokens (0.0 for empty docs)."""
    toks = tokens(text) if toks is None else toks
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of non-space characters that are not alphanumeric."""
    c = text if isinstance(text, Column) else F.col(text)
    nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    alnum = F.length(F.regexp_replace(c, r"[^A-Za-z0-9]", ""))
    return F.when(nonspace > 0, (nonspace - alnum) / nonspace).otherwise(F.lit(0.0))


def quality_score(text: Column | str, toks: Column | None = None) -> Column:
    """Composite heuristic quality score in [0, 1]:
    0.4 * length-band + 0.3 * stopword presence + 0.3 * (1 - punct ratio).

    The exact formula is arbitrary by design (the reference has no text
    ops); what matters is that it is deterministic and SQL-expressible so
    the oracle can verify the full Spark plan that computes it.
    """
    c = text if isinstance(text, Column) else F.col(text)
    n = F.length(c)
    length_band = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n >= 20, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    sw_band = F.least(stopword_ratio(c, toks) * 5.0, F.lit(1.0))
    return 0.4 * length_band + 0.3 * sw_band + 0.3 * (1.0 - punct_ratio(c))


def lang_id(text: Column | str, toks: Column | None = None) -> Column:
    """Heuristic language ID: 'en' when the English stopword ratio clears
    a threshold, else 'other'. (A real n-gram profile model would be a
    broadcast-joined profile table; the fixtures' word-soup text makes a
    stopword heuristic the honest deterministic choice.)"""
    return F.when(stopword_ratio(text, toks) >= 0.08, F.lit("en")).otherwise(
        F.lit("other")
    )


FINGERPRINT_MOD = (1 << 31) - 1


def token_hash32(t: Column) -> Column:
    """Deterministic 32-bit token hash shared with the DuckDB oracle:
    first 8 hex chars of md5, parsed as an integer. (Spark: ``conv``;
    DuckDB: ``('0x' || substr(md5(t),1,8))::BIGINT`` — identical values.)"""
    return F.conv(F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10).cast("long")


def fingerprint(
    text: Column | str, mod: int = FINGERPRINT_MOD, toks: Column | None = None
) -> Column:
    """Polynomial rolling-hash document fingerprint over whitespace tokens:
    ``h = fold(tokens, (h*31 + token_hash32(token)) mod M)`` with
    M = 2^31-1 so the fold never overflows int64. Runs as a codegen'd
    higher-order function, not a UDF.
    """
    toks = tokens(text) if toks is None else toks
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31) + token_hash32(t)) % F.lit(mod),
    )
