"""Text-analysis expression library (all JVM-side built-ins — no Python UDFs).

Column-valued helpers for the LLM-data-pipeline surface: tokenization,
shingling, language-ID heuristic, quality scoring, rolling-hash
fingerprinting. Every function returns a Column built purely from
``pyspark.sql.functions`` so the whole pipeline stays inside
whole-stage codegen; on 100 TB these run at scan speed with zero
Python-worker round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TOKEN_PATTERN = "[a-z0-9]+"
FP_MOD = 2_147_483_647  # 2^31 - 1; keeps acc*31+code within int64

# Tiny embedded stopword sets for the language-ID heuristic. Real
# deployments would broadcast a larger lexicon table; the heuristic
# (per-language stopword hit-ratio, argmax with deterministic
# tie-break) is the operator under test.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un"],
    "fr": ["le", "la", "de", "et", "un", "les", "des", "en"],
    "de": ["der", "die", "und", "das", "ein", "nicht", "mit", "ist"],
}


def tokens(text: Column | str) -> Column:
    """Lowercased alphanumeric tokens."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer pattern, restricted to constructs RE2 also
# supports (no lookahead) so the DuckDB oracle can run the IDENTICAL
# regex: contractions, letter runs, digit runs, punctuation runs.
BPE_PATTERN = "'(?:s|d|m|t|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+"

SUBWORD_LEN = 4  # BPE-ish proxy: a word of n chars ≈ ceil(n/4) merges


def bpe_pieces(text: Column | str) -> Column:
    """Pre-tokenizer piece count (the unit a BPE vocab would merge from)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0))


def subword_count(toks: Column) -> Column:
    """Deterministic proxy for BPE token count: sum of ceil(len/4) over
    alphanumeric tokens — the budget estimator used for corpus sizing
    when the real tokenizer isn't on the cluster."""
    return F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(float(SUBWORD_LEN))))


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) from a token array.

    Built from n shifted slices zipped together — array ops inside
    codegen, no explode/re-group. Docs with fewer than n tokens yield [].
    """
    if n < 2:
        raise ValueError("shingle size must be >= 2")
    width = F.size(toks) - (n - 1)
    parts = [F.slice(toks, i + 1, width) for i in range(n)]
    combined = parts[0]
    for p in parts[1:]:
        combined = F.zip_with(combined, p, lambda a, b: F.concat_ws(" ", a, b))
    empty = F.slice(toks, 1, 0)
    return F.when(F.size(toks) >= n, F.array_distinct(combined)).otherwise(empty)


def span_list(toks: Column, n: int) -> Column:
    """ALL word n-gram spans (space-joined) in document order, duplicates
    kept — the position-sensitive counterpart of :func:`shingles` for
    substring-level dedup and winnowing. Docs with < n tokens yield [].
    """
    if n < 2:
        raise ValueError("span size must be >= 2")
    width = F.size(toks) - (n - 1)
    parts = [F.slice(toks, i + 1, width) for i in range(n)]
    combined = parts[0]
    for p in parts[1:]:
        combined = F.zip_with(combined, p, lambda a, b: F.concat_ws(" ", a, b))
    empty = F.slice(toks, 1, 0)
    return F.when(F.size(toks) >= n, combined).otherwise(empty)


def char_fold_hash(s: Column) -> Column:
    """Polynomial rolling hash of one string: fold (acc*31 + codepoint)
    mod (2^31-1) over its characters. Same integer recurrence as
    :func:`fingerprint`, usable inside array transforms."""
    chars = F.filter(F.split(s, ""), lambda c: F.length(c) > 0)
    return F.aggregate(
        chars, F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FP_MOD)


def winnow_fingerprints(toks: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer et al., SIGMOD 2003 — the
    MOSS algorithm): hash every k-token span, then keep the minimum hash
    of each w-wide sliding window of consecutive span positions; return
    the distinct selected hashes.

    Guarantees every shared run of >= k+w-1 tokens between two documents
    contributes at least one shared fingerprint, while storing only
    ~2/(w+1) of the span hashes. Entirely array ops in codegen: shifted
    slices zipped with least() give the window minima without an
    explode/re-group.
    """
    spans = span_list(toks, k)
    hashes = F.transform(spans, char_fold_hash)
    width = F.size(hashes) - (w - 1)
    parts = [F.slice(hashes, i + 1, width) for i in range(w)]
    mins = parts[0]
    for p in parts[1:]:
        mins = F.zip_with(mins, p, lambda a, b: F.least(a, b))
    empty = F.slice(hashes, 1, 0)
    return F.when(F.size(hashes) >= w, F.array_distinct(mins)).otherwise(empty)


def stopword_ratio(toks: Column, lang: str) -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    in_set = F.filter(toks, lambda t: t.isin(*words))
    return F.when(F.size(toks) > 0,
                  F.size(in_set).cast("double") / F.size(toks).cast("double")
                  ).otherwise(F.lit(0.0))


def lang_guess(toks: Column) -> Column:
    """Argmax of per-language stopword ratios; 'unknown' if all zero.

    Deterministic tie-break: first language (in STOPWORDS key order)
    whose score equals the max.
    """
    scores = {lang: stopword_ratio(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    out = F.lit("unknown")
    # Build the when-chain in reverse so earlier languages win ties.
    for lang in reversed(list(STOPWORDS)):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric or whitespace."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, "[A-Za-z0-9\\s]", "")
    return F.when(F.length(col) > 0,
                  F.length(stripped).cast("double") / F.length(col).cast("double")
                  ).otherwise(F.lit(0.0))


def avg_token_len(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0,
                  total.cast("double") / F.size(toks).cast("double")).otherwise(F.lit(0.0))


def quality_score(text_col: Column, toks: Column) -> Column:
    """Heuristic document-quality score in [0,1]: rewards length (log-scaled)
    and stopword presence, penalizes punctuation density and extreme
    token lengths. Deterministic closed-form — same formula as the oracle.
    """
    n_tok = F.size(toks).cast("double")
    len_score = F.least(F.lit(1.0), F.log(F.lit(1.0) + n_tok) / F.log(F.lit(101.0)))
    stop_score = F.least(F.lit(1.0), stopword_ratio(toks, "en") * 5.0)
    punct_pen = F.least(F.lit(1.0), punct_ratio(text_col) * 4.0)
    wordlen = avg_token_len(toks)
    wordlen_pen = F.when((wordlen < 2.0) | (wordlen > 12.0), F.lit(0.5)).otherwise(F.lit(0.0))
    raw = 0.5 * len_score + 0.3 * stop_score - 0.3 * punct_pen - wordlen_pen * 0.2
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw))


# PII patterns restricted to constructs Java regex and RE2 share (no
# lookahead/backrefs) so the DuckDB oracle runs the IDENTICAL regexes.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9() -]{6,}[0-9]"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def pii_count(col: Column | str, pattern: str) -> Column:
    """Number of non-overlapping matches of one PII pattern."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def redact_pii(col: Column | str) -> Column:
    """Replace emails, then phone numbers, then IPv4 addresses with typed
    placeholders. Order matters and is fixed: the oracle applies the same
    three replacements in the same order. Pure JVM regexp_replace —
    codegen-resident, no Python workers."""
    out = F.regexp_replace(col, PII_EMAIL, "[EMAIL]")
    out = F.regexp_replace(out, PII_PHONE, "[PHONE]")
    return F.regexp_replace(out, PII_IPV4, "[IP]")


def fingerprint(toks: Column) -> Column:
    """Order-sensitive rolling-hash fingerprint of the normalized token
    stream: fold (acc*31 + codepoint) mod (2^31-1) over the characters of
    the space-joined tokens. Pure integer arithmetic => bit-identical in
    any engine (the correctness oracle reproduces it in SQL).
    """
    norm = F.concat_ws(" ", toks)
    # Java's split("", -1) keeps a trailing "" element — drop empties so the
    # fold sees exactly the characters (parity with the SQL oracle).
    chars = F.filter(F.split(norm, ""), lambda c: F.length(c) > 0)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FP_MOD,
    )
