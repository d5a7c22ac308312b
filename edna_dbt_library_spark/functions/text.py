"""Text-analysis Column builders for LLM-data-pipeline operators.

All pure JVM built-ins (split/regexp/length/aggregate) — no Python UDFs —
so they vectorize inside whole-stage codegen and scale linearly over a
100 TB documents table. Used by operators/dedup.py and the text-analysis
driver queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the language-ID heuristic. Scoring
# is a pure token-membership count, so the whole thing stays JVM-side.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "es": ("el", "la", "de", "que", "los", "un", "es"),
}

ENGLISH_STOPWORDS = LANG_STOPWORDS["en"] + ("it", "for", "on", "with", "as", "this", "that")


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of lowercased text, empty strings removed."""
    arr = F.split(F.lower(_col(text)), r"\s+")
    return F.filter(arr, lambda t: t != "")


def shingles(text: Column | str, n: int = 2) -> Column:
    """Word n-gram shingles (space-joined) of lowercased text — the MinHash
    input for near-dup detection at n>1 (word order matters, unlike the
    unigram set).

    Built by zip_with-ing n position-shifted slices of the token array —
    NOT by `transform(sequence(1, count), i -> array_join(slice(toks, i,
    n)))`: in that form `toks` is a correlated subexpression inside the
    lambda, and interpreted HOF evaluation re-runs the whole
    lower+split+filter tokenization once PER OUTPUT ELEMENT — an O(W²)
    per-document blowup (measured 5.4x wall on the sf0.1 documents
    corpus for n=3: 4.07s -> 0.76s, bit-identical multiset). Same trap
    and same cure as curation._hashed_ngram_structs; the slice form
    evaluates the token array exactly n times per row."""
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = tokens(text)
    if n == 1:
        return toks
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))

    def build() -> Column:
        m = F.size(toks) - (n - 1)
        g = F.slice(toks, 1, m)
        for j in range(1, n):
            g = F.zip_with(g, F.slice(toks, 1 + j, m), lambda a, b: F.concat(a, F.lit(" "), b))
        return g

    return F.when(count > 0, build()).otherwise(F.array().cast("array<string>"))


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def approx_bpe_token_count(text: Column | str) -> Column:
    """BPE-ish token estimate: count of word/number/punctuation fragments of
    the kind a byte-pair tokenizer splits on (letter runs, digit runs, other
    non-space chars), plus a length/4 correction for very long words."""
    c = _col(text)
    # split at word/punct boundaries, after punct, at letter<->digit
    # transitions, and on whitespace; zero-width splits can leave
    # whitespace-prefixed fragments, so trim before counting
    frag_pattern = (
        r"(?<=[\p{L}\p{N}])(?=[^\p{L}\p{N}])"
        r"|(?<=[^\p{L}\p{N}\s])"
        r"|(?<=\p{L})(?=\p{N})|(?<=\p{N})(?=\p{L})"
        r"|\s+"
    )
    fragments = F.size(
        F.filter(F.transform(F.split(c, frag_pattern), F.trim), lambda t: t != "")
    )
    long_word_extra = F.aggregate(
        tokens(c),
        F.lit(0),
        lambda acc, t: acc + F.when(F.length(t) > 8, (F.length(t) - 1) / F.lit(4)).otherwise(F.lit(0)).cast("int"),
    )
    return fragments + long_word_extra


def word_stats(text: Column | str, toks: Column | None = None) -> dict[str, Column]:
    """n_words, avg word length, stopword ratio — building blocks for the
    quality score. Returned as a dict of named Columns.

    ``toks``: pass a PROJECTED token-array column to share one
    tokenization across every consumer — inline, the tokens(text)
    subtree is copied into each returned Column and interpreted HOF
    evaluation re-runs the lower+split+filter once per signal (r14;
    the same multi-consumer rule as shingles/CollapseProject)."""
    toks = tokens(text) if toks is None else toks
    n = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*ENGLISH_STOPWORDS)))
    return {
        "n_words": n,
        "avg_word_len": F.when(n > 0, total_len / n).otherwise(F.lit(None).cast("double")),
        "stopword_ratio": F.when(n > 0, stop_hits / n).otherwise(F.lit(None).cast("double")),
    }


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are punctuation."""
    c = _col(text)
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[.,!?;:'\"()\[\]{}-]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(None).cast("double"))


def quality_score(text: Column | str, toks: Column | None = None) -> Column:
    """Deterministic [0,1] quality heuristic: rewards mid-length documents,
    plausible word lengths and some stopword presence; penalizes extreme
    punctuation. The exact blend is arbitrary but fixed — it is a filter
    signal, not a model. ``toks``: see word_stats."""
    stats = word_stats(text, toks)
    n_words = stats["n_words"].cast("double")
    awl = F.coalesce(stats["avg_word_len"], F.lit(0.0))
    stop = F.coalesce(stats["stopword_ratio"], F.lit(0.0))
    pr = F.coalesce(punct_ratio(text), F.lit(0.0))
    length_term = F.least(n_words / F.lit(100.0), F.lit(1.0))
    wordlen_term = F.when((awl >= 3) & (awl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_term = F.least(stop * 5, F.lit(1.0))
    punct_term = F.when(pr <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(length_term * 0.4 + wordlen_term * 0.2 + stop_term * 0.2 + punct_term * 0.2, 6)


def _stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    # NB: a default-arg lambda (lambda t, words=words: ...) would be seen by
    # PySpark's HOF machinery as a two-parameter (element, index) lambda;
    # close over `words` via this factory instead.
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_scores(text: Column | str, toks: Column | None = None) -> dict[str, Column]:
    """Per-language stopword-hit counts (the lang-ID signal). ``toks``:
    see word_stats — inline, the token subtree is copied once per
    LANGUAGE."""
    toks = tokens(text) if toks is None else toks
    return {lang: _stopword_hits(toks, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id(text: Column | str, toks: Column | None = None) -> Column:
    """Language with the highest stopword-hit count; ties broken by language
    code order; 'und' (undetermined) when nothing matches. ``toks``: see
    word_stats."""
    scores = lang_scores(text, toks)
    pairs = F.array(*[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in sorted(scores.items())])
    best = F.array_max(F.filter(pairs, lambda p: p["score"] > 0))
    # array_max on struct compares by (score, lang); reverse-sort lang for
    # deterministic a-before-z ties by negating? Keep simple: max by score,
    # then lexicographically *largest* lang wins ties — fixed and documented.
    return F.coalesce(best["lang"], F.lit("und"))


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of casefolded, whitespace-collapsed,
    punctuation-stripped text. Deterministic exact-dup key after trivial
    formatting changes."""
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(_col(text)), r"[^\p{L}\p{N}\s]", ""), r"\s+", " "))
    return F.md5(norm)


# PII scrubbing patterns, constrained to the Java-regex ∩ RE2 common
# subset (no lookaround, no backrefs) so Spark's regexp_replace and the
# DuckDB oracle produce byte-identical redactions. Order matters: emails
# are redacted before bare digit runs so an address is never half-eaten
# by the phone rule. Known, documented ambiguities of the aggressive
# scrubber: dotted version strings ("1.2.3.4") redact as IPs; 10-12 digit
# runs redact as phones; 2-2-2-2 grouped international numbers do not.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ip": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\(\d{3}\)[ .-]?\d{3}[ .-]?\d{4}\b|\+?\b\d{1,2}[ .-]?\d{3}[ .-]?\d{3}[ .-]?\d{4}\b|\b\d{3}[ .-]\d{3}[ .-]\d{4}\b",
}


def pii_redact(text: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace emails / IPv4s / phone numbers with ``<EMAIL>``/``<IP>``/
    ``<PHONE>`` tokens — the standard pre-training scrub step. Pure chained
    ``regexp_replace`` (JVM codegen, no Python), linear over a 100 TB
    corpus with zero shuffle; idempotent (tokens contain no redactable
    text), and engine-portable by pattern construction (see PII_PATTERNS).
    """
    out = _col(text)
    for kind in kinds or tuple(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def pii_flags(text: Column | str) -> dict[str, Column]:
    """Per-kind booleans (``has_email``/``has_ip``/``has_phone``) for
    filtering or audit metrics without rewriting the text."""
    c = _col(text)
    return {f"has_{kind}": F.regexp_like(c, F.lit(pat)) for kind, pat in PII_PATTERNS.items()}


#: basic named HTML entities decoded by strip_html (order matters:
#: &amp; last so "&amp;lt;" decodes to "&lt;" not "<")
HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def strip_html(text: Column | str) -> Column:
    """Crawl-page text extraction: drop <script>/<style> blocks and
    HTML comments WITH their content, strip remaining tags, decode the
    common entities, collapse whitespace. Pure regexp_replace chain —
    zero UDFs, zero shuffles, runs at the scan like the PII redactor.

    Deliberately a TEXT CLEANER, not a parser: nesting-abusing or
    unterminated markup degrades to leaving text in place (never
    drops non-markup content — the catch-all requires a tag-like
    start ``</?[A-Za-z!]``, so prose comparisons like ``x < y and
    z > w`` survive intact); a DOM-accurate boilerplate model
    (trafilatura-class) is an injectable upgrade, the codec-hook
    pattern. NULL propagates."""
    c = _col(text)
    # script/style/comment blocks: non-greedy, case-insensitive, dotall
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    # block-level closers become spacing so words don't glue together
    c = F.regexp_replace(c, r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|table)\b[^>]*>", " ")
    # any remaining TAG-LIKE span only: must open with a letter, '/' or
    # '!' so bare '<'/'>' in prose/math never swallows the text between
    c = F.regexp_replace(c, r"</?[A-Za-z!][^>]*>", "")
    for ent, rep in HTML_ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    return F.trim(F.regexp_replace(c, r"\s+", " "))
