"""Text-analysis column expressions for the ``documents`` table.

All operators are pure built-in Column expressions (JVM-side, codegen) —
no Python UDFs — and each has an exactly-mirrored DuckDB SQL twin in
``queries_text.py`` for the correctness gate.  Portable-hash discipline:
token hashes are the first 8 hex digits of md5 parsed as a long, which
both engines compute identically (``F.conv`` / strpos-expansion).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Tiny per-language stopword sets for the n-gram/stopword language-ID
#: heuristic.  Deliberately small and deterministic; real deployments
#: would swap in a proper profile table.
STOPWORDS = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "en", "que", "pour", "dans"],
}

#: Deterministic language priority for argmax tiebreaks (must match the
#: CASE cascade in the SQL twin).
LANG_ORDER = ["en", "de", "es", "fr"]

FINGERPRINT_MOD = 1_000_000_007

#: BPE-ish pre-tokenizer: letter runs, single digits, or single
#: non-alphanumeric marks — the GPT-2-style split shape reduced to
#: character classes that Java and RE2-family regex engines interpret
#: identically (no lookarounds, no unicode property classes).
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space convention of the corpus)."""
    return F.split(text, " ")


def bpe_tokens(text: Column) -> Column:
    """Sub-word-ish tokens via the BPE-style split regex.  A real BPE
    merges these further against a vocabulary; the pre-tokenize count is
    the standard cheap proxy for token budgeting at corpus scale."""
    return F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), 0)


def token_hash(token: Column) -> Column:
    """Portable 32-bit-ish token hash: first 8 hex digits of md5 as long."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")


def stopword_count(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_scores(toks: Column) -> dict[str, Column]:
    """stopword-hit ratio per language; 0.0 for empty docs."""
    n = F.size(toks)
    return {
        lang: (stopword_count(toks, lang) / F.when(n > 0, n).otherwise(F.lit(1))).cast("double")
        for lang in LANG_ORDER
    }


def predicted_lang(scores: dict[str, Column]) -> Column:
    """Argmax over lang_scores with LANG_ORDER tiebreak, as a CASE cascade
    (mirrored verbatim in SQL so ties resolve identically)."""
    expr = F.lit(LANG_ORDER[-1])
    for i in range(len(LANG_ORDER) - 2, -1, -1):
        lang = LANG_ORDER[i]
        cond = F.lit(True)
        for later in LANG_ORDER[i + 1 :]:
            cond = cond & (scores[lang] >= scores[later])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def round_portable(col: Column, digits: int = 7) -> Column:
    """Engine-portable fixed-point rounding for NON-NEGATIVE doubles:
    ``floor(x * 10^digits + 0.5) / 10^digits`` — three plain IEEE
    operations, so two engines holding the SAME double always produce
    the same rounded double.

    Why not ``F.round``/SQL ``ROUND``: quality-style scores are
    rationals whose exact value can land ON the decimal rounding tie
    (e.g. 0.86359375 at 7 digits), with the computed double within a
    few 1e-17 of it.  Spark rounds the exact binary value through
    BigDecimal HALF_UP while DuckDB rounds through a scaled float
    multiply — near a tie the two algorithms legitimately disagree by
    one step (measured: 4-18 of 5000 docs at sf0.1, invisible at
    sf0.01).  Defining the rounding as floor-scale arithmetic removes
    the tie semantics from the contract entirely: both engines take the
    same branch because they evaluate the same three exact-determinate
    ops on the same bits.  SQL twin: queries_text.portable_round_sql.
    """
    s = F.lit(float(10**digits))
    return F.floor(col * s + F.lit(0.5)) / s


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic:
    0.5·min(1, n_tokens/100) + 0.3·(1 − en_stopword_ratio)
    + 0.2·min(1, avg_token_len/8)."""
    toks = tokens(text)
    n = F.size(toks)
    n_safe = F.when(n > 0, n).otherwise(F.lit(1))
    avg_len = (F.length(text) - (n - F.lit(1))) / n_safe
    stop_ratio = stopword_count(toks, "en") / n_safe
    return (
        F.lit(0.5) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
        + F.lit(0.2) * F.least(F.lit(1.0), avg_len / F.lit(8.0))
    ).cast("double")


def fingerprint_terms(toks: Column) -> Column:
    """Array of position-weighted token hashes: hash(token_i)·(i+1).
    Summed (then mod) by the caller — SUM order is associative on exact
    int64 values, so it is engine-order-independent."""
    return F.transform(toks, lambda t, i: token_hash(t) * (i + F.lit(1)).cast("long"))


#: PII patterns restricted to the regex subset Java and RE2-family
#: engines interpret identically (no lookarounds, no backreferences).
#: Deliberately conservative — recall-oriented patterns for a redaction
#: pass, not a compliance guarantee.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-. ]{7,}[0-9]",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}

#: Redaction replacement token per PII kind.
PII_TOKENS = {kind: f"<{kind.upper()}>" for kind in PII_PATTERNS}

#: Order matters: SSN before phone (an SSN is also phone-shaped), IPv4
#: before phone for the same reason.
PII_REDACT_ORDER = ["email", "ssn", "ipv4", "phone"]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (JVM-side ``regexp_count``)."""
    return {
        kind: F.regexp_count(text, F.lit(pat)).alias(f"n_{kind}")
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its ``<KIND>`` token, applying the
    more-specific patterns first so an SSN/IP is not half-eaten by the
    looser phone pattern."""
    out = text
    for kind in PII_REDACT_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], PII_TOKENS[kind])
    return out


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: sum of position-weighted token
    hashes mod FINGERPRINT_MOD (a rolling-hash analogue that stays
    SQL-expressible; max |terms| ~2^51 so the int64 sum cannot overflow)."""
    terms = fingerprint_terms(tokens(text))
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (total % F.lit(FINGERPRINT_MOD)).cast("long")


#: Query parameters dropped by canonical_url: tracking/session noise that
#: makes byte-identical pages look distinct.  The standard web-corpus
#: dedup key is the URL AFTER this normalization.
URL_TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "sessionid", "phpsessid",
)

#: scheme :// authority path ?query — fragment must be stripped first.
_URL_PARTS = r"^(?:([A-Za-z][A-Za-z0-9+.-]*)://)?([^/?#]*)([^?#]*)(?:\?([^#]*))?"


def canonical_url(
    url: Column, drop_params: tuple[str, ...] = URL_TRACKING_PARAMS
) -> Column:
    """Deterministic canonical form of a URL for exact-dedup keying —
    the standard web-corpus move that stops tracking noise from
    splitting duplicate pages into distinct keys:

    - fragment removed; scheme and host lowercased (path case is
      significant and preserved); ``www.`` prefix and default ports
      (``:80`` for http, ``:443`` for https) dropped;
    - tracking/session query parameters (``drop_params``, default
      URL_TRACKING_PARAMS — only unambiguous tracking/session names;
      content-selecting params like ``ref``/``sid`` that some sites use
      for branches/story ids are deliberately NOT in the default list,
      pass them explicitly if your corpus treats them as noise) removed
      by case-insensitive name, survivors sorted by full ``name=value``
      text so parameter order cannot split a dup group, an emptied
      query dropped entirely;
    - trailing path slash dropped (``/a/`` == ``/a``, ``/`` == empty).

    Pure Column expressions (one regexp decomposition, then split /
    filter / array_sort / concat — JVM-side); NULL in, NULL out.
    Conservative by design: no path normalization, no percent-decoding,
    no IDN folding — it never merges URLs that could serve different
    content.
    """
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _URL_PARTS, 1))
    host = F.lower(F.regexp_extract(u, _URL_PARTS, 2))
    path = F.regexp_extract(u, _URL_PARTS, 3)
    query = F.regexp_extract(u, _URL_PARTS, 4)

    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, ":443$", "")).otherwise(host)
    )
    path = F.regexp_replace(path, "/+$", "")

    drop = F.array(*[F.lit(p) for p in drop_params])
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "")
        & ~F.array_contains(drop, F.lower(F.substring_index(kv, "=", 1))),
    )
    clean_query = F.array_join(F.array_sort(params), "&")

    rebuilt = F.concat(
        F.when(scheme != "", F.concat(scheme, F.lit("://"))).otherwise(F.lit("")),
        host,
        path,
        F.when(clean_query != "", F.concat(F.lit("?"), clean_query)).otherwise(F.lit("")),
    )
    return F.when(url.isNull(), F.lit(None).cast("string")).otherwise(rebuilt)


def url_host(url: Column) -> Column:
    """Registrable-host key of a URL: lowercased authority with the
    ``www.`` prefix, port, and userinfo stripped — the grouping key for
    per-domain corpus mix reports and domain-level quality policy.
    Scheme-less URLs (``example.com/path``) resolve the same host as
    their schemed twins.  One regexp decomposition + cheap suffix
    rewrites, all JVM-side Column ops; NULL in, NULL out; a URL with an
    empty authority yields NULL (no host is not a domain)."""
    u = F.regexp_replace(url, "#.*$", "")
    host = F.lower(F.regexp_extract(u, _URL_PARTS, 2))
    host = F.regexp_replace(host, r"^[^@]*@", "")  # userinfo
    host = F.regexp_replace(host, r":[0-9]+$", "")  # any explicit port
    host = F.regexp_replace(host, r"^www\.", "")
    return F.when(url.isNull() | (host == ""), F.lit(None).cast("string")).otherwise(
        host
    )


def normalize_text(text: Column) -> Column:
    """Canonical text form for hashing/dedup keying: control characters
    (C0 + DEL) become spaces, runs of whitespace collapse to one space,
    the result is trimmed and lowercased.  The pre-pass every exact or
    near dedup key should share so that formatting noise (CRLF vs LF,
    tabs, trailing blanks, case) cannot split duplicate documents into
    distinct keys.  Explicit ``[\\x00-\\x1f\\x7f]`` character class
    rather than ``\\p{Cntrl}`` so Java regex (Spark) and RE2 (DuckDB,
    the declared oracle) match byte-for-byte.  Pure Column expressions;
    NULL in, NULL out."""
    t = F.regexp_replace(text, "[\\x00-\\x1f\\x7f]", " ")
    t = F.regexp_replace(t, " +", " ")
    return F.lower(F.trim(t))


def canonicalize_text(text: Column) -> Column:
    """Canonical text form for DEDUP KEYS (stronger than
    :func:`normalize_text`): lowercase, collapse every non-alphanumeric
    run to one space, trim.  Catches the trivially-reformatted
    duplicates byte-exact dedup misses (case, punctuation, whitespace
    variants) while staying portable: the pattern is in the
    Java/RE2-identical subset, so any engine re-derives the same
    canonical form (DuckDB twin:
    ``trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))``).
    Distinct from :func:`normalize_text`, which preserves punctuation
    and only folds control chars/whitespace/case — use that one when
    the text body must survive readable."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))
