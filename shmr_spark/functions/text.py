"""Text-analysis primitives for the training-data pipeline: tokenize,
token counting, quality scoring, language-ID heuristic, fingerprints.

All pure Column expressions (JVM-side, codegen'd) — at 100 TB these
run inside the scan stage with no Python round-trip. Each has an exact
DuckDB SQL twin (same arithmetic, same determinism) used by the query
oracles in queries/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword marker sets for the language-ID heuristic. Tiny on purpose:
# the operator contract is a deterministic n-gram/marker-count vote,
# not linguistic accuracy; swap in real tables at deployment.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (array<string>). Single-space split to match
    the corpus; see tokens_re for the regex variant."""
    return F.split(_c(col), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token-count estimate: chars/4, the industry
    rule-of-thumb — a cheap codegen'd proxy when no tokenizer runs."""
    return F.ceil(F.length(_c(col)) / F.lit(4)).cast("long")


# Explicit ASCII classes, not \w: Java (Spark) and RE2 (DuckDB) agree
# on these exactly; \w/\s unicode semantics differ between engines.
_BPE_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def tokens_re(col: Column | str) -> Column:
    """BPE-style pre-tokenization (word runs + individual punctuation),
    the GPT-2 pre-tokenizer shape. idx=0 = whole match (Spark defaults
    to capture group 1 and errors on group-less patterns)."""
    return F.regexp_extract_all(_c(col), F.lit(_BPE_RE), 0)


def token_count_re(col: Column | str) -> Column:
    return F.size(tokens_re(col)).cast("long")


def sql_token_count_re(expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({expr}, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT)"
    )


def marker_count(col: Column | str, markers: tuple[str, ...]) -> Column:
    """How many whitespace tokens of `col` are in `markers` — the
    language-ID vote. Array lambda, no explode, no shuffle."""
    toks = tokens(col)
    lit_markers = F.array(*(F.lit(m) for m in markers))
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_markers, t))).cast("long")


def lang_id(col: Column | str) -> Column:
    """Marker-vote language guess; deterministic tie-break by the fixed
    language order in LANG_MARKERS."""
    counts = {lang: marker_count(col, ms) for lang, ms in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    expr = F.lit("unknown")
    # Build CASE from last to first so earlier languages win ties.
    for lang in reversed(langs):
        others = [counts[o] for o in langs if o != lang]
        cond = (counts[lang] > 0) & (counts[lang] >= F.greatest(*others))
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_score(col: Column | str) -> Column:
    """Deterministic doc-quality heuristic in [0,1]: mean token length
    sweet spot + stopword presence. Same formula as the SQL twin."""
    c = _c(col)
    n_tok = token_count(c).cast("double")
    n_char = F.length(c).cast("double")
    mean_tok_len = (n_char - (n_tok - 1)) / n_tok
    stop_cnt = marker_count(c, LANG_MARKERS["en"]).cast("double")
    stop_ratio = stop_cnt / n_tok
    len_component = F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return (len_component * 0.6 + stop_ratio * 0.4).cast("double")


def sql_tokens(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def sql_token_count(expr: str) -> str:
    return f"CAST(len(string_split({expr}, ' ')) AS BIGINT)"


def sql_marker_count(expr: str, markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return (
        f"CAST(len(list_filter(string_split({expr}, ' '), t -> t IN ({lst}))) AS BIGINT)"
    )


def sql_lang_id(expr: str) -> str:
    langs = list(LANG_MARKERS)
    counts = {lang: sql_marker_count(expr, ms) for lang, ms in LANG_MARKERS.items()}
    sql = "'unknown'"
    for lang in reversed(langs):
        others = ", ".join(counts[o] for o in langs if o != lang)
        sql = (
            f"CASE WHEN {counts[lang]} > 0 AND {counts[lang]} >= GREATEST({others}) "
            f"THEN '{lang}' ELSE {sql} END"
        )
    return sql


def sql_quality_score(expr: str) -> str:
    # Constants are CAST AS DOUBLE: DuckDB literals with a decimal
    # point are DECIMAL and would take a different (exact) arithmetic
    # path than Spark's double literals.
    n_tok = f"CAST({sql_token_count(expr)} AS DOUBLE)"
    n_char = f"CAST(length({expr}) AS DOUBLE)"
    mean_tok_len = f"(({n_char} - ({n_tok} - 1)) / {n_tok})"
    stop_cnt = f"CAST({sql_marker_count(expr, LANG_MARKERS['en'])} AS DOUBLE)"
    one, half, w1, w2 = (f"CAST({x} AS DOUBLE)" for x in ("1.0", "0.5", "0.6", "0.4"))
    return (
        f"CAST((CASE WHEN {mean_tok_len} >= 3 AND {mean_tok_len} <= 10 THEN {one} ELSE {half} END)"
        f" * {w1} + ({stop_cnt} / {n_tok}) * {w2} AS DOUBLE)"
    )
