"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID — all as *engine-portable SQL expressions*.

Every feature is defined once as a dialect template and rendered for both
Spark SQL (the engine) and DuckDB SQL (the correctness oracle), so parity
is by construction and the hot path stays entirely JVM-side inside
whole-stage codegen — no Python UDFs at all (the reference's
"zero-allocation hot path" analog, SURVEY.md §4).

At 100 TB these are embarrassingly parallel map-only projections: no
shuffle, predicate pushdown and column pruning reach the parquet scan
untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenization: alpha runs, digit runs, single non-space symbols
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny high-frequency marker lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "im"],
}
_LANG_ORDER = ["en", "es", "fr", "de"]  # deterministic tie-break preference


def _re_lit(dialect: str, pat: str) -> str:
    """Regex as a SQL string literal: Spark SQL processes backslash
    escapes inside single quotes, DuckDB does not."""
    return "'" + (pat.replace("\\", "\\\\") if dialect == "spark" else pat) + "'"


def _regex_replace_all(dialect: str, col: str, pat: str, rep: str) -> str:
    lit = _re_lit(dialect, pat)
    if dialect == "spark":
        return f"regexp_replace({col}, {lit}, '{rep}')"
    return f"regexp_replace({col}, {lit}, '{rep}', 'g')"


def _arr_len(dialect: str, arr: str) -> str:
    return f"size({arr})" if dialect == "spark" else f"len({arr})"


_WS = "\\s+"


def _words(dialect: str, col: str) -> str:
    """Distinct lowercase whitespace-separated words."""
    ws = _re_lit(dialect, _WS)
    if dialect == "spark":
        return f"array_distinct(split(lower({col}), {ws}))"
    return f"list_distinct(string_split_regex(lower({col}), {ws}))"


def _word_list(dialect: str, words: list[str]) -> str:
    inner = ", ".join(f"'{w}'" for w in words)
    return f"array({inner})" if dialect == "spark" else f"[{inner}]"


def _intersect(dialect: str, a: str, b: str) -> str:
    fn = "array_intersect" if dialect == "spark" else "list_intersect"
    return f"{fn}({a}, {b})"


def _stop_hits(dialect: str, col: str, lang: str) -> str:
    return _arr_len(
        dialect,
        _intersect(dialect, _words(dialect, col), _word_list(dialect, STOPWORDS[lang])),
    )


def text_feature_exprs(dialect: str, col: str = "text") -> dict[str, str]:
    """name -> SQL expression, renderable for 'spark' or 'duckdb'.

    All ratios are floored micro-units (bigint) so both engines agree
    bit-for-bit regardless of float formatting.
    """
    n = f"length({col})"
    n_alpha = f"length({_regex_replace_all(dialect, col, '[^A-Za-z]', '')})"
    n_digit = f"length({_regex_replace_all(dialect, col, '[^0-9]', '')})"
    n_space = f"length({_regex_replace_all(dialect, col, '[^ ]', '')})"
    tokens = f"regexp_extract_all({col}, {_re_lit(dialect, TOKEN_RE)}, 0)"
    token_count = _arr_len(dialect, tokens)
    words = _words(dialect, col)
    uniq_words = _arr_len(dialect, words)
    hits = {lang: _stop_hits(dialect, col, lang) for lang in _LANG_ORDER}

    # argmax with fixed preference order; 'und' when no marker hits at all
    lang_pred = "case "
    for lang in _LANG_ORDER:
        others = [hits[o] for o in _LANG_ORDER if o != lang]
        geq = " and ".join(f"{hits[lang]} >= {o}" for o in others)
        lang_pred += f"when {hits[lang]} > 0 and {geq} then '{lang}' "
    lang_pred += "else 'und' end"

    def micro(expr_num: str, expr_den: str) -> str:
        return (
            f"cast(floor(1000000.0 * ({expr_num}) / nullif({expr_den}, 0)) as bigint)"
        )

    alpha_ratio = micro(n_alpha, n)
    digit_ratio = micro(n_digit, n)
    space_ratio = micro(n_space, n)
    stop_ratio = micro(hits["en"], uniq_words)
    # composite 0..100 quality score: alphabetic mass, length sweet-spot,
    # stopword presence (floored -> integer-exact in both engines)
    quality = (
        f"cast(floor(40.0 * ({n_alpha}) / nullif({n}, 0)"
        f" + 30.0 * least({token_count}, 50) / 50.0"
        f" + 30.0 * ({hits['en']}) / 10.0) as bigint)"
    )
    norm = _regex_replace_all(dialect, f"lower({col})", "[^a-z0-9]+", " ")
    return {
        "n_chars_calc": f"cast({n} as bigint)",
        "token_count": f"cast({token_count} as bigint)",
        "uniq_word_count": f"cast({uniq_words} as bigint)",
        "alpha_ratio_e6": alpha_ratio,
        "digit_ratio_e6": digit_ratio,
        "space_ratio_e6": space_ratio,
        "stopword_ratio_e6": stop_ratio,
        "lang_pred": lang_pred,
        "quality_score": quality,
        "fingerprint_md5": f"md5({norm})",
    }


def staged_text_feature_plan(
    col: str = "text",
) -> tuple[dict[str, str], dict[str, str], dict[str, str]]:
    """The Spark-side execution plan for the SAME features, as three
    projection layers so every expensive intermediate evaluates ONCE.

    ``text_feature_exprs('spark', ...)`` inlines each regex/array
    subexpression at every use site; the language-ID argmax alone repeats
    the 4 stopword-intersection expressions ~16x, each of which repeats
    the lower+split+array_distinct of the document. Catalyst's
    subexpression elimination does not fire across CASE WHEN branches
    (conditional evaluation), so the inlined form re-runs the regex split
    dozens of times per row — measured 60x slower than this staged form
    at bench scale. CollapseProject will NOT re-merge these layers: the
    intermediates are non-cheap expressions referenced more than once.
    Values are identical to ``text_feature_exprs`` by construction (same
    helper templates, asserted in tests and by the DuckDB oracle)."""
    d = "spark"
    stage1 = {
        "__words": _words(d, col),
        "__n_alpha": f"length({_regex_replace_all(d, col, '[^A-Za-z]', '')})",
        "__n_digit": f"length({_regex_replace_all(d, col, '[^0-9]', '')})",
        "__n_space": f"length({_regex_replace_all(d, col, '[^ ]', '')})",
        "__token_count": _arr_len(
            d, f"regexp_extract_all({col}, {_re_lit(d, TOKEN_RE)}, 0)"
        ),
    }
    stage2 = {
        f"__hits_{lang}": _arr_len(
            d, _intersect(d, "__words", _word_list(d, STOPWORDS[lang]))
        )
        for lang in _LANG_ORDER
    }

    n = f"length({col})"
    hits = {lang: f"__hits_{lang}" for lang in _LANG_ORDER}
    uniq_words = _arr_len(d, "__words")
    lang_pred = "case "
    for lang in _LANG_ORDER:
        others = [hits[o] for o in _LANG_ORDER if o != lang]
        geq = " and ".join(f"{hits[lang]} >= {o}" for o in others)
        lang_pred += f"when {hits[lang]} > 0 and {geq} then '{lang}' "
    lang_pred += "else 'und' end"

    def micro(expr_num: str, expr_den: str) -> str:
        return (
            f"cast(floor(1000000.0 * ({expr_num}) / nullif({expr_den}, 0)) as bigint)"
        )

    norm = _regex_replace_all(d, f"lower({col})", "[^a-z0-9]+", " ")
    finals = {
        "n_chars_calc": f"cast({n} as bigint)",
        "token_count": "cast(__token_count as bigint)",
        "uniq_word_count": f"cast({uniq_words} as bigint)",
        "alpha_ratio_e6": micro("__n_alpha", n),
        "digit_ratio_e6": micro("__n_digit", n),
        "space_ratio_e6": micro("__n_space", n),
        "stopword_ratio_e6": micro(hits["en"], uniq_words),
        "lang_pred": lang_pred,
        "quality_score": (
            f"cast(floor(40.0 * (__n_alpha) / nullif({n}, 0)"
            f" + 30.0 * least(__token_count, 50) / 50.0"
            f" + 30.0 * ({hits['en']}) / 10.0) as bigint)"
        ),
        "fingerprint_md5": f"md5({norm})",
    }
    return stage1, stage2, finals


def with_text_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Append all text features as JVM-side columns (no Python)."""
    stage1, stage2, finals = staged_text_feature_plan(col)
    base = list(df.columns)
    out = df.select("*", *[F.expr(v).alias(k) for k, v in stage1.items()])
    out = out.select("*", *[F.expr(v).alias(k) for k, v in stage2.items()])
    return out.select(
        *base, *[F.expr(v).alias(k) for k, v in finals.items()]
    )
