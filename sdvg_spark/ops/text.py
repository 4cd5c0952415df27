"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Everything is a native column expression (regex + higher-order array
functions) — these run inside whole-stage codegen at full scan speed,
and each has an exact ANSI-SQL mirror so the DuckDB oracle can verify
them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny high-frequency stopword profiles. Deliberately small and frozen:
# they are part of the operator's contract (the SQL oracle embeds the
# same lists).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for", "on", "with", "as", "was", "at"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por", "con", "no", "para", "los", "se"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans", "les", "des", "du", "en", "au"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "zu", "im", "auf", "für"],
    "ru": ["и", "в", "не", "на", "что", "с", "по", "это", "как", "из", "за", "то", "же", "от", "для"],
}
LANGS = sorted(STOPWORDS)  # deterministic order: de, en, es, fr, ru

# BPE-ish tokenizer: word pieces or single non-space symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# -- literal-fragment cache --------------------------------------------------
# Column objects are immutable unresolved expression handles, so
# literal-only fragments (stopword maps, zero vectors) can be built once
# per JVM gateway and reused across every plan. Building them is pure
# py4j round-trip cost — the lang_hits map alone is ~500 calls, which
# dominated plan-CONSTRUCTION time for every text query (measured
# 1.46 s per detect_language() call at r11). Keyed on the gateway id so
# a restarted JVM rebuilds instead of resurrecting dead object handles.
_LIT_CACHE: dict = {}
_LIT_CACHE_GW: list = [None]


def _cached_lit(key: str, build):
    from pyspark import SparkContext

    gw = id(SparkContext._gateway) if SparkContext._gateway is not None else 0
    if _LIT_CACHE_GW[0] != gw:  # new JVM gateway: drop stale handles
        _LIT_CACHE.clear()
        _LIT_CACHE_GW[0] = gw
    got = _LIT_CACHE.get(key)
    if got is None:
        got = _LIT_CACHE[key] = build()
    return got


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (empty array for blank text)."""
    t = F.trim(F.lower(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single symbols."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), F.lit(0)))


def stopword_hits(toks: Column, lang: str) -> Column:
    """Occurrence count of ``lang``'s stopwords in a token array.

    One hash-map lookup per token (``try_element_at`` on a literal map —
    NULL-on-miss under ANSI too) instead of an O(|stopwords|) array
    scan per token; counts are identical integers either way.
    """
    m = _cached_lit(
        f"stopmap:{lang}",
        lambda: F.create_map(
            *[x for w in sorted(STOPWORDS[lang]) for x in (F.lit(w), F.lit(1))]
        ),
    )
    return F.aggregate(
        toks, F.lit(0), lambda a, t: a + F.coalesce(F.try_element_at(m, t), F.lit(0))
    )


def stopword_ratio(text: Column, lang: str = "en", toks: Column | None = None) -> Column:
    """Fraction of tokens that are stopwords of ``lang`` (distinct-free:
    counts every occurrence). Pass a pre-computed ``toks`` column when
    staging several text features over one projection (avoids
    re-tokenizing per feature)."""
    if toks is None:
        toks = tokens(text)
    n = F.size(toks)
    return F.when(
        n > 0, stopword_hits(toks, lang).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def detect_language(text: Column, toks: Column | None = None) -> Column:
    """Heuristic language ID: the language whose stopword profile has
    the highest per-token hit ratio; CJK-dominant text short-circuits
    to 'zh'. Ties resolve to the alphabetically-first language;
    zero hits everywhere → 'und'.

    Array-argmax form: all languages share the token-count denominator,
    so argmax(ratio) == argmax(hit count); ``array_position`` of the max
    returns the FIRST (alphabetically-first) language on ties. Linear
    expression size — a when-chain fold here doubles per language and
    re-runs tokenization exponentially many times.

    All languages' hit counters accumulate in ONE pass over the tokens:
    a literal map sends each token to its per-language 0/1 indicator
    vector (``try_element_at`` — one hash lookup, NULL-on-miss under
    ANSI too) folded with ``zip_with`` adds — O(tokens · langs) instead
    of O(tokens · stopwords · langs); the counts are identical
    integers, so the oracle mirror is untouched.
    """
    if toks is None:
        toks = tokens(text)
    return _pred_from_hits(text, lang_hits(toks))


def lang_hits(toks: Column) -> Column:
    """Per-language stopword hit counts over ``toks``, one array<int>
    in LANGS order, accumulated in a single pass (see
    :func:`detect_language`). Exposed so callers computing several
    language features can STAGE this fold behind one projection and
    reuse the materialized column (HOF folds see no subexpression
    elimination — each expression copy re-runs the whole pass)."""
    def build_map():
        entries: dict[str, list[int]] = {}
        for li, lang in enumerate(LANGS):
            for w in STOPWORDS[lang]:
                entries.setdefault(w, [0] * len(LANGS))[li] = 1
        return F.create_map(
            *[
                x
                for w in sorted(entries)
                for x in (F.lit(w), F.array(*[F.lit(v) for v in entries[w]]))
            ]
        )

    m = _cached_lit("langhits:map", build_map)
    zero = _cached_lit("langhits:zero", lambda: F.array(*[F.lit(0) for _ in LANGS]))
    return F.aggregate(
        toks,
        zero,
        lambda a, t: F.zip_with(
            a, F.coalesce(F.try_element_at(m, t), zero), lambda x, y: x + y
        ),
    )


def _cjk_ratio(text: Column) -> Column:
    cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", ""))
    total = F.greatest(F.length(text), F.lit(1))
    return cjk.cast("double") / total.cast("double")


def _pred_from_hits(text: Column, hits: Column) -> Column:
    mx = F.array_max(hits)
    best = F.when(
        mx > 0,
        F.element_at(F.lit(LANGS), F.array_position(hits, mx).cast("int")),
    ).otherwise(F.lit("und"))
    return F.when(_cjk_ratio(text) > 0.3, F.lit("zh")).otherwise(best)


def language_scores(
    text: Column, toks: Column | None = None, hits: Column | None = None
) -> dict[str, Column]:
    """Language ID with a confidence signal next to the label:

    * ``lang_pred`` — :func:`detect_language`'s label
    * ``lang_score`` — the winning language's per-token stopword hit
      ratio (the CJK character ratio on the ``zh`` short-circuit): how
      strongly the text matches its predicted language at all
    * ``lang_margin`` — best minus second-best hit ratio (equals
      ``lang_score`` on the CJK branch): how far ahead the winner is —
      the standard keep/route threshold a corpus pipeline filters on
      (low margin = mixed-language or out-of-vocabulary text)

    Zero hits everywhere (``lang_pred = 'und'``) yields 0.0 for both.
    Pass staged ``toks``/``hits`` columns when computing several
    features (see :func:`lang_hits`).
    """
    if toks is None:
        toks = tokens(text)
    if hits is None:
        hits = lang_hits(toks)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    best = F.array_max(hits).cast("double")
    second = F.element_at(F.array_sort(hits), -2).cast("double")
    cjk = _cjk_ratio(text)
    is_cjk = cjk > 0.3
    return {
        "lang_pred": _pred_from_hits(text, hits),
        "lang_score": F.round(F.when(is_cjk, cjk).otherwise(best / n), 9),
        "lang_margin": F.round(F.when(is_cjk, cjk).otherwise((best - second) / n), 9),
    }


def quality_features(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Deterministic quality features; each is oracle-mirrorable."""
    if toks is None:
        toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    # word_chars counted via the COMPLEMENT replace: stripping the
    # alnum chars leaves a short remainder, while the direct
    # regexp_replace(text, "[^A-Za-z0-9]", "") materializes ~the whole
    # document as its output and measured 13× slower (18.2 s vs 1.4 s
    # per 500k-doc scan — regex replace cost follows OUTPUT bytes).
    # Same exact integer: n_chars − |non-alnum chars|.
    word_chars = n_chars - F.length(F.regexp_replace(text, r"[A-Za-z0-9]", ""))
    punct_chars = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    mean_word_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    # Gopher/C4-style repetition signals: heavily duplicated tokens or
    # lines mark boilerplate/spam. Both are per-row expressions (no
    # shuffle) and exact: counts of distinct elements, order-free.
    n_dtok = F.size(F.array_distinct(toks))
    lines = F.filter(F.split(text, "\n"), lambda x: F.length(x) > 0)
    n_lines = F.size(lines)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "dup_token_ratio": F.when(
            n_tok > 0, (n_tok - n_dtok).cast("double") / n_tok.cast("double")
        ).otherwise(F.lit(0.0)),
        "dup_line_ratio": F.when(
            n_lines > 0,
            (n_lines - F.size(F.array_distinct(lines))).cast("double")
            / n_lines.cast("double"),
        ).otherwise(F.lit(0.0)),
        "mean_word_len": mean_word_len,
        "punct_ratio": F.when(
            n_chars > 0, punct_chars.cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0)),
        "alnum_ratio": F.when(
            n_chars > 0, word_chars.cast("double") / n_chars.cast("double")
        ).otherwise(F.lit(0.0)),
        "stopword_ratio_en": stopword_ratio(text, "en", toks),
    }


def quality_score(text: Column, toks: Column | None = None) -> Column:
    """Composite [0,1] quality score: documents with reasonable length,
    low punctuation noise and English-like stopword density score high.
    The exact formula is the contract (mirrored in SQL):

        0.25·min(n_tokens/100, 1) + 0.25·(1 - punct_ratio)
        + 0.25·min(stopword_ratio_en/0.4, 1) + 0.25·alnum_ratio
    """
    f = quality_features(text, toks)
    return (
        F.least(f["n_tokens"].cast("double") / F.lit(100.0), F.lit(1.0)) * 0.25
        + (F.lit(1.0) - f["punct_ratio"]) * 0.25
        + F.least(f["stopword_ratio_en"] / F.lit(0.4), F.lit(1.0)) * 0.25
        + f["alnum_ratio"] * 0.25
    )


# ---------------------------------------------------------------------------
# fingerprinting

FP_BASE = 131
FP_MOD = 1_000_000_007


def token_entropy(text: Column, toks: Column | None = None) -> Column:
    """Shannon entropy (nats) of the document's token distribution —
    near 0 for degenerate repetition, ~ln(n_tokens) for all-distinct
    text. Standard corpus-quality signal next to the dup ratios.

    Computed as ln(n) − (Σ c·ln c)/n over per-distinct-token counts c —
    pure array expressions, no UDF. Counts come from one run-length
    FOLD over the sorted token array (struct accumulator: previous
    token, open run length, closed-run Σ c·ln c): O(n log n) sort +
    O(n) fold per row instead of the O(distinct·n) per-distinct filter
    scan, which goes quadratic on long mostly-distinct documents.
    (A positional starts/nexts formulation is a trap here: expression
    trees re-evaluate un-staged subexpressions per element inside
    higher-order functions, turning element_at(starts, j) into a full
    filter re-run — measured 10× SLOWER than the quadratic form.)
    The counts are identical integers; only the float summation ORDER
    changes (sorted-run vs first-occurrence), which the round-9
    consumer contract already absorbs — the DuckDB mirror accumulates
    in its own order today.
    """
    if toks is None:
        toks = tokens(text)
    n = F.size(toks)
    srt = F.array_sort(toks)

    def clnc(r: Column) -> Column:
        c = r.cast("double")
        return c * F.log(c)

    init = F.struct(
        F.lit(None).cast("string").alias("p"),
        F.lit(0).cast("long").alias("r"),
        F.lit(0.0).alias("s"),
    )

    def step(acc: Column, t: Column) -> Column:
        return (
            F.when(
                acc["r"] == 0,  # first token opens the first run
                F.struct(
                    t.alias("p"), F.lit(1).cast("long").alias("r"), acc["s"].alias("s")
                ),
            )
            .when(
                t == acc["p"],  # run continues
                F.struct(
                    t.alias("p"), (acc["r"] + F.lit(1)).alias("r"), acc["s"].alias("s")
                ),
            )
            .otherwise(  # run closes: fold its c·ln c, open the next
                F.struct(
                    t.alias("p"),
                    F.lit(1).cast("long").alias("r"),
                    (acc["s"] + clnc(acc["r"])).alias("s"),
                )
            )
        )

    sum_clnc = F.aggregate(
        srt,
        init,
        step,
        lambda acc: acc["s"]
        + F.when(acc["r"] > 0, clnc(acc["r"])).otherwise(F.lit(0.0)),
    )
    return F.when(
        n > 0, F.log(n.cast("double")) - sum_clnc / n.cast("double")
    ).otherwise(F.lit(0.0))


def word_ngram_list(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (empty when the
    document is shorter than ``n`` tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda gi: F.array_join(F.slice(toks, gi, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _gram_cover(grams: Column) -> Column:
    """Char-cover totals of an n-gram list as a struct
    ``(top_chars, dup_chars)``:

    - ``top_chars`` — count × char-length of the most frequent gram
      (ties resolve to the lexicographically-smallest gram);
    - ``dup_chars`` — Σ count × char-length over every gram occurring
      more than once.

    One run-length FOLD over the sorted gram array (the token_entropy
    trick): O(g log g) sort + O(g) fold per row, zero shuffle, pure
    integers — so the DuckDB mirror's group-by formulation produces
    bit-identical values.
    """
    srt = F.array_sort(grams)
    init = F.struct(
        F.lit(None).cast("string").alias("p"),
        F.lit(0).cast("long").alias("r"),
        F.lit(0).cast("long").alias("bc"),  # best (max) run count so far
        F.lit(0).cast("long").alias("top"),  # covered chars of that run
        F.lit(0).cast("long").alias("dup"),
    )

    def closed(acc: Column) -> tuple[Column, Column, Column]:
        """(bc, top, dup) after closing the currently-open run."""
        cover = acc["r"] * F.length(acc["p"]).cast("long")
        better = acc["r"] > acc["bc"]  # strict: first max in sorted order wins
        return (
            F.when(better, acc["r"]).otherwise(acc["bc"]),
            F.when(better, cover).otherwise(acc["top"]),
            acc["dup"] + F.when(acc["r"] > 1, cover).otherwise(F.lit(0).cast("long")),
        )

    def step(acc: Column, t: Column) -> Column:
        bc, top, dup = closed(acc)
        return (
            F.when(
                acc["r"] == 0,  # first gram opens the first run
                F.struct(
                    t.alias("p"),
                    F.lit(1).cast("long").alias("r"),
                    acc["bc"].alias("bc"),
                    acc["top"].alias("top"),
                    acc["dup"].alias("dup"),
                ),
            )
            .when(
                t == acc["p"],  # run continues
                F.struct(
                    t.alias("p"),
                    (acc["r"] + F.lit(1)).alias("r"),
                    acc["bc"].alias("bc"),
                    acc["top"].alias("top"),
                    acc["dup"].alias("dup"),
                ),
            )
            .otherwise(  # run closes: fold it, open the next
                F.struct(
                    t.alias("p"),
                    F.lit(1).cast("long").alias("r"),
                    bc.alias("bc"),
                    top.alias("top"),
                    dup.alias("dup"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        bc, top, dup = closed(acc)
        return F.when(
            acc["r"] > 0, F.struct(top.alias("top_chars"), dup.alias("dup_chars"))
        ).otherwise(
            F.struct(
                F.lit(0).cast("long").alias("top_chars"),
                F.lit(0).cast("long").alias("dup_chars"),
            )
        )

    return F.aggregate(srt, init, step, finish)


def repetition_features(
    text: Column,
    toks: Column | None = None,
    *,
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
) -> dict[str, Column]:
    """Gopher-style n-gram repetition signals (Rae et al. 2021 §A1.1):
    for each n in ``top_ns``, ``top{n}gram_frac`` — the fraction of the
    normalized text's characters covered by the single most frequent
    word n-gram; for each n in ``dup_ns``, ``dup{n}gram_frac`` — the
    fraction covered by ALL n-grams occurring more than once. Fractions
    are capped at 1.0 (overlapping windows can cover a character more
    than once; the cap keeps the signal a proper [0,1] ratio).

    "Normalized text" is the lowercased single-space token stream —
    char totals use ``len(array_join(toks, ' '))`` so both engines
    divide identical integers. Map-only expressions: no shuffle, no
    UDF; a 100 TB corpus scan computes these at full codegen speed.
    """
    if toks is None:
        toks = tokens(text)
    chars = F.length(F.array_join(toks, " ")).cast("long")

    def frac(cover: Column) -> Column:
        return F.when(
            chars > 0,
            F.least(F.lit(1.0), cover.cast("double") / chars.cast("double")),
        ).otherwise(F.lit(0.0))

    out: dict[str, Column] = {}
    for n in top_ns:
        out[f"top{n}gram_frac"] = frac(
            _gram_cover(word_ngram_list(toks, n))["top_chars"]
        )
    for n in dup_ns:
        out[f"dup{n}gram_frac"] = frac(
            _gram_cover(word_ngram_list(toks, n))["dup_chars"]
        )
    return out


def fingerprint(text: Column, toks: Column | None = None) -> Column:
    """Polynomial rolling hash over token codepoint-sums, mod 1e9+7.

    fp = Σ-fold: acc = (acc*131 + tokhash(t)) mod p, where
    tokhash(t) = Σ codepoints(t) mod p. Pure integer arithmetic —
    bit-identical in Spark and DuckDB. Intermediate products stay
    < (1e9+7)·131 + 1e9+7 < 2^63.
    """
    if toks is None:
        toks = tokens(text)

    def tokhash(t: Column) -> Column:
        chars = F.split(t, "")
        return F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda a, c: (a + F.ascii(c)) % F.lit(FP_MOD),
        )

    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(FP_BASE) + tokhash(t)) % F.lit(FP_MOD),
    )


# ---------------------------------------------------------------------------
# SQL mirrors (DuckDB dialect) — keep in lockstep with the expressions


def sql_tokens(col: str) -> str:
    return (
        f"CASE WHEN length(trim(lower({col}))) = 0 THEN []::VARCHAR[] "
        f"ELSE regexp_split_to_array(trim(lower({col})), '\\s+') END"
    )


def sql_whitespace_token_count(col: str) -> str:
    return f"len({sql_tokens(col)})"


def sql_regex_token_count(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{TOKEN_REGEX}'))"


def sql_stopword_ratio(col: str, lang: str = "en") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    toks = sql_tokens(col)
    return (
        f"(CASE WHEN len({toks}) > 0 THEN "
        f"len(list_filter({toks}, t -> list_contains([{words}], t)))::DOUBLE "
        f"/ len({toks})::DOUBLE ELSE 0.0 END)"
    )


def sql_detect_language(col: str) -> str:
    cjk = f"length(regexp_replace({col}, '[^一-鿿]', '', 'g'))"
    total = f"greatest(length({col}), 1)"
    expr = "'und'"
    score = "0.0"
    # fold in reverse so the first (alphabetical) language wins ties,
    # mirroring the Column fold's first-wins semantics
    for lang in LANGS:
        s = sql_stopword_ratio(col, lang)
        expr = f"(CASE WHEN {s} > {score} THEN '{lang}' ELSE {expr} END)"
        score = f"greatest({s}, {score})"
    return (
        f"(CASE WHEN {cjk}::DOUBLE / {total}::DOUBLE > 0.3 THEN 'zh' ELSE {expr} END)"
    )


def sql_language_scores(col: str) -> dict[str, str]:
    """DuckDB mirror of :func:`language_scores` — identical integer hit
    counts divided in float64, so values compare bit-exact after the
    shared round(…, 9)."""
    toks = sql_tokens(col)
    cnts = []
    for lang in LANGS:
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        cnts.append(
            f"len(list_filter({toks}, t -> list_contains([{words}], t)))"
        )
    lst = "[" + ", ".join(cnts) + "]"
    n = f"greatest(len({toks}), 1)::DOUBLE"
    best = f"(list_sort({lst})[-1])::DOUBLE"
    second = f"(list_sort({lst})[-2])::DOUBLE"
    cjk = (
        f"(length(regexp_replace({col}, '[^一-鿿]', '', 'g'))::DOUBLE"
        f" / greatest(length({col}), 1)::DOUBLE)"
    )
    return {
        "lang_pred": sql_detect_language(col),
        "lang_score": (
            f"round(CASE WHEN {cjk} > 0.3 THEN {cjk} ELSE {best} / {n} END, 9)"
        ),
        "lang_margin": (
            f"round(CASE WHEN {cjk} > 0.3 THEN {cjk} "
            f"ELSE ({best} - {second}) / {n} END, 9)"
        ),
    }


def sql_quality_features(col: str) -> dict[str, str]:
    toks = sql_tokens(col)
    lines = f"list_filter(string_split({col}, chr(10)), x -> length(x) > 0)"
    return {
        "n_chars": f"length({col})::BIGINT",
        "n_tokens": f"len({toks})::BIGINT",
        "dup_token_ratio": (
            f"(CASE WHEN len({toks}) > 0 THEN "
            f"(len({toks}) - len(list_distinct({toks})))::DOUBLE / len({toks}) "
            f"ELSE 0.0 END)"
        ),
        "dup_line_ratio": (
            f"(CASE WHEN len({lines}) > 0 THEN "
            f"(len({lines}) - len(list_distinct({lines})))::DOUBLE / len({lines}) "
            f"ELSE 0.0 END)"
        ),
        "mean_word_len": (
            f"(CASE WHEN len({toks}) > 0 THEN "
            f"list_sum(list_transform({toks}, t -> length(t)))::DOUBLE / len({toks}) "
            f"ELSE 0.0 END)"
        ),
        "punct_ratio": (
            f"(CASE WHEN length({col}) > 0 THEN "
            f"length(regexp_replace({col}, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / length({col}) "
            f"ELSE 0.0 END)"
        ),
        "alnum_ratio": (
            f"(CASE WHEN length({col}) > 0 THEN "
            f"length(regexp_replace({col}, '[^A-Za-z0-9]', '', 'g'))::DOUBLE / length({col}) "
            f"ELSE 0.0 END)"
        ),
        "stopword_ratio_en": sql_stopword_ratio(col, "en"),
    }


def sql_quality_score(col: str) -> str:
    f = sql_quality_features(col)
    return (
        f"(least({f['n_tokens']}::DOUBLE / 100.0, 1.0) * 0.25"
        f" + (1.0 - {f['punct_ratio']}) * 0.25"
        f" + least({f['stopword_ratio_en']} / 0.4, 1.0) * 0.25"
        f" + {f['alnum_ratio']} * 0.25)"
    )


def sql_token_entropy(col: str) -> str:
    """DuckDB mirror of :func:`token_entropy` — same ln(n) − (Σ c·ln c)/n
    over the same token list."""
    l = sql_tokens(col)
    counts = (
        f"list_transform(list_distinct({l}), "
        f"t -> len(list_filter({l}, x -> x = t))::DOUBLE)"
    )
    return (
        f"CASE WHEN len({l}) > 0 THEN "
        f"ln(len({l})::DOUBLE) - "
        f"list_sum(list_transform({counts}, c -> c * ln(c))) / len({l})::DOUBLE "
        f"ELSE 0.0 END"
    )


def repetition_features_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
    round_digits: int = 9,
) -> str:
    """DuckDB mirror of :func:`repetition_features` as a full query
    (one row per document, same column names as the Spark entry).

    Formulated relationally — unnest the n-gram list, GROUP BY
    (doc, gram) for counts, then per-doc reduce — instead of nested
    list lambdas: DuckDB executes the unnest/group-by plan in
    milliseconds where per-distinct-gram ``list_filter`` rescans are
    quadratic per row and planner-hostile (measured: minutes at
    sf0.01). The top-gram tie resolves via ``ORDER BY c DESC, gram``
    row_number = the lexicographically-smallest most-frequent gram,
    exactly the Column fold's first-max-in-sorted-order rule.
    Identical integers → identical capped double ratios.
    """
    chars = f"length(array_to_string({sql_tokens(text_col)}, ' '))::BIGINT"
    ctes = [
        f"base AS (SELECT {id_col} AS id, {chars} AS chars, "
        f"{sql_tokens(text_col)} AS toks FROM {table})"
    ]
    joins: list[str] = []
    cols: list[str] = []

    def frac(cover: str) -> str:
        return (
            f"round(CASE WHEN chars > 0 THEN "
            f"least(1.0, coalesce({cover}, 0)::DOUBLE / chars::DOUBLE) "
            f"ELSE 0.0 END, {round_digits})"
        )

    for n in sorted(set(top_ns) | set(dup_ns)):
        ctes.append(
            f"g{n} AS (SELECT id, unnest(CASE WHEN len(toks) >= {n} THEN "
            f"list_transform(range(1, len(toks) - {n - 1} + 1), "
            f"gi -> array_to_string(list_slice(toks, gi, gi + {n - 1}), ' ')) "
            f"ELSE []::VARCHAR[] END) AS gram FROM base)"
        )
        ctes.append(
            f"c{n} AS (SELECT id, gram, count(*)::BIGINT AS c "
            f"FROM g{n} GROUP BY id, gram)"
        )
    for n in top_ns:
        ctes.append(
            f"top{n} AS (SELECT id, cover FROM ("
            f"SELECT id, c * length(gram)::BIGINT AS cover, "
            f"row_number() OVER (PARTITION BY id ORDER BY c DESC, gram) AS rn "
            f"FROM c{n}) WHERE rn = 1)"
        )
        joins.append(f"LEFT JOIN top{n} ON top{n}.id = base.id")
        cols.append(frac(f"top{n}.cover") + f" AS top{n}gram_frac")
    for n in dup_ns:
        ctes.append(
            f"dup{n} AS (SELECT id, sum(CASE WHEN c > 1 "
            f"THEN c * length(gram)::BIGINT ELSE 0 END) AS cover "
            f"FROM c{n} GROUP BY id)"
        )
        joins.append(f"LEFT JOIN dup{n} ON dup{n}.id = base.id")
        cols.append(frac(f"dup{n}.cover") + f" AS dup{n}gram_frac")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT base.id AS {id_col}, "
        + ", ".join(cols)
        + "\nFROM base "
        + " ".join(joins)
    )


def sql_fingerprint(col: str) -> str:
    toks = sql_tokens(col)
    tokhash = (
        "list_aggregate(list_transform(string_split_regex(t, ''), "
        f"c -> ascii(c)), 'sum') % {FP_MOD}"
    )
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({toks}, t -> ({tokhash})::BIGINT)), "
        f"(acc, h) -> (acc * {FP_BASE} + h) % {FP_MOD})"
    )


# ---------------------------------------------------------------------------
# PII redaction — the scrubbing pass of a training-data pipeline.
#
# Patterns are deliberately restricted to the regex subset Java
# (Spark) and RE2 (DuckDB) evaluate identically — character classes,
# bounded repetition, alternation, \b word boundaries; NO lookaround —
# so the redaction is oracle-checkable value-for-value. Order matters:
# more specific shapes (email, IP, SSN, card) run before the aggressive
# phone pattern that would otherwise swallow their digits.

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("card", r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b", "<CARD>"),
    ("phone", r"\+?[0-9][0-9() .-]{7,14}[0-9]", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Replace emails / IPv4s / SSN-shaped / card-shaped / phone-shaped
    substrings with typed placeholders. One regexp_replace per pattern,
    all inside whole-stage codegen."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts, measured on the same progressively-
    redacted stream the replacement sees (so a card number is never
    ALSO counted as a phone — each count reflects what its own pattern
    actually redacted)."""
    counts: dict[str, Column] = {}
    cur = text
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(cur, F.lit(pat), F.lit(0))
        )
        cur = F.regexp_replace(cur, pat, repl)
    return counts


def sql_redact_pii(col: str) -> str:
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def sql_pii_counts(col: str) -> dict[str, str]:
    counts: dict[str, str] = {}
    cur = col
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = f"len(regexp_extract_all({cur}, '{pat}'))"
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return counts


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction


def tfidf_topk(
    df,
    id_col: str,
    text_col: str,
    *,
    top_n: int = 3,
    round_digits: int = 6,
    order_by: str = "deterministic",
    n_docs: int | None = None,
):
    """Top-``top_n`` keywords per document. ``n_docs`` (the corpus
    count: the score literal and the tier probe) may be passed by
    callers who already know it — e.g. from parquet footer metadata —
    to skip the plan-build count job.

    ``order_by="deterministic"`` (default) ranks by the INTEGER-ONLY
    key ``(tf DESC, df ASC, token ASC)``. This is NOT the tf·ln(N/df)
    order — e.g. tf=3,df=100 outranks tf=2,df=2 at N=500 despite a ~2×
    lower score — it is a tf-then-rarity heuristic whose virtue is
    bit-exact reproducibility across engines (float scores can tie
    within an ulp: tf=2,df=50 vs tf=1,df=5 at N=500 are exactly equal
    reals, and ln() last-ulp differences between engines would make a
    float rank nondeterministic). The ``tfidf`` column is DISPLAY-ONLY
    under this mode (rounded to ``round_digits``); consumers wanting
    score order should not re-sort by it but pass
    ``order_by="score"``, which ranks by the float score
    ``(tfidf DESC, token ASC)`` — the true tf-idf order, deterministic
    within one engine but not oracle-exact across engines.

    Scale shape — TIERED on corpus size like the rollup
    (``_TFIDF_RLE_MIN_DOCS``; both tiers are value-identical so one
    oracle text covers either):

    * small corpora: classic explode + (doc, term) hash aggregation —
      one shuffle fewer stages and fastest when the partial-agg map
      fits comfortably;
    * at ``n_docs ≥ _TFIDF_RLE_MIN_DOCS``: per-doc term counts are
      computed INSIDE each row — a sorted-array run-length fold in
      pure codegen HOFs — so the raw token stream never shuffles and
      there is no (doc, term) partial-agg hash map to spill (at the r8
      sf100 probe that map was the query's entire 6.6 GB spill: the
      synthetic fixture's (doc, term) key space is
      near-raw-cardinality, so partial aggregation bought nothing and
      fell back to sort-spill).

    Either way, what remains distributed: one vocab-keyed aggregation
    for document frequencies (collapses well — vocab ≪ postings), a
    shuffle-hash join of postings to it (hashing the vocab-sized side;
    SMJ would re-sort the postings), and the per-doc top-k window. The
    corpus size N — needed for the score literal anyway — is one
    distributed count at plan-build time and doubles as the tier
    probe; a 1-row crossJoin would put a BroadcastNestedLoopJoin in
    the plan, and a constant-key equi-join constant-folds back into
    one.
    """
    if order_by not in ("deterministic", "score"):
        raise ValueError(f"order_by must be deterministic/score, got {order_by!r}")
    if n_docs is None:
        n_docs = df.count()
    if n_docs < _TFIDF_RLE_MIN_DOCS:
        tok = df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
        )
        tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
        return _tfidf_rank(tf, id_col, n_docs, top_n, round_digits, order_by)
    tf = rle_postings(df, id_col, text_col)
    return _tfidf_rank(tf, id_col, n_docs, top_n, round_digits, order_by)


def rle_postings(df, id_col: str, text_col: str):
    """(id, token, tf): per-document term counts computed INSIDE each
    row — run-length-encode the sorted token array, one struct(token,
    tf) per DISTINCT per-doc term, in pure codegen HOFs, all map-side.
    The raw token stream never leaves its row, so a downstream
    (doc, term) or vocab aggregate sees one row per distinct per-doc
    term instead of one per token occurrence, and there is no
    (doc, term) partial-agg hash map to spill (at the r8 sf100 probe
    that map was tfidf's entire 6.6 GB spill: the synthetic fixture's
    (doc, term) key space is near-raw-cardinality, so partial
    aggregation bought nothing and fell back to sort-spill).

    Shared by the tfidf scale tier and the unigram_nll tier
    (:func:`sdvg_spark.ops.corpus.unigram_nll_tiered`) — one
    construction, one set of tests (tests/test_vocab_tiers.py pins it
    against exploded groupBy counts). Null text behaves like an empty
    doc (no postings).

    Each HOF input is staged behind a projection first — lambdas see
    no subexpression elimination, so an inlined `srt` would re-sort
    per element.
    """
    from sdvg_spark.ops.dedup import widen

    # widen(): the in-row sort+RLE is the heavy map stage; a narrow
    # (single-row-group) input would run it on one core (no-op at scale)
    srt = widen(df, min_bytes=4 << 20).select(
        F.col(id_col),
        F.array_sort(
            F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
        ).alias("__srt"),
    )
    s = F.col("__srt")

    def guarded_seq(n: Column) -> Column:
        # sequence(1, 0) counts DOWN ([1, 0]) and element_at(x, 0)
        # throws even non-ANSI — empty inputs need an explicit branch
        return F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )

    # 1-based positions where a new run starts (position 1, or token
    # differs from its predecessor; the CASE keeps element_at away from
    # index 0)
    starts = srt.select(
        F.col(id_col),
        "__srt",
        F.filter(
            guarded_seq(F.size(s)),
            lambda p: F.when(p == F.lit(1), F.lit(True)).otherwise(
                F.element_at(s, p) != F.element_at(s, p - F.lit(1))
            ),
        ).alias("__starts"),
    )
    st = F.col("__starts")
    # run length = next start - this start, with a sentinel end bound
    bounds = F.concat(st, F.array(F.size(s) + F.lit(1)))
    posting_structs = starts.select(
        F.col(id_col),
        F.inline_outer(
            F.transform(
                guarded_seq(F.size(st)),
                lambda j: F.struct(
                    F.element_at(s, F.element_at(st, j)).alias("token"),
                    (
                        F.element_at(bounds, j + F.lit(1)) - F.element_at(bounds, j)
                    ).cast("long").alias("tf"),
                ),
            )
        ),
    )
    return posting_structs.where(F.col("token").isNotNull())


# tier bound: below this many documents the explode + (doc, term) hash
# aggregation is cheapest (its partial-agg map fits); above it the map
# is the spill (r8 sf100: 6.6 GB at 5M docs, zero at 500k) and the
# in-row run-length fold takes over
_TFIDF_RLE_MIN_DOCS = 2_000_000


def _tfidf_rank(tf, id_col: str, n_docs: int, top_n: int,
                round_digits: int, order_by: str):
    """Shared tail of both tfidf tiers: document frequencies, the
    shuffle-hash join back, and the per-doc top-k window."""
    from pyspark.sql.window import Window

    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    score = F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df"))
    if order_by == "score":
        w = Window.partitionBy(id_col).orderBy(F.desc("__score"), F.asc("token"))
    else:
        w = Window.partitionBy(id_col).orderBy(
            F.desc("tf"), F.asc("df"), F.asc("token")
        )
    return (
        tf.join(dfreq.hint("shuffle_hash"), "token")
        .withColumn("__n", F.lit(n_docs))
        .withColumn("__score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_n)
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df",
            F.round(F.col("__score"), round_digits).alias("tfidf"),
            "rank",
        )
    )


def tfidf_topk_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
    round_digits: int = 6,
) -> str:
    """DuckDB mirror of :func:`tfidf_topk` — same tokenization as
    ``sql_tokens`` (proven ≡ the Spark split by text_features), same
    integer ranking, same rounded display score."""
    return f"""
WITH tok AS (
  SELECT {id_col} AS did, unnest({sql_tokens(text_col)}) AS token FROM {table}),
tf AS (SELECT did, token, count(*) AS tf FROM tok GROUP BY did, token),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(*) AS n FROM {table}),
r AS (
  SELECT did, token, tf, df,
    row_number() OVER (PARTITION BY did ORDER BY tf DESC, df ASC, token) AS rank
  FROM tf JOIN dfq USING (token))
SELECT did AS {id_col}, token, tf, df,
  round(tf * ln(n::DOUBLE / df), {round_digits}) AS tfidf, rank
FROM r, n WHERE rank <= {top_n}"""


def bm25_topk(
    df,
    queries: list[tuple[int, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    round_digits: int = 9,
):
    """Full-text relevance retrieval: top-``topk`` documents per query
    under Okapi BM25 (Lucene idf variant) — the lexical complement of
    the ANN family for building retrieval sets over a corpus.

    ``queries`` is a small driver-side list of ``(qid, text)`` — the
    realistic retrieval shape (queries are user input, not a table).
    Each query scores over its UNIQUE terms (repeated terms count
    once);  score(q, d) = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). Zero-score docs
    (no matched term) are absent by construction.

    Determinism: the per-(query, doc) float sum folds in TERM order
    (sorted struct fold, the unigram_nll pattern) and ranking uses the
    round-``round_digits`` score — the same rounded double the row
    emits — with doc id as tiebreak, so rank and value stay consistent
    across engines (cf. tfidf_topk's integer-rank rationale).

    Scale shape: the corpus is touched once; postings are filtered to
    the query-term set MAP-SIDE (literal isin before any shuffle), so
    the only corpus-keyed shuffle carries matched postings — at 100 TB
    that is |docs containing a query term| rows, not the corpus. df
    and the query-term table are ≤|terms| rows and broadcast; N/avgdl
    ride as plan-time literals (a 1-row crossJoin would plan a
    BroadcastNestedLoopJoin). The final per-query top-k is a
    rank-filtered window: WindowGroupLimit bounds each partition's
    candidates map-side before the qid shuffle.
    """
    import re

    if topk < 1:
        raise ValueError(f"topk must be >= 1, got {topk}")
    if k1 <= 0 or not 0.0 <= b <= 1.0:
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got k1={k1}, b={b}")
    if not queries:
        raise ValueError("queries must be non-empty")
    qids = [q for q, _ in queries]
    if len(set(qids)) != len(qids):
        raise ValueError("query ids must be unique")
    # mirror tokens(): trim+lower then whitespace split
    qterms = [
        (int(qid), sorted({t for t in re.split(r"\s+", qtext.strip().lower()) if t}))
        for qid, qtext in queries
    ]
    pairs = [(qid, t) for qid, terms in qterms for t in terms]
    if not pairs:
        raise ValueError("no query produced any term")
    all_terms = sorted({t for _, t in pairs})

    st = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("t"),
    ).first()
    n_docs, total_toks = int(st["n"] or 0), int(st["t"] or 0)
    if n_docs == 0:
        raise ValueError("corpus is empty")
    avgdl = float(total_toks) / float(n_docs)

    staged = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    postings = staged.select(
        id_col, F.size("__toks").alias("__dl"), F.explode("__toks").alias("__tok")
    ).where(F.col("__tok").isin(all_terms))
    tf = postings.groupBy(id_col, "__tok").agg(
        F.count(F.lit(1)).alias("tf"), F.min("__dl").alias("__dl")
    )
    dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("df"))
    qtable = df.sparkSession.createDataFrame(pairs, "qid long, __tok string")

    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(1.0) - F.lit(float(b)) + F.lit(float(b)) * F.col("__dl") / F.lit(avgdl)
    contrib = idf * (
        F.col("tf") * F.lit(float(k1) + 1.0) / (F.col("tf") + F.lit(float(k1)) * norm)
    )

    from pyspark.sql.window import Window

    scored = (
        tf.join(F.broadcast(dfreq), "__tok")
        .join(F.broadcast(qtable), "__tok")
        .select("qid", id_col, F.col("__tok"), contrib.alias("__c"))
        .groupBy("qid", id_col)
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(
                F.aggregate(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("__tok", "__c"))),
                        lambda s: s["__c"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                round_digits,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("qid", "rank", id_col, "score", F.col("n_matched").cast("long").alias("n_matched"))
    )


def bm25_topk_oracle_sql(
    queries: list[tuple[int, str]],
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    round_digits: int = 9,
) -> str:
    """DuckDB mirror of :func:`bm25_topk` — same query-term split, same
    double arithmetic shape, same term-ordered fold, same
    rounded-score rank key."""
    import re

    from sdvg_spark.core.rng import dlit

    pairs = [
        (int(qid), t)
        for qid, qtext in queries
        for t in sorted({x for x in re.split(r"\s+", qtext.strip().lower()) if x})
    ]
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in pairs)
    toks = sql_tokens(text_col)
    k1p1, k1l, bl = dlit(float(k1) + 1.0), dlit(float(k1)), dlit(float(b))
    return f"""
WITH q(qid, tok) AS (VALUES {vals}),
d AS (SELECT {id_col} AS did, {toks} AS toks FROM {table}),
st AS (SELECT count(*) AS n, CAST(sum(len(toks)) AS DOUBLE)/count(*) AS avgdl FROM d),
p AS (SELECT did, len(toks) AS dl, unnest(toks) AS tok FROM d),
tf AS (SELECT did, tok, count(*) AS tf, min(dl) AS dl FROM p
       WHERE tok IN (SELECT tok FROM q) GROUP BY did, tok),
dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
c AS (SELECT q.qid, tf.did, tf.tok,
        ln(1.0e0 + ((SELECT n FROM st) - dfq.df + 0.5e0)/(dfq.df + 0.5e0))
        * (tf.tf * {k1p1} / (tf.tf + {k1l} *
           (1.0e0 - {bl} + {bl} * tf.dl / (SELECT avgdl FROM st)))) AS c
      FROM tf JOIN dfq USING (tok) JOIN q ON q.tok = tf.tok),
s AS (SELECT qid, did, count(*) AS n_matched,
        round(list_sum(list_transform(list_sort(list({{'t': tok, 'c': c}})),
                                      r -> r.c)), {round_digits}) AS score
      FROM c GROUP BY qid, did),
r AS (SELECT qid, did, n_matched, score,
        row_number() OVER (PARTITION BY qid ORDER BY score DESC, did) AS rank
      FROM s)
SELECT qid, rank, did AS {id_col}, score, n_matched::BIGINT AS n_matched
FROM r WHERE rank <= {topk}"""
