"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language-ID, document
fingerprinting.

Every operator is a pure Column-expression pipeline (JVM-side, whole-stage
codegen, no Python in the hot path) and ships a DuckDB SQL twin so the
driver's oracle can verify it bit-for-bit. Tokenization is defined ONCE
(lower → strip non-[a-z0-9 ] → split on spaces → drop empties) and both
engines implement exactly that definition.

At 100 TB: all of these are embarrassingly parallel map-side operators —
no shuffle at all — so they scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import (MERSENNE_P, expand_round6, md5_long, round_portable,
                      sql_md5_long)

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-portable.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "en", "es", "un", "una"),
    "fr": ("le", "la", "de", "et", "en", "est", "un", "une"),
    "de": ("der", "die", "das", "und", "in", "ist", "ein", "eine"),
    "zh": ("de", "shi", "le", "bu", "wo", "ni", "ta", "men"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"] + ("that", "for", "on", "with", "as")

# BPE-ish token pattern: alpha runs, digit runs, or single non-alnum
# non-space chars — a cheap proxy for subword tokenizers' pre-tokenization.
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

FINGERPRINT_BASE = 31  # polynomial rolling-hash base


# -- shared tokenizer ---------------------------------------------------------

def tokens(text: Column) -> Column:
    """Canonical tokenization: lower → strip non-[a-z0-9 ] → split ' ' →
    drop empties. Matches ShareHypePiece.java:66-68's clean-and-split and is
    reproducible in DuckDB (see sql_tokens)."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9 ]+", "")
    return F.filter(F.split(cleaned, " "), lambda w: w != "")


def sql_tokens(expr: str) -> str:
    """DuckDB twin of tokens()."""
    return (
        f"list_filter(string_split(regexp_replace(lower({expr}), "
        f"'[^a-z0-9 ]+', '', 'g'), ' '), w -> w <> '')"
    )


# -- token counting -----------------------------------------------------------

def token_stats(df: DataFrame, text: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count, BPE-ish token count, char count."""
    return df.select(
        F.col(id_col),
        F.size(tokens(F.col(text))).alias("n_tokens"),
        F.regexp_count(F.col(text), F.lit(BPE_RE)).alias("n_bpe_tokens"),
        F.length(text).alias("len_chars"),
    )


def sql_token_stats(table: str = "documents", text: str = "text",
                    id_col: str = "doc_id") -> str:
    return f"""
    SELECT {id_col},
           CAST(len({sql_tokens(text)}) AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all({text}, '{BPE_RE}')) AS INTEGER)
               AS n_bpe_tokens,
           CAST(length({text}) AS INTEGER) AS len_chars
    FROM {table}
    """


# -- quality scoring ----------------------------------------------------------

def quality_stats(df: DataFrame, text: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score. All ratios are doubles rounded to 6 dp (both engines round the
    same inputs identically).

    Perf note: HOF lambdas block Catalyst's common-subexpression
    elimination, so naive per-stat expressions re-run the tokenizer
    regex per stat. One F.aggregate pass folds (count, stopword hits,
    word-length sum) into a struct accumulator — the tokenizer runs
    ONCE per row, and CollapseProject keeps the two projections apart
    because the aggregate is non-cheap (measured ~2.5x at sf0.1)."""
    zero = F.struct(
        F.lit(0).alias("n"),
        F.lit(0).alias("stop"),
        F.lit(0).cast("long").alias("wlen"),
    )
    acc = F.aggregate(
        tokens(F.col(text)), zero,
        lambda a, w: F.struct(
            (a["n"] + 1).alias("n"),
            (a["stop"] + F.when(w.isin(*EN_STOPWORDS), 1).otherwise(0))
            .alias("stop"),
            (a["wlen"] + F.length(w)).alias("wlen"),
        ),
    )
    staged = df.select(
        F.col(id_col),
        F.length(F.col(text)).alias("_len"),
        F.length(F.regexp_replace(F.col(text), r"[a-zA-Z0-9\s]+", ""))
        .alias("_np"),
        acc.alias("_a"),
    )
    n_tok = F.col("_a.n")
    mean_wlen = (F.col("_a.wlen").cast("double")
                 / F.greatest(n_tok, F.lit(1)).cast("double"))
    stop_ratio = (F.col("_a.stop").cast("double")
                  / F.greatest(n_tok, F.lit(1)).cast("double"))
    punct_ratio = (F.col("_np").cast("double")
                   / F.greatest(F.col("_len"), F.lit(1)).cast("double"))
    return staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        round_portable(mean_wlen).alias("mean_word_len"),
        round_portable(stop_ratio).alias("stopword_ratio"),
        round_portable(punct_ratio).alias("punct_ratio"),
        round_portable(
            stop_ratio * 0.5 + (F.lit(1.0) - punct_ratio) * 0.3
            + F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.2
        ).alias("quality_score"),
    )


def sql_quality_stats(table: str = "documents", text: str = "text",
                      id_col: str = "doc_id") -> str:
    stop_list = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    toks = sql_tokens(text)
    return expand_round6(f"""
    WITH t AS (
      SELECT {id_col}, {text} AS _txt, {toks} AS _toks FROM {table}
    ), s AS (
      SELECT {id_col}, _txt,
             len(_toks) AS n_tok,
             len(list_filter(_toks, w -> w IN ({stop_list}))) AS n_stop,
             length(regexp_replace(_txt, '[a-zA-Z0-9\\s]+', '', 'g')) AS n_punct,
             CASE WHEN _toks IS NULL THEN NULL
                  ELSE list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(_toks, w -> CAST(length(w) AS BIGINT))),
                    (acc, x) -> acc + x) END AS sum_wlen
      FROM t
    )
    SELECT {id_col},
           CAST(n_tok AS INTEGER) AS n_tokens,
           ROUND6(CAST(sum_wlen AS DOUBLE) / CAST(greatest(n_tok, 1) AS DOUBLE))
               AS mean_word_len,
           ROUND6(CAST(n_stop AS DOUBLE) / CAST(greatest(n_tok, 1) AS DOUBLE))
               AS stopword_ratio,
           ROUND6(CAST(n_punct AS DOUBLE) / CAST(greatest(length(_txt), 1) AS DOUBLE))
               AS punct_ratio,
           ROUND6((CAST(n_stop AS DOUBLE) / CAST(greatest(n_tok, 1) AS DOUBLE)) * 0.5
                 + (1.0 - CAST(n_punct AS DOUBLE)
                        / CAST(greatest(length(_txt), 1) AS DOUBLE)) * 0.3
                 + least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.2)
               AS quality_score
    FROM s
    """)


# -- language ID --------------------------------------------------------------

def lang_id(df: DataFrame, text: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: count per-language stopword hits over the
    token stream; argmax with deterministic tie-break (vote desc, lang asc);
    'und' when zero votes."""
    # One aggregate pass counts every language's stopword hits in a
    # struct accumulator — the tokenizer runs once per row instead of
    # once per language (HOF lambdas defeat subexpression elimination).
    langs = list(LANG_STOPWORDS)
    zero = F.struct(*[F.lit(0).alias(f"v_{lang}") for lang in langs])
    acc = F.aggregate(
        tokens(F.col(text)), zero,
        lambda a, w: F.struct(*[
            (a[f"v_{lang}"]
             + F.when(w.isin(*LANG_STOPWORDS[lang]), 1).otherwise(0))
            .alias(f"v_{lang}")
            for lang in langs
        ]),
    )
    scored = df.select(F.col(id_col), acc.alias("_a")).select(
        F.col(id_col),
        *[F.col(f"_a.v_{lang}").alias(f"_v_{lang}") for lang in langs],
    )
    ranked = F.array_sort(
        F.array(*[
            F.struct(
                F.col(f"_v_{lang}").alias("v"),
                F.lit(lang).alias("lang"),
            )
            for lang in langs
        ]),
        # vote desc, lang asc
        lambda x, y: F.when(x["v"] > y["v"], -1)
        .when(x["v"] < y["v"], 1)
        .when(x["lang"] < y["lang"], -1)
        .when(x["lang"] > y["lang"], 1)
        .otherwise(0),
    )
    best = F.element_at(ranked, 1)
    return scored.select(
        F.col(id_col),
        F.when(best["v"] > 0, best["lang"]).otherwise("und").alias("pred_lang"),
        best["v"].alias("votes"),
    )


def sql_lang_id(table: str = "documents", text: str = "text",
                id_col: str = "doc_id") -> str:
    toks = sql_tokens(text)
    vote_cols = ",\n             ".join(
        f"len(list_filter(_toks, w -> w IN ({', '.join(repr(w) for w in ws)})))"
        f" AS v_{lang}"
        for lang, ws in LANG_STOPWORDS.items()
    )
    structs = ", ".join(
        "{'v': v_%s, 'lang': '%s'}" % (lang, lang) for lang in LANG_STOPWORDS
    )
    return f"""
    WITH t AS (SELECT {id_col}, {toks} AS _toks FROM {table}),
    v AS (SELECT {id_col},
             {vote_cols}
          FROM t),
    u AS (SELECT {id_col}, unnest([{structs}]) AS s FROM v),
    b AS (SELECT {id_col}, s FROM u
          QUALIFY row_number() OVER (PARTITION BY {id_col}
                                     ORDER BY s.v DESC, s.lang ASC) = 1)
    SELECT {id_col},
           CASE WHEN s.v > 0 THEN s.lang ELSE 'und' END AS pred_lang,
           CAST(s.v AS INTEGER) AS votes
    FROM b
    """


# -- document fingerprinting --------------------------------------------------

def fingerprint(df: DataFrame, text: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling document fingerprint:
    ``acc = (acc * 31 + md5_60bit(word) mod p) mod p`` over the token stream,
    p = 2^31-1. Word-order-sensitive (unlike bag-of-words hashes) and
    portable: both engines fold left-to-right over the same tokens, so the
    result is bit-identical. acc < 2^31, acc*31 < 2^36 — no int64 overflow."""
    toks = tokens(F.col(text))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * FINGERPRINT_BASE + md5_long(w) % MERSENNE_P)
        % MERSENNE_P,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def sql_fingerprint(table: str = "documents", text: str = "text",
                    id_col: str = "doc_id") -> str:
    toks = sql_tokens(text)
    h = sql_md5_long("w")
    return f"""
    SELECT {id_col},
           CASE WHEN {text} IS NULL THEN NULL
                ELSE list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform({toks}, w -> ({h}) % {MERSENNE_P})),
                  (acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {MERSENNE_P})
           END AS fingerprint
    FROM {table}
    """


# -- scrubbing / chunking / splitting ----------------------------------------

URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_DIGITS_RE = r"[0-9]{6,}"


def scrub(df: DataFrame, text: str = "text",
          id_col: str = "doc_id") -> DataFrame:
    """PII/noise scrubbing: URLs → <URL>, emails → <EMAIL>, long digit
    runs (phone/account numbers) → <NUM>. Map-side, order of passes
    fixed (URL first so emails inside URLs don't double-redact)."""
    t = F.col(text)
    t = F.regexp_replace(t, URL_RE, "<URL>")
    t = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, LONG_DIGITS_RE, "<NUM>")
    return df.select(
        F.col(id_col),
        t.alias("scrubbed"),
        F.md5(t).alias("scrubbed_hash"),
    )


def sql_scrub(table: str = "documents", text: str = "text",
              id_col: str = "doc_id") -> str:
    return f"""
    WITH s AS (
      SELECT {id_col},
             regexp_replace(regexp_replace(regexp_replace({text},
                 '{URL_RE}', '<URL>', 'g'),
                 '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{LONG_DIGITS_RE}', '<NUM>', 'g') AS scrubbed
      FROM {table})
    SELECT {id_col}, scrubbed, md5(scrubbed) AS scrubbed_hash FROM s
    """


def chunk(df: DataFrame, chunk_tokens: int = 64, overlap: int = 8,
          text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-size token chunks with overlap (the
    standard pretraining window): stride = chunk - overlap; one row per
    chunk with its index and token span. Map-side explode — no
    shuffle."""
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text))
    n = F.size(toks)
    n_chunks = F.when(
        n <= chunk_tokens, F.lit(1)
    ).otherwise(
        F.ceil((n - F.lit(chunk_tokens)).cast("double") / stride)
        .cast("int") + 1
    )
    return (
        df.select(F.col(id_col), toks.alias("_t"), n.alias("_n"),
                  n_chunks.alias("_nc"))
        .filter(F.col("_n") > 0)
        .select(
            id_col, "_t", "_n",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1))
            .alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * stride).cast("long").alias("tok_start"),
            F.least(F.col("chunk_idx") * stride + chunk_tokens,
                    F.col("_n")).cast("long").alias("tok_end"),
            F.concat_ws(
                " ",
                F.slice(F.col("_t"), F.col("chunk_idx") * stride + 1,
                        chunk_tokens),
            ).alias("chunk_text"),
        )
    )


def sql_chunk(table: str = "documents", chunk_tokens: int = 64,
              overlap: int = 8, text: str = "text",
              id_col: str = "doc_id") -> str:
    stride = chunk_tokens - overlap
    toks = sql_tokens(text)
    return f"""
    WITH t AS (SELECT {id_col}, {toks} AS _t FROM {table}),
    s AS (SELECT {id_col}, _t, len(_t) AS _n,
                 CASE WHEN len(_t) <= {chunk_tokens} THEN 1
                      ELSE CAST(ceil(CAST(len(_t) - {chunk_tokens} AS DOUBLE)
                                     / {stride}) AS INTEGER) + 1 END AS _nc
          FROM t WHERE len(_t) > 0),
    x AS (SELECT {id_col}, _t, _n, CAST(g.i AS INTEGER) AS chunk_idx
          FROM s, (SELECT unnest(generate_series(
                     0, (SELECT coalesce(max(_nc), 1) FROM s))) AS i) g
          WHERE g.i < s._nc)
    SELECT {id_col}, chunk_idx,
           CAST(chunk_idx * {stride} AS BIGINT) AS tok_start,
           CAST(least(chunk_idx * {stride} + {chunk_tokens}, _n) AS BIGINT)
             AS tok_end,
           array_to_string(list_slice(_t, chunk_idx * {stride} + 1,
               chunk_idx * {stride} + {chunk_tokens}), ' ') AS chunk_text
    FROM x
    """


def train_val_split(df: DataFrame, val_pct: int = 5, seed: str = "split1",
                    text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic, engine-portable train/val assignment: hash the
    content (not the id, so re-sharded corpora split identically) into
    100 buckets; bucket < val_pct → validation. No RNG, no state, any
    executor count."""
    bucket = (md5_long(F.concat(F.lit(seed), F.lit("|"), F.col(text)))
              % 100).cast("int")
    return df.select(
        F.col(id_col),
        bucket.alias("bucket"),
        F.when(bucket < val_pct, "val").otherwise("train").alias("split"),
    )


def sql_train_val_split(table: str = "documents", val_pct: int = 5,
                        seed: str = "split1", text: str = "text",
                        id_col: str = "doc_id") -> str:
    h = sql_md5_long(f"('{seed}' || '|' || {text})")
    return f"""
    SELECT {id_col},
           CAST(({h}) % 100 AS INTEGER) AS bucket,
           CASE WHEN ({h}) % 100 < {val_pct} THEN 'val' ELSE 'train' END
             AS split
    FROM {table}
    """


# -- repetition signals (Gopher-style quality filters) ------------------------

def repetition_stats(df: DataFrame, text: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Repetition quality signals per Rae et al., "Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher" (2021),
    §A1.1: fraction of 2-grams taken by the single most frequent
    2-gram, and fraction of 3-grams occurring more than once. Docs with
    < 3 tokens (no 3-gram) are excluded — same rule in the SQL twin.

    Scale shape: one explode + two doc-keyed partial aggregations —
    combiner-friendly, uniform keys, no skew."""
    from .dedup import shingles_exploded

    def frac(n: int, agg_top: bool) -> DataFrame:
        grams = shingles_exploded(df, text, id_col, n)
        counts = grams.groupBy(id_col, "shingle").agg(
            F.count(F.lit(1)).alias("_c"))
        if agg_top:
            return counts.groupBy(id_col).agg(
                (F.max("_c").cast("double")
                 / F.sum("_c").cast("double")).alias("_f"))
        return counts.groupBy(id_col).agg(
            (F.sum(F.when(F.col("_c") >= 2, F.col("_c")).otherwise(0))
             .cast("double") / F.sum("_c").cast("double")).alias("_f"))

    two = frac(2, True).withColumnRenamed("_f", "top_2gram_frac")
    three = frac(3, False).withColumnRenamed("_f", "dup_3gram_frac")
    return two.join(three, id_col).select(
        F.col(id_col),
        round_portable(F.col("top_2gram_frac")).alias("top_2gram_frac"),
        round_portable(F.col("dup_3gram_frac")).alias("dup_3gram_frac"),
    )


def sql_repetition_stats(table: str = "documents", text: str = "text",
                         id_col: str = "doc_id") -> str:
    def all_grams(n: int) -> str:
        # NON-distinct n-gram stream (dedup's sql_shingles list_distincts
        # for set semantics; repetition needs every occurrence)
        toks = sql_tokens(text)
        return (
            f"list_transform("
            f"generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
            f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
        )

    def frac(n: int, agg_top: bool) -> str:
        num = ("CAST(max(_c) AS DOUBLE)" if agg_top else
               "CAST(sum(CASE WHEN _c >= 2 THEN _c ELSE 0 END) AS DOUBLE)")
        return f"""
        (SELECT {id_col}, {num} / CAST(sum(_c) AS DOUBLE) AS _f
         FROM (SELECT {id_col}, _ng, count(*) AS _c
               FROM (SELECT {id_col}, unnest({all_grams(n)}) AS _ng
                     FROM {table})
               GROUP BY {id_col}, _ng)
         GROUP BY {id_col})
        """

    return expand_round6(f"""
    SELECT a.{id_col},
           ROUND6(a._f) AS top_2gram_frac,
           ROUND6(b._f) AS dup_3gram_frac
    FROM {frac(2, True)} a JOIN {frac(3, False)} b USING ({id_col})
    """)


# -- Gopher document-rule panel (Rae et al. 2021, §A1.1) ----------------------

# The paper's rule list keyed to a small common-word vocabulary; the synthetic
# corpus has its own vocabulary, so the list mixes true English stopwords with
# corpus-frequent function words to keep the rule discriminative (the SHAPE —
# "contains >= 2 distinct words from a fixed small list" — is the paper's).
GOPHER_COMMON_WORDS = ("the", "a", "and", "of", "to", "data", "in", "is")


def gopher_rules(df: DataFrame, text: str = "text",
                 id_col: str = "doc_id", min_words: int = 20,
                 max_words: int = 100_000) -> DataFrame:
    """Gopher document-level quality-rule panel (Rae et al. 2021,
    §A1.1): per-document boolean verdicts for word count, mean word
    length, symbol-to-word ratio (# and ellipsis), alphabetic-word
    ratio, common-word presence, bullet-line and ellipsis-line
    fractions, plus the conjunctive keep flag.

    EVERY ratio threshold compares in the integer domain by
    cross-multiplication (e.g. mean word length in [3,10] is
    3·n ≤ Σlen ≤ 10·n) — no float ever forms, so the verdicts are
    bit-portable across engines and reduction orders. One
    F.aggregate pass folds (count, length sum, alphabetic count,
    common-word bitmask) into a struct accumulator so the tokenizer
    regex runs ONCE per row (same CSE rationale as quality_stats);
    distinct-common-word count is bit_count of the OR-folded mask.
    Pure map-side — no shuffle, no UDF; at 100 TB this is a scan."""
    zero = F.struct(
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("wlen"),
        F.lit(0).cast("long").alias("alpha"),
        F.lit(0).cast("long").alias("mask"),
    )
    # chained CASE mapping each common word to a distinct bit
    def _bit(w_col):
        expr = F.lit(0).cast("long")
        for i, w in enumerate(GOPHER_COMMON_WORDS):
            expr = F.when(w_col == w, F.lit(1 << i).cast("long")).otherwise(expr)
        return expr

    acc = F.aggregate(
        tokens(F.col(text)), zero,
        lambda a, w: F.struct(
            (a["n"] + 1).alias("n"),
            (a["wlen"] + F.length(w)).alias("wlen"),
            (a["alpha"] + F.when(w.rlike("[a-z]"), 1).otherwise(0))
            .alias("alpha"),
            a["mask"].bitwiseOR(_bit(w)).alias("mask"),
        ),
    )
    lines = F.split(F.col(text), "\n")
    staged = df.select(
        F.col(id_col),
        acc.alias("_a"),
        (F.length(text) - F.length(F.replace(F.col(text), F.lit("#"),
                                             F.lit("")))).alias("_hash"),
        ((F.length(text) - F.length(F.replace(F.col(text), F.lit("..."),
                                              F.lit("")))) / 3)
        .cast("long").alias("_ellip"),
        F.size(lines).alias("_nl"),
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]")))
        .alias("_bul"),
        F.size(F.filter(lines, lambda l: F.rtrim(l).like("%...")
                        | F.rtrim(l).like("%…"))).alias("_el"),
    )
    n, wlen = F.col("_a.n"), F.col("_a.wlen")
    alpha, mask = F.col("_a.alpha"), F.col("_a.mask")
    sym = F.col("_hash") + F.col("_ellip")
    flag = lambda c: F.coalesce(c, F.lit(False))
    r_wc = flag((n >= min_words) & (n <= max_words))
    r_mwl = flag((F.lit(3) * n <= wlen) & (wlen <= F.lit(10) * n))
    r_sym = flag(F.lit(10) * sym <= n)
    r_alpha = flag(F.lit(5) * alpha >= F.lit(4) * n)
    r_common = flag(F.bit_count(mask) >= 2)
    r_bul = flag(F.lit(10) * F.col("_bul") <= F.lit(9) * F.col("_nl"))
    r_el = flag(F.lit(10) * F.col("_el") <= F.lit(3) * F.col("_nl"))
    return staged.select(
        F.col(id_col),
        n.alias("n_words"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_sym.alias("r_symbol_ratio"),
        r_alpha.alias("r_alpha_words"),
        r_common.alias("r_common_words"),
        r_bul.alias("r_bullet_lines"),
        r_el.alias("r_ellipsis_lines"),
        (r_wc & r_mwl & r_sym & r_alpha & r_common & r_bul & r_el)
        .alias("keep"),
    )


def sql_gopher_rules(table: str = "documents", text: str = "text",
                     id_col: str = "doc_id", min_words: int = 20,
                     max_words: int = 100_000) -> str:
    toks = sql_tokens(text)
    words = ", ".join(f"'{w}'" for w in GOPHER_COMMON_WORDS)
    return f"""
    WITH t AS (
      SELECT {id_col}, {text} AS _txt, {toks} AS _toks,
             string_split({text}, chr(10)) AS _lines
      FROM {table}
    ), s AS (
      SELECT {id_col},
        CAST(len(_toks) AS BIGINT) AS n,
        CAST(coalesce(list_sum(list_transform(_toks,
             w -> CAST(length(w) AS BIGINT))), 0) AS BIGINT) AS wlen,
        CAST(len(list_filter(_toks,
             w -> regexp_matches(w, '[a-z]'))) AS BIGINT) AS alpha,
        CAST(len(list_intersect(list_distinct(_toks),
             [{words}])) AS BIGINT) AS ncommon,
        CAST(length(_txt) - length(replace(_txt, '#', ''))
             + (length(_txt) - length(replace(_txt, '...', ''))) // 3
             AS BIGINT) AS sym,
        CAST(len(_lines) AS BIGINT) AS nl,
        CAST(len(list_filter(_lines,
             l -> regexp_matches(ltrim(l), '^[-*•]'))) AS BIGINT) AS bul,
        CAST(len(list_filter(_lines,
             l -> rtrim(l) LIKE '%...' OR rtrim(l) LIKE '%…'))
             AS BIGINT) AS el
      FROM t
    )
    SELECT {id_col}, n AS n_words,
      coalesce(n >= {min_words} AND n <= {max_words}, FALSE)
        AS r_word_count,
      coalesce(3 * n <= wlen AND wlen <= 10 * n, FALSE)
        AS r_mean_word_len,
      coalesce(10 * sym <= n, FALSE) AS r_symbol_ratio,
      coalesce(5 * alpha >= 4 * n, FALSE) AS r_alpha_words,
      coalesce(ncommon >= 2, FALSE) AS r_common_words,
      coalesce(10 * bul <= 9 * nl, FALSE) AS r_bullet_lines,
      coalesce(10 * el <= 3 * nl, FALSE) AS r_ellipsis_lines,
      coalesce(n >= {min_words} AND n <= {max_words}, FALSE)
        AND coalesce(3 * n <= wlen AND wlen <= 10 * n, FALSE)
        AND coalesce(10 * sym <= n, FALSE)
        AND coalesce(5 * alpha >= 4 * n, FALSE)
        AND coalesce(ncommon >= 2, FALSE)
        AND coalesce(10 * bul <= 9 * nl, FALSE)
        AND coalesce(10 * el <= 3 * nl, FALSE) AS keep
    FROM s
    """


# -- corpus-level line dedup (CCNet / RefinedWeb boilerplate removal) ---------

def line_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id",
               min_dup: int = 2) -> DataFrame:
    """Corpus-level line deduplication (Wenzek et al. 2020 "CCNet" §3;
    Penedo et al. 2023 "RefinedWeb" §3.4): any trimmed line occurring
    in >= ``min_dup`` documents-worth of lines across the WHOLE corpus
    is boilerplate (headers, cookie banners, nav text) and is dropped
    from every document; empty lines are dropped unconditionally and
    never counted. Returns (doc_id, n_lines, n_kept, text_clean) with
    surviving lines re-joined in original order — docs whose text is
    NULL come back with zero counts and empty text so row identity is
    preserved.

    Scale shape: posexplode (map-side) → one groupBy on the line for
    corpus counts (map-side combine absorbs the skew of very frequent
    boilerplate lines) → the DUP SET ONLY (count >= min_dup, far
    smaller than the line fact) joins back — broadcast when small,
    AQE otherwise — then one doc-keyed rebuild. The rebuild collects
    (index, line) structs per doc; struct sort_array orders by index
    without a window, so the only per-doc state is the doc's own
    lines — same grain as reading the document."""
    lines = (
        df.select(F.col(id_col),
                  F.posexplode(F.split(F.col(text), "\n"))
                  .alias("_idx", "_raw"))
        .select(F.col(id_col), "_idx", F.trim(F.col("_raw")).alias("_ln"))
        .filter(F.col("_ln") != "")
    )
    dups = (lines.groupBy("_ln").agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") >= min_dup).select("_ln"))
    kept = lines.join(dups, "_ln", "left_anti")
    per_doc_tot = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("_idx"), F.col("_ln")))),
                     lambda s: s["_ln"]),
                 "\n").alias("text_clean"))
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc_tot, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def sql_line_dedup(table: str = "documents", text: str = "text",
                   id_col: str = "doc_id", min_dup: int = 2) -> str:
    return f"""
    WITH raw AS (
      SELECT {id_col},
             unnest(list_transform(
                 generate_series(1, len(string_split({text}, chr(10)))),
                 i -> {{'i': i,
                        'ln': trim(string_split({text}, chr(10))[i])}}))
               AS _e
      FROM {table}
    ), l AS (
      SELECT {id_col}, _e.i AS _idx, _e.ln AS _ln FROM raw
      WHERE _e.ln <> ''
    ), dup AS (
      SELECT _ln FROM l GROUP BY _ln HAVING count(*) >= {min_dup}
    ), kept AS (
      SELECT {id_col}, _idx, _ln FROM l
      WHERE _ln NOT IN (SELECT _ln FROM dup)
    ), tot AS (
      SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_lines
      FROM l GROUP BY {id_col}
    ), reb AS (
      SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_kept,
             string_agg(_ln, chr(10) ORDER BY _idx) AS text_clean
      FROM kept GROUP BY {id_col}
    )
    SELECT d.{id_col},
           coalesce(t.n_lines, 0) AS n_lines,
           coalesce(r.n_kept, 0) AS n_kept,
           coalesce(r.text_clean, '') AS text_clean
    FROM {table} d
    LEFT JOIN tot t ON t.{id_col} = d.{id_col}
    LEFT JOIN reb r ON r.{id_col} = d.{id_col}
    """


# -- cross-document duplicated-n-gram fraction (Lee et al. 2021) --------------

def dup_ngram_fraction(df: DataFrame, text: str = "text",
                       id_col: str = "doc_id", n: int = 5) -> DataFrame:
    """Cross-document duplicated-n-gram signal (Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better";
    RefinedWeb §3.4 uses the same per-doc fraction as a filter): for
    each document, the fraction of its n-gram OCCURRENCES whose n-gram
    also appears in at least one OTHER document, plus a keep verdict
    at the 20% threshold compared in the integer domain
    (5·n_dup ≤ n_grams). Unlike repetition_stats (within-doc) this is
    a CORPUS-level signal — the memorization risk Lee et al. measure.

    Scale shape: one shingle explode, one shingle-keyed count-distinct
    (map-side partials), then the DUP SET ONLY joins back via
    left_semi — the fact never carries counts, and docs shorter than
    n tokens reattach with zero counts."""
    from .dedup import shingles_exploded

    grams = shingles_exploded(df, text, id_col, n)
    dup = (grams.groupBy("shingle")
           .agg(F.count_distinct(id_col).alias("_d"))
           .filter(F.col("_d") >= 2).select("shingle"))
    tot = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    dupocc = (grams.join(dup, "shingle", "left_semi")
              .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup")))
    return (
        df.select(F.col(id_col))
        .join(tot, id_col, "left")
        .join(dupocc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup", F.lit(0)).alias("n_dup"),
            round_portable(
                F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("n_grams"), F.lit(0)),
                             F.lit(1)).cast("double")).alias("dup_frac"),
            (F.lit(5) * F.coalesce(F.col("n_dup"), F.lit(0))
             <= F.coalesce(F.col("n_grams"), F.lit(0))).alias("keep"),
        )
    )


def sql_dup_ngram_fraction(table: str = "documents", text: str = "text",
                           id_col: str = "doc_id", n: int = 5) -> str:
    toks = sql_tokens(text)
    all_grams = (
        f"list_transform("
        f"generate_series(1, greatest(len({toks}) - {n - 1}, 0)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))"
    )
    return expand_round6(f"""
    WITH g AS (
      SELECT {id_col}, unnest({all_grams}) AS _ng FROM {table}
    ), dup AS (
      SELECT _ng FROM g GROUP BY _ng
      HAVING count(DISTINCT {id_col}) >= 2
    ), tot AS (
      SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_grams
      FROM g GROUP BY {id_col}
    ), docc AS (
      SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_dup
      FROM g WHERE _ng IN (SELECT _ng FROM dup)
      GROUP BY {id_col}
    )
    SELECT d.{id_col},
           coalesce(t.n_grams, 0) AS n_grams,
           coalesce(o.n_dup, 0) AS n_dup,
           ROUND6(CAST(coalesce(o.n_dup, 0) AS DOUBLE)
                  / CAST(greatest(coalesce(t.n_grams, 0), 1) AS DOUBLE))
               AS dup_frac,
           5 * coalesce(o.n_dup, 0) <= coalesce(t.n_grams, 0) AS keep
    FROM {table} d
    LEFT JOIN tot t ON t.{id_col} = d.{id_col}
    LEFT JOIN docc o ON o.{id_col} = d.{id_col}
    """)


# -- deterministic stratified sampling (mixture weights) ----------------------

def stratified_sample(df: DataFrame, strata_col: str, rates: dict[str, float],
                      seed: str = "mix1", text: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum sampling — the domain-mixture step of a
    pretraining pipeline (sample stratum s at rate rates[s]): keep a doc
    iff hash(seed|content) mod 1e6 < rate*1e6. Content-keyed like
    train_val_split, so re-sharded corpora sample identically; map-side,
    no shuffle, any executor count. Strata without a configured rate are
    dropped (rate 0)."""
    h = md5_long(F.concat(F.lit(seed), F.lit("|"), F.col(text))) % 1000000
    rate = None
    for s, r in rates.items():
        cond = F.col(strata_col) == s
        rate = (F.when(cond, int(r * 1000000)) if rate is None
                else rate.when(cond, int(r * 1000000)))
    rate = rate.otherwise(0)
    return (
        df.withColumn("_h", h)
        .filter(F.col("_h") < rate)
        .select(F.col(id_col), F.col(strata_col).alias("stratum"),
                F.col("_h").alias("sample_key"))
    )


def sql_stratified_sample(table: str, strata_col: str,
                          rates: dict[str, float], seed: str = "mix1",
                          text: str = "text",
                          id_col: str = "doc_id") -> str:
    h = sql_md5_long(f"('{seed}' || '|' || {text})")
    whens = " ".join(f"WHEN '{s}' THEN {int(r * 1000000)}"
                     for s, r in rates.items())
    return f"""
    SELECT {id_col}, {strata_col} AS stratum,
           ({h}) % 1000000 AS sample_key
    FROM {table}
    WHERE ({h}) % 1000000 < CASE {strata_col} {whens} ELSE 0 END
    """


# -- corpus vocabulary --------------------------------------------------------

def vocab_topk(df: DataFrame, k: int = 100, text: str = "text") -> DataFrame:
    """Corpus-wide top-k token frequency table (vocabulary building):
    explode → count per token (map-side combine on uniform token keys)
    → global top-k via TakeOrdered (no full sort at scale). Ties break
    on the token string so the set is deterministic."""
    counts = (
        df.select(F.explode(tokens(F.col(text))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
        .select("token", "n")
    )


def sql_vocab_topk(table: str, k: int = 100, text: str = "text") -> str:
    toks = sql_tokens(text)
    return f"""
    SELECT token, n FROM (
      SELECT _w AS token, count(*) AS n
      FROM (SELECT unnest({toks}) AS _w FROM {table})
      GROUP BY 1)
    ORDER BY n DESC, token ASC LIMIT {k}
    """


# -- BM25 keyword search ------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Okapi BM25 top-k keyword search (Robertson/Walker '94) — the
    lexical retrieval twin of the embedding ANN operators, over the
    shared canonical tokenizer.

    Scale shape: term frequencies filter to the query's terms BEFORE
    any shuffle (the per-doc tf table is |query| rows per matching doc,
    not |vocab|); document frequencies and corpus stats are tiny
    aggregates broadcast back; per-term contributions sum as integer
    micros so addition order can't break cross-engine parity; top-k is
    a TakeOrdered, never a full sort.
    """
    toks = docs.select(F.col(id_col),
                       F.explode(tokens(F.col(text))).alias("term"))
    dl = docs.select(F.col(id_col),
                     F.size(tokens(F.col(text))).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("dl").alias("sum_dl"))
    tf = (toks.filter(F.col("term").isin(list(query_terms)))
          .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")))
    dfx = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = (tf.join(F.broadcast(dfx), "term")
         .join(dl, id_col)
         .crossJoin(F.broadcast(stats)))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5) + 1.0)
    contrib = (idf * (F.col("tf") * (BM25_K1 + 1.0))
               / (F.col("tf") + BM25_K1
                  * (1.0 - BM25_B + BM25_B * F.col("dl") / avgdl)))
    scored = j.groupBy(id_col).agg(
        (F.sum(F.floor(contrib * 1000000.0 + 0.5).cast("long"))
         .cast("double") / 1000000.0).alias("score"))
    return (scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k))


def sql_bm25_topk(table: str, query_terms: list[str], k: int = 10,
                  text: str = "text", id_col: str = "doc_id") -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    toks = sql_tokens(text)
    contrib = (
        f"(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)"
        f" * (t.tf * ({BM25_K1} + 1.0))"
        f" / (t.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * l.dl"
        f" / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))"
    )
    return f"""
    WITH tok AS (SELECT {id_col}, unnest({toks}) AS term FROM {table}),
    dl AS (SELECT {id_col}, len({toks}) AS dl FROM {table}),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
    tf AS (SELECT {id_col}, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok WHERE term IN ({terms}) GROUP BY 1, 2),
    dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT t.{id_col},
             CAST(sum(CAST(floor({contrib} * 1000000.0 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1000000.0 AS score
      FROM tf t
      JOIN dfx d ON d.term = t.term
      JOIN dl l ON l.{id_col} = t.{id_col}
      CROSS JOIN stats s
      GROUP BY 1)
    SELECT {id_col}, score FROM scored
    ORDER BY score DESC, {id_col} ASC LIMIT {k}
    """


# -- character-trigram surprisal (CCNet-style LM quality filter) -------------

def trigram_surprisal(df: DataFrame, text: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document mean character-trigram surprisal against an add-one
    model trained on the corpus itself — the portable form of CCNet's
    perplexity filter (Wenzek et al., "CCNet: Extracting High Quality
    Monolingual Datasets from Web Crawl Data", LREC 2020): gibberish
    and boilerplate score high because their trigrams are corpus-rare.

    Engine-portability is why surprisal is QUANTIZED TO INTEGER BITS:
    per-trigram -log2 P would be a float whose per-doc SUM depends on
    engine reduction order. Instead each trigram scores
    floor(log2((N+V)/(c+1))) computed exactly in integers as
    bitlen((N+V) div (c+1)) - 1 (valid since floor(log2(floor(q))) =
    floor(log2(q)) for q >= 1), so the per-doc sum is exact int64 and
    only the final mean divides in IEEE — bit-identical cross-engine.

    Scale shape: trigram explode is map-side, then occurrences collapse
    to per-(doc, trigram) COUNTS before anything joins — the model join
    and the doc aggregation handle distinct pairs, not occurrences
    (~26% faster at sf0.1, and the gap grows with repetition); the
    model + the two scalar totals broadcast. The weighted mean
    sum(bits*k)/sum(k) is value-identical to the per-occurrence mean.

    r17 (guide §2.3): the model aggregates STRAIGHT at trigram grain
    from the occurrence stream — its map-side partial collapses each
    task to its distinct-gram cardinality, so the model path never
    pays the (doc, trigram)-grain exchange it previously re-ran
    (sum of per-doc counts == direct occurrence count, parity-checked
    row-exact at sf0.1; isolated min 2.89 -> 2.68 s interleaved).
    """
    tri = df.filter(F.length(text) >= 3).select(
        F.col(id_col),
        F.explode(F.expr(
            f"transform(sequence(1, length({text}) - 2), "
            f"i -> substring({text}, i, 3))")).alias("_tri"))
    # NOT persisted (r17 measurement): tc is consumed twice (model
    # aggregate + scored join), but both consumers partial-aggregate
    # map-side, so the recompute is two cheap explode passes while a
    # forced persist materializes the full (doc, trigram, k) pair set
    # — measured 3.2 -> 5.2 s at sf0.1. The size gate's verdict
    # (skip) is correct here.
    tc = tri.groupBy(id_col, "_tri").agg(F.count(F.lit(1)).alias("_k"))
    model = tri.groupBy("_tri").agg(F.count(F.lit(1)).alias("_c"))
    totals = model.agg(F.sum("_c").alias("_N"),
                       F.count(F.lit(1)).alias("_V"))
    scored = (
        tc.join(F.broadcast(model), "_tri")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col), F.col("_k"),
            (F.length(F.bin(F.expr("(_N + _V) div (_c + 1)"))) - 1)
            .cast("long").alias("_bits"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("_k").alias("n_trigrams"),
        round_portable(F.sum(F.col("_bits") * F.col("_k")).cast("double")
                       / F.sum("_k").cast("double"))
        .alias("avg_surprisal_bits"))


def sql_trigram_surprisal(table: str = "documents", text: str = "text",
                          id_col: str = "doc_id") -> str:
    return f"""
    WITH _tri AS (
      SELECT {id_col},
             unnest(list_transform(generate_series(1, length({text}) - 2),
                                   i -> substr({text}, CAST(i AS INTEGER),
                                               3))) AS _tri
      FROM {table}
      WHERE length({text}) >= 3
    ),
    _tc AS (
      SELECT {id_col}, _tri, CAST(count(*) AS BIGINT) AS _k
      FROM _tri GROUP BY {id_col}, _tri
    ),
    _model AS (
      SELECT _tri, CAST(sum(_k) AS BIGINT) AS _c FROM _tc GROUP BY _tri
    ),
    _tot AS (
      SELECT CAST(sum(_c) AS BIGINT) AS _N,
             CAST(count(*) AS BIGINT) AS _V
      FROM _model
    ),
    _scored AS (
      SELECT t.{id_col}, t._k,
             length(bin((_N + _V) // (_c + 1))) - 1 AS _bits
      FROM _tc t JOIN _model USING (_tri) CROSS JOIN _tot
    )
    SELECT {id_col}, CAST(sum(_k) AS BIGINT) AS n_trigrams,
           ROUND6(CAST(sum(_bits * _k) AS DOUBLE)
                  / CAST(sum(_k) AS DOUBLE)) AS avg_surprisal_bits
    FROM _scored GROUP BY {id_col}
    """


# -- per-document character entropy (model-free gibberish signal) ------------

def char_entropy(df: DataFrame, text: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document character-distribution entropy in QUANTIZED INTEGER
    BITS — the model-free complement to ``trigram_surprisal``: surprisal
    scores a doc against a corpus LM (needs a model join), entropy
    scores each doc against ITSELF, so it is computable in one
    map-side pass with NO shuffle at all — the cheapest first-line
    gibberish/boilerplate signal a 100 TB pipeline can run (repeated-
    char spam scores ~0 bits; base64/random noise scores near
    log2(charset)).

    Exactness: per char c with count k_c of n total,
    self-information is quantized floor(log2 n) - floor(log2 k_c) via
    the integer bitlen spelling (length(bin(x)) - 1 — the
    surprisal/DSIR rule), each term weighted by k_c and summed in
    int64; only the final per-char mean divides in IEEE. No
    transcendental, no float accumulation, bit-identical cross-engine.

    Scale shape: pure per-row pass over the documents scan —
    embarrassingly parallel, zero shuffle, zero joins. The r17 form
    is a numpy Arrow kernel (guide §4.2): the JVM expression ladder
    (naive per-distinct-char HOF 4.2 s → split + array_sort +
    run-length aggregate fold 1.6 s at sf0.1) bottomed out on
    materializing one single-character UTF8String per character
    (~1.5M tiny allocations per pass); the kernel instead counts
    UTF-32 code points with np.unique — identical code-point grain
    to Spark's split('') (pinned against a pure-Python bruteforce by
    test_char_entropy_matches_bruteforce over multibyte/empty/NULL
    corpora).

    Exactness is unchanged because every op is integer or replayed
    IEEE: counts are exact int64, bits(x) = floor(log2 x) comes from
    np.frexp's exponent (exact for any count < 2^53), the weighted
    sum accumulates in int64, and the single avg division + portable
    rounding replays round_portable's op order ((e/n)*1e6 + 0.5,
    floor, /1e6 — floor == x - pmod(x,1) here since x >= 0.5). NULL
    text rows keep row identity with NULL metrics (degenerate-corpus
    contract); both engines treat '' as one ''-symbol doc scoring 0
    bits.

    Returns (doc_id, n_chars, n_distinct, entropy_bits,
    avg_bits_per_char)."""
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    id_field = df.schema[id_col]
    out_schema = StructType([
        StructField(id_col, id_field.dataType, id_field.nullable),
        StructField("n_chars", LongType()),
        StructField("n_distinct", LongType()),
        StructField("entropy_bits", LongType()),
        StructField("avg_bits_per_char", DoubleType()),
    ])

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            tbl = pa.Table.from_batches([batch]).combine_chunks()
            ids = tbl.column(0)
            texts = tbl.column(1).to_pylist()
            nrows = len(texts)
            n_chars = np.zeros(nrows, dtype=np.int64)
            nd = np.zeros(nrows, dtype=np.int64)
            ent = np.zeros(nrows, dtype=np.int64)
            avg = np.zeros(nrows, dtype=np.float64)
            isnull = np.zeros(nrows, dtype=bool)
            for i, t in enumerate(texts):
                if t is None:
                    isnull[i] = True
                    continue
                n_chars[i] = len(t)
                if t:
                    cps = np.frombuffer(
                        t.encode("utf-32-le"), dtype=np.uint32)
                    counts = np.unique(cps, return_counts=True)[1]
                    n = cps.size
                else:
                    # split('') -> [''] in both engines: one symbol
                    counts = np.ones(1, dtype=np.int64)
                    n = 1
                nd[i] = counts.size
                kbits = np.frexp(counts.astype(np.float64))[1] - 1
                e = (n * (np.frexp(float(n))[1] - 1)
                     - int((counts * kbits).sum()))
                ent[i] = e
                x = (e / n) * 1000000.0 + 0.5
                avg[i] = np.floor(x) / 1000000.0
            yield pa.RecordBatch.from_arrays(
                [ids.combine_chunks(),
                 pa.array(n_chars, type=pa.int64(), mask=isnull),
                 pa.array(nd, type=pa.int64(), mask=isnull),
                 pa.array(ent, type=pa.int64(), mask=isnull),
                 pa.array(avg, type=pa.float64(), mask=isnull)],
                names=[id_col, "n_chars", "n_distinct",
                       "entropy_bits", "avg_bits_per_char"])

    return df.select(F.col(id_col), F.col(text)).mapInArrow(
        kernel, schema=out_schema)


def sql_char_entropy(table: str = "documents", text: str = "text",
                     id_col: str = "doc_id") -> str:
    """DuckDB twin of ``char_entropy``: same split, distinct set,
    counts, integer-bits terms, int64 sum, final IEEE mean."""
    return f"""
    WITH _ce_a AS (
      SELECT {id_col}, CAST(length({text}) AS BIGINT) AS n_chars,
             string_split({text}, '') AS arr
      FROM {table}),
    _ce_d AS (
      SELECT {id_col}, n_chars, arr, list_distinct(arr) AS dist,
             CAST(len(arr) AS BIGINT) AS n
      FROM _ce_a),
    _ce_c AS (
      SELECT {id_col}, n_chars, n,
             CAST(len(dist) AS BIGINT) AS n_distinct,
             list_transform(dist, c ->
               CAST(len(list_filter(arr, x -> x = c)) AS BIGINT)) AS ks
      FROM _ce_d),
    _ce_e AS (
      -- NULL-text guard: list_prepend(0, NULL) fabricates [0] in
      -- DuckDB (the round-8 fold-oracle trap), which would turn a
      -- NULL entropy into 0 only on this side
      SELECT {id_col}, n_chars, n_distinct, n,
             CASE WHEN ks IS NULL THEN NULL ELSE
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(ks, k -> k * CAST(
                   (length(bin(n)) - 1) - (length(bin(k)) - 1)
                   AS BIGINT))),
                 (acc, x) -> acc + x) AS BIGINT) END AS entropy_bits
      FROM _ce_c)
    SELECT {id_col}, n_chars, n_distinct, entropy_bits,
           ROUND6(CAST(entropy_bits AS DOUBLE) / CAST(n AS DOUBLE))
             AS avg_bits_per_char
    FROM _ce_e
    """


# -- temperature-based source mixing (data-mixing resample) -------------------

def temperature_mix_report(df: DataFrame, source_col: str = "source",
                           text: str = "text", seed: str = "mix1",
                           budget_div: int = 2) -> DataFrame:
    """Temperature-resampled domain mixture at tau = 0.5 — the
    data-mixing step that upweights small sources (target share of
    source s proportional to sqrt(n_s); cf. multilingual sampling in
    Devlin et al. 2019 / exam-mixture weighting in Raffel et al. 2020
    (T5), public-definition re-derivation). Budget = total // budget_div
    docs kept.

    Portability is the design constraint: tau = 0.5 EXACTLY because
    IEEE sqrt is correctly rounded in both engines while pow() is not;
    the weight sum is quantized to integer micro-units before summation
    so reduction order can't drift; the keep threshold is a ppm integer
    compared against the same content-hash ppm as stratified_sample, so
    re-sharded corpora keep identical docs. Scale shape: one tiny
    per-source aggregate (|sources| rows) broadcasts back; the keep
    filter is map-side; the report is one more |sources| aggregation.

    Output per source: n_docs, weight_micro, keep_ppm, n_kept.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    # integer micro-weights: sqrt is correctly rounded, floor-quantize
    counts = counts.withColumn(
        "_w", F.floor(F.sqrt(F.col("_n").cast("double"))
                      * F.lit(1000000.0) + F.lit(0.5)).cast("long"))
    tot = counts.agg(F.sum("_n").alias("_total"),
                     F.sum("_w").alias("_totw"))
    # identical op sequence in the SQL twin: tgt = (B * w) / totw;
    # rate = tgt / n; ppm = min(1e6, floor(rate * 1e6))
    ppm = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("_B", F.expr(f"_total div {budget_div}"))
        .withColumn(
            "_ppm",
            F.least(
                F.lit(1000000).cast("long"),
                F.floor(F.col("_B").cast("double")
                        * F.col("_w").cast("double")
                        / F.col("_totw").cast("double")
                        / F.col("_n").cast("double")
                        * F.lit(1000000.0)).cast("long")))
        .select(source_col, "_n", "_w", "_ppm")
    )
    h = md5_long(F.concat(F.lit(seed), F.lit("|"), F.col(text))) % 1000000
    kept = (
        df.select(F.col(source_col), h.alias("_h"))
        .join(F.broadcast(ppm), source_col)
        # NULL text hashes to NULL: coalesce the keep flag to 0 so an
        # all-NULL source yields n_kept = 0 (matching the SQL twin's
        # CASE ... ELSE 0), not a NULL sum.
        .withColumn("_keep", F.coalesce(
            (F.col("_h") < F.col("_ppm")).cast("int"), F.lit(0)))
        .groupBy(source_col, "_n", "_w", "_ppm")
        .agg(F.sum("_keep").alias("n_kept"))
    )
    return kept.select(
        F.col(source_col),
        F.col("_n").alias("n_docs"),
        F.col("_w").alias("weight_micro"),
        F.col("_ppm").alias("keep_ppm"),
        F.col("n_kept"))


def sql_temperature_mix_report(table: str = "documents",
                               source_col: str = "source",
                               text: str = "text", seed: str = "mix1",
                               budget_div: int = 2) -> str:
    h = sql_md5_long(f"('{seed}' || '|' || {text})")
    return f"""
    WITH _tm_counts AS (
      SELECT {source_col}, count(*) AS _n,
             CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5)
                  AS BIGINT) AS _w
      FROM {table} GROUP BY {source_col}
    ),
    _tm_tot AS (
      SELECT CAST(sum(_n) AS BIGINT) AS _total,
             CAST(sum(_w) AS BIGINT) AS _totw
      FROM _tm_counts
    ),
    _tm_ppm AS (
      SELECT {source_col}, _n, _w,
             least(CAST(1000000 AS BIGINT),
                   CAST(floor(CAST(_total // {budget_div} AS DOUBLE)
                              * CAST(_w AS DOUBLE)
                              / CAST(_totw AS DOUBLE)
                              / CAST(_n AS DOUBLE)
                              * 1000000.0) AS BIGINT)) AS _ppm
      FROM _tm_counts CROSS JOIN _tm_tot
    )
    SELECT d.{source_col}, p._n AS n_docs, p._w AS weight_micro,
           p._ppm AS keep_ppm,
           CAST(sum(CASE WHEN ({h}) % 1000000 < p._ppm
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM {table} d JOIN _tm_ppm p ON p.{source_col} = d.{source_col}
    GROUP BY d.{source_col}, p._n, p._w, p._ppm
    """


# -- DSIR importance weights (domain-targeted data selection) -----------------

def dsir_weights(df: DataFrame, target_pred: Column, text: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document DSIR importance weight (Xie et al., "Data Selection
    for Language Models via Importance Resampling", NeurIPS 2023):
    log p_target(doc)/p_raw(doc) under bag-of-unigram models with
    add-one smoothing, where the TARGET model trains on the rows
    matching ``target_pred`` (the in-domain sample) and the RAW model
    on the whole corpus. High weight = looks like the target domain —
    the score DSIR resamples by when carving a target-like subset out
    of a web-scale crawl.

    Portability is the trigram-surprisal trick applied twice: each
    token contributes bits_raw - bits_target where
    bits = floor(log2((N + V) / (c + 1))) computed EXACTLY in integers
    as bitlen((N + V) div (c + 1)) - 1, so the per-doc sum is exact
    int64 and no float ever accumulates (log p_t/p_r = bits_r - bits_t
    in the quantized domain). V is the RAW vocabulary for both models
    (shared feature space, as in the paper's hashed n-gram estimator);
    target-absent tokens smooth to c = 0.

    Scale shape: tokenize + explode map-side; occurrences collapse to
    per-(doc, token) counts BEFORE any join; both models and the two
    scalar totals broadcast (vocabulary-bounded); one final per-doc
    aggregation. Docs with zero tokens drop out (no feature evidence —
    identical in both engines)."""
    from ..operators import cache

    tok = df.select(
        F.col(id_col), F.when(target_pred, 1).otherwise(0).alias("_tgt"),
        F.explode(tokens(F.col(text))).alias("_w"))
    # persist the (doc, token) counts: the raw model, target model,
    # and per-doc scoring each consume them — unpersisted, every
    # consumer re-ran the corpus tokenize+explode+groupBy
    # (persist_audit; a caller's own live caches survive this inner
    # call — maybe_persist never evicts siblings)
    tc = cache.maybe_persist(
        tok.groupBy(id_col, "_w").agg(
            F.count(F.lit(1)).alias("_k"), F.max("_tgt").alias("_tgt")))
    raw = tc.groupBy("_w").agg(F.sum("_k").alias("_cr"))
    tgt = (tc.filter(F.col("_tgt") == 1).groupBy("_w")
           .agg(F.sum("_k").alias("_ct")))
    model = raw.join(tgt, "_w", "left").select(
        "_w", "_cr", F.coalesce(F.col("_ct"), F.lit(0)).alias("_ct"))
    totals = model.agg(F.sum("_cr").alias("_NR"),
                       F.sum("_ct").alias("_NT"),
                       F.count(F.lit(1)).alias("_V"))
    bits_r = (F.length(F.bin(F.expr("(_NR + _V) div (_cr + 1)"))) - 1)
    bits_t = (F.length(F.bin(F.expr("(_NT + _V) div (_ct + 1)"))) - 1)
    scored = (
        tc.join(F.broadcast(model), "_w")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), F.col("_k"),
                (bits_r - bits_t).cast("long").alias("_d")))
    return scored.groupBy(id_col).agg(
        F.sum("_k").alias("n_tokens"),
        F.sum(F.col("_d") * F.col("_k")).cast("long")
        .alias("dsir_weight_bits"))


def sql_dsir_weights(table: str = "documents", target_pred: str = "",
                     text: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB twin of ``dsir_weights``: same counts, same integer bits,
    same exact int64 per-doc sums."""
    return f"""
    WITH _ds_tok AS (
      SELECT {id_col},
             CASE WHEN {target_pred} THEN 1 ELSE 0 END AS _tgt,
             unnest({sql_tokens(text)}) AS _w
      FROM {table}
    ),
    _ds_tc AS (
      SELECT {id_col}, _w, CAST(count(*) AS BIGINT) AS _k,
             CAST(max(_tgt) AS BIGINT) AS _tgt
      FROM _ds_tok GROUP BY {id_col}, _w
    ),
    _ds_raw AS (
      SELECT _w, CAST(sum(_k) AS BIGINT) AS _cr FROM _ds_tc GROUP BY _w
    ),
    _ds_tgt AS (
      SELECT _w, CAST(sum(_k) AS BIGINT) AS _ct
      FROM _ds_tc WHERE _tgt = 1 GROUP BY _w
    ),
    _ds_model AS (
      SELECT r._w, r._cr, CAST(coalesce(t._ct, 0) AS BIGINT) AS _ct
      FROM _ds_raw r LEFT JOIN _ds_tgt t ON t._w = r._w
    ),
    _ds_tot AS (
      SELECT CAST(sum(_cr) AS BIGINT) AS _NR,
             CAST(sum(_ct) AS BIGINT) AS _NT,
             CAST(count(*) AS BIGINT) AS _V
      FROM _ds_model
    ),
    _ds_scored AS (
      SELECT c.{id_col}, c._k,
             CAST((length(bin((_NR + _V) // (_cr + 1))) - 1)
                  - (length(bin((_NT + _V) // (_ct + 1))) - 1)
                  AS BIGINT) AS _d
      FROM _ds_tc c JOIN _ds_model m ON m._w = c._w CROSS JOIN _ds_tot
    )
    SELECT {id_col}, CAST(sum(_k) AS BIGINT) AS n_tokens,
           CAST(sum(_d * _k) AS BIGINT) AS dsir_weight_bits
    FROM _ds_scored GROUP BY {id_col}
    """


def quality_nb_report(df: DataFrame, text: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Model-based quality filter: a bag-of-unigrams Naive Bayes
    classifier trained to reproduce the Gopher rule panel's keep
    verdict — the CCNet/LLaMA-style "learned quality classifier"
    axis (there a fastText model trained on Wikipedia-vs-crawl; here
    the same linear-in-token-log-ratios family, trained on the rule
    labels so the whole loop is self-contained and oracle-checkable).
    Deterministic half-split by doc id parity: even ids train, odd
    ids are scored, and the output is the test-half confusion matrix
    (actual keep x predicted keep, with doc counts and the exact
    summed score per cell) — the generalization report a pipeline
    reads before trusting the model on unlabeled data.

    Exactness is the DSIR/trigram-surprisal trick a third time: each
    token's class log-ratio lives in quantized integer BITS,
    bits_reject - bits_keep where bits = floor(log2((N + V)/(c + 1)))
    computed as bitlen((N + V) div (c + 1)) - 1 — add-one smoothing
    over the shared training vocabulary V, per-doc scores exact
    int64, predict keep iff score > 0 (ties to reject). No float
    exists anywhere, so 1000 executors agree bit-for-bit.

    Scale shape: tokenize/explode map-side; occurrences collapse to
    (doc, token) counts before any join; BOTH class counts come from
    ONE groupBy over the training half (conditional sums — no
    per-class scan); model + totals broadcast (vocabulary-bounded);
    one per-doc aggregation and a 4-row confusion groupBy. Test
    tokens outside the training vocabulary carry no evidence and are
    skipped (inner join — identical in both engines), as are docs
    with no in-vocabulary tokens."""
    labels = gopher_rules(df, text=text, id_col=id_col).select(
        F.col(id_col), F.col("keep").cast("int").alias("_y"))
    tok = df.select(F.col(id_col),
                    F.explode(tokens(F.col(text))).alias("_w"))
    tc = (tok.groupBy(id_col, "_w")
          .agg(F.count(F.lit(1)).alias("_k"))
          .join(labels, id_col))
    train = tc.filter(F.col(id_col) % 2 == 0)
    model = train.groupBy("_w").agg(
        F.sum(F.when(F.col("_y") == 1, F.col("_k")).otherwise(0))
        .cast("long").alias("_ck"),
        F.sum(F.when(F.col("_y") == 0, F.col("_k")).otherwise(0))
        .cast("long").alias("_cj"))
    totals = model.agg(F.sum("_ck").alias("_NK"),
                       F.sum("_cj").alias("_NJ"),
                       F.count(F.lit(1)).alias("_V"))
    bits_k = (F.length(F.bin(F.expr("(_NK + _V) div (_ck + 1)"))) - 1)
    bits_j = (F.length(F.bin(F.expr("(_NJ + _V) div (_cj + 1)"))) - 1)
    scored = (
        tc.filter(F.col(id_col) % 2 == 1)
        .join(F.broadcast(model), "_w")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), F.col("_y"),
                (F.col("_k") * (bits_j - bits_k)).cast("long")
                .alias("_s")))
    per_doc = scored.groupBy(id_col, "_y").agg(
        F.sum("_s").alias("_score"))
    return (per_doc.groupBy(
        F.col("_y").alias("actual_keep"),
        (F.col("_score") > 0).cast("int").alias("pred_keep"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("_score").cast("long").alias("sum_score_bits")))


def sql_quality_nb(table: str = "documents", text: str = "text",
                   id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`quality_nb_report`: same labels, same
    one-pass conditional class counts, same integer bits, same
    parity split and tie-to-reject prediction."""
    return f"""
    WITH _nb_lab AS (
      SELECT {id_col}, CASE WHEN keep THEN 1 ELSE 0 END AS _y
      FROM ({sql_gopher_rules(table, text, id_col)})
    ),
    _nb_tok AS (
      SELECT {id_col}, unnest({sql_tokens(text)}) AS _w FROM {table}
    ),
    _nb_tc AS (
      SELECT t.{id_col}, t._w, CAST(count(*) AS BIGINT) AS _k,
             CAST(max(l._y) AS BIGINT) AS _y
      FROM _nb_tok t JOIN _nb_lab l ON l.{id_col} = t.{id_col}
      GROUP BY t.{id_col}, t._w
    ),
    _nb_model AS (
      SELECT _w,
             CAST(sum(CASE WHEN _y = 1 THEN _k ELSE 0 END) AS BIGINT)
               AS _ck,
             CAST(sum(CASE WHEN _y = 0 THEN _k ELSE 0 END) AS BIGINT)
               AS _cj
      FROM _nb_tc WHERE {id_col} % 2 = 0 GROUP BY _w
    ),
    _nb_tot AS (
      SELECT CAST(sum(_ck) AS BIGINT) AS _NK,
             CAST(sum(_cj) AS BIGINT) AS _NJ,
             CAST(count(*) AS BIGINT) AS _V
      FROM _nb_model
    ),
    _nb_doc AS (
      SELECT c.{id_col}, c._y,
             CAST(sum(c._k *
               ((length(bin((_NJ + _V) // (_cj + 1))) - 1)
                - (length(bin((_NK + _V) // (_ck + 1))) - 1)))
               AS BIGINT) AS _score
      FROM _nb_tc c JOIN _nb_model m ON m._w = c._w CROSS JOIN _nb_tot
      WHERE c.{id_col} % 2 = 1
      GROUP BY c.{id_col}, c._y
    )
    SELECT CAST(_y AS INTEGER) AS actual_keep,
           CAST(CASE WHEN _score > 0 THEN 1 ELSE 0 END AS INTEGER)
             AS pred_keep,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(_score) AS BIGINT) AS sum_score_bits
    FROM _nb_doc GROUP BY 1, 2
    """
