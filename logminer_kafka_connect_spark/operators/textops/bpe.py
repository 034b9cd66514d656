"""Distributed BPE tokenizer training (Sennrich et al. 2016, re-expressed
as a relational plan).

Real tokenizer trainers run the merge loop over a WORD-FREQUENCY table,
not the raw corpus — so the only corpus-sized job is the initial word
count (one shuffle). This module keeps exactly that shape, distributed:

- ``word_freqs``: one explode + count over the corpus (map-side
  combined; at 100 TB this is the only pass that touches every byte, and
  the resulting vocab relation is millions of rows, not billions).
- ``train_bpe``: per merge round, (a) adjacent-pair frequencies as one
  zip_with/explode + sum(freq) shuffle over the vocab relation, (b) a
  1-row argmax collect with a deterministic tie-break (freq desc, then
  pair lexicographic), (c) one narrow Arrow pass applying the merge to
  the token arrays. K merges = K rounds; lineage is truncated every
  round (``localCheckpoint``) like every iterative loop in this repo.
- ``bpe_segment``: applies a learned merge list to a corpus — one
  narrow Arrow pass, merges shipped in the closure.

The trained merge list is verified against a pure-python reference BPE
over the same word-frequency dict (tests + the ``t33_bpe_train`` entry's
in-entry differential).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logminer_kafka_connect_spark.operators.textops import ensure_compute_parallelism
from logminer_kafka_connect_spark.operators.textops.dedup import words_expr

#: end-of-word marker (keeps merges from crossing word boundaries when a
#: segmentation is later inverted)
EOW = "</w>"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, toks) — the relation the merge loop iterates on.
    ``toks`` starts as characters + the end-of-word marker."""
    return (
        ensure_compute_parallelism(df)
        .select(F.explode(words_expr(text_col)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            "freq",
            F.concat(F.split(F.col("word"), ""), F.array(F.lit(EOW))).alias("toks"),
        )
    )


def _apply_merge_udf(left: str, right: str):
    merged = left + right

    @F.pandas_udf("array<string>")
    def apply_merge(col: pd.Series) -> pd.Series:
        def go(toks):
            out, i, n = [], 0, len(toks)
            while i < n:
                if i < n - 1 and toks[i] == left and toks[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            return out

        return col.map(go)

    return apply_merge


def train_bpe(df: DataFrame, n_merges: int, text_col: str = "text") -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, freq), ...]
    in learned order. Stops early when no adjacent pair remains (every
    word fully merged) — callers get fewer merges, never a pad."""
    vocab = word_freqs(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        sz = F.size("toks")
        pair = F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, sz - 1),
                F.slice(F.col("toks"), 2, sz - 1),
                lambda x, y: F.struct(x.alias("l"), y.alias("r")),
            )
        )
        top = (
            vocab.select("freq", pair.alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((left, right, n))
        vocab = vocab.select(
            "word", "freq", _apply_merge_udf(left, right)(F.col("toks")).alias("toks")
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment a corpus with a learned merge list: (id, toks, n_tokens).
    One narrow Arrow pass; the merge list rides in the closure (it is
    vocabulary-sized, broadcast once per executor)."""
    order = [(l, r) for l, r, _ in merges]

    @F.pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        def one_word(w):
            toks = list(w) + [EOW]
            for left, right in order:
                out, i, n = [], 0, len(toks)
                while i < n:
                    if i < n - 1 and toks[i] == left and toks[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
            return toks

        def go(text):
            toks = []
            for w in str(text).strip().lower().split():
                toks.extend(one_word(w))
            return toks

        return col.map(go)

    return df.select(
        F.col(id_col), seg(F.col(text_col)).alias("toks")
    ).withColumn("n_tokens", F.size("toks"))


def reference_bpe(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str, int]]:
    """Pure-python textbook BPE over a word-frequency dict — the
    independent oracle the distributed trainer is differenced against
    (same tie-break: freq desc, then pair lexicographic)."""
    vocab = {w: list(w) + [EOW] for w in word_freq}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, toks in vocab.items():
            f = word_freq[w]
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, n))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i < len(toks) - 1 and toks[i] == left and toks[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return merges
