"""Distributed BPE tokenizer TRAINING — learning the merge table
itself, not just applying a fixed pre-tokenizer
(``functions.text.bpe_ish_tokens``). The artifact every training run
starts from: an ordered list of (left, right) symbol merges learned
by greedy highest-pair-count selection (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" — the
public BPE algorithm).

Scale shape (the part that matters at 100 TB):

- **One corpus pass, then vocabulary-sized work.** The corpus
  collapses to a (word, count) relation first — BPE statistics are
  identical on the weighted vocabulary, and the vocabulary grows
  sublinearly with the corpus (new text is mostly old words). Every
  merge iteration after that touches only the vocab relation.
- **Constant driver state.** Per iteration the driver receives ONE
  row (the argmax pair, via sort+limit → TakeOrderedAndProject —
  distributed per-partition top-1, never a global window) and
  broadcasts two string literals back. Learned state = the merge
  list, n_merges rows.
- **Constant plan per iteration.** Pair extraction and merge
  application are built-in HOFs (transform / filter / aggregate) —
  JVM-side, zero Python in the loop — and the vocab relation is
  eagerly localCheckpoint-ed each iteration, so lineage (and plan
  compile time) stays flat no matter how many merges are learned
  (the verify-skill rule: iterative loops must not re-parse growing
  plans).

Determinism: ties on pair count break lexicographically on (left,
right); word splitting and the ``</w>`` end-of-word marker are fixed.
The merge sequence is therefore a pure function of the corpus —
tests/test_operators.py replays the exact sequence with an
independent pure-Python reference implementation.

Two counts per merge, deliberately distinct (the round-4 advisor's
counterexample — corpus {'aaa': 10}: (a,a) occurs 20 times counting
overlaps but greedy leftmost fuses only 10):

- **selection** uses the OVERLAPPING adjacent-pair count — exactly
  Sennrich's ``get_stats``, which walks every adjacent position;
- **pair_count** (the recorded column) is the number of fusions the
  merge actually performed — the symbols-removed count, so the exact
  identity ``final tokens == initial symbols − Σ pair_count`` holds
  on ANY corpus, including self-overlapping runs
  (tests/test_operators.py gates it on an 'aaa'-style fixture).

Reference analogue: none (the reference warehouse has no tokenizer) —
this is part of the beyond-reference training-data surface, like
dedup and packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_MARK = "</w>"


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the weighted vocabulary — the ONLY corpus-wide
    pass in BPE training. Lowercased whitespace words; map-side
    partial aggregation makes the shuffle ∝ distinct words per
    partition, not corpus tokens."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_syms(word: Column) -> Column:
    """Character symbols + the end-of-word marker."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END_MARK)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, n): weighted adjacent-pair counts over the
    symbol sequences. transform+explode is JVM-side; the aggregation
    combines map-side."""
    idx = F.sequence(F.lit(1), F.size("syms") - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(F.col("syms"), i).alias("left"),
            F.element_at(F.col("syms"), i + 1).alias("right"),
        ),
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.left", "p.right")
        .agg(F.sum("cnt").alias("n"))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost non-overlapping replacement of the adjacent
    pair (left, right) with the fused symbol — one fold, exactly the
    reference algorithm's scan (a fused token never re-merges within
    the same pass: acc's last element is checked against ``left``,
    and fused != left since ``right`` is non-empty). ``F.get`` (not
    ``element_at``) for the last-element probe: it returns NULL
    out-of-bounds instead of raising under ANSI mode, which is ON in
    the driver's default session."""
    a, b, ab = F.lit(left), F.lit(right), F.lit(left + right)
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - 1) == a) & (x == b),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(ab)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train_capped(docs: DataFrame, n_merges: int = 24,
                     max_vocab: int = 50000,
                     text_col: str = "text") -> DataFrame:
    """BPE training with the loop over a BOUNDED collected vocabulary
    — the shape real tokenizer trainers use (HuggingFace tokenizers /
    SentencePiece: stream-count words, then merge in memory): the
    corpus-sized work is ONE distributed word-count pass; the merge
    loop then runs driver-side over the top-``max_vocab`` words by
    (count desc, word) — Zipf puts ~all token mass in the head, and
    frequency truncation is exactly what production trainers do
    (min_frequency). Driver state is ≤ max_vocab (word, count) rows —
    the ``pq_fit_sampled`` justification; :func:`bpe_train` remains
    the all-distributed loop for vocabularies too large to collect
    (same merges when the cap covers the vocab —
    cross-gated in tests/test_operators.py), at a measured
    data-INDEPENDENT ~2-4 s/iteration plan-compile cost.

    Same greedy algorithm, same determinism (count desc, then
    lexicographic (left, right)); returns the identical merge-table
    schema."""
    rows = (
        word_freq(docs, text_col)
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(max_vocab)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(list(r["w"]) + [END_MARK])
        vocab[syms] = vocab.get(syms, 0) + int(r["cnt"])
    merges: list[tuple[int, str, str, str, int]] = []
    for i in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab.items():
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        # max count, ties lexicographic on (left, right) — the same
        # rule as the distributed TakeOrdered
        (left, right), _n_overlap = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        fused = left + right
        n_fused = 0  # actual fusions (symbols removed), not overlaps
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            j = 0
            while j < len(syms):
                if (j + 1 < len(syms) and syms[j] == left
                        and syms[j + 1] == right):
                    out.append(fused)
                    j += 2
                    n_fused += cnt
                else:
                    out.append(syms[j])
                    j += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + cnt
        merges.append((i, left, right, fused, n_fused))
        vocab = new_vocab
    return docs.sparkSession.createDataFrame(
        merges,
        "merge_idx int, left string, right string, merged string,"
        " pair_count long",
    )


def bpe_train(docs: DataFrame, n_merges: int = 24,
              text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    (merge_idx, left, right, merged, pair_count) — the tokenizer
    artifact. See module docstring for the scale contract."""
    spark = docs.sparkSession
    vocab = (
        word_freq(docs, text_col)
        .select(_init_syms(F.col("w")).alias("syms"), "cnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["left"], top[0]["right"]
        old = vocab
        # Carry the pre-merge length through the checkpoint so the
        # recorded pair_count is the ACTUAL fusion count (symbols
        # removed) — the argmax above may count overlapping
        # occurrences (Sennrich get_stats semantics), which overstate
        # fusions whenever left == right inside a run of >= 3.
        staged = vocab.select(
            _apply_merge(F.col("syms"), left, right).alias("syms"),
            "cnt",
            F.size("syms").alias("old_len"),
        ).localCheckpoint(eager=True)
        shed = staged.agg(
            F.sum(
                (F.col("old_len") - F.size("syms")) * F.col("cnt")
            ).alias("s")
        ).collect()[0]["s"]
        merges.append((i, left, right, left + right, int(shed or 0)))
        vocab = staged.select("syms", "cnt")
        # The checkpoint above materialized the new state; release
        # the previous iteration's blocks instead of accumulating
        # n_merges copies of the vocabulary in executor storage.
        old.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_idx int, left string, right string, merged string,"
        " pair_count long",
    )


def bpe_encode_stats(docs: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text") -> DataFrame:
    """APPLY a learned merge table corpus-wide — the tokenization pass
    a training run makes with the trained tokenizer: per word,
    repeatedly fuse the lowest-rank merge pair present (the standard
    BPE apply; ranks = training order). Arrow-batched ``mapInPandas``
    with the merge list captured by value and a stdlib-only closure
    (driver contract: workers cannot import this package), one
    embarrassingly-parallel projection — no shuffle until the final
    per-language rollup.

    Correctness is gated by an EXACT identity between two independent
    code paths (tests/test_operators.py): over the training corpus,
    total tokens after encoding == total initial symbols − Σ learned
    pair_counts, because each of a merge's counted occurrences fuses
    exactly one adjacent pair (greedy leftmost, counted at learn
    time on the same corpus state).

    Returns (lang, n_docs, total_tokens, total_init_symbols)."""
    pairs = [(str(a), str(b)) for a, b in merges]

    def encode(batches):
        # self-contained closure: stdlib only (see module docstring)
        import pandas as pd

        ranks = {p: i for i, p in enumerate(pairs)}

        def word_tokens(word: str) -> tuple[int, int]:
            syms = list(word) + ["</w>"]
            init = len(syms)
            while len(syms) >= 2:
                best, best_rank = None, None
                for j in range(len(syms) - 1):
                    r = ranks.get((syms[j], syms[j + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = j, r
                if best is None:
                    break
                a, b = pairs[best_rank]
                out, j = [], 0
                while j < len(syms):
                    if (j + 1 < len(syms) and syms[j] == a
                            and syms[j + 1] == b):
                        out.append(a + b)
                        j += 2
                    else:
                        out.append(syms[j])
                        j += 1
                syms = out
            return len(syms), init

        for pdf in batches:
            rows = []
            for lang, text in zip(pdf["lang"], pdf["text"]):
                n_tok = n_init = 0
                for w in str(text).lower().split():
                    if w:
                        t, i = word_tokens(w)
                        n_tok += t
                        n_init += i
                rows.append((lang, n_tok, n_init))
            yield pd.DataFrame(
                rows, columns=["lang", "n_tokens", "n_init"])

    # One Python worker per partition — spread the text first so a
    # single-row-group input doesn't serialize the whole encode pass
    # (the codec-ops lesson, multimodal.py).
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    per_doc = docs.select(
        "lang", F.col(text_col).alias("text")
    ).repartition(n_part).mapInPandas(
        encode, "lang string, n_tokens long, n_init long"
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_init").cast("long").alias("total_init_symbols"),
        )
    )
