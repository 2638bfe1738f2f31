"""Deduplication operators for large-scale corpus pipelines.

Four families, all expressed as DataFrame transforms (no driver-side
loops, no Python UDFs — everything folds into Catalyst):

- **exact**: hash-groupBy on the raw text digest.
- **fingerprint**: hash-groupBy on the normalized-text digest
  (case/punctuation/whitespace-insensitive exact dedup).
- **MinHash + LSH**: shingle → per-permutation min-hash → banded
  signatures → bucket join for candidate pairs → exact Jaccard
  verification. The banding keeps the join linear in corpus size
  (only rows sharing a band hash ever meet), which is what makes
  near-dedup feasible at 100 TB: no all-pairs product.
- **SimHash**: per-token hash bit votes → compact integer signature;
  near-dups differ in few bits (hamming). Signature generation here;
  banded hamming join follows the same LSH pattern.

Hash choice: md5 (hex string) rather than xxhash64 because the
DuckDB oracle must reproduce every value bit-for-bit; md5 exists and
agrees in both engines. At production scale you'd swap
``F.xxhash64`` via the ``hash_fn`` hook for ~4× hash throughput —
the pipeline shape is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import NORMALIZE_SQL, char_shingles, normalize_text

# ------------------------------------------------------------------ exact

def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: one row per distinct text digest with
    the keeper (min id) and copy count. ``filter(n_copies > 1)`` gives
    the dup report; anti-joining ids back drops the dups. One shuffle
    on the digest."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


EXACT_DUP_SQL = """
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
"""


def fingerprint_dup_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Normalized-fingerprint duplicate groups (rolling-hash-style
    canonical digest: lowercase, strip punctuation, collapse
    whitespace — catches trivially-edited copies)."""
    return (
        df.groupBy(F.md5(normalize_text(F.col(text_col))).alias("fingerprint"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


FINGERPRINT_DUP_SQL = f"""
    SELECT md5({NORMALIZE_SQL.format(col="text")}) AS fingerprint,
           MIN(doc_id) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
"""


# ---------------------------------------------------------------- MinHash

N_PERMUTATIONS = 16
BAND_SIZE = 4  # → 4 bands of 4 hashes
SHINGLE_K = 8


_EMPTY_BIN = "g"  # sorts above every hex digest; shared empty-bin filler


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n_perm: int = N_PERMUTATIONS,
                       k: int = SHINGLE_K) -> DataFrame:
    """Per-document MinHash signature via **one-permutation hashing**
    (Li, Owen, Zhang 2012): hash every k-shingle ONCE, route it to one
    of ``n_perm`` bins by its first hex nibble, take the min digest
    per bin. Same LSH banding properties as n independent
    permutations at 1/n the hash cost.

    Shape: explode shingles → md5 → groupBy(doc) with n_perm
    conditional MIN aggregations. The explode evaluates the
    normalize+shingle expression once per document (an earlier
    nested-HOF formulation let Catalyst inline the regex
    normalization into every lambda element — O(n_perm × |shingles|)
    regex evaluations per row, ~100× slower at sf0.1); the aggregation
    is whole-stage-codegen'd with map-side partial mins, so the
    shuffle carries one n_perm-wide row per doc."""
    # Explode shingle POSITIONS (cheap int sequence), not shingle
    # strings: Generate evaluates its child row once, so the regex
    # normalization runs once per document, and the per-shingle work
    # (substring + md5) stays inside whole-stage codegen. Building a
    # string-array first lets Catalyst inline the normalize expression
    # into the lambda — once per element, ~100× slower.
    # Small corpora arrive as one parquet partition; spread the
    # hash-heavy map side across the cluster first (tiny shuffle).
    n_part = df.sparkSession.sparkContext.defaultParallelism
    # (Guard caveat, ADVICE r9: an input with enough-but-skewed
    # partitions skips the round-robin rebalance — acceptable here
    # because the guard targets the single-row-group LOCAL file case;
    # a skewed cluster-scale scan is AQE's job, not this spread's.)
    if df.rdd.getNumPartitions() < n_part:
        df = df.repartition(n_part)
    norm = df.select(
        F.col(id_col).alias("doc_id"),
        normalize_text(F.col(text_col)).alias("norm"),
    )
    sh = norm.select(
        "doc_id",
        "norm",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("norm") - (k - 1), F.lit(1)))
        ).alias("i"),
    )
    h = sh.select("doc_id", F.md5(F.expr(f"substring(norm, i, {k})")).alias("h"))
    return _oph_signatures(h, n_perm)


def _oph_signatures(h: DataFrame, n_perm: int = N_PERMUTATIONS) -> DataFrame:
    """OPH aggregation over exploded (doc_id, h=md5(shingle)) rows:
    nibble-binned conditional MINs + densification. MIN is duplicate-
    insensitive, so feeding distinct-set elements (the
    ``*_from_sets`` path) or position-exploded shingles (the text
    path, which the DuckDB twin mirrors) yields identical
    signatures. Guard lives here (not only in the text entry point)
    so the ``*_from_sets`` path can't silently leave bins >= 16
    permanently empty behind the densification salt."""
    assert n_perm <= 16, "nibble binning supports up to 16 bins"
    bin_idx = F.instr(F.lit("0123456789abcdef"), F.substring("h", 1, 1)) - 1
    mins = [
        F.coalesce(
            F.min(F.when(bin_idx == p, F.col("h"))), F.lit(_EMPTY_BIN)
        ).alias(f"m{p}")
        for p in range(n_perm)
    ]

    # OPH densification (Shrivastava & Li style): an empty bin borrows
    # the nearest non-empty bin's value to its right (circular),
    # salted with the borrowing bin's index. Without this, any two
    # sparse docs (< ~n_perm shingles) that share an all-empty band
    # collide on md5('g|g|…') and become candidates regardless of
    # content; with the salt, borrowed values only match when the
    # borrowed-from minima actually match.
    def dens(p: int):
        own = F.nullif(F.col(f"m{p}"), F.lit(_EMPTY_BIN))
        borrowed = F.coalesce(
            *[
                F.nullif(F.col(f"m{(p + j) % n_perm}"), F.lit(_EMPTY_BIN))
                for j in range(1, n_perm)
            ]
        )
        return F.coalesce(
            own, F.md5(F.concat(F.lit(f"{p}|"), borrowed)), F.lit(_EMPTY_BIN)
        )

    return (
        h.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[dens(p) for p in range(n_perm)]).alias("signature"),
        )
    )


def minhash_signatures_from_sets(sets: DataFrame,
                                 n_perm: int = N_PERMUTATIONS) -> DataFrame:
    """OPH signatures from a precomputed (doc_id, sh) shingle-set
    relation (see :func:`shingle_sets`) — lets one persisted
    normalize+shingle pass feed BOTH the LSH bucketing and the exact
    verifier in :func:`~..analytics.llmops.dedup_pipeline_keep_best`,
    instead of re-scanning the corpus text per stage."""
    h = sets.select("doc_id", F.explode("sh").alias("s")).select(
        "doc_id", F.md5("s").alias("h")
    )
    return _oph_signatures(h, n_perm)


def minhash_band_hashes(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        n_perm: int = N_PERMUTATIONS,
                        band_size: int = BAND_SIZE,
                        k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, band_idx, band_hash) — the LSH bucketing relation.
    Documents sharing any band hash are near-dup candidates."""
    sigs = minhash_signatures(df, text_col, id_col, n_perm, k)
    return _band_hashes(sigs, n_perm, band_size)


def _band_hashes(sigs: DataFrame, n_perm: int = N_PERMUTATIONS,
                 band_size: int = BAND_SIZE) -> DataFrame:
    n_bands = n_perm // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col("signature")[b * band_size + j]
                               for j in range(band_size)]
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        sigs.select("doc_id", F.explode(bands).alias("band"))
        .select("doc_id", "band.band_idx", "band.band_hash")
    )


def minhash_band_hashes_inrow(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              n_perm: int = N_PERMUTATIONS,
                              band_size: int = BAND_SIZE,
                              k: int = SHINGLE_K) -> DataFrame:
    """STREAM-SAFE twin of :func:`minhash_band_hashes`: the OPH
    minima are computed per ROW with array HOFs (filter + array_min
    over the in-row shingle-hash array) instead of a groupBy — a pure
    projection chain with no aggregation state, so the input may be a
    streaming relation. MIN over the same shingle-hash multiset ⇒
    signatures identical to the aggregate form (cross-gated in
    tests/test_operators.py); the aggregate form stays the BATCH
    default because its map-side partial mins shuffle one 16-wide row
    per doc, while this form carries the whole hash array through the
    projection (fine for a stream's per-batch row flow, wasteful for
    a corpus-wide shuffle).

    Staging discipline: the md5 array materializes as a column before
    the 16 bin-filters reference it (16 references block
    CollapseProject from re-inlining the transform — the winnowing
    pitfall)."""
    staged = df.select(F.col(id_col).alias("doc_id"),
                       normalize_text(F.col(text_col)).alias("_norm"))
    idx = F.sequence(
        F.lit(1), F.greatest(F.length("_norm") - F.lit(k - 1), F.lit(1)))
    hashed = staged.select(
        "doc_id",
        F.transform(idx, lambda i: F.md5(F.col("_norm").substr(i, F.lit(k))))
        .alias("_hs"),
    )
    hexd = "0123456789abcdef"

    def _first_nibble_is(c: str):
        # single-arg lambda (a 2-arg HOF lambda would receive the
        # element INDEX as its second parameter)
        return lambda x: x.substr(F.lit(1), F.lit(1)) == F.lit(c)

    mins = hashed.select(
        "doc_id",
        *[
            F.coalesce(
                F.array_min(
                    F.filter(F.col("_hs"), _first_nibble_is(hexd[p]))),
                F.lit(_EMPTY_BIN),
            ).alias(f"m{p}")
            for p in range(n_perm)
        ],
    )

    def dens(p: int):
        own = F.nullif(F.col(f"m{p}"), F.lit(_EMPTY_BIN))
        borrowed = F.coalesce(
            *[
                F.nullif(F.col(f"m{(p + j) % n_perm}"), F.lit(_EMPTY_BIN))
                for j in range(1, n_perm)
            ]
        )
        return F.coalesce(
            own, F.md5(F.concat(F.lit(f"{p}|"), borrowed)), F.lit(_EMPTY_BIN)
        )

    sigs = mins.select(
        "doc_id",
        F.array(*[dens(p) for p in range(n_perm)]).alias("signature"),
    )
    return _band_hashes(sigs, n_perm, band_size)


def minhash_candidate_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH band bucket.
    The self-join is on (band_idx, band_hash) — shuffle is keyed by
    bucket, so cost is Σ bucket² (bounded by collision rate), never
    the full n² product."""
    return _candidate_pairs_from_bands(minhash_band_hashes(df, text_col, id_col))


def minhash_candidate_pairs_from_sets(sets: DataFrame) -> DataFrame:
    """LSH candidate pairs from a precomputed (persisted) shingle-set
    relation — same Σ bucket² self-join as
    :func:`minhash_candidate_pairs`, minus the corpus re-scan."""
    return _candidate_pairs_from_bands(
        _band_hashes(minhash_signatures_from_sets(sets))
    )


def _candidate_pairs_from_bands(bands: DataFrame) -> DataFrame:
    # Both sides are the corpus-sized band relation: pin a sort-merge
    # join. An auto-broadcast (the optimizer's serialized-size
    # estimate can sit under the threshold while the in-heap hashed
    # relation is GBs) OOM'd the driver at sf10 — corpus-derived
    # relations are never broadcast in the dedup path.
    a = bands.alias("a")
    b = bands.hint("merge").alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def _minhash_sig_sql(n_perm: int = N_PERMUTATIONS, k: int = SHINGLE_K,
                     doc_filter: str = "TRUE") -> str:
    """DuckDB twin of the one-permutation-hashing signature."""
    norm = NORMALIZE_SQL.format(col="text")
    shingles = (
        f"list_transform(generate_series(1, greatest(length({norm}) - {k - 1}, 1)),"
        f" i -> substr({norm}, CAST(i AS INTEGER), {k}))"
    )
    mins = ", ".join(
        f"COALESCE(MIN(CASE WHEN instr('0123456789abcdef', substring(h, 1, 1)) - 1"
        f" = {p} THEN h END), '{_EMPTY_BIN}') AS m{p}"
        for p in range(n_perm)
    )

    # Densification twin: same borrow-right-circular + bin-index salt
    # as the Spark side.
    def dens(p: int) -> str:
        borrowed = ", ".join(
            f"NULLIF(m{(p + j) % n_perm}, '{_EMPTY_BIN}')"
            for j in range(1, n_perm)
        )
        return (
            f"COALESCE(NULLIF(m{p}, '{_EMPTY_BIN}'), "
            f"md5('{p}|' || COALESCE({borrowed})), '{_EMPTY_BIN}')"
        )

    dense = ", ".join(dens(p) for p in range(n_perm))
    return f"""
        WITH sh AS (
          SELECT doc_id, unnest({shingles}) AS s FROM documents
          WHERE {doc_filter}
        ),
        hashed AS (SELECT doc_id, md5(s) AS h FROM sh),
        mins AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id)
        SELECT doc_id, [{dense}] AS signature FROM mins
    """


MINHASH_SIG_SQL = _minhash_sig_sql()


def _minhash_bands_sql(n_perm: int = N_PERMUTATIONS,
                       band_size: int = BAND_SIZE,
                       doc_filter: str = "TRUE") -> str:
    n_bands = n_perm // band_size
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({concat}) AS band_hash FROM sigs".format(
            b=b,
            concat=" || '|' || ".join(
                f"signature[{b * band_size + j + 1}]" for j in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    return (
        f"WITH sigs AS ({_minhash_sig_sql(n_perm, doc_filter=doc_filter)})"
        f" {band_rows}"
    )


MINHASH_PAIRS_SQL = f"""
    WITH bands AS ({_minhash_bands_sql()})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
"""


# ------------------------------------------------------------- n-gram Jaccard

def jaccard_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = SHINGLE_K,
                  min_jaccard: float = 0.0) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share ≥1
    shingle, via an inverted shingle index (explode → self-join on
    shingle → per-pair intersection counts). Exact but quadratic in
    the worst case — at scale, run it only on
    :func:`minhash_candidate_pairs` output; standalone it's the
    oracle-checkable exact baseline."""
    # Via shingle_sets, NOT char_shingles inline: the latter's
    # transform lambda captures the 3-regexp normalize chain, which
    # Catalyst re-evaluates once per character position (the
    # winnowing pitfall — measured ~10 s for a 200-doc slice);
    # shingle_sets stages the normalized text as a multi-referenced
    # column CollapseProject won't re-inline.
    # Eager checkpoint at the branch point: the exploded index feeds
    # the size aggregate AND both self-join sides — unmaterialized,
    # the normalize+shingle scan re-runs once per consumer (the
    # branch-point rule, verify SKILL.md).
    sh = shingle_sets(df, text_col, id_col, k).select(
        "doc_id", F.explode("sh").alias("shingle")
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b")
    )
    jac = (
        F.col("n_common").cast("double")
        / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", "n_common", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )


def jaccard_pairs_sql(doc_filter: str = "TRUE", k: int = SHINGLE_K,
                      min_jaccard: float = 0.0) -> str:
    norm = NORMALIZE_SQL.format(col="text")
    return f"""
        WITH sh AS (
          SELECT doc_id, DISTINCT_SHINGLE AS shingle
          FROM (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                     generate_series(1, greatest(length({norm}) - {k - 1}, 1)),
                     i -> substr({norm}, CAST(i AS INTEGER), {k})))) AS DISTINCT_SHINGLE
            FROM documents WHERE {doc_filter}
          )
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(COUNT(*) AS BIGINT) AS n_common
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT c.doc_a, c.doc_b, c.n_common,
               CAST(c.n_common AS DOUBLE)
                 / CAST(sa.n_shingles + sb.n_shingles - c.n_common AS DOUBLE)
                 AS jaccard
        FROM common c
        JOIN sizes sa ON c.doc_a = sa.doc_id
        JOIN sizes sb ON c.doc_b = sb.doc_id
        WHERE CAST(c.n_common AS DOUBLE)
                / CAST(sa.n_shingles + sb.n_shingles - c.n_common AS DOUBLE)
              >= {min_jaccard}
    """


# ----------------------------------------------------------------- SimHash

# 64-bit signature. Width matters for the banded self-join, not just
# recall — with b-bit bands the bucket count per band is 2^b, and
# Σ bucket² is what the join pays. The measured arc: 16 bits / 4-bit
# bands = 16 buckets → ~n²/16 (275 s at sf1, 39× the sf0.1 time);
# 32 / 8-bit = 256 buckets fixed sf1 (49 s) but still degenerates at
# sf10's 500k distinct signatures (500k²/256 candidate pairs); 64 /
# 16-bit = 65 536 buckets per band holds the same hamming≤3
# pigeonhole guarantee (4 bands, max_hamming <= 3) through another
# two decades of corpus growth. Bits 0-31 vote on the TOP bit of md5
# hex nibble b; bits 32-63 vote on bit 2 of nibble b-32 (independent
# digest bits, same ±1 vote semantics).
SIMHASH_BITS = 64


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n_bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash signature from token-hash bit votes: each token's md5
    contributes ±1 per bit position; positive vote sum ⇒ bit set.
    One token scan + one aggregation keyed by doc_id — scales
    linearly with map-side partial aggregation."""
    # Spread the md5-per-token map first: a single-row-group input
    # otherwise serializes it on one task (the minhash/winnow lesson).
    n_part = df.sparkSession.sparkContext.defaultParallelism
    # (Guard caveat, ADVICE r9: an input with enough-but-skewed
    # partitions skips the round-robin rebalance — acceptable here
    # because the guard targets the single-row-group LOCAL file case;
    # a skewed cluster-scale scan is AQE's job, not this spread's.)
    if df.rdd.getNumPartitions() < n_part:
        df = df.repartition(n_part)
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
                        " +",
                        " ",
                    )
                ),
                " ",
            )
        ).alias("tok"),
    )
    toks = toks.withColumn("h", F.md5("tok"))
    # One aggregation, n_bits vote columns: SUM(±1) per bit with
    # map-side partial aggregation, then assemble the signature from
    # the n_bits sums row-locally. The earlier formulation exploded
    # every token ×n_bits (doc_id, bit, vote) rows — 32× the shuffle
    # volume and an extra aggregation round (measured 15.0 s → 4.4 s
    # for the sf1 signature pass). The DuckDB twin keeps the
    # relational explode form; results are identical integers.
    # Bit b < 32 votes on the TOP bit (bit 3) of hex nibble b; bit
    # b >= 32 on bit 2 of nibble b-32. Parse the digest in
    # 8-char/32-bit chunks (fits a long safely — 16-char chunks could
    # exceed 2^63 and null out on the cast), then each vote is one
    # shift-and: SUM(±1) == 2*SUM(bit) - COUNT(*).
    chunked = toks.select(
        "doc_id",
        *[
            F.conv(F.substring("h", 8 * c + 1, 8), 16, 10)
            .cast("long")
            .alias(f"c{c}")
            for c in range(4)
        ],
    )

    def vote_bit(b: int):
        nib = b if b < 32 else b - 32
        bitpos = 3 if b < 32 else 2
        shift = 4 * (7 - nib % 8) + bitpos
        return F.shiftright(F.col(f"c{nib // 8}"), shift).bitwiseAND(F.lit(1))

    bitsums = (
        chunked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            *[F.sum(vote_bit(b)).alias(f"b{b}") for b in range(n_bits)],
        )
        .select(
            "doc_id",
            *[
                (2 * F.col(f"b{b}") - F.col("n_tok")).alias(f"s{b}")
                for b in range(n_bits)
            ],
        )
    )
    # Assemble with bitwise OR, not +: bit 63's term is
    # shiftleft(1L, 63) == Long.MIN_VALUE (two's complement), which
    # a SUM under ANSI mode would treat as an overflowing add.
    sig = None
    for b in range(n_bits):
        term = F.when(
            F.col(f"s{b}") > 0,
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig.bitwiseOR(term)
    return bitsums.select("doc_id", sig.alias("simhash"))


def simhash_sql(doc_filter: str = "TRUE") -> str:
    return _SIMHASH_SQL_TEMPLATE.format(doc_filter=doc_filter)


# Relational explode twin of the chunked-vote Spark aggregation:
# bits 0-31 test nibble bit's top bit (char in '89abcdef'); bits
# 32-63 test bit 2 of nibble bit-32 (char in '4567cdef'). Bit 63's
# weight is the two's-complement sign term: SUM over disjoint bit
# weights equals the bitwise OR, and -2^63 + positives stays inside
# BIGINT range (DuckDB sums in HUGEINT, cast at the end).
_SIMHASH_SQL_TEMPLATE = f"""
    WITH toks AS (
      SELECT doc_id, md5(unnest(string_split({NORMALIZE_SQL.format(col="text")}, ' '))) AS h
      FROM documents WHERE {{doc_filter}}
    ),
    votes AS (
      SELECT doc_id, bit,
             CASE WHEN instr(CASE WHEN bit < 32 THEN '89abcdef' ELSE '4567cdef' END,
                             substr(h, CAST((bit % 32) + 1 AS INTEGER), 1)) > 0
                  THEN 1 ELSE -1 END AS vote
      FROM toks, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit)
    ),
    bitsums AS (
      SELECT doc_id, bit, SUM(vote) AS s FROM votes GROUP BY doc_id, bit
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s <= 0 THEN 0
                         WHEN bit = 63 THEN -9223372036854775808
                         ELSE 1::BIGINT << CAST(bit AS INTEGER)
                    END) AS BIGINT) AS simhash
    FROM bitsums GROUP BY doc_id
"""

SIMHASH_SQL = simhash_sql()


# ------------------------------------------------- SimHash hamming-band LSH

SIMHASH_BAND_BITS = 16


def simhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           n_bits: int = SIMHASH_BITS,
                           band_bits: int = SIMHASH_BAND_BITS,
                           max_hamming: int = 3,
                           sigs: DataFrame | None = None) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance, found via a
    banded self-join (the hamming analogue of MinHash-LSH banding,
    per Manku/Jain/Sarma's simhash web-dedup design). Pass ``sigs``
    (a maintained (doc_id, simhash) index, pre-restricted to the
    audited docs) to skip the signature pass entirely.

    The signature splits into ``n_bits/band_bits`` bands; by
    pigeonhole, any pair within hamming distance ``n_bands - 1`` must
    agree exactly on at least one band, so for
    ``max_hamming <= n_bands - 1`` the banded join has FULL recall —
    the result is exact (hence oracle-gated), while the join is still
    keyed on (band_idx, band_val): cost is Σ bucket², never n².

    The 64-bit/4×16-bit-band default keeps ~65k buckets per band so
    buckets stay small through sf10-scale distinct-signature counts
    (see the width-arc note above SIMHASH_BITS)."""
    n_bands = n_bits // band_bits
    assert max_hamming <= n_bands - 1, "banding loses recall past n_bands-1"
    mask = (1 << band_bits) - 1
    if sigs is None:
        sigs = simhash_signatures(df, text_col, id_col, n_bits)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(
                            f"shiftright(simhash, {b * band_bits}) & {mask}"
                        ).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_sql(n_bits: int = SIMHASH_BITS,
                      band_bits: int = SIMHASH_BAND_BITS,
                      max_hamming: int = 3,
                      doc_filter: str = "TRUE") -> str:
    n_bands = n_bits // band_bits
    mask = (1 << band_bits) - 1
    return f"""
        WITH sigs AS ({simhash_sql(doc_filter)}),
        bands AS (
          SELECT doc_id, simhash, band_idx,
                 (simhash >> (band_idx * {band_bits})) & {mask} AS band_val
          FROM sigs,
               (SELECT unnest(generate_series(0, {n_bands - 1})) AS band_idx)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM bands a
        JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def simhash_near_dup_clusters(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              n_bits: int = SIMHASH_BITS,
                              band_bits: int = SIMHASH_BAND_BITS,
                              max_hamming: int = 3,
                              sigs: DataFrame | None = None) -> DataFrame:
    """SimHash near-dup CLUSTER labels — the scale-safe registered
    form of :func:`simhash_near_dup_pairs`. Production dedup never
    materializes the pair list (Σ cluster² rows: 43 M pairs at sf1,
    quadratic in cluster size at 100 TB); it pipes candidates straight
    into connected components and emits one (doc_id, cluster_id) row
    per document — output is ∝ corpus size by construction.

    The quadratic core is killed BEFORE the join: documents collapse
    to one representative per DISTINCT signature (exact duplicates —
    the dominant duplicate class — share a simhash, so a k-doc
    identical cluster contributes 1 node instead of k(k-1)/2 pairs).
    The banded self-join then runs over distinct signatures only
    (full recall for hamming ≤ n_bands-1 by pigeonhole, same as the
    pair form), CC label-propagates over the tiny representative
    graph, and labels broadcast back to docs through their signature.
    cluster_id = min doc_id in the component (representatives are
    per-signature min doc_ids, so the component min over reps IS the
    overall min).

    Cf. reference silver dedup (scripts/silver/proc_load_silver.sql
    ROW_NUMBER keep-latest) for the collapse-then-keep shape; the
    hamming clustering itself follows Manku/Jain/Sarma's simhash
    web-dedup design."""
    n_bands = n_bits // band_bits
    assert max_hamming <= n_bands - 1, "banding loses recall past n_bands-1"
    mask = (1 << band_bits) - 1
    if sigs is None:
        # One signature pass feeds the rep collapse, the CC edge
        # build, AND the final label fan-out (which is evaluated
        # after this function returns — so eager localCheckpoint, not
        # persist+unpersist: blocks outlive the call and are freed on
        # GC). A caller-provided maintained index arrives already
        # materialized.
        sigs = simhash_signatures(df, text_col, id_col, n_bits)
        sigs = sigs.localCheckpoint(eager=True)
    return _simhash_clusters_from_sigs(
        sigs, n_bands, band_bits, mask, max_hamming
    )


def _simhash_clusters_from_sigs(sigs: DataFrame, n_bands: int,
                                band_bits: int, mask: int,
                                max_hamming: int) -> DataFrame:
    reps = sigs.groupBy("simhash").agg(F.min("doc_id").alias("rep_id"))
    bands = reps.select(
        "rep_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.expr(
                            f"shiftright(simhash, {b * band_bits}) & {mask}"
                        ).alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("rep_id", "simhash", "band.band_idx", "band.band_val")
    a = bands.alias("a")
    b = bands.hint("merge").alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.rep_id") < F.col("b.rep_id")),
        )
        .filter(
            F.expr("bit_count(a.simhash ^ b.simhash)") <= max_hamming
        )
        .select(
            F.col("a.rep_id").alias("src"), F.col("b.rep_id").alias("dst")
        )
        .distinct()
    )
    # CC over edge endpoints only; singleton reps rejoin as their own
    # label (same shape as dedup_clusters / dedup_pipeline_keep_best).
    cc = connected_components(edges, src="src", dst="dst")
    rep_labels = reps.join(
        cc.select(F.col("id").alias("rep_id"), F.col("label").alias("cluster_id")),
        "rep_id",
        "left",
    ).select("simhash", F.coalesce("cluster_id", "rep_id").alias("cluster_id"))
    return sigs.join(rep_labels, "simhash").select(
        "doc_id", "cluster_id"
    )


def simhash_clusters_sql(n_bits: int = SIMHASH_BITS,
                         max_hamming: int = 3) -> str:
    """DuckDB twin of :func:`simhash_near_dup_clusters`: distinct
    signatures → naive all-pairs hamming filter over reps (the oracle
    may be O(m²); it is the spec, not the plan) → recursive-CTE
    transitive closure → labels fanned back to docs."""
    return f"""
        WITH RECURSIVE sigs AS MATERIALIZED ({SIMHASH_SQL}),
        reps AS MATERIALIZED (
          SELECT simhash, MIN(doc_id) AS rep_id FROM sigs GROUP BY simhash
        ),
        pairs AS MATERIALIZED (
          SELECT a.rep_id AS src, b.rep_id AS dst
          FROM reps a JOIN reps b
            ON a.rep_id < b.rep_id
           AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
        ),
        edges AS (
          SELECT src, dst FROM pairs
          UNION ALL
          SELECT dst, src FROM pairs
        ),
        reach(id, label) AS (
          SELECT rep_id, rep_id FROM reps
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
        ),
        rep_labels AS (
          SELECT id AS rep_id, MIN(label) AS cluster_id
          FROM reach GROUP BY id
        )
        SELECT s.doc_id, rl.cluster_id
        FROM sigs s
        JOIN reps rp ON rp.simhash = s.simhash
        JOIN rep_labels rl ON rl.rep_id = rp.rep_id
    """


# ------------------------------------------------- connected components

def connected_components(edges: DataFrame, nodes: DataFrame | None = None,
                         src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    canonical "collapse near-dup pairs into duplicate clusters, keep
    one doc per cluster" step downstream of LSH/jaccard pair
    generation (cf. the union-find pass in web-scale dedup pipelines).

    Every iteration does (1) a neighbor-min hop (join edges⋈labels +
    min-aggregation, both keyed on node id) and (2) a pointer-jumping
    shortcut (labels are themselves node ids, so ``label ←
    label[label]`` halves chain depth — the label-doubling trick from
    PRAM/Hash-to-Min connected components). Together they converge in
    O(log diameter) rounds, so ``max_iter=25`` covers graphs of
    diameter ~2²⁵, not 25. The label frontier is
    ``localCheckpoint``-ed each round to stop lineage growth, and
    convergence is detected by the monotone label-sum invariant
    (labels only ever decrease, so an unchanged SUM(label) ⇔ a fixed
    point) — one cheap aggregate per round instead of a change-count
    join. Driver state is a single scalar; nothing about the loop
    caps at cluster scale.

    Returns (id, label): label = min node id in the component.
    """
    sym = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Eager: everything downstream (node seeding AND every round's
    # hop) must read the materialized edges — a lazy checkpoint would
    # run the upstream pair-generation pipeline once for the seed job
    # and AGAIN for the first materializing round (measured 2× a 60 s
    # verify pipeline before the fix).
    sym = sym.localCheckpoint(eager=True)
    # Size the loop's shuffles to the edge set: every round is 3
    # joins + an aggregate + an eager checkpoint, and a small graph
    # has no use for the session's full shuffle width (task-launch
    # overhead × rounds; the dominant loop cost is per-JOB driver
    # latency, so the win here is modest — A/B'd flat at sf0.1 — but
    # the narrow setting is strictly never worse for < 1M edges and
    # the big-graph path keeps the session width). Scoped + restored:
    # the loop materializes every round eagerly, so nothing lazy
    # escapes with the narrow setting.
    spark = sym.sparkSession
    n_edges = sym.count()
    # Hybrid finish (the GraphFrames/BigCC shape): when the verified
    # edge set is small — which is the normal case for a deduped
    # corpus, and ALWAYS becomes true for the distributed loop's
    # frontier after enough halvings — finish with a driver-side
    # union-find over the collected edges. Driver state is bounded by
    # the threshold (≤ _CC_DRIVER_MAX_EDGES edge rows, ~MBs), the
    # result is identical (label = min id in component), and the
    # per-round job latency of the iterative loop (3 joins + eager
    # checkpoint per round × O(log d) rounds) collapses into one
    # collect + one createDataFrame. Corpus-scale edge sets take the
    # distributed loop unchanged.
    if n_edges <= _CC_DRIVER_MAX_EDGES:
        return _cc_driver_finish(spark, sym, nodes)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    narrow = n_edges < 1_000_000
    if narrow:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        return _cc_loop(sym, nodes, max_iter)
    finally:
        if narrow:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


_CC_DRIVER_MAX_EDGES = 200_000  # symmetric rows ⇒ ≤100k pairs collected


def _cc_driver_finish(spark, sym: DataFrame,
                      nodes: DataFrame | None) -> DataFrame:
    """Bounded driver union-find over a collected small edge set;
    output contract identical to :func:`_cc_loop` (label = min id per
    component; singleton nodes label themselves)."""
    rows = sym.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r["src"], r["dst"]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    label: dict = {}
    for x in parent:
        r = find(x)
        if r not in label or x < label[r]:
            label[r] = x
    from pyspark.sql.types import StructField, StructType

    id_type = sym.schema["src"].dataType
    lab_df = spark.createDataFrame(
        [(x, label[find(x)]) for x in parent],
        StructType([
            StructField("id", id_type, False),
            StructField("label", id_type, False),
        ]),
    )
    if nodes is None:
        return lab_df
    node_ids = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
    return (
        node_ids.join(F.broadcast(lab_df), "id", "left")
        .select("id", F.coalesce("label", "id").alias("label"))
    )


def _cc_loop(sym: DataFrame, nodes: DataFrame | None,
             max_iter: int) -> DataFrame:
    if nodes is None:
        node_ids = sym.select(F.col("src").alias("id")).distinct()
    else:
        node_ids = nodes.select(F.col(nodes.columns[0]).alias("id")).distinct()
    labels = node_ids.select("id", F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        # No join-strategy hint here: the label frontier is ∝ the
        # DUPLICATE population, which is tiny for clean corpora and
        # large for crawl-density ones — AQE picks broadcast or
        # shuffle per round from runtime sizes. (The corpus-sized
        # candidate/verify joins UPSTREAM carry explicit merge hints;
        # those were the sf10 broadcast-OOM site, not these.)
        neigh = (
            sym.join(
                labels.select(
                    F.col("id").alias("src"), F.col("label").alias("src_label")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("src_label").alias("neigh_label"))
        )
        hopped = labels.join(neigh, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("neigh_label", "label")).alias(
                "label"
            ),
        )
        parents = hopped.select(
            F.col("id").alias("p_id"), F.col("label").alias("p_label")
        )
        labels = (
            hopped.join(parents, hopped["label"] == parents["p_id"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("p_label", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters_sql(doc_filter: str = "TRUE", k: int = SHINGLE_K,
                       min_jaccard: float = 0.35) -> str:
    """DuckDB twin of jaccard-pair connected components: transitive
    closure via a recursive CTE (UNION dedups, so it terminates), then
    MIN(label) per node. Exact — gates the Spark propagation loop."""
    pairs = jaccard_pairs_sql(doc_filter=doc_filter, k=k,
                              min_jaccard=min_jaccard)
    return f"""
        WITH RECURSIVE pairs AS ({pairs}),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b, doc_a FROM pairs
        ),
        reach(id, label) AS (
          SELECT doc_id, doc_id FROM documents WHERE {doc_filter}
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
        )
        SELECT id AS doc_id, MIN(label) AS cluster_id
        FROM reach GROUP BY id
    """


# ------------------------------------------------- pairwise verification

def shingle_sets(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, sh): distinct char-shingle set per document as ONE
    array row — the verifier-side representation (the inverted-index
    explode in :func:`jaccard_pairs` is for all-pairs discovery; a
    candidate list wants per-doc sets it can join twice).

    The normalized text is materialized as a column BEFORE the
    shingling HOF: a lambda inlines its captured expressions, so
    ``substr(normalize(text), i, k)`` would re-run the 3-regexp
    normalize chain once per character position (measured ~30 s for
    5 000 docs; staged it's sub-second). Rule: materialize an array
    as a column BEFORE any sliding-window HOF consumes it."""
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        normalize_text(F.col(text_col)).alias("_norm"),
    )
    n = F.length(F.col("_norm"))
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return staged.select(
        "doc_id",
        F.array_distinct(
            F.transform(idx, lambda i: F.col("_norm").substr(i, F.lit(k)))
        ).alias("sh"),
    )


def jaccard_verify(pairs: DataFrame, docs: DataFrame,
                   text_col: str = "text", id_col: str = "doc_id",
                   k: int = SHINGLE_K) -> DataFrame:
    """Exact n-gram Jaccard for an EXPLICIT candidate-pair list
    (doc_a, doc_b) — the verifier that runs downstream of
    :func:`minhash_candidate_pairs` at scale.

    Plan shape: two keyed joins of the pair list against the per-doc
    shingle sets, then a per-row ``array_intersect`` — cost is
    O(|pairs| × shingles/doc), never Σ df² like the inverted-index
    path, and the only shuffles are the two doc_id joins. Integer
    set sizes divide once into the jaccard double, so the value is
    bit-identical cross-engine."""
    return jaccard_verify_sets(pairs, shingle_sets(docs, text_col, id_col, k))


def jaccard_verify_sets(pairs: DataFrame, sets: DataFrame) -> DataFrame:
    """:func:`jaccard_verify` over a precomputed (doc_id, sh)
    relation. Persist ``sets`` when it also feeds the LSH stage — the
    two per-side joins here would otherwise each re-run the
    normalize+shingle scan."""
    # Corpus-sized shingle relations: sort-merge, never broadcast
    # (see _candidate_pairs_from_bands).
    sa = sets.select(F.col("doc_id").alias("doc_a"),
                     F.col("sh").alias("sh_a")).hint("merge")
    sb = sets.select(F.col("doc_id").alias("doc_b"),
                     F.col("sh").alias("sh_b")).hint("merge")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            inter.cast("long").alias("n_common"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    )


def shingle_set_sql(k: int = SHINGLE_K, text_col: str = "text") -> str:
    norm = NORMALIZE_SQL.format(col=text_col)
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(length({norm}) - {k - 1}, 1)), "
        f"i -> substr({norm}, CAST(i AS INTEGER), {k})))"
    )


def dedup_keep_best_sql(min_jaccard: float = 0.35,
                        k: int = SHINGLE_K) -> str:
    """DuckDB twin of the full production dedup pipeline: MinHash-LSH
    candidates → per-pair exact-Jaccard verification → recursive-CTE
    connected components → keep the highest-quality doc per cluster
    (longest text, doc_id tiebreak)."""
    return f"""
        WITH RECURSIVE pairs AS MATERIALIZED ({MINHASH_PAIRS_SQL}),
        sets AS MATERIALIZED (
          SELECT doc_id, {shingle_set_sql(k)} AS sh FROM documents
        ),
        verified AS MATERIALIZED (
          SELECT p.doc_a, p.doc_b
          FROM pairs p
          JOIN sets a ON a.doc_id = p.doc_a
          JOIN sets b ON b.doc_id = p.doc_b
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / CAST(len(a.sh) + len(b.sh)
                       - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                >= {min_jaccard}
        ),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM verified
          UNION ALL
          SELECT doc_b, doc_a FROM verified
        ),
        reach(id, label) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
        ),
        labels AS (
          SELECT id AS doc_id, MIN(label) AS cluster_id
          FROM reach GROUP BY id
        )
        SELECT l.doc_id, l.cluster_id,
               (row_number() OVER (
                  PARTITION BY l.cluster_id
                  ORDER BY d.n_chars DESC, l.doc_id) = 1) AS is_kept
        FROM labels l JOIN documents d ON d.doc_id = l.doc_id
    """


# ------------------------- scale path: chain candidates + bottom-k verify
#
# The exact keep-best pipeline's verify stage ships both documents'
# full shingle sets once per candidate pair; candidates grow
# Σ cluster² and sets are tens of KB, so at extreme duplication the
# verify shuffle is quadratic-in-cluster-size × set-width (the sf10
# sweep — 100 near-identical copies per doc, 1 % unique — hit 175 GB
# of spill and died on local disk; BASELINE.md round 3). This is the
# LINEAR-volume variant production crawls run:
#
#   fingerprint collapse  → exact duplicates become one representative
#   chain candidates      → within each LSH bucket, only CONSECUTIVE
#                           doc_ids pair up: m-1 edges per m-doc
#                           bucket instead of m(m-1)/2. Connected
#                           components only needs a spanning
#                           structure per bucket, and the chain IS
#                           one — cluster recovery is unchanged
#                           whenever chain neighbors pass the verify
#                           threshold (true near-dup buckets do).
#   bottom-k sketch verify → Jaccard estimated from the k smallest
#                           md5(shingle) values per doc (fixed-size
#                           payload), J ≈ |B_k(A∪B) ∩ A_k ∩ B_k| /
#                           |B_k(A∪B)| — exact when a pair's union
#                           fits in k, ±~1/√k otherwise.
#
# Everything is a deterministic function of the input, so the DuckDB
# twin replays the estimator bit-for-bit and the hash gate holds.

BOTTOM_K = 256


def bottomk_sketches(sets: DataFrame, k: int = BOTTOM_K) -> DataFrame:
    """(doc_id, sk): bottom-k of md5-hashed shingles, ascending."""
    return sets.select(
        "doc_id",
        F.expr(
            f"slice(array_sort(transform(sh, s -> md5(s))), 1, {k})"
        ).alias("sk"),
    )


def chain_candidate_pairs_from_sets(sets: DataFrame) -> DataFrame:
    """Chain candidates: (doc_a, doc_b) consecutive by doc_id within
    each (band_idx, band_hash) LSH bucket. Output is ≤ |bands| rows —
    linear in corpus size by construction."""
    return chain_candidate_pairs_from_bands(
        _band_hashes(minhash_signatures_from_sets(sets)))


def chain_candidate_pairs_from_bands(bands: DataFrame) -> DataFrame:
    """:func:`chain_candidate_pairs_from_sets` over a precomputed
    band relation (e.g. the banding projection of a maintained
    signature index)."""
    w = Window.partitionBy("band_idx", "band_hash").orderBy("doc_id")
    return (
        bands.withColumn("doc_b", F.lead("doc_id").over(w))
        .filter(F.col("doc_b").isNotNull())
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )


def jaccard_bottomk_verify(pairs: DataFrame, sketches: DataFrame,
                           k: int = BOTTOM_K) -> DataFrame:
    """Bottom-k Jaccard estimate for an explicit candidate list.
    Payload per pair is two fixed-size sketches, never the full
    shingle sets; the estimate is exact whenever |A ∪ B| <= k."""
    sa = sketches.select(F.col("doc_id").alias("doc_a"),
                         F.col("sk").alias("sk_a")).hint("merge")
    sb = sketches.select(F.col("doc_id").alias("doc_b"),
                         F.col("sk").alias("sk_b")).hint("merge")
    u = F.expr(f"slice(array_sort(array_union(sk_a, sk_b)), 1, {k})")
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b").withColumn("_u", u)
    est = (
        F.size(F.array_intersect(F.array_intersect("_u", "sk_a"), "sk_b"))
        .cast("double")
        / F.size("_u").cast("double")
    )
    return joined.select("doc_a", "doc_b", est.alias("jaccard_est"))


def dedup_keep_best_chain(docs: DataFrame, min_jaccard: float = 0.35,
                          k_sketch: int = BOTTOM_K,
                          sigs: DataFrame | None = None) -> DataFrame:
    """Linear-volume keep-best dedup (see the section note above):
    fingerprint collapse → OPH/LSH chain candidates over
    representatives → bottom-k sketch verify → connected components →
    keep the longest doc per cluster (doc_id tiebreak). Same output
    shape as ``dedup_pipeline_keep_best``; every stage's cost is
    ∝ corpus size regardless of duplication density.

    Pass ``sigs`` (a maintained per-doc signature index) and the
    banding stage becomes an id-filtered projection of it; sketches
    are then built ONLY for docs that survive into a chain candidate
    — the probe-don't-rebuild shape shared with
    ``incremental_dedup_delta``. The sketch scan stays worst-case ∝
    reps (chain candidates cover every bucketed doc at extreme
    duplication density), which is exactly this form's contract."""
    fp = docs.select(
        "doc_id", "n_chars",
        F.md5(normalize_text(F.col("text"))).alias("fp"),
    )
    reps = fp.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    rep_ids = reps.select(F.col("rep_id").alias("doc_id"))
    if sigs is None:
        rep_docs = docs.join(rep_ids, "doc_id").select(
            "doc_id", "text")
        rep_sigs = minhash_signatures(rep_docs).localCheckpoint()
    else:
        rep_sigs = sigs.join(rep_ids, "doc_id", "left_semi")
    cands = chain_candidate_pairs_from_bands(
        _band_hashes(rep_sigs)
    ).localCheckpoint()  # candidate-sized; feeds ids + verify
    ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = docs.select("doc_id", "text").join(ids, "doc_id",
                                                   "left_semi")
    sets = shingle_sets(cand_docs).localCheckpoint(eager=True)
    verified = (
        jaccard_bottomk_verify(cands, bottomk_sketches(sets, k_sketch),
                               k_sketch)
        .filter(F.col("jaccard_est") >= min_jaccard)
        .select("doc_a", "doc_b")
    )
    cc = connected_components(verified, src="doc_a", dst="doc_b")
    rep_labels = reps.join(
        cc.select(F.col("id").alias("rep_id"),
                  F.col("label").alias("cluster_id")),
        "rep_id",
        "left",
    ).select("fp", F.coalesce("cluster_id", "rep_id").alias("cluster_id"))
    labeled = fp.join(rep_labels, "fp")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return labeled.select(
        "doc_id",
        "cluster_id",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


def dedup_keep_best_chain_sql(min_jaccard: float = 0.35,
                              k_sketch: int = BOTTOM_K,
                              k: int = SHINGLE_K) -> str:
    """DuckDB twin of :func:`dedup_keep_best_chain` — replays the
    fingerprint collapse, the per-bucket lead() chain, the bottom-k
    estimator, and the recursive-CTE components bit-for-bit."""
    rep_filter = ("doc_id IN (SELECT MIN(doc_id) FROM documents "
                  f"GROUP BY md5({NORMALIZE_SQL.format(col='text')}))")
    bands = _minhash_bands_sql(doc_filter=rep_filter)
    return f"""
        WITH RECURSIVE fp AS MATERIALIZED (
          SELECT doc_id, n_chars,
                 md5({NORMALIZE_SQL.format(col="text")}) AS fp
          FROM documents
        ),
        reps AS MATERIALIZED (
          SELECT fp, MIN(doc_id) AS rep_id FROM fp GROUP BY fp
        ),
        bands AS MATERIALIZED (SELECT * FROM ({bands})),
        chain AS MATERIALIZED (
          SELECT doc_a, doc_b FROM (
            SELECT doc_id AS doc_a,
                   lead(doc_id) OVER (PARTITION BY band_idx, band_hash
                                      ORDER BY doc_id) AS doc_b
            FROM bands
          ) WHERE doc_b IS NOT NULL
          GROUP BY doc_a, doc_b
        ),
        sk AS MATERIALIZED (
          SELECT doc_id,
                 list_slice(list_sort(list_transform({shingle_set_sql(k)},
                                                     s -> md5(s))),
                            1, {k_sketch}) AS sk
          FROM documents WHERE {rep_filter}
        ),
        verified AS MATERIALIZED (
          SELECT doc_a, doc_b FROM (
            SELECT c.doc_a, c.doc_b, a.sk AS ska, b.sk AS skb,
                   list_slice(list_sort(list_distinct(a.sk || b.sk)),
                              1, {k_sketch}) AS u
            FROM chain c
            JOIN sk a ON a.doc_id = c.doc_a
            JOIN sk b ON b.doc_id = c.doc_b
          )
          WHERE CAST(len(list_intersect(list_intersect(u, ska), skb))
                     AS DOUBLE) / CAST(len(u) AS DOUBLE) >= {min_jaccard}
        ),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM verified
          UNION ALL
          SELECT doc_b, doc_a FROM verified
        ),
        reach(id, label) AS (
          SELECT rep_id, rep_id FROM reps
          UNION
          SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
        ),
        rep_labels AS (
          SELECT id AS rep_id, MIN(label) AS cluster_id
          FROM reach GROUP BY id
        )
        SELECT f.doc_id, rl.cluster_id,
               (row_number() OVER (
                  PARTITION BY rl.cluster_id
                  ORDER BY f.n_chars DESC, f.doc_id) = 1) AS is_kept
        FROM fp f
        JOIN reps r ON r.fp = f.fp
        JOIN rep_labels rl ON rl.rep_id = r.rep_id
    """


# ------------------------- incremental dedup: delta batch vs base corpus

def incremental_dedup_delta(docs: DataFrame, threshold: float = 0.35,
                            delta_mod: int = 5, text_col: str = "text",
                            id_col: str = "doc_id",
                            k: int = SHINGLE_K,
                            sigs: DataFrame | None = None) -> DataFrame:
    """Dedup an INCOMING batch against an already-ingested corpus
    without ever re-pairing the corpus with itself — the shape every
    continuously-crawling training pipeline needs: at 100 TB the base
    LSH band relation is a STORED index that only gets probed, and
    per-ingest work is ∝ the delta's bucket collisions, independent
    of base size (base×base pairs are never formed — the candidate
    join's left side is delta-only).

    Here the delta is ``doc_id % delta_mod == 0`` (a scale-invariant
    stand-in for "the new crawl batch"); candidates pair each delta
    doc with (a) any BASE doc sharing an LSH band bucket and (b) any
    EARLIER delta doc (smaller id) sharing one — so within-batch dups
    resolve to their first occurrence without recursion. Exact-
    Jaccard verification, then per delta doc:

    - ``dup_of_base``  — ≥1 verified base match (discard: the corpus
      already has it),
    - ``dup_in_delta`` — no base match but a verified match to an
      earlier delta doc (keep only the first occurrence),
    - ``unique``       — ingest.

    Deterministic end-to-end (md5 OPH, exact integer-ratio jaccard),
    so the DuckDB twin replays it bit-for-bit.

    Reference analogue: the incremental-load role of
    scripts/bronze/proc_load_bronze.sql (truncate-and-reload there;
    probe-the-index here, which is what replaces it at corpus scale).
    """
    is_delta = F.col("doc_id") % delta_mod == 0
    if sigs is None:
        # Self-contained fallback: build the signature index in-op.
        # Callers with a maintained index (the production shape —
        # ``analytics.llmops._sig_index`` locally) pass it instead,
        # and the corpus-wide text pass disappears from the ingest.
        sigs = minhash_signatures(docs, text_col, id_col).localCheckpoint()
    bands = _band_hashes(sigs)
    a = bands.filter(is_delta).alias("a")
    # The base side is corpus-sized: sort-merge, never broadcast
    # (see _candidate_pairs_from_bands).
    b = bands.hint("merge").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (
                (F.col("b.doc_id") % delta_mod != 0)
                | (F.col("b.doc_id") < F.col("a.doc_id"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        # Candidate-sized; checkpointed so the id restriction and the
        # verify joins don't each replay the band probe.
        .localCheckpoint()
    )
    # Shingle ONLY candidate docs (both endpoints): the verify cost is
    # ∝ the delta's bucket collisions, and the full corpus is never
    # re-shingled per ingest — the probe-don't-rebuild shape.
    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    ).join(ids, "doc_id", "left_semi")
    sets = shingle_sets(cand_docs, "_t", "doc_id", k).localCheckpoint(
        eager=True)  # feeds both verifier sides
    verified = (
        jaccard_verify_sets(cand, sets)
        .filter(F.col("jaccard") >= threshold)
        # Materialize: the stats aggregation below is consumed lazily
        # by callers.
        .localCheckpoint(eager=True)
    )
    is_base_match = (F.col("doc_b") % delta_mod != 0).cast("long")
    stats = verified.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.sum(is_base_match).alias("n_base_matches"),
        F.max("jaccard").alias("best_jaccard"),
    )
    return (
        docs.filter(is_delta)
        .select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("n_base_matches") > 0, F.lit("dup_of_base"))
            .when(F.col("best_jaccard").isNotNull(), F.lit("dup_in_delta"))
            .otherwise(F.lit("unique"))
            .alias("status"),
            F.coalesce("n_base_matches", F.lit(0)).alias("n_base_matches"),
            F.col("best_jaccard"),
        )
    )


def incremental_dedup_delta_sql(threshold: float = 0.35,
                                delta_mod: int = 5,
                                k: int = SHINGLE_K) -> str:
    """DuckDB twin of :func:`incremental_dedup_delta`."""
    return f"""
        WITH bands AS MATERIALIZED ({_minhash_bands_sql()}),
        sets AS MATERIALIZED (
          SELECT doc_id, {shingle_set_sql(k)} AS sh FROM documents
        ),
        cand AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          WHERE a.doc_id % {delta_mod} = 0
            AND (b.doc_id % {delta_mod} != 0 OR b.doc_id < a.doc_id)
        ),
        verified AS MATERIALIZED (
          SELECT c.doc_a, c.doc_b,
                 CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 / CAST(len(sa.sh) + len(sb.sh)
                        - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                 AS jaccard
          FROM cand c
          JOIN sets sa ON sa.doc_id = c.doc_a
          JOIN sets sb ON sb.doc_id = c.doc_b
          WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                / CAST(len(sa.sh) + len(sb.sh)
                       - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                >= {threshold}
        ),
        stats AS (
          SELECT doc_a AS doc_id,
                 CAST(SUM(CASE WHEN doc_b % {delta_mod} != 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_base_matches,
                 MAX(jaccard) AS best_jaccard
          FROM verified GROUP BY doc_a
        )
        SELECT d.doc_id,
               CASE WHEN s.n_base_matches > 0 THEN 'dup_of_base'
                    WHEN s.best_jaccard IS NOT NULL THEN 'dup_in_delta'
                    ELSE 'unique' END AS status,
               COALESCE(s.n_base_matches, 0) AS n_base_matches,
               s.best_jaccard
        FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
        WHERE d.doc_id % {delta_mod} = 0
    """


def incremental_dedup_delta_sketch(docs: DataFrame,
                                   threshold: float = 0.35,
                                   delta_mod: int = 5,
                                   k_sketch: int = BOTTOM_K,
                                   text_col: str = "text",
                                   id_col: str = "doc_id",
                                   k: int = SHINGLE_K,
                                   sigs: DataFrame | None = None) -> DataFrame:
    """The EXTREME-DUPLICATION-SAFE ingest dedup — the chain/sketch
    twin of :func:`incremental_dedup_delta`, with both unbounded
    costs replaced by their fixed-size counterparts:

    - **Candidates**: instead of pairing each delta doc with EVERY
      bucket cohabitant (∝ duplication density — 10M pairs on the
      100-copy sf10 replica), each delta doc pairs only with its
      immediate smaller-id PREDECESSOR per LSH bucket (one lag per
      band): ≤ n_bands candidates per delta doc at ANY density. In a
      tight bucket (members near-dups of each other — the regime
      extreme duplication creates) the predecessor verifies iff the
      doc is a dup, the ``dedup_keep_best_chain`` argument.
    - **Verify payload**: bottom-k sketches (fixed k_sketch hashes
      per doc) instead of full shingle sets.

    Output: (doc_id, status, best_jaccard_est) per delta doc; status
    attribution (dup_of_base when any verified predecessor is a base
    doc, else dup_in_delta) follows the verifying partner — chain
    attribution, exact for tight buckets. Statuses stay deterministic
    (lag order is doc_id; the estimator is exact md5 arithmetic), so
    the DuckDB twin hash-gates the whole pipeline including the
    estimate."""
    is_delta = F.col("doc_id") % delta_mod == 0
    if sigs is None:
        # Self-contained fallback; production callers pass the
        # maintained signature index (see incremental_dedup_delta).
        sigs = minhash_signatures(docs, text_col, id_col).localCheckpoint()
    bands = _band_hashes(sigs)
    w = Window.partitionBy("band_idx", "band_hash").orderBy("doc_id")
    cand = (
        bands.withColumn("doc_b", F.lag("doc_id").over(w))
        .filter(is_delta & F.col("doc_b").isNotNull())
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
        .localCheckpoint()  # candidate-sized; feeds ids + verify
    )
    # Sketch ONLY candidate docs — the verify payload is fixed-size
    # per doc AND built from a candidate-restricted shingle pass.
    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    ).join(ids, "doc_id", "left_semi")
    sets = shingle_sets(cand_docs, "_t", "doc_id", k).localCheckpoint(
        eager=True)
    verified = (
        jaccard_bottomk_verify(cand, bottomk_sketches(sets, k_sketch),
                               k_sketch)
        .filter(F.col("jaccard_est") >= threshold)
        .localCheckpoint(eager=True)
    )
    stats = verified.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.max((F.col("doc_b") % delta_mod != 0).cast("int"))
        .alias("has_base"),
        F.max("jaccard_est").alias("best_jaccard_est"),
    )
    return (
        docs.filter(is_delta)
        .select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("has_base") == 1, F.lit("dup_of_base"))
            .when(F.col("best_jaccard_est").isNotNull(),
                  F.lit("dup_in_delta"))
            .otherwise(F.lit("unique"))
            .alias("status"),
            F.col("best_jaccard_est"),
        )
    )


def incremental_dedup_delta_sketch_sql(threshold: float = 0.35,
                                       delta_mod: int = 5,
                                       k_sketch: int = BOTTOM_K,
                                       k: int = SHINGLE_K) -> str:
    """DuckDB twin of :func:`incremental_dedup_delta_sketch`."""
    return f"""
        WITH bands AS MATERIALIZED ({_minhash_bands_sql()}),
        cand AS MATERIALIZED (
          SELECT doc_a, doc_b FROM (
            SELECT doc_id AS doc_a,
                   lag(doc_id) OVER (PARTITION BY band_idx, band_hash
                                     ORDER BY doc_id) AS doc_b
            FROM bands
          )
          WHERE doc_a % {delta_mod} = 0 AND doc_b IS NOT NULL
          GROUP BY doc_a, doc_b
        ),
        sk AS MATERIALIZED (
          SELECT doc_id,
                 list_slice(list_sort(list_transform({shingle_set_sql(k)},
                                                     s -> md5(s))),
                            1, {k_sketch}) AS sk
          FROM documents
        ),
        est AS MATERIALIZED (
          SELECT doc_a, doc_b, j FROM (
            SELECT c.doc_a, c.doc_b,
                   CAST(len(list_intersect(list_intersect(
                          list_slice(list_sort(list_distinct(a.sk || b.sk)),
                                     1, {k_sketch}), a.sk), b.sk)) AS DOUBLE)
                   / CAST(len(list_slice(list_sort(list_distinct(
                                a.sk || b.sk)), 1, {k_sketch})) AS DOUBLE)
                   AS j
            FROM cand c
            JOIN sk a ON a.doc_id = c.doc_a
            JOIN sk b ON b.doc_id = c.doc_b
          ) WHERE j >= {threshold}
        ),
        stats AS (
          SELECT doc_a AS doc_id,
                 MAX(CASE WHEN doc_b % {delta_mod} != 0
                     THEN 1 ELSE 0 END) AS has_base,
                 MAX(j) AS best_jaccard_est
          FROM est GROUP BY doc_a
        )
        SELECT d.doc_id,
               CASE WHEN s.has_base = 1 THEN 'dup_of_base'
                    WHEN s.best_jaccard_est IS NOT NULL THEN 'dup_in_delta'
                    ELSE 'unique' END AS status,
               s.best_jaccard_est
        FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
        WHERE d.doc_id % {delta_mod} = 0
    """


# -------------------------------------------------- sketch-accuracy audit

def minhash_estimate_error(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           n_perm: int = N_PERMUTATIONS,
                           band_size: int = BAND_SIZE,
                           k: int = SHINGLE_K,
                           sample_nibbles: int = 1,
                           sigs: DataFrame | None = None,
                           pairs: DataFrame | None = None) -> DataFrame:
    """Sketch-accuracy audit ("measure, don't guess" applied to the
    dedup pipeline itself): for a deterministic sample of LSH
    candidate pairs, the MinHash signature-agreement estimate of
    Jaccard next to the EXACT n-gram Jaccard → (doc_a, doc_b,
    est_jaccard, exact_jaccard, abs_err). Feeding this into a
    threshold sweep is how the ``min_jaccard`` verify cut in
    ``dedup_pipeline_keep_best`` gets chosen from data rather than
    folklore.

    Scale shape — the audit PROBES, it never rebuilds: candidates
    come from the banded Σ bucket² self-join over ``sigs`` (pass the
    session-maintained signature index; in production this IS the
    stored LSH index, so the audit's corpus-wide cost is zero) and
    are SAMPLED 16^-``sample_nibbles`` (leading md5 nibbles of the
    pair key) BEFORE anything touches document text. Only documents
    that survive into a sampled pair are then normalize+shingled for
    the exact verifier — a semi-join-restricted scan proportional to
    the SAMPLE, not the corpus. The sample is what makes the audit
    scale-safe at high duplication density: in a clone-heavy corpus
    the candidate-pair list itself is quadratic in clone-group size
    (the lesson behind ``dedup_keep_best_chain`` — measured 245 s /
    289 k pairs at the sf1 near-dup sweep unsampled, and an estimator
    audit needs a sample, not the census; raise ``sample_nibbles``
    with corpus size to hold the sample constant). md5 exists in both
    engines, so the sample is deterministic and the oracle replays it
    exactly. Values are exact rationals (matches/n_perm, |∩|/|∪|)
    divided once into doubles, so the audit is hash-gateable
    bit-for-bit."""
    if sigs is None:
        # Self-contained fallback (driver correctness path): build the
        # signature index in-query. MIN over the shingle multiset ==
        # MIN over the distinct set, so this equals the from-sets form
        # the previous revision used.
        # Checkpoint here (the shared-index path arrives already
        # materialized): the band join and the sig_small probe below
        # both re-read it.
        sigs = minhash_signatures(df, text_col, id_col, n_perm, k)
        sigs = sigs.localCheckpoint()
    if pairs is None:
        pairs = _candidate_pairs_from_bands(
            _band_hashes(sigs, n_perm, band_size))
    if sample_nibbles > 0:
        pairs = pairs.filter(
            F.substring(
                F.md5(F.concat_ws("|", "doc_a", "doc_b")),
                1, sample_nibbles,
            ) == "0" * sample_nibbles
        )
    # The sampled pair list is tiny — checkpoint it so the id
    # restriction, est join and exact join below don't each replay
    # the band self-join.
    pairs = pairs.localCheckpoint()
    ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # Shingle ONLY the sampled docs: keyed left-semi restriction of
    # the corpus before the normalize+shingle scan (AQE broadcasts
    # the id list while it's small; at a sample size where it isn't,
    # the semi join is still one keyed linear pass, never Σ n²).
    sampled_docs = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    ).join(ids, "doc_id", "left_semi")
    sets = shingle_sets(sampled_docs, "_t", "doc_id", k)
    sig_small = sigs.join(ids, "doc_id", "left_semi")
    pa = sig_small.join(sets, "doc_id").select(
        F.col("doc_id").alias("doc_a"),
        F.col("signature").alias("sig_a"),
        F.col("sh").alias("sh_a"),
    )
    pb = sig_small.join(sets, "doc_id").select(
        F.col("doc_id").alias("doc_b"),
        F.col("signature").alias("sig_b"),
        F.col("sh").alias("sh_b"),
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    est = (matches.cast("double") / F.lit(float(n_perm)))
    exact = inter.cast("double") / union.cast("double")
    return (
        pairs.join(pa, "doc_a")
        .join(pb, "doc_b")
        .select(
            "doc_a", "doc_b",
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
            F.abs(est - exact).alias("abs_err"),
        )
    )


def minhash_estimate_error_sql(n_perm: int = N_PERMUTATIONS,
                               k: int = SHINGLE_K,
                               sample_nibbles: int = 1) -> str:
    """DuckDB twin: signatures/bands re-derived from text (MIN over
    the shingle multiset equals MIN over the distinct set, so the
    from-sets Spark path and this from-text SQL agree), estimate via
    positionwise signature agreement, exact Jaccard via
    list_intersect on the distinct shingle sets."""
    band_size = BAND_SIZE
    n_bands = n_perm // band_size
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5({concat}) AS band_hash FROM sigs".format(
            b=b,
            concat=" || '|' || ".join(
                f"signature[{b * band_size + j + 1}]" for j in range(band_size)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
        WITH sigs AS MATERIALIZED ({_minhash_sig_sql(n_perm, k)}),
        bands AS MATERIALIZED ({band_rows}),
        pairs AS (
          SELECT doc_a, doc_b FROM (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
          )
          WHERE substring(md5(doc_a || '|' || doc_b), 1, {sample_nibbles})
                = '{"0" * sample_nibbles}'
        ),
        sets AS MATERIALIZED (
          SELECT doc_id, {shingle_set_sql(k)} AS sh FROM documents
        ),
        est AS (
          SELECT p.doc_a, p.doc_b,
                 CAST(len(list_filter(range(1, {n_perm + 1}),
                          i -> sa.signature[i] = sb.signature[i])) AS DOUBLE)
                   / {float(n_perm)} AS est_jaccard
          FROM pairs p
          JOIN sigs sa ON sa.doc_id = p.doc_a
          JOIN sigs sb ON sb.doc_id = p.doc_b
        ),
        exact AS (
          SELECT p.doc_a, p.doc_b,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / CAST(len(a.sh) + len(b.sh)
                          - len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   AS exact_jaccard
          FROM pairs p
          JOIN sets a ON a.doc_id = p.doc_a
          JOIN sets b ON b.doc_id = p.doc_b
        )
        SELECT e.doc_a, e.doc_b, e.est_jaccard, x.exact_jaccard,
               abs(e.est_jaccard - x.exact_jaccard) AS abs_err
        FROM est e
        JOIN exact x ON x.doc_a = e.doc_a AND x.doc_b = e.doc_b
    """
