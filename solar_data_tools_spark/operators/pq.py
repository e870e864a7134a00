"""Product quantization (PQ) for embedding compression and ADC search.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search" (IEEE TPAMI 2011): split a d-dim vector into ``m`` contiguous
subvectors of ``d/m`` dims, vector-quantize each subspace against its
own ``k``-codeword codebook, and store only the ``m`` small codes
(m bytes per vector at k<=256 instead of 4*d). Query-to-vector distance
is approximated by Asymmetric Distance Computation (ADC): per query,
precompute the m x k table of EXACT query-subvector-to-codeword squared
distances once, then any candidate's distance is the sum of m table
lookups — candidates are never decompressed.

Scale shape (the reason PQ exists at 10^9+ vectors):

* the codebook is k*d doubles total — a plan LITERAL (one nested-array
  node, the LSH-planes pattern), never a join side and never shuffled;
* :func:`pq_encode` is a zero-shuffle, stream-legal projection over
  the corpus — Arrow-batched numpy by default (PQ encode is dense
  linear algebra; the lambda-expression path runs interpreted and
  measured ~100x slower at the 500k probe), with a pure-expression
  engine kept for exact SQL replayability;
* :func:`pq_adc_topk` precomputes each query's LUT in a projection on
  the (tiny) query side, broadcasts it onto the codes table, and scans
  codes rows that are 8-64 bytes wide instead of 4*d — the corpus
  embedding column is read exactly once, at encode time.

The search path is Spark built-ins only (nested array literals +
statically-unrolled element_at sums — NOT lambda folds, which are
CodegenFallback and run interpreted per row); the only shuffle anywhere
is the final per-query top-k.

The k-means trainer mirrors ``similarity.train_ivf_centroids``: a
bounded, seeded-hash-bottom driver sample (unbiased — the hash order is
a pseudorandom permutation of ids — yet deterministic and invariant to
partitioning/task retries). With ``n_iters=0`` the codebook degrades to
"the k hash-smallest sample rows' subvectors", a rule simple enough to
replay in ANSI SQL — which is exactly how the q141/q142 DuckDB oracles
certify the encode/ADC math end-to-end.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shape(codebooks: np.ndarray) -> tuple[int, int, int]:
    cb = np.asarray(codebooks, dtype=np.float64)
    if cb.ndim != 3:
        raise ValueError(f"codebooks must be (m, k, ds), got shape {cb.shape}")
    return cb.shape


def codebook_literal(codebooks: np.ndarray) -> Column:
    """The (m, k, ds) codebook as ONE nested array literal column —
    a single plan node regardless of size (k*d doubles ~ 8 KB for the
    classic m=8, k=256, d=64 layout)."""
    cb = np.asarray(codebooks, dtype=np.float64)
    return F.lit([[[float(x) for x in cw] for cw in sub] for sub in cb])


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 65536,
    n_iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace Lloyd's k-means on a seeded-hash-bottom driver
    sample. Returns an (m, k, d/m) float array.

    Determinism contract (shared with the IVF trainers): the sample is
    the ``sample_cap`` rows with the smallest ``md5(seed, id)``, taken
    IN HASH ORDER; subspace j's initial codewords are the first k
    sample rows' j-th subvectors. Lloyd's updates assign by squared
    Euclidean distance (ties -> lowest code), means update each cell,
    and an empty cell keeps its previous codeword — so the result is a
    pure function of (corpus keys, seed, m, k, n_iters), independent of
    partitioning. ``n_iters=0`` returns the init itself, the
    SQL-replayable rule the external oracles certify against.
    """
    from solar_data_tools_spark.operators.sampling import hash_uniform

    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(hash_uniform(F.col(id_col), seed), F.col(id_col))
        .limit(sample_cap)
        .toPandas()
    )
    if sample.empty:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if len(mat) < k:
        raise ValueError(f"sample of {len(mat)} rows cannot seed k={k} codewords")
    ds = d // m
    books = np.empty((m, k, ds), dtype=np.float64)
    for j in range(m):
        sub = mat[:, j * ds : (j + 1) * ds]
        cent = sub[:k].copy()  # hash-order heads: the n_iters=0 oracle rule
        for _ in range(n_iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)  # argmin ties -> lowest code
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def _sqdist_expr(vec_sql: str, cw_sql: str) -> str:
    """Squared Euclidean distance between two array<double> SQL exprs,
    folded left-to-right (element order) so the double result is
    bit-reproducible across engines."""
    return (
        f"aggregate(zip_with({vec_sql}, {cw_sql}, (x, y) -> (x - y) * (x - y)), "
        "cast(0.0 as double), (a, v) -> a + v)"
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    engine: str = "pandas",
) -> DataFrame:
    """Encode each vector to its m nearest-codeword codes. Output:
    ``(id_col, codes array<int>, qerr double)`` where ``qerr`` is the
    total squared quantization error. Argmin ties resolve to the LOWEST
    code on both engines.

    Two physical engines, identical semantics (parity-tested):

    * ``"pandas"`` (default, the scale path) — Arrow-batched
      ``mapInPandas``; each batch encodes as m vectorized numpy distance
      matrices. PQ encode is dense linear algebra, and this is ~100x the
      expr path: the 500k x dim-64 probe measured 470 s for the lambda
      expression vs ~5 s here, because Spark evaluates higher-order-
      function lambdas INTERPRETED per row (HOFs are CodegenFallback —
      "one codegen projection" is a false friend for nested
      aggregate/transform chains).
    * ``"expr"`` — pure Spark expressions, zero Python: the argmin is a
      fold over the codeword sequence with strict ``<``. Bit-exact
      reproducible in ANSI SQL (every distance folds element-by-element
      in order), which is what the q141/q142 DuckDB oracles certify;
      use it where cross-engine hash equality matters more than speed.
    """
    m, k, ds = _shape(codebooks)
    if engine == "pandas":
        import pandas as pd

        books = np.asarray(codebooks, dtype=np.float64)
        out_id = id_col

        def _encode(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                codes = np.empty((len(mat), m), dtype=np.int32)
                err = np.zeros(len(mat))
                for j in range(m):
                    sub = mat[:, j * ds : (j + 1) * ds]
                    d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(
                        axis=2
                    )
                    cj = np.argmin(d2, axis=1)
                    codes[:, j] = cj
                    err += d2[np.arange(len(mat)), cj]
                yield pd.DataFrame(
                    {
                        out_id: pdf[out_id].to_numpy(),
                        "codes": [list(map(int, c)) for c in codes],
                        "qerr": err,
                    }
                )

        prepared = embeddings.select(
            F.col(id_col),
            F.expr(f"transform({vec_col}, x -> cast(x as double))").alias(
                "_v"
            ),
        )
        id_type = dict(prepared.dtypes)[id_col]
        return prepared.mapInPandas(
            _encode,
            schema=f"{id_col} {id_type}, codes array<int>, qerr double",
        )
    if engine != "expr":
        raise ValueError(f"unknown engine {engine!r}")
    # argmin via fold; the single-element transform(array(...)) wrapper
    # is the SQL let-binding idiom: the distance is computed once per
    # (subspace, codeword), not once for the compare and once for the use
    dist = _sqdist_expr(
        f"slice(_v, j * {ds} + 1, {ds})",
        "element_at(element_at(_cb, j + 1), c + 1)",
    )
    codes_struct = (
        f"transform(sequence(0, {m - 1}), j -> "
        f"aggregate(sequence(0, {k - 1}), "
        "named_struct('d', cast('Infinity' as double), 'c', -1), "
        f"(acc, c) -> element_at(transform(array({dist}), "
        "dd -> if(dd < acc.d, named_struct('d', dd, 'c', c), acc)), 1)))"
    )
    return (
        embeddings.select(
            F.col(id_col),
            F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_v"),
        )
        .withColumn("_cb", codebook_literal(codebooks))
        .withColumn("_cs", F.expr(codes_struct))
        .select(
            F.col(id_col),
            F.expr("transform(_cs, s -> s.c)").alias("codes"),
            F.expr(
                "aggregate(_cs, cast(0.0 as double), (a, s) -> a + s.d)"
            ).alias("qerr"),
        )
    )


def pq_decode(
    codes: DataFrame,
    codebooks: np.ndarray,
    codes_col: str = "codes",
) -> DataFrame:
    """Reconstruct the quantized approximation of each vector (concat of
    its m codewords) — the re-rank/debug path. Pure projection."""
    m, _, _ = _shape(codebooks)
    expr = (
        f"flatten(transform(sequence(0, {m - 1}), "
        f"j -> element_at(element_at(_cb, j + 1), "
        f"element_at({codes_col}, j + 1) + 1)))"
    )
    return (
        codes.withColumn("_cb", codebook_literal(codebooks))
        .withColumn("decoded", F.expr(expr))
        .drop("_cb")
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k: per query, precompute the m x n_codewords LUT of exact
    query-subvector-to-codeword squared distances (a projection on the
    tiny query side), broadcast it onto the codes table, and score each
    candidate as the sum of m lookups — the corpus is scanned as
    (id, codes) rows only.

    Ranking is ``(adc_dist ASC, id ASC)``; both engines fold the m
    lookups left-to-right over identical doubles, so ranks are
    deterministic. Output: (query_id, vec_id, adc_dist, rank<=k).
    """
    m, kk, ds = _shape(codebooks)
    lut_cell = _sqdist_expr(
        f"slice(_q, j * {ds} + 1, {ds})",
        "element_at(element_at(_cb, j + 1), c + 1)",
    )
    lut = (
        f"transform(sequence(0, {m - 1}), j -> "
        f"transform(sequence(0, {kk - 1}), c -> {lut_cell}))"
    )
    q = (
        queries.select(
            F.col(query_id_col),
            F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_q"),
        )
        .withColumn("_cb", codebook_literal(codebooks))
        .select(query_id_col, F.expr(lut).alias("_lut"))
    )
    # unrolled static sum — element_at chains are ordinary codegen
    # expressions; a lambda fold here would run INTERPRETED on every
    # (candidate, query) pair (the probe measured ~100x for encode)
    dist = " + ".join(
        f"element_at(element_at(_lut, {j + 1}), "
        f"element_at(codes, {j + 1}) + 1)"
        for j in range(m)
    )
    scored = codes.crossJoin(F.broadcast(q))
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    scored = scored.withColumn("adc_dist", F.expr(dist))
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc_dist"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )


def _centroid_lit(centroids: np.ndarray) -> Column:
    cent = np.asarray(centroids, dtype=np.float64)
    if cent.ndim != 2:
        raise ValueError(f"centroids must be (n_cells, d), got {cent.shape}")
    return F.lit([[float(x) for x in c] for c in cent])


def ivfpq_build(
    embeddings: DataFrame,
    n_cells: int = 16,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 65536,
    n_iters: int = 10,
    seed: int = 42,
    engine: str = "pandas",
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """IVF-PQ index build (the FAISS IVFPQ architecture): a coarse L2
    quantizer splits the corpus into ``n_cells`` inverted lists, and
    each vector's RESIDUAL from its cell centroid is product-quantized
    — residuals are far more concentrated than raw vectors, so the same
    code budget buys much lower distortion.

    The coarse quantizer is trained as PQ-with-one-subspace
    (:func:`train_pq_codebooks` with ``m=1, k=n_cells``), inheriting the
    whole determinism contract; cell assignment and residual formation
    are one codegen projection (centroids ride as a literal), and the
    residual codebooks train on the residual frame via the same seeded
    sample. Returns ``(centroids (n_cells, d), codebooks (m, k, d/m),
    codes_df)`` where ``codes_df`` = (id, cell, codes, qerr) — the
    complete compressed index: 1 + m small ints per vector.
    """
    coarse3 = train_pq_codebooks(
        embeddings, m=1, k=n_cells, vec_col=vec_col, id_col=id_col,
        sample_cap=sample_cap, n_iters=n_iters, seed=seed,
    )
    centroids = coarse3[0]  # (n_cells, d)
    cells = pq_encode(embeddings, coarse3, vec_col, id_col, engine).select(
        F.col(id_col), F.col("codes")[0].alias("cell")
    )
    d = centroids.shape[1]
    if d <= 256:
        # statically unrolled subtraction: zip_with's lambda runs
        # interpreted per CORPUS row (the HOF CodegenFallback trap);
        # d element_at subtractions are ordinary codegen
        resid_expr = "array(" + ", ".join(
            f"element_at(_v, {i + 1}) - "
            f"element_at(element_at(_cent, cell + 1), {i + 1})"
            for i in range(d)
        ) + ")"
    else:  # plan-bloat guard for very wide vectors
        resid_expr = (
            "zip_with(_v, element_at(_cent, cell + 1), (x, c) -> x - c)"
        )
    resid = (
        embeddings.select(
            F.col(id_col),
            F.expr(
                f"transform({vec_col}, x -> cast(x as double))"
            ).alias("_v"),
        )
        .join(cells, id_col)
        .withColumn("_cent", _centroid_lit(centroids))
        .select(
            F.col(id_col),
            F.col("cell"),
            F.expr(resid_expr).alias(vec_col),
        )
    )
    books = train_pq_codebooks(
        resid, m=m, k=k, vec_col=vec_col, id_col=id_col,
        sample_cap=sample_cap, n_iters=n_iters, seed=seed + 1,
    )
    codes = pq_encode(resid, books, vec_col, id_col, engine).join(
        resid.select(id_col, "cell"), id_col
    )
    # an index BUILD is a materialization: without this, every search
    # re-executes the assign→residual→encode lineage (the 500k probe
    # measured the search at build cost, 47 s, instead of scan cost)
    return centroids, books, codes.localCheckpoint(eager=False)


def ivfpq_topk(
    codes: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-PQ search: each query probes its ``n_probe`` L2-nearest cells
    and scores ONLY those cells' codes by residual-space ADC —
    ``d(q, x)^2 ≈ sum_j ||(q - centroid_cell)_j - codeword_{j,code_j}||^2``.

    Plan shape: the probe frame is queries x n_probe rows, each carrying
    its per-cell residual LUT (computed in a projection, centroid +
    codebook literals); it broadcasts onto the codes table as a cell
    equi-join, so a query touches ~n_probe/n_cells of the corpus and
    the corpus side never materializes anything wider than
    (id, cell, m codes). The final top-k is the only shuffle.
    """
    m, kk, ds = _shape(codebooks)
    cent = np.asarray(centroids, dtype=np.float64)
    n_probe = min(n_probe, len(cent))
    # per-query cell ranking by exact L2 to each centroid
    cell_d = _sqdist_expr("_q", "element_at(_cent, c + 1)")
    probes = (
        queries.select(
            F.col(query_id_col),
            F.expr(
                f"transform({vec_col}, x -> cast(x as double))"
            ).alias("_q"),
        )
        .withColumn("_cent", _centroid_lit(cent))
        .withColumn(
            "_pc",
            F.expr(
                f"slice(array_sort(transform(sequence(0, {len(cent) - 1}), "
                f"c -> named_struct('d', {cell_d}, 'cell', c))), 1, {n_probe})"
            ),
        )
        .select(
            query_id_col, "_q", "_cent",
            F.explode(F.expr("transform(_pc, s -> s.cell)")).alias("cell"),
        )
    )
    # residual LUT per (query, probed cell)
    lut_cell = _sqdist_expr(
        f"slice(_qr, j * {ds} + 1, {ds})",
        "element_at(element_at(_cb, j + 1), c + 1)",
    )
    lut = (
        f"transform(sequence(0, {m - 1}), j -> "
        f"transform(sequence(0, {kk - 1}), c -> {lut_cell}))"
    )
    probes = (
        probes.withColumn(
            "_qr",
            F.expr("zip_with(_q, element_at(_cent, cell + 1), (x, c) -> x - c)"),
        )
        .withColumn("_cb", codebook_literal(codebooks))
        .select(query_id_col, "cell", F.expr(lut).alias("_lut"))
    )
    # unrolled static sum — element_at chains are ordinary codegen
    # expressions; a lambda fold here would run INTERPRETED on every
    # (candidate, query) pair (the probe measured ~100x for encode)
    dist = " + ".join(
        f"element_at(element_at(_lut, {j + 1}), "
        f"element_at(codes, {j + 1}) + 1)"
        for j in range(m)
    )
    scored = codes.join(F.broadcast(probes), on="cell")
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    scored = scored.withColumn("adc_dist", F.expr(dist))
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc_dist"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cell", "adc_dist", "rank")
    )
