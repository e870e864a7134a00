"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k as the correctness baseline, plus an LSH-bucketed
variant (random hyperplane signatures) as the 100 TB scale path.

Dot products use ``zip_with`` + ``aggregate`` — built-in higher-order
functions evaluated JVM-side, sequential left fold, so results are
bit-reproducible against a single-node oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(l2_norm_sq(a) * l2_norm_sq(b))


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(
        vec_col, F.expr(f"transform({vec_col}, x -> cast(x as double))")
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    vectorized: bool = True,
    engine: str | None = None,
    query_cap: int = 4096,
) -> DataFrame:
    """Exact cosine top-k of the query set against the corpus.

    Three scoring engines, bit-identical results (every engine folds the
    dot product SEQUENTIALLY over dimension j, so cosines match the
    ``aggregate()`` built-in and the single-node oracle to the last ulp):

      * ``"map"`` (default) — the query matrix is collected driver-side
        (bounded by ``query_cap`` — this is a top-k SEARCH operator, the
        query set is the small side by contract; note the collect runs
        at CALL time, not action time) and closed over a
        ``mapInPandas`` pass, so each corpus vector crosses the Arrow
        boundary ONCE instead of once per query. When the query set
        exceeds ``query_cap`` under the DEFAULT dispatch, the call
        falls back to the lazy ``join-pandas`` engine instead of
        raising (an explicit ``engine="map"`` still raises — the caller
        asked for the bounded engine by name). Round-7 warm local[32]
        medians at sf0.1 (50k x 64-dim): parity with the join engine at
        10 queries (~0.72 s, Arrow batching amortizes the duplication),
        1.8x faster at 100 queries (0.92 s vs 1.63 s) — the join ships
        the corpus once PER QUERY, so its cost grows linearly in the
        query count while this engine's input traffic stays constant.
      * ``"join-pandas"`` (``vectorized=True`` legacy) — broadcast
        non-equi join + Arrow-batched pandas-UDF cosine per pair.
      * ``"join-hof"`` (``vectorized=False`` legacy) — pure
        ``zip_with``/``aggregate`` built-ins; slowest (interpreted HOF)
        but zero Python.

    The corpus never shuffles in any engine — only the final
    (query_id)-partitioned rank shuffles.

    Output: (query_id, vec_id, cosine_sim, rank), rank 1..k, ties broken
    by vec_id for determinism.
    """
    explicit_engine = engine is not None
    if engine is None:
        engine = "map" if vectorized else "join-hof"
    corpus = _as_double(embeddings, vec_col).select(
        F.col(id_col), F.col(vec_col).alias("_cvec")
    )
    q = _as_double(queries, vec_col).select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )

    if engine == "map":
        qrows = q.limit(query_cap + 1).collect()
        if len(qrows) > query_cap:
            if explicit_engine:
                raise ValueError(
                    f"brute_force_topk(engine='map'): query set exceeds "
                    f"query_cap={query_cap}; pass engine='join-pandas' "
                    "for corpus-sized query sets (or raise query_cap)"
                )
            # default dispatch (vectorized=True): fall back to the lazy
            # join engine rather than erroring — the map engine's
            # driver-side query matrix is an optimization, not a
            # contract, and pre-round-7 callers with large query sets
            # got the join engine by default. The fallback must actually
            # DISPATCH to the join path: the collected qrows above are a
            # TRUNCATED limit(query_cap+1) sample, so running the map
            # body on them would silently drop queries beyond the cap
            # (and which ones survive would be nondeterministic).
            engine = "join-pandas"
            qrows = None
    if engine == "map":
        if qrows:
            qids = [r[query_id_col] for r in qrows]
            Q = np.array([r["_qvec"] for r in qrows], dtype=np.float64)
            nq, d = Q.shape
            qnorm = np.zeros(nq)
            for j in range(d):
                qnorm += Q[:, j] * Q[:, j]
            id_type = dict(corpus.select(id_col).dtypes)[id_col]
            qid_type = dict(q.select(query_id_col).dtypes)[query_id_col]
            schema = (
                f"{query_id_col} {qid_type}, {id_col} {id_type}, "
                "cosine_sim double"
            )

            def _score(batches):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    A = np.stack(pdf["_cvec"].to_numpy())
                    m = len(A)
                    na = np.zeros(m)
                    for j in range(d):
                        na += A[:, j] * A[:, j]
                    frames = []
                    for qi in range(nq):
                        dots = np.zeros(m)
                        for j in range(d):
                            dots += A[:, j] * Q[qi, j]
                        frames.append(
                            pd.DataFrame(
                                {
                                    query_id_col: qids[qi],
                                    id_col: pdf[id_col].to_numpy(),
                                    "cosine_sim": dots
                                    / np.sqrt(na * qnorm[qi]),
                                }
                            )
                        )
                    yield pd.concat(frames, ignore_index=True)

            scored = corpus.mapInPandas(_score, schema).where(
                F.col(id_col) != F.col(query_id_col)
            )
        else:
            # empty query set -> empty result via the join shape
            scored = corpus.join(
                F.broadcast(q), F.col(id_col) != F.col(query_id_col)
            ).withColumn("cosine_sim", F.lit(0.0))
    else:
        joined = corpus.join(
            F.broadcast(q), F.col(id_col) != F.col(query_id_col)
        )
        if engine == "join-pandas":
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("double")
            def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
                A = np.stack(a.to_numpy())
                B = np.stack(b.to_numpy())
                # sequential left-fold per row (matches aggregate()/
                # oracle bit-for-bit; np.sum pairwise summation would
                # differ in ulps)
                dots = np.zeros(len(A))
                na = np.zeros(len(A))
                nb = np.zeros(len(A))
                for j in range(A.shape[1]):
                    dots += A[:, j] * B[:, j]
                    na += A[:, j] * A[:, j]
                    nb += B[:, j] * B[:, j]
                return pd.Series(dots / np.sqrt(na * nb))

            scored = joined.withColumn(
                "cosine_sim", _cos(F.col("_qvec"), F.col("_cvec"))
            )
        elif engine == "join-hof":
            scored = joined.withColumn(
                "cosine_sim", cosine(F.col("_qvec"), F.col("_cvec"))
            )
        else:
            raise ValueError(f"unknown engine {engine!r}")
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def random_hyperplane_signatures(
    embeddings: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "pandas",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Cosine-LSH bit signature: bit_i = sign(v . plane_i).

    Two physical engines, same semantics:

    * ``"pandas"`` (default, the scale path) — Arrow-batched numpy,
      one BLAS matmul per batch against the plane matrix. The
      lambda-fold form below runs INTERPRETED (HOFs are
      CodegenFallback): 500k x 32 planes x dim 64 measured ~230 s vs
      seconds here. Sign flips vs the sequential fold require a dot
      product within float reassociation error of zero (~1e-15) — not
      reachable with continuous data and random planes.
    * ``"expr"`` — zero Python: ``planes`` ships as a SINGLE
      nested-array literal (one plan node, not one subtree per
      coefficient) and the signature is a fold over plane indices with
      the same sequential zip_with dot as ``dot()``, bit-identical to
      the per-plane form. Use where a Python-free plan matters more
      than throughput.
    """
    carry = carry_cols or []
    if engine == "pandas":
        import numpy as np
        import pandas as pd

        pmat = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
        weights = 1 << np.arange(pmat.shape[1], dtype=np.int64)

        def _sign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                sigs = ((mat @ pmat) >= 0) @ weights
                yield pd.DataFrame(
                    {
                        "_id": pdf["_id"].to_numpy(),
                        "_v": pdf["_v"],
                        **{c: pdf[c].to_numpy() for c in carry},
                        "lsh_sig": sigs.astype(np.int64),
                    }
                )

        prepared = _as_double(
            embeddings.select(id_col, vec_col, *carry), vec_col
        ).select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            *[F.col(c) for c in carry],
        )
        dtypes = dict(embeddings.select(id_col, *carry).dtypes)
        carry_schema = "".join(f", {c} {dtypes[c]}" for c in carry)
        out = prepared.mapInPandas(
            _sign,
            schema=(
                f"_id {dtypes[id_col]}, _v array<double>"
                f"{carry_schema}, lsh_sig long"
            ),
        )
        return out.select(
            F.col("_id").alias(id_col),
            F.col("_v").alias(vec_col),
            *[F.col(c) for c in carry],
            "lsh_sig",
        )
    if engine != "expr":
        raise ValueError(f"unknown engine {engine!r}")
    df = _as_double(embeddings, vec_col).withColumn(
        "_planes", F.lit([[float(x) for x in p] for p in planes])
    )
    sig = F.expr(
        f"aggregate(sequence(0, {len(planes) - 1}), 0L, (acc, i) -> "
        "acc + shiftleft(if("
        f"aggregate(zip_with({vec_col}, element_at(_planes, i + 1), "
        "(x, y) -> x * y), cast(0.0 as double), (s, t) -> s + t) >= 0, "
        "1L, 0L), i))"
    )
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        *[F.col(c) for c in carry],
        sig.alias("lsh_sig"),
    )


def seeded_hyperplanes(
    n_planes: int, dim: int, seed: int = 0
) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for the cosine-LSH family —
    the seeded constructor so ``method="lsh"`` callers
    (``embedding_cosine_duplicates``, ``embedding_incremental_dedup``,
    ``lsh_topk``) never hand-build plane lists. numpy
    ``Generator(PCG64(seed))`` is specified to be stable across
    platforms and processes, so every executor, every dump, and every
    replay derives the SAME family from the seed — which is the
    incremental-store contract: a persisted ``lsh_sig`` column is only
    reusable if later dumps sign with identical planes. Persist the
    seed (and n_planes/dim) alongside the store the way
    ``minhash_band_store`` persists ``band_r``.

    The signature geometry is the recall knob: P(bit differs) =
    theta/pi per plane, so for a target cosine threshold t, pairs at
    exactly t differ in ``n_planes * arccos(t) / pi`` expected bits —
    size ``max_hamming`` above that with margin. MEASURED
    (tools/probe_lsh_recall.py, 64 planes, threshold 0.9, planted
    pairs at exact cosines): expected differing bits are 6.5 / 8.2 /
    9.0 at cosine 0.95 / 0.92 / 0.905, and recall at max_hamming
    6 / 10 / 14 is 0.55/0.27/0.18 → 0.95/0.81/0.73 → 1.00/0.99/0.98 —
    i.e. a budget AT the expected bits halves recall (binomial spread
    is ~2.7 bits there), a budget ~5 bits above (~2 sigma) recovers
    ~98%+. False accepts were 0 at every geometry (the exact-cosine
    verify makes the path conservative: it misses, never invents).
    At threshold 0.9 with 64 planes use max_hamming ~= 14; the
    default 6 is sized for near-exact duplicates (cosine >= 0.98)."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(int(seed)))
    return rng.standard_normal((int(n_planes), int(dim))).tolist()


def _band_layout(n_bits: int, bands: int) -> list[tuple[int, int]]:
    """Partition ``n_bits`` signature bits into ``bands`` contiguous
    (start, width) slices; leftover bits spread over the leading bands."""
    base, extra = divmod(n_bits, bands)
    layout, start = [], 0
    for i in range(bands):
        width = base + (1 if i < extra else 0)
        layout.append((start, width))
        start += width
    return layout


def _banded_bits(sig_col: Column, layout: list[tuple[int, int]]) -> Column:
    """array<struct<band_ix, band_bits>> — one slice of the signature per
    band, extracted with shifts/masks (pure codegen, no Python)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band_ix"),
                F.shiftright(sig_col, start)
                # width=64 (single band): (1<<64)-1 overflows LongType;
                # -1 is the all-ones 64-bit mask in two's complement
                .bitwiseAND(F.lit(-1 if width >= 64 else (1 << width) - 1))
                .alias("band_bits"),
            )
            for i, (start, width) in enumerate(layout)
        ]
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bands: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose hyperplane
    signature is within ``max_hamming`` bits of the query signature; exact
    cosine re-rank of candidates only.

    Candidate generation is a banded hash EQUI-join, never an all-pairs
    comparison: the signature is sliced into ``bands`` bit-ranges with
    ``bands > max_hamming``, so by pigeonhole any pair within
    ``max_hamming`` differing bits agrees EXACTLY on at least one band and
    is recalled by a join on (band_ix, band_bits). False candidates from
    the band join are removed by the exact Hamming filter, so results are
    identical to a full signature scan — but the corpus meets only its
    bucket collisions, and the corpus vector table itself never shuffles
    (candidates and query vectors are the broadcast sides).
    """
    n_planes = len(planes)
    if max_hamming >= n_planes:
        raise ValueError("max_hamming must be < number of hyperplanes")
    if bands is None:
        bands = max_hamming + 1
    if not (max_hamming < bands <= n_planes):
        raise ValueError("need max_hamming < bands <= n_planes for exact recall")
    layout = _band_layout(n_planes, bands)

    c_sig = random_hyperplane_signatures(embeddings, planes, id_col, vec_col)
    q_sig = random_hyperplane_signatures(
        queries.withColumnRenamed(query_id_col, id_col), planes, id_col, vec_col
    ).select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.col("lsh_sig").alias("_qsig"),
    )
    c_band = c_sig.select(
        F.col(id_col),
        F.col("lsh_sig"),
        F.explode(_banded_bits(F.col("lsh_sig"), layout)).alias("_b"),
    ).select(id_col, "lsh_sig", "_b.band_ix", "_b.band_bits")
    q_band = q_sig.select(
        F.col(query_id_col),
        F.col("_qsig"),
        F.explode(_banded_bits(F.col("_qsig"), layout)).alias("_b"),
    ).select(query_id_col, "_qsig", "_b.band_ix", "_b.band_bits")
    cand = (
        c_band.join(F.broadcast(q_band), on=["band_ix", "band_bits"])
        .where(F.col(id_col) != F.col(query_id_col))
        .where(
            F.bit_count(F.col("lsh_sig").bitwiseXOR(F.col("_qsig"))) <= max_hamming
        )
        .select(query_id_col, id_col)
        .distinct()
    )
    q_vec = q_sig.select(query_id_col, "_qvec")
    scored = (
        _as_double(embeddings, vec_col)
        .select(F.col(id_col), F.col(vec_col).alias("_cvec"))
        # no broadcast hint on cand: its size is |queries| x per-query
        # candidates, which corpus-side band skew can blow past the driver
        # at fleet scale. AQE sizes the built side at runtime and still
        # broadcasts when it is actually small; a hint would force it.
        .join(cand, on=id_col)
        .join(F.broadcast(q_vec), on=query_id_col)
        .withColumn("cosine_sim", cosine(F.col("_qvec"), F.col("_cvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_cap: int = 65536,
    n_iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Deterministic coarse quantizer for IVF: spherical k-means on a
    bounded driver-side sample (the standard IVF recipe — the quantizer
    is tiny and trained once; assignment and search stay distributed).

    The sample is the ``sample_cap`` rows with the SMALLEST
    ``md5(seed, id)`` values — a bottom-k by seeded hash. Because the
    hash order is a pseudorandom permutation of the ids, this is a
    simple random sample of the corpus (unbiased — early ids carry no
    privilege, unlike the previous lowest-id rule, which at corpus
    scale meant "train on whatever was ingested first"), yet it is
    still fully deterministic and invariant to file splits, partition
    layout, and task retries — the properties ``.sample()`` lacks and
    the reason IVF results must not vary across cluster layouts.
    Lloyd's iterations run in numpy; centroids are L2-normalized so
    nearest-centroid-by-dot == nearest-by-cosine.

    For corpora where even an unbiased 65k sample under-represents the
    cell structure, use :func:`train_ivf_centroids_distributed` — full-
    corpus Lloyd's with one assignment job per iteration.
    """
    from solar_data_tools_spark.operators.sampling import hash_uniform

    sample = (
        embeddings.select(id_col, vec_col)
        .orderBy(hash_uniform(F.col(id_col), seed), F.col(id_col))
        .limit(sample_cap)
        .toPandas()
        .sort_values(id_col)
    )
    if sample.empty:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    mat = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    unit = mat / np.maximum(norms[:, None], 1e-12)
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(unit))
    cent = unit[rng.choice(len(unit), size=k, replace=False)]
    for _ in range(n_iters):
        sims = unit @ cent.T
        assign = np.argmax(sims, axis=1)
        for j in range(k):
            members = unit[assign == j]
            if len(members):
                c = members.sum(axis=0)
                cent[j] = c / max(np.linalg.norm(c), 1e-12)
    return cent


def train_ivf_centroids_distributed(
    embeddings: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Full-corpus spherical k-means (Lloyd's) — the scale path when even
    an unbiased driver sample under-represents the cell structure (the
    SemDeDup regime, where cell COUNT should grow with corpus size and
    the quantizer must see the whole distribution).

    Per iteration, everything stays distributed except the k x d centroid
    table itself:

    * **assignment** — :func:`centroid_assign`: centroids broadcast,
      per-vector cosine in codegen, map-side ``max(struct)`` top-1
      reduce; the shuffle carries ONE row per vector.
    * **mean update** — ``posexplode`` the unit vectors and
      ``groupBy(cluster, dim).sum`` : map-side partial aggregation
      collapses each task's contribution to k x d partial sums, so the
      update shuffle moves O(tasks * k * d) rows regardless of corpus
      size. Only the aggregated k x d table is collected.

    Initialization is deterministic farthest-point (greedy max-min
    cosine distance) over a small bottom-by-seeded-hash pool — unbiased
    like the sampled trainer, diverse like k-means++ without its RNG, so
    seeds don't collapse into one dense region and results are
    reproducible and partitioning-invariant. Empty clusters keep their
    previous centroid. Centroids are L2-normalized; returns the same
    ``np.ndarray`` contract as :func:`train_ivf_centroids`, drop-in for
    :func:`ivf_topk`.
    """
    from solar_data_tools_spark.operators.sampling import hash_uniform

    spark = embeddings.sparkSession
    vecs = _as_double(embeddings.select(id_col, vec_col), vec_col)
    # spherical k-means averages UNIT vectors; normalize once up front
    unit = vecs.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col}, x -> x / greatest(sqrt(aggregate("
            f"{vec_col}, cast(0.0 as double), (a, v) -> a + v * v)), 1e-12))"
        ).alias(vec_col),
    )
    pool_pdf = (
        unit.orderBy(hash_uniform(F.col(id_col), seed), F.col(id_col))
        .limit(max(16 * n_centroids, 256))
        .toPandas()
    )
    if pool_pdf.empty:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    pool = np.stack(pool_pdf[vec_col].to_numpy()).astype(np.float64)
    k = min(n_centroids, len(pool))
    # farthest-point: start from the hash-smallest row, greedily add the
    # pool point with the lowest max-cosine to any chosen seed
    chosen = [0]
    max_sim = pool @ pool[0]
    for _ in range(1, k):
        nxt = int(np.argmin(max_sim))
        chosen.append(nxt)
        max_sim = np.maximum(max_sim, pool @ pool[nxt])
    cent = pool[chosen].copy()
    for _ in range(n_iters):
        cdf = spark.createDataFrame(
            [(int(j), [float(x) for x in cent[j]]) for j in range(k)],
            schema="cluster int, cvec array<double>",
        )
        assign = centroid_assign(
            unit, cdf, vec_col=vec_col, id_col=id_col
        ).select(id_col, "cluster")
        sums = (
            unit.join(assign, id_col)
            .select(F.col("cluster"), F.posexplode(F.col(vec_col)))
            .groupBy("cluster", "pos")
            .agg(F.sum("col").alias("s"))
            .collect()
        )
        new = np.zeros_like(cent)
        for r in sums:
            new[r["cluster"], r["pos"]] = r["s"]
        for j in range(k):
            nrm = np.linalg.norm(new[j])
            cent[j] = new[j] / nrm if nrm > 1e-12 else cent[j]
    return cent


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: the corpus is partitioned into inverted
    lists by nearest centroid; each query probes its ``n_probe`` nearest
    cells and exact-cosine re-ranks ONLY those cells' vectors.

    Scale shape: corpus cell assignment is :func:`centroid_assign`'s
    numpy engine (one matmul per Arrow batch — the per-(vector, cell)
    expression fold runs interpreted and dominated this operator's
    probe time); the probe is a cell-id equi-join, so a query touches
    ~n_probe/k of the corpus, and candidate re-ranking uses the same
    vectorized sequential-fold cosine as ``brute_force_topk``
    (bit-identical to the expression fold). Recall is the IVF trade-off
    (a true neighbor in an unprobed cell is missed) — quantified against
    brute force in tests/test_similarity_lsh.py; n_probe == n_centroids
    degrades to exact search, which the test also pins.
    """
    cent = np.asarray(centroids, dtype=np.float64)
    k_cells = len(cent)
    n_probe = min(n_probe, k_cells)
    cent_cols = [
        F.array(*[F.lit(float(x)) for x in c]) for c in cent
    ]

    def _cell_scores(vcol: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    dot(vcol, cc).alias("score"), F.lit(i).alias("cell")
                )
                for i, cc in enumerate(cent_cols)
            ]
        )

    corpus = _as_double(embeddings.select(id_col, vec_col), vec_col)
    cdf = embeddings.sparkSession.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cent)],
        schema="cluster int, cvec array<double>",
    )
    # argmax by cosine == argmax by dot for a fixed vector (its norm is
    # constant across cells), so the cosine-based assign is the same cell
    corpus_cells = corpus.join(
        centroid_assign(corpus, cdf, vec_col=vec_col, id_col=id_col)
        .select(id_col, F.col("cluster").alias("cell")),
        id_col,
    )
    qd = _as_double(
        queries.select(query_id_col, vec_col), vec_col
    ).select(query_id_col, F.col(vec_col).alias("_qvec"))
    probes = qd.select(
        query_id_col,
        "_qvec",
        F.explode(
            F.slice(
                F.sort_array(_cell_scores(F.col("_qvec")), asc=False),
                1,
                n_probe,
            )
        ).alias("_p"),
    ).select(query_id_col, "_qvec", F.col("_p.cell").alias("cell"))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy())
        B = np.stack(b.to_numpy())
        dots = np.zeros(len(A))
        na = np.zeros(len(A))
        nb = np.zeros(len(A))
        for j in range(A.shape[1]):  # sequential fold == aggregate()
            dots += A[:, j] * B[:, j]
            na += A[:, j] * A[:, j]
            nb += B[:, j] * B[:, j]
        return pd.Series(dots / np.sqrt(na * nb))

    scored = (
        corpus_cells.join(F.broadcast(probes), on="cell")
        .where(F.col(id_col) != F.col(query_id_col))
        .withColumn("cosine_sim", _cos(F.col("_qvec"), F.col(vec_col)))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def centroid_assign(
    vectors: DataFrame,
    centroid_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    centroid_vec_col: str = "cvec",
    engine: str = "pandas",
) -> DataFrame:
    """Nearest-centroid assignment by cosine — the cell-assignment step
    of an IVF quantizer (and of Lloyd's algorithm). Ties break toward
    the smallest cluster id, fully deterministic on either engine.
    Returns (id_col, cluster, cosine).

    ``engine="pandas"`` (default, the scale path): Arrow-batched numpy,
    one normalized matmul per batch against the (collected, tiny)
    centroid matrix — zero shuffle, zero cross-join row multiplication.
    The expr path's per-(vector, centroid) cosine is a zip_with fold
    that runs INTERPRETED (HOF CodegenFallback): 500k vectors x 64
    cells measured 26 s vs ~2 s here.

    ``engine="expr"``: pure expressions — centroid table broadcast,
    scored rows reduced by a ``max(struct(cos, -cluster))`` aggregate
    (argmax+tie-break with MAP-SIDE partials: one shuffled row per
    vector, not k). Sequential folds make every double bit-reproducible
    in ANSI SQL — the q110 oracle certifies this path.
    """
    if engine == "pandas":
        import numpy as np
        import pandas as pd

        cents = (
            _as_double(
                centroid_df.select(cluster_col, centroid_vec_col),
                centroid_vec_col,
            )
            .orderBy(cluster_col)
            .collect()
        )
        if not cents:
            raise ValueError("centroid_df is empty")
        cluster_ids = np.array([r[cluster_col] for r in cents])
        cmat = np.stack(
            [np.asarray(r[centroid_vec_col], dtype=np.float64) for r in cents]
        )
        cunit = cmat / np.maximum(
            np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300
        )

        def _assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
                norms = np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-300
                )
                cos = (mat / norms) @ cunit.T
                # argmax first-occurrence == smallest cluster id (rows
                # sorted by cluster): the expr path's tie rule
                best = np.argmax(cos, axis=1)
                yield pd.DataFrame(
                    {
                        "_id": pdf["_id"].to_numpy(),
                        "_cl": cluster_ids[best],
                        "_cos": cos[np.arange(len(mat)), best],
                    }
                )

        prepared = _as_double(
            vectors.select(id_col, vec_col), vec_col
        ).select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        id_type = dict(vectors.select(id_col).dtypes)[id_col]
        cl_type = dict(centroid_df.select(cluster_col).dtypes)[cluster_col]
        out = prepared.mapInPandas(
            _assign,
            schema=f"_id {id_type}, _cl {cl_type}, _cos double",
        )
        return out.select(
            F.col("_id").alias(id_col),
            F.col("_cl").alias(cluster_col),
            F.col("_cos").alias("cosine"),
        )
    if engine != "expr":
        raise ValueError(f"unknown engine {engine!r}")
    vecs = _as_double(vectors.select(id_col, vec_col), vec_col)
    cents = _as_double(
        centroid_df.select(cluster_col, centroid_vec_col), centroid_vec_col
    )
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(cluster_col),
        cosine(F.col(vec_col), F.col(centroid_vec_col)).alias("_cos"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("_cos").alias("cos"),
                (-F.col(cluster_col)).alias("neg_cluster"),
            )
        ).alias("_best")
    )
    return best.select(
        F.col(id_col),
        (-F.col("_best.neg_cluster")).alias(cluster_col),
        F.col("_best.cos").alias("cosine"),
    )


def semdedup(
    vectors: DataFrame,
    centroid_df: DataFrame,
    tau: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    centroid_vec_col: str = "cvec",
    max_cell_size: int | None = None,
    on_mega_cell: str = "error",
    pair_engine: str = "expr",
    assign_engine: str = "pandas",
    group_budget_bytes: int | None = None,
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with a coarse quantizer, then
    within each cluster mark a point as a duplicate when some
    LOWER-ID member lies within cosine >= tau — "keep the first
    representative of every semantic neighborhood". Lower-id-wins is the
    same canonicalization convention as the exact/MinHash dedup layers,
    so verdicts are deterministic and engine-portable.

    Scale shape: assignment is :func:`centroid_assign` (broadcast
    centroids, map-side top-1 reduce — one shuffle of one row per
    vector). The pairwise stage equi-joins the corpus to itself ON THE
    CLUSTER KEY ONLY — both sides repartitioned by cluster from the same
    upstream so the planner can reuse one exchange — and is therefore
    quadratic only within a cell, never across the corpus: exactly the
    O(sum k_i^2) bound the SemDeDup paper exploits (cells are ~n/k and
    the global all-pairs comparison is avoided). The reduction to a
    per-point verdict is a max-aggregate with map-side combine, so the
    second shuffle also carries one row per vector.

    Returns (id_col, cluster, max_prior_cos, is_dup) — one row per
    input vector; ``max_prior_cos`` is NULL for the cluster's lowest id
    (no prior member exists).

    **Mega-cell guard** (``max_cell_size``): the O(sum k_i^2) bound only
    holds when cell count scales with the corpus (the paper uses ~0.1%·n
    clusters). A too-coarse quantizer produces a mega-cell whose within-
    cell join is quadratic-in-cell — at 10^9 docs and 16 cells that is a
    6e7-wide self-join per cell, a silent scale-killer. With
    ``max_cell_size`` set, cell sizes are counted first (one cheap agg)
    and any cell above the bound either

    * ``on_mega_cell="error"`` — raises with the offending cell sizes
      (re-train with more centroids, or raise the bound), or
    * ``on_mega_cell="subsplit"`` — splits the cell by a deterministic
      secondary hash of the id into ``ceil(size / max_cell_size)``
      sub-cells and dedups WITHIN sub-cells only. This bounds every
      join group by ``max_cell_size`` at a documented recall cost:
      duplicate pairs straddling two sub-cells of a mega-cell are not
      compared (normal cells are untouched — sub-cell 0 — so results
      there are bit-identical to the unguarded path, q116's oracle).

    **Pair engine**: ``"expr"`` (default) runs the quadratic stage as
    the codegen equi-join + dot-fold described above — oracle-exact and
    engine-portable. ``"pandas"`` replaces ONLY that stage with one
    blocked numpy matmul per (cluster, sub-cell) group via
    ``grouped_apply``: the quadratic stage is genuinely compute-bound
    (the join otherwise materializes O(pairs) rows each carrying two
    full vectors), and BLAS evaluates the same max-prior-cosine ~20x
    faster at 10^5 vectors. Identical semantics up to FP summation
    order (parity-tested); intended together with ``max_cell_size``,
    which bounds per-group memory at ``max_cell_size x dim`` doubles.

    ``group_budget_bytes`` (round 10, r9 verdict item 8): second-line
    memory guard for the pandas pair engine, mirroring the fleet tier's
    ``parallel.DEFAULT_GROUP_BUDGET_BYTES`` contract — a (cluster,
    sub-cell) group whose pandas frame exceeds the budget raises a loud
    MemoryError naming the knob BEFORE the kernel stacks the vector
    matrix, instead of OOMing the executor. Defaults to None (off) when
    ``max_cell_size`` already bounds the group, because the primary
    guard is structural; pass ``parallel.DEFAULT_GROUP_BUDGET_BYTES``
    (512 MiB) when running without a cell-size cap. (The IVF probe path
    needs no such guard: its numpy engine runs per ARROW BATCH under
    ``mapInPandas``, so group residency is capped by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of cell
    sizes.)
    """
    if pair_engine not in ("expr", "pandas"):
        raise ValueError(
            f"pair_engine must be 'expr' or 'pandas', got {pair_engine!r}"
        )
    if on_mega_cell not in ("error", "subsplit"):
        raise ValueError(
            f"on_mega_cell must be 'error' or 'subsplit', got {on_mega_cell!r}"
        )
    vecs = _as_double(vectors.select(id_col, vec_col), vec_col)
    assign = centroid_assign(
        vectors, centroid_df, vec_col, id_col, cluster_col,
        centroid_vec_col, engine=assign_engine,
    ).select(id_col, cluster_col)
    # the assignment is referenced by up to three downstream branches
    # (cell-size aggregate, member join, final verdict join) whose
    # differing repartitions defeat exchange reuse — without a barrier
    # the k x n cosine cross-join re-runs once PER BRANCH (measured 3x
    # 12 s at 100k vectors x 64 cells). The checkpointed table is tiny
    # (id, cluster — ~16 bytes/row, corpus-cardinality but vector-free),
    # the same trade duplicate_clusters makes for its iteration state.
    assign = assign.localCheckpoint(eager=False)

    if max_cell_size is not None:
        sizes = assign.groupBy(cluster_col).agg(F.count("*").alias("_csz"))
        if on_mega_cell == "error":
            mega = sizes.where(F.col("_csz") > max_cell_size).collect()
            if mega:
                detail = ", ".join(
                    f"cell {r[cluster_col]}: {r['_csz']} rows" for r in mega
                )
                raise ValueError(
                    f"semdedup mega-cell(s) exceed max_cell_size="
                    f"{max_cell_size} ({detail}); re-train the quantizer "
                    "with more centroids or pass on_mega_cell='subsplit'"
                )
        else:
            # secondary-hash sub-split: n_sub = ceil(size/max_cell_size);
            # sub-cell id from xxhash64(id) so membership is deterministic
            # and partitioning-invariant. Normal cells get n_sub == 1 →
            # sub-cell 0 → behavior identical to the unguarded path.
            assign = (
                assign.join(sizes, cluster_col)
                .withColumn(
                    "_nsub",
                    F.ceil(F.col("_csz") / F.lit(max_cell_size)).cast("int"),
                )
                .withColumn(
                    "_subcell",
                    F.pmod(F.xxhash64(F.col(id_col)), F.col("_nsub")).cast(
                        "int"
                    ),
                )
                .select(id_col, cluster_col, "_subcell")
            )
    if "_subcell" not in assign.columns:
        assign = assign.withColumn("_subcell", F.lit(0))

    # pre-normalize each vector ONCE before the exchange (the
    # repartition materializes `_vn`, so codegen cannot re-inline the
    # normalization into the pairwise lambda): the per-PAIR expression
    # is then a single dot-product fold instead of dot + two norm folds
    # — 3x fewer higher-order-function evaluations on the quadratic
    # stage, which dominates semdedup wall time (measured ~3x at 100k
    # vectors). cosine(a, b) == dot(a/|a|, b/|b|) exactly up to FP
    # rounding; the q116 oracle re-verifies end-to-end every session.
    member = vecs.join(assign, id_col).withColumn(
        "_vn",
        F.expr(
            f"transform({vec_col}, x -> x / greatest(sqrt(aggregate("
            f"{vec_col}, cast(0.0 as double), (a, v) -> a + v * v)), "
            "1e-300))"
        ),
    )
    if pair_engine == "expr":
        # the expr self-join needs BOTH aliased sides to share one
        # exchange; grouped_apply (pandas path) repartitions itself, so
        # adding the repartition there would shuffle the vectors twice
        member = member.repartition(F.col(cluster_col), F.col("_subcell"))

    if pair_engine == "pandas":
        from solar_data_tools_spark.parallel import grouped_apply

        def _group_max_prior(pdf):
            import numpy as _np
            import pandas as _pd

            pdf = pdf.sort_values("__id").reset_index(drop=True)
            unit = _np.stack(pdf["_vn"].to_numpy()).astype(_np.float64)
            n_rows = len(unit)
            out = _np.full(n_rows, _np.nan)
            # blocked: rows i in [lo, hi) need sims against rows < hi
            block = 512
            for lo in range(1, n_rows, block):
                hi = min(lo + block, n_rows)
                sims = unit[lo:hi] @ unit[:hi].T  # (hi-lo, hi)
                for i in range(lo, hi):
                    out[i] = sims[i - lo, :i].max()
            return _pd.DataFrame(
                {
                    "_ida": pdf["__id"],
                    # nullable Float64 so the lowest id's "no prior
                    # member" is a true NULL (matching the expr path),
                    # not a NaN
                    "max_prior_cos": _pd.array(
                        [None if _np.isnan(x) else x for x in out],
                        dtype="Float64",
                    ),
                }
            )

        id_dtype = dict(member.dtypes)[id_col]
        pair_max = grouped_apply(
            member.select(
                F.col(id_col).alias("__id"),
                cluster_col,
                "_subcell",
                "_vn",
            ),
            [cluster_col, "_subcell"],
            _group_max_prior,
            f"_ida {id_dtype}, max_prior_cos double",
            group_budget_bytes=group_budget_bytes,
        )
    else:
        a = member.select(
            F.col(id_col).alias("_ida"),
            F.col(cluster_col).alias(cluster_col),
            F.col("_subcell"),
            F.col("_vn").alias("_va"),
        )
        b = member.select(
            F.col(id_col).alias("_idb"),
            F.col(cluster_col).alias(cluster_col),
            F.col("_subcell"),
            F.col("_vn").alias("_vb"),
        )
        pair_max = (
            a.join(b, [cluster_col, "_subcell"])
            .where(F.col("_idb") < F.col("_ida"))
            .groupBy("_ida")
            .agg(
                F.max(dot(F.col("_va"), F.col("_vb"))).alias("max_prior_cos")
            )
        )
    return (
        # verdicts only need (id, cluster) — join the CHECKPOINTED
        # assignment, not `member`, so the vector join + normalization
        # isn't re-planned a second time just to carry the cluster id
        assign.select(id_col, cluster_col)
        .join(pair_max, F.col(id_col) == F.col("_ida"), "left")
        .select(
            F.col(id_col),
            F.col(cluster_col),
            F.col("max_prior_cos"),
            F.coalesce(
                F.col("max_prior_cos") >= F.lit(tau), F.lit(False)
            ).alias("is_dup"),
        )
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    engine: str = "pandas",
) -> DataFrame:
    """Per-vector scalar quantization of an embedding column — the
    storage-compression step of a large ANN index (a 100 TB float32
    embedding store becomes ~25 TB at int8 with bounded recall loss).

    q_i = floor((v_i - min) * (2^bits - 1) / (max - min) + 0.5) with the
    min/max taken per vector; constant vectors quantize to all-zeros.
    floor(x + 0.5) is used instead of round() so engines that differ on
    round-half (banker's vs away-from-zero) reproduce it bit-for-bit.

    ``engine="pandas"`` (default, the scale path): Arrow-batched numpy
    whose per-element arithmetic is the IDENTICAL IEEE op sequence
    (elementwise ops, error sum accumulated dimension-by-dimension like
    the expr fold) — bit-equal outputs, parity-tested, ~10x the expr
    form, whose per-element lambdas evaluate INTERPRETED
    (CodegenFallback; 17 s at the 500k probe). ``engine="expr"`` keeps
    the Python-free narrow plan. Output: (id, vmin, vmax, quantized
    array<int>, mean/max absolute reconstruction error).
    """
    levels = float((1 << bits) - 1)
    if engine == "pandas":
        prepared = emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).where(F.size("_v") > 0)

        def _quant(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf["_v"].to_numpy())
                lo = mat.min(axis=1)
                hi = mat.max(axis=1)
                scale = hi - lo
                safe = np.where(scale == 0.0, 1.0, scale)
                q = np.floor(
                    (mat - lo[:, None]) * levels / safe[:, None] + 0.5
                ).astype(np.int32)
                q[scale == 0.0] = 0
                dq = lo[:, None] + q.astype(np.float64) * scale[:, None] / levels
                err = np.abs(mat - dq)
                tot = np.zeros(len(mat))
                for j in range(mat.shape[1]):  # sequential fold == expr
                    tot += err[:, j]
                yield pd.DataFrame(
                    {
                        "_id": pdf["_id"].to_numpy(),
                        "vmin": lo,
                        "vmax": hi,
                        "quantized": [list(map(int, r)) for r in q],
                        "mean_abs_err": tot / mat.shape[1],
                        "max_abs_err": err.max(axis=1),
                    }
                )

        id_type = dict(emb.select(id_col).dtypes)[id_col]
        out = prepared.mapInPandas(
            _quant,
            schema=(
                f"_id {id_type}, vmin double, vmax double, "
                "quantized array<int>, mean_abs_err double, "
                "max_abs_err double"
            ),
        )
        return out.withColumnRenamed("_id", id_col)
    if engine != "expr":
        raise ValueError(f"unknown engine {engine!r}")
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).where(F.size("_v") > 0)
    vmin, vmax = F.array_min("_v"), F.array_max("_v")
    e = e.select(
        id_col, "_v", vmin.alias("_lo"),
        ((vmax - vmin)).alias("_scale"),
    )
    q = F.when(
        F.col("_scale") == 0.0,
        F.transform("_v", lambda _: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            "_v",
            lambda v: F.floor(
                (v - F.col("_lo")) * F.lit(levels) / F.col("_scale") + 0.5
            ).cast("int"),
        )
    )
    e = e.select(id_col, "_v", "_lo", "_scale", q.alias("quantized"))
    dq = F.transform(
        "quantized",
        lambda qq: F.col("_lo") + qq.cast("double") * F.col("_scale") / F.lit(levels),
    )
    err = F.zip_with("_v", dq, lambda a, b: F.abs(a - b))
    return e.select(
        F.col(id_col),
        F.col("_lo").alias("vmin"),
        (F.col("_lo") + F.col("_scale")).alias("vmax"),
        "quantized",
        (
            F.aggregate(err, F.lit(0.0), lambda acc, x: acc + x)
            / F.size(err).cast("double")
        ).alias("mean_abs_err"),
        F.array_max(err).alias("max_abs_err"),
    )


def truncate_embeddings(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    engine: str = "pandas",
) -> DataFrame:
    """Matryoshka-style truncation (Kusupati et al. 2022): keep the
    first ``dim`` coordinates of each embedding and L2-renormalize —
    the standard storage/latency knob for MRL-trained embedding stores
    (a 64-d store served at 8-d is 8x less ANN work at modest recall
    cost). Also reports the retained-energy ratio ||v[:d]||² / ||v||²,
    the per-vector diagnostic for choosing ``dim``.

    ``engine="pandas"`` (default): Arrow-batched numpy with the
    sum-of-squares accumulated dimension-by-dimension — the identical
    IEEE fold as the expression form, so outputs are bit-equal
    (parity-tested) at ~10x the throughput (per-element lambdas run
    interpreted). ``engine="expr"`` keeps the Python-free narrow plan;
    both handle zero vectors (and zero prefixes) with an all-zero
    renormalized vector rather than NaN.
    """
    if engine == "pandas":
        prepared = emb.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).where(F.size("_v") >= dim)

        def _trunc(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf["_v"].to_numpy())
                pss = np.zeros(len(mat))
                fss = np.zeros(len(mat))
                for j in range(mat.shape[1]):  # sequential fold == expr
                    sq = mat[:, j] * mat[:, j]
                    fss += sq
                    if j < dim:
                        pss += sq
                prefix = mat[:, :dim]
                norm = np.sqrt(pss)
                safe = np.where(pss == 0.0, 1.0, norm)
                renormed = prefix / safe[:, None]
                renormed[pss == 0.0] = 0.0
                ratio = np.where(fss == 0.0, 0.0, pss / np.where(fss == 0.0, 1.0, fss))
                yield pd.DataFrame(
                    {
                        "_id": pdf["_id"].to_numpy(),
                        "trunc_norm": norm,
                        "energy_ratio": ratio,
                        "renormed": [list(map(float, r)) for r in renormed],
                    }
                )

        id_type = dict(emb.select(id_col).dtypes)[id_col]
        out = prepared.mapInPandas(
            _trunc,
            schema=(
                f"_id {id_type}, trunc_norm double, energy_ratio double, "
                "renormed array<double>"
            ),
        )
        return out.withColumnRenamed("_id", id_col)
    if engine != "expr":
        raise ValueError(f"unknown engine {engine!r}")
    e = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).where(F.size("_v") >= dim)
    prefix = F.slice("_v", 1, dim)
    e = e.select(id_col, "_v", prefix.alias("_p"))
    ss = lambda c: F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)  # noqa: E731
    e = e.select(
        id_col, "_p",
        ss(F.col("_p")).alias("_pss"),
        ss(F.col("_v")).alias("_fss"),
    )
    norm = F.sqrt("_pss")
    renorm = F.when(
        F.col("_pss") == 0.0,
        F.transform("_p", lambda _: F.lit(0.0)),
    ).otherwise(F.transform("_p", lambda x: x / F.sqrt("_pss")))
    return e.select(
        F.col(id_col),
        norm.alias("trunc_norm"),
        F.when(F.col("_fss") == 0.0, F.lit(0.0))
        .otherwise(F.col("_pss") / F.col("_fss"))
        .alias("energy_ratio"),
        renorm.alias("renormed"),
    )


def binarize_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    words: int = 2,
) -> DataFrame:
    """Binary (sign-bit) quantization: dim d compresses to d BITS packed
    into ``words`` BIGINT columns of up to 32 bits each — the vector-DB
    "binary quantization" memory tier (32x smaller than float32; Hamming
    distance approximates angular distance for roughly-centered data).

    Bit i of word w is set iff ``vec[w*bits_per_word + i] > 0``; packing
    is an integer sum of ``1 << i`` terms — exact, order-independent,
    and bit-identical in any engine (the q149 oracle replays it). One
    codegen projection, zero shuffle, stream-legal.

    32 bits per word (not 63) keeps every word positive and the packing
    portable to engines whose ``<<`` differs on the sign bit.
    """
    vecs = _as_double(embeddings.select(id_col, vec_col), vec_col)
    # statically unrolled 32-term sums: element_at + if are ordinary
    # codegen expressions, whereas an aggregate() lambda fold runs
    # INTERPRETED per row (CodegenFallback) — measured ~100x on the
    # 500k-vector probe for the analogous PQ fold
    cols = [F.col(id_col)]
    for w in range(words):
        expr = " + ".join(
            f"if(element_at({vec_col}, {w * 32 + i + 1}) > 0.0d, "
            f"{1 << i}L, 0L)"
            for i in range(32)
        )
        cols.append(F.expr(expr).alias(f"b{w}"))
    return vecs.select(*cols)


def hamming_topk(
    bits: DataFrame,
    query_bits: DataFrame,
    k: int = 10,
    words: int = 2,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k by Hamming distance over sign-bit-packed vectors:
    ``bit_count(xor(word_a, word_b))`` summed across words — pure
    integer codegen, so distances (hence ranks, tie-broken by id) are
    EXACT on every engine. The query side broadcasts; the corpus scans
    (id, words) rows of ~8*words bytes. Output: (query_id, vec_id,
    hamming, rank)."""
    q = query_bits.select(
        F.col(query_id_col),
        *[F.col(f"b{w}").alias(f"_qb{w}") for w in range(words)],
    )
    dist = None
    for w in range(words):
        term = F.bit_count(
            F.expr(f"b{w} ^ _qb{w}")
        )
        dist = term if dist is None else dist + term
    scored = bits.crossJoin(F.broadcast(q))
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    scored = scored.withColumn("hamming", dist.cast("int"))
    w_ = Window.partitionBy(query_id_col).orderBy(
        F.asc("hamming"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "hamming", "rank")
    )


def binary_rerank_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    prefilter: int = 50,
    words: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage retrieval (the production vector-DB shape): a cheap
    binary-Hamming prefilter picks ``prefilter`` candidates per query
    from the sign-bit index, then ONLY those candidates are exact-cosine
    re-ranked against the float vectors — the full-precision column is
    read for ~prefilter rows per query instead of the whole corpus.

    Every stage is engine-portable: the prefilter is integer-exact
    (bit_count(xor), ties on id), so the candidate SET is identical on
    any engine, and the re-rank cosine is the sequential ``dot()`` fold
    — which makes the ENTIRE two-stage pipeline hash-certifiable (q153).
    Output: (query_id, vec_id, hamming, cosine_sim, rank<=k).
    """
    bits = binarize_embeddings(embeddings, vec_col, id_col, words)
    qbits = binarize_embeddings(
        queries.select(F.col(query_id_col).alias(id_col), vec_col),
        vec_col,
        id_col,
        words,
    ).select(
        F.col(id_col).alias(query_id_col),
        *[F.col(f"b{w}") for w in range(words)],
    )
    cands = hamming_topk(
        bits, qbits, k=prefilter, words=words,
        id_col=id_col, query_id_col=query_id_col,
    )
    corpus = _as_double(embeddings.select(id_col, vec_col), vec_col)
    qvec = _as_double(
        queries.select(query_id_col, vec_col), vec_col
    ).select(query_id_col, F.col(vec_col).alias("_qvec"))
    scored = (
        cands.select(query_id_col, id_col, "hamming")
        .join(corpus, id_col)
        .join(F.broadcast(qvec), query_id_col)
        .withColumn("cosine_sim", cosine(F.col("_qvec"), F.col(vec_col)))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "hamming", "cosine_sim", "rank")
    )


def semantic_decontaminate(
    train: DataFrame,
    eval_vecs: DataFrame,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    eval_cap: int = 65536,
) -> DataFrame:
    """Embedding-level decontamination: flag every training vector whose
    cosine against ANY eval/benchmark vector reaches ``tau`` — the
    semantic complement of the n-gram ``decontaminate`` (a paraphrased
    benchmark question shares no 8-gram but sits at cosine ~0.97).

    Plan shape: the eval matrix is collected driver-side (bounded by
    ``eval_cap`` — benchmark sets are small by nature; a corpus-sized
    "eval" side should go through the banded-LSH candidate path of
    ``embedding_cosine_dedup`` instead, then exact-verify) and closed
    over ONE ``mapInPandas`` pass, so the training corpus never
    shuffles and each train vector crosses the Arrow boundary once —
    the ``brute_force_topk`` map-engine shape. Round-7 probe (64-dim,
    1k-vector eval, local[32]): 5.5 s at 100k train vectors, 13.0 s at
    500k — near-linear in the corpus, constant in partition layout.

    Determinism contract: cosines fold sequentially over dimension j
    (oracle bit-parity); the max is order-independent; argmax ties
    break toward the SMALLEST eval id (ascending iteration + strict
    improvement), matching the oracle's ``ORDER BY cos DESC, id``.

    Output: (id_col, nearest_eval_id, max_eval_cos, is_contaminated).
    """
    eval_id_col = eval_id_col or id_col
    ev = _as_double(eval_vecs, vec_col).select(
        F.col(eval_id_col).alias("_eid"), F.col(vec_col).alias("_evec")
    )
    erows = ev.limit(eval_cap + 1).collect()
    if len(erows) > eval_cap:
        raise ValueError(
            f"semantic_decontaminate: eval set exceeds eval_cap="
            f"{eval_cap}; use the banded-LSH candidate path for "
            "corpus-sized eval sides"
        )
    if not erows:
        # an empty eval set silently decontaminates nothing — almost
        # certainly a mis-specified benchmark filter; fail loudly
        raise ValueError("semantic_decontaminate: eval set is empty")
    erows = sorted(erows, key=lambda r: r["_eid"])
    eids = [r["_eid"] for r in erows]
    E = np.array([r["_evec"] for r in erows], dtype=np.float64)
    ne, d = E.shape
    enorm = np.zeros(ne)
    for j in range(d):
        enorm += E[:, j] * E[:, j]

    corpus = _as_double(train, vec_col).select(
        F.col(id_col), F.col(vec_col).alias("_cvec")
    )
    id_type = dict(corpus.select(id_col).dtypes)[id_col]
    eid_type = dict(ev.select("_eid").dtypes)["_eid"]
    schema = (
        f"{id_col} {id_type}, nearest_eval_id {eid_type}, "
        "max_eval_cos double"
    )

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.stack(pdf["_cvec"].to_numpy())
            m = len(A)
            na = np.zeros(m)
            for j in range(d):
                na += A[:, j] * A[:, j]
            best = np.full(m, -np.inf)
            best_ix = np.zeros(m, dtype=np.int64)
            for ei in range(ne):  # ascending eval id: ties -> smallest
                dots = np.zeros(m)
                for j in range(d):
                    dots += A[:, j] * E[ei, j]
                cos = dots / np.sqrt(na * enorm[ei])
                upd = cos > best
                best = np.where(upd, cos, best)
                best_ix = np.where(upd, ei, best_ix)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "nearest_eval_id": [eids[i] for i in best_ix],
                    "max_eval_cos": best,
                }
            )

    out = corpus.mapInPandas(_score, schema)
    return out.select(
        id_col,
        "nearest_eval_id",
        "max_eval_cos",
        (F.col("max_eval_cos") >= F.lit(float(tau))).alias(
            "is_contaminated"
        ),
    )
