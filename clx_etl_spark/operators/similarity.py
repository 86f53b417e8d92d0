"""Vector similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exactness baseline; the IVF variant prunes
the search space to the query's partition (here the pre-clustered ``label``
column; at scale: KMeans-assigned centroid ids, one Spark partition per
probed cell, so each query scans 1/nlist of the corpus).

Determinism notes (the DuckDB oracle must match bit-for-bit):
  * floats are cast to double before any arithmetic (IEEE-deterministic),
  * dot/norm fold in strict array order (Spark aggregate == DuckDB
    list_reduce left fold), so double sums are bit-identical,
  * top-k ties broken by vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions import ensure_min_parallelism

def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product of two float arrays: per-element double products folded
    left-to-right (deterministic order; DuckDB's list_reduce mirrors it).

    With ``dim`` known, the fold is unrolled into a chained-add
    expression replicating the EXACT same operation sequence (0.0 seed,
    left association) — bit-identical doubles, but codegen'd instead of
    the interpreted higher-order aggregate (~3-4x on wide verify joins).
    """
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + (
                F.element_at(a, i).cast("double")
                * F.element_at(b, i).cast("double")
            )
        return acc
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm2(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            x = F.element_at(a, i).cast("double")
            acc = acc + x * x
        return acc
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)


def cosine_sim(a: Column, b: Column, dim: int | None = None) -> Column:
    return _dot(a, b, dim) / (
        F.sqrt(_norm2(a, dim)) * F.sqrt(_norm2(b, dim))
    )


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector over the corpus.

    queries is expected small (broadcast); the corpus side streams — no
    shuffle until the per-query top-k (one shuffle on query_id).
    Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vvec"))
    scored = v.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn("cosine", cosine_sim(F.col("_qvec"), F.col("_vvec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("cosine"))
    )


def knn_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: search only the query's cell (single-probe).

    With cell co-partitioning (`repartition(cell_col)` at write time) the
    candidate join is shuffle-local; recall < 1.0 by design — the scale
    path when brute force stops being affordable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col(cell_col).alias("_cell"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vvec"),
        F.col(cell_col).alias("_cell"),
    )
    scored = v.join(F.broadcast(q), "_cell").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn("cosine", cosine_sim(F.col("_qvec"), F.col("_vvec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("cosine"))
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within each cell (a < b). The cell
    restriction bounds the pair blow-up the same way LSH bands do for text.

    The two norm folds are staged once per VECTOR on each join side
    (identical fold expression, so the cosine doubles are bit-identical);
    the per-pair verify inside the cell join is one dot fold. The
    repartition guard mirrors srp_near_duplicates: the quadratic verify
    runs in the probe-side map stage, so an under-partitioned local
    source would serialize it on one core.
    """
    src = ensure_min_parallelism(vectors)
    a = src.select(
        F.col(id_col).alias("doc_a"), F.col(vec_col).alias("_va"),
        F.col(cell_col).alias("_cell"), _norm2(F.col(vec_col)).alias("_na"),
    )
    b = src.select(
        F.col(id_col).alias("doc_b"), F.col(vec_col).alias("_vb"),
        F.col(cell_col).alias("_cell"), _norm2(F.col(vec_col)).alias("_nb"),
    )
    pairs = a.join(b, "_cell").filter(F.col("doc_a") < F.col("doc_b"))
    pairs = pairs.withColumn(
        "cosine",
        _dot(F.col("_va"), F.col("_vb"))
        / (F.sqrt(F.col("_na")) * F.sqrt(F.col("_nb"))),
    )
    return pairs.filter(F.col("cosine") >= threshold).select(
        "doc_a", "doc_b", F.col("cosine")
    )


def hard_negative_mining(
    vectors: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-training hard-negative mining: for each anchor, the
    top-k most-similar vectors with a DIFFERENT label, plus the anchor's
    hardest positive (max same-label cosine) and the triplet margin
    (neg_cosine - pos_cosine) — the semi-hard mining signal.

    The production shape: anchors are a per-epoch subset (pass a
    deterministic hash-gated sample), broadcast against the full corpus
    scan — one pass over the vectors computes both the positive max (a
    map-side-combinable MAX per anchor) and the negative top-k (one
    window shuffle on anchor_id). At 100 TB swap the corpus scan for an
    IVF/SRP-pruned candidate set; semantics are unchanged because the
    verify stage is the same ranked cosine.

    Returns (anchor_id, neighbor_id, rank, neg_cosine, pos_cosine,
    margin); pos_cosine/margin are NULL for anchors whose label is
    unique in the corpus.
    """
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("_avec"),
        F.col(label_col).alias("_albl"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vvec"),
        F.col(label_col).alias("_vlbl"),
    )
    scored = (
        v.crossJoin(F.broadcast(a))
        .filter(F.col("neighbor_id") != F.col("anchor_id"))
        .withColumn("cosine", cosine_sim(F.col("_avec"), F.col("_vvec")))
    )
    pos = (
        scored.filter(F.col("_vlbl") == F.col("_albl"))
        .groupBy("anchor_id")
        .agg(F.max("cosine").alias("pos_cosine"))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    neg = (
        scored.filter(F.col("_vlbl") != F.col("_albl"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
    return (
        neg.join(pos, "anchor_id", "left")
        .select(
            "anchor_id",
            "neighbor_id",
            "rank",
            F.col("cosine").alias("neg_cosine"),
            "pos_cosine",
            (F.col("cosine") - F.col("pos_cosine")).alias("margin"),
        )
    )


def srp_signature(vec: Column, n_bits: int = 16, dim: int | None = None) -> Column:
    """Signed-random-projection signature: an ``n_bits``-char '0'/'1'
    string, bit k = sign of the dot product with pseudo-random hyperplane
    k. Hyperplane component (k, i) is md5-derived from the literal
    "k:i" — deterministic, seedless, and computable identically in the
    DuckDB oracle, so the whole LSH path is hash-checkable.

    Collision probability for two vectors at angle theta is
    (1 - theta/pi) per bit — the classic SRP-LSH cosine sketch.

    When ``dim`` is known, the plane matrix is PRECOMPUTED driver-side
    (hashlib md5 — byte-identical to the SQL md5) and embedded as
    literal coefficient arrays: the per-row cost drops from
    n_bits x dim interpreted md5/conv calls to n_bits codegen'd
    multiply-add folds (~20x at 64 dims), with bit-identical doubles —
    same hex, same % 2001 - 1000, same /1000.0, same product and fold
    order — so signatures (and the DuckDB oracle match) are unchanged.
    """
    if dim is not None:
        import hashlib

        import numpy as np

        bits = []
        for k in range(n_bits):
            # ONE ArrayType Literal per plane (F.lit over an ndarray) —
            # the previous F.array(*[F.lit(c) ...]) built dim literal
            # Columns through py4j per plane (n_bits x dim round-trips,
            # ~4 s of driver time at 16x64 before the first job), and
            # Catalyst constant-folded it to this same Literal anyway.
            # Values are identical doubles, so signatures are unchanged.
            coeffs = F.lit(
                np.array(
                    [
                        (
                            int(
                                hashlib.md5(
                                    f"{k}:{i + 1}".encode()
                                ).hexdigest()[:8],
                                16,
                            )
                            % 2001
                            - 1000
                        )
                        / 1000.0
                        for i in range(dim)
                    ],
                    dtype=np.float64,
                )
            )
            dot = F.aggregate(
                F.zip_with(vec, coeffs, lambda x, c: x.cast("double") * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    def make_hp(k: int):
        # closure (not a default arg): pyspark counts lambda parameters to
        # pick the higher-order-function arity, so (x, i) only
        def hp(x: Column, i: Column) -> Column:
            h = F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{k}:"), (i + 1).cast("string")).cast("binary")),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            return x.cast("double") * (
                ((h % 2001) - 1000).cast("double") / F.lit(1000.0)
            )

        return hp

    bits = []
    for k in range(n_bits):
        dot = F.aggregate(
            F.transform(vec, make_hp(k)), F.lit(0.0), lambda acc, x: acc + x
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def srp_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.35,
    bands: int = 4,
    bits_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-dup pairs via banded SRP-LSH — the label-free scale
    path (embedding_near_duplicates blocks on a ground-truth cell column;
    this blocks on the sketch alone, like MinHash bands do for text).

    One signature pass, band buckets as substring slices, then ONE band
    self-join that carries the signature, the per-vector squared norm
    and the vector payload on both sides, so each surviving pair is
    cosine-verified inline — no candidate ``distinct`` and no id-rejoin
    stages (guide §2.4/§3). Pair dedup across bands is a FILTER, not a
    shuffle: a pair is emitted only from its first matching band (for
    the join at band k every earlier band's signature slice must differ;
    both full signatures ride the join, so the check is a substring
    compare). The emitted pair set is exactly the old
    band-join + distinct set, and the cosine — the identical
    left-association fold, with the two norm folds staged per VECTOR
    instead of re-folded per PAIR — is bit-identical (same expressions,
    same operand order; r13 join-compared 0 mismatches at sf0.1).

    Shuffle trade vs the old id-only shape (measured, r13): the band
    exchange carries ``bands`` copies of each vector instead of ids
    only, but the candidate table — quadratic in bucket occupancy, 462k
    pairs from 2k vectors at bench band widths — is never materialized,
    shuffled (old distinct) or re-shuffled (old two verify joins): pairs
    stream through the cosine filter inside the join stage. Candidate
    volume dominates payload duplication whenever buckets hold more than
    ~2 x bands docs, which LSH banding guarantees at corpus scale.
    """
    n_bits = bands * bits_per_band
    # Scale-adaptive parallelism guard: the verify work happens in the
    # map stage that probes the band join, so its parallelism is the
    # INPUT partitioning — a single-row-group local file would put the
    # whole quadratic verify on one core. Only repartitions when the
    # source is under-partitioned (a real cluster scan with >= cores
    # partitions skips this; the 2 MB local exchange costs ~nothing).
    base = ensure_min_parallelism(
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    )
    # one tiny probe for the (uniform) dimensionality unlocks the
    # literal-coefficient signature path (see srp_signature)
    first = base.select(F.size("_v").alias("d")).first()
    dim = int(first["d"]) if first is not None else None
    sig = base.select(
        "_id",
        "_v",
        srp_signature(F.col("_v"), n_bits, dim=dim).alias("_sig"),
        # squared norm staged once per vector (identical fold to the
        # per-pair _norm2 it replaces), so the per-pair verify is ONE
        # dot fold instead of three
        _norm2(F.col("_v")).alias("_nrm"),
    )
    band_struct = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring("_sig", b * bits_per_band + 1, bits_per_band).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select(
        "_id", "_v", "_sig", "_nrm", F.explode(band_struct).alias("_b")
    ).select(
        "_id", "_v", "_sig", "_nrm",
        F.col("_b.band").alias("band"), F.col("_b.bucket").alias("bucket"),
    )
    # first-matching-band gate: for a pair joined at band k, every band
    # before k must mismatch — vacuously true for bands >= k, so the
    # conjunction emits each matching pair exactly once (== distinct)
    not_earlier = F.lit(True)
    for bp in range(bands - 1):
        sa = F.substring(F.col("a._sig"), bp * bits_per_band + 1, bits_per_band)
        sb = F.substring(F.col("b._sig"), bp * bits_per_band + 1, bits_per_band)
        not_earlier = not_earlier & (
            (F.col("a.band") <= F.lit(bp)) | (sa != sb)
        )
    # NOTE the higher-order-function dot (no dim unroll): measured on
    # Spark 4.1.2 the interpreted fold beats the 390-node unrolled
    # element_at chain ~2x (plans/r13, OPTIMIZATION_r13.md)
    cosine = _dot(F.col("a._v"), F.col("b._v")) / (
        F.sqrt(F.col("a._nrm")) * F.sqrt(F.col("b._nrm"))
    )
    verified = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bucket"])
        .filter((F.col("a._id") < F.col("b._id")) & not_earlier)
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
    )
    return verified.select(
        F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"), "cosine"
    )


# ---------------------------------------------------------------------------
# Trained IVF: sample -> k-means on the driver -> broadcast centroids ->
# distributed cell assignment. The standard train-small/apply-distributed
# split: centroid training touches a bounded sample (nlist*256 vectors is
# plenty), assignment streams the full corpus once through a vectorized
# pandas UDF. Deterministic end-to-end: hash-based sampling, seeded init,
# fixed Lloyd iterations — retries reproduce the identical index.
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    vectors: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_target: int | None = None,
    iters: int = 10,
    seed: int = 0xC0FFEE,
    n: int | None = None,
):
    """K-means centroids from a deterministic hash sample. Returns a
    list[list[float]] of length nlist (driver-side; broadcast by caller).
    Pass ``n`` (the corpus count) when the caller already knows it — the
    composed builders count once and share it with pq_train, saving a
    full corpus scan each.
    """
    import numpy as np

    n = n if n is not None else vectors.count()
    sample_target = sample_target or nlist * 256
    mod = max(1, n // sample_target)
    sample = (
        vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
        .select(vec_col)
        .collect()
    )
    X = np.array([r[0] for r in sample], dtype=np.float64)
    if len(X) < nlist:
        raise ValueError(f"sample too small ({len(X)}) for nlist={nlist}")
    rng = np.random.RandomState(seed)
    # k-means++ style seeded init over the sample
    centroids = [X[rng.randint(len(X))]]
    for _ in range(nlist - 1):
        d2 = np.min(
            [((X - c) ** 2).sum(axis=1) for c in centroids], axis=0
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centroids.append(X[rng.choice(len(X), p=probs)])
    C = np.array(centroids)
    for _ in range(iters):
        assign = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1)
        for j in range(nlist):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C.tolist()


def assign_ivf_cells(
    vectors: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
    nprobe: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment, vectorized: one numpy matmul per Arrow
    batch (||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin ignores ||x||^2).
    ``nprobe > 1`` emits one row per probed cell (the recall knob for the
    query side: searching the 2-3 nearest cells recovers boundary
    neighbors single-probe misses, at nprobe/nlist of brute-force cost)."""
    import numpy as np
    import pandas as pd

    C = [list(map(float, c)) for c in centroids]
    schema = f"{id_col} long, {vec_col} array<float>, {out_col} int"

    def assign(batches):
        Cn = np.array(C)
        c_norm2 = (Cn**2).sum(axis=1)
        for pdf in batches:
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(X) == 0:
                yield pd.DataFrame({id_col: [], vec_col: [], out_col: []})
                continue
            d2 = -2.0 * (X @ Cn.T) + c_norm2[None, :]
            if nprobe == 1:
                ids, vecs = pdf[id_col], pdf[vec_col]
                cells = np.argmin(d2, axis=1).astype("int32")
            else:
                probed = np.argsort(d2, axis=1)[:, :nprobe]  # stable order
                ids = pdf[id_col].repeat(nprobe).reset_index(drop=True)
                vecs = pdf[vec_col].repeat(nprobe).reset_index(drop=True)
                cells = probed.ravel().astype("int32")
            yield pd.DataFrame({id_col: ids, vec_col: vecs, out_col: cells})

    return vectors.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def knn_ivf_trained(
    vectors: DataFrame,
    queries: DataFrame,
    nlist: int = 8,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end trained-IVF ANN: train centroids on a sample, assign
    corpus to cells, search each query's ``nprobe`` nearest cells."""
    cents = train_ivf_centroids(vectors, nlist=nlist, id_col=id_col, vec_col=vec_col)
    v_cells = assign_ivf_cells(vectors, cents, id_col=id_col, vec_col=vec_col)
    q_cells = assign_ivf_cells(
        queries, cents, id_col=id_col, vec_col=vec_col, nprobe=nprobe
    )
    out = knn_ivf(v_cells, q_cells, k=k, id_col=id_col, vec_col=vec_col, cell_col="ivf_cell")
    if nprobe == 1:
        return out
    # multiprobe: the same neighbor can surface from several probed cells —
    # dedup then re-rank to a single top-k per query
    dedup = out.select("query_id", "neighbor_id", "cosine").distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the memory-scale
    path for ANN: a 100 TB float32 embedding store shrinks 4x, and IVF /
    brute-force scans work on the int8 codes with one dequant multiply.

    scale = max|x| / 127; code = floor(x/scale + 0.5) (explicit floor
    rounding — engines disagree on round()'s half-away vs half-even, floor
    is bit-deterministic everywhere). All-zero vectors get scale 0 and
    all-zero codes. ``max_abs_err`` (order-independent max, never a float
    sum) reports the reconstruction bound <= scale/2.

    Map-only: no shuffle, no UDF — quantization pipelines into the scan.
    Output: (vec_id, scale, qvec array<int>, max_abs_err).
    """
    ld = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    s = F.array_max(F.transform(ld, F.abs)) / F.lit(127.0)
    code = lambda x: F.floor(x / s + F.lit(0.5)).cast("int")  # noqa: E731
    qvec = F.when(s == 0, F.transform(ld, lambda x: F.lit(0))).otherwise(
        F.transform(ld, code)
    )
    err = F.when(s == 0, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(ld, lambda x: F.abs(x - code(x).cast("double") * s))
        )
    )
    return df.select(
        F.col(id_col).alias("vec_id"),
        s.alias("scale"),
        qvec.alias("qvec"),
        err.alias("max_abs_err"),
    )


def pq_train(
    vectors: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_target: int | None = None,
    iters: int = 10,
    seed: int = 0xC0FFEE,
    n: int | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split each vector into ``m``
    contiguous subvectors and k-means each subspace independently on the
    same bounded deterministic hash sample train_ivf_centroids uses.
    Returns m codebooks of k sub-centroids each (m*k*(d/m) floats — tiny;
    embed as literal column expressions, never a join side). With m=4,
    k=16 a d-dim float32 vector compresses to 4 bytes: the standard
    billion-scale ANN memory layout (IVF prunes candidates, PQ shrinks
    what each candidate costs to score).
    """
    import numpy as np

    n = n if n is not None else vectors.count()
    sample_target = sample_target or k * 256
    mod = max(1, n // sample_target)
    sample = (
        vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
        .select(vec_col)
        .collect()
    )
    X = np.array([r[0] for r in sample], dtype=np.float64)
    if len(X) < k:
        raise ValueError(f"sample too small ({len(X)}) for k={k}")
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cents = [S[rng.randint(len(S))]]
        for _ in range(k - 1):
            d2 = np.min([((S - c) ** 2).sum(axis=1) for c in cents], axis=0)
            probs = d2 / d2.sum() if d2.sum() > 0 else None
            cents.append(S[rng.choice(len(S), p=probs)])
        C = np.array(cents)
        for _ in range(iters):
            assign = np.argmin(
                ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1
            )
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append(C.tolist())
    return books


def _sub_dist2(sub, cent: list) -> Column:
    """Squared distance from a subvector column to one literal centroid,
    folded in strict index order (bit-deterministic)."""
    out = F.lit(0.0)
    for i, c in enumerate(cent):
        diff = F.element_at(sub, i + 1).cast("double") - F.lit(float(c))
        out = out + diff * diff
    return out


def pq_assign(
    vectors: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector as m sub-centroid indices (0-based) — pure
    column expressions (the codebooks are literals), no UDF: at corpus
    scale this is a map-only stage pipelined into the scan. Ties take the
    lowest index: argmin = array_position(array_min) over the per-centroid
    distance array, which keeps the expression tree LINEAR in k (a chained
    when(d2 < best, ...) ladder re-references both operands and doubles
    the Catalyst tree per step — 2^k nodes OOMs the driver during plan
    transforms well before k=16)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for j, book in enumerate(codebooks):
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        dists = F.array(*[_sub_dist2(sub, cent) for cent in book])
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.array(*codes).alias(out_col),
        *[F.col(c) for c in keep_cols],
    )


def pq_reconstruct(codebooks: list, codes_col: str = "pq_codes") -> Column:
    """Decode: concatenate each subspace's chosen sub-centroid. Literal
    lookup via element_at on the embedded codebook — no join."""
    parts = []
    for j, book in enumerate(codebooks):
        lit_book = F.array(
            *[F.array(*[F.lit(float(x)) for x in cent]) for cent in book]
        )
        parts.append(
            F.element_at(lit_book, F.element_at(F.col(codes_col), j + 1) + 1)
        )
    return F.concat(*parts)


def knn_pq(
    vectors: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end PQ ANN: train codebooks on a sample, encode the corpus,
    score queries against RECONSTRUCTED corpus vectors (asymmetric
    distance: exact query vs quantized corpus — the standard ADC setup).
    Same join/top-k shape as knn_bruteforce but the corpus side carries
    m one-byte codes instead of d floats."""
    books = pq_train(vectors, m=m, k=k_codes, id_col=id_col, vec_col=vec_col)
    coded = pq_assign(vectors, books, id_col=id_col, vec_col=vec_col)
    # reconstructed corpus + the UNCHANGED bruteforce scorer: one tie-break
    # and self-match rule for both exact and ADC search
    recon = coded.select(
        F.col(id_col), pq_reconstruct(books).alias(vec_col)
    )
    return knn_bruteforce(recon, queries, k=k, id_col=id_col, vec_col=vec_col)


def adc_cell_topk(
    recon: DataFrame,
    q: DataFrame,
    k: int,
    nprobe: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Shared scoring tail for cell-pruned ADC search — used by the
    in-session knn_ivf_pq AND the persisted-index query path
    (ann_index.query_ann_index), so tie-breaks / self-exclusion /
    multiprobe dedup can never silently diverge between them.

    recon: (neighbor_id, ivf_cell, _vvec reconstructed);
    q: (query_id, ivf_cell, _qvec). Cell equi-join (never a nested
    loop), optional self-exclusion (disable when query ids are an
    external id space that may collide with corpus ids), distinct across
    probed cells, fully tie-broken window top-k."""
    scored = recon.join(q, "ivf_cell")
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn(
        "cosine", cosine_sim(F.col("_qvec"), F.col("_vvec"))
    ).select("query_id", "neighbor_id", "cosine")
    if nprobe > 1:
        scored = scored.distinct()  # same neighbor via several probed cells
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def knn_ivf_pq(
    vectors: DataFrame,
    queries: DataFrame,
    nlist: int = 8,
    m: int = 4,
    k_codes: int = 16,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ composed ANN — the standard billion-scale index layout
    (FAISS IVFPQ shape): trained coarse centroids prune the candidate set
    to the query's ``nprobe`` nearest cells, PQ codes shrink what each
    surviving candidate costs to store and score (m one-byte codes vs d
    floats), asymmetric distance scores exact queries against
    reconstructed candidates.

    Unlike knn_bruteforce / knn_pq (declared tiny-query cross-join
    baselines), candidate generation here is an EQUI-JOIN on the cell id
    — no nested-loop shape anywhere, so the plan scales to large query
    sets: corpus side shuffles once on cell (or broadcasts the query
    cells), then a per-query window top-k. Both trainings touch only
    bounded deterministic hash samples.
    """
    n = vectors.count()  # shared: saves pq_train's second full scan
    cents = train_ivf_centroids(
        vectors, nlist=nlist, id_col=id_col, vec_col=vec_col, n=n
    )
    books = pq_train(
        vectors, m=m, k=k_codes, id_col=id_col, vec_col=vec_col, n=n
    )
    v_cells = assign_ivf_cells(vectors, cents, id_col=id_col, vec_col=vec_col)
    coded = pq_assign(
        v_cells, books, id_col=id_col, vec_col=vec_col, keep_cols=("ivf_cell",)
    )
    recon = coded.select(
        F.col(id_col).alias("neighbor_id"),
        "ivf_cell",
        pq_reconstruct(books).alias("_vvec"),
    )
    q = assign_ivf_cells(
        queries, cents, id_col=id_col, vec_col=vec_col, nprobe=nprobe
    ).select(
        F.col(id_col).alias("query_id"), "ivf_cell", F.col(vec_col).alias("_qvec")
    )
    return adc_cell_topk(recon, q, k=k, nprobe=nprobe)


# ---------------------------------------------------------------------------
# Exact-integer ANN (hash-oracle-able PQ / IVF+PQ)
#
# The float k-means above (train_ivf_centroids / pq_train) is seeded and
# deterministic WITHIN Spark, but its numpy float means cannot be
# reproduced bit-for-bit by an independent SQL engine — which kept
# pq_ann / sim_knn_ivfpq in the rows-only correctness class. These
# variants move EVERY arithmetic step onto an exact integer lattice so
# a DuckDB twin reproduces the full pipeline bit-for-bit:
#
#   * quantization  floor((double)x * 2^20) + 4*2^20 — the 2^20 scale is
#     an exponent shift (lossless on float32 inputs), floor is exact,
#     and the offset keeps every component positive so floor-division
#     agrees across engines (Spark `div` truncates toward zero, DuckDB
#     `//` floors — identical on non-negatives);
#   * init          the k corpus vectors ranked first by
#     (md5(vec_id), vec_id) — a distributed TakeOrdered, no RNG;
#   * iterations    a FIXED unrolled count (the PageRank treatment):
#     assign by integer squared distance (ties -> lowest centroid id),
#     update by elementwise floor-mean; empty clusters keep their
#     previous centroid;
#   * scoring       integer ADC — per-subspace (query, code) LUT joined
#     onto the corpus codes, summed, fully tie-broken top-k.
#
# Scale shape: training is one k-row broadcast cross join + one
# positional aggregate per iteration (all map-side-combinable); no
# driver-side model state at all — unlike the numpy path, nothing is
# ever collected.

_EXACT_SCALE = 1 << 20
_EXACT_OFF = _EXACT_SCALE * 4


def quantize_exact(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    out_id: str | None = None,
) -> DataFrame:
    """(id, q: array<long>) on the exact integer lattice.

    The _EXACT_OFF positivity shift only guarantees non-negative lattice
    values for components > -4.0 — below that, Spark's truncating ``div``
    and DuckDB's flooring ``//`` diverge on the floor-mean and the
    hash-oracle contract silently breaks. Out-of-range embeddings must
    therefore FAIL LOUDLY: the whole quantized array is gated on one
    per-row array_min check (raise_error on violation), not silently
    mis-quantized."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            x.cast("double") * F.lit(float(_EXACT_SCALE))
        ).cast("long") + F.lit(_EXACT_OFF),
    )
    in_range = F.coalesce(
        F.array_min(F.col(vec_col)).cast("double") > F.lit(-4.0),
        F.lit(True),  # empty / all-null arrays carry no bad component
    )
    return df.select(
        F.col(id_col).alias(out_id or id_col),
        F.when(in_range, q).otherwise(F.raise_error(F.concat(
            F.lit("quantize_exact: embedding component <= -4.0 for "
                  f"{id_col}="),
            F.col(id_col).cast("string"),
            F.lit(" — outside the positivity range of the exact integer "
                  "lattice (_EXACT_OFF)"),
        ))).alias("q"),
    )


def _int_sq_dist(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def train_centroids_exact(
    sub: DataFrame, k: int, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "v",
) -> DataFrame:
    """Exact-integer k-means over (id, v: array<long>): returns
    (cid 1..k, c: array<long>). See the block comment above for the
    determinism contract; the SQL twin lives in queries/datasets.py."""
    seed = (
        sub.orderBy(F.md5(F.col(id_col).cast("string").cast("binary")),
                    F.col(id_col))
        .limit(k)
    )
    w0 = Window.orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col))
    cent = (
        seed.withColumn("cid", F.row_number().over(w0))
        .select("cid", F.col(vec_col).alias("c"))
    )
    for _ in range(iters):
        best = (
            sub.crossJoin(F.broadcast(cent))
            .withColumn("dist", _int_sq_dist(F.col(vec_col), F.col("c")))
            .groupBy(id_col)
            .agg(F.min(F.struct("dist", "cid", vec_col)).alias("s"))
            .select(F.col("s.cid").alias("cid"),
                    F.col(f"s.{vec_col}").alias("v"))
        )
        mean = (
            best.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.expr("sum(val) div count(1)").alias("comp"))
        )
        newc = (
            mean.groupBy("cid")
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "comp"))).alias("pc"))
            .select("cid",
                    F.transform("pc", lambda s: s["comp"]).alias("nc"))
        )
        cent = (
            cent.join(newc, "cid", "left")
            .select("cid", F.coalesce("nc", "c").alias("c"))
            .localCheckpoint(eager=True)  # cut the per-iteration lineage
        )
    return cent


def _pq_codes_and_lut_exact(
    qcorp: DataFrame, qq: DataFrame, dim: int, m: int, k_codes: int,
    iters: int, id_col: str,
) -> DataFrame:
    """Shared PQ tail: per-subspace exact codebooks, corpus codes, and
    query LUTs, returned as the unioned (query_id, neighbor_id, dist)
    per-subspace partial distances (sum = integer ADC)."""
    from functools import reduce

    d = dim // m
    parts = []
    for s in range(m):
        lo = s * d + 1
        sub = qcorp.select(id_col, F.slice("q", lo, d).alias("v"))
        cb = train_centroids_exact(sub, k_codes, iters, id_col=id_col)
        codes = (
            sub.crossJoin(F.broadcast(cb))
            .withColumn("dist", _int_sq_dist(F.col("v"), F.col("c")))
            .groupBy(id_col)
            .agg(F.min(F.struct("dist", "cid")).alias("s"))
            .select(F.col(id_col).alias("neighbor_id"),
                    F.col("s.cid").alias("code"))
        )
        lut = (
            qq.select("query_id", F.slice("q", lo, d).alias("qs"))
            .crossJoin(F.broadcast(cb))
            .select("query_id", F.col("cid").alias("code"),
                    _int_sq_dist(F.col("qs"), F.col("c")).alias("dist"))
        )
        parts.append(
            codes.join(F.broadcast(lut), "code")
            .select("query_id", "neighbor_id", "dist")
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def knn_pq_exact(
    vectors: DataFrame, queries: DataFrame,
    m: int = 4, k_codes: int = 8, k: int = 5, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN with integer ADC scoring, bit-reproducible by the DuckDB
    oracle (query pq_ann). Self-matches excluded; top-k fully
    tie-broken by (adc_dist, neighbor_id)."""
    dim = len(vectors.select(vec_col).first()[0])
    qcorp = quantize_exact(vectors, id_col, vec_col)
    qq = quantize_exact(queries, id_col, vec_col, out_id="query_id")
    adc = (
        _pq_codes_and_lut_exact(qcorp, qq, dim, m, k_codes, iters, id_col)
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dist").alias("adc_dist"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )


def knn_ivf_pq_exact(
    vectors: DataFrame, queries: DataFrame,
    nlist: int = 8, m: int = 4, k_codes: int = 8, k: int = 5,
    nprobe: int = 2, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ with exact-integer trainings and integer ADC — the FAISS
    IVFPQ layout, hash-oracle-able end to end. Candidate generation is
    an EQUI-JOIN on the coarse cell id (the scale path: 1/nlist of the
    corpus per probe); only the constant-size centroid broadcasts are
    nested-loop shapes."""
    dim = len(vectors.select(vec_col).first()[0])
    qcorp = quantize_exact(vectors, id_col, vec_col)
    qq = quantize_exact(queries, id_col, vec_col, out_id="query_id")
    coarse = train_centroids_exact(
        qcorp.select(id_col, F.col("q").alias("v")), nlist, iters,
        id_col=id_col)
    v_cells = (
        qcorp.select(id_col, F.col("q").alias("v"))
        .crossJoin(F.broadcast(coarse))
        .withColumn("dist", _int_sq_dist(F.col("v"), F.col("c")))
        .groupBy(id_col)
        .agg(F.min(F.struct("dist", "cid")).alias("s"))
        .select(F.col(id_col).alias("neighbor_id"),
                F.col("s.cid").alias("cell"))
    )
    wq = Window.partitionBy("query_id").orderBy("dist", "cid")
    q_cells = (
        qq.select("query_id", F.col("q").alias("v"))
        .crossJoin(F.broadcast(coarse))
        .withColumn("dist", _int_sq_dist(F.col("v"), F.col("c")))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("cid").alias("cell"))
    )
    cand = (
        v_cells.join(F.broadcast(q_cells), "cell")
        .select("query_id", "neighbor_id").distinct()
    )
    adc = (
        _pq_codes_and_lut_exact(qcorp, qq, dim, m, k_codes, iters, id_col)
        .join(cand, ["query_id", "neighbor_id"], "semi")
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("dist").alias("adc_dist"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )
