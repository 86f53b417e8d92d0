"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched pandas UDFs.

The engine treats media exactly as a 100 TB training pipeline would:
  * payloads are ``BinaryType`` columns riding in parquet alongside ids —
    never driver-collected; all decode work happens executor-side in
    ``mapInPandas`` over Arrow record batches;
  * decode itself is STUBBED deterministically (this container has no
    PIL/ffmpeg — see ``decode_stub``): every derived quantity is a pure
    function of sha256(payload), which (deliberately) lets the DuckDB
    oracle recompute the identical values in SQL, so even the pandas-UDF
    path is hash-checked, not just rows-only;
  * a real deployment swaps ``decode_stub`` for PIL/av decode behind the
    same interface — schema, batch iteration, and partitioning (the parts
    Spark cares about) are identical and are what the tests pin down.

Shapes exercised: 1:1 feature extraction (image_features), pure-column
post-processing (resize_plan), 1:N row expansion / frame sampling
(frame_sample — the UDTF shape), and fixed-width embedding synthesis
(media_embedding) feeding the similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# stub-decode constants — shared by the DuckDB oracle (queries/pipeline.py)
W_MOD = 193
H_MOD = 129
BRIGHT_MOD = 1_000_003
DUR_MOD = 60_000
FRAME_STRIDE_MS = 2_500
EMB_DIM = 16


def _h60(digest_hex: str) -> int:
    """First 15 hex chars of a sha256 digest as a 60-bit int (the same
    value DuckDB gets from CAST('0x' || substr(sha256(..),1,15) AS BIGINT))."""
    return int(digest_hex[:15], 16)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake media decode. A real build replaces this with
    PIL.Image.open / pyav frame iteration behind the identical dict
    interface; everything downstream is agnostic to which one ran."""
    hx = hashlib.sha256(payload).hexdigest()
    h = _h60(hx)
    return {
        "sha256": hx,
        "width": 64 + h % W_MOD,
        "height": 64 + (h // W_MOD) % H_MOD,
        "mean_brightness": (h % BRIGHT_MOD) / float(BRIGHT_MOD),
        "duration_ms": 1000 + h % DUR_MOD,
    }


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Python-heavy mapInPandas work needs >= core-count partitions; a
    small parquet file arrives as ONE split (maxPartitionBytes), which
    would serialize the decode on a single worker. The repartition is a
    narrow-ish shuffle of opaque bytes — trivial next to the Python work
    it parallelizes. Gate on the scan's file count (a driver-side listing
    already cached by the scan) rather than df.rdd.getNumPartitions(),
    which instantiates the whole RDD lineage just to count; a real
    multi-file / 100 TB input has >= core-count files and passes through
    untouched."""
    want = df.sparkSession.sparkContext.defaultParallelism
    return df if len(df.inputFiles()) >= want else df.repartition(want)


def media_assets(docs: DataFrame, mime: str = "image/fake") -> DataFrame:
    """documents -> opaque media assets: utf-8 payload bytes stand in for
    encoded media; schema (id, mime, payload, n_bytes) is the real one."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(mime).alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


IMAGE_FEATURES_SCHEMA = (
    "asset_id long, sha256 string, width int, height int, mean_brightness double"
)


def image_features(assets: DataFrame) -> DataFrame:
    """1:1 decode + feature extraction over Arrow batches. Runs where the
    payload partition lives; output drops the payload so only narrow
    feature rows shuffle onward."""

    assets = _ensure_parallelism(assets)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "sha256": [f["sha256"] for f in feats],
                    "width": pd.array([f["width"] for f in feats], dtype="int32"),
                    "height": pd.array([f["height"] for f in feats], dtype="int32"),
                    "mean_brightness": [f["mean_brightness"] for f in feats],
                }
            )

    return assets.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def resize_plan(features: DataFrame, max_side: int = 64) -> DataFrame:
    """Aspect-preserving integer resize targets — pure column arithmetic
    (JVM-side; no reason to re-enter Python for this)."""
    longest = F.greatest("width", "height")
    # explicit floor: double->int casts truncate in Spark but round in
    # DuckDB, so the shared contract is floor-then-cast on both sides
    out_w = F.greatest(F.lit(1), F.floor(F.col("width") * max_side / longest)).cast("int")
    out_h = F.greatest(F.lit(1), F.floor(F.col("height") * max_side / longest)).cast("int")
    return features.withColumns({"out_w": out_w, "out_h": out_h})


FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, frame_ts_ms long, n_frames int"


def frame_sample(assets: DataFrame, stride_ms: int = FRAME_STRIDE_MS) -> DataFrame:
    """1:N frame sampling (the UDTF shape): each asset expands to
    ceil(duration/stride) frame rows. Output row count is data-dependent —
    exactly what mapInPandas allows and a scalar UDF cannot do."""

    assets = _ensure_parallelism(assets)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("asset_id", "frame_idx", "frame_ts_ms", "n_frames")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                dur = decode_stub(bytes(payload))["duration_ms"]
                n = (dur + stride_ms - 1) // stride_ms
                for i in range(n):
                    out["asset_id"].append(int(aid))
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * stride_ms)
                    out["n_frames"].append(n)
            yield pd.DataFrame(
                {
                    "asset_id": pd.array(out["asset_id"], dtype="int64"),
                    "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                    "frame_ts_ms": pd.array(out["frame_ts_ms"], dtype="int64"),
                    "n_frames": pd.array(out["n_frames"], dtype="int32"),
                }
            )

    return assets.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def media_embedding(assets: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """Fixed-width pseudo-embedding per asset: dim 4-hex-char chunks of
    sha256 scaled to [0,1] doubles. Stands in for a model forward pass;
    output feeds the similarity operators (knn/near-dup) unchanged."""
    assert dim <= 16, "sha256 yields 16 4-hex chunks"

    assets = _ensure_parallelism(assets)

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for p in pdf["payload"]:
                hx = hashlib.sha256(bytes(p)).hexdigest()
                embs.append(
                    [int(hx[4 * j : 4 * j + 4], 16) / 65535.0 for j in range(dim)]
                )
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"].astype("int64"), "embedding": embs}
            )

    return assets.mapInPandas(embed, schema="asset_id long, embedding array<double>")


AUDIO_WINDOW_MS = 1_000
AUDIO_RMS_MOD = 10_000
AUDIO_WINDOWS_SCHEMA = (
    "asset_id long, window_idx int, window_start_ms long, rms double, n_windows int"
)


def audio_window_features(
    assets: DataFrame, window_ms: int = AUDIO_WINDOW_MS
) -> DataFrame:
    """Windowed audio features (the audio leg of the multimodal triple —
    image_features / frame_sample / this): each asset expands to
    ceil(duration/window) windows with a per-window RMS. A real build
    decodes PCM (soundfile/pyav) and computes true RMS per window behind
    the same dict interface; the stub derives both duration and RMS
    deterministically from sha256 so the whole 1:N pandas path is
    hash-checkable end-to-end. Arrow-batched mapInPandas, data-dependent
    output cardinality (UDTF shape)."""

    assets = _ensure_parallelism(assets)

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in
                ("asset_id", "window_idx", "window_start_ms", "rms", "n_windows")
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                d = decode_stub(bytes(payload))
                h, dur = _h60(d["sha256"]), d["duration_ms"]
                n = (dur + window_ms - 1) // window_ms
                for i in range(n):
                    out["asset_id"].append(int(aid))
                    out["window_idx"].append(i)
                    out["window_start_ms"].append(i * window_ms)
                    out["rms"].append(((h // (i + 1)) % AUDIO_RMS_MOD) / float(AUDIO_RMS_MOD))
                    out["n_windows"].append(n)
            yield pd.DataFrame(
                {
                    "asset_id": pd.array(out["asset_id"], dtype="int64"),
                    "window_idx": pd.array(out["window_idx"], dtype="int32"),
                    "window_start_ms": pd.array(out["window_start_ms"], dtype="int64"),
                    "rms": pd.array(out["rms"], dtype="float64"),
                    "n_windows": pd.array(out["n_windows"], dtype="int32"),
                }
            )

    return assets.mapInPandas(windows, schema=AUDIO_WINDOWS_SCHEMA)


SIG_MOD = 1_000_000
SCENE_CUT_JUMP = SIG_MOD // 4
FRAME_SIG_SCHEMA = "asset_id long, frame_idx int, sig long"


def frame_signatures(
    assets: DataFrame, stride_ms: int = FRAME_STRIDE_MS
) -> DataFrame:
    """Per-frame content signature (the perceptual-hash stand-in): one
    integer per sampled frame, derived from the asset sha like the other
    stub features so the whole path stays hash-checkable. A real build
    computes a frame dHash/pHash behind the same (asset_id, frame_idx,
    sig) interface. Arrow-batched 1:N mapInPandas."""

    assets = _ensure_parallelism(assets)

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("asset_id", "frame_idx", "sig")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                d = decode_stub(bytes(payload))
                h, dur = _h60(d["sha256"]), d["duration_ms"]
                n = (dur + stride_ms - 1) // stride_ms
                for i in range(n):
                    out["asset_id"].append(int(aid))
                    out["frame_idx"].append(i)
                    out["sig"].append((h // (i + 1)) % SIG_MOD)
            yield pd.DataFrame(
                {
                    "asset_id": pd.array(out["asset_id"], dtype="int64"),
                    "frame_idx": pd.array(out["frame_idx"], dtype="int32"),
                    "sig": pd.array(out["sig"], dtype="int64"),
                }
            )

    return assets.mapInPandas(sigs, schema=FRAME_SIG_SCHEMA)


def scene_cuts(
    assets: DataFrame,
    stride_ms: int = FRAME_STRIDE_MS,
    jump: int = SCENE_CUT_JUMP,
) -> DataFrame:
    """Scene-cut detection: a cut is a frame whose signature jumps more
    than ``jump`` from the previous frame — the shot-boundary primitive
    of video curation (sample one keyframe per shot instead of per
    stride). Composition shape: the 1:N pandas signature expansion, then
    a pure LAG window per asset — integer arithmetic end-to-end, so the
    pandas leg AND the window leg hash-match the SQL oracle.

    Returns (asset_id, frame_idx, prev_sig, sig) for cut frames."""
    from pyspark.sql import Window

    sigs = frame_signatures(assets, stride_ms)
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    prev = F.lag("sig").over(w)
    return (
        sigs.withColumn("prev_sig", prev)
        .filter(
            F.col("prev_sig").isNotNull()
            & (F.abs(F.col("sig") - F.col("prev_sig")) > jump)
        )
        .select("asset_id", "frame_idx", "prev_sig", "sig")
    )


def audio_active_segments(
    assets: DataFrame,
    window_ms: int = AUDIO_WINDOW_MS,
    rms_threshold: float = 0.5,
) -> DataFrame:
    """Voice/energy-activity segmentation: consecutive audio windows with
    rms >= threshold collapse to (start, end) segments — the VAD-shaped
    trim step of audio curation. Composition: the 1:N windowed-RMS
    pandas expansion, then gaps-and-islands (window_idx - row_number)
    per asset; one window shuffle.

    Returns (asset_id, seg_start_ms, seg_end_ms, n_windows) per active
    segment; end is exclusive (start + n*window)."""
    from pyspark.sql import Window

    wins = audio_window_features(assets, window_ms)
    active = wins.filter(F.col("rms") >= F.lit(rms_threshold))
    w = Window.partitionBy("asset_id").orderBy("window_idx")
    isl = active.withColumn(
        "grp", F.col("window_idx") - F.row_number().over(w)
    )
    return (
        isl.groupBy("asset_id", "grp")
        .agg(
            F.min("window_start_ms").alias("seg_start_ms"),
            (F.max("window_start_ms") + F.lit(window_ms)).alias("seg_end_ms"),
            F.count(F.lit(1)).cast("int").alias("n_windows"),
        )
        .select("asset_id", "seg_start_ms", "seg_end_ms", "n_windows")
    )


PHASH_BITS = 32
PHASH_BANDS = 4  # 8 bits per band; hamming <= 7 pairs can't miss all bands


def phash_values(assets: DataFrame) -> DataFrame:
    """Per-asset 32-bit perceptual-hash stand-in (sha-derived like every
    stub feature; a real build computes dHash over the decoded image
    behind the same (asset_id, phash) interface)."""
    assets = _ensure_parallelism(assets)

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ph = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                h = _h60(decode_stub(bytes(payload))["sha256"])
                ids.append(int(aid))
                ph.append(h % (1 << PHASH_BITS))
            yield pd.DataFrame(
                {
                    "asset_id": pd.array(ids, dtype="int64"),
                    "phash": pd.array(ph, dtype="int64"),
                }
            )

    return assets.mapInPandas(hashes, schema="asset_id long, phash long")


def phash_near_duplicates(
    assets: DataFrame, max_hamming: int = 7
) -> DataFrame:
    """Image near-dup pairs by perceptual-hash hamming distance, found
    WITHOUT an n^2 comparison: the 32-bit phash splits into 4 bands of 8
    bits; by pigeonhole, any pair within hamming <= 7 agrees exactly on
    at least one band, so candidates come from 4 band-equality self-joins
    (each a hash shuffle co-locating only same-band assets) and the
    hamming verify runs per candidate. The banding is the same recall
    argument as SimHash/LSH — exact for <= bands-1 bit flips.

    Returns (asset_a, asset_b, hamming) with hamming <= max_hamming."""
    ph = phash_values(assets)
    bands = ph.select(
        "asset_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("phash"), 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("bits"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("asset_id", "phash", F.col("bb.band").alias("band"), F.col("bb.bits").alias("bits"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(
        F.col("ph_a").bitwiseXOR(F.col("ph_b"))
    ).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("asset_a", "asset_b", "hamming")
    )
