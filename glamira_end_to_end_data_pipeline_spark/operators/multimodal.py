"""Multimodal (image/audio/video) column handling (north-star).

Media is modeled as opaque ``binary`` payload columns plus typed
metadata — the layout a 100 TB training-data lake actually uses
(payloads inline for small assets, pointer columns for large ones).
The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``
pipelines, batch shapes, partitioning — is real and tested; the codec
step itself is stubbed behind ``DECODERS`` because no image/audio
library ships in this environment: each stub is a deterministic fake
keyed on the payload bytes, and swapping in Pillow/torchaudio is a
one-line registration with no plan changes.

Scale notes: all transforms are map-only (zero shuffle) and Arrow-
batched, so throughput is bounded by parquet scan + Python codec time;
``spark.sql.files.maxPartitionBytes`` is the knob that keeps one task's
worth of payload bytes in executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# schemas
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),   # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # audio/video
    ]
)

FEATURE_DIM = 8  # stub feature size; a real encoder just changes this

_FEATURES_FIELDS = [
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("features", T.ArrayType(T.FloatType()), True),
]
FEATURES_SCHEMA = T.StructType(_FEATURES_FIELDS)


class DecoderUnavailable(NotImplementedError):
    """Raised by real-codec hooks that are not installed here."""


def _stub_decode(payload: bytes | None) -> list[float]:
    """Deterministic fake 'decode + embed': FEATURE_DIM byte-histogram
    buckets normalized to [0,1]. Stands in for Pillow/librosa/ffmpeg —
    REPLACE by registering a real decoder in DECODERS."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in counts]


# modality -> payload decoder. Real libraries get registered here; the
# mapInPandas plumbing below is agnostic to which is active.
DECODERS: dict[str, Callable[[bytes | None], list[float]]] = {
    "image": _stub_decode,
    "audio": _stub_decode,
    "video": _stub_decode,
}


def extract_features(media: DataFrame) -> DataFrame:
    """payload → fixed-dim feature vector via Arrow-batched mapInPandas.

    Column-pruned input (only the 3 needed columns cross into Python),
    per-batch vectorized apply, typed output schema — the canonical
    shape for any Python-side codec at scale."""
    pruned = media.select("media_id", "modality", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                DECODERS.get(m, _stub_decode)(p)
                for m, p in zip(pdf["modality"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return pruned.mapInPandas(run, FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize plumbing: passes payloads through a mapInPandas
    stage that would call a real resizer; the stub truncates payload
    bytes deterministically (so tests can assert the data path) and
    rescales the metadata dims exactly as a real resizer would."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )
    pruned = media.filter(F.col("modality") == "image").select(
        "media_id", "payload", "width", "height"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_w, new_h, new_p = [], [], []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if w is None or h is None or max(w, h) <= max_side:
                    new_w.append(w)
                    new_h.append(h)
                    new_p.append(p)
                    continue
                scale = max_side / max(w, h)
                new_w.append(int(w * scale))
                new_h.append(int(h * scale))
                # STUB: real impl decodes + resamples; fake keeps a
                # deterministic prefix proportional to the area ratio.
                keep = max(1, int(len(p) * scale * scale)) if p is not None else None
                new_p.append(p[:keep] if p is not None else None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": new_p,
                    "width": pd.array(new_w, dtype="Int32"),
                    "height": pd.array(new_h, dtype="Int32"),
                }
            )

    return pruned.mapInPandas(run, out_schema)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp.
    The stub emits the frame *offsets* a real ffmpeg-backed sampler
    would seek to, with a payload slice standing in for the frame."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )
    pruned = media.filter(F.col("modality") == "video").select(
        "media_id", "payload", "duration_ms"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, frames = [], [], []
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                dur = int(dur) if dur is not None else 0
                for off in range(0, max(dur, 1), every_ms):
                    ids.append(mid)
                    offs.append(off)
                    if p is None:
                        frames.append(None)
                    else:  # STUB: real impl decodes the frame at `off`.
                        start = (off // every_ms) % max(len(p), 1)
                        frames.append(p[start : start + 16])
            yield pd.DataFrame(
                {"media_id": ids, "frame_ms": offs, "frame_payload": frames}
            )

    return pruned.mapInPandas(run, out_schema)


def pack_shards(
    df: DataFrame,
    size_col: str,
    budget: int,
    group_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """WebDataset-style shard assignment: within each group, records
    are packed sequentially (deterministic ``order_col`` order) into
    shards of ~``budget`` bytes — ``shard_id`` = exclusive running
    size / budget. The dataloader contract this feeds needs (a)
    deterministic membership (resumable builds — pure function of the
    input, no RNG, no task order), and (b) bounded shard size so a
    training worker's read amplification is capped; both hold by
    construction. An item larger than the budget gets its own
    shard-id range rather than failing (WebDataset's oversized-sample
    behavior).

    Scale shape: ONE window per group — ``group_cols`` must therefore
    bound the group size (a macro-batch id, a date, an input chunk:
    the natural packing unit every sharded corpus already has), never
    a 3-value modality alone; with bounded groups the cumsum is an
    embarrassingly parallel per-group sort, no global ordering
    anywhere.

    DETERMINISM REQUIREMENT: ``order_col`` must totally order each
    group, or the running sum — and therefore shard membership —
    depends on Spark's tie order, which varies with partitioning and
    run (exactly the resumable-build property the contract promises).
    When the natural order key can repeat (ingest timestamps, file
    offsets), pass ``tiebreak_cols`` (e.g. the record's unique id) to
    extend the sort into a total order; the window simply orders by
    ``(order_col, *tiebreak_cols)``."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col, *tiebreak_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(
        "shard_id", F.floor(cum / F.lit(float(budget))).cast("int")
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic in-engine media fixture (no media libs needed):
    payload bytes derived from md5 of the id — stable across runs."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("mime_type"),
        F.unhex(F.repeat(F.md5(F.col("id").cast("string")), 4)).alias("payload"),
        F.when(F.col("id") % 3 == 0, (F.col("id") % 7 * 100 + 100).cast("int")).alias(
            "width"
        ),
        F.when(F.col("id") % 3 == 0, (F.col("id") % 5 * 100 + 100).cast("int")).alias(
            "height"
        ),
        F.when(F.col("id") % 3 == 2, (F.col("id") * 500 + 1000)).alias("duration_ms"),
    )


def audio_energy_windows(
    media: DataFrame,
    window_bytes: int = 16,
    silence_threshold: int = 1900,
) -> DataFrame:
    """Fixed-duration audio windowing + energy/silence profile — the
    VAD-ish pre-filter an audio corpus runs before expensive ASR
    (drop silent/near-silent windows; reference treats media as opaque
    payloads, this keeps that contract: ref 5.dcs/product_crawler.py
    downloads assets as raw bytes). Each payload is cut into
    ``window_bytes`` windows; a window's "energy" is the sum of its
    raw byte values (for 8-bit PCM this IS the amplitude sum — a real
    codec decode would slot in front via DECODERS without changing
    this plan's shape).

    Implementation note — fully JVM-side, ZERO Python: the payload is
    hex-encoded once (codegen'd ``hex``), windows are substrings, and
    byte values come from a transform over 2-hex-char slices folded
    with ``aggregate`` — binary → per-window scalars without any UDF
    or Arrow batch. The higher-order lambdas evaluate as interpreted
    JVM expressions (HOFs are not whole-stage-codegen compiled), which
    is the right trade here: the per-window element count is a fixed
    16, and the alternative — exploding per-byte rows to stay in
    codegen — would multiply the stage's row count 16× before the
    re-aggregation. The whole profile is map-only (no shuffle at all;
    window rows explode from a sequence, never from a join). At 100 TB
    of audio this is the scan-speed path: predicate `is_silence`
    applies in the same stage, and nothing but (id, window, scalars)
    survives the scan."""
    hexp = F.hex(F.col("payload"))
    hex_w = 2 * window_bytes
    n_win = (F.length(hexp) / hex_w).cast("int")
    # A trailing partial window is DROPPED (fixed-duration windows by
    # definition — a VAD decision needs the full frame), and payloads
    # shorter than one window yield zero rows: sequence(0, -1) counts
    # DOWN in Spark, so the guard below is load-bearing, not cosmetic.
    idxs = F.when(n_win >= 1, F.sequence(F.lit(0), n_win - 1)).otherwise(
        F.array().cast("array<int>")
    )
    win = media.select(
        "media_id",
        hexp.alias("__hex"),
        F.explode(idxs).alias("window_idx"),
    )
    win_hex = F.col("__hex").substr(
        F.col("window_idx") * hex_w + 1, F.lit(hex_w)
    )
    byte_vals = F.transform(
        F.sequence(F.lit(0), F.lit(window_bytes - 1)),
        lambda i: F.conv(win_hex.substr(i * 2 + 1, F.lit(2)), 16, 10).cast(
            "long"
        ),
    )
    energy = F.aggregate(
        byte_vals, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return win.select(
        "media_id",
        F.col("window_idx").cast("long").alias("window_idx"),
        (F.col("window_idx").cast("long") * window_bytes).alias("start_byte"),
        energy.alias("energy"),
        F.round(energy / F.lit(float(window_bytes)), 4).alias("mean_level"),
        (energy < silence_threshold).alias("is_silence"),
    )
