"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; the
Spark-side plumbing — schema, partition-friendly batch shapes, Arrow UDF
signatures — is real and tested. The actual codec calls are STUBBED
(image/audio libraries are not in this container): `decode_features`
raises NotImplementedError unless `fake=True`, in which case a
deterministic hash-derived feature vector stands in so the pipeline
shape is exercised end to end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

PAYLOAD_SCHEMA = ("doc_id bigint, payload binary, kind string, "
                  "n_bytes bigint, checksum string")

FEATURE_SCHEMA = ("doc_id bigint, kind string, n_bytes bigint, "
                  "feature array<float>")


def attach_payload(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload column from text (deterministic
    stand-in for real image/audio bytes) with typed metadata — all JVM
    expressions."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"))


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: sha256 -> FEATURE_DIM floats in
    [0, 1). Replace with a real codec (PIL/librosa/ffmpeg) in prod."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[:FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def _probe_codecs() -> dict:
    """Import-probe for real codec libraries. Executed on the WORKER (the
    driver's environment can differ from executors'); cheap enough to run
    once per mapInPandas task. Prod wiring: PIL decodes image payloads to
    a resized thumbnail tensor; soundfile/librosa frames audio; video
    falls back to ffmpeg frame sampling. None ship in this container, so
    availability gates the real path."""
    avail = {}
    try:
        from PIL import Image  # noqa: F401
        avail["image"] = "PIL"
    except ImportError:
        pass
    try:
        import soundfile  # noqa: F401
        avail["audio"] = "soundfile"
    except ImportError:
        pass
    return avail


def _real_decode(payload: bytes, kind: str, codecs: dict) -> np.ndarray:
    """Real decode seam — reached only when _probe_codecs found a codec
    for ``kind``. Kept separate from the fake path so prod only fills in
    this function. ref: the reference has no multimodal surface at all;
    this operator exists for the training-data pipeline scope."""
    if kind == "image" and codecs.get("image") == "PIL":
        import io

        from PIL import Image
        img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
        px = np.asarray(img, dtype=np.float32).reshape(-1)
        return px[:FEATURE_DIM] / 255.0
    raise NotImplementedError(
        f"no codec available for kind={kind!r} (probed: {sorted(codecs)})")


def decode_features(df: DataFrame, fake: bool = False,
                    decoders: dict | None = None,
                    batch_size_hint: int = 1024) -> DataFrame:
    """Decode payloads into feature vectors via mapInPandas (Arrow batches;
    one Python worker per input split — the right shape for codec work:
    CPU-bound, per-record independent, no shuffle).

    ``decoders``: the PROD WIRING seam — a dict mapping ``kind`` to a
    callable ``bytes -> array-like of FEATURE_DIM floats``. The callables
    are cloudpickled into the UDF closure and run on the WORKERS, so prod
    registers its codec stack here (PIL thumbnail, librosa frames, ffmpeg
    frame sampling) without touching this module; docs/MULTIMODAL.md has
    the recipes. Kinds not covered fall through to the built-in probe
    (`_probe_codecs` / `_real_decode`).

    ``fake=True`` uses the deterministic hash stand-in. With neither a
    registered decoder nor a probed codec for a kind, the UDF raises
    NotImplementedError — a clearly-marked stub boundary, not silent
    wrong output.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codecs = {} if fake else _probe_codecs()
        for pdf in batches:
            if fake:
                feats = [
                    _fake_decode(bytes(p)).tolist() for p in pdf["payload"]]
            else:
                feats = []
                for p, k in zip(pdf["payload"], pdf["kind"]):
                    dec = (decoders or {}).get(k)
                    if dec is not None:
                        v = np.asarray(dec(bytes(p)), dtype=np.float32)
                        if v.shape != (FEATURE_DIM,):
                            raise ValueError(
                                f"decoder for kind={k!r} returned shape "
                                f"{v.shape}, expected ({FEATURE_DIM},)")
                        feats.append(v.tolist())
                    else:
                        feats.append(_real_decode(bytes(p), k, codecs).tolist())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["n_bytes"],
                "feature": feats,
            })

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def payload_meta(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Metadata-only view (no decode): the oracle-checkable face of the
    multimodal path — byte length + checksum computed JVM-side."""
    return (attach_payload(df, id_col, text_col)
            .select("doc_id", "kind", "n_bytes", "checksum")
            .orderBy("doc_id"))
