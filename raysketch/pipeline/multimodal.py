"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

Decode modes (the image/audio libraries are not in this container — task
mandate):

- ``decode="deterministic_fake"`` — seeded fake decode; the Ray-side plumbing
  (schema, batch sizing, actor-pool signature, output layout) is real and tested.
- ``decode="auto"`` — use a REAL decoder (PIL for images) when importable in the
  worker environment, falling back to the deterministic fake otherwise; makes
  the stage production-real on clusters that ship codecs without breaking this
  sandbox. The import probe happens ONCE per actor in ``__init__``.
- ``decode="strict"`` — raise NotImplementedError at the exact point a real
  decoder (PIL/libsndfile/ffmpeg) would plug in.

Design notes for 100 TB: binary payloads dominate block size — stages here use
small ``batch_size`` (the caller should also raise ``target_max_block_size`` if
rows are megabyte-scale), drop the payload column as soon as features are
extracted, and run decode in an actor pool so any model/codec init happens once
per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raysketch.hashing import column_spans, xxh64_vec

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def gen_media_table(rows: int = 256, seed: int = 11) -> pa.Table:
    """Deterministic fake media fixture. Every metadata field is a CLOSED-FORM
    function of ``media_id`` so an ANSI-SQL oracle can reproduce the table
    exactly (the driver's correctness gate):

    - ``media_type  = ['image','audio','video'][i % 3]``
    - ``width       = 16 + (i*37) % 240``, ``height = 16 + (i*53) % 240``
    - ``duration_ms = (i*211) % 10000``
    - ``payload``    = ``64 + (i*97) % 448`` bytes, byte j = ``(i*8191 + j*127 + seed) % 256``
    """
    i = np.arange(rows, dtype=np.int64)
    types = np.array(["image", "audio", "video"])[i % 3]
    plen = (64 + (i * 97) % 448).astype(np.int64)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(plen, out=offsets[1:])
    total = int(offsets[-1])
    row_of = np.repeat(i, plen)
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], plen)
    flat = ((row_of * 8191 + j * 127 + seed) % 256).astype(np.uint8)
    payload = pa.Array.from_buffers(
        pa.binary(), rows, [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(flat)]
    )
    return pa.table(
        {
            "media_id": pa.array(i),
            "media_type": pa.array(types.tolist()),
            "payload": payload,
            "width": pa.array((16 + (i * 37) % 240).astype(np.int32)),
            "height": pa.array((16 + (i * 53) % 240).astype(np.int32)),
            "duration_ms": pa.array(((i * 211) % 10000).astype(np.int32)),
        }
    )


class DecodeAndFeaturize:
    """Actor-pool stage: payload binary → fixed-dim feature vector + metadata.

    Real pipeline shape: decoder/model handles load once in ``__init__``; per-batch
    work is vectorized. The fake decode derives a deterministic ``feat_dim``-dim
    float vector from xxh64 rolling hashes of the payload bytes, so outputs are
    stable across retries/partitioning (required for checkpoint determinism)."""

    def __init__(self, feat_dim: int = 32, decode: str = "deterministic_fake"):
        if decode not in ("deterministic_fake", "strict", "auto"):
            raise ValueError("decode must be 'deterministic_fake', 'auto' or 'strict'")
        self.feat_dim = feat_dim
        self.decode = decode
        # codec/model probe happens once per ACTOR (the model-load-in-__init__
        # pattern); "auto" degrades to the deterministic fake when no codec ships
        self.pil = None
        if decode == "auto":
            try:
                from PIL import Image  # noqa: F401

                self.pil = Image
            except ImportError:
                self.pil = None
        self.seeds = np.arange(feat_dim, dtype=np.uint64)

    def _real_image_features(self, payloads: list[bytes]) -> np.ndarray:
        """Real decode path (exercised only where PIL is installed): decode, grey,
        resize to a feat_dim-pixel strip, normalized intensities as features."""
        import io

        feats = np.empty((len(payloads), self.feat_dim), dtype=np.float32)
        for i, raw in enumerate(payloads):
            img = self.pil.open(io.BytesIO(raw)).convert("L").resize((self.feat_dim, 1))
            feats[i] = np.asarray(img, dtype=np.float32).ravel() / 255.0
        return feats

    def _fake_features(self, payload: pa.Array) -> np.ndarray:
        data, starts, lengths = column_spans(payload)
        feats = np.empty((len(payload), self.feat_dim), dtype=np.float32)
        for d in range(self.feat_dim):
            h = xxh64_vec(data, starts, lengths, int(self.seeds[d]))
            feats[:, d] = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        return feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "strict":
            raise NotImplementedError(
                "real media decode requires PIL/libsndfile/ffmpeg, absent in this environment"
            )
        payload = batch.column("payload").combine_chunks()
        if self.pil is not None:
            mtype = np.asarray(batch.column("media_type").combine_chunks())
            feats = self._fake_features(payload)
            img_rows = np.nonzero(mtype == "image")[0]
            if len(img_rows):
                img_feats = self._real_image_features([payload[int(i)].as_py() for i in img_rows])
                feats[img_rows] = img_feats
        else:
            feats = self._fake_features(payload)
        out = batch.drop_columns(["payload"])  # payload dropped at first opportunity
        return out.append_column("features", pa.array(list(feats)))


def media_features(ds, feat_dim: int = 32, concurrency: int | tuple = (1, 4), batch_size: int = 64):
    """Decode+featurize pipeline over a media dataset (small batches: binary rows)."""
    return ds.map_batches(
        DecodeAndFeaturize,
        fn_constructor_kwargs={"feat_dim": feat_dim},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        zero_copy_batch=True,
    )


class FrameSampleStage:
    """Actor-pool stage: video rows fan out to per-frame rows (the frame-sample
    op of a training-data pipeline). One input row emits
    ``ceil(duration_ms / every_ms)`` rows ``(media_id, frame_idx, frame)``; the
    fan-out happens INSIDE the batch (one output table, vectorized offsets) —
    never per-row Python emission.

    The frame decode is stubbed like ``DecodeAndFeaturize``: the fake "frame" is
    a deterministic fixed-size slice of the payload bytes (a real implementation
    seeks with ffmpeg here — ``decode="strict"`` raises at that exact point).
    Non-video rows pass through with a single frame (frame_idx 0)."""

    def __init__(self, every_ms: int = 1000, frame_bytes: int = 32, decode: str = "deterministic_fake"):
        if decode not in ("deterministic_fake", "strict", "auto"):
            raise ValueError("decode must be 'deterministic_fake', 'auto' or 'strict'")
        self.every_ms = int(every_ms)
        self.frame_bytes = int(frame_bytes)
        self.decode = decode
        self.ffmpeg = None
        if decode == "auto":
            import shutil

            # probe once per actor; a real implementation would popen ffmpeg
            # per batch here — this sandbox ships no codecs, so auto degrades
            # to the deterministic fake (fan-out/schema identical either way)
            self.ffmpeg = shutil.which("ffmpeg")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode == "strict":
            raise NotImplementedError(
                "real frame extraction requires ffmpeg, absent in this environment"
            )
        media_id = np.asarray(batch.column("media_id").combine_chunks())
        mtype = np.asarray(batch.column("media_type").combine_chunks())
        dur = np.asarray(batch.column("duration_ms").combine_chunks()).astype(np.int64)
        payload = batch.column("payload").combine_chunks()
        data, starts, lengths = column_spans(payload)
        n_frames = np.where(mtype == "video", np.maximum((dur + self.every_ms - 1) // self.every_ms, 1), 1)
        offs = np.zeros(len(n_frames) + 1, dtype=np.int64)
        np.cumsum(n_frames, out=offs[1:])
        total = int(offs[-1])
        row_of = np.repeat(np.arange(len(n_frames), dtype=np.int64), n_frames)
        frame_idx = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], n_frames)
        # fake frame: frame_bytes-slice at a deterministic rotating offset
        fb = self.frame_bytes
        span_len = np.minimum(lengths[row_of], fb)
        span_start = starts[row_of] + np.where(
            lengths[row_of] > fb, (frame_idx * fb) % np.maximum(lengths[row_of] - fb, 1), 0
        )
        out_offs = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(span_len, out=out_offs[1:])
        gather = np.repeat(span_start, span_len) + (
            np.arange(int(out_offs[-1]), dtype=np.int64) - np.repeat(out_offs[:-1], span_len)
        )
        buf = data[gather] if len(gather) else np.empty(0, dtype=np.uint8)
        frames = pa.Array.from_buffers(
            pa.binary(),
            total,
            [None, pa.py_buffer(out_offs.astype(np.int32)), pa.py_buffer(buf)],
        )
        return pa.table(
            {
                "media_id": pa.array(media_id[row_of]),
                "frame_idx": pa.array(frame_idx),
                "frame": frames,
            }
        )


def sample_frames(ds, every_ms: int = 1000, concurrency: int | tuple = (1, 4), batch_size: int = 64):
    """Frame-sampling pipeline: one row per sampled frame."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        zero_copy_batch=True,
    )
