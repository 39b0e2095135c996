"""Multimodal columns: image/audio payloads as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

``ImageDecoder`` tries Pillow in ``__init__`` (the once-per-actor model-load
slot); without it, PNG payloads decode through the REAL pure-stdlib codec
(``condor_ray.pipelines.png``: zlib inflate + scanline unfilter — no image
library needed), and synthetic FIMG payloads through the deterministic
header parser.  Anything else raises ``NotImplementedError`` at the
clearly-marked boundary.  Real deployments swap ``_decode`` only.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def synthesize_image_table(ds):
    """documents -> opaque image payloads: a 16-byte header
    (magic, width, height, channels) + deterministic pixel bytes derived
    from the text.  Stands in for a real image-bytes column."""

    def synth(batch: pa.Table) -> pa.Table:
        payloads = []
        widths, heights = [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            w = 16 + (doc_id % 16) * 8
            h = 16 + (len(text) % 16) * 8
            header = struct.pack("<4sIII", b"FIMG", w, h, 3)
            body = (text.encode() * ((w * h * 3) // max(len(text), 1) + 1))[
                : min(w * h * 3, 4096)
            ]
            payloads.append(header + body)
            widths.append(w)
            heights.append(h)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "image": pa.array(payloads, type=pa.binary()),
                "meta_width": pa.array(widths, type=pa.int32()),
                "meta_height": pa.array(heights, type=pa.int32()),
            }
        )

    return ds.map_batches(synth, batch_format="pyarrow")


class ImageDecoder:
    """Actor-pool decode/feature stage.

    __init__ (once per actor): load the codec — Pillow if importable,
    else the deterministic fake decoder for the synthetic FIMG payloads.
    __call__ (per batch): binary in -> features out (width, height, mean
    intensity, aspect).  Keep ``batch_size`` SMALL for real image payloads
    (large binary rows; see SURVEY memory notes).
    """

    def __init__(self):
        try:  # pragma: no cover - codec not shipped in this container
            from PIL import Image  # noqa: F401

            self._backend = "pillow"
        except ImportError:
            self._backend = "stdlib"

    def _pillow_decode(self, payload: bytes):  # pragma: no cover
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img, dtype=np.float64)
        return img.width, img.height, float(arr.mean())

    def _decode(self, payload: bytes) -> tuple[int, int, float]:
        # route per PAYLOAD, not per environment: synthetic FIMG stubs are
        # not a real image format, so they must hit the header parser even
        # when Pillow is importable (backend-first routing crashed the
        # image_features pipeline in Pillow-equipped deployments)
        if payload[:4] == b"FIMG" and len(payload) >= 16:
            _magic, w, h, _c = struct.unpack_from("<4sIII", payload)
            body = np.frombuffer(payload, dtype=np.uint8, offset=16)
            mean = float(body.mean()) if len(body) else 0.0
            return w, h, mean
        from .png import decode_png, is_png

        if is_png(payload):
            if self._backend == "pillow":  # pragma: no cover
                return self._pillow_decode(payload)
            # REAL decode: pure-stdlib zlib inflate + scanline unfilter
            arr = decode_png(payload)
            return arr.shape[1], arr.shape[0], float(arr.mean())
        if self._backend == "pillow":  # pragma: no cover
            # unknown-to-us format; a real codec may still read it
            return self._pillow_decode(payload)
        raise NotImplementedError(
            "payload is neither PNG (stdlib-decodable) nor a complete "
            "synthetic FIMG stub (truncated payloads land here too); other "
            "formats need a real codec (Pillow)"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, means = [], [], []
        for payload in batch["image"].to_pylist():
            w, h, m = self._decode(payload)
            widths.append(w)
            heights.append(h)
            means.append(m)
        w_arr = np.asarray(widths, dtype=np.int32)
        h_arr = np.asarray(heights, dtype=np.int32)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(w_arr),
                "height": pa.array(h_arr),
                "mean_intensity": pa.array(np.asarray(means, dtype=np.float64)),
                "aspect": pa.array(w_arr.astype(np.float64) / h_arr),
            }
        )


def decode_images(image_ds, concurrency: int = 2, batch_size: int = 256):
    """Binary image column -> decoded feature table (actor pool; small
    batches because binary rows are wide)."""
    return image_ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video-style frame sampling stub: treats the payload as a byte stream
    of fixed-size frames, samples every ``stride``-th frame's checksum.
    Same actor-pool plumbing a real ffmpeg-backed stage would use."""

    def __init__(self, frame_bytes: int = 256, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc, out_frame, out_checksum = [], [], []
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["image"].to_pylist()
        ):
            body = payload[16:]
            n_frames = max(len(body) // self.frame_bytes, 1)
            for f in range(0, n_frames, self.stride):
                chunk = body[f * self.frame_bytes : (f + 1) * self.frame_bytes]
                out_doc.append(doc_id)
                out_frame.append(f)
                out_checksum.append(int(np.frombuffer(chunk, dtype=np.uint8).sum()))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                "frame": pa.array(out_frame, type=pa.int32()),
                "checksum": pa.array(out_checksum, type=pa.int64()),
            }
        )


def sample_frames(image_ds, concurrency: int = 2):
    return image_ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )


def _area_resize(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Box-average (area) resample to (th, tw) — fully vectorized.

    Band boundaries ``floor(i * src / t)``; ``np.add.reduceat`` sums each
    band (a repeated boundary — the upscale case — yields the single
    source row/col per reduceat semantics, matching a count clamp of 1).
    Works for (h, w) grayscale and (h, w, c) arrays."""
    h, w = arr.shape[:2]
    out = arr.astype(np.float64)
    for axis, (src, tgt) in enumerate(((h, th), (w, tw))):
        bounds = (np.arange(tgt, dtype=np.int64) * src) // tgt
        counts = np.maximum(np.diff(np.append(bounds, src)), 1).astype(np.float64)
        shape = [1] * out.ndim
        shape[axis] = tgt
        out = np.add.reduceat(out, bounds, axis=axis) / counts.reshape(shape)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _nearest_resize(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample to (th, tw): floor index mapping, one
    gather per axis — exact for identity and integer upscales."""
    h, w = arr.shape[:2]
    ri = (np.arange(th, dtype=np.int64) * h) // th
    ci = (np.arange(tw, dtype=np.int64) * w) // tw
    return arr[ri][:, ci]


class ImageResizer:
    """Actor-pool resize stage: PNG in -> resampled PNG out (the brief's
    decode / feature-extract / RESIZE / frame-sample set).

    __init__ (once per actor): fix the target geometry + kernel; probe
    Pillow (preferred in a real deployment) — the stdlib path is REAL
    (``png.decode_png`` -> vectorized area/nearest resample ->
    ``png.encode_png``), not a stub.  FIMG synthetic stubs carry a
    TRUNCATED body (no full pixel grid), so they raise like any other
    non-decodable payload."""

    def __init__(self, width: int, height: int, mode: str = "area"):
        if mode not in ("area", "nearest"):
            raise ValueError(f"mode must be area|nearest, got {mode!r}")
        if width <= 0 or height <= 0:
            raise ValueError("target width/height must be positive")
        self.width, self.height, self.mode = width, height, mode
        try:  # pragma: no cover - codec not shipped in this container
            from PIL import Image  # noqa: F401

            self._backend = "pillow"
        except ImportError:
            self._backend = "stdlib"

    def _resize_payload(self, payload: bytes) -> bytes:
        from .png import decode_png, encode_png, is_png

        if not is_png(payload):
            raise NotImplementedError(
                "resize supports PNG payloads (stdlib-decodable); other "
                "formats need a real codec (Pillow)"
            )
        arr = decode_png(payload)
        fn = _area_resize if self.mode == "area" else _nearest_resize
        return encode_png(fn(arr, self.width, self.height))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize_payload(p) for p in batch["image"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "image": pa.array(out, type=pa.binary()),
                "width": pa.array(
                    np.full(len(out), self.width, dtype=np.int32)
                ),
                "height": pa.array(
                    np.full(len(out), self.height, dtype=np.int32)
                ),
            }
        )


def resize_images(image_ds, width: int, height: int, mode: str = "area",
                  concurrency: int = 2, batch_size: int = 64):
    """Binary PNG column -> resampled PNG column (actor pool; small batches
    because binary rows are wide — resized outputs add a second copy)."""
    return image_ds.map_batches(
        ImageResizer,
        fn_constructor_args=(width, height, mode),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def synthesize_audio_table(ds, rate: int = 16_000):
    """documents -> opaque WAV payloads: REAL RIFF/PCM int16 mono streams
    whose samples are an exact integer function of (doc_id, frame index):
    v_i = (doc_id*31 + i*17) % 65535 - 32767, n_frames = 1000 +
    (doc_id % 7) * 250.  Sample values are integers scaled by 1/32767
    before encoding, so the stored PCM words equal v_i exactly and every
    downstream feature is integer-computable — the SQL twin regenerates
    v_i with generate_series (no float summation order to match)."""
    from .wav import encode_wav

    def synth(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy().astype(np.int64)
        payloads = []
        for d in doc_ids:
            n = 1000 + (int(d) % 7) * 250
            i = np.arange(n, dtype=np.int64)
            v = (d * 31 + i * 17) % 65535 - 32767
            payloads.append(encode_wav(v / 32767.0, rate))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "audio": pa.array(payloads, type=pa.binary()),
            }
        )

    return ds.map_batches(synth, batch_format="pyarrow")


class AudioDecoder:
    """Actor-pool audio decode/feature stage (mirrors ImageDecoder): the
    pure-stdlib WAV codec decodes RIFF/PCM in ``_decode``; ``sum_sq`` and
    ``peak_abs`` are computed on the source's NATIVE integer PCM words
    (reconstructed exactly — every normalization divide is by a power of
    two, lossless in fp64), so integer-PCM stages are SQL-twinnable end to
    end.  Float32 WAVs have no integer words; their features land on a
    2^15 fixed-point grid by documented convention (``decode_wav_info``)."""

    def __init__(self):
        from .wav import decode_wav_info, is_wav  # codec probe slot

        self._decode_wav = decode_wav_info
        self._is_wav = is_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        rates = np.empty(n_rows, dtype=np.int64)
        chans = np.empty(n_rows, dtype=np.int64)
        frames = np.empty(n_rows, dtype=np.int64)
        sum_sq = np.empty(n_rows, dtype=np.int64)
        peak = np.empty(n_rows, dtype=np.int64)
        for j, payload in enumerate(batch["audio"].to_pylist()):
            if not self._is_wav(payload):
                raise NotImplementedError(
                    "payload is not RIFF/WAVE; other audio containers need "
                    "a real codec"
                )
            samples, rate, scale, _is_float = self._decode_wav(payload)
            words = np.rint(samples * scale).astype(np.int64)
            rates[j] = rate
            chans[j] = samples.shape[1]
            frames[j] = samples.shape[0]
            sum_sq[j] = int((words * words).sum())
            peak[j] = int(np.abs(words).max()) if words.size else 0
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "sample_rate": pa.array(rates),
                "n_channels": pa.array(chans),
                "n_frames": pa.array(frames),
                "sum_sq": pa.array(sum_sq),
                "peak_abs": pa.array(peak),
            }
        )


def decode_audio(audio_ds, concurrency: int = 2, batch_size: int = 256):
    """Binary WAV column -> integer-exact feature table (actor pool)."""
    return audio_ds.map_batches(
        AudioDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
