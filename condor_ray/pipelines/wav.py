"""Pure-stdlib WAV (RIFF/PCM) codec — the audio half of the multimodal
mandate, real like the PNG path: RIFF chunk walking + PCM sample decode
need only ``struct`` + numpy (and the stdlib ``wave`` module exists as a
cross-check in tests).

Scope: integer PCM (8/16/32-bit) and IEEE float32, any channel count,
format tags 1 (PCM) / 3 (float) incl. their WAVE_FORMAT_EXTENSIBLE
wrappings.  Compressed tags (mu-law, ADPCM, MP3-in-RIFF) raise
``NotImplementedError`` so they surface instead of decoding wrong.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 samples in [-1, 1] shaped (n_frames,
    n_channels), sample_rate)."""
    samples, rate, _scale, _is_float = decode_wav_info(payload)
    return samples, rate


def decode_wav_info(payload: bytes) -> tuple[np.ndarray, int, float, bool]:
    """Like :func:`decode_wav` but also returns ``(scale, is_float)``:
    ``samples * scale`` reconstructs the source's native integer PCM words
    EXACTLY for integer formats (scale = 128 / 2^15 / 2^23 / 2^31 for
    8/16/24/32-bit — each normalization divide is by a power of two, so the
    round trip is lossless in fp64).  Float WAVs have no integer words;
    ``scale`` is 2^15 by convention (a fixed-point feature grid, NOT an
    exactness claim) and ``is_float`` is True so callers can tell."""
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_ch, rate, _byte_rate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt
    )
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag leads the GUID
        (tag,) = struct.unpack_from("<H", fmt, 24)
    is_float = False
    if tag == 3:
        if bits != 32:
            raise NotImplementedError(f"float WAV with bits={bits}")
        samples = np.frombuffer(data, dtype=np.float32).astype(np.float64)
        scale, is_float = float(2**15), True  # convention grid, no words
    elif tag == 1:
        dt = _PCM_DTYPES.get(bits)
        if dt is None:
            if bits == 24:  # 3-byte samples: widen via a zero-padded view
                raw = np.frombuffer(data, dtype=np.uint8)
                raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
                wide = np.zeros((len(raw), 4), dtype=np.uint8)
                wide[:, 1:] = raw
                samples = (
                    wide.view(np.int32).ravel().astype(np.float64) / 2**31
                )
                # the widened word's low 8 bits are zero, so samples * 2^23
                # reconstructs the NATIVE 24-bit word exactly
                scale = float(2**23)
            else:
                raise NotImplementedError(f"PCM WAV with bits={bits}")
        elif bits == 8:  # 8-bit PCM is unsigned, midpoint 128
            samples = (
                np.frombuffer(data, dtype=dt).astype(np.float64) - 128.0
            ) / 128.0
            scale = 128.0  # words = stored byte - 128
        else:
            samples = np.frombuffer(data, dtype=dt).astype(np.float64) / (
                2 ** (bits - 1)
            )
            scale = float(2 ** (bits - 1))
    else:
        raise NotImplementedError(
            f"WAV format tag {tag} (compressed?) needs a real audio codec"
        )
    n = len(samples) - len(samples) % max(n_ch, 1)
    return samples[:n].reshape(-1, n_ch), rate, scale, is_float


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n_frames, n_channels) float in [-1, 1] -> PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    clipped = np.clip(samples, -1.0, 1.0)
    if bits == 16:
        pcm = (clipped * 32767.0).round().astype("<i2").tobytes()
    elif bits == 8:
        pcm = (clipped * 127.0 + 128.0).round().astype(np.uint8).tobytes()
    elif bits == 32:
        pcm = (clipped * 2147483647.0).round().astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported bits={bits}")
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    # RIFF chunks are word-aligned: an odd-length data chunk (8-bit mono
    # with an odd frame count) takes a pad byte AFTER the chunk, not
    # counted in its length field
    pad = b"\x00" if len(pcm) & 1 else b""
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(pcm)), pcm, pad,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
