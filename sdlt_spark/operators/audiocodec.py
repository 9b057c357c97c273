"""Pure-python WAV (RIFF/WAVE PCM) codec for the multimodal path
(SURVEY.md §2.11 X5).

The container ships no audio libraries (no librosa/soundfile), but
canonical PCM WAV is decodable with the stdlib alone — RIFF container
walk plus fixed-layout ``fmt `` and ``data`` chunks — so the audio decode
stage can be REAL instead of stubbed, the same move that retired the
image stub (``operators/imagecodec.py``).

Spec points an honest decoder must get right (all tested):

- RIFF chunk walk: unknown chunks (``LIST``, ``fact``, ``cue ``…) are
  skipped by their declared size, and chunks with ODD sizes carry one
  pad byte that is NOT counted in the size field;
- ``fmt `` may be larger than 16 bytes (cbSize extension) — parse the
  fixed prefix, skip the rest; WAVE_FORMAT_EXTENSIBLE (0xFFFE) with a
  PCM SubFormat GUID is PCM in disguise;
- sample widths: 8-bit PCM is UNSIGNED (offset 128), 16/24/32-bit are
  signed little-endian two's complement — all normalized here to int32
  sample values with channels de-interleaved.

Decoders return ``(sample_rate, channels, samples)`` with samples as a
``numpy int32 [n_frames][channels]`` array. Runs inside the same
Arrow-batched ``mapInPandas`` plumbing as image decode: per-batch Python
cost, partition-local, no shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM_EXTENSIBLE_GUID = (
    b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
)


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PCM RIFF/WAVE payload. Returns (sample_rate, channels,
    samples[n_frames][channels] as int32). Raises ValueError on non-WAV,
    non-PCM, or truncated payloads — callers surface these as per-row
    ``decode_error`` values, never job failures."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)

    fmt = None
    pcm_bytes = None
    pos = 12
    # chunk walk: 8-byte header (id + size), payload, odd sizes padded
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        csize = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError(f"fmt chunk too small ({csize} bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if csize < 40 or body[24:40] != _PCM_EXTENSIBLE_GUID:
                    raise ValueError("extensible WAV is not PCM")
            elif fmt[0] != 1:
                raise ValueError(f"unsupported WAV format tag {fmt[0]} (not PCM)")
        elif cid == b"data":
            if len(body) < csize:
                raise ValueError("truncated WAV data chunk")
            pcm_bytes = body
        pos += 8 + csize + (csize & 1)  # odd chunks carry a pad byte

    if fmt is None:
        raise ValueError("WAV has no fmt chunk")
    if pcm_bytes is None:
        raise ValueError("WAV has no data chunk")
    _tag, channels, sample_rate, _brate, block_align, bits = fmt
    if channels <= 0 or sample_rate <= 0:
        raise ValueError(f"bad WAV fmt: channels={channels} rate={sample_rate}")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported WAV bit depth {bits}")
    bytes_per_sample = bits // 8
    frame_bytes = bytes_per_sample * channels
    if block_align and block_align != frame_bytes:
        raise ValueError(
            f"WAV blockAlign {block_align} != channels*width {frame_bytes}"
        )
    n_frames = len(pcm_bytes) // frame_bytes
    pcm_bytes = pcm_bytes[: n_frames * frame_bytes]

    if bits == 8:  # 8-bit PCM is unsigned, offset binary around 128
        flat = np.frombuffer(pcm_bytes, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        flat = np.frombuffer(pcm_bytes, dtype="<i2").astype(np.int32)
    elif bits == 32:
        flat = np.frombuffer(pcm_bytes, dtype="<i4").astype(np.int32)
    else:  # 24-bit: widen each 3-byte LE triple to int32 with sign extend
        raw = np.frombuffer(pcm_bytes, dtype=np.uint8).reshape(-1, 3)
        flat = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        flat = np.where(flat & 0x800000, flat - 0x1000000, flat)
    return sample_rate, channels, flat.reshape(n_frames, channels)


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """Encode samples[n_frames][channels] (int, already in range for the
    target width) as a canonical PCM WAV. 8-bit payloads are written
    unsigned (offset 128) per the spec; 16/24/32 signed LE."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, channels = samples.shape
    bytes_per_sample = bits // 8
    if bits == 8:
        body = (samples.astype(np.int64) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        body = samples.astype("<i2").tobytes()
    elif bits == 32:
        body = samples.astype("<i4").tobytes()
    elif bits == 24:
        s = samples.astype(np.int64).ravel() & 0xFFFFFF
        raw = np.empty((s.size, 3), dtype=np.uint8)
        raw[:, 0] = s & 0xFF
        raw[:, 1] = (s >> 8) & 0xFF
        raw[:, 2] = (s >> 16) & 0xFF
        body = raw.tobytes()
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    block_align = bytes_per_sample * channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, bits
    )
    data_pad = b"\x00" if len(body) & 1 else b""
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body + data_pad
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
