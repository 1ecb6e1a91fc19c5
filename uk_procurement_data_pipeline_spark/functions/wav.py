"""Pure-stdlib WAV (RIFF/PCM) codec — the audio face of the multimodal
column story (r12, VERDICT r11 item 6).

Like functions/png.py for images: audio cells travel as opaque binary
columns, and the engine's decode seam is a REAL codec, not a stub — a
16-bit mono/stereo PCM parser written against the RIFF container spec
with ``struct`` alone (no ``wave`` module, keeping the package's
no-dependency posture symmetric with the PNG/xlsx/zip codecs).

Strict error contract, mirroring decode_png: anything that is not a
well-formed PCM WAV raises ``ValueError`` with a named reason (bad magic,
missing fmt/data chunk, non-PCM encoding, unsupported bit depth,
truncated payload) — a corrupt blob must become a flagged row at the
query layer, never a silent zero-sample decode.

Encode is deliberately minimal (16-bit little-endian PCM, one fmt + one
data chunk) and decode-complete: encode_wav -> decode_wav round-trips
samples exactly, which is what lets the DuckDB oracles recompute audio
features straight from the generation rule while the engine exercises
the real container path.
"""

from __future__ import annotations

import struct

_PCM = 1


def encode_wav(
    samples: list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """16-bit PCM encode. ``samples`` are interleaved int16 values
    (frame-major for multi-channel); values outside int16 raise."""
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    if len(samples) % channels:
        raise ValueError(
            f"{len(samples)} samples not divisible by {channels} channels"
        )
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} outside int16 range")
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH",
        _PCM,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    data = struct.pack(f"<{len(samples)}h", *samples)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Parse a PCM WAV: returns (sample_rate, channels, samples) with
    samples interleaved int16. Walks the chunk list per the RIFF spec
    (unknown chunks skipped, word-aligned), so files with LIST/INFO or
    fact chunks from other writers still decode."""
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not a RIFF container (bad magic)")
    if data[8:12] != b"WAVE":
        raise ValueError("RIFF form is not WAVE")
    riff_len = struct.unpack_from("<I", data, 4)[0]
    if riff_len + 8 > len(data):
        raise ValueError(
            f"truncated RIFF payload: header declares {riff_len + 8} bytes, "
            f"got {len(data)}"
        )
    pos = 12
    fmt_chunk: tuple[int, int, int] | None = None  # (channels, rate, bits)
    raw: bytes | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body_at = pos + 8
        if body_at + size > len(data):
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk shorter than PCM minimum")
            audio_format, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", data, body_at
            )
            if audio_format != _PCM:
                raise ValueError(
                    f"unsupported audio format {audio_format} (PCM only)"
                )
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits} (16 only)")
            if channels < 1:
                raise ValueError("fmt declares zero channels")
            fmt_chunk = (channels, rate, bits)
        elif cid == b"data":
            raw = data[body_at : body_at + size]
        pos = body_at + size + (size % 2)  # chunks are word-aligned
    if fmt_chunk is None:
        raise ValueError("missing fmt chunk")
    if raw is None:
        raise ValueError("missing data chunk")
    if len(raw) % 2:
        raise ValueError("data chunk is not whole int16 frames")
    channels, rate, _bits = fmt_chunk
    n = len(raw) // 2
    if n % channels:
        raise ValueError(
            f"{n} samples not divisible by {channels} channels"
        )
    return rate, channels, list(struct.unpack(f"<{n}h", raw))


def window_features(
    samples: list[int], window: int
) -> list[tuple[int, int, int]]:
    """Integer per-window features over a mono sample stream: for each
    full-or-partial window -> (window_idx, energy, zcross) where energy =
    sum of squared samples (exact int) and zcross counts strict sign
    flips between CONSECUTIVE samples within the window (the pair at
    stream index i belongs to window i // window and only exists when
    i % window > 0 — so a one-sample perturbation moves features of at
    most one window, the property the banded audio near-dup relies on).
    All-integer so DuckDB recomputes the identical values."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    out: list[tuple[int, int, int]] = []
    for w0 in range(0, len(samples), window):
        chunk = samples[w0 : w0 + window]
        energy = sum(s * s for s in chunk)
        zc = sum(
            1
            for a, b in zip(chunk, chunk[1:])
            if a * b < 0
        )
        out.append((w0 // window, energy, zc))
    return out
