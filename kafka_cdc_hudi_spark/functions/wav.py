"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal audio path.

Like ``functions/png.py`` for images: the container has no librosa/ffmpeg,
but canonical PCM WAV is fully implementable with ``struct`` — RIFF chunk
framing, fmt parsing, 16-bit little-endian samples. This makes the audio
decode stage a REAL codec (catalog entry ``multimodal_decode_wav``), not a
deterministic fake; compressed formats (mp3/ogg/aac) stay out of scope.

Scope: PCM (format tag 1), 16-bit, any channel count/sample rate; unknown
chunks are skipped per the RIFF spec (a real-world WAV often carries LIST/
INFO chunks before ``data``).
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """Encode interleaved 16-bit PCM samples into a canonical WAV file."""
    if any(not -32768 <= s <= 32767 for s in samples):
        raise ValueError("samples must fit int16")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM16 WAV -> ``(sample_rate, channels, samples)`` with
    ``samples`` the interleaved int16 values. Walks the RIFF chunk list
    (skipping unknown chunks, honoring odd-size padding), validates sizes,
    raises ``ValueError`` on corruption and ``NotImplementedError`` on
    legal-but-unsupported encodings (non-PCM, non-16-bit)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            pcm = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _block, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag != 1:
        raise NotImplementedError(f"non-PCM format tag {tag}")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit samples (only 16-bit)")
    if len(pcm) % 2:
        raise ValueError("odd PCM byte length for 16-bit samples")
    return rate, channels, list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
