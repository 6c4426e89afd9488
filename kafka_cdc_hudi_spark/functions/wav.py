"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal audio path.

Like ``functions/png.py`` for images: the container has no librosa/ffmpeg,
but canonical PCM WAV is fully implementable with ``struct`` — RIFF chunk
framing, fmt parsing, 16-bit little-endian samples. This makes the audio
decode stage a REAL codec (catalog entry ``multimodal_decode_wav``), not a
deterministic fake; compressed formats (mp3/ogg/aac) stay out of scope.

Scope: PCM (format tag 1, 16-bit, any channel count/sample rate) and IMA
ADPCM (format tag 17, 4-bit, mono/stereo — the standard step/index tables,
r12); unknown chunks are skipped per the RIFF spec (a real-world WAV often
carries LIST/INFO chunks before ``data``). mp3/ogg/aac stay out of scope.
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
    legal-but-unsupported encodings. IMA ADPCM (tag 17) inputs return the
    int16 RECONSTRUCTION the encoder's predictor loop defines."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos, fmt, pcm, fact_frames = 12, None, None, None
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
        elif cid == b"fact" and ln >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _block, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == 17:
        return _decode_ima_adpcm(fmt, pcm, fact_frames)
    if tag != 1:
        raise NotImplementedError(f"non-PCM format tag {tag} (PCM=1 and IMA ADPCM=17 are real)")
    if bits != 16:
        raise NotImplementedError(f"{bits}-bit samples (only 16-bit)")
    if len(pcm) % 2:
        raise ValueError("odd PCM byte length for 16-bit samples")
    return rate, channels, list(struct.unpack(f"<{len(pcm) // 2}h", pcm))


# -- IMA ADPCM (format tag 17) ---------------------------------------------------
#
# The most common compressed WAV encoding is fully specified by two public
# tables and integer arithmetic, so it joins PCM as a REAL decode path
# (r12); mp3/ogg/aac remain out of scope (they need real DSP stacks).

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_clamp16(v: int) -> int:
    return -32768 if v < -32768 else 32767 if v > 32767 else v


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """One IMA ADPCM decode step -> (new predictor, new step index)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = _ima_clamp16(pred - diff if nibble & 8 else pred + diff)
    index += _IMA_INDEX_ADJ[nibble & 7]
    return pred, 0 if index < 0 else 88 if index > 88 else index


def _ima_encode_nibble(sample: int, pred: int, index: int) -> int:
    """Pick the nibble whose reconstruction lands closest (the standard
    magnitude-quantizing encoder)."""
    step = _IMA_STEPS[index]
    delta = sample - pred
    nibble = 8 if delta < 0 else 0
    if delta < 0:
        delta = -delta
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    return nibble


def encode_wav_adpcm(
    samples: list[int], sample_rate: int, channels: int = 1, block_align: int | None = None
) -> bytes:
    """Encode int16 samples as IMA ADPCM WAV (format tag 17). Lossy by
    nature: ``decode_wav`` returns the RECONSTRUCTION, which tracks the
    input within the local step size. Mono or stereo."""
    if channels not in (1, 2):
        raise ValueError("IMA ADPCM encoder supports 1 or 2 channels")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channel count")
    if block_align is None:
        block_align = 4 * channels + 32 * channels  # 64 nibbles per channel
    data_words = (block_align - 4 * channels) // (4 * channels)
    frames_per_block = 1 + data_words * 8
    per_ch = [samples[c::channels] for c in range(channels)]
    n_frames = len(per_ch[0])
    pred = [0] * channels
    index = [0] * channels
    out = bytearray()
    f = 0
    while f < n_frames:
        block_frames = min(frames_per_block, n_frames - f)
        for c in range(channels):
            pred[c] = per_ch[c][f]
            out += struct.pack("<hBB", pred[c], index[c], 0)
        # nibble payload: 4-byte words round-robin per channel
        for w in range(data_words):
            for c in range(channels):
                word = 0
                for k in range(8):
                    i = f + 1 + w * 8 + k
                    target = per_ch[c][i] if i < n_frames else pred[c]
                    nib = _ima_encode_nibble(target, pred[c], index[c])
                    pred[c], index[c] = _ima_step(pred[c], index[c], nib)
                    word |= nib << (4 * k)
                out += struct.pack("<I", word)
        f += frames_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        17,
        channels,
        sample_rate,
        sample_rate * block_align // frames_per_block,
        block_align,
        4,
        2,  # cbSize
        frames_per_block,  # wSamplesPerBlock
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        # fact chunk: true per-channel frame count — spec-required for
        # compressed formats; lets the decoder trim final-block padding
        + b"fact"
        + struct.pack("<II", 4, n_frames)
        + b"data"
        + struct.pack("<I", len(out))
        + bytes(out)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_ima_adpcm(
    fmt: bytes, pcm: bytes, fact_frames: int | None = None
) -> tuple[int, int, list[int]]:
    tag, channels, rate, _br, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if bits != 4:
        raise NotImplementedError(f"{bits}-bit IMA ADPCM (only 4-bit)")
    if channels not in (1, 2):
        raise NotImplementedError(f"{channels}-channel IMA ADPCM")
    if block_align < 4 * channels or (block_align - 4 * channels) % (4 * channels):
        raise ValueError("IMA ADPCM block_align inconsistent with channel count")
    data_words = (block_align - 4 * channels) // (4 * channels)
    per_ch: list[list[int]] = [[] for _ in range(channels)]
    pos = 0
    while pos + 4 * channels <= len(pcm):
        # a final block may be TRUNCATED to the samples that remain (real
        # IMA ADPCM writers do this): decode the per-channel headers plus
        # as many whole 4-byte word groups as the remaining bytes carry
        remaining_words = (len(pcm) - pos - 4 * channels) // (4 * channels)
        block_words = min(data_words, remaining_words)
        pred = [0] * channels
        index = [0] * channels
        for c in range(channels):
            pred[c], index[c], _ = struct.unpack_from("<hBB", pcm, pos)
            if index[c] > 88:
                raise ValueError("IMA ADPCM step index out of range")
            pos += 4
            per_ch[c].append(pred[c])
        for _w in range(block_words):
            for c in range(channels):
                (word,) = struct.unpack_from("<I", pcm, pos)
                pos += 4
                for k in range(8):
                    pred[c], index[c] = _ima_step(
                        pred[c], index[c], (word >> (4 * k)) & 0xF
                    )
                    per_ch[c].append(pred[c])
    if fact_frames is not None:
        # the fact chunk records the true frame count: a padded final
        # block inflates the decode, so trim (never extend) to it
        if fact_frames < len(per_ch[0]):
            per_ch = [ch[:fact_frames] for ch in per_ch]
    out: list[int] = []
    for i in range(len(per_ch[0])):
        for c in range(channels):
            out.append(per_ch[c][i])
    return rate, channels, out
