"""Deterministic stand-in for lossy codecs (jpeg/webp) — CLEARLY MARKED STUB.

The sandbox has no libjpeg / libwebp / Pillow / imagecodecs.  To keep the
pipeline's lossy path real end-to-end (distinct fmt dispatch, non-identical
decode, PSNR gate exercised), "jpeg"/"webp" use our own container:

    b"GRLY" | fmt_code:u8 | step:u8 | <png bytes of quantized pixels>

Encode applies uniform quantization  q = (round(p / step) * step)  with
step=4, giving PSNR ≈ 20*log10(255 / (step/sqrt(12))) ≈ 46.8 dB — lossy,
deterministic, above the ≥40 dB gate in BASELINE.json.  Decode is exact on
the quantized pixels.  Swapping in real codecs means replacing these two
functions only; every caller goes through gdal_ray.codecs.decode/encode.
"""

from __future__ import annotations

import numpy as np

from gdal_ray.codecs.png import decode_png, encode_png

FAKE_LOSSY_MAGIC = b"GRLY"
_FMT_CODE = {"jpeg": 1, "webp": 2}
QUANT_STEP = 4


def encode_lossy(arr: np.ndarray, fmt: str, step: int = QUANT_STEP) -> bytes:
    arr = np.asarray(arr, dtype=np.uint8)
    q = np.clip(
        (arr.astype(np.int32) + step // 2) // step * step, 0, 255
    ).astype(np.uint8)
    return FAKE_LOSSY_MAGIC + bytes([_FMT_CODE[fmt], step]) + encode_png(q)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != FAKE_LOSSY_MAGIC:
        raise ValueError("not a GRLY container")
    return decode_png(data[6:])
