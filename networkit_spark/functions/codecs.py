"""Pure-numpy/stdlib media codecs for the multimodal pipeline.

The container has no PIL/libjpeg/ffmpeg, so compressed codecs stay gated
— but UNCOMPRESSED formats need nothing beyond numpy and the stdlib:

  * BMP  (BITMAPINFOHEADER, 24-bit, bottom-up, 4-byte row padding)
  * PPM  (P6 binary)
  * WAV  (PCM16, stdlib `wave`)

These make the multimodal operators REAL end-to-end: decode →
feature-extract → resize → re-encode all run on actual bytes inside
mapInPandas Arrow batches. JPEG/PNG/MP4 raise a loud, documented error.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


# ------------------------------------------------------------------- BMP
def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → 24-bit BMP bytes (BITMAPINFOHEADER)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp expects uint8 (H, W, 3) RGB")
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3
    pad = row_size - w * 3
    # BMP stores BGR, bottom-up, rows padded to 4 bytes
    bgr = arr[::-1, :, ::-1]
    rows = bgr.reshape(h, w * 3)
    if pad:
        rows = np.hstack([rows, np.zeros((h, pad), dtype=np.uint8)])
    pixel_data = rows.tobytes()
    file_size = 14 + 40 + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → uint8 (H, W, 3) RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


# ------------------------------------------------------------------- PPM
def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → binary P6 PPM."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_ppm expects uint8 (H, W, 3) RGB")
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM → uint8 (H, W, 3) RGB (comments supported)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    return np.frombuffer(
        payload, dtype=np.uint8, count=w * h * 3, offset=pos
    ).reshape(h, w, 3)


# ------------------------------------------------------------------- WAV
def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples → PCM16 WAV bytes (stdlib wave)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects int16 mono samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes → (int16 samples [n, channels] squeezed, rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        raw = wf.readframes(n)
    samples = np.frombuffer(raw, dtype=np.int16)
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return samples, rate


# ------------------------------------------------------------- dispatch
def decode_image(payload: bytes, mime: str | None = None) -> np.ndarray:
    """Decode by sniffing magic bytes (mime is advisory). BMP + PPM real;
    compressed codecs raise loudly with the swap-in instruction."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        f"compressed image codec ({mime or 'unknown'}) requires PIL/libjpeg "
        "— not in this container; BMP and P6 PPM decode natively. Swap this "
        "dispatch for PIL.Image.open when the library is available."
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    cols = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return arr[rows][:, cols]
