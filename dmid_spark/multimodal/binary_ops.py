"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partition-friendly batching, Arrow UDF
signatures, output shapes — is real and tested. The codec step is real for
BMP / PGM / PPM / PNG / baseline JPEG images and PCM16 WAV audio (pure
NumPy + stdlib, see ``codecs`` and ``jpeg``); video (H.264) and exotic
variants raise NotImplementedError at the decode boundary, marking exactly
where an ffmpeg call plugs in (not in this container). Each operator takes
``impl='fake'`` (deterministic bytes-derived output) or ``impl='real'``
(container sniff + NumPy decode).

All operators are ``mapInPandas`` (Arrow batch iterators): one Python
worker round-trip per batch, never per row; binary payloads stream through
Arrow buffers without copies on the JVM side. Decode itself iterates rows
within a batch — inherent to variable-length payloads — but every
per-payload step is a vectorized NumPy reshape/slice, not a pixel loop.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import codecs
from . import jpeg as jpeg_codec

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, n_frames:int>"
)


def synth_media_table(
    spark: SparkSession, n: int = 64, seed: int = 42, payload: str = "hash"
) -> DataFrame:
    """Deterministic fake media table for tests/benches.

    ``payload='hash'``: opaque sha256-derived bytes (exercises the fake
    decode path and the unknown-container error path).
    ``payload='encoded'``: real container bytes — BMP/PNG/JPEG (rotating by
    media_id) for images, PCM16 WAV for audio — generated per-row from a
    payload-seeded PRNG, so the *real* decode path round-trips. Video stays
    opaque (no uncompressed container worth faking)."""
    base = (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
            ).alias("kind"),
            F.sha2(F.concat(F.lit(f"payload:{seed}:"), F.col("id").cast("string")), 256)
            .cast("binary")
            .alias("payload"),
            F.struct(
                (16 + F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(16))).cast("int").alias("width"),
                (16 + F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(16))).cast("int").alias("height"),
                F.lit(3).alias("channels"),
                F.lit(16000).alias("sample_rate"),
                (1 + F.pmod(F.xxhash64("id", F.lit(seed + 3)), F.lit(30))).cast("int").alias("n_frames"),
            ).alias("meta"),
        )
    )
    if payload == "hash":
        return base

    def encode(it):
        for pdf in it:
            payloads = []
            for mid, kind, raw, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                rng = np.random.default_rng(
                    int.from_bytes(hashlib.sha256(bytes(raw)).digest()[:8], "big")
                )
                if kind == "image":
                    w, h = int(meta["width"]), int(meta["height"])
                    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    # rotate containers so the real-decode path exercises the
                    # raw-layout (BMP), DEFLATE (PNG), and DCT+Huffman (JPEG)
                    # codecs; JPEG is lossy, so its pixels are the decoder's
                    # reconstruction, not the PRNG draw — fine for plumbing
                    slot = int(mid) % 3
                    if slot == 0:
                        payloads.append(codecs.encode_bmp(img))
                    elif slot == 1:
                        payloads.append(codecs.encode_png(img))
                    else:
                        payloads.append(jpeg_codec.encode_jpeg(img, quality=90))
                elif kind == "audio":
                    sr = int(meta["sample_rate"])
                    samples = rng.integers(-(2**15), 2**15, size=sr // 10, dtype=np.int16)
                    payloads.append(codecs.encode_wav(samples, sr))
                else:
                    payloads.append(bytes(raw))
            pdf = pdf.copy()
            pdf["payload"] = payloads
            yield pdf

    return base.mapInPandas(encode, MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, w: int, h: int, c: int) -> np.ndarray:
    """Deterministic stand-in for a codec: seed a PRNG from the payload
    hash and emit a (h, w, c) uint8 array."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def decode_image(df: DataFrame, impl: str = "fake") -> DataFrame:
    """binary payload → flat pixel array + dims. Arrow-batched. ``impl='real'``
    sniffs the container and decodes BMP/PGM/PPM (pure NumPy), PNG (stdlib
    zlib + filter reconstruction), and baseline JPEG (NumPy DCT + canonical
    Huffman) via ``codecs.decode_image_payload``; video remains the declared
    ffmpeg plug point."""

    def run(it):
        for pdf in it:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if impl == "fake":
                    w, h, c = int(meta["width"]), int(meta["height"]), int(meta["channels"])
                    px = _fake_pixels(bytes(payload), w, h, c)
                else:
                    px = codecs.decode_image_payload(bytes(payload))
                    h, w, c = px.shape
                rows.append((int(mid), w, h, c, px.reshape(-1).astype(np.int32)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "pixels"]
            )

    return df.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id long, width int, height int, channels int, pixels array<int>"
    )


def decode_audio(df: DataFrame, impl: str = "fake") -> DataFrame:
    """binary payload → float32 samples in [-1, 1) + rate/shape. ``impl='real'``
    parses RIFF/WAVE PCM16 with pure NumPy (``codecs.decode_wav``); compressed
    audio (mp3/ogg/aac) raises at the declared plug point."""

    def run(it):
        for pdf in it:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if impl == "fake":
                    sr = int(meta["sample_rate"])
                    seed = int.from_bytes(hashlib.sha256(bytes(payload)).digest()[:8], "big")
                    rng = np.random.default_rng(seed)
                    s = rng.integers(-(2**15), 2**15, size=(sr // 10, 1), dtype=np.int16)
                else:
                    raw = bytes(payload)
                    if codecs.sniff(raw) != "wav":
                        raise NotImplementedError(
                            "compressed audio codec requires ffmpeg/soundfile — not in "
                            "this container; plug the codec in here"
                        )
                    s, sr = codecs.decode_wav(raw)
                rows.append(
                    (int(mid), int(sr), s.shape[0], s.shape[1],
                     (s.astype(np.float32) / 32768.0).reshape(-1))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "n_samples", "channels", "samples"]
            )

    return df.filter(F.col("kind") == "audio").mapInPandas(
        run,
        "media_id long, sample_rate int, n_samples int, channels int, samples array<float>",
    )


def resize_image(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel arrays (pure NumPy per
    Arrow batch — the real-codec version would swap in PIL.resize)."""

    def run(it):
        for pdf in it:
            rows = []
            for mid, w, h, c, px in zip(
                pdf["media_id"], pdf["width"], pdf["height"], pdf["channels"], pdf["pixels"]
            ):
                img = np.array(px, dtype=np.int32).reshape(int(h), int(w), int(c))
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                out = img[yi][:, xi]
                rows.append((int(mid), out_w, out_h, int(c), out.reshape(-1)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "pixels"]
            )

    return decoded.mapInPandas(
        run, "media_id long, width int, height int, channels int, pixels array<int>"
    )


def extract_features(decoded: DataFrame, dim: int = 16) -> DataFrame:
    """Cheap deterministic feature vector (channel-bucket histogram) per
    decoded image — the placeholder for a real embedding model call."""

    def run(it):
        for pdf in it:
            rows = []
            for mid, px in zip(pdf["media_id"], pdf["pixels"]):
                arr = np.array(px, dtype=np.float64)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                feat = hist / max(arr.size, 1)
                rows.append((int(mid), feat.astype(np.float32)))
            yield pd.DataFrame(rows, columns=["media_id", "features"])

    return decoded.mapInPandas(run, "media_id long, features array<float>")


def frame_sample(df: DataFrame, every: int = 5, impl: str = "fake") -> DataFrame:
    """Video frame sampling: emit one row per sampled frame index (the
    real impl would decode those frames via ffmpeg)."""

    def run(it):
        for pdf in it:
            rows = []
            for mid, meta in zip(pdf["media_id"], pdf["meta"]):
                if impl != "fake":
                    raise NotImplementedError("real frame decode requires ffmpeg")
                for fi in range(0, int(meta["n_frames"]), every):
                    rows.append((int(mid), fi))
            yield pd.DataFrame(rows, columns=["media_id", "frame_index"])

    return df.filter(F.col("kind") == "video").mapInPandas(
        run, "media_id long, frame_index int"
    )


def audio_features(decoded: DataFrame, n_fft: int = 256, n_bands: int = 8) -> DataFrame:
    """Real DSP features per decoded audio row (NOT a stub — runs on the
    real WAV decode path): RMS energy, zero-crossing rate, spectral
    centroid / rolloff(0.85) from the mean FFT magnitude spectrum over
    ``n_fft``-sample frames (Hann window, hop = n_fft//2), plus
    ``n_bands`` log band energies. Channels are mixed down first.

    Vectorized NumPy per Arrow batch (``np.fft.rfft`` over a strided frame
    matrix) — the mapInPandas shape means the 100 TB path is one scan with
    per-batch C-loop work, no per-row Python in the frame math."""

    def run(it):
        for pdf in it:
            rows = []
            for mid, sr, n, c, samples in zip(
                pdf["media_id"], pdf["sample_rate"], pdf["n_samples"],
                pdf["channels"], pdf["samples"],
            ):
                x = np.asarray(samples, dtype=np.float64).reshape(int(n), int(c)).mean(axis=1)
                rms = float(np.sqrt(np.mean(x**2))) if x.size else 0.0
                zcr = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if x.size > 1 else 0.0
                )
                hop = n_fft // 2
                if x.size >= n_fft:
                    n_frames = 1 + (x.size - n_fft) // hop
                    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
                    frames = x[idx] * np.hanning(n_fft)[None, :]
                    mag = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)
                else:
                    mag = np.abs(np.fft.rfft(x, n=n_fft))
                freqs = np.fft.rfftfreq(n_fft, d=1.0 / float(sr))
                tot = float(mag.sum())
                centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                if tot > 0:
                    cum = np.cumsum(mag)
                    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * tot))])
                else:
                    rolloff = 0.0
                bands = np.array_split(mag**2, n_bands)
                band_log = np.log10(np.array([b.sum() for b in bands]) + 1e-12)
                rows.append(
                    (int(mid), rms, zcr, centroid, rolloff,
                     band_log.astype(np.float32))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "rms", "zcr", "spectral_centroid",
                         "rolloff_hz", "band_log_energy"],
            )

    return decoded.mapInPandas(
        run,
        "media_id long, rms double, zcr double, spectral_centroid double, "
        "rolloff_hz double, band_log_energy array<float>",
    )
