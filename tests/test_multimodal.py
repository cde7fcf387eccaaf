"""Multimodal operator tests (SURVEY.md §2.11 L6).

Container bytes are hand-crafted (valid PNG/GIF/JPEG/WAV headers) so the
sniffer is tested against REAL formats without any codec library; the
binaryFile source and Arrow-batched mapInPandas plumbing run end-to-end.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from mrjob_spark.operators.multimodal import (
    decode_image,
    featurize_media,
    read_binary_files,
    sample_video_frames,
    sniff_media,
)


def make_png(w, h):
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def make_gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def make_jpeg(w, h):
    # SOI, APP0 stub, SOF0 with dimensions, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof = b"\xff\xc0" + struct.pack(">HBHH", 11, 8, h, w) + b"\x03\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def make_wav(rate, channels):
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )


def test_sniff_formats():
    assert sniff_media(make_png(640, 480)) == {
        "modality": "image", "format": "png", "width": 640, "height": 480,
        "sample_rate": None, "channels": None,
    }
    g = sniff_media(make_gif(12, 34))
    assert (g["format"], g["width"], g["height"]) == ("gif", 12, 34)
    j = sniff_media(make_jpeg(320, 200))
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 320, 200)
    w = sniff_media(make_wav(44100, 2))
    assert (w["modality"], w["sample_rate"], w["channels"]) == ("audio", 44100, 2)
    mp4 = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 8
    assert sniff_media(mp4)["modality"] == "video"
    assert sniff_media(b"hello world")["modality"] == "unknown"
    assert sniff_media(None)["modality"] == "unknown"
    assert sniff_media(b"")["modality"] == "unknown"


def test_binaryfile_source_and_featurize(spark, tmp_path):
    files = {
        "a.png": make_png(64, 32),
        "b.wav": make_wav(16000, 1),
        "c.bin": b"opaque payload",
    }
    for name, data in files.items():
        (tmp_path / name).write_bytes(data)

    df = read_binary_files(spark, str(tmp_path))
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}

    out = featurize_media(df).collect()
    by_name = {r["path"].rsplit("/", 1)[-1]: r for r in out}
    assert by_name["a.png"]["modality"] == "image"
    assert (by_name["a.png"]["width"], by_name["a.png"]["height"]) == (64, 32)
    assert by_name["b.wav"]["modality"] == "audio"
    assert by_name["b.wav"]["sample_rate"] == 16000
    assert by_name["c.bin"]["modality"] == "unknown"
    for r in out:
        assert r["n_bytes"] == len(files[r["path"].rsplit("/", 1)[-1]])
        assert len(r["feat"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feat"])
        assert len(r["content_hash"]) == 32


def test_featurize_deterministic(spark, tmp_path):
    (tmp_path / "x.png").write_bytes(make_png(8, 8))
    df = read_binary_files(spark, str(tmp_path))
    a = featurize_media(df).collect()[0]
    b = featurize_media(df).collect()[0]
    assert a["feat"] == b["feat"]
    assert a["content_hash"] == b["content_hash"]


def test_full_decode_is_gated():
    """Pixel decode / frame sampling require codec libs; without them the
    operator must fail loudly with NotImplementedError, not silently."""
    try:
        import PIL.Image  # noqa: F401

        pytest.skip("PIL installed; decode gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(make_png(4, 4))
    try:
        import av  # noqa: F401

        pytest.skip("av installed; video gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="av"):
        sample_video_frames(b"\x00\x00\x00\x18ftypmp42", 10)


def test_binary_content_dedup_twin_counts(spark):
    """Cross-modal exact dedup semantics: per-doc twin count + first
    media id, matched/unmatched, and multi-hit fan-in collapsing to ONE
    output row per document (the aggregate-before-join shape)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from mrjob_spark.operators.multimodal import binary_content_dedup

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha"), Row(doc_id=2, text="beta"),
         Row(doc_id=3, text="gamma")]
    )
    media = spark.createDataFrame(
        [Row(media_id=100, content=bytearray(b"alpha")),
         Row(media_id=200, content=bytearray(b"alpha")),
         Row(media_id=300, content=bytearray(b"beta"))]
    )
    out = {
        r["doc_id"]: r
        for r in binary_content_dedup(
            docs, media, doc_payload=F.encode("text", "UTF-8")
        ).collect()
    }
    assert len(out) == 3
    assert (out[1]["n_media_twins"], out[1]["first_media_id"],
            out[1]["status"]) == (2, 100, "matched")
    assert (out[2]["n_media_twins"], out[2]["first_media_id"],
            out[2]["status"]) == (1, 300, "matched")
    assert (out[3]["n_media_twins"], out[3]["first_media_id"],
            out[3]["status"]) == (0, None, "unmatched")


def test_synthesized_payloads_roundtrip_the_sniffer(spark):
    """synthesize_media_payloads builds byte-accurate container headers:
    the metadata the sniffer parses back must equal the arithmetic
    schedule for every modality branch, and the text body must ride
    along (payload strictly longer than the header)."""
    from pyspark.sql import Row

    from mrjob_spark.operators.multimodal import (
        sniff_media,
        synthesize_media_payloads,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"payload body {i} " * (i + 1))
         for i in range(8)]
    )
    rows = {r["doc_id"]: bytes(r["content"])
            for r in synthesize_media_payloads(docs).collect()}
    assert len(rows) == 8
    for i in range(8):
        body = (f"payload body {i} " * (i + 1)).encode()
        meta = sniff_media(rows[i])
        if i % 4 == 0:
            assert meta["format"] == "png"
            assert meta["width"] == 1 + len(body) % 1024
            assert meta["height"] == 1 + i % 768
            assert len(rows[i]) == 24 + len(body)
        elif i % 4 == 1:
            assert meta["format"] == "gif"
            assert (meta["width"], meta["height"]) == (
                1 + len(body) % 640, 1 + i % 480)
        elif i % 4 == 2:
            assert meta["format"] == "wav"
            assert meta["sample_rate"] == 8000 * (1 + i % 3)
            assert meta["channels"] == 1 + i % 2
        else:
            assert meta["modality"] == "unknown"
            assert rows[i] == body
