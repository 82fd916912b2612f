"""Multimodal column plumbing: binary payloads + typed metadata through
Arrow-batched mapInPandas (X5). Codecs are stubbed; the Spark-side
schema/batch/pruning behavior is what's under test."""

from __future__ import annotations

import hashlib

import pytest

from real_time_crypto_market_data_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some payload text") for i in range(30)],
        "doc_id LONG, text STRING",
    )
    return MM.documents_as_media(docs)


def test_media_schema_and_parquet_roundtrip(media, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("media") / "media.parquet")
    media.write.mode("overwrite").parquet(out)
    back = media.sparkSession.read.parquet(out)
    # parquet reads back nullable; compare names+types, not nullability
    assert back.schema.simpleString() == media.schema.simpleString()
    assert back.count() == 30
    row = back.where("media_id = 3").first()
    assert bytes(row.payload) == b"document number 3 with some payload text"
    assert row.meta.n_bytes == len(row.payload)
    assert row.kind in ("image", "audio", "video")


def test_decode_stub_is_explicit(media):
    with pytest.raises(NotImplementedError, match="no codec"):
        MM.decode_stub(b"bytes", "image")


def test_decode_seam_swaps_in_end_to_end(media, monkeypatch):
    """r9 verdict item: exercise the declared codec swap-in seam once
    with a real (fake) decoder, end-to-end through the documented
    mapInPandas decode stage into extract_features - proving the seam's
    signature and the Arrow batch shape around it actually compose."""
    import pandas as pd

    monkeypatch.setattr(MM, "decode_stub", lambda payload, kind: bytes(payload)[::-1])
    dec = MM.decode_stub  # bind by value: the closure ships the codec to workers

    def decode(batches):
        for pdf in batches:  # the pattern decode_stub's docstring names
            pdf = pdf.copy()
            pdf["payload"] = [dec(bytes(p), k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pdf

    decoded = media.mapInPandas(decode, schema=media.schema)
    out = {r.media_id: r for r in MM.extract_features(decoded).collect()}
    assert len(out) == 30 and all(len(r.feat) == 8 for r in out.values())
    # features hash the DECODED payload: sha256 of the reversed text
    want = hashlib.sha256(b"document number 3 with some payload text"[::-1]).hexdigest()
    assert out[3].sha256 == want


def test_feature_extraction_deterministic_and_normalized(media):
    feats = MM.extract_features(media, dims=8)
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 30
    r = rows[7]
    assert len(r.feat) == 8
    assert sum(v * v for v in r.feat) == pytest.approx(1.0)
    payload = b"document number 7 with some payload text"
    assert r.sha256 == hashlib.sha256(payload).hexdigest()
    assert r.n_bytes == len(payload)
    # repartitioning must not change features (pure function of payload)
    rows2 = {x.media_id: x.feat for x in MM.extract_features(media.repartition(7), dims=8).collect()}
    assert rows2[7] == r.feat
    # payload column is gone after the feature stage
    assert "payload" not in feats.columns


def test_thumbnails_truncate(media):
    t = {r.media_id: r for r in MM.resize_thumbnails(media, max_bytes=10).collect()}
    assert bytes(t[3].thumb) == b"document n"
    assert t[3].thumb_w <= 16 and t[3].thumb_h <= 16


def test_frame_sampling_only_video(media):
    frames = MM.sample_frames(media, every_n=10)
    rows = frames.collect()
    assert rows, "expected at least one video with sampled frames"
    assert all(r.frame_idx % 10 == 0 for r in rows)
    kinds = {r.kind for r in media.join(frames, "media_id").select("kind").collect()}
    assert kinds == {"video"}


def test_metadata_rollup_prunes_payload(media, tmp_path_factory):
    # from parquet, the metadata-only agg must not read the payload col
    out = str(tmp_path_factory.mktemp("media2") / "m.parquet")
    media.write.mode("overwrite").parquet(out)
    back = media.sparkSession.read.parquet(out)
    summary = MM.media_summary(back)
    plan = summary._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema")[-1][:400]
    counts = {r.kind: r.n for r in summary.collect()}
    assert sum(counts.values()) == 30


def test_binary_file_ingestion_adapter(spark, tmp_path_factory):
    """X5 ingestion: a directory of files -> MEDIA schema via binaryFile."""
    d = tmp_path_factory.mktemp("blobs")
    (d / "a.png").write_bytes(b"\x89PNG fake payload")
    (d / "b.png").write_bytes(b"\x89PNG other")
    media = MM.read_binary_files(spark, str(d), kind="image")
    rows = sorted(media.collect(), key=lambda r: r.meta.n_bytes)
    assert len(rows) == 2
    assert rows[1].meta.n_bytes == len(b"\x89PNG fake payload")
    assert rows[0].meta["format"] == "png"
    assert rows[0].kind == "image"
    # adapter output feeds the feature stage unchanged
    feats = MM.extract_features(media).collect()
    assert len(feats) == 2 and all(len(f.feat) == 8 for f in feats)


def test_fake_features_golden_values():
    """Pin _fake_features to exact expected doubles for a known payload
    (the X5 value contract the DuckDB oracle re-derives from sha256)."""
    import struct

    payload = b"hello"
    h = hashlib.sha256(payload).digest()
    vals = [struct.unpack("<I", h[4 * i : 4 * i + 4])[0] / 2**32 for i in range(8)]
    norm = sum(v * v for v in vals) ** 0.5
    expected = [v / norm for v in vals]
    got = MM._fake_features(payload)
    assert got == expected
    # spot-pin two literals so a silent formula change cannot hide
    assert got[0] == pytest.approx(0.6199651641526901, abs=1e-12)
    assert abs(sum(v * v for v in got) - 1.0) < 1e-12
