"""Multimodal audio/video plumbing + IVF ANN tests:

- audio: real pcm16 decode features; external-codec rows are TYPED
  failures (decode_ok=false), never task errors
- video: frame fan-out (1 binary row → k frame rows) with exact phash
- corrupt-image regression: one undecodable row must not corrupt other
  rows' 64-bit phashes (mixed int/None → float64 coercion)
- resize: bilinear identity on flat images + feature determinism
- IVF: nprobe=all equals brute force; nprobe=1 scans a subset
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from wormpy_spark.fixtures.avgen import generate_audio, generate_video
from wormpy_spark.fixtures.imagegen import generate_images
from wormpy_spark.fixtures.spark_tables import (
    audio_to_spark,
    images_to_spark,
    truth_to_spark,
    video_to_spark,
)
from wormpy_spark.functions.imageops import image_features, resize_bilinear
from wormpy_spark.operators.av import audio_features, video_frame_sample
from wormpy_spark.operators.multimodal import decode_verify, resize_features
from wormpy_spark.operators.similarity import ann_ivf_topk


def test_audio_features_real_and_stub(spark):
    pdf = generate_audio(n_clips=12, seed=5)
    rows = {r["audio_id"]: r for r in audio_features(audio_to_spark(spark, pdf)).collect()}
    assert len(rows) == 12
    for _, src in pdf.iterrows():
        got = rows[src["audio_id"]]
        if src["fmt"] in ("pcm16", "adpcm", "wav"):  # all decode for real
            assert got["decode_ok"] and got["rms"] > 0 and got["duration_s"] > 0
            # duration must equal n_samples / sample_rate exactly (4 dp)
            assert got["duration_s"] == round(
                int(src["n_samples"]) / int(src["sample_rate"]), 4
            )
        else:
            assert not got["decode_ok"] and got["rms"] is None


def test_video_frame_fanout_and_phash(spark):
    pdf = generate_video(n_videos=6, seed=6)
    out = video_frame_sample(video_to_spark(spark, pdf), every_k=2).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["video_id"], []).append(r)
    for _, src in pdf.iterrows():
        got = by_vid[src["video_id"]]
        if src["fmt"] in ("rawrgb", "mjpeg", "y4m"):  # all decode for real
            n_expected = (int(src["n_frames"]) + 1) // 2
            assert len(got) == n_expected
            assert all(r["decode_ok"] and r["frame_ix"] % 2 == 0 for r in got)
            assert all(isinstance(r["frame_phash"], int) for r in got)
        else:
            assert len(got) == 1 and not got[0]["decode_ok"]


def test_decode_verify_corrupt_row_does_not_corrupt_phashes(spark):
    """Regression: a None phash (undecodable row) in a batch must not
    float-coerce the other rows' int64 phashes."""
    images_pdf, truth_pdf = generate_images(n_images=6, seed=42)
    bad = images_pdf.iloc[[0]].copy()
    bad["image_id"] = "img_corrupt"
    bad["fmt"] = "weird_fmt"  # no codec → decode_ok False, phash None
    mixed = pd.concat([images_pdf, bad], ignore_index=True)
    out = {
        r["image_id"]: r
        for r in decode_verify(
            images_to_spark(spark, mixed), truth_to_spark(spark, truth_pdf)
        ).collect()
    }
    assert out["img_corrupt"]["decode_ok"] is False
    assert out["img_corrupt"]["phash"] is None
    for _, src in images_pdf.iterrows():
        # exact int64 equality vs the generator's phash
        assert out[src["image_id"]]["phash"] == int(src["phash"])


def test_resize_bilinear_flat_identity_and_features():
    flat = np.full((17, 11, 3), 77, np.uint8)
    small = resize_bilinear(flat, 8, 8)
    assert small.shape == (8, 8, 3)
    assert (small == 77).all()  # bilinear of a constant is constant
    f = image_features(small)
    assert f["mean_r"] == 77.0 and f["std_gray"] == 0.0 and f["entropy"] == 0.0


def test_resize_features_spark_roundtrip(spark):
    images_pdf, _ = generate_images(n_images=8, seed=17)
    out = resize_features(images_to_spark(spark, images_pdf), 16, 16).collect()
    assert len(out) == 8
    assert all(r["resize_ok"] for r in out)
    assert all(len(r["resized_sha256"]) == 64 for r in out)
    assert all(0.0 <= r["entropy"] <= 3.0 + 1e-9 for r in out)  # 8 bins → ≤3 bits


def test_ivf_full_probe_equals_brute_and_knob(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    full = ann_ivf_topk(emb, q, k=10, nprobe=None, exclude_id=0).collect()
    # brute force = LSH at full radius = IVF at full probe
    from wormpy_spark.operators.similarity import ann_lsh_topk

    brute = ann_lsh_topk(emb, q, k=10, hamming_radius=16, exclude_id=0).collect()
    assert [(r["vec_id"], r["score"]) for r in full] == [
        (r["vec_id"], r["score"]) for r in brute
    ]
    # nprobe=1 scans a strict subset of buckets: still returns k rows,
    # scores are a subset-ranking (no better than full)
    narrow = ann_ivf_topk(emb, q, k=10, nprobe=1, exclude_id=0).collect()
    assert len(narrow) == 10
    full_scores = {r["vec_id"]: r["score"] for r in full}
    assert narrow[0]["score"] <= full[0]["score"]
    assert all(
        r["score"] <= full[0]["score"] + 1e-9 for r in narrow
    )


def test_adpcm_and_mjpeg_real_compressed_codecs(spark):
    """The compressed formats decode for real: adpcm clips produce
    features (decode_ok) matching a local decode of the same bytes;
    mjpeg videos produce per-frame rows whose phash equals phash of the
    JPEG-decoded frames; mp3/h264 remain typed failure rows."""
    import numpy as np

    from wormpy_spark.fixtures.avgen import generate_audio, generate_video
    from wormpy_spark.fixtures.spark_tables import audio_to_spark, video_to_spark
    from wormpy_spark.functions.adpcm import decode_adpcm
    from wormpy_spark.operators.av import audio_features, video_frame_sample

    audio = generate_audio(n_clips=18, seed=4242)
    assert set(audio["fmt"]) >= {"pcm16", "adpcm", "mp3"}
    got = {r["audio_id"]: r for r in audio_features(audio_to_spark(spark, audio)).collect()}
    for _, r in audio.iterrows():
        g = got[r["audio_id"]]
        if r["fmt"] == "mp3":
            assert g["decode_ok"] is False and g["rms"] is None
        else:
            assert g["decode_ok"] is True
            if r["fmt"] == "adpcm":
                x = decode_adpcm(bytes(r["bytes"])).astype(np.float64) / 32768.0
                assert g["rms"] == round(float(np.sqrt((x * x).mean())), 4)
                assert g["duration_s"] == round(len(x) / int(r["sample_rate"]), 4)

    video = generate_video(n_videos=8, seed=4343)
    assert set(video["fmt"]) >= {"rawrgb", "mjpeg", "h264"}
    rows = video_frame_sample(video_to_spark(spark, video), every_k=2).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    import struct

    from wormpy_spark.functions.imageops import phash64
    from wormpy_spark.functions.jpeg import decode_jpeg

    for _, v in video.iterrows():
        out = by_vid[v["video_id"]]
        if v["fmt"] == "h264":
            assert len(out) == 1 and out[0]["decode_ok"] is False
        elif v["fmt"] == "mjpeg":
            body = bytes(v["bytes"])
            frames, pos = [], 0
            while pos + 4 <= len(body):
                (ln,) = struct.unpack_from("<I", body, pos)
                frames.append(decode_jpeg(body[pos + 4 : pos + 4 + ln]))
                pos += 4 + ln
            assert len(frames) == int(v["n_frames"])
            want = {
                ix: phash64(f) for ix, f in enumerate(frames) if ix % 2 == 0
            }
            got_v = {r["frame_ix"]: r["frame_phash"] for r in out}
            assert got_v == want


def test_wav_and_y4m_real_container_codecs(spark):
    """RIFF/WAV audio rows and YUV4MPEG2 video rows decode for real:
    wav features match a local decode of the same bytes; y4m frame
    phashes equal phashes of locally-decoded frames."""
    import numpy as np

    from wormpy_spark.fixtures.avgen import generate_audio, generate_video
    from wormpy_spark.fixtures.spark_tables import audio_to_spark, video_to_spark
    from wormpy_spark.functions.wav import decode_wav
    from wormpy_spark.functions.y4m import iter_y4m_frames
    from wormpy_spark.functions.imageops import phash64
    from wormpy_spark.operators.av import audio_features, video_frame_sample

    audio = generate_audio(n_clips=18, seed=8811)
    assert (audio["fmt"] == "wav").any()
    got = {r["audio_id"]: r for r in audio_features(audio_to_spark(spark, audio)).collect()}
    for _, r in audio[audio["fmt"] == "wav"].iterrows():
        g = got[r["audio_id"]]
        assert g["decode_ok"] is True
        samples, sr = decode_wav(bytes(r["bytes"]))
        assert sr == int(r["sample_rate"]) and len(samples) == int(r["n_samples"])
        x = samples.astype(np.float64) / 32768.0
        assert g["rms"] == round(float(np.sqrt((x * x).mean())), 4)

    video = generate_video(n_videos=9, seed=8822)
    assert (video["fmt"] == "y4m").any()
    rows = video_frame_sample(video_to_spark(spark, video), every_k=2).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r)
    for _, v in video[video["fmt"] == "y4m"].iterrows():
        frames = list(iter_y4m_frames(bytes(v["bytes"])))
        assert len(frames) == int(v["n_frames"])
        want = {ix: phash64(f) for ix, f in enumerate(frames) if ix % 2 == 0}
        got_v = {r["frame_ix"]: r["frame_phash"] for r in by_vid[v["video_id"]]}
        assert got_v == want


def test_mp3_frame_metadata_real_headers(spark):
    """mp3 fixture bytes are structurally real MPEG-1 Layer III
    streams: header-walk metadata extraction works (frame count,
    bitrate, duration estimate) while decode remains a typed stub."""
    from wormpy_spark.fixtures.avgen import generate_audio
    from wormpy_spark.fixtures.spark_tables import audio_to_spark
    from wormpy_spark.functions.mp3meta import (
        SAMPLES_PER_FRAME,
        build_mp3_frames,
        parse_mp3_frames,
    )
    from wormpy_spark.operators.av import audio_features

    audio = generate_audio(n_clips=18, seed=9911)
    mp3 = audio[audio["fmt"] == "mp3"]
    assert len(mp3) > 0
    for _, r in mp3.iterrows():
        meta = parse_mp3_frames(bytes(r["bytes"]))
        assert meta is not None and meta["n_frames"] >= 4
        assert meta["sample_rate"] == 44100
        assert meta["est_duration_s"] == round(
            meta["n_frames"] * SAMPLES_PER_FRAME / 44100, 4
        )
    # decode remains a typed failure row, never a task error
    got = {r["audio_id"]: r for r in audio_features(audio_to_spark(spark, audio)).collect()}
    for _, r in mp3.iterrows():
        assert got[r["audio_id"]]["decode_ok"] is False
    # garbage bytes → None (no false syncs on random data is not
    # guaranteed, but a short non-sync prefix must bail cleanly)
    assert parse_mp3_frames(b"\x00\x01\x02\x03" * 8) is None
    # deterministic builder
    assert build_mp3_frames(5, seed=3) == build_mp3_frames(5, seed=3)


def test_ann_batch_topk_prune_correctness(spark):
    """The per-batch top-k prune must be lossless: results equal a
    no-prune run even when Arrow batches are tiny (k spans batches),
    and self-matches are excluded."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        from wormpy_spark.operators.similarity import ann_batch_topk

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qrows = emb.filter(F.col("vec_id") < 3).collect()
        queries = [
            (r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows
        ]
        got = ann_batch_topk(emb, queries, k=8).collect()
        # no-prune reference: k = corpus size (every batch emits all)
        n = emb.count()
        ref = ann_batch_topk(emb, queries, k=n).collect()
        ref_by_q = {}
        for r in ref:
            if r["rk"] <= 8:
                ref_by_q.setdefault(r["query_id"], []).append(
                    (r["rk"], r["vec_id"], r["score"])
                )
        got_by_q = {}
        for r in got:
            got_by_q.setdefault(r["query_id"], []).append(
                (r["rk"], r["vec_id"], r["score"])
            )
        assert {q: sorted(v) for q, v in got_by_q.items()} == {
            q: sorted(v) for q, v in ref_by_q.items()
        }
        assert all(r["vec_id"] != r["query_id"] for r in got)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")


def test_ivf_index_persist_load_and_partition_pruning(spark, tmp_path):
    """A persisted IVF index reuses across queries (same results as a
    fresh build), and a probe's bucket filter prunes to the matching
    bucket= partition DIRECTORIES on disk — the Iceberg-bucket layout
    made literal."""
    from wormpy_spark.operators.similarity import (
        ann_ivf_topk,
        build_ivf_index,
        load_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    fresh = ann_ivf_topk(emb, q, k=5, nprobe=None, exclude_id=0).collect()
    idx_path = str(tmp_path / "ivf")
    built = build_ivf_index(emb, path=idx_path)
    loaded = load_ivf_index(spark, idx_path)
    for index in (built, loaded):
        got = ann_ivf_topk(
            emb, q, k=5, nprobe=None, exclude_id=0, index=index
        ).collect()
        assert [(r["vec_id"], r["score"]) for r in got] == [
            (r["vec_id"], r["score"]) for r in fresh
        ]

    # partition pruning: the bucket filter must land in the scan's
    # PartitionFilters (directory-level pruning), not a post-scan Filter
    one = loaded.assigned.filter(F.col("bucket") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "(bucket" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # and the pruned scan actually enumerates fewer rows
    assert one.count() < loaded.assigned.count()
