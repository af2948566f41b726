"""Perceptual image hashing + banded near-dup pairs + audio quality flags
(VERDICT r4 task #7): planted near-duplicate recovery, invariances,
validation, and kernel-vs-numpy parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline.multimodal import (
    _encode_bmp,
    _encode_wav,
    _gray1000,
    _nn_grid,
    _pack_bits,
    audio_quality,
    image_phash,
    phash_duplicates,
    synthesize_media,
)


def _dhash_np(rgb, size=8):
    gray = _gray1000(rgb)
    h, w, _ = rgb.shape
    cells = gray[np.ix_(_nn_grid(h, size), _nn_grid(w, size + 1))]
    return _pack_bits(cells[:, 1:] > cells[:, :-1])


def _rng_image(seed, h=32, w=48):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_pack_bits_signed_wrap():
    bits = np.zeros(64, dtype=bool)
    assert _pack_bits(bits) == 0
    bits[0] = True
    assert _pack_bits(bits) == 1
    bits[:] = True
    assert _pack_bits(bits) == -1  # all 64 bits = two's-complement -1
    only_msb = np.zeros(64, dtype=bool)
    only_msb[63] = True
    assert _pack_bits(only_msb) == -(1 << 63)


def test_phash_matches_numpy_reference(spark):
    imgs = [(i, _encode_bmp(_rng_image(i))) for i in range(6)]
    df = spark.createDataFrame(imgs, "media_id long, payload binary")
    got = {
        r["media_id"]: r["phash"] for r in image_phash(df).collect()
    }
    for i, _ in imgs:
        assert got[i] == _dhash_np(_rng_image(i)), i


def test_planted_near_duplicate_recovery(spark):
    # plant: image 100 is image 0 with a mild brightness lift (+6 on every
    # channel) — identical dHash gradients; image 101 is image 1 with one
    # 8x8 block inverted (a few flipped bits); images 2..9 are unrelated.
    base0, base1 = _rng_image(0), _rng_image(1)
    near0 = np.clip(base0.astype(np.int32) + 6, 0, 255).astype(np.uint8)
    near1 = base1.copy()
    near1[:4, :6] = 255 - near1[:4, :6]
    rows = [(i, _encode_bmp(_rng_image(i))) for i in range(10)]
    rows += [(100, _encode_bmp(near0)), (101, _encode_bmp(near1))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = image_phash(df)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in phash_duplicates(hashes, max_distance=7, num_bands=8).collect()
    }
    assert (0, 100) in pairs
    assert (1, 101) in pairs
    # unrelated random 64-bit hashes sit near Hamming 32; none may pair
    for a, b in pairs:
        assert b >= 100, f"false positive pair {(a, b)}"


def test_banding_is_exact_vs_brute_force(spark):
    # pigeonhole exactness: banded pairs == all-pairs Hamming filter
    media = synthesize_media(spark, n_rows=60, seed=7)
    hashes = image_phash(media.filter(F.col("kind") == "image"))
    rows = {r["media_id"]: r["phash"] for r in hashes.collect()}
    import itertools

    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if bin((rows[a] ^ rows[b]) & ((1 << 64) - 1)).count("1") <= 7
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in phash_duplicates(hashes, max_distance=7, num_bands=8).collect()
    }
    assert banded == brute and len(brute) > 0


def test_dhash_brightness_invariance_ahash_not(spark):
    # base bounded to [0, 215] so the +40 lift saturates nowhere — a truly
    # uniform shift (saturation would flip gradients)
    img = (_rng_image(3).astype(np.int32) * 215 // 255).astype(np.uint8)
    lifted = (img.astype(np.int32) + 40).astype(np.uint8)
    df = spark.createDataFrame(
        [(0, _encode_bmp(img)), (1, _encode_bmp(lifted))],
        "media_id long, payload binary",
    )
    d = {r["media_id"]: r["phash"] for r in image_phash(df, "dhash").collect()}
    # uniform lift preserves every gradient sign exactly
    assert d[0] == d[1]


def test_phash_validation():
    with pytest.raises(ValueError, match="method"):
        image_phash(None, method="md5")
    with pytest.raises(ValueError, match="hash_size"):
        image_phash(None, hash_size=9)
    with pytest.raises(ValueError, match="max_distance < num_bands"):
        phash_duplicates(None, max_distance=4, num_bands=4)
    with pytest.raises(ValueError, match="divide 64"):
        phash_duplicates(None, max_distance=2, num_bands=7)


def test_audio_quality_counts(spark):
    # clip with known composition: 50 silent (0), 30 mid (500), 20 clipped
    # (±32001 is out of int16 range; use 32767/-32768 true rails)
    s = np.concatenate(
        [
            np.zeros(50, dtype=np.int16),
            np.full(30, 500, dtype=np.int16),
            np.full(10, 32767, dtype=np.int16),
            np.full(10, -32768, dtype=np.int16),
        ]
    )
    df = spark.createDataFrame(
        [(1, _encode_wav(s, 8000))], "media_id long, payload binary"
    )
    row = audio_quality(df).collect()[0]
    assert row["n_samples"] == 100
    assert row["n_silent"] == 50
    assert row["n_clipped"] == 20
    assert row["peak"] == 32768
    assert row["energy"] == 30 * 500**2 + 10 * 32767**2 + 10 * 32768**2
    assert row["silence_ratio"] == 0.5
    assert row["clipping_ratio"] == 0.2


def test_audio_quality_validation():
    with pytest.raises(ValueError, match="silence_threshold"):
        audio_quality(None, silence_threshold=-1)
    with pytest.raises(ValueError, match="silence_threshold"):
        audio_quality(None, silence_threshold=500, clip_threshold=400)


def test_phash_duplicates_single_band_exact_config(spark):
    # num_bands=1 / max_distance=0 is the exact-duplicate configuration:
    # the full-width band needs no mask ((1<<64)-1 overflows a signed
    # long literal — round-5 review crash)
    from linkgraph.pipeline.multimodal import phash_duplicates

    hashes = spark.createDataFrame(
        [(1, 12345), (2, 12345), (3, -99), (4, -99), (5, 7)],
        ["media_id", "phash"],
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_duplicates(
            hashes, max_distance=0, num_bands=1
        ).collect()
    )
    assert got == [(1, 2, 0), (3, 4, 0)]
