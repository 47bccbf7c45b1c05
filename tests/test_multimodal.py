"""Multimodal plumbing: perceptual-hash dedup over opaque payloads.
The decode is stubbed (no codecs in the container), so these tests pin
the REAL parts — the hash math, the Arrow batch shape, and the block
join's guarantee that near pairs are found without all-pairs work."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators.multimodal import (
    _phash63,
    image_phash,
    phash_near_pairs,
)


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, "image", "raw", bytearray(b), len(b)) for i, b in rows],
        "doc_id long, media_type string, format string, data binary, n_bytes long",
    )


def test_phash63_pure_math():
    assert _phash63(b"") == 0
    h = _phash63(b"hello world " * 20)
    assert 0 <= h < (1 << 63)
    assert _phash63(b"hello world " * 20) == h  # deterministic


def test_image_phash_matches_driver_side(spark):
    payloads = [(1, b"abc" * 100), (2, b"xyzw" * 77), (3, b"")]
    got = {
        r["doc_id"]: r["phash"]
        for r in image_phash(_media(spark, payloads)).collect()
    }
    assert got == {i: _phash63(b) for i, b in payloads}


def test_phash_near_pairs_finds_identical_and_perturbed(spark):
    base = (b"the quick brown fox jumps over the lazy dog " * 30)
    perturbed = bytearray(base)
    perturbed[100] ^= 0xFF  # one-byte corruption: tiny Hamming delta
    rows = [
        (1, base),
        (2, bytes(base)),          # identical -> hamming 0
        (3, bytes(perturbed)),     # near-dup  -> small hamming
        (4, bytes(reversed(base)) * 2),  # different length+content
    ]
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in phash_near_pairs(_media(spark, rows), max_hamming=8).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 8
    assert (2, 3) in pairs
    # the unrelated payload must not pair with anything
    assert not any(4 in p for p in pairs)


def test_phash_near_pairs_no_cartesian(spark):
    from pubsub_mapreduce_spark.plans.explain import assert_no_cartesian

    df = phash_near_pairs(
        _media(spark, [(i, bytes([i % 251]) * (50 + i)) for i in range(20)])
    )
    assert_no_cartesian(df)


def test_audio_window_energy_partial_window_and_exact_sums(spark):
    from pubsub_mapreduce_spark.operators.multimodal import audio_window_energy

    payload = bytes(range(256)) + bytes([200] * 44)  # 300 bytes: 256 + 44
    df = spark.createDataFrame(
        [(1, payload), (2, b"\x05")], "doc_id long, data binary"
    )
    rows = {(r["doc_id"], r["win"]): r for r in audio_window_energy(df).collect()}
    assert set(rows) == {(1, 0), (1, 1), (2, 0)}
    assert rows[(1, 0)]["n_samples"] == 256
    assert rows[(1, 0)]["energy"] == sum(range(256))
    assert rows[(1, 0)]["peak"] == 255
    assert rows[(1, 1)]["n_samples"] == 44
    assert rows[(1, 1)]["energy"] == 200 * 44
    assert rows[(2, 0)] ["energy"] == 5 and rows[(2, 0)]["n_samples"] == 1


def test_audio_fingerprints_short_audio_gets_zero_row(spark):
    """Contract pin (round-3 advisor fix): a payload with fewer than two
    energy windows still yields a fingerprint row — (afp=0, n_windows=0)
    — so consumers can tell short audio from missing audio, and
    audio_near_pairs excludes those signal-less rows from pairing."""
    from pubsub_mapreduce_spark.operators.multimodal import (
        audio_fingerprints,
        audio_near_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, bytes(range(64)) * 8),  # plenty of windows
            (2, b"\x07\x07"),  # one window only -> no delta bits
            (3, b""),  # zero windows -> truly 'no audio'
        ],
        "doc_id long, data binary",
    )
    rows = {r["doc_id"]: r for r in audio_fingerprints(df, window=4).collect()}
    assert rows[1]["n_windows"] > 0
    assert rows[2]["afp"] == 0 and rows[2]["n_windows"] == 0
    assert 3 not in rows
    # short-audio rows never reach the pair join
    pairs = audio_near_pairs(df)
    assert not any(
        2 in (r["a"], r["b"]) for r in pairs.collect()
    )
