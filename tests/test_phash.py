"""Referees for DCT perceptual hashing (R193, multimodal/phash.py):
naive O(n^4) DCT parity, exact brightness-shift invariance, planted
near-dup behavior, and banded-join vs brute-force pair parity.
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from tests.conftest import SF_DIR
from zoom_spark.multimodal.phash import (
    PHASH_MAX_HAMMING,
    dct2,
    phash64,
    ppm_to_gray,
    to_signed64,
)

pytestmark = pytest.mark.usefixtures("spark")


def test_dct2_matches_naive_quadruple_loop():
    """Orthonormal 2-D DCT-II vs the textbook O(n^4) definition."""
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 255, size=(8, 8))
    got = dct2(x)
    n = 8
    ref = np.zeros((n, n))
    for k in range(n):
        for l in range(n):  # noqa: E741
            s = 0.0
            for i in range(n):
                for j in range(n):
                    s += (
                        x[i, j]
                        * math.cos(math.pi * (i + 0.5) * k / n)
                        * math.cos(math.pi * (j + 0.5) * l / n)
                    )
            ak = math.sqrt(1.0 / n) if k == 0 else math.sqrt(2.0 / n)
            al = math.sqrt(1.0 / n) if l == 0 else math.sqrt(2.0 / n)
            ref[k, l] = ak * al * s
    assert np.allclose(got, ref, atol=1e-9)


def test_phash_brightness_shift_invariance():
    """A uniform +b shift changes only the DC coefficient, which the
    hash drops -> identical hashes, bit for bit."""
    rng = np.random.default_rng(11)
    base = rng.uniform(10, 150, size=(24, 40))
    assert phash64(base) == phash64(base + 40.0)
    assert phash64(base) == phash64(base + 3.25)


def test_phash_separates_unrelated_images():
    rng = np.random.default_rng(13)
    a = rng.uniform(0, 255, size=(32, 32))
    b = rng.uniform(0, 255, size=(32, 32))
    ha, hb = phash64(a), phash64(b)
    assert bin(ha ^ hb).count("1") > PHASH_MAX_HAMMING


def test_phash_planted_small_perturbation_is_near():
    """Image with well-separated spectrum + one-cell bump stays within
    the near-dup threshold. (A mod-wrap sawtooth would NOT: its AC
    coefficients tie at the median, so a 1-unit bump can flip many
    bits — which is why the corpus gate's planted twins guarantee
    candidates only in expectation and the real referee is the
    brute-force pair-parity test below.)"""
    rng = np.random.default_rng(13)
    img = rng.uniform(0, 255, size=(16, 16))
    twin = img.copy()
    twin[3, 5] += 1.0
    d = bin(phash64(img) ^ phash64(twin)).count("1")
    assert d <= PHASH_MAX_HAMMING


def test_banded_pairs_match_bruteforce_referee(spark):
    """The banded equi-join must return EXACTLY the pairs a brute
    O(N^2) scan finds at Hamming <= 3 (pigeonhole recall + verify)."""
    from zoom_spark.multimodal.codecs import decode_ppm, synth_ppm_bytes
    from zoom_spark.queries.multimodal_queries import (
        PHASH_TWIN_MOD,
        ppm_phash_neardup,
    )

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ppm_phash_neardup(spark, SF_DIR).collect()
    }

    import pandas as pd

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id"])
    offset = int(docs["doc_id"].max()) + 1
    hashes = {}
    for i in docs["doc_id"]:
        i = int(i)
        if i % 2 != 1:
            continue
        content = synth_ppm_bytes(i)
        hashes[i] = to_signed64(phash64(ppm_to_gray(content)))
        if i % PHASH_TWIN_MOD == 1:
            tw = bytearray(content)
            p = decode_ppm(content)["_payload_pos"]
            tw[p] = tw[p] + 1 if tw[p] < 255 else tw[p] - 1
            hashes[i + offset] = to_signed64(phash64(ppm_to_gray(bytes(tw))))
    expect = {}
    for a, b in itertools.combinations(sorted(hashes), 2):
        d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
        if d <= PHASH_MAX_HAMMING:
            expect[(a, b)] = d
    assert got == expect
    assert len(expect) > 0  # fixture must plant at least one pair
