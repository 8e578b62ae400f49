"""Kernel tests mirroring the reference's exhaustive cross-check strategy
(reference tests/test_editdistance.py:29-70): every pair of short strings
over a small alphabet, validated against naive full-matrix DP oracles.
"""

import itertools
import sys

import numpy as np
import pandas as pd
import pytest

from symspellpy_spark.functions.distance import (
    damerau_osa_batch,
    levenshtein_batch,
)


def naive_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        dp[i][0] = i
    for j in range(lb + 1):
        dp[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1, dp[i - 1][j - 1] + cost)
    return dp[la][lb]


def naive_damerau_osa(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        dp[i][0] = i
    for j in range(lb + 1):
        dp[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1, dp[i - 1][j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                dp[i][j] = min(dp[i][j], dp[i - 2][j - 2] + 1)
    return dp[la][lb]


def all_strings(alphabet="ab", max_len=3):
    out = [""]
    for n in range(1, max_len + 1):
        out.extend("".join(p) for p in itertools.product(alphabet, repeat=n))
    return out


@pytest.mark.parametrize("max_distance", [0, 1, 3, sys.maxsize])
@pytest.mark.parametrize(
    "batch_fn,oracle",
    [(levenshtein_batch, naive_levenshtein), (damerau_osa_batch, naive_damerau_osa)],
    ids=["levenshtein", "damerau_osa"],
)
def test_exhaustive_vs_naive(batch_fn, oracle, max_distance):
    strings = all_strings("abc", 3)
    pairs = list(itertools.product(strings, strings))
    s1 = pd.Series([p[0] for p in pairs])
    s2 = pd.Series([p[1] for p in pairs])
    got = batch_fn(s1, s2, max_distance).to_numpy()
    if max_distance <= 0:
        expected = np.array([0 if a == b else -1 for a, b in pairs])
    else:
        expected = np.array(
            [
                (lambda d: d if d <= max_distance else -1)(oracle(a, b))
                for a, b in pairs
            ]
        )
    mism = np.flatnonzero(got != expected)
    assert mism.size == 0, [(pairs[i], got[i], expected[i]) for i in mism[:5]]


def test_null_semantics():
    # reference helpers.py:171-192
    s1 = pd.Series([None, None, "abc", "abcd", None])
    s2 = pd.Series([None, "ab", None, None, "abcde"])
    got = damerau_osa_batch(s1, s2, 3).tolist()
    assert got == [0, 2, 3, -1, -1]


def test_unicode_and_transposition():
    s1 = pd.Series(["ca", "привет", "flied"])
    s2 = pd.Series(["ac", "привте", "flies"])
    assert damerau_osa_batch(s1, s2, 2).tolist() == [1, 1, 1]
    assert levenshtein_batch(s1, s2, 2).tolist() == [2, 2, 1]


def test_long_string_fallback():
    a = "x" * 300 + "abc"
    b = "x" * 300 + "acb"
    assert damerau_osa_batch(pd.Series([a]), pd.Series([b]), 2).tolist() == [1]


def test_parity_with_reference_kernels(reference_symspell_module):
    from symspellpy.editdistance import DamerauOsa, Levenshtein

    ref_lev, ref_osa = Levenshtein(), DamerauOsa()
    strings = all_strings("abс", 4)  # note: mixed latin/cyrillic 'с'
    rng = np.random.default_rng(7)
    idx = rng.integers(0, len(strings), size=(400, 2))
    pairs = [(strings[i], strings[j]) for i, j in idx]
    s1 = pd.Series([p[0] for p in pairs])
    s2 = pd.Series([p[1] for p in pairs])
    for max_d in (1, 2, 4):
        got_l = levenshtein_batch(s1, s2, max_d).tolist()
        got_o = damerau_osa_batch(s1, s2, max_d).tolist()
        exp_l = [ref_lev.distance(a, b, max_d) for a, b in pairs]
        exp_o = [ref_osa.distance(a, b, max_d) for a, b in pairs]
        assert got_l == exp_l
        assert got_o == exp_o


def test_banded_random_longer_vs_naive():
    """Band edges at realistic lookup lengths (5-30 chars, d=2): the
    banded DP must agree with the full-matrix oracle everywhere."""
    rng = np.random.default_rng(23)
    alpha = "abcd"
    pairs = []
    for _ in range(400):
        la = int(rng.integers(0, 30))
        lb = int(rng.integers(max(0, la - 4), la + 5))
        a = "".join(rng.choice(list(alpha), size=la))
        b = "".join(rng.choice(list(alpha), size=lb))
        pairs.append((a, b))
    s1 = pd.Series([p[0] for p in pairs])
    s2 = pd.Series([p[1] for p in pairs])
    for fn, oracle in (
        (levenshtein_batch, naive_levenshtein),
        (damerau_osa_batch, naive_damerau_osa),
    ):
        got = fn(s1, s2, 2).tolist()
        exp = [
            (lambda d: d if d <= 2 else -1)(oracle(a, b)) for a, b in pairs
        ]
        assert got == exp


def test_long_string_banded_scattered_diffs():
    """>256-char pairs take the affix-stripped banded fallback; diffs
    scattered through the string defeat pure prefix/suffix stripping, so
    the banded DP itself is exercised."""
    rng = np.random.default_rng(31)
    base = list("".join(rng.choice(list("abcdef"), size=400)))
    b = base.copy()
    b[50] = "z"
    b[200], b[201] = b[201], b[200]  # transposition
    b[350] = "z"
    a_s, b_s = "".join(base), "".join(b)
    exp_osa = naive_damerau_osa(a_s, b_s)
    exp_lev = naive_levenshtein(a_s, b_s)
    assert damerau_osa_batch(pd.Series([a_s]), pd.Series([b_s]), 6).tolist() == [exp_osa]
    assert levenshtein_batch(pd.Series([a_s]), pd.Series([b_s]), 6).tolist() == [exp_lev]
    # below the clamp -> -1
    assert damerau_osa_batch(pd.Series([a_s]), pd.Series([b_s]), exp_osa - 1).tolist() == [-1]
