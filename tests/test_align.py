"""Monotonic alignment search tests: vs brute-force DP and mask behavior."""

import numpy as np

from vits_tpu.ops.align import monotonic_align, prior_log_likelihood


def brute_force_mas(ll, s_len, t_len):
    """Reference O(S*T) numpy Viterbi with backtrace."""
    NEG = -1e9
    S, T = ll.shape
    val = np.full((S, T), NEG)
    val[0, 0] = ll[0, 0]
    for s in range(1, s_len):
        for t in range(t_len):
            stay = val[s - 1, t]
            diag = val[s - 1, t - 1] if t > 0 else NEG
            val[s, t] = ll[s, t] + max(stay, diag)
    path = np.zeros((S, T), dtype=np.float32)
    t = t_len - 1
    for s in range(s_len - 1, -1, -1):
        path[s, t] = 1.0
        if s > 0:
            diag = val[s - 1, t - 1] if t > 0 else NEG
            if diag >= val[s - 1, t]:
                t -= 1
    return path


def test_mas_matches_brute_force():
    rng = np.random.default_rng(0)
    B, S, T = 3, 12, 5
    ll = rng.standard_normal((B, S, T)).astype(np.float32)
    s_lens = [12, 8, 5]
    t_lens = [5, 3, 5]
    fmask = np.zeros((B, S), np.float32)
    tmask = np.zeros((B, T), np.float32)
    for b in range(B):
        fmask[b, : s_lens[b]] = 1
        tmask[b, : t_lens[b]] = 1

    attn = np.asarray(monotonic_align(ll, fmask, tmask))
    for b in range(B):
        expected = brute_force_mas(ll[b], s_lens[b], t_lens[b])
        np.testing.assert_array_equal(attn[b], expected)


def test_mas_path_properties():
    rng = np.random.default_rng(1)
    B, S, T = 2, 20, 7
    ll = rng.standard_normal((B, S, T)).astype(np.float32)
    fmask = np.ones((B, S), np.float32)
    tmask = np.ones((B, T), np.float32)
    attn = np.asarray(monotonic_align(ll, fmask, tmask))
    # one token per frame
    np.testing.assert_array_equal(attn.sum(-1), np.ones((B, S)))
    toks = attn.argmax(-1)
    # monotone non-decreasing, starts at 0, ends at T-1
    assert (np.diff(toks, axis=1) >= 0).all()
    assert (np.diff(toks, axis=1) <= 1).all()
    assert (toks[:, 0] == 0).all() and (toks[:, -1] == T - 1).all()


def test_prior_log_likelihood_matches_naive():
    rng = np.random.default_rng(2)
    B, S, T, C = 2, 6, 4, 3
    z = rng.standard_normal((B, S, C)).astype(np.float32)
    mu = rng.standard_normal((B, T, C)).astype(np.float32)
    logs = rng.standard_normal((B, T, C)).astype(np.float32) * 0.3

    got = np.asarray(prior_log_likelihood(z, mu, logs))
    # naive: full gaussian logpdf
    var = np.exp(2 * logs)
    naive = np.zeros((B, S, T))
    for b in range(B):
        for s in range(S):
            for t in range(T):
                naive[b, s, t] = np.sum(
                    -0.5 * np.log(2 * np.pi) - logs[b, t]
                    - 0.5 * (z[b, s] - mu[b, t]) ** 2 / var[b, t]
                )
    np.testing.assert_allclose(got, naive, rtol=1e-4, atol=1e-4)
