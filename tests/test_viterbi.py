"""Banded Viterbi / forward-backward vs brute-force numpy oracles.

(SURVEY.md §4: oracle DP tests — tiny HMMs where Viterbi/forward-backward
are computed by brute force.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rasr_tpu.ops.viterbi import (
    BIG,
    forward_backward,
    viterbi_align,
    viterbi_forward,
)


def _random_instance(rng, B=3, T=7, S=5):
    emis = rng.uniform(0, 5, size=(B, T, S)).astype(np.float32)
    loop = rng.uniform(0, 2, size=(B, S)).astype(np.float32)
    fwd = rng.uniform(0, 2, size=(B, S)).astype(np.float32)
    fwd[:, 0] = BIG
    skip = rng.uniform(0, 2, size=(B, S)).astype(np.float32)
    skip[:, :2] = BIG
    # disable some skips at random
    skip[rng.uniform(size=(B, S)) < 0.5] = BIG
    init = np.full((B, S), BIG, np.float32)
    init[:, 0] = 0.0
    final = np.full((B, S), BIG, np.float32)
    final[:, -1] = rng.uniform(0, 1, size=B).astype(np.float32)
    # ensure the forward chain can always reach the final state in time
    n_frames = rng.integers(max(2, S - 1), T + 1, size=B).astype(np.int32)
    return emis, loop, fwd, skip, init, final, n_frames


def _oracle_paths(emis, loop, fwd, skip, init, final, n):
    """Enumerate all paths brute-force; return (list of (cost, states))."""
    T, S = emis.shape[:2]
    results = []

    def rec(t, s, cost, path):
        cost = cost + emis[t, s]
        path = path + [s]
        if cost >= BIG / 2:
            return
        if t == n - 1:
            total = cost + final[s]
            if total < BIG / 2:
                results.append((total, path))
            return
        for s2, trans in ((s, loop[s]), (s + 1, fwd[s + 1] if s + 1 < S else BIG), (s + 2, skip[s + 2] if s + 2 < S else BIG)):
            if s2 < S and trans < BIG / 2:
                rec(t + 1, s2, cost + trans, path)

    for s0 in range(S):
        if init[s0] < BIG / 2:
            rec(0, s0, init[s0], [])
    return results


def test_viterbi_matches_bruteforce(rng):
    emis, loop, fwd, skip, init, final, n_frames = _random_instance(rng)
    best, states = viterbi_align(
        jnp.asarray(emis), jnp.asarray(loop), jnp.asarray(fwd), jnp.asarray(skip),
        jnp.asarray(init), jnp.asarray(final), jnp.asarray(n_frames),
    )
    best, states = np.asarray(best), np.asarray(states)
    for b in range(emis.shape[0]):
        n = int(n_frames[b])
        paths = _oracle_paths(emis[b], loop[b], fwd[b], skip[b], init[b], final[b], n)
        assert paths, "oracle found no path"
        ocost, opath = min(paths, key=lambda p: p[0])
        np.testing.assert_allclose(best[b], ocost, rtol=1e-5)
        # recovered path must be a valid optimal path (cost check)
        assert list(states[b, :n]) == opath or np.isclose(
            _path_cost(emis[b], loop[b], fwd[b], skip[b], init[b], final[b], states[b, :n]),
            ocost, rtol=1e-5,
        )
        # padding frames marked -1
        assert np.all(states[b, n:] == -1)


def _path_cost(emis, loop, fwd, skip, init, final, path):
    cost = init[path[0]] + emis[0, path[0]]
    for t in range(1, len(path)):
        d = path[t] - path[t - 1]
        trans = {0: loop[path[t]], 1: fwd[path[t]], 2: skip[path[t]]}[int(d)]
        cost += trans + emis[t, path[t]]
    return cost + final[path[-1]]


def test_forward_backward_total_matches_bruteforce(rng):
    emis, loop, fwd, skip, init, final, n_frames = _random_instance(rng, B=2, T=5, S=4)
    total, gamma = forward_backward(
        jnp.asarray(emis), jnp.asarray(loop), jnp.asarray(fwd), jnp.asarray(skip),
        jnp.asarray(init), jnp.asarray(final), jnp.asarray(n_frames),
    )
    total, gamma = np.asarray(total), np.asarray(gamma)
    for b in range(2):
        n = int(n_frames[b])
        paths = _oracle_paths(emis[b], loop[b], fwd[b], skip[b], init[b], final[b], n)
        ocost = -np.log(np.sum(np.exp(-np.array([c for c, _ in paths]))))
        np.testing.assert_allclose(total[b], ocost, rtol=1e-4)
        # gamma: occupancy of (t, s) = sum of posteriors of paths through it
        post = np.exp(-(np.array([c for c, _ in paths]) - ocost))
        occ = np.zeros((n, emis.shape[2]))
        for p, (c, path) in zip(post, paths):
            for t, s in enumerate(path):
                occ[t, s] += p
        np.testing.assert_allclose(gamma[b, :n], occ, atol=1e-4)
        # gamma rows sum to 1 on valid frames, 0 beyond
        np.testing.assert_allclose(gamma[b, :n].sum(-1), 1.0, atol=1e-4)
        np.testing.assert_allclose(gamma[b, n:].sum(-1), 0.0, atol=1e-6)


def test_viterbi_prefers_cheap_path():
    # 3 states, forced staircase: emissions make diagonal path free
    T, S = 4, 3
    emis = np.full((1, T, S), 10.0, np.float32)
    for t, s in enumerate([0, 0, 1, 2]):
        emis[0, t, s] = 0.0
    loop = np.zeros((1, S), np.float32)
    fwd = np.zeros((1, S), np.float32)
    fwd[:, 0] = BIG
    skip = np.full((1, S), BIG, np.float32)
    init = np.full((1, S), BIG, np.float32); init[0, 0] = 0
    final = np.full((1, S), BIG, np.float32); final[0, -1] = 0
    best, states = viterbi_align(
        jnp.asarray(emis), jnp.asarray(loop), jnp.asarray(fwd), jnp.asarray(skip),
        jnp.asarray(init), jnp.asarray(final), jnp.asarray([T], np.int32),
    )
    assert list(np.asarray(states)[0]) == [0, 0, 1, 2]
    np.testing.assert_allclose(np.asarray(best)[0], 0.0, atol=1e-6)


def test_single_frame_utterance(rng):
    S = 3
    emis = rng.uniform(0, 5, size=(1, 4, S)).astype(np.float32)
    loop = np.zeros((1, S), np.float32)
    fwd = np.zeros((1, S), np.float32); fwd[:, 0] = BIG
    skip = np.full((1, S), BIG, np.float32)
    init = np.zeros((1, S), np.float32)
    final = np.zeros((1, S), np.float32)
    best, states = viterbi_align(
        jnp.asarray(emis), jnp.asarray(loop), jnp.asarray(fwd), jnp.asarray(skip),
        jnp.asarray(init), jnp.asarray(final), jnp.asarray([1], np.int32),
    )
    b = int(np.argmin(emis[0, 0]))
    assert np.asarray(states)[0, 0] == b
    assert np.all(np.asarray(states)[0, 1:] == -1)
    np.testing.assert_allclose(np.asarray(best)[0], emis[0, 0, b], rtol=1e-6)
