"""LF-MMI: dense denominator forward + autodiff-gradient correctness."""

import itertools
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rasr_tpu.models.hmm import Tdp, TransitionModel
from rasr_tpu.ops.viterbi import BIG
from rasr_tpu.train.lfmmi import (
    DenseFsa,
    build_phone_bigram_den,
    dense_forward,
    lfmmi_grad_emissions,
    lfmmi_loss,
)


def _tiny_fsa(rng, S=3, M=4):
    trans = rng.uniform(0.2, 2.0, size=(S, S)).astype(np.float32)
    trans[0, 2] = BIG  # one missing arc
    init = np.array([0.3, 1.0, BIG], np.float32)
    final = np.array([BIG, 0.5, 0.2], np.float32)
    ecls = np.array([0, 1, 3], np.int32)
    return DenseFsa(
        trans=jnp.asarray(trans), emis_class=jnp.asarray(ecls),
        init=jnp.asarray(init), final=jnp.asarray(final),
    )


def _brute_total_and_occ(fsa, emis, T, M):
    """Enumerate all state paths: -log sum of path probs + per-(t, class)
    occupancy posteriors."""
    S = fsa.num_states
    trans = np.asarray(fsa.trans)
    init = np.asarray(fsa.init)
    final = np.asarray(fsa.final)
    ecls = np.asarray(fsa.emis_class)
    probs, paths = [], []
    for path in itertools.product(range(S), repeat=T):
        c = init[path[0]] + emis[0, ecls[path[0]]]
        for t in range(1, T):
            c += trans[path[t - 1], path[t]] + emis[t, ecls[path[t]]]
        c += final[path[-1]]
        if c < BIG / 2:
            probs.append(math.exp(-c))
            paths.append(path)
    Z = sum(probs)
    occ = np.zeros((T, M))
    for pr, path in zip(probs, paths):
        for t, s in enumerate(path):
            occ[t, ecls[s]] += pr / Z
    return -math.log(Z), occ


def test_dense_forward_matches_brute_force(rng):
    T, M = 4, 4
    fsa = _tiny_fsa(rng)
    emis = rng.uniform(0.1, 3.0, size=(1, T, M)).astype(np.float32)
    total = dense_forward(jnp.asarray(emis), fsa, jnp.asarray([T]))
    ref, _ = _brute_total_and_occ(fsa, emis[0], T, M)
    np.testing.assert_allclose(float(total[0]), ref, rtol=1e-5)


def test_dense_forward_gradient_is_occupancy(rng):
    """d(-log Z)/d(emission cost) == state-occupancy posterior per
    emission class — the forward-backward statistics via autodiff."""
    T, M = 4, 4
    fsa = _tiny_fsa(rng)
    emis = rng.uniform(0.1, 3.0, size=(1, T, M)).astype(np.float32)
    grad = jax.grad(
        lambda e: dense_forward(e, fsa, jnp.asarray([T]))[0]
    )(jnp.asarray(emis))
    _, occ = _brute_total_and_occ(fsa, emis[0], T, M)
    np.testing.assert_allclose(np.asarray(grad[0]), occ, rtol=2e-4, atol=1e-6)


def test_dense_forward_ragged_batch(rng):
    T, M = 5, 4
    fsa = _tiny_fsa(rng)
    emis = rng.uniform(0.1, 3.0, size=(2, T, M)).astype(np.float32)
    n = np.array([5, 3], np.int32)
    total = dense_forward(jnp.asarray(emis), fsa, jnp.asarray(n))
    for b, tb in enumerate(n):
        ref, _ = _brute_total_and_occ(fsa, emis[b], int(tb), M)
        np.testing.assert_allclose(float(total[b]), ref, rtol=1e-5)


def test_phone_bigram_den_graph(rng):
    P, Q, M = 3, 2, 6
    bigram = rng.uniform(0.5, 2.0, size=(P, P)).astype(np.float32)
    den = build_phone_bigram_den(
        P, Q, classify=lambda p, q: p * Q + q, bigram_costs=bigram,
        trans=TransitionModel(speech=Tdp(loop=0.7, forward=0.3, skip=math.inf, exit=0.4)),
    )
    assert den.num_states == P * Q
    T = 4
    emis = rng.uniform(0.1, 3.0, size=(1, T, M)).astype(np.float32)
    total = dense_forward(jnp.asarray(emis), den, jnp.asarray([T]))
    ref, _ = _brute_total_and_occ(den, emis[0], T, M)
    np.testing.assert_allclose(float(total[0]), ref, rtol=1e-5)


def test_lfmmi_gradient_is_posterior_difference(rng):
    """MMI gradient == numerator occupancy - denominator occupancy."""
    P, Q, M, T = 2, 2, 4, 5
    bigram = rng.uniform(0.5, 2.0, size=(P, P)).astype(np.float32)
    den = build_phone_bigram_den(
        P, Q, classify=lambda p, q: p * Q + q, bigram_costs=bigram,
        trans=TransitionModel(speech=Tdp(loop=0.7, forward=0.3, skip=math.inf, exit=0.4)),
    )
    emis = rng.uniform(0.1, 3.0, size=(1, T, M)).astype(np.float32)

    # numerator: linear 3-state chain over classes [0, 1, 2]
    Sg = 3
    classes = np.array([[0, 1, 2]], np.int32)
    loop = np.full((1, Sg), 0.7, np.float32)
    fwd = np.full((1, Sg), 0.3, np.float32)
    fwd[:, 0] = BIG
    skip = np.full((1, Sg), BIG, np.float32)
    init = np.full((1, Sg), BIG, np.float32); init[:, 0] = 0.0
    final = np.full((1, Sg), BIG, np.float32); final[:, -1] = 0.0
    n = np.array([T], np.int32)

    loss, grad = lfmmi_grad_emissions(
        jnp.asarray(emis), den, jnp.asarray(n),
        jnp.asarray(loop), jnp.asarray(fwd), jnp.asarray(skip),
        jnp.asarray(init), jnp.asarray(final), jnp.asarray(classes),
    )
    # denominator occupancy via brute force
    _, den_occ = _brute_total_and_occ(den, emis[0], T, M)
    # numerator occupancy via brute force over the linear graph as a
    # dense FSA (chain with loop/fwd)
    tr = np.full((Sg, Sg), BIG, np.float32)
    for s in range(Sg):
        tr[s, s] = 0.7
        if s + 1 < Sg:
            tr[s, s + 1] = 0.3
    num_fsa = DenseFsa(
        trans=jnp.asarray(tr), emis_class=jnp.asarray(classes[0]),
        init=jnp.asarray(np.where(np.arange(Sg) == 0, 0, BIG).astype(np.float32)),
        final=jnp.asarray(np.where(np.arange(Sg) == Sg - 1, 0, BIG).astype(np.float32)),
    )
    _, num_occ = _brute_total_and_occ(num_fsa, emis[0], T, M)
    np.testing.assert_allclose(
        np.asarray(grad[0]), num_occ - den_occ, rtol=2e-3, atol=2e-5
    )
    assert np.isfinite(float(loss))
