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


def test_lfmmi_sequence_trainer_learns(rng):
    """Sequence-discriminative NN training: LF-MMI differentiated
    through a BLSTM encoder. The MMI objective must decrease and the
    encoder must become frame-discriminative on separable toy data."""
    from rasr_tpu.align.graph import LinearGraph
    from rasr_tpu.models.nn import BlstmEncoderNet
    from rasr_tpu.train.nn_trainer import LfMmiSequenceTrainer, TrainConfig

    P, D, T, N = 3, 4, 18, 8
    means = np.array([[2.0, 0, 0, 0], [0, 2.0, 0, 0], [0, 0, 2.0, 0]])
    feats = np.zeros((N, T, D), np.float32)
    labels = np.zeros((N, T), np.int32)
    graphs = []
    for i in range(N):
        seq = [0, 1, 2] if i % 2 == 0 else [2, 1, 0]
        runs = np.sort(rng.choice(np.arange(1, T), size=2, replace=False))
        bounds = [0, int(runs[0]), int(runs[1]), T]
        for s, ph in enumerate(seq):
            labels[i, bounds[s]:bounds[s + 1]] = ph
        feats[i] = means[labels[i]] + 0.3 * rng.normal(size=(T, D))
        Sg = len(seq)
        graphs.append(LinearGraph(
            emission_ids=np.asarray(seq, np.int32),
            loop=np.full(Sg, 0.7, np.float32),
            fwd=np.concatenate([[BIG], np.full(Sg - 1, 0.3)]).astype(np.float32),
            skip=np.full(Sg, BIG, np.float32),
            init=np.where(np.arange(Sg) == 0, 0, BIG).astype(np.float32),
            final=np.where(np.arange(Sg) == Sg - 1, 0, BIG).astype(np.float32),
            states=[], lemma_of_state=np.full(Sg, -1, np.int32), lemmas=[],
        ))
    den = build_phone_bigram_den(
        P, 1, classify=lambda p, q: p,
        bigram_costs=np.full((P, P), math.log(P), np.float32),
        trans=TransitionModel(speech=Tdp(loop=0.7, forward=0.3, skip=math.inf, exit=0.0)),
    )
    model = BlstmEncoderNet(num_classes=P, hidden=(8,))
    trainer = LfMmiSequenceTrainer(
        model, P, den,
        cfg=TrainConfig(epochs=30, learning_rate=0.01, optimizer="adam"),
        ce_weight=0.0,
    )
    n_frames = np.full(N, T, np.int32)
    params, stats = trainer.train_lfmmi(feats, graphs, n_frames, batch_size=4)
    assert stats[-1]["mmi_per_frame"] < stats[0]["mmi_per_frame"] - 0.1
    # sequence discrimination (the MMI goal): under the trained model the
    # true transcript's graph must out-score a rival (reversed) transcript
    from rasr_tpu.align.aligner import _pad_graphs
    from rasr_tpu.ops.viterbi import forward_backward

    logits = model.apply({"params": params}, jnp.asarray(feats),
                         lengths=jnp.asarray(n_frames))
    emis = -np.asarray(jax.nn.log_softmax(logits, axis=-1))

    def totals(gs):
        cls, loop, fwd, skip, init, final = (jnp.asarray(a) for a in _pad_graphs(gs))
        ne = jnp.take_along_axis(jnp.asarray(emis), cls[:, None, :], axis=2)
        tot, _ = forward_backward(ne, loop, fwd, skip, init, final,
                                  jnp.asarray(n_frames))
        return np.asarray(tot)

    rivals = [graphs[i + 1] if i % 2 == 0 else graphs[i - 1] for i in range(N)]
    true_tot, rival_tot = totals(graphs), totals(rivals)
    assert (true_tot < rival_tot).sum() >= N - 1


def _brute_expected_accuracy(fsa, emis, T, ref):
    """Brute-force E over the path posterior of #frames whose emission
    class matches ref[t] (ref < 0 = frame not scored)."""
    S = fsa.num_states
    trans = np.asarray(fsa.trans)
    init = np.asarray(fsa.init)
    final = np.asarray(fsa.final)
    ecls = np.asarray(fsa.emis_class)
    Z, acc_sum = 0.0, 0.0
    for path in itertools.product(range(S), repeat=T):
        c = init[path[0]] + emis[0, ecls[path[0]]]
        for t in range(1, T):
            c += trans[path[t - 1], path[t]] + emis[t, ecls[path[t]]]
        c += final[path[-1]]
        if c < BIG / 2:
            pr = math.exp(-c)
            Z += pr
            acc_sum += pr * sum(
                1 for t in range(T) if ref[t] >= 0 and ecls[path[t]] == ref[t]
            )
    return acc_sum / Z


def test_expected_accuracy_matches_brute_force(rng):
    """sMBR objective == path-enumerated expected frame accuracy,
    including ragged batches and unscored (-1) reference frames."""
    from rasr_tpu.train.lfmmi import expected_accuracy

    T, M = 5, 4
    fsa = _tiny_fsa(rng)
    emis = rng.uniform(0.1, 3.0, size=(2, T, M)).astype(np.float32)
    ref = np.array([[0, 1, 3, -1, 0], [3, 3, 0, 1, 1]], np.int32)
    n = np.array([5, 3], np.int32)
    acc = expected_accuracy(
        jnp.asarray(emis), fsa, jnp.asarray(n), jnp.asarray(ref)
    )
    for b in range(2):
        want = _brute_expected_accuracy(fsa, emis[b], int(n[b]), ref[b])
        np.testing.assert_allclose(float(acc[b]), want, rtol=1e-4)


def test_expected_accuracy_gradient_finite_difference(rng):
    """Training gradient (forward-over-reverse through the jvp trick)
    == central finite differences of the objective."""
    from rasr_tpu.train.lfmmi import expected_accuracy

    T, M = 4, 4
    fsa = _tiny_fsa(rng)
    emis = rng.uniform(0.1, 3.0, size=(1, T, M)).astype(np.float32)
    ref = np.array([[0, 3, 1, 0]], np.int32)
    n = jnp.asarray([T])

    def obj(e):
        return expected_accuracy(e, fsa, n, jnp.asarray(ref))[0]

    grad = np.asarray(jax.grad(obj)(jnp.asarray(emis)))
    eps = 1e-3
    for (t, m) in [(0, 0), (1, 3), (2, 1), (3, 2)]:
        ep = emis.copy(); ep[0, t, m] += eps
        em = emis.copy(); em[0, t, m] -= eps
        fd = (float(obj(jnp.asarray(ep))) - float(obj(jnp.asarray(em)))) / (2 * eps)
        np.testing.assert_allclose(grad[0, t, m], fd, rtol=2e-2, atol=1e-4)


def test_smbr_sequence_trainer_learns(rng):
    """criterion="smbr": the denominator-posterior expected frame
    accuracy must rise when trained against alignment labels."""
    from rasr_tpu.models.nn import BlstmEncoderNet
    from rasr_tpu.train.lfmmi import expected_accuracy
    from rasr_tpu.train.nn_trainer import LfMmiSequenceTrainer, TrainConfig

    P, D, T, N = 3, 4, 12, 8
    means = np.array([[2.0, 0, 0, 0], [0, 2.0, 0, 0], [0, 0, 2.0, 0]])
    labels = np.zeros((N, T), np.int32)
    feats = np.zeros((N, T, D), np.float32)
    for i in range(N):
        seq = [0, 1, 2] if i % 2 == 0 else [2, 1, 0]
        bounds = [0, T // 3, 2 * T // 3, T]
        for s, ph in enumerate(seq):
            labels[i, bounds[s]:bounds[s + 1]] = ph
        feats[i] = means[labels[i]] + 0.3 * rng.normal(size=(T, D))
    den = build_phone_bigram_den(
        P, 1, classify=lambda p, q: p,
        bigram_costs=np.full((P, P), math.log(P), np.float32),
        trans=TransitionModel(speech=Tdp(loop=0.7, forward=0.3, skip=math.inf, exit=0.0)),
    )
    model = BlstmEncoderNet(num_classes=P, hidden=(8,))
    trainer = LfMmiSequenceTrainer(
        model, P, den,
        cfg=TrainConfig(epochs=25, learning_rate=0.01, optimizer="adam"),
        ce_weight=0.0, criterion="smbr",
    )
    n_frames = np.full(N, T, np.int32)
    params, stats = trainer.train_lfmmi(
        feats, _dummy_graphs(N), n_frames, labels=labels, batch_size=4,
    )
    # objective is -E[acc]/frame: must decrease substantially
    assert stats[-1]["smbr_per_frame"] < stats[0]["smbr_per_frame"] - 0.15
    logits = model.apply({"params": params}, jnp.asarray(feats),
                         lengths=jnp.asarray(n_frames))
    emis = -jax.nn.log_softmax(logits, axis=-1)
    acc = expected_accuracy(emis, den, jnp.asarray(n_frames),
                            jnp.asarray(labels))
    assert float(np.mean(np.asarray(acc)) / T) > 0.8


def _dummy_graphs(n):
    """Trivial 1-state numerator graphs (unused by the smbr criterion
    but train_lfmmi's batching pads them)."""
    from rasr_tpu.align.graph import LinearGraph

    return [
        LinearGraph(
            emission_ids=np.zeros(1, np.int32),
            loop=np.zeros(1, np.float32),
            fwd=np.full(1, BIG, np.float32),
            skip=np.full(1, BIG, np.float32),
            init=np.zeros(1, np.float32),
            final=np.zeros(1, np.float32),
            states=[], lemma_of_state=np.full(1, -1, np.int32), lemmas=[],
        )
        for _ in range(n)
    ]


def test_expected_accuracy_phone_level(rng):
    """class_map (MPE-style coarser units): matches brute force with
    mapped units, and coarser matching can only raise E[acc]."""
    from rasr_tpu.train.lfmmi import expected_accuracy

    T, M = 4, 4
    fsa = _tiny_fsa(rng)  # emission classes {0, 1, 3}
    cmap = np.array([0, 0, 1, 1], np.int32)  # classes {0,1}->unit0, {2,3}->unit1
    emis = rng.uniform(0.1, 3.0, size=(1, T, M)).astype(np.float32)
    ref = np.array([[0, 1, 3, 0]], np.int32)
    n = jnp.asarray([T])
    fine = expected_accuracy(jnp.asarray(emis), fsa, n, jnp.asarray(ref))
    coarse = expected_accuracy(
        jnp.asarray(emis), fsa, n, jnp.asarray(ref), class_map=jnp.asarray(cmap)
    )
    # brute force: score with the original classes, accuracy on the
    # cmap-mapped units
    S = fsa.num_states
    trans = np.asarray(fsa.trans); init = np.asarray(fsa.init)
    final = np.asarray(fsa.final); ecls = np.asarray(fsa.emis_class)
    Z, acc_sum = 0.0, 0.0
    for path in itertools.product(range(S), repeat=T):
        c = init[path[0]] + emis[0, 0, ecls[path[0]]]
        for t in range(1, T):
            c += trans[path[t - 1], path[t]] + emis[0, t, ecls[path[t]]]
        c += final[path[-1]]
        if c < BIG / 2:
            pr = math.exp(-c)
            Z += pr
            acc_sum += pr * sum(
                1 for t in range(T) if cmap[ecls[path[t]]] == cmap[ref[0, t]]
            )
    np.testing.assert_allclose(float(coarse[0]), acc_sum / Z, rtol=1e-4)
    assert float(coarse[0]) >= float(fine[0]) - 1e-5
