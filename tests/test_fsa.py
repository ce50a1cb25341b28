"""Weighted FSA library tests."""

import math

import numpy as np
import pytest

from rasr_tpu.fsa.algorithms import (
    best,
    compose,
    concatenate,
    connect,
    determinize,
    invert,
    minimize,
    n_best_paths,
    project,
    prune,
    push_weights,
    remove_epsilon,
    shortest_distance,
    union,
)
from rasr_tpu.fsa.automaton import EPS, Automaton, LogSemiring, Tropical


def _chain(labels, weight_each=1.0):
    fsa = Automaton()
    cur = fsa.add_state()
    fsa.initial = cur
    for lab in labels:
        nxt = fsa.add_state()
        fsa.add_arc(cur, nxt, lab, weight=weight_each)
        cur = nxt
    fsa.set_final(cur)
    return fsa


def test_accepts_cost():
    fsa = _chain([1, 2, 3], 0.5)
    np.testing.assert_allclose(fsa.accepts_cost([1, 2, 3]), 1.5)
    assert fsa.accepts_cost([1, 2]) == math.inf
    assert fsa.accepts_cost([3, 2, 1]) == math.inf


def test_union_and_best():
    a = _chain([1, 2], 1.0)
    b = _chain([3], 0.25)
    u = union(a, b)
    cost, path = best(u)
    np.testing.assert_allclose(cost, 0.25)
    assert u.accepts_cost([1, 2]) == 2.0
    assert u.accepts_cost([3]) == 0.25


def test_concatenate():
    c = concatenate(_chain([1], 1.0), _chain([2], 2.0))
    np.testing.assert_allclose(c.accepts_cost([1, 2]), 3.0)
    assert c.accepts_cost([1]) == math.inf


def test_compose_acceptors():
    # acceptor x acceptor = intersection
    a = union(_chain([1, 2], 1.0), _chain([1, 3], 0.0))
    b = union(_chain([1, 2], 0.5), _chain([4], 0.0))
    c = compose(a, b)
    # [1,2] costs 2.0 in a (1.0/arc) and 1.0 in b (0.5/arc)
    np.testing.assert_allclose(c.accepts_cost([1, 2]), 3.0)
    assert c.accepts_cost([1, 3]) == math.inf
    assert c.accepts_cost([4]) == math.inf


def test_compose_transducer():
    # transducer 1->2, then acceptor on 2
    t = Automaton()
    s0, s1 = t.add_state(), t.add_state()
    t.initial = s0
    t.add_arc(s0, s1, 1, 2, 0.5)
    t.set_final(s1)
    acc = _chain([2], 0.25)
    c = compose(t, acc)
    np.testing.assert_allclose(c.accepts_cost([1]), 0.75)


def test_remove_epsilon():
    fsa = Automaton()
    s0, s1, s2 = fsa.add_state(), fsa.add_state(), fsa.add_state()
    fsa.initial = s0
    fsa.add_arc(s0, s1, EPS, weight=0.5)
    fsa.add_arc(s1, s2, 7, weight=1.0)
    fsa.set_final(s2, 0.25)
    ne = remove_epsilon(fsa)
    for arcs in ne.arcs:
        assert all(a.ilabel != EPS for a in arcs)
    np.testing.assert_allclose(ne.accepts_cost([7]), 1.75)


def test_determinize():
    # nondeterministic: two paths for label 1 with different costs
    fsa = Automaton()
    s0 = fsa.add_state(); s1 = fsa.add_state(); s2 = fsa.add_state()
    fsa.initial = s0
    fsa.add_arc(s0, s1, 1, weight=1.0)
    fsa.add_arc(s0, s2, 1, weight=2.0)
    fsa.add_arc(s1, s1, 2, weight=0.5)
    fsa.add_arc(s2, s1, 2, weight=0.0)
    fsa.set_final(s1)
    det = determinize(fsa)
    # deterministic: at most one arc per label per state
    for arcs in det.arcs:
        labels = [a.ilabel for a in arcs]
        assert len(labels) == len(set(labels))
    for seq in ([1], [1, 2], [1, 2, 2]):
        np.testing.assert_allclose(det.accepts_cost(seq), fsa.accepts_cost(seq), rtol=1e-9)


def test_minimize_reduces_and_preserves():
    # two equivalent suffix branches -> must merge
    fsa = Automaton()
    s = [fsa.add_state() for _ in range(5)]
    fsa.initial = s[0]
    fsa.add_arc(s[0], s[1], 1, weight=0.0)
    fsa.add_arc(s[0], s[2], 2, weight=0.0)
    fsa.add_arc(s[1], s[3], 5, weight=1.0)
    fsa.add_arc(s[2], s[4], 5, weight=1.0)
    fsa.set_final(s[3])
    fsa.set_final(s[4])
    mini = minimize(fsa)
    assert mini.num_states < fsa.num_states
    for seq in ([1, 5], [2, 5]):
        np.testing.assert_allclose(mini.accepts_cost(seq), 1.0)
    assert mini.accepts_cost([1, 2]) == math.inf


def test_nbest():
    u = union(union(_chain([1], 1.0), _chain([2], 2.0)), _chain([3], 3.0))
    results = n_best_paths(u, 2)
    assert [labels for _, labels in results] == [[1], [2]]
    np.testing.assert_allclose([c for c, _ in results], [1.0, 2.0])


def test_prune():
    u = union(_chain([1], 1.0), _chain([2], 5.0))
    p = prune(u, threshold=2.0)
    assert p.accepts_cost([1]) == 1.0
    assert p.accepts_cost([2]) == math.inf


def test_push_weights_preserves_total():
    fsa = union(_chain([1, 2], 1.0), _chain([3], 0.5))
    pushed = push_weights(fsa)
    np.testing.assert_allclose(pushed.accepts_cost([1, 2]), 2.0, rtol=1e-9)
    np.testing.assert_allclose(pushed.accepts_cost([3]), 0.5, rtol=1e-9)


def test_project_invert():
    t = Automaton()
    s0, s1 = t.add_state(), t.add_state()
    t.initial = s0
    t.add_arc(s0, s1, 1, 2, 0.0)
    t.set_final(s1)
    pi = project(t, "input")
    assert pi.arcs[0][0].olabel == 1
    po = project(t, "output")
    assert po.arcs[0][0].ilabel == 2
    inv = invert(t)
    assert inv.arcs[0][0].ilabel == 2 and inv.arcs[0][0].olabel == 1


def test_att_roundtrip(tmp_path):
    fsa = union(_chain([1, 2], 1.0), _chain([3], 0.5))
    path = str(tmp_path / "x.att")
    fsa.write_att(path)
    fsa2 = Automaton.read_att(path)
    for seq in ([1, 2], [3]):
        np.testing.assert_allclose(fsa2.accepts_cost(seq), fsa.accepts_cost(seq))
    dot = fsa2.draw_dot()
    assert "digraph" in dot


def test_log_semiring_sums_paths():
    fsa = Automaton(LogSemiring)
    s0, s1 = fsa.add_state(), fsa.add_state()
    fsa.initial = s0
    fsa.add_arc(s0, s1, 1, weight=1.0)
    fsa.add_arc(s0, s1, 1, weight=2.0)
    fsa.set_final(s1)
    got = fsa.accepts_cost([1])
    expect = -math.log(math.exp(-1) + math.exp(-2))
    np.testing.assert_allclose(got, expect, rtol=1e-9)


def test_shortest_distance_reverse():
    fsa = _chain([1, 2], 1.0)
    bwd = shortest_distance(fsa, reverse=True)
    np.testing.assert_allclose(bwd[fsa.initial], 2.0)


# --------------------------------------------- robustness properties (r2)
def _random_automaton(rng, n_states=6, n_labels=3, arc_density=2.0,
                      eps_frac=0.0, semiring=None, acyclic=False,
                      zero_weights=False):
    """Random automaton; weights on a coarse grid so brute-force
    comparisons avoid float-noise false alarms. ``acyclic`` restricts
    arcs to s < t (weighted determinization terminates only under the
    twins property — arbitrary weighted cycles need not); cyclic cases
    use ``zero_weights`` (unweighted subset construction, <= 2^n
    subsets)."""
    from rasr_tpu.fsa.automaton import EPS, Automaton, Tropical

    fsa = Automaton(semiring or Tropical)
    for _ in range(n_states):
        fsa.add_state()
    fsa.initial = 0
    n_arcs = int(arc_density * n_states)
    for _ in range(n_arcs):
        if acyclic:
            s = int(rng.integers(n_states - 1))
            t = int(rng.integers(s + 1, n_states))
        else:
            s = int(rng.integers(n_states))
            t = int(rng.integers(n_states))  # cycles incl. self-loops
        lab = (
            EPS if rng.uniform() < eps_frac else int(rng.integers(1, n_labels + 1))
        )
        w = 0.0 if zero_weights else float(rng.integers(0, 20)) * 0.25
        fsa.add_arc(s, t, lab, lab, w)
    for s in rng.choice(n_states, size=2, replace=False):
        w = 0.0 if zero_weights else float(rng.integers(0, 8)) * 0.25
        fsa.set_final(int(s), w)
    return fsa


def _language(fsa, n_labels=3, max_len=4):
    """Brute-force weighted language up to max_len."""
    import itertools

    out = {}
    for L in range(max_len + 1):
        for seq in itertools.product(range(1, n_labels + 1), repeat=L):
            c = fsa.accepts_cost(list(seq))
            if c < math.inf:
                out[seq] = c
    return out


def test_determinize_minimize_language_equivalence_random():
    """Randomized property: determinize and minimize preserve the
    weighted language (brute force over all strings up to length 4) on
    (a) random weighted ACYCLIC automata and (b) random CYCLIC
    unweighted automata; the result is deterministic and minimize
    never grows the determinized size."""
    from rasr_tpu.fsa.algorithms import connect, determinize, minimize

    rng = np.random.default_rng(0)
    checked = 0
    for trial in range(16):
        fsa = _random_automaton(
            rng,
            acyclic=(trial % 2 == 0),
            zero_weights=(trial % 2 == 1),
        )
        base = connect(fsa)
        if base.num_states == 0 or base.initial < 0:
            continue
        lang = _language(base)
        if not lang:
            continue
        checked += 1
        d = determinize(base)
        m = minimize(base)
        # determinism: at most one arc per (state, label)
        for s in range(d.num_states):
            labs = [a.ilabel for a in d.arcs[s]]
            assert len(labs) == len(set(labs))
        for auto in (d, m):
            got = _language(auto)
            assert set(got) == set(lang)
            for seq, c in lang.items():
                np.testing.assert_allclose(got[seq], c, atol=1e-6)
        # minimality: refuses to grow
        assert m.num_states <= d.num_states
    assert checked >= 8  # the sweep actually exercised real automata


def test_determinize_twins_violation_raises():
    """Weighted cyclic determinization need not terminate (twins
    property): the classic two-cycle counterexample must raise the
    budget error instead of hanging."""
    from rasr_tpu.fsa.automaton import Automaton, Tropical
    from rasr_tpu.fsa.algorithms import determinize

    fsa = Automaton(Tropical)
    for _ in range(3):
        fsa.add_state()
    fsa.initial = 0
    # two paths into two self-loops on the SAME label with different
    # weights: residuals diverge forever
    fsa.add_arc(0, 1, 1, 1, 0.0)
    fsa.add_arc(0, 2, 1, 1, 0.25)
    fsa.add_arc(1, 1, 2, 2, 0.25)
    fsa.add_arc(2, 2, 2, 2, 0.5)
    fsa.set_final(1, 0.0)
    fsa.set_final(2, 0.0)
    with pytest.raises(ValueError, match="twins"):
        determinize(fsa, max_states=2000)


def test_minimize_exact_grouping_near_float_boundary():
    """The round(w, 9) smell this replaces: two paths whose pushed
    weights are equal as REAL numbers but computed through different
    float additions must land in the same partition class. Two parallel
    branches with weights (0.1+0.2, 0.3) — classically unequal floats —
    minimize to ONE branch on the quantization grid."""
    from rasr_tpu.fsa.automaton import Automaton, Tropical
    from rasr_tpu.fsa.algorithms import minimize

    fsa = Automaton(Tropical)
    for _ in range(4):
        fsa.add_state()
    fsa.initial = 0
    fsa.add_arc(0, 1, 1, 1, 0.1 + 0.2)  # 0.30000000000000004
    fsa.add_arc(0, 2, 2, 2, 0.5)
    fsa.add_arc(1, 3, 3, 3, 0.5)
    fsa.add_arc(2, 3, 3, 3, 0.1 + 0.2)
    fsa.set_final(3, 0.0)
    m = minimize(fsa)
    # pushing moves both paths' costs onto the entry arcs, so states 1
    # and 2 carry IDENTICAL pushed suffix languages ({3: 0}) and must
    # merge — exactly the grouping float noise (0.30000000000000004 vs
    # 0.3) used to prevent
    assert m.num_states == 3
    np.testing.assert_allclose(m.accepts_cost([1, 3]), 0.8, atol=1e-6)
    np.testing.assert_allclose(m.accepts_cost([2, 3]), 0.8, atol=1e-6)

    # and a genuinely float-noisy merge case: identical sub-languages
    # whose weights differ only by float summation order
    f2 = Automaton(Tropical)
    for _ in range(4):
        f2.add_state()
    f2.initial = 0
    f2.add_arc(0, 1, 1, 1, 0.1 + 0.2)
    f2.add_arc(0, 2, 1, 1, 0.3)
    f2.add_arc(1, 3, 2, 2, 0.4)
    f2.add_arc(2, 3, 2, 2, 0.4)
    f2.set_final(3, 0.0)
    m2 = minimize(f2)
    assert m2.num_states == 3  # the two middle states merge exactly


def test_remove_epsilon_cycle_handling():
    """Tropical epsilon cycles with non-negative weight work (the
    closure converges); negative-weight epsilon cycles and log-semiring
    epsilon cycles raise clear errors instead of diverging/silently
    computing the wrong mass."""
    from rasr_tpu.fsa.automaton import EPS, Automaton, LogSemiring, Tropical
    from rasr_tpu.fsa.algorithms import remove_epsilon

    # zero-weight eps cycle: fine, language unchanged
    fsa = Automaton(Tropical)
    for _ in range(3):
        fsa.add_state()
    fsa.initial = 0
    fsa.add_arc(0, 1, EPS, EPS, 0.0)
    fsa.add_arc(1, 0, EPS, EPS, 0.5)  # cycle, positive total
    fsa.add_arc(1, 2, 7, 7, 1.0)
    fsa.set_final(2, 0.25)
    out = remove_epsilon(fsa)
    np.testing.assert_allclose(out.accepts_cost([7]), 1.25, atol=1e-9)

    # negative eps cycle: diverges -> error
    neg = Automaton(Tropical)
    for _ in range(2):
        neg.add_state()
    neg.initial = 0
    neg.add_arc(0, 1, EPS, EPS, -1.0)
    neg.add_arc(1, 0, EPS, EPS, 0.5)
    neg.add_arc(0, 1, 3, 3, 1.0)
    neg.set_final(1)
    with pytest.raises(ValueError, match="negative-weight epsilon cycle"):
        remove_epsilon(neg)

    # log semiring + eps cycle: geometric closure unimplemented -> error
    lg = Automaton(LogSemiring)
    for _ in range(2):
        lg.add_state()
    lg.initial = 0
    lg.add_arc(0, 1, EPS, EPS, 1.0)
    lg.add_arc(1, 0, EPS, EPS, 1.0)
    lg.add_arc(0, 1, 3, 3, 1.0)
    lg.set_final(1)
    with pytest.raises(ValueError, match="epsilon cycles"):
        remove_epsilon(lg)
