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
