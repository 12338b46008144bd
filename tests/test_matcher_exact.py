"""Property tests: the on-device LAP solver is EXACT vs scipy
(VERDICT.md round 1, "Next round" item 5).

Optimality is checked by total assignment cost (tie assignments may differ in
indices but never in cost), plus permutation validity.
"""
from __future__ import annotations

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from neurips2023_soc_tpu.losses.matcher import BIG, lsa_on_device


def _total_cost(C, q_per_inst, valid):
    # C: (Nq, N); q_per_inst: (N,)
    tot = 0.0
    for j in range(C.shape[1]):
        if valid[j]:
            tot += C[q_per_inst[j], j]
    return tot


def _scipy_cost(C, valid):
    cols = np.nonzero(valid)[0]
    if len(cols) == 0:
        return 0.0
    rows, col_idx = linear_sum_assignment(C[:, cols])
    return C[rows, cols[col_idx]].sum()


def _check_batch(C, valid):
    out = np.asarray(lsa_on_device(jnp.asarray(C), jnp.asarray(valid)))
    B, Nq, N = C.shape
    for b in range(B):
        q = out[b]
        sel = q[valid[b]]
        assert (sel >= 0).all() and (sel < Nq).all()
        assert len(set(sel.tolist())) == len(sel), "assignment not injective"
        assert (q[~valid[b]] == -1).all()
        mine = _total_cost(C[b], q, valid[b])
        ref = _scipy_cost(C[b], valid[b])
        assert np.isclose(mine, ref, rtol=1e-5, atol=1e-4), (
            f"suboptimal: mine {mine} vs scipy {ref} (b={b})"
        )


@pytest.mark.parametrize("Nq,N", [(20, 1), (20, 3), (20, 8), (20, 20), (5, 5)])
def test_lsa_random_matrices(Nq, N):
    rng = np.random.RandomState(Nq * 100 + N)
    # many batches per jitted solve — thousands of matrices total
    for it in range(4):
        B = 64
        C = rng.randn(B, Nq, N).astype(np.float32) * 10.0
        valid = rng.rand(B, N) < 0.8
        Cm = np.where(valid[:, None, :], C, BIG).astype(np.float32)
        _check_batch(Cm, valid)


def test_lsa_adversarial_ties():
    rng = np.random.RandomState(0)
    Nq, N, B = 12, 7, 64
    # integer costs in a tiny range -> massive tie structure
    C = rng.randint(0, 3, size=(B, Nq, N)).astype(np.float32)
    valid = np.ones((B, N), bool)
    _check_batch(C, valid)


def test_lsa_constant_and_structured():
    Nq, N = 9, 4
    C = np.zeros((1, Nq, N), np.float32)  # fully degenerate
    valid = np.ones((1, N), bool)
    _check_batch(C, valid)

    # anti-greedy construction: greedy picks (0,0) but optimum avoids it
    C2 = np.full((1, 3, 3), 10.0, np.float32)
    C2[0, 0, 0] = 0.0
    C2[0, 0, 1] = 0.1
    C2[0, 1, 0] = 0.1
    C2[0, 1, 1] = 100.0
    C2[0, 2, 2] = 0.0
    _check_batch(C2, np.ones((1, 3), bool))


def test_lsa_under_jit_and_grad_free():
    # solver must be jittable and non-differentiable-safe (used under
    # stop_gradient in the criterion)
    rng = np.random.RandomState(1)
    C = rng.randn(2, 10, 4).astype(np.float32)
    valid = np.ones((2, 4), bool)
    f = jax.jit(lsa_on_device)
    out = np.asarray(f(jnp.asarray(C), jnp.asarray(valid)))
    assert out.shape == (2, 4)
    _check_batch(C, valid)


@pytest.mark.parametrize("Nq,N", [(5, 9), (3, 12), (8, 20)])
def test_lsa_more_instances_than_queries(Nq, N):
    """N > Nq (never hit by any reference workload, but legal config-wise):
    the solver must terminate (the naive C^T solve would spin the augmenting
    while_loop forever) and return scipy's rectangular semantics — Nq
    instances matched injectively, the rest -1, at the scipy-optimal cost
    over the valid columns."""
    rng = np.random.RandomState(Nq * 7 + N)
    for it in range(2):
        B = 16
        C = rng.randn(B, Nq, N).astype(np.float32) * 10.0
        valid = rng.rand(B, N) < 0.8
        valid[:, 0] = True  # at least one valid column
        out = np.asarray(lsa_on_device(jnp.asarray(C), jnp.asarray(valid)))
        for b in range(B):
            q = out[b]
            assert (q[~valid[b]] == -1).all()
            matched = np.nonzero(q >= 0)[0]
            sel = q[matched]
            assert len(set(sel.tolist())) == len(sel), "not injective"
            n_valid = int(valid[b].sum())
            assert len(matched) == min(Nq, n_valid)
            mine = sum(C[b][q[j], j] for j in matched)
            cols = np.nonzero(valid[b])[0]
            rows, col_idx = linear_sum_assignment(C[b][:, cols])
            ref = C[b][rows, cols[col_idx]].sum()
            assert np.isclose(mine, ref, rtol=1e-5, atol=1e-4), (
                f"suboptimal: {mine} vs scipy {ref} (b={b})"
            )
