"""Auction assignment solver vs the exact scipy oracle."""

import numpy as np
import jax.numpy as jnp

from strongsort_yolo_tpu.ops.assignment import (
    solve_assignment,
    solve_assignment_host,
)


def total_cost(cost, r2c, thresh, row_valid=None, col_valid=None):
    """Objective value under lapjv cost-limit semantics."""
    r, c = cost.shape
    rv = np.ones(r, bool) if row_valid is None else row_valid
    cv = np.ones(c, bool) if col_valid is None else col_valid
    tot = 0.0
    matched_cols = set()
    for i in range(r):
        if not rv[i]:
            continue
        j = int(r2c[i])
        if j >= 0:
            tot += cost[i, j]
            matched_cols.add(j)
        else:
            tot += thresh / 2.0
    for j in range(c):
        if cv[j] and j not in matched_cols:
            tot += thresh / 2.0
    return tot


def check_valid(r2c, c2r, row_valid=None, col_valid=None):
    seen = set()
    for i, j in enumerate(r2c):
        if j >= 0:
            assert j not in seen
            seen.add(int(j))
            assert c2r[j] == i
    if row_valid is not None:
        for i, j in enumerate(r2c):
            if j >= 0:
                assert row_valid[i]
    if col_valid is not None:
        for i, j in enumerate(r2c):
            if j >= 0:
                assert col_valid[j]


def test_matches_oracle_cost_random(rng):
    # fixed shape set: limits jit compiles (1-CPU test box), repeats
    # give sampling coverage
    shapes = [(12, 12), (12, 12), (12, 12), (7, 13), (7, 13)]
    for r, c in shapes:
        cost = rng.uniform(0, 1, (r, c)).astype(np.float32)
        thresh = 0.8
        got = solve_assignment(jnp.asarray(cost), thresh)
        r2c = np.asarray(got.row_to_col)
        c2r = np.asarray(got.col_to_row)
        check_valid(r2c, c2r)
        oracle_r2c, _ = solve_assignment_host(cost, thresh)
        np.testing.assert_allclose(
            total_cost(cost, r2c, thresh),
            total_cost(cost, oracle_r2c, thresh),
            atol=1e-2,
        )


def test_pallas_kernel_matches_oracle(rng):
    """The VMEM-resident Pallas auction (interpret mode on CPU) solves
    to the same objective as the scipy oracle and the XLA auction."""
    shapes = [(12, 12), (12, 12), (7, 13), (16, 5)]
    for r, c in shapes:
        cost = rng.uniform(0, 1, (r, c)).astype(np.float32)
        thresh = 0.8
        got = solve_assignment(jnp.asarray(cost), thresh, method="pallas")
        r2c = np.asarray(got.row_to_col)
        c2r = np.asarray(got.col_to_row)
        check_valid(r2c, c2r)
        oracle_r2c, _ = solve_assignment_host(cost, thresh)
        np.testing.assert_allclose(
            total_cost(cost, r2c, thresh),
            total_cost(cost, oracle_r2c, thresh),
            atol=1e-2,
        )


def test_pallas_kernel_masks_and_empty(rng):
    """Padding masks + the all-invalid (empty) problem through the
    kernel path — the tracker's rescue stages hit these every frame."""
    cost = rng.uniform(0, 1, (10, 9)).astype(np.float32)
    rv = np.zeros(10, bool)
    rv[:4] = True
    cv = np.zeros(9, bool)
    cv[:5] = True
    got = solve_assignment(
        jnp.asarray(cost), 0.7, jnp.asarray(rv), jnp.asarray(cv),
        method="pallas",
    )
    r2c = np.asarray(got.row_to_col)
    check_valid(r2c, np.asarray(got.col_to_row), rv, cv)
    oracle_r2c, _ = solve_assignment_host(
        np.where(rv[:, None] & cv[None, :], cost, 1e6), 0.7
    )
    np.testing.assert_allclose(
        total_cost(cost, r2c, 0.7, rv, cv),
        total_cost(cost, oracle_r2c, 0.7, rv, cv),
        atol=1e-2,
    )

    empty = solve_assignment(
        jnp.asarray(cost), 0.7, jnp.zeros(10, bool), None,
        method="pallas",
    )
    assert (np.asarray(empty.row_to_col) == -1).all()
    assert (np.asarray(empty.col_to_row) == -1).all()


def test_identity_diagonal():
    # Strongly diagonal cost: must match i->i exactly.
    n = 12
    cost = np.full((n, n), 0.9, np.float32)
    np.fill_diagonal(cost, 0.05)
    got = solve_assignment(jnp.asarray(cost), thresh=0.5)
    np.testing.assert_array_equal(np.asarray(got.row_to_col), np.arange(n))


def test_cost_limit_leaves_unmatched():
    cost = np.array([[0.1, 0.95], [0.95, 0.95]], np.float32)
    got = solve_assignment(jnp.asarray(cost), thresh=0.5)
    r2c = np.asarray(got.row_to_col)
    assert r2c[0] == 0
    assert r2c[1] == -1


def test_padding_masks(rng):
    r_pad, c_pad = 16, 16
    r, c = 5, 7
    cost = rng.uniform(0, 1, (r_pad, c_pad)).astype(np.float32)
    rv = np.arange(r_pad) < r
    cv = np.arange(c_pad) < c
    got = solve_assignment(
        jnp.asarray(cost), 0.7, jnp.asarray(rv), jnp.asarray(cv)
    )
    r2c = np.asarray(got.row_to_col)
    c2r = np.asarray(got.col_to_row)
    check_valid(r2c, c2r, rv, cv)
    oracle_r2c, _ = solve_assignment_host(cost[:r, :c], 0.7)
    np.testing.assert_allclose(
        total_cost(cost[:r, :c], r2c[:r], 0.7),
        total_cost(cost[:r, :c], oracle_r2c, 0.7),
        atol=1e-2,
    )


def test_rect_more_rows(rng):
    cost = rng.uniform(0, 1, (15, 4)).astype(np.float32)
    got = solve_assignment(jnp.asarray(cost), 0.9)
    r2c = np.asarray(got.row_to_col)
    c2r = np.asarray(got.col_to_row)
    check_valid(r2c, c2r)
    oracle_r2c, _ = solve_assignment_host(cost, 0.9)
    np.testing.assert_allclose(
        total_cost(cost, r2c, 0.9),
        total_cost(cost, oracle_r2c, 0.9),
        atol=1e-2,
    )


def test_all_above_thresh():
    cost = np.full((4, 4), 0.99, np.float32)
    got = solve_assignment(jnp.asarray(cost), 0.5)
    assert np.all(np.asarray(got.row_to_col) == -1)
    assert np.all(np.asarray(got.col_to_row) == -1)


def test_empty_rows():
    cost = np.zeros((8, 8), np.float32)
    rv = np.zeros(8, bool)
    got = solve_assignment(jnp.asarray(cost), 0.5, jnp.asarray(rv), None)
    assert np.all(np.asarray(got.row_to_col) == -1)
