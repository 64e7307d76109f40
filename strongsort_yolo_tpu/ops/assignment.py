"""Linear assignment inside jit — the tracker's matching core.

The reference's tracker resolves its cost matrices with the ``lap``
package's C++ Jonker-Volgenant solver
(``lap.lapjv(cost, extend_cost=True, cost_limit=thresh)``, reached via
/root/reference/yolo_multi_model.py:41 — SURVEY.md D12/N6). That is a
host-side, dynamic-shape call; here the solve runs *on device inside
the jitted tracking step* as an ε-scaling auction algorithm
(Bertsekas), which is the assignment formulation that vectorizes: every
auction round is a handful of (S,) / (S, S) elementwise+argmax ops on
the VPU, with no data-dependent shapes.

Semantics match ``lapjv`` with a cost limit: the (R, C) cost matrix is
embedded in an (R+C, R+C) square benefit matrix where every real row
and column also owns a "dummy" partner at benefit ``-thresh/2`` —
matching row i to column j is chosen iff ``cost[i, j]`` beats leaving
both unmatched (total ``thresh``). Rows/columns beyond the valid
counts (fixed-shape padding) are forced onto their dummies.

ε-scaling runs a fixed number of phases with shrinking ε; the final
assignment is within ``S·ε_final`` of optimal (default 1e-3 in
normalized cost units — far below any meaningful tracking-cost gap).
``solve_assignment_host`` is the exact scipy oracle used by tests and
offline tools.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e9  # sentinel for "no bid" (never a legal benefit value)


class AssignmentResult(NamedTuple):
    """Fixed-shape matching output.

    row_to_col[i] = matched column of row i, or -1.
    col_to_row[j] = matched row of column j, or -1.
    """

    row_to_col: jnp.ndarray  # (R,) int32
    col_to_row: jnp.ndarray  # (C,) int32


def _auction_phase(benefit: jnp.ndarray, price: jnp.ndarray, eps, max_rounds: int):
    """One ε phase of Jacobi auction. Returns (assign, owner, price)."""
    s = benefit.shape[0]
    idx = jnp.arange(s, dtype=jnp.int32)

    def cond(state):
        assign, owner, price, rounds = state
        return jnp.logical_and(jnp.any(assign < 0), rounds < max_rounds)

    def one_round(assign, owner, price):
        values = benefit - price[None, :]
        best_j = jnp.argmax(values, axis=1).astype(jnp.int32)
        best_v = jnp.max(values, axis=1)
        masked = values.at[idx, best_j].set(_NEG)
        second_v = jnp.max(masked, axis=1)
        bid = price[best_j] + (best_v - second_v) + eps

        unassigned = assign < 0
        # Scatter-max of bids onto objects: one bid per bidding person.
        bid_mat = jnp.where(
            jnp.logical_and(unassigned[:, None], best_j[:, None] == idx[None, :]),
            bid[:, None],
            _NEG,
        )
        win_bid = jnp.max(bid_mat, axis=0)
        winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        has_bid = win_bid > _NEG * 0.5

        new_owner = jnp.where(has_bid, winner, owner)
        new_price = jnp.where(has_bid, win_bid, price)
        # Rebuild person->object from the (injective) owner array.
        owner_safe = jnp.where(new_owner >= 0, new_owner, s)
        new_assign = (
            jnp.full((s + 1,), -1, jnp.int32).at[owner_safe].set(idx)[:s]
        )
        return new_assign, new_owner, new_price

    def body(state):
        assign, owner, price, rounds = state
        # two Jacobi rounds per loop iteration: halves the while_loop
        # dispatch overhead that dominates small problems on TPU
        assign, owner, price = one_round(assign, owner, price)
        assign, owner, price = one_round(assign, owner, price)
        return assign, owner, price, rounds + 2

    assign0 = jnp.full((s,), -1, jnp.int32)
    owner0 = jnp.full((s,), -1, jnp.int32)
    assign, owner, price, _ = jax.lax.while_loop(
        cond, body, (assign0, owner0, price, jnp.int32(0))
    )
    return assign, owner, price


def solve_assignment(
    cost: jnp.ndarray,
    thresh: float | jnp.ndarray,
    row_valid: jnp.ndarray | None = None,
    col_valid: jnp.ndarray | None = None,
    *,
    eps_final_rel: float = 5e-3,
    theta: float = 12.0,
    rounds_per_phase_factor: int = 16,
) -> AssignmentResult:
    """Min-cost assignment with a cost limit, fixed shape, jit-safe.

    cost: (R, C). Entries of padded rows/cols are ignored.
    thresh: matches with cost > thresh are left unmatched (lapjv
      ``cost_limit`` semantics).
    row_valid / col_valid: bool masks for fixed-shape padding.
    """
    r, c = cost.shape
    s = r + c
    if row_valid is None:
        row_valid = jnp.ones((r,), bool)
    if col_valid is None:
        col_valid = jnp.ones((c,), bool)

    # Normalize costs into [0, 1] so ε has consistent meaning.
    thresh = jnp.asarray(thresh, jnp.float32)
    finite_cost = jnp.clip(cost.astype(jnp.float32), -1e6, 1e6)
    valid_pair = jnp.logical_and(row_valid[:, None], col_valid[None, :])
    cmin = jnp.minimum(jnp.min(jnp.where(valid_pair, finite_cost, thresh)), thresh)
    cmax = jnp.maximum(jnp.max(jnp.where(valid_pair, finite_cost, thresh)), thresh)
    crange = jnp.maximum(cmax - cmin, 1e-6)
    norm = lambda x: (x - cmin) / crange

    forbid = jnp.float32(-(s + 2.0))  # worse than any full legal matching

    # benefit blocks: [real x real | real x dummy]
    #                 [dummy x real| dummy x dummy]
    b_rr = jnp.where(valid_pair, -norm(finite_cost), forbid)
    half_t = -norm(thresh) / 2.0
    eye_rd = jnp.eye(r, dtype=bool)
    b_rd_diag = jnp.where(row_valid, half_t, 0.0)  # invalid rows ride free
    b_rd = jnp.where(eye_rd, b_rd_diag[:, None], forbid)[:, :r]
    eye_dr = jnp.eye(c, dtype=bool)
    b_dr_diag = jnp.where(col_valid, half_t, 0.0)
    b_dr = jnp.where(eye_dr, b_dr_diag[:, None], forbid)[:, :c]
    b_dd = jnp.zeros((c, r), jnp.float32)  # leftover dummies pair freely

    benefit = jnp.block([[b_rr, b_rd], [b_dr, b_dd]])

    # ε-scaling schedule (static phase count). ε0 covers the LEGAL
    # benefit range ([-1, 0] after normalization) — forbidden-edge
    # magnitudes don't drive price dynamics, so scaling from there
    # would only add dead phases.
    eps0 = 1.0
    eps_final = eps_final_rel / s
    n_phases = int(np.ceil(np.log(eps0 / eps_final) / np.log(theta))) + 1
    max_rounds = rounds_per_phase_factor * s

    def phase(carry, k):
        price = carry
        eps = jnp.maximum(eps0 / (theta**k.astype(jnp.float32)), eps_final)
        assign, owner, price = _auction_phase(benefit, price, eps, max_rounds)
        return price, assign

    def solve(_):
        price0 = jnp.zeros((s,), jnp.float32)
        _, assigns = jax.lax.scan(phase, price0, jnp.arange(n_phases))
        return assigns[-1]

    # Empty problems (no valid rows or no valid cols) are common in the
    # tracker's rescue/unconfirmed stages — skip the whole auction.
    nonempty = jnp.logical_and(jnp.any(row_valid), jnp.any(col_valid))
    assign = jax.lax.cond(
        nonempty, solve, lambda _: jnp.full((s,), -1, jnp.int32), None
    )

    row_assign = assign[:r]
    # Real matches only: column index < c, cost within limit, both valid.
    j = jnp.clip(row_assign, 0, c - 1)
    is_real = jnp.logical_and(row_assign >= 0, row_assign < c)
    cost_ok = finite_cost[jnp.arange(r), j] <= thresh + 1e-6
    matched = is_real & cost_ok & row_valid & col_valid[j]
    row_to_col = jnp.where(matched, j, -1).astype(jnp.int32)

    safe_col = jnp.where(matched, j, c)
    col_to_row = (
        jnp.full((c + 1,), -1, jnp.int32)
        .at[safe_col]
        .set(jnp.arange(r, dtype=jnp.int32), mode="drop")[:c]
    )
    return AssignmentResult(row_to_col, col_to_row)


def solve_assignment_host(
    cost: np.ndarray, thresh: float
) -> tuple[np.ndarray, np.ndarray]:
    """Exact host-side oracle (scipy Hungarian) with cost-limit semantics.

    Returns (row_to_col, col_to_row) with -1 for unmatched — used by
    tests and offline evaluation, mirroring what lap.lapjv returns to
    the reference's tracker.
    """
    from scipy.optimize import linear_sum_assignment

    r, c = cost.shape
    ext = np.full((r + c, r + c), 0.0)
    big = abs(cost[np.isfinite(cost)]).max() if cost.size else 1.0
    big = (r + c) * (max(big, abs(thresh)) + 1.0)
    ext[:r, :c] = np.where(np.isfinite(cost), cost, big)
    ext[:r, c:] = big
    ext[r:, :c] = big
    ext[np.arange(r), c + np.arange(r)] = thresh / 2.0
    ext[r + np.arange(c), np.arange(c)] = thresh / 2.0
    rows, cols = linear_sum_assignment(ext)
    row_to_col = np.full(r, -1, np.int64)
    col_to_row = np.full(c, -1, np.int64)
    for i, j in zip(rows, cols):
        if i < r and j < c and cost[i, j] <= thresh:
            row_to_col[i] = j
            col_to_row[j] = i
    return row_to_col, col_to_row
