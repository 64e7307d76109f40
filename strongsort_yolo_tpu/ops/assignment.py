"""Linear assignment inside jit — the tracker's matching core.

The reference's tracker resolves its cost matrices with the ``lap``
package's C++ Jonker-Volgenant solver
(``lap.lapjv(cost, extend_cost=True, cost_limit=thresh)``, reached via
/root/reference/yolo_multi_model.py:41 — SURVEY.md D12/N6). That is a
host-side, dynamic-shape call; here the solve runs *on device inside
the jitted tracking step* as a Bertsekas auction, which is the
assignment formulation that vectorizes: every Jacobi round is a
handful of (R,)/(R, C+R) elementwise+argmax ops on the VPU with no
data-dependent shapes.

Formulation. ``lapjv`` with a cost limit t is equivalent to the
max-weight matching with weights ``w[i, j] = t - cost[i, j]`` where
any row/column may stay unmatched at weight 0 (each matched pair
saves exactly ``t`` of unmatched penalty and pays ``cost``). So the
auction runs over ``C + R`` objects: the real columns plus one
DEDICATED sentinel object per row (benefit 0 = stay unmatched). Rows
whose best option is worse than staying unmatched settle on their
sentinel without competing with anyone — there is no dummy-vs-dummy
block at all, which is what makes the worst case cheap: price wars
only ever happen over genuinely contested real columns.

A single ε phase with geometric ESCALATION (ε grows 8x every 16
rounds — the reverse of classic coarse→fine ε-scaling, whose stale
coarse prices poison dedicated-object values) gives per-row
ε-complementary-slackness: a decision can differ from the exact
optimum only among alternatives within ε of each other (default
3e-3 of the normalized cost range — far below meaningful tracking
cost gaps; the scipy-verified tests confirm optimal totals).
``solve_assignment_host`` is the exact scipy oracle used by tests and
offline tools.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from strongsort_yolo_tpu.ops import runtime
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


def solve_assignment(
    cost: jnp.ndarray,
    thresh: float | jnp.ndarray,
    row_valid: jnp.ndarray | None = None,
    col_valid: jnp.ndarray | None = None,
    *,
    eps_rel: float = 3e-3,
    max_rounds_factor: int = 16,
    method: str | None = None,
) -> AssignmentResult:
    """Min-cost assignment with a cost limit, fixed shape, jit-safe.

    cost: (R, C). Entries of padded rows/cols are ignored.
    thresh: matches with cost > thresh are left unmatched (lapjv
      ``cost_limit`` semantics).
    row_valid / col_valid: bool masks for fixed-shape padding.
    eps_rel: auction slack as a fraction of the cost range.
    method: "pallas" (VMEM-resident kernel, TPU), "xla", or None =
      auto (pallas on TPU backends). Both run the same auction; the
      kernel avoids per-round HBM re-reads and exits per-problem
      instead of per-vmap-batch (ops/pallas/auction_kernel.py).
    """
    r, c = cost.shape
    n_obj = c + r
    if row_valid is None:
        row_valid = jnp.ones((r,), bool)
    if col_valid is None:
        col_valid = jnp.ones((c,), bool)

    thresh = jnp.asarray(thresh, jnp.float32)

    if method not in (None, "pallas", "xla"):
        raise ValueError(
            f"solve_assignment: unknown method {method!r} "
            "(expected None, 'pallas', or 'xla')"
        )
    if method is None:
        method = "pallas" if runtime.target_platform() == "tpu" else "xla"
    if method == "pallas":
        # normalization, auction and cost-limit filtering all happen
        # inside the kernel in VMEM (ops/pallas/auction_kernel.py)
        from strongsort_yolo_tpu.ops.pallas.auction_kernel import (
            pallas_auction,
        )

        r2c, c2r = pallas_auction(
            cost, thresh, row_valid, col_valid,
            eps_rel=eps_rel,
            max_rounds_factor=max_rounds_factor,
            # interpret mode off-TPU so method="pallas" is testable on CPU
            interpret=runtime.target_platform() != "tpu",
        )
        return AssignmentResult(r2c, c2r)

    finite_cost = jnp.clip(cost.astype(jnp.float32), -1e6, 1e6)
    valid_pair = jnp.logical_and(row_valid[:, None], col_valid[None, :])
    cmin = jnp.minimum(jnp.min(jnp.where(valid_pair, finite_cost, thresh)), thresh)
    cmax = jnp.maximum(jnp.max(jnp.where(valid_pair, finite_cost, thresh)), thresh)
    crange = jnp.maximum(cmax - cmin, 1e-6)

    # benefit of matching (i, j): (t - cost)/range; sentinel object
    # per row at 0; everything else forbidden.
    forbid = jnp.float32(-4.0)
    w_real = jnp.where(valid_pair, (thresh - finite_cost) / crange, forbid)

    sent = jnp.where(
        jnp.eye(r, dtype=bool), 0.0, forbid
    )  # (r, r) dedicated sentinels
    benefit = jnp.concatenate([w_real, sent], axis=1)  # (r, n_obj)

    idx_r = jnp.arange(r, dtype=jnp.int32)
    idx_o = jnp.arange(n_obj, dtype=jnp.int32)
    eps = jnp.float32(eps_rel)
    max_rounds = max_rounds_factor * r

    def cond(state):
        assign, owner, price, rounds = state
        return jnp.logical_and(jnp.any(assign < 0), rounds < max_rounds)

    def one_round(assign, owner, price, eps):
        values = benefit - price[None, :]
        best_j = jnp.argmax(values, axis=1).astype(jnp.int32)
        best_v = jnp.max(values, axis=1)
        masked = values.at[idx_r, best_j].set(_NEG)
        second_v = jnp.max(masked, axis=1)
        bid = price[best_j] + (best_v - second_v) + eps

        unassigned = assign < 0
        # Scatter-max of bids onto objects: one bid per bidding person.
        bid_mat = jnp.where(
            jnp.logical_and(
                unassigned[:, None], best_j[:, None] == idx_o[None, :]
            ),
            bid[:, None],
            _NEG,
        )
        win_bid = jnp.max(bid_mat, axis=0)
        winner = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        has_bid = win_bid > _NEG * 0.5

        new_owner = jnp.where(has_bid, winner, owner)
        new_price = jnp.where(has_bid, win_bid, price)
        # Rebuild person->object from the (injective) owner array.
        owner_safe = jnp.where(new_owner >= 0, new_owner, r)
        new_assign = (
            jnp.full((r + 1,), -1, jnp.int32).at[owner_safe].set(idx_o)[:r]
        )
        return new_assign, new_owner, new_price

    def body(state):
        assign, owner, price, rounds = state
        # ε-escalation: exact ε for the first 16 rounds (every realistic
        # association resolves well inside that), then ε grows 8x per 16
        # rounds. Blocks of near-TIED benefits otherwise climb prices at
        # only ε/round (bid = gap + ε, gap ≈ 0), needing O(range/ε)
        # rounds — hundreds of Jacobi sweeps on adversarial inputs.
        # Escalating ε bounds the total at ~16·log8(range/ε) rounds
        # while leaving uncontested decisions (the common case) exact;
        # prices only ever increase, so ε-CS holds at the final ε for
        # the rows settled late (the genuinely ambiguous ones).
        eps_now = eps * jnp.power(8.0, jnp.floor(rounds.astype(jnp.float32) / 16.0))
        # two Jacobi rounds per loop iteration: halves the while_loop
        # dispatch overhead that dominates small problems on TPU
        assign, owner, price = one_round(assign, owner, price, eps_now)
        assign, owner, price = one_round(assign, owner, price, eps_now)
        return assign, owner, price, rounds + 2

    def solve(_):
        assign0 = jnp.full((r,), -1, jnp.int32)
        owner0 = jnp.full((n_obj,), -1, jnp.int32)
        price0 = jnp.zeros((n_obj,), jnp.float32)
        assign, _, _, _ = jax.lax.while_loop(
            cond, body, (assign0, owner0, price0, jnp.int32(0))
        )
        return assign

    # Empty problems (no valid rows or no valid cols) are common in the
    # tracker's rescue/unconfirmed stages — skip the auction entirely.
    nonempty = jnp.logical_and(jnp.any(row_valid), jnp.any(col_valid))
    assign = jax.lax.cond(
        nonempty, solve, lambda _: jnp.full((r,), -1, jnp.int32), None
    )
    return _filter_matches(
        assign, finite_cost, thresh, row_valid, col_valid, r, c
    )


def _filter_matches(
    assign: jnp.ndarray,
    finite_cost: jnp.ndarray,
    thresh: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
    r: int,
    c: int,
) -> AssignmentResult:
    """Keep real matches only: column index < c (not a sentinel),
    cost within limit, both sides valid."""
    j = jnp.clip(assign, 0, c - 1)
    is_real = jnp.logical_and(assign >= 0, assign < c)
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
