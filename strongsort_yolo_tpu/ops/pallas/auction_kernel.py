"""Bertsekas auction assignment as one Pallas TPU kernel (SURVEY.md N6).

The reference stack solves tracker cost matrices on the host with the
``lap`` C++ Jonker-Volgenant solver (via the ultralytics tracker,
/root/reference/yolo_multi_model.py:41 — SURVEY.md D12). This repo's
in-jit equivalent is ops/assignment.solve_assignment — a Jacobi
auction whose every round is a handful of (R, C)-shaped XLA ops.

Under vmap (the S-stream batched tracking step) that XLA formulation
has two costs the hardware doesn't need to pay:

- every Jacobi round re-streams the benefit matrix from HBM (~4
  passes/round over (S, R, C+R) f32), and
- ``lax.while_loop`` under vmap runs every stream until the SLOWEST
  stream converges — all lanes pay the worst case.

This kernel keeps the whole problem in VMEM: the (R, C) cost block is
read from HBM once, the thresh-normalization, every auction round,
and the cost-limit match filtering are VPU passes over VMEM, and each
grid step (= each stream, via vmap) exits its while loop the moment
its own assignment is complete. Measured on the v5e S=32 batched
step: the three association solves went from ~2.5 ms to ~0.6 ms
device time per step (kernel + residual glue).

Semantics mirror ops/assignment.solve_assignment's XLA path
(dedicated zero-benefit sentinel per row == lapjv cost_limit
semantics, ε-scaling with geometric escalation). The sentinel block
is IMPLICIT — a row whose best real value drops below 0 retires to
its sentinel permanently (a dedicated object can never be outbid), so
the kernel only materializes the (R, C) real block, not (R, C+R).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def _auction_kernel(
    cost_ref, t_ref, rv_ref, cv_ref, r2c_ref, c2r_ref,
    *, r, c, eps0, max_rounds
):
    """cost_ref: (R, C) f32; t_ref: (1, 1) f32 cost limit; rv_ref:
    (R, 1) f32 0/1 row mask; cv_ref: (1, C) f32 0/1 col mask.
    Outputs: r2c (1, R) i32 (matched col or -1), c2r (1, C) i32."""
    t = t_ref[0, 0]
    rv = rv_ref[...]
    cv = cv_ref[...]
    valid = rv * cv  # (R, C) via broadcast

    # thresh-normalized benefit, forbidden pairs at -4 (identical to
    # the XLA path's w_real, computed in VMEM instead of as three
    # HBM-level reduce/where passes)
    cost = jnp.clip(cost_ref[...], -1e6, 1e6)
    cmin = jnp.minimum(jnp.min(jnp.where(valid > 0.5, cost, t)), t)
    cmax = jnp.maximum(jnp.max(jnp.where(valid > 0.5, cost, t)), t)
    crange = jnp.maximum(cmax - cmin, 1e-6)
    w = jnp.where(valid > 0.5, (t - cost) / crange, -4.0)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)

    def cond(state):
        price, owner, sent, rounds, eps = state
        owned = jnp.max(
            jnp.where(owner == row_ids, 1.0, 0.0), axis=1, keepdims=True
        )
        done = jnp.maximum(sent, owned)
        return jnp.logical_and(jnp.min(done) < 0.5, rounds < max_rounds)

    def body(state):
        price, owner, sent, rounds, eps = state
        # ε-escalation (see ops/assignment.py): exact for 16 rounds,
        # then 8x per 16 — bounds tie-block price wars. (Carried and
        # multiplied in-loop: Mosaic has no powf.)
        eps = jnp.where(
            jnp.logical_and(rounds > 0, rounds % 16 == 0), eps * 8.0, eps
        )

        values = w - price  # (R, C)
        best_v = jnp.max(values, axis=1, keepdims=True)  # (R, 1)
        is_best = values == best_v
        # lowest-index argmax, XLA-argmax tie semantics
        best_j = jnp.min(
            jnp.where(is_best, col_ids, jnp.int32(c)), axis=1, keepdims=True
        )
        chosen = col_ids == best_j
        # w at the chosen column == price[best_j] + best_v (no gather)
        w_best = jnp.max(jnp.where(chosen, w, _NEG), axis=1, keepdims=True)
        second_real = jnp.max(
            jnp.where(chosen, _NEG, values), axis=1, keepdims=True
        )
        # the row's own sentinel (benefit 0, price 0) is always an
        # alternative: it caps the second-best value
        second_v = jnp.maximum(second_real, 0.0)

        owned = jnp.max(
            jnp.where(owner == row_ids, 1.0, 0.0), axis=1, keepdims=True
        )
        bidding = jnp.logical_and(sent < 0.5, owned < 0.5)  # (R, 1)
        # retire to sentinel when no real column beats staying unmatched
        retire = jnp.logical_and(bidding, best_v < 0.0)
        sent = jnp.maximum(sent, retire.astype(jnp.float32))
        place = jnp.logical_and(bidding, jnp.logical_not(retire))

        bid = w_best - second_v + eps  # = price[bj] + (bv - sv) + eps
        bid_mat = jnp.where(jnp.logical_and(place, chosen), bid, _NEG)
        win_bid = jnp.max(bid_mat, axis=0, keepdims=True)  # (1, C)
        has_bid = win_bid > _NEG * 0.5
        winner = jnp.min(
            jnp.where(bid_mat == win_bid, row_ids, jnp.int32(r)),
            axis=0,
            keepdims=True,
        )
        price = jnp.where(has_bid, win_bid, price)
        owner = jnp.where(has_bid, winner, owner)
        return price, owner, sent, rounds + 1, eps

    price0 = jnp.zeros((1, c), jnp.float32)
    owner0 = jnp.full((1, c), -1, jnp.int32)
    sent0 = jnp.zeros((r, 1), jnp.float32)
    price, owner, sent, _, _ = jax.lax.while_loop(
        cond, body, (price0, owner0, sent0, jnp.int32(0), jnp.float32(eps0))
    )

    # materialize the matching, applying the cost-limit filter in
    # VMEM on the RAW cost (cost <= t + 1e-6), matching the XLA
    # path's _filter_matches absolute tolerance exactly — filtering
    # the normalized benefit would scale the tolerance by crange
    # (up to ~2e6 with clipped costs).
    own_mat = jnp.logical_and(
        jnp.logical_and(owner == row_ids, valid > 0.5),
        cost <= t + 1e-6,
    )  # (R, C) filtered ownership
    r2c = jnp.min(
        jnp.where(own_mat, col_ids, jnp.int32(c)), axis=1, keepdims=True
    )
    r2c = jnp.where(r2c == c, -1, r2c)
    c2r = jnp.min(
        jnp.where(own_mat, row_ids, jnp.int32(r)), axis=0, keepdims=True
    )
    c2r = jnp.where(c2r == r, -1, c2r)
    r2c_ref[...] = jnp.transpose(r2c)
    c2r_ref[...] = c2r


@functools.partial(
    jax.jit, static_argnames=("eps_rel", "max_rounds_factor", "interpret")
)
def pallas_auction(
    cost: jnp.ndarray,  # (R, C) cost matrix (any float dtype)
    thresh: jnp.ndarray,  # scalar cost limit
    row_valid: jnp.ndarray,  # (R,) bool
    col_valid: jnp.ndarray,  # (C,) bool
    *,
    eps_rel: float = 3e-3,
    max_rounds_factor: int = 16,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """lapjv-with-cost-limit semantics, solved entirely in VMEM.
    Returns (row_to_col (R,), col_to_row (C,)) int32, -1 unmatched,
    already filtered to valid rows/cols and cost <= thresh. Shapes are
    padded to TPU tile multiples internally (padded entries are
    invalid and settle on sentinels without bidding)."""
    r, c = cost.shape
    rp = max(8, -(-r // 8) * 8)
    cp = max(128, -(-c // 128) * 128)
    cost_pad = jnp.zeros((rp, cp), jnp.float32)
    cost_pad = jax.lax.dynamic_update_slice(
        cost_pad, cost.astype(jnp.float32), (0, 0)
    )
    rv = jnp.zeros((rp, 1), jnp.float32)
    rv = jax.lax.dynamic_update_slice(
        rv, row_valid.astype(jnp.float32)[:, None], (0, 0)
    )
    cv = jnp.zeros((1, cp), jnp.float32)
    cv = jax.lax.dynamic_update_slice(
        cv, col_valid.astype(jnp.float32)[None, :], (0, 0)
    )
    t = jnp.asarray(thresh, jnp.float32).reshape(1, 1)
    kernel = functools.partial(
        _auction_kernel,
        r=rp,
        c=cp,
        eps0=eps_rel,
        max_rounds=max_rounds_factor * rp,
    )
    r2c, c2r = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, rp), jnp.int32),
            jax.ShapeDtypeStruct((1, cp), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=rp * cp * 8 * 24,  # ~24 VPU rounds of ~8 passes
            bytes_accessed=rp * cp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cost_pad, t, rv, cv)
    return r2c[0, :r], c2r[0, :c]
