"""Pallas fused block-gather + score kernel for the beam frontier.

The XLA blocked path (ops/distance.py ``block_neg_sq_l2``) gathers
``nbrvec[cand]`` into a [B, E, F, D] HBM intermediate and then contracts
it -- at the bench operating point that intermediate is ~0.5GB written
and re-read per beam step. This kernel keeps each candidate's neighbor
block in VMEM: per lane tile it DMAs the [F, D] blocks straight from the
HBM table, computes the matmul-form sims in place, and writes only the
[B, E*F] sim tile back.

    sims[b, e*F + f] = 2 * q[b]. nbrvec[cand[b,e], f]
                       - |nbrvec[cand[b,e], f]|^2 - |q[b]|^2

The neighbor sqnorm is recomputed from the block in VMEM (one extra VPU
pass over data already resident) instead of gathering the nbrsqn table,
so the kernel needs exactly one DMA per (lane, candidate).

SURVEY M3 (Pallas where XLA is weak): the weak spot is gather *issue*
cost. Measured outcome (v5e, B=2048, E=16, F=32, D=128, f32): this
kernel runs one beam gather+score in 3.04ms vs 3.95ms for the XLA
blocked path -- a 1.3x op-level win, plateaued at ~92ns per DMA issue
(TILE_B 16 and 32 measure the same, so the issue rate, not bandwidth or
compute, is the wall -- consistent with XLA's own gather being per-row
issue-bound). End-to-end, however, the search pipeline measures a WASH
(4379 vs 4353 qps at the 1M operating point): XLA overlaps the block
gather with the step's sorts inside the fused program, so the op-level
win vanishes. Opt in with REDIS_HNSW_TPU_PALLAS_GATHER=1
(ops/search.py _use_pallas_gather); the next step that would beat XLA
here is fusing gather+score+merge-sort into ONE kernel, removing the
overlap XLA exploits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lanes per grid program: 16 lanes x E blocks of [F, D] f32 = 4MB VMEM
# at the bench shapes (E=16, F=32, D=128). Measured on the v5e at
# B=2048: TILE_B=8 -> 3.38ms, 16 -> 3.04ms, 32 -> 3.05ms per step
# (plateau = DMA issue bound, ~92ns per block issue), vs the XLA
# blocked path's 3.95ms: a 1.3x win on the gather+score op.
TILE_B = 16


def _kernel(cand_ref, q_ref, nbrvec_hbm, out_ref, cand_s, blocks, sems,
            cand_sem, *, E: int, F: int, D: int):
    TB = q_ref.shape[0]

    # The candidate ids arrive as a VMEM tile (a whole-array scalar
    # prefetch would need B*E SMEM words -- 1MB at B=2048, the entire
    # SMEM); copy just this tile into SMEM so the scalar core can use
    # the ids as DMA source indices.
    idx_dma = pltpu.make_async_copy(cand_ref, cand_s, cand_sem)
    idx_dma.start()
    idx_dma.wait()

    # Start every block DMA up front: TB*E copies of one [F, D] block
    # each, all in flight together (the DMA engines overlap latencies;
    # issue cost is the open question this kernel answers).
    for t in range(TB):
        for e in range(E):
            src = nbrvec_hbm.at[cand_s[t, e]]
            pltpu.make_async_copy(src, blocks.at[t, e], sems.at[t, e]).start()
    for t in range(TB):
        for e in range(E):
            pltpu.make_async_copy(
                nbrvec_hbm.at[cand_s[t, e]],
                blocks.at[t, e],
                sems.at[t, e],
            ).wait()

    flat = blocks[:].astype(jnp.float32).reshape(TB * E * F, D)
    # One [TB*E*F, D] x [D, TB] matmul: computes every lane's dots
    # against every lane's query; the block-diagonal slice is ours. The
    # TB-fold overcompute is ~free on the MXU (total MACs are tiny) and
    # beats TB separate matvecs.
    dots = jax.lax.dot_general(
        flat, q_ref[:].transpose(),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(TB, E * F, TB)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, E * F, TB), 2)
    own = lane == jax.lax.broadcasted_iota(jnp.int32, (TB, E * F, TB), 0)
    dot_own = jnp.sum(jnp.where(own, dots, 0.0), axis=2)      # [TB, E*F]
    sqn = jnp.sum(flat * flat, axis=1).reshape(TB, E * F)
    # query sqnorm recomputed in VMEM (a rank-1 [TB] input would violate
    # the TPU block-tiling rules, and the flops are negligible)
    qn = jnp.sum(q_ref[:] * q_ref[:], axis=1, keepdims=True)  # [TB, 1]
    out_ref[:] = 2.0 * dot_own - sqn - qn


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_block_score(q, qn, nbrvec, cand, *, interpret: bool = False):
    """[B, E*F] matmul-form sims via fused DMA gather + score.

    ``q`` [B, D] f32, ``qn`` [B] f32, ``nbrvec`` [N, F, D] (f32/bf16/f16),
    ``cand`` [B, E] int32 (must be in-range; clamp before calling).
    B must be a multiple of TILE_B.
    """
    B, D = q.shape
    E = cand.shape[1]
    F = nbrvec.shape[1]
    grid = (B // TILE_B,)
    return pl.pallas_call(
        functools.partial(_kernel, E=E, F=F, D=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TILE_B, E), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_B, D), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),   # nbrvec: HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE_B, E * F), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.SMEM((TILE_B, E), jnp.int32),
            pltpu.VMEM((TILE_B, E, F, D), nbrvec.dtype),
            pltpu.SemaphoreType.DMA((TILE_B, E)),
            pltpu.SemaphoreType.DMA(()),
        ],
        out_shape=jax.ShapeDtypeStruct((B, E * F), jnp.float32),
        interpret=interpret,
    )(cand, q, nbrvec)
