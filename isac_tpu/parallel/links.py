"""Link-axis batching + sharding: the per-UE PHY as one SPMD tensor program.

Replaces the reference's serial per-UE loop (cellSimulation.m:66-87,161-163;
per-UE nrCDLChannel objects) with stacked ray tensors and a vmapped
transmit->channel->receive step, shard_mapped over a `link` mesh axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from isac_tpu.utils import xfer
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from isac_tpu.ops.cdl import CDLLink
from isac_tpu.phy.chains import SCHGrant, grant_tbs, sch_receive, sch_transmit


@dataclass(frozen=True, eq=False)
class BatchedLinks:
    """Ray constants for L links, zero-padded to a common ray count.

    H_l[t, f] = sum_r coeff_l[..., r] exp(2j pi nu_lr t) exp(-2j pi f tau_lr).
    """

    coeff: np.ndarray  # [L, rx, tx, R] complex64 (zero rows where padded)
    tau: np.ndarray  # [L, R]
    nu: np.ndarray  # [L, R]


def stack_links(links: list[CDLLink]) -> BatchedLinks:
    """Stack per-link CDL constants, padding the ray axis (profiles differ in
    cluster count: CDL-A 460 rays, CDL-D 261, ...)."""
    r_max = max(l.coeff.shape[-1] for l in links)
    coeff, tau, nu = [], [], []
    for l in links:
        r = l.coeff.shape[-1]
        pad = r_max - r
        coeff.append(np.pad(l.coeff, [(0, 0), (0, 0), (0, pad)]))
        tau.append(np.pad(l.tau, (0, pad)))
        nu.append(np.pad(l.nu, (0, pad)))
    return BatchedLinks(
        coeff=np.stack(coeff).astype(np.complex64),
        tau=np.stack(tau),
        nu=np.stack(nu),
    )


@partial(jax.jit, static_argnames=("n_rx", "n_tx", "sc"))
def _h_freq_resp(ft_j, ff_j, c2_j, n_rx, n_tx, sc):
    l, s, _ = ft_j.shape
    k = ff_j.shape[1]
    ph = ft_j[:, :, None, :] * ff_j[:, None, :, :]  # [L, S, K, R]
    h = jnp.einsum("lskr,lar->lska", ph, c2_j,
                   preferred_element_type=jnp.complex64)
    return (h * jnp.complex64(sc)).reshape(l, s, k, n_rx, n_tx)


def batched_frequency_response(
    bl: BatchedLinks, t_syms: np.ndarray, freqs: np.ndarray, scale: float = 1.0
) -> jnp.ndarray:
    """H[L, S, K, rx, tx] for all links at once — one MXU contraction over rays
    (the reference steps one nrCDLChannel object per UE per slot).

    Emitted as ONE module-level jitted program (cache hits across calls)
    including the reshape and any amplitude scale: the axon TPU relay executes
    compiled programs only, and an eager op (even `h * 1579.0`) silently
    poisons every downstream buffer — the error surfaces only at fetch time
    (see bench.py)."""
    L, n_rx, n_tx, R = bl.coeff.shape
    tt = np.asarray(t_syms, np.float64)
    ft = np.exp(2j * np.pi * tt[None, :, None] * bl.nu[:, None, :]).astype(np.complex64)
    ff = np.exp(
        -2j * np.pi * freqs.astype(np.float64)[None, :, None] * bl.tau[:, None, :]
    ).astype(np.complex64)  # [L, K, R]
    return _h_freq_resp(
        xfer.asarray(ft), xfer.asarray(ff),
        xfer.asarray(bl.coeff.reshape(L, n_rx * n_tx, R)),
        n_rx, n_tx, float(scale),
    )


def make_sharded_link_step(
    grant: SCHGrant,
    mesh: Mesh | None = None,
    axis: str = "link",
    n_ldpc_iter: int = 6,
):
    """Build the batched link step: tb[L, TBS], w[L, ...], h[L, S, K, rx, ports],
    noise[L, rx, S, K] -> dict(crc_ok[L], sinr_db[L], tb[L, TBS], n_ok scalar).

    Without a mesh: plain vmap (single device). With a mesh: shard_map over
    `axis` with a psum'd CRC-pass count (the aggregate-metric collective).
    Returns (jitted_fn, tbs).
    """
    tbs = grant_tbs(grant)

    def one_link(tb, w, h, noise):
        grid, _ = sch_transmit(tb, grant, w=w)
        rx = jnp.einsum("tsk,skat->ask", grid, h, preferred_element_type=jnp.complex64)
        rx = rx + noise
        out = sch_receive(rx, grant, n_ldpc_iter=n_ldpc_iter)
        return {
            "crc_ok": out["crc_ok"],
            "sinr_db": out["sinr_db"],
            "tb": out["tb"],
        }

    vstep = jax.vmap(one_link)

    if mesh is None:
        return jax.jit(vstep), tbs

    def sharded(tb, w, h, noise):
        out = vstep(tb, w, h, noise)
        # cell/link-aggregate KPI via collective (SURVEY §2.10: psum for
        # interference/metric aggregation across sharded transmitters)
        out["n_ok"] = jax.lax.psum(jnp.sum(out["crc_ok"].astype(jnp.int32)), axis)
        return out

    spec = P(axis)
    fn = shard_map(
        sharded,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs={"crc_ok": spec, "sinr_db": spec, "tb": spec, "n_ok": P()},
        check_vma=False,
    )
    return jax.jit(fn), tbs
