"""Benchmark harness — run on the ambient JAX backend (TPU under axon).

Stages, all at reference scale (100 MHz / 273 PRB @ SCS 30,
+scenarios/openStreetMapCity.m:59-67), each in its own subprocess:
  pdsch    full PDSCH link chain (transport encode -> QAM -> PRG precode ->
           CDL channel -> DM-RS estimate -> MMSE -> LDPC decode), 4 links —
           decoded info bits/s + RE samples/s;
  pdsch16  the same at 16 links (batch-scaling point);
  sensing  mono-static sensing chain (echo -> OFDM demod -> windowed 2D-FFT
           RDM -> CA-CFAR) at nIFFT 4096 — RDMs/s;
  engine   the FULL closed-loop cell engine (traffic -> RLC -> MAC -> PHY ->
           feedback -> sensing) — simulated slots/s + real-time factor;
  network  lockstep 2-cell network with DL+UL co-channel interference —
           cell-slots/s (capability the reference's parfeval pool lacks).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The reference publishes no benchmark numbers (BASELINE.md: published = {});
vs_baseline is reported against the best prior HONESTLY-TIMED recorded value
(extra.timing_fence present), else 1.0.

TIMING HONESTY NOTE (r3): the axon TPU relay (a) executes COMPILED programs
only — any eager primitive produces a poisoned buffer whose consumers never
execute, erroring only at fetch — and (b) `block_until_ready` does NOT
synchronize with real device execution. The r1/r2 bench numbers (e.g.
"9.47 Gbps PDSCH") were therefore enqueue-time artifacts of programs that
never ran (their input `h` was produced by an eager multiply). r3 onward:
every input is built by jitted programs, the timed region is ONE jitted
lax.scan over n distinct per-step inputs, and timing is fenced by fetching
an f32 scalar that data-depends on every step. These numbers are ~2-3
orders of magnitude smaller than r1/r2's — they are the real ones.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _fenced_scan(step_fn, xs, n_steps, consts=()):
    """Time jitted lax.scans over stacked per-step inputs, fenced by an
    f32-scalar fetch that depends on every step. Returns
    (marginal s/step, fixed_s, value).

    consts: complex device arrays the step needs (channel, precoders,
    waveforms). They MUST enter as jit ARGUMENTS, not closures: a complex
    device array captured as a jit constant inside a scan body is the one
    remaining relay-UNIMPLEMENTED pattern (r4 probe matrix,
    tools/probe_relay.py closure_scan vs closure_arg_scan) — it is what
    killed the r3 pdsch/sensing stages after the complex-H2D shim landed.

    TWO-POINT measurement (r4): every fenced dispatch through the axon relay
    pays a ~27 ms FIXED dispatch+execute+fetch round trip — measured
    identical for a trivial elementwise op, a 2048^3 bf16 matmul, and the
    full chain at n=1 (tools notes in RELAY_NOTES.md). Timing the scan at
    n_steps and at n_small and taking the slope separates the true marginal
    per-step execution from that constant; both runs are real fenced
    executions, so the numbers stay honest — the fixed cost is REPORTED
    (relay_fixed_s), not hidden."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xs_, consts_):
        def body(acc, x):
            return acc + step_fn(x, *consts_), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    def run_once(k):
        xs_k = jax.tree.map(lambda a: a[:k], xs)
        t0 = time.perf_counter()
        v = float(np.asarray(run(xs_k, consts)))
        return time.perf_counter() - t0, v

    assert n_steps >= 2, "two-point slope needs at least 2 steps"
    n_small = max(1, min(n_steps - 1, n_steps // 4))
    run_once(n_small)  # compile + warm (real executions)
    run_once(n_steps)
    # median of >=3 independent two-point measurements, spread reported
    # (VERDICT r4 Weak #3: min-of-2 was too few at the relay's shared-tenancy
    # jitter; the recorded JSON must be the quotable number)
    dts, v = [], 0.0
    for _ in range(3):
        t_small = min(run_once(n_small)[0] for _ in range(2))
        pair = [run_once(n_steps) for _ in range(2)]
        t_full, v = min(pair, key=lambda p: p[0])
        dts.append(max((t_full - t_small) / (n_steps - n_small), 1e-9))
    dts.sort()
    dt = dts[len(dts) // 2]
    spread = (dts[-1] - dts[0]) / dt
    t_full_med = dt * n_steps  # for the fixed-cost estimate below
    fixed = max(min(run_once(n_steps)[0] for _ in range(2)) - t_full_med, 0.0)
    return dt, fixed, v, spread


def bench_pdsch(n_prb=273, n_links=4, mcs=19, n_layers=2, n_steps=6):
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from isac_tpu.parallel.links import make_sharded_link_step

    g, args, tbs = ge._example_link_batch(n_prb=n_prb, n_links=n_links, mcs=mcs,
                                          n_layers=n_layers)
    tb, w, h, noise = args
    fn, _ = make_sharded_link_step(g, mesh=None)
    # distinct payloads + noise per step (host-built, device-transferred —
    # never eager), so no caching layer can collapse the steps
    rng = np.random.default_rng(1)
    tb_s = jnp.asarray(rng.integers(0, 2, (n_steps, *tb.shape)).astype(np.int8))
    from isac_tpu.utils import xfer

    ns_s = xfer.asarray(
        ((rng.standard_normal((n_steps, *noise.shape))
          + 1j * rng.standard_normal((n_steps, *noise.shape))) * np.sqrt(0.5)
         ).astype(np.complex64)
    )

    def step(x, w_, h_):
        tb_i, ns_i = x
        out = fn(tb_i, w_, h_, ns_i)
        return (jnp.sum(out["sinr_db"]) + jnp.sum(out["crc_ok"].astype(jnp.float32))
                + jnp.sum(out["tb"][..., :64].astype(jnp.float32)))

    dt, fixed, _, spread = _fenced_scan(step, (tb_s, ns_s), n_steps, consts=(w, h))
    info_bits = tbs * n_links
    n_samples = n_links * 2 * 14 * n_prb * 12  # rx REs processed
    return {
        "pdsch_slot_s": dt,
        "pdsch_relay_fixed_s": fixed,
        "pdsch_run_spread": spread,
        "pdsch_info_mbps": info_bits / dt / 1e6,
        "pdsch_re_msamples_s": n_samples / dt / 1e6,
        "tbs": tbs,
    }


def bench_sensing(n_prb=273, num_slots=20, n_steps=6):
    import jax
    import jax.numpy as jnp

    from isac_tpu.config.params import GNBParams, ULA
    from isac_tpu.ops.ofdm import ofdm_modulate
    from isac_tpu.ops.sensing import (
        cfar_detect_map,
        derive_radar_params,
        make_cfar_config,
        mono_static_sensing,
        range_doppler_map,
    )

    gnb = GNBParams(antenna=ULA(n_v=8, polarizations=2))
    carrier = gnb.carrier
    info = carrier.ofdm
    n_sc = carrier.n_sc
    p = derive_radar_params(
        gnb, carrier, np.array([[120.0, 40.0, 1.5]]), np.array([1.0]),
        np.array([7.0]), num_slots,
    )
    rng = np.random.default_rng(0)
    grid = (
        (rng.integers(0, 2, (gnb.num_tx_ants, num_slots * 14, n_sc)) * 2 - 1)
        + 1j * (rng.integers(0, 2, (gnb.num_tx_ants, num_slots * 14, n_sc)) * 2 - 1)
    ).astype(np.complex64) / np.sqrt(2)
    amp = float(
        10 ** ((gnb.tx_power_dbm - 30) / 20)
        * np.sqrt(info.nfft**2 / (n_sc * gnb.num_tx_ants))
    )
    cfg = make_cfar_config(p)

    @jax.jit
    def prep(g):  # scale + OFDM-modulate in one program (eager-free)
        gs = g * jnp.complex64(amp)
        return gs, ofdm_modulate(gs, info).T

    from isac_tpu.utils import xfer

    tx_grid, tx_wave = prep(xfer.asarray(grid))
    # raw threefry key data built on host: [n_steps, 2] uint32
    keys = jnp.asarray(
        np.stack([np.array([7, i], np.uint32) for i in range(n_steps)])
    )

    def step(k, tx_wave_, tx_grid_):
        rx_grid = mono_static_sensing(tx_wave_, p, info, n_sc, num_slots, k)
        rdm = range_doppler_map(rx_grid, tx_grid_, p.n_ifft, p.n_fft)
        power = jnp.abs(rdm) ** 2
        det = cfar_detect_map(power, cfg)
        return det.sum().astype(jnp.float32)

    dt, fixed, _, spread = _fenced_scan(step, keys, n_steps, consts=(tx_wave, tx_grid))
    return {
        "sensing_chain_s": dt,
        "sensing_relay_fixed_s": fixed,
        "sensing_run_spread": spread,
        "rdm_per_s": 1.0 / dt,
        "n_ifft": p.n_ifft,
        "n_fft": p.n_fft,
    }


def bench_ldpc_decode(bg=1, z=384, n_cw=28, n_iter=6, n_steps=6):
    """Fallback kernel bench: the production LDPC decode (VMEM Pallas layered
    kernel on TPU) on a 273-PRB-class batch — the chain's dominant kernel and
    one verified to EXECUTE on the axon relay (ops/ldpc_layered.py). Used
    when the full-chain bench hits a relay UNIMPLEMENTED op, so the recorded
    number is always a really-executed one."""
    import jax.numpy as jnp

    from isac_tpu.ops import ldpc
    from isac_tpu.ops.ldpc_layered import decode_layered

    code = ldpc.lifted_code(bg, z)
    rng = np.random.default_rng(3)
    # random LLRs are fine for throughput (fixed iteration count, no early exit)
    llr = jnp.asarray(
        rng.standard_normal((n_steps, n_cw, code.n_full)).astype(np.float32) * 4.0
    )

    def step(llr_i):
        hard, ok = decode_layered(llr_i, bg, z, n_iter=n_iter)
        return (jnp.sum(hard[..., :64].astype(jnp.float32))
                + jnp.sum(ok.astype(jnp.float32)))

    dt, fixed, _, spread = _fenced_scan(step, llr, n_steps)
    info_bits = n_cw * code.k
    return {
        "ldpc_decode_s": dt,
        "ldpc_relay_fixed_s": fixed,
        "ldpc_run_spread": spread,
        "ldpc_decode_info_mbps": info_bits / dt / 1e6,
        "ldpc_bg": bg, "ldpc_z": z, "ldpc_n_cw": n_cw, "ldpc_n_iter": n_iter,
    }


def bench_engine(n_rb=51, nfft=1024, block=8, repeats=3, prefix="engine"):
    """Engine-level metric (VERDICT r2 #2/#7): simulated-slots/s of the 5-UE
    openStreetMapCity frame through the FULL stack (traffic -> RLC -> MAC ->
    batched PHY -> feedback loops -> sensing accumulation). Frame 1 pays
    compile; the recorded number is the MEDIAN of `repeats` full closed-loop
    frames (VERDICT r4 Weak #3: the bench absorbs relay jitter itself).

    block=8 runs the segment-fused block engine (sim/block.py, VERDICT r4
    #1): whole DDDSU DL segments dispatch as one program with one packed
    fetch per feedback boundary — bit-identical to the slot loop
    (tests/test_block.py).

    The closed-loop engine must read CRC/CSI results back to the host every
    slot; on the axon relay any unsupported op wedges the whole client
    session (RELAY_NOTES.md). So this stage is UNKILLABLE BY DESIGN
    (VERDICT r3 #2): ISAC_TPU_FORCE_CPU=1 pins the CPU backend, and main()
    reruns the stage that way whenever the TPU attempt dies — every bench
    line carries engine numbers (backend labeled) plus the captured
    failing-op string when TPU was abandoned."""
    import os

    import jax

    from isac_tpu.config import SimulationParameters, assign_cell_parameters
    from isac_tpu.config.scenarios import open_street_map_city
    from isac_tpu.sim.cell import CellSimulator

    backend = jax.default_backend()
    ctx = None
    if os.environ.get("ISAC_TPU_FORCE_CPU") == "1" and backend != "cpu":
        ctx = jax.default_device(jax.devices("cpu")[0])
        ctx.__enter__()
        backend = "cpu (forced: TPU attempt failed)"
    try:
        sim = open_street_map_city(SimulationParameters())
        cells = assign_cell_parameters(sim)
        kw = dict(n_rb_override=n_rb, nfft_override=nfft, block_slots=block)
        # warm EVERY timed seed once: per-seed traffic realizations hit
        # different grant/segment signatures, and a compile inside a timed
        # frame would corrupt the median (compiled programs are shared
        # module-level, so the second pass is compile-free)
        for rep in range(repeats):
            CellSimulator(cells[0], seed=1 + rep, **kw).run()
        dts = []
        num_slots = slot_s = n_ues = 0
        for rep in range(repeats):
            cs = CellSimulator(cells[0], seed=1 + rep, **kw)
            t0 = time.perf_counter()
            cs.run()
            dts.append(time.perf_counter() - t0)
            num_slots, slot_s, n_ues = cs.num_slots, cs.carrier.slot_duration_s, cs.n_ues
        dts.sort()
        dt = dts[len(dts) // 2]  # median over full closed-loop frames
        pfx = prefix
        return {
            f"{pfx}_slots_per_s": num_slots / dt,
            f"{pfx}_rtf": num_slots * slot_s / dt,  # simulated / wall time
            f"{pfx}_run_spread": (dts[-1] - dts[0]) / dt,
            f"{pfx}_n_rb": n_rb,
            f"{pfx}_n_ues": n_ues,
            f"{pfx}_block_slots": block,
            f"{pfx}_backend": backend,
        }
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)


def bench_network(n_rb=51, nfft=1024, repeats=3, prefix="network"):
    """Lockstep 2-cell network frame with DL+UL co-channel interference
    (sim/network.py SyncNetworkRunner): cell-slots/s through the FULL stack
    including batched cross-cell CDL banks. The reference's parfeval workers
    share nothing and cannot interfere at all (networkSimulation.m:44-55),
    so this measures capability the reference lacks. Frame 1 pays compile;
    frame 2 is the steady-state number. ISAC_TPU_FORCE_CPU=1 pins CPU
    (main() reruns that way if the TPU attempt dies)."""
    import os

    import jax

    from isac_tpu.config.params import SimulationParameters, assign_cell_parameters
    from isac_tpu.config.scenarios import multi_cell
    from isac_tpu.sim.network import SyncNetworkRunner

    backend = jax.default_backend()
    ctx = None
    if os.environ.get("ISAC_TPU_FORCE_CPU") == "1" and backend != "cpu":
        ctx = jax.default_device(jax.devices("cpu")[0])
        ctx.__enter__()
        backend = "cpu (forced: TPU attempt failed)"
    try:
        sim = multi_cell(SimulationParameters(), num_cells=2)
        sim.validate()
        cells = assign_cell_parameters(sim)
        kw = dict(n_rb_override=n_rb, nfft_override=nfft, enable_sensing=False)
        for rep in range(repeats):  # warm every timed seed (see bench_engine)
            SyncNetworkRunner(cells, seed=1 + rep, **kw).run()
        dts = []
        num_slots = 0
        for rep in range(repeats):
            rn = SyncNetworkRunner(cells, seed=1 + rep, **kw)
            t0 = time.perf_counter()
            rn.run()
            dts.append(time.perf_counter() - t0)
            num_slots = rn.num_slots
        dts.sort()
        dt = dts[len(dts) // 2]  # median over lockstep network frames
        return {
            f"{prefix}_cell_slots_per_s": 2 * num_slots / dt,
            f"{prefix}_run_spread": (dts[-1] - dts[0]) / dt,
            f"{prefix}_n_rb": n_rb,
            f"{prefix}_n_cells": 2,
            f"{prefix}_backend": backend,
        }
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)


# assumed dense-compute peaks for achieved-fraction estimates (bf16 MXU;
# fp32/complex paths land lower). Labelled estimates, not measurements.
_PEAK_FLOPS = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12}


def _flops_estimates(extra):
    """Analytic FLOPs/bytes for the two hot kernels -> achieved-vs-peak.

    PDSCH chain (per run of bench_pdsch): dominated by the LDPC min-sum
    decode. Algorithmic flops ~= iters * C_blocks * links * (10*E*Z for the
    check updates + 2*n_cols*E*Z MACs for the one-hot column aggregation as
    formulated). Channel apply adds links*rx*tx*14*K complex MACs (8 flops).
    Sensing: two FFT passes, 5*N*log2(N) per length-N transform, over
    n_ants * (nFFT range columns + nIFFT doppler rows)."""
    out = {}
    try:
        import math

        if "pdsch_slot_s" in extra:
            n_links, n_prb, n_layers = 4, 273, 2
            k_sc = n_prb * 12
            e_edges, z, c_blocks, iters = 316, 384, 28, 6
            # ALGORITHMIC flops (not the dense one-hot formulation XLA is free
            # to rewrite): min-sum check update ~10 flops/edge/Z + edge
            # aggregation ~2 flops/edge/Z, per iteration per code block
            ldpc = iters * c_blocks * n_links * 12 * e_edges * z
            chan = n_links * 2 * 16 * 14 * k_sc * 8
            flops = ldpc + chan
            out["pdsch_alg_gflops_est"] = flops / 1e9
            out["pdsch_alg_tflops_s_est"] = flops / extra["pdsch_slot_s"] / 1e12
            # bytes: LLR buffers dominate (E*Z f32 read+write per iter per CB)
            bytes_moved = iters * c_blocks * n_links * e_edges * z * 4 * 2
            out["pdsch_flops_per_byte_est"] = flops / bytes_moved
        if "sensing_chain_s" in extra:
            n_ifft, n_fft, n_ants = extra["n_ifft"], extra["n_fft"], 16
            f1 = n_ants * n_fft * 5 * n_ifft * math.log2(n_ifft)
            f2 = n_ants * n_ifft * 5 * n_fft * math.log2(n_fft)
            out["sensing_gflops_est"] = (f1 + f2) / 1e9
            out["sensing_tflops_s_est"] = (f1 + f2) / extra["sensing_chain_s"] / 1e12
        import os

        gen = os.environ.get("PALLAS_AXON_TPU_GEN")
        if not gen:
            # take the generation from the actual device (VERDICT r3 #10),
            # e.g. "TPU v5 lite0" -> v5e, "TPU v5p" -> v5p, "TPU v4" -> v4
            try:
                import jax

                kind = jax.devices()[0].device_kind.lower()
                if "lite" in kind or "v5e" in kind:
                    gen = "v5e"
                elif "v5" in kind:
                    gen = "v5p"
                elif "v6" in kind:
                    gen = "v6e"
                elif "v4" in kind:
                    gen = "v4"
                out["tpu_device_kind"] = jax.devices()[0].device_kind
            except Exception:
                gen = None
        gen = gen or "v5e"
        peak = _PEAK_FLOPS.get(gen)
        if peak and "pdsch_alg_tflops_s_est" in out:
            # min-sum is VPU/memory bound, so a low MXU-peak fraction is the
            # EXPECTED shape; this is a roofline position, not a scalar goal
            out["mfu_est"] = out["pdsch_alg_tflops_s_est"] * 1e12 / peak
            out["mfu_peak_assumed"] = f"{gen}:{peak / 1e12:.0f}TF-bf16"
    except Exception as e:  # estimates must never break the bench line
        out["flops_est_error"] = repr(e)[:120]
    return out


def _best_prior_bench(key="pdsch_info_mbps"):
    """Best prior HONESTLY-TIMED `key` from BENCH_r*.json history.

    Records without extra.timing_fence predate the r3 timing fix (their
    numbers are enqueue-time artifacts — see the module docstring) and are
    not comparable."""
    import glob

    best = None
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            with open(path) as f:
                rec = json.load(f)
            extra = (rec.get("parsed") or {}).get("extra", {})
            if "timing_fence" not in extra:
                continue
            v = extra.get(key)
            if v:
                best = max(best or 0.0, float(v))
        except Exception:
            continue
    return best


def _run_isolated(name, timeout_s, env_extra=None):
    """Run one bench stage in a SUBPROCESS and parse its JSON line.

    Mandatory on the axon relay: after any failed program the client session
    is wedged — every subsequent device op in the process fails with
    UNIMPLEMENTED (RELAY_NOTES.md). In-process sequencing made one stage's
    failure poison all later stages (including known-good ones)."""
    import os
    import subprocess
    import sys

    env = None
    if env_extra:
        env = dict(os.environ)
        env.update(env_extra)
    try:
        p = subprocess.run(
            [sys.executable, __file__, "--one", name],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
        for line in reversed(p.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except Exception:
                continue
        return {f"{name}_error": (p.stderr.strip().splitlines() or ["no output"])[-1][:200]}
    except subprocess.TimeoutExpired:
        return {f"{name}_error": f"timeout after {timeout_s}s"}
    except Exception as e:
        return {f"{name}_error": repr(e)[:200]}


def main():
    import sys

    from isac_tpu.utils.compcache import enable_persistent_cache

    enable_persistent_cache()  # minutes-scale relay compiles persist to disk

    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        fn = {"pdsch": bench_pdsch, "sensing": bench_sensing,
              "ldpc": bench_ldpc_decode, "engine": bench_engine,
              "network": bench_network,
              # reference-scale closed loop (VERDICT r4 #2): the flagship
              # engine at openStreetMapCity.m's own operating point —
              # 273 PRB / nFFT 4096 / 5 UEs / DDDSU
              # block=1 (slot-fused): the multi-slot segment programs at 273
              # PRB have a large compile-signature space; slot fusion keeps
              # first-run compiles inside the stage timeout
              "engine273": lambda: bench_engine(
                  n_rb=273, nfft=4096, repeats=2, block=1,
                  prefix="engine273"),
              "network273": lambda: bench_network(
                  n_rb=273, nfft=4096, repeats=2, prefix="network273"),
              "pdsch16": lambda: {
                  ("pdsch16_" + k.split("pdsch_", 1)[-1] if k.startswith("pdsch_") else k): v
                  for k, v in bench_pdsch(n_links=16).items()
              }}[sys.argv[2]]
        try:
            print(json.dumps(fn()))
        except Exception as e:
            print(json.dumps({f"{sys.argv[2]}_error": repr(e)[:200]}))
        return

    import jax

    extra = {
        "backend": jax.default_backend(),
        "n_devices": len(jax.devices()),
        # honesty marker: timed region is a jitted scan over distinct inputs,
        # fenced by an f32 readback (real execution). r1/r2 records lack this
        # marker — their numbers were enqueue-time artifacts (module docstring)
        "timing_fence": "jitted-scan+f32-readback+two-point-slope",
    }
    extra.update(_run_isolated("pdsch", 1800))
    # batch-scaling point: 16 links amortize the near-fixed per-step costs
    # (the decode kernel is latency-bound — 4x codewords were measured
    # nearly free); errors here never block the headline stages
    extra.update(_run_isolated("pdsch16", 900))
    extra.update(_run_isolated("sensing", 1500))
    if "pdsch_info_mbps" not in extra:
        # the relay rejects an op in the full chain (tracked in pdsch_error);
        # fall back to the dominant kernel so the record is a real execution
        extra.update(_run_isolated("ldpc", 900))
    extra.update(_run_isolated("engine", 1200))
    if "engine_slots_per_s" not in extra:
        # unkillable engine stage (VERDICT r3 #2): keep the TPU failure
        # string, rerun pinned to CPU so engine numbers always exist
        extra.update(_run_isolated("engine", 1200,
                                   env_extra={"ISAC_TPU_FORCE_CPU": "1"}))
    # reference-scale closed loop (VERDICT r4 #2): however slow, record it
    extra.update(_run_isolated("engine273", 2400))
    if "engine273_slots_per_s" not in extra:
        extra.update(_run_isolated("engine273", 2400,
                                   env_extra={"ISAC_TPU_FORCE_CPU": "1"}))
    extra.update(_run_isolated("network", 1500))
    if "network_cell_slots_per_s" not in extra:
        extra.update(_run_isolated("network", 1500,
                                   env_extra={"ISAC_TPU_FORCE_CPU": "1"}))
    extra.update(_run_isolated("network273", 2400))
    extra.update(_flops_estimates(extra))
    if "pdsch_info_mbps" in extra:
        metric, value = "pdsch_chain_info_rate", extra["pdsch_info_mbps"]
    elif "ldpc_decode_info_mbps" in extra:
        metric, value = "ldpc_decode_info_rate", extra["ldpc_decode_info_mbps"]
    else:
        metric, value = "engine_slots_per_s", extra.get("engine_slots_per_s", 0.0)
    best_prior = _best_prior_bench(
        "pdsch_info_mbps" if metric.startswith("pdsch")
        else "ldpc_decode_info_mbps" if metric.startswith("ldpc")
        else "engine_slots_per_s"
    )
    # the reference publishes no numbers (BASELINE.md); baseline = best prior
    # honestly-timed recorded round of THIS framework
    vs = (float(value) / best_prior) if best_prior else 1.0
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 3),
                "unit": "Mbps" if metric.endswith("rate") else "slots/s",
                "vs_baseline": round(vs, 4),
                "extra": {k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in extra.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
