"""Bound the LDPC shift-table approximation empirically (VERDICT r3 #6).

The repo's extension-row lifting shifts are girth-optimized substitutes for
the unavailable TS 38.212 constants (isac_tpu/ops/ldpc_tables.py
PROVENANCE). The claim that "shift choices don't move the waterfall" is
testable without the spec values: if SEVERAL independent girth-optimized
liftings of the exact protograph produce coincident BLER-vs-SNR curves,
the committed lifting's curve is pinned to the family's waterfall — the
only uncertainty the substitution leaves is error-floor behavior far below
simulated operating points.

This tool:
1. generates N_ALT alternate liftings (random restart + the same coordinate
   descent, tools/gen_ldpc_shifts.py optimize(rand_init=True)) and writes
   them as ISAC_TPU_LDPC_TABLES drop-in JSONs under tests/golden/;
2. runs a BLER-vs-SNR sweep for the committed lifting and each alternate in
   a SUBPROCESS (the env-var hook swaps the whole table set cleanly);
3. writes tests/golden/ldpc_lifting_sweep.json with curves, the
   interpolated SNR @ BLER=0.1 crossing per lifting, and the spread;
4. also writes a golden encode fixture (message + codeword CRC32 per
   lifting) so externally supplied real tables can be certified the day
   they arrive (tests/test_ldpc.py::test_lifting_* consume these).

Usage: python tools/ldpc_lifting_sweep.py  (~minutes on CPU)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zlib
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BG = 1
Z = 64  # iLS 0 (a=2): small enough to sweep fast, large enough to be typical
N_ALT = 2
SNRS_DB = [-1.0, -0.8, -0.6, -0.4, -0.2, 0.0, 0.2]  # Es/N0, real BPSK, rate 1/3
N_CW = 480  # codewords per SNR point
N_ITER = 12  # flooding budget (layered-equivalent BLER)
GOLDEN = REPO / "tests" / "golden"


def gen_alt_tables(seed: int) -> dict:
    """Full drop-in table dict with extension rows re-optimized from a random
    start for EVERY lifting set (the hook validates all 8 shift columns)."""
    from isac_tpu.ops import ldpc_tables as T
    from tools.gen_ldpc_shifts import _protograph, optimize

    data = {}
    for bg in (1, 2):
        ent = [[r, c, list(s)] for r, c, s in T.build_entries(bg)]
        cols_table, kc = _protograph(bg)
        for ils in range(8):
            ext = optimize(bg, ils, seed=seed, rand_init=True)
            # overwrite the ils-th shift of every extension-row entry
            i = 0
            for r, cset in enumerate(cols_table):
                for j, c in enumerate(cset):
                    if r >= 4:
                        data_row = ent[i]
                        data_row[2][ils] = int(ext[r - 4][j])
                    i += 1
        data[f"bg{bg}"] = ent
    return data


def bler_curve_subprocess(tables_path: str | None, cfg: dict) -> dict:
    """Run the sweep worker in its own process (clean lru caches + env)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["ISAC_SWEEP_BG"] = str(cfg["bg"])
    env["ISAC_SWEEP_Z"] = str(cfg["z"])
    env["ISAC_SWEEP_TXFRAC"] = str(cfg.get("txfrac", 1.0))
    env["ISAC_SWEEP_SNRS"] = json.dumps(cfg["snrs"])
    if tables_path:
        env["ISAC_TPU_LDPC_TABLES"] = tables_path
    else:
        env.pop("ISAC_TPU_LDPC_TABLES", None)
    p = subprocess.run(
        [sys.executable, __file__, "--worker"],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if p.returncode != 0:
        raise RuntimeError(p.stderr[-2000:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def worker():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from isac_tpu.ops import ldpc

    bg = int(os.environ.get("ISAC_SWEEP_BG", BG))
    z = int(os.environ.get("ISAC_SWEEP_Z", Z))
    txfrac = float(os.environ.get("ISAC_SWEEP_TXFRAC", 1.0))
    snrs = json.loads(os.environ.get("ISAC_SWEEP_SNRS", json.dumps(SNRS_DB)))
    code = ldpc.lifted_code(bg, z)
    rng = np.random.default_rng(12345)  # same noise/messages for every lifting
    msg = rng.integers(0, 2, (N_CW, code.k)).astype(np.int8)
    cw = np.asarray(ldpc.encode(code, jnp.asarray(msg))).astype(np.float32)
    # golden encode fixture: committed message digest + codeword digest
    enc_crc = zlib.crc32(np.packbits(cw[:8].astype(np.uint8)).tobytes())
    bpsk = 1.0 - 2.0 * cw  # [N_CW, n_full]
    noise = rng.standard_normal(bpsk.shape).astype(np.float32)
    n_tx = int(round(code.n_full * txfrac))
    blers = {}
    for snr_db in snrs:
        sigma = float(10 ** (-snr_db / 20.0))  # real BPSK: SNR = 1/sigma^2
        y = bpsk + sigma * noise
        llr = (2.0 * y / (sigma * sigma)).astype(np.float32)
        llr[:, : 2 * z] = 0.0  # punctured systematic columns (38.212)
        if n_tx < code.n_full:
            # higher-rate operating point: tail never transmitted (§5.4.2.1
            # circular-buffer start at rv0 — the first n_tx coded bits)
            llr[:, n_tx:] = 0.0
        hard, ok = ldpc.decode(jnp.asarray(llr), bg, z, n_iter=N_ITER)
        bit_ok = np.all(np.asarray(hard) == msg, axis=-1)
        blers[str(snr_db)] = float(1.0 - np.mean(bit_ok & np.asarray(ok)))
    print(json.dumps({"bler": blers, "encode_crc32": enc_crc,
                      "k": code.k, "n": code.n_full, "n_tx": n_tx}))


def crossing(snrs, blers, target=0.1):
    """Log-linear interpolated SNR where BLER crosses `target`."""
    for i in range(len(snrs) - 1):
        b0, b1 = blers[i], blers[i + 1]
        if b0 >= target >= b1 and b1 > 0:
            import math

            f = (math.log(target) - math.log(b0)) / (math.log(b1) - math.log(b0))
            return snrs[i] + f * (snrs[i + 1] - snrs[i])
    return None


# (suffix, config): the r3/r4 single point (BG1 Z=64 rate-1/3) plus the r4
# VERDICT #10 extensions — BG2 and a second (punctured, rate-2/3) operating
# point of BG1, certifying the substitution bound beyond one code point.
CONFIGS = [
    ("", dict(bg=1, z=64, txfrac=1.0, snrs=SNRS_DB)),
    ("_bg2", dict(bg=2, z=64, txfrac=1.0,
                  snrs=[-3.2, -3.0, -2.8, -2.6, -2.4, -2.2, -2.0])),
    ("_r23", dict(bg=1, z=64, txfrac=0.5,  # 33z tx -> ~rate 2/3 punctured
                  snrs=[3.6, 3.8, 4.0, 4.2, 4.4, 4.6, 4.8])),
]


def main():
    if "--worker" in sys.argv:
        worker()
        return
    GOLDEN.mkdir(exist_ok=True)
    runs = {"committed": None}
    for a in range(N_ALT):
        path = GOLDEN / f"ldpc_lifting_alt{a + 1}.json"
        if not path.exists():
            print(f"generating alternate lifting {a + 1}...", flush=True)
            path.write_text(json.dumps(gen_alt_tables(seed=1000 + a)))
        runs[f"alt{a + 1}"] = str(path)
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    for suffix, cfg in CONFIGS:
        if only and (suffix or "base") not in only:
            continue
        out = {"bg": cfg["bg"], "z": cfg["z"], "n_cw": N_CW, "n_iter": N_ITER,
               "txfrac": cfg.get("txfrac", 1.0), "snrs_db": cfg["snrs"],
               "liftings": {}}
        for name, path in runs.items():
            print(f"sweeping{suffix or ''} {name}...", flush=True)
            r = bler_curve_subprocess(path, cfg)
            blers = [r["bler"][str(s)] for s in cfg["snrs"]]
            out["liftings"][name] = {
                "bler": blers,
                "encode_crc32": r["encode_crc32"],
                "snr_at_bler_0p1": crossing(cfg["snrs"], blers),
            }
            print(f"  {name}: BLER {blers} crossing "
                  f"{out['liftings'][name]['snr_at_bler_0p1']}", flush=True)
        xs = [v["snr_at_bler_0p1"] for v in out["liftings"].values()
              if v["snr_at_bler_0p1"] is not None]
        out["crossing_spread_db"] = (max(xs) - min(xs)) if len(xs) >= 2 else None
        (GOLDEN / f"ldpc_lifting_sweep{suffix}.json").write_text(
            json.dumps(out, indent=1))
        print(f"spread{suffix} @ BLER 0.1: {out['crossing_spread_db']} dB "
              f"({len(xs)} liftings)")


if __name__ == "__main__":
    main()
