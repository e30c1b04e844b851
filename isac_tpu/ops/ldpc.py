"""QC-LDPC encode/decode per TS 38.212 §5.3.2 — TPU-native formulation.

The reference delegates to MATLAB nrDLSCH/nrULSCHDecoder (normalized min-sum,
6 iterations, RV sequence [0 3 2 1]; gNBPhy.m:239-253, uePhy.m:221-231 — see
SURVEY §2.9). Here the full machinery is explicit:

- 38.212 lifting-size table Z = a*2^j (Table 5.3.2-1) with the 8 shift sets
  indexed by a; base-graph selection and Kb rules (§5.2.2/§5.3.2);
- double-diagonal core encoding (p1 from the row-sum trick, p2..p4 by
  back-substitution, extension parities direct);
- flooding normalized min-sum decoding formulated as dense batched tensor ops:
  cyclic Z-shifts are precomputed gathers, per-check min/sign use a padded
  [rows, max_degree, Z] layout, per-variable aggregation is a one-hot
  [cols, edges] matmul that maps onto the MXU. No per-edge loops.

NOTE ON TABLES: the base graphs are loaded from `ldpc_tables.py`, which
carries the TS 38.212 Table 5.3.2-2/3 PROTOGRAPH (exact 316/197-edge
(row, col) support, double-diagonal parity core, identity extension, the
BG1 iLS=6 anomaly) plus dense-core shift values; see that module's
PROVENANCE note for exactly which shift values are transcription vs
placeholder. The encoder derives the p1-recovery shift from the loaded
table per lifting set (single-odd-survivor row-sum trick), so it is
correct for any table satisfying `ldpc_tables.validate_tables()`. Every
surrounding algorithm (segmentation, rate matching, RV starts,
interleaver, CRC, HARQ combining) follows 38.212 exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# ----------------------------------------------------------------- lifting sizes

# TS 38.212 Table 5.3.2-1: Z = a * 2^j, set index iLS by a
_LIFT_SETS = {2: 0, 3: 1, 5: 2, 7: 3, 9: 4, 11: 5, 13: 6, 15: 7}
LIFTING_SIZES = sorted(
    {a * (1 << j) for a in _LIFT_SETS for j in range(8) if a * (1 << j) <= 384}
)


def lifting_set_index(z: int) -> int:
    a = z
    while a % 2 == 0 and a not in _LIFT_SETS:  # powers of two resolve to a=2
        a //= 2
    return _LIFT_SETS[a]


def select_base_graph(a_bits: int, rate: float) -> int:
    """§7.2.2: BG2 if A<=292, or (A<=3824 and R<=0.67), or R<=0.25; else BG1."""
    if a_bits <= 292 or (a_bits <= 3824 and rate <= 0.67) or rate <= 0.25:
        return 2
    return 1


def kb_for(bg: int, b_bits: int) -> int:
    """§5.2.2: Kb = 22 (BG1); BG2: 10/9/8/6 by payload size."""
    if bg == 1:
        return 22
    if b_bits > 640:
        return 10
    if b_bits > 560:
        return 9
    if b_bits > 192:
        return 8
    return 6


def select_lifting_size(kb: int, k_prime: int) -> int:
    """Smallest Z in the table with Kb*Z >= K'."""
    for z in LIFTING_SIZES:
        if kb * z >= k_prime:
            return z
    raise ValueError(f"K'={k_prime} too large for Kb={kb}")


# ----------------------------------------------------------------- base graphs


@dataclass(frozen=True, eq=False)
class BaseGraph:
    """Prototype matrix: entries (row, col, shifts[8]) with shifts per lifting set."""

    bg: int
    n_rows: int
    n_cols: int
    k_cols: int  # systematic columns (22 or 10)
    entries: tuple  # ((row, col, (s0..s7)), ...)

    @property
    def n_core_rows(self) -> int:
        return 4

    def shift(self, row: int, col: int, ils: int):
        for r, c, s in self.entries:
            if r == row and c == col:
                return s[ils]
        return None


@lru_cache(maxsize=2)
def base_graph(bg: int) -> BaseGraph:
    """Load the TS 38.212 base graph from `ldpc_tables` (see its PROVENANCE)."""
    from isac_tpu.ops import ldpc_tables

    if bg == 1:
        n_rows, n_cols, k_cols = 46, 68, 22
    else:
        n_rows, n_cols, k_cols = 42, 52, 10
    ent = ldpc_tables.build_entries(bg)
    return BaseGraph(bg=bg, n_rows=n_rows, n_cols=n_cols, k_cols=k_cols, entries=ent)


# ----------------------------------------------------------------- lifted code


@dataclass(frozen=True, eq=False)
class LiftedCode:
    """Base graph expanded at lifting size Z (shift = V mod Z)."""

    bg: int
    z: int
    k: int  # 22Z / 10Z
    n_full: int  # 68Z / 52Z (incl. punctured 2Z)
    rows: np.ndarray  # [E] check-block row per edge
    cols: np.ndarray  # [E] variable-block col per edge
    shifts: np.ndarray  # [E] cyclic shift
    n_rows: int
    n_cols: int
    k_cols: int


@lru_cache(maxsize=32)
def lifted_code(bg: int, z: int) -> LiftedCode:
    g = base_graph(bg)
    ils = lifting_set_index(z)
    rows, cols, shifts = [], [], []
    for r, c, s in g.entries:
        rows.append(r)
        cols.append(c)
        shifts.append(s[ils] % z)
    return LiftedCode(
        bg=bg,
        z=z,
        k=g.k_cols * z,
        n_full=g.n_cols * z,
        rows=np.asarray(rows, np.int32),
        cols=np.asarray(cols, np.int32),
        shifts=np.asarray(shifts, np.int32),
        n_rows=g.n_rows,
        n_cols=g.n_cols,
        k_cols=g.k_cols,
    )


def _gather_shift(x: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """x [..., E, Z], idx [E, Z] -> x[..., e, idx[e, i]]."""
    e = np.arange(idx.shape[0])[:, None]
    return x[..., jnp.asarray(e), jnp.asarray(idx)]


def _use_static_rolls() -> bool:
    """TPU: unrolled static per-edge rolls (gathers lower poorly — r4
    profile: 5x chain speedup). CPU: the compact gather formulation — the
    ~300-op unrolled graphs made XLA:CPU compiles (and the test suite)
    minutes-slow for zero runtime benefit there. Both produce identical
    bits."""
    dd = jax.config.jax_default_device
    plat = dd.platform if dd is not None else jax.default_backend()
    return plat == "tpu"


def _shift_idx(shifts: np.ndarray, z: int, inverse: bool = False) -> np.ndarray:
    i = np.arange(z)[None, :]
    s = shifts[:, None]
    return ((i - s) % z if inverse else (i + s) % z).astype(np.int32)


@lru_cache(maxsize=32)
def _encode_plan(bg: int, z: int):
    """Precomputed gathers for the batched encoder: systematic edges as one
    gather + one-hot XOR-sum per row, core-parity taps in extension rows as a
    second small gather. Also derives the parity-core recovery recipe from
    the loaded table: `core_par[r][j]` = shift (mod Z) of parity column
    kc+j in core row r (or None), and `p1_survivor` = the single
    odd-multiplicity shift of the p1 column across core rows (the row-sum
    trick works for any 38.212-family core, incl. the BG1 iLS=6 105)."""
    code = lifted_code(bg, z)
    kc = code.k_cols
    sys = np.nonzero(code.cols < kc)[0]
    sys_idx = _shift_idx(code.shifts[sys], z)  # [Es, Z] gather (i+s)%z
    sys_cols = code.cols[sys]
    sys_row_oneh = np.zeros((code.n_rows, sys.shape[0]), np.float32)
    sys_row_oneh[code.rows[sys], np.arange(sys.shape[0])] = 1.0
    # core-parity taps (cols kc..kc+3) inside extension rows r >= 4
    tap = np.nonzero((code.cols >= kc) & (code.cols < kc + 4) & (code.rows >= 4))[0]
    tap_idx = _shift_idx(code.shifts[tap], z)
    tap_cols = code.cols[tap] - kc
    tap_row_oneh = np.zeros((code.n_rows - 4, max(tap.shape[0], 1)), np.float32)
    if tap.shape[0]:
        tap_row_oneh[code.rows[tap] - 4, np.arange(tap.shape[0])] = 1.0
    # parity-core recipe (static python ints -> trace-time constants)
    core_par = [[None] * 4 for _ in range(4)]
    core = np.nonzero((code.cols >= kc) & (code.cols < kc + 4) & (code.rows < 4))[0]
    for e in core:
        core_par[int(code.rows[e])][int(code.cols[e]) - kc] = int(code.shifts[e])
    from collections import Counter

    p1_shifts = [core_par[r][0] for r in range(4) if core_par[r][0] is not None]
    odd = [s for s, n in Counter(p1_shifts).items() if n % 2 == 1]
    if len(odd) != 1:
        raise ValueError(f"non-encodable parity core bg={bg} z={z}: {p1_shifts}")
    return (code, sys_idx, sys_cols, sys_row_oneh, tap_idx, tap_cols,
            tap_row_oneh, tuple(map(tuple, core_par)), odd[0])


@partial(jax.jit, static_argnames=("bg", "z"))
def _encode_jit(msg: jnp.ndarray, bg: int, z: int) -> jnp.ndarray:
    (code, sys_idx, sys_cols, sys_oneh, tap_idx, tap_cols, tap_oneh,
     core_par, p1_surv) = _encode_plan(bg, z)
    kc = code.k_cols
    m = msg.reshape(*msg.shape[:-1], kc, z).astype(jnp.float32)

    def pshift(v, s):  # (P^s v)[i] = v[(i+s) mod Z]
        return jnp.roll(v, -s, axis=-1)

    # systematic contributions: STATIC per-edge rolls on TPU (the [Es, Z]
    # shift gather + one-hot einsum was the encoder's dominant cost there,
    # r4 profile), compact gather+einsum on CPU (fast compile). float32
    # sums stay exact (row degrees are small).
    zero = jnp.zeros((*m.shape[:-2], z), jnp.float32)
    if _use_static_rolls():
        sys_edges = [
            (int(code.rows[e]), int(code.cols[e]), int(code.shifts[e]))
            for e in np.nonzero(code.cols < kc)[0]
        ]
        lam_rows: list = [None] * code.n_rows
        for r, c, s in sys_edges:
            t = pshift(m[..., c, :], s)
            lam_rows[r] = t if lam_rows[r] is None else lam_rows[r] + t
        lam = jnp.mod(
            jnp.stack([v if v is not None else zero for v in lam_rows],
                      axis=-2),
            2.0,
        )  # [..., n_rows, Z]
    else:
        m_e = _gather_shift(m[..., jnp.asarray(sys_cols), :], sys_idx)
        lam = jnp.mod(
            jnp.einsum("re,...ez->...rz", jnp.asarray(sys_oneh), m_e,
                       preferred_element_type=jnp.float32),
            2.0,
        )
    # p1 by the row-sum trick: equal-shift p1 terms cancel mod 2 leaving the
    # single survivor P^{p1_surv}; bidiagonal terms cancel pairwise.
    s_all = jnp.mod(lam[..., 0, :] + lam[..., 1, :] + lam[..., 2, :] + lam[..., 3, :], 2.0)
    p1 = pshift(s_all, -p1_surv)
    # rows 0..2 determine p2..p4 by back-substitution (row 3 is then
    # automatically satisfied — it was consumed by the row sum)
    p = [p1, None, None, None]
    for j in range(3):
        acc = lam[..., j, :]
        if core_par[j][0] is not None:
            acc = acc + pshift(p1, core_par[j][0])
        for i in range(1, j + 1):  # previously computed parities in row j
            if core_par[j][i] is not None:
                acc = acc + p[i]
        p[j + 1] = jnp.mod(acc, 2.0)
    p_core = jnp.stack(p, axis=-2)  # [..., 4, Z]
    # extension parities: systematic row-sums XOR core-parity taps (same
    # backend split as the systematic edges)
    if _use_static_rolls():
        tap_edges = [
            (int(code.rows[e]) - 4, int(code.cols[e]) - kc, int(code.shifts[e]))
            for e in np.nonzero(
                (code.cols >= kc) & (code.cols < kc + 4) & (code.rows >= 4))[0]
        ]
        tap_rows: list = [None] * (code.n_rows - 4)
        for r, c, s in tap_edges:
            t = pshift(p[c], s)
            tap_rows[r] = t if tap_rows[r] is None else tap_rows[r] + t
        taps = jnp.stack([v if v is not None else zero for v in tap_rows],
                         axis=-2)
    elif tap_cols.shape[0]:
        t_e = _gather_shift(p_core[..., jnp.asarray(tap_cols), :], tap_idx)
        taps = jnp.einsum("re,...ez->...rz", jnp.asarray(tap_oneh), t_e,
                          preferred_element_type=jnp.float32)
    else:
        taps = 0.0
    p_ext = jnp.mod(lam[..., 4:, :] + taps, 2.0)
    out = jnp.concatenate(
        [m.reshape(*msg.shape[:-1], -1),
         p_core.reshape(*msg.shape[:-1], -1),
         p_ext.reshape(*msg.shape[:-1], -1)],
        axis=-1,
    )
    return out.astype(jnp.int8)


def encode(code: LiftedCode, msg: jnp.ndarray) -> jnp.ndarray:
    """Systematic QC-LDPC encode. msg [..., K] int -> codeword [..., n_full].

    Core parities by the row-sum trick (only core-parity shift is P^1 at
    (0, k_cols)); extension parities direct. One gather + one-hot XOR matmul
    over all edges (the per-edge roll loop was 1/3 of r1's engine runtime)."""
    return _encode_jit(msg, code.bg, code.z)


@lru_cache(maxsize=32)
def _decode_plan(bg: int, z: int):
    """Precomputed gathers for the flooding min-sum decoder."""
    code = lifted_code(bg, z)
    e_count = code.rows.shape[0]
    # group edges by row, padded to max degree
    dmax = int(np.max(np.bincount(code.rows)))
    row_edges = np.full((code.n_rows, dmax), -1, np.int32)
    fill = np.zeros(code.n_rows, np.int32)
    for e in range(e_count):
        r = code.rows[e]
        row_edges[r, fill[r]] = e
        fill[r] += 1
    row_pad = row_edges < 0
    row_edges = np.maximum(row_edges, 0)
    # position of edge within its row group (for scatter-back)
    edge_slot = np.zeros(e_count, np.int32)
    for r in range(code.n_rows):
        for d in range(dmax):
            if not row_pad[r, d]:
                edge_slot[row_edges[r, d]] = d
    # one-hot col aggregation matrix [n_cols, E]
    col_onehot = np.zeros((code.n_cols, e_count), np.float32)
    col_onehot[code.cols, np.arange(e_count)] = 1.0
    fwd_idx = _shift_idx(code.shifts, z, inverse=False)
    inv_idx = _shift_idx(code.shifts, z, inverse=True)
    return code, row_edges, row_pad, edge_slot, col_onehot, fwd_idx, inv_idx, dmax


@partial(jax.jit, static_argnames=("bg", "z", "n_iter", "norm", "early_exit"))
def decode(
    llr: jnp.ndarray,
    bg: int,
    z: int,
    n_iter: int = 6,
    norm: float = 0.75,
    early_exit: bool = False,
):
    """Flooding normalized min-sum. llr [..., n_full] (positive = bit 0)
    -> (hard bits [..., K] int8, parity_ok [...] bool).

    early_exit (opt-in; default False keeps the base primitive deterministic
    per-codeword — a codeword's iteration count and posterior never depend
    on its batch-mates): stop as soon as EVERY codeword in the batch
    satisfies all parity checks (a lax.while_loop bounded by n_iter; the
    per-iteration syndrome check costs ~25% of an iteration). At high SNR
    this converges in 3-5 iterations, so sch_decode's quality-matched
    2x-iteration budget opts in and costs nothing where blocks decode
    cleanly; a failing codeword still runs the full budget (and keeps every
    batch lane running with it — flooding work is batched, not per-lane)."""
    code, row_edges, row_pad, edge_slot, col_onehot, fwd_idx, inv_idx, dmax = _decode_plan(bg, z)
    e_count = code.rows.shape[0]
    batch = llr.shape[:-1]
    lv = llr.reshape(*batch, code.n_cols, z).astype(jnp.float32)
    cols_j = jnp.asarray(code.cols)
    re_j = jnp.asarray(row_edges)
    pad_j = jnp.asarray(~row_pad, jnp.float32)  # 1 where real edge
    slot_j = jnp.asarray(edge_slot)
    oneh = jnp.asarray(col_onehot)

    c2v0 = jnp.zeros((*batch, e_count, z), jnp.float32)

    def body(carry, _):
        c2v, total = carry
        # variable -> check (in shifted/check domain)
        v2c = _gather_shift(total[..., cols_j, :], fwd_idx) - c2v
        # check node: min-sum with self-exclusion via min1/min2
        grp = v2c[..., re_j, :]  # [..., R, D, Z]
        mag = jnp.abs(grp)
        # sign(0) must be +1 (punctured zero-LLRs would zero the products)
        sgn = jnp.where(grp >= 0, 1.0, -1.0) * pad_j[..., None] + (1.0 - pad_j[..., None])
        mag = jnp.where(pad_j[..., None] > 0, mag, jnp.inf)
        m1 = jnp.min(mag, axis=-2, keepdims=True)
        arg = jnp.argmin(mag, axis=-2, keepdims=True)
        mag2 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, mag.shape, mag.ndim - 2) == arg, jnp.inf, mag
        )
        m2 = jnp.min(mag2, axis=-2, keepdims=True)
        sprod = jnp.prod(sgn, axis=-2, keepdims=True)
        d_iota = jax.lax.broadcasted_iota(jnp.int32, mag.shape, mag.ndim - 2)
        out_mag = jnp.where(d_iota == arg, m2, m1)
        out = norm * sprod * sgn * out_mag  # exclude own sign/mag
        out = jnp.where(pad_j[..., None] > 0, out, 0.0)
        # scatter back per edge: edge e lives at (row[e], slot[e])
        new_c2v = out[..., jnp.asarray(code.rows), slot_j, :]
        # check -> variable (unshift) and aggregate per column via one-hot matmul
        c2v_var = _gather_shift(new_c2v, inv_idx)
        agg = jnp.einsum(
            "ce,...ez->...cz", oneh, c2v_var, preferred_element_type=jnp.float32
        )
        new_total = lv + agg
        return (new_c2v, new_total), None

    if early_exit:
        row_oneh = np.zeros((code.n_rows, e_count), np.float32)
        row_oneh[code.rows, np.arange(e_count)] = 1.0
        row_oneh_j = jnp.asarray(row_oneh)

        def all_ok(total):
            bits = (total < 0).astype(jnp.float32)
            bits_e = _gather_shift(bits[..., cols_j, :], fwd_idx)
            syn = jnp.einsum("re,...ez->...rz", row_oneh_j, bits_e,
                             preferred_element_type=jnp.float32)
            return jnp.all(jnp.mod(jnp.round(syn), 2.0) == 0)

        def w_cond(carry):
            _, total, it, ok = carry
            return (it < n_iter) & ~ok

        def w_body(carry):
            c2v, total, it, _ = carry
            (c2v, total), _ = body((c2v, total), None)
            return (c2v, total, it + 1, all_ok(total))

        _, total, _, _ = jax.lax.while_loop(
            w_cond, w_body, (c2v0, lv, jnp.int32(0), jnp.bool_(False))
        )
    else:
        (c2v, total), _ = jax.lax.scan(body, (c2v0, lv), None, length=n_iter)
    hard_full = (total < 0).astype(jnp.int8).reshape(*batch, code.n_cols * z)
    hard = hard_full[..., : code.k]
    return hard, parity_check(hard_full, bg, z)


@partial(jax.jit, static_argnames=("bg", "z"))
def parity_check(hard_full: jnp.ndarray, bg: int, z: int) -> jnp.ndarray:
    """Hard bits [..., n_cols*z] -> all-check-equations-satisfied bool [...].

    Syndrome accumulated with STATIC per-edge cyclic rolls on TPU
    (slice+concat; the [E, Z] shift gather was most of sch_decode's
    non-kernel time at 273-PRB scale — r4 profile); compact gather + one-hot
    einsum on CPU, where the ~300-op unrolled graph only slows compiles."""
    code = lifted_code(bg, z)
    batch = hard_full.shape[:-1]
    b = hard_full.reshape(*batch, code.n_cols, z).astype(jnp.float32)
    if _use_static_rolls():
        syn: list = [None] * code.n_rows
        for e in range(code.rows.shape[0]):
            r, c, s = int(code.rows[e]), int(code.cols[e]), int(code.shifts[e])
            t = jnp.roll(b[..., c, :], -s, axis=-1)
            syn[r] = t if syn[r] is None else syn[r] + t
        sy = jnp.stack(syn, axis=-2)
        return jnp.all(jnp.mod(jnp.round(sy), 2.0) == 0, axis=(-2, -1))
    _, _, _, _, _, fwd_idx, _, _ = _decode_plan(bg, z)
    e_count = code.rows.shape[0]
    bits_e = _gather_shift(b[..., jnp.asarray(code.cols), :], fwd_idx)
    row_oneh = np.zeros((code.n_rows, e_count), np.float32)
    row_oneh[code.rows, np.arange(e_count)] = 1.0
    sy = jnp.einsum("re,...ez->...rz", jnp.asarray(row_oneh), bits_e)
    return jnp.all(jnp.mod(jnp.round(sy), 2.0) == 0, axis=(-2, -1))


# ----------------------------------------------------------------- rate matching


def rv_start(bg: int, rv: int, n_cb: int, z: int) -> int:
    """§5.4.2.1 Table 5.4.2.1-2: k0 for RV 0..3."""
    if bg == 1:
        num = {0: 0, 1: 17, 2: 33, 3: 56}[rv]
        return (num * n_cb // (66 * z)) * z
    num = {0: 0, 1: 13, 2: 25, 3: 43}[rv]
    return (num * n_cb // (50 * z)) * z


def rate_match_indices(
    bg: int, z: int, e_bits: int, rv: int, n_filler: int, k: int, n_cb: int | None = None
) -> np.ndarray:
    """Circular-buffer bit-selection indices (§5.4.2.1), skipping filler bits.

    Returns positions into the PUNCTURED codeword (length 66Z/50Z, i.e. the
    full codeword minus its first 2Z bits)."""
    code_n = (66 if bg == 1 else 50) * z
    if n_cb is None:
        n_cb = code_n
    k0 = rv_start(bg, rv, n_cb, z)
    # fillers are the LAST n_filler systematic bits (codeword [K-F, K)); the
    # buffer view is the codeword minus its first 2Z bits
    f_start, f_end = k - n_filler - 2 * z, k - 2 * z
    out = np.empty(e_bits, np.int64)
    j, kk = 0, 0
    idx = np.arange(n_cb)
    circ = (k0 + idx) % n_cb
    keep = ~((circ >= f_start) & (circ < f_end))
    sel = circ[keep]
    reps = int(np.ceil(e_bits / sel.shape[0]))
    out = np.tile(sel, reps)[:e_bits]
    return out


def interleave_indices(e_bits: int, qm: int) -> np.ndarray:
    """§5.4.2.2 bit interleaver: f = e.reshape(Qm, E/Qm).T.ravel(). Returns perm
    such that f = e[perm]."""
    return np.arange(e_bits).reshape(qm, e_bits // qm).T.ravel()


@lru_cache(maxsize=512)
def rate_match_indices_all_rv(bg: int, z: int, e_bits: int, n_filler: int, k: int):
    """[4, E] bit-selection indices for every RV — lets the RV be a TRACED
    index so retransmissions reuse the RV-0 compiled program."""
    return np.stack(
        [rate_match_indices(bg, z, e_bits, rv, n_filler, k) for rv in range(4)]
    )


@lru_cache(maxsize=256)
def _rv_k0_virtual(bg: int, z: int, n_filler: int, k: int) -> np.ndarray:
    """Per-RV circular-buffer start in VIRTUAL (filler-removed) coordinates.

    §5.4.2.1's bit selection walks the buffer circularly skipping fillers —
    i.e. it is a plain circular walk over the n_cb - F non-filler positions,
    starting at k0 minus the fillers below it (a k0 inside the filler block
    maps to the first position after it)."""
    code_n = (66 if bg == 1 else 50) * z
    f_start = k - n_filler - 2 * z
    out = []
    for rv in range(4):
        k0 = rv_start(bg, rv, code_n, z)
        out.append(k0 - min(max(k0 - f_start, 0), n_filler))
    return np.asarray(out, np.int32)


def rate_match(codeword: jnp.ndarray, bg: int, z: int, e_bits: int, rv,
               n_filler: int, k: int, qm: int) -> jnp.ndarray:
    """Full codeword [..., n_full] -> transmitted bits [..., E]. rv may be a
    traced int32 scalar.

    r4 TPU formulation: the circular-buffer selection is a roll + tile +
    slice and the §5.4.2.2 interleaver is a [Qm, E/Qm] transpose — no
    gathers (the [4, E]-table gather was a multi-ms op at 273-PRB scale)."""
    lead = codeword.shape[:-1]
    buf = codeword[..., 2 * z :]  # puncture first 2Z systematic bits
    f_start, f_end = k - n_filler - 2 * z, k - 2 * z
    if n_filler > 0:
        vbuf = jnp.concatenate([buf[..., :f_start], buf[..., f_end:]], axis=-1)
    else:
        vbuf = buf
    n_v = vbuf.shape[-1]
    k0vs = _rv_k0_virtual(bg, z, n_filler, k)
    # static roll per RV under a 4-way switch: each branch is a slice+concat
    # (a traced-shift roll lowers to dynamic slices; the switch keeps the
    # common rv=0 case a no-op while rv stays traced for HARQ program reuse)
    r = jax.lax.switch(
        jnp.asarray(rv, jnp.int32),
        [partial(jnp.roll, shift=-int(k0), axis=-1) for k0 in k0vs],
        vbuf,
    )
    reps = int(np.ceil(e_bits / n_v))
    e = jnp.concatenate([r] * reps, axis=-1)[..., :e_bits] if reps > 1 else r[..., :e_bits]
    return e.reshape(*lead, qm, e_bits // qm).swapaxes(-1, -2).reshape(*lead, e_bits)


def rate_recover(
    llr_e: jnp.ndarray, bg: int, z: int, rv, n_filler: int, k: int, qm: int,
    soft_buffer: jnp.ndarray | None = None, filler_llr: float = 1e4,
) -> jnp.ndarray:
    """Received LLRs [..., E] -> full-codeword LLRs [..., n_full], combining
    into soft_buffer (HARQ) when provided. Punctured bits get LLR 0, fillers
    a large bit-0 LLR. rv may be a traced int32 scalar.

    Same roll/reshape formulation as rate_match: de-interleave is the
    inverse transpose, the circular scatter-ADD is a fold-sum over n_v
    chunks + one roll, and fillers are a masked overwrite — no scatters."""
    e_bits = llr_e.shape[-1]
    lead = llr_e.shape[:-1]
    deint = (llr_e.reshape(*lead, e_bits // qm, qm)
             .swapaxes(-1, -2).reshape(*lead, e_bits))
    code_n = (66 if bg == 1 else 50) * z
    n_v = code_n - n_filler
    pad = (-e_bits) % n_v
    if pad:
        deint = jnp.concatenate(
            [deint, jnp.zeros((*lead, pad), deint.dtype)], axis=-1
        )
    folded = deint.reshape(*lead, -1, n_v).sum(axis=-2)
    k0vs = _rv_k0_virtual(bg, z, n_filler, k)
    vbuf = jax.lax.switch(
        jnp.asarray(rv, jnp.int32),
        [partial(jnp.roll, shift=int(k0), axis=-1) for k0 in k0vs],
        folded,
    )
    f_start, f_end = k - n_filler - 2 * z, k - 2 * z
    if n_filler > 0:
        buf = jnp.concatenate(
            [vbuf[..., :f_start],
             jnp.zeros((*lead, n_filler), vbuf.dtype),
             vbuf[..., f_start:]],
            axis=-1,
        )
    else:
        buf = vbuf
    if soft_buffer is not None:
        buf = buf + soft_buffer
    if n_filler > 0:
        mask = np.zeros(code_n, np.float32)
        mask[f_start:f_end] = 1.0
        buf = buf * (1.0 - mask) + mask * filler_llr
    punct = jnp.zeros((*lead, 2 * z), llr_e.dtype)
    return jnp.concatenate([punct, buf], axis=-1), buf
