"""Generate girth-optimized lifting shifts for the NR LDPC protograph.

Context (see isac_tpu/ops/ldpc_tables.py PROVENANCE): the (row, col) support
of both TS 38.212 base graphs and the dense-core shift rows are transcribed
from the standard, but this offline build environment carries no copy of the
~3,200 extension-row shift constants of Tables 5.3.2-2/3. Rather than ship
hash-random placeholders, this script OPTIMIZES the free shift values so the
lifted Tanner graph has no short cycles — the property the 3GPP values were
themselves selected for (PEG-style girth conditioning).

For a QC-LDPC code, a length-2L cycle through blocks
(r1,c1)-(r1,c2)-(r2,c2)-...-(rL,c1) exists at lifting size Z iff the
alternating shift sum is 0 mod Z:

    sum_i  s[r_i, c_i] - s[r_i, c_{i+1}]  ==  0   (mod Z)

Every cycle constraint is linear with +-1 coefficients in each participating
shift, so coordinate descent is exact per variable: for a candidate value x
of one shift, the cycle is violated iff x falls in one residue class mod Z.
We minimize a weighted count over ALL lifting sizes of the set
(w_Z proportional to Z: large Z carries the big transport blocks) for
4-cycles, then run a 6-cycle reduction pass at the largest lifting sizes.

Output: writes isac_tpu/ops/_ldpc_ext_shifts.py with the optimized tables
plus a summary of the cycle census before/after. Runtime: a couple of
minutes of pure NumPy on CPU. NOTE on reproducibility: optimize() seeds
from T.build_entries(bg), which loads the COMMITTED _ldpc_ext_shifts.py —
i.e. re-running is idempotent-from-committed-state (sweeps converge in
place), not a from-scratch reproduction of the committed file; the original
placeholder starting point was deleted once the optimized tables landed.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from isac_tpu.ops import ldpc_tables as T

A_FOR_SET = (2, 3, 5, 7, 9, 11, 13, 15)
W4 = 1000.0  # a 4-cycle is catastrophically worse than a 6-cycle
W6 = 1.0


def _protograph(bg: int):
    cols_table = T.BG1_COLS if bg == 1 else T.BG2_COLS
    kc = 22 if bg == 1 else 10
    return cols_table, kc


def _entry_index(cols_table):
    """Map (row, col) -> flat entry id, plus the reverse lists."""
    pos = {}
    rows, cols = [], []
    for r, cset in enumerate(cols_table):
        for c in cset:
            pos[(r, c)] = len(rows)
            rows.append(r)
            cols.append(c)
    return pos, np.asarray(rows), np.asarray(cols)


def _enumerate_4cycles(cols_table, pos):
    """All (e1,e2,e3,e4) entry-id quadruples with signs (+,-,+,-):
    delta = s[r1,c1] - s[r1,c2] + s[r2,c2] - s[r2,c1]."""
    n_rows = len(cols_table)
    sets = [set(c) for c in cols_table]
    quads = []
    for r1 in range(n_rows):
        for r2 in range(r1 + 1, n_rows):
            common = sorted(sets[r1] & sets[r2])
            for i in range(len(common)):
                for j in range(i + 1, len(common)):
                    c1, c2 = common[i], common[j]
                    quads.append(
                        (pos[(r1, c1)], pos[(r1, c2)], pos[(r2, c2)], pos[(r2, c1)])
                    )
    return np.asarray(quads, np.int64).reshape(-1, 4)


def _enumerate_6cycles(cols_table, pos, cap=2_000_000):
    """All 6-cycles: rows r1<r2<r3 wlog with distinct cols c1,c2,c3 such that
    (r1,c1),(r1,c2),(r2,c2),(r2,c3),(r3,c3),(r3,c1) all exist. To avoid
    double counting we fix r1<r2<r3 and enumerate both rotational pairings."""
    n_rows = len(cols_table)
    sets = [set(c) for c in cols_table]
    common = {}
    for r1 in range(n_rows):
        for r2 in range(r1 + 1, n_rows):
            cm = sets[r1] & sets[r2]
            if cm:
                common[(r1, r2)] = sorted(cm)
    six = []
    for (r1, r2), c12 in common.items():
        for r3 in range(r2 + 1, n_rows):
            c23 = common.get((r2, r3))
            c13 = common.get((r1, r3))
            if not c23 or not c13:
                continue
            # orientation A: c2 in (r1,r2), c3 in (r2,r3), c1 in (r3,r1)
            for c2 in c12:
                for c3 in c23:
                    if c3 == c2:
                        continue
                    for c1 in c13:
                        if c1 == c2 or c1 == c3:
                            continue
                        six.append(
                            (pos[(r1, c1)], pos[(r1, c2)], pos[(r2, c2)],
                             pos[(r2, c3)], pos[(r3, c3)], pos[(r3, c1)])
                        )
                        if len(six) >= cap:
                            raise RuntimeError("6-cycle cap hit")
    # each undirected 6-cycle appears exactly once under r1<r2<r3 with this
    # column orientation plus its mirror; enumerate the mirror too:
    # c2' in (r1,r3)... — equivalently swap roles of r2/r3. The mirror of a
    # cycle has the same violation condition (negated sum), so counting one
    # orientation is sufficient for optimization purposes.
    return np.asarray(six, np.int64).reshape(-1, 6)


SIGNS4 = np.asarray([1, -1, 1, -1], np.int64)
SIGNS6 = np.asarray([1, -1, 1, -1, 1, -1], np.int64)


def _census(shifts, cycles, signs, zs):
    """Count violated cycles per lifting size."""
    delta = (shifts[cycles] * signs).sum(axis=1)
    return {z: int(np.count_nonzero(delta % z == 0)) for z in zs}


def optimize(bg: int, ils: int, n_sweeps=8, seed=0, rand_init=False):
    """Girth-optimize the free (extension-row) shifts.

    rand_init=True starts the free shifts from a uniform-random draw instead
    of the committed table — used by tools/ldpc_lifting_sweep.py to produce
    INDEPENDENT girth-optimized liftings of the same protograph, so the
    'shift choice does not move the waterfall' claim can be bounded
    empirically (VERDICT r3 #6) rather than asserted."""
    cols_table, kc = _protograph(bg)
    pos, rows_f, cols_f = _entry_index(cols_table)
    n_e = len(rows_f)
    zmax = T.SET_MAX_Z[ils]
    a = A_FOR_SET[ils]
    zs = [a * (1 << j) for j in range(8) if a * (1 << j) <= 384]

    # current table (fixed core + placeholder ext) as the starting point
    ent = T.build_entries(bg)
    shifts = np.zeros(n_e, np.int64)
    free = np.zeros(n_e, bool)
    for r, c, svals in ent:
        e = pos[(r, c)]
        shifts[e] = svals[ils]
        # free variables: extension rows, excluding the structural identity
        # extension column (shift 0 by construction)
        free[e] = r >= 4 and c != kc + 4 + (r - 4)

    quads = _enumerate_4cycles(cols_table, pos)
    six = _enumerate_6cycles(cols_table, pos)

    rng = np.random.default_rng(seed + bg * 100 + ils)
    if rand_init:
        shifts[free] = rng.integers(0, zmax, int(free.sum()))

    before4 = _census(shifts, quads, SIGNS4, zs)
    before6 = _census(shifts, six, SIGNS6, zs[-2:])

    # per-variable incidence lists
    def incidence(cycles, signs):
        inc = [[] for _ in range(n_e)]
        for ci, cyc in enumerate(cycles):
            for k, e in enumerate(cyc):
                if free[e]:
                    inc[e].append((ci, signs[k]))
        return inc

    inc4 = incidence(quads, SIGNS4)
    inc6 = incidence(six, SIGNS6)

    # weights per Z: 4-cycles weighted by Z (big Z = deployed transport
    # blocks); 6-cycles only at the top two lifting sizes of the set.
    wz4 = {z: W4 * z / zmax for z in zs}
    wz6 = {z: W6 for z in zs[-2:]}

    cand = np.arange(zmax, dtype=np.int64)  # shift values are < Z_max(iLS)

    def var_cost(e, cycles, inc_e, signs_all, wz):
        """Cost vector over candidate values of shifts[e]."""
        cost = np.zeros(zmax)
        if not inc_e:
            return cost
        ci = np.asarray([c for c, _ in inc_e])
        sg = np.asarray([s for _, s in inc_e])
        cyc = cycles[ci]  # [m, L]
        # alternating sum excluding variable e's own term(s). A variable can
        # appear multiple times in one cycle only via distinct entries, and
        # entry ids are unique per cycle here, so exclude exactly one term.
        full = (shifts[cyc] * signs_all).sum(axis=1)
        rest = full - sg * shifts[e]
        for z, w in wz.items():
            # violated iff sg*x + rest == 0 mod z  ->  x == -rest*sg mod z
            bad = (-rest * sg) % z
            counts = np.bincount(bad, minlength=z)
            reps = int(np.ceil(zmax / z))
            cost += w * np.tile(counts, reps)[:zmax]
        return cost

    order = np.nonzero(free)[0]
    for sweep in range(n_sweeps):
        changed = 0
        rng.shuffle(order)
        for e in order:
            cost = var_cost(e, quads, inc4[e], SIGNS4, wz4)
            cost += var_cost(e, six, inc6[e], SIGNS6, wz6)
            best = cand[np.argmin(cost)]
            cur = shifts[e]
            if cost[best] + 1e-9 < cost[cur]:
                shifts[e] = best
                changed += 1
        if changed == 0:
            break

    after4 = _census(shifts, quads, SIGNS4, zs)
    after6 = _census(shifts, six, SIGNS6, zs[-2:])
    print(
        f"bg{bg} iLS{ils} (a={a}, Zmax={zmax}): "
        f"4cyc {before4} -> {after4} | 6cyc@top {before6} -> {after6}",
        flush=True,
    )
    # extract ext-row shifts aligned with cols_table order
    out = []
    for r, cset in enumerate(cols_table):
        if r < 4:
            continue
        out.append(tuple(int(shifts[pos[(r, c)]]) for c in cset))
    return out


def main():
    results = {}  # (bg, ils) -> tuple of row tuples
    for bg in (1, 2):
        for ils in range(8):
            results[(bg, ils)] = optimize(bg, ils)

    # reshape to: per bg, per ext row, per col, tuple of 8 shifts
    lines = [
        '"""Girth-optimized extension-row lifting shifts (GENERATED FILE).',
        "",
        "Produced by tools/gen_ldpc_shifts.py — do not edit by hand; see",
        "isac_tpu/ops/ldpc_tables.py PROVENANCE for why these exist and how",
        "to replace them with the published TS 38.212 values.",
        '"""',
        "",
    ]
    for bg in (1, 2):
        cols_table, _ = _protograph(bg)
        lines.append(f"BG{bg}_EXT_SHIFTS = (")
        for ri, cset in enumerate(cols_table[4:]):
            row8 = []
            for ci in range(len(cset)):
                row8.append(
                    tuple(results[(bg, ils)][ri][ci] for ils in range(8))
                )
            lines.append("    (" + ", ".join(repr(t) for t in row8) + "),")
        lines.append(")")
        lines.append("")
    out_path = Path(__file__).resolve().parent.parent / "isac_tpu" / "ops" / "_ldpc_ext_shifts.py"
    out_path.write_text("\n".join(lines))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
