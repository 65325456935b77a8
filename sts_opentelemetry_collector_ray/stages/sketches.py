"""Mergeable approximate sketches — HyperLogLog distinct counting and Count-Min
frequency estimation.

These are THE scale-path answers to "count distinct" and "how often does key k
occur" over 100 TB: both sketches are built with a per-batch combiner (each
`map_batches` task collapses its rows to a fixed-size partial — ≤ |groups|·m
register rows for HLL, d·w cell rows for CMS), merged with an associative
aggregate (`max` for HLL registers, `sum` for CMS cells), and never move row
data through the exchange. The merged sketch is tiny (KBs) regardless of input
size — the same property that lets a 256-node cluster combine per-node sketches
with one short all-reduce instead of a corpus shuffle.

Determinism contract (what makes these strictly DuckDB-oracle-able): the hash is
the repo-standard FNV-1a32 over the key's decimal string (functions/hashing.py),
every register/cell value is an INTEGER, and the HLL estimator is arranged so
the only float operations are a fixed left-to-right multiply chain and one
divide by an exactly-representable integer (the 2^27 numerator trick below) —
both sides compute bit-identical doubles.

Flush shape follows the reference's metric-accumulator pattern (per-series
integer accumulators merged at export, connector.go's reqTotal map): registers
are the accumulator, the estimate is the export projection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Sum

from ..functions.hashing import fnv1a32_arrow

# --- HyperLogLog (Flajolet et al. 2007), p=6 → m=64 registers ----------------

_M32 = np.uint64(1 << 32)


def _fmix32(h: np.ndarray) -> np.ndarray:
    """Murmur3's 32-bit finalizer on top of FNV-1a — FNV alone has near-zero
    avalanche in the low bits for short decimal keys (register index = low 6
    bits was 40% biased at n=1000); two xorshift-multiply rounds fix it.
    Integer-exact, replayed stage-for-stage in the SQL oracle
    (queries5.py::events_approx_distinct)."""
    h = h.astype(np.uint64)
    h = h ^ (h >> np.uint64(16))
    h = (h * np.uint64(0x85EBCA6B)) % _M32
    h = h ^ (h >> np.uint64(13))
    h = (h * np.uint64(0xC2B2AE35)) % _M32
    return h ^ (h >> np.uint64(16))


HLL_P = 6
HLL_M = 1 << HLL_P  # 64
_HLL_ALPHA = 0.709  # alpha_64 from the HLL paper
_REST_BITS = 32 - HLL_P  # 26: hash bits left after the register index
_POW_REST1 = 1 << (_REST_BITS + 1)  # 2^27 — the integer-numerator scale


def _hll_partial(group_col: str, key_col: str):
    """Per-batch combiner: (group, register, max rho) — ≤ |groups|·64 rows out."""

    def inner(t: pa.Table) -> pa.Table:
        h = _fmix32(
            fnv1a32_arrow(pa.compute.cast(t[key_col], pa.string()).combine_chunks())
        )
        reg = (h % np.uint64(HLL_M)).astype(np.int64)
        w = (h >> np.uint64(HLL_P)).astype(np.int64)
        # rho = 1 + leading zeros of the 26-bit remainder = 27 - bit_length(w).
        # floor(log2)+1 is an exact bit_length for w < 2^26 (doubles are exact
        # there and log2 is exact at the power-of-two boundaries).
        bl = np.zeros(len(w), dtype=np.int64)
        nz = w > 0
        bl[nz] = np.floor(np.log2(w[nz])).astype(np.int64) + 1
        rho = (_REST_BITS + 1) - bl
        part = (
            pa.table({group_col: t[group_col], "reg": pa.array(reg), "rho": pa.array(rho)})
            .group_by([group_col, "reg"])
            .aggregate([("rho", "max")])
        )
        return part.rename_columns([group_col, "reg", "rho_p"])

    return inner


def hll_registers(
    ds: "ray.data.Dataset", group_col: str, key_col: str
) -> "ray.data.Dataset":
    """The mergeable sketch itself: (group, register, rho) with rho = max over
    all keys hashing to that register. ≤ |groups|·64 rows total."""
    partials = ds.map_batches(_hll_partial(group_col, key_col), batch_format="pyarrow")
    return partials.groupby([group_col, "reg"]).aggregate(Max("rho_p", alias_name="rho"))


def hll_distinct(
    ds: "ray.data.Dataset", group_col: str, key_col: str
) -> pa.Table:
    """Approximate COUNT(DISTINCT key) per group.

    Output: (group, n_empty BIGINT, est_distinct DOUBLE rounded to 6dp).

    Estimator: E = alpha·m² / Σ 2^(-rho_j).  The sum is computed as an exact
    integer numerator Σ 2^(27-rho_j) (empty registers contribute 2^27), so the
    float path is ONE divide — replayable bit-for-bit in SQL.  Small-range
    correction (E ≤ 2.5m with empty registers) switches to linear counting
    m·ln(m/V); the result is rounded to 6dp to absorb any last-ulp libm skew.
    """
    regs = hll_registers(ds, group_col, key_col).to_pandas()  # bounded: |groups|·64
    rows = []
    for grp, g in regs.groupby(group_col, sort=True):
        rho = g["rho"].to_numpy(dtype=np.int64)
        n_empty = HLL_M - len(rho)
        snum = int(np.sum(1 << (_REST_BITS + 1 - rho))) + n_empty * _POW_REST1
        raw = _HLL_ALPHA * (HLL_M * HLL_M) * _POW_REST1 / snum
        if raw <= 2.5 * HLL_M and n_empty > 0:
            est = HLL_M * np.log(HLL_M / n_empty)
        else:
            est = raw
        est = np.floor(est * 1e6 + 0.5) / 1e6
        rows.append((grp, n_empty, est))
    out = pa.table(
        {
            group_col: pa.array([r[0] for r in rows]),
            "n_empty": pa.array([r[1] for r in rows], pa.int64()),
            "est_distinct": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    return out


# --- Count-Min sketch (Cormode & Muthukrishnan 2005), d=4 × w=512 ------------

CMS_D = 4
CMS_W = 512
_MOD32 = np.uint64(1 << 32)


def _cms_cells(h: np.ndarray, seed: int) -> np.ndarray:
    """Row `seed`'s cell index for FNV hash values `h` (uint64 < 2^32):
    ((h·(2s+1) + s) mod 2^32) mod w — odd-multiplier mixing of one base hash,
    integer-exact on both the numpy and SQL sides."""
    with np.errstate(over="ignore"):
        return (((h * np.uint64(2 * seed + 1)) + np.uint64(seed)) % _MOD32) % np.uint64(CMS_W)


def cms_sketch(ds: "ray.data.Dataset", key_col: str) -> np.ndarray:
    """Build the d×w count matrix: per-batch bincount partials (≤ d·w rows per
    batch leave the task), one tiny groupby-sum, matrix assembled driver-side
    (d·w = 2048 ints)."""

    def partial(t: pa.Table) -> pa.Table:
        h = fnv1a32_arrow(pa.compute.cast(t[key_col], pa.string()).combine_chunks())
        seeds, cells, counts = [], [], []
        for s in range(CMS_D):
            bc = np.bincount(_cms_cells(h, s).astype(np.int64), minlength=CMS_W)
            nz = np.flatnonzero(bc)
            seeds.append(np.full(len(nz), s, dtype=np.int64))
            cells.append(nz.astype(np.int64))
            counts.append(bc[nz].astype(np.int64))
        return pa.table(
            {
                "s": pa.array(np.concatenate(seeds)),
                "cell": pa.array(np.concatenate(cells)),
                "pn": pa.array(np.concatenate(counts)),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["s", "cell"])
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()  # bounded: ≤ d·w rows
    )
    mat = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    mat[merged["s"].to_numpy(), merged["cell"].to_numpy()] = merged["n"].to_numpy()
    return mat


def cms_point_estimates(
    ds: "ray.data.Dataset", key_col: str
) -> "ray.data.Dataset":
    """For every distinct key: its exact count and the CMS estimate
    (min over the d rows — always ≥ exact; equality shows no collision).

    Two streaming passes over the input: sketch build (above) + the exact
    per-key count via the combiner-then-tiny-shuffle `sink_counts`; the point
    query itself maps over the DISTINCT-keys table with the 16 KB matrix
    broadcast once via `ray.put`.
    """
    import ray

    from .aggregate import sink_counts

    mat_ref = ray.put(cms_sketch(ds, key_col))
    exact = sink_counts(ds, [key_col])  # (key, n)

    def lookup(t: pa.Table) -> pa.Table:
        mat = ray.get(mat_ref)
        h = fnv1a32_arrow(pa.compute.cast(t[key_col], pa.string()).combine_chunks())
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for s in range(CMS_D):
            est = np.minimum(est, mat[s, _cms_cells(h, s).astype(np.int64)])
        return pa.table(
            {
                key_col: t[key_col],
                "n_exact": t["n"],
                "n_est": pa.array(est, pa.int64()),
            }
        )

    return exact.map_batches(lookup, batch_format="pyarrow")
