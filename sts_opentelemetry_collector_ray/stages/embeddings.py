"""Embedding-column operators: normalization + PCA dimensionality reduction.

The canonical broadcast-fit pattern for 100 TB corpora: FIT on a bounded
deterministic sample (the d×d covariance is tiny — d is the embedding dim, not
the corpus), broadcast the mean/components once via ``ray.put``, PROJECT per
batch with one matmul. The corpus streams; only d×k floats ship to workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.vectors import stack_list_column as _stack


def fit_pca(sample: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Mean + top-k principal components (eigh of the d×d covariance), with a
    deterministic sign convention (largest-|loading| element positive)."""
    mean = sample.mean(axis=0)
    x = sample - mean
    cov = (x.T @ x) / max(len(x) - 1, 1)
    w, v = np.linalg.eigh(cov)  # ascending
    comps = v[:, ::-1][:, :k]
    flips = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flips[flips == 0] = 1.0
    return mean, comps * flips[None, :]


def pca_project(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    sample_size: int = 2048,
    flat: bool = False,
) -> "ray.data.Dataset":
    """Project the embedding column to k dims. Fit is driver-side on the first
    ``sample_size`` rows (deterministic for a deterministic source order);
    components are broadcast once (`ray.put`), the projection is one per-batch
    matmul — no shuffle anywhere.

    ``flat=True`` emits scalar float64 columns ``pca_0..pca_{k-1}`` instead of
    one list column (the driver gate compares pandas frames, where scalar
    columns sort/hash cleanly)."""
    sample_refs = ds.limit(sample_size).to_arrow_refs()
    sample_tbl = pa.concat_tables([ray.get(r) for r in sample_refs])
    mean, comps = fit_pca(_stack(sample_tbl[vec_col]), k)
    ref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        m, w = ray.get(ref)
        x = _stack(t[vec_col])
        z = np.round((x - m[None, :]) @ w, 6)
        if flat:
            cols = {id_col: t[id_col]}
            for j in range(z.shape[1]):
                cols[f"pca_{j}"] = pa.array(z[:, j], pa.float64())
            return pa.table(cols)
        return pa.table(
            {
                id_col: t[id_col],
                "pca": pa.array(z.tolist(), pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def normalize_embeddings(
    ds: "ray.data.Dataset", vec_col: str = "embedding", id_col: str = "vec_id"
) -> "ray.data.Dataset":
    """L2-normalize the embedding column per batch (zero vectors pass through)."""

    def norm(t: pa.Table) -> pa.Table:
        x = _stack(t[vec_col])
        n = np.linalg.norm(x, axis=1)
        n[n == 0] = 1.0
        z = np.round(x / n[:, None], 9)
        return pa.table(
            {id_col: t[id_col], vec_col: pa.array(z.tolist(), pa.list_(pa.float64()))}
        )

    return ds.map_batches(norm, batch_format="pyarrow")
