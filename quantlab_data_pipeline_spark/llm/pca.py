"""Distributed PCA / whitening over an embedding column.

Embedding pipelines standardize before clustering and dedup (SemDeDup
and retrieval stacks whiten so cosine structure is not dominated by a
few high-variance directions; Matryoshka-style truncation keeps the
top directions). At corpus scale the ONLY distributed work PCA needs
is one reduce pass: per partition, accumulate ``(count, sum_vec,
X^T X)`` — for d-dimensional embeddings that is ``1 + d + d*d``
doubles per partition regardless of row count — then combine the
partials on the driver and eigendecompose the d x d covariance there
(d is 64-4096 for real embedding models: a driver-scale problem, the
same boundary as :func:`.similarity.train_centroids`). Projection is
one map pass with the (d, k) component matrix broadcast inside an
Arrow-batched kernel — numpy matmul per batch, no shuffle.

Determinism: LAPACK ``eigh`` is deterministic for identical input, and
the canonical sign fix (largest-|coordinate| component positive, first
index winning ties) removes the eigenvector sign ambiguity — so two
runs, two engines, or the mirror's from-scratch numpy replay agree to
float-sum noise (~1e-12 for well-separated eigenvalues), far inside
the 6-decimal rounding every emitted score carries.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fit_pca", "project_embeddings", "pca_canonical_sign"]


def pca_canonical_sign(components) -> "np.ndarray":
    """Flip each eigenvector so its largest-|value| coordinate is
    positive (first index wins ties) — the conventional sign fix that
    makes eigendecompositions comparable across runs and libraries."""
    import numpy as np

    comps = np.asarray(components, dtype=np.float64).copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps


def fit_pca(df: DataFrame, k: int = 8, vec_col: str = "embedding") -> dict:
    """Fit PCA on the embedding column; returns a plain-python model
    dict: ``mean`` (d,), ``components`` (k, d) rows = top eigenvectors
    by descending eigenvalue, ``eigvals`` (k,), and
    ``explained_variance_ratio`` (k,). Population covariance
    (divide by n — documented, and what the oracle replays). Null
    embeddings are ignored for the fit."""
    import numpy as np
    import pandas as pd

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for b in batches:
            vs = [v for v in b[vec_col] if v is not None]
            if not vs:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
            if s is None:
                s = np.zeros(X.shape[1])
                g = np.zeros((X.shape[1], X.shape[1]))
            n += len(X)
            s += X.sum(axis=0)
            g += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    schema = "n long, s array<double>, g array<double>"

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for b in batches:
            for _, r in b.iterrows():
                n += int(r["n"])
                if s is None:
                    s = np.zeros(len(r["s"]))
                    g = np.zeros(len(r["g"]))
                s += np.asarray(r["s"])
                g += np.asarray(r["g"])
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.tolist()]})

    # Tree-combine before the driver: the per-partition partials are
    # d^2-sized, so collecting one per input partition would ship
    # (partitions x d^2) doubles to the driver — 134 MB per partial at
    # d=4096. One combine level caps the collect at <=8 rows
    # regardless of how many partitions scanned the corpus.
    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema)
        .repartition(8)
        .mapInPandas(combine, schema)
        .collect()
    )
    if not rows:
        raise ValueError("fit_pca: no non-null embeddings")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = len(s)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][: min(k, d)]
    comps = pca_canonical_sign(eigvecs[:, order].T)
    ev = eigvals[order]
    total = float(eigvals.sum())
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "eigvals": ev.tolist(),
        "explained_variance_ratio": (
            (ev / total).tolist() if total > 0 else [0.0] * len(ev)
        ),
        "n": int(n),
    }


def project_embeddings(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    whiten: bool = False,
    out_col: str = "proj",
    decimals: int = 6,
) -> DataFrame:
    """(id, out_col): each embedding centered and projected onto the
    model's top-k components — ``(x - mean) @ W.T``, divided by
    ``sqrt(eigval)`` per coordinate when ``whiten`` (unit variance per
    direction). One Arrow-batched map pass with the (k, d) matrix in
    the closure; coordinates round to ``decimals`` so results are
    reproducible across partitionings and replays. Null embeddings
    project to null."""
    import numpy as np
    import pandas as pd

    W = np.asarray(model["components"], dtype=np.float64)
    mean = np.asarray(model["mean"], dtype=np.float64)
    scale = (
        1.0 / np.sqrt(np.maximum(np.asarray(model["eigvals"]), 1e-12))
        if whiten
        else np.ones(W.shape[0])
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ok = b[vec_col].notna()
            out = pd.Series([None] * len(b), dtype=object)
            if ok.any():
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in b.loc[ok, vec_col]]
                )
                P = np.round(((X - mean) @ W.T) * scale, decimals)
                out[np.flatnonzero(ok.to_numpy())] = list(map(list, P))
            yield pd.DataFrame({id_col: b[id_col], out_col: out})

    return df.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} long, {out_col} array<double>"
    )
