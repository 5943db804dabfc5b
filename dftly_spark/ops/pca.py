"""Distributed PCA: top principal component, bit-reproducibly.

The architecture is the one Spark MLlib itself uses for tall-skinny
matrices (``RowMatrix.computePrincipalComponents``): the Gramian /
covariance is aggregated DISTRIBUTED (d²-bounded result, one pass over
the vectors), the eigen-solve happens on the DRIVER over that d²-cell
summary (dimension-bounded metadata, the same class as the k-means
centroid matrix or the quantizer codebook), and the projection is a
row-local expression over the corpus.

What this module adds over "call numpy" is REPLAYABILITY — every float
op is pinned so an external engine reproduces the component bit-for-bit:

* sufficient statistics are EXACT integers: vectors quantize to 1e-6
  ticks (numerically irrelevant at feature scale, exactness-critical),
  so Σx and Σx·xᵀ are order-independent bigint sums;
* covariance entries derive by a FIXED float expression
  ``sp/n − (s_i/n)·(s_j/n)``;
* the driver-side power iteration uses explicit sequential folds (first
  element as seed, ascending index — the ``list_reduce`` convention) and
  scales each round by ``max(abs(w))`` (an order-independent reduction,
  no mid-iteration square-root sums);
* the final normalization and the per-vector projection are single
  ordered folds.

A recursive CTE replays the whole fit (see the x118 oracle).  Top-1 only:
further components would deflate and repeat; at that point use the same
Gramian with a driver-side eigh and accept engine-specific last-ulp.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000.0


def _exact_stats(df: DataFrame, vec_col: str, dim: int):
    """n, s[i], sp[i][j] from two aggregations of quantized vectors.

    The Gramian is symmetric, so only the UPPER TRIANGLE is computed:
    each row contributes a flattened d(d+1)/2-cell product array (built
    with codegen'd collection expressions — ``transform`` with index +
    dynamic ``slice``, no Python), exploded ONCE on a single flat int key
    and map-side-combined — half the rows and a cheaper agg key than the
    (i, j) full-matrix explode this replaces.  The d linear cells (Σx,
    max|x|, n) ride a separate n·d pass instead of being threaded through
    the quadratic one.  Integer sums stay order-independent-exact, which
    is what lets the x118 recursive-CTE oracle replay the fit verbatim.
    (A per-partition numpy gemm would cut the explode entirely but needs
    int64 matmul through Arrow — a new Python-on-data surface — and BLAS
    float gemm is not exact past 2^53; the triangle explode keeps the
    whole fit JVM-side and spill-safe.)
    """
    xq = F.transform(
        F.col(vec_col), lambda v: F.floor(v * QUANT + F.lit(0.5)).cast("bigint")
    )
    # The flat-key triangle explode is only correct when EVERY vector has
    # exactly `dim` cells — a short row's slice() truncates silently and
    # its flattened positions shift onto other (i, j) cells (and the
    # per-index counts diverge, making n arbitrary).  Reject ragged input
    # loudly, mirroring the overflow guard below; NULL vectors stay
    # allowed (both passes drop them consistently at posexplode).
    ok = F.col(vec_col).isNull() | (F.size(vec_col) == F.lit(dim))
    guarded = F.when(ok, xq).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"pca: vector length != dim={dim} (got "),
                F.size(vec_col).cast("string"),
                F.lit("): fix the embedding column or pass the true dim"),
            )
        )
    )
    base = df.select(guarded.alias("_q"))
    lin = (
        base.select(F.posexplode("_q").alias("_i", "_xi"))
        .groupBy("_i")
        .agg(
            F.sum("_xi").alias("_s"),
            F.max(F.abs(F.col("_xi"))).alias("_mx"),
            F.count(F.lit(1)).alias("_n"),
        )
        .collect()
    )
    # flat key k enumerates (i, j >= i) row-major: k = i*d - i(i-1)/2 + (j-i)
    tri = F.flatten(
        F.transform(
            F.col("_q"),
            lambda xi, i: F.transform(
                F.slice(F.col("_q"), i + 1, F.lit(dim) - i), lambda xj: xi * xj
            ),
        )
    )
    gram = (
        base.select(F.posexplode(tri).alias("_k", "_p"))
        .groupBy("_k")
        .agg(F.sum("_p").alias("_sp"))
        .collect()
    )
    n = 0
    s = [0] * dim
    sp = [[0] * dim for _ in range(dim)]
    mx = 0
    for r in lin:
        s[r["_i"]] = r["_s"]
        mx = max(mx, r["_mx"] or 0)
        n = r["_n"]
    ij = [(i, j) for i in range(dim) for j in range(i, dim)]
    for r in gram:
        i, j = ij[r["_k"]]
        sp[i][j] = r["_sp"]
        sp[j][i] = r["_sp"]
    # Spark's non-ANSI bigint sum WRAPS silently on overflow (DuckDB's
    # hugeint sum would error or disagree) — reject before the component
    # silently points somewhere wrong.  Conservative bound: every cell
    # satisfies |sp| <= n * mx^2.
    if mx and n and n * mx * mx >= 2**62:
        raise ValueError(
            f"Gramian cells may overflow int64 (n={n}, max|x_q|={mx}): "
            "rescale the vectors or fit on a sample"
        )
    return n, s, sp


def _fold(terms):
    """Sequential no-init fold (the list_reduce convention)."""
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def pca_top_component(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    dim: int,
    power_iters: int = 40,
) -> DataFrame:
    """Project every vector onto the corpus' top principal component.

    Returns ``(id_col, pc1)`` where ``pc1 = ⟨x, v⟩ / ‖v‖`` for the
    component ``v`` of the (1e-6-quantized) covariance, fit by
    ``power_iters`` rounds of max-abs-scaled power iteration from the
    deterministic ``e₀`` start.  Every float op is sequenced so the whole
    fit+projection replays exactly in any engine (module docstring).
    """
    n, s, sp = _exact_stats(df, vec_col, dim)
    if n < 2:
        raise ValueError(f"pca_top_component needs >=2 vectors, got {n}")
    # float() BEFORE dividing: Python's int/int is correctly rounded over
    # the exact rationals, but SQL casts each bigint to double first —
    # for sp beyond 2^53 the two differ in the last ulp.  Mirror SQL.
    nf = float(n)
    cov = [
        [
            (float(sp[i][j]) / nf) - (float(s[i]) / nf) * (float(s[j]) / nf)
            for j in range(dim)
        ]
        for i in range(dim)
    ]
    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(power_iters):
        w = [_fold([cov[i][j] * v[j] for j in range(dim)]) for i in range(dim)]
        mx = max(abs(x) for x in w)
        if mx == 0.0:
            raise ValueError("power iteration collapsed (zero covariance?)")
        v = [x / mx for x in w]
    # math.sqrt mirrors SQL sqrt() (IEEE-exact); `** 0.5` goes through
    # libm pow, which is NOT guaranteed correctly rounded — a 1-ulp norm
    # difference would shift every score off the oracle
    norm = math.sqrt(_fold([x * x for x in v]))
    # projection: ordered fold of x_i * v_i over the RAW (unquantized)
    # vector, then one divide — the same fold both engines run
    varr = F.array(*[F.lit(float(x)) for x in v])
    terms = F.zip_with(
        F.col(vec_col).cast("array<double>"), varr, lambda x, y: x * y
    )
    score = F.aggregate(
        F.slice(terms, 2, dim - 1),
        F.element_at(terms, 1),
        lambda acc, t: acc + t,
    ) / F.lit(float(norm))
    return df.select(F.col(id_col), score.alias("pc1"))
