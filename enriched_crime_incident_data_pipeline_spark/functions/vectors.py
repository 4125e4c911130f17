"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep
the arithmetic JVM-side; elements are cast to double before summing so
results are bit-identical to a sequential double-precision loop (the
DuckDB oracle casts to DOUBLE[] for the same reason).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double (sequential left-to-right accumulation)."""
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    """Euclidean norm as double."""
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); NULL when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)


def cosine_from_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """dot(a,b) / (norm_a·norm_b) with the norms precomputed once per
    vector instead of once per *pair* — in pairwise joins this cuts
    the higher-order-function evaluations 3×. Bit-identical to
    ``cosine_similarity`` (same values, same operation order)."""
    denom = norm_a * norm_b
    return F.when(denom > 0, dot_product(a, b) / denom)


def quantize_int8(vec: Column) -> dict[str, Column]:
    """Per-vector int8 scalar quantization for embedding storage:
    ``q_i = min(floor((x_i − min) / scale), 255)`` with
    ``scale = (max − min) / 255`` — 4× smaller than float32 on disk,
    the standard trick before ANN indexing at corpus scale.

    Returns column exprs: ``scale``, ``zero_point`` (the min),
    ``q`` (array<int>), and ``max_abs_err`` (reconstruction audit).
    All ops are exact-rounded IEEE doubles with a fixed operand order
    plus order-independent min/max — bit-reproducible across engines
    (``floor``/``least`` everywhere, no half-even-vs-half-away
    ``round`` hazard). A constant vector (max == min) quantizes to
    all-zeros with scale 0 and exact reconstruction.
    """
    v = F.transform(vec, lambda x: x.cast("double"))
    mn, mx = F.array_min(v), F.array_max(v)
    scale = (mx - mn) / F.lit(255.0)
    q = F.when(
        mx == mn,
        F.transform(v, lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.least(
                F.floor((x - mn) / scale), F.lit(255)
            ).cast("int"),
        )
    )
    recon_err = F.when(mx == mn, F.lit(0.0)).otherwise(
        F.array_max(
            F.zip_with(
                v, q, lambda x, qi: F.abs(x - (mn + qi.cast("double") * scale))
            )
        )
    )
    return {
        "scale": scale,
        "zero_point": mn,
        "q": q,
        "max_abs_err": recon_err,
    }


def quantize_embeddings(
    df, id_col: str = "vec_id", vec_col: str = "embedding"
):
    """DataFrame-level int8 quantization via an Arrow-batched numpy
    kernel — the fast face of :func:`quantize_int8`.

    The column-expression form re-evaluates ``array_min``/``array_max``
    per element inside the (interpreted, codegen-less) higher-order
    lambdas — O(dim²) work per vector; the kernel computes min/max
    once per vector and quantizes at memory bandwidth (~20× at sf0.1).
    Identical IEEE double ops in the same order (cast → sub → div →
    floor → clamp; min/max/abs are order-independent), so the outputs
    are bit-equal to the expression path and the SQL oracle — pinned
    by ``test_quantize_kernel_matches_expression``.
    """
    import pandas as pd

    schema = (
        f"{id_col} long, scale double, zero_point double, "
        "q_json string, max_abs_err double"
    )

    def kern(batches):
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mn = mat.min(axis=1)
            mx = mat.max(axis=1)
            const = mx == mn
            scale = (mx - mn) / 255.0
            with np.errstate(divide="ignore", invalid="ignore"):
                q = np.minimum(
                    np.floor((mat - mn[:, None]) / scale[:, None]), 255.0
                )
            q[const] = 0.0
            q = q.astype(np.int64)
            recon = mn[:, None] + q * scale[:, None]
            err = np.abs(mat - recon).max(axis=1)
            err[const] = 0.0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "scale": scale,
                    "zero_point": mn,
                    "q_json": [
                        "[" + ",".join(map(str, row)) + "]" for row in q
                    ],
                    "max_abs_err": err,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kern, schema)
