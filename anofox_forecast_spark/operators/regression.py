"""Per-group OLS fit-predict — the regression leg of the reference's
backtest examples.

The reference's ``examples/backtesting/*.sql`` pipelines feed
``ts_prepare_regression_input_by`` output into ``ols_fit_predict_by``
(shipped by the companion ``anofox_statistics`` community extension, not the
forecast extension itself): fit an intercept + k-feature OLS per group on
the rows whose (masked) target is non-NULL, predict every row. This module
implements that contract Spark-first so the whole backtest workflow —
``ts_cv_split_by`` → ``ts_prepare_regression_input_by`` →
``ols_fit_predict_by`` → ``ts_mae_by`` — runs end-to-end in this engine.

Design for exactness and scale:

- Each group's rows are gathered into ONE ds-ordered array (the same
  bounded per-series/per-fold payload every grouped operator carries), and
  all sums run as **sequential ``aggregate`` folds** over that array — the
  fold order is deterministic, so the DuckDB oracle replays bit-for-bit
  (partition-order-dependent ``SUM()`` would not).
- The normal equations solve by **Cramer's rule with one shared expression
  text**: `_det_sql` builds the cofactor-expansion string once, and BOTH
  the Spark side (via ``F.expr``) and the DuckDB oracle evaluate that
  identical arithmetic, so coefficients match to the last ulp.
- Everything is JVM-side Catalyst — no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _det_sql(m: list[list[str]]) -> str:
    """Cofactor expansion (first row) of a matrix of SQL expressions —
    deterministic evaluation order shared by Spark and DuckDB."""
    n = len(m)
    if n == 1:
        return m[0][0]
    terms = []
    for j in range(n):
        minor = [[m[r][c] for c in range(n) if c != j] for r in range(1, n)]
        sign = "" if j % 2 == 0 else "- "
        terms.append(f"{sign}({m[0][j]}) * ({_det_sql(minor)})")
    return " + ".join(terms).replace("+ - ", "- ")


def cramer_sql(a: list[list[str]], b: list[str]) -> list[str]:
    """Solution expressions x_i = det(A_i) / det(A) for Ax = b."""
    det = _det_sql(a)
    out = []
    for i in range(len(b)):
        ai = [[(b[r] if c == i else a[r][c]) for c in range(len(b))]
              for r in range(len(b))]
        out.append(f"({_det_sql(ai)}) / ({det})")
    return out


def ols_sums(k: int) -> dict[str, str]:
    """Per-element expressions (over struct var ``e`` with fields
    ``y, x1..xk``) for every normal-equation sum — shared by both fold
    dialects."""
    names = ["one"] + [f"x{i}" for i in range(1, k + 1)]

    def prod(u, v):
        eu = "1.0" if u == "one" else f"e.{u}"
        ev = "1.0" if v == "one" else f"e.{v}"
        if u == "one" and v == "one":
            return "1.0"
        if u == "one":
            return ev
        if v == "one":
            return eu
        return f"{eu} * {ev}"

    sums = {}
    for r in range(k + 1):
        for c in range(r, k + 1):
            sums[f"s_{names[r]}_{names[c]}"] = prod(names[r], names[c])
    for r in range(k + 1):
        pr = "e.y" if names[r] == "one" else f"e.{names[r]} * e.y"
        sums[f"s_{names[r]}_y"] = pr
    return sums


def ols_fold_exprs(k: int, arr: str, dialect: str = "spark") -> list[str]:
    """Aliased sequential-fold expressions for the normal-equation sums.
    Spark's ``aggregate(arr, 0.0, +)`` and DuckDB's
    ``list_reduce(list_prepend(0.0, list_transform(...)), +)`` add the
    elements in the same left-to-right order, so the two dialects produce
    bit-identical sums over identically-ordered arrays."""
    out = []
    for nm, ex in ols_sums(k).items():
        if dialect == "spark":
            out.append(f"aggregate({arr}, CAST(0.0 AS DOUBLE), "
                       f"(acc, e) -> acc + ({ex})) AS {nm}")
        else:
            out.append(f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                       f"list_transform({arr}, e -> CAST(({ex}) AS DOUBLE))), "
                       f"(a, b) -> a + b) AS {nm}")
    return out


def normal_matrix(k: int, l2: float = 0.0) -> tuple[list[list[str]],
                                                    list[str]]:
    """(A, b) expression matrix for the (possibly ridge-penalized) normal
    equations over the named sum columns. ``l2`` adds the penalty to the
    non-intercept diagonal (standard ridge: the intercept is unpenalized),
    with a repr'd literal so both engines parse the identical double."""
    names = ["one"] + [f"x{i}" for i in range(1, k + 1)]
    a = [[f"s_{names[min(r, c)]}_{names[max(r, c)]}" for c in range(k + 1)]
         for r in range(k + 1)]
    if l2:
        for i in range(1, k + 1):
            a[i][i] = f"({a[i][i]} + {float(l2)!r})"
    b = [f"s_{names[r]}_y" for r in range(k + 1)]
    return a, b


def ols_normal_eq_sql(k: int, arr: str = "tr",
                      l2: float = 0.0) -> tuple[list[str], list[str]]:
    """(coefficient expressions, Spark sum-fold expressions) for an
    intercept + k-feature OLS (or ridge when ``l2 > 0``) over array column
    ``arr`` of ``struct(y, x1..xk)`` rows. The Cramer text is the shared
    Spark/DuckDB arithmetic."""
    a, b = normal_matrix(k, l2)
    return cramer_sql(a, b), ols_fold_exprs(k, arr, "spark")


def _ols_fit_predict_distributed(df: DataFrame, group_col: str,
                                 order_cols: list[str], y_col: str,
                                 x_cols: list[str],
                                 l2: float = 0.0) -> DataFrame:
    """Scale path: normal-equation sums as native ``SUM()`` aggregations
    (map-side combined, never materializing a group as one array — the
    right shape when a 'group' is a whole fold of a 100 TB table), then
    the same Cramer expression text, broadcast back onto the rows.
    Float sums are partition-order dependent here (last-ulp), which is why
    the exact/oracle path folds sequentially instead."""
    k = len(x_cols)
    names = ["one"] + [f"x{i}" for i in range(1, k + 1)]
    base = df.select(group_col, *order_cols,
                     F.col(y_col).cast("double").alias("__y"),
                     *[F.col(c).cast("double").alias(f"__x{i + 1}")
                       for i, c in enumerate(x_cols)])
    tr = base.filter(F.col("__y").isNotNull())
    for i in range(k):
        tr = tr.filter(F.col(f"__x{i + 1}").isNotNull())

    def term(u, v=None):
        e = (F.lit(1.0) if u == "one" else F.col(f"__{u}"))
        if v is not None:
            e = e * (F.lit(1.0) if v == "one" else F.col(f"__{v}"))
        return e

    aggs = []
    for r in range(k + 1):
        for c in range(r, k + 1):
            aggs.append(F.sum(term(names[r], names[c]))
                         .alias(f"s_{names[r]}_{names[c]}"))
        aggs.append(F.sum(term(names[r]) * F.col("__y"))
                     .alias(f"s_{names[r]}_y"))
    sums = tr.groupBy(group_col).agg(*aggs)
    a, b = normal_matrix(k, l2)
    det = _det_sql(a)
    coefs = sums.selectExpr(group_col, *[
        f"CASE WHEN s_one_one >= {k + 1} AND ({det}) != 0.0 "
        f"THEN {ex} END AS b{i}"
        for i, ex in enumerate(cramer_sql(a, b))])
    pred = " + ".join(["b0"] + [f"b{i + 1} * __x{i + 1}" for i in range(k)])
    out = base.join(F.broadcast(coefs), on=group_col, how="left")
    return out.selectExpr(group_col, *order_cols,
                          f"__y AS {y_col}",
                          f"CAST({pred} AS DOUBLE) AS yhat")


def ols_fit_predict_by(df: DataFrame, group_col: str, order_cols: list[str],
                       y_col: str, x_cols: list[str],
                       params: dict | None = None) -> DataFrame:
    """Fit intercept + ``x_cols`` OLS per ``group_col`` on rows with
    non-NULL ``y_col``; predict every row (companion-extension
    ``ols_fit_predict_by`` contract, as used by the reference backtest
    examples with the NULL-masked target from
    ``ts_prepare_regression_input_by``).

    Output: ``group_col``, ``order_cols``…, ``y_col`` (as fed, NULLs
    preserved), ``yhat``. 1–4 features (Cramer on the (k+1)x(k+1) normal
    equations). Groups whose design matrix is singular (det == 0) or with
    fewer trainable rows than coefficients yield NULL ``yhat``.

    Scale + exactness: the default (``params={'exact': True}``) computes
    the sums as a TWO-LEVEL deterministic fold — per-(group,
    ``order_cols[0]``) partial sums over the ds-ordered rows of that
    subgroup (a bounded per-series array, like every grouped operator),
    then a sequential fold of the partials ordered by ``order_cols[0]``.
    No array ever holds more than one subgroup, the per-fold coefficient
    frame broadcasts back onto the rows for prediction, and the summation
    tree is fixed, so the DuckDB oracle replays it bit-for-bit (flat
    single-level folds would also be quadratic in DuckDB's list_reduce).
    For groups without a natural subgroup key pass ``{'exact': False}``:
    sums become native map-side-combined ``SUM()`` aggregations, trading
    last-ulp float determinism for one less shuffle."""
    k = len(x_cols)
    if not 1 <= k <= 4:
        raise ValueError("ols_fit_predict_by supports 1-4 features")
    l2 = float(dict(params or {}).get("l2", 0.0))
    if not dict(params or {}).get("exact", True):
        return _ols_fit_predict_distributed(df, group_col, order_cols,
                                            y_col, x_cols, l2)
    sub = order_cols[0]
    rest = list(order_cols[1:])
    coef_exprs, fold = ols_normal_eq_sql(k, arr="__tr", l2=l2)
    sum_names = list(ols_sums(k))
    ord_struct = ", ".join([*rest, f"{y_col} AS y"]
                           + [f"CAST({c} AS DOUBLE) AS x{i + 1}"
                              for i, c in enumerate(x_cols)])
    # level 1: bounded per-subgroup arrays -> sequential partial sums
    g1 = (df.groupBy(group_col, sub)
            .agg(F.expr(f"array_sort(collect_list(struct({ord_struct})))")
                  .alias("__rows")))
    g1 = g1.withColumn("__tr", F.expr(
        "filter(__rows, e -> e.y IS NOT NULL"
        + "".join(f" AND e.x{i + 1} IS NOT NULL" for i in range(k)) + ")"))
    g1 = g1.selectExpr(group_col, sub, *fold)
    # level 2: fold the partials in subgroup order
    part_struct = ", ".join([sub] + sum_names)
    g2 = (g1.groupBy(group_col)
            .agg(F.expr(f"array_sort(collect_list(struct({part_struct})))")
                  .alias("__ps")))
    lvl2 = [
        f"aggregate(__ps, CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.{nm}) "
        f"AS {nm}" for nm in sum_names]
    g2 = g2.selectExpr(group_col, *lvl2)
    # singularity / insufficient-rows guard, then the shared Cramer text
    a, _b = normal_matrix(k, l2)
    det = _det_sql(a)
    coefs = g2.selectExpr(group_col, *[
        f"CASE WHEN s_one_one >= {k + 1} AND ({det}) != 0.0 "
        f"THEN {ex} END AS b{i}" for i, ex in enumerate(coef_exprs)])
    # predictions: per-row expression over the broadcast coefficients
    base = df.select(group_col, *order_cols,
                     F.col(y_col).cast("double").alias("__y"),
                     *[F.col(c).cast("double").alias(f"__x{i + 1}")
                       for i, c in enumerate(x_cols)])
    pred = " + ".join(["b0"] + [f"b{i + 1} * __x{i + 1}" for i in range(k)])
    out = base.join(F.broadcast(coefs), on=group_col, how="left")
    return out.selectExpr(group_col, *order_cols, f"__y AS {y_col}",
                          f"CAST({pred} AS DOUBLE) AS yhat")
