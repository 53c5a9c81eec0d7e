"""DuckDB-SQL replay of the full 117-feature table (features_full oracle).

Every feature from ``operators/features.py::extract_features`` is re-derived
in DuckDB list SQL with the exact same expression shapes and sequential
summation order, so the arithmetic-only features compare bit-for-bit
(84/117 exactly equal at sf0.01); the 33 trig/log features (DFT
coefficients, spectral moments, entropies, Benford) differ only by libm
last-ulp drift (<= 5e-11) and are pinned to the contract's 6-decimal
quantum. The Lempel-Ziv parse runs as a recursive CTE replaying the l/k/
k_max scan; sample/approximate entropy are the full O(n^2) pair scans;
permutation patterns use (value, index) struct sort == numpy's stable
argsort. Parity targets cited in operators/features.py (features.rs).
"""
import math

EPSR = "2.220446049250313e-16"
TP = repr(2 * math.pi)


def _seqf(vals):
    s = 0.0
    for v in vals:
        s += v
    return s


# benford constants, sequential-sum shapes matching features._benford
_EXPECTED = [0.301, 0.176, 0.125, 0.097, 0.079, 0.067, 0.058, 0.051, 0.046]
_EM = _seqf(_EXPECTED) / 9.0
_SSE_E = _seqf([(e - _EM) * (e - _EM) for e in _EXPECTED])
_MAX_ENT3 = math.log(1) + math.log(2) + math.log(3)


def FOLD(items_expr):
    return f"list_aggregate({items_expr}, 'sum')"


def T(rng, body):
    """list_transform over a range expression."""
    return f"list_transform({rng}, {body})"


def features_full_oracle(panel_sql: str) -> str:
    # banker's rounding of a non-negative double u (np.round == rint,
    # round-half-to-even; frac == 0.5 test is exact for |u| < 2^52)
    bnk = ("list_transform([floor(u0)], fl -> CASE "
           "WHEN u0 - fl > 0.5 THEN fl + 1.0 "
           "WHEN u0 - fl < 0.5 THEN fl "
           "WHEN CAST(fl AS BIGINT) % 2 = 0 THEN fl ELSE fl + 1.0 END)[1]")

    def quant(q):
        return (f"CASE WHEN CAST(ceil({q} * (nf - 1.0)) AS BIGINT) >= n "
                f"THEN sv[n] ELSE "
                f"sv[CAST(floor({q} * (nf - 1.0)) AS BIGINT) + 1] "
                f"* (1.0 - ({q} * (nf - 1.0) - floor({q} * (nf - 1.0)))) "
                f"+ sv[CAST(ceil({q} * (nf - 1.0)) AS BIGINT) + 1] "
                f"* ({q} * (nf - 1.0) - floor({q} * (nf - 1.0))) END")

    def acf(lag):
        num = FOLD(T(f"range(1, n - {lag} + 1)",
                     f"t -> (ys[t + {lag}] - mean) * (ys[t] - mean)"))
        return (f"CASE WHEN n <= {lag} THEN 'NaN'::DOUBLE "
                f"WHEN abs(ssd) < {EPSR} THEN 0.0 "
                f"ELSE {num} / ssd END")

    # ---- per-feature expressions over the `core` CTE columns ----
    feats = {}
    feats["length"] = "nf"
    feats["sum"] = "s_sum"
    feats["mean"] = "mean"
    feats["minimum"] = "mn"
    feats["maximum"] = "mx"
    feats["range"] = "mx - mn"
    feats["variance"] = "var_"
    feats["standard_deviation"] = "std"
    feats["variation_coefficient"] = (
        f"CASE WHEN abs(mean) > {EPSR} THEN std / abs(mean) "
        f"ELSE 'NaN'::DOUBLE END")
    feats["large_standard_deviation"] = (
        "CASE WHEN std > 0.25 * (mx - mn) THEN 1.0 ELSE 0.0 END")
    feats["median"] = ("CASE WHEN n % 2 = 0 THEN "
                       "(sv[n // 2] + sv[n // 2 + 1]) / 2.0 "
                       "ELSE sv[n // 2 + 1] END")
    feats["quantile_0_1"] = quant("0.1")
    feats["quantile_0_25"] = quant("0.25")
    feats["quantile_0_75"] = quant("0.75")
    feats["quantile_0_9"] = quant("0.9")
    zexp = "list_transform(ys, v -> (v - mean) / std)"
    feats["skewness"] = (
        f"CASE WHEN std > {EPSR} THEN "
        + FOLD(f"list_transform({zexp}, z -> (z * z) * z)") + " / nf "
        "ELSE 'NaN'::DOUBLE END")
    feats["kurtosis"] = (
        f"CASE WHEN std > {EPSR} THEN "
        + FOLD(f"list_transform({zexp}, z -> (z * z) * (z * z))")
        + " / nf - 3.0 ELSE 'NaN'::DOUBLE END")
    feats["count_above_mean"] = "CAST(len(list_filter(ys, v -> v > mean)) AS DOUBLE)"
    feats["count_below_mean"] = "CAST(len(list_filter(ys, v -> v < mean)) AS DOUBLE)"
    feats["percentage_above_mean"] = (
        "CAST(len(list_filter(ys, v -> v > mean)) AS DOUBLE) / nf")
    feats["zero_crossing_rate"] = (
        "CASE WHEN n > 1 THEN CAST(len(list_filter(range(1, n), "
        "t -> sign(ys[t]) <> sign(ys[t + 1]) AND ys[t] <> 0 "
        "AND ys[t + 1] <> 0)) AS DOUBLE) / greatest(nf - 1.0, 1.0) "
        "ELSE 'NaN'::DOUBLE END")
    feats["mean_change"] = (
        "CASE WHEN n > 1 THEN " + FOLD("chl") + " / (nf - 1.0) "
        "ELSE 'NaN'::DOUBLE END")
    feats["mean_abs_change"] = (
        "CASE WHEN n > 1 THEN "
        + FOLD("list_transform(chl, c -> abs(c))") + " / (nf - 1.0) "
        "ELSE 'NaN'::DOUBLE END")
    feats["cid_ce"] = (
        "CASE WHEN n > 1 THEN sqrt("
        + FOLD("list_transform(chl, c -> c * c)") + ") ELSE 'NaN'::DOUBLE END")
    feats["absolute_sum_of_changes"] = (
        "CASE WHEN n > 1 THEN "
        + FOLD("list_transform(chl, c -> abs(c))") + " ELSE 'NaN'::DOUBLE END")
    feats["first_value"] = "ys[1]"
    feats["last_value"] = "ys[n]"
    feats["first_location_of_maximum"] = "CAST(list_position(ys, mx) - 1 AS DOUBLE) / nf"
    feats["last_location_of_maximum"] = (
        "CAST(n - list_position(list_reverse(ys), mx) AS DOUBLE) / nf")
    feats["first_location_of_minimum"] = "CAST(list_position(ys, mn) - 1 AS DOUBLE) / nf"
    feats["last_location_of_minimum"] = (
        "CAST(n - list_position(list_reverse(ys), mn) AS DOUBLE) / nf")
    feats["abs_energy"] = "aen"
    feats["root_mean_square"] = "sqrt(aen / nf)"
    feats["mean_second_derivative_central"] = (
        "CASE WHEN n > 2 THEN "
        + FOLD(T("range(1, n - 1)", "t -> ys[t + 2] - 2 * ys[t + 1] + ys[t]"))
        + " / (n - 2) ELSE 'NaN'::DOUBLE END")
    strike = ("list_reduce(list_prepend([0.0, 0.0], "
              "list_transform(ys, v -> [v, 0.0])), (acc, x) -> "
              "CASE WHEN x[1] {op} mean THEN "
              "[acc[1] + 1.0, greatest(acc[2], acc[1] + 1.0)] "
              "ELSE [0.0, acc[2]] END)[2]")
    feats["longest_strike_above_mean"] = strike.format(op=">")
    feats["longest_strike_below_mean"] = strike.format(op="<")
    peak = "ys[t] > ys[t - 1] AND ys[t] > ys[t + 1]"
    feats["number_peaks"] = (
        "CASE WHEN n >= 3 THEN CAST(len(list_filter(range(2, n), "
        f"t -> {peak})) AS DOUBLE) ELSE 0.0 END")
    feats["number_peaks_threshold_1"] = (
        "CASE WHEN n >= 3 THEN CAST(len(list_filter(range(2, n), "
        f"t -> {peak} AND abs(ys[t] - mean) > std)) AS DOUBLE) ELSE 0.0 END")
    feats["number_peaks_threshold_2"] = (
        "CASE WHEN n >= 3 THEN CAST(len(list_filter(range(2, n), "
        f"t -> {peak} AND abs(ys[t] - mean) > 2 * std)) AS DOUBLE) "
        "ELSE 0.0 END")
    # benford: digit counts from the shortest-roundtrip decimal form (DuckDB
    # VARCHAR cast == Python repr for doubles)
    dig_counts = T("range(1, 10)",
                   "dd -> CAST(len(list_filter(ys, v -> abs(v) >= 1.0 AND "
                   "regexp_extract(CAST(abs(v) AS VARCHAR), '[1-9]') "
                   "= CAST(dd AS VARCHAR))) AS DOUBLE)")
    exp_lit = "[" + ", ".join(repr(e) for e in _EXPECTED) + "]"
    feats["benford_correlation"] = f"""
list_transform([{dig_counts}], bc ->
  list_transform([{FOLD('bc')}], tot ->
    CASE WHEN tot = 0 THEN 0.0 ELSE
      list_transform([list_transform(bc, c -> c / tot)], ob ->
        list_transform([{FOLD('ob')} / 9.0], om ->
          list_transform([{FOLD(T('range(1, 10)',
              f'k -> ({exp_lit}[k] - {_EM!r}) * (ob[k] - om)'))}], nm ->
            list_transform([sqrt({_SSE_E!r} * {FOLD(T('range(1, 10)',
                'k -> (ob[k] - om) * (ob[k] - om)'))})], dn ->
              CASE WHEN dn > {EPSR} THEN nm / dn ELSE 0.0 END)[1])[1])[1])[1]
    END)[1])[1]"""
    # linear trend (x = 0..n-1; xm exact)
    lt_pre = f"""lt AS (SELECT *,
  CAST(n * (n - 1) // 2 AS DOUBLE) / nf AS xm,
  mean AS ym,
  {FOLD(T('range(1, n + 1)',
          't -> ((t - 1) - CAST(n * (n - 1) // 2 AS DOUBLE) / nf) '
          '* (ys[t] - mean)'))} AS ss_xy,
  {FOLD(T('range(1, n + 1)',
          't -> ((t - 1) - CAST(n * (n - 1) // 2 AS DOUBLE) / nf) '
          '* ((t - 1) - CAST(n * (n - 1) // 2 AS DOUBLE) / nf)'))} AS ss_xx
  FROM core),
lt2 AS (SELECT *,
  CASE WHEN n < 2 THEN 0.0
       WHEN ss_xx > {EPSR} THEN ss_xy / ss_xx ELSE 0.0 END AS slope
  FROM lt)"""
    feats["linear_trend_slope"] = "slope"
    feats["linear_trend_intercept"] = (
        "CASE WHEN n < 2 THEN ys[1] ELSE ym - slope * xm END")
    feats["linear_trend_r_squared"] = (
        f"CASE WHEN n >= 2 AND ss_xx > {EPSR} AND ssd > {EPSR} "
        f"THEN ss_xy * ss_xy / (ss_xx * ssd) ELSE 0.0 END")
    # binned entropy
    bin_idx = ("least(list_transform([((v - mn) / (mx - mn)) * 9], "
               f"u0 -> {bnk})[1], 9.0)")
    bin_counts = T("range(0, 10)",
                   f"b -> CAST(len(list_filter(ys, v -> {bin_idx} = b)) "
                   "AS DOUBLE)")
    feats["binned_entropy"] = f"""
CASE WHEN abs(mx - mn) < {EPSR} THEN 0.0 ELSE
  -list_transform([{bin_counts}], bc ->
    {FOLD(T('range(1, 11)',
            'b -> CASE WHEN bc[b] > 0 THEN (bc[b] / nf) * ln(bc[b] / nf) '
            'ELSE 0.0 END'))})[1]
END"""
    # sample entropy (m=2, r=0.2*std); windows truncated to n-m
    d2 = ("greatest(abs(ys[i] - ys[j]), abs(ys[i + 1] - ys[j + 1]))")
    d3 = ("greatest(abs(ys[i] - ys[j]), abs(ys[i + 1] - ys[j + 1]), "
          "abs(ys[i + 2] - ys[j + 2]))")
    cm2 = FOLD(T("range(1, n - 1)",
                 f"i -> CAST(len(list_filter(range(i + 1, n - 1), "
                 f"j -> {d2} <= 0.2 * std)) AS DOUBLE)"))
    cm3 = FOLD(T("range(1, n - 2)",
                 f"i -> CAST(len(list_filter(range(i + 1, n - 2), "
                 f"j -> {d3} <= 0.2 * std)) AS DOUBLE)"))
    feats["sample_entropy"] = f"""
CASE WHEN 0.2 * std <= 0 OR n < 3 THEN 'NaN'::DOUBLE ELSE
  list_transform([{cm2}], cm ->
    list_transform([{cm3}], cm1 ->
      CASE WHEN cm = 0 OR cm1 = 0
                OR (n - 2) * (n - 3) // 2 = 0
                OR (n - 3) * (n - 4) // 2 = 0 THEN 'NaN'::DOUBLE
           WHEN cm / ((n - 2) * (n - 3) // 2) <= 0
                OR cm1 / ((n - 3) * (n - 4) // 2) <= 0 THEN 'NaN'::DOUBLE
           ELSE -ln((cm1 / ((n - 3) * (n - 4) // 2))
                    / (cm / ((n - 2) * (n - 3) // 2))) END)[1])[1]
END"""
    # approximate entropy (m=2, full windows, self-matches included)
    a2 = ("greatest(abs(ys[i] - ys[jj]), abs(ys[i + 1] - ys[jj + 1]))")
    a3 = ("greatest(abs(ys[i] - ys[jj]), abs(ys[i + 1] - ys[jj + 1]), "
          "abs(ys[i + 2] - ys[jj + 2]))")
    phi2 = FOLD(T("range(1, n)",
                  f"i -> ln(CAST(len(list_filter(range(1, n), "
                  f"jj -> {a2} <= 0.2 * std)) AS DOUBLE) / (n - 1))")) + " / (n - 1)"
    phi3 = FOLD(T("range(1, n - 1)",
                  f"i -> ln(CAST(len(list_filter(range(1, n - 1), "
                  f"jj -> {a3} <= 0.2 * std)) AS DOUBLE) / (n - 2))")) + " / (n - 2)"
    feats["approximate_entropy"] = f"""
CASE WHEN 0.2 * std <= 0 OR n < 3 THEN 'NaN'::DOUBLE
     ELSE ({phi2}) - ({phi3}) END"""
    # permutation entropy (order 3, stable argsort via (value, index) sort)
    pid = ("list_transform([list_sort([{'v': ys[t], 'i': 0}, "
           "{'v': ys[t + 1], 'i': 1}, {'v': ys[t + 2], 'i': 2}])], ss -> "
           "ss[1].i * 9 + ss[2].i * 3 + ss[3].i)[1]")
    feats["permutation_entropy"] = f"""
CASE WHEN n < 3 THEN 'NaN'::DOUBLE ELSE
  list_transform([{T('range(1, n - 1)', f't -> {pid}')}], pids ->
    list_transform([CAST(len(pids) AS DOUBLE)], ct ->
      -{FOLD('''list_transform(list_sort(list_distinct(pids)), pp ->
        list_transform([CAST(len(list_filter(pids, q -> q = pp))
                        AS DOUBLE) / ct], p -> p * ln(p))[1])''')}
      / {_MAX_ENT3!r})[1])[1]
END"""
    for r in (1, 2, 3):
        feats[f"ratio_beyond_r_sigma_{r}"] = (
            f"CAST(len(list_filter(ys, v -> abs(v - mean) > {r} * std)) "
            f"AS DOUBLE) / nf")
    # unique-value stats (ul sorted unique, cl matching counts)
    feats["count_unique"] = "CAST(len(ul) AS DOUBLE)"
    feats["ratio_value_number_to_length"] = "CAST(len(ul) AS DOUBLE) / nf"
    feats["has_duplicate"] = (
        "CASE WHEN len(list_filter(cl, c -> c > 1)) > 0 THEN 1.0 ELSE 0.0 END")
    feats["has_duplicate_max"] = (
        "CASE WHEN len(list_filter(ys, v -> v = mx)) > 1 THEN 1.0 ELSE 0.0 END")
    feats["has_duplicate_min"] = (
        "CASE WHEN len(list_filter(ys, v -> v = mn)) > 1 THEN 1.0 ELSE 0.0 END")
    feats["percentage_of_reoccurring_datapoints_to_all_datapoints"] = (
        FOLD(T("range(1, len(ul) + 1)",
               "k -> CASE WHEN cl[k] > 1 THEN cl[k] ELSE 0.0 END")) + " / nf")
    feats["percentage_of_reoccurring_values_to_all_values"] = (
        "CAST(len(list_filter(cl, c -> c > 1)) AS DOUBLE) "
        "/ greatest(len(ul), 1)")
    feats["sum_of_reoccurring_values"] = FOLD(
        T("range(1, len(ul) + 1)",
          "k -> CASE WHEN cl[k] > 1 THEN ul[k] ELSE 0.0 END"))
    feats["sum_of_reoccurring_datapoints"] = FOLD(
        T("range(1, len(ul) + 1)",
          "k -> CASE WHEN cl[k] > 1 THEN ul[k] * cl[k] ELSE 0.0 END"))
    for lag in (1, 2, 3):
        trv = FOLD(T(f"range(1, n - {2 * lag} + 1)",
                     f"t -> ys[t + {2 * lag}] * ys[t + {2 * lag}] "
                     f"* ys[t + {lag}] - ys[t + {lag}] "
                     f"* (ys[t] * ys[t])"))
        c3v = FOLD(T(f"range(1, n - {2 * lag} + 1)",
                     f"t -> ys[t + {2 * lag}] * ys[t + {lag}] * ys[t]"))
        feats[f"time_reversal_asymmetry_stat_{lag}"] = (
            f"CASE WHEN n > {2 * lag} THEN ({trv}) / (n - {2 * lag}) "
            f"ELSE 'NaN'::DOUBLE END")
        feats[f"c3_lag{lag}"] = (
            f"CASE WHEN n > {2 * lag} THEN ({c3v}) / (n - {2 * lag}) "
            f"ELSE 'NaN'::DOUBLE END")
    for lag in range(1, 11):
        feats[f"autocorrelation_lag{lag}"] = acf(lag)
    feats["partial_autocorrelation_lag1"] = (
        f"CASE WHEN n > 2 THEN {acf(1)} ELSE 'NaN'::DOUBLE END")
    pacf2 = (f"list_transform([{acf(1)}], a1 -> "
             f"list_transform([{acf(2)}], a2 -> "
             f"CASE WHEN abs(1.0 - a1 * a1) < {EPSR} THEN 0.0 "
             f"ELSE (a2 - a1 * a1) / (1.0 - a1 * a1) END)[1])[1]")
    for lag in range(2, 6):
        feats[f"partial_autocorrelation_lag{lag}"] = (
            f"CASE WHEN n > {lag + 1} THEN {pacf2} ELSE 'NaN'::DOUBLE END")
    # fft coefficients (explicit DFT; drift vs np.fft pinned at 9 decimals)
    for k in range(10):
        re_k = FOLD(T("range(1, n + 1)",
                      f"t -> ys[t] * cos({TP} * {k} * (t - 1) / nf)")) + " / nf"
        # `+ 0.0` normalizes IEEE signed zero: for k=0 the fold is exactly
        # 0.0 and the leading negation yields -0.0, which DuckDB's round()
        # preserves while np.fft emits +0.0 — the one cell that broke the
        # r4 features_full hash. -0.0 + 0.0 == +0.0 restores bit parity.
        im_k = ("(-(" + FOLD(T("range(1, n + 1)",
                               f"t -> ys[t] * sin({TP} * {k} * (t - 1) / nf)"))
                + ") / nf + 0.0)")
        feats[f"fft_coefficient_{k}_real"] = (
            f"CASE WHEN {k} < n THEN {re_k} ELSE 'NaN'::DOUBLE END")
        feats[f"fft_coefficient_{k}_imag"] = (
            f"CASE WHEN {k} < n THEN {im_k} ELSE 'NaN'::DOUBLE END")
        feats[f"fft_coefficient_{k}_abs"] = f"""
CASE WHEN {k} < n THEN list_transform([{re_k}], rr ->
  list_transform([{im_k}], ii -> sqrt(rr * rr + ii * ii))[1])[1]
ELSE 'NaN'::DOUBLE END"""
    # spectral centroid / variance over the full power spectrum
    pw = T("range(0, n)", f"""k ->
      list_transform([{FOLD(T('range(1, n + 1)',
          f't -> ys[t] * cos({TP} * k * (t - 1) / nf)'))} / nf], rr ->
        list_transform([-({FOLD(T('range(1, n + 1)',
            f't -> ys[t] * sin({TP} * k * (t - 1) / nf)'))}) / nf], ii ->
          rr * rr + ii * ii)[1])[1]""")
    feats["spectral_centroid"] = f"""
list_transform([{pw}], pwl ->
  list_transform([{FOLD('pwl')}], tot ->
    CASE WHEN tot > {EPSR} THEN
      {FOLD(T('range(1, n + 1)', 'k -> (k - 1) * pwl[k]'))} / tot
    ELSE 0.0 END)[1])[1]"""
    feats["spectral_variance"] = f"""
list_transform([{pw}], pwl ->
  list_transform([{FOLD('pwl')}], tot ->
    CASE WHEN tot > {EPSR} THEN
      list_transform([{FOLD(T('range(1, n + 1)', 'k -> (k - 1) * pwl[k]'))}
                      / tot], cen ->
        {FOLD(T('range(1, n + 1)',
                'k -> ((k - 1) - cen) * ((k - 1) - cen) * pwl[k]'))}
        / tot)[1]
    ELSE 0.0 END)[1])[1]"""
    # aggregate (chunked) linear trend
    agg_pre = f"""ag AS (SELECT *, greatest(n // 10, 2) AS cln FROM lt2),
ag2 AS (SELECT *,
  list_transform(range(0, (n + cln - 1) // cln), ci ->
    {FOLD("list_slice(ys, ci * cln + 1, least((ci + 1) * cln, n))")}
    / len(list_slice(ys, ci * cln + 1, least((ci + 1) * cln, n)))) AS ml
  FROM ag),
ag3 AS (SELECT *, len(ml) AS m2, CAST(len(ml) AS DOUBLE) AS mf FROM ag2),
ag4 AS (SELECT *,
  CAST(m2 * (m2 - 1) // 2 AS DOUBLE) / mf AS axm,
  {FOLD('ml')} / mf AS aym FROM ag3),
ag5 AS (SELECT *,
  {FOLD(T('range(1, m2 + 1)', 't -> ((t - 1) - axm) * (ml[t] - aym)'))}
    AS ass_xy,
  {FOLD(T('range(1, m2 + 1)', 't -> ((t - 1) - axm) * ((t - 1) - axm)'))}
    AS ass_xx,
  {FOLD(T('range(1, m2 + 1)', 't -> (ml[t] - aym) * (ml[t] - aym)'))}
    AS ass_yy
  FROM ag4),
ag6 AS (SELECT *,
  CASE WHEN m2 < 2 THEN 0.0
       WHEN ass_xx > {EPSR} THEN ass_xy / ass_xx ELSE 0.0 END AS aslope,
  CASE WHEN m2 < 2 THEN coalesce(ml[1], 0.0)
       ELSE aym - (CASE WHEN ass_xx > {EPSR} THEN ass_xy / ass_xx
                        ELSE 0.0 END) * axm END AS aint
  FROM ag5)"""
    feats["agg_linear_trend_slope"] = (
        "CASE WHEN n >= cln THEN (CASE WHEN m2 < 2 THEN 0.0 ELSE aslope END) "
        "ELSE 0.0 END")
    feats["agg_linear_trend_intercept"] = (
        "CASE WHEN n >= cln THEN "
        "(CASE WHEN m2 < 2 THEN coalesce(ml[1], 0.0) ELSE aint END) "
        "ELSE 0.0 END")
    feats["agg_linear_trend_rvalue"] = (
        f"CASE WHEN n >= cln AND m2 >= 2 THEN "
        f"sqrt(CASE WHEN ass_xx > {EPSR} AND ass_yy > {EPSR} "
        f"THEN ass_xy * ass_xy / (ass_xx * ass_yy) ELSE 0.0 END) "
        f"ELSE 0.0 END")
    feats["agg_linear_trend_stderr"] = f"""
CASE WHEN n >= cln AND m2 > 2 AND ass_xx > {EPSR} THEN
  sqrt({FOLD(T('range(1, m2 + 1)',
               't -> (ml[t] - (aint + aslope * (t - 1))) '
               '* (ml[t] - (aint + aslope * (t - 1)))'))}
       / (m2 - 2) / ass_xx)
ELSE 0.0 END"""
    # lempel-ziv via recursive CTE on the binary string
    feats["lempel_ziv_complexity"] = "lzv"

    sel = ",\n  ".join(
        f"coalesce(({expr}), 'NaN'::DOUBLE) AS {name}"
        for name, expr in feats.items())
    return f"""
WITH RECURSIVE panel AS ({panel_sql}),
s AS (SELECT id, count(*) AS n, CAST(count(*) AS DOUBLE) AS nf,
             list(CAST(y AS DOUBLE) ORDER BY ds) AS ys
      FROM panel GROUP BY id),
b1 AS (SELECT *, {FOLD('ys')} AS s_sum, list_min(ys) AS mn,
              list_max(ys) AS mx, list_sort(ys) AS sv FROM s),
b2 AS (SELECT *, s_sum / nf AS mean FROM b1),
b3 AS (SELECT *,
         {FOLD("list_transform(ys, v -> (v - mean) * (v - mean))")} AS ssd,
         {FOLD("list_transform(ys, v -> v * v)")} AS aen,
         list_transform(range(2, n + 1), t -> ys[t] - ys[t - 1]) AS chl,
         list_sort(list_distinct(ys)) AS ul
       FROM b2),
core AS (SELECT *, ssd / nf AS var_, sqrt(ssd / nf) AS std,
           list_transform(ul, u ->
             CAST(len(list_filter(ys, v -> v = u)) AS DOUBLE)) AS cl
         FROM b3),
{lt_pre},
{agg_pre},
bs AS (SELECT id, n, nf,
         list_aggregate(list_transform(ys, v ->
           CASE WHEN v >= mean THEN '1' ELSE '0' END),
           'string_agg', '') AS bstr
       FROM core),
lz AS (
  SELECT id, n, nf, bstr, 1 AS l, 1 AS k, 1 AS kmax, 1 AS cpx
  FROM bs
  UNION ALL
  SELECT id, n, nf, bstr,
         CASE WHEN fnd THEN l ELSE l + kmax END,
         CASE WHEN fnd THEN k + 1 ELSE 1 END,
         CASE WHEN fnd THEN greatest(kmax, k + 1) ELSE 1 END,
         CASE WHEN fnd THEN cpx ELSE cpx + 1 END
  FROM (SELECT *, strpos(substr(bstr, 1, l + k - 1),
                         substr(bstr, l + 1, k)) > 0 AS fnd
        FROM lz WHERE l + k <= n)),
lzf AS (SELECT id,
          CASE WHEN n = 0 THEN 0.0
               WHEN log2(nf) > 0 THEN cpx / (nf / log2(nf))
               ELSE CAST(cpx AS DOUBLE) END AS lzv,
          row_number() OVER (PARTITION BY id ORDER BY l + k DESC) AS rk
        FROM lz QUALIFY rk = 1)
SELECT ag6.id AS id,
  {sel}
FROM ag6 JOIN lzf ON lzf.id = ag6.id
"""
