/* Optimizer objective hot loops, C twins of the pure-Python recursions in
 * models.py.  Called O(100) times per series fit (once per Nelder-Mead /
 * golden-section step), these loops dominate the Python-path forecast cost.
 *
 * BIT-IDENTITY CONTRACT: every function reproduces its Python twin's IEEE
 * double arithmetic exactly — same operations, same association order, same
 * branch conditions, glibc log/fabs on both sides.  Compiled with
 * -fno-fast-math -ffp-contract=off so no FMA contraction or reassociation
 * can change a single bit (verified by the cross-path property suite,
 * tests/test_r13_cfilters.py, and the oracle bit audits).  Guard wrappers
 * (isfinite -> 1e300 etc.) that the Python closures apply OUTSIDE the loop
 * stay in Python; guards INSIDE the recursion are replicated here.
 */

#include <math.h>

/* _ses_filter: one-step SES fit written into fitted[n]; returns the final
 * (one-more-step) level. */
double ses_filter(const double *y, long n, double alpha, double level,
                  double *fitted) {
    double one_a = 1.0 - alpha;
    fitted[0] = level;
    for (long t = 1; t < n; t++) {
        level = alpha * y[t - 1] + one_a * level;
        fitted[t] = level;
    }
    return alpha * y[n - 1] + one_a * level;
}

/* _ses_sse: SSE of the SES one-step fit, NaN residuals skipped. */
double ses_sse(const double *y, long n, double alpha) {
    double level = y[0];
    double r0 = y[0] - level;
    double s = (r0 == r0) ? r0 * r0 : 0.0;
    double one_a = 1.0 - alpha;
    for (long t = 1; t < n; t++) {
        level = alpha * y[t - 1] + one_a * level;
        double x = y[t] - level;
        if (x == x)
            s += x * x;
    }
    return s;
}

/* _holt.filt_sse: Holt level/trend recursion with in-loop SSE. */
double holt_sse(const double *y, long n, double a, double b, double ph) {
    double level = y[0];
    double trend = (n > 1) ? (y[1] - y[0]) : 0.0;
    double r0 = y[0] - level;
    double s = (r0 == r0) ? r0 * r0 : 0.0;
    double one_a = 1.0 - a;
    double one_b_ph = (1.0 - b) * ph;
    for (long t = 1; t < n; t++) {
        double f = level + ph * trend;
        double x = y[t] - f;
        if (x == x)
            s += x * x;
        double newl = a * y[t] + one_a * f;
        trend = b * (newl - level) * ph + one_b_ph * trend;
        level = newl;
    }
    return s;
}

/* _holt_winters.filt + _sq_err(y - fitted): additive (mult=0) or
 * multiplicative (mult=1) Holt-Winters one-step SSE.  seas0 is the
 * parameter-independent warm-up (length m), copied into seas_buf. */
double hw_sse(const double *y, long n, long m, int mult, double a, double b,
              double g, double level0, double trend0, const double *seas0,
              double *seas_buf) {
    double level = level0, trend = trend0;
    for (long i = 0; i < m; i++)
        seas_buf[i] = seas0[i];
    double one_a = 1.0 - a, one_b = 1.0 - b, one_g = 1.0 - g;
    double s = 0.0;
    if (mult) {
        for (long t = 0; t < n; t++) {
            long i = t % m;
            double sv = seas_buf[i];
            double lt = level + trend;
            double f = lt * sv;
            double r = y[t] - f;
            if (r == r)
                s += r * r;
            double yt = y[t];
            double newl = a * (sv != 0.0 ? yt / sv : yt) + one_a * lt;
            seas_buf[i] = g * (newl != 0.0 ? yt / newl : sv) + one_g * sv;
            trend = b * (newl - level) + one_b * trend;
            level = newl;
        }
    } else {
        for (long t = 0; t < n; t++) {
            long i = t % m;
            double sv = seas_buf[i];
            double lt = level + trend;
            double f = lt + sv;
            double r = y[t] - f;
            if (r == r)
                s += r * r;
            double yt = y[t];
            double newl = a * (yt - sv) + one_a * lt;
            seas_buf[i] = g * (yt - newl) + one_g * sv;
            trend = b * (newl - level) + one_b * trend;
            level = newl;
        }
    }
    return s;
}

/* _ets_mult.neg2ll: multiplicative-error innovations filter + -2logL.
 * seas_kind: 0 = N, 1 = A, 2 = M.  Returns the guarded objective value
 * (1e300 on a zero/non-finite mu, -1e300 on se <= 0, 1e300 on a
 * non-finite likelihood) exactly like the Python closure. */
double ets_mult_neg2ll(const double *y, long n, long m, int has_trend,
                       int seas_kind, double a, double b, double g, double ph,
                       double l0, double b0, const double *s0,
                       double *s_buf) {
    double level = l0, trend = b0;
    if (seas_kind)
        for (long i = 0; i < m; i++)
            s_buf[i] = s0[i];
    double se = 0.0, logsum = 0.0;
    for (long t = 0; t < n; t++) {
        double q = has_trend ? level + ph * trend : level;
        double m_t, sv = 0.0;
        if (seas_kind == 2) {
            sv = s_buf[t % m];
            m_t = q * sv;
        } else if (seas_kind == 1) {
            sv = s_buf[t % m];
            m_t = q + sv;
        } else {
            m_t = q;
        }
        if (m_t == 0.0 || !isfinite(m_t))
            return 1e300;
        double et = (y[t] - m_t) / m_t;
        se += et * et;
        logsum += log(fabs(m_t));
        if (seas_kind == 1) {
            level = q + a * m_t * et;
            if (has_trend)
                trend = ph * trend + b * m_t * et;
            s_buf[t % m] = sv + g * m_t * et;
        } else {
            level = q * (1.0 + a * et);
            if (has_trend)
                trend = ph * trend + b * q * et;
            if (seas_kind == 2)
                s_buf[t % m] = sv * (1.0 + g * et);
        }
    }
    if (se <= 0.0)
        return -1e300;
    double v = (double)n * log(se / (double)n) + 2.0 * logsum;
    return isfinite(v) ? v : 1e300;
}

/* _seasonal_es optimized sse: per-phase SES, NaN level = unseen phase
 * (a NaN observation re-seeds its phase), NaN residuals skipped. */
double seasonal_es_sse(const double *y, long n, long m, double a,
                       double *lv_buf) {
    for (long i = 0; i < m; i++)
        lv_buf[i] = NAN;
    double s = 0.0;
    double one_a = 1.0 - a;
    for (long t = 0; t < n; t++) {
        long ph = t % m;
        double lv = lv_buf[ph];
        if (lv != lv) {
            lv_buf[ph] = y[t];
        } else {
            double x = y[t] - lv;
            if (x == x)
                s += x * x;
            lv_buf[ph] = a * y[t] + one_a * lv;
        }
    }
    return s;
}

/* _arima_css.css + _seq_sum(e*e): CSS residual recursion, generic (p, q).
 * The Python steady-state unrolling is the same left-assoc chained
 * subtraction this loop performs, so the residuals are bit-identical.
 * e_buf has length n.  No NaN skip — _seq_sum propagates NaN. */
double arima_css_sse(const double *x, long n, long p, long q,
                     const double *phi, const double *th, double *e_buf) {
    double s = 0.0;
    for (long t = 0; t < n; t++) {
        double acc = x[t];
        for (long i = 0; i < p; i++)
            if (t - i - 1 >= 0)
                acc -= phi[i] * x[t - i - 1];
        for (long j = 0; j < q; j++)
            if (t - j - 1 >= 0)
                acc -= th[j] * e_buf[t - j - 1];
        e_buf[t] = acc;
        s += acc * acc;
    }
    return s;
}
