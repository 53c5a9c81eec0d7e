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
#include <string.h>

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

/* _theta objective: theta-line build + SES filter + theta-recombination
 * SSE in one pass.  Twin of the Python closure
 *     theta_line = th * x + (1 - th) * (b0 + b1 * t)
 *     fitted, _  = _ses_filter(theta_line, a)
 *     comb       = fitted / th + (1 - 1 / th) * (b0 + b1 * t)
 *     return _sq_err(x - comb)
 * Every elementwise numpy kernel above is a separate IEEE double op; the
 * fused loop performs the same ops in the same order per element (scalar
 * subexpressions 1-th, 1-1/th, 1-a precomputed exactly as Python does;
 * the trendline b0 + b1*t recomputed per use, same bits both times).
 * NaN residuals are skipped — a square is never -0.0, so skipping the
 * +0.0 addend matches _sq_err's where(isnan, 0, r*r) fold. */
double theta_sse(const double *x, long n, double b0, double b1,
                 double th, double a) {
    if (n <= 0)
        return 0.0;
    double one_th = 1.0 - th;
    double one_inv = 1.0 - 1.0 / th;
    double one_a = 1.0 - a;
    double tr = b0 + b1 * 0.0;
    double tl_prev = th * x[0] + one_th * tr;  /* theta_line[0] */
    double level = tl_prev;                    /* fitted[0] */
    double comb = level / th + one_inv * tr;
    double r = x[0] - comb;
    double s = (r == r) ? r * r : 0.0;
    for (long t = 1; t < n; t++) {
        level = a * tl_prev + one_a * level;   /* fitted[t] */
        tr = b0 + b1 * (double)t;
        tl_prev = th * x[t] + one_th * tr;     /* theta_line[t] */
        comb = level / th + one_inv * tr;
        r = x[t] - comb;
        if (r == r)
            s += r * r;
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

/* ------------------------------------------------------------------ */
/* Whole-optimizer drivers (r13 second pass).  models.nelder_mead and  */
/* models.golden_section are twinned here so the ENTIRE search loop —  */
/* bookkeeping plus objective — runs without crossing the ctypes       */
/* boundary per evaluation.  BIT-IDENTITY: every candidate point is    */
/* built from the same elementwise IEEE ops in the same order as the   */
/* Python twins; the index sort replicates CPython's list.sort()       */
/* (count_run + binary insertion, all comparisons `pivot < element`),  */
/* so the simplex ordering — and therefore the whole search            */
/* trajectory — matches for ANY float pattern, ties and NaN included.  */
/* ------------------------------------------------------------------ */

typedef double (*nm_obj_fn)(const double *x, void *ctx);
typedef double (*g_obj_fn)(double x, void *ctx);

static double nm_clip1(double v, double lo, double hi) {
    /* np.clip == minimum(maximum(v, lo), hi); simplex stays finite */
    return v < lo ? lo : (v > hi ? hi : v);
}

/* CPython listobject.c sort replica for k <= 64 (one run + binarysort):
 * count_run finds the initial ascending (a[i] >= a[i-1], i.e. NOT
 * a[i] < a[i-1]) or STRICTLY descending run (reversed in place), then
 * each later element is binary-inserted with the comparison
 * `pivot < a[mid]`.  Stable, and NaN-consistent with Python. */
static void nm_argsort(const double *fv, long *order, long k) {
    long run = 1;
    if (k > 1) {
        if (fv[order[1]] < fv[order[0]]) {        /* descending run */
            run = 2;
            while (run < k && fv[order[run]] < fv[order[run - 1]])
                run++;
            for (long i = 0, j = run - 1; i < j; i++, j--) {
                long t = order[i]; order[i] = order[j]; order[j] = t;
            }
        } else {                                   /* ascending run */
            run = 2;
            while (run < k && !(fv[order[run]] < fv[order[run - 1]]))
                run++;
        }
    }
    for (long start = run; start < k; start++) {
        long pivot = order[start];
        double pv = fv[pivot];
        long lo = 0, hi = start;
        while (lo < hi) {
            long mid = (lo + hi) >> 1;
            if (pv < fv[order[mid]])
                hi = mid;
            else
                lo = mid + 1;
        }
        for (long j = start; j > lo; j--)
            order[j] = order[j - 1];
        order[lo] = pivot;
    }
}

#define NM_MAXD 6

/* Twin of models.nelder_mead (bounds always given by the in-repo
 * callers; dim <= 5 in practice, sequential centroid path only). */
static void nm_run(nm_obj_fn f, void *ctx, long dim, const double *x0,
                   const double *los, const double *his, double tol,
                   long max_iter, double *out) {
    if (dim < 1 || dim > NM_MAXD) {
        /* fail closed: the stack buffers below are NM_MAXD-sized and the
         * Python call sites guard dim <= 6; if a future caller doesn't,
         * emit NaNs (loudly wrong) instead of overwriting the stack. */
        for (long j = 0; j < dim; j++)
            out[j] = NAN;
        return;
    }
    double simplex[NM_MAXD + 1][NM_MAXD];
    double fvals[NM_MAXD + 1];
    double tmp_s[NM_MAXD + 1][NM_MAXD], tmp_f[NM_MAXD + 1];
    long order[NM_MAXD + 1];
    long k = dim + 1;
    size_t row = (size_t)dim * sizeof(double);
    for (long j = 0; j < dim; j++)
        simplex[0][j] = nm_clip1(x0[j], los[j], his[j]);
    for (long i = 0; i < dim; i++) {
        for (long j = 0; j < dim; j++)
            simplex[i + 1][j] = x0[j];
        double v = x0[i];
        double pert = (v == 0.0) ? 0.1 : (0.1 * fabs(v) + 0.05);
        simplex[i + 1][i] = v + pert;
        for (long j = 0; j < dim; j++)
            simplex[i + 1][j] = nm_clip1(simplex[i + 1][j], los[j], his[j]);
    }
    for (long i = 0; i < k; i++)
        fvals[i] = f(simplex[i], ctx);
    long npts = k - 1;
    for (long it = 0; it < max_iter; it++) {
        for (long i = 0; i < k; i++)
            order[i] = i;
        nm_argsort(fvals, order, k);
        for (long i = 0; i < k; i++) {
            memcpy(tmp_s[i], simplex[order[i]], row);
            tmp_f[i] = fvals[order[i]];
        }
        for (long i = 0; i < k; i++) {
            memcpy(simplex[i], tmp_s[i], row);
            fvals[i] = tmp_f[i];
        }
        if (fabs(fvals[k - 1] - fvals[0]) < tol)
            break;
        double centroid[NM_MAXD], xr[NM_MAXD], xe[NM_MAXD], xc[NM_MAXD];
        for (long j = 0; j < dim; j++) {
            double s = simplex[0][j];
            for (long i = 1; i < k - 1; i++)
                s += simplex[i][j];
            centroid[j] = s / (double)npts;
        }
        for (long j = 0; j < dim; j++) {
            double c = centroid[j], w = simplex[k - 1][j];
            xr[j] = nm_clip1(c + (c - w), los[j], his[j]);
        }
        double fr = f(xr, ctx);
        if (fr < fvals[0]) {
            for (long j = 0; j < dim; j++) {
                double c = centroid[j], w = simplex[k - 1][j];
                xe[j] = nm_clip1(c + 2.0 * (c - w), los[j], his[j]);
            }
            double fe = f(xe, ctx);
            if (fe < fr) {
                memcpy(simplex[k - 1], xe, row);
                fvals[k - 1] = fe;
            } else {
                memcpy(simplex[k - 1], xr, row);
                fvals[k - 1] = fr;
            }
        } else if (fr < fvals[k - 2]) {
            memcpy(simplex[k - 1], xr, row);
            fvals[k - 1] = fr;
        } else {
            for (long j = 0; j < dim; j++) {
                double c = centroid[j], w = simplex[k - 1][j];
                xc[j] = nm_clip1(c + 0.5 * (w - c), los[j], his[j]);
            }
            double fc2 = f(xc, ctx);
            if (fc2 < fvals[k - 1]) {
                memcpy(simplex[k - 1], xc, row);
                fvals[k - 1] = fc2;
            } else {
                for (long i = 1; i < k; i++) {
                    for (long j = 0; j < dim; j++) {
                        double bv = simplex[0][j], sv = simplex[i][j];
                        simplex[i][j] = nm_clip1(bv + 0.5 * (sv - bv),
                                                 los[j], his[j]);
                    }
                }
                for (long i = 1; i < k; i++)
                    fvals[i] = f(simplex[i], ctx);
            }
        }
    }
    long best = 0;
    for (long i = 1; i < k; i++)
        if (fvals[i] < fvals[best])
            best = i;
    memcpy(out, simplex[best], row);
}

/* Twin of models.golden_section. */
static double golden_run(g_obj_fn f, void *ctx, double lo, double hi,
                         double tol, long max_iter) {
    double gr = (sqrt(5.0) - 1.0) / 2.0;
    double a = lo, b = hi;
    double c = b - gr * (b - a);
    double d = a + gr * (b - a);
    double fc = f(c, ctx), fd = f(d, ctx);
    for (long i = 0; i < max_iter; i++) {
        if (fabs(b - a) < tol)
            break;
        if (fc < fd) {
            b = d;
            d = c;
            fd = fc;
            c = b - gr * (b - a);
            fc = f(c, ctx);
        } else {
            a = c;
            c = d;
            fc = fd;
            d = a + gr * (b - a);
            fd = f(d, ctx);
        }
    }
    return (a + b) / 2.0;
}

/* ---- per-family drivers (objective guards exactly as the Python
 * closures at the corresponding models.py call sites) ---- */

typedef struct { const double *y; long n; double ph; } holt_ctx;
static double holt_obj(const double *x, void *cv) {
    holt_ctx *c = (holt_ctx *)cv;
    return holt_sse(c->y, c->n, x[0], x[1], c->ph);   /* raw, unguarded */
}
void nm_holt(const double *y, long n, double ph, double *out) {
    holt_ctx c = {y, n, ph};
    double x0[2] = {0.5, 0.1}, lo[2] = {0.01, 0.01}, hi[2] = {0.99, 0.99};
    nm_run(holt_obj, &c, 2, x0, lo, hi, 1e-6, 200, out);
}

typedef struct {
    const double *y; long n, m; int mult;
    double l0, t0; const double *s0; double *sbuf;
} hw_ctx;
static double hw_obj(const double *x, void *cv) {
    hw_ctx *c = (hw_ctx *)cv;
    double v = hw_sse(c->y, c->n, c->m, c->mult, x[0], x[1], x[2],
                      c->l0, c->t0, c->s0, c->sbuf);
    return isfinite(v) ? v : 1e300;
}
void nm_hw(const double *y, long n, long m, int mult, double l0, double t0,
           const double *s0, double *sbuf, double *out) {
    hw_ctx c = {y, n, m, mult, l0, t0, s0, sbuf};
    double x0[3] = {0.3, 0.05, 0.1};
    double lo[3] = {0.01, 0.01, 0.01}, hi[3] = {0.99, 0.99, 0.99};
    nm_run(hw_obj, &c, 3, x0, lo, hi, 1e-6, 200, out);
}

typedef struct {
    const double *y; long n, m; int has_trend, seas_kind, damped;
    double l0, b0; const double *s0; double *sbuf;
} ets_ctx;
static double ets_obj(const double *x, void *cv) {
    ets_ctx *c = (ets_ctx *)cv;
    long i = 0;
    double a = x[i++];
    double b = c->has_trend ? x[i++] : 0.0;
    double g = c->seas_kind ? x[i++] : 0.0;
    double ph = c->damped ? x[i] : 1.0;
    return ets_mult_neg2ll(c->y, c->n, c->m, c->has_trend, c->seas_kind,
                           a, b, g, ph, c->l0, c->b0, c->s0, c->sbuf);
}
long nm_ets(const double *y, long n, long m, int has_trend, int seas_kind,
            int damped, double l0, double b0, const double *s0,
            double *sbuf, double *out) {
    ets_ctx c = {y, n, m, has_trend, seas_kind, damped, l0, b0, s0, sbuf};
    double x0[4] = {0.3, 0, 0, 0}, lo[4] = {0.01, 0, 0, 0},
           hi[4] = {0.99, 0, 0, 0};
    long d = 1;
    if (has_trend) { x0[d] = 0.05; lo[d] = 0.01; hi[d] = 0.99; d++; }
    if (seas_kind) { x0[d] = 0.1;  lo[d] = 0.01; hi[d] = 0.99; d++; }
    if (damped)    { x0[d] = 0.95; lo[d] = 0.8;  hi[d] = 0.995; d++; }
    nm_run(ets_obj, &c, d, x0, lo, hi, 1e-6, 200, out);
    return d;
}

typedef struct { const double *x; long n, p, q; double *ebuf; } arima_ctx;
static double arima_obj(const double *prm, void *cv) {
    arima_ctx *c = (arima_ctx *)cv;
    double v = arima_css_sse(c->x, c->n, c->p, c->q, prm, prm + c->p,
                             c->ebuf);
    return isfinite(v) ? v : 1e300;
}
void nm_arima(const double *x, long n, long p, long q, const double *x0,
              double *ebuf, long max_iter, double *out) {
    arima_ctx c = {x, n, p, q, ebuf};
    double lo[NM_MAXD], hi[NM_MAXD];
    if (p < 0 || q < 0 || p + q < 1 || p + q > NM_MAXD) {
        for (long i = 0; i < p + q; i++)
            out[i] = NAN;
        return;
    }
    for (long i = 0; i < p + q; i++) { lo[i] = -0.99; hi[i] = 0.99; }
    nm_run(arima_obj, &c, p + q, x0, lo, hi, 1e-6, max_iter, out);
}

typedef struct { const double *x; long n; double b0, b1; } theta_ctx;
static double theta_obj(const double *x, void *cv) {
    theta_ctx *c = (theta_ctx *)cv;
    return theta_sse(c->x, c->n, c->b0, c->b1, x[0], x[1]);  /* raw */
}
void nm_theta(const double *x, long n, double b0, double b1, double *out) {
    theta_ctx c = {x, n, b0, b1};
    double x0[2] = {2.0, 0.3}, lo[2] = {1.0, 0.01}, hi[2] = {5.0, 0.99};
    nm_run(theta_obj, &c, 2, x0, lo, hi, 1e-6, 200, out);
}

/* golden-section drivers (tol/max_iter = the Python defaults 1e-5/100) */

typedef struct { const double *y; long n; } ses_ctx;
static double ses_gobj(double a, void *cv) {
    ses_ctx *c = (ses_ctx *)cv;
    return ses_sse(c->y, c->n, a);
}
double golden_ses(const double *y, long n) {
    ses_ctx c = {y, n};
    return golden_run(ses_gobj, &c, 0.01, 0.99, 1e-5, 100);
}

typedef struct { const double *y; long n, m; double *lvbuf; } se_ctx;
static double se_gobj(double a, void *cv) {
    se_ctx *c = (se_ctx *)cv;
    return seasonal_es_sse(c->y, c->n, c->m, a, c->lvbuf);
}
double golden_seasonal_es(const double *y, long n, long m, double *lvbuf) {
    se_ctx c = {y, n, m, lvbuf};
    return golden_run(se_gobj, &c, 0.01, 0.99, 1e-5, 100);
}

typedef struct { const double *x; long n; double b0, b1, th; } thg_ctx;
static double theta_gobj(double a, void *cv) {
    thg_ctx *c = (thg_ctx *)cv;
    return theta_sse(c->x, c->n, c->b0, c->b1, c->th, a);
}
double golden_theta(const double *x, long n, double b0, double b1,
                    double th) {
    thg_ctx c = {x, n, b0, b1, th};
    return golden_run(theta_gobj, &c, 0.01, 0.99, 1e-5, 100);
}

/* croston optimized: sse(a) = sse(sizes fit) + sse(intervals fit); each
 * leg equals _sq_err(y - _ses_filter(y, a)[0]) == ses_sse (the existing
 * twin), summed with one double add like the Python closure. */
typedef struct { const double *sz; long ns; const double *iv; long ni; } cr_ctx;
static double cr_gobj(double a, void *cv) {
    cr_ctx *c = (cr_ctx *)cv;
    return ses_sse(c->sz, c->ns, a) + ses_sse(c->iv, c->ni, a);
}
double golden_croston(const double *sz, long ns, const double *iv, long ni) {
    cr_ctx c = {sz, ns, iv, ni};
    return golden_run(cr_gobj, &c, 0.01, 0.99, 1e-5, 100);
}

/* ---- final (post-optimization) filter passes: the same recursions as
 * the *_sse objectives above but storing the trajectories, twinning the
 * models.py `filt` closures exactly ---- */

/* _log_abs_sum: sequential sum of ln|mu_t| (glibc log both sides).
 * mu never contains +-0 on the call paths (the filters abort on
 * m_t == 0 first), so Python's math.log(0) ValueError is unreachable. */
double log_abs_sum(const double *mu, long n) {
    double s = 0.0;
    for (long t = 0; t < n; t++)
        s += log(fabs(mu[t]));
    return s;
}

/* _holt.filt: stores fitted[n]; state[0] = final level, state[1] = final
 * trend. */
void holt_filt(const double *y, long n, double a, double b, double ph,
               double *fitted, double *state) {
    double level = y[0];
    double trend = (n > 1) ? (y[1] - y[0]) : 0.0;
    fitted[0] = level;
    double one_a = 1.0 - a;
    double one_b_ph = (1.0 - b) * ph;
    for (long t = 1; t < n; t++) {
        double f = level + ph * trend;
        fitted[t] = f;
        double newl = a * y[t] + one_a * f;
        trend = b * (newl - level) * ph + one_b_ph * trend;
        level = newl;
    }
    state[0] = level;
    state[1] = trend;
}

/* _holt_winters.filt: stores fitted[n]; seas_buf ends as the final
 * seasonal state; state[0]/state[1] = final level/trend. */
void hw_filt(const double *y, long n, long m, int mult, double a, double b,
             double g, double level0, double trend0, const double *seas0,
             double *seas_buf, double *fitted, double *state) {
    double level = level0, trend = trend0;
    for (long i = 0; i < m; i++)
        seas_buf[i] = seas0[i];
    double one_a = 1.0 - a, one_b = 1.0 - b, one_g = 1.0 - g;
    if (mult) {
        for (long t = 0; t < n; t++) {
            long i = t % m;
            double sv = seas_buf[i];
            double lt = level + trend;
            fitted[t] = lt * sv;
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
            fitted[t] = lt + sv;
            double yt = y[t];
            double newl = a * (yt - sv) + one_a * lt;
            seas_buf[i] = g * (yt - newl) + one_g * sv;
            trend = b * (newl - level) + one_b * trend;
            level = newl;
        }
    }
    state[0] = level;
    state[1] = trend;
}

/* _ets_mult.filt: stores mu[n], e[n]; s_buf ends as the final seasonal
 * state; state[0]/state[1] = final level/trend.  Returns 1 on the early
 * abort (m_t == 0 or non-finite — the Python closure's None return),
 * 0 on success. */
long ets_mult_filt(const double *y, long n, long m, int has_trend,
                   int seas_kind, double a, double b, double g, double ph,
                   double l0, double b0, const double *s0, double *s_buf,
                   double *mu, double *e, double *state) {
    double level = l0, trend = b0;
    if (seas_kind)
        for (long i = 0; i < m; i++)
            s_buf[i] = s0[i];
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
            return 1;
        mu[t] = m_t;
        double et = (y[t] - m_t) / m_t;
        e[t] = et;
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
    state[0] = level;
    state[1] = trend;
    return 0;
}

/* _seasonal_es.filt: per-phase SES storing fitted[n] (NaN during each
 * phase's warm-up); lv_buf ends as the final per-phase levels. */
void seasonal_es_filt(const double *y, long n, long m, double a,
                      double *fitted, double *lv_buf) {
    for (long i = 0; i < m; i++)
        lv_buf[i] = NAN;
    double one_a = 1.0 - a;
    for (long t = 0; t < n; t++) {
        long ph = t % m;
        double lv = lv_buf[ph];
        if (lv != lv) {
            lv_buf[ph] = y[t];
            fitted[t] = NAN;
        } else {
            fitted[t] = lv;
            lv_buf[ph] = a * y[t] + one_a * lv;
        }
    }
}
