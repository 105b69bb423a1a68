// Native CPU geodesic engine for raytrace_tpu.
//
// An independent C++ implementation of the same Kerr null-geodesic march the
// JAX integrators perform (semi-analytic momenta from the conserved
// (k, h, Q), Euler/RK4/DOPRI5 position updates, turning-point sign gates,
// polar reflection, disc/horizon/escape termination). It serves two purposes:
//   1. a cross-language validation oracle for the JAX/Pallas paths — a
//      systematic error in one implementation will not reproduce in the
//      other. The adaptive DOPRI5 controller and the destination clamps are
//      covered too, since those are the highest-risk code paths;
//   2. a fast multithreaded CPU fallback (OpenMP over rays) for machines
//      without accelerators — the niche the reference's OpenMP loop filled.
//
// The physics follows the equations documented in raytrace_tpu.geometry.kerr
// (Carter-separated Kerr geodesics in Boyer-Lindquist coordinates); written
// from those formulas, not a translation of any other code. Floating-point
// op order mirrors raytrace_tpu.ops.integrate bit-for-bit so non-chaotic
// rays agree to machine precision (tests/test_native.py).
//
// C ABI, struct-of-arrays in/out, driven through ctypes
// (raytrace_tpu/native/__init__.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>

namespace {

constexpr int STATUS_DEST = 1 << 0;
constexpr int STATUS_HORIZON = 1 << 1;
constexpr int STATUS_RLIM = 1 << 2;
constexpr int STATUS_STEPLIM = 1 << 3;
constexpr int STATUS_ERGO = 1 << 4;
constexpr int STATUS_NEG_ENERGY = 1 << 5;
constexpr int STATUS_NUMERIC = 1 << 6;  // rates over/underflowed the dtype

struct Ctrl {
  double precision;
  double theta_precision;
  double max_tstep;
  double maxtstep_rlim;
  double max_phistep;
  double min_step;
  double rk45_tol;
  double horizon_eps;
  double safety;
  double fac_min;
  double fac_max;
};

// Destination surface (destinations.py). r_isco < 0 selects the plain
// ThetaLimit surface; r_isco >= 0 selects DiscWithISCO: the theta surface
// gated on the r_isco <= r (<= r_out) annulus, crossable from either side.
struct Dest {
  double theta_lim;
  double r_isco;
  double r_out;

  bool is_theta_limit() const { return r_isco < 0; }

  bool in_annulus(double r) const {
    return r >= r_isco && (r_out <= 0 || r <= r_out);
  }

  bool reached(double r, double th, double prev_th) const {
    if (r_isco >= 0) {
      const double lim = theta_lim > 0 ? theta_lim : -theta_lim;
      const bool crossed =
          (prev_th < lim && th >= lim) || (prev_th > lim && th <= lim);
      return in_annulus(r) && crossed && theta_lim != 0;
    }
    return (theta_lim > 0 && th >= theta_lim) ||
           (theta_lim < 0 && th <= -theta_lim);
  }

  // Parameter distance to the surface along ptheta (inf when not closing in
  // on it); mirrors ThetaLimit.step_limit / DiscWithISCO.step_limit.
  double step_limit(double r, double th, double ptheta) const {
    const double tl = theta_lim;
    const double inf = std::numeric_limits<double>::infinity();
    double lim = inf;
    if (tl > 0 && ptheta > 0 && th < tl)
      lim = (tl - th) / ptheta;
    else if (tl < 0 && ptheta < 0 && th > -tl)
      lim = (-tl - th) / ptheta;
    if (r_isco >= 0 && !in_annulus(r)) lim = inf;
    return lim;
  }
};

struct Rates {
  double pt, pr, ptheta, pphi;
  double thetadot_sq, rdot_sq;
  double sin_t, inv_rhosq;
};

// num / den with |den| floored at the smallest normal (ops/integrate.py
// _safe_div) — fp-identical to a plain division for every normal denominator.
inline double safe_div(double num, double den) {
  const double t = std::numeric_limits<double>::min();
  const double s = std::fabs(den) < t ? (den < 0 ? -t : t) : den;
  return num / s;
}

inline Rates rates_at(double r, double theta, double k, double h, double Q,
                      double rdot_sign, double thetadot_sign, double a) {
  const double st = std::sin(theta), ct = std::cos(theta);
  // sin^2 floored at the smallest normal, mirroring geometry/kerr.py (keeps
  // pt/pr finite for h = 0 axis evaluations; no physical ray is affected)
  const double s2 = std::max(st * st, std::numeric_limits<double>::min());
  const double rhosq = r * r + a * a * ct * ct;
  const double delta = r * r - 2.0 * r + a * a;
  // op order mirrors geometry/kerr.py geodesic_rates exactly (fp-level
  // cross-language agreement, tests/test_native.py)
  const double rd = rhosq * delta;
  const double inv_all = 1.0 / (rd * s2);
  const double inv_rd = inv_all * s2;
  const double inv_s2 = inv_all * rd;
  const double inv_rhosq = delta * inv_rd;

  Rates o;
  o.pt = ((rhosq * (r * r + a * a) + 2.0 * a * a * r * s2) * k - 2.0 * a * r * h) * inv_rd;
  o.pphi = (2.0 * a * r * s2 * k + (rhosq - 2.0 * r) * h) * inv_all;

  // (k a cos + h cos/sin)(k a cos - h cos/sin) = cos^2 (k^2 a^2 - h^2/sin^2)
  const double c2 = ct * ct;
  const double ka = k * a;
  o.thetadot_sq = (Q + c2 * (ka * ka - h * h * inv_s2)) * (inv_rhosq * inv_rhosq);
  o.ptheta = std::sqrt(std::fabs(o.thetadot_sq)) * thetadot_sign;

  o.rdot_sq = (k * o.pt - h * o.pphi - rhosq * o.ptheta * o.ptheta) * (delta * inv_rhosq);
  o.pr = std::sqrt(std::fabs(o.rdot_sq)) * rdot_sign;
  o.sin_t = st;
  o.inv_rhosq = inv_rhosq;
  return o;
}

inline void momentum_only(double r, double theta, double k, double h, double Q,
                          double rdot_sign, double thetadot_sign, double a,
                          double* pt, double* pr, double* pth, double* pph) {
  const Rates o = rates_at(r, theta, k, h, Q, rdot_sign, thetadot_sign, a);
  *pt = o.pt;
  *pr = o.pr;
  *pth = o.ptheta;
  *pph = o.pphi;
}

// ERGO (p^t <= 0) / negative-Killing-energy diagnostics on an advancing
// lane (ops/integrate.py _nonphysical_status).
inline void flag_nonphysical(double r, double a, const Rates& k1, double pt1,
                             int32_t& status) {
  if (pt1 <= 0) status |= STATUS_ERGO;
  const double killing =
      (1.0 - 2.0 * r * k1.inv_rhosq) * pt1 +
      (2.0 * a * r * k1.sin_t * k1.sin_t * k1.inv_rhosq) * k1.pphi;
  if (killing < 0) status |= STATUS_NEG_ENERGY;
}

// Horizon-capture shell with the 200-ulp floor (ops/integrate.py _commit):
// inert in f64 (horizon_eps = 1e-6 dominates) but kept for exact mirroring.
inline double capture_radius(double horizon, double horizon_eps) {
  const double eps_eff = std::max(
      horizon_eps, 200.0 * std::numeric_limits<double>::epsilon());
  return horizon * (1.0 + eps_eff);
}

// One ray, RK4 (or Euler when rk4 == 0), with the same step heuristic,
// destination clamp (ThetaLimit only — destination mode has no clamp, the
// reference's RK4-dest propagator difference) and sign semantics as the JAX
// path (ops/integrate.py _euler_rk4_body).
void march_ray(int rk4, double a, double horizon, double r_lim,
               const Dest& dest, int steplim, const Ctrl& c,
               double& t, double& r, double& theta, double& phi,
               double k, double h, double Q,
               double& rdot_sign, double& thetadot_sign,
               int32_t& steps, int32_t& status,
               int32_t& rdot_flips, int32_t& eq_cross) {
  bool r_was_positive = false;
  bool theta_was_positive = true;
  const double capture = capture_radius(horizon, c.horizon_eps);

  int n = 0;
  while (n < steplim) {
    ++n;

    Rates k1 = rates_at(r, theta, k, h, Q, rdot_sign, thetadot_sign, a);

    if (k1.thetadot_sq < 0 && theta_was_positive) {
      thetadot_sign = -thetadot_sign;
      theta_was_positive = false;
      continue;
    }
    theta_was_positive = k1.thetadot_sq >= 0;

    if (k1.rdot_sq <= 0 && r_was_positive) {
      rdot_sign = -rdot_sign;
      r_was_positive = false;
      ++rdot_flips;
      k1.pr = -k1.pr;
    } else if (k1.rdot_sq > 0) {
      r_was_positive = true;
    }

    // numerically dead: no step size can fix non-finite rates at the
    // current position (ops/integrate.py _k1_finite)
    if (!(std::isfinite(k1.pt) && std::isfinite(k1.pr) &&
          std::isfinite(k1.ptheta) && std::isfinite(k1.pphi))) {
      status |= STATUS_NUMERIC;
      break;
    }

    flag_nonphysical(r, a, k1, k1.pt, status);

    // step heuristic (_base_step_size)
    double step = std::fabs(safe_div(r - horizon, k1.pr)) / c.precision;
    const double theta_cap = std::fabs(safe_div(theta, k1.ptheta));
    if (step > theta_cap / c.precision) step = theta_cap / c.theta_precision;
    if (c.max_tstep > 0 && r < c.maxtstep_rlim) {
      const double tc = std::fabs(safe_div(c.max_tstep, k1.pt));
      if (step > tc) step = tc;
    }
    if (c.max_phistep > 0) {
      const double pc = std::fabs(safe_div(c.max_phistep, k1.pphi));
      if (step > pc) step = pc;
    }
    if (step < c.min_step) step = c.min_step;
    if (r_lim > 0 && r + k1.pr * step > r_lim)
      step = std::fabs(safe_div(r_lim - r, k1.pr));
    // the plain thetalim mode clamps the final step onto the surface;
    // destination mode does not
    if (dest.is_theta_limit())
      step = std::min(step, dest.step_limit(r, theta, k1.ptheta));

    double dt_, dr_, dth_, dph_;
    if (rk4) {
      double pt2, pr2, pth2, pph2, pt3, pr3, pth3, pph3, pt4, pr4, pth4, pph4;
      const double hh = step / 2.0;
      momentum_only(r + hh * k1.pr, theta + hh * k1.ptheta, k, h, Q, rdot_sign,
                    thetadot_sign, a, &pt2, &pr2, &pth2, &pph2);
      momentum_only(r + hh * pr2, theta + hh * pth2, k, h, Q, rdot_sign,
                    thetadot_sign, a, &pt3, &pr3, &pth3, &pph3);
      momentum_only(r + step * pr3, theta + step * pth3, k, h, Q, rdot_sign,
                    thetadot_sign, a, &pt4, &pr4, &pth4, &pph4);
      const double w = step / 6.0;
      dt_ = w * (k1.pt + 2 * pt2 + 2 * pt3 + pt4);
      dr_ = w * (k1.pr + 2 * pr2 + 2 * pr3 + pr4);
      dth_ = w * (k1.ptheta + 2 * pth2 + 2 * pth3 + pth4);
      dph_ = w * (k1.pphi + 2 * pph2 + 2 * pph3 + pph4);
    } else {
      dt_ = step * k1.pt;
      dr_ = step * k1.pr;
      dth_ = step * k1.ptheta;
      dph_ = step * k1.pphi;
    }

    const double theta_prev = theta;
    t += dt_;
    r += dr_;
    theta += dth_;
    phi += dph_;

    // polar reflection
    if (theta < 0) {
      theta = -theta;
      thetadot_sign = -thetadot_sign;
      phi += M_PI;
    } else if (theta > M_PI) {
      theta = 2 * M_PI - theta;
      thetadot_sign = -thetadot_sign;
      phi += M_PI;
    }
    if ((theta_prev < M_PI_2 && theta >= M_PI_2) ||
        (theta_prev > M_PI_2 && theta <= M_PI_2))
      ++eq_cross;

    // termination, in _commit's precedence order
    if (r <= capture) {
      status |= STATUS_HORIZON;
      break;
    }
    if (r_lim > 0 && r >= r_lim) {
      status |= STATUS_RLIM;
      break;
    }
    if (dest.reached(r, theta, theta_prev)) {
      status |= STATUS_DEST;
      break;
    }
  }
  steps += n;
  if (n >= steplim &&
      !(status & (STATUS_DEST | STATUS_HORIZON | STATUS_RLIM)))
    status |= STATUS_STEPLIM;
  if ((status & (STATUS_STEPLIM | STATUS_NUMERIC)) && steps > 0)
    steps = -steps;
}

// ---------------------------------------------------------------------------
// DOPRI5 tableau (Dormand & Prince 1980), matching ops/integrate.py.
// ---------------------------------------------------------------------------
constexpr double A21 = 1.0 / 5;
constexpr double A31 = 3.0 / 40, A32 = 9.0 / 40;
constexpr double A41 = 44.0 / 45, A42 = -56.0 / 15, A43 = 32.0 / 9;
constexpr double A51 = 19372.0 / 6561, A52 = -25360.0 / 2187,
                 A53 = 64448.0 / 6561, A54 = -212.0 / 729;
constexpr double A61 = 9017.0 / 3168, A62 = -355.0 / 33,
                 A63 = 46732.0 / 5247, A64 = 49.0 / 176,
                 A65 = -5103.0 / 18656;
constexpr double B1 = 35.0 / 384, B3 = 500.0 / 1113, B4 = 125.0 / 192,
                 B5 = -2187.0 / 6784, B6 = 11.0 / 84;
constexpr double E1 = 71.0 / 57600, E3 = -71.0 / 16695, E4 = 71.0 / 1920,
                 E5 = -17253.0 / 339200, E6 = 22.0 / 525, E7 = -1.0 / 40;

// Initial adaptive step from the fixed-step heuristic
// (ops/integrate.py _seed_rk45_step).
double seed_rk45_step(double r, double theta, double k, double h, double Q,
                      double rdot_sign, double thetadot_sign, double a,
                      double horizon, const Ctrl& c) {
  const Rates o = rates_at(r, theta, k, h, Q, rdot_sign, thetadot_sign, a);
  double step = std::fabs((r - horizon) / o.pr) / c.precision;
  const double theta_cap = std::fabs(theta / o.ptheta);
  if (std::fabs(o.ptheta) > 0 && step > theta_cap / c.theta_precision)
    step = theta_cap / c.theta_precision;
  if (c.max_tstep > 0 && r < c.maxtstep_rlim) {
    const double tc = std::fabs(c.max_tstep / o.pt);
    if (step > tc) step = tc;
  }
  if (c.max_phistep > 0) {
    const double pc = std::fabs(c.max_phistep / o.pphi);
    if (step > pc) step = pc;
  }
  return std::max(step, c.min_step);
}

// One ray, adaptive DOPRI5 with per-ray step carried in `step`: horizon
// step-cap, destination clamp (clamped accepted steps keep the old step),
// FSAL k7 error estimate, Hairer-Wanner controller, MIN_STEP force-accept —
// mirroring ops/integrate.py _rk45_body iteration for iteration.
void march_ray_rk45(double a, double horizon, double r_lim, const Dest& dest,
                    int steplim, int max_iters, const Ctrl& c,
                    double& t, double& r, double& theta, double& phi,
                    double k, double h, double Q,
                    double& rdot_sign, double& thetadot_sign, double& step,
                    int32_t& steps, int32_t& status,
                    int32_t& rdot_flips, int32_t& eq_cross) {
  bool r_was_positive = false;
  bool theta_was_positive = true;
  const double capture = capture_radius(horizon, c.horizon_eps);

  int n = 0;
  for (int it = 0; it < max_iters; ++it) {
    const Rates k1 = rates_at(r, theta, k, h, Q, rdot_sign, thetadot_sign, a);

    // polar turning point: flip the sign and skip this step entirely
    if (k1.thetadot_sq < 0 && theta_was_positive) {
      thetadot_sign = -thetadot_sign;
      theta_was_positive = false;
      ++n;
      if (n >= steplim) {
        status |= STATUS_STEPLIM;
        break;
      }
      continue;
    }
    theta_was_positive = k1.thetadot_sq >= 0;

    // radial turning point: the sign flips even if this step is later
    // rejected (the gate state is per-lane, not per-accepted-step)
    const bool r_flip = k1.rdot_sq <= 0 && r_was_positive;
    if (r_flip) rdot_sign = -rdot_sign;
    r_was_positive = k1.rdot_sq > 0;
    const double pr1 = std::fabs(k1.pr) * rdot_sign;

    if (!(std::isfinite(k1.pt) && std::isfinite(pr1) &&
          std::isfinite(k1.ptheta) && std::isfinite(k1.pphi))) {
      status |= STATUS_NUMERIC;
      break;
    }

    flag_nonphysical(r, a, k1, k1.pt, status);

    // horizon step-cap on the carried step (DOPRI5's negative tableau
    // coefficients can push stages inside the horizon)
    double step_max = std::fabs(safe_div(r - horizon, pr1)) / c.precision;
    if (c.max_phistep > 0)
      step_max = std::min(step_max, std::fabs(safe_div(c.max_phistep, k1.pphi)));
    if (c.max_tstep > 0 && r < c.maxtstep_rlim)
      step_max = std::min(step_max, std::fabs(safe_div(c.max_tstep, k1.pt)));
    if (step > step_max) step = step_max;

    // destination clamp: a clamped accepted step keeps the old step size
    const double lim = dest.step_limit(r, theta, k1.ptheta);
    const bool clamped = lim < step;
    const double h_try = clamped ? lim : step;

    double pt2, pr2, pth2, pph2, pt3, pr3, pth3, pph3, pt4, pr4, pth4, pph4;
    double pt5, pr5, pth5, pph5, pt6, pr6, pth6, pph6, pt7, pr7, pth7, pph7;
    const double pth1 = k1.ptheta;
    momentum_only(r + h_try * (A21 * pr1), theta + h_try * (A21 * pth1), k, h,
                  Q, rdot_sign, thetadot_sign, a, &pt2, &pr2, &pth2, &pph2);
    momentum_only(r + h_try * (A31 * pr1 + A32 * pr2),
                  theta + h_try * (A31 * pth1 + A32 * pth2), k, h, Q,
                  rdot_sign, thetadot_sign, a, &pt3, &pr3, &pth3, &pph3);
    momentum_only(r + h_try * (A41 * pr1 + A42 * pr2 + A43 * pr3),
                  theta + h_try * (A41 * pth1 + A42 * pth2 + A43 * pth3), k, h,
                  Q, rdot_sign, thetadot_sign, a, &pt4, &pr4, &pth4, &pph4);
    momentum_only(
        r + h_try * (A51 * pr1 + A52 * pr2 + A53 * pr3 + A54 * pr4),
        theta + h_try * (A51 * pth1 + A52 * pth2 + A53 * pth3 + A54 * pth4),
        k, h, Q, rdot_sign, thetadot_sign, a, &pt5, &pr5, &pth5, &pph5);
    momentum_only(
        r + h_try * (A61 * pr1 + A62 * pr2 + A63 * pr3 + A64 * pr4 + A65 * pr5),
        theta + h_try * (A61 * pth1 + A62 * pth2 + A63 * pth3 + A64 * pth4 +
                         A65 * pth5),
        k, h, Q, rdot_sign, thetadot_sign, a, &pt6, &pr6, &pth6, &pph6);

    // 5th-order solution (b2 = 0), then reflect, then FSAL k7 at the new
    // point for the embedded error estimate
    const double r_new =
        r + h_try * (B1 * pr1 + B3 * pr3 + B4 * pr4 + B5 * pr5 + B6 * pr6);
    const double th_new_raw =
        theta +
        h_try * (B1 * pth1 + B3 * pth3 + B4 * pth4 + B5 * pth5 + B6 * pth6);
    const double t_new =
        t + h_try * (B1 * k1.pt + B3 * pt3 + B4 * pt4 + B5 * pt5 + B6 * pt6);
    double phi_new =
        phi +
        h_try * (B1 * k1.pphi + B3 * pph3 + B4 * pph4 + B5 * pph5 + B6 * pph6);

    double th_new = th_new_raw;
    double thetadot_sign_r = thetadot_sign;
    if (th_new_raw < 0) {
      th_new = -th_new_raw;
      phi_new += M_PI;
      thetadot_sign_r = -thetadot_sign;
    } else if (th_new_raw > M_PI) {
      th_new = 2 * M_PI - th_new_raw;
      phi_new += M_PI;
      thetadot_sign_r = -thetadot_sign;
    }

    // k7 uses the pre-reflection polar sign (only the magnitude-squared
    // rates enter the error norm through pr7/pth7 linearly, matching JAX)
    momentum_only(r_new, th_new, k, h, Q, rdot_sign, thetadot_sign, a, &pt7,
                  &pr7, &pth7, &pph7);

    const double err_r = h_try * (E1 * pr1 + E3 * pr3 + E4 * pr4 + E5 * pr5 +
                                  E6 * pr6 + E7 * pr7);
    const double err_th = h_try * (E1 * pth1 + E3 * pth3 + E4 * pth4 +
                                   E5 * pth5 + E6 * pth6 + E7 * pth7);
    const double sc_r =
        c.rk45_tol * (1.0 + std::max(std::fabs(r), std::fabs(r_new)));
    const double sc_th =
        c.rk45_tol * (1.0 + std::max(std::fabs(theta), std::fabs(th_new)));
    const double er = err_r / sc_r, eth = err_th / sc_th;
    const double err_norm = std::sqrt(0.5 * (er * er + eth * eth));

    // non-finite trial: maximal-error reject (shrink at fac_min), and a
    // lane still non-finite at the MIN_STEP floor is numerically dead
    // (ops/integrate.py _rk45_body trial_ok handling)
    const bool trial_ok = std::isfinite(err_norm) && std::isfinite(r_new) &&
                          std::isfinite(th_new) && std::isfinite(t_new) &&
                          std::isfinite(phi_new);
    const double err_eff = trial_ok ? err_norm : 1e30;
    if (!trial_ok && h_try <= c.min_step) {
      status |= STATUS_NUMERIC;
      break;
    }

    double fac = c.safety * std::pow(1.0 / std::max(err_eff, 1e-10), 0.2);
    fac = std::min(std::max(fac, c.fac_min), c.fac_max);
    const double step_new = std::max(h_try * fac, c.min_step);

    const bool accept_err = err_eff <= 1.0;
    const bool force = !accept_err && step_new <= c.min_step;
    const bool accept = (accept_err || force) && trial_ok;

    // carried step update: accepted unclamped steps adopt the controller
    // prediction; accepted clamped steps keep the (capped) old step;
    // rejected lanes shrink
    step = (accept_err && clamped) ? step : step_new;

    if (!accept) continue;

    if (r_flip) ++rdot_flips;
    thetadot_sign = thetadot_sign_r;

    const double theta_prev = theta;
    t = t_new;
    r = r_new;
    theta = th_new;
    phi = phi_new;

    if ((theta_prev < M_PI_2 && theta >= M_PI_2) ||
        (theta_prev > M_PI_2 && theta <= M_PI_2))
      ++eq_cross;

    ++n;

    // termination, in _commit's precedence order
    if (r <= capture) {
      status |= STATUS_HORIZON;
      break;
    }
    if (r_lim > 0 && r >= r_lim) {
      status |= STATUS_RLIM;
      break;
    }
    if (dest.reached(r, theta, theta_prev)) {
      status |= STATUS_DEST;
      break;
    }
    if (n >= steplim) {
      status |= STATUS_STEPLIM;
      break;
    }
  }
  steps += n;
  if ((status & (STATUS_STEPLIM | STATUS_NUMERIC)) && steps > 0) steps = -steps;
}

}  // namespace

extern "C" {

// March n rays in parallel. All arrays are length n; steps < 0 marks dead
// padding rays that are skipped.
//   method: 0 = Euler, 1 = RK4, 2 = RK45/DOPRI5.
//   boundary: inner absorbing radius override (<= 0: the event horizon).
//   theta_lim/r_isco/r_out: destination surface (r_isco < 0 = ThetaLimit).
//   dt: per-ray adaptive step (RK45 in/out; seeded when passed <= 0).
void rt_native_trace(int32_t n, int32_t method, double spin, double boundary,
                     double r_lim, double theta_lim, double r_isco,
                     double r_out, int32_t steplim, int32_t max_iters,
                     double precision, double theta_precision,
                     double max_tstep, double maxtstep_rlim,
                     double max_phistep, double min_step, double rk45_tol,
                     double horizon_eps, double safety, double fac_min,
                     double fac_max,
                     double* t, double* r, double* theta, double* phi,
                     const double* k, const double* h, const double* Q,
                     double* rdot_sign, double* thetadot_sign, double* dt,
                     int32_t* steps, int32_t* status, int32_t* rdot_flips,
                     int32_t* eq_cross) {
  const double rh = 1.0 + std::sqrt((1.0 - spin) * (1.0 + spin));
  const double horizon = boundary > 0 ? boundary : rh;
  const Ctrl c{precision, theta_precision, max_tstep, maxtstep_rlim,
               max_phistep, min_step, rk45_tol, horizon_eps,
               safety, fac_min, fac_max};
  const Dest dest{theta_lim, r_isco, r_out};

#pragma omp parallel for schedule(dynamic, 64)
  for (int32_t i = 0; i < n; ++i) {
    if (steps[i] < 0) continue;
    if (method == 2) {
      if (dt[i] <= 0)
        dt[i] = seed_rk45_step(r[i], theta[i], k[i], h[i], Q[i], rdot_sign[i],
                               thetadot_sign[i], spin, horizon, c);
      march_ray_rk45(spin, horizon, r_lim, dest, steplim, max_iters, c, t[i],
                     r[i], theta[i], phi[i], k[i], h[i], Q[i], rdot_sign[i],
                     thetadot_sign[i], dt[i], steps[i], status[i],
                     rdot_flips[i], eq_cross[i]);
    } else {
      march_ray(method, spin, horizon, r_lim, dest, steplim, c, t[i], r[i],
                theta[i], phi[i], k[i], h[i], Q[i], rdot_sign[i],
                thetadot_sign[i], steps[i], status[i], rdot_flips[i],
                eq_cross[i]);
    }
  }
}

}  // extern "C"
