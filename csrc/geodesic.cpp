// Native CPU geodesic engine for raytrace_tpu.
//
// An independent C++ implementation of the same Kerr null-geodesic march the
// JAX integrators perform (semi-analytic momenta from the conserved
// (k, h, Q), RK4 position update, turning-point sign gates, polar
// reflection, disc/horizon/escape termination). It serves two purposes:
//   1. a cross-language validation oracle for the JAX/Pallas paths — a
//      systematic error in one implementation will not reproduce in the
//      other;
//   2. a fast multithreaded CPU fallback (OpenMP over rays) for machines
//      without accelerators — the niche the reference's OpenMP loop filled.
//
// The physics follows the equations documented in raytrace_tpu.geometry.kerr
// (Carter-separated Kerr geodesics in Boyer-Lindquist coordinates); written
// from those formulas, not a translation of any other code.
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

struct Ctrl {
  double precision;
  double theta_precision;
  double max_tstep;
  double maxtstep_rlim;
  double max_phistep;
  double min_step;
  double horizon_eps;
};

struct Rates {
  double pt, pr, ptheta, pphi;
  double thetadot_sq, rdot_sq;
};

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

// One ray, RK4 (or Euler when rk4 == 0), theta-limit destination with the
// same step heuristic and sign semantics as the JAX path.
void march_ray(int rk4, double a, double horizon, double r_lim, double theta_lim,
               int steplim, const Ctrl& c,
               double& t, double& r, double& theta, double& phi,
               double k, double h, double Q,
               double& rdot_sign, double& thetadot_sign,
               int32_t& steps, int32_t& status,
               int32_t& rdot_flips, int32_t& eq_cross) {
  bool r_was_positive = false;
  bool theta_was_positive = true;
  const double capture = horizon * (1.0 + c.horizon_eps);

  int n = 0;
  while (n < steplim) {
    // theta-limit loop condition (positive limit: below the surface;
    // negative: above |limit|; zero: never stop on theta)
    if (theta_lim > 0 && theta >= theta_lim) {
      status |= STATUS_DEST;
      break;
    }
    if (theta_lim < 0 && theta <= -theta_lim) {
      status |= STATUS_DEST;
      break;
    }
    if (r_lim > 0 && r >= r_lim) {
      status |= STATUS_RLIM;
      break;
    }
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

    if (k1.pt <= 0) status |= STATUS_ERGO;

    // step heuristic
    double step = std::fabs((r - horizon) / k1.pr) / c.precision;
    const double theta_cap = std::fabs(theta / k1.ptheta);
    if (step > theta_cap / c.precision) step = theta_cap / c.theta_precision;
    if (c.max_tstep > 0 && r < c.maxtstep_rlim) {
      const double tc = std::fabs(c.max_tstep / k1.pt);
      if (step > tc) step = tc;
    }
    if (c.max_phistep > 0) {
      const double pc = std::fabs(c.max_phistep / k1.pphi);
      if (step > pc) step = pc;
    }
    if (step < c.min_step) step = c.min_step;
    if (r_lim > 0 && r + k1.pr * step > r_lim) step = std::fabs((r_lim - r) / k1.pr);
    if (theta_lim > 0 && theta + k1.ptheta * step > theta_lim)
      step = std::fabs((theta_lim - theta) / k1.ptheta);

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

    if (r <= capture) {
      status |= STATUS_HORIZON;
      break;
    }
  }
  steps += n;
  if (n >= steplim) {
    status |= STATUS_STEPLIM;
    steps = -steps;
  }
}

}  // namespace

extern "C" {

// March n rays in parallel. All arrays are length n; steps < 0 marks dead
// padding rays that are skipped. rk4 != 0 selects RK4, else Euler.
void rt_native_trace(int32_t n, int32_t rk4, double spin, double r_lim,
                     double theta_lim, int32_t steplim,
                     double precision, double theta_precision, double max_tstep,
                     double maxtstep_rlim, double max_phistep, double min_step,
                     double horizon_eps,
                     double* t, double* r, double* theta, double* phi,
                     const double* k, const double* h, const double* Q,
                     double* rdot_sign, double* thetadot_sign,
                     int32_t* steps, int32_t* status, int32_t* rdot_flips,
                     int32_t* eq_cross) {
  const double horizon = 1.0 + std::sqrt((1.0 - spin) * (1.0 + spin));
  const Ctrl c{precision, theta_precision, max_tstep,
               maxtstep_rlim, max_phistep, min_step, horizon_eps};

#pragma omp parallel for schedule(dynamic, 64)
  for (int32_t i = 0; i < n; ++i) {
    if (steps[i] < 0) continue;
    march_ray(rk4, spin, horizon, r_lim, theta_lim, steplim, c, t[i], r[i],
              theta[i], phi[i], k[i], h[i], Q[i], rdot_sign[i],
              thetadot_sign[i], steps[i], status[i], rdot_flips[i],
              eq_cross[i]);
  }
}

}  // extern "C"
