// Native C++ parity oracle for the cartpole_tpu framework.
//
// An INDEPENDENT host-side implementation of the framework's capabilities:
// single cart-pole dynamics (friction / drag / springs / external forces),
// RK4 integration, the 1 kHz plant substep loop, and a multiple-shooting
// constrained Gauss-Newton MPC with the same problem layout and solver
// semantics as cartpole_tpu (decision vector [x(0..N-1), u(0..K-1)], defect
// + pin + terminal equality constraints, exact-penalty merit line search,
// LM damping, retraction clamps).
//
// Role: the reference repo's Python oracle (`pypendulum`) cannot be built
// here because its `mini_opt` submodule is not vendored, so this module
// plays that part in the test strategy (SURVEY.md §4): an implementation
// with different machinery — hand-written C++, finite-difference Jacobians
// instead of JAX AD, sequential host loops instead of lax.scan — that must
// agree with the JAX stack on dynamics values, trajectories, and closed-loop
// control sequences.
//
// Capability citations into /root/reference (behavior being mirrored, not
// code): dynamics terms `symbolic/dynamics_single.py:63-129`; RK4
// `optimization/integration.hpp:52-62`; 1 ms substeps
// `optimization/simulator.cc:17-35`; problem layout + warm start
// `optimization/optimization.cc:24-67,194-331`.
//
// Build: g++ -O2 -shared -fPIC -o liboracle.so oracle.cc  (see build.py)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------------------
// Dynamics
// ---------------------------------------------------------------------------

struct SingleParams {
  double m_b, m_1, l_1, g, mu_b, v_mu_b, c_d_1, x_s, k_s;
};

// x = [b_x, th, b_v, th_v]
void single_dynamics(const SingleParams& p, const double* x, double u,
                     const double* f_base, const double* f_mass, double* xd) {
  const double b_x = x[0], th = x[1], b_v = x[2], th_v = x[3];
  const double s = std::sin(th), c = std::cos(th);

  // Pole tip velocity.
  const double v1x = b_v - p.l_1 * s * th_v;
  const double v1y = p.l_1 * c * th_v;

  // Generalized external forces.
  double q_b = 0.0, q_th = 0.0;
  if (f_base) {
    q_b += f_base[0];
  }
  if (f_mass) {
    q_b += f_mass[0];
    q_th += p.l_1 * (-s * f_mass[0] + c * f_mass[1]);
  }

  // Smoothed Coulomb friction on the base.
  const double v_cut = p.v_mu_b > 1e-6 ? p.v_mu_b : 1e-6;
  const double f_fric = -p.mu_b * (p.m_b + p.m_1) * p.g * std::tanh(b_v / v_cut);

  // Cubic air drag via Rayleigh dissipation D = c_d |v|^3 / 6.
  const double speed = std::sqrt(v1x * v1x + v1y * v1y);
  const double drag_b = 0.5 * p.c_d_1 * speed * v1x;
  const double drag_th = 0.5 * p.c_d_1 * speed * p.l_1 * (c * v1y - s * v1x);

  // Boundary bumper springs.
  const double over = b_x - p.x_s, under = -p.x_s - b_x;
  const double f_spring =
      -p.k_s * (over > 0 ? over : 0.0) + p.k_s * (under > 0 ? under : 0.0);

  const double rhs_b = u + q_b + f_fric + f_spring +
                       p.m_1 * p.l_1 * c * th_v * th_v - drag_b;
  const double rhs_th = -p.m_1 * p.g * p.l_1 * c + q_th - drag_th;

  const double det = p.m_1 * p.l_1 * p.l_1 * (p.m_b + p.m_1 * c * c);
  xd[0] = b_v;
  xd[1] = th_v;
  xd[2] = (p.m_1 * p.l_1 * p.l_1 * rhs_b + p.m_1 * p.l_1 * s * rhs_th) / det;
  xd[3] = (p.m_1 * p.l_1 * s * rhs_b + (p.m_b + p.m_1) * rhs_th) / det;
}

// ---------------------------------------------------------------------------
// Double-pendulum dynamics (cart + two-link pole; 6 params, 6-dim state).
// ---------------------------------------------------------------------------

struct DoubleParams {
  double m_b, m_1, m_2, l_1, l_2, g;
};

// x = [b_x, th1, th2, b_v, th1_v, th2_v]
void double_dynamics(const DoubleParams& p, const double* x, double u,
                     const double* f_base, const double* f1, const double* f2,
                     double* xd) {
  const double th1 = x[1], th2 = x[2];
  const double b_v = x[3], th1_v = x[4], th2_v = x[5];
  const double s1 = std::sin(th1), c1 = std::cos(th1);
  const double s2 = std::sin(th2), c2 = std::cos(th2);
  const double s12 = s1 * c2 - c1 * s2;
  const double c12 = c1 * c2 + s1 * s2;
  const double m12 = p.m_1 + p.m_2;

  // Symmetric mass matrix.
  const double a11 = p.m_b + m12;
  const double a12 = -m12 * p.l_1 * s1;
  const double a13 = -p.m_2 * p.l_2 * s2;
  const double a22 = m12 * p.l_1 * p.l_1;
  const double a23 = p.m_2 * p.l_1 * p.l_2 * c12;
  const double a33 = p.m_2 * p.l_2 * p.l_2;

  double q_x = 0, q_1 = 0, q_2 = 0;
  if (f_base) q_x += f_base[0];
  if (f1) {
    q_x += f1[0];
    q_1 += p.l_1 * (-s1 * f1[0] + c1 * f1[1]);
  }
  if (f2) {
    q_x += f2[0];
    q_1 += p.l_1 * (-s1 * f2[0] + c1 * f2[1]);
    q_2 += p.l_2 * (-s2 * f2[0] + c2 * f2[1]);
  }

  const double b1 = u + q_x + m12 * p.l_1 * c1 * th1_v * th1_v +
                    p.m_2 * p.l_2 * c2 * th2_v * th2_v;
  const double b2 = q_1 - p.m_2 * p.l_1 * p.l_2 * s12 * th2_v * th2_v -
                    m12 * p.g * p.l_1 * c1;
  const double b3 = q_2 + p.m_2 * p.l_1 * p.l_2 * s12 * th1_v * th1_v -
                    p.m_2 * p.g * p.l_2 * c2;

  // Adjugate solve of the symmetric 3x3 system.
  const double cof11 = a22 * a33 - a23 * a23;
  const double cof12 = a13 * a23 - a12 * a33;
  const double cof13 = a12 * a23 - a13 * a22;
  const double cof22 = a11 * a33 - a13 * a13;
  const double cof23 = a12 * a13 - a11 * a23;
  const double cof33 = a11 * a22 - a12 * a12;
  const double det = a11 * cof11 + a12 * cof12 + a13 * cof13;

  xd[0] = b_v;
  xd[1] = th1_v;
  xd[2] = th2_v;
  xd[3] = (cof11 * b1 + cof12 * b2 + cof13 * b3) / det;
  xd[4] = (cof12 * b1 + cof22 * b2 + cof23 * b3) / det;
  xd[5] = (cof13 * b1 + cof23 * b2 + cof33 * b3) / det;
}

double mod_pi(double a) {
  // Wrap to (-pi, pi]: pi - mod(pi - a, 2 pi).
  double r = std::fmod(kPi - a, 2.0 * kPi);
  if (r < 0) r += 2.0 * kPi;
  return kPi - r;
}

void rk4_step(const SingleParams& p, const double* x, double u, double h,
              const double* f_base, const double* f_mass, double* out) {
  double k1[4], k2[4], k3[4], k4[4], tmp[4];
  single_dynamics(p, x, u, f_base, f_mass, k1);
  for (int i = 0; i < 4; ++i) tmp[i] = x[i] + 0.5 * h * k1[i];
  single_dynamics(p, tmp, u, f_base, f_mass, k2);
  for (int i = 0; i < 4; ++i) tmp[i] = x[i] + 0.5 * h * k2[i];
  single_dynamics(p, tmp, u, f_base, f_mass, k3);
  for (int i = 0; i < 4; ++i) tmp[i] = x[i] + h * k3[i];
  single_dynamics(p, tmp, u, f_base, f_mass, k4);
  for (int i = 0; i < 4; ++i)
    out[i] = x[i] + (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i]);
}

// 1 kHz plant substep loop (simulator.cc:17-35 behavior).
void sim_step(const SingleParams& p, const double* x, double dt, double u,
              const double* f_base, const double* f_mass, double* out) {
  double cur[4];
  std::memcpy(cur, x, sizeof(cur));
  const double internal = 1.0e-3;
  while (dt > 0.0) {
    const double h = dt < internal ? dt : internal;
    double nxt[4];
    rk4_step(p, cur, u, h, f_base, f_mass, nxt);
    nxt[1] = mod_pi(nxt[1]);
    std::memcpy(cur, nxt, sizeof(cur));
    dt -= h;
  }
  std::memcpy(out, cur, sizeof(cur));
}

// ---------------------------------------------------------------------------
// Dense linear algebra: LU with partial pivoting.
// ---------------------------------------------------------------------------

// Solves A x = b in place; returns false on (near-)singularity.
bool lu_solve(std::vector<double>& A, std::vector<double>& b, int n) {
  std::vector<int> piv(n);
  for (int i = 0; i < n; ++i) piv[i] = i;
  for (int col = 0; col < n; ++col) {
    int best = col;
    double best_abs = std::fabs(A[col * n + col]);
    for (int r = col + 1; r < n; ++r) {
      const double v = std::fabs(A[r * n + col]);
      if (v > best_abs) {
        best_abs = v;
        best = r;
      }
    }
    if (best_abs < 1e-14) return false;
    if (best != col) {
      for (int k = 0; k < n; ++k) std::swap(A[col * n + k], A[best * n + k]);
      std::swap(b[col], b[best]);
    }
    const double pivot = A[col * n + col];
    for (int r = col + 1; r < n; ++r) {
      const double m = A[r * n + col] / pivot;
      if (m == 0.0) continue;
      A[r * n + col] = 0.0;
      for (int k = col + 1; k < n; ++k) A[r * n + k] -= m * A[col * n + k];
      b[r] -= m * b[col];
    }
  }
  for (int r = n - 1; r >= 0; --r) {
    double acc = b[r];
    for (int k = r + 1; k < n; ++k) acc -= A[r * n + k] * b[k];
    b[r] = acc / A[r * n + r];
  }
  return true;
}

// ---------------------------------------------------------------------------
// Multiple-shooting MPC (Gauss-Newton, exact-penalty merit, LM damping).
// ---------------------------------------------------------------------------

struct OptParams {
  double control_dt;
  int window_length;
  int state_spacing;
  int max_iterations;
  double relative_exit_tol;
  double absolute_first_derivative_tol;
  double equality_penalty_initial;
  double u_guess_sinusoid_amplitude;
  double u_cost_weight;
  double u_derivative_cost_weight;
  double b_x_final_cost_weight;
  double th_final_cost_weight;
  double b_x_dot_final_cost_weight;
  double th_dot_final_cost_weight;
  double b_x_limit;
  double u_limit;
  int max_line_search_iterations;

  int num_states() const { return window_length / state_spacing + 1; }
};

struct TerminalSpec {
  int coord;
  double target_or_setpoint;  // resolved target value.
  double weight;
  bool is_angle;
};

class MPCOracle {
 public:
  MPCOracle(const SingleParams& dyn, const OptParams& opt, double set_point)
      : dyn_(dyn), opt_(opt) {
    N_ = opt.num_states();
    K_ = opt.window_length;
    dim_ = N_ * 4 + K_;
    u_start_ = N_ * 4;

    // Terminal objectives in reference order; negative weight => equality.
    const double targets[4] = {set_point, kPi / 2.0, 0.0, 0.0};
    const double weights[4] = {
        opt.b_x_final_cost_weight, opt.th_final_cost_weight,
        opt.b_x_dot_final_cost_weight, opt.th_dot_final_cost_weight};
    const int coords[4] = {0, 1, 2, 3};
    const bool angles[4] = {false, true, false, false};
    for (int i = 0; i < 4; ++i) {
      if (weights[i] >= 0.0)
        term_costs_.push_back({coords[i], targets[i], weights[i], angles[i]});
      else
        term_eqs_.push_back({coords[i], targets[i], 1.0, angles[i]});
    }

    n_costs_ = static_cast<int>(term_costs_.size());
    if (opt.u_derivative_cost_weight > 0.0) n_costs_ += K_;  // K-1 pairs + prev
    if (opt.u_cost_weight > 0.0) n_costs_ += K_;
    n_eq_ = (N_ - 1) * 4 + 4 + static_cast<int>(term_eqs_.size());
    warm_ = false;
    prev_.assign(dim_, 0.0);
  }

  void reset() {
    warm_ = false;
    std::fill(prev_.begin(), prev_.end(), 0.0);
  }

  // One receding-horizon step; writes K_ controls to u_out. Returns the
  // number of GN iterations applied, or -1 on KKT failure.
  int step(const double* x_current, double* u_out, double* predicted_out) {
    std::vector<double> z(dim_, 0.0);
    double u_prev_continuity = 0.0;

    if (warm_) {
      z = prev_;
      for (int i = 0; i < 4; ++i) z[i] = x_current[i];
      u_prev_continuity = prev_[u_start_];
      for (int k = 0; k + 1 < K_; ++k)
        z[u_start_ + k] = prev_[u_start_ + k + 1];
    } else {
      for (int i = 0; i < 4; ++i) z[i] = x_current[i];
      for (int k = 0; k < K_; ++k)
        z[u_start_ + k] = opt_.u_guess_sinusoid_amplitude *
                          std::sin(static_cast<double>(k) / K_ * 2.0 * kPi);
    }
    fill_states_by_rollout(z);

    const int iters = solve(z, x_current, u_prev_continuity);

    prev_ = z;
    warm_ = true;
    for (int k = 0; k < K_; ++k) u_out[k] = z[u_start_ + k];
    if (predicted_out) {
      double cur[4];
      std::memcpy(cur, x_current, sizeof(cur));
      for (int k = 0; k < K_; ++k) {
        double nxt[4];
        rk4_step(dyn_, cur, u_out[k], opt_.control_dt, nullptr, nullptr, nxt);
        nxt[1] = mod_pi(nxt[1]);
        std::memcpy(cur, nxt, sizeof(cur));
        std::memcpy(predicted_out + 4 * k, cur, sizeof(cur));
      }
    }
    return iters;
  }

 private:
  void fill_states_by_rollout(std::vector<double>& z) const {
    double cur[4] = {z[0], z[1], z[2], z[3]};
    for (int s = 1; s < N_; ++s) {
      for (int k = 0; k < opt_.state_spacing; ++k) {
        double nxt[4];
        rk4_step(dyn_, cur,
                 z[u_start_ + (s - 1) * opt_.state_spacing + k],
                 opt_.control_dt, nullptr, nullptr, nxt);
        nxt[1] = mod_pi(nxt[1]);
        std::memcpy(cur, nxt, sizeof(cur));
      }
      std::memcpy(&z[4 * s], cur, sizeof(cur));
    }
  }

  // Integrate one shooting segment from x_s under the segment's controls.
  void segment(const double* x_s, const double* u_seg, double* x_end) const {
    double cur[4];
    std::memcpy(cur, x_s, sizeof(cur));
    for (int k = 0; k < opt_.state_spacing; ++k) {
      double nxt[4];
      rk4_step(dyn_, cur, u_seg[k], opt_.control_dt, nullptr, nullptr, nxt);
      nxt[1] = mod_pi(nxt[1]);
      std::memcpy(cur, nxt, sizeof(cur));
    }
    std::memcpy(x_end, cur, sizeof(cur));
  }

  // Cost residuals r(z) (least-squares form, weights inside residuals).
  void cost_residuals(const std::vector<double>& z, double u_prev,
                      std::vector<double>& r) const {
    r.clear();
    const double* xN = &z[4 * (N_ - 1)];
    for (const auto& t : term_costs_) {
      double d = xN[t.coord] - t.target_or_setpoint;
      if (t.is_angle) d = mod_pi(d);
      r.push_back(t.weight * d);
    }
    const double* u = &z[u_start_];
    if (opt_.u_derivative_cost_weight > 0.0) {
      const double w = opt_.u_derivative_cost_weight;
      for (int k = 0; k + 1 < K_; ++k) r.push_back(w * (u[k] - u[k + 1]));
      r.push_back(w * (u[0] - u_prev));
    }
    if (opt_.u_cost_weight > 0.0)
      for (int k = 0; k < K_; ++k) r.push_back(opt_.u_cost_weight * u[k]);
  }

  // Equality constraints c(z): defects, initial pins, terminal equalities.
  void constraints(const std::vector<double>& z, const double* x_current,
                   std::vector<double>& c) const {
    c.assign(n_eq_, 0.0);
    int row = 0;
    for (int s = 0; s + 1 < N_; ++s) {
      double x_end[4];
      segment(&z[4 * s], &z[u_start_ + s * opt_.state_spacing], x_end);
      for (int i = 0; i < 4; ++i) {
        double d = x_end[i] - z[4 * (s + 1) + i];
        if (i == 1) d = mod_pi(d);
        c[row++] = d;
      }
    }
    for (int i = 0; i < 4; ++i) {
      double d = z[i] - x_current[i];
      if (i == 1) d = mod_pi(d);
      c[row++] = d;
    }
    const double* xN = &z[4 * (N_ - 1)];
    for (const auto& t : term_eqs_) {
      double d = xN[t.coord] - t.target_or_setpoint;
      if (t.is_angle) d = mod_pi(d);
      c[row++] = d;
    }
  }

  // Constraint Jacobian by central finite differences of the segment map
  // (a deliberately different derivative method from the JAX stack's AD).
  void constraint_jacobian(const std::vector<double>& z,
                           std::vector<double>& A) const {
    A.assign(static_cast<size_t>(n_eq_) * dim_, 0.0);
    const double eps = 1e-6;
    for (int s = 0; s + 1 < N_; ++s) {
      const int row0 = 4 * s;
      // d(defect)/d(x_s) and d(defect)/d(u_seg).
      double xs[4];
      std::memcpy(xs, &z[4 * s], sizeof(xs));
      std::vector<double> useg(opt_.state_spacing);
      for (int k = 0; k < opt_.state_spacing; ++k)
        useg[k] = z[u_start_ + s * opt_.state_spacing + k];

      for (int j = 0; j < 4 + opt_.state_spacing; ++j) {
        double lo[4], hi[4];
        if (j < 4) {
          const double save = xs[j];
          xs[j] = save + eps;
          segment(xs, useg.data(), hi);
          xs[j] = save - eps;
          segment(xs, useg.data(), lo);
          xs[j] = save;
        } else {
          const int k = j - 4;
          const double save = useg[k];
          useg[k] = save + eps;
          segment(xs, useg.data(), hi);
          useg[k] = save - eps;
          segment(xs, useg.data(), lo);
          useg[k] = save;
        }
        const int col = j < 4 ? 4 * s + j
                              : u_start_ + s * opt_.state_spacing + (j - 4);
        for (int i = 0; i < 4; ++i) {
          double d = hi[i] - lo[i];
          if (i == 1) d = mod_pi(d);  // hi/lo may straddle the angle wrap
          A[(row0 + i) * dim_ + col] = d / (2.0 * eps);
        }
      }
      // -I on x_{s+1}.
      for (int i = 0; i < 4; ++i) A[(row0 + i) * dim_ + 4 * (s + 1) + i] = -1.0;
    }
    int row = (N_ - 1) * 4;
    for (int i = 0; i < 4; ++i) A[(row + i) * dim_ + i] = 1.0;
    row += 4;
    for (const auto& t : term_eqs_)
      A[(row++) * dim_ + 4 * (N_ - 1) + t.coord] = 1.0;
  }

  // Constant cost Jacobian rows.
  void cost_jacobian(std::vector<double>& J) const {
    J.assign(static_cast<size_t>(n_costs_) * dim_, 0.0);
    int row = 0;
    for (const auto& t : term_costs_)
      J[(row++) * dim_ + 4 * (N_ - 1) + t.coord] = t.weight;
    if (opt_.u_derivative_cost_weight > 0.0) {
      const double w = opt_.u_derivative_cost_weight;
      for (int k = 0; k + 1 < K_; ++k) {
        J[row * dim_ + u_start_ + k] = w;
        J[row * dim_ + u_start_ + k + 1] = -w;
        ++row;
      }
      J[(row++) * dim_ + u_start_] = w;
    }
    if (opt_.u_cost_weight > 0.0)
      for (int k = 0; k < K_; ++k)
        J[(row++) * dim_ + u_start_ + k] = opt_.u_cost_weight;
  }

  void retract(std::vector<double>& z, const std::vector<double>& dz,
               double alpha) const {
    for (int i = 0; i < dim_; ++i) z[i] += alpha * dz[i];
    for (int s = 0; s < N_; ++s) {
      z[4 * s + 1] = mod_pi(z[4 * s + 1]);
      double& bx = z[4 * s];
      if (bx > opt_.b_x_limit) bx = opt_.b_x_limit;
      if (bx < -opt_.b_x_limit) bx = -opt_.b_x_limit;
    }
    for (int k = 0; k < K_; ++k) {
      double& u = z[u_start_ + k];
      if (u > opt_.u_limit) u = opt_.u_limit;
      if (u < -opt_.u_limit) u = -opt_.u_limit;
    }
  }

  static double l1(const std::vector<double>& v) {
    double s = 0;
    for (double x : v) s += std::fabs(x);
    return s;
  }

  // Damped GN with exact-penalty merit line search; mirrors the semantics
  // of cartpole_tpu/ops/solver.py (fixed alpha halvings, penalty ramp from
  // multiplier magnitudes, lambda up on reject / down on accept).
  int solve(std::vector<double>& z, const double* x_current, double u_prev) {
    double lam = 0.0;
    double mu = opt_.equality_penalty_initial;
    double merit_prev = 1e300;

    std::vector<double> Jc;
    cost_jacobian(Jc);
    // The cost Jacobian is constant (all cost rows are linear in z), so
    // its Gram matrix J^T J is hoisted out of the iteration loop.
    std::vector<double> JtJ(static_cast<size_t>(dim_) * dim_, 0.0);
    for (int i = 0; i < dim_; ++i)
      for (int j = 0; j < dim_; ++j) {
        double h = 0;
        for (int q = 0; q < n_costs_; ++q)
          h += Jc[q * dim_ + i] * Jc[q * dim_ + j];
        JtJ[static_cast<size_t>(i) * dim_ + j] = h;
      }

    const int n_kkt = dim_ + n_eq_;
    int applied = 0;
    for (int it = 0; it < opt_.max_iterations; ++it) {
      std::vector<double> r, c, A;
      cost_residuals(z, u_prev, r);
      constraints(z, x_current, c);
      constraint_jacobian(z, A);

      double cost = 0;
      for (double v : r) cost += 0.5 * v * v;

      // KKT: [[J^T J + lam I, A^T], [A, -delta I]] [dz; nu] = [-J^T r; -c].
      std::vector<double> kkt(static_cast<size_t>(n_kkt) * n_kkt, 0.0);
      std::vector<double> rhs(n_kkt, 0.0);
      std::vector<double> g(dim_, 0.0);
      for (int i = 0; i < dim_; ++i)
        for (int j = 0; j < dim_; ++j)
          kkt[i * n_kkt + j] =
              JtJ[static_cast<size_t>(i) * dim_ + j] + (i == j ? lam : 0.0);
      for (int e = 0; e < n_eq_; ++e)
        for (int j = 0; j < dim_; ++j) {
          kkt[(dim_ + e) * n_kkt + j] = A[e * dim_ + j];
          kkt[j * n_kkt + dim_ + e] = A[e * dim_ + j];
        }
      for (int e = 0; e < n_eq_; ++e)
        kkt[(dim_ + e) * n_kkt + dim_ + e] = -1e-10;
      for (int i = 0; i < dim_; ++i) {
        for (int q = 0; q < n_costs_; ++q) g[i] += Jc[q * dim_ + i] * r[q];
        rhs[i] = -g[i];
      }
      for (int e = 0; e < n_eq_; ++e) rhs[dim_ + e] = -c[e];

      if (!lu_solve(kkt, rhs, n_kkt)) return -1;
      std::vector<double> dz(rhs.begin(), rhs.begin() + dim_);
      double nu_inf = 0;
      for (int e = 0; e < n_eq_; ++e)
        nu_inf = std::max(nu_inf, std::fabs(rhs[dim_ + e]));

      // First-order optimality at the current linearization:
      // ||J^T r + A^T nu||_inf (same semantics as ops/solver.py:432-433,
      // which also evaluates it pre-step and freezes from the NEXT
      // iteration).
      double first_order = 0;
      for (int i = 0; i < dim_; ++i) {
        double gl = g[i];
        for (int e = 0; e < n_eq_; ++e)
          gl += A[e * dim_ + i] * rhs[dim_ + e];
        first_order = std::max(first_order, std::fabs(gl));
      }

      const double mu_new = std::max(mu, 2.0 * nu_inf);
      const double phi0 = cost + mu_new * l1(c);
      // Directional derivative bound: (J^T r).dz - mu*||c||_1.
      double jr_dz = 0;
      for (int i = 0; i < dim_; ++i) jr_dz += g[i] * dz[i];
      const double dphi = jr_dz - mu_new * l1(c);

      bool accepted = false;
      double alpha = 1.0;
      std::vector<double> z_trial;
      for (int ls = 0; ls < opt_.max_line_search_iterations; ++ls) {
        z_trial = z;
        retract(z_trial, dz, alpha);
        std::vector<double> r_a, c_a;
        cost_residuals(z_trial, u_prev, r_a);
        constraints(z_trial, x_current, c_a);
        double cost_a = 0;
        for (double v : r_a) cost_a += 0.5 * v * v;
        const double phi_a = cost_a + mu_new * l1(c_a);
        if (std::isfinite(phi_a) && phi_a <= phi0 + 1e-4 * alpha * dphi) {
          accepted = true;
          break;
        }
        alpha *= 0.5;
      }

      ++applied;
      double phi_new = phi0;
      if (accepted) {
        z = z_trial;
        lam *= 0.5;
        std::vector<double> r_a, c_a;
        cost_residuals(z, u_prev, r_a);
        constraints(z, x_current, c_a);
        double cost_a = 0;
        for (double v : r_a) cost_a += 0.5 * v * v;
        phi_new = cost_a + mu_new * l1(c_a);
      } else {
        lam = std::max(lam * 10.0, 1e-4);
      }
      mu = mu_new;

      const double rel =
          std::fabs(merit_prev - phi_new) /
          std::max(std::fabs(merit_prev), 1e-30);
      merit_prev = phi_new;
      if (accepted && rel < opt_.relative_exit_tol) break;
      if (first_order < opt_.absolute_first_derivative_tol) break;
      if (lam > 1e6) break;
    }
    return applied;
  }

  SingleParams dyn_;
  OptParams opt_;
  int N_, K_, dim_, u_start_, n_costs_, n_eq_;
  std::vector<TerminalSpec> term_costs_, term_eqs_;
  std::vector<double> prev_;
  bool warm_;
};

SingleParams unpack_params(const double* p) {
  return SingleParams{p[0], p[1], p[2], p[3], p[4], p[5], p[6], p[7], p[8]};
}

OptParams unpack_opt(const double* o) {
  OptParams q;
  q.control_dt = o[0];
  q.window_length = static_cast<int>(o[1]);
  q.state_spacing = static_cast<int>(o[2]);
  q.max_iterations = static_cast<int>(o[3]);
  q.relative_exit_tol = o[4];
  q.absolute_first_derivative_tol = o[5];
  q.equality_penalty_initial = o[6];
  q.u_guess_sinusoid_amplitude = o[7];
  q.u_cost_weight = o[8];
  q.u_derivative_cost_weight = o[9];
  q.b_x_final_cost_weight = o[10];
  q.th_final_cost_weight = o[11];
  q.b_x_dot_final_cost_weight = o[12];
  q.th_dot_final_cost_weight = o[13];
  q.b_x_limit = o[14];
  q.u_limit = o[15];
  q.max_line_search_iterations = static_cast<int>(o[16]);
  return q;
}

}  // namespace

extern "C" {

// params: 9 doubles; x: 4; f_base/f_mass: 2 each (may be null); out: 4.
void co_single_dynamics(const double* params, const double* x, double u,
                        const double* f_base, const double* f_mass,
                        double* x_dot) {
  single_dynamics(unpack_params(params), x, u, f_base, f_mass, x_dot);
}

void co_single_rk4(const double* params, const double* x, double u, double h,
                   double* x_out) {
  rk4_step(unpack_params(params), x, u, h, nullptr, nullptr, x_out);
}

// 1 kHz substep plant integration + angle wrap.
void co_single_sim_step(const double* params, const double* x, double dt,
                        double u, const double* f_base, const double* f_mass,
                        double* x_out) {
  sim_step(unpack_params(params), x, dt, u, f_base, f_mass, x_out);
}

// Closed receding-horizon loop: `steps` ticks of (MPC solve -> apply u[0]
// to the 1 kHz plant). opt_params: 17 packed doubles (see unpack_opt).
// u_out: steps doubles; states_out: steps*4 doubles (plant state BEFORE
// each tick). Returns 0, or -1 if any solve hit a KKT failure.
int co_single_closed_loop(const double* params, const double* opt_params,
                          double set_point, const double* x0, int steps,
                          double* u_out, double* states_out) {
  const SingleParams dyn = unpack_params(params);
  const OptParams opt = unpack_opt(opt_params);
  MPCOracle mpc(dyn, opt, set_point);

  std::vector<double> u_window(opt.window_length);
  double x[4];
  std::memcpy(x, x0, sizeof(x));
  for (int t = 0; t < steps; ++t) {
    std::memcpy(states_out + 4 * t, x, sizeof(x));
    const int iters = mpc.step(x, u_window.data(), nullptr);
    if (iters < 0) return -1;
    u_out[t] = u_window[0];
    double nxt[4];
    sim_step(dyn, x, opt.control_dt, u_window[0], nullptr, nullptr, nxt);
    std::memcpy(x, nxt, sizeof(x));
  }
  return 0;
}

// Double-pendulum dynamics: params 6 doubles; x 6; forces 2 each (nullable).
void co_double_dynamics(const double* params, const double* x, double u,
                        const double* f_base, const double* f1,
                        const double* f2, double* x_dot) {
  const DoubleParams p{params[0], params[1], params[2],
                       params[3], params[4], params[5]};
  double_dynamics(p, x, u, f_base, f1, f2, x_dot);
}

// 1 kHz substep plant integration + angle wraps for the double pendulum.
void co_double_sim_step(const double* params, const double* x, double dt,
                        double u, double* x_out) {
  const DoubleParams p{params[0], params[1], params[2],
                       params[3], params[4], params[5]};
  double cur[6];
  std::memcpy(cur, x, sizeof(cur));
  const double internal = 1.0e-3;
  while (dt > 0.0) {
    const double h = dt < internal ? dt : internal;
    double k1[6], k2[6], k3[6], k4[6], tmp[6];
    double_dynamics(p, cur, u, nullptr, nullptr, nullptr, k1);
    for (int i = 0; i < 6; ++i) tmp[i] = cur[i] + 0.5 * h * k1[i];
    double_dynamics(p, tmp, u, nullptr, nullptr, nullptr, k2);
    for (int i = 0; i < 6; ++i) tmp[i] = cur[i] + 0.5 * h * k2[i];
    double_dynamics(p, tmp, u, nullptr, nullptr, nullptr, k3);
    for (int i = 0; i < 6; ++i) tmp[i] = cur[i] + h * k3[i];
    double_dynamics(p, tmp, u, nullptr, nullptr, nullptr, k4);
    for (int i = 0; i < 6; ++i)
      cur[i] += (h / 6.0) * (k1[i] + 2.0 * k2[i] + 2.0 * k3[i] + k4[i]);
    cur[1] = mod_pi(cur[1]);
    cur[2] = mod_pi(cur[2]);
    dt -= h;
  }
  std::memcpy(x_out, cur, sizeof(cur));
}

}  // extern "C"
