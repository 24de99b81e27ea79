// CPU reference integrators with a C ABI.
//
// This is the framework's analogue of the reference's vendored cubacpp/CUBA
// layer (reference: cubacpp/cubacpp/cuhre.hh:38-124, vegas.hh:13-106): an
// independent CPU implementation of the same two algorithms, used as the
// correctness oracle for the TPU path (the role test_cpu_vs_gpu.cu:12-23
// plays in the reference) and as a C-callable entry point
// (test/cuda/pagani/test_integration_from_c.c analogue).
//
//  * quad_cuhre: globally-adaptive cubature with the Genz-Malik degree-9
//    embedded rule (same rule family as the TPU PAGANI path) and a
//    worst-error-first region heap.
//  * quad_vegas: NR-style VEGAS with importance sampling + stratification.
//  * quad_suave: subregion-adaptive importance MC (the algorithm behind
//    cubacpp/suave.hh -> CUBA Suave): per-region importance grids that
//    children inherit, sample reuse via sufficient statistics, and a
//    fluctuation-minimizing split dimension.  Deliberately the serial
//    pick-worst-region control flow (vs the TPU batch redesign in
//    gpuintegration_tpu/pagani/suave.py) so the two are independent.
//
// Build: g++ -O2 -std=c++17 -shared -fPIC cpu_quad.cpp -o libcpu_quad.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

extern "C" {
typedef double (*quad_integrand)(const double* x, int ndim, void* userdata);
}

namespace {

constexpr int kNumRules = 5;

// ---------------------------------------------------------------------------
// Genz-Malik degree-9 fully-symmetric rule (Genz & Malik 1983). The
// coefficient polynomials in ndim are the published constants of the rule;
// see gpuintegration_tpu/ops/genz_malik.py for the same tables on the TPU
// side.

struct Rule {
  int ndim = 0;
  int feval = 0;
  std::vector<double> points;        // feval * ndim, generators in [-.5,.5]
  std::vector<double> w0;            // feval, main-rule weight per point
  std::vector<double> wn[4];         // null rules 1..4 per point
  std::vector<double> scale;         // 9 * kNumRules
  std::vector<double> norm;          // 9 * kNumRules
  double ratio = 0.0;                // (a2/a1)^2
};

void orbit_weights(int n_, double w[9][kNumRules]) {
  const double n = n_;
  const double p0 =
      n * (n * (n * (-.002361170967785511788400941242259231309691) +
                .1141539002385732526821323741697655347686) +
           (-.6383392007670238909386026193674701393074)) +
      .7484998850468520800423030047583803945205;
  const double p1 =
      n * (n * (n * (-.001432401703339912514196154599769007103671) +
                .05747150786448972594860897296200006759892) +
           (-.1422510457143424323449521620935950679394)) -
      (-.06287502873828697998942424881040490136987);
  const double q0 =
      n * (n * .003541756451678267682601411863388846964536 +
           (-.07260936739589367960492815865074633743652)) +
      .1055749162521899101218622863269817454540;
  const double q1 =
      n * (n * .002148602555009868771294231899653510655506 +
           (-.03226856389295394999786630399875134318006)) +
      .01063678399023121748083624225818915724455;
  const double r0 = n * (-.04508628929435784075980562738240804429658) +
                    .2141588352435279340097929526588394300172;
  const double r1 = n * (-.02735154652654564472203690086290223507436) +
                    .05494106704871123410060080562462135546101;
  const double s0 = .01553241727660705326386197156586357005224 -
                    n * .003541756451678267682601411863388846964536;
  const double s1 = .003532809960709087023561817517751309380604 -
                    n * .002148602555009868771294231899653510655506;
  const double two_n = std::ldexp(1.0, n_);

  const double w0r[kNumRules] = {
      p0, p1, n * .2545911332489590890011611142429070613156 - p1,
      n * (n * (-1.207328566678236261002219995185143356737) +
           .8956736576416067650809467826488567200939) -
          1 + p0,
      n * (-.3647935698604914666100134551377381205297) + 1 - p0};
  const double w1r[kNumRules] = {
      q0, q1, .01468910249614349017540783437728097691502 - q1,
      n * .5113470834646759143109387357149329909126 +
          .4597644812080634464633352781605214342691 + q0,
      .1823967849302457333050067275688690602649 - q0};
  const double w2r[kNumRules] = {
      r0, r1, .1193759620257077529708962121565290178730 - r1,
      n * .6508951939192025059314756320878023215278 +
          .1474493982943446016775696826942585013243,
      -r0};
  const double w3r[kNumRules] = {
      .05769338449097348357291272840392627722165,
      .03499962660214358382244159694487155861542,
      -.05769338449097348357291272840392627722165,
      -1.386862771927828143599782668709014266770,
      -.05769338449097348357291272840392627722165};
  const double w4r[kNumRules] = {
      0., 0., -.2386668732575008878964134721962088068396, 0., 0.};
  const double w5r[kNumRules] = {
      s0, s1, -s1, .09231719987444221619017126187763868745587 + s0, -s0};
  const double w6r[kNumRules] = {
      .02254314464717892037990281369120402214829,
      .01367577326327282236101845043145111753718,
      -.01367577326327282236101845043145111753718,
      -.3254475969596012529657378160439011607639,
      -.02254314464717892037990281369120402214829};
  const double w7r[kNumRules] = {
      .001770878225839133841300705931694423482268,
      .001074301277504934385647115949826755327753,
      -.001074301277504934385647115949826755327753,
      .001770878225839133841300705931694423482268,
      -.001770878225839133841300705931694423482268};
  const double w8r[kNumRules] = {
      .2515001149531479199576969952416196054795 / two_n,
      -.06287502873828697998942424881040490136987 / two_n,
      .06287502873828697998942424881040490136987 / two_n,
      .2515001149531479199576969952416196054795 / two_n,
      -.2515001149531479199576969952416196054795 / two_n};

  const double* rows[9] = {w0r, w1r, w2r, w3r, w4r, w5r, w6r, w7r, w8r};
  for (int s = 0; s < 9; ++s)
    for (int r = 0; r < kNumRules; ++r) w[s][r] = rows[s][r];
}

Rule build_rule(int ndim) {
  constexpr double a1 = .4779536579022695061928604197171830064732;
  constexpr double a2 = .2030285873691198677998034402373279133258;
  constexpr double a3 = .4476273546261781288207704806530998539285;
  constexpr double a4 = .125;
  constexpr double al = .3430378987808781457001426145164678603407;

  Rule rule;
  rule.ndim = ndim;
  rule.ratio = (a2 / a1) * (a2 / a1);

  double w[9][kNumRules];
  orbit_weights(ndim, w);

  std::vector<std::pair<std::vector<double>, int>> pts;  // (coords, orbit)
  auto add = [&](const std::vector<double>& v, int s) { pts.push_back({v, s}); };

  add(std::vector<double>(ndim, 0.0), 0);
  const double axes[4] = {a1, a2, a3, a4};
  for (int s = 1; s <= 4; ++s)
    for (int d = 0; d < ndim; ++d)
      for (double sg : {+1.0, -1.0}) {
        std::vector<double> v(ndim, 0.0);
        v[d] = sg * axes[s - 1];
        add(v, s);
      }
  for (int i = 0; i < ndim; ++i)
    for (int j = i + 1; j < ndim; ++j)
      for (double si : {+1.0, -1.0})
        for (double sj : {+1.0, -1.0}) {
          std::vector<double> v(ndim, 0.0);
          v[i] = si * a1;
          v[j] = sj * a1;
          add(v, 5);
        }
  for (int i = 0; i < ndim; ++i)
    for (int j = 0; j < ndim; ++j) {
      if (i == j) continue;
      for (double si : {+1.0, -1.0})
        for (double sj : {+1.0, -1.0}) {
          std::vector<double> v(ndim, 0.0);
          v[i] = si * a1;
          v[j] = sj * a2;
          add(v, 6);
        }
    }
  for (int i = 0; i < ndim; ++i)
    for (int j = i + 1; j < ndim; ++j)
      for (int k = j + 1; k < ndim; ++k)
        for (double si : {+1.0, -1.0})
          for (double sj : {+1.0, -1.0})
            for (double sk : {+1.0, -1.0}) {
              std::vector<double> v(ndim, 0.0);
              v[i] = si * a1;
              v[j] = sj * a1;
              v[k] = sk * a1;
              add(v, 7);
            }
  for (std::uint64_t m = 0; m < (1ull << ndim); ++m) {
    std::vector<double> v(ndim);
    for (int d = 0; d < ndim; ++d) v[d] = (m >> d & 1) ? -al : al;
    add(v, 8);
  }

  rule.feval = static_cast<int>(pts.size());
  rule.points.resize(rule.feval * ndim);
  rule.w0.resize(rule.feval);
  for (auto& v : rule.wn) v.resize(rule.feval);
  std::vector<std::int64_t> counts(9, 0);
  for (int p = 0; p < rule.feval; ++p) counts[pts[p].second]++;
  for (int p = 0; p < rule.feval; ++p) {
    std::memcpy(&rule.points[p * ndim], pts[p].first.data(),
                ndim * sizeof(double));
    const int s = pts[p].second;
    rule.w0[p] = w[s][0];
    for (int r = 1; r < kNumRules; ++r) rule.wn[r - 1][p] = w[s][r];
  }

  rule.scale.assign(9 * kNumRules, 0.0);
  rule.norm.assign(9 * kNumRules, 0.0);
  for (int s = 0; s < 9; ++s)
    for (int r = 1; r < kNumRules - 1; ++r) {
      const double sc = (w[s][r] == 0) ? 100.0 : -w[s][r + 1] / w[s][r];
      double total = 0.0;
      for (int x = 0; x < 9; ++x)
        total += counts[x] * std::fabs(w[x][r + 1] + sc * w[x][r]);
      rule.scale[s * kNumRules + r] = sc;
      rule.norm[s * kNumRules + r] = 1.0 / total;
    }
  return rule;
}

struct RegionResult {
  double est = 0.0;
  double err = 0.0;
  int split_dim = 0;
};

// Apply the rule to one region [lo, lo+len) in unit coordinates mapped
// onto the global volume [glo, ghi).
RegionResult eval_region(const Rule& rule, quad_integrand f, void* ud,
                         const double* lo, const double* len,
                         const double* glo, const double* grange,
                         double jacobian, std::vector<double>& scratch) {
  const int ndim = rule.ndim;
  scratch.resize(ndim);
  double sums[kNumRules] = {0, 0, 0, 0, 0};
  std::vector<double> fvals(1 + 4 * ndim);

  for (int p = 0; p < rule.feval; ++p) {
    const double* g = &rule.points[p * ndim];
    for (int d = 0; d < ndim; ++d) {
      const double center = lo[d] + 0.5 * len[d];
      scratch[d] = glo[d] + (center - g[d] * len[d]) * grange[d];
    }
    const double fx = f(scratch.data(), ndim, ud) * jacobian;
    if (p < 1 + 4 * ndim) fvals[p] = fx;
    sums[0] += fx * rule.w0[p];
    for (int r = 0; r < 4; ++r) sums[r + 1] += fx * rule.wn[r][p];
  }

  // fourth-difference split dimension
  int widest = 0;
  for (int d = 1; d < ndim; ++d)
    if (len[d] > len[widest]) widest = d;
  double maxdiff = 0.0;
  int split = widest;
  const double base = fvals[0] * 2.0 * (1.0 - rule.ratio);
  for (int d = 0; d < ndim; ++d) {
    const double o1 = fvals[1 + 2 * d] + fvals[2 + 2 * d];
    const double o2 = fvals[1 + 2 * ndim + 2 * d] + fvals[2 + 2 * ndim + 2 * d];
    const double diff = std::fabs(base + rule.ratio * o1 - o2);
    if (diff > maxdiff) {
      maxdiff = diff;
      split = d;
    }
  }

  // null-rule error model
  double errs[3];
  for (int r = 1; r <= 3; ++r) {
    double maxerr = 0.0;
    for (int s = 0; s < 9; ++s) {
      maxerr = std::max(
          maxerr, std::fabs(sums[r + 1] + rule.scale[s * kNumRules + r] *
                                              sums[r]) *
                      rule.norm[s * kNumRules + r]);
    }
    errs[r - 1] = maxerr;
  }
  double vol = 1.0;
  for (int d = 0; d < ndim; ++d) vol *= len[d];
  const double e1 = errs[0], e2 = errs[1], e3 = errs[2];
  const double gated = (5.0 * e1 <= e2 && 5.0 * e2 <= e3)
                           ? e1
                           : 5.0 * std::max(e1, std::max(e2, e3));
  RegionResult out;
  out.est = vol * sums[0];
  out.err = vol * gated;
  out.split_dim = split;
  return out;
}

struct HeapRegion {
  double err;
  double est;
  int split_dim;
  std::vector<double> lo, len;
  bool operator<(const HeapRegion& o) const { return err < o.err; }
};

// NR grid update shared by quad_vegas and quad_suave: 3-bin smoothing of
// the f^2 histogram, log-damped weights, rebin to equal weight per new bin.
// ``xi_d`` holds nb+1 edges over [0,1]; an all-zero histogram keeps them.
void smooth_damp_rebin(std::vector<double>& xi_d,
                       const std::vector<double>& row, int nb, double alph) {
  std::vector<double> sm(nb);
  sm[0] = (row[0] + row[1]) / 2.0;
  double dt = sm[0];
  for (int b = 1; b < nb - 1; ++b) {
    sm[b] = (row[b - 1] + row[b] + row[b + 1]) / 3.0;
    dt += sm[b];
  }
  sm[nb - 1] = (row[nb - 2] + row[nb - 1]) / 2.0;
  dt += sm[nb - 1];
  if (dt <= 0.0) return;
  // NR's TINY floor: zero-mass bins keep a small rebin weight, or every
  // edge collapses into an early narrow peak's bins
  dt = 0.0;
  for (int b = 0; b < nb; ++b) {
    sm[b] = std::max(sm[b], 1e-30);
    dt += sm[b];
  }
  std::vector<double> r(nb, 0.0);
  double rc = 0.0;
  for (int b = 0; b < nb; ++b) {
    if (sm[b] > 0.0) {
      const double frac = sm[b] / dt;
      r[b] = std::pow((1.0 - frac) / (-std::log(frac)), alph);
    }
    rc += r[b];
  }
  std::vector<double> newxi(nb + 1);
  newxi[0] = 0.0;
  newxi[nb] = 1.0;
  double dr = 0.0;
  int k = 0;
  for (int i = 1; i < nb; ++i) {
    const double target = rc / nb;
    while (dr < target && k < nb) dr += r[k++];
    const double xo = (k > 1) ? xi_d[k - 1] : 0.0;
    const double xn = xi_d[k];
    dr -= target;
    newxi[i] = xn - (xn - xo) * dr / std::max(r[k - 1], 1e-300);
  }
  xi_d = newxi;
}

}  // namespace

extern "C" {

// Globally-adaptive Genz-Malik cubature (CUHRE-style).
// status: 0 converged, 1 max_evals reached without convergence.
int quad_cuhre(quad_integrand f, void* userdata, int ndim,
               const double* lows, const double* highs, double epsrel,
               double epsabs, long long max_evals, double* out_estimate,
               double* out_errorest, long long* out_nregions,
               int* out_status) {
  // cap matches quad_rule_feval: the corner orbit has 2^ndim points
  // (ndim 25 already needs ~7 GB of coordinates; 31 overflows int)
  if (ndim < 2 || ndim > 20) return -1;
  const Rule rule = build_rule(ndim);
  std::vector<double> glo(lows, lows + ndim);
  std::vector<double> grange(ndim);
  double jac = 1.0;
  for (int d = 0; d < ndim; ++d) {
    grange[d] = highs[d] - lows[d];
    jac *= grange[d];
  }
  std::vector<double> scratch;

  std::priority_queue<HeapRegion> heap;
  HeapRegion root;
  root.lo.assign(ndim, 0.0);
  root.len.assign(ndim, 1.0);
  RegionResult r0 = eval_region(rule, f, userdata, root.lo.data(),
                                root.len.data(), glo.data(), grange.data(),
                                jac, scratch);
  root.err = r0.err;
  root.est = r0.est;
  root.split_dim = r0.split_dim;
  double total_est = r0.est, total_err = r0.err;
  long long evals = rule.feval;
  long long nregions = 1;
  heap.push(std::move(root));

  auto converged = [&]() {
    return total_err <= std::max(epsrel * std::fabs(total_est), epsabs);
  };

  while (!converged() && evals + 2 * rule.feval <= max_evals &&
         !heap.empty()) {
    HeapRegion worst = heap.top();
    heap.pop();
    total_est -= worst.est;
    total_err -= worst.err;
    const int d = worst.split_dim;
    for (int half = 0; half < 2; ++half) {
      HeapRegion child;
      child.lo = worst.lo;
      child.len = worst.len;
      child.len[d] *= 0.5;
      if (half == 1) child.lo[d] += child.len[d];
      RegionResult rr = eval_region(rule, f, userdata, child.lo.data(),
                                    child.len.data(), glo.data(),
                                    grange.data(), jac, scratch);
      child.err = rr.err;
      child.est = rr.est;
      child.split_dim = rr.split_dim;
      total_est += rr.est;
      total_err += rr.err;
      heap.push(std::move(child));
    }
    evals += 2 * rule.feval;
    nregions += 1;  // net +1 leaf
  }

  *out_estimate = total_est;
  *out_errorest = total_err;
  *out_nregions = nregions;
  *out_status = converged() ? 0 : 1;
  return 0;
}

// NR-style VEGAS: importance sampling with per-dimension ndmx-bin grids,
// stratification over ng^ndim sub-cubes, itmax adjustment iterations then
// frozen-grid iterations, iteration-weighted combination + chi^2.
int quad_vegas(quad_integrand f, void* userdata, int ndim,
               const double* lows, const double* highs, double epsrel,
               double epsabs, double ncall, int total_iters, int adjust_iters,
               int skip_iters, unsigned long long seed, double* out_estimate,
               double* out_errorest, double* out_chi2, int* out_status,
               long long* out_neval, long long* out_iters) {
  if (ndim < 1 || ndim > 32) return -1;
  constexpr int kBins = 500;
  constexpr double kAlph = 1.5;
  constexpr double kTiny = 1.0e-30;

  const int ng = std::max(1, (int)std::pow(ncall / 2.0 + 0.25, 1.0 / ndim));
  double ncubes = 1.0;
  for (int d = 0; d < ndim; ++d) ncubes *= ng;
  const int npg = std::max((int)(ncall / ncubes), 2);
  const double calls = (double)npg * ncubes;
  double dv2g = 1.0;
  for (int d = 0; d < ndim; ++d) dv2g /= ng;
  dv2g = (calls * dv2g) * (calls * dv2g) / npg / npg / (npg - 1.0);
  const double dxg = (double)kBins / ng;

  double xjac = 1.0 / calls;
  std::vector<double> dx(ndim);
  for (int d = 0; d < ndim; ++d) {
    dx[d] = highs[d] - lows[d];
    xjac *= dx[d];
  }

  // per-dim grid of right edges, xi[d][0] = 0 implied via index-1 access
  std::vector<std::vector<double>> xi(ndim, std::vector<double>(kBins + 1));
  for (int d = 0; d < ndim; ++d)
    for (int b = 0; b <= kBins; ++b) xi[d][b] = (double)b / kBins;

  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);

  double si = 0.0, swgt = 0.0, schi = 0.0;
  double tgral = 0.0, sd = 0.0, chi2a = 0.0;
  int status = 1;
  long long neval = 0;
  long long iters_run = 0;

  std::vector<double> x(ndim);
  std::vector<int> kg(ndim, 1), ia(ndim);
  std::vector<std::vector<double>> dh(ndim, std::vector<double>(kBins));

  for (int it = 1; it <= total_iters && status == 1; ++it) {
    ++iters_run;
    const bool adjusting = it <= adjust_iters;
    for (auto& row : dh) std::fill(row.begin(), row.end(), 0.0);
    std::fill(kg.begin(), kg.end(), 1);
    double ti = 0.0, tsi = 0.0;

    const long long total_cubes = (long long)ncubes;
    for (long long cube = 0; cube < total_cubes; ++cube) {
      double fb = 0.0, f2b = 0.0;
      for (int k = 0; k < npg; ++k) {
        double wgt = xjac;
        for (int d = 0; d < ndim; ++d) {
          const double ran = uni(rng);
          const double xn = (kg[d] - ran) * dxg + 1.0;
          int bin = std::min(std::max((int)xn, 1), kBins);
          ia[d] = bin;
          const double hi = xi[d][bin];
          const double lo_e = xi[d][bin - 1];
          const double xo = hi - lo_e;
          const double rc = lo_e + (xn - bin) * xo;
          x[d] = lows[d] + rc * dx[d];
          wgt *= xo * kBins;
        }
        const double fx = wgt * f(x.data(), ndim, userdata);
        fb += fx;
        f2b += fx * fx;
        if (adjusting)
          for (int d = 0; d < ndim; ++d) dh[d][ia[d] - 1] += fx * fx;
      }
      neval += npg;
      double s = std::sqrt(f2b * npg);
      s = (s - fb) * (s + fb);
      if (s <= 0.0) s = kTiny;
      ti += fb;
      tsi += s;
      for (int d = ndim - 1; d >= 0; --d) {  // odometer over cubes
        kg[d] = kg[d] % ng + 1;
        if (kg[d] != 1) break;
      }
    }

    tsi *= dv2g;
    if (it > skip_iters) {
      const double wgt = 1.0 / tsi;
      si += wgt * ti;
      schi += wgt * ti * ti;
      swgt += wgt;
      tgral = si / swgt;
      // dof = accumulated iterations only (the NR formula assumes no
      // skip window; see gpuintegration_tpu/mcubes/vegas.py note)
      chi2a = std::max((schi - si * tgral) / (it - skip_iters - 0.9999), 0.0);
      sd = std::sqrt(1.0 / swgt);
      const bool ok = (std::fabs(sd / tgral) <= epsrel) || (sd <= epsabs);
      status = (ok && it >= 5) ? 0 : 1;
    }

    if (adjusting)
      for (int d = 0; d < ndim; ++d)
        smooth_damp_rebin(xi[d], dh[d], kBins, kAlph);
  }

  *out_estimate = tgral;
  *out_errorest = sd;
  *out_chi2 = chi2a;
  *out_status = status;
  *out_neval = neval;
  if (out_iters) *out_iters = iters_run;
  return 0;
}

// Subregion-adaptive importance-sampling MC (CUBA Suave's algorithm;
// reference binding cubacpp/cubacpp/suave.hh).  Serial pick-worst-region
// loop: each region carries its own per-dimension importance grid
// (children inherit the parent's, split dimension reset to uniform),
// sample information is reused across subdivisions as inverse-variance
// sufficient statistics, and the split dimension minimizes the sampled
// fluctuation (p-norm of |weighted f| over the two prospective halves,
// p = min(flatness, 16) in overflow-safe ratios-to-max form).
// status: 0 converged, 1 max_regions reached without convergence.
int quad_suave(quad_integrand f, void* userdata, int ndim,
               const double* lows, const double* highs, double epsrel,
               double epsabs, long long nnew, int nmin, double flatness,
               long long max_regions, unsigned long long seed,
               double* out_estimate, double* out_errorest, int* out_status,
               long long* out_neval, long long* out_nregions) {
  if (ndim < 1 || ndim > 32 || nnew < 2 || nmin < 1 || max_regions < 1)
    return -1;
  constexpr int kB = 64;        // bins per region-local grid dimension
  constexpr double kAlph = 1.5;
  const double p = std::min(flatness, 16.0);

  struct SRegion {
    std::vector<double> lo, len;            // unit space
    std::vector<std::vector<double>> grid;  // ndim x (kB+1) edges in [0,1]
    double wi = 0.0, w = 0.0;               // inverse-variance accumulators
    std::vector<double> flu;                // per-dim fluctuation, last cycle
    std::vector<double> mass_lo;            // per-dim SIGNED lower-half mass
    double mass = 0.0, mass_abs = 0.0;      // signed / absolute total mass
  };

  std::vector<double> glo(lows, lows + ndim);
  std::vector<double> grange(ndim);
  double gjac = 1.0;
  for (int d = 0; d < ndim; ++d) {
    grange[d] = highs[d] - lows[d];
    gjac *= grange[d];
  }

  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  long long neval = 0;

  const long long ns = nnew * nmin;
  std::vector<double> us(ns * ndim), wfs(ns);  // cycle sample buffer
  std::vector<double> x(ndim);
  std::vector<int> bins(ndim);

  // One cycle: nmin passes of nnew importance-sampled points through the
  // region's grid (refined after each pass), then the cycle estimate,
  // variance, per-dim fluctuation and signed half masses from the buffer.
  auto cycle = [&](SRegion& r) {
    double vol = 1.0;
    for (int d = 0; d < ndim; ++d) vol *= r.len[d];
    std::vector<std::vector<double>> dh(ndim, std::vector<double>(kB));
    long long s = 0;
    for (int pass = 0; pass < nmin; ++pass) {
      for (auto& row : dh) std::fill(row.begin(), row.end(), 0.0);
      for (long long k = 0; k < nnew; ++k, ++s) {
        double wgt = gjac * vol;
        for (int d = 0; d < ndim; ++d) {
          const double u = uni(rng);
          us[s * ndim + d] = u;
          const double pos = u * kB;
          int b = std::min((int)pos, kB - 1);
          bins[d] = b;
          const double xo = r.grid[d][b + 1] - r.grid[d][b];
          const double rloc = r.grid[d][b] + (pos - b) * xo;
          x[d] = glo[d] + (r.lo[d] + rloc * r.len[d]) * grange[d];
          wgt *= xo * kB;
        }
        const double wf = wgt * f(x.data(), ndim, userdata);
        wfs[s] = wf;
        for (int d = 0; d < ndim; ++d) dh[d][bins[d]] += wf * wf;
      }
      for (int d = 0; d < ndim; ++d)
        smooth_damp_rebin(r.grid[d], dh[d], kB, kAlph);
    }
    neval += ns;

    double s1 = 0.0, s2 = 0.0, maxv = 1e-300;
    for (long long k = 0; k < ns; ++k) {
      s1 += wfs[k];
      s2 += wfs[k] * wfs[k];
      maxv = std::max(maxv, std::fabs(wfs[k]));
    }
    const double mean = s1 / ns;
    const double var =
        std::max(s2 / ns - mean * mean, 0.0) / std::max(ns - 1.0, 1.0);
    r.flu.assign(ndim, 0.0);
    r.mass_lo.assign(ndim, 0.0);
    r.mass = s1;
    r.mass_abs = 0.0;
    for (long long k = 0; k < ns; ++k) r.mass_abs += std::fabs(wfs[k]);
    for (int d = 0; d < ndim; ++d) {
      double plo = 0.0, phi = 0.0;
      for (long long k = 0; k < ns; ++k) {
        const double t = std::pow(std::fabs(wfs[k]) / maxv, p);
        if (us[k * ndim + d] < 0.5) {
          plo += t;
          r.mass_lo[d] += wfs[k];
        } else {
          phi += t;
        }
      }
      r.flu[d] =
          maxv * (std::pow(plo, 1.0 / p) + std::pow(phi, 1.0 / p));
    }
    // fold the cycle into the reuse accumulators (I = mean, var-of-mean;
    // the volume factor is already inside wgt)
    const double cvar = std::max(var, 1e-300);
    r.wi += mean / cvar;
    r.w += 1.0 / cvar;
  };

  std::vector<SRegion> regions(1);
  regions[0].lo.assign(ndim, 0.0);
  regions[0].len.assign(ndim, 1.0);
  regions[0].grid.assign(
      ndim, [&] {
        std::vector<double> e(kB + 1);
        for (int b = 0; b <= kB; ++b) e[b] = (double)b / kB;
        return e;
      }());
  cycle(regions[0]);

  int status = 1;
  double total = 0.0, err = 0.0;
  for (;;) {
    total = 0.0;
    double var_sum = 0.0;
    size_t worst = 0;
    double worst_var = -1.0;
    for (size_t i = 0; i < regions.size(); ++i) {
      total += regions[i].wi / regions[i].w;
      const double v = 1.0 / regions[i].w;
      var_sum += v;
      if (v > worst_var) {
        worst_var = v;
        worst = i;
      }
    }
    err = std::sqrt(var_sum);
    if (err <= std::max(epsrel * std::fabs(total), epsabs)) {
      status = 0;
      break;
    }
    if ((long long)regions.size() >= max_regions) break;

    // split the worst region at its fluctuation-minimizing dimension
    SRegion& par = regions[worst];
    int d = 0;
    for (int k = 1; k < ndim; ++k)
      if (par.flu[k] < par.flu[d]) d = k;
    const double e_par = par.wi / par.w;
    const double w_par = par.w;
    // seed children from the parent's accumulated information: estimate
    // apportioned by the SIGNED measured lower-half mass (even split
    // under heavy cancellation), weight halved
    double fl = 0.5;
    if (std::fabs(par.mass) > 0.1 * par.mass_abs)
      fl = std::min(std::max(par.mass_lo[d] / par.mass, -1.0), 2.0);

    SRegion child = par;  // upper half: inherits grid + geometry
    par.len[d] *= 0.5;    // par becomes the lower half
    child.len[d] = par.len[d];
    child.lo[d] = par.lo[d] + par.len[d];
    for (int b = 0; b <= kB; ++b) {  // split dim restarts uniform
      par.grid[d][b] = (double)b / kB;
      child.grid[d][b] = (double)b / kB;
    }
    par.w = child.w = w_par * 0.5;
    par.wi = par.w * e_par * fl;
    child.wi = child.w * e_par * (1.0 - fl);
    regions.push_back(std::move(child));
    cycle(regions[worst]);
    cycle(regions.back());
  }

  *out_estimate = total;
  *out_errorest = err;
  *out_status = status;
  *out_neval = neval;
  *out_nregions = (long long)regions.size();
  return 0;
}

// Convenience: rule metadata for cross-checking the table construction.
int quad_rule_feval(int ndim) {
  if (ndim < 2 || ndim > 20) return -1;
  return build_rule(ndim).feval;
}

}  // extern "C"
