// Fast-marching eikonal solver on a masked 2-D grid.
//
// Native replacement for the scikit-fmm dependency the reference planner
// leans on (/root/reference/evaluation/slam.py:19-30: skfmm.distance over a
// masked traversible grid with the goal cell at 0, dx=1). Solves
// |grad T| = 1 with the standard first-order upwind discretization and a
// binary min-heap, which is what skfmm does for this call shape, so
// distances agree to discretization order.
//
// C ABI (ctypes):
//   fmm_distance(mask, h, w, goals_y, goals_x, n_goals, out)
//     mask:  uint8[h*w], 1 = traversible, 0 = obstacle (masked out)
//     goals: arrays of n_goals seed cells (distance 0)
//     out:   float64[h*w]; +inf for unreached or masked cells
//
// Build: native/fmm/Makefile -> libfmm.so; loaded via video_dqn_tpu/ops/fmm.py.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <utility>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();

struct HeapItem {
  double t;
  int idx;
  bool operator>(const HeapItem& o) const { return t > o.t; }
};

// Solve the quadratic for the upwind update at a cell given the smaller
// accepted neighbor values along x and y.
inline double solve_eikonal(double tx, double ty) {
  double tmin = std::min(tx, ty), tmax = std::max(tx, ty);
  if (tmax == kInf) return tmin + 1.0;
  double diff = tmax - tmin;
  if (diff >= 1.0) return tmin + 1.0;
  // (T - tx)^2 + (T - ty)^2 = 1
  double s = tx + ty;
  double disc = s * s - 2.0 * (tx * tx + ty * ty - 1.0);
  return 0.5 * (s + std::sqrt(disc));
}

}  // namespace

extern "C" {

void fmm_distance(const uint8_t* mask_in, int h, int w, const int32_t* goals_y,
                  const int32_t* goals_x, int n_goals, double* out) {
  const int n = h * w;
  std::vector<uint8_t> accepted(n, 0);
  for (int i = 0; i < n; ++i) out[i] = kInf;

  // Goal cells are forced traversible, matching the reference's unmask of
  // the goal before solving (/root/reference/evaluation/slam.py:27-29:
  // `traversible_ma[small_goal] = 0`). A waypoint whose cell was mapped as
  // an obstacle after selection must still yield a distance field.
  std::vector<uint8_t> mask_vec(mask_in, mask_in + n);
  uint8_t* mask = mask_vec.data();

  std::priority_queue<HeapItem, std::vector<HeapItem>, std::greater<HeapItem>>
      heap;
  for (int g = 0; g < n_goals; ++g) {
    int y = goals_y[g], x = goals_x[g];
    if (y < 0 || y >= h || x < 0 || x >= w) continue;
    int idx = y * w + x;
    mask[idx] = 1;
    out[idx] = 0.0;
    heap.push({0.0, idx});
  }

  const int dy[4] = {-1, 1, 0, 0};
  const int dx[4] = {0, 0, -1, 1};

  while (!heap.empty()) {
    HeapItem cur = heap.top();
    heap.pop();
    if (accepted[cur.idx]) continue;
    accepted[cur.idx] = 1;
    int cy = cur.idx / w, cx = cur.idx % w;
    for (int k = 0; k < 4; ++k) {
      int ny = cy + dy[k], nx = cx + dx[k];
      if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
      int nidx = ny * w + nx;
      if (!mask[nidx] || accepted[nidx]) continue;
      // upwind neighbors of the candidate
      double tx = kInf, ty = kInf;
      if (nx > 0 && mask[nidx - 1]) tx = std::min(tx, out[nidx - 1]);
      if (nx < w - 1 && mask[nidx + 1]) tx = std::min(tx, out[nidx + 1]);
      if (ny > 0 && mask[nidx - w]) ty = std::min(ty, out[nidx - w]);
      if (ny < h - 1 && mask[nidx + w]) ty = std::min(ty, out[nidx + w]);
      double t = solve_eikonal(tx, ty);
      if (t < out[nidx]) {
        out[nidx] = t;
        heap.push({t, nidx});
      }
    }
  }
}

// Bounded variant: identical wavefront, but stops early when
//  (a) the target cell (early_y, early_x) has been accepted AND the next
//      heap distance exceeds accepted_target_dist + margin, or
//  (b) the next heap distance exceeds max_dist (when max_dist >= 0).
// Cells never accepted stay +inf. Because FMM accepts cells in
// non-decreasing distance order, every cell whose true distance is within
// the bound carries its exact full-solve value — the planner only reads
// cells near the agent, so bounded solves are drop-in.
void fmm_distance_bounded(const uint8_t* mask_in, int h, int w,
                          const int32_t* goals_y, const int32_t* goals_x,
                          int n_goals, int early_y, int early_x,
                          double margin, double max_dist, double* out) {
  const int n = h * w;
  std::vector<uint8_t> accepted(n, 0);
  for (int i = 0; i < n; ++i) out[i] = kInf;

  // Goal cells forced traversible — see fmm_distance.
  std::vector<uint8_t> mask_vec(mask_in, mask_in + n);
  uint8_t* mask = mask_vec.data();

  std::priority_queue<HeapItem, std::vector<HeapItem>, std::greater<HeapItem>>
      heap;
  for (int g = 0; g < n_goals; ++g) {
    int y = goals_y[g], x = goals_x[g];
    if (y < 0 || y >= h || x < 0 || x >= w) continue;
    int idx = y * w + x;
    mask[idx] = 1;
    out[idx] = 0.0;
    heap.push({0.0, idx});
  }
  const int early_idx =
      (early_y >= 0 && early_y < h && early_x >= 0 && early_x < w)
          ? early_y * w + early_x
          : -1;
  double stop_at = (max_dist >= 0) ? max_dist : kInf;

  const int dy[4] = {-1, 1, 0, 0};
  const int dx[4] = {0, 0, -1, 1};

  while (!heap.empty()) {
    HeapItem cur = heap.top();
    if (cur.t > stop_at) break;
    heap.pop();
    if (accepted[cur.idx]) continue;
    accepted[cur.idx] = 1;
    if (cur.idx == early_idx) {
      double lim = cur.t + margin;
      if (lim < stop_at) stop_at = lim;
    }
    int cy = cur.idx / w, cx = cur.idx % w;
    for (int k = 0; k < 4; ++k) {
      int ny = cy + dy[k], nx = cx + dx[k];
      if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
      int nidx = ny * w + nx;
      if (!mask[nidx] || accepted[nidx]) continue;
      double tx = kInf, ty = kInf;
      if (nx > 0 && mask[nidx - 1]) tx = std::min(tx, out[nidx - 1]);
      if (nx < w - 1 && mask[nidx + 1]) tx = std::min(tx, out[nidx + 1]);
      if (ny > 0 && mask[nidx - w]) ty = std::min(ty, out[nidx - w]);
      if (ny < h - 1 && mask[nidx + w]) ty = std::min(ty, out[nidx + w]);
      double t = solve_eikonal(tx, ty);
      if (t < out[nidx]) {
        out[nidx] = t;
        heap.push({t, nidx});
      }
    }
  }
  // un-accepted cells may hold tentative (non-final) values: reset to inf
  for (int i = 0; i < n; ++i) {
    if (!accepted[i]) out[i] = kInf;
  }
}

// Batched variant: solve n_maps independent problems (one goal each).
// Amortizes the Python boundary when the eval loop scores many waypoint
// candidates.
void fmm_distance_batch(const uint8_t* masks, int n_maps, int h, int w,
                        const int32_t* goals_y, const int32_t* goals_x,
                        double* out) {
  const int n = h * w;
  for (int m = 0; m < n_maps; ++m) {
    fmm_distance(masks + (size_t)m * n, h, w, goals_y + m, goals_x + m, 1,
                 out + (size_t)m * n);
  }
}

}  // extern "C"
