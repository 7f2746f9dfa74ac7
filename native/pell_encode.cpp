// Native PELL encoder — production-rate host encoding for the
// general-sparsity TPU kernel format (ca_lanczos_tpu/ops/pell.py).
//
// The numpy encoder is built from global argsorts over int64 composite
// keys plus a per-block Python packing loop; at the 10M-row corpus scale
// that is minutes of host time (round-3 VERDICT item 5).  Every encoding
// step is in fact LOCAL to one 128-row block, so this implementation
// walks blocks independently (OpenMP) with small per-block scratch:
// O(nnz) total, no global sorts, and the plane scatter writes disjoint
// (row, column) regions per block so the emission parallelizes too.
//
// Layout contract mirrors ops/pell.py exactly (reference seam: the
// format-generality extension point SpMV.m:1-5):
//   UNIT    — slot-tile sublane k bound to one chunk; vals[t*K+u, bl*128
//             + row] = a_ij, lidx int8 = col%128, cbase[t8, bl*K+u] = ch.
//   GROUPED — per-element int16 (sub<<7 | lane); nw windows of spread
//             8/nw per slot-tile (nw=2: the original two-spread-4 form;
//             nw=4: four spread-2 windows for multi-cluster tiles) with
//             bases cbase2[t8, (bl*KT+kt)*nw + w].
//
// C ABI (ctypes):
//   pell_plan_unit(...)     -> u_max   (per-entry ch + uord out)
//   pell_emit_unit(...)                (plane scatter, dbl flag)
//   pell_plan_grouped(...)  -> KT2     (0 = constraints failed: caller
//                                       falls back to the unit encoding)
//   pell_emit_grouped(...)
//
// Build: g++ -O3 -fopenmp -shared -fPIC -o libpell.so pell_encode.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int LANES = 128;
constexpr int SLOTS = 8;
constexpr int KTMAX = 64;  // max slot-tiles per block (K2 <= 512)

// Scratch-relative chunk of a column index within tile t's window list
// (ops/pell.py:303-315): w = last window start <= chunk (greedy cover
// guarantees existence), ch = w*sr + (chunk - wins[w]).
inline int32_t rel_chunk(int32_t col, const int32_t* wins, int nwin,
                         int64_t sr) {
  int32_t cg = col / LANES;
  int lo = 0, hi = nwin - 1, w = 0;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (wins[mid] <= cg) { w = mid; lo = mid + 1; } else { hi = mid - 1; }
  }
  return (int32_t)(w * sr + (cg - wins[w]));
}

struct BlockView {
  int64_t t;        // row tile
  int64_t bl;       // block index within tile
  int64_t row0;     // first global row
  int64_t nrows;    // rows in this block (<= 128; last block may be short)
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------
// UNIT encoding.
//
// plan: per entry, the scratch-relative chunk ch and the block-local
// unit ordinal uord of its (ch, layer) pair; returns max units/block.
// indptr: int64[n+1]; indices: int32[nnz]; wins: int32[ntiles*W] padded
// with repeats; win_cnt: int32[ntiles].
int64_t pell_plan_unit(int64_t n, int64_t tile, int64_t sr,
                       const int64_t* indptr, const int32_t* indices,
                       const int32_t* wins, const int32_t* win_cnt,
                       int64_t W, int32_t* ch_out, int32_t* uord_out) {
  const int64_t ntiles = (n + tile - 1) / tile;
  const int64_t B = tile / LANES;
  const int64_t nblocks = ntiles * B;
  int64_t u_max = 0;

#pragma omp parallel reduction(max : u_max)
  {
    // (ch, layer) keys of one block, then sort-unique for ordinals.
    std::vector<int64_t> keys;
    std::vector<int64_t> uniq;
#pragma omp for schedule(dynamic, 16)
    for (int64_t bk = 0; bk < nblocks; ++bk) {
      const int64_t t = bk / B;
      const int64_t row0 = bk * LANES;
      if (row0 >= n) continue;
      const int64_t rows = std::min<int64_t>(LANES, n - row0);
      const int32_t* twins = wins + t * W;
      const int nwin = win_cnt[t];
      const int64_t e0 = indptr[row0], e1 = indptr[row0 + rows];
      keys.clear();
      keys.reserve(e1 - e0);
      for (int64_t r = 0; r < rows; ++r) {
        int32_t prev_ch = -1;
        int32_t layer = 0;
        for (int64_t e = indptr[row0 + r]; e < indptr[row0 + r + 1]; ++e) {
          int32_t c = rel_chunk(indices[e], twins, nwin, sr);
          layer = (c == prev_ch) ? layer + 1 : 0;
          prev_ch = c;
          ch_out[e] = c;
          keys.push_back(((int64_t)c << 20) | layer);
        }
      }
      uniq = keys;
      std::sort(uniq.begin(), uniq.end());
      uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
      u_max = std::max<int64_t>(u_max, (int64_t)uniq.size());
      for (int64_t e = e0, i = 0; e < e1; ++e, ++i) {
        uord_out[e] = (int32_t)(std::lower_bound(uniq.begin(), uniq.end(),
                                                 keys[i]) -
                                uniq.begin());
      }
    }
  }
  return u_max;
}

// emit: scatter values/lane indices/chunk bindings into the planes.
// vals: (ntiles*K, tile) f32 or f64 (dbl); lidx: int8 same shape;
// cbase: (ntiles_pad8, B*K) int32.  All caller-zeroed.
void pell_emit_unit(int64_t n, int64_t tile, const int64_t* indptr,
                    const int32_t* indices, const void* data, int dbl,
                    const int32_t* ch, const int32_t* uord, int64_t K,
                    void* vals, int8_t* lidx, int32_t* cbase) {
  const int64_t B = tile / LANES;
  const int64_t nblocks = ((n + tile - 1) / tile) * B;
  const int64_t BK = B * K;

#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t bk = 0; bk < nblocks; ++bk) {
    const int64_t t = bk / B;
    const int64_t bl = bk % B;
    const int64_t row0 = bk * LANES;
    if (row0 >= n) continue;
    const int64_t rows = std::min<int64_t>(LANES, n - row0);
    for (int64_t r = 0; r < rows; ++r) {
      for (int64_t e = indptr[row0 + r]; e < indptr[row0 + r + 1]; ++e) {
        const int64_t rix = t * K + uord[e];
        const int64_t cix = rix * tile + bl * LANES + r;
        if (dbl)
          ((double*)vals)[cix] = ((const double*)data)[e];
        else
          ((float*)vals)[cix] = ((const float*)data)[e];
        lidx[cix] = (int8_t)(indices[e] % LANES);
        cbase[t * BK + bl * K + uord[e]] = ch[e];
      }
    }
  }
}

// ---------------------------------------------------------------------
// GROUPED encoding.
//
// plan: per entry, the block slot (kt*8 + j) and the window-relative
// sub index (0..7); per block, up to KTMAX window-base tuples (stride 4
// in bases_out regardless of nw).  nw windows of spread 8/nw.
// Returns KT2 = max slot-tiles over blocks, or 0 when the constraints
// fail anywhere (caller falls back to the unit encoding, exactly like
// the numpy encoder's None return).
int64_t pell_plan_grouped(int64_t n, int64_t tile, int64_t sr,
                          const int64_t* indptr, const int32_t* indices,
                          const int32_t* wins, const int32_t* win_cnt,
                          int64_t W, int64_t max_units, int64_t nw,
                          int32_t* slot_out, int8_t* sub_out,
                          int32_t* bases_out /* nblocks*KTMAX*4 */) {
  const int32_t sp = (int32_t)(8 / nw);  // window spread: nw*sp == 8
  const int64_t ntiles = (n + tile - 1) / tile;
  const int64_t B = tile / LANES;
  const int64_t nblocks = ntiles * B;
  int64_t kt_max = 0;
  int fail = 0;

#pragma omp parallel reduction(max : kt_max)
  {
    std::vector<int32_t> chs;          // per-entry rel chunk (block-local)
    std::vector<int32_t> uniq;         // sorted unique chunks
    std::vector<int32_t> cid_of;       // cluster id per uniq chunk
    std::vector<int32_t> unit_of;      // per-entry unit id
    // Unit slots, indexed unit = cid*stride + rank grown on demand:
    // lane->chunk binding and row-used bitsets.
    struct Unit {
      int32_t lane_ch[LANES];
      uint64_t rows[2];
      std::vector<int32_t> chunks;  // sorted set, small
      bool used = false;
    };
    std::vector<std::vector<Unit>> slots_by_cid;

#pragma omp for schedule(dynamic, 8)
    for (int64_t bk = 0; bk < nblocks; ++bk) {
      int f;
#pragma omp atomic read
      f = fail;
      if (f) continue;
      const int64_t t = bk / B;
      const int64_t bl = bk % B;
      const int64_t row0 = bk * LANES;
      if (row0 >= n) continue;
      const int64_t rows = std::min<int64_t>(LANES, n - row0);
      const int32_t* twins = wins + t * W;
      const int nwin = win_cnt[t];
      const int64_t e0 = indptr[row0], e1 = indptr[row0 + rows];
      if (e0 == e1) continue;

      // 1. chunks + clusters (gap >= 3 splits; ops/pell.py:452-466).
      chs.clear();
      chs.reserve(e1 - e0);
      for (int64_t e = e0; e < e1; ++e)
        chs.push_back(rel_chunk(indices[e], twins, nwin, sr));
      uniq = chs;
      std::sort(uniq.begin(), uniq.end());
      uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
      cid_of.assign(uniq.size(), 0);
      int32_t ncl = 0;
      for (size_t i = 1; i < uniq.size(); ++i) {
        if (uniq[i] - uniq[i - 1] >= 3) ++ncl;
        cid_of[i] = ncl;
      }
      ++ncl;

      // 2. greedy unit assignment with conflict walk (the numpy
      // encoder's guaranteed-terminating sequential repair, applied
      // uniformly: first rank whose (lane -> chunk) binding and row
      // are free; ops/pell.py:522-556).
      slots_by_cid.assign(ncl, {});
      unit_of.assign(e1 - e0, -1);
      int64_t i = 0;
      bool bad = false;
      for (int64_t r = 0; r < rows && !bad; ++r) {
        int32_t prev_cid = -1;
        int32_t rank0 = 0;
        for (int64_t e = indptr[row0 + r]; e < indptr[row0 + r + 1];
             ++e, ++i) {
          const int32_t c = chs[i];
          const int32_t ci = cid_of[std::lower_bound(uniq.begin(),
                                                     uniq.end(), c) -
                                    uniq.begin()];
          rank0 = (ci == prev_cid) ? rank0 + 1 : 0;  // in-(row,cluster) rank
          prev_cid = ci;
          auto& su = slots_by_cid[ci];
          int32_t rk = rank0;
          const int32_t lane = indices[e] % LANES;
          for (;; ++rk) {
            if (rk > max_units) { bad = true; break; }
            if ((size_t)rk >= su.size()) {
              su.emplace_back();
              auto& u = su.back();
              std::fill(u.lane_ch, u.lane_ch + LANES, -1);
              u.rows[0] = u.rows[1] = 0;
            }
            auto& u = su[rk];
            const uint64_t rbit = 1ull << (r & 63);
            if ((u.rows[r >> 6] & rbit) == 0 &&
                (u.lane_ch[lane] == -1 || u.lane_ch[lane] == c)) {
              u.rows[r >> 6] |= rbit;
              u.lane_ch[lane] = c;
              u.used = true;
              if (u.chunks.empty() || u.chunks.back() != c) {
                auto it = std::lower_bound(u.chunks.begin(), u.chunks.end(), c);
                if (it == u.chunks.end() || *it != c) u.chunks.insert(it, c);
              }
              unit_of[i] = ci * (int32_t)max_units + rk;
              break;
            }
          }
          if (bad) break;
        }
      }
      if (bad) {
#pragma omp atomic write
        fail = 1;
        continue;
      }

      // 3. pack units (in (cid, rank) order) into slot-tiles under the
      // nw-window cover (ops/pell.py _cover_windows): greedy fixed-
      // length interval cover — next window starts at the first
      // uncovered chunk — optimal for fixed-length covers.
      auto coverN = [nw, sp](const std::vector<int32_t>& cs,
                             int32_t* b /* [4] */) -> bool {
        b[0] = b[1] = b[2] = b[3] = 0;
        if (cs.empty()) return true;
        int64_t w = 0;
        size_t i = 0;
        while (i < cs.size()) {
          if (w == nw) return false;
          b[w] = cs[i];
          while (i < cs.size() && cs[i] - b[w] < sp) ++i;
          ++w;
        }
        for (; w < 4; ++w) b[w] = b[w - 1];  // harmless repeats
        return true;
      };

      std::vector<int32_t> cur;  // merged chunk set of the open tile
      std::vector<std::pair<int32_t, int32_t>> tiles_units;  // (unit, slot j)
      int32_t kt = 0, j = 0;
      int32_t bw[4] = {0, 0, 0, 0};
      int32_t* bases = bases_out + bk * KTMAX * 4;
      std::vector<int32_t> merged;
      bool open = false;
      for (int32_t ci = 0; ci < ncl && !bad; ++ci) {
        auto& su = slots_by_cid[ci];
        for (size_t rk = 0; rk < su.size() && !bad; ++rk) {
          auto& u = su[rk];
          if (!u.used) continue;
          // try to merge into the open tile
          bool placed = false;
          if (open && j < SLOTS) {
            merged.resize(cur.size() + u.chunks.size());
            std::merge(cur.begin(), cur.end(), u.chunks.begin(),
                       u.chunks.end(), merged.begin());
            merged.erase(std::unique(merged.begin(), merged.end()),
                         merged.end());
            int32_t nb[4];
            if (coverN(merged, nb)) {
              cur.swap(merged);
              std::memcpy(bw, nb, sizeof(nb));
              placed = true;
            }
          }
          if (!placed) {
            if (open) {  // close the tile
              if (kt >= KTMAX) { bad = true; break; }
              std::memcpy(bases + kt * 4, bw, 4 * sizeof(int32_t));
              ++kt;
              j = 0;
            }
            int32_t nb[4];
            if (!coverN(u.chunks, nb)) { bad = true; break; }
            cur = u.chunks;
            std::memcpy(bw, nb, sizeof(nb));
            open = true;
          }
          tiles_units.emplace_back(ci * (int32_t)max_units + (int32_t)rk,
                                   kt * SLOTS + j);
          ++j;
        }
      }
      if (!bad && open) {
        if (kt >= KTMAX) bad = true;
        else {
          std::memcpy(bases + kt * 4, bw, 4 * sizeof(int32_t));
          ++kt;
        }
      }
      if (bad) {
#pragma omp atomic write
        fail = 1;
        continue;
      }
      kt_max = std::max<int64_t>(kt_max, kt);

      // unit id -> slot lookup (units sparse in cid*max_units + rk space;
      // tiles_units is in assignment order, binary-searchable by unit id
      // because (cid, rank) order is ascending).
      // 4. per-entry slot + sub.
      for (int64_t e = e0, ii = 0; e < e1; ++e, ++ii) {
        const int32_t uid = unit_of[ii];
        auto it = std::lower_bound(
            tiles_units.begin(), tiles_units.end(), uid,
            [](const std::pair<int32_t, int32_t>& p, int32_t v) {
              return p.first < v;
            });
        const int32_t sl = it->second;
        const int32_t ktile = sl / SLOTS;
        const int32_t c = chs[ii];
        int32_t sub = -1;
        for (int64_t w = 0; w < nw; ++w) {
          const int32_t off = c - bases[ktile * 4 + w];
          if (off >= 0 && off < sp) { sub = (int32_t)(w * sp + off); break; }
        }
        if (sub < 0 || sub >= 8) {
#pragma omp atomic write
          fail = 1;
          break;
        }
        slot_out[e] = sl;
        sub_out[e] = (int8_t)sub;
      }
      tiles_units.clear();
    }
  }
  if (fail) return 0;
  return kt_max;
}

// emit: vals (ntiles*K2, tile); idx16 int16 same shape; cbase2
// (ntiles_pad8, B*KT2*nw) int32.  All caller-zeroed.
void pell_emit_grouped(int64_t n, int64_t tile, const int64_t* indptr,
                       const int32_t* indices, const void* data, int dbl,
                       const int32_t* slot, const int8_t* sub,
                       const int32_t* bases /* nblocks*KTMAX*4 */,
                       int64_t KT2, int64_t nw, void* vals, int16_t* idx16,
                       int32_t* cbase2) {
  const int64_t B = tile / LANES;
  const int64_t nblocks = ((n + tile - 1) / tile) * B;
  const int64_t K2 = KT2 * SLOTS;
  const int64_t row_stride = B * KT2 * nw;  // cbase2 row length

#pragma omp parallel for schedule(dynamic, 16)
  for (int64_t bk = 0; bk < nblocks; ++bk) {
    const int64_t t = bk / B;
    const int64_t bl = bk % B;
    const int64_t row0 = bk * LANES;
    if (row0 >= n) continue;
    const int64_t rows = std::min<int64_t>(LANES, n - row0);
    const int32_t* bb = bases + bk * KTMAX * 4;
    for (int64_t kt = 0; kt < KT2; ++kt)
      for (int64_t w = 0; w < nw; ++w)
        cbase2[t * row_stride + (bl * KT2 + kt) * nw + w] = bb[kt * 4 + w];
    for (int64_t r = 0; r < rows; ++r) {
      for (int64_t e = indptr[row0 + r]; e < indptr[row0 + r + 1]; ++e) {
        const int64_t rix = t * K2 + slot[e];
        const int64_t out = rix * tile + bl * LANES + r;
        const int64_t src = rix * tile + bl * LANES + (indices[e] % LANES);
        if (dbl)
          ((double*)vals)[out] = ((const double*)data)[e];
        else
          ((float*)vals)[out] = ((const float*)data)[e];
        idx16[out] = (int16_t)(idx16[out] | (indices[e] % LANES));
        idx16[src] = (int16_t)(idx16[src] | ((int16_t)sub[e] << 7));
      }
    }
  }
}

}  // extern "C"
