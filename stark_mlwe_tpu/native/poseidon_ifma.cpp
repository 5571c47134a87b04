// AVX-512 IFMA (vpmadd52) host-side Poseidon engine.
//
// The scalar kernel in poseidon.cpp runs one permutation at a time on
// 4x64 Montgomery limbs (~350us for t=17, ~9ms for t=129 on this host's
// single core).  This engine vectorizes EIGHT independent field elements
// per __m512i using the radix-2^52 representation that vpmadd52luq /
// vpmadd52huq are built for, giving ~8 lanes x ~2x per-mul win:
//
//   - batch sponge hashing (the verifier's multiproof digest rebuilds,
//     merkle/src/lib.rs:587-701 semantics) runs 8 rows per instruction
//     stream,
//   - the sequential Fiat-Shamir witness absorb chains
//     (transcript/src/lib.rs:79-88) run the 4 independent columns in 4
//     lanes of the same stream.
//
// Representation: 5 limbs of 52 bits, Montgomery R52 = 2^260, values kept
// RELAXED (< ~6P, every limb < 2^52) between operations; conversion to
// and from the library-wide Montgomery-2^256 4x64 form happens only at
// the API boundary (one vpmadd52 multiply each way).  Bounds:
//   - mont_mul: inputs < 6P  ->  T < 36P^2, out < P + 36P^2/2^260 < 2P
//   - lazy dot (constants pre-scaled by 2^312, SIX reduction rounds):
//     t <= 129 terms, inputs < 6P -> out < P + 129*36*P^2/2^312 < 2P
//   - the only unbounded accumulation (the partial-round column updates
//     s_i += qcol_i * x0 repeated rp-1 times) carries a conditional
//     subtract-2P at threshold 2^257 (top limb >= 2^49), so every value
//     stays < 2^257 + 2P < 6P.
//
// All arithmetic is exact integer math mod p: results are bit-identical
// to the scalar kernel and the Python golden model (tests/test_native*).
//
// Build: g++ -O3 -mavx512f -mavx512vl -mavx512dq -mavx512ifma -shared
//        -fPIC -o libposeidon_ifma.so poseidon_ifma.cpp
// Runtime guard: ifma_cpu_supported() must return 1 before any other call.

#include <cstdint>
#include <cstring>
#include <immintrin.h>
#include <vector>

using u64 = uint64_t;
using V = __m512i;

static const u64 M52 = (1ULL << 52) - 1;

// Pallas scalar field p, radix-2^52 limbs (little-endian).
static const u64 P52[5] = {0x6eb2100000001ULL, 0xfc0994a8dd8c4ULL,
                           0x224698ULL, 0x0ULL, 0x400000000000ULL};
static const u64 N0INV52 = 0x6eb20ffffffffULL; // -p^{-1} mod 2^52
// 2^264 mod p: mont52_mul(x*2^256, C_TO) = x*2^260 (into the 52-domain).
static const u64 C_TO[5] = {0xa6720fffffc01ULL, 0xd5b6f132ac709ULL,
                            0xfffff7707e2a8ULL, 0xfffffffffffffULL,
                            0x3fffffffffffULL};
// 2^256 mod p: mont52_mul(x*2^260, C_FROM) = x*2^256 (back out).
static const u64 C_FROM[5] = {0xb3e9cfffffffdULL, 0xbe34205675b2ULL,
                              0xfffffff992c35ULL, 0xfffffffffffffULL,
                              0x3fffffffffffULL};
static const u64 NEG_P[5] = {0x914deffffffffULL, 0x3f66b572273bULL,
                             0xfffffffddb967ULL, 0xfffffffffffffULL,
                             0xfbfffffffffffULL}; // 2^260 - p
static const u64 NEG_2P[5] = {0x229bdfffffffeULL, 0x7ecd6ae44e77ULL,
                              0xfffffffbb72ceULL, 0xfffffffffffffULL,
                              0xf7fffffffffffULL}; // 2^260 - 2p

struct Fv { V l[5]; }; // 8 field elements, limb-major

static inline V vzero() { return _mm512_setzero_si512(); }
static inline V bc(u64 x) { return _mm512_set1_epi64((long long)x); }
static inline V vand(V a, V b) { return _mm512_and_si512(a, b); }
static inline V vadd(V a, V b) { return _mm512_add_epi64(a, b); }
static inline V vsrl(V a, int s) { return _mm512_srli_epi64(a, s); }
static inline V vsll(V a, int s) { return _mm512_slli_epi64(a, s); }
static inline V vor(V a, V b) { return _mm512_or_si512(a, b); }
static inline V mlo(V acc, V a, V b) {
  return _mm512_madd52lo_epu64(acc, a, b);
}
static inline V mhi(V acc, V a, V b) {
  return _mm512_madd52hi_epu64(acc, a, b);
}

// ---------------------------------------------------------------------------
// Field core.
// ---------------------------------------------------------------------------

// carry-normalize 6 running sums into 5 limbs < 2^52 (top carry must be
// structurally zero: caller guarantees value < 2^260).
static inline Fv norm5(const V t[5]) {
  Fv r;
  V c = vzero();
  for (int k = 0; k < 5; ++k) {
    V v = vadd(t[k], c);
    r.l[k] = vand(v, bc(M52));
    c = vsrl(v, 52);
  }
  return r;
}

// a*b*2^-260 mod p (relaxed): inputs limbs < 2^52, values < 6p; out < 2p.
static inline Fv mont_mul(const Fv &a, const Fv &b) {
  V T[10];
  for (int i = 0; i < 10; ++i) T[i] = vzero();
  for (int p = 0; p < 5; ++p)
    for (int q = 0; q < 5; ++q) {
      T[p + q] = mlo(T[p + q], a.l[p], b.l[q]);
      T[p + q + 1] = mhi(T[p + q + 1], a.l[p], b.l[q]);
    }
  V n0 = bc(N0INV52);
  for (int i = 0; i < 5; ++i) {
    V m = mlo(vzero(), T[i], n0);
    T[i] = mlo(T[i], m, bc(P52[0]));
    T[i + 1] = mhi(T[i + 1], m, bc(P52[0]));
    for (int k = 1; k < 5; ++k) {
      T[i + k] = mlo(T[i + k], m, bc(P52[k]));
      T[i + k + 1] = mhi(T[i + k + 1], m, bc(P52[k])); // max index 9
    }
    T[i + 1] = vadd(T[i + 1], vsrl(T[i], 52));
  }
  return norm5(T + 5);
}

static inline Fv pow5(const Fv &x) {
  Fv x2 = mont_mul(x, x);
  Fv x4 = mont_mul(x2, x2);
  return mont_mul(x4, x);
}

// plain add, carry-normalized (no reduction): out value = a + b.
static inline Fv fadd(const Fv &a, const Fv &b) {
  V t[5];
  for (int k = 0; k < 5; ++k) t[k] = vadd(a.l[k], b.l[k]);
  return norm5(t);
}

// conditional subtract 2p when value >= 2^257 (top limb >= 2^49); keeps
// the partial-round accumulator chain below 2^257 + 2p.
static inline Fv cond_sub_2p(const Fv &a) {
  __mmask8 m = _mm512_cmpge_epu64_mask(a.l[4], bc(1ULL << 49));
  Fv r;
  V c = vzero();
  for (int k = 0; k < 5; ++k) {
    V v = _mm512_mask_add_epi64(a.l[k], m, a.l[k], bc(NEG_2P[k]));
    v = vadd(v, c);
    r.l[k] = vand(v, bc(M52));
    c = vsrl(v, 52);
  }
  return r; // carry out of limb 4 drops: arithmetic mod 2^260 by design
}

// lazy dot: T += c * s with a 5x52 constant (scaled by 2^312 python-side).
// T has 12 columns; reduction is SIX rounds (divide by 2^312).
static inline void dot_acc(V T[12], const u64 *c5, const Fv &s) {
  for (int p = 0; p < 5; ++p) {
    V cp = bc(c5[p]);
    for (int q = 0; q < 5; ++q) {
      T[p + q] = mlo(T[p + q], cp, s.l[q]);
      T[p + q + 1] = mhi(T[p + q + 1], cp, s.l[q]);
    }
  }
}

static inline Fv redc6(V T[12]) {
  V n0 = bc(N0INV52);
  for (int i = 0; i < 6; ++i) {
    V m = mlo(vzero(), T[i], n0);
    T[i] = mlo(T[i], m, bc(P52[0]));
    T[i + 1] = mhi(T[i + 1], m, bc(P52[0]));
    for (int k = 1; k < 5; ++k) {
      T[i + k] = mlo(T[i + k], m, bc(P52[k]));
      T[i + k + 1] = mhi(T[i + k + 1], m, bc(P52[k]));
    }
    T[i + 1] = vadd(T[i + 1], vsrl(T[i], 52));
  }
  return norm5(T + 6);
}

// add a 5x52 constant held as plain limbs (value form, < p).
static inline Fv add_const(const Fv &a, const u64 *c5) {
  V t[5];
  for (int k = 0; k < 5; ++k) t[k] = vadd(a.l[k], bc(c5[k]));
  return norm5(t);
}

static inline Fv mul_const52(const u64 *c5, const Fv &b) {
  Fv c;
  for (int k = 0; k < 5; ++k) c.l[k] = bc(c5[k]);
  return mont_mul(c, b);
}

// ---------------------------------------------------------------------------
// Boundary conversion: Montgomery-2^256 4x64 <-> relaxed mont52 lanes.
// ---------------------------------------------------------------------------

// gather 8 values' limb words: idx lanes are ELEMENT offsets in u64 units
// (i.e. 4*index-of-value); limb j adds j.
static inline Fv load8(const u64 *base, V idx, __mmask8 mask) {
  V a[4];
  for (int j = 0; j < 4; ++j)
    a[j] = _mm512_mask_i64gather_epi64(vzero(), mask,
                                       vadd(idx, bc((u64)j)),
                                       (const long long *)base, 8);
  Fv x;
  x.l[0] = vand(a[0], bc(M52));
  x.l[1] = vand(vor(vsrl(a[0], 52), vsll(a[1], 12)), bc(M52));
  x.l[2] = vand(vor(vsrl(a[1], 40), vsll(a[2], 24)), bc(M52));
  x.l[3] = vand(vor(vsrl(a[2], 28), vsll(a[3], 36)), bc(M52));
  x.l[4] = vsrl(a[3], 16);
  return mul_const52(C_TO, x); // x*2^256 -> x*2^260
}

// canonicalize to [0, p) in Montgomery-2^256 and scatter back.
static inline void store8(u64 *base, V idx, __mmask8 mask, const Fv &y0) {
  Fv y = mul_const52(C_FROM, y0); // x*2^260 -> x*2^256, value < 2p
  // up to two conditional subtracts of p (value < 2p after mont_mul,
  // but be safe and reduce twice)
  for (int pass = 0; pass < 2; ++pass) {
    V t[5];
    V c = vzero();
    for (int k = 0; k < 5; ++k) {
      V v = vadd(vadd(y.l[k], bc(NEG_P[k])), c);
      t[k] = vand(v, bc(M52));
      c = vsrl(v, 52);
    }
    // c == 1 in a lane  <=>  y >= p  (sum reached 2^260)
    __mmask8 ge = _mm512_cmpeq_epu64_mask(c, bc(1ULL));
    for (int k = 0; k < 5; ++k)
      y.l[k] = _mm512_mask_blend_epi64(ge, y.l[k], t[k]);
  }
  V a0 = vor(y.l[0], vsll(y.l[1], 52));
  V a1 = vor(vsrl(y.l[1], 12), vsll(y.l[2], 40));
  V a2 = vor(vsrl(y.l[2], 24), vsll(y.l[3], 28));
  V a3 = vor(vsrl(y.l[3], 36), vsll(y.l[4], 16));
  V a[4] = {a0, a1, a2, a3};
  for (int j = 0; j < 4; ++j)
    _mm512_mask_i64scatter_epi64((long long *)base, mask,
                                 vadd(idx, bc((u64)j)), a[j], 8);
}

struct IfmaParams {
  const u64 *mdsS;  // t*t*5
  const u64 *rcf;   // rf*t*5
  const u64 *rcp;   // rp*5
  const u64 *qrowS; // (rp-1)*t*5
  const u64 *qcol;  // (rp-1)*(t-1)*5
  const u64 *mfinS; // t*t*5
};

// ---------------------------------------------------------------------------
// Duplicated-lane ("dup") mode: when only C <= 4 independent streams are
// live (the prover's 4 witness absorb chains), the plain 8-lane layout
// wastes the upper half of every vector.  Dup mode keeps the INVARIANT
// lanes 4-7 == lanes 0-3 on every state vector and pairs two units of
// work per instruction:
//   - MDS / final-MDS rows i and i+1 accumulate in one dot with
//     half-blended constant vectors (lanes 0-3 = row i, 4-7 = row i+1),
//   - the partial-round column updates multiply two q-columns at once,
//   - full-round S-boxes cube two state elements per pow5,
//   - the partial-round q-row dot splits its j-range across the halves
//     and folds with one cross-half add before REDC.
// Results are unpacked back to duplicated form with vshufi64x2 (port 5,
// overlapping the vpmadd52 port) so every value stays bit-identical to
// the plain path.  Net: ~1.7x fewer vpmadd52 per permutation.
// ---------------------------------------------------------------------------

static inline V dup_lo(V x) { return _mm512_shuffle_i64x2(x, x, 0x44); }
static inline V dup_hi(V x) { return _mm512_shuffle_i64x2(x, x, 0xEE); }

// paired-constant dot: c5v is 5 full vectors (row i in lanes 0-3, row
// i+1 in lanes 4-7), s is duplicated.
static inline void dot_acc_v(V T[12], const u64 *c5v, const Fv &s) {
  for (int p = 0; p < 5; ++p) {
    V cp = _mm512_loadu_si512(c5v + 8 * p);
    for (int q = 0; q < 5; ++q) {
      T[p + q] = mlo(T[p + q], cp, s.l[q]);
      T[p + q + 1] = mhi(T[p + q + 1], cp, s.l[q]);
    }
  }
}

// split-j dot: constants pair (j, j+hj); states blended on the fly.
static inline void dot_acc_v2(V T[12], const u64 *c5v, const Fv &sa,
                              const Fv &sb) {
  for (int p = 0; p < 5; ++p) {
    V cp = _mm512_loadu_si512(c5v + 8 * p);
    for (int q = 0; q < 5; ++q) {
      V s = _mm512_mask_blend_epi64(0xF0, sa.l[q], sb.l[q]);
      T[p + q] = mlo(T[p + q], cp, s);
      T[p + q + 1] = mhi(T[p + q + 1], cp, s);
    }
  }
}

static inline Fv mont_mul_cv(const u64 *c5v, const Fv &b) {
  Fv c;
  for (int k = 0; k < 5; ++k) c.l[k] = _mm512_loadu_si512(c5v + 8 * k);
  return mont_mul(c, b);
}

static inline Fv add_const_v(const Fv &a, const u64 *c5v) {
  V t[5];
  for (int k = 0; k < 5; ++k)
    t[k] = vadd(a.l[k], _mm512_loadu_si512(c5v + 8 * k));
  return norm5(t);
}

// Paired constant tables (each entry: 5 vectors of 8 u64).
struct DupTables {
  std::vector<u64> mdsP, mfinP, rcfP, qcolP, qrowP;
  int npr;  // row pairs (t+1)/2
  int npc;  // column-update pairs (t-1)/2  (t odd for every width)
  int hj;   // q-row split offset (t+1)/2
};

static void pair_into(std::vector<u64> &out, const u64 *a, const u64 *b) {
  for (int p = 0; p < 5; ++p) {
    for (int l = 0; l < 4; ++l) out.push_back(a[p]);
    for (int l = 0; l < 4; ++l) out.push_back(b ? b[p] : 0);
  }
}

static void build_dup_tables(DupTables &dt, int t, int rf, int rp,
                             const IfmaParams &pp) {
  dt.npr = (t + 1) / 2;
  dt.npc = (t - 1) / 2;
  dt.hj = (t + 1) / 2;
  auto row = [&](const u64 *base, int i) { return base + (size_t)i * 5; };
  // MDS + final MDS: [pair][j] with rows (2*pi, min(2*pi+1, t-1)).
  for (int pi = 0; pi < dt.npr; ++pi) {
    int i = 2 * pi, i2 = (2 * pi + 1 < t) ? 2 * pi + 1 : i;
    for (int j = 0; j < t; ++j) {
      pair_into(dt.mdsP, row(pp.mdsS, i * t + j), row(pp.mdsS, i2 * t + j));
      pair_into(dt.mfinP, row(pp.mfinS, i * t + j),
                row(pp.mfinS, i2 * t + j));
    }
  }
  // full-round constants: [round][pair].
  for (int r = 0; r < rf; ++r)
    for (int pi = 0; pi < dt.npr; ++pi) {
      int i = 2 * pi, i2 = (2 * pi + 1 < t) ? 2 * pi + 1 : i;
      pair_into(dt.rcfP, row(pp.rcf, r * t + i), row(pp.rcf, r * t + i2));
    }
  // partial-round q-columns: [round][colpair] over t-1 columns.
  for (int r = 0; r < rp - 1; ++r)
    for (int pc = 0; pc < dt.npc; ++pc) {
      int c = 2 * pc, c2 = 2 * pc + 1; // both < t-1 (t odd)
      pair_into(dt.qcolP, row(pp.qcol, r * (t - 1) + c),
                row(pp.qcol, r * (t - 1) + c2));
    }
  // partial-round q-row, split j-range: [round][jpair] pairing
  // (j, j+hj); the tail element of an odd split gets a zero constant.
  for (int r = 0; r < rp - 1; ++r)
    for (int j = 0; j < dt.hj; ++j) {
      int j2 = j + dt.hj;
      pair_into(dt.qrowP, row(pp.qrowS, r * t + j),
                j2 < t ? row(pp.qrowS, r * t + j2) : nullptr);
    }
}

static void permute8_dup(Fv *st, Fv *tmp, int t, int rf, int rp,
                         const IfmaParams &pp, const DupTables &dt) {
  int half = rf / 2;
  auto unpack_pair = [&](const Fv &r2, Fv *a, Fv *b) {
    for (int k = 0; k < 5; ++k) a->l[k] = dup_lo(r2.l[k]);
    if (b)
      for (int k = 0; k < 5; ++k) b->l[k] = dup_hi(r2.l[k]);
  };
  auto mds_apply = [&](const std::vector<u64> &M) {
    for (int pi = 0; pi < dt.npr; ++pi) {
      V T[12];
      for (int k = 0; k < 12; ++k) T[k] = vzero();
      const u64 *base = M.data() + (size_t)pi * t * 40;
      for (int j = 0; j < t; ++j) dot_acc_v(T, base + (size_t)j * 40, st[j]);
      Fv r2 = redc6(T);
      int i = 2 * pi, i2 = 2 * pi + 1;
      unpack_pair(r2, &tmp[i], i2 < t ? &tmp[i2] : nullptr);
    }
    for (int i = 0; i < t; ++i) st[i] = tmp[i];
  };
  auto full_round = [&](int r) {
    const u64 *rc = dt.rcfP.data() + (size_t)r * dt.npr * 40;
    for (int pi = 0; pi < dt.npr; ++pi) {
      int i = 2 * pi, i2 = (2 * pi + 1 < t) ? 2 * pi + 1 : i;
      Fv x;
      for (int k = 0; k < 5; ++k)
        x.l[k] = _mm512_mask_blend_epi64(0xF0, st[i].l[k], st[i2].l[k]);
      x = pow5(add_const_v(x, rc + (size_t)pi * 40));
      unpack_pair(x, &st[i], 2 * pi + 1 < t ? &st[i2] : nullptr);
    }
    mds_apply(dt.mdsP);
  };
  for (int r = 0; r < half; ++r) full_round(r);
  for (int r = 0; r < rp; ++r) {
    st[0] = pow5(add_const(st[0], pp.rcp + (size_t)r * 5));
    if (r == rp - 1) break;
    // q-row dot with the j-range split across halves; one cross-half
    // fold before REDC (T stays within the 6-round reduction bound:
    // same total terms as the plain path).
    V T[12];
    for (int k = 0; k < 12; ++k) T[k] = vzero();
    const u64 *qr = dt.qrowP.data() + (size_t)r * dt.hj * 40;
    for (int j = 0; j < dt.hj; ++j) {
      int j2 = j + dt.hj;
      dot_acc_v2(T, qr + (size_t)j * 40, st[j], st[j2 < t ? j2 : 0]);
    }
    for (int k = 0; k < 12; ++k) T[k] = vadd(T[k], dup_hi(T[k]));
    Fv new0 = redc6(T);
    for (int k = 0; k < 5; ++k) new0.l[k] = dup_lo(new0.l[k]);
    const u64 *qc = dt.qcolP.data() + (size_t)r * dt.npc * 40;
    for (int pc = 0; pc < dt.npc; ++pc) {
      Fv prod = mont_mul_cv(qc + (size_t)pc * 40, st[0]);
      int i = 1 + 2 * pc, i2 = i + 1;
      Fv plo, phi;
      for (int k = 0; k < 5; ++k) plo.l[k] = dup_lo(prod.l[k]);
      for (int k = 0; k < 5; ++k) phi.l[k] = dup_hi(prod.l[k]);
      st[i] = cond_sub_2p(fadd(st[i], plo));
      st[i2] = cond_sub_2p(fadd(st[i2], phi));
    }
    st[0] = new0;
  }
  mds_apply(dt.mfinP);
  for (int r = half; r < rf; ++r) full_round(r);
}

// ---------------------------------------------------------------------------
// Permutation (8 lanes).  Mirrors poseidon.cpp permute_one exactly:
// half full rounds, rp factorized partial rounds, dense m_final, half
// full rounds.  Requires the factorization (qrowS/qcol52/mfinS non-null).
// Constant scales: mdsS/qrowS/mfinS = value * 2^312 (for redc6);
// rc_full52/rc_part52 = value * 2^260 (added to mont52 states);
// qcol52 = value * 2^260 (mont52 multiplier).
// ---------------------------------------------------------------------------

static void permute8(Fv *st, Fv *tmp, int t, int rf, int rp,
                     const IfmaParams &pp) {
  int half = rf / 2;
  auto mds_apply = [&](const u64 *M) {
    for (int i = 0; i < t; ++i) {
      V T[12];
      for (int k = 0; k < 12; ++k) T[k] = vzero();
      const u64 *row = M + (size_t)i * t * 5;
      for (int j = 0; j < t; ++j) dot_acc(T, row + (size_t)j * 5, st[j]);
      tmp[i] = redc6(T);
    }
    for (int i = 0; i < t; ++i) st[i] = tmp[i];
  };
  auto full_round = [&](int r) {
    const u64 *rc = pp.rcf + (size_t)r * t * 5;
    for (int i = 0; i < t; ++i)
      st[i] = pow5(add_const(st[i], rc + (size_t)i * 5));
    mds_apply(pp.mdsS);
  };
  for (int r = 0; r < half; ++r) full_round(r);
  for (int r = 0; r < rp; ++r) {
    st[0] = pow5(add_const(st[0], pp.rcp + (size_t)r * 5));
    if (r == rp - 1) break;
    const u64 *qr = pp.qrowS + (size_t)r * t * 5;
    const u64 *qc = pp.qcol + (size_t)r * (t - 1) * 5;
    V T[12];
    for (int k = 0; k < 12; ++k) T[k] = vzero();
    for (int j = 0; j < t; ++j) dot_acc(T, qr + (size_t)j * 5, st[j]);
    Fv new0 = redc6(T);
    for (int i = 1; i < t; ++i)
      st[i] = cond_sub_2p(
          fadd(st[i], mul_const52(qc + (size_t)(i - 1) * 5, st[0])));
    st[0] = new0;
  }
  mds_apply(pp.mfinS);
  for (int r = half; r < rf; ++r) full_round(r);
}

// ---------------------------------------------------------------------------
// Exports.
// ---------------------------------------------------------------------------

extern "C" {

int ifma_cpu_supported() {
  __builtin_cpu_init();
  return __builtin_cpu_supports("avx512ifma") &&
         __builtin_cpu_supports("avx512vl") &&
         __builtin_cpu_supports("avx512dq");
}

// states: B contiguous t*4-u64 Montgomery-2^256 states, permuted in place.
void ifma_permute_batch(u64 *states, long B, int t, int rf, int rp,
                        const u64 *mdsS, const u64 *rcf, const u64 *rcp,
                        const u64 *qrowS, const u64 *qcol,
                        const u64 *mfinS) {
  IfmaParams pp{mdsS, rcf, rcp, qrowS, qcol, mfinS};
  std::vector<Fv> st(t), tmp(t);
  for (long b0 = 0; b0 < B; b0 += 8) {
    int lanes = (int)((B - b0 < 8) ? (B - b0) : 8);
    __mmask8 mask = (__mmask8)((1u << lanes) - 1);
    long long off[8];
    for (int l = 0; l < 8; ++l)
      off[l] = ((b0 + (l < lanes ? l : 0)) * (long long)t) * 4;
    V base = _mm512_loadu_si512(off);
    for (int i = 0; i < t; ++i)
      st[i] = load8(states, vadd(base, bc((u64)(i * 4))), mask);
    permute8(st.data(), tmp.data(), t, rf, rp, pp);
    for (int i = 0; i < t; ++i)
      store8(states, vadd(base, bc((u64)(i * 4))), mask, st[i]);
  }
}

// Sponge with DS preamble already in rows + 10* padding
// (poseidon/src/lib.rs:288-312), 8 rows per stream.  rows [B, nfields, 4]
// Montgomery-2^256; digests [B, 4].
void ifma_hash_ds_batch(const u64 *rows, long B, int nfields, int t, int rf,
                        int rp, const u64 *mdsS, const u64 *rcf,
                        const u64 *rcp, const u64 *qrowS, const u64 *qcol,
                        const u64 *mfinS, u64 *digests) {
  IfmaParams pp{mdsS, rcf, rcp, qrowS, qcol, mfinS};
  int rate = t - 1;
  std::vector<Fv> st(t), tmp(t);
  Fv one; // 1 * 2^260 mod p == C_TO * C_FROM / ... : just build from C_FROM?
  {
    // mont52 one = 2^260 mod p: compute as mont_mul(C_TO_vec, C_FROM_vec)
    //   = 2^264 * 2^256 * 2^-260 = 2^260 mod p.
    Fv a, b;
    for (int k = 0; k < 5; ++k) { a.l[k] = bc(C_TO[k]); b.l[k] = bc(C_FROM[k]); }
    one = mont_mul(a, b);
  }
  for (long b0 = 0; b0 < B; b0 += 8) {
    int lanes = (int)((B - b0 < 8) ? (B - b0) : 8);
    __mmask8 mask = (__mmask8)((1u << lanes) - 1);
    long long off[8];
    for (int l = 0; l < 8; ++l)
      off[l] = ((b0 + (l < lanes ? l : 0)) * (long long)nfields) * 4;
    V base = _mm512_loadu_si512(off);
    for (int i = 0; i < t; ++i)
      for (int k = 0; k < 5; ++k) st[i].l[k] = vzero();
    int cursor = 0;
    auto do_permute = [&]() { permute8(st.data(), tmp.data(), t, rf, rp, pp); };
    auto absorb = [&](const Fv &x) {
      st[cursor] = fadd(st[cursor], x);
      if (++cursor == rate) { cursor = 0; do_permute(); }
    };
    for (int i = 0; i < nfields; ++i)
      absorb(load8(rows, vadd(base, bc((u64)(i * 4))), mask));
    absorb(one);
    Fv zero_f;
    for (int k = 0; k < 5; ++k) zero_f.l[k] = vzero();
    while (cursor != 0) absorb(zero_f);
    long long doff[8];
    for (int l = 0; l < 8; ++l) doff[l] = (b0 + (l < lanes ? l : 0)) * 4;
    store8(digests, _mm512_loadu_si512(doff), mask, st[0]);
  }
}

// Sequential sponge absorb chains (transcript/src/lib.rs:79-88): C <= 8
// chains in lanes, all sharing the SAME cursor position and length.
// states [C, t, 4] in/out; fields [C, n, 4]; returns new shared pos.
// Returns -1 if C > 8 (caller must fall back to the scalar kernel).
int ifma_absorb_chains(u64 *states, const u64 *fields, long C, long n,
                       int pos_in, int t, int rf, int rp, const u64 *mdsS,
                       const u64 *rcf, const u64 *rcp, const u64 *qrowS,
                       const u64 *qcol, const u64 *mfinS) {
  if (C > 8) return -1;
  IfmaParams pp{mdsS, rcf, rcp, qrowS, qcol, mfinS};
  // C <= 4 with an odd width and the factorization present: duplicated-
  // lane mode (see permute8_dup).  Loads replicate the chains into the
  // upper half; stores write only the C live lanes.
  bool dup = (C <= 4) && (t % 2 == 1) && qrowS && qcol && mfinS;
  DupTables dt;
  if (dup) build_dup_tables(dt, t, rf, rp, pp);
  int rate = t - 1;
  std::vector<Fv> st(t), tmp(t);
  __mmask8 smask = (__mmask8)((1u << C) - 1);
  __mmask8 lmask = dup ? (__mmask8)0xFF : smask;
  long long soff[8], foff[8];
  for (int l = 0; l < 8; ++l) {
    int c = dup ? ((l & 3) % (int)C) : (l < C ? l : 0);
    soff[l] = (c * (long long)t) * 4;
    foff[l] = (c * (long long)n) * 4;
  }
  V sbase = _mm512_loadu_si512(soff);
  V fbase = _mm512_loadu_si512(foff);
  for (int i = 0; i < t; ++i)
    st[i] = load8(states, vadd(sbase, bc((u64)(i * 4))), lmask);
  int pos = pos_in;
  for (long i = 0; i < n; ++i) {
    if (pos == rate) {
      if (dup)
        permute8_dup(st.data(), tmp.data(), t, rf, rp, pp, dt);
      else
        permute8(st.data(), tmp.data(), t, rf, rp, pp);
      pos = 0;
    }
    st[pos] =
        fadd(st[pos], load8(fields, vadd(fbase, bc((u64)(i * 4))), lmask));
    ++pos;
  }
  for (int i = 0; i < t; ++i)
    store8(states, vadd(sbase, bc((u64)(i * 4))), smask, st[i]);
  return pos;
}

// -- diagnostics (also used by tests): boundary roundtrip and one
//    Montgomery multiply in the library-wide 2^256 domain.
void ifma_roundtrip(u64 *vals, long n) {
  for (long b0 = 0; b0 < n; b0 += 8) {
    int lanes = (int)((n - b0 < 8) ? (n - b0) : 8);
    __mmask8 mask = (__mmask8)((1u << lanes) - 1);
    long long off[8];
    for (int l = 0; l < 8; ++l) off[l] = (b0 + (l < lanes ? l : 0)) * 4;
    V idx = _mm512_loadu_si512(off);
    Fv x = load8(vals, idx, mask);
    store8(vals, idx, mask, x);
  }
}

void ifma_mul(const u64 *a, const u64 *b, u64 *out, long n) {
  for (long b0 = 0; b0 < n; b0 += 8) {
    int lanes = (int)((n - b0 < 8) ? (n - b0) : 8);
    __mmask8 mask = (__mmask8)((1u << lanes) - 1);
    long long off[8];
    for (int l = 0; l < 8; ++l) off[l] = (b0 + (l < lanes ? l : 0)) * 4;
    V idx = _mm512_loadu_si512(off);
    Fv x = load8(a, idx, mask);
    Fv y = load8(b, idx, mask);
    store8(out, idx, mask, mont_mul(x, y));
  }
}

} // extern "C"
