// h2a_native: fast host-side BN254 G1 MSM for the framework's CPU runtime.
//
// The TPU owns the verification/proving compute path; this library is the
// native runtime piece around it (SRS generation, commit_lagrange in the
// host prover orchestration, test oracles) — the role the reference
// delegates to its Rust halo2 fork's multiexp (SURVEY.md §2b).
//
// Fq is 4x64-bit limbs in Montgomery form (CIOS with unsigned __int128);
// points are Jacobian; the MSM is windowed Pippenger with bucket suffix
// sums.  Exposed as a C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libh2a_native.so h2a_native.cpp

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// BN254 base field modulus q, little-endian 64-bit limbs
static const u64 Q[4] = {0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                         0xb85045b68181585dULL, 0x30644e72e131a029ULL};
// -q^{-1} mod 2^64
static const u64 Q_INV_NEG = 0x87d20782e4866389ULL;
// R^2 mod q (R = 2^256)
static const u64 R2[4] = {0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                          0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL};
// 1 in Montgomery form (R mod q)
static const u64 R1[4] = {0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                          0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL};

struct Fq {
  u64 v[4];
};

static inline bool is_zero(const Fq &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline int cmp(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] < b[i]) return -1;
    if (a[i] > b[i]) return 1;
  }
  return 0;
}

static inline void sub_nocarry(u64 r[4], const u64 a[4], const u64 b[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a[i] - b[i] - borrow;
    r[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

static inline void add_mod(Fq &r, const Fq &a, const Fq &b) {
  u128 carry = 0;
  u64 t[4];
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a.v[i] + b.v[i] + carry;
    t[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || cmp(t, Q) >= 0) sub_nocarry(r.v, t, Q);
  else memcpy(r.v, t, 32);
}

static inline void sub_mod(Fq &r, const Fq &a, const Fq &b) {
  if (cmp(a.v, b.v) >= 0) {
    sub_nocarry(r.v, a.v, b.v);
  } else {
    u64 t[4];
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
      u128 s = (u128)a.v[i] + Q[i] + carry;
      t[i] = (u64)s;
      carry = s >> 64;
    }
    sub_nocarry(r.v, t, b.v);
  }
}

static inline void dbl_mod(Fq &r, const Fq &a) { add_mod(r, a, a); }

// CIOS Montgomery multiplication
static void mont_mul(Fq &r, const Fq &a, const Fq &b) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + carry;
    t[4] = (u64)s;
    t[5] = (u64)(s >> 64);
    u64 m = t[0] * Q_INV_NEG;
    carry = ((u128)t[0] + (u128)m * Q[0]) >> 64;
    for (int j = 1; j < 4; j++) {
      u128 s2 = (u128)t[j] + (u128)m * Q[j] + carry;
      t[j - 1] = (u64)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[4] + carry;
    t[3] = (u64)s;
    t[4] = t[5] + (u64)(s >> 64);
    t[5] = 0;
  }
  if (t[4] || cmp(t, Q) >= 0) sub_nocarry(r.v, t, Q);
  else memcpy(r.v, t, 32);
}

static inline void mont_sq(Fq &r, const Fq &a) { mont_mul(r, a, a); }

static void mont_inv(Fq &r, const Fq &a) {
  // a^(q-2) via square-and-multiply (fixed exponent)
  static const u64 QM2[4] = {0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL,
                             0xb85045b68181585dULL, 0x30644e72e131a029ULL};
  Fq acc;
  memcpy(acc.v, R1, 32);
  for (int i = 3; i >= 0; --i) {
    for (int b = 63; b >= 0; --b) {
      mont_sq(acc, acc);
      if ((QM2[i] >> b) & 1) mont_mul(acc, acc, a);
    }
  }
  r = acc;
}

struct Jac {
  Fq x, y, z;  // z == 0 <=> infinity
};

static inline void jac_set_inf(Jac &p) { memset(&p, 0, sizeof(p)); }

static void jac_double(Jac &r, const Jac &p) {
  if (is_zero(p.z)) {
    r = p;
    return;
  }
  Fq a, b, c, d, e, f, t;
  mont_sq(a, p.x);
  mont_sq(b, p.y);
  mont_sq(c, b);
  add_mod(t, p.x, b);
  mont_sq(t, t);
  sub_mod(t, t, a);
  sub_mod(t, t, c);
  dbl_mod(d, t);
  dbl_mod(e, a);
  add_mod(e, e, a);
  mont_sq(f, e);
  Fq x3, y3, z3;
  dbl_mod(t, d);
  sub_mod(x3, f, t);
  Fq c8;
  dbl_mod(c8, c);
  dbl_mod(c8, c8);
  dbl_mod(c8, c8);
  sub_mod(t, d, x3);
  mont_mul(t, e, t);
  sub_mod(y3, t, c8);
  mont_mul(z3, p.y, p.z);
  dbl_mod(z3, z3);
  r.x = x3;
  r.y = y3;
  r.z = z3;
}

static void jac_add(Jac &r, const Jac &p, const Jac &q) {
  if (is_zero(p.z)) {
    r = q;
    return;
  }
  if (is_zero(q.z)) {
    r = p;
    return;
  }
  Fq z1z1, z2z2, u1, u2, s1, s2, h, rr, t;
  mont_sq(z1z1, p.z);
  mont_sq(z2z2, q.z);
  mont_mul(u1, p.x, z2z2);
  mont_mul(u2, q.x, z1z1);
  mont_mul(t, q.z, z2z2);
  mont_mul(s1, p.y, t);
  mont_mul(t, p.z, z1z1);
  mont_mul(s2, q.y, t);
  sub_mod(h, u2, u1);
  sub_mod(rr, s2, s1);
  if (is_zero(h)) {
    if (is_zero(rr)) {
      jac_double(r, p);
    } else {
      jac_set_inf(r);
    }
    return;
  }
  Fq h2, h3, u1h2, x3, y3, z3;
  mont_sq(h2, h);
  mont_mul(h3, h2, h);
  mont_mul(u1h2, u1, h2);
  mont_sq(x3, rr);
  sub_mod(x3, x3, h3);
  sub_mod(x3, x3, u1h2);
  sub_mod(x3, x3, u1h2);
  sub_mod(t, u1h2, x3);
  mont_mul(t, rr, t);
  Fq s1h3;
  mont_mul(s1h3, s1, h3);
  sub_mod(y3, t, s1h3);
  mont_mul(z3, p.z, q.z);
  mont_mul(z3, z3, h);
  r.x = x3;
  r.y = y3;
  r.z = z3;
}

extern "C" {

// points: n * 8 u64 (x limbs, y limbs), plain (non-Montgomery) canonical;
// infs: n bytes; scalars: n * 4 u64; out: 12 u64 Jacobian (plain form).
void h2a_g1_msm(const u64 *points, const uint8_t *infs, const u64 *scalars,
                size_t n, int window_bits, u64 *out) {
  int c = window_bits > 0 ? window_bits : (n < 32 ? 4 : (n < 4096 ? 8 : 12));
  int nwin = (254 + c - 1) / c;
  size_t nbuckets = ((size_t)1 << c) - 1;

  // convert points to Montgomery Jacobian once
  std::vector<Jac> pts(n);
  Fq r2;
  memcpy(r2.v, R2, 32);
  for (size_t i = 0; i < n; i++) {
    if (infs[i]) {
      jac_set_inf(pts[i]);
      continue;
    }
    Fq x, y;
    memcpy(x.v, points + i * 8, 32);
    memcpy(y.v, points + i * 8 + 4, 32);
    mont_mul(pts[i].x, x, r2);
    mont_mul(pts[i].y, y, r2);
    memcpy(pts[i].z.v, R1, 32);
  }

  std::vector<Jac> buckets(nbuckets);
  Jac acc;
  jac_set_inf(acc);
  for (int w = nwin - 1; w >= 0; --w) {
    for (int d = 0; d < c; d++) jac_double(acc, acc);
    for (auto &b : buckets) jac_set_inf(b);
    int shift = w * c;
    for (size_t i = 0; i < n; i++) {
      if (is_zero(pts[i].z)) continue;
      int limb = shift / 64, off = shift % 64;
      u64 d = scalars[i * 4 + limb] >> off;
      if (off && limb < 3) d |= scalars[i * 4 + limb + 1] << (64 - off);
      d &= nbuckets;  // mask = 2^c - 1
      if (d) jac_add(buckets[d - 1], buckets[d - 1], pts[i]);
    }
    Jac run, tot;
    jac_set_inf(run);
    jac_set_inf(tot);
    for (size_t b = nbuckets; b >= 1; --b) {
      jac_add(run, run, buckets[b - 1]);
      jac_add(tot, tot, run);
    }
    jac_add(acc, acc, tot);
  }

  // convert out of Montgomery (leave Jacobian; caller normalizes)
  Fq one;
  memset(one.v, 0, 32);
  one.v[0] = 1;
  Fq x, y, z;
  mont_mul(x, acc.x, one);
  mont_mul(y, acc.y, one);
  mont_mul(z, acc.z, one);
  memcpy(out, x.v, 32);
  memcpy(out + 4, y.v, 32);
  memcpy(out + 8, z.v, 32);
}

// batched fixed-base scalar mul: out[i] = scalars[i] * G  (for SRS gen)
void h2a_g1_batch_mul(const u64 *base_xy, const u64 *scalars, size_t n,
                      u64 *out_xyz) {
  Fq r2;
  memcpy(r2.v, R2, 32);
  Jac base;
  Fq x, y;
  memcpy(x.v, base_xy, 32);
  memcpy(y.v, base_xy + 4, 32);
  mont_mul(base.x, x, r2);
  mont_mul(base.y, y, r2);
  memcpy(base.z.v, R1, 32);
  // shared doubling table
  std::vector<Jac> table(254);
  table[0] = base;
  for (int i = 1; i < 254; i++) jac_double(table[i], table[i - 1]);
  Fq one;
  memset(one.v, 0, 32);
  one.v[0] = 1;
  for (size_t i = 0; i < n; i++) {
    Jac acc;
    jac_set_inf(acc);
    for (int b = 0; b < 254; b++) {
      if ((scalars[i * 4 + b / 64] >> (b % 64)) & 1)
        jac_add(acc, acc, table[b]);
    }
    Fq ox, oy, oz;
    mont_mul(ox, acc.x, one);
    mont_mul(oy, acc.y, one);
    mont_mul(oz, acc.z, one);
    memcpy(out_xyz + i * 12, ox.v, 32);
    memcpy(out_xyz + i * 12 + 4, oy.v, 32);
    memcpy(out_xyz + i * 12 + 8, oz.v, 32);
  }
}
}
