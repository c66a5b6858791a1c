// Native host runtime for plutus_halo2_tpu — BLS12-381 Fr kernels.
//
// The reference's generator/runtime is native (Rust, src/plutus_gen/*); the
// TPU build keeps device compute in JAX/Pallas but moves the host-side prover
// hot loops (radix-2 NTTs over Fr used by refimpl/poly.py for quotient
// construction, plus batched pointwise field ops) into this C++ library,
// loaded via ctypes (see native/__init__.py). Pure-Python fallbacks remain.
//
// Field: BLS12-381 scalar field, 4x64-bit little-endian limbs, Montgomery
// form internally; the ABI exchanges canonical little-endian 32-byte scalars.

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;

static const uint64_t Q[4] = {0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
                              0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};
static const uint64_t INV = 0xfffffffeffffffffULL;  // -q^{-1} mod 2^64
static const uint64_t R2[4] = {0xc999e990f3f29c6dULL, 0x2b6cedcb87925c23ULL,
                               0x05d314967254398fULL, 0x0748d9d99f59ff11ULL};

struct Fr {
  uint64_t l[4];
};

static inline bool geq_q(const Fr &a) {
  for (int i = 3; i >= 0; --i) {
    if (a.l[i] > Q[i]) return true;
    if (a.l[i] < Q[i]) return false;
  }
  return true;  // equal
}

static inline void sub_q(Fr &a) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.l[i] - Q[i] - (uint64_t)borrow;
    a.l[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
}

static inline Fr fr_add(const Fr &a, const Fr &b) {
  Fr r;
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.l[i] + b.l[i] + (uint64_t)carry;
    r.l[i] = (uint64_t)s;
    carry = s >> 64;
  }
  if (carry || geq_q(r)) sub_q(r);
  return r;
}

static inline Fr fr_sub(const Fr &a, const Fr &b) {
  Fr r;
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.l[i] - b.l[i] - (uint64_t)borrow;
    r.l[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)r.l[i] + Q[i] + (uint64_t)carry;
      r.l[i] = (uint64_t)s;
      carry = s >> 64;
    }
  }
  return r;
}

// CIOS Montgomery multiplication.
static inline Fr fr_mul(const Fr &a, const Fr &b) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)a.l[j] * b.l[i] + t[j] + (uint64_t)carry;
      t[j] = (uint64_t)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + (uint64_t)carry;
    t[4] = (uint64_t)s;
    t[5] = (uint64_t)(s >> 64);

    uint64_t m = t[0] * INV;
    carry = ((u128)m * Q[0] + t[0]) >> 64;
    for (int j = 1; j < 4; ++j) {
      u128 s2 = (u128)m * Q[j] + t[j] + (uint64_t)carry;
      t[j - 1] = (uint64_t)s2;
      carry = s2 >> 64;
    }
    u128 s3 = (u128)t[4] + (uint64_t)carry;
    t[3] = (uint64_t)s3;
    t[4] = t[5] + (uint64_t)(s3 >> 64);
  }
  Fr r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || geq_q(r)) sub_q(r);
  return r;
}

static inline Fr fr_from_bytes(const uint8_t *p) {
  Fr a;
  memcpy(a.l, p, 32);
  return fr_mul(a, *(const Fr *)R2);  // to Montgomery
}

static inline void fr_to_bytes(const Fr &a, uint8_t *p) {
  Fr one = {{1, 0, 0, 0}};
  Fr canon = fr_mul(a, one);  // from Montgomery
  memcpy(p, canon.l, 32);
}

static inline Fr fr_pow(Fr base, uint64_t *exp, int nlimbs) {
  Fr one_m = fr_from_bytes((const uint8_t *)"\x01\x00\x00\x00\x00\x00\x00\x00"
                                            "\x00\x00\x00\x00\x00\x00\x00\x00"
                                            "\x00\x00\x00\x00\x00\x00\x00\x00"
                                            "\x00\x00\x00\x00\x00\x00\x00\x00");
  Fr acc = one_m;
  for (int i = nlimbs - 1; i >= 0; --i) {
    for (int b = 63; b >= 0; --b) {
      acc = fr_mul(acc, acc);
      if ((exp[i] >> b) & 1) acc = fr_mul(acc, base);
    }
  }
  return acc;
}

extern "C" {

// In-place radix-2 Cooley–Tukey NTT over canonical LE 32-byte scalars.
// data: n*32 bytes; omega: 32 bytes (primitive n-th root); n must be a
// power of two. Matches refimpl/poly.py:32 bit-exactly.
void fr_ntt(uint8_t *data, uint64_t n, const uint8_t *omega_bytes) {
  std::vector<Fr> a(n);
  for (uint64_t i = 0; i < n; ++i) a[i] = fr_from_bytes(data + 32 * i);

  // bit-reversal permutation
  uint32_t lg = 0;
  while ((1ULL << lg) < n) ++lg;
  for (uint64_t i = 0; i < n; ++i) {
    uint64_t j = 0;
    for (uint32_t b = 0; b < lg; ++b) j |= ((i >> b) & 1ULL) << (lg - 1 - b);
    if (i < j) std::swap(a[i], a[j]);
  }

  Fr omega = fr_from_bytes(omega_bytes);
  // precompute stage twiddles: w_m = omega^(n/m)
  for (uint64_t m = 2; m <= n; m <<= 1) {
    uint64_t exp_limbs[1] = {n / m};
    Fr wm = fr_pow(omega, exp_limbs, 1);
    for (uint64_t k0 = 0; k0 < n; k0 += m) {
      Fr w = fr_from_bytes((const uint8_t *)"\x01\x00\x00\x00\x00\x00\x00\x00"
                                            "\x00\x00\x00\x00\x00\x00\x00\x00"
                                            "\x00\x00\x00\x00\x00\x00\x00\x00"
                                            "\x00\x00\x00\x00\x00\x00\x00\x00");
      for (uint64_t j = 0; j < m / 2; ++j) {
        Fr t = fr_mul(w, a[k0 + j + m / 2]);
        Fr u = a[k0 + j];
        a[k0 + j] = fr_add(u, t);
        a[k0 + j + m / 2] = fr_sub(u, t);
        w = fr_mul(w, wm);
      }
    }
  }
  for (uint64_t i = 0; i < n; ++i) fr_to_bytes(a[i], data + 32 * i);
}

// out[i] = a[i] * b[i]  (canonical LE bytes, n scalars each)
void fr_mul_array(const uint8_t *a, const uint8_t *b, uint8_t *out, uint64_t n) {
  for (uint64_t i = 0; i < n; ++i) {
    Fr x = fr_from_bytes(a + 32 * i);
    Fr y = fr_from_bytes(b + 32 * i);
    fr_to_bytes(fr_mul(x, y), out + 32 * i);
  }
}

// out[i] = a[i] * k   (scale by one scalar)
void fr_scale_array(const uint8_t *a, const uint8_t *k, uint8_t *out, uint64_t n) {
  Fr s = fr_from_bytes(k);
  for (uint64_t i = 0; i < n; ++i) {
    fr_to_bytes(fr_mul(fr_from_bytes(a + 32 * i), s), out + 32 * i);
  }
}

// out[i] = a[i] * k^i  (coset/powers weighting used by coset_evaluate)
void fr_powers_mul_array(const uint8_t *a, const uint8_t *k, uint8_t *out, uint64_t n) {
  Fr s = fr_from_bytes(k);
  Fr acc = fr_from_bytes((const uint8_t *)"\x01\x00\x00\x00\x00\x00\x00\x00"
                                          "\x00\x00\x00\x00\x00\x00\x00\x00"
                                          "\x00\x00\x00\x00\x00\x00\x00\x00"
                                          "\x00\x00\x00\x00\x00\x00\x00\x00");
  for (uint64_t i = 0; i < n; ++i) {
    fr_to_bytes(fr_mul(fr_from_bytes(a + 32 * i), acc), out + 32 * i);
    acc = fr_mul(acc, s);
  }
}

int ph2_native_abi_version() { return 1; }

}  // extern "C"
