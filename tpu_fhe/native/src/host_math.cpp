// Native host math for tpu-fhe: the CPU-side precompute hot loops.
//
// TPU-native counterpart of the reference's host layer
// (/root/reference/include/host/{ntt.h,numth.h,uintarithsmallmod.h},
// src/host/*.cu): twiddle-table generation, Shoup word computation,
// NTT-friendly prime search (Miller-Rabin), and signed-128-bit RNS
// decomposition.  All 64-bit modular arithmetic goes through __uint128_t.
//
// Exposed as a C ABI consumed via ctypes (tpu_fhe/native/__init__.py);
// every entry point has an exact pure-Python fallback, so this library is
// a performance feature, not a correctness dependency.

#include <cstdint>
#include <cstddef>
#include <initializer_list>

using u64 = std::uint64_t;
using u128 = unsigned __int128;
using i64 = std::int64_t;

static inline u64 mulmod(u64 a, u64 b, u64 q) {
    return (u64)(((u128)a * b) % q);
}

static inline u64 powmod(u64 base, u64 exp, u64 q) {
    u64 r = 1 % q;
    base %= q;
    while (exp) {
        if (exp & 1) r = mulmod(r, base, q);
        base = mulmod(base, base, q);
        exp >>= 1;
    }
    return r;
}

extern "C" {

// out[reverse_bits(i, log_n)] = base^i mod q, for i in [0, 2^log_n)
void powers_bitrev(u64 base, u64 q, std::uint32_t log_n, u64* out) {
    const std::size_t n = (std::size_t)1 << log_n;
    u64 power = 1;
    for (std::size_t i = 0; i < n; ++i) {
        // bit-reverse i
        std::size_t r = 0, v = i;
        for (std::uint32_t b = 0; b < log_n; ++b) { r = (r << 1) | (v & 1); v >>= 1; }
        out[r] = power;
        power = mulmod(power, base, q);
    }
}

// out[i] = floor(w[i] * 2^64 / q)
void shoup_vec(const u64* w, u64 q, std::size_t n, u64* out) {
    for (std::size_t i = 0; i < n; ++i) {
        out[i] = (u64)((((u128)w[i]) << 64) / q);
    }
}

// Miller-Rabin (deterministic for 64-bit with these witnesses)
int is_prime_u64(u64 n) {
    if (n < 2) return 0;
    for (u64 p : {2ull, 3ull, 5ull, 7ull, 11ull, 13ull, 17ull, 19ull, 23ull,
                  29ull, 31ull, 37ull}) {
        if (n == p) return 1;
        if (n % p == 0) return 0;
    }
    u64 d = n - 1;
    int s = 0;
    while ((d & 1) == 0) { d >>= 1; ++s; }
    for (u64 a : {2ull, 3ull, 5ull, 7ull, 11ull, 13ull, 17ull, 19ull, 23ull,
                  29ull, 31ull, 37ull}) {
        u64 x = powmod(a, d, n);
        if (x == 1 || x == n - 1) continue;
        bool comp = true;
        for (int r = 1; r < s; ++r) {
            x = mulmod(x, x, n);
            if (x == n - 1) { comp = false; break; }
        }
        if (comp) return 0;
    }
    return 1;
}

// Descending search for `count` NTT-friendly primes (q = 1 mod 2*ntt_size)
// of exactly bit_size bits, skipping values in exclude[0..n_excl).
// Returns the number found.
std::size_t find_ntt_primes(
    u64 ntt_size, std::uint32_t bit_size, std::size_t count,
    const u64* exclude, std::size_t n_excl, u64* out
) {
    const u64 factor = 2 * ntt_size;
    u64 value = ((u64)1 << bit_size) - factor + 1;
    const u64 lower = (u64)1 << (bit_size - 1);
    std::size_t found = 0;
    while (found < count && value > lower) {
        bool skip = false;
        for (std::size_t i = 0; i < n_excl; ++i) {
            if (exclude[i] == value) { skip = true; break; }
        }
        if (!skip && is_prime_u64(value)) out[found++] = value;
        value -= factor;
    }
    return found;
}

// Signed 128-bit coefficients (lo unsigned word, hi signed word) -> RNS
// residues: res[l * n + i] = coeff_i mod q_l, for L primes.
void decompose_i128(
    const u64* lo, const i64* hi, std::size_t n,
    const u64* q, std::size_t L, u64* res
) {
    for (std::size_t l = 0; l < L; ++l) {
        const u64 ql = q[l];
        const u64 two64 = (u64)(((u128)1 << 64) % ql);  // 2^64 mod q
        u64* row = res + l * n;
        for (std::size_t i = 0; i < n; ++i) {
            i64 h = hi[i];
            u64 habs = (u64)(h < 0 ? -(h + 1) : h);  // avoid INT64_MIN UB
            u64 hmod = habs % ql;
            if (h < 0) {
                // h = -(habs + 1)
                hmod = ql - ((hmod + 1) % ql);
                if (hmod == ql) hmod = 0;
            }
            u64 v = (u64)(((u128)hmod * two64 + lo[i] % ql) % ql);
            row[i] = v;
        }
    }
}

// Natural-order power table (for encoder / misc): out[i] = base^i mod q
void powers_natural(u64 base, u64 q, std::size_t n, u64* out) {
    u64 power = 1 % q;
    for (std::size_t i = 0; i < n; ++i) {
        out[i] = power;
        power = mulmod(power, base, q);
    }
}

}  // extern "C"
