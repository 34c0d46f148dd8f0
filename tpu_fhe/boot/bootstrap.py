"""CKKS bootstrapping (OpenFHE FLEXIBLEAUTO semantics, TPU-native).

Behavioural mirror of the reference's FHECKKSRNS (src/bootstrap.cu):
  setup      — correction factor, collapsed-FFT parameters, C2S/S2C
               plaintext precompute at the extended basis QlP;
  keygen     — fused Galois keys for every BSGS rotation index + conjugation;
  bootstrap  — ModReduce -> AdjustCiphertext -> RaiseMod -> CoeffsToSlots
               (hoisted BSGS) -> conj split re/im -> Chebyshev sine approx
               -> double-angle iterations -> recombine -> SlotsToCoeffs.

The sine-approximation Chebyshev tables are NOT hard-coded: the reference's
g_coefficientsUniform / g_coefficientsSparse are exactly the Chebyshev
interpolation of (2pi)^(-1/2^r) * cos(2pi/2^r * (K x - 0.25)) on [-1, 1]
(verified to 1e-15), so we generate them parametrically at setup.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace

import numpy as np
import jax.numpy as jnp

from ..eval import auto, chebyshev as cheb, evaluator as ev, hoisting as hst
from ..ops.galois import apply_galois_ntt, conj_elt, galois_elt_from_step
from ..scheme.ciphertext import Ciphertext, Plaintext
from ..scheme.context import FheContext
from ..scheme.keys import GaloisKey, RelinKey, SecretKey
from . import boot_math as bm

K_SPARSE = 28
K_UNIFORM = 512
R_SPARSE = 3
R_UNIFORM = 6


def gen_sine_coefficients(k: float, r: int, degree: int) -> list[float]:
    """Chebyshev coefficients of (2pi)^(-1/2^r) cos(2pi/2^r (k x - 1/4))."""
    scale = (2 * math.pi) ** (-1.0 / (1 << r))

    def f(x):
        return scale * math.cos(2 * math.pi / (1 << r) * (k * x - 0.25))

    return cheb.eval_chebyshev_coefficients(f, -1.0, 1.0, degree)


@dataclass
class BootPrecom:
    slots: int
    params_enc: list[int]
    params_dec: list[int]
    a_c2s: list[list[Plaintext | None]] | None = None
    a_s2c: list[list[Plaintext | None]] | None = None
    # raw (rotated+scaled) complex vectors, kept for cleartext shadowing
    raw_c2s: list[list[np.ndarray | None]] | None = None
    raw_s2c: list[list[np.ndarray | None]] | None = None


class CkksBootstrapper:
    def __init__(self, ctx: FheContext, encoder):
        self.ctx = ctx
        self.encoder = encoder
        self.precom: dict[int, BootPrecom] = {}
        self.galois_keys: GaloisKey | None = None
        self.mul_key: RelinKey | None = None
        self.correction_factor = 0
        # dense ternary secret default (reference hardcodes the uniform case)
        self.k_bound = K_UNIFORM
        self.r_iters = R_UNIFORM
        self.poly_degree_sine = 88

    # ------------------------------------------------------------------
    def get_bootstrap_depth(self, level_budget: tuple[int, int]) -> int:
        coeffs = gen_sine_coefficients(
            self.k_bound, self.r_iters, self.poly_degree_sine
        )
        approx = cheb.get_mult_depth_by_coeff_vector(coeffs, normalized=False)
        return approx + self.r_iters + level_budget[0] + level_budget[1]

    def set_sine_params(self, k: float, r: int, degree: int):
        """Override the sine approximation (e.g. sparse-secret K=28, r=3,
        deg 44 — the reference's g_coefficientsSparse)."""
        self.k_bound = k
        self.r_iters = r
        self.poly_degree_sine = degree

    # ------------------------------------------------------------------
    def setup(
        self,
        level_budget: tuple[int, int] = (2, 2),
        dim1: tuple[int, int] = (0, 0),
        slots: int = 0,
        correction_factor: int = 0,
        precompute: bool = True,
    ):
        ctx = self.ctx
        n = ctx.n
        M = 2 * n
        slots = slots or n // 2
        if correction_factor == 0:
            tmp = round(-0.265 * (2 * math.log2(M / 2) + math.log2(slots)) + 19.1)
            self.correction_factor = min(13, max(7, int(tmp)))
        else:
            self.correction_factor = correction_factor

        log_slots = max(1, int(math.log2(slots)))
        budget = [
            min(max(level_budget[0], 1), log_slots),
            min(max(level_budget[1], 1), log_slots),
        ]
        pre = BootPrecom(
            slots=slots,
            params_enc=bm.get_collapsed_fft_params(slots, budget[0], dim1[0]),
            params_dec=bm.get_collapsed_fft_params(slots, budget[1], dim1[1]),
        )
        self.precom[slots] = pre
        if not precompute:
            return

        m = 4 * slots
        sparse = m != M
        rot_group = np.empty(slots, dtype=np.int64)
        five = 1
        for i in range(slots):
            rot_group[i] = five
            five = (five * 5) % m
        ksi = np.exp(2j * math.pi * np.arange(m + 1) / m)
        ksi[m] = ksi[0]

        q0 = self._anchor_product()
        # The Chebyshev-sine argument must advance by EXACTLY 1 per q0
        # overflow.  The net per-unit factor through prelude + C2S is
        # (q0 * 2^-deg / sf[0]) * scale_enc, so the exact correction is
        # scale_enc = sf[0] * 2^deg / q0.  The reference instead folds
        # pre = q0 / 2^round(log2 q0) (src/bootstrap.cu:110-117), which
        # equals this only when q0 and sf[0] are within float-eps of
        # powers of two — true for its 59/60-bit prime chains, ~1e-2 off
        # in composite scaling where q0 and the scale are PRODUCTS of
        # ~30-bit primes; that error shifts every q0-multiple by a
        # fraction of a sine period and destroys the bootstrap.
        sf_ladder, _ = auto.scaling_factors(ctx)
        pow_p = 2.0 ** round(math.log2(sf_ladder[0]))
        deg_pow = round(math.log2(q0 / pow_p))
        pre_scale = sf_ladder[0] * (2.0 ** deg_pow) / q0
        scale_enc = pre_scale / 1.0
        scale_dec = 1.0 / pre_scale

        depth_bt = self.get_bootstrap_depth((budget[0], budget[1]))
        # logical-level accounting: one BSGS level consumes one logical
        # level = composite_degree limbs (classic regime: one limb)
        L0 = ctx.params.size_Q // auto.composite_degree(ctx)
        l_enc = L0 - budget[0] - 1
        l_dec = L0 - depth_bt

        pre.a_c2s, pre.raw_c2s = self._coeffs_to_slots_precompute(
            pre, ksi, rot_group, False, scale_enc, l_enc, sparse
        )
        pre.a_s2c, pre.raw_s2c = self._slots_to_coeffs_precompute(
            pre, ksi, rot_group, False, scale_dec, l_dec, sparse
        )

    # ------------------------------------------------------------------
    def _anchor_product(self) -> float:
        """q0 of the reference generalized to composite scaling: the
        product of the anchor logical level's primes."""
        d = auto.composite_degree(self.ctx)
        prod = 1.0
        for v in self.ctx.q_values[:d]:
            prod *= float(v)
        return prod

    def _encode_ext_many(self, entries, scale_val, chain_index):
        """Encode [(idx, vec)] via the batched encoder path (chunked to
        bound host staging memory)."""
        CHUNK = 16
        out = []
        for c0 in range(0, len(entries), CHUNK):
            chunk = entries[c0:c0 + CHUNK]
            pts = self.encoder.encode_ext_batch(
                [v for _, v in chunk], scale_val, chain_index
            )
            out.extend(zip((i for i, _ in chunk), pts))
        return out

    def _coeffs_to_slots_precompute(
        self, pre: BootPrecom, ksi, rot_group, flag_i, scale, L, sparse=False
    ):
        """EvalCoeffsToSlotsPrecompute (src/bootstrap.cu:183-394).

        Sparse mode (slots < N/2, src/bootstrap.cu:326-390): each plaintext
        concatenates the coefficient vector with its i-multiplied twin
        (length 2*slots), rotations are reduced mod N/2, and encode_ext's
        tiling replicates the pattern across the full slot set — this is
        how the sparse path packs re and im into the single real branch."""
        ctx = self.ctx
        sf, _ = auto.scaling_factors(ctx)
        slots = pre.slots
        p = pre.params_enc
        level_budget = p[bm.LEVEL_BUDGET]
        layers = p[bm.LAYERS_COLL]
        rem = p[bm.LAYERS_REM]
        num_rot = p[bm.NUM_ROTATIONS]
        b, g = p[bm.BABY_STEP], p[bm.GIANT_STEP]
        num_rot_rem = p[bm.NUM_ROTATIONS_REM]
        b_rem, g_rem = p[bm.BABY_STEP_REM], p[bm.GIANT_STEP_REM]
        stop = 0 if rem else -1
        flag_rem = 1 if rem else 0

        d = auto.composite_degree(ctx)
        towers_to_drop = 0  # logical levels below the full chain
        chain_idx = 1
        if L != 0:
            towers_to_drop = ctx.params.size_Q // d - L - level_budget
        chain_idx += towers_to_drop * d
        level0 = towers_to_drop + level_budget - 1

        chain_vector = [0] * (level_budget - stop)
        ci = chain_idx
        for s in range(level_budget - 1, stop - 1, -1):
            chain_vector[s - stop] = ci
            ci += d

        coeff = bm.coeff_encoding_collapse(ksi, rot_group, level_budget, flag_i)
        coeff_i = (
            bm.coeff_encoding_collapse(ksi, rot_group, level_budget, True)
            if sparse else None
        )
        rot_mod = (2 * ctx.n) // 4 if sparse else slots

        def pick(s, idx):
            if sparse:
                return np.concatenate([coeff[s][idx], coeff_i[s][idx]])
            return coeff[s][idx]

        result: list[list[Plaintext | None]] = []
        raw: list[list[np.ndarray | None]] = []
        for i in range(level_budget):
            size = num_rot_rem if (flag_rem and i == 0) else num_rot
            result.append([None] * size)
            raw.append([None] * size)

        for s in range(level_budget - 1, stop, -1):
            entries = []
            for i in range(b):
                for j in range(g):
                    if g * i + j != num_rot:
                        rot = bm.reduce_rotation(
                            -g * i * (1 << ((s - flag_rem) * layers + rem)),
                            rot_mod,
                        )
                        vec = pick(s, g * i + j)
                        if flag_rem == 0 and s == stop + 1:
                            vec = vec * scale
                        rotated = bm.rotate_vec(vec, rot)
                        raw[s][g * i + j] = rotated
                        entries.append((g * i + j, rotated))
            for idx, pt in self._encode_ext_many(
                entries, sf[level0 - s], chain_vector[s - stop]
            ):
                result[s][idx] = pt
        if flag_rem:
            entries = []
            for i in range(b_rem):
                for j in range(g_rem):
                    if g_rem * i + j != num_rot_rem:
                        rot = bm.reduce_rotation(-g_rem * i, rot_mod)
                        vec = pick(stop, g_rem * i + j) * scale
                        rotated = bm.rotate_vec(vec, rot)
                        raw[stop][g_rem * i + j] = rotated
                        entries.append((g_rem * i + j, rotated))
            for idx, pt in self._encode_ext_many(
                entries, sf[level0], chain_vector[0]
            ):
                result[stop][idx] = pt
        return result, raw

    def _slots_to_coeffs_precompute(
        self, pre: BootPrecom, ksi, rot_group, flag_i, scale, L, sparse=False
    ):
        """EvalSlotsToCoeffsPrecompute (src/bootstrap.cu:396-590);
        sparse mode mirrors the C2S concatenation (src/bootstrap.cu:527-590)."""
        ctx = self.ctx
        sf, _ = auto.scaling_factors(ctx)
        slots = pre.slots
        p = pre.params_dec
        level_budget = p[bm.LEVEL_BUDGET]
        layers = p[bm.LAYERS_COLL]
        rem = p[bm.LAYERS_REM]
        num_rot = p[bm.NUM_ROTATIONS]
        b, g = p[bm.BABY_STEP], p[bm.GIANT_STEP]
        num_rot_rem = p[bm.NUM_ROTATIONS_REM]
        b_rem, g_rem = p[bm.BABY_STEP_REM], p[bm.GIANT_STEP_REM]
        flag_rem = 1 if rem else 0

        d = auto.composite_degree(ctx)
        towers_to_drop = 0  # logical levels below the full chain
        chain_idx = 1
        if L != 0:
            towers_to_drop = ctx.params.size_Q // d - L - level_budget
        chain_idx += towers_to_drop * d
        level0 = towers_to_drop

        chain_vector = [
            chain_idx + d * s for s in range(level_budget - flag_rem + 1)
        ]

        coeff = bm.coeff_decoding_collapse(ksi, rot_group, level_budget, flag_i)
        coeff_i = (
            bm.coeff_decoding_collapse(ksi, rot_group, level_budget, True)
            if sparse else None
        )
        rot_mod = (2 * ctx.n) // 4 if sparse else slots

        def pick(s, idx):
            if sparse:
                return np.concatenate([coeff[s][idx], coeff_i[s][idx]])
            return coeff[s][idx]

        result: list[list[Plaintext | None]] = []
        raw: list[list[np.ndarray | None]] = []
        for i in range(level_budget):
            size = num_rot_rem if (flag_rem and i == level_budget - 1) else num_rot
            result.append([None] * size)
            raw.append([None] * size)

        for s in range(level_budget - flag_rem):
            entries = []
            for i in range(b):
                for j in range(g):
                    if g * i + j != num_rot:
                        rot = bm.reduce_rotation(
                            -g * i * (1 << (s * layers)), rot_mod
                        )
                        vec = pick(s, g * i + j)
                        if flag_rem == 0 and s == level_budget - flag_rem - 1:
                            vec = vec * scale
                        rotated = bm.rotate_vec(vec, rot)
                        raw[s][g * i + j] = rotated
                        entries.append((g * i + j, rotated))
            for idx, pt in self._encode_ext_many(
                entries, sf[level0 + s], chain_vector[s]
            ):
                result[s][idx] = pt
        if flag_rem:
            s = level_budget - flag_rem
            for i in range(b_rem):
                for j in range(g_rem):
                    if g_rem * i + j != num_rot_rem:
                        rot = bm.reduce_rotation(
                            -g_rem * i * (1 << (s * layers)), rot_mod
                        )
                        vec = pick(s, g_rem * i + j) * scale
                        rotated = bm.rotate_vec(vec, rot)
                        raw[s][g_rem * i + j] = rotated
                        result[s][g_rem * i + j] = self.encoder.encode_ext(
                            rotated, sf[level0 + s], chain_index=chain_vector[s]
                        )
        return result, raw

    # ------------------------------------------------------------------
    def find_rotation_indices(self, slots: int) -> list[int]:
        """FindBootstrapRotationIndices (src/bootstrap.cu:612-648)."""
        M = 2 * self.ctx.n
        out = self._fft_rotation_indices(slots, encode=True)
        out += self._fft_rotation_indices(slots, encode=False)
        out = sorted(set(out))
        return [v for v in out if v != 0 and v != M // 4]

    def _fft_rotation_indices(self, slots: int, encode: bool) -> list[int]:
        pre = self.precom[slots]
        M = 2 * self.ctx.n
        p = pre.params_enc if encode else pre.params_dec
        level_budget = p[bm.LEVEL_BUDGET]
        layers, rem = p[bm.LAYERS_COLL], p[bm.LAYERS_REM]
        num_rot, b, g = p[bm.NUM_ROTATIONS], p[bm.BABY_STEP], p[bm.GIANT_STEP]
        num_rot_rem, b_rem, g_rem = (
            p[bm.NUM_ROTATIONS_REM], p[bm.BABY_STEP_REM], p[bm.GIANT_STEP_REM]
        )
        flag_rem = 1 if rem else 0
        stop = 0 if rem else -1
        out = []
        if encode:
            for s in range(level_budget - 1, stop, -1):
                for j in range(g):
                    out.append(bm.reduce_rotation(
                        (j - (num_rot + 1) // 2 + 1)
                        * (1 << ((s - flag_rem) * layers + rem)),
                        slots,
                    ))
                for i in range(b):
                    out.append(bm.reduce_rotation(
                        (g * i) * (1 << ((s - flag_rem) * layers + rem)), M // 4
                    ))
            if flag_rem:
                for j in range(g_rem):
                    out.append(bm.reduce_rotation(
                        j - (num_rot_rem + 1) // 2 + 1, slots
                    ))
                for i in range(b_rem):
                    out.append(bm.reduce_rotation(g_rem * i, M // 4))
        else:
            for s in range(level_budget - flag_rem):
                for j in range(g):
                    out.append(bm.reduce_rotation(
                        (j - (num_rot + 1) // 2 + 1) * (1 << (s * layers)), M // 4
                    ))
                for i in range(b):
                    out.append(bm.reduce_rotation(
                        (g * i) * (1 << (s * layers)), M // 4
                    ))
            if flag_rem:
                s = level_budget - flag_rem
                for j in range(g_rem):
                    out.append(bm.reduce_rotation(
                        (j - (num_rot_rem + 1) // 2 + 1) * (1 << (s * layers)),
                        M // 4,
                    ))
                for i in range(b_rem):
                    out.append(bm.reduce_rotation(
                        (g_rem * i) * (1 << (s * layers)), M // 4
                    ))
        m_small = slots * 4
        M_full = 2 * self.ctx.n
        if m_small != M_full:
            j = 1
            while j < M_full // m_small:
                out.append(j * slots)
                j <<= 1
        return out

    def keygen(self, sk: SecretKey, slots: int = 0):
        """EvalBootstrapKeyGen + EvalMultKeyGen.

        In the q32 regime rotation keys get Shoup companions: compact u32
        storage halved key HBM, so data+shoup together cost what plain
        W64-pair keys did — and the BSGS inner products ride the cheap
        lazy-Shoup kernel — but only while keys + BSGS plaintexts + the
        bootstrap working set still fit HBM.  At the largest configs
        (logN=16 full pack, 78+ limbs) the doubled key bytes push the
        program over a 16 GB chip (measured: C2S dies ResourceExhausted
        with companions, runs without), so the default is gated on an
        estimate of resident key bytes; TPU_FHE_BOOT_KEY_SHOUP=1/0
        forces either way, TPU_FHE_HBM_BUDGET (bytes) tunes the cap."""
        import os

        ctx = self.ctx
        slots = slots or ctx.n // 2
        steps = self.find_rotation_indices(slots)
        forced = os.environ.get("TPU_FHE_BOOT_KEY_SHOUP", "")
        if forced in ("0", "1"):
            want_shoup = ctx.is_q32 and forced == "1"
        else:
            want_shoup = ctx.is_q32
            if want_shoup:
                # resident key estimate: (rotations + conj + relin) fused
                # keys, each dnum digits x 2 components x sizeQP limb
                # planes of N u32 words; Shoup doubles it.  Keys are ~half
                # the footprint (plaintexts + working set are the rest),
                # so cap key bytes at ~40% of the budget.
                data_ks = ctx.level(1).ks
                dnum = len(data_ks.digits) if data_ks is not None else 2
                # count unique automorphism elements: galois_key dedups
                # via set(elts), and find_rotation_indices commonly yields
                # duplicate/zero steps across stages (+2: conj + relin)
                from ..ops.galois import galois_elt_from_step
                elts = {galois_elt_from_step(s, ctx.n)
                        for s in steps if s % (ctx.n // 2) != 0}
                n_keys = len(elts) + 2
                key_bytes = n_keys * dnum * 2 * ctx.level(0).size * ctx.n * 4
                budget = int(os.environ.get("TPU_FHE_HBM_BUDGET",
                                            15 * 2**30))
                want_shoup = 2 * key_bytes <= int(0.4 * budget)
        self.galois_keys = sk.galois_key(
            steps, include_conj=True, shoup=want_shoup
        )
        self.mul_key = sk.relin_key()
        # the BSGS stage jit captures galois keys as closure constants
        self._bsgs_jit_fn = None
        self.__dict__.pop("_bsgs_jit_fn_batched", None)

    # ------------------------------------------------------------------
    def adjust_ciphertext(self, ct: Ciphertext, correction: float) -> Ciphertext:
        """AdjustCiphertext (src/bootstrap.cu:1131-1155)."""
        ctx = self.ctx
        sf, _ = auto.scaling_factors(ctx)
        target_sf = sf[0]
        source_sf = ct.scale
        level = ctx.level(ct.chain_index)
        num_towers = level.size
        mod_to_drop = auto.level_group_product(ctx, num_towers)
        adjustment = (
            (target_sf / source_sf) * (mod_to_drop / source_sf)
            * math.pow(2.0, -correction)
        )
        ct = auto.mult_const(ctx, ct, adjustment)
        ct = auto.mod_reduce(ctx, ct, 1)
        return replace(ct, scale=target_sf)

    def apply_double_angle(self, ct: Ciphertext, num_iter: int,
                           mul_key: RelinKey | None = None) -> Ciphertext:
        ctx = self.ctx
        key = mul_key if mul_key is not None else self.mul_key
        r = num_iter
        for j in range(1, r + 1):
            ct = auto.eval_square_auto(ctx, ct, key)
            ct = auto.eval_add_auto(ctx, ct, ct)
            scalar = -1.0 / math.pow(2.0 * math.pi, math.pow(2.0, j - r))
            ct = auto.add_const(ctx, ct, scalar)
        return ct

    # ------------------------------------------------------------------
    # Stage-level jit: each BSGS level / sine stage compiles as ONE XLA
    # program (keyed on ct metadata + the static rotation plan), killing
    # per-op dispatch latency without the intractable whole-pipeline
    # compile.  Keys and plaintexts ride as jit ARGUMENTS: closure-captured
    # device arrays are serialized as constants into the compile payload
    # (observed: 3GB of galois keys broke the remote-compile transport).
    @staticmethod
    def _stage_jit_enabled() -> bool:
        """Stage jit default: on for TPU, off for CPU (XLA:CPU compile of a
        BSGS-stage program measured intractable even at logN=6; the fused
        Pallas kernels keep the TPU programs small)."""
        import os

        import jax

        mode = os.environ.get("TPU_FHE_BOOT_STAGE_JIT", "auto")
        if mode == "never":
            return False
        if mode == "always":
            return True
        return jax.default_backend() == "tpu"

    _BSGS_VMAP_AXES = (0, None, None, None, None, None, None, None)

    @staticmethod
    def _maybe_timed(name: str, fn):
        """TPU_FHE_BOOT_STAGE_TIME=1: blocked wall-clock per stage program.

        Blocks on the stage inputs first so each line charges only its own
        device time (async dispatch otherwise attributes upstream work to
        whichever stage blocks first); mirrors the reference's per-stage
        cudaEvent prints (bootstrapping_example.cu:137-196)."""
        import os

        if os.environ.get("TPU_FHE_BOOT_STAGE_TIME", "") != "1":
            return fn
        import time as _t

        import jax as _jax

        import numpy as _np

        def _fetch(tree):
            # D2H fetch of a few elements: the only reliable completion
            # barrier on the axon tunnel (block_until_ready returns after
            # dispatch there — observed: a 2.6 ms "sine" at logN=16)
            for x in _jax.tree_util.tree_leaves(tree):
                if hasattr(x, "ndim"):
                    _np.asarray(x.reshape(-1)[:2])
                    break

        def timed(*a, **k):
            _fetch((a, k))
            t0 = _t.perf_counter()
            out = fn(*a, **k)
            _fetch(out)
            print(f"[boot-stage] {name}: "
                  f"{(_t.perf_counter() - t0) * 1e3:.1f} ms", flush=True)
            return out

        return timed

    def _compact_wrap(self, fn):
        """q32 program-boundary compaction: stage outputs are canonical
        residues (< 2^30), so their W64 hi planes are structurally zero.
        Dropping them inside the program (ops/w64.compact_tree) halves
        the at-rest HBM of every stage output — the r04 full-scale OOM
        was the resident q32 base carrying zero hi planes at 2x bytes."""
        if not self.ctx.is_q32:
            return fn
        from ..ops.w64 import compact_tree

        def wrapped(*a, **k):
            return compact_tree(fn(*a, **k))

        return wrapped

    def _bsgs_jit(self, batched: bool = False):
        import jax

        base = self._bsgs_level
        if batched:
            base = jax.vmap(base, in_axes=self._BSGS_VMAP_AXES)
        base = self._compact_wrap(base)
        if not self._stage_jit_enabled():
            return self._maybe_timed("bsgs", base)
        attr = "_bsgs_jit_fn_batched" if batched else "_bsgs_jit_fn"
        fn = self.__dict__.get(attr)
        if fn is None:
            fn = jax.jit(base, static_argnums=(3, 4, 5, 6, 7))
            self.__dict__[attr] = fn
        return self._maybe_timed("bsgs", fn)

    def _keys_for(self, rot_in, rot_out) -> dict[int, RelinKey]:
        # the key subset one BSGS level needs, as a jit-arg pytree
        n = self.ctx.n
        keys: dict[int, RelinKey] = {}
        for step in list(rot_in) + list(rot_out):
            if step != 0:
                elt = galois_elt_from_step(step, n)
                keys[elt] = self.galois_keys.key_for_elt(elt)
        return keys

    def _glue_jit(self, key, fn, batched: bool = False, in_axes=0):
        """Cached jit for the light between-stage glue (prelude, conj
        split, recombine): each is a handful of ops, but eager dispatch
        over a remote-TPU transport costs ~RPC-latency per op.  `key`
        must include every closure constant the stage bakes in (slots,
        correction, scalars); switching keys ride as jit arguments
        (closure-captured key buffers would serialize into the compile
        payload).  `batched` wraps the stage in vmap over ciphertexts
        stacked with scheme.ciphertext.stack_cts; `in_axes` maps the
        stage's positional args (0 = batched ciphertext, None = shared
        keys/plaintexts)."""
        import jax

        if batched:
            fn = jax.vmap(fn, in_axes=in_axes)
            key = key + ("batched",)
        fn = self._compact_wrap(fn)
        if not self._stage_jit_enabled():
            return self._maybe_timed(str(key[0]), fn)
        f = self.__dict__.get(key)
        if f is None:
            f = jax.jit(fn)
            self.__dict__[key] = f
        return self._maybe_timed(str(key[0]), f)

    def _sine_jit(self, coefficients: tuple[float, ...],
                  batched: bool = False):
        import os

        import jax

        if os.environ.get("TPU_FHE_BOOT_SINE_SPLIT", "") == "1":
            # two stage programs instead of one: the single sine program's
            # transient peak (PS basis towers + recursion live ranges +
            # double-angle squares together) is what crosses 16 GB at the
            # full-scale ResNet config (r05 measurements); splitting lets
            # XLA free the Chebyshev working set before the double-angle
            # iterations allocate theirs
            def cheb_part(ct, mul_key):
                out = cheb.eval_chebyshev_series(
                    self.ctx, ct, mul_key, list(coefficients), -1.0, 1.0
                )
                return auto.mod_reduce(self.ctx, out, 1)

            def da_part(ct, mul_key):
                return self.apply_double_angle(ct, self.r_iters, mul_key)

            f1 = self._glue_jit(("_sine_cheb", coefficients), cheb_part,
                                batched, (0, None))
            f2 = self._glue_jit(("_sine_da", self.r_iters), da_part,
                                batched, (0, None))
            return lambda ct, mul_key: f2(f1(ct, mul_key), mul_key)

        def sine(ct, mul_key):
            out = cheb.eval_chebyshev_series(
                self.ctx, ct, mul_key, list(coefficients), -1.0, 1.0
            )
            out = auto.mod_reduce(self.ctx, out, 1)
            return self.apply_double_angle(out, self.r_iters, mul_key)

        if batched:
            sine = jax.vmap(sine, in_axes=(0, None))
        sine = self._compact_wrap(sine)
        if not self._stage_jit_enabled():
            return self._maybe_timed("sine", sine)
        key = ("_sine_jit_fn", coefficients, batched)
        fn = self.__dict__.get(key)
        if fn is None:
            fn = jax.jit(sine)
            self.__dict__[key] = fn
        return self._maybe_timed("sine", fn)

    def _bsgs_level(
        self,
        result: Ciphertext,
        A_level: list[Plaintext | None],
        keys: dict[int, RelinKey],
        rot_in: tuple[int, ...],
        rot_out: tuple[int, ...],
        b: int,
        g: int,
        num_rot: int,
    ) -> Ciphertext:
        """One hoisted BSGS level (shared by C2S/S2C — the loop bodies of
        EvalCoeffsToSlots/EvalSlotsToCoeffs are identical given the rotation
        tables; src/bootstrap.cu:1256-1402)."""
        ctx = self.ctx
        n = ctx.n
        digits = hst.fast_rotation_precompute(ctx, result)
        fast_rot: list[Ciphertext] = []
        for j in range(g):
            if rot_in[j] != 0:
                elt = galois_elt_from_step(rot_in[j], n)
                fast_rot.append(hst.fast_rotation_ext(
                    ctx, result, digits, elt, keys[elt], True
                ))
            else:
                fast_rot.append(hst.keyswitch_ext(ctx, result))

        level = ctx.level(result.chain_index)
        first = None  # (1, size_Ql, N) raw component
        outer = None
        for i in range(b):
            G = g * i
            inner = hst.eval_mult_ext(ctx, fast_rot[0], A_level[G])
            for j in range(1, g):
                if (G + j) != num_rot:
                    inner = hst.eval_add_ext(
                        ctx, inner,
                        hst.eval_mult_ext(ctx, fast_rot[j], A_level[G + j]),
                    )
            if i == 0:
                first = hst.keyswitch_down_first(ctx, inner)
                outer = hst.reset_poly_ext(ctx, inner, 0)
            else:
                if rot_out[i] != 0:
                    elt = galois_elt_from_step(rot_out[i], n)
                    inner_dn = hst.keyswitch_down(ctx, inner)
                    rot_c0 = apply_galois_ntt(inner_dn.data[0], elt, n)
                    first = first.with_data(
                        first.data.at[0].set(
                            jnp_add_mod(first.data[0], rot_c0, level.mod.q)
                        )
                    )
                    inner_digits = hst.fast_rotation_precompute(ctx, inner_dn)
                    outer = hst.eval_add_ext(
                        ctx, outer,
                        hst.fast_rotation_ext(
                            ctx, inner_dn, inner_digits, elt,
                            keys[elt], False,
                        ),
                    )
                else:
                    down = hst.keyswitch_down_first(ctx, inner)
                    first = first.with_data(
                        first.data.at[0].set(
                            jnp_add_mod(first.data[0], down.data[0], level.mod.q)
                        )
                    )
                    # only add c1 at the ext basis
                    q_ext = _ext_q(level)
                    new_c1 = jnp_add_mod(outer.data[1], inner.data[1], q_ext)
                    outer = outer.with_data(outer.data.at[1].set(new_c1))
        res = hst.keyswitch_down(ctx, outer)
        c0 = jnp_add_mod(res.data[0], first.data[0], level.mod.q)
        return res.with_data(res.data.at[0].set(c0))

    def _modred(self, ct: Ciphertext, batched: bool) -> Ciphertext:
        """Between-stage ModReduce as a cached stage program (keeps eager
        metadata ops off batched ciphertexts — rescale slices the limb
        axis by position and must see the per-example (size, L, N) view)."""
        return self._glue_jit(
            ("_modred",), lambda c: auto.mod_reduce(self.ctx, c, 1),
            batched, (0,)
        )(ct)

    def c2s_stage_plans(self, slots: int) -> list[tuple]:
        """Static rotation plans for the hoisted C2S BSGS levels, in
        execution order:
        [(a_index, rot_in, rot_out, b, g, num_rot, modred_first), ...]
        where modred_first says a ModReduce precedes the stage.  Shared by
        coeffs_to_slots and the limb-sharded dryrun/bench
        (parallel.boot_sharded)."""
        ctx = self.ctx
        pre = self.precom[slots]
        M = 2 * ctx.n
        p = pre.params_enc
        level_budget = p[bm.LEVEL_BUDGET]
        layers, rem = p[bm.LAYERS_COLL], p[bm.LAYERS_REM]
        num_rot, b, g = p[bm.NUM_ROTATIONS], p[bm.BABY_STEP], p[bm.GIANT_STEP]
        num_rot_rem, b_rem, g_rem = (
            p[bm.NUM_ROTATIONS_REM], p[bm.BABY_STEP_REM], p[bm.GIANT_STEP_REM]
        )
        flag_rem = 1 if rem else 0
        stop = 0 if rem else -1
        plans = []
        for si in range(level_budget - 1, stop, -1):
            rot_in = tuple(
                bm.reduce_rotation(
                    (j - (num_rot + 1) // 2 + 1)
                    * (1 << ((si - flag_rem) * layers + rem)),
                    slots,
                )
                for j in range(g)
            )
            rot_out = tuple(
                bm.reduce_rotation(
                    (g * i) * (1 << ((si - flag_rem) * layers + rem)), M // 4
                )
                for i in range(b)
            )
            plans.append((si, rot_in, rot_out, b, g, num_rot,
                          si != level_budget - 1))
        if flag_rem:
            rot_in = tuple(
                bm.reduce_rotation(j - (num_rot_rem + 1) // 2 + 1, slots)
                for j in range(g_rem)
            )
            rot_out = tuple(
                bm.reduce_rotation(g_rem * i, M // 4) for i in range(b_rem)
            )
            plans.append((stop, rot_in, rot_out, b_rem, g_rem, num_rot_rem,
                          True))
        return plans

    def s2c_stage_plans(self, slots: int) -> list[tuple]:
        """Static rotation plans for the S2C BSGS levels (see
        c2s_stage_plans)."""
        ctx = self.ctx
        pre = self.precom[slots]
        M = 2 * ctx.n
        p = pre.params_dec
        level_budget = p[bm.LEVEL_BUDGET]
        layers, rem = p[bm.LAYERS_COLL], p[bm.LAYERS_REM]
        num_rot, b, g = p[bm.NUM_ROTATIONS], p[bm.BABY_STEP], p[bm.GIANT_STEP]
        num_rot_rem, b_rem, g_rem = (
            p[bm.NUM_ROTATIONS_REM], p[bm.BABY_STEP_REM], p[bm.GIANT_STEP_REM]
        )
        flag_rem = 1 if rem else 0
        plans = []
        for si in range(level_budget - flag_rem):
            rot_in = tuple(
                bm.reduce_rotation(
                    (j - (num_rot + 1) // 2 + 1) * (1 << (si * layers)), M // 4
                )
                for j in range(g)
            )
            rot_out = tuple(
                bm.reduce_rotation((g * i) * (1 << (si * layers)), M // 4)
                for i in range(b)
            )
            plans.append((si, rot_in, rot_out, b, g, num_rot, si != 0))
        if flag_rem:
            si = level_budget - flag_rem
            rot_in = tuple(
                bm.reduce_rotation(
                    (j - (num_rot_rem + 1) // 2 + 1) * (1 << (si * layers)),
                    M // 4,
                )
                for j in range(g_rem)
            )
            rot_out = tuple(
                bm.reduce_rotation((g_rem * i) * (1 << (si * layers)), M // 4)
                for i in range(b_rem)
            )
            plans.append((si, rot_in, rot_out, b_rem, g_rem, num_rot_rem,
                          True))
        return plans

    def coeffs_to_slots(self, ct: Ciphertext, slots: int) -> Ciphertext:
        batched = ct.data.ndim == 4
        pre = self.precom[slots]
        result = ct
        for (si, rot_in, rot_out, b, g, num_rot, modred) in \
                self.c2s_stage_plans(slots):
            if modred:
                result = self._modred(result, batched)
            result = self._bsgs_jit(batched)(
                result, pre.a_c2s[si], self._keys_for(rot_in, rot_out),
                rot_in, rot_out, b, g, num_rot,
            )
        return result

    def slots_to_coeffs(self, ct: Ciphertext, slots: int) -> Ciphertext:
        batched = ct.data.ndim == 4
        pre = self.precom[slots]
        result = ct
        for (si, rot_in, rot_out, b, g, num_rot, modred) in \
                self.s2c_stage_plans(slots):
            if modred:
                result = self._modred(result, batched)
            result = self._bsgs_jit(batched)(
                result, pre.a_s2c[si], self._keys_for(rot_in, rot_out),
                rot_in, rot_out, b, g, num_rot,
            )
        return result

    # ------------------------------------------------------------------
    def eval_bootstrap_jit(self, ct: Ciphertext, slots: int = 0) -> Ciphertext:
        """Single-iteration bootstrap with every heavy stage jitted.

        The pipeline runs through cached stage programs (_bsgs_jit for each
        hoisted BSGS level, _sine_jit for Chebyshev sine + double-angle) —
        one XLA program per stage instead of per op, killing dispatch
        latency while keeping compiles tractable on every backend (a
        whole-pipeline jit was measured intractable for XLA:CPU even at
        logN=6).  eval_bootstrap itself routes through the same stage jits,
        so this entry point simply pins the single-iteration path."""
        return self.eval_bootstrap(ct, slots or self.ctx.n // 2, 1, 0)

    def eval_bootstrap(
        self, ct: Ciphertext, slots: int = 0, num_iterations: int = 1,
        precision: int = 0,
    ) -> Ciphertext:
        """EvalBootstrap (src/bootstrap.cu:843-1129), dense path + Meta-BTS."""
        ctx = self.ctx
        n = ctx.n
        M = 2 * n
        slots = slots or n // 2
        init_size_q = ctx.level(ct.chain_index).size
        batched = ct.data.ndim == 4

        if num_iterations > 1 and batched:
            # Meta-BTS mixes eager metadata ops (mod_switch_level slices
            # the limb axis by position) between the two passes; run the
            # channels of a batched ciphertext individually
            from ..scheme.ciphertext import stack_cts, unstack_cts

            outs = [
                self.eval_bootstrap(c, slots, num_iterations, precision)
                for c in unstack_cts(ct, ct.data.shape[0])
            ]
            return stack_cts(outs)

        if num_iterations > 1:
            # Meta-BTS two-pass precision boost (src/bootstrap.cu:858-906)
            power = 1 << precision
            ct_scaled_up = auto.mult_by_integer(ctx, ct, power)
            ct_init = self.eval_bootstrap(ct, slots, num_iterations - 1, precision)
            ct_init = auto.mod_reduce(ctx, ct_init, 1)
            ct_init_up = auto.mult_by_integer(ctx, ct_init, power)
            boot_size_q = ctx.level(ct_init_up.chain_index).size
            if boot_size_q <= init_size_q:
                return ct
            ct_down = auto.mod_switch_level(
                ctx, ct_init_up,
                (boot_size_q - init_size_q) // auto.composite_degree(ctx),
            )
            ct_err = auto.eval_sub_auto(ctx, ct_down, ct_scaled_up)
            ct_err_boot = self.eval_bootstrap(ct_err, slots, 1, 0)
            ct_err_boot = auto.mod_reduce(ctx, ct_err_boot, 1)
            final = auto.eval_sub_auto(ctx, ct_init_up, ct_err_boot)
            return auto.mult_const(ctx, final, 1.0 / power)

        d = auto.composite_degree(ctx)
        # prelude needs (noise_scale_deg - 1) rescales to reach degree 1
        # plus AdjustCiphertext's one rescale before RaiseMod
        need = (1 + max(0, ct.noise_scale_deg - 1)) + 1
        if ctx.level(ct.chain_index).size < need * d:
            raise ValueError(
                f"bootstrap input at noise degree {ct.noise_scale_deg} must "
                f"keep at least {need} logical levels (ModReduce to degree 1 "
                "+ AdjustCiphertext's rescale before RaiseMod; reference "
                "inputs are down-leveled accordingly)"
            )
        pre = self.precom[slots]
        q0 = self._anchor_product()
        # the reference hard-codes pow_p = 2^59 (its harnesses always use
        # 59-bit data primes); generalize to the working scale's magnitude
        # so composite anchors (~2^56 pair products) work unchanged
        sf0, _ = auto.scaling_factors(ctx)
        pow_p = 2.0 ** round(math.log2(sf0[0]))
        deg = round(math.log2(q0 / pow_p))
        if deg > self.correction_factor:
            raise ValueError(
                f"log2(q0/2^59) = {deg} must be <= correction factor "
                f"{self.correction_factor}"
            )
        correction = self.correction_factor - deg
        post = 2.0 ** deg
        pre_scale = 1.0 / post
        scalar = int(round(post))

        coefficients = gen_sine_coefficients(
            self.k_bound, self.r_iters, self.poly_degree_sine
        )
        const_eval_mult = pre_scale * (1.0 / (self.k_bound * n))

        # raise the modulus (one glue program: mod-reduce, adjust, raise,
        # pre-scale, final mod-reduce)
        def prelude(ct_in):
            r = auto.mod_reduce(ctx, ct_in, ct_in.noise_scale_deg - 1) \
                if ct_in.noise_scale_deg > 1 else ct_in
            r = self.adjust_ciphertext(r, correction)
            if d > 1:
                # composite RaiseMod Garner-composes the anchor GROUP, so
                # physically drop to the anchor pair first; the 60-bit
                # path reads limb 0 at any level (raise_mod) and needs no
                # drop — AdjustCiphertext already folded the dropped
                # moduli into the scale correction in both regimes
                while ctx.level(r.chain_index).size > d:
                    r = ev.mod_drop_to_next(ctx, r)
            r = auto.raise_mod(ctx, r)
            r = auto.mult_const(ctx, r, const_eval_mult)
            if slots == M // 4:
                r = auto.mod_reduce(ctx, r, 1)
            return r

        raised = self._glue_jit(
            ("_prelude", slots, correction, const_eval_mult), prelude,
            batched, (0,)
        )(ct)

        if slots == M // 4:
            # ---------------- FULLY PACKED ----------------
            ctxt_enc = self.coeffs_to_slots(raised, slots)

            conj_key = self.galois_keys.key_for_elt(conj_elt(n))

            def conj_split(enc, ckey):
                conj = ev.apply_galois_with_key(ctx, enc, conj_elt(n), ckey)
                enc_i = auto.eval_sub_auto(ctx, enc, conj)
                enc = auto.eval_add_auto(ctx, enc, conj)
                enc_i = auto.mult_by_monomial(ctx, enc_i, 3 * M // 4)
                if enc.noise_scale_deg == 2:
                    enc = auto.mod_reduce(ctx, enc, 1)
                    enc_i = auto.mod_reduce(ctx, enc_i, 1)
                return enc, enc_i

            ctxt_enc, ctxt_enc_i = self._glue_jit(
                ("_conj_split",), conj_split, batched, (0, None)
            )(ctxt_enc, conj_key)

            # approximate mod reduction (two branches: re and im)
            sine = self._sine_jit(tuple(coefficients), batched)
            ctxt_enc = sine(ctxt_enc, self.mul_key)
            ctxt_enc_i = sine(ctxt_enc_i, self.mul_key)

            def recombine(enc, enc_i):
                enc_i = auto.mult_by_monomial(ctx, enc_i, M // 4)
                enc = auto.eval_add_auto(ctx, enc, enc_i)
                enc = auto.mult_by_integer(ctx, enc, scalar)
                return auto.mod_reduce(ctx, enc, 1)

            ctxt_enc = self._glue_jit(
                ("_recombine", scalar), recombine, batched, (0, 0)
            )(ctxt_enc, ctxt_enc_i)
            ctxt_dec = self.slots_to_coeffs(ctxt_enc, slots)
        else:
            # ---------------- SPARSELY PACKED (src/bootstrap.cu:1053-1109)
            # PartialSum: project onto the subring (the raise broke the
            # stride-replicated structure)
            psum_steps = []
            j = 1
            while j < n // (2 * slots):
                psum_steps.append(j * slots)
                j <<= 1
            psum_keys = self._keys_for(psum_steps, [])

            def partial_sum(r, keys):
                for step in psum_steps:
                    elt = galois_elt_from_step(step, n)
                    temp = ev.apply_galois_with_key(ctx, r, elt, keys[elt])
                    r = auto.eval_add_auto(ctx, r, temp)
                return auto.mod_reduce(ctx, r, 1)

            raised = self._glue_jit(
                ("_partial_sum", slots), partial_sum, batched, (0, None)
            )(raised, psum_keys)
            ctxt_enc = self.coeffs_to_slots(raised, slots)

            # single real branch: the C2S plaintexts pack [re, im] pairs
            conj_key = self.galois_keys.key_for_elt(conj_elt(n))

            def conj_fold(enc, ckey):
                conj = ev.apply_galois_with_key(ctx, enc, conj_elt(n), ckey)
                enc = auto.eval_add_auto(ctx, enc, conj)
                if enc.noise_scale_deg == 2:
                    enc = auto.mod_reduce(ctx, enc, 1)
                return enc

            ctxt_enc = self._glue_jit(
                ("_conj_fold",), conj_fold, batched, (0, None)
            )(ctxt_enc, conj_key)

            ctxt_enc = self._sine_jit(tuple(coefficients), batched)(
                ctxt_enc, self.mul_key
            )

            def post_sine(enc):
                enc = auto.mult_by_integer(ctx, enc, scalar)
                return auto.mod_reduce(ctx, enc, 1)

            ctxt_enc = self._glue_jit(
                ("_post_sine", scalar), post_sine, batched, (0,)
            )(ctxt_enc)
            ctxt_dec = self.slots_to_coeffs(ctxt_enc, slots)
            # fold the [re, im] halves back together
            fold_elt = galois_elt_from_step(slots, n)
            fold_key = self.galois_keys.key_for_elt(fold_elt)

            def rot_fold(dec, fkey):
                rot = ev.apply_galois_with_key(ctx, dec, fold_elt, fkey)
                return auto.eval_add_auto(ctx, dec, rot)

            ctxt_dec = self._glue_jit(
                ("_rot_fold", slots), rot_fold, batched, (0, None)
            )(ctxt_dec, fold_key)

        cor_factor = 1 << round(correction)
        ctxt_dec = self._glue_jit(
            ("_corfac", cor_factor),
            lambda c: auto.mult_by_integer(ctx, c, cor_factor),
            batched, (0,),
        )(ctxt_dec)

        boot_towers = ctx.level(ctxt_dec.chain_index).size
        if boot_towers <= init_size_q:
            return ct
        return ctxt_dec


def jnp_add_mod(a, b, q):
    from ..ops import w64 as mm

    return mm.add_mod(a, b, q)


def _ext_q(level):
    from ..utils.device import host_np

    return np.concatenate([host_np(level.mod.q), host_np(level.ks.p_mod.q)])
