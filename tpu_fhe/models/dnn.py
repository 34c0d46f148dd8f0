"""Encrypted DNN layer library (PPML): conv / batchnorm / sign-composite
ReLU / softmax / avgpool+FC over sparse-packed per-channel CKKS ciphertexts.

TPU-native counterpart of the reference's DNN class (src/dnn.cu,
include/dnn.cuh:33-82).  Layout contract (SURVEY.md section 8.6): channel k
is one sparse-packed ciphertext holding the w x w image flattened row-major
into (w << slotstr)^2 logical slots; stride-2 convolution leaves data in
place and doubles the slot stride (result.slotstr = input.slotstr + 1), so
rotation amounts are premultiplied by 2^slotstr and bootstrap runs at
numSlots = (w << slotstr)^2.

Deviation from the reference: per-channel loops go through the same jitted
single-ct kernels (XLA caches one program per shape); a vmapped multi-channel
path is a later optimization.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..eval import auto, chebyshev as cheb, evaluator as ev
from ..scheme.ciphertext import Ciphertext, Plaintext
from ..scheme.context import FheContext
from ..scheme.keys import GaloisKey, RelinKey, SecretKey, PublicKey, encrypt_asymmetric


def _block(x):
    """Barrier on a pytree of device arrays and return it.

    Every stage timing / Timer bucket in this module wraps device work in
    JAX's async dispatch; without a barrier the printed time measures only
    dispatch (the reference's cudaEvent timers measure device compute,
    include/timer.h:38-177).  On the axon tunnel block_until_ready returns
    after dispatch, so the barrier is a tiny D2H fetch of the LAST leaf
    (the execution queue is serial: its completion implies the rest)."""
    import numpy as _np

    leaves = [v for v in jax.tree_util.tree_leaves(x) if hasattr(v, "ndim")]
    if leaves:
        _np.asarray(leaves[-1].reshape(-1)[:2])
    return x


def _index_stacked(ct: "Ciphertext", i: int) -> "Ciphertext":
    """Static-index one element of a stacked (batched) ciphertext."""
    return ct.with_data(
        jax.tree_util.tree_map(lambda x: x[i], ct.data)
    )


@dataclass
class TensorCT:
    """One ciphertext per channel (reference TensorCT, include/dnn.cuh:33)."""

    cts: list[Ciphertext]
    width: int
    slotstr: int = 0

    @property
    def num_ch(self) -> int:
        return len(self.cts)

    @property
    def num_slots(self) -> int:
        return (self.width << self.slotstr) ** 2


# 3-stage minimax sign composite, hard-coded odd degree-15 polynomials
# (reference src/dnn.cu:170-191; public minimax-composite constants)
_SIGN_COEFFS = [
    [0, 0.667972070856, 0, -0.223989523020, 0, 0.136121229346, 0,
     -0.099160550898, 0, 0.079224867308, 0, -0.067250088206, 0,
     0.059852569462, 0, -0.503955481350],
    [0, 0.955669291788, 0, -0.317870998995, 0, 0.189953989728, 0,
     -0.134924463410, 0, 0.104260767625, 0, -0.084798113265, 0,
     0.071534728674, 0, -0.282024623439],
    [0, 1.254717353059, 0, -0.371638622338, 0, 0.175181567419, 0,
     -0.085946606966, 0, 0.039326533561, 0, -0.015616729371, 0,
     0.004903749402, 0, -0.000987938705],
]
_SIGN_RANGES = [(-1.0, 1.0), (-1.908, 1.908), (-1.332, 1.332)]


class DNN:
    """Encrypted-inference layer library bound to one context/encoder."""

    def __init__(self, ctx: FheContext, encoder, scale: float | None = None):
        self.ctx = ctx
        self.encoder = encoder
        sf, _ = auto.scaling_factors(ctx)
        self.scale = scale if scale is not None else sf[0]
        self.gk: GaloisKey | None = None
        self.mul_key: RelinKey | None = None
        self._pt_cache: dict = {}
        self._stage_cache: dict = {}

    def _stage_jit(self, key, fn, static_argnums=()):
        """Cached jit for conv stage programs — same policy as the
        bootstrapper's stage jit (one XLA program per stage instead of
        per op; eager on CPU where the stage compiles were measured
        intractable).  q32 outputs compact at the program boundary
        (ops/w64.compact_tree) — conv accumulators/outputs are among
        the biggest at-rest buffers at N=2^16."""
        from ..boot.bootstrap import CkksBootstrapper

        if self.ctx.is_q32:
            from ..ops.w64 import compact_tree

            inner = fn

            def fn(*a, **k):  # noqa: F811
                return compact_tree(inner(*a, **k))

        if not CkksBootstrapper._stage_jit_enabled():
            return fn
        f = self._stage_cache.get(key)
        if f is None:
            f = jax.jit(fn, static_argnums=static_argnums)
            self._stage_cache[key] = f
        return f

    # -- key management ----------------------------------------------------
    @staticmethod
    def conv_rotation_indices(
        input_width: int, kernel_h: int, slotstr: int
    ) -> list[int]:
        """Rotation steps one conv layer needs (ComputeRotationIndices,
        src/dnn.cu:277-296)."""
        large_l = input_width * (1 << slotstr)
        c = kernel_h // 2
        out = set()
        for j in range(kernel_h):
            for i in range(kernel_h):
                rot = (i - c) * large_l + (j - c)
                out.add(rot << slotstr)
        return sorted(out)

    @staticmethod
    def avgpool_rotation_indices(input_width: int, slotstr: int) -> list[int]:
        """AddAvgPoolRotationsTo (src/dnn.cu:320-340)."""
        log_l = int(math.log2(input_width))
        pow_s = 1 << slotstr
        out = []
        for i in range(log_l):
            out.append(pow_s << i)
        for j in range(log_l):
            out.append((pow_s << j) * input_width)
        return out

    def build_galois_key(self, sk: SecretKey, rotation_indices: list[int]):
        steps = sorted({r for r in rotation_indices if r != 0})
        self.gk = sk.galois_key(steps)

    def relin_keygen(self, sk: SecretKey):
        self.mul_key = sk.relin_key()

    # -- encode / encrypt -----------------------------------------------------
    def enc_tensor(
        self, image: np.ndarray, pk: PublicKey | None = None,
        sk: SecretKey | None = None, rng_key=None,
    ) -> TensorCT:
        """image (w, w, ch) -> per-channel sparse-packed ciphertexts
        (EncTensor, src/dnn.cu:10-40)."""
        image = np.asarray(image, dtype=np.float64)
        w, _, ch = image.shape
        cts = []
        if rng_key is None:
            rng_key = jax.random.key(0)
        for k in range(ch):
            vk = image[:, :, k].reshape(-1)  # row-major w*w
            pt = self.encoder.encode(vk, self.scale, chain_index=1, slots=w * w)
            if pk is not None:
                rng_key, sub = jax.random.split(rng_key)
                cts.append(encrypt_asymmetric(self.ctx, pk, pt, sub))
            else:
                cts.append(sk.encrypt_symmetric(pt))
        return TensorCT(cts=cts, width=w, slotstr=0)

    def dec_tensor(self, t: TensorCT, sk: SecretKey) -> np.ndarray:
        """-> (w, w, ch) real array (DecTensor, src/dnn.cu:42-70)."""
        w = t.width
        stride = 1 << t.slotstr
        big_w = w * stride
        out = np.zeros((w, w, t.num_ch))
        for k, ct in enumerate(t.cts):
            vals = self.encoder.decode(sk.decrypt(ct), slots=big_w * big_w).real
            grid = vals.reshape(big_w, big_w)
            out[:, :, k] = grid[::stride, ::stride]
        return out

    def _encode_mask(self, mask: np.ndarray, ct: Ciphertext) -> Plaintext:
        sf, _ = auto.scaling_factors(self.ctx)
        lvl = auto._level(ct, self.ctx)
        return self.encoder.encode(
            mask, sf[lvl], chain_index=ct.chain_index, slots=len(mask)
        )

    # -- layers -------------------------------------------------------------
    def _mask_embedding(self, w: int, slotstr: int, kh: int, i: int, j: int):
        """Cached UNSCALED embedding of the (i, j) boundary mask — the FFT
        runs once per (geometry, tap) for the DNN's lifetime; scalar
        weights and scales fold in linearly afterwards."""
        key = ("emb", w, slotstr, kh, i, j)
        got = self._pt_cache.get(key)
        if got is not None:
            return got
        pow_s = 1 << slotstr
        large_l = w * pow_s
        c = kh // 2
        m = np.zeros(large_l * large_l)
        for ip in range(w):
            for jp in range(w):
                if 0 <= ip + i - c <= w - 1 and 0 <= jp + j - c <= w - 1:
                    m[(ip * large_l + jp) * pow_s] = 1.0
        emb = self.encoder.embed_for_slots(m, large_l * large_l)
        self._pt_cache[key] = emb
        return emb

    def conv(
        self, t: TensorCT, weight: np.ndarray, stride: int = 1,
        cache_key: str | None = None,
    ) -> TensorCT:
        """SISO rotate-mask-accumulate convolution (Conv, src/dnn.cu:82-150)
        with hoisted rotations: ONE modup per input channel shared by all
        kh*kw taps (EvalFastRotationExt), baby-step accumulation at the
        extended basis QlP, and a single KeySwitchDown per output channel —
        vs. a full keyswitch per (channel, tap) in the reference.

        Masks are encoded from cached embeddings in device batches
        (encoder.encode_coeff_rows); pass cache_key (e.g. a layer name) to
        also cache the finished plaintexts across repeated inferences.

        weight: (kh, kw, in_ch, out_ch); zero padding; stride 2 doubles the
        slot stride instead of moving data."""
        ctx = self.ctx
        assert stride in (1, 2)
        kh, kw, in_ch, out_ch = weight.shape
        assert kh == kw and in_ch == t.num_ch
        w = t.width
        pow_s = 1 << t.slotstr
        large_l = w * pow_s
        c = kh // 2

        from ..eval import hoisting as hoist
        from ..ops.galois import galois_elt_from_step

        # EvalMultAuto semantics up front: operands at noise degree 1
        cts = [
            auto.mod_reduce(ctx, ct, 1) if ct.noise_scale_deg == 2 else ct
            for ct in t.cts
        ]
        ci = cts[0].chain_index
        sf, _ = auto.scaling_factors(ctx)
        scale = sf[auto._level(cts[0], ctx)]

        # mask plaintexts live at the extended basis QlP: ~(QlP * N * 8)
        # bytes EACH, so a full layer's (kh*kw*in*out) set is tens of GB at
        # N=2^16 — encode one (in, out) pair's tap set (<= kh*kw masks) at
        # a time and let it die after its multiply-accumulate.  The
        # finished-plaintext cache (cache_key) engages only when the whole
        # layer fits the budget (doll-scale demos / repeated small
        # inferences).
        import os

        taps = [(i, j) for j in range(kh) for i in range(kh)]
        level = ctx.level(ci)
        qlp_rows = level.size + self.ctx.params.size_P
        mask_bytes = qlp_rows * ctx.n * 8
        n_live = int(np.count_nonzero(weight))
        cache_mb = float(os.environ.get("TPU_FHE_CONV_CACHE_MB", "512"))
        cacheable = (
            cache_key is not None
            and n_live * mask_bytes <= cache_mb * 1e6
        )
        pts_key = None if not cacheable else (
            "pts", cache_key, ci, float(scale), w, t.slotstr
        )
        cached = None if pts_key is None else self._pt_cache.get(pts_key)

        # stage programs: (R) one hoisted modup + all kh*kw rotations per
        # input channel, (A) one fixed-tap-set multiply-accumulate program
        # per OUTPUT channel contribution, (D) one vmapped KeySwitchDown
        # over the stacked output.  The accumulate program indexes rotated
        # taps by a static tap set that is IDENTICAL for every (in, out)
        # pair with dense weights, so a whole conv layer compiles exactly
        # 4 programs per geometry regardless of channel counts (absolute
        # out-channel indices never appear in a program — accumulation
        # across input channels happens on per-channel ciphertexts, not by
        # scattering into a stacked tensor).
        from ..scheme.ciphertext import stack_cts, unstack_cts

        rot_steps = tuple(
            ((i - c) * large_l + (j - c)) * pow_s for (i, j) in taps
        )
        tap_of = {t_: idx for idx, t_ in enumerate(taps)}

        def rot_stage(ct, keys):
            pre = hoist.fast_rotation_precompute(ctx, ct)
            outs = []
            for rot in rot_steps:
                if rot == 0:
                    outs.append(hoist.keyswitch_ext(ctx, ct))
                else:
                    elt = galois_elt_from_step(rot, ctx.n)
                    outs.append(hoist.fast_rotation_ext(
                        ctx, ct, pre, elt, keys[elt], add_first=True,
                    ))
            return stack_cts(outs)

        def acc_block(rot_stack, pt_list, tap_idx):
            term = None
            for e, pt in enumerate(pt_list):
                t_ = hoist.eval_mult_ext(
                    ctx, _index_stacked(rot_stack, tap_idx[e]), pt)
                term = t_ if term is None else \
                    hoist.eval_add_ext(ctx, term, t_)
            return term

        def acc_block_into(rot_stack, pt_list, prev, tap_idx):
            return hoist.eval_add_ext(
                ctx, prev, acc_block(rot_stack, pt_list, tap_idx))

        def down_stage(e):
            # per-channel: stacking all out channels for a vmapped down
            # doubles the ext-basis out set transiently (~3 GB at layer 3,
            # N=2^16) — one compiled single-ct program, out_ch calls
            return hoist.keyswitch_down(ctx, e)

        rot_fn = self._stage_jit(("_conv_rot", rot_steps), rot_stage)
        acc_fn = self._stage_jit(("_conv_acc",), acc_block,
                                 static_argnums=(2,))
        accin_fn = self._stage_jit(("_conv_acc_into",), acc_block_into,
                                   static_argnums=(3,))
        down_fn = self._stage_jit(("_conv_down",), down_stage)

        rot_keys = {}
        for rot in rot_steps:
            if rot != 0:
                elt = galois_elt_from_step(rot, ctx.n)
                rot_keys[elt] = self.gk.key_for_elt(elt)

        if os.environ.get("TPU_FHE_CONV_DEVICE_ENCODE", "1") != "0":
            # device-side mask encode: the host->device mask plaintext
            # traffic (QlP*N*8 bytes PER (in,out,tap) weight) dominated warm
            # conv at N=2^16 on a tunneled TPU (~150 s/input channel, r04);
            # this path ships one fixed-point embedding per tap per geometry
            # plus a few KB of per-channel weight scalars and builds the
            # masks inside the accumulate program
            return self._conv_device_encode(
                t, cts, weight, rot_fn, down_fn, rot_keys, taps,
                w, kh, stride, scale, ci, level,
            )

        import time as _time

        dbg = os.environ.get("TPU_FHE_DNN_LOG")
        out_list: list[Ciphertext | None] = [None] * out_ch
        for k in range(in_ch):
            t0 = _time.time()
            rot_stack = rot_fn(cts[k], rot_keys)
            for h in range(out_ch):
                live = [(i, j) for (i, j) in taps
                        if float(weight[i, j, k, h]) != 0.0]
                if not live:
                    continue
                if cached is not None:
                    pt_list = [cached[(i, j, k, h)] for (i, j) in live]
                else:
                    rows = (
                        self._mask_embedding(w, t.slotstr, kh, i, j)
                        * float(weight[i, j, k, h])
                        for (i, j) in live
                    )
                    pt_list = self.encoder.encode_coeff_rows(
                        rows, scale, ci, ext=True, max_batch=len(live)
                    )
                    if pts_key is not None:
                        store = self._pt_cache.setdefault(pts_key, {})
                        for (i, j), pt in zip(live, pt_list):
                            store[(i, j, k, h)] = pt
                tap_idx = tuple(tap_of[t_] for t_ in live)
                if out_list[h] is None:
                    out_list[h] = acc_fn(rot_stack, pt_list, tap_idx)
                else:
                    out_list[h] = accin_fn(rot_stack, pt_list,
                                           out_list[h], tap_idx)
            if dbg:
                _block([o for o in out_list if o is not None])
                print(f"    [conv] in_ch {k + 1}/{in_ch} "
                      f"({_time.time() - t0:.1f}s)", flush=True)
        # an out channel with no live taps anywhere (fully pruned weights)
        # never accumulated: emit an explicit zero ciphertext instead of
        # handing None to keyswitch_down
        templ = next((o for o in out_list if o is not None), None)
        if templ is None:
            raise ValueError("conv weight tensor is identically zero")
        out_cts = []
        for h in range(out_ch):
            if out_list[h] is None:
                out_list[h] = templ.with_data(
                    jax.tree_util.tree_map(jnp.zeros_like, templ.data)
                )
            out_cts.append(down_fn(out_list[h]))
            out_list[h] = None  # free the ext-basis accumulator eagerly
        _block(out_cts)  # the Convolution bucket owns its device time
        return TensorCT(
            cts=out_cts,
            width=w // stride,
            slotstr=t.slotstr + 1 if stride == 2 else t.slotstr,
        )

    _CONV_FP_BITS = 30  # fixed-point bits of the shipped mask embedding

    def _conv_device_encode(self, t, cts, weight, rot_fn, down_fn, rot_keys,
                            taps, w, kh, stride, scale, ci, level):
        """Conv multiply-accumulate with masks built ON DEVICE.

        The reference builds conv masks on device per tap (src/dnn.cu:
        82-150); host-encoding them (rounds 2-4) shipped QlP*N*8 bytes per
        (in, out, tap) weight over the TPU tunnel.  Here the plaintext
        round(emb_tap * weight * scale) is reconstructed in-program from

            e  = round(emb_tap * 2^F) + 2^31     (u32 row, shipped per
                                                  geometry: T*N*4 bytes)
            c  = round(weight * scale / 2^F) + 2^31   (u32 scalar per
                                                       (out, tap) pair)

        via  v = (e-2^31)*(c-2^31) = e*c - 2^31*e - 2^31*c + 2^62, reduced
        mod each QlP limb with exact integer arithmetic (the c rounding
        adds ~2^-28 relative mask error — far below bootstrap precision).
        One scan over output channels inside ONE jitted program per
        geometry replaces the per-(out_ch) encode+multiply dispatches; per
        input channel the tunnel carries two dispatches and a few KB."""
        import os
        import time as _time

        ctx = self.ctx
        in_ch, out_ch = weight.shape[2], weight.shape[3]
        ntaps = len(taps)
        F = self._CONV_FP_BITS
        q32 = ctx.is_q32

        # per-geometry fixed-point embeddings (host FFT cached upstream)
        ekey = ("embq", w, t.slotstr, kh)
        emb_off = self._pt_cache.get(ekey)
        if emb_off is None:
            emb = np.stack([
                np.asarray(self._mask_embedding(w, t.slotstr, kh, i, j))
                for (i, j) in taps
            ])
            if float(np.max(np.abs(emb))) >= 1.99:
                raise ValueError("mask embedding exceeds fixed-point range")
            e_fixed = np.rint(emb * float(1 << F)).astype(np.int64)
            emb_off = jnp.asarray(
                (e_fixed + (1 << 31)).astype(np.uint64).astype(np.uint32))
            self._pt_cache[ekey] = emb_off

        q_np, rlo_np, rhi_np = ev._qlp_mod(level)
        qlp = q_np.reshape(-1).astype(object)  # python ints for host mods
        n_lp = len(qlp)
        ext_ntt = self.encoder._ext_tables(ci)[1]
        from dataclasses import replace
        from ..ops.ntt import forward_ntt
        from ..ops.w64 import W64

        def host_consts(k):
            """c_off (out_ch, T) u32 and D (out_ch, T, L) u64 pair for
            input channel k: D = (2^62 - 2^31*c_int) mod q_l."""
            lam = np.array(
                [[float(weight[i, j, k, h]) for (i, j) in taps]
                 for h in range(out_ch)], dtype=np.float64)
            c_int = np.rint(lam * (scale / float(1 << F))).astype(np.int64)
            if int(np.max(np.abs(c_int))) >= (1 << 31):
                raise ValueError("conv weight*scale exceeds fixed-point "
                                 "range (|weight| >= ~8)")
            c_off = (c_int + (1 << 31)).astype(np.uint64).astype(np.uint32)
            # v = (E-2^31)(C-2^31) = E*C - 2^31*E - 2^31*C + 2^62 and
            # C = c_int + 2^31, so the E-independent term collapses to
            # -2^31*c_int (the 2^62 cancels)
            base = -(c_int << 31)  # int64, |.| < 2^62
            d = np.empty((out_ch, ntaps, n_lp), dtype=np.uint64)
            for l in range(n_lp):
                d[:, :, l] = (base % np.int64(qlp[l])).astype(np.uint64)
            return (jnp.asarray(c_off),
                    jnp.asarray((d & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                    jnp.asarray((d >> np.uint64(32)).astype(np.uint32)))

        qw = ev.w64.as_w64(q_np)
        rlw = ev.w64.as_w64(rlo_np)
        rhw = ev.w64.as_w64(rhi_np)

        def masks_ntt(e1, c_off_h, dlo_h, dhi_h):
            """(T, L, N) NTT-form mask plaintext planes for one out ch."""
            E = W64(emb_off, jnp.zeros_like(emb_off))
            C = W64(c_off_h[:, None], jnp.zeros_like(c_off_h[:, None]))
            prod = ev.w64.mul_u64_lo(E, C)  # exact: < 2^64
            r = ev.w64.barrett_reduce_u64(prod[:, None, :], qw, rhw)
            r = ev.w64.sub_mod(r, e1, qw)
            r = ev.w64.add_mod(r, W64(dlo_h, dhi_h)[:, :, None], qw)
            return forward_ntt(r, ext_ntt)

        def acc_program(rot_stack, c_off, dlo, dhi, prev):
            rdata = rot_stack.data  # W64 (T, 2, QlP, N)
            # h-independent term (E << 31) mod q, hoisted out of the scan
            e31 = W64(emb_off << 31, emb_off >> 1)
            e1 = ev.w64.barrett_reduce_u64(e31[:, None, :], qw, rhw)

            def body(_, xs):
                c_off_h, dlo_h, dhi_h = xs
                pts = masks_ntt(e1, c_off_h, dlo_h, dhi_h)
                acc = None
                for e in range(ntaps):
                    term = ev.w64.mul_mod(
                        rdata[e], pts[e][None], qw, rlw, rhw)
                    acc = term if acc is None else \
                        ev.w64.add_mod(acc, term, qw)
                out = (acc.lo,) if q32 else (acc.lo, acc.hi)
                return None, out
            _, outs = jax.lax.scan(body, None, (c_off, dlo, dhi))
            out_lo = outs[0]
            out_hi = None if q32 else outs[1]
            if prev is not None:
                plo = prev[0]
                phi = None if q32 else prev[1]
                s = ev.w64.add_mod(W64(out_lo, out_hi), W64(plo, phi), qw)
                out_lo, out_hi = s.lo, (None if q32 else s.hi)
            return (out_lo,) if q32 else (out_lo, out_hi)

        acc_fn = self._stage_jit(("_conv_acc_dev", ntaps),
                                 lambda r, c, dl, dh: acc_program(
                                     r, c, dl, dh, None))
        accin_fn = self._stage_jit(("_conv_acc_dev_into", ntaps),
                                   lambda r, c, dl, dh, p: acc_program(
                                       r, c, dl, dh, p))

        dbg = os.environ.get("TPU_FHE_DNN_LOG")
        out_acc = None
        templ = None
        for k in range(in_ch):
            t0 = _time.time()
            rot_stack = rot_fn(cts[k], rot_keys)
            if templ is None:
                templ = _index_stacked(rot_stack, 0)
            c_off, dlo, dhi = host_consts(k)
            if out_acc is None:
                out_acc = acc_fn(rot_stack, c_off, dlo, dhi)
            else:
                out_acc = accin_fn(rot_stack, c_off, dlo, dhi, out_acc)
            if dbg:
                _block(out_acc)
                print(f"    [conv] in_ch {k + 1}/{in_ch} "
                      f"({_time.time() - t0:.1f}s)", flush=True)

        out_lo = out_acc[0]
        out_hi = None if q32 else out_acc[1]
        out_cts = []
        for h in range(out_ch):
            data = W64(out_lo[h], None if out_hi is None else out_hi[h])
            ct_h = replace(
                templ, data=data,
                scale=templ.scale * scale,
                noise_scale_deg=templ.noise_scale_deg + 1,
            )
            out_cts.append(down_fn(ct_h))
        _block(out_cts)  # the Convolution bucket owns its device time
        return TensorCT(
            cts=out_cts,
            width=w // stride,
            slotstr=t.slotstr + 1 if stride == 2 else t.slotstr,
        )

    def batch_norm(
        self, t: TensorCT, weight, bias, mean, var, eps: float = 1e-5
    ) -> TensorCT:
        """Folded affine a*x + b per channel (BatchNorm, src/dnn.cu:454-480).

        All channels run through ONE jitted program with the per-channel
        CRT lifts (GetElementForEvalMult/AddOrSub residues) shipped as
        arguments — the per-channel eager loop cost 2 tunnel dispatches
        per channel."""
        ctx = self.ctx
        from dataclasses import replace
        from ..ops.w64 import W64
        from ..scheme.ciphertext import stack_cts, unstack_cts

        cts = [auto.mod_reduce(ctx, c, 1) if c.noise_scale_deg == 2 else c
               for c in t.cts]
        tc = len(cts)
        level = ctx.level(cts[0].chain_index)
        sf, _ = auto.scaling_factors(ctx)
        scf = sf[auto._level(cts[0], ctx)]
        qs = level.base.values
        n_l = len(qs)
        deg_out = cts[0].noise_scale_deg + 1
        int_scf = int(round(scf))
        ac = np.zeros((tc, n_l), dtype=np.uint64)
        bc = np.zeros((tc, n_l), dtype=np.uint64)
        for c_idx in range(tc):
            a = float(weight[c_idx]) / math.sqrt(float(var[c_idx]) + eps)
            b = float(bias[c_idx]) - a * float(mean[c_idx])
            big = int(round(a * scf))
            ac[c_idx] = [big % q for q in qs]
            cb = int(round(b * scf))
            for _ in range(1, deg_out):
                cb *= int_scf
            bc[c_idx] = [cb % q for q in qs]

        def pair(v):
            return (jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                    jnp.asarray((v >> np.uint64(32)).astype(np.uint32)))

        a_lo, a_hi = pair(ac)
        b_lo, b_hi = pair(bc)

        def bn_stage(stk, alo, ahi, blo, bhi):
            data = stk.data  # W64 (nc, 2, L, N)
            fa = W64(alo[:, None, :, None], ahi[:, None, :, None])
            out = ev.w64.mul_mod(
                data, fa, level.mod.q,
                level.mod.ratio_lo, level.mod.ratio_hi,
            )
            fb = W64(blo[:, :, None], bhi[:, :, None])
            c0 = ev.w64.add_mod(out[:, 0], fb, level.mod.q)
            out = ev.w64.concat([c0[:, None], out[:, 1:]], axis=1)
            return (out.lo, out.hi)

        bs = self.channel_batch(tc)
        out_cts = []
        for c0 in range(0, tc, bs):
            nc = min(bs, tc - c0)
            bn_fn = self._stage_jit(("_bn", nc), bn_stage)
            stacked = stack_cts(cts[c0:c0 + nc])
            out_lo, out_hi = bn_fn(
                stacked, a_lo[c0:c0 + nc], a_hi[c0:c0 + nc],
                b_lo[c0:c0 + nc], b_hi[c0:c0 + nc],
            )
            templ = _index_stacked(stacked, 0)
            out_cts.extend(
                replace(
                    templ,
                    data=W64(out_lo[c], out_hi[c]),
                    noise_scale_deg=templ.noise_scale_deg + 1,
                    scale=templ.scale * scf,
                )
                for c in range(nc)
            )
        return TensorCT(cts=out_cts, width=t.width, slotstr=t.slotstr)

    def _vmap_channels(self, key, fn, t: TensorCT, *shared) -> TensorCT:
        """Run a per-channel op over channels in vmapped stage programs,
        chunked to the channel-batch memory budget (channel_batch) — an
        unbounded stack OOMed the 16-channel full-scale stem."""
        out = self._vmap_cts(key, fn, t.cts, *shared)
        return TensorCT(out, t.width, t.slotstr)

    def _vmap_cts(self, key, fn, cts: list, *shared) -> list:
        from ..scheme.ciphertext import stack_cts, unstack_cts

        bs = self.channel_batch(len(cts))
        outs = []
        for c0 in range(0, len(cts), bs):
            chunk = cts[c0:c0 + bs]
            staged = self._stage_jit(
                (key, len(chunk)),
                jax.vmap(fn, in_axes=(0,) + (None,) * len(shared)),
            )
            outs.extend(
                unstack_cts(staged(stack_cts(chunk), *shared), len(chunk))
            )
        return outs

    def relu(self, t: TensorCT, a: float, b: float, deg: int) -> TensorCT:
        """Chebyshev max(0, x) (Relu, src/dnn.cu:152-168)."""
        coeffs = cheb.eval_chebyshev_coefficients(
            lambda x: max(0.0, x), a, b, deg
        )
        return self._vmap_channels(
            ("_relu", a, b, deg),
            lambda ct, key: cheb.eval_chebyshev_series(
                self.ctx, ct, key, coeffs, a, b),
            t, self.mul_key,
        )

    def sign(self, t: TensorCT, k: int) -> TensorCT:
        """Stage k of the 3-stage minimax sign composite
        (Sign, src/dnn.cu:170-191)."""
        a, b = _SIGN_RANGES[k]
        return self._vmap_channels(
            ("_sign", k),
            lambda ct, key: cheb.eval_chebyshev_series(
                self.ctx, ct, key, _SIGN_COEFFS[k], a, b),
            t, self.mul_key,
        )

    def _boot_one(self, bootstrapper, ct: Ciphertext, slots: int) -> Ciphertext:
        """One bootstrap under the 'Bootstrap' timer bucket (the reference's
        Timer::startGPUTimer("Bootstrap"), src/dnn.cu:207-238); rides the
        stage-jitted path on TPU."""
        import os
        import time

        from ..utils import timer

        use_jit = (
            jax.default_backend() == "tpu"
            and hasattr(bootstrapper, "eval_bootstrap_jit")
        )
        t0 = time.time()
        with timer.section("Bootstrap"):
            if use_jit:
                out = bootstrapper.eval_bootstrap_jit(ct, slots)
            else:
                out = bootstrapper.eval_bootstrap(ct, slots=slots)
            _block(out)
        if os.environ.get("TPU_FHE_DNN_LOG"):
            b = ct.data.shape[0] if ct.data.ndim == 4 else 1
            print(f"    [boot] batch={b} slots={slots} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        return out

    def channel_batch(self, n_ch: int) -> int:
        """Channels per vmapped stage program.

        The TPU-native replacement for the reference's serial per-ct kernel
        launches (src/dnn.cu:207-238): stack B channels (stack_cts) and run
        ONE vmapped stage program.  B is the largest power of two that (a)
        divides into the (power-of-two) channel count evenly — uniform
        chunks mean one compiled program per geometry — and (b) keeps the
        transient working set of a hoisted BSGS stage (~10 ext-basis
        component copies per channel) inside TPU_FHE_DNN_BATCH_MB.
        TPU_FHE_DNN_BATCH forces a value (0/1 disables batching)."""
        import os

        v = os.environ.get("TPU_FHE_DNN_BATCH", "auto")
        if v != "auto":
            return max(1, min(n_ch, int(v)))
        level = self.ctx.level(1)
        qp = level.size + self.ctx.params.size_P
        per_ch = 10 * qp * self.ctx.n * 8
        budget = float(os.environ.get("TPU_FHE_DNN_BATCH_MB", "2500")) * 1e6
        b = max(1, min(n_ch, 64, int(budget // per_ch)))
        return 1 << (b.bit_length() - 1)  # floor to a power of two

    def bootstrap(self, t: TensorCT, bootstrapper) -> TensorCT:
        """EvalBootstrap at numSlots = (w << slotstr)^2, channels batched
        through vmapped stage programs (BootStrap, src/dnn.cu:265-276)."""
        from ..scheme.ciphertext import stack_cts, unstack_cts

        slots = t.num_slots
        B = self.channel_batch(t.num_ch)
        if B <= 1:
            cts = [self._boot_one(bootstrapper, ct, slots) for ct in t.cts]
            return TensorCT(cts=cts, width=t.width, slotstr=t.slotstr)
        cts = []
        for lo in range(0, t.num_ch, B):
            chunk = t.cts[lo:lo + B]
            out = self._boot_one(bootstrapper, stack_cts(chunk), slots)
            cts.extend(unstack_cts(out, len(chunk)))
        return TensorCT(cts=cts, width=t.width, slotstr=t.slotstr)

    def relu_composite(self, t: TensorCT, bootstrapper) -> TensorCT:
        """ReLU(x) = x * (sign(sign(sign(0.1 x))) + 1) / 2 with three
        interleaved bootstraps (ReluComposite, src/dnn.cu:193-243).
        Timer buckets match the reference: sign/polynomial work under
        'Relu', each bootstrap under 'Bootstrap'.  Channels run in
        power-of-two batches through vmapped stage programs (one compile
        + one dispatch per stage per chunk instead of per channel)."""
        from ..scheme.ciphertext import stack_cts, unstack_cts
        from ..utils import timer

        B = self.channel_batch(t.num_ch)
        if B <= 1:
            return self._relu_composite_seq(t, bootstrapper)
        ctx = self.ctx
        slots = t.num_slots
        glue = bootstrapper._glue_jit

        def stage0(c, key):
            c = auto.mult_const(ctx, c, 0.1)
            a, b = _SIGN_RANGES[0]
            return cheb.eval_chebyshev_series(
                ctx, c, key, _SIGN_COEFFS[0], a, b)

        def stage1(c, key):
            a, b = _SIGN_RANGES[1]
            return cheb.eval_chebyshev_series(
                ctx, c, key, _SIGN_COEFFS[1], a, b)

        # stage 2 is split in two: one program fusing the chebyshev series
        # WITH the final ciphertext multiply hit a pathological (>2 h)
        # XLA:CPU compile at doll scale; two smaller programs compile in
        # minutes each and the extra dispatch is noise
        def stage2a(c, key):
            a, b = _SIGN_RANGES[2]
            return cheb.eval_chebyshev_series(
                ctx, c, key, _SIGN_COEFFS[2], a, b)

        def stage2b(c, x0, key):
            plus1 = auto.add_const(ctx, c, 1.0)
            halfx = auto.mult_const(ctx, x0, 0.5)
            return auto.eval_mult_auto(ctx, plus1, halfx, key)

        import os
        import time

        dbg = os.environ.get("TPU_FHE_DNN_LOG")
        out_cts: list[Ciphertext] = []
        for lo in range(0, t.num_ch, B):
            t0 = time.time()
            chunk = t.cts[lo:lo + B]
            x = stack_cts(chunk)
            with timer.section("Relu"):
                s = _block(glue(("_dnn_sign", 0), stage0, True, (0, None))(
                    x, self.mul_key))
            if dbg:
                print(f"    [sign0] batch={len(chunk)} "
                      f"({time.time() - t0:.1f}s)", flush=True)
            s = self._boot_one(bootstrapper, s, slots)
            t0 = time.time()
            with timer.section("Relu"):
                s = _block(glue(("_dnn_sign", 1), stage1, True, (0, None))(
                    s, self.mul_key))
            if dbg:
                print(f"    [sign1] batch={len(chunk)} "
                      f"({time.time() - t0:.1f}s)", flush=True)
            s = self._boot_one(bootstrapper, s, slots)
            t0 = time.time()
            with timer.section("Relu"):
                s = glue(("_dnn_sign", "2a"), stage2a, True, (0, None))(
                    s, self.mul_key)
                out = _block(glue(("_dnn_sign", "2b"), stage2b, True,
                                  (0, 0, None))(s, x, self.mul_key))
            if dbg:
                print(f"    [sign2] batch={len(chunk)} "
                      f"({time.time() - t0:.1f}s)", flush=True)
            out = self._boot_one(bootstrapper, out, slots)
            out_cts.extend(unstack_cts(out, len(chunk)))
        return TensorCT(out_cts, t.width, t.slotstr)

    def _relu_composite_seq(self, t: TensorCT, bootstrapper) -> TensorCT:
        """Per-channel ReluComposite (batching disabled)."""
        from ..utils import timer

        ctx = self.ctx
        slots = t.num_slots
        with timer.section("Relu"):
            sign_cts = [auto.mult_const(ctx, ct, 0.1) for ct in t.cts]
            s = TensorCT(sign_cts, t.width, t.slotstr)
            s = self.sign(s, 0)
            _block(s.cts)
        s = TensorCT(
            [self._boot_one(bootstrapper, ct, slots) for ct in s.cts],
            t.width, t.slotstr,
        )
        with timer.section("Relu"):
            s = self.sign(s, 1)
            _block(s.cts)
        s = TensorCT(
            [self._boot_one(bootstrapper, ct, slots) for ct in s.cts],
            t.width, t.slotstr,
        )
        with timer.section("Relu"):
            s = self.sign(s, 2)
            out_cts = []
            for i, ct in enumerate(s.cts):
                plus1 = auto.add_const(ctx, ct, 1.0)
                halfx = auto.mult_const(ctx, t.cts[i], 0.5)
                out_cts.append(
                    auto.eval_mult_auto(ctx, plus1, halfx, self.mul_key)
                )
            _block(out_cts)
        out_cts = [self._boot_one(bootstrapper, ct, slots) for ct in out_cts]
        return TensorCT(out_cts, t.width, t.slotstr)

    def softmax(
        self, t: TensorCT, bound_b: int = 64, bound_r: int = 64,
        gumbel_lambda: int = 4, goldschmidt_d: int = 4,
    ) -> TensorCT:
        """Gumbel softmax: exp via Chebyshev + repeated squaring, 1/sum via
        Goldschmidt (SoftMax, src/dnn.cu:349-395)."""
        ctx = self.ctx
        rlk = self.mul_key
        coeffs = cheb.eval_chebyshev_coefficients(math.exp, -1.0, 1.0, 12)
        log_b = int(math.log2(bound_b))
        log_lam = int(math.log2(gumbel_lambda))
        from ..scheme.ciphertext import stack_cts

        # per-channel exp branch: ONE vmapped program
        def exp_stage(ct, key):
            x = auto.mult_const(ctx, ct, 1.0 / bound_b)
            x = cheb.eval_chebyshev_series(ctx, x, key, coeffs, -1.0, 1.0)
            for _ in range(log_b - log_lam):
                x = auto.eval_square_auto(ctx, x, key)
            return x

        exp_t = self._vmap_channels(
            ("_smax_exp", bound_b, gumbel_lambda), exp_stage, t, rlk
        )

        # channel sum + Goldschmidt reciprocal: one program (the exp
        # outputs share metadata, so the channel sum is a plain mod add)
        def invsum_stage(stk, key):
            level = ctx.level(stk.chain_index)
            d = stk.data
            total = d[0]
            for i in range(1, t.num_ch):
                total = ev.w64.add_mod(total, d[i], level.mod.q)
            s = _index_stacked(stk, 0).with_data(total)
            s = auto.mult_const(ctx, s, -1.0 / bound_r)
            s = auto.add_const(ctx, s, 2.0)
            tmp = auto.add_const(ctx, s, -1.0)
            for _ in range(goldschmidt_d):
                tmp = auto.eval_square_auto(ctx, tmp, key)
                tmp2 = auto.add_const(ctx, tmp, 1.0)
                s = auto.eval_mult_auto(ctx, s, tmp2, key)
            return s

        inv_fn = self._stage_jit(
            ("_smax_inv", bound_r, goldschmidt_d, t.num_ch), invsum_stage
        )
        sum_ct = inv_fn(stack_cts(exp_t.cts), rlk)

        return self._vmap_channels(
            ("_smax_mul",),
            lambda ct, s, key: auto.eval_mult_auto(ctx, ct, s, key),
            exp_t, sum_ct, rlk,
        )

    def avg_pool_full_con(
        self, t: TensorCT, weight: np.ndarray, bias: np.ndarray
    ) -> TensorCT:
        """Log-rotation full-image sum, then weighted FC + bias
        (AvgPoolFullCon, src/dnn.cu:397-452).  Note: like the reference,
        the sum lands in slot 0 of each channel; weight is (T, t)."""
        ctx = self.ctx
        T, tc = weight.shape
        assert tc == t.num_ch
        pow_s = 1 << t.slotstr
        log_l = int(math.log2(t.width))
        from dataclasses import replace
        from ..ops.galois import galois_elt_from_step
        from ..ops.w64 import W64
        from ..scheme.ciphertext import stack_cts, unstack_cts

        steps = tuple(
            [pow_s << i for i in range(log_l)]
            + [(pow_s << j) * t.width for j in range(log_l)]
        )
        keys = {}
        for s_ in steps:
            elt = galois_elt_from_step(s_, ctx.n)
            keys[elt] = self.gk.key_for_elt(elt)

        # degree-1 operands up front (mult_const semantics) so every
        # channel shares one program + metadata
        cts = [auto.mod_reduce(ctx, c, 1) if c.noise_scale_deg == 2 else c
               for c in t.cts]

        # stage 1: log-rotation sum, all channels in ONE vmapped program
        # (the per-(channel, rotation) eager loop cost ~1700 tunnel
        # dispatches at full scale — the r04 doll-TPU run died here)
        def pool_stage(ct, ks):
            acc = ct
            for s_ in steps:
                elt = galois_elt_from_step(s_, ctx.n)
                acc = auto.eval_add_auto(
                    ctx, ev.apply_galois_with_key(ctx, acc, elt, ks[elt]), acc
                )
            return acc

        summed_list = self._vmap_cts(("_pool_sum", steps), pool_stage,
                                     cts, keys)
        summed = stack_cts(summed_list)

        # stage 2: FC = modular matvec over the channel axis with the CRT
        # weight lifts shipped as arguments (GetElementForEvalMult residues,
        # auto._crt_lift_mult) — one program instead of T*tc mult_consts
        level = ctx.level(cts[0].chain_index)
        sf, _ = auto.scaling_factors(ctx)
        scf = sf[auto._level(cts[0], ctx)]
        qs = level.base.values
        n_l = len(qs)
        wc = np.zeros((T, tc, n_l), dtype=np.uint64)
        for u in range(T):
            for k in range(tc):
                big = int(round(float(weight[u, k]) * scf))
                wc[u, k] = [big % q for q in qs]
        deg_out = cts[0].noise_scale_deg + 1
        int_scf = int(round(scf))
        bc = np.zeros((T, n_l), dtype=np.uint64)
        for u in range(T):
            c = int(round(float(bias[u]) * scf))
            for _ in range(1, deg_out):
                c *= int_scf
            bc[u] = [c % q for q in qs]

        def pair(a):
            return (jnp.asarray((a & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
                    jnp.asarray((a >> np.uint64(32)).astype(np.uint32)))

        wc_lo, wc_hi = pair(wc)
        bc_lo, bc_hi = pair(bc)

        def fc_stage(stk, wlo, whi, blo, bhi):
            data = stk.data  # W64 (tc, 2, L, N)
            outs_lo, outs_hi = [], []
            for u in range(T):
                acc = None
                for k in range(tc):
                    f = W64(wlo[u, k][:, None], whi[u, k][:, None])
                    term = ev.w64.mul_mod(
                        data[k], f[None], level.mod.q,
                        level.mod.ratio_lo, level.mod.ratio_hi,
                    )
                    acc = term if acc is None else \
                        ev.w64.add_mod(acc, term, level.mod.q)
                b = W64(blo[u][:, None], bhi[u][:, None])
                c0 = ev.w64.add_mod(acc[0], b, level.mod.q)
                out = ev.w64.concat([c0[None], acc[1:]], axis=0)
                outs_lo.append(out.lo)
                outs_hi.append(out.hi)
            return (jnp.stack(outs_lo), jnp.stack(outs_hi))

        fc_fn = self._stage_jit(("_pool_fc", T, tc), fc_stage)
        out_lo, out_hi = fc_fn(summed, wc_lo, wc_hi, bc_lo, bc_hi)
        templ = _index_stacked(summed, 0)
        out_cts = [
            replace(
                templ,
                data=W64(out_lo[u], out_hi[u]),
                noise_scale_deg=templ.noise_scale_deg + 1,
                scale=templ.scale * scf,
            )
            for u in range(T)
        ]
        _block(out_cts)
        return TensorCT(out_cts, t.width, t.slotstr)

    def add(self, a: TensorCT, b: TensorCT) -> TensorCT:
        if (a.num_ch, a.width, a.slotstr) != (b.num_ch, b.width, b.slotstr):
            raise ValueError("TensorCT dimension mismatch in add")
        from ..scheme.ciphertext import stack_cts, unstack_cts

        # vmapped programs for the residual add (per-channel eager adds
        # cost a tunnel dispatch each), chunked to the channel budget;
        # eval_add_auto's level/depth adjustment branches on metadata,
        # which stack_cts guarantees is uniform per chunk
        bs = self.channel_batch(a.num_ch)
        outs = []
        for c0 in range(0, a.num_ch, bs):
            ca = a.cts[c0:c0 + bs]
            cb = b.cts[c0:c0 + bs]
            add_fn = self._stage_jit(
                ("_tensor_add", len(ca)),
                jax.vmap(lambda x, y: auto.eval_add_auto(self.ctx, x, y),
                         in_axes=(0, 0)),
            )
            outs.extend(
                unstack_cts(add_fn(stack_cts(ca), stack_cts(cb)), len(ca))
            )
        return TensorCT(outs, a.width, a.slotstr)
