"""Packed multi-channel convolution + diagonal-BSGS fully-connected layer.

Counterpart of the reference's standalone PhantomConvolution
(/root/reference/src/convolution.cu:154-780, include/convolution.cuh):
many input channels share one ciphertext in a zero-padded (w+2p)^2 block
layout, convolution is rotate-mask-accumulate over the filter taps, the
per-ciphertext channel sum collapses across blocks, and outputs re-pack
n_i channels per ciphertext.  The FC layer is the reference's diagonal
encoding (FCWeightEncodeCore: diag_i[j] = W[(i+j) % rows][j]) with
rotation accumulation and log-fold (FullyConnectedLayerCore).

TPU-first deviations from the reference:
  * blocks are padded to a power of two so the cross-channel sum is
    log2(n_i) aligned rotate-adds instead of the reference's
    Hadamard-domain filter packing (same I/O contract, same asymptotics);
  * in_size > numSlots (one image split over several cts) is not yet
    supported (the reference's path for it exists but is exercised by no
    test or example).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..eval import evaluator as ev
from ..scheme.ciphertext import Ciphertext, Plaintext
from ..scheme.context import FheContext
from ..scheme.keys import GaloisKey, SecretKey


def _next_pow2(v: int) -> int:
    return 1 << (v - 1).bit_length()


@dataclass(frozen=True)
class PackedLayout:
    """Slot layout for channel-packed padded images."""

    in_h: int          # unpadded image height/width
    f_h: int           # filter height/width (odd)
    block: int         # padded+aligned slots per channel
    n_i: int           # channels per ciphertext
    wpp: int           # padded width

    @property
    def pad(self) -> int:
        return (self.f_h - 1) // 2


class PackedConv:
    def __init__(self, ctx: FheContext, encoder, scale: float | None = None):
        self.ctx = ctx
        self.encoder = encoder
        self.scale = scale if scale is not None else 2.0 ** 40
        self.slots = ctx.n // 2

    def layout(self, in_h: int, f_h: int) -> PackedLayout:
        pad = (f_h - 1) // 2
        wpp = in_h + 2 * pad
        block = _next_pow2(wpp * wpp)
        n_i = self.slots // block
        if n_i < 1:
            # parity note: the reference's in_size > numSlots branch also
            # throws ("Not yet to support n < (d_size_sqrt+p_l+p_r)**2",
            # /root/reference/src/convolution.cu:385-388)
            raise NotImplementedError(
                "image larger than the slot count (unsupported in the "
                "reference as well; use a larger ring degree)"
            )
        return PackedLayout(in_h=in_h, f_h=f_h, block=block, n_i=n_i, wpp=wpp)

    # -- packing ------------------------------------------------------------
    def zero_pad_encode(
        self, images: np.ndarray, lay: PackedLayout, sk: SecretKey
    ) -> list[Ciphertext]:
        """images (C, h, h) -> ceil(C/n_i) ciphertexts, channel c in block
        c % n_i of ct c // n_i (reference zero_pad_encode,
        src/convolution.cu:10-152)."""
        c_in, h, _ = images.shape
        assert h == lay.in_h
        num_ct = -(-c_in // lay.n_i)
        cts = []
        for i in range(num_ct):
            vec = np.zeros(self.slots)
            for b in range(lay.n_i):
                c = i * lay.n_i + b
                if c >= c_in:
                    break
                base = b * lay.block
                for r in range(h):
                    off = base + (r + lay.pad) * lay.wpp + lay.pad
                    vec[off:off + h] = images[c, r]
            pt = self.encoder.encode(vec, self.scale, slots=self.slots)
            cts.append(sk.encrypt_symmetric(pt))
        return cts

    def decode_outputs(
        self, cts: list[Ciphertext], lay: PackedLayout, c_out: int, sk: SecretKey
    ) -> np.ndarray:
        """-> (c_out, h, h) from the packed output layout."""
        h = lay.in_h
        out = np.zeros((c_out, h, h))
        for i, ct in enumerate(cts):
            vals = self.encoder.decode(sk.decrypt(ct), slots=self.slots).real
            for b in range(lay.n_i):
                k = i * lay.n_i + b
                if k >= c_out:
                    break
                base = b * lay.block
                for r in range(h):
                    off = base + (r + lay.pad) * lay.wpp + lay.pad
                    out[k, r] = vals[off:off + h]
        return out

    # -- rotations needed --------------------------------------------------
    def rotation_indices(self, lay: PackedLayout) -> list[int]:
        steps = set()
        p = lay.pad
        for di in range(lay.f_h):
            for dj in range(lay.f_h):
                s = (di - p) * lay.wpp + (dj - p)
                if s:
                    steps.add(s)
        b = lay.block
        while b < lay.n_i * lay.block:
            steps.add(b)
            b <<= 1
        return sorted(steps)

    # -- convolution ----------------------------------------------------------
    def eval_convolution(
        self,
        filt: np.ndarray,           # (c_out, c_in, f, f)
        gk: GaloisKey,
        din: list[Ciphertext],
        lay: PackedLayout,
    ) -> list[Ciphertext]:
        """Conv with 'same' zero padding; outputs packed n_i per ct."""
        ctx = self.ctx
        c_out, c_in, f_h, _ = filt.shape
        assert f_h == lay.f_h
        p = lay.pad
        h = lay.in_h
        num_ct_in = len(din)
        num_ct_out = -(-c_out // lay.n_i)

        # interior indicator for one block (valid output positions)
        interior = np.zeros(lay.block)
        for r in range(h):
            off = (r + p) * lay.wpp + p
            interior[off:off + h] = 1.0

        # tap rotations of each input ct, shared across all output channels
        rotated: list[dict[tuple[int, int], Ciphertext]] = []
        for ct in din:
            taps = {}
            for di in range(f_h):
                for dj in range(f_h):
                    s = (di - p) * lay.wpp + (dj - p)
                    taps[(di, dj)] = ev.rotate(ctx, ct, s, gk) if s else ct
            rotated.append(taps)

        out_cts: list[Ciphertext | None] = [None] * num_ct_out
        for k in range(c_out):
            # accumulate masked taps: block b of input ct i holds channel
            # c = i*n_i + b, mask carries filt[k, c, di, dj] on the interior
            acc = None
            for i in range(num_ct_in):
                for di in range(f_h):
                    for dj in range(f_h):
                        mask = np.zeros(self.slots)
                        any_nz = False
                        for b in range(lay.n_i):
                            c = i * lay.n_i + b
                            if c >= c_in:
                                break
                            w = float(filt[k, c, di, dj])
                            if w != 0.0:
                                any_nz = True
                                mask[b * lay.block:(b + 1) * lay.block] = \
                                    w * interior
                        if not any_nz:
                            continue
                        pt = self._mask_plain(mask, rotated[i][(di, dj)])
                        term = ev.multiply_plain(ctx, rotated[i][(di, dj)], pt)
                        acc = term if acc is None else ev.add(ctx, acc, term)
            acc = ev.rescale_to_next(ctx, acc)
            # collapse the per-channel blocks: every block ends up with the
            # full sum (power-of-two aligned rotate-add)
            span = lay.block
            while span < lay.n_i * lay.block:
                acc = ev.add(ctx, ev.rotate(ctx, acc, span, gk), acc)
                span <<= 1
            # select block (k % n_i) into the output ct
            sel = np.zeros(self.slots)
            b_out = k % lay.n_i
            sel[b_out * lay.block:(b_out + 1) * lay.block] = interior
            sel_pt = self._mask_plain(sel, acc)
            term = ev.rescale_to_next(
                ctx, ev.multiply_plain(ctx, acc, sel_pt)
            )
            o = k // lay.n_i
            out_cts[o] = term if out_cts[o] is None else \
                ev.add(ctx, out_cts[o], term)
        return out_cts

    def _mask_plain(self, mask: np.ndarray, ct: Ciphertext) -> Plaintext:
        return self.encoder.encode(
            mask, self.scale, chain_index=ct.chain_index, slots=self.slots
        )


# --------------------------------------------------------------------------
# fully-connected layer (diagonal encoding + BSGS fold)
# --------------------------------------------------------------------------

def fc_weight_encode(
    encoder, weight: np.ndarray, scale: float, chain_index: int = 1
) -> list[Plaintext]:
    """Diagonal plaintexts diag_i[j] = W[(i+j) % rows][j]
    (FCWeightEncodeCore, src/convolution.cu:637-663); rows/cols powers of 2,
    cols <= numSlots."""
    rows, cols = weight.shape
    slots = encoder.slots
    pts = []
    for i in range(rows):
        diag = np.zeros(cols)
        for j in range(cols):
            diag[j] = weight[(i + j) % rows][j]
        full = np.zeros(slots)
        full[:cols] = diag
        pts.append(encoder.encode(full, scale, chain_index=chain_index,
                                  slots=slots))
    return pts


def fc_rotation_indices(rows: int, cols: int, slots: int) -> list[int]:
    steps = set()
    for i in range(1, rows):
        steps.add(-i)
        if cols != slots:
            steps.add(cols - i)
    i = cols // 2
    while i >= rows:
        steps.add(i)
        i //= 2
    return sorted(steps)


def fully_connected(
    ctx: FheContext,
    gk: GaloisKey,
    din: Ciphertext,
    diag_pts: list[Plaintext],
    cols: int,
    bias_pt: Plaintext | None = None,
) -> Ciphertext:
    """y[j] = sum_k W[j,k] x[k] for j < rows, via rotation accumulation +
    log-fold (FullyConnectedLayerCore, src/convolution.cu:677-725)."""
    slots = ctx.n // 2
    rows = len(diag_pts)
    prev = ev.rescale_to_next(ctx, ev.multiply_plain(ctx, din, diag_pts[0]))
    double_rotate = cols != slots
    for i in range(1, rows):
        tmp = ev.rescale_to_next(ctx, ev.multiply_plain(ctx, din, diag_pts[i]))
        if double_rotate:
            prev = ev.add(ctx, prev, ev.rotate(ctx, tmp, cols - i, gk))
        prev = ev.add(ctx, prev, ev.rotate(ctx, tmp, -i, gk))
    dout = prev
    i = cols // 2
    while i >= rows:
        prev = ev.rotate(ctx, prev, i, gk)
        dout = ev.add(ctx, dout, prev)
        prev = dout
        i //= 2
    if bias_pt is not None:
        dout = ev.add_plain(ctx, dout, bias_pt)
    return dout
