"""Encrypted ResNet-20 / CIFAR-10 inference (flagship PPML application).

TPU-native counterpart of the reference's Resnet/ app
(Resnet/models/model_resnet20.cu:44-153, Resnet/resnet.cu:16-115,
Resnet/models/weight_loader.cu): conv1+bn+ReluComposite, 3 layers x 3
blocks with stride-2 downsample at block 0 of layers 2/3, final
AvgPool+FC.  Weights come from PyTorch-layout .npy files
([out,in,kh,kw] -> our (kh,kw,in,out)); CIFAR images from a
(10000,3,32,32) float32 .npy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .dnn import DNN, TensorCT


# --------------------------------------------------------------------------
# weight / input loaders (reference: Resnet/models/weight_loader.cu)
# --------------------------------------------------------------------------

def load_weight_4d(path: str) -> np.ndarray:
    """PyTorch conv weight [out,in,kH,kW] -> (kH,kW,in,out)."""
    arr = np.load(path).astype(np.float64)
    if arr.ndim != 4:
        raise ValueError(f"expected 4D weight tensor: {path}")
    return arr.transpose(2, 3, 1, 0)


def load_weight_2d(path: str) -> np.ndarray:
    arr = np.load(path).astype(np.float64)
    if arr.ndim != 2:
        raise ValueError(f"expected 2D weight: {path}")
    return arr


def load_weight_1d(path: str) -> np.ndarray:
    arr = np.load(path).astype(np.float64)
    if arr.ndim != 1:
        raise ValueError(f"expected 1D weight: {path}")
    return arr


@dataclass
class BatchNormParams:
    weight: np.ndarray
    bias: np.ndarray
    mean: np.ndarray
    var: np.ndarray


def load_bn(weight_dir: str, prefix: str) -> BatchNormParams:
    return BatchNormParams(
        weight=load_weight_1d(f"{weight_dir}/{prefix}_weight.npy"),
        bias=load_weight_1d(f"{weight_dir}/{prefix}_bias.npy"),
        mean=load_weight_1d(f"{weight_dir}/{prefix}_running_mean.npy"),
        var=load_weight_1d(f"{weight_dir}/{prefix}_running_var.npy"),
    )


def load_cifar_image(npy_path: str, index: int = 0) -> np.ndarray:
    """(10000, 3, 32, 32) float32 -> (32, 32, 3)."""
    arr = np.load(npy_path, mmap_mode="r")
    return np.asarray(arr[index], dtype=np.float64).transpose(1, 2, 0)


# --------------------------------------------------------------------------
# synthetic weights (tests / runs without the .npy files)
# --------------------------------------------------------------------------

def random_weights(rng: np.random.Generator, planes=(16, 32, 64), in_ch=3,
                   classes=10) -> dict:
    """Small random weights with ResNet-20 shapes (He-scaled, tamed so
    activations stay in the sign composite's input range)."""
    w = {}

    def conv(kh, cin, cout):
        std = math.sqrt(2.0 / (kh * kh * cin)) * 0.5
        return rng.normal(0.0, std, (kh, kh, cin, cout))

    def bn(c):
        return BatchNormParams(
            weight=rng.uniform(0.7, 1.3, c), bias=rng.uniform(-0.1, 0.1, c),
            mean=rng.uniform(-0.1, 0.1, c), var=rng.uniform(0.8, 1.2, c),
        )

    w["conv1"] = conv(3, in_ch, planes[0])
    w["bn1"] = bn(planes[0])
    for layer, p in enumerate(planes, start=1):
        prev = planes[layer - 2] if layer > 1 else planes[0]
        for blk in range(3):
            cin = prev if blk == 0 else p
            pre = f"layer{layer}_{blk}"
            w[f"{pre}_conv1"] = conv(3, cin, p)
            w[f"{pre}_bn1"] = bn(p)
            w[f"{pre}_conv2"] = conv(3, p, p)
            w[f"{pre}_bn2"] = bn(p)
            if layer > 1 and blk == 0:
                w[f"{pre}_downsample_0"] = conv(3, cin, p)
                w[f"{pre}_downsample_1"] = bn(p)
    w["fc_weight"] = rng.normal(0.0, 0.1, (classes, planes[2]))
    w["fc_bias"] = rng.normal(0.0, 0.1, classes)
    return w


def load_weights(weight_dir: str) -> dict:
    """All ResNet-20 weights from the reference's .npy layout."""
    w = {"conv1": load_weight_4d(f"{weight_dir}/conv1_weight.npy"),
         "bn1": load_bn(weight_dir, "bn1")}
    for layer in (1, 2, 3):
        for blk in range(3):
            pre = f"layer{layer}_{blk}"
            w[f"{pre}_conv1"] = load_weight_4d(f"{weight_dir}/{pre}_conv1_weight.npy")
            w[f"{pre}_bn1"] = load_bn(weight_dir, f"{pre}_bn1")
            w[f"{pre}_conv2"] = load_weight_4d(f"{weight_dir}/{pre}_conv2_weight.npy")
            w[f"{pre}_bn2"] = load_bn(weight_dir, f"{pre}_bn2")
            if layer > 1 and blk == 0:
                w[f"{pre}_downsample_0"] = load_weight_4d(
                    f"{weight_dir}/{pre}_downsample_0_weight.npy")
                w[f"{pre}_downsample_1"] = load_bn(weight_dir, f"{pre}_downsample_1")
    w["fc_weight"] = load_weight_2d(f"{weight_dir}/fc_weight.npy")
    w["fc_bias"] = load_weight_1d(f"{weight_dir}/fc_bias.npy")
    return w


# --------------------------------------------------------------------------
# model
# --------------------------------------------------------------------------

def prepare_resnet20(model: DNN, sk, width: int = 32, layers: int = 3):
    """PrePareResNet20 (model_resnet20.cu:3-14): rotation keys for the
    three resolutions + avgpool, relin key.  `layers` < 3 generates keys
    only for the resolutions actually visited (rotation-key HBM dominates
    at N=2^16)."""
    rots: list[int] = []
    rots += DNN.conv_rotation_indices(width, 3, 0)
    if layers >= 2:
        rots += DNN.conv_rotation_indices(width // 2, 3, 1)
    if layers >= 3:
        rots += DNN.conv_rotation_indices(width // 4, 3, 2)
        rots += DNN.avgpool_rotation_indices(width // 4, 2)
    model.build_galois_key(sk, rots)
    model.relin_keygen(sk)


def resnet20_infer(
    x: TensorCT, model: DNN, bootstrapper, weights: dict,
    log=print, blocks: int = 3, layers: int = 3,
    start_after: str = "", on_stage_done=None,
) -> TensorCT:
    """ResNet20_infer (model_resnet20.cu:44-153) with the reference's
    Timer buckets (Convolution / BatchNorm / Relu / Bootstrap / PoolFC,
    src/dnn.cu:84-240; print with utils.timer.print_accumulated).
    `blocks` < 3 truncates each layer, `layers` < 3 drops whole layers
    (and the final pool, whose FC shape would no longer match) — used for
    bounded-time stage-timing runs at the full N=2^16 config.

    Checkpoint/resume for wall-clock-bounded full-scale runs: the pipeline
    is a linear chain of named stages ('stem', 'l{layer}b{blk}', 'pool');
    `on_stage_done(name, x)` fires after each, and `start_after=name`
    resumes right past that stage (pass the checkpointed tensor as `x`)."""
    from ..utils import timer
    from .dnn import _block

    def conv(t, w, stride, key):
        with timer.section("Convolution"):
            return model.conv(t, w, stride, cache_key=key)

    def bnorm(t, p):
        with timer.section("BatchNorm"):
            out = model.batch_norm(t, p.weight, p.bias, p.mean, p.var)
            _block(out.cts)
            return out

    def stem(t):
        t = conv(t, weights["conv1"], 1, "conv1")
        t = bnorm(t, weights["bn1"])
        return model.relu_composite(t, bootstrapper)

    def make_block(layer, blk):
        def block(t):
            pre = f"layer{layer}_{blk}"
            stride = 2 if (layer > 1 and blk == 0) else 1
            t_skip = t
            t_main = conv(t, weights[f"{pre}_conv1"], stride, f"{pre}_conv1")
            t_main = bnorm(t_main, weights[f"{pre}_bn1"])
            t_main = model.relu_composite(t_main, bootstrapper)
            t_main = conv(t_main, weights[f"{pre}_conv2"], 1, f"{pre}_conv2")
            t_main = bnorm(t_main, weights[f"{pre}_bn2"])
            if stride == 2:
                t_skip = conv(t_skip, weights[f"{pre}_downsample_0"], 2,
                              f"{pre}_downsample_0")
                t_skip = bnorm(t_skip, weights[f"{pre}_downsample_1"])
            t = model.add(t_main, t_skip)
            return model.relu_composite(t, bootstrapper)
        return block

    def pool(t):
        with timer.section("PoolFC"):
            out = model.avg_pool_full_con(
                t, weights["fc_weight"], weights["fc_bias"]
            )
            _block(out.cts)
            return out

    stages: list = [("stem", stem)]
    for layer in (1, 2, 3)[:layers]:
        for blk in range(blocks):
            stages.append((f"l{layer}b{blk}", make_block(layer, blk)))
    if layers >= 3:
        stages.append(("pool", pool))

    started = not start_after
    for name, fn in stages:
        if not started:
            if name == start_after:
                started = True
            continue
        log(f"stage {name}")
        x = fn(x)
        if on_stage_done is not None:
            on_stage_done(name, x)
    if not started:
        raise ValueError(f"start_after stage {start_after!r} not in pipeline")
    return x


# --------------------------------------------------------------------------
# TensorCT checkpointing (chunked full-scale runs)
# --------------------------------------------------------------------------

def save_tensor_ct(t: TensorCT, path: str, stage: str = "",
                   extra: dict | None = None):
    """Persist a TensorCT (all channels + geometry + stage tag + the timer
    accumulators) so a wall-clock-bounded run can resume in a later
    process (the reference has no analog — its flagship binary must finish
    in one go)."""
    import json
    import os

    from ..utils import serialize as ser
    from ..utils import timer

    os.makedirs(path, exist_ok=True)
    for k, ct in enumerate(t.cts):
        with open(f"{path}/ch{k:03d}.ct", "wb") as fp:
            ser.save_ciphertext(ct, fp)
    meta = {
        "num_ch": t.num_ch, "width": t.width, "slotstr": t.slotstr,
        "stage": stage, "timers": timer.accumulated(),
    }
    if extra:
        meta.update(extra)
    tmp = f"{path}/meta.json.tmp"
    with open(tmp, "w") as fp:
        json.dump(meta, fp)
    os.replace(tmp, f"{path}/meta.json")  # atomic: meta.json marks validity


def load_tensor_ct(path: str) -> tuple[TensorCT, dict]:
    """-> (tensor, meta).  Restores the timer accumulators saved with it."""
    import json

    from ..utils import serialize as ser
    from ..utils import timer

    with open(f"{path}/meta.json") as fp:
        meta = json.load(fp)
    cts = []
    for k in range(meta["num_ch"]):
        with open(f"{path}/ch{k:03d}.ct", "rb") as fp:
            cts.append(ser.load_ciphertext(fp))
    for name, secs in meta.get("timers", {}).items():
        timer.add_accumulated(name, secs)
    return TensorCT(cts, meta["width"], meta["slotstr"]), meta


def resnet20_infer_clear(image: np.ndarray, weights: dict) -> np.ndarray:
    """Cleartext shadow of the encrypted pipeline (same layer math,
    including the non-averaged pool) for end-to-end validation."""
    from ..eval import chebyshev as cheb  # noqa: F401  (parity of approx relu)

    def conv(img, w4, stride):
        wdt = img.shape[0]
        kh = w4.shape[0]
        c = kh // 2
        out = np.zeros((wdt, wdt, w4.shape[3]))
        for i in range(kh):
            for j in range(kh):
                shifted = np.zeros_like(img)
                si0, sj0 = i - c, j - c
                src_i = slice(max(0, si0), min(wdt, wdt + si0))
                dst_i = slice(max(0, -si0), min(wdt, wdt - si0))
                src_j = slice(max(0, sj0), min(wdt, wdt + sj0))
                dst_j = slice(max(0, -sj0), min(wdt, wdt - sj0))
                shifted[dst_i, dst_j] = img[src_i, src_j]
                out += np.einsum("xyk,kh->xyh", shifted, w4[i, j])
        return out[::stride, ::stride]

    def bnorm(img, p):
        a = p.weight / np.sqrt(p.var + 1e-5)
        return img * a + (p.bias - a * p.mean)

    relu = lambda v: np.maximum(v, 0.0)

    x = relu(bnorm(conv(image, weights["conv1"], 1), weights["bn1"]))
    for layer in (1, 2, 3):
        for blk in range(3):
            pre = f"layer{layer}_{blk}"
            stride = 2 if (layer > 1 and blk == 0) else 1
            x_skip = x
            xm = bnorm(conv(x, weights[f"{pre}_conv1"], stride),
                       weights[f"{pre}_bn1"])
            xm = relu(xm)
            xm = bnorm(conv(xm, weights[f"{pre}_conv2"], 1),
                       weights[f"{pre}_bn2"])
            if stride == 2:
                x_skip = bnorm(conv(x_skip, weights[f"{pre}_downsample_0"], 2),
                               weights[f"{pre}_downsample_1"])
            x = relu(xm + x_skip)
    sums = x.sum(axis=(0, 1))
    return weights["fc_weight"] @ sums + weights["fc_bias"]
