#!/usr/bin/env python
"""One-command InceptionV3 weights converter → this framework's npz layout.

The reference scores FID with the TF-Hub InceptionV3 feature vector
(/root/reference/metrics.py:169-170). This container has no egress, so
``blurred_gan_tpu.metrics.inception`` implements the architecture locally and
loads weights from an ``.npz`` in its canonical ``<scope>/{w,beta,mean,var}``
layout (inception.py:12-37). This tool converts a checkpoint a user already
has on disk into that layout:

    python tools/convert_inception.py <checkpoint> <out.npz>

Supported checkpoint formats (auto-detected):

- **torchvision** ``inception_v3`` state dict (``.pth``/``.pt``, as saved by
  ``torch.save(model.state_dict(), ...)`` or a full serialized module).
  torchvision's BatchNorm2d carries a learned scale γ that the TF-slim-style
  BN of this trunk has no slot for; it is folded exactly (BN is
  ``γ·(conv(x)−μ)/σ + β`` and conv is linear per output channel, so
  ``w[..., c] *= γ_c`` and ``mean_c *= γ_c`` reproduce the γ-scaled network
  bit-for-bit — the recipe documented at inception.py:23-33). Kernels are
  transposed OIHW→HWIO.
- **TF-slim** ``inception_v3.ckpt`` (TF1 checkpoint directory/prefix with
  ``InceptionV3/<scope>/weights`` + ``BatchNorm/{beta,moving_mean,
  moving_variance}`` variables). Slim's BN has no γ (scale=False), so no
  folding; kernels are already HWIO. Branch sub-scopes (``Branch_0/
  Conv2d_0a_1x1`` etc.) are mapped to this module's torchvision-style branch
  names, including the Mixed_5b pool quirk (``Conv2d_0b_1x1``) and the
  Mixed_5c naming quirk (``Conv2d_0b_1x1``/``Conv_1_0c_5x5``).
- **npz** already in (or convertible to) the canonical layout — validated and
  re-saved, useful to shape-check third-party exports.

Every produced array is validated against the architecture spec
(``conv_specs()``) before writing, so a wrong-layout checkpoint fails loudly
rather than producing silently-wrong FIDs. Verify round-trip:
``tests/test_convert_inception.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blurred_gan_tpu.metrics.inception import (  # noqa: E402
    conv_specs,
    load_inception_weights,
)


# ---------------------------------------------------------------------------
# torchvision
# ---------------------------------------------------------------------------


def _torchvision_module_name(scope: str) -> str:
    """Our canonical scope → torchvision module path (they were chosen to
    map 1:1: '/' becomes '.')."""
    return scope.replace("/", ".")


def convert_torchvision_state_dict(sd) -> dict:
    """torchvision inception_v3 state dict → canonical params, γ folded."""
    params = {}
    for scope, (kh, kw), cin, cout in conv_specs():
        mod = _torchvision_module_name(scope)
        try:
            w = np.asarray(sd[f"{mod}.conv.weight"], np.float32)  # OIHW
            gamma = np.asarray(sd[f"{mod}.bn.weight"], np.float32)
            beta = np.asarray(sd[f"{mod}.bn.bias"], np.float32)
            mean = np.asarray(sd[f"{mod}.bn.running_mean"], np.float32)
            var = np.asarray(sd[f"{mod}.bn.running_var"], np.float32)
        except KeyError as e:
            raise KeyError(
                f"missing torchvision key for scope '{scope}': {e} — is this "
                f"a torchvision inception_v3 state dict?") from e
        if w.shape != (cout, cin, kh, kw):
            raise ValueError(f"{mod}.conv.weight: expected OIHW "
                             f"{(cout, cin, kh, kw)}, got {w.shape}")
        w = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        # Fold gamma exactly (the recipe documented at inception.py:23-33):
        # torch computes gamma*(conv(x)-mean)*rsqrt(var+eps) + beta; our
        # scale-free BN computes (conv'(x)-mean')*rsqrt(var+eps) + beta.
        # gamma multiplies only the numerator and conv is linear per output
        # channel, so  w' = w*gamma, mean' = mean*gamma  (beta, var
        # unchanged) reproduces the gamma-scaled network bit-for-bit — both
        # sides use eps = 1e-3 (torchvision BasicConv2d / inception.py BN).
        params[scope] = {
            "w": (w * gamma[None, None, None, :]).astype(np.float32),
            "beta": beta.astype(np.float32),
            "mean": (mean * gamma).astype(np.float32),
            "var": var.astype(np.float32),
        }
    return params


def _load_torch_checkpoint(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and not any(
            k.endswith(".conv.weight") for k in obj):
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


# ---------------------------------------------------------------------------
# TF-slim
# ---------------------------------------------------------------------------

# Map of our branch names → slim's conv sub-scope per block family. Derived
# from tensorflow/models slim inception_v3.py; Mixed_5b's pool projection is
# Conv2d_0b_1x1 and Mixed_5c renames branch1 to Conv2d_0b_1x1/Conv_1_0c_5x5
# (a historic typo preserved in every released checkpoint).
_SLIM_STEM = {
    "Conv2d_1a_3x3": "Conv2d_1a_3x3",
    "Conv2d_2a_3x3": "Conv2d_2a_3x3",
    "Conv2d_2b_3x3": "Conv2d_2b_3x3",
    "Conv2d_3b_1x1": "Conv2d_3b_1x1",
    "Conv2d_4a_3x3": "Conv2d_4a_3x3",
}


def _slim_name(scope: str) -> str:
    """Our '<block>/<branch>' scope → slim variable scope (derived from
    tensorflow/models slim nets/inception_v3.py variable scopes, including
    its historic naming quirks, which every released checkpoint preserves)."""
    if scope in _SLIM_STEM:
        return f"InceptionV3/{_SLIM_STEM[scope]}"
    block, branch = scope.split("/")
    # Block-family-specific overrides first (same branch name, different slim
    # scope depending on where it appears).
    if block == "Mixed_6a":
        # Slim puts the double-3x3 branch under Branch_1 here (Branch_2 in
        # the 35x35 blocks) and names the stride-2 3x3 convs "Conv2d_1a_1x1".
        table = {"branch3x3": "Branch_0/Conv2d_1a_1x1",
                 "branch3x3dbl_1": "Branch_1/Conv2d_0a_1x1",
                 "branch3x3dbl_2": "Branch_1/Conv2d_0b_3x3",
                 "branch3x3dbl_3": "Branch_1/Conv2d_1a_1x1"}
        return f"InceptionV3/{block}/{table[branch]}"
    if block in ("Mixed_7b", "Mixed_7c"):
        table = {"branch1x1": "Branch_0/Conv2d_0a_1x1",
                 "branch3x3_1": "Branch_1/Conv2d_0a_1x1",
                 "branch3x3_2a": "Branch_1/Conv2d_0b_1x3",
                 "branch3x3_2b": "Branch_1/Conv2d_0c_3x1",
                 "branch3x3dbl_1": "Branch_2/Conv2d_0a_1x1",
                 "branch3x3dbl_2": "Branch_2/Conv2d_0b_3x3",
                 "branch3x3dbl_3a": "Branch_2/Conv2d_0c_1x3",
                 "branch3x3dbl_3b": "Branch_2/Conv2d_0d_3x1",
                 "branch_pool": "Branch_3/Conv2d_0b_1x1"}
        return f"InceptionV3/{block}/{table[branch]}"
    std5c = block == "Mixed_5c"
    table = {
        # 35x35 blocks (Mixed_5b/5c/5d); Mixed_5c renames Branch_1's convs
        # (the Conv2d_0b_1x1 / Conv_1_0c_5x5 quirk).
        "branch1x1": "Branch_0/Conv2d_0a_1x1",
        "branch5x5_1": ("Branch_1/Conv2d_0b_1x1" if std5c
                        else "Branch_1/Conv2d_0a_1x1"),
        "branch5x5_2": ("Branch_1/Conv_1_0c_5x5" if std5c
                        else "Branch_1/Conv2d_0b_5x5"),
        "branch3x3dbl_1": "Branch_2/Conv2d_0a_1x1",
        "branch3x3dbl_2": "Branch_2/Conv2d_0b_3x3",
        "branch3x3dbl_3": "Branch_2/Conv2d_0c_3x3",
        "branch_pool": "Branch_3/Conv2d_0b_1x1",
        # 17x17 blocks (Mixed_6b..6e)
        "branch7x7_1": "Branch_1/Conv2d_0a_1x1",
        "branch7x7_2": "Branch_1/Conv2d_0b_1x7",
        "branch7x7_3": "Branch_1/Conv2d_0c_7x1",
        "branch7x7dbl_1": "Branch_2/Conv2d_0a_1x1",
        "branch7x7dbl_2": "Branch_2/Conv2d_0b_7x1",
        "branch7x7dbl_3": "Branch_2/Conv2d_0c_1x7",
        "branch7x7dbl_4": "Branch_2/Conv2d_0d_7x1",
        "branch7x7dbl_5": "Branch_2/Conv2d_0e_1x7",
        # Mixed_7a
        "branch3x3_1": "Branch_0/Conv2d_0a_1x1",
        "branch3x3_2": "Branch_0/Conv2d_1a_3x3",
        "branch7x7x3_1": "Branch_1/Conv2d_0a_1x1",
        "branch7x7x3_2": "Branch_1/Conv2d_0b_1x7",
        "branch7x7x3_3": "Branch_1/Conv2d_0c_7x1",
        "branch7x7x3_4": "Branch_1/Conv2d_1a_3x3",
    }
    return f"InceptionV3/{block}/{table[branch]}"


def convert_slim_checkpoint(ckpt_prefix: str) -> dict:
    """TF-slim inception_v3 checkpoint → canonical params (no γ: slim BN is
    scale=False, matching this trunk exactly — no folding needed)."""
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_prefix)
    params = {}
    for scope, (kh, kw), cin, cout in conv_specs():
        slim = _slim_name(scope)
        try:
            w = reader.get_tensor(f"{slim}/weights")  # HWIO already
            beta = reader.get_tensor(f"{slim}/BatchNorm/beta")
            mean = reader.get_tensor(f"{slim}/BatchNorm/moving_mean")
            var = reader.get_tensor(f"{slim}/BatchNorm/moving_variance")
        except Exception as e:
            raise KeyError(
                f"missing slim variables under '{slim}' for scope "
                f"'{scope}': {e}") from e
        if w.shape != (kh, kw, cin, cout):
            raise ValueError(f"{slim}/weights: expected HWIO "
                             f"{(kh, kw, cin, cout)}, got {w.shape}")
        params[scope] = {"w": np.asarray(w, np.float32),
                         "beta": np.asarray(beta, np.float32),
                         "mean": np.asarray(mean, np.float32),
                         "var": np.asarray(var, np.float32)}
    return params


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def detect_format(path: str) -> str:
    if os.path.isdir(path):
        return "slim"
    lower = path.lower()
    if lower.endswith(".npz"):
        return "npz"
    if lower.endswith((".pth", ".pt", ".bin")):
        return "torchvision"
    if os.path.exists(path + ".index") or ".ckpt" in os.path.basename(lower):
        return "slim"
    return "torchvision"


def convert(src: str, out: str, fmt: str = "auto") -> dict:
    if fmt == "auto":
        fmt = detect_format(src)
        print(f"[convert] detected format: {fmt}")
    if fmt == "torchvision":
        params = convert_torchvision_state_dict(_load_torch_checkpoint(src))
    elif fmt == "slim":
        prefix = src
        if os.path.isdir(src):  # directory containing the ckpt files
            cands = [f[:-6] for f in os.listdir(src) if f.endswith(".index")]
            if not cands:
                raise FileNotFoundError(f"no *.index checkpoint under {src}")
            prefix = os.path.join(src, sorted(cands)[-1])
        params = convert_slim_checkpoint(prefix)
    elif fmt == "npz":
        params = load_inception_weights(src)  # validate-and-resave
    else:
        raise ValueError(f"unknown format {fmt!r}")

    flat = {}
    for scope, unit in params.items():
        for field, arr in unit.items():
            flat[f"{scope}/{field}"] = np.asarray(arr, np.float32)
    np.savez(out, **flat)
    # Round-trip through the strict loader: every shape validated.
    load_inception_weights(out)
    n_params = sum(a.size for a in flat.values())
    print(f"[convert] wrote {out}: {len(params)} conv units, "
          f"{n_params:,} parameters (validated)")
    return params


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("src", help="torchvision .pth / slim ckpt prefix or dir / "
                               "npz")
    p.add_argument("out", help="output .npz path (point $INCEPTION_WEIGHTS "
                               "here)")
    p.add_argument("--format", default="auto",
                   choices=["auto", "torchvision", "slim", "npz"])
    args = p.parse_args()
    convert(args.src, args.out, args.format)
