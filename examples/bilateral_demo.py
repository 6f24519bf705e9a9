"""Bilateral filtering + CRF-style smoothing demo (reference
``examples/demos`` bilateral/CRF image demos).

Builds a noisy synthetic image, runs the dense grid bilateral filter, and a
few CRF mean-field message-passing steps using the permutohedral filter over
(position, color) features. Prints error metrics; no display needed.

Usage: python examples/bilateral_demo.py [--cpu]
"""

from __future__ import annotations

import argparse
import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from warpconvnet_tpu.nn.functional.bilateral import grid_bilateral_filter
from warpconvnet_tpu.nn.functional.permutohedral import permutohedral_filter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    s = args.size

    # Piecewise-constant image + noise.
    clean = np.zeros((s, s, 1), np.float32)
    clean[:, s // 2 :] = 1.0
    clean[s // 4 : s // 2, : s // 2] = 0.5
    noisy = clean + rng.normal(0, 0.15, clean.shape).astype(np.float32)

    out = np.asarray(
        grid_bilateral_filter(
            jnp.asarray(noisy[None]), jnp.asarray(noisy[None]),
            sigma_spatial=3.0, sigma_range=0.3, half_window=3,
        )
    )[0]
    print(f"bilateral: noise mse {((noisy-clean)**2).mean():.4f} -> "
          f"{((out-clean)**2).mean():.4f}")

    # CRF mean-field: unary = noisy 2-class logits; pairwise smoothing via
    # permutohedral filtering of the label distribution in (x, y, intensity)
    # feature space.
    ys, xs = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    feats = np.stack(
        [ys.ravel() / 6.0, xs.ravel() / 6.0, noisy.ravel() / 0.25], -1
    ).astype(np.float32)
    unary = np.stack([1 - noisy.ravel(), noisy.ravel()], -1) * 4 - 2
    q = jax.nn.softmax(jnp.asarray(unary), -1)
    for _ in range(3):
        msg = permutohedral_filter(q, jnp.asarray(feats))
        q = jax.nn.softmax(jnp.asarray(unary) + 3.0 * (msg - q), -1)
    pred = np.asarray(q.argmax(-1)).reshape(s, s)
    truth = (clean[..., 0] > 0.75).astype(int)
    acc_unary = ((unary.argmax(-1).reshape(s, s)) == truth).mean()
    acc_crf = (pred == truth).mean()
    print(f"CRF: unary acc {acc_unary:.3f} -> mean-field acc {acc_crf:.3f}")


if __name__ == "__main__":
    main()
