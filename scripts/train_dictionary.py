"""Train the sparse-coding dictionary and save it as a repo artifact.

The reference ships ``trained_dictionary.mat`` only as a missing git-LFS
blob, so the framework learns its own from the clean reference crops (the
reference's dictionary came from the same Chikusei scene).  Output:
``artifacts/dictionary_36x36_k{K}.npz`` with the (1296, K) column-normalised
dictionary.

Usage: python scripts/train_dictionary.py [--atoms 512] [--quick]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=512)
    ap.add_argument("--lam", type=float, default=0.02)
    ap.add_argument("--outer", type=int, default=30)
    ap.add_argument("--sparse-iters", type=int, default=40)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--method", default="ksvd", choices=("mod", "ksvd"))
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from lrs_pnp_dip_tpu.data.dictionary import (
        extract_training_patches,
        learn_dictionary,
    )
    from lrs_pnp_dip_tpu.data.io import (
        REFERENCE_IMAGES,
        load_reference_sample,
        reference_data_available,
    )

    if not reference_data_available():
        raise SystemExit("reference data not available")

    cubes = []
    for img in REFERENCE_IMAGES:
        s = load_reference_sample(img, "mask1")
        cubes.append(s.clean)
    stride = 4 if args.quick else args.stride
    patches = extract_training_patches(cubes, stride=stride)
    print(f"training patches: {patches.shape}")

    outer = 5 if args.quick else args.outer
    D = learn_dictionary(
        patches,
        n_atoms=args.atoms,
        lam=args.lam,
        n_outer=outer,
        sparse_iters=args.sparse_iters,
        method=args.method,
    )
    # report reconstruction quality on held-out-ish patches
    import jax.numpy as jnp
    from lrs_pnp_dip_tpu.data.dictionary import _ista_code

    Z = _ista_code(jnp.asarray(patches[:, ::7]), jnp.asarray(D), args.lam, 60)
    rec = np.asarray(jnp.asarray(D) @ Z)
    err = np.linalg.norm(rec - patches[:, ::7]) / np.linalg.norm(patches[:, ::7])
    nnz = float(np.mean(np.abs(np.asarray(Z)) > 1e-4))
    print(f"relative recon error: {err:.4f}; coef density: {nnz:.3f}")

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "artifacts", f"dictionary_36x36_k{args.atoms}.npz"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, dictionary=D.astype(np.float32),
                        lam=args.lam, stride=stride)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
