"""Export CompositePhotos64 train/valid splits to .npz for the faithful
full-length recipes (VERDICT r2 item 1). Disjoint seeds give disjoint
composite layouts; every texel still traces to a real photo.

Usage: python scripts/export_composite.py [out_dir] [n_train] [n_valid]
"""
import sys

import numpy as np

from npe_tpu.data.datasets import CompositePhotos64


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "."
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    n_valid = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    for name, n, seed in (("train", n_train, 23), ("valid", n_valid, 909)):
        ds = CompositePhotos64(num_examples=n, seed=seed)
        chunks = []
        for i in range(0, n, 2048):
            chunks.append(ds.get_data(np.arange(i, min(i + 2048, n))))
            print(f"{name}: {i + len(chunks[-1])}/{n}", flush=True)
        arr = np.concatenate(chunks)
        np.savez(f"{out}/composite_{name}.npz", arr_0=arr)
        print(f"wrote {out}/composite_{name}.npz {arr.shape}", flush=True)


if __name__ == "__main__":
    main()
