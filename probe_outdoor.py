"""Outdoor/unbounded-scene geometry cost probe (VERDICT r2 item 9): flagship
forward at KITTI-360/HoliCity-like extents (100 m @ 5 cm grid, NO static
dense_extent), both conv-plan strategies — bucketized hash grid
(ops/hash_grid.py, the outdoor default) and merge-join sorts — so each has a
measured number next to the dense-voxel-grid path's.
Usage: python probe_outdoor.py [N] [hash|join|both]."""

import sys

from bench import main

if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    if which in ("hash", "both"):
        print(f"# outdoor hash-grid path, N={n}", file=sys.stderr)
        main(n_points=n, outdoor=True)
    if which in ("join", "both"):
        print(f"# outdoor merge-join path, N={n}", file=sys.stderr)
        main(n_points=n, outdoor=True, outdoor_join=True)
