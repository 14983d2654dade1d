"""Outdoor/unbounded-scene geometry cost probe (VERDICT r2 item 9): flagship
forward at KITTI-360/HoliCity-like extents (100 m @ 5 cm grid, NO static
dense_extent) so the merge-join conv-plan path has a measured number next to
the dense-voxel-grid path's. Usage: python probe_outdoor.py [N]."""

import sys

from bench import main

if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    main(n_points=n, outdoor=True)
