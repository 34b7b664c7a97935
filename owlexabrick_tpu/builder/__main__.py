"""exaBuilder CLI: .cells -> .bricks [+ .kd].

Mirrors builder/builder.cpp:836-875:
  exabuilder <in.cells> -o <out.bricks> [-kd out.kd]
             [--spatial-median | --large-bricks] [--max-leaf-width N] [-v]

Uses the C++ native builder when built (builder/native), else the numpy
implementation.
"""

from __future__ import annotations

import sys
import time

from ..io import formats
from .bricker import (
    SAH_ALIKE,
    SMALL_BRICK_COUNT,
    SPATIAL_MEDIAN,
    build_bricks,
    kd_to_arrays,
)


def main(argv=None) -> int:
    argv = list(argv if argv is not None else sys.argv[1:])
    in_file = None
    out_file = None
    kd_file = None
    strategy = SAH_ALIKE
    max_leaf_width = 127
    verbose = False
    force_python = False

    i = 0
    while i < len(argv):
        a = argv[i]
        if not a.startswith("-"):
            in_file = a
            i += 1
        elif a == "-o":
            out_file = argv[i + 1]
            i += 2
        elif a == "-kd":
            kd_file = argv[i + 1]
            i += 2
        elif a in ("--no-shift-planes", "--no-planes", "--spatial-median",
                   "--spatial-median-builder"):
            strategy = SPATIAL_MEDIAN
            i += 1
        elif a == "--large-bricks":
            strategy = SMALL_BRICK_COUNT
            i += 1
        elif a == "--max-leaf-width":
            max_leaf_width = int(argv[i + 1])
            i += 2
        elif a == "-v":
            verbose = True
            i += 1
        elif a == "--python":
            force_python = True
            i += 1
        elif a == "--parallel":
            i += 1  # accepted for compatibility; the native builder decides
        else:
            raise SystemExit(f"un-recognized cmdline arg '{a}'")

    if not in_file:
        raise SystemExit("no input file specified...")
    if not out_file:
        raise SystemExit("no output file specified...")

    lower, level = formats.read_cells(in_file)
    print(f"#exa: loaded {lower.shape[0]} cells, levels "
          f"{int(level.min())}..{int(level.max())}")

    t0 = time.time()
    native = None
    if not force_python:
        try:
            from .native import native_build_bricks

            native = native_build_bricks
        except Exception:
            native = None

    if native is not None:
        result = native(lower, level, strategy, max_leaf_width)
    else:
        result = build_bricks(lower, level, strategy, max_leaf_width)
    dt = time.time() - t0

    stats = result.stats()
    print(f"#exa: done bricking in {dt:.2f}s, created "
          f"{stats['num_bricks']} bricks")
    print(f"#exa: average num cells per brick: {stats['avg_cells_per_brick']}")
    print(f"#exa: number of single-cell bricks: "
          f"{stats['num_single_cell_bricks']}")

    formats.write_bricks(
        out_file,
        lower=[b.lower for b in result.bricks],
        size=[b.size for b in result.bricks],
        level=[b.level for b in result.bricks],
        cell_ids_per_brick=[b.cell_ids.reshape(-1) for b in result.bricks],
    )
    print(f"#exa: wrote {out_file}")

    if kd_file:
        packed = formats.pack_kd_nodes(*kd_to_arrays(result.kd))
        formats.write_kd(kd_file, packed)
        print(f"#exa: wrote {kd_file} ({len(result.kd)} nodes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
