from .bricker import (
    SAH_ALIKE,
    SMALL_BRICK_COUNT,
    SPATIAL_MEDIAN,
    Bricker,
    BuildResult,
    build_bricks,
    deduplicate_cells,
)
