from .build import build_regions, build_regions_py, compute_value_ranges
