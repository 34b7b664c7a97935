from .build import build_regions, compute_value_ranges
