import os

# force CPU with 8 virtual devices BEFORE jax import: the standard way to
# test sharded TPU code without a TPU slice
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon site config forces platform "axon" (the TPU tunnel); tests must
# run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy render/scan tests (the full tier; run once per "
        "round with `-m slow` or OWLEXA_RUN_SLOW=1)",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r3 task 10): the default run stays
    exhaustive on logic but skips the slowest golden/scan renders so
    iteration stays under ~15 min; `-m slow` (or OWLEXA_RUN_SLOW=1)
    runs the heavy tier."""
    if config.option.markexpr or os.environ.get("OWLEXA_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(
        reason="slow tier: run with -m slow or OWLEXA_RUN_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles hundreds of XLA CPU executables; past a
    load threshold the LLVM JIT segfaults inside backend_compile (the
    crash point moves with the cumulative count, not any one test —
    seen in test_sampler first, later in test_oblique_cameras /
    test_property as the suite grew).  Dropping the live caches at
    module boundaries keeps the resident executable count bounded; the
    recompiles cost far less than the suite's render time."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# shared tiny AMR fixtures (the exaArtificial grammar, tools/artificial)
# ---------------------------------------------------------------------------

EX0 = "0 0 0 1 1 1 0 0.5\n"  # single cell
EX1 = "0 0 0 2 2 2 0 0 0 0 0 0 0 0 1\n"  # 2^3, one hot corner
EX2 = "0 0 0 8 8 8 0 0 1 2 3 4 5 6 7\n"  # 8^3 gradient
# multi-level: coarse 4^3 level-1 block with a fine 4^3 level-0 block inside
EX3 = "0 0 0 4 4 4 1 0 1 2 3 4 5 6 7\n8 0 0 4 4 4 0 1\n"
# two levels side by side (level boundary continuity fixture)
EX4 = "0 0 0 4 4 4 0 0 1 0 1 0 1 0 1\n4 0 0 2 2 2 1 2\n"


@pytest.fixture(scope="session")
def amr_fixture():
    from owlexabrick_tpu.tools.artificial import parse_grids_text

    def make(text):
        return parse_grids_text(text)

    return make
