"""Tracer seed-stream parity: seed_traces must reproduce, bit for bit,
the reference's resetTracer seeding (exa/OptixRenderer.cpp:450-462 —
libstdc++ default_random_engine(0) + uniform_real_distribution<float>,
GCC right-to-left ctor-arg evaluation).  Golden values from compiling
that exact expression with g++; when g++ is available the oracle is
rebuilt and compared live."""

import os
import shutil
import subprocess
import tempfile

import numpy as np

from owlexabrick_tpu.render.tracer import minstd0_uniform_f32, seed_traces

# printf("%.9g") of the first 8 seeds for size=(64,32,16),
# region_lo=(0.25,0,0.5), region_hi=(0.75,1,1) — g++ 12 / libstdc++
GOLDEN = np.array(
    [
        [40.1793709, 4.20920944, 8.00006294],
        [23.0066948, 17.0485516, 11.6692009],
        [37.7374878, 21.723671, 8.37635708],
        [32.6213226, 12.2720661, 15.4775429],
        [17.7107716, 1.10630751, 14.6477222],
        [16.2463417, 21.4767799, 12.2376022],
        [29.3595505, 2.13895154, 11.0673256],
        [45.7739677, 18.8472519, 13.4941816],
    ],
    np.float32,
)

CPP = r"""
#include <random>
#include <cstdio>
struct vec3f { float x,y,z; vec3f(float a,float b,float c):x(a),y(b),z(c){} };
int main() {
  float sx=64, sy=32, sz=16;
  std::default_random_engine engine(0);
  std::uniform_real_distribution<float> x(0.25f*sx, 0.75f*sx);
  std::uniform_real_distribution<float> y(0.0f*sy, 1.0f*sy);
  std::uniform_real_distribution<float> z(0.5f*sz, 1.0f*sz);
  for (int i=0;i<8;++i) {
    vec3f p(x(engine),y(engine),z(engine));
    printf("%.9g %.9g %.9g\n", p.x, p.y, p.z);
  }
  return 0;
}
"""


def _ours():
    return seed_traces(
        8, (0, 0, 0), (64, 32, 16), (0.25, 0.0, 0.5), (0.75, 1.0, 1.0)
    )


def test_minstd0_first_draws():
    u = minstd0_uniform_f32(3)
    # x1=16807, x2=282475249, x3=1622650073
    np.testing.assert_array_equal(
        u,
        (np.array([16806, 282475248, 1622650072], np.float32)
         / np.float32(2147483648.0)).astype(np.float32),
    )


def test_seed_traces_matches_golden():
    got = _ours()
    # golden printed with %.9g (exact for float32 round-trip)
    np.testing.assert_array_equal(got, GOLDEN)


def test_seed_traces_matches_live_gpp_oracle():
    gpp = shutil.which("g++")
    if gpp is None:
        import pytest

        pytest.skip("no g++")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "seedgen.cpp")
        exe = os.path.join(d, "seedgen")
        open(src, "w").write(CPP)
        subprocess.run([gpp, "-O2", "-o", exe, src], check=True)
        out = subprocess.run([exe], capture_output=True, text=True).stdout
    ref = np.array(
        [[float(v) for v in line.split()] for line in out.strip().splitlines()],
        np.float32,
    )
    np.testing.assert_array_equal(_ours(), ref)
